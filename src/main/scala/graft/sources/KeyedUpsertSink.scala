package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-structured keyed last-writer-wins parquet store — the batch-side
  * replacement for the reference's hand-rolled DynamoDB `ForeachWriter` sink
  * (consumer/.../SparkDynamoDBConsumer.java:202-283): DynamoDB `putItem` is
  * an upsert by key (T7, SURVEY.md §2.9), so each micro-batch merges into the
  * store by key with new rows winning.
  *
  * Round 2 shipped this as a full-rewrite store (`old ANTI new ∪ new` +
  * directory swap): correct, but O(store) work per micro-batch — the store
  * grows monotonically, so per-batch cost grows without bound, where the
  * reference's putItem is O(batch) (consumer :233-264). This round replaces
  * it with the log-structured design the row-level [[KeyedForeachWriter]]
  * already proved at row granularity, generalized to columnar parquet
  * segments:
  *
  *  - '''Write = O(batch).''' Each epoch appends ONE parquet segment
  *    (`seg/<epoch>/`, rows stamped with the epoch) and then creates a
  *    commit marker (`commits/<epoch>`). Nothing existing is read or
  *    rewritten. The marker is created strictly after the segment rename,
  *    so a crash mid-write leaves an invisible (uncommitted) segment —
  *    readers and replays never see half a batch.
  *  - '''Replay idempotence (T7).''' `foreachBatch` re-delivers an epoch
  *    after recovery; an existing commit marker short-circuits the write,
  *    exactly like [[KeyedForeachWriter.open]] returning false.
  *  - '''Read = LWW merge-on-read.''' The reader unions committed segments
  *    and keeps, per key, the row with the highest epoch (one shuffle on
  *    the key — the same exchange the old full-rewrite paid on every
  *    WRITE). Key columns are recorded once in a `_keys` manifest so
  *    readers need no out-of-band schema knowledge.
  *  - '''Compaction bounds read amplification.''' [[compact]] folds all
  *    committed segments into a single segment of per-key winners (each
  *    keeping its original epoch stamp, so LWW ordering is preserved
  *    across later appends), commits it, then retires the inputs. A crash
  *    at any point leaves either the old segment set, or the compacted
  *    segment plus not-yet-deleted originals — duplicate IDENTICAL rows
  *    that the LWW read collapses, so every intermediate state reads
  *    consistently.
  *
  * This is the Delta/Iceberg MERGE shape (append log + merge-on-read +
  * compaction) with zero extra dependencies; swapping in a real table
  * format changes no call site.
  */
object KeyedUpsertSink {

  /** Per-row epoch stamp column (internal; stripped by [[read]]). */
  private val EpochCol = "__graft_epoch"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(store: String) = new Path(s"$store/commits")
  private def segDir(store: String)     = new Path(s"$store/seg")

  /** Epoch encoded in a segment/marker name: plain micro-batch epochs are
    * the number itself; a compacted segment is `compact-<maxEpoch>` with an
    * optional `-<n>` uniquifier (re-compaction after a crash or an epoch
    * replay must never reuse a name that is still committed — see
    * [[compact]]).
    */
  private def parseEpoch(name: String): Option[Long] = {
    val core =
      if (name.startsWith("compact-")) name.stripPrefix("compact-").takeWhile(_ != '-')
      else name
    try Some(core.toLong) catch { case _: NumberFormatException => None }
  }

  /** Committed segment names, by listing the commit-marker directory (the
    * one source of truth; uncommitted segment data is invisible).
    */
  private def committedSegments(spark: SparkSession, store: String): Seq[String] = {
    val fs = fsOf(spark, commitsDir(store))
    if (!fs.exists(commitsDir(store))) Seq.empty
    else fs.listStatus(commitsDir(store)).toSeq.map(_.getPath.getName)
      .filter(parseEpoch(_).isDefined)
  }

  private def writeKeysManifest(spark: SparkSession, store: String, keyCols: Seq[String]): Unit = {
    val p = new Path(s"$store/_keys")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      out.write(keyCols.mkString(",").getBytes(UTF_8))
      out.close()
    } else {
      // a silent key mismatch would dedup batches by one key set and merge
      // reads by another — rows the caller considers distinct would
      // collapse to an arbitrary winner; fail at the write site instead
      val existing = readKeysManifest(spark, store)
      require(existing == keyCols,
        s"store $store is keyed by ${existing.mkString(",")}, not ${keyCols.mkString(",")}")
    }
  }

  private def readKeysManifest(spark: SparkSession, store: String): Seq[String] = {
    val p = new Path(s"$store/_keys")
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"not a keyed store (no _keys manifest): $store")
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    new String(bytes, UTF_8).split(",").toSeq
  }

  /** Append `batch` as the segment for `epochId` (last-writer-wins on
    * `keyCols`; rows within one batch are deduped on the key first). Cost is
    * O(batch) regardless of store size. Re-delivery of an already-committed
    * epoch (checkpoint replay) is skipped.
    */
  def upsert(spark: SparkSession, storePath: String, keyCols: Seq[String],
             batch: DataFrame, epochId: Long): Unit = {
    val fs = fsOf(spark, new Path(storePath))
    val name = epochId.toString
    val marker = new Path(commitsDir(storePath), name)
    if (fs.exists(marker)) return // epoch already durable: replay, skip
    // compaction retires the per-epoch markers of the epochs it folds, so
    // the marker check alone cannot fence a replay of a folded epoch (a
    // crash between compaction and the streaming checkpoint commit
    // re-delivers it — re-applying would duplicate rows whenever the
    // replayed batch is not byte-identical, e.g. processing-time stamps).
    // The committed compact segment names carry the folded high-water
    // epoch, so the fence survives with no extra metadata.
    val fence = committedSegments(spark, storePath)
      .filter(_.startsWith("compact-")).flatMap(parseEpoch)
    if (fence.nonEmpty && epochId <= fence.max) return // folded: replay, skip
    writeKeysManifest(spark, storePath, keyCols)
    val seg = new Path(segDir(storePath), name)
    val tmp = new Path(segDir(storePath), s".tmp-$name")
    batch.dropDuplicates(keyCols)
      .withColumn(EpochCol, lit(epochId))
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(seg, true) // uncommitted leftover from a crashed attempt
    // Hadoop rename signals most failures by returning false, not
    // throwing; committing a marker over a failed rename would create a
    // committed epoch with no data and every read would fail permanently
    require(fs.rename(tmp, seg), s"rename $tmp -> $seg failed")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close() // marker last: the commit point
  }

  /** Epoch-less convenience (tests/ad-hoc batch use): allocates the next
    * epoch after the highest committed one. Streaming callers pass the
    * `foreachBatch` epochId to the overload above instead.
    */
  def upsert(spark: SparkSession, storePath: String, keyCols: Seq[String],
             batch: DataFrame): Unit = {
    val next = committedSegments(spark, storePath)
      .flatMap(parseEpoch).reduceOption(_ max _).map(_ + 1).getOrElse(0L)
    upsert(spark, storePath, keyCols, batch, next)
  }

  /** Per-key winners of the union of `segs`: the row of the highest epoch,
    * keeping its epoch stamp. One shuffle on the key — shared by [[read]]
    * and [[compact]] so LWW tie-breaking can never diverge between them.
    */
  private def winners(spark: SparkSession, storePath: String,
                      segs: Seq[String]): DataFrame = {
    val keyCols = readKeysManifest(spark, storePath)
    val df = spark.read.parquet(segs.map(n => new Path(segDir(storePath), n).toString): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(EpochCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Last-writer-wins view: per key, the row of the highest committed epoch
    * (ONE shuffle on the key). Duplicate identical rows from an interrupted
    * compaction collapse here too.
    */
  def read(spark: SparkSession, storePath: String): DataFrame = {
    val segs = committedSegments(spark, storePath)
    require(segs.nonEmpty, s"no committed segments at $storePath")
    winners(spark, storePath, segs).drop(EpochCol)
  }

  /** Fold every committed segment into one segment of per-key winners.
    * Winners keep their ORIGINAL epoch stamps (LWW ordering vs segments
    * appended later is unaffected); the compacted segment commits before
    * its inputs are retired, so readers see a consistent store at every
    * crash point (at worst: winners duplicated until cleanup re-runs).
    * The output name is uniquified against the live segment set — a
    * re-run over a crash-recovered store (or after an epoch replay)
    * whose max epoch is unchanged must never reuse a committed name: it
    * would first overwrite the committed data it is reading and then
    * retire its own output. Run out-of-band (a maintenance job), never
    * on the hot write path.
    */
  def compact(spark: SparkSession, storePath: String): Unit = {
    val segs = committedSegments(spark, storePath)
    if (segs.size <= 1) return
    val fs = fsOf(spark, new Path(storePath))
    val maxEpoch = segs.flatMap(parseEpoch).max
    val base = s"compact-$maxEpoch"
    val name =
      if (!segs.contains(base)) base
      else Iterator.from(1).map(i => s"$base-$i").find(n => !segs.contains(n)).get
    val tmp = new Path(segDir(storePath), s".tmp-$name")
    val seg = new Path(segDir(storePath), name)
    winners(spark, storePath, segs).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(seg, true) // unreferenced leftover (no marker yet): safe
    require(fs.rename(tmp, seg), s"rename $tmp -> $seg failed")
    fs.create(new Path(commitsDir(storePath), name), true).close() // commit
    // retire inputs (markers first, then data); `name` is provably not in
    // `segs` — the uniquifier above guarantees it — so no self-retirement
    // case exists. Replay protection for the retired epochs moves to the
    // compact segment's own name (see the fence check in upsert).
    segs.foreach { n =>
      fs.delete(new Path(commitsDir(storePath), n), false)
      fs.delete(new Path(segDir(storePath), n), true)
    }
  }

  /** Number of committed segments (compaction/test observability). */
  def segmentCount(spark: SparkSession, storePath: String): Int =
    committedSegments(spark, storePath).size

  /** Rows in one committed segment — lets tests assert per-batch write
    * volume scales with the batch, not the store.
    */
  def segmentRows(spark: SparkSession, storePath: String, epochId: Long): Long =
    spark.read.parquet(new Path(segDir(storePath), epochId.toString).toString).count()

  def exists(spark: SparkSession, storePath: String): Boolean =
    committedSegments(spark, storePath).nonEmpty
}

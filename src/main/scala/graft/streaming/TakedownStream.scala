package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING takedown ingestion — the deployment shape of
  * [[graft.operators.Takedown]]: erasure requests do not arrive in
  * batches, they trickle in (a legal queue, an opt-out form, a DMCA
  * feed), and each one must take effect at the NEXT serving call, not at
  * the next index rebuild. Requests land as epoch-partitioned tombstone
  * deltas; serving reads the GROWN tombstone view (base ∪ deltas,
  * merge-on-read) into [[graft.operators.Takedown.suppress]] /
  * `topKWithTakedown`, so suppression latency is one micro-batch.
  *
  * Tombstones are pure SETS, which makes this the simplest member of the
  * grown-view family: no replay fence is needed (a crashed-and-replayed
  * epoch overwrites its own delta, and a duplicate doc_id across epochs
  * is idempotent under the distinct-on-read view), no cross-delta
  * aggregation exists, and the per-epoch dedup is request-scaled.
  *
  * Compaction folds base + deltas into a new committed base. The
  * ordering contract matters MORE here than for the index siblings: a
  * reader still pointed at the old base after the deltas are cleared
  * would UN-SUPPRESS every folded erasure — a compliance violation, not
  * a performance bug. So: commit `newBaseDir`, move every reader, and
  * only then clear the delta dir ([[compact]] itself commits before
  * deleting; the reader migration between those steps is the deployment
  * contract, as in [[CrawlDedup.compact]]'s stop-compact-restart).
  */
object TakedownStream {

  /** Start the takedown stream over `requests` (a streaming frame with
    * `doc_id` and `reason`). Outputs epoch-partitioned tombstone deltas
    * under `outDir/tombstones_delta/`.
    */
  def start(requests: DataFrame, outDir: String,
            checkpointDir: Option[String] = None): StreamingQuery =
    requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        runBatch(batch.toDF(), outDir, epoch)
      }
      .start()

  /** One micro-batch (factored out so batch specs can drive it
    * directly): dedup the batch's requests per doc_id (min reason —
    * deterministic under re-ordered duplicates) and write the epoch's
    * tombstone delta.
    */
  def runBatch(batch: DataFrame, outDir: String, epoch: Long): Unit =
    batch.select(col("doc_id"), col("reason"))
      .groupBy("doc_id").agg(min(col("reason")).as("reason"))
      .write.mode("overwrite").parquet(s"$outDir/tombstones_delta/epoch=$epoch")

  /** The GROWN tombstone view: committed base (absent is fine — a fresh
    * deployment starts with no erasures) ∪ all epoch deltas, one row per
    * doc_id. Feed it to [[graft.operators.Takedown.suppress]] or
    * `topKWithTakedown` — every serving call sees every request ingested
    * up to the last completed epoch.
    */
  def grownTombstones(spark: SparkSession, baseDir: String,
                      outDir: String): DataFrame = {
    val parts = Seq(existing(spark, s"$baseDir/tombstones"),
      existing(spark, s"$outDir/tombstones_delta")).flatten
    parts match {
      case Nil => spark.range(0).select(col("id").as("doc_id"),
        lit("").as("reason"))
      case head :: tail =>
        tail.foldLeft(head)(_ unionByName _)
          .groupBy("doc_id").agg(min(col("reason")).as("reason"))
    }
  }

  /** COMPACTION — fold base + deltas into a NEW committed tombstone base
    * and clear the folded deltas. Commit-before-delete; see the class
    * doc for the reader-migration ordering (erasures must never
    * reappear).
    *
    * Two erasure-loss defenses beyond the sibling stores (round-13
    * ADVICE 2 — losing a tombstone UN-SUPPRESSES an erasure, a
    * compliance violation, so the doc-only ordering contract is not
    * enough here):
    *  - the stop-first contract is ENFORCED
    *    ([[StreamGuard.requireStopped]] — refuses while the session
    *    still runs the query checkpointed under `outDir`);
    *  - the fold is EPOCH-SCOPED: the epoch dirs are listed ONCE, the
    *    fold reads exactly that list, and only those dirs are deleted —
    *    an epoch delta written between the fold and the delete (a
    *    foreign writer, or a race the same-session guard cannot see)
    *    survives for the next compaction instead of being silently
    *    swallowed by a recursive delta-dir delete.
    */
  def compact(spark: SparkSession, baseDir: String, outDir: String,
              newBaseDir: String, stamp: String = "compact",
              checkpointDir: Option[String] = None): Unit = {
    StreamGuard.requireStopped(spark,
      checkpointDir.getOrElse(s"$outDir/_checkpoint"),
      "TakedownStream.compact")
    val deltaDir = new Path(s"$outDir/tombstones_delta")
    val fs = deltaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochDirs =
      if (fs.exists(deltaDir))
        fs.listStatus(deltaDir).filter(_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith("epoch=")).sortBy(_.getName).toSeq
      else Seq.empty
    val deltas =
      if (epochDirs.isEmpty) None
      else Some(spark.read.parquet(epochDirs.map(_.toString): _*)
        .select(col("doc_id"), col("reason")))
    val parts = existing(spark, s"$baseDir/tombstones").toSeq ++ deltas
    val folded = parts match {
      case Nil => spark.range(0).select(col("id").as("doc_id"),
        lit("").as("reason"))
      case head +: tail =>
        tail.foldLeft(head)(_ unionByName _)
          .groupBy("doc_id").agg(min(col("reason")).as("reason"))
    }
    folded.write.mode("overwrite").parquet(s"$newBaseDir/tombstones")
    graft.sources.SnapshotStore.commit(spark, newBaseDir, stamp)
    epochDirs.foreach(p => fs.delete(p, true))
    // only if nothing arrived since the listing does the parent go too —
    // a late epoch keeps the dir and survives into the next compaction
    if (fs.exists(deltaDir) && fs.listStatus(deltaDir).isEmpty)
      fs.delete(deltaDir, true)
  }

  private def existing(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      Some(spark.read.parquet(dir).drop("epoch")
        .select(col("doc_id"), col("reason")))
    else None
  }
}

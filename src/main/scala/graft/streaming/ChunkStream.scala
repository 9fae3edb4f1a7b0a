package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Passage

/** STREAMING passage-index growth — the stream-grown-index discipline
  * applied to the RAG family: [[PassageStream]] serves queries from a
  * FROZEN passage snapshot, and without this service a crawled document's
  * passages only became retrievable at the next snapshot rebuild. Each
  * micro-batch of (doc_id, text) rows is chunked, tower-embedded and
  * sign-LSH-banded with the SAME closed-form geometry the base index was
  * built with ([[Passage.chunkVectors]]/[[Passage.chunkBands]] — the
  * planes are a pure function of (nbits, dims), so delta and base rows
  * are commensurable by construction, the [[EncodeStream]] argument with
  * nothing to freeze), and the chunk vectors + band triples land in
  * epoch-partitioned overwrite parquet. The serving view is base ∪ epoch
  * deltas, merged on read — a streamed document's passages answer
  * [[Passage.passageTopKForQueries]] the epoch after it arrives.
  *
  * Write order is vectors FIRST, bands LAST: candidates come from the
  * band side and fetch vectors by inner join, so an epoch whose crash
  * window left vectors without bands is invisible (no candidates), and
  * bands-without-vectors cannot exist — the band write is the epoch's
  * commit marker (the grownSearchIndex torn-epoch lesson, enforced by
  * ordering instead of a read-side guard because two tables joined by
  * inner semantics need no third).
  *
  * Effectively-once: epoch-overwrite replay ([[CrawlDedup]]'s argument);
  * a batch reads nothing but itself — chunk/embed/band are narrow
  * projections — so a replay cannot self-match anything. Streamed
  * doc_ids share the corpus id space and must not collide with base ids
  * (the [[IndexStream]] contract: the crawl allocates fresh ids).
  *
  * Scale shape: per batch, work ∝ batch tokens/stride (the bounded chunk
  * explode) plus nbits codegen'd plane dots per chunk — no shuffle, no
  * state; the stream scales by documents/second alone.
  */
object ChunkStream {

  /** Start the passage-growth stream over `docs` (a streaming frame with
    * `doc_id`/`text`). Deltas land under `outDir/vectors_delta/epoch=<N>`
    * and `outDir/bands_delta/epoch=<N>`.
    */
  def start(docs: DataFrame, outDir: String,
            maxTokens: Int = 32, overlap: Int = 8, dims: Int = 16,
            nbits: Int = 16, bandBits: Int = 4,
            checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        runBatch(batch.toDF(), outDir, epoch, maxTokens, overlap, dims,
          nbits, bandBits)
      }
      .start()

  /** One micro-batch (factored out so batch specs can drive it directly):
    * chunk + embed the batch, write its vector delta, then derive and
    * write its band delta from the READ-BACK vectors (staging discipline
    * AND the commit-marker ordering above).
    */
  def runBatch(batch: DataFrame, outDir: String, epoch: Long,
               maxTokens: Int = 32, overlap: Int = 8, dims: Int = 16,
               nbits: Int = 16, bandBits: Int = 4): Unit = {
    val spark = batch.sparkSession
    Passage.chunkVectors(batch, maxTokens, overlap, dims)
      .write.mode("overwrite").parquet(s"$outDir/vectors_delta/epoch=$epoch")
    Passage.chunkBands(
        spark.read.parquet(s"$outDir/vectors_delta/epoch=$epoch"),
        nbits, bandBits, dims)
      .write.mode("overwrite").parquet(s"$outDir/bands_delta/epoch=$epoch")
  }

  private def existing(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.isDirectory))
      Some(spark.read.parquet(dir).drop("epoch"))
    else None
  }

  /** The GROWN passage tables: base ∪ epoch deltas (merge-on-read), fed
    * straight to [[Passage.passageTopKForQueries]]. The `topk` member is
    * the BASE's default answer unchanged (likewise `liTopk`) — the
    * default-parameter artifacts are snapshot-rebuild outputs
    * ([[compact]] re-derives them); arbitrary queries over the grown
    * view are the any-time path.
    */
  def grownTables(spark: SparkSession, base: Passage.PassageTables,
                  outDir: String): Passage.PassageTables =
    Passage.PassageTables(
      vectors = existing(spark, s"$outDir/vectors_delta")
        .map(base.vectors.unionByName(_)).getOrElse(base.vectors),
      bands = existing(spark, s"$outDir/bands_delta")
        .map(base.bands.unionByName(_)).getOrElse(base.bands),
      topk = base.topk, liTopk = base.liTopk, distill = base.distill)

  /** COMPACTION — fold the base family + epoch deltas into a NEW
    * committed family dir: vectors and bands union-fold, and the
    * default-parameter `topk` answer is RE-DERIVED from the folded
    * tables, as is the MaxSim default (both must reflect the grown
    * corpus — the derived members).
    * Commit-before-delete; stop the stream first and restart it against
    * `newBaseDir` ([[CrawlDedup.compact]]'s stale-base argument).
    */
  def compact(spark: SparkSession, baseDir: String, outDir: String,
              newBaseDir: String, stamp: String = "compact",
              numQueries: Int = 5, k: Int = 10, maxPerDoc: Int = 2,
              checkpointDir: Option[String] = None): Unit = {
    // refuse under a live stream (round-13 verdict 2; see CrawlDedup)
    StreamGuard.requireStopped(spark,
      checkpointDir.getOrElse(s"$outDir/_checkpoint"), "ChunkStream.compact")
    val base = Passage.loadPassage(spark, baseDir)
    val grown = grownTables(spark, base, outDir)
    grown.vectors.write.mode("overwrite").parquet(s"$newBaseDir/vectors")
    grown.bands.write.mode("overwrite").parquet(s"$newBaseDir/bands")
    // read-back staging (loadPassage would demand the not-yet-written topk)
    Passage.passageTopKServeFrom(
        spark.read.parquet(s"$newBaseDir/vectors"),
        spark.read.parquet(s"$newBaseDir/bands"),
        numQueries, k, maxPerDoc)
      .write.mode("overwrite").parquet(s"$newBaseDir/topk")
    Passage.lateInteractionTopK(
        spark.read.parquet(s"$newBaseDir/vectors"),
        spark.read.parquet(s"$newBaseDir/bands"), numQueries, k)
      .write.mode("overwrite").parquet(s"$newBaseDir/li_topk")
    Passage.distillPairs(
        spark.read.parquet(s"$newBaseDir/vectors"),
        spark.read.parquet(s"$newBaseDir/topk"))
      .write.mode("overwrite").parquet(s"$newBaseDir/distill")
    graft.sources.SnapshotStore.commit(spark, newBaseDir, stamp)
    Seq("vectors_delta", "bands_delta").foreach { d =>
      val dp = new Path(s"$outDir/$d")
      dp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dp, true)
    }
  }
}

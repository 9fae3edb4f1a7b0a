package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** STREAMING PQ-encode serving — the vector-side [[TokenizeStream]]: a
  * stream of (vec_id, embedding) rows is product-quantized per
  * micro-batch against the FROZEN per-subspace codebooks (the persisted
  * `graft_pq` artifact the registry trains once per corpus snapshot), and
  * the 8-code rows land in epoch-partitioned overwrite parquet
  * (idempotent crash replay — the [[CrawlDedup]] discipline).
  *
  * The codebooks are deliberately NOT retrained per batch: PQ codes must
  * be commensurable across the stream's lifetime — per-batch codebooks
  * would place the same vector in different cells from epoch to epoch,
  * and every ADC consumer (the compressed scan, IVFPQ) compares stored
  * codes against query LUTs built from ONE codebook generation. A
  * codebook refresh is a batch re-encode of the corpus
  * ([[Similarity.persistPq]]), not a streaming concern.
  *
  * Zero-norm vectors are unanswerable under cosine and encode to no row
  * (the family rule) — the stream never emits garbage codes for them.
  *
  * Scale shape: per batch, the packed codebook is a constants-bounded
  * 1-row broadcast (m·k·dsub doubles) and encode is a projection over
  * the batch scan — zero shuffle of the batch, no state accumulates, so
  * the stream scales by vectors/second alone.
  */
object EncodeStream {

  /** Start the encode stream over `vecs` (a streaming frame with
    * `vec_id`/`embedding`), coding against the codebooks at
    * `codebookDir` (the `codebooks` table of the persisted PQ family).
    * Codes land under `outDir/codes/epoch=<N>`.
    */
  def start(vecs: DataFrame, codebookDir: String, outDir: String,
            m: Int = 8, dim: Int = 64,
            checkpointDir: Option[String] = None): StreamingQuery = {
    val spark = vecs.sparkSession
    val codebooks = spark.read.parquet(codebookDir)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        runBatch(batch.toDF(), codebooks, outDir, epoch, m, dim)
      }
      .start()
  }

  /** One micro-batch (factored out so batch specs can drive it directly). */
  def runBatch(batch: DataFrame, codebooks: DataFrame, outDir: String,
               epoch: Long, m: Int = 8, dim: Int = 64): Unit =
    Similarity.pqEncode(batch, codebooks, m, dim)
      .write.mode("overwrite").parquet(s"$outDir/codes/epoch=$epoch")
}

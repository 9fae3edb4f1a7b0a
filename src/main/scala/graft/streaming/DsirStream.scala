package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** STREAMING DSIR selection — the data-selection deployment composition:
  * a stream of (doc_id, text) candidate documents is scored per
  * micro-batch by [[Corpus.dsirWeightsFrom]] against a FROZEN
  * [[Corpus.persistDsirModel]]-ed importance model and split at a weight
  * threshold into `selected/` (target-like, kept for the training mix)
  * and `rejected/` (audit rows with their weights) — both
  * epoch-partitioned overwrite parquet, the [[CrawlDedup]]
  * idempotent-replay discipline.
  *
  * The importance model is deliberately NOT re-estimated per batch:
  * weights must be commensurable across the stream's lifetime (the
  * [[FluencyStream]] frozen-model argument — a per-batch raw
  * distribution would score each batch against a different denominator,
  * and a batch of junk would normalize itself plausible). This mirrors
  * the published method, which fits the importance estimator once and
  * then scores the full pool. Documents whose buckets the model never
  * saw score the Laplace floor; threshold 1.0 means "more likely under
  * the target distribution than the raw one".
  *
  * Scale shape: per batch, model-side cost is two ≤buckets-row count
  * scans (broadcast) and batch-side cost ∝ batch tokens; the model is
  * read-only, no state accumulates, so the stream scales by
  * documents/second alone.
  */
object DsirStream {

  /** Start the selection stream over `docs` (a streaming frame with
    * `doc_id`/`text`), scoring against the model at `modelDir`. Kept
    * docs land under `outDir/selected/epoch=<N>`, dropped ones with
    * weights under `outDir/rejected/epoch=<N>`.
    */
  def start(docs: DataFrame, modelDir: String, outDir: String,
            threshold: Double = 1.0,
            checkpointDir: Option[String] = None): StreamingQuery = {
    val spark = docs.sparkSession
    val model = Corpus.loadDsirModel(spark, modelDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        runBatch(batch.toDF(), model, outDir, epoch, threshold)
      }
      .start()
  }

  /** One micro-batch (factored out so batch specs can drive it directly):
    * score, gate, write both sides under `epoch=<N>`. A document too
    * short to have bigrams has no weight — it rejects (with null weight),
    * matching the batch operator's drop-out semantics while keeping the
    * stream lossless: every input row lands in exactly one output.
    */
  def runBatch(batch: DataFrame, model: Corpus.DsirModel, outDir: String,
               epoch: Long, threshold: Double = 1.0): Unit = {
    // barrier: the batch feeds scoring AND the audit join — materialize
    // once so a real source (kafka) is not re-read per consumer
    val delta = batch.localCheckpoint()
    val scored = delta.join(
      Corpus.dsirWeightsFrom(model, delta).select("doc_id", "dsir_weight"),
      Seq("doc_id"), "left")
      .localCheckpoint() // scoring runs once, not once per output side
    scored.filter(col("dsir_weight") >= threshold)
      .write.mode("overwrite").parquet(s"$outDir/selected/epoch=$epoch")
    scored.filter(col("dsir_weight").isNull || col("dsir_weight") < threshold)
      .write.mode("overwrite").parquet(s"$outDir/rejected/epoch=$epoch")
  }
}

package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Corpus, Dedup}

/** STREAMING leakage-safe split assignment (r15 verdict 4) — the ingest
  * counterpart of [[Corpus.leakageSafeSplit]]: a stream of
  * (doc_id, text) documents is assigned `train`/`val`/`test` AT INGEST,
  * and a new document that near-dups an existing near-dup cluster
  * INHERITS that cluster's split key — so a freshly-crawled paraphrase
  * of a test document can never land in train, which is the entire
  * point of the cluster-keyed split. Without this member, the batch
  * split is leakage-safe but every post-split arrival re-opens the
  * hole.
  *
  * Frozen artifacts (the [[DsirStream]] discipline): the corpus
  * signature index ([[Dedup.buildDedupIndex]] parquet — the SAME table
  * [[CrawlDedup]] dedups against) and the persisted cluster assignment
  * (`doc_id`, `cluster_id` — [[Dedup.clustersFromPairs]] over the
  * verified pairs, the table `q_safe_split` reads). Both are captured
  * once at stream start; the split hash itself is
  * [[Corpus.splitOfKey]] — the ONE site [[Corpus.dataSplit]] and
  * [[Corpus.leakageSafeSplit]] share, so the stream can never disagree
  * with the batch split on where a key lands.
  *
  * Matching is [[Dedup.dedupDelta]] (exact content-hash + LSH-banded
  * near), per batch against base index ∪ earlier epochs' appended
  * signature deltas — the [[CrawlDedup]] growth discipline, here so a
  * near-dup PAIR OF NEW DOCUMENTS arriving in different batches also
  * co-locates: the first keys by its own id, its signature and
  * assigned key are appended, and the second inherits through the
  * match. A matched corpus document's key resolves
  * `cluster_id → stream-assigned key → own id` (base clusters, then
  * key deltas, then identity — exactly [[Corpus.leakageSafeSplit]]'s
  * coalesce extended by the stream's own history); a document matching
  * several corpus docs takes the MINIMUM resolved key
  * (deterministic; when the matches span two existing clusters a batch
  * recompute would merge them, but an ingest assigner must never MOVE
  * already-assigned documents, so it co-locates with one — the frozen-
  * artifact stability-over-recompute tradeoff, same as
  * [[Corpus.evalHoldout]] vs a re-split).
  *
  * Effectively-once: every per-epoch output lands in its own
  * `epoch=<N>` dir with mode=overwrite, and the index/key unions read
  * strictly-earlier epochs only, so a replayed micro-batch reproduces
  * its original assignment instead of matching its own half-written
  * rows ([[CrawlDedup]]'s replay argument verbatim — spec'd).
  *
  * Scale shape: per batch, corpus-side cost ∝ |index| signature rows
  * (never corpus text), delta-side ∝ |batch|; the cluster table and key
  * deltas join by equi-key. Nothing accumulates driver state; the
  * appended deltas are the same compact-when-quiet maintenance surface
  * as [[CrawlDedup.compact]].
  */
object SplitStream {

  /** Start the split-assignment stream over `docs` (a streaming frame
    * with `doc_id`/`text`), matching against the signature index at
    * `baseIndexDir` and inheriting keys from the cluster assignment at
    * `clustersDir`. Outputs under `outDir`: `assigned/` (doc_id,
    * split_key, split), `index_delta/`, `key_delta/` — all
    * epoch-partitioned.
    */
  def start(docs: DataFrame, baseIndexDir: String, clustersDir: String,
            outDir: String, trainPct: Int = 90, valPct: Int = 5,
            threshold: Double = 0.8,
            checkpointDir: Option[String] = None): StreamingQuery = {
    val spark = docs.sparkSession
    val base = spark.read.parquet(baseIndexDir)
    val clusters = spark.read.parquet(clustersDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        runBatch(batch.toDF(), base, clusters, outDir, epoch, trainPct,
          valPct, threshold)
      }
      .start()
  }

  /** One micro-batch (factored out so batch specs can drive it
    * directly): match, resolve keys, assign, write the assignment and
    * the batch's own signature/key deltas under `epoch=<N>` dirs.
    */
  def runBatch(batch: DataFrame, baseIndex: DataFrame, clusters: DataFrame,
               outDir: String, epoch: Long, trainPct: Int = 90,
               valPct: Int = 5, threshold: Double = 0.8): Unit = {
    val spark = batch.sparkSession
    val grown = unionDeltas(spark, baseIndex, s"$outDir/index_delta", epoch)
    val streamKeys = keyDeltas(spark, s"$outDir/key_delta", epoch)
    // barrier: the batch feeds the match AND the assignment join —
    // persist (not localCheckpoint: DsirStream's storage-reclaim
    // argument) so a real source is not re-read per consumer
    val delta = batch.persist()
    try {
      // corpus key resolution: base cluster id, else the key this stream
      // assigned the matched doc earlier, else the matched doc's own id
      val corpusKeys = Dedup.dedupDelta(grown, delta, threshold)
        .select(col("corpus_id"), col("delta_id"))
        .join(clusters.select(col("doc_id").as("corpus_id"),
          col("cluster_id")), Seq("corpus_id"), "left")
        .join(streamKeys.select(col("doc_id").as("corpus_id"),
          col("split_key").as("stream_key")), Seq("corpus_id"), "left")
        .select(col("delta_id"),
          coalesce(col("cluster_id"), col("stream_key"), col("corpus_id"))
            .as("k"))
        .groupBy("delta_id").agg(min("k").as("inherited_key"))
      val carried = delta.columns.filter(_ != "text").map(col).toIndexedSeq
      val assigned = delta
        .join(corpusKeys.withColumnRenamed("delta_id", "doc_id"),
          Seq("doc_id"), "left")
        .select(carried :+
          coalesce(col("inherited_key"), col("doc_id")).as("split_key"): _*)
        .withColumn("split",
          Corpus.splitOfKey(col("split_key"), trainPct, valPct))
        .persist() // feeds the assignment write AND the key delta
      try {
        assigned.write.mode("overwrite")
          .parquet(s"$outDir/assigned/epoch=$epoch")
        // the batch enters the match universe. Signatures need text,
        // which the assignment output deliberately drops, so the sketch
        // reads the persisted batch (not a read-back) — the one member
        // where the staging source and the store schema differ
        Dedup.buildDedupIndex(delta)
          .write.mode("overwrite").parquet(s"$outDir/index_delta/epoch=$epoch")
        assigned.select("doc_id", "split_key")
          .write.mode("overwrite").parquet(s"$outDir/key_delta/epoch=$epoch")
      } finally assigned.unpersist()
    } finally delta.unpersist()
  }

  /** COMPACTION — fold the base signature index plus the stream's
    * appended signature deltas into a new committed base index, and the
    * cluster assignment plus the appended key deltas into a new
    * committed cluster table (a stream-assigned doc's `split_key` IS its
    * cluster representative: `leakageSafeSplit`'s coalesce makes
    * `cluster_id = split_key` rows exactly equivalent to the key-delta
    * lookup they replace) — so the per-batch delta unions drop back to
    * one snapshot scan each. Same contract as [[CrawlDedup.compact]]:
    * NOT safe while the stream runs ([[start]] captures both bases once
    * — enforced via [[StreamGuard.requireStopped]]); commit lands before
    * any delta is removed, so a crash between the steps leaves both and
    * re-running compact restores the invariant. Restart with
    * `baseIndexDir = <newBaseDir>/index`,
    * `clustersDir = <newBaseDir>/clusters`; assignments are unchanged
    * by construction (spec'd).
    */
  def compact(spark: SparkSession, baseIndexDir: String, clustersDir: String,
              outDir: String, newBaseDir: String, stamp: String = "compact",
              checkpointDir: Option[String] = None): Unit = {
    StreamGuard.requireStopped(spark,
      checkpointDir.getOrElse(s"$outDir/_checkpoint"), "SplitStream.compact")
    unionDeltas(spark, spark.read.parquet(baseIndexDir),
        s"$outDir/index_delta", beforeEpoch = Long.MaxValue)
      .write.mode("overwrite").parquet(s"$newBaseDir/index")
    // distinct: a corpus doc replayed through the stream carries its
    // batch-equal key in BOTH sources (the parity contract), so the
    // union can only duplicate equal rows — collapse them once here
    spark.read.parquet(clustersDir)
      .unionByName(keyDeltas(spark, s"$outDir/key_delta",
          beforeEpoch = Long.MaxValue)
        .select(col("doc_id"), col("split_key").as("cluster_id")))
      .distinct()
      .write.mode("overwrite").parquet(s"$newBaseDir/clusters")
    graft.sources.SnapshotStore.commit(spark, newBaseDir, stamp)
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$outDir/index_delta"), true)
    fs.delete(new Path(s"$outDir/key_delta"), true)
  }

  /** Base signature index ∪ strictly-earlier epoch deltas (the
    * [[CrawlDedup]] replay-safe union — a replayed epoch must not match
    * its own previously-appended rows).
    */
  private def unionDeltas(spark: SparkSession, base: DataFrame,
                          deltaDir: String, beforeEpoch: Long): DataFrame = {
    val p = new Path(deltaDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.isDirectory))
      base.unionByName(spark.read.parquet(deltaDir)
        .filter(col("epoch") < beforeEpoch).drop("epoch"))
    else base
  }

  /** Stream-assigned (doc_id, split_key) rows of strictly-earlier
    * epochs; empty on the first batch.
    */
  private def keyDeltas(spark: SparkSession, deltaDir: String,
                        beforeEpoch: Long): DataFrame = {
    val p = new Path(deltaDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.isDirectory))
      spark.read.parquet(deltaDir)
        .filter(col("epoch") < beforeEpoch)
        .select("doc_id", "split_key")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("split_key",
            org.apache.spark.sql.types.LongType))))
  }
}

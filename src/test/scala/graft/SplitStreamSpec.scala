package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup}
import graft.streaming.SplitStream

/** Streaming leakage-safe split assignment (r15 verdict 4): ingest-time
  * train/val/test assignment that inherits the near-dup cluster's split
  * key from the frozen artifacts, grows its own match universe across
  * batches, and replays idempotently.
  */
class SplitStreamSpec extends SparkSpec {
  import spark.implicits._

  private def text(tag: String): String = (1 to 40).map(i => s"$tag$i").mkString(" ")
  private def near(tag: String): String =
    (text(tag).split(" ").dropRight(2) :+ "zz" :+ "qq").mkString(" ")

  /** corpus with one genuine near-dup cluster {1, 2} and a singleton 3,
    * its signature index, and its converged cluster assignment — the
    * exact artifact pair `q_safe_split` reads.
    */
  private def fixture(): (String, org.apache.spark.sql.DataFrame) = {
    val base = Files.createTempDirectory("splitstream").toString
    val corpus = Seq(
      (1L, "en", text("alpha")), (2L, "en", near("alpha")),
      (3L, "en", text("gamma"))).toDF("doc_id", "lang", "text")
    Dedup.buildDedupIndex(corpus).write.parquet(s"$base/index")
    Dedup.clustersFromPairs(
        Dedup.minhashPairs(corpus).select("doc_id1", "doc_id2"))
      .write.parquet(s"$base/clusters")
    (base, corpus)
  }

  test("epoch ≡ batch parity: replaying the corpus through the stream " +
    "reproduces leakageSafeSplit's assignment exactly") {
    val (base, corpus) = fixture()
    val baseIndex = spark.read.parquet(s"$base/index")
    val clusters = spark.read.parquet(s"$base/clusters")
    SplitStream.runBatch(corpus, baseIndex, clusters, s"$base/out", epoch = 0L)
    val got = spark.read.parquet(s"$base/out/assigned")
      .select("doc_id", "split_key", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val want = Corpus.leakageSafeSplit(corpus, clusters)
      .select("doc_id", "split_key", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == want, s"stream assignment must equal the batch split: $got vs $want")
    // non-vacuity: the fixture really exercises the cluster path
    assert(want(2L)._1 == 1L && want(3L)._1 == 3L)
  }

  test("a new near-dup of an existing cluster inherits the cluster's key; " +
    "novel documents key by their own id; co-location holds across batches") {
    implicit val sqlCtx = spark.sqlContext
    val (base, _) = fixture()
    val input = MemoryStream[(Long, String)]
    val q = SplitStream.start(input.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/clusters", s"$base/out")
    try {
      // batch 0: a fresh paraphrase of cluster {1,2} + a novel doc
      input.addData((30L, near("alpha")), (31L, text("delta")))
      q.processAllAvailable()
      // batch 1: a near-dup of batch 0's NOVEL doc — only the appended
      // signature/key deltas can co-locate it
      input.addData((40L, near("delta")))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/out/assigned")
        .select("doc_id", "split_key", "split").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got(30L)._1 == 1L, s"cluster paraphrase must inherit key 1: $got")
      assert(got(31L)._1 == 31L, s"novel doc keys by its own id: $got")
      assert(got(40L)._1 == 31L,
        s"cross-batch near-dup must inherit the FIRST arrival's key: $got")
      // the invariant the operator exists for: near-dups share a side
      assert(got(40L)._2 == got(31L)._2 && got(30L)._2 ==
        Seq((1L, 1L)).toDF("doc_id", "split_key")
          .withColumn("split", Corpus.splitOfKey(col("split_key")))
          .collect().head.getString(2),
        s"co-location + shared hash site: $got")
    } finally q.stop()
  }

  test("a replayed epoch reproduces its assignment instead of matching " +
    "its own appended deltas (crash recovery)") {
    val (base, _) = fixture()
    val baseIndex = spark.read.parquet(s"$base/index")
    val clusters = spark.read.parquet(s"$base/clusters")
    val b0 = Seq((30L, text("delta"))).toDF("doc_id", "text")
    val b1 = Seq((40L, near("delta")), (41L, text("omega"))).toDF("doc_id", "text")
    SplitStream.runBatch(b0, baseIndex, clusters, s"$base/out", epoch = 0L)
    SplitStream.runBatch(b1, baseIndex, clusters, s"$base/out", epoch = 1L)
    def state(): Map[(Long, Long), (Long, String)] =
      spark.read.parquet(s"$base/out/assigned")
        .select("doc_id", "split_key", "split", "epoch").collect()
        .map(r => (r.getLong(0), r.getAs[Number]("epoch").longValue()) ->
          (r.getLong(1), r.getString(2))).toMap
    val before = state()
    assert(before((40L, 1L))._1 == 30L, s"epoch-1 doc inherits epoch 0's key: $before")
    // crash-replay of the last epoch: its own epoch-1 index/key deltas
    // exist on disk, but the strictly-earlier union must hide them
    SplitStream.runBatch(b1, baseIndex, clusters, s"$base/out", epoch = 1L)
    assert(state() == before, "replay must be idempotent")
  }

  test("compact folds the deltas into new bases; assignments on the folded " +
    "bases are unchanged, and compact refuses under a live stream") {
    implicit val sqlCtx = spark.sqlContext
    val (base, _) = fixture()
    // a live stream holds the checkpoint: compact must refuse
    val input = MemoryStream[(Long, String)]
    val q = SplitStream.start(input.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/clusters", s"$base/out")
    try {
      input.addData((30L, text("delta")))
      q.processAllAvailable()
      intercept[IllegalStateException] {
        SplitStream.compact(spark, s"$base/index", s"$base/clusters",
          s"$base/out", s"$base/folded")
      }
    } finally q.stop()
    SplitStream.compact(spark, s"$base/index", s"$base/clusters",
      s"$base/out", s"$base/folded")
    assert(graft.sources.SnapshotStore.ready(spark, s"$base/folded", "compact"))
    // the stream doc's key is now a first-class cluster row, and its
    // signature is in the folded index: a near-dup arriving against the
    // FOLDED bases (empty deltas, fresh outDir) inherits the same key
    val fIndex = spark.read.parquet(s"$base/folded/index")
    val fClusters = spark.read.parquet(s"$base/folded/clusters")
    SplitStream.runBatch(Seq((50L, near("delta"))).toDF("doc_id", "text"),
      fIndex, fClusters, s"$base/out2", epoch = 0L)
    val got = spark.read.parquet(s"$base/out2/assigned")
      .select("doc_id", "split_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(50L -> 30L),
      s"the folded bases must carry the stream doc's key forward: $got")
  }
}

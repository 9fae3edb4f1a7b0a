package graft

import java.nio.file.Files
import graft.sources.KeyedUpsertSink

/** Log-structured keyed store semantics (T7 + the round-2 scale fix):
  * per-batch write volume is O(batch) not O(store), replay of a committed
  * epoch is a no-op, compaction folds segments without changing the
  * last-writer-wins view.
  */
class LogStoreSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("logstore").toString + "/t"

  test("per-batch write volume scales with the batch, not the store") {
    import spark.implicits._
    val store = tmp()
    // epoch 0: a large base; epochs 1..3: tiny deltas
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      (1 to 1000).map(i => (s"k$i", i)).toDF("k", "v"), 0L)
    (1 to 3).foreach { e =>
      KeyedUpsertSink.upsert(spark, store, Seq("k"),
        Seq((s"k$e", e * 100), ("fresh", e)).toDF("k", "v"), e.toLong)
    }
    // each delta segment persisted exactly its own 2 rows — the O(store)
    // full rewrite would have made every segment ~1001 rows
    (1 to 3).foreach { e =>
      assert(KeyedUpsertSink.segmentRows(spark, store, e.toLong) == 2L,
        s"epoch $e segment must contain only its batch")
    }
    assert(KeyedUpsertSink.segmentRows(spark, store, 0L) == 1000L)
    // LWW view: k1..k3 replaced, fresh keeps the last write
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m.size == 1001)
    assert(m("k1") == 100 && m("k2") == 200 && m("k3") == 300)
    assert(m("fresh") == 3 && m("k999") == 999)
  }

  test("replaying a committed epoch is a no-op (T7)") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 1)).toDF("k", "v"), 5L)
    // foreachBatch re-delivers the same epoch after recovery
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 1)).toDF("k", "v"), 5L)
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    assert(KeyedUpsertSink.read(spark, store).count() == 1)
  }

  test("compaction folds segments to per-key winners without changing the view") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("b", 9), ("c", 3)).toDF("k", "v"), 1L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("c", 7)).toDF("k", "v"), 2L)
    val before = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    KeyedUpsertSink.compact(spark, store)
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    val after = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(after == before && after == Map("a" -> 1, "b" -> 9, "c" -> 7))
    // appends after compaction still win over compacted rows
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 42)).toDF("k", "v"))
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("a" -> 42, "b" -> 9, "c" -> 7))
  }

  test("re-compaction after an epoch replay never destroys the committed store") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("b", 9)).toDF("k", "v"), 1L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("c", 3)).toDF("k", "v"), 2L)
    KeyedUpsertSink.compact(spark, store) // -> compact-2
    // foreachBatch replays epoch 2 after recovery (its marker was retired
    // with the compaction inputs): the compact segment's name carries the
    // folded high-water epoch, so the replay is fenced — even a replay
    // whose content DIFFERS (processing-time stamps) must not re-apply
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("c", 777)).toDF("k", "v"), 2L)
    KeyedUpsertSink.compact(spark, store)
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("a" -> 1, "b" -> 9, "c" -> 3),
      "folded epochs must stay fenced against replay (T7)")
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    // epoch allocation advances past the compacted watermark, and NEW
    // epochs above the fence apply normally
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("d", 4)).toDF("k", "v"))
    assert(KeyedUpsertSink.read(spark, store).count() == 4)
  }

  test("mismatched key columns against an existing store fail fast") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", "x", 1)).toDF("k", "k2", "v"))
    intercept[IllegalArgumentException] {
      KeyedUpsertSink.upsert(spark, store, Seq("k", "k2"), Seq(("a", "y", 2)).toDF("k", "k2", "v"))
    }
  }

  test("scheduled compaction in the streaming topology bounds segment count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new graft.streaming.Pipeline(spark,
      Files.createTempDirectory("store").toString,
      Files.createTempDirectory("ckpt").toString, compactEvery = 2)
    val q = p.startRawEvents(input.toDF())
    def ev(id: Long, t: String) = EventRec(id, java.sql.Timestamp.valueOf(t),
      1L, "click", 50.0, s"""{"k": $id}""")
    try {
      (0 until 6).foreach { b =>
        input.addData(ev(b * 2, s"2024-01-01 10:0$b:00"), ev(b * 2 + 1, s"2024-01-01 10:0$b:30"))
        q.processAllAvailable()
      }
      // 6 epochs at compactEvery=2: segments fold repeatedly instead of
      // accumulating one per epoch
      assert(KeyedUpsertSink.segmentCount(spark, p.rawStorePath) <= 3,
        "compaction must bound read amplification")
      assert(KeyedUpsertSink.read(spark, p.rawStorePath).count() == 12)
    } finally q.stop()
  }

  test("composite keys and epoch-less allocation keep LWW semantics") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k1", "k2"),
      Seq(("a", "x", 1), ("a", "y", 2)).toDF("k1", "k2", "v"))
    KeyedUpsertSink.upsert(spark, store, Seq("k1", "k2"),
      Seq(("a", "x", 10), ("a", "x", 10)).toDF("k1", "k2", "v")) // batch-internal dup
    val rows = KeyedUpsertSink.read(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(rows == Map(("a", "x") -> 10, ("a", "y") -> 2))
  }
}

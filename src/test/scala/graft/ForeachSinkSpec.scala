package graft

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.operators.CityEvents
import graft.sources.KeyedForeachWriter
import graft.streaming.EventStreamSource

/** Row-level ForeachWriter sink contract (T8 + T7 replay half): lifecycle,
  * failure atomicity, open=false partition skip, last-writer-wins reads.
  */
class ForeachSinkSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))
  private def row(k: String, v: String): Row =
    new GenericRowWithSchema(Array[Any](k, v), rowSchema)

  test("failed attempt commits nothing; retry commits; replay is skipped via open=false") {
    val dir = Files.createTempDirectory("fw").toString
    val w = new KeyedForeachWriter(dir)
    // attempt 1: the task dies mid-partition — close receives the error
    assert(w.open(0, 0), "first attempt must open")
    w.process(row("a", "v1"))
    w.close(new RuntimeException("injected executor failure"))
    assert(new File(s"$dir/commits").list().isEmpty, "aborted attempt must not commit")
    assert(!new File(s"$dir/data/default-0-0.log").exists(), "aborted attempt must leave no data")
    // attempt 2: Spark's task retry re-opens the SAME (partition, epoch)
    assert(w.open(0, 0), "retry of an uncommitted attempt must open")
    w.process(row("a", "v1"))
    w.process(row("b", "v2"))
    w.close(null)
    assert(new File(s"$dir/commits/0__default-0-0").exists(),
      "marker must carry the store-assigned commit sequence")
    // attempt 3: checkpoint replay of a committed epoch — skip the partition
    assert(!w.open(0, 0), "committed (partition, epoch) must be skipped")
    val got = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "v1", "b" -> "v2"))
  }

  test("last-writer-wins across epochs and within a batch") {
    val dir = Files.createTempDirectory("fw").toString
    val w = new KeyedForeachWriter(dir)
    assert(w.open(0, 0))
    w.process(row("k", "old"))
    w.process(row("k", "mid")) // same key twice in one batch: latest seq wins
    w.close(null)
    assert(w.open(0, 1))
    w.process(row("k", "new"))
    w.close(null)
    val got = KeyedForeachWriter.read(spark, dir).collect()
    assert(got.length == 1 && got.head.getString(1) == "new")
  }

  test("pipeline row-level alerts sink: only high-severity events reach the row store (T8 topology)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeRoot = Files.createTempDirectory("store").toString
    val p = new graft.streaming.Pipeline(spark, storeRoot,
      Files.createTempDirectory("ckpt").toString)
    val input = MemoryStream[EventRec]
    val q = p.startAlertsForeach(input.toDF())
    try {
      input.addData(
        EventRec(1, Timestamp.valueOf("2024-01-01 10:00:00"), 0, "click", 450, "{}"), // critical
        EventRec(2, Timestamp.valueOf("2024-01-01 10:00:10"), 1, "view", 50, "{}"),   // low: filtered
        EventRec(3, Timestamp.valueOf("2024-01-01 10:00:20"), 2, "error", 300, "{}")) // high
      q.processAllAvailable()
      val got = KeyedForeachWriter.read(spark, s"$storeRoot/alerts_rows").collect()
      assert(got.length == 2)
      assert(got.forall(r =>
        r.getString(1).contains("\"severity\":\"critical\"") ||
          r.getString(1).contains("\"severity\":\"high\"")))
    } finally q.stop()
  }

  test("row store: a recreated checkpoint's rows land (writer-scoped fence)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("fw").toString
    def run(ids: Seq[Long]): Unit = {
      val input = MemoryStream[EventRec]
      val wire = EventStreamSource.toKafkaRecords(CityEvents.normalize(input.toDF()))
      // fresh checkpoint each run: epochs restart at 0 — under the old
      // (epoch, partition)-only fence, run 2's partitions matched run 1's
      // markers and every row was silently skipped
      val q = wire.writeStream
        .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
        .foreach(new KeyedForeachWriter(dir))
        .start()
      try {
        input.addData(ids.map(i =>
          EventRec(i, Timestamp.valueOf(s"2024-01-01 10:0${i % 10}:00"), i, "click", 300, "{}")): _*)
        q.processAllAvailable()
      } finally q.stop()
    }
    run(Seq(1L))   // user 1 → one city key
    run(Seq(2L))   // recreated checkpoint, different user → different city key
    val got = KeyedForeachWriter.read(spark, dir).collect()
    assert(got.length == 2,
      "rows written under a recreated checkpoint must not be silently dropped")
  }

  test("row store: a recreated checkpoint's write to a SHARED key wins the read") {
    // round-6 ADVICE-1: the round-5 fix made a new writer's rows LAND, but
    // the LWW read ordered by (epoch, writer, seq) — after a checkpoint
    // was deleted/recreated the old writer's high epochs kept winning
    // every SHARED key until the new writer's epoch counter caught up.
    // The store-assigned commit sequence orders reads by commit time.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("fw").toString
    def run(eventType: String, batches: Int): Unit = {
      val input = MemoryStream[EventRec]
      val wire = EventStreamSource.toKafkaRecords(CityEvents.normalize(input.toDF()))
      val q = wire.writeStream
        .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
        .foreach(new KeyedForeachWriter(dir))
        .start()
      try {
        (0 until batches).foreach { b => // one micro-batch (epoch) each
          input.addData(EventRec(100L + b, Timestamp.valueOf("2024-01-01 10:00:00"),
            5L, eventType, 300, "{}"))
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    run("click", batches = 4) // old checkpoint: epochs 0..3 on user-5's city
    run("view", batches = 1)  // recreated: NEW writer identity, epoch 0, SAME key
    val got = KeyedForeachWriter.read(spark, dir).collect()
    assert(got.length == 1, "one city key was ever written")
    assert(got.head.getString(1).contains("\"event_type\":\"view\""),
      s"latest COMMIT must win the shared key, got ${got.head.getString(1)} — " +
        "epoch-ordered reads serve stale values after checkpoint recreation")
  }

  test("row store compaction folds logs, preserves the view, and keeps folded epochs fenced") {
    // round 6: the row store previously appended forever; compaction gives
    // it the same bounded read amplification + _txn replay fences as the
    // columnar KeyedUpsertSink
    val dir = Files.createTempDirectory("fw").toString
    val w = new KeyedForeachWriter(dir)
    for (e <- 0 to 4; p <- 0 to 1) {
      assert(w.open(p, e))
      w.process(row(s"k$p", s"e$e-p$p"))
      w.process(row("shared", s"e$e-p$p"))
      w.close(null)
    }
    val before = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(KeyedForeachWriter.logCount(spark, dir) == 10)
    KeyedForeachWriter.compact(spark, dir)
    assert(KeyedForeachWriter.logCount(spark, dir) == 1, "one compacted log")
    val after = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after == before, s"compaction changed the view: $before -> $after")
    // folded epochs stay fenced though their markers are retired (_txn)
    assert(!w.open(0, 4), "folded (writer, epoch, partition) must stay fenced")
    assert(!w.open(1, 2))
    // appends after compaction land and win
    assert(w.open(0, 5))
    w.process(row("shared", "post-compact"))
    w.close(null)
    val got = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("shared") == "post-compact")
    // re-compaction over the appended store stays consistent
    KeyedForeachWriter.compact(spark, dir)
    assert(KeyedForeachWriter.logCount(spark, dir) == 1)
    assert(KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap == got)
  }

  test("row store: simultaneous partition commits never share a commit sequence") {
    val dir = Files.createTempDirectory("fw").toString
    val threads = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val fs = (0 until threads).map { p =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val w = new KeyedForeachWriter(dir)
            (0 until 3).foreach { e =>
              assert(w.open(p, e))
              w.process(row(s"k$p", s"e$e"))
              w.close(null)
            }
          }
        })
      }
      fs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val seqs = new File(s"$dir/commits").list().toSeq
      .filterNot(_.startsWith("."))
      .map(_.split("__")(0).toLong)
    assert(seqs.size == threads * 3)
    assert(seqs.distinct.size == seqs.size,
      s"duplicate commit sequences under concurrency: ${seqs.sorted}")
  }

  test("read handles round-5 (5-field) and pre-round-5 (4-field) legacy logs") {
    // round-6 ADVICE-2: the round-5 reader parsed the 5-field layout
    // unconditionally, silently misparsing old logs (epoch read as writer,
    // key as seq → null, value as key). Arity-branched parsing restores
    // them; absent commit sequences order as -1 so any sequenced commit
    // wins.
    val dir = Files.createTempDirectory("fw").toString
    val S = KeyedForeachWriter.Sep
    new File(s"$dir/data").mkdirs(); new File(s"$dir/commits").mkdirs()
    // pre-round-5 layout: (epoch, seq, key, value), marker `<epoch>-<part>`
    Files.write(new File(s"$dir/data/3-0.log").toPath,
      s"3${S}0${S}a${S}v-r4".getBytes)
    Files.write(new File(s"$dir/commits/3-0").toPath, Array.emptyByteArray)
    // round-5 layout: (writer, epoch, seq, key, value), marker `<w>-<e>-<p>`
    Files.write(new File(s"$dir/data/w5-4-0.log").toPath,
      (s"w5${S}4${S}0${S}a${S}v-r5" + "\n" + s"w5${S}4${S}1${S}b${S}v-r5b").getBytes)
    Files.write(new File(s"$dir/commits/w5-4-0").toPath, Array.emptyByteArray)
    val legacy = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(legacy == Map("a" -> "v-r5", "b" -> "v-r5b"),
      s"legacy layouts must parse by arity, got $legacy")
    // a sequenced round-6 commit at a LOWER epoch still wins both legacies
    val w = new KeyedForeachWriter(dir)
    assert(w.open(0, 0))
    w.process(row("a", "v-r6"))
    w.close(null)
    val got = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "v-r6", "b" -> "v-r5b"))
  }

  test("corrupt lines of non-layout arity are rejected, not legacy-parsed") {
    // round-7 ADVICE: the legacy branch used to be an `otherwise`, so a
    // truncated 6-field fragment or an 8-field line misparsed as the
    // 4-field layout — fabricated stamps could then win LWW for a garbage
    // key. Only arities 7/5/4 were ever written; everything else drops.
    val dir = Files.createTempDirectory("fw").toString
    val S = KeyedForeachWriter.Sep
    new File(s"$dir/data").mkdirs(); new File(s"$dir/commits").mkdirs()
    Files.write(new File(s"$dir/data/9-0.log").toPath,
      (s"9${S}0${S}a${S}v-good" + "\n" +                      // valid 4-field
        s"9${S}1${S}x${S}y${S}z${S}w" + "\n" +                // corrupt 6-field
        s"1${S}2${S}3${S}4${S}5${S}6${S}7${S}8").getBytes)    // corrupt 8-field
    Files.write(new File(s"$dir/commits/9-0").toPath, Array.emptyByteArray)
    val got = KeyedForeachWriter.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "v-good"),
      s"corrupt arities must be dropped, got $got")
  }

  test("streaming foreach sink lands wire records end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("fw").toString
    val input = MemoryStream[EventRec]
    val wire = EventStreamSource.toKafkaRecords(
      CityEvents.normalize(input.toDF()))
    val q = wire.writeStream
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreach(new KeyedForeachWriter(dir))
      .start()
    try {
      input.addData(
        EventRec(1, Timestamp.valueOf("2024-01-01 10:00:00"), 0, "click", 300, "{}"),
        EventRec(2, Timestamp.valueOf("2024-01-01 10:00:10"), 1, "view", 50, "{}"))
      q.processAllAvailable()
      val got = KeyedForeachWriter.read(spark, dir).collect()
      // key = city: two users → two cities → two live keys
      assert(got.length == 2)
      assert(got.forall(r => CityEvents.Cities.contains(r.getString(0))))
      assert(got.forall(_.getString(1).contains("\"rec_id\"")))
    } finally q.stop()
  }
}

package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.KeyedUpsertSink
import graft.streaming.Pipeline

case class EventRec(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double, props: String)

/** Streaming semantics specs (SURVEY.md §2.9 T1-T8) via MemoryStream —
  * no DuckDB oracle exists for streaming, so state is asserted directly.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long = 1, typ: String = "click",
                 v: Double = 50.0): EventRec =
    EventRec(id, ts(t), user, typ, v, s"""{"k": $id}""")

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("windowed agg stream: upsert by partition_key across epochs (T3/T7)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startWindowedAgg(input.toDF())
    try {
      input.addData(ev(1, "2024-01-01 10:00:10"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      val s1 = KeyedUpsertSink.read(spark, p.aggStorePath)
        .filter(col("window_start") === "2024-01-01 10:00:00").head()
      assert(s1.getAs[Long]("event_count") == 2)

      // same window, next epoch: the keyed row must be REPLACED (count 2→3)
      input.addData(ev(3, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      val s2 = KeyedUpsertSink.read(spark, p.aggStorePath)
        .filter(col("window_start") === "2024-01-01 10:00:00").collect()
      assert(s2.length == 1)
      assert(s2.head.getAs[Long]("event_count") == 3)
      assert(s2.head.getAs[scala.collection.Seq[String]]("severities").length == 3)
    } finally q.stop()
  }

  test("stateful members run green under the RocksDB state store (r13 next-round 4)") {
    // the 100 TB state answer: the default HDFSBackedStateStore keeps
    // every open window/session/dedup/throttle entry ON-HEAP per
    // executor; RocksDB spills to local disk with bounded memory. The
    // pipeline exposes the provider (a session conf each query captures
    // at start — one topology per session is the deployment scope), and
    // this test re-runs three distinct state shapes under it: update-mode
    // windowed aggregation, append-mode session windows, and
    // flatMapGroupsWithState throttle state. BEHAVIORAL DELTAS: none in
    // semantics — the upsert/throttle assertions are the HDFS-backed
    // tests' verbatim; the observable difference is the provider's
    // rocksdb* custom metrics in StateOperatorProgress (asserted, which
    // also proves the conf engaged) and state living off-heap.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    try {
      val p = new Pipeline(spark, tmp("rocksstore"), tmp("rocksckpt"),
        stateStoreProvider = Some(Pipeline.RocksDbStateStore))
      val aggIn = MemoryStream[EventRec]
      val sesIn = MemoryStream[EventRec]
      val thrIn = MemoryStream[EventRec]
      val kanIn = MemoryStream[EventRec]
      val qs = Seq(
        p.startWindowedAgg(aggIn.toDF()),
        p.startUserSessions(sesIn.toDF(), queryName = "rocks_sessions"),
        p.startThrottledAlerts(thrIn.toDF(), queryName = "rocks_throttle"),
        // fourth state shape: the k-anon gate's Seq-carrying quarantine
        // buffer (KAnonGateState) round-trips the RocksDB encoder
        p.startKAnonGate(kanIn.toDF(), k = 2, queryName = "rocks_kanon"))
      try {
        aggIn.addData(ev(1, "2024-01-01 10:00:10"), ev(2, "2024-01-01 10:01:00"))
        sesIn.addData(ev(10, "2024-01-01 10:00:00"))
        thrIn.addData(ev(20, "2024-01-01 10:00:00", v = 300.0),
          ev(21, "2024-01-01 10:05:00", v = 300.0)) // same city, inside gap
        kanIn.addData(ev(30, "2024-01-01 10:00:00")) // quarantines (k=2)
        qs.foreach(_.processAllAvailable())
        assert(spark.table("rocks_kanon").count() == 0)
        kanIn.addData(ev(31, "2024-01-01 10:00:30")) // class completes
        qs.foreach(_.processAllAvailable())
        assert(spark.table("rocks_kanon").select("event_id").collect()
          .map(_.getLong(0)).toSet == Set(30L, 31L),
          "the quarantined row must survive a RocksDB state round-trip")
        // upsert parity with the HDFS-backed test: same window replaced
        aggIn.addData(ev(3, "2024-01-01 10:02:00"))
        qs.foreach(_.processAllAvailable())
        val s2 = KeyedUpsertSink.read(spark, p.aggStorePath)
          .filter(col("window_start") === "2024-01-01 10:00:00").collect()
        assert(s2.length == 1 && s2.head.getAs[Long]("event_count") == 3,
          "windowed upsert semantics must be provider-independent")
        // throttle state: the second same-city alert inside the gap drops
        val thr = spark.table("rocks_throttle").collect()
        assert(thr.length == 1,
          s"one alert serves per (city, gap) under RocksDB: ${thr.length}")
        // the provider actually engaged: rocksdb* state metrics reported
        val metrics = qs.flatMap(_.recentProgress.toSeq)
          .flatMap(_.stateOperators.toSeq)
          .flatMap(so => scala.jdk.CollectionConverters
            .MapHasAsScala(so.customMetrics).asScala.keys)
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb state-store metrics, got: ${metrics.distinct}")
      } finally qs.foreach(_.stop())
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("count-map windowed agg stream: bounded state shape, upsert parity with the list form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startWindowedAggCounts(input.toDF())
    try {
      input.addData(ev(1, "2024-01-01 10:00:10", v = 50.0),   // low
        ev(2, "2024-01-01 10:01:00", v = 150.0))              // medium
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 10:02:00", v = 50.0))   // low, same window
      q.processAllAvailable()
      val row = KeyedUpsertSink.read(spark, p.aggCountsStorePath)
        .filter(col("window_start") === "2024-01-01 10:00:00").collect()
      assert(row.length == 1, "updated window upserts by partition_key")
      assert(row.head.getAs[Long]("event_count") == 3)
      assert(row.head.getAs[Long]("n_low") == 2 && row.head.getAs[Long]("n_medium") == 1)
      assert(row.head.getAs[Long]("n_high") == 0 && row.head.getAs[Long]("n_critical") == 0)
    } finally q.stop()
  }

  test("stream-batch parity: windowed agg store equals the batch operator on the same events (A1)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 90 events over ~30 minutes of event time, several cities/types/
    // severities; fed in event-time order so the watermark drops nothing
    val events = (1 to 90).map { i =>
      ev(i, f"2024-01-01 10:${i % 30}%02d:${(i * 7) % 60}%02d", user = i % 7,
        typ = Seq("click", "view", "error")(i % 3), v = (i * 37 % 500).toDouble)
    }.sortBy(_.ts.getTime)
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startWindowedAgg(input.toDF())
    val cols = Seq("partition_key", "window_start", "window_end", "city",
      "event_type", "event_count", "severities", "last_updated")
    def canon(rows: Array[org.apache.spark.sql.Row]): Set[Seq[Any]] =
      rows.map(_.toSeq.map {
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      }).toSet
    try {
      events.grouped(30).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = canon(KeyedUpsertSink.read(spark, p.aggStorePath)
        .select(cols.map(col): _*).collect())
      val batch = canon(graft.operators.StreamAggregates.windowedAggregate(
          graft.operators.CityEvents.normalize(events.toDF()))
        .select(cols.map(col): _*).collect())
      assert(streamed == batch,
        s"stream/batch diverged: only-stream=${(streamed -- batch).take(2)} " +
          s"only-batch=${(batch -- streamed).take(2)}")
    } finally q.stop()
  }

  test("watermark drops data later than 10 minutes (T1)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startWindowedAgg(input.toDF())
    try {
      input.addData(ev(1, "2024-01-01 12:00:00"))
      q.processAllAvailable() // watermark advances to 11:50
      input.addData(ev(2, "2024-01-01 12:00:30")) // on time, same window
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 11:30:00")) // 30 min late: beyond watermark
      q.processAllAvailable()
      val store = KeyedUpsertSink.read(spark, p.aggStorePath).collect()
      // late event's window [11:30,11:35) must never materialize
      assert(!store.exists(_.getAs[String]("window_start") == "2024-01-01 11:30:00"))
      val w12 = store.filter(_.getAs[String]("window_start") == "2024-01-01 12:00:00")
      assert(w12.length == 1 && w12.head.getAs[Long]("event_count") == 2)
    } finally q.stop()
  }

  test("raw events + alerts streams: append mode, keyed stores (T3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    // value 420 → severity critical; value 50 → low (only critical alerts)
    val qs = Seq(p.startRawEvents(input.toDF()), p.startAlerts(input.toDF()))
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", v = 50.0),
        ev(2, "2024-01-01 10:00:01", v = 420.0))
      qs.foreach(_.processAllAvailable())
      assert(KeyedUpsertSink.read(spark, p.rawStorePath).count() == 2)
      val alerts = KeyedUpsertSink.read(spark, p.alertsStorePath).collect()
      assert(alerts.length == 1)
      assert(alerts.head.getAs[String]("severity") == "critical")
    } finally qs.foreach(_.stop())
  }

  test("monitoring stream: complete mode to memory sink (A2/T3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startMonitoring(input.toDF(), queryName = "mon_test")
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      val total = spark.table("mon_test").agg(sum("event_count")).head().getLong(0)
      assert(total == 2)
    } finally q.stop()
    // the reference's REAL sink (S5 byte-fidelity): console, complete
    // mode, truncate off — output goes to stdout so only liveness is
    // assertable, which is exactly why the memory stand-in above exists.
    // Fresh checkpoint root: neither console nor memory sinks support
    // checkpoint RECOVERY, so the real deployment also starts clean.
    val p2 = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val qc = p2.startMonitoring(input.toDF(), console = true)
    try {
      input.addData(ev(3, "2024-01-01 10:10:00"))
      qc.processAllAvailable()
      assert(qc.isActive && qc.exception.isEmpty)
    } finally qc.stop()
  }

  test("console sink byte format: captured stream shows the full untruncated batch table (S5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // round-7 verdict "what's missing" 2: the byte-format path existed but
    // was never assertable. Spark's ConsoleWrite prints through scala
    // Console.out (an InheritableThreadLocal): redirecting BOTH it and
    // System.out before start() makes the per-query stream-execution
    // thread — spawned at start, where commit() runs — inherit the capture.
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    val oldSys = System.out
    System.setOut(ps)
    val longType = "a_deliberately_long_event_type_name" // > the 20-char truncate cut
    try scala.Console.withOut(ps) {
      val input = MemoryStream[EventRec]
      val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
      val qc = p.startMonitoring(input.toDF(), console = true)
      try {
        input.addData(ev(1, "2024-01-01 10:00:00", typ = longType),
          ev(2, "2024-01-01 10:05:00", typ = longType))
        qc.processAllAvailable()
      } finally qc.stop()
    } finally System.setOut(oldSys)
    val out = buf.toString("UTF-8")
    assert(out.contains("Batch: 0"), s"console sink must print the batch header, got:\n$out")
    assert(out.contains("event_count"), "the counts table header must appear")
    // truncate=false (SparkDynamoDBConsumer.java:182-190): the 35-char
    // event type prints WHOLE — the default truncate=20 would cut it
    assert(out.contains(longType), "cell beyond 20 chars must print untruncated")
    assert(!out.contains(longType.take(17) + "..."), "no truncation ellipsis")
    assert(out.contains(s"|$longType"), "ascii table borders frame the cell")
  }

  test("startAll runs the full 4-query topology concurrently (T5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val qs = p.startAll(input.toDF())
    try {
      assert(qs.length == 4)
      input.addData(ev(1, "2024-01-01 10:00:00", v = 420.0),
        ev(2, "2024-01-01 10:01:00", v = 50.0))
      qs.foreach(_.processAllAvailable())
      assert(KeyedUpsertSink.read(spark, p.rawStorePath).count() == 2)
      assert(KeyedUpsertSink.read(spark, p.aggStorePath).count() >= 1)
      assert(KeyedUpsertSink.read(spark, p.alertsStorePath).count() == 1)
      assert(spark.table("monitoring").count() >= 1)
      assert(qs.forall(_.isActive))
    } finally qs.foreach(_.stop())
  }

  test("streaming session windows: a session closes and emits once the watermark passes its gap (T2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startUserSessions(input.toDF(), "sessions_test")
    try {
      // burst: two events 10 minutes apart -> one open session
      input.addData(ev(1, "2024-01-01 10:00:00", user = 1),
        ev(2, "2024-01-01 10:10:00", user = 1))
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() == 0, "open sessions must not emit in append mode")
      // a much later event advances the watermark past the session close
      input.addData(ev(3, "2024-01-01 12:00:00", user = 1))
      q.processAllAvailable()
      val closed = spark.table("sessions_test").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("event_count") == 2)
      assert(closed.head.getAs[String]("session_start").startsWith("2024-01-01 10:00:00"))
      assert(closed.head.getAs[String]("session_end").startsWith("2024-01-01 10:40:00"))
    } finally q.stop()
  }

  test("stream-stream interval join: alerts pick up same-city events within 5 minutes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startAlertContext(input.toDF(), "alert_ctx_test")
    try {
      // user 0 -> SF, user 1 -> NYC; value >= 250 -> alert severity
      input.addData(
        ev(1, "2024-01-01 10:00:00", user = 0, v = 50),   // SF context event
        ev(2, "2024-01-01 10:02:00", user = 1, v = 50),   // NYC: wrong city
        ev(3, "2024-01-01 10:03:00", user = 6, v = 450))  // SF alert (user 6 -> SF)
      q.processAllAvailable()
      val rows = spark.table("alert_ctx_test").collect()
      // the alert joins the SF context event AND itself (alerts are events)
      val forAlert = rows.filter(_.getAs[Long]("alert_id") == 3L)
      val recs = forAlert.map(_.getAs[String]("e_rec_id")).toSet
      assert(forAlert.nonEmpty, "alert must pick up same-city context")
      assert(forAlert.forall(_.getAs[String]("city") == "SF"))
      assert(!recs.exists(_.contains("NYC")), "cross-city events must not join")
      assert(recs.size == 2, s"expected SF context + self, got $recs")
    } finally q.stop()
  }

  test("in-stream id-collision dedup: colliding rec_ids within the watermark emit once (§1.2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    // memory sink so EMISSIONS are observable (the keyed store would mask
    // re-emissions by deduping at rest — the point of the stage is what
    // reaches a non-idempotent sink)
    val q = graft.operators.StreamAggregates.rawEvents(
        graft.operators.CityEvents.normalize(input.toDF())
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("rec_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream_test")
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    try {
      // same user→city, same type, same second, different event ids ⇒ one rec_id
      input.addData(ev(1, "2024-01-01 10:00:00.1"), ev(2, "2024-01-01 10:00:00.9"))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 10:00:00.5")) // next batch, still within delay
      q.processAllAvailable()
      assert(spark.table("dedup_stream_test").count() == 1,
        "colliding rec_ids within the watermark must emit exactly once")
      // advance the watermark far past 10:00:00 + 10m: dedup state evicted
      input.addData(ev(4, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      input.addData(ev(5, "2024-01-01 10:00:00.7")) // same rec_id, after eviction
      q.processAllAvailable()
      val recs = spark.table("dedup_stream_test").collect().map(_.getAs[String]("rec_id"))
      // the delay bounds state size WITHOUT re-emission risk: a same-second
      // duplicate arriving after eviction is by construction older than the
      // watermark, so the late-row filter discards it before the (now
      // empty) dedup state is consulted — at-most-once emission per rec_id
      // (verified here against Spark's actual semantics, not the docs'
      // weaker "no guarantee" wording)
      assert(recs.count(_.contains("10:00:00")) == 1,
        s"post-eviction duplicate must be dropped as late data: ${recs.toSeq}")
      assert(recs.length == 2) // the distinct 11:00 event emitted normally
    } finally q.stop()
  }

  test("startRawEventsDeduped: the store holds one row per rec_id (topology stage)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val q = p.startRawEventsDeduped(input.toDF())
    try {
      input.addData(ev(1, "2024-01-01 10:00:00.1"), ev(2, "2024-01-01 10:00:00.9"),
        ev(3, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      val store = KeyedUpsertSink.read(spark, p.rawDedupStorePath)
      assert(store.count() == 2, "two distinct rec_ids")
    } finally q.stop()
  }

  test("keyed upsert sink: last-writer-wins and batch-internal dedup") {
    import spark.implicits._
    val store = tmp("kv") + "/t"
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("b", 9), ("c", 3), ("c", 3)).toDF("k", "v"))
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("a" -> 1, "b" -> 9, "c" -> 3))
  }

  test("rate-source generator produces schema-complete events (S2)") {
    val df = graft.streaming.EventStreamSource.rateStream(spark)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("corrupt wire payloads survive as null rows; parseJsonValid drops them") {
    import spark.implicits._
    val wire = Seq(
      """{"event_id": 7, "ts": "2024-01-01T10:00:00.000000Z", "user_id": 1, "event_type": "click", "value": 1.5, "props": "{}"}""",
      """not json at all""",
      """{"event_id": null}""").toDF("json")
    val parsed = graft.streaming.EventStreamSource.parseJson(wire)
    assert(parsed.count() == 3, "poison messages must not kill the stream")
    assert(parsed.filter(col("event_id").isNull).count() == 2)
    val valid = graft.streaming.EventStreamSource.parseJsonValid(wire)
    val rows = valid.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("event_id") == 7L)
  }

  test("json parse stage decodes the wire format (P1-P3)") {
    import spark.implicits._
    val json = Seq("""{"event_id":7,"ts":"2024-01-01T10:00:00","user_id":3,"event_type":"view","value":9.5,"props":"{\"k\":1}"}""")
      .toDF("json")
    val r = graft.streaming.EventStreamSource.parseJson(json).head()
    assert(r.getAs[Long]("event_id") == 7)
    assert(r.getAs[String]("event_type") == "view")
    assert(r.getAs[Double]("value") == 9.5)
  }

  test("closed loop: the streaming topology's stores serve the batch registry's answers (round-6 VERDICT-5)") {
    // The full reference architecture end-to-end, not per-layer: testdata
    // events flow through Pipeline.startAll (4 concurrent queries), land in
    // the keyed stores across several micro-batches, and the SERVING layer
    // pointed at KeyedUpsertSink.read of those stores must answer exactly
    // what it answers over the oracle-green batch frames. sf0.001 has no
    // rec_id collisions, so raw-store equality is exact; the watermark is
    // set wide so batch/stream never differ on late-row policy.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{CityEvents, Serving, StreamAggregates}
    val dir = "/root/testdata/sf0.001"
    val recs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .map(r => EventRec(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
    val input = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"),
      watermarkDelay = "3650 days")
    val queries = p.startAll(input.toDF())
    try {
      recs.grouped(400).foreach { chunk => // several epochs, not one bulk load
        input.addData(chunk.toIndexedSeq: _*)
        queries.foreach(_.processAllAvailable())
      }
    } finally queries.foreach(_.stop())

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val norm = CityEvents.normalize(Tables.events(spark, dir))

    // layer 1: each store holds exactly the batch operator's frame
    val rawStore = KeyedUpsertSink.read(spark, p.rawStorePath)
    assert(rows(rawStore) == rows(StreamAggregates.rawEvents(norm)))
    val aggStore = KeyedUpsertSink.read(spark, p.aggStorePath)
    assert(rows(aggStore) == rows(StreamAggregates.windowedAggregate(norm)))
    val alertsStore = KeyedUpsertSink.read(spark, p.alertsStorePath)
    assert(rows(alertsStore) == rows(StreamAggregates.alerts(norm).drop("ts")))
    val monitoring = spark.table("monitoring") // complete-mode memory sink
    assert(rows(monitoring) == rows(StreamAggregates.globalCounts(norm)))

    // layer 2: the serving endpoints answer identically from the streamed
    // stores and from the batch frames the oracle checked. The alert store
    // persists the wire-format string timestamp (reference fidelity:
    // DynamoDB stored strings), so ts is re-parsed for the time-range
    // endpoint; the hours window spans the dataset so second-truncation
    // cannot move the cutoff. (GET /events/{city} is the one endpoint not
    // servable from a store: the raw store persists the wire projection,
    // which drops event_id/ts by design — it serves from the normalized
    // view, already oracle-checked as q_events_by_city.)
    val aggBatch = StreamAggregates.windowedAggregate(norm)
    assert(rows(Serving.summary(aggStore, "SF")) == rows(Serving.summary(aggBatch, "SF")))
    assert(rows(Serving.cities(aggStore)) == rows(Serving.cities(aggBatch)))
    assert(rows(Serving.aggregationsFor(aggStore, "Chicago", "purchase", 1000)) ==
      rows(Serving.aggregationsFor(aggBatch, "Chicago", "purchase", 1000)))
    assert(rows(Serving.statsTotal(aggStore)) == rows(Serving.statsTotal(aggBatch)))
    assert(rows(Serving.health(rawStore)) == rows(Serving.health(norm)))
    val alertsBatch = StreamAggregates.alerts(norm)
    assert(rows(Serving.alertSeverityCounts(alertsStore, spark)) ==
      rows(Serving.alertSeverityCounts(alertsBatch, spark)))
    val servedAlerts = alertsStore.withColumn("ts",
      to_timestamp(col("ts_str"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    assert(rows(Serving.alertsRecent(servedAlerts, None, 24 * 3650, 100000)
      .drop("ts_str")) ==
      rows(Serving.alertsRecent(alertsBatch, None, 24 * 3650, 100000).drop("ts_str")))
  }

  test("closed loop covers the crawl path: streamed clean/ equals batch dedupDelta across epochs (r9 next-round 5)") {
    // The crawl-dedup stream runs as a fifth topology member (two sources,
    // five queries, shared store + checkpoint roots), and its epoch-
    // partitioned clean/ output must equal what the BATCH incremental
    // operator answers when driven sequentially with the same growing
    // index — the stream is the batch operator's composition, not a
    // different algorithm.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    def text(tag: String): String = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val base = tmp("crawlloop")
    val corpus = Seq((1L, text("alpha")), (2L, text("beta"))).toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus).write.parquet(s"$base/index")
    val events = MemoryStream[EventRec]
    val docs = MemoryStream[(Long, String)]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val queries = p.startAllWithCrawl(events.toDF(),
      docs.toDF().toDF("doc_id", "text"), s"$base/index")
    val epochs = Seq(
      Seq((10L, text("alpha")), (11L, text("novelA")), (12L, text("novelB"))),
      Seq((20L, text("novelA")), (21L, text("novelC"))))
    try {
      assert(queries.length == 5)
      epochs.foreach { batch =>
        events.addData(ev(batch.head._1, "2024-01-01 10:00:00"))
        docs.addData(batch.toIndexedSeq: _*)
        queries.foreach(_.processAllAvailable())
      }
    } finally queries.foreach(_.stop())
    // batch replay: same epochs through dedupDelta with the same growing
    // index discipline (clean docs' signatures appended between epochs)
    var index = spark.read.parquet(s"$base/index")
    val batchClean = scala.collection.mutable.Set[(Long, Long)]()
    epochs.zipWithIndex.foreach { case (batch, i) =>
      val delta = batch.toDF("doc_id", "text")
      val dupIds = Dedup.dedupDelta(index, delta, 0.8)
        .select("delta_id").collect().map(_.getLong(0)).toSet
      val clean = delta.filter(!col("doc_id").isin(dupIds.toSeq: _*))
      batchClean ++= clean.collect().map(r => (r.getLong(0), i.toLong))
      index = index.unionByName(Dedup.buildDedupIndex(clean))
    }
    val streamed = spark.read.parquet(s"${p.crawlStorePath}/clean")
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("epoch").longValue())).toSet
    assert(streamed == batchClean.toSet,
      s"streamed clean set must equal the batch answer: $streamed vs $batchClean")
  }

  test("throttled-alerts topology member: suppression-windowed pages equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[EventRec]
    val p = new Pipeline(spark, tmp("thrstore"), tmp("thrckpt"))
    val q = p.startThrottledAlerts(events.toDF(), gapMinutes = 60, queryName = "thr_topo")
    // value 300 -> high severity; user 1 -> NYC
    val fixture = Seq(
      ev(1, "2024-01-01 10:00:00", v = 300), // emits
      ev(2, "2024-01-01 10:30:00", v = 300), // suppressed
      ev(3, "2024-01-01 11:00:00", v = 300)) // exactly at the gap: emits
    try {
      events.addData(fixture.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("thr_topo").collect().map(_.getAs[Long]("event_id")).sorted.toSeq
      val want = graft.streaming.Stateful.alertThrottleBatch(
        graft.operators.StreamAggregates.alerts(
          graft.operators.CityEvents.normalize(fixture.toDF())), gapMinutes = 60)
        .collect().map(_.getAs[Long]("event_id")).sorted.toSeq
      assert(got == Seq(1L, 3L) && got == want,
        s"topology member must match the oracle-checked batch twin: $got vs $want")
    } finally q.stop()
  }

  test("full curation topology: dedup and fluency gate both tap the crawl source; " +
    "the gate's split equals the frozen-model batch kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Dedup, TextAnalysis}
    def text(tag: String): String = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val base = tmp("curation")
    val corpus = Seq((1L, text("alpha")), (2L, text("beta"))).toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus).write.parquet(s"$base/index")
    // reference model: trained on a fluent mini-corpus ("a b" dominant)
    TextAnalysis.persistLmModel(
      Seq((1L, "a b a b a b"), (2L, "a c")).toDF("doc_id", "text"),
      s"$base/lm", stamp = "spec")
    val events = MemoryStream[EventRec]
    val docs = MemoryStream[(Long, String)]
    val p = new Pipeline(spark, tmp("store"), tmp("ckpt"))
    val queries = p.startAllWithCuration(events.toDF(),
      docs.toDF().toDF("doc_id", "text"), s"$base/index", s"$base/lm",
      threshold = 0.5)
    // fluent known-transition doc, low-fluency doc, OOV crawl-novel doc
    val batch = Seq((10L, "a b a b a b"), (11L, "a c"), (12L, text("novel")))
    try {
      assert(queries.length == 6)
      events.addData(ev(10L, "2024-01-01 10:00:00"))
      docs.addData(batch.toIndexedSeq: _*)
      queries.foreach(_.processAllAvailable())
    } finally queries.foreach(_.stop())
    // the SAME crawl batch reached both curation streams
    val deduped = spark.read.parquet(s"${p.crawlStorePath}/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deduped == Set(10L, 11L, 12L), s"all three docs are corpus-novel: $deduped")
    val gateClean = spark.read.parquet(s"${p.fluencyStorePath}/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gateRejected = spark.read.parquet(s"${p.fluencyStorePath}/rejected")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch kernel replay: identical split
    val model = TextAnalysis.loadLmModel(spark, s"$base/lm")
    val kernel = TextAnalysis.lmFluencyFrom(model, batch.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expectClean = batch.map(_._1).filter(id => kernel.get(id).exists(_ >= 0.5)).toSet
    assert(gateClean == expectClean && gateRejected == batch.map(_._1).toSet -- expectClean,
      s"gate split must equal the batch kernel: clean=$gateClean rejected=$gateRejected kernel=$kernel")
  }

  test("twenty-two-member topology: events, crawl curation + scrub + indexer + decon gate + chunk ingest, media ingest + search, " +
    "embedding ingest + PQ encode + IVF growth, the tokenizer service, passage retrieval, takedown ingestion, drift monitoring, the k-anonymity release gate, the split assigner and the CHAINED split assigner (downstream of crawl dedup — r16 verdict 2) run concurrently against their frozen artifacts (T5 at deployment scale)") {
    fullTopology(stateStoreProvider = None)
  }

  test("twenty-two-member topology under the RocksDB state store: the full " +
    "closed-loop run end-to-end off-heap, rocksdb metrics engaged (r14 verdict 5)") {
    // the per-shape RocksDB test proves each state encoder round-trips;
    // this one proves the DEPLOYMENT story — all twenty-two members, every
    // store and serving assertion of the default-provider run verbatim,
    // with the provider conf captured by each query at start
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    try fullTopology(Some(Pipeline.RocksDbStateStore))
    finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  private def fullTopology(stateStoreProvider: Option[String]): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Corpus, Dedup, Multimodal, Similarity, TextAnalysis}
    def text(tag: String): String = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val base = tmp("tentop")
    // frozen artifacts: crawl index, LM model, media hash table, vocab
    val corpus = Seq((1L, text("alpha")), (2L, text("beta"))).toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus).write.parquet(s"$base/index")
    // frozen cluster assignment for the split assigner: docs 1 and 2
    // form one near-dup cluster keyed 1 (a planted assignment — the
    // assigner's contract is to INHERIT it, not re-derive it)
    Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$base/clusters")
    TextAnalysis.persistLmModel(
      Seq((1L, "a b a b a b"), (2L, "a c")).toDF("doc_id", "text"),
      s"$base/lm", stamp = "spec")
    Multimodal.mediaPhash(
        Seq((1L, text("img1")), (2L, text("img2"))).toDF("media_id", "text")
          .select(col("media_id"), lit("image").as("kind"),
            col("text").cast("binary").as("payload")))
      .write.parquet(s"$base/phash")
    Similarity.buildAnnIndex(Seq(
        (1L, Array.tabulate(8)(i => if (i == 0) 10f else 0f)),
        (2L, Array.tabulate(8)(i => if (i == 2) 10f else 0f)))
      .toDF("vec_id", "embedding")).write.parquet(s"$base/annindex")
    val tokTrain = Seq((1L, "ab ab ab cd cd")).toDF("doc_id", "text")
    val tokMerges = TextAnalysis.bpeMerges(tokTrain, 2).collect()
      .map(x => (x.getString(1), x.getString(2))).toSeq
    TextAnalysis.unigramVocab(tokTrain, tokMerges, keep = 2)
      .write.parquet(s"$base/vocab")
    Similarity.trainPqCodebooks(Seq(
        (1L, Array.tabulate(8)(i => if (i == 0) 10f else 1f)),
        (2L, Array.tabulate(8)(i => if (i == 2) 10f else 1f)))
      .toDF("vec_id", "embedding"), m = 2, k = 2, trainIters = 1, dim = 8)
      .write.parquet(s"$base/pqcb")
    Similarity.persistIndex(Seq(
        (1L, Array.tabulate(8)(i => if (i == 0) 10f else 1f), 0),
        (2L, Array.tabulate(8)(i => if (i == 2) 10f else 1f), 1))
      .toDF("vec_id", "embedding", "label"),
      s"$base/ivfindex", stamp = "spec", probeDepth = 2, pairNprobe = 2)
    graft.operators.Passage.persistPassage(
      Seq((1L, text("pass")), (2L, text("sage"))).toDF("doc_id", "text"),
      s"$base/passage", stamp = "spec")
    Corpus.shareCard(Seq((1L, text("ref"), "en", "src0"))
        .toDF("doc_id", "text", "lang", "source"))
      .write.parquet(s"$base/refshares")
    // five sources: events, crawl docs, media ingest, media probes, tokenizer docs
    val events = MemoryStream[EventRec]
    val docs = MemoryStream[(Long, String)]
    val media = MemoryStream[(Long, String)]
    val probes = MemoryStream[(Long, String)]
    val tok = MemoryStream[(Long, String)]
    val embeds = MemoryStream[(Long, Array[Float])]
    val scrubDocs = MemoryStream[(Long, String)]
    val ixDocs = MemoryStream[(Long, String)]
    val pqVecs = MemoryStream[(Long, Array[Float])]
    val ivfVecs = MemoryStream[(Long, Array[Float])]
    val passageQs = MemoryStream[(Long, String)]
    val chunkDocs = MemoryStream[(Long, String)]
    val erasures = MemoryStream[(Long, String)]
    val crawlIn = MemoryStream[(Long, String)]
    val driftDocs = MemoryStream[(Long, String, String, String)]
    val splitDocs = MemoryStream[(Long, String)]
    def asMedia(ms: MemoryStream[(Long, String)], id: String) = ms.toDF()
      .toDF(id, "text")
      .select(col(id), lit("image").as("kind"), col("text").cast("binary").as("payload"))
    val p = new Pipeline(spark, tmp("store9"), tmp("ckpt9"),
      stateStoreProvider = stateStoreProvider)
    val queries = p.startAllWithCuration(events.toDF(),
        docs.toDF().toDF("doc_id", "text"), s"$base/index", s"$base/lm",
        threshold = 0.5) ++ Seq(
      p.startMediaDedup(asMedia(media, "media_id"), s"$base/phash"),
      p.startMediaSearch(asMedia(probes, "query_id"), s"$base/phash"),
      p.startTokenize(tok.toDF().toDF("doc_id", "text"), s"$base/vocab"),
      p.startEmbedDedup(embeds.toDF().toDF("vec_id", "embedding"),
        s"$base/annindex", threshold = 0.9, dim = 8),
      p.startScrub(scrubDocs.toDF().toDF("doc_id", "text")),
      p.startIndexer(ixDocs.toDF().toDF("doc_id", "text")),
      p.startPqEncode(pqVecs.toDF().toDF("vec_id", "embedding"),
        s"$base/pqcb", m = 2, dim = 8),
      p.startIvfGrow(ivfVecs.toDF().toDF("vec_id", "embedding"),
        s"$base/ivfindex", probeDepth = 2),
      p.startPassageSearch(passageQs.toDF().toDF("query_id", "query_text"),
        s"$base/passage"),
      p.startChunkIngest(chunkDocs.toDF().toDF("doc_id", "text")),
      p.startTakedown(erasures.toDF().toDF("doc_id", "reason")),
      p.startDeconGate(crawlIn.toDF().toDF("doc_id", "text"),
        Seq((0L, "held out eval item text")).toDF("doc_id", "text")),
      p.startDriftMonitor(
        driftDocs.toDF().toDF("doc_id", "text", "lang", "source"),
        s"$base/refshares"),
      p.startKAnonGate(events.toDF(), k = 5),
      p.startSplitAssign(splitDocs.toDF().toDF("doc_id", "text"),
        s"$base/index", s"$base/clusters"),
      // the CHAINED assigner (r16 verdict 2): downstream of crawl dedup,
      // consuming the survivors' clean/ hand-off — listed LAST so the
      // single processAllAvailable pass below drives it after dedup has
      // written its epoch
      p.startChainedSplitAssign(s"$base/index", s"$base/clusters"))
    try {
      assert(queries.length == 22)
      // five same-class events (user 1, click, one day): exactly k for the
      // k-anonymity gate, so the class releases within the topology run
      events.addData(ev(10L, "2024-01-01 10:00:00"),
        ev(11L, "2024-01-01 10:05:00"), ev(12L, "2024-01-01 10:10:00"),
        ev(13L, "2024-01-01 10:15:00"), ev(14L, "2024-01-01 10:20:00"))
      docs.addData((10L, "a b a b a b"))
      media.addData((100L, text("img1")), (101L, text("fresh")))
      probes.addData((200L, text("img2")))
      tok.addData((300L, "abcd xy"))
      embeds.addData(
        (400L, Array.tabulate(8)(i => if (i == 0) 10f else 0f)),   // corpus dup
        (401L, Array.tabulate(8)(i => if (i == 4) 10f else 0f)))   // novel
      scrubDocs.addData((500L, "mail a@b.org"), (501L, "clean words"))
      ixDocs.addData((600L, "fresh crawl tokens"))
      pqVecs.addData((700L, Array.tabulate(8)(i => if (i == 0) 9f else 1f)))
      ivfVecs.addData((800L, Array.tabulate(8)(i => if (i == 0) 9f else 1f)))
      // the exact chunk-0 text of passage doc 1 (tokens 1..32 of the
      // 40-token text at the default 32/8 chunk geometry)
      passageQs.addData((900L, (1 to 32).map(i => s"pass$i").mkString(" ")))
      chunkDocs.addData((950L, "fresh crawl chunk tokens"))
      erasures.addData((1L, "erasure_request"))
      crawlIn.addData(
        (970L, "prefix held out eval item text suffix"),   // carries the gram
        (971L, "entirely unrelated crawl tokens here"))
      driftDocs.addData((980L, text("alpha"), "de", "src9")) // off-reference
      // a twin of corpus doc 2 (must inherit cluster key 1) + a novel doc
      splitDocs.addData((990L, text("beta")), (991L, text("fresh")))
      queries.foreach(_.processAllAvailable())
      // under RocksDB, prove the provider actually engaged topology-wide
      if (stateStoreProvider.isDefined) {
        val metrics = queries.flatMap(_.recentProgress.toSeq)
          .flatMap(_.stateOperators.toSeq)
          .flatMap(so => scala.jdk.CollectionConverters
            .MapHasAsScala(so.customMetrics).asScala.keys)
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb state metrics across the topology, got: ${metrics.distinct}")
      }
    } finally queries.foreach(_.stop())
    // every store root received its member's output
    assert(spark.read.parquet(s"${p.crawlStorePath}/clean").count() == 1)
    // the CHAINED split assigner consumed exactly the dedup survivor —
    // dropped docs never consume a split (r16 verdict 2)
    val chainAssigned = spark.read.parquet(s"${p.chainSplitStorePath}/assigned")
      .select("doc_id", "split_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chainAssigned == Set((10L, 10L)),
      s"the chained assigner must assign the dedup survivor, keyed by its own id: $chainAssigned")
    assert(spark.read.parquet(s"${p.fluencyStorePath}/clean").count() == 1)
    val mediaClean = spark.read.parquet(s"${p.mediaStorePath}/clean")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(mediaClean == Set(101L), s"only the fresh image survives ingest dedup: $mediaClean")
    val found = spark.read.parquet(s"${p.mediaSearchStorePath}/matches")
      .select("query_id", "media_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the exact corpus twin at hamming 0; img1 differs only in the tag
    // digit, so it may legitimately surface as a near match too
    assert(found.contains((200L, 2L, 0L)),
      s"the probe must find its corpus twin exactly: $found")
    val ixPostings = spark.read.parquet(s"${p.indexStorePath}/postings_delta")
      .select("tok", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ixPostings == Set(("fresh", 600L), ("crawl", 600L), ("tokens", 600L)),
      s"the indexer member posts the crawl's tokens: $ixPostings")
    val scrubOut = spark.read.parquet(s"${p.scrubStorePath}/scrubbed")
      .select("doc_id", "clean_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(scrubOut == Set((500L, "mail <EMAIL>")),
      s"the scrub member masks at ingest: $scrubOut")
    val embClean = spark.read.parquet(s"${p.embedStorePath}/clean")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(embClean == Set(401L), s"only the novel vector survives ingest dedup: $embClean")
    val enc = spark.read.parquet(s"${p.tokenizeStorePath}/encoded")
      .select("word", "encoded").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(enc == Set(("abcd", "ab cd"), ("xy", "x y")),
      s"tokenizer member must apply the frozen vocab: $enc")
    val pqOut = spark.read.parquet(s"${p.pqStorePath}/codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(pqOut.keySet == Set(700L) && pqOut(700L).length == 2,
      s"PQ member must code against the frozen codebooks: $pqOut")
    val ivfGrown = spark.read.parquet(s"${p.ivfStorePath}/lists_delta")
      .select("vec_id", "cell_rank").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue())).toSet
    assert(ivfGrown.contains((800L, 1)),
      s"IVF growth member must route the streamed vector to a home cell: $ivfGrown")
    val passTop = spark.read.parquet(s"${p.passageStorePath}/passages")
      .filter(col("rank") === 1).select("query_id", "doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(passTop == Set((900L, 1L, 0L)),
      s"passage member must retrieve the request's exact corpus chunk: $passTop")
    val chunkGrown = spark.read.parquet(s"${p.chunkStorePath}/vectors_delta")
      .select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chunkGrown == Set((950L, 0L)),
      s"chunk-ingest member must embed the crawl's chunks: $chunkGrown")
    // the takedown member's grown view suppresses a serving answer the
    // SAME epoch: passage doc 1 — the rank-1 answer just asserted above —
    // was erased mid-topology, so the stored passage answer re-served
    // through the tombstone view must drop it (non-vacuous by the passTop
    // assertion)
    val tombs = graft.streaming.TakedownStream.grownTombstones(spark,
      s"${p.takedownStorePath}/no-base", p.takedownStorePath)
    assert(tombs.collect().map(_.getLong(0)).toSet == Set(1L))
    val storedPassages = spark.read.parquet(s"${p.passageStorePath}/passages")
    assert(storedPassages.filter(col("doc_id") === 1L).count() > 0)
    val suppressed = graft.operators.Takedown.suppress(storedPassages, tombs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!suppressed.contains(1L),
      s"the erased document must vanish from the served surface: $suppressed")
    // the decon gate quarantines the benchmark-gram carrier, passes the rest
    val quarantined = spark.read.parquet(s"${p.deconStorePath}/contaminated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deconClean = spark.read.parquet(s"${p.deconStorePath}/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(quarantined == Set(970L) && deconClean == Set(971L),
      s"decon gate must quarantine exactly the carrier: $quarantined / $deconClean")
    // the drift member flags the off-reference batch on the moved axes
    val drift = graft.streaming.DriftStream.driftLog(spark, p.driftStorePath)
      .select("dim", "drifted").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(drift.contains(("lang", true)) && drift.contains(("source", true)),
      s"the all-German off-source batch must trip lang and source drift: $drift")
    // the split assigner: the corpus twin inherits the planted cluster's
    // key (so it co-locates with docs 1 and 2 by construction); the
    // novel doc keys by its own id; both splits come off the ONE shared
    // Corpus.splitOfKey hash (asserted against its literal evaluation)
    val assignedSplits = spark.read.parquet(s"${p.splitStorePath}/assigned")
      .select("doc_id", "split_key", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val wantSplits = Seq((990L, 1L), (991L, 991L)).toDF("doc_id", "split_key")
      .withColumn("split", graft.operators.Corpus.splitOfKey(col("split_key")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(assignedSplits == wantSplits,
      s"split assigner must inherit the cluster key and hash through the " +
        s"shared site: $assignedSplits vs $wantSplits")
    // the k-anonymity gate releases the five-member class with arrival ordinals
    val released = spark.table("kanon_release")
      .select("event_id", "class_seen").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(released == Set((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L), (14L, 5L)),
      s"the k-member class must release whole, in arrival order: $released")
  }
}

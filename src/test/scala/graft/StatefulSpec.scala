package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EventStreamSource, Stateful}
import graft.operators.CityEvents

/** Specs for the custom-state operator and the Kafka sink stage. */
class StatefulSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  // user_id 0 -> city SF; value >= 250 -> high/critical, < 100 -> low
  private def ev(id: Long, t: String, v: Double) =
    EventRec(id, ts(t), 0, "click", v, s"""{"k": $id}""")

  test("severity streaks persist across micro-batches and reset on low") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val q = Stateful.severityStreaks(CityEvents.normalize(input.toDF()), minStreak = 3)
      .writeStream.outputMode("append").format("memory").queryName("streaks").start()
    try {
      // batch 1: two highs -> streak 2, no alert yet
      input.addData(ev(1, "2024-01-01 10:00:00", 300), ev(2, "2024-01-01 10:00:10", 300))
      q.processAllAvailable()
      assert(spark.table("streaks").count() == 0)
      // batch 2: third high crosses the threshold -> exactly one alert
      input.addData(ev(3, "2024-01-01 10:00:20", 300))
      q.processAllAvailable()
      val alerts = spark.table("streaks").collect()
      assert(alerts.length == 1)
      assert(alerts.head.getAs[String]("city") == "SF")
      assert(alerts.head.getAs[Int]("streak") == 3)
      // batch 3: low resets; two highs again -> still no second alert
      input.addData(ev(4, "2024-01-01 10:00:30", 50),
        ev(5, "2024-01-01 10:00:40", 300), ev(6, "2024-01-01 10:00:50", 300))
      q.processAllAvailable()
      assert(spark.table("streaks").count() == 1)
      // batch 4: next high completes a NEW streak of 3
      input.addData(ev(7, "2024-01-01 10:01:00", 300))
      q.processAllAvailable()
      assert(spark.table("streaks").count() == 2)
    } finally q.stop()
  }

  test("streaks: a 100k-row single-batch group processes in event-time order on the packed buffer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // round-6 verdict 7: the operational bound is per-batch group size;
    // the buffer is now one primitive Long per row. Feed one city a 100k
    // event micro-batch in SHUFFLED arrival order — [H H H L] repeating in
    // event time, so exactly one alert per cycle — and a same-timestamp
    // (low, high) collision whose deterministic packed order (low first)
    // pins the tie-break the old stable-by-arrival sort left to chance.
    val n = 100000
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rng = new scala.util.Random(7)
    val events = rng.shuffle((0 until n).toVector).map { i =>
      EventRec(i.toLong, new Timestamp(base + i.toLong * 1000), 0, "click",
        if (i % 4 == 3) 50.0 else 300.0, s"""{"k": $i}""")
    }
    val input = MemoryStream[EventRec]
    val q = Stateful.severityStreaks(CityEvents.normalize(input.toDF()), minStreak = 3)
      .writeStream.outputMode("append").format("memory").queryName("bigstreaks").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val alerts = spark.table("bigstreaks").collect()
      assert(alerts.length == n / 4, s"one alert per HHHL cycle, got ${alerts.length}")
      assert(alerts.forall(_.getAs[Int]("streak") == 3))
      // each cycle's alert fires on its third high: event index 4k+2
      val alertTs = alerts.map(_.getAs[Timestamp]("last_ts").getTime).sorted
      assert(alertTs.zipWithIndex.forall { case (t, k) => t == base + (4L * k + 2) * 1000 })
      // same-timestamp tie: low sorts before high (packed low bit), so the
      // high on the shared stamp STARTS the streak that alerts two ticks on
      val t0 = base + (n.toLong + 10) * 1000
      input.addData(
        EventRec(n + 1L, new Timestamp(t0), 0, "click", 300, "{}"),
        EventRec(n + 2L, new Timestamp(t0), 0, "click", 50, "{}"),
        EventRec(n + 3L, new Timestamp(t0 + 1000), 0, "click", 300, "{}"),
        EventRec(n + 4L, new Timestamp(t0 + 2000), 0, "click", 300, "{}"),
        EventRec(n + 5L, new Timestamp(t0 + 3000), 0, "click", 300, "{}"))
      q.processAllAvailable()
      val extra = spark.table("bigstreaks").collect().map(_.getAs[Timestamp]("last_ts").getTime)
        .filter(_ >= t0)
      assert(extra.toSeq == Seq(t0 + 2000),
        s"low-before-high at the shared stamp must alert at t0+2s, got ${extra.toSeq}")
    } finally q.stop()
  }

  test("segmented streak stitch ≡ one-phase batch across ks and segment widths (r8 item 4)") {
    import spark.implicits._
    // randomized 3-city mix (seeded) + crafted cases: a 25-event all-high
    // run spanning three 10 s segments, and a same-timestamp (low, high)
    // tie landing exactly on a segment boundary
    val base = ts("2024-01-01 10:00:00").getTime
    val rnd = new scala.util.Random(7)
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[EventRec]()
    for (user <- 0L to 2L; i <- 0 until 300) {
      id += 1
      rows += EventRec(id, new Timestamp(base + i * 1000L), user, "click",
        if (rnd.nextDouble() < 0.6) 300 else 50, "{}")
    }
    for (i <- 0 until 25) {
      id += 1
      rows += EventRec(id, new Timestamp(base + 400000L + i * 1000L), 0, "click", 300, "{}")
    }
    id += 1
    rows += EventRec(id, new Timestamp(base + 430000L), 1, "click", 50, "{}")
    id += 1
    rows += EventRec(id, new Timestamp(base + 430000L), 1, "click", 450, "{}")
    val norm = CityEvents.normalize(rows.toSeq.toDF())
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("city"), r.getAs[Int]("streak"),
        r.getAs[Timestamp]("last_ts").getTime)).sortBy(x => (x._1, x._3, x._2)).toSeq
    for (k <- Seq(1, 2, 3); segw <- Seq("10 seconds", "37 seconds")) {
      val one = canon(Stateful.severityStreaksBatch(norm, k))
      val seg = canon(Stateful.severityStreaksBatchSegmented(norm, k, segw))
      assert(one.nonEmpty, s"fixture must emit at k=$k")
      assert(seg == one,
        s"segmented (k=$k, seg=$segw) must equal one-phase: ${seg.size} vs ${one.size} rows\n" +
          s" seg-only: ${seg.diff(one).take(5)}\n one-only: ${one.diff(seg).take(5)}")
    }
  }

  test("segmented stitch plan: one exchange for the heavy phase, fine windows never reshuffle") {
    import spark.implicits._
    // repartition(4) forces a non-aligned input distribution — a single
    // in-memory partition would satisfy every clustering trivially and
    // the plan would show no exchanges at all
    val norm = CityEvents.normalize(Seq(
      EventRec(1, ts("2024-01-01 10:00:00"), 0, "click", 300, "{}"),
      EventRec(2, ts("2024-01-01 10:00:10"), 0, "click", 300, "{}"),
      EventRec(3, ts("2024-01-01 10:00:20"), 1, "click", 50, "{}")).toDF())
      .repartition(4)
    val df = Stateful.severityStreaksBatchSegmented(norm, 3, "10 seconds")
    df.collect() // exchanges exist only in the executed (post-EnsureRequirements) plan
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.map(_.trim).toList
    val segExchanges = finalPlan
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("seg"))
    assert(segExchanges.filterNot(_.contains("ReusedExchange")).size == 1,
      s"the whole heavy phase must hang off ONE live (city, seg) exchange " +
        s"(the union's second branch must reuse it):\n${segExchanges.mkString("\n")}")
    assert(!finalPlan.exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("island")),
      "the finer (city, seg, island) windows must reuse the (city, seg) " +
        "partitioning via local sorts, never reshuffle")
  }

  test("batch gaps-and-islands streaks ≡ streaming flatMapGroupsWithState on one fixture (r7 item 3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two cities (user_id 0 → SF, 1 → NYC), lows breaking streaks, a
    // same-timestamp (low, high) tie, and streaks that only complete
    // ACROSS a micro-batch boundary. Batches arrive in event-time order —
    // the streaming operator's documented delivery assumption; under it
    // the incremental run must equal the batch window formulation exactly.
    def e(id: Long, user: Long, t: String, v: Double) =
      EventRec(id, ts(t), user, "click", v, "{}")
    val batches = Seq(
      Seq(e(1, 0, "2024-01-01 10:00:00", 300), e(2, 0, "2024-01-01 10:00:10", 300),
        e(3, 1, "2024-01-01 10:00:05", 300), e(4, 1, "2024-01-01 10:00:06", 50),
        // tie: low and high on one stamp — low sorts first, high starts a run
        e(5, 1, "2024-01-01 10:00:07", 450), e(6, 1, "2024-01-01 10:00:07", 50)),
      Seq(e(7, 0, "2024-01-01 10:00:20", 450), // completes SF's 3-streak
        e(8, 1, "2024-01-01 10:00:08", 300), e(9, 1, "2024-01-01 10:00:09", 300)),
      Seq(e(10, 0, "2024-01-01 10:00:30", 50), // SF reset
        e(11, 0, "2024-01-01 10:00:40", 300), e(12, 0, "2024-01-01 10:00:50", 300),
        e(13, 0, "2024-01-01 10:01:00", 300), e(14, 0, "2024-01-01 10:01:10", 300),
        e(15, 1, "2024-01-01 10:00:11", 300))) // NYC alert: tie-high + 8,9... 11 extends
    val input = MemoryStream[EventRec]
    val q = Stateful.severityStreaks(CityEvents.normalize(input.toDF()), minStreak = 3)
      .writeStream.outputMode("append").format("memory").queryName("paritystreaks").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("paritystreaks").collect()
        .map(r => (r.getAs[String]("city"), r.getAs[Int]("streak"),
          r.getAs[Timestamp]("last_ts"))).sortBy(x => (x._1, x._3.getTime))
      val batch = Stateful.severityStreaksBatch(
        CityEvents.normalize(batches.flatten.toDF()), minStreak = 3).collect()
        .map(r => (r.getAs[String]("city"), r.getAs[Int]("streak"),
          r.getAs[Timestamp]("last_ts"))).sortBy(x => (x._1, x._3.getTime))
      assert(streamed.nonEmpty, "fixture must produce alerts")
      assert(streamed.toSeq == batch.toSeq,
        s"batch formulation must equal streaming output:\n stream ${streamed.toSeq}\n batch  ${batch.toSeq}")
      // engagement: both cities alert, and one alert crossed a batch boundary
      assert(streamed.map(_._1).distinct.sorted.toSeq == Seq("NYC", "SF"))
    } finally q.stop()
  }

  test("observe() metrics surface per-batch producer telemetry (A7 streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new graft.streaming.Pipeline(spark,
      java.nio.file.Files.createTempDirectory("store").toString,
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    val q = p.startRawEvents(input.toDF())
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 300), ev(2, "2024-01-01 10:00:10", 50))
      q.processAllAvailable()
      val obs = q.recentProgress.flatMap(pr =>
        Option(pr.observedMetrics.get("producer_metrics"))).lastOption
      assert(obs.nonEmpty, "expected observed metrics on the raw-events query")
      assert(obs.get.getAs[Long]("event_count") == 2)
    } finally q.stop()
  }

  test("processing-time mode pipeline runs and stamps arrival time (T1 fidelity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new graft.streaming.Pipeline(spark,
      java.nio.file.Files.createTempDirectory("store").toString,
      java.nio.file.Files.createTempDirectory("ckpt").toString,
      processingTimeMode = true)
    val q = p.startWindowedAgg(input.toDF())
    try {
      input.addData(ev(1, "1999-01-01 00:00:00", 300)) // ancient event time
      q.processAllAvailable()
      val store = graft.sources.KeyedUpsertSink.read(spark, p.aggStorePath).collect()
      assert(store.length == 1)
      // stamped on arrival: the window is from current wall time, not 1999
      assert(store.head.getAs[String]("window_start").startsWith("20") &&
        !store.head.getAs[String]("window_start").startsWith("1999"))
    } finally q.stop()
  }

  test("alert throttle: rolling suppression carries across micro-batches; stream equals batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val alerts = CityEvents.normalize(input.toDF())
      .filter(org.apache.spark.sql.functions.col("severity").isin("high", "critical"))
    val q = Stateful.alertThrottle(alerts, gapMinutes = 60)
      .writeStream.outputMode("append").format("memory").queryName("throttle").start()
    // all user 0 -> SF; value 300 -> high
    val batches = Seq(
      // batch 1: 10:00 emits; 10:30 suppressed (rolling: < 60m after EMITTED)
      Seq(ev(1, "2024-01-01 10:00:00", 300), ev(2, "2024-01-01 10:30:00", 300)),
      // batch 2: 10:59 still suppressed BY THE BATCH-1 EMISSION (state
      // carries; a per-batch reset would emit it); 11:00 exactly at the
      // gap emits
      Seq(ev(3, "2024-01-01 10:59:00", 300), ev(4, "2024-01-01 11:00:00", 300)),
      // batch 3: 11:30 suppressed by the 11:00 emission — NOT by 10:59
      // (suppression anchors at emissions, never at suppressed alerts)
      Seq(ev(5, "2024-01-01 11:30:00", 300)))
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
      val got = spark.table("throttle").collect()
        .map(r => r.getAs[Long]("event_id")).sorted.toSeq
      assert(got == Seq(1L, 4L), s"only 10:00 and 11:00 emit: $got")
    } finally q.stop()
    // batch twin on the SAME flattened data: identical emissions
    val batchAlerts = CityEvents.normalize(
      batches.flatten.toDF()).filter(
      org.apache.spark.sql.functions.col("severity").isin("high", "critical"))
    val folded = Stateful.alertThrottleBatch(batchAlerts, gapMinutes = 60)
      .collect().map(_.getAs[Long]("event_id")).sorted.toSeq
    assert(folded == Seq(1L, 4L), s"batch fold must equal the stream: $folded")
    // corpus non-vacuity at the registry's 24h gap: something suppressed
    val corpusAlerts = graft.operators.StreamAggregates.alerts(
      CityEvents.normalize(Tables.events(spark, sf)))
    val emitted = Stateful.alertThrottleBatch(corpusAlerts).count()
    assert(emitted > 0 && emitted < corpusAlerts.count(),
      s"the 24h throttle must both emit and suppress on the corpus: $emitted of ${corpusAlerts.count()}")
  }

  test("k-anon gate: a class quarantines until its k-th member, then flushes whole and passes through") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 3)
      .writeStream.outputMode("append").format("memory").queryName("kanon_spec").start()
    try {
      // batch 1: two same-class rows — below k, both quarantined
      input.addData(ev(1, "2024-01-01 10:00:00", 10), ev(2, "2024-01-01 10:00:10", 20))
      q.processAllAvailable()
      assert(spark.table("kanon_spec").count() == 0)
      // batch 2: the k-th member arrives — the WHOLE class flushes, in
      // arrival order, quarantined rows first
      input.addData(ev(3, "2024-01-01 10:00:20", 30))
      q.processAllAvailable()
      val rel = spark.table("kanon_spec").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("class_seen"))).toSet
      assert(rel == Set((1L, 1L), (2L, 2L), (3L, 3L)), s"flush must carry ordinals: $rel")
      // batch 3: the class is open — straight through with the next ordinal
      input.addData(ev(4, "2024-01-01 10:00:30", 40))
      q.processAllAvailable()
      assert(spark.table("kanon_spec").count() == 4)
      // a different DAY is a different class — quarantined again
      input.addData(ev(5, "2024-01-02 09:00:00", 10))
      q.processAllAvailable()
      assert(spark.table("kanon_spec").count() == 4)
    } finally q.stop()
  }

  test("k-anon gate TTL: state expires at the day horizon, withholding and final") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    def e(id: Long, t: String, typ: String) =
      EventRec(id, ts(t), 0, typ, 50.0, s"""{"k": $id}""")
    val input = MemoryStream[EventRec]
    val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 3,
        quarantineTtl = Some("1 hour"))
      .writeStream.outputMode("append").format("memory").queryName("kanon_ttl").start()
    try {
      // batch 1: two day-1 click events quarantine (k=3)
      input.addData(e(1, "2024-01-01 10:00:00", "click"),
        e(2, "2024-01-01 10:00:10", "click"))
      q.processAllAvailable()
      assert(spark.table("kanon_ttl").count() == 0)
      // batch 2: three day-1 view events release whole; watermark -> 12:02
      input.addData(e(10, "2024-01-01 13:00:00", "view"),
        e(11, "2024-01-01 13:01:00", "view"), e(12, "2024-01-01 13:02:00", "view"))
      q.processAllAvailable()
      assert(spark.table("kanon_ttl").count() == 3)
      // batch 3: a LATE day-1 click (11:00 < the 12:02 watermark) is
      // filtered before the operator — it must not complete the class
      input.addData(e(3, "2024-01-01 11:00:00", "click"))
      q.processAllAvailable()
      assert(spark.table("kanon_ttl")
        .filter(col("event_type") === "click").count() == 0)
      // batches 4-5: day-2 traffic pushes the watermark past day-1's end
      // (02:10 - 1h > midnight) — BOTH day-1 classes expire: the click
      // class's quarantined rows drop forever, the view class's counter
      // drops after its release. The day-2 class (2 < k) is the only
      // state left. Expiry is final by construction: any day-1 timestamp
      // is now below the watermark, so no event can revive the class.
      input.addData(e(20, "2024-01-02 02:10:00", "view"))
      q.processAllAvailable()
      input.addData(e(21, "2024-01-02 02:20:00", "view"))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1,
        s"day-1 classes must expire at the day horizon: $stateRows state rows")
      assert(spark.table("kanon_ttl")
        .filter(col("event_type") === "click").count() == 0,
        "an expired below-k class releases nothing, ever")
      // the surviving day-2 class still releases whole at k
      input.addData(e(22, "2024-01-02 02:30:00", "view"))
      q.processAllAvailable()
      val day2 = spark.table("kanon_ttl")
        .filter(col("day") === "2024-01-02")
        .select("event_id", "class_seen").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(day2 == Set((20L, 1L), (21L, 2L), (22L, 3L)),
        s"the live class must release whole when it reaches k: $day2")
    } finally q.stop()
  }

  test("k-anon gate DEFAULT is bounded: state drops at day rollover without opting in (r14 verdict 1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    def e(id: Long, t: String, typ: String) =
      EventRec(id, ts(t), 0, typ, 50.0, s"""{"k": $id}""")
    val input = MemoryStream[EventRec]
    // NO quarantineTtl argument: the default configuration must be the
    // bounded one (day-horizon TTL at the default 1-day lateness)
    val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 3)
      .writeStream.outputMode("append").format("memory").queryName("kanon_default").start()
    try {
      // batch 1: two day-1 click events quarantine (k=3)
      input.addData(e(1, "2024-01-01 10:00:00", "click"),
        e(2, "2024-01-01 10:00:10", "click"))
      q.processAllAvailable()
      assert(spark.table("kanon_default").count() == 0)
      // batches 2-3: day-3 traffic pushes the watermark (default 1-day
      // lateness) past day-1's end — the below-k click class must EXPIRE
      // under the default configuration, releasing nothing
      input.addData(e(20, "2024-01-03 02:00:00", "view"))
      q.processAllAvailable()
      input.addData(e(21, "2024-01-03 02:10:00", "view"))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1,
        s"the DEFAULT gate must expire day-1 state at the day horizon: $stateRows state rows")
      assert(spark.table("kanon_default")
        .filter(col("event_type") === "click").count() == 0,
        "an expired below-k class releases nothing under the default gate")
    } finally q.stop()
  }

  test("k-anon gate TTL in a non-UTC session: day end follows the session zone (r14 ADVICE)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // Instants fixed explicitly (TZ-independent of the JVM default); the
    // session zone names the day. 07:00Z on Jan 2 is 23:00 Jan 1 in LA.
    def e(id: Long, instant: String, typ: String) =
      EventRec(id, Timestamp.from(java.time.Instant.parse(instant)), 0, typ,
        50.0, s"""{"k": $id}""")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val input = MemoryStream[EventRec]
      val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 3,
          quarantineTtl = Some("1 hour"))
        .writeStream.outputMode("append").format("memory").queryName("kanon_la").start()
      try {
        // batch 1: two clicks in the LA evening of Jan 1 (already Jan 2
        // in UTC) — watermark after the batch: 06:10Z
        input.addData(e(1, "2024-01-02T07:00:00Z", "click"),
          e(2, "2024-01-02T07:10:00Z", "click"))
        q.processAllAvailable()
        assert(spark.table("kanon_la").count() == 0)
        // batch 2: the k-th click at 07:30Z (23:30 LA, same LA day). The
        // class releases and re-arms its timeout; the pre-fix UTC day end
        // (2024-01-02T00:00Z) is BELOW the 06:10Z watermark here, so the
        // old code threw from setTimeoutTimestamp and failed the query —
        // the session-zone day end (08:00Z) stays ahead.
        input.addData(e(3, "2024-01-02T07:30:00Z", "click"))
        q.processAllAvailable()
        val rel = spark.table("kanon_la").collect()
        assert(rel.length == 3)
        assert(rel.forall(_.getAs[String]("day") == "2024-01-01"),
          "the class day must be named in the session zone")
        // batches 3-4: push the watermark past the LA day end (08:00Z) —
        // the released class's counter state expires exactly then
        input.addData(e(20, "2024-01-02T10:00:00Z", "view"))
        q.processAllAvailable()
        input.addData(e(21, "2024-01-02T10:10:00Z", "view"))
        q.processAllAvailable()
        val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
        assert(stateRows == 1,
          s"the LA day-1 class must expire once the watermark passes 08:00Z: $stateRows")
        assert(spark.table("kanon_la")
          .filter(col("event_type") === "click").count() == 3)
      } finally q.stop()
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("k-anon gate accepts a short-ID session timezone (PST) like Spark itself (r16 ADVICE)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Spark's DateTimeUtils.getZoneId resolves "PST" via ZoneId.SHORT_IDS
    // (→ America/Los_Angeles); the gate's captured-zone path must match —
    // pre-fix, plain ZoneId.of("PST") threw ZoneRulesException at BUILD
    // time even with quarantineTtl=None (no timeout path involved).
    def e(id: Long, instant: String) =
      EventRec(id, Timestamp.from(java.time.Instant.parse(instant)), 0,
        "click", 50.0, s"""{"k": $id}""")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "PST")
    try {
      val input = MemoryStream[EventRec]
      val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 2,
          quarantineTtl = None)
        .writeStream.outputMode("append").format("memory")
        .queryName("kanon_pst").start()
      try {
        // 07:00Z Jan 2 = 23:00 Jan 1 in PST — day must be named 2024-01-01
        input.addData(e(1, "2024-01-02T07:00:00Z"), e(2, "2024-01-02T07:10:00Z"))
        q.processAllAvailable()
        val rel = spark.table("kanon_pst").collect()
        assert(rel.length == 2)
        assert(rel.forall(_.getAs[String]("day") == "2024-01-01"),
          "the class day must be named in the SHORT_IDS-resolved zone")
      } finally q.stop()
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("k-anon gate: a 100k-row single-batch class processes in event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the operational bound is per-batch group size (the severityStreaks
    // memory note applies): one class takes a 100k-event micro-batch in
    // SHUFFLED arrival order; the in-batch (event-time, event_id) sort
    // must hand out ordinals in event-time order regardless
    val n = 100000
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rng = new scala.util.Random(11)
    val events = rng.shuffle((0 until n).toVector).map { i =>
      EventRec(i.toLong, new Timestamp(base + i.toLong * 100), 0, "click",
        50.0, s"""{"k": $i}""")
    }
    val input = MemoryStream[EventRec]
    val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 5)
      .writeStream.outputMode("append").format("memory").queryName("kanon_big").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val rel = spark.table("kanon_big").select("event_id", "class_seen").collect()
      assert(rel.length == n)
      // ordinal == event-time rank == event_id + 1 (ids were assigned in time order)
      assert(rel.forall(r => r.getLong(1) == r.getLong(0) + 1),
        "ordinals must follow event time, not arrival order")
    } finally q.stop()
  }

  test("k-anon release twin plan: count and rank share ONE QI-keyed exchange") {
    import spark.implicits._
    val norm = CityEvents.normalize(Seq(
      EventRec(1, ts("2024-01-01 10:00:00"), 0, "click", 50, "{}"),
      EventRec(2, ts("2024-01-01 10:00:10"), 0, "click", 50, "{}"),
      EventRec(3, ts("2024-01-01 11:00:00"), 1, "view", 50, "{}")).toDF())
      .repartition(4)
    val df = graft.operators.Pii.kAnonymityRelease(norm, k = 2)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.map(_.trim).toList
    // the class-total count window and the rank window cluster on the same
    // (city, event_type, day) tuple — Spark must plan ONE live hash
    // exchange for both (the presentation orderBy adds its range exchange)
    val hashExchanges = finalPlan
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("ReusedExchange"))
    assert(hashExchanges.size == 1,
      s"count + rank must share one QI exchange:\n${hashExchanges.mkString("\n")}")
  }

  test("k-anon gate stream ≡ batch release twin on an in-order feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two cities (users 0/7), two types, two days — classes of width 1..4
    def e(id: Long, t: String, user: Long, typ: String) =
      EventRec(id, ts(t), user, typ, 50.0, s"""{"k": $id}""")
    val batches = Seq(
      Seq(e(1, "2024-01-01 08:00:00", 0, "click"), e(2, "2024-01-01 09:00:00", 0, "click"),
        e(3, "2024-01-01 09:30:00", 7, "click")),
      Seq(e(4, "2024-01-01 10:00:00", 0, "click"), e(5, "2024-01-01 11:00:00", 0, "view"),
        e(6, "2024-01-01 12:00:00", 0, "click")),
      Seq(e(7, "2024-01-02 08:00:00", 0, "click"), e(8, "2024-01-02 09:00:00", 0, "click")))
    val input = MemoryStream[EventRec]
    val q = Stateful.kAnonymityGate(CityEvents.normalize(input.toDF()), k = 2)
      .writeStream.outputMode("append").format("memory").queryName("kanon_par").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("kanon_par")
        .select("city", "event_type", "day", "event_id", "class_seen").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = graft.operators.Pii.kAnonymityRelease(
          CityEvents.normalize(batches.flatten.toDF()), k = 2)
        .select("city", "event_type", "day", "event_id", "class_seen").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(streamed == batch, s"stream: $streamed\nbatch: $batch")
      // the single-member classes (user 7 click; user 0 view) stay quarantined
      assert(!streamed.exists(r => r._4 == 3L || r._4 == 5L),
        s"below-k classes must not release: $streamed")
    } finally q.stop()
  }

  test("kafka record stage: key=city, value=full-row JSON (S3)") {
    val norm = CityEvents.normalize(Tables.events(spark, sf))
    val recs = EventStreamSource.toKafkaRecords(norm)
    assert(recs.schema.fieldNames.toSeq == Seq("key", "value"))
    val r = recs.limit(1).collect().head
    assert(CityEvents.Cities.contains(r.getString(0)))
    val v = r.getString(1)
    assert(v.startsWith("{") && v.contains("\"rec_id\"") && v.contains("\"severity\""))
  }
}

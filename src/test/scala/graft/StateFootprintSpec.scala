package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.CityEvents
import graft.streaming.{Pipeline, Stateful}

/** State-store footprint record for the wide topology (r16 verdict 7):
  * [[Pipeline.stateFootprint]] surfaces per-member state rows/bytes, and
  * this spec pins each stateful-member CLASS to its growth law over a
  * multi-day replay with a fixed key universe:
  *
  *  - bounded-by-keys (streaks, throttle custom state): rows == |keys|,
  *    CONSTANT across days of traffic;
  *  - horizon-bounded (watermarked window agg, TTL'd k-anon gate): rows
  *    track only the LIVE horizon — day-1 state is gone after the
  *    watermark passes it;
  *  - unbounded-by-design (complete-mode A2 global counts, the
  *    reference's own semantics): rows == distinct groups ever seen,
  *    never evicted — labeled so the record reads honestly.
  */
class StateFootprintSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long, typ: String = "click",
                 v: Double = 450.0): EventRec =
    EventRec(id, ts(t), user, typ, v, s"""{"k": $id}""")
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("per-member state growth laws: bounded-by-keys constant, " +
    "horizon-bounded evicts day 1, complete-mode grows and never drops") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val norm = CityEvents.normalize(input.toDF())
    val p = new Pipeline(spark, tmp("fpstore"), tmp("fpckpt"))
    val members = Seq(
      "streaks" -> Stateful.severityStreaks(norm, minStreak = 2)
        .writeStream.outputMode("append").format("memory")
        .queryName("fp_streaks").start(),
      "throttle" -> Stateful.alertThrottle(norm)
        .writeStream.outputMode("append").format("memory")
        .queryName("fp_throttle").start(),
      "kanon_gate" -> Stateful.kAnonymityGate(norm, k = 3,
          quarantineTtl = Some("1 hour"))
        .writeStream.outputMode("append").format("memory")
        .queryName("fp_gate").start(),
      "windowed_agg" -> p.startWindowedAgg(input.toDF()),
      "global_counts[unbounded-by-design]" -> p.startMonitoring(
        input.toDF(), queryName = "fp_monitoring"))
    def rows(): Map[String, Long] = {
      val fp = Pipeline.stateFootprint(members)
      assert(fp.forall(_.state_bytes > 0L),
        s"every stateful operator must report real state bytes: $fp")
      fp.groupBy(_.member).view.mapValues(_.map(_.n_state_rows).sum).toMap
    }
    def drain(): Unit = members.foreach(_._2.processAllAvailable())
    try {
      // day 1, two users (→ two distinct cities), critical clicks —
      // two batches so every custom state crosses an epoch boundary
      input.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:00:00", 2))
      drain()
      input.addData(ev(3, "2024-01-01 10:06:00", 1), ev(4, "2024-01-01 10:06:00", 2))
      drain()
      val f1 = rows()
      assert(f1("streaks") == 2, s"one streak counter per city: $f1")
      assert(f1("throttle") == 2, s"one throttle anchor per (city, severity): $f1")
      assert(f1("kanon_gate") == 2, s"one class per (city, type, day): $f1")
      assert(f1("global_counts[unbounded-by-design]") == 2, s"$f1")
      val a1Day1 = f1("windowed_agg")
      assert(a1Day1 >= 4, s"two 5-min windows × two groups open on day 1: $f1")
      // day 3: SAME key universe (+ one genuinely new group for A2), the
      // watermark sails past every day-1 window and the gate's day-1 end
      input.addData(ev(11, "2024-01-03 10:00:00", 1), ev(12, "2024-01-03 10:00:00", 2))
      drain()
      input.addData(ev(13, "2024-01-03 10:06:00", 1), ev(14, "2024-01-03 10:06:00", 2),
        ev(15, "2024-01-03 10:06:00", 1, typ = "view", v = 50.0))
      drain()
      // one more nudge batch (same windows, same keys): guarantees the
      // post-watermark eviction pass has run before measuring
      input.addData(ev(16, "2024-01-03 10:07:00", 1))
      drain()
      val f2 = rows()
      // bounded-by-keys: two days of traffic, identical footprint
      assert(f2("streaks") == 2, s"streak state is O(1) per city, forever: $f2")
      assert(f2("throttle") == 3,
        s"throttle state is O(1) per (city, severity) key — the one new " +
          s"key is the day-3 view event's (city, low): $f2")
      // horizon-bounded: day-1 classes/windows are GONE, not accreted
      assert(f2("kanon_gate") == 3,
        s"day-1 classes expired at their day end; only day-3's three " +
          s"classes hold state (5 would mean unbounded accretion): $f2")
      assert(f2("windowed_agg") == 5,
        s"only day-3's five open (window, city, type) groups hold state " +
          s"(${a1Day1 + 5} would mean day-1 windows never evicted): $f2")
      // unbounded-by-design, labeled: every group ever seen, never dropped
      assert(f2("global_counts[unbounded-by-design]") == 3,
        s"complete-mode counts retain day-1 groups and grow with the new " +
          s"one — the labeled unbounded member: $f2")
    } finally members.foreach(_._2.stop())
  }

  test("rocksdb tuning preset: N-epoch replay under default vs tuned store — " +
    "identical outputs and footprint, changelog engaged (r17 verdict 8)") {
    implicit val sqlCtx = spark.sqlContext
    // the same 4-epoch event replay through the watermarked windowed-agg
    // member, once per store config; the preset must be BEHAVIOR-NEUTRAL
    // (identical upserted store + identical state footprint), engage
    // changelog checkpointing (observable as *.changelog files in the
    // state checkpoint), and the per-epoch batch latencies land in the
    // test report for the record.
    val epochs = Seq(
      Seq(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:00:00", 2)),
      Seq(ev(3, "2024-01-01 10:06:00", 1), ev(4, "2024-01-01 10:06:00", 2)),
      Seq(ev(11, "2024-01-03 10:00:00", 1), ev(12, "2024-01-03 10:00:00", 2)),
      Seq(ev(13, "2024-01-03 10:06:00", 1), ev(14, "2024-01-03 10:06:00", 2),
        ev(15, "2024-01-03 10:06:00", 1, typ = "view", v = 50.0)))
    def run(conf: Map[String, String], tag: String)
        : (Set[String], Seq[Long], Seq[Long], String) = {
      val input = MemoryStream[EventRec]
      val store = tmp(s"rdb_store_$tag")
      val ckpt = tmp(s"rdb_ckpt_$tag")
      val p = new Pipeline(spark, store, ckpt,
        stateStoreProvider = Some(Pipeline.RocksDbStateStore),
        stateStoreConf = conf)
      val q = p.startWindowedAgg(input.toDF())
      val lat = Seq.newBuilder[Long]
      try {
        epochs.foreach { e =>
          input.addData(e: _*)
          q.processAllAvailable()
          lat += Option(q.lastProgress).map(_.batchDuration).getOrElse(-1L)
        }
        val out = graft.sources.KeyedUpsertSink.read(spark, p.aggStorePath)
          .select("partition_key", "event_count")
          .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").toSet
        val fp = Pipeline.stateFootprint(Seq(tag -> q)).map(_.n_state_rows)
        (out, fp, lat.result(), ckpt)
      } finally q.stop()
    }
    // explicit-off map for the control run so the session conf the tuned
    // run sets cannot leak backwards/forwards between runs
    val offConf = Pipeline.RocksDbTunedConf.map {
      case (k, _) if k.endsWith("maxMemoryUsageMB") => k -> "0"
      case (k, _) => k -> "false"
    }
    try {
      val (outA, fpA, latA, ckptA) = run(offConf, "default")
      val (outB, fpB, latB, ckptB) = run(Pipeline.RocksDbTunedConf, "tuned")
      assert(outA == outB, s"tuned store must upsert identical rows: $outA vs $outB")
      assert(outA.nonEmpty, "the replay produced rows")
      assert(fpA == fpB, s"identical state footprint: $fpA vs $fpB")
      def changelogs(ckpt: String): Int = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala
          .count(_.getFileName.toString.endsWith(".changelog"))
      }
      assert(changelogs(ckptB) > 0,
        "changelog checkpointing must write *.changelog commit files")
      assert(changelogs(ckptA) == 0,
        "the control run must checkpoint full snapshots, not changelogs")
      info(s"per-epoch batchDuration ms — default: ${latA.mkString(",")} " +
        s"tuned: ${latB.mkString(",")}")
    } finally Pipeline.RocksDbTunedConf.keys.foreach(spark.conf.unset)
  }
}

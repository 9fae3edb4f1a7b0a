package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Operator specs for the CityStream-parity surface (SURVEY.md §2). */
class CityStreamSpec extends SparkSpec {

  import java.sql.Timestamp

  private lazy val norm   = CityEvents.normalize(Tables.events(spark, sf)).cache()
  private lazy val agg    = StreamAggregates.windowedAggregate(norm)
  private lazy val alerts = StreamAggregates.alerts(norm)

  test("normalize derives city/severity domains and unique rec ids per event") {
    val n = norm.count()
    assert(n == 1000)
    val cities = norm.select("city").distinct().collect().map(_.getString(0)).toSet
    assert(cities.subsetOf(CityEvents.Cities.toSet))
    val sevs = norm.select("severity").distinct().collect().map(_.getString(0)).toSet
    assert(sevs.subsetOf(CityEvents.Severities.toSet))
    assert(norm.filter(col("prop_k").isNull).count() == 0)
  }

  test("windowed aggregate partitions counts exactly (A1)") {
    val total = agg.agg(sum("event_count")).head().getLong(0)
    assert(total == 1000)
    // severities list length == event_count for every group
    val bad = agg.filter(size(col("severities")) =!= col("event_count")).count()
    assert(bad == 0)
    // partition_key is unique (window × city × type)
    assert(agg.select("partition_key").distinct().count() == agg.count())
  }

  test("windowed count-map aggregate agrees with the collect_list form (A1 at scale)") {
    val counts = StreamAggregates.windowedAggregateCounts(norm)
    // per-severity counts partition the group total
    val sevSum = CityEvents.Severities.map(s => col(s"n_$s")).reduce(_ + _)
    assert(counts.filter(sevSum =!= col("event_count")).count() == 0)
    // and equal the element frequencies of the fidelity variant's list,
    // group by group (join on the shared partition_key)
    val fromList = agg.select(col("partition_key") +: CityEvents.Severities.map(s =>
      size(filter(col("severities"), x => x === s)).cast("long").as(s"l_$s")): _*)
    val joined = counts.join(fromList, "partition_key")
    val mismatch = CityEvents.Severities.map(s =>
      col(s"n_$s") =!= col(s"l_$s")).reduce(_ || _)
    assert(joined.count() == agg.count() && joined.filter(mismatch).count() == 0)
  }

  test("windowed aggregate buckets are 5-minute aligned") {
    val misaligned = agg.filter(
      minute(to_timestamp(col("window_start"))) % 5 =!= 0 ||
      second(to_timestamp(col("window_start"))) =!= 0).count()
    assert(misaligned == 0)
  }

  test("alert filter keeps exactly high/critical (F1)") {
    val sevs = alerts.select("severity").distinct().collect().map(_.getString(0)).toSet
    assert(sevs.subsetOf(Set("high", "critical")))
    val expected = norm.filter(col("severity").isin("high", "critical")).count()
    assert(alerts.count() == expected)
  }

  test("global counts roll up to total (A2)") {
    val gc = StreamAggregates.globalCounts(norm)
    assert(gc.agg(sum("event_count")).head().getLong(0) == 1000)
  }

  test("serving: summary equals direct regroup (A3)") {
    val la = Serving.summary(agg, "LA").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = norm.filter(col("city") === "LA").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(la == direct)
  }

  test("serving: cities are ordered by total desc and cover all traffic (A4/O4)") {
    val rows = Serving.cities(agg).collect()
    val totals = rows.map(_.getLong(1))
    assert(totals.sameElements(totals.sortBy(-_)))
    assert(totals.sum == 1000)
  }

  test("serving: alertsRecent respects cutoff, ordering and limit (F4-F6/O2/O5)") {
    val r = Serving.alertsRecent(alerts, None, 24, limit = 10).collect()
    assert(r.length <= 10)
    val ids = r.map(_.getLong(0))
    // recent-first: strictly decreasing event_id within equal ts is allowed;
    // check ts_str non-increasing
    val ts = r.map(_.getString(2))
    assert(ts.sameElements(ts.sorted(Ordering[String].reverse)))
  }

  test("serving: alert severity counts zero-seed missing severities (A6)") {
    val only = alerts.filter(col("severity") === "high") // drop critical
    val m = Serving.alertSeverityCounts(only, spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("high", "critical"))
    assert(m("critical") == 0)
    assert(m("high") > 0)
  }

  test("serving: producer metrics are consistent (A7)") {
    val r = Serving.producerMetrics(norm).head()
    val n = r.getAs[Long]("event_count")
    assert(n == 1000)
    val avg = r.getAs[Double]("value_avg")
    val s = r.getAs[Double]("value_sum")
    assert(math.abs(avg - s / n) < 1e-9)
    assert(r.getAs[Double]("value_min") <= avg && avg <= r.getAs[Double]("value_max"))
    assert(r.getAs[Double]("events_per_sec") > 0)
  }

  test("ttl retention ages events across the expiry boundary (S4)") {
    import spark.implicits._
    // three events: 40 days old, 10 days old, and "now" — a 30-day ttl
    // must expire exactly the first when now is pinned to max(ts)
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-31 00:00:00")),
      (3L, Timestamp.valueOf("2024-02-10 00:00:00"))
    ).toDF("event_id", "ts")
    val live = Retention.retainedAtMaxTs(Retention.withTtl(df, "30 days"))
    assert(live.select("event_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // explicit clock: advance now past every ttl -> empty store
    val later = Retention.retained(Retention.withTtl(df, "30 days"),
      lit(Timestamp.valueOf("2024-12-01 00:00:00")))
    assert(later.count() == 0)
    // ttl is write-side state: it rides along as a column
    assert(Retention.withTtl(df).columns.contains("ttl"))
  }

  test("serving: eventsByCity filters and caps (F2/O1/O5)") {
    val r = Serving.eventsByCity(norm, "SF", 5).collect()
    assert(r.length == 5)
    assert(r.forall(_.getAs[String]("city") == "SF"))
  }

  test("rawEventsDeduped: max-struct aggregate ≡ rn=1 window, incl. forced collisions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // real fixture (organic rec_id collisions at sf0.001) + a forced
    // 3-way collision whose winner is decided strictly by event_id
    val forced = Seq(
      (9001L, "2024-01-01T00:00:00Z", "SF", "view", "low", "a", "K"),
      (9003L, "2024-01-01T00:00:00Z", "SF", "view", "high", "c", "K"),
      (9002L, "2024-01-01T00:00:00Z", "SF", "view", "medium", "b", "K"))
      .toDF("event_id", "ts_str", "city", "event_type", "severity", "description", "rec_id")
    val in = norm.select("event_id", "ts_str", "city", "event_type",
      "severity", "description", "rec_id").unionByName(forced)
    // the pre-r17 window formulation, inlined as the reference semantics
    val w = Window.partitionBy("rec_id").orderBy(col("event_id").desc)
    val windowForm = in.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("rec_id", "ts_str", "city", "event_type", "severity", "description")
    val aggForm = StreamAggregates.rawEventsDeduped(in)
    assert(aggForm.count() == in.select("rec_id").distinct().count())
    assert(aggForm.exceptAll(windowForm).isEmpty &&
      windowForm.exceptAll(aggForm).isEmpty)
    // the forced collision resolves to the highest event_id's payload
    val kRow = aggForm.filter(col("rec_id") === "K").collect()
    assert(kRow.length == 1 && kRow(0).getAs[String]("severity") == "high")
  }
}

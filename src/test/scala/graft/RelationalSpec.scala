package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the relational extension surface + window variants. */
class RelationalSpec extends SparkSpec {

  private lazy val events   = Tables.events(spark, sf).cache()
  private lazy val norm     = CityEvents.normalize(events)
  private lazy val customer = Tables.customer(spark, sf)
  private lazy val orders   = Tables.orders(spark, sf)
  private lazy val lineitem = Tables.lineitem(spark, sf)

  test("pricing summary covers all lineitem rows below cutoff") {
    val r = Relational.pricingSummary(lineitem)
    val total = r.agg(sum("count_order")).head().getLong(0)
    val expected = lineitem
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
      .count()
    assert(total == expected)
    val row = r.head()
    assert(math.abs(row.getAs[Double]("avg_qty") -
      row.getAs[Double]("sum_qty") / row.getAs[Long]("count_order")) < 1e-9)
  }

  test("events enrichment loses no rows (every user_id has a customer)") {
    val r = Relational.eventsEnriched(events, customer,
      Tables.nation(spark, sf), Tables.region(spark, sf))
    assert(r.agg(sum("event_count")).head().getLong(0) == events.count())
  }

  test("enrichment join is broadcast (no shuffle on the fact side)") {
    val r = Relational.eventsEnriched(events, customer,
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val physical = r.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"))
    assert(!physical.contains("SortMergeJoin"))
  }

  test("semi ∪ anti partitions the customer table") {
    val semi = Relational.customersWithBigOrders(customer, orders, -1.0).count()
    val anti = Relational.customersWithoutOrders(customer, orders).count()
    assert(semi + anti == customer.count())
  }

  test("top-k per group emits at most k rows per city with correct ranking") {
    val r = Relational.topTypesPerCity(norm, 2).collect()
    val byCity = r.groupBy(_.getString(0))
    assert(byCity.values.forall(_.length <= 2))
    byCity.values.foreach { rows =>
      val counts = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("event_count"))
      assert(counts.sameElements(counts.sortBy(-_)))
    }
  }

  test("rollup grand total equals event count") {
    val r = Relational.cityTypeRollup(norm)
    val grand = r.filter(col("city") === "ALL" && col("event_type") === "ALL")
      .head().getAs[Long]("event_count")
    assert(grand == events.count())
  }

  test("approx distinct is within 10% of exact") {
    val exact = Relational.distinctUsers(events).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("distinct_users")).toMap
    Relational.approxDistinctUsers(events).collect().foreach { r =>
      val e = exact(r.getString(0)).toDouble
      assert(math.abs(r.getAs[Long]("approx_users") - e) / e < 0.1)
    }
  }

  test("approx-percentile bound: brackets are exact order statistics and the " +
    "GK estimate sits inside them") {
    val r = Relational.approxPercentileBound(lineitem).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (lo50, hi50) = (row.getDouble(2), row.getDouble(3))
      val (lo90, hi90) = (row.getDouble(4), row.getDouble(5))
      assert(lo50 <= hi50 && lo90 <= hi90 && hi50 <= hi90,
        s"bracket ordering broken: $row")
      assert(row.getInt(6) == 1, s"estimate escaped its rank contract: $row")
    }
    // brackets agree with exact interpolated percentiles: the exact p-th
    // value lies inside its own bracket too (value-at-rank monotonicity)
    val flags = r.map(_.getString(0))
    flags.foreach { f =>
      val exact = lineitem.filter(col("l_returnflag") === f)
        .agg(expr("percentile(l_quantity, array(0.5D, 0.9D))")).head()
        .getSeq[Double](0)
      val row = r.find(_.getString(0) == f).get
      assert(exact(0) >= row.getDouble(2) - 1 && exact(0) <= row.getDouble(3) + 1)
      assert(exact(1) >= row.getDouble(4) - 1 && exact(1) <= row.getDouble(5) + 1)
    }
  }

  test("set ops are consistent: |A∩B| + |A∖B| = |A|") {
    val inter = Relational.usersIntersect(events, "purchase", "error").count()
    val exc   = Relational.usersExcept(events, "purchase", "error").count()
    val a = events.filter(col("event_type") === "purchase").select("user_id").distinct().count()
    assert(inter + exc == a)
  }

  test("one-pass set-op forms ≡ the literal Dataset set operators (r18)") {
    // the r18 rewrites replace two-scan INTERSECT/UNION/EXCEPT shapes with
    // single-scan presence-flag aggregates; pin them against the literal
    // operators on the real table, per pair order (asymmetric for except)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq
    def of(t: String) =
      events.filter(col("event_type") === t).select("user_id").distinct()
    for ((t1, t2) <- Seq(("purchase", "error"), ("signup", "click"))) {
      assert(ids(Relational.usersIntersect(events, t1, t2)) ==
        ids(of(t1).intersect(of(t2)).orderBy("user_id")),
        s"intersect($t1, $t2)")
      assert(ids(Relational.usersUnion(events, t1, t2)) ==
        ids(of(t1).union(of(t2)).distinct().orderBy("user_id")),
        s"union($t1, $t2)")
    }
    def days(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .distinct()
    def key(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(key(Relational.userDaysExcept(events, "purchase", "view")) ==
      key(days("purchase").except(days("view")).orderBy("user_id", "day")),
      "userDaysExcept(purchase, view)")
  }

  test("sliding windows double-count each event exactly twice") {
    val r = StreamAggregates.slidingCounts(norm)
    assert(r.agg(sum("event_count")).head().getLong(0) == 2 * events.count())
  }

  test("session windows partition each user's events; gaps ≥ 30m split") {
    val r = StreamAggregates.userSessions(norm)
    assert(r.agg(sum("event_count")).head().getLong(0) == events.count())
    // session bounds: end = last event + 30m ⇒ end - start ≥ 30m
    val bad = r.filter(
      to_timestamp(col("session_end")) < to_timestamp(col("session_start")) + expr("INTERVAL 30 MINUTES")
    ).count()
    assert(bad == 0)
  }

  test("two-phase exact ranking ≡ the single-window ntile/percent_rank formulation") {
    import org.apache.spark.sql.expressions.Window
    // reference = the shape the two-phase operator replaced (fine as a TEST
    // oracle at this scale; a single-reducer anti-pattern in production)
    def naive(ev: org.apache.spark.sql.DataFrame) = {
      val counts = ev.groupBy("user_id").agg(count(lit(1)).as("event_count"))
      val w = Window.orderBy(col("event_count").desc, col("user_id"))
      counts.withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
    }
    val got = Relational.userActivityQuartiles(events).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = naive(events).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want) // exact, including bit-identical pct_rank doubles
  }

  test("two-phase ranking closed-form ntile handles n < tiles and uneven tails") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // n = 1 (pct_rank guard), n = 3 (< 4 tiles), n = 5, n = 7 (uneven tiles)
    for (n <- Seq(1, 3, 5, 7)) {
      val ev = (1 to n).flatMap(u => Seq.fill(u)((u.toLong, "click")))
        .toDF("user_id", "event_type")
      val got = Relational.userActivityQuartiles(ev, rangeBuckets = 4).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      val w = Window.orderBy(col("event_count").desc, col("user_id"))
      val want = ev.groupBy("user_id").agg(count(lit(1)).as("event_count"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w)).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(got == want, s"n=$n")
    }
  }

  test("anomalous windows: integer z-test flags the planted spike; the exact-2σ boundary does not flag") {
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00")
    // 6 windows, one 10× spike: a single outlier among N points sits at
    // √(N−1)σ, so N=6 puts it past 2σ -> flagged
    val spiky = (0 to 5).map(i => ("x", ts(i), if (i == 5) 10L else 1L))
      .toDF("city", "window_start", "event_count")
    val flagged = Relational.anomalousWindows(spiky).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(flagged.toSeq == Seq(("x", 10L)), s"only the spike flags: ${flagged.toSeq}")
    // N=5 puts the same spike at EXACTLY 2σ — strict inequality must not
    // flag it (the integer predicate decides the boundary bit-exactly,
    // where float variance could tip either way)
    val boundary = (0 to 4).map(i => ("x", ts(i), if (i == 4) 10L else 1L))
      .toDF("city", "window_start", "event_count")
    assert(Relational.anomalousWindows(boundary).count() == 0,
      "exactly 2σ is not > 2σ")
    // a flat city never flags
    val flat = (0 to 5).map(i => ("y", ts(i), 3L)).toDF("city", "window_start", "event_count")
    assert(Relational.anomalousWindows(flat).count() == 0)
  }

  test("ordered funnel: out-of-order journeys are excluded, steps monotone") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: in order; user 2: purchase BEFORE view (unordered funnel
    // would count it); user 3: signup only
    val fx = Seq(
      (1L, "signup", t("2024-01-01 10:00:00")), (1L, "view", t("2024-01-01 11:00:00")),
      (1L, "purchase", t("2024-01-01 12:00:00")),
      (2L, "signup", t("2024-01-01 10:00:00")), (2L, "purchase", t("2024-01-01 11:00:00")),
      (2L, "view", t("2024-01-01 12:00:00")),
      (3L, "signup", t("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = Serving.orderedFunnel(fx).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)),
      s"3 signups, 2 viewed after, only user 1 purchased in order: $r")
    // real corpus: the funnel narrows monotonically
    val real = Serving.orderedFunnel(events).head()
    assert(real.getLong(0) >= real.getLong(1) && real.getLong(1) >= real.getLong(2))
    assert(real.getLong(2) > 0, "the ordered funnel must be non-vacuous on the corpus")
  }

  test("day-hour heatmap: cells conserve the event count, empty cells are zero") {
    val r = Serving.dayHourHeatmap(events).collect()
    val total = r.map(row => (1 to 24).map(row.getLong).sum).sum
    assert(total == events.count(), "heatmap cells must partition all events")
    assert(r.forall(_.length == 25), "day + 24 static hour columns")
  }

  test("rolling active: each user-day feeds exactly its 7 trailing windows; WAU >= DAU") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // one user, one active day -> seven windows of exactly 1, then silence
    val solo = Seq((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 15:00:00")))
      .toDF("user_id", "ts")
    val r = Serving.rollingActive(solo).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.length == 7 && r.forall(_._2 == 1L), s"7 windows of 1: ${r.toSeq}")
    assert(r.head._1 == "2024-01-01" && r.last._1 == "2024-01-07")
    // real corpus: every window's WAU >= that day's DAU, and the curve
    // extends exactly 6 drain days past the last active day
    val wau = Serving.rollingActive(events).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val dau = Serving.dailyActive(events).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    dau.foreach { case (day, n) =>
      assert(wau(day) >= n, s"WAU($day)=${wau(day)} < DAU=$n") }
    assert(wau.size == dau.size + 6, "6 drain windows past the last data day")
  }

  test("retention cohorts: week-0 equals cohort size, cells never exceed it, users conserved") {
    val r = Serving.retentionCohorts(events).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.nonEmpty && r.forall(_._2 >= 0))
    val byCohort = r.groupBy(_._1)
    byCohort.foreach { case (week, cells) =>
      val w0 = cells.find(_._2 == 0L)
      assert(w0.isDefined, s"cohort $week must have a week-0 cell (its own signup week)")
      assert(cells.forall(_._3 <= w0.get._3),
        s"no later week may exceed the cohort's size: $week ${cells.toSeq}")
    }
    // every user belongs to exactly one cohort: week-0 cells sum to the user count
    val users = events.select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users,
      "cohort week-0 sizes must partition the user base")
  }
}

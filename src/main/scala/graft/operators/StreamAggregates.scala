package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference consumer's four analytical queries, as pure
  * `DataFrame => DataFrame` operators (batch form; streaming forms in
  * [[graft.streaming.Pipeline]] reuse these same plan fragments).
  *
  * Reference: consumer/src/main/java/com/citystream/consumer/SparkDynamoDBConsumer.java
  *   - raw-event passthrough            :100-108  → [[rawEvents]]
  *   - 5-min tumbling windowed agg      :119-154  → [[windowedAggregate]]  (A1)
  *   - high-severity alert filter       :160-170  → [[alerts]]             (F1)
  *   - console monitoring agg           :182-190  → [[globalCounts]]       (A2)
  *
  * Scale notes: A1/A2 are single-shuffle hash aggregations with map-side
  * partial aggregation (count/max combine; collect_list partials append) —
  * the canonical Spark shape that scales linearly with executors. The alert
  * filter is shuffle-free and pushes `severity IN (...)`'s inputs down to the
  * parquet scan.
  */
object StreamAggregates {

  /** Raw-event projection with the derived record key (P5/P6).
    * Sink semantics in the reference are putItem-upsert by (event_id, timestamp)
    * — last-writer-wins dedup; batch analog keeps one row per key.
    */
  def rawEvents(normalized: DataFrame): DataFrame =
    normalized.select("rec_id", "ts_str", "city", "event_type", "severity", "description")

  /** Batch analog of the in-stream id-collision dedup: one row per `rec_id`,
    * the highest `event_id` winning. The reference's `rec_id` collides
    * whenever two events of the same type hit the same city in the same
    * second (SURVEY.md §1.2; consumer/.../SparkDynamoDBConsumer.java:90-96
    * builds the key), and DynamoDB putItem makes the effective semantics
    * last-writer-wins — event_id order is the batch stand-in for arrival
    * order. The streaming half is `dropDuplicatesWithinWatermark` in
    * [[graft.streaming.Pipeline.startRawEventsDeduped]]: it stops colliding
    * ids from ever REACHING a non-idempotent sink, where this operator (and
    * the keyed store) resolve them at rest.
    *
    * Scale: one shuffle on rec_id — as a MAX aggregate, not a window
    * (r17 optimization, guide §2.3 "aggregate before you shuffle"): the
    * winning row is max(struct(event_id, payload)) per rec_id, which
    * partial-aggregates map-side (partial_max), so each map task ships
    * ONE candidate row per rec_id it saw instead of every duplicate —
    * under real collision rates the exchange carries |keys|, not |rows|.
    * The struct-typed buffer keeps this a SortAggregate (struct is not a
    * mutable UnsafeRow field type), so per-partition sorts remain — the
    * win over the window form is the collapsed shuffle plus the dropped
    * rn filter pass, not the sort. Equivalent to the former rn=1 window
    * by construction — event_id is the high-order struct field, so max
    * picks the highest event_id exactly as ORDER BY event_id DESC did
    * (and on a hypothetical event_id tie the struct comparison stays
    * deterministic where row_number was arbitrary). Parity with the
    * window form (incl. forced collisions) is pinned in CityStreamSpec.
    */
  def rawEventsDeduped(normalized: DataFrame): DataFrame =
    normalized
      .groupBy("rec_id")
      .agg(max(struct(col("event_id"), col("ts_str"), col("city"),
        col("event_type"), col("severity"), col("description"))).as("__w"))
      .select(col("rec_id"), col("__w.ts_str").as("ts_str"),
        col("__w.city").as("city"), col("__w.event_type").as("event_type"),
        col("__w.severity").as("severity"),
        col("__w.description").as("description"))

  /** A1 — the centerpiece: 5-minute tumbling window × city × event_type with
    * count / collect_list(severity) / max(ts), plus the composite
    * `partition_key` (consumer/...:123-147). `collect_list` output is sorted
    * for determinism (DynamoDB list order was arrival-order-undefined anyway).
    *
    * At scale: one shuffle on (window, city, event_type); the window
    * assignment is a codegen'd projection, not a blowup. collect_list state
    * is bounded by events-per-group-per-window and is kept for reference
    * fidelity only — [[windowedAggregateCounts]] is the 100 TB shape (per-
    * severity counts: O(|severity domain|) state per group, fully map-side
    * combinable).
    */
  def windowedAggregate(normalized: DataFrame): DataFrame = {
    val w = window(col("ts"), "5 minutes")
    normalized
      .groupBy(w.as("win"), col("city"), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        sort_array(collect_list(col("severity"))).as("severities"),
        max(col("ts")).as("last_updated")
      )
      .select(
        concat_ws("#", col("city"), col("event_type"),
          date_format(col("win.start"), "yyyy-MM-dd'T'HH:mm:ss")).as("partition_key"),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("win.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("city"), col("event_type"), col("event_count"), col("severities"),
        date_format(col("last_updated"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_updated")
      )
  }

  /** A1 at scale — the windowed aggregation with the severity list replaced
    * by a per-severity COUNT MAP (one column per severity; the domain is
    * the fixed 4-value quartile code, [[CityEvents.Severities]]). Same
    * grouping, same shuffle — but aggregation state per group is 4 longs
    * instead of one array element per event, every counter partial-
    * aggregates map-side, and the output row width is constant. This is
    * the variant a 100 TB deployment runs; [[windowedAggregate]] keeps the
    * reference's collect_list shape for fidelity.
    */
  def windowedAggregateCounts(normalized: DataFrame): DataFrame = {
    val w = window(col("ts"), "5 minutes")
    val sevCounts = CityEvents.Severities.map(s =>
      count(when(col("severity") === s, 1)).as(s"n_$s"))
    normalized
      .groupBy(w.as("win"), col("city"), col("event_type"))
      .agg(count(lit(1)).as("event_count"), sevCounts :+
        max(col("ts")).as("last_updated"): _*)
      .select(Seq(
        concat_ws("#", col("city"), col("event_type"),
          date_format(col("win.start"), "yyyy-MM-dd'T'HH:mm:ss")).as("partition_key"),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("win.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("city"), col("event_type"), col("event_count")) ++
        CityEvents.Severities.map(s => col(s"n_$s")) :+
        date_format(col("last_updated"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_updated"): _*)
  }

  /** F1 — alert stream: severity ∈ {high, critical} (consumer/...:161-170).
    *
    * The severity predicate alone cannot reach the parquet scan — severity
    * is DERIVED (the CASE over `value` in [[CityEvents.severityOf]]), and
    * filters on computed columns don't push down (r17 scan audit: the
    * q_alerts scan carried PushedFilters: []). So the filter also states
    * its raw-column equivalent: severity ∈ {high, critical} ⟺
    * `value >= 250 OR value IS NULL` by the quartile mapping (a NULL value
    * falls through every WHEN to the ELSE 'critical' branch), and THAT
    * conjunct pushes into the scan as row-group min/max pruning. The
    * original predicate stays for exactness; the added one is implied, so
    * the row set is unchanged (oracle-identical at every SF).
    */
  def alerts(normalized: DataFrame): DataFrame =
    normalized
      .filter(col("value") >= CityEvents.HighSeverityMinValue ||
        col("value").isNull)
      .filter(col("severity").isin("high", "critical"))
      .select("event_id", "city", "ts", "ts_str", "event_type", "severity", "description", "rec_id")

  /** A2 — global monitoring counts by city × event_type × severity
    * (consumer/...:182-190; complete-mode console sink in streaming form).
    */
  def globalCounts(normalized: DataFrame): DataFrame =
    normalized
      .groupBy("city", "event_type", "severity")
      .agg(count(lit(1)).as("event_count"))

  /** Sliding-window counts (10-minute window, 5-minute slide) per event
    * type — the README-adjacent window variant (SURVEY.md T2). Each event
    * lands in exactly two overlapping windows; the window assignment is a
    * projection (2-row explode), then one shuffle on (window, event_type).
    */
  def slidingCounts(normalized: DataFrame): DataFrame = {
    val w = window(col("ts"), "10 minutes", "5 minutes")
    normalized
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("event_count"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("win.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"), col("event_count"))
  }

  /** Session windows (30-minute inactivity gap) per user — gaps-and-islands
    * semantics via Spark's native session_window (SURVEY.md T2). In streaming
    * form this is watermark-backed session state; in batch it is one shuffle
    * on user_id.
    */
  def userSessions(normalized: DataFrame): DataFrame =
    normalized
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("event_count"))
      .select(
        col("user_id"),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("win.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("event_count"))
}

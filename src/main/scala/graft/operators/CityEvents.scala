package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest normalization: raw `events` rows → CityStream-shaped event records.
  *
  * Mirrors the reference consumer's parse/enrich stage
  * (consumer/src/main/java/com/citystream/consumer/SparkDynamoDBConsumer.java:86-96):
  * CAST-to-string (P1), from_json (P2), `data.*` expansion (P3), computed
  * columns (P4), and the derived `event_id` key (P5). The driver testdata's
  * `events` table (TESTDATA.md) carries `event_id:long, ts:timestamp,
  * user_id:long, event_type:string, value:double, props:string(JSON)`, so the
  * reference's categorical attributes are derived deterministically:
  *
  *   - `city`      — user_id → one of the reference's 6 cities
  *                   (producer/.../EventGeneratorService.java:24)
  *   - `severity`  — value quartile → one of the 4 severities
  *                   (producer/.../EventGeneratorService.java:25)
  *   - `description` — templated from (severity, event_type)
  *                   (producer/.../EventGeneratorService.java:45-53)
  *   - `prop_k`    — `props` JSON attribute, parsed with get_json_object (P2)
  *   - `ts_str`    — the reference's pseudo-UTC wire format
  *                   `yyyy-MM-dd'T'HH:mm:ss'Z'` (producer/.../model/CityEvent.java:15)
  *   - `rec_id`    — concat(city,'-',event_type,'-',ts_str)
  *                   (consumer/.../SparkDynamoDBConsumer.java:90-96)
  *
  * Everything here is a narrow (no-shuffle) projection of codegen'd built-in
  * expressions — it fuses into the parquet scan's WholeStageCodegen span and
  * costs nothing extra at 100 TB. Unlike the reference, `ts` stays a true
  * TimestampType (the reference kept timestamps as strings and relied on
  * ISO-8601 lexicographic ordering — SURVEY.md §1.2).
  */
object CityEvents {

  val Cities: Seq[String]     = Seq("SF", "NYC", "LA", "Chicago", "Seattle", "Boston")
  val Severities: Seq[String] = Seq("low", "medium", "high", "critical")

  /** Deterministic city assignment: user_id mod 6 over the reference's city list. */
  def cityOf(userId: Column): Column =
    element_at(array(Cities.map(lit): _*), (pmod(userId, lit(6)) + 1).cast("int"))

  /** Deterministic severity from the event's value quartile (value ∈ [0, ~500)). */
  def severityOf(value: Column): Column =
    when(value < 100, "low")
      .when(value < 250, "medium")
      .when(value < 400, "high")
      .otherwise("critical")

  /** The raw-column boundary of the {high, critical} severity band —
    * severityOf(value) ∈ {high, critical} ⟺ value >= this (or value IS
    * NULL, which the CASE's ELSE maps to 'critical'). Kept next to
    * [[severityOf]] so the thresholds can never drift apart; consumers
    * use it to push an EQUIVALENT predicate into the parquet scan where
    * the derived-column filter itself cannot go ([[StreamAggregates
    * .alerts]]).
    */
  val HighSeverityMinValue: Double = 250.0

  /** Reference wire timestamp format (local time + literal 'Z', CityEvent.java:15). */
  def tsStrOf(ts: Column): Column = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Full normalized event frame; single narrow projection over the scan. */
  def normalize(events: DataFrame): DataFrame = {
    val city     = cityOf(col("user_id"))
    val severity = severityOf(col("value"))
    val tsStr    = tsStrOf(col("ts"))
    events.select(
      col("event_id"),
      col("ts"),
      tsStr.as("ts_str"),
      col("user_id"),
      col("event_type"),
      col("value"),
      city.as("city"),
      severity.as("severity"),
      concat(severity, lit(" "), col("event_type"), lit(" detected")).as("description"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
      concat_ws("-", city, col("event_type"), tsStr).as("rec_id")
    )
  }

  /** DuckDB SQL fragments equivalent to the Scala derivations above, for
    * oracle queries (SparkEntry.oracleSql). Kept adjacent to the Spark
    * definitions so the two stay in lockstep.
    */
  object Sql {
    val city: String =
      "['SF','NYC','LA','Chicago','Seattle','Boston'][CAST(user_id % 6 AS INT) + 1]"
    val severity: String =
      "CASE WHEN value < 100 THEN 'low' WHEN value < 250 THEN 'medium' " +
        "WHEN value < 400 THEN 'high' ELSE 'critical' END"
    val tsStr: String = "strftime(ts, '%Y-%m-%dT%H:%M:%SZ')"
    /** Shared normalized-events CTE body. */
    val normalized: String =
      s"""SELECT event_id, ts, $tsStr AS ts_str, user_id, event_type, value,
         |  $city AS city, $severity AS severity,
         |  $severity || ' ' || event_type || ' detected' AS description,
         |  CAST(json_extract_string(props, '$$.k') AS INT) AS prop_k,
         |  concat_ws('-', $city, event_type, $tsStr) AS rec_id
         |FROM events""".stripMargin
  }
}

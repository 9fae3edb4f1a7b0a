package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here: a named
  * `(SparkSession, sfDir) => DataFrame` in [[queries]], and (when
  * SQL-expressible) an equivalent DuckDB SQL string in [[oracleSql]] that the
  * driver runs over the same parquet tables for a hash compare.
  *
  * Determinism rules (FIXTURES.md §5): no wall-clock; `sort_array` /
  * `list_sort` on collected lists; output timestamps formatted as strings
  * (identical patterns both engines); double aggregates summed as
  * DECIMAL(18,2) then cast back to double (order-independent and
  * engine-identical); every oracle-compared result carries a deterministic
  * total ORDER BY mirrored on both sides.
  */
object SparkEntry {

  private def norm(spark: SparkSession, dir: String): DataFrame =
    CityEvents.normalize(Tables.events(spark, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's centerpiece A1 windowed aggregation (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    StreamAggregates.windowedAggregate(norm(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_windowed_agg" -> ((s, dir) =>
      StreamAggregates.windowedAggregate(norm(s, dir)).orderBy("partition_key"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_windowed_agg" ->
      s"""WITH norm AS (${CityEvents.Sql.normalized}),
         |b AS (SELECT *, time_bucket(INTERVAL '5 minutes', ts) AS ws FROM norm)
         |SELECT city || '#' || event_type || '#' || strftime(ws, '%Y-%m-%dT%H:%M:%S') AS partition_key,
         |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
         |  strftime(ws + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
         |  city, event_type,
         |  count(*) AS event_count,
         |  list_sort(list(severity)) AS severities,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_updated
         |FROM b
         |GROUP BY ws, city, event_type
         |ORDER BY partition_key""".stripMargin
  )
}

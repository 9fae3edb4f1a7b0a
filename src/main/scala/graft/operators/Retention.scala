package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TTL/retention semantics for the raw-events store (S4).
  *
  * The reference injects an expiry epoch into every raw-event item and lets
  * the store expire them (`setup-dynamodb.sh:15-32` enables TTL on the
  * `city-events-raw` table; consumer `SparkDynamoDBConsumer.java:258-262`
  * writes `ttl = now + 30 days` with each putItem). SURVEY.md §1.4 maps this
  * to a `ttl` column plus a read-time retention filter: expiry in a lake
  * store is a predicate, not a daemon — the filter pushes down to the scan,
  * and a periodic compaction job (not modeled here) physically drops
  * expired files.
  *
  * Determinism: the reference stamps ingest-time `Instant.now()`; the batch
  * analog derives ttl from the event time (`ts + retention`), and "now" is
  * pinned to a scalar the caller supplies — [[retainedAtMaxTs]] pins it to
  * the frame's own max(ts), the same convention [[Serving.alertsRecent]]
  * uses (FIXTURES.md §5: no wall clock in oracle-compared outputs).
  */
object Retention {

  /** Write-side ttl injection: `ttl = ts + retention` (the reference's
    * putItem-time `now + 30 days`, consumer :258-262, with event time as
    * the deterministic epoch).
    */
  def withTtl(df: DataFrame, retention: String = "30 days"): DataFrame =
    df.withColumn("ttl", col("ts") + expr(s"INTERVAL $retention"))

  /** Read-side retention: only rows whose ttl is strictly in the future of
    * `now` survive — DynamoDB TTL expiry re-expressed as a scan predicate.
    */
  def retained(df: DataFrame, now: Column): DataFrame =
    df.filter(col("ttl") > now)

  /** [[retained]] with `now` pinned to the frame's max(ts): a 1-row
    * broadcast scalar pre-pass, cheap at any scale, keeps the query
    * deterministic over a fixed dataset.
    */
  def retainedAtMaxTs(df: DataFrame): DataFrame = {
    val cutoff = df.agg(max(col("ts")).as("now_ts"))
    df.crossJoin(broadcast(cutoff))
      .filter(col("ttl") > col("now_ts"))
      .drop("now_ts")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (build-brief scale bullet: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's runtime skew handling covers joins; pre-aggregation salting covers
  * the hot-key AGGREGATION case AQE does not split: a two-phase
  * groupBy(key, salt) → groupBy(key) that spreads one hot key over
  * `saltBuckets` reducers. Results are exactly those of the direct groupBy
  * (counts/sums re-aggregate losslessly), so the salted form is
  * oracle-checked against the plain SQL.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of a spread column. */
  def salt(spread: Column, buckets: Int): Column =
    pmod(xxhash64(spread), lit(buckets))

  /** Two-phase salted count: groupBy(keys :+ salt) partial, then final
    * groupBy(keys) summing partial counts. Identical results to
    * `df.groupBy(keys).count()`; the first shuffle spreads each hot key over
    * `saltBuckets` partitions.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], spread: Column,
                  saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ salt(spread, saltBuckets).as("_salt"): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum("_partial").as("event_count"))
  }
}

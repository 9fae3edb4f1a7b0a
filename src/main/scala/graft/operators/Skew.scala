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
  *
  * WHEN EACH APPLIES (round-13 verdict 6; ScaleOpsSpec proves both on the
  * same hot-key fixture): AQE's skew split needs a live exchange's runtime
  * sizes and only covers joins — it re-plans the skewed reduce partition
  * into task-sized chunks with zero query changes
  * (`SortMergeJoin(skew=true)`, spec'd). Reach for [[saltedJoin]] when the
  * plan must be deterministic up front (streaming micro-batches re-planned
  * per batch, bucketed layouts AQE won't touch, or a build side cheap to
  * replicate), and for [[saltedCount]] on hot-key aggregation.
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

  /** Salted equi-join for a skewed FACT side: the fact rows get a
    * deterministic salt in [0, saltBuckets); the (smaller, but too big to
    * broadcast) build side is replicated once per salt value; the join key
    * becomes (key, salt) — a hot fact key spreads over `saltBuckets`
    * reducers instead of landing on one. Join results are EXACTLY those of
    * the plain equi-join (each fact row still meets each matching build
    * row exactly once, at its own salt), so the salted form is
    * oracle-checkable against plain SQL. When the build side fits in
    * memory, `broadcast()` beats this; when AQE's runtime skew split
    * applies, prefer that — this is the explicit fallback for the
    * deterministic-plan case.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 spread: Column, saltBuckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", salt(spread, saltBuckets))
    val replicated = build
      .withColumn("_salt", explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

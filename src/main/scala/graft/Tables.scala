package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata star schema (TESTDATA.md).
  *
  * All serving/analytical queries read through here so that scan-level
  * optimizations (predicate pushdown, column pruning, partition coalescing)
  * apply uniformly. At cluster scale these would be catalog tables backed by
  * partitioned/bucketed storage; `local[*]` reads single parquet files.
  */
object Tables {
  /** Sessions already switched to nanos-as-long reads — the conf is a
    * one-time session concern, so it is set exactly once per session (weak
    * keys: dropped with the session) instead of on every query build.
    */
  private val nanosReady =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as raw nanos (legacy conf, applied once per
    * session) and floor-convert to microsecond TimestampType — the same
    * truncation DuckDB applies, so oracle comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (nanosReady.add(spark))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame       = spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(s"$dir/region.parquet")
}

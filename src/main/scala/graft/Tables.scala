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

  /** `events.ts` has shipped under two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects outright, so it is read as raw nanos (legacy conf, applied once
    * per session) and floor-converted to microsecond TimestampType, the same
    * truncation DuckDB applies — and plain TIMESTAMP(MICROS) (NTZ), which
    * needs only a cast to session-time TimestampType. Dispatch on the
    * schema actually read so either generation loads identically; every
    * downstream operator sees microsecond TimestampType either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (nanosReady.add(spark))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
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

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned serving store — the batch analog of the
  * reference's DynamoDB key schema (SURVEY.md §1.4: composite partition+sort
  * key → `partitionBy(...)` on write + sorted read).
  *
  * Writing the alerts/raw-event tables `partitionBy("city")` turns the
  * serving layer's per-city point lookups (api/.../CityStreamApiApplication
  * .java:156-164) into partition-pruned scans: a `city = ?` predicate prunes
  * to one directory — the storage-side analog of the DynamoDB hash-key
  * query, and the access-path shape that survives 100 TB (each city
  * partition reads independently of corpus size).
  */
object ServingStore {

  /** Rows are repartitioned BY the partition columns first so each
    * directory lands as one well-sized file instead of
    * shufflePartitions-many shards (at real scale the repartition key
    * would gain a file-sizing second column; at the gate SFs one file
    * per partition value is the right layout).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed + sorted table write: rows are pre-shuffled into a fixed
    * number of hash buckets on the join key and sorted within each bucket.
    * Two tables bucketed identically on their join key then join with
    * ZERO runtime exchange (and zero sort) — the shuffle is paid once at
    * write time and amortized over every subsequent join, the bucketing
    * pattern the 100 TB fact-fact join depends on. Catalog tables are
    * required (bucket metadata lives in the metastore), hence
    * `saveAsTable` rather than a path write.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

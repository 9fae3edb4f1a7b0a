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

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

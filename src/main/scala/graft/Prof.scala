package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, Similarity}

/** Dev-only stage profiler (not part of the library API). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("minhashPairs")(Dedup.minhashPairs(Tables.documents(spark, d), 0.8).count())
    time("jaccardPairs")(Dedup.jaccardPairs(Tables.documents(spark, d), 0.5).count())
    time("simhashPairs")(Dedup.simhashPairs(Tables.documents(spark, d), 2).count())
    time("cosinePairs")(Similarity.cosineNearDupPairs(Tables.embeddings(spark, d), 0.4).count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dump: prints formatted physical plans for key queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}

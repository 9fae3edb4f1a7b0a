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
    def timeOnce[T](f: => T): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    // warmup
    Tables.documents(spark, d).count(); Tables.embeddings(spark, d).count()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_minhash_pairs", "q_jaccard_pairs", "q_simhash_pairs",
      "q_cosine_pairs", "q_ann_ivf_topk", "q_aggregations_recent")
    names.foreach { n =>
      val ts = (1 to 4).map(_ => timeOnce(SparkEntry.queries(n)(spark, d).count()))
      println(f"$n: first ${ts.head}%.2f s, min ${ts.min}%.2f s " +
        f"(all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}

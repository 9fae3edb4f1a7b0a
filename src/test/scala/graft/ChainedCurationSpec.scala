package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.{IndexStream, Pipeline}

/** The CHAINED curation topology: raw crawl → scrub → dedup → index,
  * each stage consuming its predecessor's store through a file-source
  * stream — the end-to-end composition a deployment runs. Proves the
  * property the chain exists for: raw identifiers never reach the
  * dedup index or the search postings, duplicates never reach the
  * index, and the survivors are searchable.
  */
class ChainedCurationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def drain(qs: Seq[StreamingQuery], rounds: Int = 3): Unit =
    // file-source hand-offs: each stage's output only becomes the next
    // stage's input after the next listing, so drive the chain in order,
    // repeatedly, until a full pass moves nothing
    (1 to rounds).foreach(_ => qs.foreach(_.processAllAvailable()))

  test("raw crawl with PII and duplicates ends as a clean searchable index") {
    implicit val sqlCtx = spark.sqlContext
    def text(tag: String): String = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val base = tmp("chainbase")
    // the corpus the dedup gate protects
    val corpus = Seq((1L, text("alpha"))).toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus).write.parquet(s"$base/dedupindex")
    val p = new Pipeline(spark, tmp("chainstore"), tmp("chainckpt"))
    val input = MemoryStream[(Long, String)]
    val qs = p.startChainedCuration(
      input.toDF().toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("crawl")),
      s"$base/dedupindex")
    try {
      input.addData(
        (10L, text("alpha")),                                // corpus dup → dropped
        (11L, "unique words with contact a@b.org inside"),   // pii → masked, kept
        (12L, text("novel")))                                // clean novel → kept
      drain(qs)
      // a second wave: a dup of the first wave's novel doc must be
      // caught by the GROWN dedup index
      input.addData((20L, text("novel")), (21L, "another fresh document"))
      drain(qs)
      // 1. the dup never got indexed; the pii doc is indexed MASKED
      val grown = IndexStream.servingIndex(spark,
        indexedBaseFor(p), p.indexStorePath)
      val postings = grown.postings.select("tok", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val indexedDocs = postings.map(_._2)
      assert(indexedDocs == Set(11L, 12L, 21L),
        s"only the three clean/masked survivors reach the index: $indexedDocs")
      // 2. the raw identifier token exists NOWHERE downstream
      val allToks = postings.map(_._1)
      assert(!allToks.exists(_.contains("@")),
        s"no raw email token may reach the postings: ${allToks.filter(_.contains("@"))}")
      assert(allToks.contains("<EMAIL>"),
        "the masked placeholder is what got indexed")
      // ...including the dedup signature side (it only ever saw masked text)
      val dedupCleanTexts = spark.read.parquet(s"${p.crawlStorePath}/clean")
        .select("text").collect().map(_.getString(0))
      assert(!dedupCleanTexts.exists(_.contains("@")),
        "no raw email may reach the dedup store")
      // 3. the survivors are searchable through the grown view
      val hits = TextAnalysis.keywordSearchFrom(grown, Seq("unique", "fresh"), k = 5)
        .collect().map(_.getLong(0)).toSet
      assert(hits == Set(11L, 21L), s"the streamed survivors must be searchable: $hits")
      // 4. the cross-wave dup was recorded as a pair, not silently lost
      val pairs = spark.read.parquet(s"${p.crawlStorePath}/pairs")
        .select("corpus_id", "delta_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((12L, 20L)),
        s"the second-wave dup must pair against the first wave's survivor: $pairs")
    } finally qs.foreach(_.stop())
  }

  /** An empty base search index (the chain starts indexing from zero). */
  private def indexedBaseFor(p: Pipeline): String = {
    val dir = tmp("chainemptyix")
    TextAnalysis.persistSearchIndex(
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"), dir, stamp = "spec")
    dir
  }
}

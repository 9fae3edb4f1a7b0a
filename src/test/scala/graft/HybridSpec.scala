package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hybrid, TextAnalysis}

/** Specs for RRF-fused hybrid retrieval: exact fusion arithmetic on a
  * hand-computed fixture, sentinel/exclusion contracts on the composed
  * endpoint, and the lexical ranker's parity with the spec'd
  * keywordSearchForQueries scoring.
  */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val emb = Tables.embeddings(spark, sf).cache()

  private def freshIndex(): TextAnalysis.SearchIndex = {
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid-ix").toString
    TextAnalysis.persistSearchIndex(docs, dir, stamp = "spec")
    TextAnalysis.loadSearchIndex(spark, dir)
  }

  test("rrfFuse: hand-computed fusion on a fixed pair of rank lists") {
    // query 1: doc 10 ranks 1 lexically and 3 by vector; doc 20 only
    // lexical rank 2; doc 30 only vector rank 1.
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 3L), (1L, 30L, 1L)).toDF("query_id", "doc_id", "rank")
    val r = Hybrid.rrfFuse(a, b).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getLong(5)))
      .toList
    val s10 = 1.0 / 61.0 + 1.0 / 63.0
    val s30 = 1.0 / 61.0
    val s20 = 1.0 / 62.0
    // doc 10 (both lists) must outrank doc 30 (vector rank 1 alone)
    assert(r == List((10L, 1L, 3L, s10, 1L), (30L, 0L, 1L, s30, 2L),
      (20L, 2L, 0L, s20, 3L)))
  }

  test("mltHybridRrf contracts on the corpus fixture") {
    val ix = freshIndex()
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid-ann").toString
    graft.operators.Similarity.persistAnnServe(emb, dir, stamp = "spec")
    val snap = graft.operators.Similarity.loadAnnServe(spark, dir)
    val r = Hybrid.mltHybridRrf(docs, ix, emb, snap.bands).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (q, d, lr, vr, s, rk) = (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getLong(5))
      assert(d != q, "self row served")
      assert(lr >= 0 && vr >= 0 && (lr > 0 || vr > 0), "sentinel contract")
      val expect = (if (lr > 0) 1.0 / (60.0 + lr) else 0.0) +
        (if (vr > 0) 1.0 / (60.0 + vr) else 0.0)
      assert(s == expect, s"rrf_score mismatch for ($q,$d)")
      assert(rk >= 1 && rk <= 10)
    }
    // per query: contiguous ranks, scores non-increasing
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getLong(5)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
      val ss = rows.sortBy(_.getLong(5)).map(_.getDouble(4))
      assert(ss.zip(ss.tail).forall { case (p, n) => p >= n })
    }
  }

  test("persisted RRF family serves the live composition bit-for-bit") {
    val ix = freshIndex()
    val annDir = java.nio.file.Files.createTempDirectory("graft-rrf-ann").toString
    graft.operators.Similarity.persistAnnServe(emb, annDir, stamp = "spec")
    val snap = graft.operators.Similarity.loadAnnServe(spark, annDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-rrf").toString
    Hybrid.persistRrf(docs, ix, emb, snap.bands, dir, stamp = "spec")
    assert(graft.sources.SnapshotStore.ready(spark, dir, "spec"))
    val served = spark.read.parquet(s"$dir/topk")
    val live = Hybrid.mltHybridRrf(docs, ix, emb, snap.bands)
    assert(served.exceptAll(live).isEmpty && live.exceptAll(served).isEmpty)
  }

  test("salient terms: at most nTerms per query, all drawn from the query doc") {
    val ix = freshIndex()
    val terms = Hybrid.salientTerms(docs, ix.lexicon, ix.nTotal).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val perQ = terms.groupBy(_._1)
    assert(perQ.nonEmpty)
    perQ.foreach { case (_, ts) => assert(ts.length <= 8) }
    val qTexts = docs.filter(col("doc_id") < 5)
      .select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1).split(" ").toSet).toMap
    terms.foreach { case (q, t) => assert(qTexts(q).contains(t)) }
  }

  test("lexical ranker scores exactly as keywordSearchForQueries (no self-collision)") {
    val ix = freshIndex()
    // request ids far outside the doc-id space: the self-exclusion filter
    // can never fire, so the MLT ranker must reproduce the spec'd
    // endpoint's scoring bit-for-bit
    val reqTerms = Seq((9000001L, "hash"), (9000001L, "join"),
      (9000002L, "vector")).toDF("query_id", "tok")
    val mlt = Hybrid.mltLexicalTopK(ix, reqTerms, k = 5)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
    val ref = TextAnalysis.keywordSearchForQueries(ix,
        Seq((9000001L, Seq("hash", "join")), (9000002L, Seq("vector")))
          .toDF("query_id", "terms"), k = 5)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").cast("long").as("rank"))
    assert(mlt.exceptAll(ref).isEmpty && ref.exceptAll(mlt).isEmpty)
  }
}

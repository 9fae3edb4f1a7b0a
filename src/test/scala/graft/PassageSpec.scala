package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Passage}

/** Specs for chunk-level passage retrieval (the RAG composition):
  * tower parity with the document-level text encoder, ranking contracts
  * (diversity cap, own-doc exclusion, rank contiguity), the persisted
  * family's serve ≡ construct identity, and the overflow guard.
  */
class PassageSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val vecs = Passage.chunkVectors(docs).cache()
  private lazy val bands = Passage.chunkBands(vecs).cache()

  test("chunk tower ≡ document text tower on one-chunk documents") {
    // a document whose text fits in a single chunk has chunk_text == text,
    // so its chunk-0 embedding must equal textEmbedStub's document
    // embedding bit-for-bit (same formula, same constants)
    val oneChunk = docs
      .filter(size(split(col("text"), " ")) <= 32)
      .limit(20)
    assert(oneChunk.count() > 0, "fixture needs at least one short document")
    val docEmb = Multimodal.textEmbedStub(oneChunk)
      .select(col("media_id").as("doc_id"), col("embedding").as("de"))
    val mismatch = Passage.chunkVectors(oneChunk)
      .join(docEmb, "doc_id")
      .filter(col("embedding") =!= col("de"))
    assert(mismatch.count() == 0)
  }

  test("pid packs (doc_id, chunk_id) bijectively; chunk rows match chunkDocuments") {
    val n = vecs.count()
    assert(n == graft.operators.Corpus.chunkDocuments(docs).count())
    assert(vecs.select("pid").distinct().count() == n)
    val bad = vecs.filter(
      shiftrightunsigned(col("pid"), Passage.ChunkIdBits) =!= col("doc_id") ||
      col("pid").bitwiseAND(lit((1L << Passage.ChunkIdBits) - 1)) =!= col("chunk_id"))
    assert(bad.count() == 0)
  }

  test("chunk_id overflow raises instead of aliasing pids") {
    import spark.implicits._
    // a document long enough to exceed 2^20 chunks at stride 1: the guard
    // must fail the job loudly, not let chunk 2^20 alias doc_id+1's chunk 0
    val nTokens = (1 << Passage.ChunkIdBits) + 2
    val long = Seq((1L, ("a " * nTokens).trim)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Passage.chunkVectors(long, maxTokens = 2, overlap = 1)
        .select("pid").orderBy(col("pid").desc).limit(1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overflows")), s"got: ${msgs(e)}")
  }

  test("passage top-k: diversity cap, own-doc exclusion, contiguous ranks") {
    val r = Passage.passageTopKServeFrom(vecs, bands).collect()
    assert(r.nonEmpty)
    val byQ = r.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      // own-document passages never serve
      assert(!rows.exists(_.getLong(1) == q))
      // at most maxPerDoc (2) passages from any single document
      rows.groupBy(_.getLong(1)).foreach { case (_, perDoc) =>
        assert(perDoc.length <= 2)
      }
      // ranks are 1..n contiguous, cosines non-increasing in rank order
      val ranks = rows.map(_.getLong(4)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
      assert(ranks.length <= 10)
      val cs = rows.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("diversity cap binds: a repetitive document is held to maxPerDoc passages") {
    import spark.implicits._
    // doc 0 (the query) is exactly one 32-token chunk of "w"; doc 1 is a
    // 104-token "w" run whose FOUR chunks are all byte-identical to the
    // query chunk (stride 24 over a constant token stream) — cosine 1.0,
    // colliding in every band. Without the cap all four monopolize the
    // top of the list; the cap must keep exactly two.
    val w32 = Array.fill(32)("w").mkString(" ")
    val w104 = Array.fill(104)("w").mkString(" ")
    val fixture = Seq((0L, w32), (1L, w104), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val v = Passage.chunkVectors(fixture)
    val b = Passage.chunkBands(v)
    val capped = Passage.passageTopKServeFrom(v, b)
      .filter(col("query_id") === 0 && col("doc_id") === 1)
    assert(capped.count() == 2)
    val uncapped = Passage.passageTopKServeFrom(v, b, maxPerDoc = Int.MaxValue)
      .filter(col("query_id") === 0 && col("doc_id") === 1)
    assert(uncapped.count() == 4)
    // the two survivors are the per-doc rank-1/2 (lowest pids among ties)
    assert(capped.select("chunk_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L))
  }

  test("query endpoint: an in-corpus chunk text retrieves itself at rank 1, cosine 1") {
    import spark.implicits._
    val someChunk = graft.operators.Corpus.chunkDocuments(docs)
      .orderBy("doc_id", "chunk_id").limit(1).collect()(0)
    val reqs = Seq((42L, someChunk.getString(2))).toDF("query_id", "query_text")
    val top = Passage.passageTopKForQueries(vecs, bands, reqs)
      .filter(col("rank") === 1).collect()(0)
    assert(top.getLong(1) == someChunk.getLong(0) &&
      top.getLong(2) == someChunk.getLong(1))
    // dot(v,v)/(sqrt·sqrt) is 1 ± a couple ulp, not literal 1.0
    assert(math.abs(top.getDouble(3) - 1.0) < 1e-12)
  }

  test("query endpoint: in-corpus request reproduces the registry path modulo own-doc rows") {
    import spark.implicits._
    // query doc 0's chunk-0 text under an external id: candidates,
    // cosines and both windows are the registry path's — the ONLY
    // difference is the missing own-document exclusion. Over-fetch by
    // maxPerDoc, drop doc 0's rows, re-rank by the same total order, and
    // the top-10 must equal the registry answer for query 0 exactly.
    val q0text = graft.operators.Corpus.chunkDocuments(docs.filter(col("doc_id") === 0))
      .filter(col("chunk_id") === 0).collect()(0).getString(2)
    val reqs = Seq((0L, q0text)).toDF("query_id", "query_text")
    val endpoint = Passage.passageTopKForQueries(vecs, bands, reqs, k = 12)
      .filter(col("doc_id") =!= 0L)
      .collect()
      .sortBy(r => (-r.getDouble(3), r.getLong(1), r.getLong(2)))
      .take(10)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toList
    val registry = Passage.passageTopKServeFrom(vecs, bands)
      .filter(col("query_id") === 0L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(endpoint == registry)
  }

  test("recall witness: intact banding stays within bound and TRIPS when a passage drops") {
    val served = Passage.passageTopKServeFrom(vecs, bands)
    val exact = Passage.passageBruteTopK(vecs)
    val intact = Passage.recallBound(served, exact).collect()(0)
    assert(intact.getInt(4) == 1, s"intact family must meet the bound: $intact")
    assert(intact.getDouble(2) ==
      intact.getLong(1).toDouble / intact.getLong(0), "recall is the one-divide double")
    // drop ALL served rows: recall collapses to 0 and the flag flips —
    // the witness is falsifiable, not decorative
    val tripped = Passage.recallBound(served.limit(0), exact).collect()(0)
    assert(tripped.getInt(4) == 0 && tripped.getDouble(2) == 0.0)
    // empty exact side: vacuously met (the oracle's CASE arm)
    val vac = Passage.recallBound(served, exact.limit(0)).collect()(0)
    assert(vac.getInt(4) == 1 && vac.getDouble(2) == 1.0)
  }

  test("context packing: greedy rank prefix, budget respected, first overflow cuts the tail") {
    val topk = Passage.passageTopKServeFrom(vecs, bands)
    val packed = Passage.contextPack(topk, vecs, budgetTokens = 128).collect()
    assert(packed.nonEmpty)
    val topkByQ = topk.collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(4))).toMap
    packed.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      // a strict PREFIX of the rank order, not a subset
      assert(ranks.toSeq == (1L to ranks.length).toSeq, s"query $q prefix: $ranks")
      // running totals correct and within budget
      val sorted = rows.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) == cum && cum <= 128)
      }
      // maximality: the next-ranked passage (if any) would overflow
      topkByQ(q).lift(ranks.length.toInt).foreach { next =>
        val nextTokens = vecs.filter(col("doc_id") === next.getLong(1) &&
          col("chunk_id") === next.getLong(2)).head().getAs[Long]("n_tokens")
        assert(cum + nextTokens > 128,
          s"query $q stopped early: $cum + $nextTokens <= 128")
      }
    }
  }

  test("late interaction: a full near-twin document dominates, contracts hold") {
    import spark.implicits._
    // doc 0 queries; doc 1 is its byte-identical twin (every chunk pair
    // cosine 1), doc 2 shares nothing structurally
    val w104 = Array.fill(104)("w").mkString(" ")
    val fixture = Seq((0L, w104), (1L, w104),
      (2L, (1 to 104).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val v = Passage.chunkVectors(fixture)
    val b = Passage.chunkBands(v)
    val r = Passage.lateInteractionTopK(v, b)
      .filter(col("query_id") === 0).collect().sortBy(_.getLong(4))
    assert(r.nonEmpty && r.head.getLong(1) == 1L,
      s"the twin document must rank 1: ${r.toSeq}")
    // the twin matches all 4 query chunks at cosine ~1 → score ~4
    assert(r.head.getLong(3) == 4L && math.abs(r.head.getDouble(2) - 4.0) < 1e-9)
    // corpus fixture contracts: no self, contiguous ranks, monotone scores,
    // score bounded by matched query chunks (each maxsim <= 1 + ulp)
    val full = Passage.lateInteractionTopK(vecs, bands).collect()
    full.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(!rows.exists(_.getLong(1) == q))
      val ranks = rows.map(_.getLong(4)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
      val ss = rows.sortBy(_.getLong(4)).map(_.getDouble(2))
      assert(ss.zip(ss.tail).forall { case (a, c) => a >= c })
      rows.foreach(x => assert(x.getDouble(2) <= x.getLong(3) * (1.0 + 1e-9)))
    }
  }

  test("distillation pairs: slate identity, exact single-chunk scores, " +
    "rank permutations, teacher scores the FULL interaction") {
    import spark.implicits._
    val topk = Passage.passageTopKServeFrom(vecs, bands)
    val distill = Passage.distillPairs(vecs, topk).collect()
    // (a) the distillation slate IS the student's candidate doc set —
    // every retrieved doc gets a teacher score, nothing else does
    val slate = distill.map(r => (r.getLong(0), r.getLong(1))).toSet
    val student = topk.select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(slate == student)
    // (b) both ranks are 1..n permutations per query; student_rank
    // follows the student's own best-passage order (rank-1 doc of the
    // top-k is student_rank 1)
    distill.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val best = topk.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    distill.filter(_.getLong(3) == 1L).foreach(r =>
      assert(best(r.getLong(0)) == r.getLong(1),
        "student_rank 1 must be the top-k's rank-1 document"))
    // (c) one-chunk query vs one-chunk twin: teacher == student == 1.0
    // (MaxSim over a single pair is the pair's cosine)
    val w20 = Array.fill(20)("w").mkString(" ")
    val fx = Seq((0L, w20), (1L, w20),
      (2L, (1 to 20).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val fv = Passage.chunkVectors(fx)
    val fd = Passage.distillPairs(fv,
        Passage.passageTopKServeFrom(fv, Passage.chunkBands(fv)))
      .filter(col("query_id") === 0 && col("doc_id") === 1).collect()
    assert(fd.length == 1 && math.abs(fd.head.getDouble(2) - 1.0) < 1e-9 &&
      math.abs(fd.head.getDouble(4) - 1.0) < 1e-9)
    // (NB: no sum-domination claim vs the band-limited MaxSim — the full
    // teacher also scores query chunks the bands never matched, and those
    // maxima can be negative; per-chunk domination doesn't lift to sums.)
  }

  test("persisted family serves the construction bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-passage").toString
    Passage.persistPassage(docs, dir, stamp = "spec")
    assert(graft.sources.SnapshotStore.ready(spark, dir, "spec"))
    val t = Passage.loadPassage(spark, dir)
    val direct = Passage.passageTopKServeFrom(vecs, bands)
    assert(t.topk.exceptAll(direct).isEmpty && direct.exceptAll(t.topk).isEmpty)
    // and the persisted band index equals a fresh banding of the
    // persisted vectors (the index is a pure function of the vectors)
    val freshBands = Passage.chunkBands(t.vectors)
    assert(t.bands.exceptAll(freshBands).isEmpty &&
      freshBands.exceptAll(t.bands).isEmpty)
    // v4: the persisted distillation slate equals a fresh derivation
    // from the persisted inputs
    val freshDistill = Passage.distillPairs(t.vectors, t.topk)
    assert(t.distill.exceptAll(freshDistill).isEmpty &&
      freshDistill.exceptAll(t.distill).isEmpty)
  }

  test("mrr card: reciprocal served rank of the exact top-1, zero when missed") {
    import spark.implicits._
    // q1's true best served at rank 2 (rr 0.5); q2's missed entirely
    // (rr 0); q3's served at rank 1 (rr 1.0) -> mrr = 0.5
    val exact = Seq(
      (1L, 10L, 0L, 1L), (1L, 11L, 0L, 2L),
      (2L, 20L, 1L, 1L),
      (3L, 30L, 2L, 1L)
    ).toDF("query_id", "doc_id", "chunk_id", "rank")
    val approx = Seq(
      (1L, 12L, 0L, 1L), (1L, 10L, 0L, 2L),
      (2L, 21L, 0L, 1L),
      (3L, 30L, 2L, 1L)
    ).toDF("query_id", "doc_id", "chunk_id", "rank")
    val r = Passage.mrrCard(approx, exact).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == (0.0 + 0.5 + 1.0) / 3.0)
  }

  test("mrr card on the corpus index: full query set, mrr within (0, 1]") {
    val card = Passage.mrrCard(
      Passage.passageTopKServeFrom(vecs, bands),
      Passage.passageBruteTopK(vecs)).head()
    assert(card.getLong(0) == 5L)
    assert(card.getDouble(2) > 0.0 && card.getDouble(2) <= 1.0,
      s"mrr ${card.getDouble(2)} out of range")
  }

  test("ndcg card: hand-computed on a planted permutation; a perfectly " +
    "ordered served list scores exactly 1.0") {
    import spark.implicits._
    // q0: served swaps the exact top-2 and its third slot misses (doc 99
    // not in the exact list); q1: served == exact order
    val exact = Seq(
      (0L, 10L, 0L, 0.9, 1L), (0L, 11L, 0L, 0.8, 2L), (0L, 12L, 0L, 0.7, 3L),
      (1L, 20L, 0L, 0.9, 1L), (1L, 21L, 0L, 0.8, 2L))
      .toDF("query_id", "doc_id", "chunk_id", "cosine", "rank")
    val served = Seq(
      (0L, 11L, 0L, 0.85, 1L), (0L, 10L, 0L, 0.80, 2L), (0L, 99L, 0L, 0.5, 3L),
      (1L, 20L, 0L, 0.9, 1L), (1L, 21L, 0L, 0.8, 2L))
      .toDF("query_id", "doc_id", "chunk_id", "cosine", "rank")
    val rows = Passage.ndcgCard(served, exact).collect()
    val d = Passage.ndcgDiscounts(10)
    // rel = 11 - exact_rank: doc10 -> 10, doc11 -> 9, doc12 -> 8
    val idcg0 = Seq(10.0 * d(0), 9.0 * d(1), 8.0 * d(2)).sorted.sum
    val dcg0 = Seq(9.0 * d(0), 10.0 * d(1), 0.0 * d(2)).sorted.sum
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(math.abs(r0.getAs[Double]("ndcg") - dcg0 / idcg0) < 1e-12,
      s"q0 ndcg ${r0.getAs[Double]("ndcg")} != ${dcg0 / idcg0}")
    assert(r0.getAs[Double]("ndcg") < 1.0)
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Double]("ndcg") == 1.0,
      "a perfectly ordered served list must score exactly 1.0 (identical sorted folds)")
  }

  test("ndcg card on the corpus index: full query set, each ndcg within [0, 1]") {
    val rows = Passage.ndcgCard(
      Passage.passageTopKServeFrom(vecs, bands),
      Passage.passageBruteTopK(vecs)).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Double]("ndcg") >= 0.0
      && r.getAs[Double]("ndcg") <= 1.0))
    assert(rows.exists(_.getAs[Double]("ndcg") > 0.0),
      "the banded index must place at least one exact-top-k chunk")
  }
}

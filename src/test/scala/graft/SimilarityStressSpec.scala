package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Corpus-growth stress for the two-level IVF index — the ANN analog of
  * DedupStressSpec's scaling EVIDENCE (numbers recorded in BASELINE.md):
  * at 4× the corpus, the broadcastable coarse level must grow ~√4 = 2×,
  * the fine table ~4× (cells grow in NUMBER), and per-cell occupancy —
  * the quantity that bounds both probe ranking and per-cell near-dup
  * candidate generation — must stay flat. Together these are the
  * structural claims that let the index survive a 100 TB corpus: no
  * broadcast grows linearly with the data, and per-task work is
  * corpus-size-independent.
  */
class SimilarityStressSpec extends SparkSpec {

  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = Array.tabulate(8)(d =>
        (((i * 2654435761L + d * 40503L) % 1009L) / 1009.0f + 0.1f))
      (i.toLong, "x", v)
    }.toDF("vec_id", "label", "embedding")
  }

  // the registry/persistIndex staging discipline: checkpoint each level,
  // train the next from the checkpointed frame
  private def trained(emb: DataFrame, cellSize: Int): Similarity.IvfIndex = {
    val coarse = Similarity.trainIvfCoarse(emb, cellSize).localCheckpoint()
    val levels = Similarity.trainIvfFineStaged(emb, coarse, cellSize)
    val fine = levels.last.localCheckpoint()
    levels.foreach(_.unpersist(false)) // checkpointed — caches released (r8 ADVICE-3)
    Similarity.IvfIndex(coarse, fine)
  }

  test("4x + 8x corpus: coarse sublinear (broadcast), fine ~linear, per-cell occupancy flat") {
    val cellSize = 32
    // three points — 1×, 4×, 8× — so the scaling claims rest on a SERIES,
    // not a single ratio (round-7 verdict item 6; 8× added round 9)
    val (n1, n2, n3) = (3072, 12288, 24576)
    def measure(n: Int): (Long, Long, Long, Double, Double) = {
      val t0 = System.nanoTime
      val idx = trained(corpus(n), cellSize)
      val a = Similarity.ivfAssign(corpus(n), idx, probeDepth = 1).localCheckpoint()
      val (c, f, cnt) = (idx.coarse.count(), idx.fine.count(), a.count())
      val occ = a.groupBy("centroid_id").count().agg(avg("count")).head().getDouble(0)
      a.unpersist(false)
      (c, f, cnt, occ, (System.nanoTime - t0) / 1e9)
    }
    val (c1, f1, cnt1, occ1, s1) = measure(n1)
    val (c2, f2, cnt2, occ2, s2) = measure(n2)
    val (c3, f3, cnt3, occ3, s3) = measure(n3)
    // assignment is total: every vector lands in exactly one home cell
    assert(cnt1 == n1 && cnt2 == n2 && cnt3 == n3)
    info(f"corpus $n1: coarse $c1, fine $f1, occ $occ1%.1f, $s1%.1f s; " +
      f"corpus $n2: coarse $c2, fine $f2, occ $occ2%.1f, $s2%.1f s; " +
      f"corpus $n3: coarse $c3, fine $f3, occ $occ3%.1f, $s3%.1f s")
    assert(f2.toDouble / f1 > 2.5 && f2.toDouble / f1 < 6,
      s"fine centroids must grow ~linearly with the corpus: $f1 -> $f2")
    assert(f3.toDouble / f1 > 5 && f3.toDouble / f1 < 12,
      s"fine centroids must stay ~linear at 8x: $f1 -> $f3")
    assert(c2.toDouble / c1 < 3.2,
      s"the coarse level (the ONLY broadcast) must grow ~sqrt: $c1 -> $c2")
    assert(c3.toDouble / c1 < 4.5,
      s"coarse growth at 8x must stay ~sqrt(8)=2.8, well under linear 8x: $c1 -> $c3")
    assert(c3 <= 4 * math.sqrt(f3.toDouble).toLong + 1,
      s"coarse $c3 must stay ~sqrt of fine $f3 at the largest scale too")
    assert(occ2 / occ1 < 2.0 && occ3 / occ1 < 2.0,
      s"per-cell occupancy must stay flat as cells grow in number: $occ1 -> $occ2 -> $occ3")
  }

  test("LSH at 10x duplication: candidate state exactly flat, output = exact expansion") {
    // the DedupStressSpec bound, mirrored onto the embedding LSH path: a
    // duplicate-heavy corpus (same image embedded from ten crawls) must
    // leave the rep-level band-join state EXACTLY flat — the vecGroups
    // pre-pass bounds candidates by DISTINCT vectors — while the emitted
    // pairs equal the 1x result's combinatorial expansion (intra-group at
    // cosine 1.0, cross-group inheriting the representative cosine).
    val Off = 10000000L
    val Copies = 10
    val base = Tables.embeddings(spark, sf).localCheckpoint()
    val amplified = (0 until Copies)
      .map(k => base.withColumn("vec_id", col("vec_id") + lit(k * Off)))
      .reduce(_ unionByName _)
      .localCheckpoint()

    val c1 = Similarity.lshCandidates(base).count()
    val c10 = Similarity.lshCandidates(amplified).count()
    info(s"rep-level LSH candidates: 1x = $c1, 10x = $c10")
    assert(c10 == c1, s"candidate state must be bounded by distinct vectors: $c1 -> $c10")

    val p1 = Similarity.lshNearDupPairs(base, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val p10 = Similarity.lshNearDupPairs(amplified, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = scala.collection.mutable.Map[(Long, Long), Double]()
    for (((i, j), s) <- p1; a <- 0 until Copies; b <- 0 until Copies) {
      val (x, y) = (i + a * Off, j + b * Off)
      expected((math.min(x, y), math.max(x, y))) = s
    }
    val ids = base.select("vec_id").collect().map(_.getLong(0))
    for (t <- ids; a <- 0 until Copies; b <- (a + 1) until Copies)
      expected((t + a * Off, t + b * Off)) = 1.0
    assert(p10.size == expected.size,
      s"pair count ${p10.size} != expected expansion ${expected.size}")
    assert(p10 == expected, {
      val missing = expected.keySet -- p10.keySet
      val extra = p10.keySet -- expected.keySet
      s"expansion mismatch: ${missing.take(5)} missing, ${extra.take(5)} extra"
    })
  }

  test("PQ at 4x + 8x corpus: codebook FLAT (broadcast bounded by constants), codes ~linear") {
    // PQ's structural claim is even stronger than IVF's: the broadcast
    // side (the packed codebooks) is bounded by the CONSTANTS m·k — it
    // must not grow at all with the corpus, while the encoded table
    // grows linearly (one m-code row per vector). Three points so the
    // claim rests on a series, the house rule.
    val (n1, n2, n3) = (3072, 12288, 24576)
    def measure(n: Int): (Long, Long) = {
      val emb = corpus(n)
      val cb = Similarity.trainPqCodebooks(emb, m = 2, k = 16,
        trainIters = 2, dim = 8).localCheckpoint()
      val nCb = cb.count()
      val nCodes = Similarity.pqEncode(emb, cb, m = 2, dim = 8).count()
      (nCb, nCodes)
    }
    val (cb1, co1) = measure(n1)
    val (cb2, co2) = measure(n2)
    val (cb3, co3) = measure(n3)
    info(s"PQ codebook rows: 1x=$cb1, 4x=$cb2, 8x=$cb3; codes: $co1, $co2, $co3")
    // codebook: flat within sampling noise at every point (hash seeding
    // targets ~k per subspace regardless of corpus size)
    assert(cb2 <= cb1 * 2 && cb3 <= cb1 * 2,
      s"codebook must not grow with the corpus: $cb1 -> $cb2 -> $cb3")
    assert(cb1 <= 2 * 16 * 4, s"codebook bounded by m*~k: $cb1")
    // codes: exactly one row per vector — linear by construction
    assert(co1 == n1 && co2 == n2 && co3 == n3,
      s"codes must be one row per vector: $co1/$n1, $co2/$n2, $co3/$n3")
  }
}

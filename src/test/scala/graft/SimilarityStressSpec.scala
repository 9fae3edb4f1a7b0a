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

  test("4x corpus: coarse ~2x (sublinear broadcast), fine ~4x, per-cell occupancy flat") {
    val cellSize = 32
    val (n1, n2) = (3072, 12288)
    val t0 = System.nanoTime
    val i1 = trained(corpus(n1), cellSize)
    val a1 = Similarity.ivfAssign(corpus(n1), i1, probeDepth = 1).localCheckpoint()
    val (c1, f1, cnt1) = (i1.coarse.count(), i1.fine.count(), a1.count())
    val t1 = System.nanoTime
    val i2 = trained(corpus(n2), cellSize)
    val a2 = Similarity.ivfAssign(corpus(n2), i2, probeDepth = 1).localCheckpoint()
    val (c2, f2, cnt2) = (i2.coarse.count(), i2.fine.count(), a2.count())
    val t2 = System.nanoTime
    // assignment is total: every vector lands in exactly one home cell
    assert(cnt1 == n1 && cnt2 == n2)
    val occ1 = a1.groupBy("centroid_id").count().agg(avg("count")).head().getDouble(0)
    val occ2 = a2.groupBy("centroid_id").count().agg(avg("count")).head().getDouble(0)
    info(f"corpus $n1: coarse $c1, fine $f1, occ $occ1%.1f, ${(t1 - t0) / 1e9}%.1f s; " +
      f"corpus $n2: coarse $c2, fine $f2, occ $occ2%.1f, ${(t2 - t1) / 1e9}%.1f s")
    assert(f2.toDouble / f1 > 2.5 && f2.toDouble / f1 < 6,
      s"fine centroids must grow ~linearly with the corpus: $f1 -> $f2")
    assert(c2.toDouble / c1 < 3.2,
      s"the coarse level (the ONLY broadcast) must grow ~sqrt: $c1 -> $c2")
    assert(c2 <= 4 * math.sqrt(f2.toDouble).toLong + 1,
      s"coarse $c2 must stay ~sqrt of fine $f2 at the larger scale too")
    assert(occ2 / occ1 < 2.0,
      s"per-cell occupancy must stay flat as cells grow in number: $occ1 -> $occ2")
  }
}

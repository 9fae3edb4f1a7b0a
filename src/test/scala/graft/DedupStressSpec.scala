package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** 10× duplication stress for the minhash scale path (round-6 VERDICT-7):
  * scaling EVIDENCE instead of scaling claims. A duplicate-amplified corpus
  * (every distinct sf0.1 text × 10 copies, half the texts carrying a hot
  * boilerplate suffix whose shingles hit ~25k documents) must leave the LSH
  * candidate state EXACTLY flat — the dup-group pre-pass bounds the bucket
  * join by distinct texts, so 10× the documents is 0× the candidates — while
  * the emitted pairs equal the 1× result's exact combinatorial expansion
  * (intra-group pairs at jaccard 1.0, cross-group pairs inheriting their
  * representatives' score verbatim). Wall-clock is recorded for BASELINE.md
  * and loosely bounded: a candidate blowup would be ~100×, the pipeline
  * must stay near-linear.
  */
class DedupStressSpec extends SparkSpec {

  test("minhash at 10x duplication: candidate state flat, output = exact expansion, near-linear time") {
    val Off = 10000000L
    val Copies = 10
    val boiler = " all rights reserved terms of service apply contact support for details"
    // distinct sf0.1 texts (deterministic representative), hot boilerplate
    // on half of them BEFORE copying so its shingles are corpus-wide
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, concat(col("text"), lit(boiler)))
          .otherwise(col("text")).as("text"))
      .localCheckpoint()
    val amplified = (0 until Copies)
      .map(k => base.select((col("doc_id") + lit(k * Off)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .localCheckpoint()
    val n1 = base.count()
    val n10 = amplified.count()
    assert(n10 == n1 * Copies)

    def timed[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1000000L)
    }
    val (p1, t1) = timed(Dedup.minhashPairs(base, 0.8).collect())
    val (p10, t10) = timed(Dedup.minhashPairs(amplified, 0.8).collect())
    info(s"corpus $n1 -> ${p1.length} pairs in ${t1}ms; " +
      s"corpus $n10 (10x dup) -> ${p10.length} pairs in ${t10}ms")

    // the LSH candidate state is bounded by DISTINCT texts: amplification
    // changes it not at all (representatives are identical frames)
    val c1 = Dedup.minhashCandidates(base).count()
    val c10 = Dedup.minhashCandidates(amplified).count()
    info(s"rep-level LSH candidates: 1x = $c1, 10x = $c10")
    assert(c10 == c1,
      s"candidate state must be bounded by distinct texts: $c1 -> $c10")

    // output = the exact combinatorial expansion of the 1x result
    val p1Map = p1.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val eligible = base
      .filter(size(Dedup.shingleHashes(col("text"))) > 0)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = scala.collection.mutable.Map[(Long, Long), Double]()
    for (((i, j), s) <- p1Map; a <- 0 until Copies; b <- 0 until Copies) {
      val (x, y) = (i + a * Off, j + b * Off)
      expected((math.min(x, y), math.max(x, y))) = s
    }
    for (t <- eligible; a <- 0 until Copies; b <- (a + 1) until Copies)
      expected((t + a * Off, t + b * Off)) = 1.0
    val got = p10.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == expected.size,
      s"pair count ${got.size} != expected expansion ${expected.size}")
    assert(got == expected, {
      val missing = expected.keySet -- got.keySet
      val extra = got.keySet -- expected.keySet
      s"expansion mismatch: ${missing.take(5)} missing, ${extra.take(5)} extra"
    })

    // near-linear wall-clock (generous noise floor; a quadratic candidate
    // blowup would land ~100x over a >= 2s baseline)
    assert(t10 <= 30L * math.max(t1, 2000L),
      s"10x corpus took ${t10}ms vs ${t1}ms at 1x — not near-linear")
  }

  test("bloom at 4x/8x benchmark and corpus: packed payload EXACTLY constant, " +
    "candidates exactly the planted carriers at every scale") {
    import spark.implicits._
    def bench(n: Int) = (0 until n)
      .map(i => (i.toLong, s"b$i x$i y$i z$i w$i q$i"))
      .toDF("doc_id", "text")
    // the broadcast side is bounded by the GEOMETRY, not the data: the
    // range-densified pack is ceil(mBits/63) longs at any benchmark size
    val wantLen = (Dedup.BloomBits + 62) / 63
    for (n <- Seq(500, 2000, 4000)) {
      val len = Dedup.bloomBitmap(bench(n))
        .select(size(col("bloom"))).head().getInt(0)
      assert(len == wantLen, s"bitmap must stay $wantLen longs at bench=$n: $len")
    }
    // corpus growth at a fixed benchmark: the probe's OUTPUT is exactly
    // the planted carrier density at 1x/4x/8x — candidate state scales
    // with true contamination, never with corpus size
    val bitmap = Dedup.bloomBitmap(bench(50)).localCheckpoint()
    def corpusN(n: Int) = (0 until n).map { i =>
      if (i % 100 == 0) (i.toLong, s"pad b1 x1 y1 z1 w1 q1 tail")
      else (i.toLong, s"u$i v$i k$i t$i s$i r$i")
    }.toDF("doc_id", "text")
    for (n <- Seq(1000, 4000, 8000)) {
      val cand = Dedup.bloomCandidates(corpusN(n), bitmap).count()
      assert(cand == n / 100,
        s"candidates must equal the planted carriers at corpus=$n: $cand")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.operators.Dedup

/** Specs for the custom sketch expressions and sketch-based dedup. */
class SketchSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("minhash signature: k values, deterministic, permutation-min semantics") {
    import spark.implicits._
    val df = Seq((1L, Array(10L, 20L, 30L)), (2L, Array(10L, 20L, 30L)), (3L, Array(99L)))
      .toDF("id", "hashes")
    val r = df.select(col("id"), Sketches.minhashSignature(col("hashes"), 16, 7L).as("sig"))
      .collect().map(x => x.getLong(0) -> x.getAs[scala.collection.Seq[Long]]("sig")).toMap
    assert(r(1L).length == 16)
    assert(r(1L) == r(2L))            // same input -> same signature
    assert(r(1L) != r(3L))
    // signature of a superset is elementwise <= (min over more values)
    val sup = Seq((4L, Array(10L, 20L, 30L, 99L))).toDF("id", "hashes")
      .select(Sketches.minhashSignature(col("hashes"), 16, 7L)).head()
      .getAs[scala.collection.Seq[Long]](0)
    r(1L).zip(sup).foreach { case (a, b) => assert(b <= a) }
  }

  test("minhash codegen and interpreted paths agree") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, Array.tabulate(20)(j => (i * 31 + j).toLong)))
      .toDF("id", "hashes")
    val viaCodegen = df.select(col("id"), Sketches.minhashSignature(col("hashes")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("s")).toMap
    // force interpreted evaluation
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(col("id"), Sketches.minhashSignature(col("hashes")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("s")).toMap
      assert(viaCodegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("minhash_bands equals the rotate-xor fold of the signature, codegen and interpreted") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, Array.tabulate(20)(j => (i * 31 + j).toLong)))
      .toDF("id", "hashes")
    def rotlFold(sig: Seq[Long], bands: Int): Seq[Long] = {
      val rows = sig.length / bands
      (0 until bands).map { b =>
        sig.slice(b * rows, (b + 1) * rows)
          .foldLeft(17L)((acc, x) => java.lang.Long.rotateLeft(acc, 1) ^ x)
      }
    }
    val sig = df.select(col("id"), Sketches.minhashSignature(col("hashes"), 128, 42L).as("s"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("s").toSeq).toMap
    def bandsOf(): Map[Long, Seq[Long]] =
      df.select(col("id"), Sketches.minhashBands(col("hashes"), 128, 32, 42L).as("b"))
        .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("b").toSeq).toMap
    val fused = bandsOf()
    assert(fused.forall { case (id, b) => b == rotlFold(sig(id), 32) })
    // interpreted path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(bandsOf() == fused)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("simhash: identical inputs collide, disjoint inputs differ, SQL path works") {
    import spark.implicits._
    val df = Seq((1L, Array(5L, 9L, 5L)), (2L, Array(5L, 9L, 5L)), (3L, Array(1024L, 2048L)))
      .toDF("id", "hashes")
    val r = df.select(col("id"), Sketches.simhash(col("hashes")).as("s"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(2L))
    assert(r(1L) != r(3L))
    // SQL registration via GraftExtensions
    df.createOrReplaceTempView("simhash_in")
    val viaSql = spark.sql("SELECT id, simhash(hashes, 30) AS s FROM simhash_in")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(viaSql == r)
  }

  test("minhash pairs equal exact jaccard pairs at threshold 0.8") {
    val exact = Dedup.jaccardPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == exact)
  }

  test("shingle_hashes equals hash-of-HOF-shingles on adversarial inputs, codegen and interpreted") {
    import spark.implicits._
    // byte-range hashing must agree with hashing the materialized shingle
    // STRING for every tokenization edge: repeated/leading/trailing
    // spaces (empty tokens), multi-byte UTF-8, < n tokens, empty text
    val fixtures = Seq(
      "the quick brown fox jumps",
      "a  double  space run",
      " leading and trailing ",
      "exactly three toks",
      "two toks", "one", "",
      "unicode 的是 mixed zügig tokens here",
      "x " * 50 + "tail")
    for (n <- Seq(1, 2, 3, 5); cg <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", cg)
      try {
        val df = fixtures.toDF("text").select(
          graft.functions.Sketches.shingleHashes(col("text"), n).as("fused"),
          transform(graft.operators.Dedup.shinglesRaw(col("text"), n),
            s => xxhash64(s)).as("hof"))
        val bad = df.filter(not(col("fused") <=> col("hof"))).count()
        assert(bad == 0, s"fused != HOF shingle hashes at n=$n mode=$cg")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // and over the real corpus at the operator's n
    val docs = Tables.documents(spark, sf)
    val mism = docs.select(
      graft.functions.Sketches.shingleHashes(col("text"), 3).as("fused"),
      transform(graft.operators.Dedup.shinglesRaw(col("text"), 3),
        s => xxhash64(s)).as("hof"))
      .filter(not(col("fused") <=> col("hof"))).count()
    assert(mism == 0)
  }

  test("token_hashes equals the HOF polynomial fold, codegen and interpreted") {
    import spark.implicits._
    // the fused byte-pass must reproduce split/ascii/aggregate semantics on
    // every tokenization edge: empty tokens (ascii-of-nothing folds to 0),
    // multi-byte UTF-8 codepoints (ascii() is codePointAt(0)), empty text
    val fixtures = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  double  space run",
      " leading and trailing ",
      "one", "",
      "unicode 的是 mixed zügig tokens café здесь",
      "x " * 50 + "tail")
    for (cg <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", cg)
      try {
        val df = fixtures.toDF("text").select(
          graft.functions.Sketches.tokenHashes(col("text")).as("fused"),
          graft.operators.Dedup.tokenHashesHof(col("text")).as("hof"))
        val rows = df.collect()
        rows.zip(fixtures).foreach { case (r, f) =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"fused != HOF token hashes (mode=$cg) for '$f': " +
              s"${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
        }
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // and over the real corpus (the SimHash front-end input)
    val mism = Tables.documents(spark, sf).select(
      graft.functions.Sketches.tokenHashes(col("text")).as("fused"),
      graft.operators.Dedup.tokenHashesHof(col("text")).as("hof"))
      .filter(not(col("fused") <=> col("hof"))).count()
    assert(mism == 0)
  }

  test("fingerprint equals the HOF polynomial fold, codegen and interpreted") {
    import spark.implicits._
    // unlike token_hashes, the whole-document fingerprint accumulates
    // EVERY code point including spaces — same byte-pass decoding, no
    // token reset; check both evaluation paths on the same edge fixtures
    val fixtures = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  double  space run",
      " leading and trailing ",
      "one", "",
      "unicode 的是 mixed zügig tokens café здесь",
      "x " * 50 + "tail")
    for (cg <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", cg)
      try {
        val rows = fixtures.toDF("text").select(
          graft.functions.Sketches.fingerprint(col("text")).as("fused"),
          graft.operators.TextAnalysis.fingerprintColHof(col("text")).as("hof"))
          .collect()
        rows.zip(fixtures).foreach { case (r, f) =>
          assert(r.getLong(0) == r.getLong(1),
            s"fused != HOF fingerprint (mode=$cg) for '$f': ${r.getLong(0)} vs ${r.getLong(1)}")
        }
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // and over the real corpus (the q_fingerprint surface)
    val mism = Tables.documents(spark, sf).select(
      graft.functions.Sketches.fingerprint(col("text")).as("fused"),
      graft.operators.TextAnalysis.fingerprintColHof(col("text")).as("hof"))
      .filter(not(col("fused") <=> col("hof"))).count()
    assert(mism == 0)
  }

  test("LSH S-curve margin: default (threshold, bands, rows) keep band-miss below 1e-6") {
    // The exact-all-pairs DuckDB oracles for q_minhash_pairs,
    // q_neardedup_corpus, q_dup_clusters and q_dedup_incremental are valid
    // ONLY while a true threshold-grade pair almost surely enters the LSH
    // candidate join: P(miss at jaccard j) = (1 - j^rows)^bands. This test
    // pins the defaults to that margin — changing numHashes/bands/threshold
    // past the recall cliff fails HERE instead of as a mysterious
    // hash-mismatch at a bigger SF (ADVICE r4 item 4).
    val threshold = 0.8              // minhashPairs/dedupDelta default
    val numHashes = 128              // minhashPairs/dedupDelta default
    val bands     = 32               // minhashPairs/dedupDelta default
    val rows      = numHashes / bands
    def missAt(j: Double) = math.pow(1.0 - math.pow(j, rows), bands)
    assert(missAt(threshold) < 1e-6,
      f"band-miss ${missAt(threshold)}%.2e at j=$threshold breaks the exact-oracle contract")
    // and the curve is still selective below threshold (sub-threshold pairs
    // are mostly not even candidates — candidate volume stays bounded)
    assert(missAt(0.4) > 0.4, "S-curve degenerated: everything becomes a candidate")
    // margin holds across the whole accepted band, not just the threshold
    // point: miss is decreasing in j, so the threshold is the worst case
    assert(missAt(0.9) < missAt(0.8) && missAt(1.0) <= missAt(0.9))
  }

  test("simhash pairs: hamming bounded and include exact duplicates") {
    import spark.implicits._
    val withDup = docs.union(
      docs.limit(1).withColumn("doc_id", col("doc_id") + 1000000L))
    val pairs = Dedup.simhashPairs(withDup, 2).collect()
    assert(pairs.forall(_.getLong(2) <= 2))
    // identical text -> identical simhash -> hamming 0 pair present
    assert(pairs.exists(r => r.getLong(1) == r.getLong(0) + 1000000L && r.getLong(2) == 0))
  }

  test("perceptual hash: codegen/interpreted parity, reference model, locality, multi-byte") {
    import spark.implicits._
    // independent reference: code-point walk in plain Scala (dHash —
    // gradient sign between consecutive fixed-stride samples, end-clamped)
    def ref(text: String, bits: Int, stride: Int = 2): Long = {
      val cps = text.codePoints().toArray
      if (cps.isEmpty) 0L
      else {
        val smp = (0 to bits).map(j => cps(math.min(j * stride, cps.length - 1)))
        (0 until bits).foldLeft(0L) { (h, i) =>
          if (smp(i) > smp(i + 1)) h | (1L << i) else h
        }
      }
    }
    val fixtures = Seq(
      (1L, "hello world this is a test of the perceptual hash"),
      (2L, ""), (3L, "a"), (4L, "z" * 100),
      (5L, "café 中文 mixed code points 😀 beyond the BMP"))
      .toDF("doc_id", "text")
    val viaCodegen = fixtures
      .select(col("doc_id"), graft.functions.Sketches.perceptualHash(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fixtures.collect().foreach { r =>
      assert(viaCodegen(r.getLong(0)) == ref(r.getString(1), 48),
        s"expression must equal the code-point reference for '${r.getString(1).take(20)}'")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = fixtures
        .select(col("doc_id"), graft.functions.Sketches.perceptualHash(col("text")).as("p"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaCodegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // locality: a small edit moves few sampled bits; the exact fingerprint
    // (the non-perceptual control) changes completely
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = base.dropRight(5) + "XXXXX"
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ph = two.select(graft.functions.Sketches.perceptualHash(col("text")).as("p"))
      .collect().map(_.getLong(0))
    assert(java.lang.Long.bitCount(ph(0) ^ ph(1)) <= 5,
      s"tail edit must stay within banding reach: hamming ${java.lang.Long.bitCount(ph(0) ^ ph(1))}")
  }

  test("selfPairsFromIndex ≡ dedupDelta(index, corpus) minus self-matches " +
    "(the SplitStream intra-batch arm's zero-reshingle twin)") {
    import spark.implicits._
    import graft.operators.Dedup
    def text(tag: String): String = (1 to 40).map(i => s"$tag$i").mkString(" ")
    def repl(tag: String, k: Int, atEnd: Boolean): String = {
      val t = text(tag).split(" ").toSeq
      (if (atEnd) t.dropRight(k) ++ (1 to k).map(i => s"e$i")
       else (1 to k).map(i => s"s$i") ++ t.drop(k)).mkString(" ")
    }
    // exact-dup TRIPLE {1, 2, 7} with a near-dup 8 of it, near chain
    // 3~4 and 3~5 (4 !~ 5), singleton 6
    val corpus = Seq(
      (1L, text("alpha")), (2L, text("alpha")), (7L, text("alpha")),
      (8L, repl("alpha", 3, atEnd = true)),
      (3L, text("beta")), (4L, repl("beta", 3, atEnd = true)),
      (5L, repl("beta", 3, atEnd = false)),
      (6L, text("gamma"))).toDF("doc_id", "text")
    val index = Dedup.buildDedupIndex(corpus)
    val self = Dedup.selfPairsFromIndex(index).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference: the cross form self-matched, oriented, self-pairs dropped
    val ref = Dedup.dedupDelta(index, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a != b }
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b)) -> j }
      .toMap
    assert(self == ref, s"self-pairs must equal the cross form: $self vs $ref")
    // non-vacuity: exact triple (3 pairs), near-of-group expansion
    // (8 pairs with ALL of {1,2,7}), the chain, and the absent pairs
    assert(self.keySet == Set((1L, 2L), (1L, 7L), (2L, 7L),
      (1L, 8L), (2L, 8L), (7L, 8L), (3L, 4L), (3L, 5L)),
      s"expected the planted pair structure: ${self.keySet}")
    assert(self((1L, 2L)) == 1.0 && self((3L, 4L)) < 1.0)

    // the clustering-shaped form: SAME components at O(group) edges —
    // the k-copy group costs k−1 star edges, never k(k−1)/2 pairs, and
    // the near match stays at rep level
    val edges = Dedup.selfEdgesFromIndex(index).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (1L, 7L), (1L, 8L), (3L, 4L), (3L, 5L)),
      s"star edges + rep-level near matches only: $edges")
    def components(prs: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.clustersFromPairs(prs.toDF("doc_id1", "doc_id2")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(components(edges.toSeq) == components(self.keySet.toSeq),
      "edges and pairs must induce identical components (hence identical split keys)")
  }
}

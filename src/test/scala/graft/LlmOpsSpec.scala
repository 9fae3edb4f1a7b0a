package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the LLM-data-pipeline operators (text analysis + dedup). */
class LlmOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("token stats: whitespace count consistent with text length") {
    val r = TextAnalysis.tokenStats(docs)
    // single-space corpus: n_tokens = spaces + 1, so text_len >= 2*n_tokens - 1
    assert(r.filter(col("n_tokens") <= 0).count() == 0)
    assert(r.filter(col("text_len") < col("n_tokens") * 2 - 1).count() == 0)
    assert(r.filter(col("n_bpe_tokens") < col("n_tokens")).count() == 0)
  }

  test("quality score stays in [0,1] and ratios in range") {
    val r = TextAnalysis.qualityScore(docs)
    assert(r.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    assert(r.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(r.filter(col("unique_ratio") <= 0 || col("unique_ratio") > 1).count() == 0)
  }

  test("language id predicts a known language for every doc") {
    val r = TextAnalysis.languageId(docs)
    val langs = r.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextAnalysis.LangSets.map(_._1).toSet))
    assert(r.count() == docs.count())
  }

  test("vocabulary: counts exact on a planted corpus, total order, k truncates") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "b a a"), (2L, "a c b"), (3L, "c b")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabulary(fixture, k = 2).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    // tf: a=3 b=3 c=2; tie a-vs-b broken by token ASC; k=2 cuts c
    assert(r.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 3L)),
      s"exact (token, tf, df) expected: ${r.toSeq}")
    // on the real corpus: tf non-increasing in output order, 1 <= df <= tf
    val real = TextAnalysis.vocabulary(docs, k = 20).collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert(real.length == 20)
    assert(real.sliding(2).forall(p => p(0)._1 >= p(1)._1), "tf non-increasing")
    assert(real.forall(x => x._2 <= x._1 && x._2 >= 1L), "1 <= df <= tf")
  }

  test("BPE merges: the classic low/lower/newest fixture induces the textbook merge table") {
    import spark.implicits._
    // Sennrich's worked example shape: low x3, lower x2, newest x1.
    // Hand-derived rounds (argmax under pair_count DESC, l ASC, r ASC):
    //   1: (l,o)=5 ties (o,w)=5, l-ASC picks (l,o) -> "lo"
    //   2: (lo,w)=5 -> "low"
    //   3: (e,r)=2 ties (low,e)=2, "e" < "low" -> "er"
    //   4: (low,er)=2 -> "lower"
    //   5: all count-1 pairs from "newest"; (e,s) wins the total order
    val fixture = Seq(
      (1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(fixture, numMerges = 5).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, "l", "o", "lo", 5L),
      (2L, "lo", "w", "low", 5L),
      (3L, "e", "r", "er", 2L),
      (4L, "low", "er", "lower", 2L),
      (5L, "e", "s", "es", 1L)), s"textbook merge table expected: ${r.toSeq}")
    // counting is OVERLAPPING (3 (a,a) pairs per "aaaa" — Sennrich's
    // reference counter), but the MERGE is greedy non-overlapping:
    // "aaaa" under (a,a) segments to [aa, aa], so round 2 merges (aa,aa)
    // — a merged symbol never re-merges in-round
    val rep = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val rr = TextAnalysis.bpeMerges(rep, numMerges = 2).collect()
      .map(x => (x.getLong(0), x.getString(3), x.getLong(4)))
    assert(rr.toSeq == Seq((1L, "aa", 6L), (2L, "aaaa", 2L)),
      s"overlap-counted, greedily-merged rounds expected: ${rr.toSeq}")
    // pair exhaustion emits fewer rows, never fabricated merges
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(tiny, numMerges = 3).count() == 1)
    // duplication invariance: copying the corpus k times scales every
    // pair count by k uniformly, so the merge SEQUENCE is unchanged —
    // the robustness a crawl full of duplicate pages needs from its
    // tokenizer training run
    val dup10 = (0 until 10).map(i =>
        fixture.withColumn("doc_id", col("doc_id") + lit(i * 100L)))
      .reduce(_ unionByName _)
    val scaled = TextAnalysis.bpeMerges(dup10, numMerges = 5).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(4)))
    assert(scaled.toSeq == r.toSeq.map(x => (x._1, x._2, x._3, x._5 * 10)),
      s"10x duplication must scale counts 10x and keep the merge sequence: ${scaled.toSeq}")
  }

  test("BPE encode applies trained merges and reproduces training's final segmentation") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(fixture, numMerges = 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = TextAnalysis.bpeEncode(fixture, merges).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    // after [lo, low, er, lower, es]: low -> "low", lower -> "lower",
    // newest -> n e w es t (es merged, rest single chars)
    assert(enc.toSeq == Seq(
      (1L, 0, "low", "low"), (1L, 1, "low", "low"), (1L, 2, "low", "low"),
      (2L, 0, "lower", "lower"), (2L, 1, "lower", "lower"),
      (3L, 0, "newest", "n e w es t")), s"expected textbook encoding: ${enc.toSeq}")
    // an UNSEEN word encodes with the same merges without retraining:
    // s|l|o|w|e|r -> (l,o) -> (lo,w) -> (e,r) -> (low,er) -> [s, lower]
    val unseen = Seq((9L, "slower")).toDF("doc_id", "text")
    val u = TextAnalysis.bpeEncode(unseen, merges).head()
    assert(u.getString(3) == "s lower", s"unseen 'slower' must reuse the merge chain: ${u.getString(3)}")
  }

  test("tokenizer fertility: conservation against the corpus, ratios exact") {
    val fert = SparkEntry.queries("q_tokenizer_fertility")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(fert.nonEmpty)
    fert.foreach { case (lang, nWords, nPieces, nChars, fertility, cpp) =>
      assert(nPieces >= nWords, s"$lang: every word is >= 1 piece")
      assert(nChars >= nPieces, s"$lang: every piece is >= 1 char")
      assert(fertility == nPieces.toDouble / nWords, s"$lang: ratio must be the one-division value")
      assert(cpp == nChars.toDouble / nPieces, s"$lang: ratio must be the one-division value")
    }
    // conservation: per-lang word totals equal the corpus's occurrence counts
    val fromDocs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.filter(
          org.apache.spark.sql.functions.split(org.apache.spark.sql.functions.col("text"), " "),
          w => w =!= "")).cast("long").as("n"))
      .groupBy("lang").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fert.map(f => f._1 -> f._2).toMap == fromDocs,
      "fertility word counts must conserve the corpus occurrence counts")
  }

  test("unigram vocab pruning: hand-computed gains, alphabet always kept, cut honors the order (r10 next-round 6)") {
    import spark.implicits._
    // pieces after merging (a,b): ab(count 2), c(1), d(1); T=4, |V|=3.
    // gain(ab) = (2+1)·(4+3)^(2−1) / ((c_a+1)(c_b+1)) = 21/1 — the chars
    // a,b never stand alone (count 0), making the fallback maximally
    // expensive and the exact-integer arithmetic hand-checkable
    val docs1 = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val r1 = TextAnalysis.unigramVocab(docs1, Seq(("a", "b")), keep = 1).collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2), x.getDouble(3), x.getInt(4)))
    assert(r1.toSet == Set(("ab", 2, 2L, 21.0, 1), ("c", 1, 1L, 1.0, 1),
      ("d", 1, 1L, 1.0, 1)), s"hand-computed fixture: ${r1.toSeq}")
    // two competing multi-char pieces, keep=1: the cut keeps the higher
    // gain (cd: (2+1)·5 = 15 beats ab: (1+1)·5 = 10) and PRUNES the
    // other — single chars unaffected by the cut
    val docs2 = Seq((1L, "ab cd cd")).toDF("doc_id", "text")
    val r2 = TextAnalysis.unigramVocab(docs2, Seq(("a", "b"), ("c", "d")), keep = 1)
      .collect().map(x => x.getString(0) -> ((x.getDouble(3), x.getInt(4)))).toMap
    assert(r2("cd") == (15.0, 1) && r2("ab") == (10.0, 0),
      s"keep=1 must keep the higher-gain piece and prune the other: $r2")
    // a char swallowed everywhere (zero standalone count) still prices
    // the fallback via smoothing — no division blowup, gain finite
    assert(r2.values.forall(v => !v._1.isInfinite && !v._1.isNaN))
  }

  test("unigram vocab guards the DECIMAL(38,0) gain bound: overflow raises, never NULL-ranks") {
    import spark.implicits._
    // chain merges to a 64-char piece: numerator (c+1)·(T+|V|)^63 with
    // T+|V| ≥ 4 clears 1e38 by orders of magnitude, so the guard MUST
    // trip (silent non-ANSI behavior would be a NULL gain that drops the
    // piece from the ranking while DuckDB's HUGEINT oracle keeps it)
    val long = "a" * 64
    val docs = Seq((1L, s"$long b c d e f g h")).toDF("doc_id", "text")
    val merges = (0 until 6).map(i => ("a" * (1 << i), "a" * (1 << i)))
    val ex = intercept[Exception] {
      TextAnalysis.unigramVocab(docs, merges, keep = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("overflow DECIMAL(38,0)")),
      s"expected the overflow guard to trip: ${msgs(ex)}")
    // the guard is inert in the legal regime: the textbook fixture from
    // the pruning test still scores exactly
    val ok = TextAnalysis.unigramVocab(
      Seq((1L, "ab ab cd")).toDF("doc_id", "text"), Seq(("a", "b")), keep = 1)
      .collect().map(x => (x.getString(0), x.getDouble(3))).toMap
    assert(ok("ab") == 21.0, s"guard must not perturb in-bound gains: $ok")
  }

  test("unigram encode: longest kept prefix wins, pruned and unknown pieces fall back to characters") {
    import spark.implicits._
    val vocab = Seq(
      ("ab", 2, 5L, 20.0, 1), ("abc", 3, 2L, 30.0, 1),  // both kept
      ("cd", 2, 9L, 40.0, 0),                            // PRUNED: must not match
      ("a", 1, 3L, 1.0, 1), ("c", 1, 1L, 1.0, 1))
      .toDF("piece", "piece_len", "piece_count", "gain", "kept")
    val docs = Seq((1L, "abcab cdx"), (2L, "zq")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramEncode(docs, vocab).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getString(3)))
    // greedy longest-first: abc beats ab at position 1; the pruned cd
    // segments as chars; chars outside the vocab (x, z, q) pass through
    assert(r.toSeq == Seq(
      (1L, 0, "abcab", "abc ab"), (1L, 1, "cdx", "c d x"),
      (2L, 0, "zq", "z q")), s"greedy longest-match encoding: ${r.toSeq}")
    // chain integrity on the real path: encoding with the corpus-trained
    // pruned vocab reconstructs every word exactly (concat of pieces)
    val merges = TextAnalysis.bpeMerges(docs, 2).collect()
      .map(x => (x.getString(1), x.getString(2))).toSeq
    val trained = TextAnalysis.unigramVocab(docs, merges, keep = 2)
    val enc = TextAnalysis.unigramEncode(docs, trained).collect()
    assert(enc.forall(x => x.getString(3).replace(" ", "") == x.getString(2)),
      "pieces must concatenate back to the word")
  }

  test("fingerprint is deterministic and content-sensitive") {
    val r1 = TextAnalysis.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = TextAnalysis.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    // distinct texts should essentially never collide with a 1e9+7 modulus at this corpus size
    assert(r1.values.toSet.size > docs.count() * 9 / 10)
  }

  test("exact dedup: representatives + copies account for every doc") {
    val dups = Dedup.exactDuplicates(docs)
    assert(dups.agg(sum("n_copies")).head().getLong(0) == docs.count())
    val deduped = Dedup.exactDedup(docs)
    assert(deduped.count() == dups.count())
  }

  test("shingles: short texts yield empty sets, no descending-sequence blowup") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "one two three"), (3L, "a b c d")).toDF("doc_id", "text")
    val r = tiny.select(col("doc_id"), size(Dedup.shingles(col("text"))).as("n")).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(1L) == 0)
    assert(r(2L) == 1)
    assert(r(3L) == 2)
  }

  test("jaccard pairs: symmetric-free, thresholded, and self-consistent") {
    val pairs = Dedup.jaccardPairs(docs, 0.5).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
    // identical docs (if any) must appear with jaccard == 1.0 — cross-check a planted pair
    val withDup = docs.union(docs.limit(1).withColumn("doc_id", col("doc_id") + 1000000L))
    val planted = Dedup.jaccardPairs(withDup, 0.99)
      .filter(col("doc_id2") === col("doc_id1") + 1000000L)
    assert(planted.count() == 1)
  }

  test("hot shingles: planted boilerplate surfaces; duplication cannot promote a text's own content") {
    import spark.implicits._
    val boiler = "terms of service apply"
    val base = (0 until 30).map(i =>
      (i.toLong, s"u$i v$i w$i x$i y$i" + (if (i % 2 == 0) s" $boiler" else "")))
    // 10 exact copies of doc 1: without the dup-group pre-pass its own
    // (unique) shingles would count 11 times and beat the real boilerplate
    val copies = (1 to 10).map(k => (1000L + k, base(1)._2))
    val docs = (base ++ copies).toDF("doc_id", "text")
    val r = graft.operators.Dedup.hotShingles(docs)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    // only the boilerplate's two internal tri-grams repeat across DISTINCT
    // texts (df 15); every other shingle has df 1 and stays below minDf
    assert(r == Seq(("of service apply", 15L), ("terms of service", 15L)), s"got $r")
    // boilerplate-free corpus: empty report, not a full-corpus dump
    val clean = (0 until 20).map(i => (i.toLong, s"a$i b$i c$i d$i")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.hotShingles(clean).collect().isEmpty)
  }

  test("hot shingles: within-doc boilerplate repetition does not inflate df") {
    import spark.implicits._
    // Boilerplate repeated 5x WITHIN each of 3 docs (typical template chrome):
    // per-occurrence counting would give its tri-grams df ≈ 15 and let them
    // evict the truly-hot shingle; distinct-per-doc df must stay 3.
    val inner = Array.fill(5)("click here now").mkString(" ")
    val docs = (
      (0 until 3).map(i => (i.toLong, s"p$i q$i $inner r$i")) ++
      (10 until 14).map(i => (i.toLong, s"u$i v$i footer text legal w$i"))
    ).toDF("doc_id", "text")
    val r = Dedup.hotShingles(docs, topK = 3)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    // true dfs: "footer text legal" 4; repeated-boilerplate tri-grams 3 each
    // ("click here now"/"here now click"/"now click here" — string tie-break)
    assert(r == Seq(("footer text legal", 4L), ("click here now", 3L),
      ("here now click", 3L)), s"got $r")
  }

  test("jaccard df-cap: a hot shingle shared by every doc no longer pairs the corpus quadratically") {
    import spark.implicits._
    // 100 docs sharing one boilerplate shingle ("common boiler plate") plus a
    // unique 3-gram each: every pair shares exactly the hot shingle.
    val hot = (0 until 100)
      .map(i => (i.toLong, s"common boiler plate unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    // threshold 0 surfaces EVERY candidate pair that survives the cap
    val uncapped = Dedup.jaccardPairs(hot, 0.0, maxDf = 1000).count()
    val capped   = Dedup.jaccardPairs(hot, 0.0, maxDf = 50).count()
    assert(uncapped == 100L * 99 / 2) // quadratic without the cap
    assert(capped == 0)               // hot shingles carry no near-dup signal
    // and the cap leaves rare-shingle pairs untouched: real corpus max df is
    // ~7 at this sf, so capped == uncapped there
    assert(Dedup.jaccardPairs(docs, 0.5, maxDf = 50).count() ==
      Dedup.jaccardPairs(docs, 0.5, maxDf = 1000000).count())
  }

  test("stop-list composition: mined boilerplate no longer pairs docs, true near-dups survive") {
    import spark.implicits._
    // round-6 verdict 4: mine → strip → pair as ONE pipeline. 20 docs share
    // a 5-token footer plus one unique token — their sets are 4 tri-grams
    // with 3 shared, jaccard 3/5 = 0.6, so they ALL pair quadratically at
    // 0.5 without the strip. Docs 100/101 are TRUE near-dups through
    // unique content (jaccard 5/7 ≈ 0.71). topK = 3 mines exactly the
    // footer's three tri-grams (df 20 vs df ≤ 2 for everything else).
    val boiler = "all rights reserved worldwide inc"
    val corpus = ((0 until 20).map(i => (i.toLong, s"u$i $boiler")) ++ Seq(
      (100L, "quick brown fox jumps over lazy dog tonight"),
      (101L, "quick brown fox jumps over lazy dog today"))).toDF("doc_id", "text")
    val mined = Dedup.hotShingles(corpus, topK = 3)
      .collect().map(_.getString(0)).toSeq
    assert(mined == Seq("all rights reserved", "reserved worldwide inc",
      "rights reserved worldwide"), s"got $mined")
    val stop = Dedup.stopListHashes(Dedup.hotShingles(corpus, topK = 3))
    // exact jaccard: 190 boilerplate-only pairs + 1 real pair → 1 real pair
    assert(Dedup.jaccardPairs(corpus, 0.5).count() == 191)
    val stripped = Dedup.jaccardPairs(corpus, 0.5, stopHashesOpt = Some(stop))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(stripped.toSeq == Seq((100L, 101L)),
      s"only the true near-dup pair must survive the strip, got ${stripped.toSeq}")
    // sketch path (minhashPairs) strips identically: the surviving pair is
    // exactly the true near-dup (recall at j≈0.71 with 32×4 bands ≈ 1)
    val mStripped = Dedup.minhashPairs(corpus, 0.5, stopHashesOpt = Some(stop))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mStripped.toSeq == Seq((100L, 101L)), s"got ${mStripped.toSeq}")
    // contamination: benchmark material that is itself stop-listed
    // boilerplate stops counting as collisions
    val bench = Seq((0L, boiler)).toDF("doc_id", "text")
    assert(Dedup.contamination(corpus, bench, n = 3).count() == 20)
    assert(Dedup.contamination(corpus, bench, n = 3,
      stopHashesOpt = Some(stop)).isEmpty)
  }

  test("jaccard survives mass duplication: copies beyond the df-cap still pair at 1.0") {
    import spark.implicits._
    // 60 identical copies: without the exact-dedup pre-pass, their own
    // shingles hit df = 60 > maxDf = 50 and every duplicate pair vanishes
    val copies = (0 until 60)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(copies, 0.99, maxDf = 50).collect()
    assert(pairs.length == 60 * 59 / 2)
    assert(pairs.forall(_.getDouble(2) == 1.0))
    // near-dedup keeps exactly one survivor of the clique
    assert(Dedup.nearDedupCorpus(copies, 0.8).count() == 1)
  }

  test("minhash dup-group expansion: planted exact copies pair at jaccard 1.0, base pairs unchanged") {
    val base = Dedup.minhashPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val withDups = docs
      .union(docs.limit(1).withColumn("doc_id", col("doc_id") + 1000000L))
      .union(docs.limit(1).withColumn("doc_id", col("doc_id") + 2000000L))
    val expanded = Dedup.minhashPairs(withDups, 0.8).collect()
    val small = expanded.filter(r => r.getLong(0) < 1000000L && r.getLong(1) < 1000000L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(small == base) // expansion does not disturb rep-level pairs
    val intra = expanded.filter(r => r.getLong(1) >= 1000000L)
    // doc0 + two copies → 3 intra-group pairs, all exact duplicates…
    assert(intra.count(r => r.getDouble(2) == 1.0) >= 3)
    // …and every copy inherits the rep's cross-group partners verbatim
    val doc0 = docs.limit(1).collect()(0).getLong(0)
    val partners = base.collect {
      case (a, b) if a == doc0 => b
      case (a, b) if b == doc0 => a
    }
    val copyPartners = expanded
      .filter(r => r.getLong(1) == doc0 + 1000000L && r.getLong(0) != doc0 &&
        r.getLong(0) != doc0 + 2000000L)
      .map(_.getLong(0)).toSet
    assert(partners.toSet == copyPartners)
  }

  test("simhash dup-group expansion: planted exact copies pair at hamming 0") {
    val base = Dedup.simhashPairs(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val withDups = docs
      .union(docs.limit(1).withColumn("doc_id", col("doc_id") + 1000000L))
    val expanded = Dedup.simhashPairs(withDups, 2).collect()
    val small = expanded.filter(r => r.getLong(0) < 1000000L && r.getLong(1) < 1000000L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(small == base)
    val doc0 = docs.limit(1).collect()(0).getLong(0)
    val intra = expanded.filter(r =>
      r.getLong(0) == doc0 && r.getLong(1) == doc0 + 1000000L)
    assert(intra.length == 1 && intra(0).getLong(2) == 0L)
  }

  test("duplicate clusters: transitive chain clusters as one where greedy over-keeps") {
    import spark.implicits._
    // chain fixture: 1~3 and 2~3 at j = 52/64 ≈ 0.81 ≥ 0.8; 1~2 at
    // j = 46/70 ≈ 0.66 < 0.8 (ends perturbed disjointly)
    val base = (1 to 60).map(i => s"w$i")
    val t3 = base.mkString(" ")
    val t1 = ((1 to 6).map(i => s"a$i") ++ base.drop(6)).mkString(" ")
    val t2 = (base.take(54) ++ (1 to 6).map(i => s"b$i")).mkString(" ")
    val chain = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(chain, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)), s"unexpected pair set $pairs")
    // connected components: one cluster labeled by its minimum id
    val clusters = Dedup.duplicateClusters(chain, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // greedy drops only doc_id2s {3}: doc 2 survives despite belonging to
    // cluster 1 through 3 — the conservative over-keep clusters fix
    val kept = Dedup.nearDedupCorpus(chain, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("duplicate clusters: fixpoint converges on a chain longer than the old 2^5 diameter cap") {
    import spark.implicits._
    // path graph 0-1-2-...-70: diameter 70 > 2^5 = 32, the coverage of the
    // pre-r5 fixed rounds=5 — which split this chain into ≥ 2 clusters and
    // failed the exact recursive-CTE oracle (ADVICE r4 item 3). Fixpoint
    // iteration must label every node with the component minimum 0.
    val chainPairs = (0L until 70L).map(i => (i, i + 1)).toDF("doc_id1", "doc_id2")
    val labels = Dedup.clustersFromPairs(chainPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 71 && labels.values.forall(_ == 0L),
      s"chain must converge to one cluster, got ${labels.values.toSet.size} labels")
    // and convergence is detected, not just cap-exhausted: a 3-node star
    // finishes in far fewer than maxRounds (smoke — would hang/waste if the
    // fixpoint test never fired; bounded by construction)
    val star = Seq((5L, 9L), (5L, 7L)).toDF("doc_id1", "doc_id2")
    val starLabels = Dedup.clustersFromPairs(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starLabels == Map(5L -> 5L, 7L -> 5L, 9L -> 5L))
  }

  test("contamination: planted benchmark n-gram is flagged with its exact collision count") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains TWO distinct benchmark 5-grams (positions 1 and 2)
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      // contains exactly ONE (the first five tokens), then diverges
      (2L, "alpha beta gamma delta epsilon unrelated tail here"),
      // shares tokens but no full 5-gram
      (3L, "alpha beta gamma something delta epsilon zeta-x filler filler")).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, n = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
    val clean = Dedup.decontaminate(corpus, bench, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L))
  }

  test("filter kappa: hand-computed 2x2 statistic, degenerate constant gates at 1.0") {
    import spark.implicits._
    // n11=2 n00=2 n10=1 n01=1, n=6: po=2/3, pc=pg=1/2, pe=1/2,
    // kappa=(2/3-1/2)/(1/2)=1/3 — quarters and thirds of exact counts
    val flags = Seq((true, true), (true, true), (false, false), (false, false),
      (true, false), (false, true)).toDF("c4_keep", "gopher_keep")
    val r = TextAnalysis.filterKappa(flags).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 2L &&
      r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(math.abs(r.getDouble(5) - 2.0 / 3) < 1e-15 &&
      r.getDouble(6) == 0.5 &&
      math.abs(r.getDouble(7) - 1.0 / 3) < 1e-15)
    // both gates constant-keep: pe = 1, kappa reports 1.0 by convention
    val const = Seq((true, true), (true, true)).toDF("c4_keep", "gopher_keep")
    assert(TextAnalysis.filterKappa(const).collect().head.getDouble(7) == 1.0)
  }

  test("bloom decontamination: no false negatives, composed ≡ exact, " +
    "probe is a pure projection (no Exchange)") {
    // (a) direct no-false-negative property: probing the BENCHMARK itself
    // flags every gram-bearing benchmark doc with hits == its distinct
    // gram count (each gram set its own bits during construction)
    val bench = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
    val bitmap = Dedup.bloomBitmap(bench)
    val selfProbe = Dedup.bloomCandidates(bench, bitmap)
      .select(col("doc_id"), col("n_bloom_hits"),
        size(Dedup.shingles(col("text"), 5)).cast("long").as("n_grams"))
    val gramBearing = bench.filter(size(Dedup.shingles(col("text"), 5)) > 0).count()
    assert(selfProbe.count() == gramBearing)
    assert(selfProbe.filter(col("n_bloom_hits") =!= col("n_grams")).count() == 0,
      "every benchmark gram must probe as a hit against its own bitmap")
    // (b) superset of the exact flags + composed ≡ exact on the real corpus
    val exact = Dedup.contamination(corpus, bench, n = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cand = Dedup.bloomCandidates(corpus, bitmap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.keySet.subsetOf(cand),
      s"bloom missed exact flags: ${exact.keySet -- cand}")
    val composed = Dedup.bloomContamination(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(composed == exact,
      "bloom-prefiltered exact verify must reproduce contamination() exactly")
    // (c) the scale claim: with the bitmap materialized (one parquet row,
    // the serving shape), the corpus probe plans with NO Exchange at all —
    // scan → broadcast BNLJ → projection → filter
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    bitmap.write.mode("overwrite").parquet(dir)
    val probe = Dedup.bloomCandidates(corpus, spark.read.parquet(dir))
    val plan = probe.queryExecution.executedPlan.toString
    // the 1-row BroadcastExchange of the bitmap is the intended (and only)
    // exchange; any SHUFFLE partitioning would mean the corpus moved
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition").foreach(sh =>
      assert(!plan.contains(sh),
        s"bloom probe must not shuffle the corpus stream ($sh):\n$plan"))
  }

  test("strip-dup-spans: shared runs excised from every carrier, uniques kept, " +
    "within-doc repetition and short docs untouched") {
    import spark.implicits._
    // k=3: docs 1 & 2 share the 4-token run "p q r s" (two overlapping
    // 3-grams — covered positions are the union of their windows); docs
    // 3 & 4 are exact duplicates (covered end to end — both come back
    // empty); doc 5 is shorter than k (no grams, untouched); doc 6
    // repeats a gram WITHIN itself only (one distinct doc_id — not
    // cross-document duplication, untouched).
    val fixture = Seq(
      (1L, "u1 u2 p q r s t1"),
      (2L, "v1 p q r s v2 v3"),
      (3L, "x y z w"),
      (4L, "x y z w"),
      (5L, "a b"),
      (6L, "m n o m n o m n o")).toDF("doc_id", "text")
    val r = Dedup.stripDupSpans(fixture, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(4))).toSeq
    assert(r == Seq(
      (1L, 7L, 4L, "u1 u2 t1"),
      (2L, 7L, 4L, "v1 v2 v3"),
      (3L, 4L, 4L, ""),
      (4L, 4L, 4L, ""),
      (5L, 2L, 0L, "a b"),
      (6L, 9L, 0L, "m n o m n o m n o")), s"got: $r")
    // dup_frac is the rational n_dropped / n_tokens
    val fracs = Dedup.stripDupSpans(fixture, k = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(fracs(1L) == 4.0 / 7 && fracs(3L) == 1.0 && fracs(5L) == 0.0)
    // non-vacuous on the real corpus: some spans removed, not everything
    val real = Dedup.stripDupSpans(docs, k = 8)
    val touched = real.filter(col("n_dropped") > 0).count()
    assert(touched > 0 && touched < docs.count(),
      s"span removal should touch some but not all docs (touched=$touched)")
  }

  test("decontaminate-spans: benchmark-overlapping positions excised, document " +
    "kept; whole-doc drop is the strictly lossier alternative") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      // one benchmark 5-gram mid-document: its 6-token cover is excised,
      // the original head/tail survive
      (1L, "head1 head2 alpha beta gamma delta epsilon tail1 tail2"),
      // no full 5-gram shared -> untouched
      (2L, "alpha beta gamma something delta epsilon zeta filler")).toDF("doc_id", "text")
    val r = Dedup.decontaminateSpans(corpus, bench, n = 5).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getString(4))).toSeq
    assert(r == Seq(
      (1L, 5L, "head1 head2 tail1 tail2"),
      (2L, 0L, "alpha beta gamma something delta epsilon zeta filler")), s"got: $r")
    // vs decontaminate: doc 1 is dropped whole there, kept (clean) here
    assert(Dedup.decontaminate(corpus, bench, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("strip-self-repetition: later occurrences of a repeated bigram excised, " +
    "first survives; cross-doc duplication out of scope") {
    import spark.implicits._
    val fixture = Seq(
      // "a b" repeats at positions 0 and 3: the second occurrence's cover
      // {3,4} is excised; "b c" at 1 survives as a first occurrence
      (1L, "a b c a b d"),
      // no repeated bigram -> untouched
      (2L, "p q r s"),
      // identical to doc 4 — but cross-doc duplication must NOT trigger
      (3L, "x y z w"),
      (4L, "x y z w")).toDF("doc_id", "text")
    val r = Dedup.stripSelfRepetition(fixture, k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getString(4))).toSeq
    assert(r == Seq(
      (1L, 2L, "a b c d"),
      (2L, 0L, "p q r s"),
      (3L, 0L, "x y z w"),
      (4L, 0L, "x y z w")), s"got: $r")
    // degenerate looping text collapses to its first period
    val loop = Seq((9L, "m n m n m n m n")).toDF("doc_id", "text")
    val lr = Dedup.stripSelfRepetition(loop, k = 2).head()
    assert(lr.getString(4) == "m n" && lr.getLong(2) == 6L, s"got: $lr")
  }

  test("incremental dedup: corpus side reads ONLY the signature index") {
    import spark.implicits._
    val indexPath = java.nio.file.Files.createTempDirectory("dedupidx").toString + "/idx"
    Dedup.buildDedupIndex(docs).write.parquet(indexPath)
    val index = spark.read.parquet(indexPath)
    // in-memory delta: an exact copy of a corpus doc, a near-dup of it
    // (last two tokens replaced), and a novel doc
    val src = docs.filter(size(split(col("text"), " ")) >= 45).orderBy("doc_id").head()
    val srcId = src.getAs[Long]("doc_id")
    val toks = src.getAs[String]("text").split(" ")
    val nearText = (toks.dropRight(2) :+ "zzz" :+ "qqq").mkString(" ")
    val delta = Seq((1000000L, src.getAs[String]("text")), (1000001L, nearText),
      (1000002L, (1 to 40).map(i => s"nov$i").mkString(" "))).toDF("doc_id", "text")
    val result = Dedup.dedupDelta(index, delta)
    // the plan's only file scan is the index — corpus text is never re-read
    val scans = result.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.nonEmpty && scans.forall(_.contains("idx")),
      s"corpus-side scans must hit only the index:\n${scans.mkString("\n")}")
    val rows = result.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.exists(r => r._1 == srcId && r._2 == 1000000L && r._3 == 1.0),
      "exact copy must match its corpus source at jaccard 1.0")
    assert(rows.exists(r => r._1 == srcId && r._2 == 1000001L && r._3 >= 0.8 && r._3 < 1.0),
      "near-dup must match via the banded index join")
    assert(!rows.exists(_._2 == 1000002L), "novel doc must not match")
  }

  test("shared shingle index: an index-fed jaccard run never rescans the corpus") {
    // the registry materializes ONE exploded shingle-hash index per corpus
    // snapshot and feeds q_hot_shingles / q_jaccard_pairs /
    // q_stoplist_pairs from it; with the index and members checkpointed,
    // the pair pipeline must not touch the documents table at all (the
    // q_dedup_incremental no-rescan template), and its output must equal
    // the self-contained operator exactly
    val docsT = Tables.documents(spark, sf)
    val members = Dedup.dupGroups(docsT).localCheckpoint()
    val idx = Dedup.shingleIndex(docsT, members).localCheckpoint()
    val fed = Dedup.jaccardPairs(docsT, 0.5, membersOpt = Some(members),
      indexOpt = Some(idx))
    val fedRows = fed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val scans = fed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.isEmpty,
      s"index-fed jaccard must not rescan the corpus:\n${scans.mkString("\n")}")
    val direct = Dedup.jaccardPairs(docsT, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fedRows.sameElements(direct), "index-fed output must equal the direct operator")
  }

  test("shingle index carries width provenance; a mismatched indexOpt throws (r8 ADVICE-4)") {
    import spark.implicits._
    val docsT = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    val members = Dedup.dupGroups(docsT).localCheckpoint()
    val idx3 = Dedup.shingleIndex(docsT, members, n = 3)
    // a width-4 call against a width-3 index used to return silently
    // wrong jaccard values; it must now refuse
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docsT, 0.5, n = 4, membersOpt = Some(members),
        indexOpt = Some(idx3))
    }
    assert(e.getMessage.contains("shingle width"))
    intercept[IllegalArgumentException] {
      Dedup.hotShingles(docsT, n = 4, indexOpt = Some(idx3))
    }
    // a frame with no provenance (hand-rolled 'h') is refused too
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docsT, 0.5, membersOpt = Some(members),
        indexOpt = Some(idx3.withColumn("h", col("h") + 0L)))
    }
    // provenance survives the durable path: parquet round-trip keeps the
    // column metadata, so a persisted index still validates
    val dir = java.nio.file.Files.createTempDirectory("shidx").toString
    idx3.write.mode("overwrite").parquet(s"$dir/idx")
    val reloaded = spark.read.parquet(s"$dir/idx")
    val viaParquet = Dedup.jaccardPairs(docsT, 0.5, membersOpt = Some(members),
      indexOpt = Some(reloaded)).collect()
    val direct3 = Dedup.jaccardPairs(docsT, 0.5, membersOpt = Some(members)).collect()
    assert(viaParquet.map(_.toSeq).toSeq == direct3.map(_.toSeq).toSeq)
  }

  test("incremental dedup with a stop-list: boilerplate matches vanish on both sides") {
    import spark.implicits._
    // the incremental mirror of the mine → strip → pair composition: the
    // index is built from post-strip sketches and the delta strips the
    // SAME mined list, so a crawl doc related to the corpus only through
    // template chrome stops matching — while true near-dups still do.
    val boiler = "all rights reserved worldwide inc"
    val corpus = ((0 until 10).map(i => (i.toLong, s"u$i $boiler")) :+
      ((100L, "quick brown fox jumps over lazy dog tonight"))).toDF("doc_id", "text")
    val stop = Dedup.stopListHashes(Dedup.hotShingles(corpus, topK = 3))
    val delta = Seq(
      (1000L, s"zz9 $boiler"), // shares ONLY boilerplate (jaccard 3/5 raw)
      (1001L, "quick brown fox jumps over lazy dog today")).toDF("doc_id", "text")
    // unstripped index: the boilerplate-only delta doc matches corpus docs
    val unstripped = Dedup.dedupDelta(Dedup.buildDedupIndex(corpus), delta, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(unstripped.count(_._2 == 1000L) >= 5,
      s"boilerplate relative must match most corpus docs unstripped, got ${unstripped.toSeq}")
    // stop-listed index + stop-listed delta: only the true near-dup remains
    val index = Dedup.buildDedupIndex(corpus, stopHashesOpt = Some(stop))
    val stripped = Dedup.dedupDelta(index, delta, threshold = 0.5,
      stopHashesOpt = Some(stop))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(stripped.toSeq == Seq((100L, 1001L)), s"got ${stripped.toSeq}")
  }

  test("collocations: an always-adjacent pair outscores a frequent-token pair; counts exact") {
    import spark.implicits._
    // "ice cream" occurs 5x and its tokens never occur apart; "the cat"
    // occurs 5x but "the" occurs 15x — PMI ratio must rank the genuine
    // collocation first even though tf_xy ties.
    val fixture = (0 until 5).map(i =>
      (i.toLong, "ice cream the cat the dog the end")).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(fixture, minCount = 5, k = 7).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    // N = 40 tokens; ice cream: 5*40/(5*5) = 8.0
    assert(r.head._1 == "ice cream", s"got ${r.toSeq}")
    assert(r.head._2 == 5L && r.head._3 == 5L && r.head._4 == 5L)
    assert(r.head._5 == 8.0)
    // "the cat": 5*40/(15*5) = 2.67 — present but ranked below
    assert(r.map(_._1).contains("the cat"))
    val theCat = r.find(_._1 == "the cat").get
    assert(theCat._3 == 15L && theCat._5 < r.head._5)
  }

  test("containment: a quoted subset is directed-contained at 1.0 where jaccard misses it") {
    import spark.implicits._
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val sub = "alpha beta gamma delta epsilon zeta eta theta" // contiguous prefix
    val fixture = Seq(
      (1L, sub),                                   // contained
      (2L, long),                                  // container
      (3L, sub),                                   // exact copy of 1
      (4L, "quick brown fox jumps over lazy dog")) // unrelated
      .toDF("doc_id", "text")
    // jaccard at 0.5 misses the subset: |S(sub)|=6, |S(long)|=18, j=6/18
    val j = Dedup.jaccardPairs(fixture, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(j.toSeq == Seq((1L, 3L, 1.0)), s"jaccard should only pair the exact copies: ${j.toSeq}")
    // containment at 0.9 finds it, DIRECTED — sub into long, never reversed
    val c = Dedup.containmentPairs(fixture, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val asSet = c.toSet
    assert(asSet((1L, 2L, 1.0)) && asSet((3L, 2L, 1.0)),
      s"both copies of the subset must be contained in the long doc: ${c.toSeq}")
    assert(!c.exists(p => p._1 == 2L), s"the container must never appear contained: ${c.toSeq}")
    // exact copies contain each other: both directions at 1.0
    assert(asSet((1L, 3L, 1.0)) && asSet((3L, 1L, 1.0)), s"intra-group both directions: ${c.toSeq}")
    assert(c.length == 4, s"exactly the four directed pairs: ${c.toSeq}")
  }

  test("gopher filter: each rule gates its planted violator, clean doc keeps") {
    import spark.implicits._
    // 60 tokens, all bigrams distinct, stopwords present, mean length ~4
    val clean = (Seq.tabulate(30)(i => s"word$i the").mkString(" "), 1L)
    val short = ("the cat is on the mat", 2L)                        // < 50 tokens
    val longToks = (Seq.fill(60)("incomprehensibilities").mkString(" "), 3L) // mean len > 10
    val repeaty = (("the end " * 30).trim, 4L)                       // dup bigrams
    val noStops = (Seq.fill(60)("widget gadget sprocket").mkString(" "), 5L) // no stopwords
    val fixture = Seq(clean, short, longToks, repeaty, noStops)
      .map { case (t, id) => (id, t) }.toDF("doc_id", "text")
    val r = TextAnalysis.gopherFilter(fixture).collect()
      .map(x => x.getLong(0) -> (x.getBoolean(5), x.getBoolean(6),
        x.getBoolean(7), x.getBoolean(8), x.getBoolean(9))).toMap
    assert(r(1L) == ((true, true, true, true, true)), s"clean doc keeps: ${r(1L)}")
    assert(!r(2L)._1 && !r(2L)._5, "short doc drops on the length rule")
    assert(!r(3L)._2 && !r(3L)._5, "oversized mean token length drops")
    assert(!r(4L)._3 && !r(4L)._5, "bigram-looping doc drops on the repetition rule")
    assert(!r(5L)._4 && !r(5L)._5, "stopword-free doc drops on the stop rule")
    // real corpus: the gate is NON-vacuous in both directions
    val real = TextAnalysis.gopherFilter(docs)
    assert(real.filter(col("keep")).count() > 0, "some real docs must keep")
    assert(real.filter(!col("keep")).count() > 0, "some real docs must drop")
  }

  test("scale-shape clean pipeline keeps a superset of the exact-cosine baseline") {
    // LSH band candidates are a subset of all pairs, so the scale-shape
    // semantic stage can only drop FEWER docs than the exact baseline —
    // survivors must contain the baseline's survivors, never lose one
    val full = SparkEntry.queries("q_pipeline_full_clean")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val scale = SparkEntry.queries("q_pipeline_scale_clean")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full.nonEmpty && full.subsetOf(scale),
      s"exact-baseline survivors must survive the LSH stage too: ${(full -- scale).take(5)}")
  }

  test("filter agreement: cells partition the corpus, planted disagreement lands off-diagonal") {
    import spark.implicits._
    val r = TextAnalysis.filterAgreement(docs).collect()
      .map(x => ((x.getBoolean(0), x.getBoolean(1)), x.getLong(2))).toMap
    assert(r.values.sum == docs.count(), "cells must partition the corpus")
    // a 25-token clean doc: C4 keeps (>= 20 tokens), Gopher drops (< 50)
    val disagree = (Seq.tabulate(12)(i => s"word$i the").mkString(" ") + " extra", 1L)
    val fx = Seq(disagree).map { case (t, id) => (id, t) }.toDF("doc_id", "text")
    val cell = TextAnalysis.filterAgreement(fx).collect()
      .map(x => ((x.getBoolean(0), x.getBoolean(1)), x.getLong(2))).toMap
    assert(cell == Map((true, false) -> 1L),
      s"C4-keep/Gopher-drop must land in the off-diagonal cell: $cell")
  }

  test("vocab coverage: planted OOV counted exactly, in-vocab doc at zero, corpus conserves") {
    import spark.implicits._
    // vocab k=2 over this corpus is {a, b} (tf 4, 3); doc 3 mixes 2 OOV of 4
    val fixture = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "a zz b qq"), (4L, "xx yy")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(fixture, k = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 0L, 0.0)) && r(2L) == ((2L, 0L, 0.0)))
    assert(r(3L) == ((4L, 2L, 0.5)), s"doc 3 half OOV: ${r(3L)}")
    assert(r(4L) == ((2L, 2L, 1.0)), s"doc 4 fully OOV: ${r(4L)}")
    // real corpus: token totals conserve and rates are proper fractions
    val real = TextAnalysis.vocabCoverage(docs).cache()
    assert(real.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
    val totalToks = docs.select(explode(split(col("text"), " "))).count()
    assert(real.agg(sum("n_tokens")).head.getLong(0) == totalToks)
    real.unpersist()
  }

  test("approx top-k bound: exact regime witnesses, eviction regime still finds the heavy hitter") {
    import spark.implicits._
    // real corpus: vocab (~31 tokens) far under maxItems -> sketch exact,
    // in_regime = 1 and every contract column at its literal
    val r = TextAnalysis.approxTopTokensBound(docs).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getInt(2), x.getLong(3), x.getInt(4)))
    assert(r.length == 10)
    assert(r.forall(x => x._3 == 1 && x._4 == 0L && x._5 == 1),
      s"exact-regime sketch must sit inside the bound: ${r.toSeq}")
    // membership/order equals the exact vocabulary top-k
    val exact = TextAnalysis.vocabulary(docs, k = 10).collect().map(_.getString(0)).toSeq
    assert(r.map(_._1).toSeq == exact, "bound frame must carry the exact top-k in its order")
    // eviction regime: 5000 distinct rare tokens vs maxItems=64 — the
    // sketch CANNOT track the tail, but the frequent-items guarantee
    // (err <= ~3.5N/maxMapSize) must still surface the planted heavy
    // hitter with a usable estimate. gateToRegime = false keeps the hard
    // assertion live out of regime (the r10 ADVICE-3 gate would
    // otherwise render it vacuous here — which the LAST assert checks)
    val heavy = (1 to 1000).map(i => (i.toLong, "heavyhitter"))
    val tail = (1 to 5000).map(i => ((i + 10000).toLong, s"rare$i"))
    val planted = (heavy ++ tail).toDF("doc_id", "text")
    val b = TextAnalysis.approxTopTokensBound(planted, k = 1, estK = 64,
      maxItems = 64, relErr = 0.5, gateToRegime = false).collect()
    assert(b.length == 1 && b.head.getString(0) == "heavyhitter")
    assert(b.head.getInt(2) == 0, "5001 distinct tokens vs 64 slots is out of regime")
    assert(b.head.getInt(4) == 1,
      s"the 1000/6000 heavy hitter must survive 64-slot eviction within 50%: ${b.head}")
    // the gated (oracle-surface) form is vacuous-by-construction out of
    // regime: literals pinned regardless of estimator drift
    val g = TextAnalysis.approxTopTokensBound(planted, k = 1, estK = 64,
      maxItems = 64, relErr = 0.5).collect()
    assert(g.head.getInt(2) == 0 && g.head.getLong(3) == 0L && g.head.getInt(4) == 1,
      s"out-of-regime gated contract must pin its literals: ${g.head}")
  }

  test("lm fluency: frequent transitions outscore rare ones; degenerate text maxes out") {
    import spark.implicits._
    // corpus: "a b" transition dominates a's history (3 of 4); "a c" is rare
    val fixture = Seq(
      (1L, "a b a b a b"),  // P(b|a)=3/4 at every a-position; P(a|b)=2/2=1
      (2L, "a c"),          // P(c|a)=1/4 — the rare transition
      (3L, "x")             // single token: no bigrams, must drop out
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lmFluency(fixture).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1L, 2L), "tokenless-of-bigrams doc 3 drops out")
    val d1 = r(0); val d2 = r(1)
    // doc1: positions a->b (3/4), b->a (1), a->b, b->a, a->b = (3·0.75 + 2·1)/5
    assert(d1._2 == 5L && math.abs(d1._3 - (3 * 0.75 + 2 * 1.0) / 5) < 1e-12,
      s"hand-computed doc1 fluency: $d1")
    assert(d2._2 == 1L && math.abs(d2._3 - 0.25) < 1e-12, s"doc2 is the rare transition: $d2")
    assert(d1._3 > d2._3, "frequent transitions must outscore rare ones")
    // a self-looping degenerate doc scores a perfect 1.0 under its own MLE
    val loop = TextAnalysis.lmFluency(Seq((9L, "z z z z z")).toDF("doc_id", "text"))
      .collect().head
    assert(loop.getDouble(2) == 1.0, "single-transition text is its own perfect LM")
    // real corpus: scores are proper probabilities means, and they spread
    val real = TextAnalysis.lmFluency(docs)
    assert(real.filter(col("fluency") <= 0 || col("fluency") > 1).count() == 0)
    assert(real.select(countDistinct(col("fluency"))).head.getLong(0) > 10,
      "the signal must actually spread over the corpus")
  }

  test("ccnet buckets: per-lang terciles cut by fluency, fluent docs head, short docs drop") {
    import spark.implicits._
    // lang en: transitions of "a b" are frozen-model-frequent; "a c" rare;
    // "p q" is fully OOV so it scores 0.0 and must land in the tail
    val model = {
      val dir = java.nio.file.Files.createTempDirectory("ccnetlm").toString
      TextAnalysis.persistLmModel(
        Seq((100L, "a b a b a b"), (101L, "a c")).toDF("doc_id", "text"), dir, "spec")
      TextAnalysis.loadLmModel(spark, dir)
    }
    val fixture = Seq(
      (1L, "a b a b", "en"),   // high: every transition is the dominant one
      (2L, "a b a c", "en"),   // middle: mixes dominant and rare
      (3L, "p q p q", "en"),   // OOV: fluency 0.0 -> tail
      (4L, "a b", "de"),       // other language: its own independent cut
      (5L, "a c", "de"),
      (6L, "p q", "de"),
      (7L, "x", "en")          // single token: no bigrams, drops out
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.ccnetBuckets(
      TextAnalysis.lmFluencyFrom(model, fixture), fixture).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(3))).sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L),
      s"bigramless doc 7 must drop out: ${r.toSeq}")
    // 3 docs per lang -> exactly one per tercile, ordered by fluency
    assert(r.filter(_._2 == "en").map(_._3).toSeq == Seq("head", "middle", "tail"),
      s"en terciles must follow fluency order: ${r.toSeq}")
    assert(r.filter(_._2 == "de").map(_._3).toSeq == Seq("head", "middle", "tail"),
      s"de cut must be independent of en: ${r.toSeq}")
    // real corpus: every scored doc gets a bucket and each lang sees all
    // three buckets (500 docs across few langs -> every tercile non-empty)
    val realModel = lmModelOf(docs)
    val real = TextAnalysis.ccnetBuckets(
      TextAnalysis.lmFluencyFrom(realModel, docs), docs)
    val perLang = real.groupBy("lang")
      .agg(countDistinct(col("bucket")).as("n_buckets")).collect()
    assert(perLang.nonEmpty && perLang.forall(_.getLong(1) == 3L),
      s"every language must see head/middle/tail: ${perLang.toSeq}")
  }

  private def lmModelOf(frame: org.apache.spark.sql.DataFrame): TextAnalysis.LmModel = {
    val dir = java.nio.file.Files.createTempDirectory("ccnetlmreal").toString
    TextAnalysis.persistLmModel(frame, dir, "spec")
    TextAnalysis.loadLmModel(spark, dir)
  }

  test("cluster-size histogram: sizes exact on planted components, mass conserves") {
    import spark.implicits._
    // components: {1,2} and {3,4,5} (chain, not clique — propagation closes it)
    val pairs = Seq((1L, 2L), (3L, 4L), (4L, 5L)).toDF("doc_id1", "doc_id2")
    val clusters = Dedup.clustersFromPairs(pairs)
    val h = Dedup.clusterSizeHistogram(clusters).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(h.toSeq == Seq((2L, 1L), (3L, 1L)), s"planted histogram: ${h.toSeq}")
    // real corpus via the registry (persisted cluster assignment): the
    // duplicated mass seen by the histogram is exactly the labeled docs
    val reg = SparkEntry.queries("q_cluster_sizes")(spark, sf)
    val mass = reg.select(sum(col("cluster_size") * col("n_clusters"))).head.getLong(0)
    val labeled = SparkEntry.queries("q_dup_clusters")(spark, sf).count()
    assert(mass == labeled, s"sum(size*count)=$mass must equal labeled docs=$labeled")
    assert(reg.filter(col("cluster_size") < 2).count() == 0,
      "singletons are absent by construction")
  }

  test("phrase search: token-boundary exact, scattered grams rejected, copies expanded") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "x a b c y"),          // contains the phrase mid-document
      (2L, "a b c"),              // IS the phrase
      (3L, "xa b c y z"),         // substring trap: ' a b c' inside 'xa b c'
      (4L, "a b x b c y a c"),    // shares tokens, never the consecutive run
      (5L, "x a b c y"),          // exact duplicate of 1 — members expansion
      (6L, "q r s t u")           // unrelated
    ).toDF("doc_id", "text")
    val members = Dedup.dupGroups(fixture)
    val index = Dedup.shingleIndex(fixture, members)
    val phrase = Seq("a b c").toDF("phrase")
    val r = Dedup.phraseSearch(fixture, phrase, members, index).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "a b c"), (2L, "a b c"), (5L, "a b c")),
      s"matches, copies, and only those: ${r.toSeq}")
    // a longer phrase whose k grams a doc carries SCATTERED must verify out:
    // doc 7 has grams "a b a" and "b a c" but never the run "a b a c"
    val long = Seq((7L, "b a c x a b a"), (8L, "y a b a c z"))
      .toDF("doc_id", "text")
    val lm = Dedup.dupGroups(long)
    val li = Dedup.shingleIndex(long, lm)
    val r2 = Dedup.phraseSearch(long, Seq("a b a c").toDF("phrase"), lm, li)
      .collect().map(_.getLong(0))
    assert(r2.toSeq == Seq(8L),
      s"all-grams-present-but-scattered must be rejected by the verify: ${r2.toSeq}")
    // registry: the hottest-shingle probe is non-vacuous on the real corpus
    val reg = SparkEntry.queries("q_phrase_search")(spark, sf)
    assert(reg.count() >= 2, "the top shingle has df >= 2 by construction")
  }

  test("phrase search broadcast gate: over-cap candidate expansion drops the hint, results identical") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, BROADCAST}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    // ADVERSARIAL duplication (r17 ADVICE): the phrase lives inside a
    // 64-copy boilerplate cluster, so the rep-level candidate set is 1
    // but the members expansion is 64 — the unbounded-broadcast scenario
    // the gate exists for.
    val fixture = ((1 to 64).map(i => (i.toLong, "x a b c y")) ++
      Seq((100L, "a b c z w"), (101L, "q r s t u"))).toDF("doc_id", "text")
    val members = Dedup.dupGroups(fixture)
    val index = Dedup.shingleIndex(fixture, members)
    val phrase = Seq("a b c").toDF("phrase")
    def semiBroadcastHinted(df: org.apache.spark.sql.DataFrame): Seq[Boolean] =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi =>
          j.hint.rightHint.exists(_.strategy.contains(BROADCAST))
      }
    val hinted = Dedup.phraseSearch(fixture, phrase, members, index)
    val fallback = Dedup.phraseSearch(fixture, phrase, members, index,
      maxBroadcastCandidates = 8)
    // under the cap the documents semi-join's right side is the collected
    // broadcast local relation; over it the gate drops the hint
    assert(semiBroadcastHinted(hinted).contains(true),
      s"in-cap candidates must broadcast into the semi: ${semiBroadcastHinted(hinted)}")
    assert(!semiBroadcastHinted(fallback).contains(true),
      s"over-cap expansion must drop the broadcast hint: ${semiBroadcastHinted(fallback)}")
    val a = hinted.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = fallback.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(a == b, s"results are hint-independent: $a vs $b")
    assert(a.map(_._1) == ((1L to 64L) :+ 100L),
      s"all 64 copies and the distinct carrier match: ${a.map(_._1)}")
  }

  test("fuzzy decontamination: edited benchmark copies flagged, single-gram overlap is not") {
    import spark.implicits._
    // bench doc; corpus holds a lightly-edited copy (fuzzy-grade), a doc
    // sharing one 5-gram run (exact-gram-grade but NOT similar), and noise
    val bench = Seq((11L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f g h i j k zz"),          // edited copy: high jaccard
      (2L, "a b c d e q r s t u v w x y z aa"),  // shares a run, dissimilar
      (3L, "m n o p q r s t")                    // unrelated
    ).toDF("doc_id", "text")
    val fuzzy = Dedup.dedupDelta(Dedup.buildDedupIndex(bench), corpus,
      threshold = 0.5, bands = 64)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(fuzzy.map(_._1).toSeq == Seq(1L),
      s"only the edited copy reaches jaccard 0.5: ${fuzzy.toSeq}")
    assert(fuzzy.head._2 >= 0.5 && fuzzy.head._2 < 1.0, s"near, not exact: ${fuzzy.toSeq}")
    // the exact-gram pass DOES flag doc 2 — the two operators answer
    // different questions, which is why a curation run needs both
    val gram = Dedup.contamination(corpus, bench, 5).collect().map(_.getLong(0))
    assert(gram.contains(2L), s"5-gram decontamination must flag the shared run: ${gram.toSeq}")
    // registry: non-vacuous on the real corpus
    assert(SparkEntry.queries("q_fuzzy_contamination")(spark, sf).count() > 0)
  }

  test("lang confusion matrix conserves the corpus and matches the per-doc frame") {
    val m = SparkEntry.queries("q_lang_confusion")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(m.map(_._2).sum == docs.count(), "cells must partition the corpus")
    val fromFrame = TextAnalysis.languageId(docs)
      .groupBy("declared_lang", "predicted_lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m.toMap == fromFrame, "matrix must equal the per-doc frame's cross-tab")
  }

  test("hybrid search: rerank permutes the lexical candidates by cosine, never invents") {
    val hybrid = SparkEntry.queries("q_hybrid_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(hybrid.length == 10, s"k=10 after rerank: ${hybrid.length}")
    // ordered by cosine DESC (doc_id tie-break), all cosines in [-1, 1]
    assert(hybrid.sliding(2).forall(p => p(0)._3 >= p(1)._3),
      s"rerank order must be cosine-desc: ${hybrid.toSeq}")
    assert(hybrid.forall(x => x._3 >= -1.0 - 1e-9 && x._3 <= 1.0 + 1e-9))
    // every hybrid hit is one of the lexical top-20 (recall stage bounds
    // the candidate set; the vector stage may only reorder and truncate)
    val lex20 = graft.operators.TextAnalysis.keywordSearch(
      spark.read.parquet(s"$sf/documents.parquet"),
      Seq("hash", "join", "vector"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(hybrid.forall(h => lex20.contains(h._1)),
      "hybrid results must come from the lexical candidates")
    // BM25 scores pass through the rerank unchanged
    assert(hybrid.forall(h => lex20(h._1) == h._2),
      "lexical scores must survive the rerank bit-for-bit")
    // the rerank is not vacuous: hybrid's cosine order differs from the
    // candidates' lexical order (else the stage proved nothing)
    val lexOrder = lex20.toSeq.sortBy { case (id, sc) => (-sc, id) }
      .take(10).map(_._1)
    assert(hybrid.map(_._1).toSeq != lexOrder,
      "cosine rerank must actually permute the lexical ranking")
  }

  test("curation funnel: counts monotone per stage, ends at the scale pipeline") {
    val f = SparkEntry.queries("q_curation_funnel")(spark, sf).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    assert(f.map(_._2).toSeq == Seq("corpus", "quality", "decontaminated",
      "pii_scrub", "lexical_dedup", "semantic_dedup"), s"stage order: ${f.toSeq}")
    // survivor rows stay monotone; the scrub row is a zero-attrition
    // AUDIT count (PII-affected docs among its input survivors), so it
    // sits out the monotonicity chain but is bounded by its input stage
    val surv = f.filter(_._2 != "pii_scrub")
    assert(surv.sliding(2).forall(w => w(0)._3 >= w(1)._3),
      s"each attrition stage can only shrink the corpus: ${f.toSeq}")
    val scrubRow = f.find(_._2 == "pii_scrub").get
    val decon = f.find(_._2 == "decontaminated").get
    assert(scrubRow._3 <= decon._3 && scrubRow._3 > 0,
      s"scrub audit count must be a nonzero subset of its input: ${f.toSeq}")
    assert(surv.head._3 > surv.last._3 && surv.last._3 > 0,
      s"the funnel must be non-vacuous both ways: ${f.toSeq}")
    // the final stage IS the scale pipeline's survivor set
    val fin = SparkEntry.queries("q_pipeline_scale_clean")(spark, sf).count()
    assert(surv.last._3 == fin, s"funnel end ${surv.last._3} != pipeline $fin")
    // consistency with the shipped scrub artifacts: the funnel's scrub
    // row counts exactly q_pipeline_scrubbed's PII-affected survivors
    // (same quality+decon survivor set), and is bounded by q_pii_rate's
    // whole-corpus affected total
    val scrubbedPii = SparkEntry.queries("q_pipeline_scrubbed")(spark, sf)
      .filter(col("n_pii") > 0).count()
    assert(scrubRow._3 == scrubbedPii,
      s"funnel scrub row ${scrubRow._3} != pipeline_scrubbed $scrubbedPii")
    val rateTotal = SparkEntry.queries("q_pii_rate")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_pii_docs")).head().getLong(0)
    assert(scrubRow._3 <= rateTotal,
      s"restricted scrub count ${scrubRow._3} cannot exceed corpus total $rateTotal")
  }

  test("quality calibration: conserves the bucketed corpus and matches the standalone gates") {
    val cal = SparkEntry.queries("q_quality_calibration")(spark, sf).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5))).toMap
    assert(cal.keySet == Set("head", "middle", "tail"))
    // bucket totals conserve the scored corpus (docs with >= 1 bigram)
    val scored = SparkEntry.queries("q_ccnet_buckets")(spark, sf).count()
    assert(cal.values.map(_._1).sum == scored)
    // keep counts equal an independent recount from the standalone gates
    val buckets = SparkEntry.queries("q_ccnet_buckets")(spark, sf)
      .select(col("doc_id"), col("bucket"))
    val c4 = SparkEntry.queries("q_quality_filter")(spark, sf)
      .select(col("doc_id"), col("keep").as("c4"))
    val expect = buckets.join(c4, Seq("doc_id")).filter(col("c4"))
      .groupBy("bucket").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    cal.foreach { case (b, (n, nC4, nGp, rC4, rGp)) =>
      assert(nC4 == expect.getOrElse(b, 0L), s"bucket $b c4 recount")
      assert(rC4 == nC4.toDouble / n && rGp == nGp.toDouble / n,
        s"bucket $b rates must be the one-divide exact doubles")
      assert(nC4 <= n && nGp <= n)
    }
  }
}

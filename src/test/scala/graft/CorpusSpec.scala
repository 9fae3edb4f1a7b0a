package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, TextAnalysis}

/** Specs for corpus-construction operators (stratified sampling, sequence
  * packing) and the repetition/quality-filter text signals.
  */
class CorpusSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("stratified sample: deterministic, subset, rates approximately honored") {
    val s1 = Corpus.stratifiedSample(docs).collect().map(_.getLong(0)).toSet
    val s2 = Corpus.stratifiedSample(docs).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must be reproducible")
    val all = docs.count().toDouble
    assert(s1.nonEmpty && s1.size < all)
    // en rate 50%: kept fraction within a loose tolerance of the target
    val enAll = docs.filter(col("lang") === "en").count().toDouble
    val enKept = Corpus.stratifiedSample(docs)
      .filter(col("lang") === "en").count().toDouble
    assert(math.abs(enKept / enAll - 0.5) < 0.15,
      s"en keep rate ${enKept / enAll} far from 0.5")
    // unknown stratum -> dropped entirely
    val zeroed = Corpus.stratifiedSample(docs, Map("xx" -> 100))
    assert(zeroed.count() == 0)
  }

  test("pack sequences: contiguous monotone packs that fill the token budget per (lang, shard)") {
    val budget = 512
    val rows = Corpus.packSequences(docs, budget).collect()
      .map(r => ((r.getString(1), r.getLong(2)), r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1._2).distinct.length > 1, "multiple shards must exist")
    rows.groupBy(_._1).foreach { case ((_, shard), g) =>
      // shard assignment is the documented modular rule
      g.foreach { case (_, docId, _, _) => assert(docId % 8 == shard) }
      val sorted = g.sortBy(_._2)
      // pack_id recomputes from the exclusive running token count IN-SHARD
      var cum = 0L
      sorted.foreach { case (_, _, n, pack) =>
        assert(pack == cum / budget)
        cum += n
      }
      // monotone, contiguous from 0
      val packs = sorted.map(_._4)
      assert(packs.head == 0L)
      assert(packs.zip(packs.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }

  test("pack halves: a doc_id-level keep set applied to the narrow " +
    "packTokenCounts projection packs identically to restricting the documents") {
    // q_mix_packing's r17 shape: the semi-join moves to the four-scalar
    // projection, so the stratum exchange never carries the text payload.
    val keeps = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val restrictedDocs =
      rows(Corpus.packSequences(docs.join(keeps, Seq("doc_id"), "left_semi")))
    val restrictedCounts = rows(Corpus.packFromCounts(
      Corpus.packTokenCounts(docs).join(keeps, Seq("doc_id"), "left_semi")))
    assert(restrictedCounts == restrictedDocs)
    assert(restrictedDocs.nonEmpty)
  }

  test("token-budget mix: greedy hash-order cut lands within one doc of each " +
    "stratum's share; planted fixture exact") {
    import spark.implicits._
    // single lang, shards=1 -> one stratum; ids small enough that the
    // portable-hash order (id * 2654435761) is id order, so the greedy
    // cut is hand-checkable: cum_before 0, 4, 8 kept (< 10), 12 dropped
    val fixture = Seq(
      (1L, "en", "a b c d"), (2L, "en", "e f g h"),
      (3L, "en", "i j k l"), (4L, "en", "m n o p"))
      .toDF("doc_id", "lang", "text")
    val got = Corpus.tokenBudgetMix(fixture, Map("en" -> 10L), shards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L), (2L, 4L), (3L, 8L)), s"got: $got")
    // real corpus: every (lang, shard) stratum's kept tokens stay under
    // share + its own last doc (greedy overshoot bound), and the mix is a
    // strict subset with every language represented
    val mix = Corpus.tokenBudgetMix(docs)
    assert(mix.count() > 0 && mix.count() < docs.count())
    val langs = mix.select("lang").distinct().count()
    assert(langs == docs.select("lang").distinct().count(), "no language starved")
    val share = Corpus.DefaultTokenBudgets.map { case (k, v) => k -> v / 8 }
    mix.groupBy("lang", "shard")
      .agg(sum("n_tokens").as("kept"), max("n_tokens").as("biggest"))
      .collect().foreach { r =>
        val cap = share(r.getString(0))
        assert(r.getLong(2) < cap + r.getLong(3),
          s"stratum ${r.getString(0)}/${r.getLong(1)} kept ${r.getLong(2)} " +
            s"beyond share $cap + one doc")
      }
  }

  test("snapshot diff: every status classified exactly, char deltas signed, " +
    "changed-source docs report the new catalog") {
    import spark.implicits._
    val old = Seq(
      (1L, "s0", "same text"),          // unchanged
      (2L, "s0", "old body"),           // modified (text changes)
      (3L, "s1", "goes away"),          // removed
      (5L, "s1", "relabeled")           // source changes, text same →
                                        //   unchanged, reported under s2
    ).toDF("doc_id", "source", "text")
    val neu = Seq(
      (1L, "s0", "same text"),
      (2L, "s0", "new longer body"),
      (4L, "s1", "brand new"),          // added
      (5L, "s2", "relabeled")
    ).toDF("doc_id", "source", "text")
    val got = Corpus.snapshotDiff(old, neu).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      ("s0", "unchanged") -> (1L, 0L),
      ("s0", "modified") -> (1L, "new longer body".length.toLong - "old body".length),
      ("s1", "removed") -> (1L, -"goes away".length.toLong),
      ("s1", "added") -> (1L, "brand new".length.toLong),
      ("s2", "unchanged") -> (1L, 0L)))
  }

  test("drift card: hand-computed total variation per dimension, vanished " +
    "and new keys both counted, identical snapshots at zero") {
    import spark.implicits._
    // shares chosen exactly representable in binary (quarters), so the
    // expected TVs are exact doubles: lang en 2/4→3/4 (TV .25); source
    // s1 vanishes and s2 appears, each 1/4 (TV .25); all texts in one
    // length bucket both sides (TV 0)
    val old = Seq(
      (1L, "en", "s0", "aa"), (2L, "en", "s0", "bb"),
      (3L, "de", "s0", "cc"), (4L, "de", "s1", "dd"))
      .toDF("doc_id", "lang", "source", "text")
    val neu = Seq(
      (1L, "en", "s0", "aa"), (2L, "en", "s0", "bb"),
      (3L, "en", "s0", "cc"), (4L, "de", "s2", "dd"))
      .toDF("doc_id", "lang", "source", "text")
    val got = Corpus.driftCard(old, neu).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == Map(
      "lang" -> (0.25, 2L),
      "source" -> (0.25, 3L),     // s0, s1 (vanished), s2 (new)
      "len_bucket" -> (0.0, 1L)))
    val same = Corpus.driftCard(old, old).collect()
      .map(r => r.getDouble(1))
    assert(same.forall(_ == 0.0), "identical snapshots must show zero drift")
  }

  test("in-context packing: identical docs co-locate despite interleaved ids, " +
    "budget accounting matches packSequences' discipline") {
    import spark.implicits._
    // 6 docs, one (lang, shard=doc_id%8... use shards=1) stratum: docs
    // 1/3/5 share identical text (same tower, same bucket) interleaved
    // with three distinct fillers — bucket order must make the twins
    // CONTIGUOUS, so with budget 2·len they land in one pack together
    val twin = "alpha beta gamma delta"
    val docs = Seq(
      (1L, "en", twin), (2L, "en", "one filler text here"),
      (3L, "en", twin), (4L, "en", "another unrelated body"),
      (5L, "en", twin), (6L, "en", "third different filler"))
      .toDF("doc_id", "lang", "text")
    val packed = Corpus.inContextPack(docs, budget = 12, shards = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    val twinRows = Seq(1L, 3L, 5L).map(packed)
    assert(twinRows.map(_._1).distinct.size == 1,
      "identical texts must share a bucket")
    // the guarantee is CONTIGUITY in the packing order — the twins are
    // consecutive in (bucket, doc_id), no filler interleaves them (which
    // doc_id order, their ids being 1/3/5, could never provide)
    val orderedIds = Corpus.inContextPack(docs, budget = 12, shards = 1)
      .orderBy("bucket", "doc_id").collect().map(_.getLong(0)).toSeq
    val twinPos = Seq(1L, 3L, 5L).map(orderedIds.indexOf)
    assert(twinPos.max - twinPos.min == 2,
      s"twins must be consecutive in packing order: $orderedIds")
    // budget discipline: within the stratum ordered by (bucket, doc_id),
    // pack_id = floor(exclusive prefix / budget) — recompute by hand
    val ordered = Corpus.inContextPack(docs, budget = 12, shards = 1)
      .orderBy("bucket", "doc_id")
      .collect().map(r => (r.getLong(3), r.getLong(5)))
    var cum = 0L
    ordered.foreach { case (n, packId) =>
      assert(packId == cum / 12, s"pack accounting drifted at cum=$cum")
      cum += n
    }
  }

  test("source overlap df-cap: the pair stream stays FLAT when a boilerplate " +
    "gram saturates the catalog (r14 verdict 2)") {
    import spark.implicits._
    // 12-source catalog: one private 5-gram each, plus ONE gram shared by
    // exactly (s0, s1) — each text is 5 tokens, i.e. exactly one 5-gram
    val base = (0 until 12).map(i => (i.toLong, s"p$i a b c d", s"s$i")) ++
      Seq((100L, "shared x y z w", "s0"), (101L, "shared x y z w", "s1"))
    val df = base.toDF("doc_id", "text", "source")
    val capped = Corpus.sourceOverlapPairStream(df, 5, Some(2)).count()
    assert(capped == 1L, s"base: one exclusively-shared pair, got $capped")
    // the boilerplate event: the SAME gram lands in EVERY source
    val boiler = (0 until 12).map(i => (200L + i, "boiler q r t u", s"s$i"))
    val df2 = (base ++ boiler).toDF("doc_id", "text", "source")
    assert(Corpus.sourceOverlapPairStream(df2, 5, Some(2)).count() == capped,
      "a catalog-saturating gram must add ZERO pair rows under the cap")
    // uncapped, that one gram alone costs |catalog|·(|catalog|−1)/2 rows
    assert(Corpus.sourceOverlapPairStream(df2, 5, None).count() == capped + 66,
      "uncapped, the saturating gram must cost C(12,2) pair rows")
    // the capped matrix stays a self-consistent exact answer over the
    // capped universe: the (s0,s1) cell counts only the exclusive gram
    // and its totals exclude the boilerplate
    val m = Corpus.sourceOverlap(df2, dfCap = Some(2))
      .filter(col("source_a") === "s0" && col("source_b") === "s1")
      .collect().head
    assert(m.getAs[Long]("n_shared") == 1L)
    assert(m.getAs[Long]("n_grams_a") == 2L && m.getAs[Long]("n_grams_b") == 2L)
    val u = Corpus.sourceOverlap(df2)
      .filter(col("source_a") === "s0" && col("source_b") === "s1")
      .collect().head
    assert(u.getAs[Long]("n_shared") == 2L && u.getAs[Long]("n_grams_a") == 3L)
    // matrix completeness: full catalog pairs either way
    assert(Corpus.sourceOverlap(df2, dfCap = Some(2)).count() == 66L)
  }

  test("leakage-safe split: planted cluster members co-locate; unclustered " +
    "docs keep dataSplit's assignment") {
    import spark.implicits._
    val dd = (1L to 10L).map(i => (i, s"text $i", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("doc_id", "cluster_id")
    val sp = Corpus.leakageSafeSplit(dd, clusters).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    assert((1L to 4L).map(sp(_)).toSet.size == 1,
      s"cluster members must share one (key, split): $sp")
    assert((1L to 4L).forall(sp(_)._1 == 1L))
    val plain = Corpus.dataSplit(dd).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert((5L to 10L).forall(i => sp(i) == ((i, plain(i)))),
      "unclustered docs must keep the doc_id-keyed assignment")
  }

  test("safe split audit: zero cross-split pairs on the cluster-keyed split " +
    "while the doc_id split measurably leaks (non-vacuous both ways)") {
    val r = SparkEntry.queries("q_safe_split_audit")(spark, sf).head()
    assert(r.getAs[Long]("n_near_dup_pairs") > 0L)
    assert(r.getAs[Long]("n_cluster_keyed_docs") > 0L)
    assert(r.getAs[Long]("n_cross_docid_split") > 0L,
      "the doc_id split must leak at the test SF, else the fix is vacuous")
    assert(r.getAs[Long]("n_cross_safe_split") == 0L,
      "a verified pair's endpoints share a component, hence a split key")
  }

  test("corpus stats: per-language report is internally consistent and complete") {
    val r = Corpus.corpusStats(docs).collect()
    assert(r.map(_.getLong(1)).sum == docs.count(), "doc counts partition the corpus")
    r.foreach { row =>
      val (nDocs, total, avg) = (row.getLong(1), row.getLong(2), row.getDouble(4))
      assert(math.abs(avg - total.toDouble / nDocs) < 1e-9)
      assert(row.getLong(3) >= 1) // every stratum has at least one source
    }
  }

  test("repetition: bounded in [0,1), high for looping text, low for diverse text") {
    import spark.implicits._
    val r = TextAnalysis.repetition(docs).collect()
    assert(r.forall(x => x.getDouble(3) >= 0.0 && x.getDouble(3) < 1.0))
    val planted = Seq(
      (1L, Array.fill(30)("spam ham").mkString(" ")),   // 2 distinct 3-grams
      (2L, (1 to 60).map(i => s"tok$i").mkString(" "))) // all distinct
      .toDF("doc_id", "text")
    val p = TextAnalysis.repetition(planted).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(p(1L) > 0.9)
    assert(p(2L) == 0.0)
  }

  test("quality filter: keep is exactly the conjunction of its rule flags") {
    val r = TextAnalysis.qualityFilter(docs).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val expected = x.getBoolean(4) && x.getBoolean(5) && x.getBoolean(6)
      assert(x.getBoolean(7) == expected)
    }
    // rules are live: at least one doc on each side at these thresholds
    assert(r.exists(_.getBoolean(7)))
  }

  test("quality histogram: zero-filled, complete, and conserves the corpus") {
    val h = TextAnalysis.qualityHistogram(docs, buckets = 20).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(h.map(_._1).toSeq == (0 until 20), "every bucket must be emitted, in order")
    assert(h.map(_._2).sum == docs.count(), "bucket counts must conserve the corpus")
    assert(h.exists(_._2 == 0L), "the testdata quality range leaves empty buckets — " +
      "they must appear as zero rows, not vanish")
    // identical docs land in exactly one bucket
    import spark.implicits._
    val same = Seq.tabulate(7)(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val oneBucket = TextAnalysis.qualityHistogram(same, buckets = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1))).filter(_._2 > 0)
    assert(oneBucket.length == 1 && oneBucket.head._2 == 7L,
      s"identical docs must share one bucket: ${oneBucket.toSeq}")
  }

  test("chunking: budget respected, overlap stitched, short docs single-chunk") {
    import spark.implicits._
    val fixture = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val r = Corpus.chunkDocuments(fixture, maxTokens = 32, overlap = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    val d1 = r.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 2, s"50 tokens at stride 24 → 2 chunks: ${d1.toSeq}")
    assert(d1(0)._3.split(" ").length == 32 && d1(0)._4 == 32L)
    assert(d1(0)._3.startsWith("t1 ") && d1(1)._3.endsWith(" t50"))
    assert(d1(1)._3.split(" ").head == "t25", "chunk 1 must rewind by the overlap")
    assert(d1(1)._4 == 26L)
    assert(d1.flatMap(_._3.split(" ")).toSet == (1 to 50).map(i => s"t$i").toSet,
      "chunks must cover every token")
    val d2 = r.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == "a b c" && d2.head._4 == 3L,
      s"a short doc is one chunk covering itself: ${d2.toSeq}")
  }

  test("keep-best dedup keeps the longest cluster member, not the lowest id") {
    import spark.implicits._
    import graft.operators.Dedup
    // chain cluster {1,2,3} (1-2, 2-3 pairs): doc 2 is longest and must
    // win even though greedy lowest-id keep would pick doc 1; singleton 9
    // is untouched
    val docs = Seq(
      (1L, "x", "en", "s", 10L), (2L, "y", "en", "s", 30L),
      (3L, "z", "en", "s", 20L), (9L, "q", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_id1", "doc_id2")
    val kept = Dedup.nearDedupKeepBest(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 9L), s"longest per cluster + non-members: $kept")
    // equal lengths → the smallest id wins deterministically
    val tie = Seq((5L, "x", "en", "s", 10L), (6L, "y", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val keptTie = Dedup.nearDedupKeepBest(tie,
        Seq((5L, 6L)).toDF("doc_id1", "doc_id2"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptTie == Set(5L), s"tie-break must be lowest id: $keptTie")
  }

  test("keyword search: rarity outweighs frequency, matches gate inclusion, k truncates") {
    import spark.implicits._
    // planted corpus: 'rare' appears in 1 of 6 docs, 'common' in 5 of 6;
    // doc 10 has the rare term once, doc 20 has the common term three
    // times, doc 99 matches nothing
    val fixture = Seq(
      (10L, "rare alpha beta gamma"),
      (20L, "common common common beta"),
      (30L, "common alpha"), (31L, "common beta"), (32L, "common gamma"),
      (33L, "common delta"),
      (99L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val r = TextAnalysis.keywordSearch(fixture, Seq("rare", "common"), k = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    assert(!r.exists(_._1 == 99L), "a doc matching no term must not appear")
    val n = 7.0
    val wRare = 1.0 * (n - 1 + 0.5) / (1 + 0.5)          // tf 1, df 1
    val wCommon3 = 3.0 * (n - 5 + 0.5) / (5 + 0.5)       // tf 3, df 5
    assert(r.head._1 == 10L && math.abs(r.head._2 - wRare) < 1e-12,
      s"one hit on the rare term must outrank three on the common term: ${r.toSeq}")
    assert(r.exists(p => p._1 == 20L && math.abs(p._2 - wCommon3) < 1e-12 && p._3 == 1L))
    assert(r.length == 6, s"all six matching docs surface at k=10: ${r.toSeq}")
    // k truncation keeps the highest scores
    val top2 = TextAnalysis.keywordSearch(fixture, Seq("rare", "common"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2.length == 2 && top2.head == 10L, s"k must keep the best-scored docs: $top2")
  }

  test("dup rate by source: planted duplicates raise exactly their source's rate") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma", "clean_src"), (2L, "delta epsilon zeta", "clean_src"),
      (3L, "the same text", "dup_src"), (4L, "the same text", "dup_src"),
      (5L, "the same text", "dup_src"), (6L, "something else", "dup_src"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.dupRateBySource(fixture).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("clean_src") == ((2L, 2L, 0.0)), s"no dups: ${r("clean_src")}")
    assert(r("dup_src")._1 == 4L && r("dup_src")._2 == 2L &&
      math.abs(r("dup_src")._3 - 0.5) < 1e-12, s"3 copies of 4 docs: ${r("dup_src")}")
    // real corpus: rates are proper fractions, docs conserved per source
    val real = Corpus.dupRateBySource(docs).collect()
    assert(real.map(_.getLong(1)).sum == docs.count())
    assert(real.forall(x => x.getDouble(3) >= 0.0 && x.getDouble(3) < 1.0))
  }

  test("dataset card equals its standalone component reports per source (r10 next-round 7)") {
    val card = Corpus.datasetCard(docs).collect().map(r =>
      r.getString(0) -> r).toMap
    // dup-rate block ≡ dupRateBySource row for row
    val dup = Corpus.dupRateBySource(docs).collect()
    assert(dup.nonEmpty && dup.forall { d =>
      val c = card(d.getString(0))
      c.getLong(1) == d.getLong(1) && c.getLong(2) == d.getLong(2) &&
        c.getDouble(3) == d.getDouble(3)
    }, "card dup-rate columns must equal the standalone report")
    // quality-gate keep counts ≡ the standalone filters aggregated by source
    def keepBySource(f: org.apache.spark.sql.DataFrame): Map[String, Long] =
      f.select(col("doc_id"), col("keep")).join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(sum(col("keep").cast("long")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c4 = keepBySource(TextAnalysis.qualityFilter(docs))
    val gop = keepBySource(TextAnalysis.gopherFilter(docs))
    assert(card.forall { case (s, r) =>
      r.getLong(6) == c4(s) && r.getLong(7) == gop(s) },
      "card keep counts must equal the standalone gates")
    // OOV block ≡ vocabCoverage aggregated by source
    val cov = TextAnalysis.vocabCoverage(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(sum("n_tokens").as("t"), sum("n_oov").as("o"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(card.forall { case (s, r) =>
      r.getLong(4) == cov(s)._1 &&
        r.getDouble(8) == cov(s)._2.toDouble / cov(s)._1.toDouble },
      "card OOV columns must equal the aggregated coverage report")
  }

  test("temperature sample: rarer languages keep a larger fraction, thresholds honor the α=0.5 formula") {
    val r = Corpus.temperatureSample(docs).cache()
    // deterministic and id-stable
    val s1 = r.collect().map(_.getLong(0)).toSet
    val s2 = Corpus.temperatureSample(docs).collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.nonEmpty)
    // per-language: threshold matches min(1, f·N/(S·sqrt(n_l)))·2^20 exactly
    val counts = docs.groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val s = counts.toSeq.sortBy(_._1).map(c => math.sqrt(c._2.toDouble))
      .foldLeft(0.0)(_ + _)
    val thresholds = r.select("lang", "threshold").distinct().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    counts.foreach { case (lang, nl) =>
      val expected =
        math.floor(math.min(1.0, 0.5 * n / (s * math.sqrt(nl.toDouble))) * 1048576.0).toLong
      assert(thresholds.get(lang).forall(_ == expected),
        s"$lang threshold ${thresholds.get(lang)} != $expected")
    }
    // the flattening property: a rarer language's keep-RATE strictly
    // exceeds a more common one's (rate ∝ 1/sqrt(n_l) until the clamp)
    val (rareLang, nRare) = counts.minBy(_._2)
    val (bigLang, nBig) = counts.maxBy(_._2)
    if (nRare < nBig) {
      def rate(nl: Long) = math.min(1.0, 0.5 * n / (s * math.sqrt(nl.toDouble)))
      assert(rate(nRare) > rate(nBig) || rate(nRare) == 1.0,
        s"α-sampling must flatten: $rareLang ${rate(nRare)} !> $bigLang ${rate(nBig)}")
    }
    // kept set is a subset selected by the documented modular-hash rule
    r.collect().foreach { row =>
      val bucket = ((row.getLong(0) % 1000003L) * 2654435761L % 1048576L + 1048576L) % 1048576L
      assert(row.getLong(2) == bucket && bucket < row.getLong(4))
    }
    r.unpersist()
  }

  test("dsir weights: target-like docs outweigh divergent ones, smoothing keeps OOV finite") {
    import spark.implicits._
    // target domain speaks in "a b" bigrams; raw doc 1 mimics it, doc 2
    // shares the vocabulary but not the transitions, doc 3 is fully OOV
    val target = Seq((100L, "a b a b a b"), (101L, "a b c")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "a b a b"),   // target-like: its bigrams dominate the target counts
      (2L, "b a b a"),   // same tokens, reversed transitions (rare in target)
      (3L, "x y x y"),   // fully OOV: every bucket unseen in target
      (4L, "z")          // single token: no bigrams, drops out
    ).toDF("doc_id", "text")
    val r = Corpus.dsirWeights(raw, target).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L), s"bigramless doc 4 drops out: ${r.toSeq}")
    val w = r.map(x => x._1 -> x._3).toMap
    assert(w(1L) > w(2L) && w(2L) > w(3L),
      s"weights must rank target-likeness: $w")
    assert(w(3L) > 0.0 && w.values.forall(v => !v.isNaN && !v.isInfinite),
      s"Laplace smoothing keeps OOV weights finite and positive: $w")
    // frozen-model serving: the persisted count tables reproduce in-plan
    // training bit-for-bit on the training pool (the lmFluencyFrom parity)
    val dir = java.nio.file.Files.createTempDirectory("dsirmodel").toString
    Corpus.persistDsirModel(raw, target, dir, "spec")
    val served = Corpus.dsirWeightsFrom(Corpus.loadDsirModel(spark, dir), raw)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1)
    assert(served.toSeq == r.toSeq, "frozen model must reproduce in-plan training")
    // real corpus: every multi-token raw doc scored, weights spread
    val docsAll = docs
    val real = Corpus.dsirWeights(
      docsAll.filter(col("source") =!= "src0"),
      docsAll.filter(col("source") === "src0"))
    assert(real.filter(col("dsir_weight") <= 0).count() == 0)
    assert(real.select(countDistinct(col("dsir_weight"))).head.getLong(0) > 10,
      "the signal must spread over the corpus")
    // the selection cut is a weight-ordered subset of the weights frame
    val top = SparkEntry.queries("q_dsir_select")(spark, sf).collect()
    assert(top.length == 50)
    val ws = top.map(_.getDouble(2))
    assert(ws.sliding(2).forall(p => p(0) >= p(1)), "selection must be weight-ordered")
  }

  test("source divergence: identical sources at zero, disjoint vocabularies hand-computed") {
    import spark.implicits._
    // two sources with byte-identical text: both distributions equal the
    // corpus mean, so TV must be exactly 0.0 on both
    val same = Seq((1L, "a a b b", "s1"), (2L, "a a b b", "s2"))
      .toDF("doc_id", "text", "source")
    val z = Corpus.sourceDivergence(same).collect()
      .map(x => (x.getString(0), x.getDouble(2)))
    assert(z.toSeq == Seq(("s1", 0.0), ("s2", 0.0)), s"identical mix: ${z.toSeq}")
    // disjoint vocabularies: corpus = {a:2, b:2, c:4}, T=8;
    // TV(s1) = (|1/2-1/4|*2 + 1/2)/2 = 0.5; TV(s2) = (|1-1/2| + 1/4*2)/2 = 0.5
    // (all terms are exact binary fractions, so equality is exact)
    val split = Seq((1L, "a a b b", "s1"), (2L, "c c c c", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.sourceDivergence(split).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq(("s1", 4L, 0.5), ("s2", 4L, 0.5)),
      s"hand-computed TV: ${r.toSeq}")
    // real corpus: one row per source, TV strictly inside (0,1), token
    // totals conserve the corpus token count
    val real = Corpus.sourceDivergence(docs).cache()
    assert(real.count() == docs.select("source").distinct().count())
    assert(real.filter(col("tv_divergence") <= 0 || col("tv_divergence") >= 1).count() == 0,
      "every real source diverges a little, none completely")
    val totTokens = real.select(sum(col("n_tokens"))).head.getLong(0)
    val expected = docs.select(sum(size(org.apache.spark.sql.functions.split(col("text"), " ")))).head.getLong(0)
    assert(totTokens == expected, s"token mass conserves: $totTokens vs $expected")
    real.unpersist()
  }

  test("curriculum staging: cleanest-first per language, only kept docs staged, stages contiguous in fluency") {
    import spark.implicits._
    // fluency strictly decreasing in doc_id; two langs; docs 6/7 in the
    // fluency tail, doc 5 outside the budget cut
    val ccnet = Seq(
      (0L, "en", 0.9, "head"), (1L, "en", 0.8, "head"),
      (2L, "en", 0.7, "middle"), (3L, "en", 0.6, "middle"),
      (4L, "de", 0.5, "head"), (5L, "de", 0.4, "head"),
      (6L, "en", 0.3, "tail"), (7L, "de", 0.2, "tail"))
      .toDF("doc_id", "lang", "fluency", "bucket")
    val budget = Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L).toDF("doc_id")
    val got = graft.operators.Corpus.curriculumStages(ccnet, budget, stages = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    // en keeps 0-3 (doc 6 is tail), split 2 stages by fluency desc:
    // {0,1} stage 1, {2,3} stage 2; de keeps only 4 (5 out of budget,
    // 7 tail) → stage 1
    assert(got == Set((0L, "en", 1), (1L, "en", 1), (2L, "en", 2),
      (3L, "en", 2), (4L, "de", 1)),
      s"staging must be cleanest-first per language over kept docs only: $got")
  }

  test("data split: total, deterministic, id-stable, roughly proportioned, scan-side") {
    val s1 = Corpus.dataSplit(docs)
    val byDoc = s1.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(byDoc.size == docs.count(), "every document gets exactly one split")
    assert(byDoc == Corpus.dataSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap, "split is reproducible")
    // id-stability: restricting the corpus never changes a doc's split
    val half = Corpus.dataSplit(docs.filter(col("doc_id") % 2 === 0)).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(half.forall { case (id, sp) => byDoc(id) == sp },
      "a document's split must not depend on what else is in the corpus")
    val n = byDoc.size.toDouble
    val trainFrac = byDoc.values.count(_ == "train") / n
    assert(trainFrac > 0.75 && trainFrac < 0.99, s"~90% train, got $trainFrac")
    assert(byDoc.values.toSet == Set("train", "val", "test"),
      "all three splits populated at test scale")
    // scan-side: no exchange anywhere in the unordered split plan
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
    // decorrelation from the sampling hash: the sampled set's split mix
    // must not collapse into one split (the same-multiplier failure mode)
    val sampled = Corpus.stratifiedSample(docs).select("doc_id")
    val sampledSplits = Corpus.dataSplit(docs)
      .join(sampled, Seq("doc_id"), "left_semi")
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(sampledSplits.size >= 2,
      s"sampling must not determine the split: $sampledSplits")
  }

  test("split residues decorrelate from id-periodic structure (no affine mod-100 alignment)") {
    // Any single-multiplier bucket ((doc_id % M) * A) % 100 is an affine
    // map of doc_id mod 100: every mod-100 residue class lands in ONE
    // bucket, so striped ingestion (or the PII fixture's mod-3/5/7/11
    // tails) piles whole classes into one split — class 0 was 100% train,
    // others 100% test. The two-round large-prime mixer must keep every
    // residue class's train count in a sane band around the global 90%.
    val wide = spark.range(10000).select(col("id").as("doc_id"),
      lit("en").as("lang"), lit("s").as("source"))
    val byClass = Corpus.dataSplit(wide).collect()
      .map(r => (r.getLong(0) % 100, r.getString(4)))
      .groupBy(_._1).map { case (r, xs) =>
        r -> xs.count(_._2 == "train") }
    assert(byClass.size == 100)
    byClass.foreach { case (r, nTrain) =>
      assert(nTrain >= 75 && nTrain <= 99,
        s"residue class $r has $nTrain/100 train docs — id-periodic " +
          s"structure is aligning with the split")
    }
    // the PII-fixture periods specifically: each stratum keeps all three
    // splits populated
    Seq(3, 5, 7, 11).foreach { p =>
      val splits = Corpus.dataSplit(wide.filter(col("doc_id") % p === 0))
        .select("split").distinct().collect().map(_.getString(0)).toSet
      assert(splits == Set("train", "val", "test"),
        s"mod-$p stratum must populate all splits: $splits")
    }
  }

  test("split leakage: exactly the persisted near-dup pairs that straddle the boundary") {
    import spark.implicits._
    val pairs = Seq((0L, 1L, 0.9), (2L, 3L, 0.85)).toDF("doc_id1", "doc_id2", "jaccard")
    val split = Corpus.dataSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val got = Corpus.splitLeakage(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = Seq((0L, 1L), (2L, 3L))
      .filter { case (a, b) => split(a) != split(b) }
      .map { case (a, b) => (a, split(a), b, split(b)) }.toSet
    assert(got == want, s"leakage must be the straddling subset: got $got want $want")
    // same-split pairs never leak
    assert(got.forall { case (_, sa, _, sb) => sa != sb })
  }

  test("split cards: conservation against the corpus, shares sum to one per language") {
    val card = SparkEntry.queries("q_split_card")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(card.map(_._3).sum == docs.count(), "doc counts must conserve the corpus")
    card.groupBy(_._2).foreach { case (lang, rows) =>
      val share = rows.map(_._5).sum
      assert(math.abs(share - 1.0) < 1e-12, s"$lang shares must sum to 1: $share")
    }
    val oov = SparkEntry.queries("q_oov_by_split")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cov = graft.operators.TextAnalysis.vocabCoverage(docs)
      .agg(org.apache.spark.sql.functions.sum("n_tokens"),
        org.apache.spark.sql.functions.sum("n_oov")).head()
    assert(oov.map(_._2).sum == cov.getLong(0) && oov.map(_._3).sum == cov.getLong(1),
      "per-split OOV totals must conserve the corpus coverage totals")
  }

  test("holdout fit: shares sum to one per split, counts conserve the scored corpus") {
    val fit = SparkEntry.queries("q_holdout_fit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(fit.map(_._1).toSet == Set("train", "val", "test"))
    fit.groupBy(_._1).foreach { case (split, rows) =>
      val share = rows.map(_._4).sum
      assert(math.abs(share - 1.0) < 1e-12, s"$split shares must sum to 1: $share")
    }
    assert(fit.map(_._3).sum == docs.count(),
      "every scored document lands in exactly one (split, bucket) cell")
  }

  test("eval holdout: train-linked eval docs evicted, val-test cross pairs kept, train never shrunk") {
    import spark.implicits._
    val split = Corpus.dataSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // synthesize pairs covering the policy space from the real split
    val trainId = split.collectFirst { case (id, "train") => id }.get
    val valId   = split.collectFirst { case (id, "val") => id }.get
    val testId  = split.collectFirst { case (id, "test") => id }.get
    val val2 = split.collect { case (id, "val") => id }.filter(_ != valId).head
    val pairs = Seq(
      (trainId, valId, 0.9),  // train↔val: val doc must evict
      (val2, testId, 0.85))   // val↔test: both stay
      .toDF("doc_id1", "doc_id2", "jaccard")
    val hold = Corpus.evalHoldout(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val ids = hold.map(_._1).toSet
    assert(!ids.contains(valId), "the train-linked eval doc must be evicted")
    assert(ids.contains(val2) && ids.contains(testId),
      "val-test cross pairs must not evict either side")
    assert(hold.forall(_._2 != "train"), "holdout never contains train docs")
    // totality: holdout = all non-train docs minus exactly the evicted one
    val nonTrain = split.count(_._2 != "train")
    assert(hold.length == nonTrain - 1,
      s"exactly one eviction expected: ${hold.length} vs $nonTrain-1")
  }

  test("novelty score: shared passage counts on every carrier, unique doc fully novel, short doc silent") {
    import spark.implicits._
    val passage = (1 to 6).map(i => s"p$i").mkString(" ") // 6 tokens → two 5-grams
    val fixture = Seq(
      (1L, s"$passage a1 a2 a3 a4"),     // carries the passage + 4 own grams...
      (2L, s"$passage b1 b2 b3 b4"),     // second carrier
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"),   // fully novel
      (4L, "x y z")).toDF("doc_id", "text") // < 5 tokens: no grams, no row
    val r = graft.operators.Dedup.noveltyScore(fixture).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(!r.contains(4L), "sub-n documents emit no row")
    // doc 3: 8 tokens → 4 grams, none shared
    assert(r(3L) == ((4L, 0L, 1.0)), s"unique doc must be fully novel: ${r(3L)}")
    // docs 1/2: 10 tokens → 6 grams each; exactly the passage-internal
    // grams (p1..p5, p2..p6) occur in both carriers
    assert(r(1L)._1 == 6L && r(1L)._2 == 2L && r(2L)._2 == 2L,
      s"both carriers must count the shared passage grams: ${r(1L)} / ${r(2L)}")
    assert(r(1L)._3 == 1.0 - 2.0 / 6.0)
  }

  test("preference pairs: per-source extremes pair positionally, degenerate single-doc source drops") {
    import spark.implicits._
    // quality is monotone in unique_ratio here (same length, no punct):
    // repeated tokens sink a doc. srcA: clear best→worst order; srcB: one
    // doc only → its top-1 IS its bottom-1, the pair must drop.
    def rep(tok: String, n: Int) = Seq.fill(n)(tok).mkString(" ")
    val fixture = Seq(
      (1L, (1 to 8).map(i => s"w$i").mkString(" "), "srcA"),  // all unique: best
      (2L, rep("u", 2) + " " + (1 to 6).map(i => s"v$i").mkString(" "), "srcA"),
      (3L, rep("u", 5) + " " + (1 to 3).map(i => s"x$i").mkString(" "), "srcA"),
      (4L, rep("u", 8), "srcA"),                               // one token: worst
      (9L, "only doc here", "srcB"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")).cast("long"))
    val pairs = Corpus.preferencePairs(fixture).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(6)))
    assert(!pairs.exists(_._1 == "srcB"),
      s"a single-doc source has no non-degenerate pair: ${pairs.mkString(",")}")
    val a = pairs.filter(_._1 == "srcA").sortBy(_._2)
    assert(a.map(p => (p._2, p._3, p._4)).toSeq == Seq((1L, 1L, 4L), (2L, 2L, 3L)),
      s"extremes must pair positionally best-with-worst: ${a.mkString(",")}")
    assert(a.forall(_._5 > 0.0), "chosen must out-score rejected")
  }
}

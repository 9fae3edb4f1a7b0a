package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.CityEvents

/** Property tests (SURVEY.md §5): window-bucket math, record-id
  * construction, severity thresholds — generated inputs (scalacheck Gen,
  * fixed seed for reproducibility) checked against the Spark expressions.
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val tsGen: Gen[Long] = // 2020..2030, microsecond precision
    Gen.choose(1577836800000000L, 1893456000000000L)

  test("5-minute window assignment floors to 300s epoch buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val micros = sample(Gen.listOfN(200, tsGen), 42L)
    val got = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
      .select(unix_timestamp(window(col("ts"), "5 minutes")("start")).as("ws"), col("ts"))
      .collect()
    got.foreach { r =>
      val expected = (r.getTimestamp(1).getTime / 1000) / 300 * 300
      assert(r.getLong(0) == expected)
    }
  }

  test("severity thresholds partition the value domain exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vs = sample(Gen.listOfN(500, Gen.choose(0.0, 500.0)), 7L)
    vs.toDF("value")
      .select(col("value"), CityEvents.severityOf(col("value")).as("sev"))
      .collect()
      .foreach { r =>
        val v = r.getDouble(0)
        val expected =
          if (v < 100) "low" else if (v < 250) "medium"
          else if (v < 400) "high" else "critical"
        assert(r.getString(1) == expected)
      }
  }

  test("token_hashes equals the HOF fold on generated texts (alphabet + space runs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random strings over the corpus alphabet with empty-token pathologies:
    // leading/trailing/repeated spaces at arbitrary positions
    val charGen = Gen.frequency(
      (8, Gen.alphaLowerChar), (3, Gen.const(' ')),
      (1, Gen.oneOf('é', '中', 'ß')))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val texts = sample(Gen.listOfN(300, textGen), 13L)
    val bad = texts.toDF("text")
      .select(
        graft.functions.Sketches.tokenHashes(col("text")).as("fused"),
        graft.operators.Dedup.tokenHashesHof(col("text")).as("hof"))
      .filter(not(col("fused") <=> col("hof"))).count()
    assert(bad == 0, "fused token hashing diverged from the HOF formulation")
  }

  test("fingerprint equals the HOF fold on generated texts (incl. multi-byte codepoints)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same generator family as the token_hashes parity test — the
    // fingerprint differs in accumulating EVERY code point (spaces too),
    // so space runs and multi-byte characters are the interesting cases
    val charGen = Gen.frequency(
      (8, Gen.alphaLowerChar), (3, Gen.const(' ')),
      (1, Gen.oneOf('é', '中', 'ß')))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val texts = sample(Gen.listOfN(300, textGen), 29L)
    val bad = texts.toDF("text")
      .select(
        graft.functions.Sketches.fingerprint(col("text")).as("fused"),
        graft.operators.TextAnalysis.fingerprintColHof(col("text")).as("hof"))
      .filter(not(col("fused") <=> col("hof"))).count()
    assert(bad == 0, "codegen'd fingerprint diverged from the HOF formulation")
  }

  test("ivfAssign inverted lists: every vector routed, cell ranks dense from 1") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.trainIvfCentroids(emb)
    val lists = Similarity.ivfAssign(emb, idx, probeDepth = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("centroid_id"),
        r.getAs[Int]("cell_rank")))
    val n = emb.count()
    val byVec = lists.groupBy(_._1)
    assert(byVec.size == n, s"every vector must be routed: ${byVec.size}/$n")
    byVec.foreach { case (id, rows) =>
      val ranks = rows.map(_._3).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"vec $id ranks not dense: $ranks")
      assert(ranks.size <= 3)
      assert(rows.map(_._2).distinct.length == rows.length,
        s"vec $id routed to one cell twice")
    }
    idx.release() // lists collected — training caches released (r8 ADVICE-3)
  }

  test("kafka wire format round-trips: parseJson(toKafkaRecords(df)) recovers the wire fields (S3/P1-P3)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // generated raw wire frames: id, ts (µs precision), user, type, value, props
    val rows = sample(Gen.listOfN(200, for {
      id <- Gen.choose(0L, 1000000L); t <- tsGen
      u  <- Gen.choose(0L, 5000L)
      ty <- Gen.oneOf("click", "view", "purchase", "signup", "error")
      v  <- Gen.choose(0.0, 500.0)
      k  <- Gen.choose(0, 99)
    } yield (id, t, u, ty, v, s"""{"k": $k}""")), 1234L)
    val raw = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val normalized = CityEvents.normalize(raw)
    val wire = graft.streaming.EventStreamSource.toKafkaRecords(normalized)
    val back = graft.streaming.EventStreamSource.parseJson(
      wire.select(col("value").as("json")))
    // the producer serializes the normalized row; the consumer's wire schema
    // recovers exactly the reference's CityEvent fields
    val sent = normalized
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    val got = back
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    assert(got == sent)
    // and the record key is the partition-ordering city, matching each row
    val keyed = wire.select(col("key"),
      get_json_object(col("value"), "$.city").as("city")).collect()
    assert(keyed.forall(r => r.getString(0) == r.getString(1)))
    assert(keyed.map(_.getString(0)).toSet.subsetOf(CityEvents.Cities.toSet))
  }

  test("rec_id embeds city, type and the wire-format timestamp") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = sample(Gen.listOfN(100, for {
      u <- Gen.choose(0L, 1000L); t <- tsGen
      ty <- Gen.oneOf("click", "view", "error")
    } yield (u, t, ty)), 99L)
    val df = rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), lit(1L).as("event_id"), lit(1.0).as("value"),
        lit("{}").as("props"))
    CityEvents.normalize(df).collect().foreach { r =>
      val parts = r.getAs[String]("rec_id").split("-", 3)
      assert(parts(0) == r.getAs[String]("city"))
      assert(parts(1) == r.getAs[String]("event_type"))
      assert(parts(2) == r.getAs[String]("ts_str"))
      assert(parts(2).endsWith("Z"))
    }
  }

  test("pii scrub on generated text: idempotent, no raw shape survives, clean text untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Pii
    // generator mixes benign words, digit runs, dash-words, and the four
    // PII families at random positions — the adversarial soup a crawl
    // delivers
    val word: Gen[String] = Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.choose(0, 999999).map(_.toString),
      Gen.choose(0, 99).map(n => s"a-$n"),
      for (a <- Gen.choose(100, 999); b <- Gen.choose(100, 999);
           c <- Gen.choose(1000, 9999)) yield s"$a-$b-$c",       // phone
      for (a <- Gen.choose(100, 999); b <- Gen.choose(10, 99);
           c <- Gen.choose(1000, 9999)) yield s"$a-$b-$c",       // id
      for (a <- Gen.choose(0, 255); b <- Gen.choose(0, 255);
           c <- Gen.choose(0, 255); e <- Gen.choose(0, 255))
        yield s"$a.$b.$c.$e",                                     // ip
      for (u <- Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty);
           h <- Gen.oneOf("example.org", "mail.test", "x.co"))
        yield s"$u@$h")                                           // email
    val textGen = Gen.listOfN(12, word).map(_.mkString(" "))
    val texts = sample(Gen.listOfN(120, textGen), 1234L)
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
    val once = Pii.scrubPii(df).select("doc_id", "clean_text")
    val onceRows = once.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // 1. no raw shape survives a scrub
    val shapes = Seq(Pii.EmailPattern, Pii.Ipv4Pattern, Pii.PhonePattern,
      Pii.IdPattern).map(_.r)
    onceRows.values.foreach { t =>
      shapes.foreach(p => assert(p.findFirstIn(t).isEmpty,
        s"raw shape ${p.pattern} survived in: $t"))
    }
    // 2. idempotence: scrub ∘ scrub ≡ scrub
    val twice = Pii.scrubPii(once.select(col("doc_id"),
        col("clean_text").as("text"))
        .withColumn("lang", lit("en")).withColumn("source", lit("src0")))
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(twice == onceRows, "second scrub must be a fixpoint")
    // 3. shape-free text passes through byte-identical
    val benign = sample(Gen.listOfN(40,
      Gen.listOfN(10, Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty))
        .map(_.mkString(" "))), 77L)
    val bdf = benign.zipWithIndex.map { case (t, i) => (i.toLong, t, "", "") }
      .toDF("doc_id", "text", "lang", "source")
    Pii.scrubPii(bdf).select("doc_id", "clean_text").collect().foreach { r =>
      assert(r.getString(1) == benign(r.getLong(0).toInt),
        "alphabetic text must pass through untouched")
    }
  }

  test("bloom composition equals exact contamination on generated corpora " +
    "(small token alphabet forces real cross-split gram sharing)") {
    import spark.implicits._
    import graft.operators.Dedup
    // a 12-token alphabet over 6-10-token docs makes shared 5-grams
    // common, so the generated instances exercise non-empty exact flags,
    // bloom hits, and (occasionally) zero-overlap corpora alike
    val tokGen = Gen.oneOf((0 until 12).map(i => s"t$i"))
    val docGen = Gen.choose(6, 10).flatMap(n =>
      Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    // round-13 verdict 8: the identity must hold when the pre-filter is
    // WEAK, not only at the production geometry — at (2^10, 2) and
    // especially (128, 1) false-positive bits are dense, so the exact
    // verify behind the candidate sliver carries the whole burden and
    // any candidate/verify coupling bug would surface
    val geometries = Seq((1 << 20, 6), (1 << 10, 2), (128, 1))
    var weakFpSeen = false
    for (seed <- Seq(3L, 11L, 59L)) {
      val texts = sample(Gen.listOfN(60, docGen), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val corpus = df.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(4)) =!= 0)
      val bench = df.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(4)) === 0)
      val exact = Dedup.contamination(corpus, bench).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // r14 verdict 4: the verify now keys on (probe fingerprint, gram
      // string) — its full-corpus answer is string-exact and must agree
      // with the xxhash64 exact path on real instances ...
      val unified = Dedup.bloomVerify(corpus, bench, 5).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(unified == exact,
        s"seed $seed: unified-space verify diverged from the xxhash64 exact path")
      for ((mBits, kHashes) <- geometries) {
        val candDocs = Dedup.bloomCandidates(corpus,
            Dedup.bloomBitmap(bench, mBits = mBits, kHashes = kHashes),
            mBits = mBits, kHashes = kHashes)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val nCands = candDocs.size
        assert(nCands >= exact.size,
          s"seed $seed ($mBits,$kHashes): candidates must be a superset")
        // ... and the superset guarantee is STRUCTURAL in that space:
        // every probe-space-flagged doc is a candidate at EVERY geometry
        assert(unified.keySet.subsetOf(candDocs),
          s"seed $seed ($mBits,$kHashes): a unified-space flag escaped the candidates")
        if (mBits == 128 && nCands > exact.size) weakFpSeen = true
        val composed = Dedup.bloomContamination(corpus, bench,
            mBits = mBits, kHashes = kHashes).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(composed == exact,
          s"seed $seed ($mBits,$kHashes): bloom-prefiltered verify " +
            s"diverged (exact=${exact.size}, composed=${composed.size})")
      }
    }
    // non-vacuity: the weakest geometry actually produced false-positive
    // candidates on some instance — the identity was tested under load,
    // not on a filter that happened to be exact anyway
    assert(weakFpSeen,
      "(128, 1) never false-positived — the weak-geometry case is vacuous")
  }

  test("codeSwitch equals a plain-Scala reference on generated token streams") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val sets = TextAnalysis.RegisterSets
    val segLen = 4
    // vocabulary: every register word plus two out-of-lexicon fillers, so
    // generated docs mix detected and 'und' segments
    val vocab = sets.flatMap(_._2) ++ Seq("zz", "qq")
    val docGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val texts = sample(Gen.listOfN(120, docGen), 23L)
    // reference: the operator's contract in plain Scala
    def ref(text: String): (Long, Long, Long, String, Long, Int) = {
      val toks = text.split(" ", -1).toSeq
      val segs = toks.grouped(segLen).toSeq
      val names = sets.map(_._1)
      def predict(seg: Seq[String]): String = {
        val scores = sets.map { case (_, ws) => seg.count(ws.contains) }
        if (scores.max == 0) "und" else names(scores.indexOf(scores.max))
      }
      val segLangs = segs.map(predict)
      val det = segLangs.filter(_ != "und")
      val majority =
        if (det.isEmpty) "und"
        else { val c = names.map(l => det.count(_ == l)); names(c.indexOf(c.max)) }
      val switches =
        if (det.length < 2) 0L
        else det.sliding(2).count { case Seq(a, b) => a != b }.toLong
      (segLangs.length.toLong, det.length.toLong, det.distinct.length.toLong,
        majority, switches, if (det.distinct.length >= 2) 1 else 0)
    }
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.codeSwitch(df, segLen = segLen, sets = sets)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5),
          r.getLong(6), r.getInt(7)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"doc $i: '$t'")
    }
    // non-vacuity: the generated corpus exercised both mixture and switches
    assert(got.values.exists(_._6 == 1) && got.values.exists(_._5 > 0))
  }
}

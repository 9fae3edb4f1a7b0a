package graft

import org.apache.spark.sql.functions._
import graft.operators.{ClosedFormCodec, MediaCodec, MediaRecord, Multimodal}

/** A second toy [[MediaCodec]] instance (r16 verdict 6): first-4-bytes
  * decoder, mod-16 buckets, constant-ish embedding — deliberately
  * trivial; what it proves is that the seam TURNS (kernels swap,
  * plumbing and plan shape stay). Top-level so the mapPartitions
  * closure serializes without dragging the suite along.
  */
object ToyMediaCodec extends MediaCodec {
  def samples(m: MediaRecord): Array[Int] =
    Array.tabulate(math.min(4, m.payload.length))(i => m.payload(i) & 0xff)
  def bucket(kind: String, sample: Int): Int = sample % 16
  def resample(m: MediaRecord, w: Int, h: Int): Array[Int] = samples(m)
  def embedding(m: MediaRecord, dims: Int): Array[Double] =
    Array.tabulate(dims)(d => (m.payload.length % 7 + d).toDouble)
}

/** Specs for the multimodal binary-column plumbing. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).cache()

  test("media adapter: binary payload with typed metadata, all three kinds present") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("n_frames").dataType.typeName == "integer")
    assert(media.filter(col("payload").isNull).count() == 0)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode stub dispatches per kind: sample-set size, buckets, and means differ") {
    val f = Multimodal.features(media).cache()
    f.collect().foreach { r =>
      val hist = r.getAs[scala.collection.Seq[Long]]("hist16")
      assert(hist.length == 16)
      val expected = r.getAs[String]("kind") match {
        case "video" => math.max(r.getAs[Long]("n_bytes") / 10, 0L) // one byte per frame
        case _       => r.getAs[Long]("n_bytes")                    // all payload bytes
      }
      assert(hist.sum == expected, s"${r.getAs[String]("kind")} sample-set size")
      val mean = r.getAs[Double]("mean_byte")
      assert(mean >= 0 && mean < 256)
    }
    // audio buckets on the LOW nibble: lowercase ASCII spreads across all 16
    // buckets, whereas image/video high-nibble mass sits in buckets 2,3,6,7
    val audioHist = f.filter(col("kind") === "audio").collect()
      .map(_.getAs[scala.collection.Seq[Long]]("hist16"))
    assert(audioHist.exists(h => h.zipWithIndex.count(_._1 > 0) > 6))
    val imageHist = f.filter(col("kind") === "image").collect()
      .map(_.getAs[scala.collection.Seq[Long]]("hist16"))
    assert(imageHist.forall(h => (8 to 15).forall(b => h(b) == 0L)),
      "ASCII high nibbles never exceed 7")
    f.unpersist()
  }

  test("per-kind kernels agree where they overlap and differ where they must") {
    import spark.implicits._
    // one identical payload under all three kinds
    val text = "the quick brown fox jumps over the lazy dog 0123456789"
    val tri = Seq(("image", 0L), ("audio", 1L), ("video", 2L)).map { case (k, id) =>
      (id, k, text.getBytes("UTF-8"), text.length / 10, 64, 64)
    }.toDF("media_id", "kind", "payload", "n_frames", "width", "height")
    val rows = Multimodal.features(tri).collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Double]("mean_byte"),
          r.getAs[scala.collection.Seq[Long]]("hist16"))).toMap
    // n_bytes is payload size for every kind
    assert(rows.values.forall(_._1 == text.length.toLong))
    // image and audio share the mean (same sample set), video differs (frames)
    assert(rows("image")._2 == rows("audio")._2)
    assert(rows("video")._2 != rows("image")._2)
    // image and audio bucket DIFFERENTLY (high vs low nibble)
    assert(rows("image")._3 != rows("audio")._3)
    // video histogram counts one byte per frame
    assert(rows("video")._3.sum == (text.length / 10).toLong)
  }

  test("true-binary fixtures: video clamp honors metadata, audio/image handle non-ASCII bytes") {
    import spark.implicits._
    // real byte payloads — NOT text: high-bit bytes (negative as JVM
    // signed bytes) and n_frames deliberately decoupled from len/10, the
    // coupling the documents adapter happens to have
    val b25 = Array.tabulate(25)(i => (0x80 + i * 5).toByte)      // 25 B, all ≥ 0x80
    val b7  = Array.tabulate(7)(i => (0xF0 + i).toByte)           // < one "frame"
    val rows = Seq(
      // metadata OVERCLAIMS frames (1000 ≫ ceil(25/10)=3): clamp to 3, and
      // the last partial frame (byte 20) must be read — ceil, not floor
      (1L, "video", b25, 1000, 64, 64),
      // metadata UNDERCLAIMS (1 < 3): the caller's value wins — frame work
      // scales with n_frames metadata, not payload size
      (2L, "video", b25, 1, 64, 64),
      // negative frame count degrades to an empty sample set, not a crash
      (3L, "video", b25, -5, 64, 64),
      // sub-frame payload: ceil(7/10)=1 frame at byte 0
      (4L, "video", b7, 9, 64, 64),
      (5L, "audio", b25, 0, 64, 64),
      (6L, "image", b25, 0, 64, 64),
      (7L, "image", Array.empty[Byte], 0, 64, 64)
    ).toDF("media_id", "kind", "payload", "n_frames", "width", "height")
    val f = Multimodal.features(rows).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("mean_byte"), r.getAs[scala.collection.Seq[Long]]("hist16"))).toMap
    assert(f(1L)._2.sum == 3, "overclaimed n_frames clamps to ceil(len/10)")
    assert(f(2L)._2.sum == 1, "underclaimed n_frames is honored")
    assert(f(3L)._2.sum == 0 && f(3L)._1 == 0.0, "negative n_frames degrades to empty")
    assert(f(4L)._2.sum == 1 && f(4L)._1 == (0xF0).toDouble,
      "sub-frame payload still decodes its first byte, unsigned")
    // audio low-nibble histogram counts every byte; mean > 127 proves the
    // signed JVM bytes were widened unsigned (a & 0xff bug would halve it)
    assert(f(5L)._2.sum == 25 && f(5L)._1 > 127.0)
    // image high-nibble mass sits in buckets 8-15 for ≥ 0x80 payloads —
    // the complement of the ASCII-only documents fixture, where 8-15 are 0
    assert((0 to 7).forall(b => f(6L)._2(b) == 0L) && f(6L)._2.drop(8).sum == 25)
    assert(f(7L)._2.sum == 0 && f(7L)._1 == 0.0, "empty payload is a zero row")
    // resize on binary payloads: unsigned checksum (negative bytes would
    // drag byte_sum below the per-byte minimum of 0x80)
    val rz = Multimodal.resizeStub(rows.filter(col("media_id") === 6L), 4, 4).collect()
    assert(rz.head.getLong(3) == 16L && rz.head.getLong(4) >= 16L * 0x80)
  }

  test("resize stub: output bounded by target, deterministic, checksum consistent") {
    val r1 = Multimodal.resizeStub(media, 16, 16).collect()
    assert(r1.forall(_.getLong(3) <= 256L))          // n_bytes <= w*h
    assert(r1.forall(x => x.getInt(1) == 16 && x.getInt(2) == 16))
    // checksum bounded by 255 * n_bytes and positive for non-empty payloads
    assert(r1.forall(x => x.getLong(4) <= 255L * x.getLong(3)))
    assert(r1.forall(x => x.getLong(3) == 0 || x.getLong(4) > 0))
    val r2 = Multimodal.resizeStub(media, 16, 16).collect()
    assert(r1.map(_.toSeq).toSet == r2.map(_.toSeq).toSet)
    // payload shorter than the target is kept whole (no upsampling)
    val small = Multimodal.resizeStub(media, 1000, 1000).collect()
    val lens = media.select(col("media_id"), length(col("payload")).cast("long").as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(small.forall(x => x.getLong(3) == math.min(1000000L, lens(x.getLong(0)))))
  }

  test("frame sampling: stride-spaced indices within bounds") {
    val s = Multimodal.sampleFrames(media, 5)
    val joined = s.join(media, "media_id")
      .filter(col("frame_idx") >= col("n_frames") || col("frame_idx") % 5 =!= 0)
    assert(joined.count() == 0)
    assert(s.count() > 0)
  }

  test("embedding stub fingerprints code points, not bytes: non-ASCII parity with fingerprintCol") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // multi-byte UTF-8 payloads — 2-byte (é/ö), 3-byte (CJK), 4-byte
    // (emoji): a byte-wise accumulator diverges from the code-point
    // fingerprint on every one of these (round-8 ADVICE-1)
    val texts = Seq("héllo wörld", "日本語のテキスト", "emoji 🚀🚀 mix", "plain ascii")
    val media = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, "image", t.getBytes("UTF-8"), 0, 64, 64)
    }.toDF("media_id", "kind", "payload", "n_frames", "width", "height")
    val emb = Multimodal.embedStub(media).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    val fps = texts.zipWithIndex.map(_.swap).toDF("media_id", "text")
      .select(col("media_id"), TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    texts.indices.foreach { i =>
      val fp = fps(i.toLong)
      val expected = Array.tabulate(16)(d =>
        ((fp * (2 * d + 1) + d.toLong * 40503L) % 2000001L) / 1000000.0 - 1.0)
      assert(emb(i.toLong) == expected.toSeq,
        s"payload '${texts(i)}' must embed from the code-point fingerprint")
    }
    // and the byte-array helper itself agrees with the codegen'd expression
    texts.foreach { t =>
      assert(graft.functions.Fingerprint.ofUtf8Bytes(t.getBytes("UTF-8")) == fps(texts.indexOf(t).toLong))
    }
  }

  test("embedding stub: fixed dims, deterministic, values in [-1, 1]") {
    val e1 = Multimodal.embedStub(media).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    val e2 = Multimodal.embedStub(media).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    assert(e1 == e2)
    assert(e1.values.forall(v => v.length == 16 && v.forall(x => x >= -1.0 && x <= 1.0)))
  }

  test("persisted media-phash family: snapshot serving equals direct computation, snapshot-only scans") {
    val dir = java.nio.file.Files.createTempDirectory("mediaphash").toString
    Multimodal.persistMediaPhash(media, dir, stamp = "spec")
    val t = Multimodal.loadMediaPhash(spark, dir)
    val directHash = Multimodal.mediaPhash(media).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val servedHash = t.phash.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(servedHash == directHash, "persisted hash table must equal direct computation")
    val directPairs = Multimodal.phashNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val servedPairs = t.nearDupPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(servedPairs == directPairs, "persisted pairs must equal the direct operator")
    // serving scans ONLY the snapshot — never payloads
    val leaves = t.nearDupPairs.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains(dir) && !leaves.contains("documents"),
      s"pairs serving must read the snapshot alone:\n$leaves")
  }

  test("phash lookup endpoint: probes return their neighbors, never themselves, brute-force complete") {
    import spark.implicits._
    val corpusPh = Multimodal.mediaPhash(media).select("media_id", "phash")
    // probe with an in-corpus payload: must return its near-dups, not itself
    val probeSrc = Tables.documents(spark, sf).orderBy("doc_id").limit(5)
    val probes = Multimodal.mediaFromDocuments(probeSrc)
      .withColumnRenamed("media_id", "query_id")
    val got = Multimodal.phashLookup(corpusPh, probes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.forall(p => p._1 != p._2), "a probe must never match itself")
    // brute-force completeness over the probe set
    val ph = corpusPh.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val probeIds = probeSrc.collect().map(_.getLong(0)).toSet
    val brute = (for {
      q <- probeIds.toSeq; (c, cp) <- ph if c != q
      h = java.lang.Long.bitCount(ph(q) ^ cp) if h <= 5
    } yield (q, c, h.toLong)).toSet
    assert(got == brute, s"lookup must equal brute force over probes: ${got.size} vs ${brute.size}")
  }

  test("phash near-dup: planted near-identical media pair found, banding equals brute force") {
    import spark.implicits._
    // plant an exact copy and a tail-edited near-copy of media 0's payload
    val src = Tables.documents(spark, sf).orderBy("doc_id").limit(1)
      .select("doc_id", "text", "n_chars").collect().head
    val text = src.getString(1)
    val planted = Seq(
      (9000001L, text),                              // exact copy -> hamming 0
      (9000002L, text.dropRight(4) + "XXXX"))        // near copy -> small hamming
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
    val all = Multimodal.mediaFromDocuments(
      Tables.documents(spark, sf).unionByName(planted))
    val pairs = Multimodal.phashNearDupPairs(all).cache()
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.exists(p => p._1 == src.getLong(0) && p._2 == 9000001L && p._3 == 0L),
      s"exact copy must pair at hamming 0: $got")
    assert(got.exists(p => p._1 == src.getLong(0) && p._2 == 9000002L),
      s"tail-edited near copy must pair: $got")
    // pigeonhole completeness: banded output equals the brute-force filter
    val ph = Multimodal.mediaPhash(all).select("media_id", "phash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i1, p1) <- ph; (i2, p2) <- ph if i1 < i2
      h = java.lang.Long.bitCount(p1 ^ p2) if h <= 5
    } yield (i1, i2, h.toLong)).toSet
    assert(got == brute, s"banding must be exactly complete at maxHamming < bands")
    pairs.unpersist()
  }

  test("phash recall witness: 1.0 on the real family, trips when a pair is dropped (r11 verdict 6)") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val ph = Multimodal.mediaPhash(media).select("media_id", "phash")
    val pairs = Multimodal.phashNearDupPairs(media).cache()
    val ok = Multimodal.phashRecallBound(pairs, ph).head()
    assert(ok.getLong(0) > 0, "the slice must be pair-bearing (non-vacuous witness)")
    assert(ok.getInt(2) == 1, s"intact family must sit at recall 1.0: $ok")
    // drop one in-slice pair: the witness MUST flip (this is the edit
    // the hash-checked row exists to catch)
    val victim = pairs.filter(col("id1") < 1000 && col("id2") < 1000)
      .orderBy("id1", "id2").limit(1)
    val lossy = pairs.join(victim.select("id1", "id2"), Seq("id1", "id2"), "left_anti")
    val bad = Multimodal.phashRecallBound(lossy, ph).head()
    assert(bad.getInt(2) == 0, s"a lost pair must flip within_bound: $bad")
    pairs.unpersist()
  }

  test("clip filter: towers differ per doc, gate at the threshold, zero-norm pairs dropped") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val scores = Multimodal.clipScores(
      Multimodal.textEmbedStub(docs),
      Multimodal.embedStub(Multimodal.mediaFromDocuments(docs))).cache()
    val rows = scores.collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.length == docs.count(), "every doc scores (no zero-norm stubs in testdata)")
    assert(rows.forall { case (_, s, k) => s >= -1.0 - 1e-12 && s <= 1.0 + 1e-12 &&
      k == (s >= 0.0) }, "cosine range and gate consistency")
    // the two towers must genuinely differ: not all scores can be 1
    assert(rows.count(_._2 < 0.999) > rows.length / 2,
      "different mixing constants must decorrelate the towers")
    assert(rows.exists(_._3) , "some aligned pairs at sf")
    scores.unpersist()
    // zero-norm guard: a degenerate tower row yields NO row, not NaN
    val zt = Seq((0L, Array.fill(16)(0.0))).toDF("media_id", "embedding")
    val mv = Multimodal.embedStub(Multimodal.mediaFromDocuments(docs.filter(col("doc_id") === 0)))
    assert(Multimodal.clipScores(zt, mv).count() == 0,
      "zero-norm text tower must drop the pair")
  }

  test("cross-modal retrieval: planted alignment ranks first, pair included, " +
    "ranks contiguous, recall card counts pair positions exactly") {
    import spark.implicits._
    def vec(hot: Int): Array[Double] =
      Array.tabulate(4)(i => if (i == hot) 1.0 else 0.01)
    // queries 0 and 1 (text tower); media corpus of 4 — media 0 (query
    // 0's own PAIR) and media 2 carry the IDENTICAL vector (bitwise-
    // equal cosines, so the media_id tie-break decides), media 1 is
    // query 1's exactly-aligned pair, media 3 is zero-norm
    val textEmb = Seq(
      (0L, vec(0)), (1L, vec(1)),
      (101L, vec(3))).toDF("media_id", "embedding")
    val mediaEmb = Seq(
      (0L, vec(0)), (1L, vec(1)),
      (2L, vec(0)), (3L, Array.fill(4)(0.0))).toDF("media_id", "embedding")
    val topk = Multimodal.crossModalTopK(textEmb, mediaEmb, numQueries = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // zero-norm media 3 never appears; ranks are 1..3 per query
    assert(!topk.exists(_._2 == 3L))
    topk.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq) }
    // query 0: media 0 and 2 tie at cosine 1 exactly (identical
    // vectors) — media_id breaks it, the pair wins rank 1
    assert(topk.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq
      .startsWith(Seq(0L, 2L)))
    // query 1: its pair is rank 1
    assert(topk.filter(_._1 == 1L).sortBy(_._3).map(_._2).head == 1L)
    // recall card, budget covering every eligible query: queries 0 and
    // 1 both rank their pair first (query 0 by the cosine-tie id-break
    // against media 2 — the aggregate rank must reproduce row_number's
    // tie semantics exactly); query 101 has NO paired media in the
    // corpus — it contributes no pair row, so n_queries counts pairs
    // PRESENT (documented: recall over served pairs)
    val card = Multimodal.crossModalRecall(textEmb, mediaEmb,
      sampleN = 3, k = 2).collect().head
    assert(card.getLong(0) == 2L && card.getLong(1) == 2L &&
      card.getDouble(3) == 1.0)
    // the budget is CONSTANT, not a fraction: sampleN = 1 draws exactly
    // one query — the hash-least eligible id (mix(0) = 0 is minimal)
    val one = Multimodal.crossModalRecall(textEmb, mediaEmb,
      sampleN = 1, k = 2).collect().head
    assert(one.getLong(0) == 1L && one.getLong(1) == 1L)
  }

  test("persisted cross-modal family serves the live derivation bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-cm").toString
    Multimodal.persistCrossModal(docs, dir, stamp = "spec")
    assert(graft.sources.SnapshotStore.ready(spark, dir, "spec"))
    val served = spark.read.parquet(s"$dir/topk")
    val live = Multimodal.crossModalTopK(
      Multimodal.textEmbedStub(docs),
      Multimodal.embedStub(Multimodal.mediaFromDocuments(docs)))
    assert(served.exceptAll(live).isEmpty && live.exceptAll(served).isEmpty)
    // v2: the recall card rides the same snapshot
    val servedCard = spark.read.parquet(s"$dir/recall")
    val liveCard = Multimodal.crossModalRecall(
      Multimodal.textEmbedStub(docs),
      Multimodal.embedStub(Multimodal.mediaFromDocuments(docs)))
    assert(servedCard.exceptAll(liveCard).isEmpty &&
      liveCard.exceptAll(servedCard).isEmpty)
    // a stale stamp is not ready — the builder re-persists on corpus change
    assert(!graft.sources.SnapshotStore.ready(spark, dir, "other-stamp"))
  }

  test("the codec seam turns: a toy codec swaps every kernel while the " +
    "plumbing (schema, n_bytes, aggregation) is unchanged (r16 verdict 6)") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      Seq((1L, "abcdefgh", 8L), (2L, "z", 1L))
        .toDF("doc_id", "text", "n_chars"))
    // features: toy decoder reads the FIRST 4 bytes of every kind
    val feats = Multimodal.features(media, ToyMediaCodec).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Double]("mean_byte"),
          r.getSeq[Long](r.fieldIndex("hist16")))).toMap
    assert(feats(1L)._1 == 8L, "n_bytes is plumbing: full payload size")
    assert(feats(1L)._2 == ('a' + 'b' + 'c' + 'd').toDouble / 4,
      "mean aggregates the TOY sample set (first 4 bytes)")
    assert(feats(1L)._3.sum == 4 &&
      feats(1L)._3(('a' % 16)) == 1, "hist uses the toy mod-16 buckets")
    assert(feats(2L)._2 == 'z'.toDouble, s"short payload: ${feats(2L)}")
    // and it genuinely differs from the default codec on the same rows
    val closed = Multimodal.features(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Double]("mean_byte")).toMap
    assert(closed(1L) != feats(1L)._2,
      "the two codecs must disagree on this fixture or the test is vacuous")
    // resize: toy resample ignores the target (plumbing reports ITS size)
    val rz = Multimodal.resizeStub(media, 2, 2, ToyMediaCodec).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("byte_sum"))).toMap
    assert(rz(1L) == ((4L, ('a' + 'b' + 'c' + 'd').toLong)))
    // embed: toy tower, fixed dims
    val emb = Multimodal.embedStub(media, dims = 3, codec = ToyMediaCodec)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getSeq[Double](r.fieldIndex("embedding")).toList).toMap
    assert(emb(1L) == List(1.0, 2.0, 3.0) && emb(2L) == List(1.0, 2.0, 3.0),
      s"toy embedding is the documented closed form: $emb")
  }
}

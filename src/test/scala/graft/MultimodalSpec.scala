package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

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

  test("embedding stub: fixed dims, deterministic, values in [-1, 1]") {
    val e1 = Multimodal.embedStub(media).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    val e2 = Multimodal.embedStub(media).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    assert(e1 == e2)
    assert(e1.values.forall(v => v.length == 16 && v.forall(x => x >= -1.0 && x <= 1.0)))
  }
}

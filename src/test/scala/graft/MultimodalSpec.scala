package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Specs for the multimodal binary-column plumbing. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).cache()

  test("media adapter: binary payload with typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("n_frames").dataType.typeName == "integer")
    assert(media.filter(col("payload").isNull).count() == 0)
  }

  test("decode stub: histogram buckets sum to byte count, mean in byte range") {
    val f = Multimodal.features(media)
    import org.apache.spark.sql.Row
    f.collect().foreach { r =>
      val hist = r.getAs[scala.collection.Seq[Long]]("hist16")
      assert(hist.length == 16)
      assert(hist.sum == r.getAs[Long]("n_bytes"))
      val mean = r.getAs[Double]("mean_byte")
      assert(mean > 0 && mean < 256)
    }
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

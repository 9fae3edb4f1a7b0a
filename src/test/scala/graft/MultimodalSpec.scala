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

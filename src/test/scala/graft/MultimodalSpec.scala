package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))

  test("media table: binary payloads with typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.orderBy("media_id").collect().head
    assert(Multimodal.Kinds.contains(r.getAs[String]("kind")))
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("n_bytes") > 0)
  }

  test("decodeBatch: deterministic stub decode over mapPartitions") {
    // key the subset on media_id, not limit(): limit without orderBy may
    // pick different rows per execution, making the comparison unsound
    def subset(n: Int) = media.filter(col("media_id") < n)
    val once = Multimodal.decodeBatch(spark, subset(50)).collect()
      .map(d => d.media_id -> d.checksum).toMap
    val twice = Multimodal.decodeBatch(spark, subset(50)).collect()
      .map(d => d.media_id -> d.checksum).toMap
    assert(once == twice, "decode must be deterministic")
    val lens = Multimodal.decodeBatch(spark, subset(10)).collect()
    val expected = subset(10)
      .select(col("media_id"), col("meta.n_bytes").as("n")).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("n")).toMap
    assert(lens.nonEmpty)
    lens.foreach(d => assert(d.n_bytes == expected(d.media_id)))
  }

  test("chunkFeatures: fixed width, normalized to [0,1)") {
    val f = media.select(col("media_id"),
      Multimodal.chunkFeatures(col("payload")).as("features"))
      .limit(20).collect()
    f.foreach { r =>
      val arr = r.getSeq[Double](1)
      assert(arr.length == 8)
      assert(arr.forall(v => v >= 0.0 && v < 1.0))
    }
  }

  test("sampleFrames: video rows only, frame indices within plan") {
    val frames = Multimodal.sampleFrames(media)
    val joined = frames.join(media.select(col("media_id"), col("kind")), "media_id")
    assert(joined.filter(col("kind") =!= "video").count() == 0)
    assert(frames.filter(col("frame_idx") >= col("n_frames")).count() == 0)
    assert(frames.groupBy("media_id").count()
      .filter(col("count") > 8).count() == 0, "maxFrames cap")
  }
}

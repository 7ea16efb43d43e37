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

  test("MediaDecoder: real BMP/PPM/WAV headers parse; junk falls back to opaque") {
    import graft.ext.Multimodal.{MediaDecoder, MediaRecord}
    import java.nio.{ByteBuffer, ByteOrder}
    // 2x3 24-bit BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
    // rows padded to 4 bytes (2 px * 3 B = 6 -> 8 per row)
    val bmp = {
      val rowBytes = 8
      val b = ByteBuffer.allocate(54 + rowBytes * 3).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(b.capacity)
      b.putShort(0).putShort(0).putInt(54) // reserved + pixel offset
      b.putInt(40).putInt(2).putInt(3)     // DIB size, width, height
      b.putShort(1).putShort(24)           // planes, bpp
      b.array()
    }
    // 4x5 binary PPM with a comment line between tokens
    val ppm = ("P6\n# fixture\n4 5\n255\n" + "x" * 60).getBytes("US-ASCII")
    // canonical 44-byte WAV header (PCM, stereo, 8 kHz, 16-bit) + 4 samples
    val wav = {
      val dataBytes = 16
      val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(2).putInt(8000)  // PCM, channels, sample rate
      b.putInt(8000 * 2 * 2).putShort(4).putShort(16) // byte rate, align, bits
      b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      b.array()
    }
    val d1 = MediaDecoder.decode(MediaRecord(1L, "image", bmp))
    assert(d1.format == "bmp" && d1.width == 2 && d1.height == 3, d1)
    val d2 = MediaDecoder.decode(MediaRecord(2L, "image", ppm))
    assert(d2.format == "ppm" && d2.width == 4 && d2.height == 5, d2)
    val d3 = MediaDecoder.decode(MediaRecord(3L, "audio", wav))
    assert(d3.format == "wav" && d3.sample_rate == 8000 && d3.n_channels == 2, d3)
    val d4 = MediaDecoder.decode(MediaRecord(4L, "image", "not a container".getBytes))
    assert(d4.format == "opaque" && d4.n_bytes == 15, d4)
    // truncated magic must not crash the partition — opaque, not an exception
    assert(MediaDecoder.decode(MediaRecord(5L, "image", Array[Byte]('B'))).format == "opaque")
    assert(MediaDecoder.decode(MediaRecord(6L, "audio",
      "RIFFxxxx".getBytes("US-ASCII"))).format == "opaque")
    // and the same bytes decode identically through the batched Spark path
    import spark.implicits._
    val viaSpark = graft.ext.Multimodal.decodeBatch(spark,
      Seq((1L, "image", bmp), (3L, "audio", wav))
        .toDF("media_id", "kind", "payload")).collect()
      .map(d => d.media_id -> d).toMap
    assert(viaSpark(1L) == d1 && viaSpark(3L) == d3)
  }

  test("decodeBatch: deterministic decode over mapPartitions") {
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

  test("dHash near-dup: edited copies collide, distant payloads do not, audit covers all rows") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = ("ab" * 80) + "cdef" * 20   // 240 bytes, structured gradients
    val edited = base.updated(17, 'z').updated(143, 'q') // few-byte edit
    val distant = "z" * 120 + ("qx" * 60)  // different gradient structure
    val rows = Seq(
      Row(1L, "image", base.getBytes("US-ASCII")),
      Row(2L, "image", edited.getBytes("US-ASCII")),
      Row(3L, "image", distant.getBytes("US-ASCII")),
      Row(4L, "audio", base.getBytes("US-ASCII")))
    val m = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("media_id", LongType),
        StructField("kind", StringType),
        StructField("payload", BinaryType))))
    val out = Multimodal.mediaNearDup(m).orderBy("media_id").collect()
    assert(out.length == 4, "audit row per media row")
    val byId = out.map(r => r.getAs[Long]("media_id") -> r).toMap
    // identical payloads (1, 4) are hamming 0 — must pair with each other
    assert(byId(1L).getAs[Long]("n_near") >= 1 &&
      byId(4L).getAs[Long]("near_min_id") == 1L)
    assert(byId(1L).getAs[Long]("dhash") == byId(4L).getAs[Long]("dhash"))
    // the distant payload must not match the base family
    assert(byId(3L).getAs[Long]("n_near") == 0 &&
      byId(3L).isNullAt(byId(3L).fieldIndex("near_min_id")))
    // a small edit stays within the hamming budget of the band join at a
    // generous threshold: verify subset-consistency instead of a fixed
    // hamming (the edit may or may not cross sampled positions) — at
    // maxHamming 63 every differing pair sharing any band collides, and
    // the exact filter is what decides
    val loose = Multimodal.mediaNearDup(m, maxHamming = 16)
      .orderBy("media_id").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_near")).toMap
    assert(loose(2L) >= 1, "edited copy within hamming 16 of its base")
    // banding never invents pairs: tight results subset loose results
    out.foreach { r =>
      assert(r.getAs[Long]("n_near") <=
        loose(r.getAs[Long]("media_id")), "monotone in the hamming budget")
    }
  }

  test("media hash index: probe-after-build ≡ inline audit pairs; probes read hashes, not payloads") {
    val m = media
    val dir = java.nio.file.Files.createTempDirectory("dhash_idx").toString
    Multimodal.buildMediaHashIndex(m, dir)
    // probing the index with the corpus itself must reproduce the inline
    // audit's neighbor relation exactly (same bands, same hamming filter)
    val probed = Multimodal.probeMediaHashIndex(spark, dir, m)
      .collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("index_id")))
      .toSet
    val inline = Multimodal.mediaNearDup(m).collect()
      .filter(_.getAs[Long]("n_near") > 0)
      .map(_.getAs[Long]("media_id"))
      .toSet
    assert(probed.map(_._1) == inline,
      "probe pair set disagrees with the inline audit's flagged rows")
    assert(probed.forall { case (a, b) => probed.contains((b, a)) },
      "pair relation must be symmetric when batch = corpus")
    // append: a near-identical new row becomes probe-visible
    val base = m.orderBy("media_id").limit(1)
    val clone = base.selectExpr("media_id + 1000000 AS media_id", "kind", "payload")
    Multimodal.appendToMediaHashIndex(spark, dir, clone)
    val hits = Multimodal.probeMediaHashIndex(spark, dir, clone)
      .filter(org.apache.spark.sql.functions.col("hamming") === 0).collect()
    assert(hits.exists(_.getAs[Long]("index_id") ==
      base.collect().head.getAs[Long]("media_id")),
      "appended clone must collide with its original at hamming 0")
    // at-least-once replay of the same batch overwrites its own
    // deterministic batch partition instead of duplicating hash rows
    val nAfterFirst = spark.read.parquet(s"$dir/hashes").count()
    Multimodal.appendToMediaHashIndex(spark, dir, clone)
    assert(spark.read.parquet(s"$dir/hashes").count() == nAfterFirst,
      "replaying an appended batch must not duplicate hash rows")
    // the probe plan reads the hash parquet, never the media payloads
    val plan = Multimodal.probeMediaHashIndex(spark, dir, clone)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("hashes"), s"probe does not read the hash index:\n$plan")
  }
}

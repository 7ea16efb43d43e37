package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extraction /
  * frame-sampling operators (north-star training-data ops).
  *
  * The decode step is [[MediaDecoder]]: real header parsing for three
  * public container formats (BMP, binary PPM, RIFF/WAVE — this container
  * has no image/audio codec libraries, so COMPRESSED payload decoding is
  * the one part still out of scope) with the exact batching shape a full
  * decoder uses (`mapPartitions` over an iterator ≙ PySpark's
  * `mapInPandas` batch loop: amortized per-partition init, streaming
  * batches, no whole-partition materialization). Swap in a
  * JNI/opencv/ffmpeg call next to the header parse and nothing else
  * changes.
  *
  * Scale notes: payloads never pass through a shuffle — every operator
  * here is scan-local (projection or mapPartitions); frame sampling
  * explodes bounded `sequence()`s, not data-dependent unbounded arrays.
  */
object Multimodal {

  final val Kinds = Seq("image", "audio", "video")

  /** Frame-sampling geometry, shared by the operator, q37's plan column,
    * and q38's oracle SQL — one source of truth for the stand-in codec
    * parameters. */
  final val FrameBytes = 64
  final val MaxFrames = 8

  /** Synthesize a media table from `documents`: payload = utf8 bytes,
    * kind from a key residue, typed metadata struct. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(Kinds.map(lit): _*),
        pmod(col("doc_id"), lit(3)).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).as("n_bytes"),
        (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Expression-level fake feature vector: k chunk digests of the payload,
    * normalized to [0,1) — codegen'd, no UDF, deterministic. The digest is
    * md5-arithmetic (first 8 md5 hex chars as a 32-bit value) rather than
    * crc32: same cost class, but bitwise reproducible in DuckDB, which is
    * what gives q39 a value-level oracle. */
  final val FeatureK = 8
  final val FeatureChunk = 32
  def chunkFeatures(payload: Column, k: Int = FeatureK,
      chunk: Int = FeatureChunk): Column =
    array((0 until k).map { i =>
      round(
        conv(substring(md5(substring(payload, i * chunk + 1, chunk)), 1, 8), 16, 10)
          .cast("double") / 4294967296.0, 6)
    }: _*)

  /** Frame sampling for video-kind rows: fixed-length byte windows as
    * frame payloads (stand-in for ffmpeg keyframe extraction). Zero-frame
    * rows (empty payload) are filtered BEFORE the sequence: Spark's
    * `sequence(0, -1)` defaults to step -1 and yields [0, -1] — two
    * phantom frames — where the oracle's generate_series is empty. */
  def sampleFrames(media: DataFrame, frameBytes: Int = FrameBytes,
      maxFrames: Int = MaxFrames): DataFrame =
    media
      .filter(col("kind") === "video")
      .withColumn("n_frames",
        least(lit(maxFrames),
          ceil(length(col("payload")).cast("double") / frameBytes).cast("int")))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        posexplode(expr(s"sequence(0, n_frames - 1)")).as(Seq("frame_idx", "_s")))
      .drop("_s")

  /** Typed record for the batched decode path. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int,
      checksum: Long, feature0: Double, format: String,
      width: Int, height: Int, sample_rate: Int, n_channels: Int)

  /** Container-header decoder for three REAL public byte formats — BMP
    * (Windows bitmap, little-endian fixed offsets), binary PPM (P6,
    * ASCII header + raw RGB), and RIFF/WAVE (chunk walk to `fmt `) —
    * plus an `opaque` fallback for anything else (the synthetic corpus
    * payloads land there). This is genuine byte decoding with the exact
    * batching shape a full codec uses; compressed codecs (JPEG/H.264)
    * stay out of scope for this container, and their JNI binding would
    * slot into the same per-partition init in [[decodeBatch]]. */
  object MediaDecoder {
    final case class Parsed(format: String, width: Int, height: Int,
        sampleRate: Int, channels: Int)
    private val Opaque = Parsed("opaque", 0, 0, 0, 0)

    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def leShort(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    /** BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: width i32le @18,
      * height i32le @22 (negative height = top-down rows — report the
      * magnitude). */
    private def parseBmp(b: Array[Byte]): Parsed =
      if (b.length < 26) Opaque
      else Parsed("bmp", leInt(b, 18), math.abs(leInt(b, 22)), 0, 0)

    /** P6: "P6" <ws> width <ws> height <ws> maxval, '#' comments allowed
      * between tokens; pixel data follows the single whitespace after
      * maxval. */
    private def parsePpm(b: Array[Byte]): Parsed = {
      var i = 2
      def token(): Option[Int] = {
        while (i < b.length &&
          (Character.isWhitespace(b(i)) || b(i) == '#')) {
          if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
          else i += 1
        }
        val start = i
        while (i < b.length && Character.isDigit(b(i))) i += 1
        if (i > start) Some(new String(b, start, i - start).toInt) else None
      }
      (token(), token()) match {
        case (Some(w), Some(h)) => Parsed("ppm", w, h, 0, 0)
        case _ => Opaque
      }
    }

    /** RIFF size WAVE, then (id, size, payload) chunks; channels u16le and
      * sample rate u32le sit at offsets 2 and 4 of the `fmt ` chunk. */
    private def parseWav(b: Array[Byte]): Parsed = {
      if (b.length < 12 || new String(b, 8, 4, "US-ASCII") != "WAVE") return Opaque
      var off = 12
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = leInt(b, off + 4)
        if (id == "fmt " && off + 8 + 8 <= b.length)
          return Parsed("wav", 0, 0, leInt(b, off + 12), leShort(b, off + 10))
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      Opaque
    }

    def parse(b: Array[Byte]): Parsed =
      if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') parseBmp(b)
      else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') parsePpm(b)
      else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F'
        && b(3) == 'F') parseWav(b)
      else Opaque

    def decode(r: MediaRecord): DecodedMedia = {
      val crc = new java.util.zip.CRC32
      crc.update(r.payload)
      val p = parse(r.payload)
      DecodedMedia(r.media_id, r.kind, r.payload.length, crc.getValue,
        (crc.getValue % 1000000L).toDouble / 1000000.0,
        p.format, p.width, p.height, p.sampleRate, p.channels)
    }
  }

  /** mapPartitions-batched decode: per-partition decoder init amortized
    * across the iterator, exactly how a real codec binding is driven. */
  def decodeBatch(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRecord]
      .mapPartitions { iter =>
        // a compressed-codec handle would be created once per partition here
        iter.map(MediaDecoder.decode)
      }
  }

  // ---- registered queries ----------------------------------------------

  /** Media metadata plane (oracle-checked: byte lengths, kinds, frame
    * plans are plain arithmetic over the documents table). */
  val q37MultimodalMeta: QuerySpec = QuerySpec(
    "q37_multimodal_meta",
    s"""SELECT doc_id AS media_id,
      |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CAST(doc_id % 16 * 64 + 256 AS INT) AS width,
      |  CAST(doc_id % 9 * 64 + 256 AS INT) AS height,
      |  CAST(least($MaxFrames, ceil(CAST(octet_length(encode(text)) AS DOUBLE) / $FrameBytes)) AS INT) AS planned_frames
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (s, dir) =>
    mediaFromDocuments(Tables.documents(s, dir))
      .select(col("media_id"), col("kind"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        least(lit(MaxFrames),
          ceil(col("meta.n_bytes").cast("double") / FrameBytes).cast("int"))
          .as("planned_frames"))
      .orderBy("media_id")
  }

  /** Frame-sampling plan for video rows (oracle: bounded sequence
    * arithmetic). */
  val q38FrameSample: QuerySpec = QuerySpec(
    "q38_frame_sample",
    s"""WITH v AS (
      |  SELECT doc_id AS media_id,
      |    CAST(least($MaxFrames, ceil(CAST(octet_length(encode(text)) AS DOUBLE) / $FrameBytes)) AS INT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT media_id, n_frames,
      |  CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_idx
      |FROM v WHERE n_frames > 0
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    sampleFrames(mediaFromDocuments(Tables.documents(s, dir)))
      .select(col("media_id"), col("n_frames"), col("frame_idx"))
      .orderBy("media_id", "frame_idx")
  }

  /** DuckDB oracle for [[chunkFeatures]]: replays the md5-arithmetic chunk
    * digests over the same byte ranges (document text is ASCII, so DuckDB's
    * character substr ≡ Spark's byte substring on the utf8 payload) and the
    * same left-to-right square-sum fold. */
  private def mediaFeaturesOracleSql: String = {
    val feats = (0 until FeatureK).map { i =>
      s"round(CAST('0x'||substr(md5(substr(text, ${i * FeatureChunk + 1}, $FeatureChunk)),1,8) AS BIGINT)" +
        s" / 4294967296.0, 6) AS f_$i"
    }.mkString(",\n    ")
    val sq = (0 until FeatureK).map(i => s"f_$i * f_$i").foldLeft("0")((a, t) => s"($a + $t)")
    "WITH f AS (\n" +
      "  SELECT doc_id AS media_id,\n" +
      "    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,\n    " +
      feats + "\n  FROM documents)\n" +
      s"SELECT media_id, kind, round($sq, 6) AS feature_sq_norm, f_0 AS feature0\n" +
      "FROM f ORDER BY media_id"
  }

  /** Feature extraction over payload bytes — oracle-checked: the square-sum
    * fold runs over features rounded identically in both engines, so the
    * accumulation order (left-to-right in both) is bitwise stable. */
  val q39MediaFeatures: QuerySpec = QuerySpec(
    "q39_media_features", mediaFeaturesOracleSql) { (s, dir) =>
    mediaFromDocuments(Tables.documents(s, dir))
      .select(col("media_id"), col("kind"),
        chunkFeatures(col("payload")).as("features"))
      .select(col("media_id"), col("kind"),
        round(expr("aggregate(features, 0D, (a, v) -> a + v * v)"), 6).as("feature_sq_norm"),
        element_at(col("features"), 1).as("feature0"))
      .orderBy("media_id")
  }

  // ---- perceptual near-dup (dHash) -------------------------------------

  /** dHash geometry: an 8×9 sample grid gives 8 horizontal gradient bits
    * per row → a 64-bit hash; [[DhashMaxHamming]]+1 = 4 disjoint 16-bit
    * bands make the hamming-≤3 band join pigeonhole-LOSSLESS (any pair
    * within the budget agrees exactly on ≥1 band — q29's construction). */
  final val DhashGridRows = 8
  final val DhashGridCols = 9
  final val DhashMaxHamming = 3

  private final val DhashSamples = DhashGridRows * DhashGridCols
  private final val DhashBits = DhashGridRows * (DhashGridCols - 1)

  /** (offset, width) band split covering all [[DhashBits]] bits for a
    * hamming budget — maxHamming+1 disjoint bands (pigeonhole; q29's
    * construction, re-derived here for the 64-bit hash width). */
  private[graft] def dhashBandDefs(maxHamming: Int): Seq[(Int, Int)] = {
    val n = maxHamming + 1
    val base = DhashBits / n
    val extra = DhashBits % n
    val widths = Seq.tabulate(n)(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths).map { case (off, w) => (off, w) }
  }

  /** Band mask: for a full-width 64-bit band the shift-and-mask idiom
    * breaks (shift amounts are mod 64 in both engines), but widths here
    * are ≤ 64/(maxHamming+1) ≤ 32 for any budget ≥ 1, and the budget-0
    * single 64-bit band uses the hash itself. */
  private[graft] def bandMask(w: Int): Long =
    if (w >= 64) -1L else (1L << w) - 1

  /** Deterministic sample positions: 1 + k·(n−1) DIV (samples−1) — pure
    * integer arithmetic (a float scale factor would hang the oracle on
    * rounding ties at band boundaries). Payloads shorter than the grid
    * just resample bytes, exactly like downscaling a tiny image. */
  private def samplePos(k: Int, lenCol: String): String =
    s"1 + CAST($k * ($lenCol - 1) AS BIGINT) DIV ${DhashSamples - 1}"

  /** The scan-local hash projection: one (media_id, kind, dhash) row per
    * media row with ≥ 2 payload bytes (below the grid's resolution). */
  def hashMedia(media: DataFrame): DataFrame = {
    val txt = media.select(col("media_id"), col("kind"),
      col("payload").cast("string").as("txt"))
      .withColumn("n", length(col("txt")).cast("long"))
      .filter(col("n") >= 2)
    val sampled = txt.select(col("media_id") +: col("kind") +:
      (0 until DhashSamples).map(k =>
        expr(s"ascii(substr(txt, ${samplePos(k, "n")}, 1))").as(s"s_$k")): _*)
    val hash = (for {
      r <- 0 until DhashGridRows
      c <- 0 until DhashGridCols - 1
    } yield when(col(s"s_${r * DhashGridCols + c}") >
        col(s"s_${r * DhashGridCols + c + 1}"),
      lit(1L << (r * (DhashGridCols - 1) + c))).otherwise(0L))
      .reduce(_ + _)
    sampled.select(col("media_id"), col("kind"), hash.as("dhash"))
  }

  /** Band-key probe rows (media_id, dhash, band, band_val) for a hashed
    * frame — the pigeonhole join keys, id+hash only. */
  private def bandProbes(hashed: DataFrame, maxHamming: Int): DataFrame = {
    val bandCols = dhashBandDefs(maxHamming).zipWithIndex.map {
      case ((off, w), i) =>
        struct(lit(i).as("band"),
          (if (w >= 64) col("dhash")
           else shiftright(col("dhash"), off).bitwiseAND(bandMask(w)))
            .as("band_val"))
    }
    hashed
      .select(col("media_id"), col("dhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("media_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.band_val").as("band_val"))
  }

  /** Perceptual near-duplicate audit over media payloads — the multimodal
    * twin of the text near-dup family: a difference hash (dHash, the
    * published perceptual-hash scheme: resample to a fixed grid, emit one
    * bit per horizontal gradient) over a deterministic byte-sample grid,
    * then the q29 banded-pigeonhole hamming join. Two images that differ
    * by re-encoding/minor edits keep most gradients, so they land within
    * the hamming budget; the band join finds them without an all-pairs
    * scan. The pixel source is the payload byte grid (the container has
    * no codecs — a real deployment swaps [[MediaDecoder]]'s decoded
    * luma plane into the SAME grid sampling; nothing downstream changes).
    *
    * Audit shape (q65/q84 contract): EVERY media row with its hash and
    * neighbor stats, so the oracle pins all 64 bits of every hash, not
    * just the pairs. Rows below 2 bytes are below the grid's resolution
    * and are filtered in both engines.
    *
    * Scale shape: the hash is one scan-local projection (72 byte reads,
    * 64 comparisons, codegen'd); candidates are an id-only equi-join on
    * (band, 16-bit pattern) — collisions ≈ N²/2¹⁶ per band, never
    * all-pairs; the exact `bit_count(xor)` filter touches candidates
    * only; the final left join attaches neighbor stats back to the
    * audit rows on media_id. The hash subtree is referenced three times
    * (both self-join sides + the audit rows) and plans as three scans of
    * the cheap projection (measured: the alias-renamed probe sides do NOT
    * canonicalize to a reused exchange) — q29's self-join carries the
    * same trade; [[buildMediaHashIndex]]/[[probeMediaHashIndex]] is the
    * implemented amortization once hashes are probed by many batches
    * (payloads scanned once at build, probes read 16-byte hash rows). */
  def mediaNearDup(media: DataFrame,
      maxHamming: Int = DhashMaxHamming): DataFrame = {
    require(maxHamming >= 0 && maxHamming < DhashBits,
      s"maxHamming must be in [0, $DhashBits), got $maxHamming")
    val hashed = hashMedia(media)
    // ONE (band, band_val) exchange shared by both self-join sides (r13,
    // the q82 winnow pattern): the alias-renamed sides are projections
    // over the same exchange child, so ReuseExchange dedups them and the
    // payload hash subtree evaluates once for the probe rows instead of
    // once per side; the join's clustering requirement is satisfied by
    // the same exchange (guide §2.4). Measured: q99 3 payload scans → 2.
    val probes = bandProbes(
      hashed.select(col("media_id"), col("dhash")), maxHamming)
      .repartition(col("band"), col("band_val"))
    val near = probes.toDF("id_a", "ha", "band", "band_val")
      .join(probes.toDF("id_b", "hb", "band", "band_val"),
        Seq("band", "band_val"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b", "ha", "hb")
      .dropDuplicates("id_a", "id_b")
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .groupBy(col("id_a").as("media_id"))
      .agg(count(lit(1)).as("nn"), min(col("id_b")).as("ni"))
    hashed.join(near, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("dhash"),
        coalesce(col("nn"), lit(0L)).as("n_near"),
        col("ni").as("near_min_id"))
  }

  /** Persist the media hash index: one (media_id, kind, dhash) row per
    * media row — 8 bytes of hash instead of the payload. The build pays
    * the payload scan ONCE; every probe batch afterwards reads only the
    * hash column ([[Similarity.buildIvfIndex]]'s build-once pattern,
    * which the inline [[mediaNearDup]] audit — three payload scans per
    * run — exists to be amortized INTO). Append-only maintenance mirrors
    * [[Similarity.appendToIvfIndex]]: new batches append their hash rows,
    * no existing file is rewritten. */
  def buildMediaHashIndex(media: DataFrame, dir: String): Unit =
    hashMedia(media)
      .withColumn("batch", lit(graft.pipeline.Store.batchToken(media, "media_id")))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$dir/hashes")

  /** Append a batch's hashes to a persisted index without a rebuild —
    * committed as ONE `batch=` partition keyed by a deterministic
    * content-derived token (the shared
    * [[graft.pipeline.Store.commitBatchPartition]] protocol, round 13),
    * so an at-least-once replay overwrites its own partition instead of
    * duplicating hash rows, and readers never observe a half-written
    * batch (hidden staging + one atomic rename). */
  def appendToMediaHashIndex(spark: SparkSession, dir: String,
      batch: DataFrame): Unit = {
    graft.pipeline.Store.sweepBatchLeftovers(spark, s"$dir/hashes")
    graft.pipeline.Store.commitBatchPartition(spark, s"$dir/hashes",
      graft.pipeline.Store.batchToken(batch, "media_id"), hashMedia(batch))
  }

  /** Probe a persisted hash index: hash the incoming batch inline (small
    * by contract), band-join against the saved hashes, exact hamming
    * filter — [[mediaNearDup]]'s candidate machinery with the corpus
    * side reading 16-byte rows instead of re-hashing payloads. Returns
    * (batch_id, index_id, hamming) candidate pairs; self-matches by id
    * are excluded so a batch already appended to the index can probe it.
    * ExtSpec pins probe-after-build ≡ the inline audit's pair set. */
  def probeMediaHashIndex(spark: SparkSession, dir: String,
      batch: DataFrame, maxHamming: Int = DhashMaxHamming): DataFrame = {
    require(maxHamming >= 0 && maxHamming < DhashBits,
      s"maxHamming must be in [0, $DhashBits), got $maxHamming")
    val saved = spark.read.parquet(s"$dir/hashes")
      .select(col("media_id").as("index_id"), col("dhash").as("hb"))
    val probes = bandProbes(hashMedia(batch)
      .select(col("media_id"), col("dhash")), maxHamming)
      .toDF("batch_id", "ha", "band", "band_val")
    probes
      .join(bandProbes(saved.toDF("media_id", "dhash"), maxHamming)
        .toDF("index_id", "hb", "band", "band_val"),
        Seq("band", "band_val"))
      .filter(col("batch_id") =!= col("index_id"))
      .select("batch_id", "index_id", "ha", "hb")
      .dropDuplicates("batch_id", "index_id")
      .select(col("batch_id"), col("index_id"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** q99: the dHash near-dup audit over the synthetic media table.
    * Oracle replays the byte-sample grid, all 64 gradient bits, the
    * band split, and the hamming join in DuckDB integer arithmetic. */
  val q99MediaNearDup: QuerySpec = QuerySpec(
    "q99_media_neardup", {
      val samples = (0 until DhashSamples).map(k =>
        s"ascii(substr(txt, 1 + ($k * (n - 1)) // ${DhashSamples - 1}, 1)) AS s_$k")
        .mkString(",\n    ")
      val bits = (for {
        r <- 0 until DhashGridRows
        c <- 0 until DhashGridCols - 1
      } yield s"(CASE WHEN s_${r * DhashGridCols + c} > s_${r * DhashGridCols + c + 1}" +
        s" THEN CAST(${1L << (r * (DhashGridCols - 1) + c)} AS BIGINT) ELSE 0 END)")
        .mkString("\n      + ")
      s"""WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |    text AS txt, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE length(text) >= 2),
        |s AS (
        |  SELECT media_id, kind,
        |    $samples
        |  FROM m),
        |h AS (
        |  SELECT media_id, kind,
        |    $bits AS dhash
        |  FROM s),
        |pr AS (
        |  ${dhashBandDefs(DhashMaxHamming).zipWithIndex.map { case ((off, w), i) =>
             s"SELECT media_id, dhash, $i AS band, (dhash >> $off) & ${bandMask(w)} AS band_val FROM h"
           }.mkString("\n  UNION ALL\n  ")}),
        |cand AS (
        |  SELECT DISTINCT x.media_id AS id_a, y.media_id AS id_b,
        |    x.dhash AS ha, y.dhash AS hb
        |  FROM pr x JOIN pr y
        |    ON x.band = y.band AND x.band_val = y.band_val
        |    AND x.media_id <> y.media_id),
        |near AS (
        |  SELECT id_a, CAST(count(*) AS BIGINT) AS n_near, min(id_b) AS near_min_id
        |  FROM cand WHERE bit_count(xor(ha, hb)) <= $DhashMaxHamming
        |  GROUP BY id_a)
        |SELECT h.media_id AS media_id, h.kind AS kind, h.dhash AS dhash,
        |  CAST(coalesce(near.n_near, 0) AS BIGINT) AS n_near,
        |  near.near_min_id AS near_min_id
        |FROM h LEFT JOIN near ON near.id_a = h.media_id
        |ORDER BY media_id""".stripMargin
    }) { (s, dir) =>
    mediaNearDup(mediaFromDocuments(Tables.documents(s, dir)))
      .orderBy("media_id")
  }

  val all: Seq[QuerySpec] = Seq(q37MultimodalMeta, q38FrameSample,
    q39MediaFeatures, q99MediaNearDup)
}

package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents`: exact (hash-groupBy), n-gram
  * Jaccard near-dup, MinHash+LSH, and SimHash (north-star training-data
  * ops).
  *
  * Scale design:
  *  - exact dedup is one shuffle on the 16-byte digest, never on the text;
  *  - exact pairwise Jaccard is O(pairs-sharing-a-shingle) — fine for a
  *    bounded slice, quadratic at corpus scale, so it is deliberately
  *    restricted (doc_id bound) and exists as the *oracle* for the
  *    sub-quadratic MinHash/LSH path, which is the 100 TB route:
  *    signatures are a fixed-width aggregate per doc, banding turns
  *    near-dup search into an equi-join on (band, band-hash);
  *  - SimHash reduces each doc to 48 bits; hamming-ball search is a
  *    pigeonhole band equi-join (split the signature into maxHamming+1
  *    bands — any pair within the hamming budget shares ≥1 exact band),
  *    never an all-pairs scan.
  *
  * Base hashes are md5-arithmetic (`conv(substr(md5(x),1,8),16,10)` — a
  * uniform 32-bit value) rather than xxhash64: bitwise reproducible in any
  * engine with md5 (DuckDB: `CAST('0x'||substr(md5(x),1,8) AS BIGINT)`),
  * which is what lets MinHash/SimHash carry full value-level SQL oracles.
  * md5 costs more per call than xxhash64 but is computed once per
  * shingle/token occurrence in a scan-local projection — not in a shuffle
  * or join path — so the scale shape is unchanged.
  */
object Dedup {

  /** Every injected-clone BASE id must stay below this bound, so the
    * +1e8 / +3e8 offset ranges can never collide with a base id. The
    * bound clears the 9x clone-chain corpus (max doc_id ~2.2e7 — its
    * tier-2 clones sit at offset 2·1e7); a corpus past 1e8 fails LOUDLY
    * at scan instead of silently fanning out the flag joins identically
    * in both engines. */
  final val InjectedIdBound = 100000000L

  /** Offset an injected clone's doc_id, failing LOUDLY if the base corpus
    * has grown past [[InjectedIdBound]]: a silent collision would fan out
    * the flag/dedup joins IDENTICALLY in both engines, so the DuckDB
    * oracle could never catch the corruption (the repo's "enforced
    * loudly, not assumed" discipline). Scan-local codegen'd guard — no
    * extra pass, no shuffle. */
  def injectedId(id: Column, offset: Long): Column = {
    require(offset % InjectedIdBound == 0 && offset >= InjectedIdBound,
      s"injected offsets must be multiples of $InjectedIdBound, got $offset")
    when(id >= 0 && id < InjectedIdBound, id + offset)
      .otherwise(raise_error(concat(
        lit(s"injected-clone id scheme requires base doc_id in " +
          s"[0, $InjectedIdBound), got "), id.cast("string"))))
  }

  /** The q114 injected corpus ("i711u_1e8" cache variants): every %7==0
    * doc cloned verbatim at offset 1e8, every %11==3 doc cloned
    * UPPER-cased with trailing "  !!" at offset 3e8. Extracted (round 12)
    * so the bench's untimed cache prewarm and the registered consumer
    * build the SAME corpus — the variant name IS the construction
    * identity, and two call sites free-handing it could silently fork. */
  def corpusI711u(d: DataFrame): DataFrame = d
    .unionByName(d.filter(col("doc_id") % 7 === 0)
      .select(injectedId(col("doc_id"), 100000000L).as("doc_id"),
        col("text")))
    .unionByName(d.filter(col("doc_id") % 11 === 3)
      .select(injectedId(col("doc_id"), 300000000L).as("doc_id"),
        concat(upper(col("text")), lit("  !!")).as("text")))

  /** The q190 injected corpus ("i711r_1e8" cache variants): %7==0 docs
    * cloned verbatim at offset 1e8, %11==3 docs cloned with word order
    * REVERSED at offset 3e8 (same token multiset — the MinHash-blind,
    * SimHash-blind-ish probe), `source` carried through for the
    * agreement card. Same extraction rationale as [[corpusI711u]]. */
  def corpusI711r(d: DataFrame): DataFrame = d
    .unionByName(d.filter(col("doc_id") % 7 === 0)
      .select(injectedId(col("doc_id"), 100000000L).as("doc_id"),
        col("text"), col("source")))
    .unionByName(d.filter(col("doc_id") % 11 === 3)
      .select(injectedId(col("doc_id"), 300000000L).as("doc_id"),
        array_join(reverse(split(col("text"), " ")), " ").as("text"),
        col("source")))

  /** Cross-engine-deterministic 32-bit base hash of a string column. */
  private def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The DuckDB spelling of [[md5Hash32]] applied to SQL fragment `x`. */
  private def md5Hash32Sql(x: String): String =
    s"CAST('0x'||substr(md5($x),1,8) AS BIGINT)"

  /** 48-bit variant for SimHash: the signature is only as wide as its base
    * hash (bits above it would vote -1 on every token and freeze to 0,
    * collapsing one pigeonhole band to a single value = all-pairs). 12 hex
    * chars = 48 uniform bits, still comfortably inside BIGINT. */
  private def md5Hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  private def md5Hash48Sql(x: String): String =
    s"CAST('0x'||substr(md5($x),1,12) AS BIGINT)"

  /** Distinct word-n-gram rows per doc — ONE generator for every gram
    * consumer (shingles, decontamination fingerprints), so the tokenizer
    * and the drop-short-docs contract can't drift between them. Docs
    * shorter than n tokens are dropped. The words array is materialized
    * as its own projection first — inlining `split()` into each `slice()`
    * re-tokenizes the text once per gram, turning an O(words) row into
    * O(words²). `hashed` emits the md5 fingerprint instead of the text
    * (for probes that never need the gram itself). */
  private def gramRows(docs: DataFrame, n: Int, outCol: String,
      hashed: Boolean): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    val gram = s"concat_ws(' ', slice(w, i, $n))"
    val gramExpr = if (hashed) s"md5($gram)" else gram
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        expr(s"transform(sequence(1, size(w) - ${n - 1}), i -> $gramExpr)")))
        .as(outCol))
  }

  /** Word-shingle width for the near-dup detector family. Part of
    * [[PairsCodeToken]]: changing it invalidates every cached pair
    * frame automatically (the token interpolates THIS constant, not a
    * free-floating copy of it). */
  final val ShingleWidth = 3

  /** Distinct [[ShingleWidth]]-gram word shingles per document, exploded
    * to (doc_id, shingle) rows. */
  def shingleRows(docs: DataFrame): DataFrame =
    gramRows(docs, ShingleWidth, "shingle", hashed = false)

  /** Exact content dedup: group by md5 digest, keep the smallest doc_id
    * (D2/D3 generalized to corpora; one digest shuffle). */
  def exactDedupGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Canonical text normalization applied BEFORE fingerprinting —
    * lowercase, strip non-alphanumerics to spaces, collapse runs, trim.
    * Raw-byte dedup misses trivially-reformatted copies (case changes,
    * punctuation, doubled whitespace — the dominant near-exact class on
    * scraped corpora); normalizing first is the standard recipe step.
    * Pure scan-local expressions, so the fingerprint stays the only
    * thing that ever shuffles. Spark's regexp_replace is global by
    * default; the DuckDB twin needs the explicit 'g' flag. */
  def normalizeForDedup(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  private[ext] def normalizeForDedupSql(x: String): String =
    s"trim(regexp_replace(regexp_replace(lower($x), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Dedup groups keyed on the NORMALIZED fingerprint, with the count of
    * distinct RAW fingerprints inside each group made observable —
    * n_raw_variants > 1 is exactly the set a raw-byte dedup would have
    * missed. Same one-digest-shuffle shape as [[exactDedupGroups]]. */
  def normalizedDedupGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        md5(normalizeForDedup(col("text"))).as("norm_fp"),
        md5(col("text")).as("raw_fp"))
      .groupBy("norm_fp")
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("raw_fp")).as("n_raw_variants"))

  /** Exact pairwise Jaccard over distinct shingle sets via shingle
    * equi-join (candidate generation) + per-pair intersection counts. */
  def jaccardPairs(docs: DataFrame, minJaccard: Double): DataFrame =
    jaccardPairsWithRaw(docs, minJaccard)
      .select("doc_a", "doc_b", "jaccard")

  /** [[jaccardPairs]] plus the UNROUNDED `jaccard_raw` column — the form
    * the pair-frame cache materializes: the public `jaccard` is
    * round-half-up at 4 decimals, so a threshold re-applied to the
    * ROUNDED value could admit a pair the fresh operator rejects (raw
    * 0.29996 rounds to 0.3000); cached consumers re-filter on the raw
    * value and stay bit-identical to a fresh run. */
  private[ext] def jaccardPairsWithRaw(docs: DataFrame,
      minJaccard: Double): DataFrame = {
    val sh = shingleRows(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = sh.as("a")
    val b = sh.as("b")
    val common = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "n_b"), "doc_b")
      .withColumn("jaccard_raw",
        col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard_raw") >= minJaccard)
      .select(col("doc_a"), col("doc_b"),
        graft.functions.Functions.round4(col("jaccard_raw")).as("jaccard"),
        col("jaccard_raw"))
  }

  /** Asymmetric containment: |shingles(a) ∩ shingles(b)| / |shingles(a)| —
    * catches quotes/excerpts/supersets that symmetric Jaccard misses (a
    * short doc fully contained in a long one scores low Jaccard but 1.0
    * containment). Same candidate equi-join as [[jaccardPairs]]; both
    * directions emitted per unordered pair. */
  def containmentPairs(docs: DataFrame, minContainment: Double): DataFrame = {
    val sh = shingleRows(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "n_a"), "doc_a")
      .withColumn("containment", col("n_common").cast("double") / col("n_a"))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"),
        graft.functions.Functions.round4(col("containment")).as("containment"))
  }

  // ---- MinHash ----------------------------------------------------------

  /** k universal hash functions over a base 32-bit shingle hash:
    * h_i(x) = (a_i·x + b_i) mod p (public MinHash construction). Base hash
    * is [[md5Hash32]] — cross-engine deterministic, so q28 carries a full
    * value-level DuckDB oracle; semantics are additionally asserted against
    * exact Jaccard in ScalaTest. */
  final val MinhashK = 16
  final val Bands = 4 // 4 bands × 4 rows
  private final val P = 4294967311L // first prime > 2^32
  private def hashParams(i: Int): (Long, Long) =
    (1103515245L + 12345L * (i + 1), 97531L * (i + 1) + 12582917L)

  /** Per-doc MinHash signature columns sig_0..sig_{k-1}. Base hash is
    * folded into 2^31 space first so a·h + b stays well inside Long under
    * ANSI arithmetic (Spark 4 default). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = shingleRows(docs)
      .withColumn("h", pmod(md5Hash32(col("shingle")), lit(2147483647L)))
    val sigs = (0 until MinhashK).map { i =>
      val (a, b) = hashParams(i)
      min(pmod(col("h") * a + b, lit(P))).as(s"sig_$i")
    }
    sh.groupBy("doc_id").agg(sigs.head, sigs.tail: _*)
  }

  /** LSH banding: (doc_id, band, band_key) rows; docs sharing a band key
    * are near-dup candidates — an equi-join, not an all-pairs scan. The
    * band key is the concatenated row-signature string (cross-engine
    * deterministic; a fixed-width hash of it would shave shuffle bytes at
    * scale but costs oracle parity — the join shape is identical). */
  def lshBands(sigs: DataFrame): DataFrame = {
    val rows = MinhashK / Bands
    val bandCols = (0 until Bands).map { bnd =>
      val parts = (0 until rows).map(r => col(s"sig_${bnd * rows + r}"))
      struct(lit(bnd).as("band"),
        concat_ws("_", parts.map(_.cast("string")): _*).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs from band collisions, scored by signature agreement
    * (estimates Jaccard). Signatures are recomputed per consumer rather
    * than cached: a `.cache()` inside a lazy operator leaks an
    * InMemoryRelation per invocation for the session's lifetime. At real
    * scale the signature frame is persisted once as a table by the caller
    * and both the band join and the re-join read it. */
  def minhashCandidates(docs: DataFrame, minEstimate: Double): DataFrame =
    candidatesFromSigs(minhashSignatures(docs), minEstimate)

  /** Band-collision candidates + signature-agreement scores from an
    * EXISTING signature frame — the shared core of [[minhashCandidates]]
    * and the maintained pair index ([[buildPairIndex]]), where the
    * signatures are state and the raw text is never re-shingled. */
  private[ext] def candidatesFromSigs(sigs: DataFrame,
      minEstimate: Double): DataFrame = {
    val bands = lshBands(sigs)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    scoreCandidates(cand, sigs, minEstimate)
  }

  /** Score (doc_a, doc_b) candidates by signature agreement — estimates
    * Jaccard as the fraction of equal MinHash components (multiples of
    * 1/[[MinhashK]], exact at 4 decimals, so stored scores re-filter
    * losslessly at any threshold). */
  private def scoreCandidates(cand: DataFrame, sigs: DataFrame,
      minEstimate: Double): DataFrame = {
    val sigA = sigs.toDF(sigs.columns.toIndexedSeq.map(c => s"a_$c"): _*)
    val sigB = sigs.toDF(sigs.columns.toIndexedSeq.map(c => s"b_$c"): _*)
    val agree = (0 until MinhashK)
      .map(i => when(col(s"a_sig_$i") === col(s"b_sig_$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigA, col("doc_a") === col("a_doc_id"))
      .join(sigB, col("doc_b") === col("b_doc_id"))
      .withColumn("est_jaccard",
        round(agree.cast("double") / MinhashK, 4))
      .filter(col("est_jaccard") >= minEstimate)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  // ---- SimHash ----------------------------------------------------------

  final val SimhashBits = 48

  /** 48-bit SimHash per doc from token-frequency-weighted bit votes.
    * Votes are summed ±1 per token OCCURRENCE in a single doc_id
    * aggregation — identical totals to the textbook per-(doc, token)
    * count-then-weight form (Σ_tokens cnt·sign ≡ Σ_occurrences sign), but
    * one shuffle instead of two and no (doc, token) aggregation state.
    * Token hash is [[md5Hash48]] so the signature is bitwise reproducible
    * in DuckDB (q29's oracle). 48 bits (vs an earlier 16) keeps the
    * hamming-≤2 pigeonhole bands 16 bits wide, so the band equi-join is
    * genuinely sub-quadratic (collisions ≈ N²/2¹⁶ per band, not N²/2⁵);
    * sums of non-overlapping bit values stay far inside BIGINT in both
    * engines (2⁴⁸−1), clear of ANSI overflow. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
      .withColumn("h", md5Hash48(col("token")))
    val bitSums = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"bit_$b")
    }
    val agged = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimhashBits)
      .map(b => when(col(s"bit_$b") > 0, 1L << b).otherwise(0L))
      .reduce(_ + _)
    agged.select(col("doc_id"), sig.as("simhash"))
  }

  /** Band split of the signature for hamming-ball search: for a budget of
    * `maxHamming` differing bits, `maxHamming + 1` disjoint bands guarantee
    * (pigeonhole) that any qualifying pair agrees EXACTLY on at least one
    * band. (offset, width) pairs covering all [[SimhashBits]] bits. */
  private def simhashBandDefs(maxHamming: Int): Seq[(Int, Int)] = {
    val n = maxHamming + 1
    val base = SimhashBits / n
    val extra = SimhashBits % n
    val widths = Seq.tabulate(n)(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths).map { case (off, w) => (off, w) }
  }

  /** Near-dup pairs by SimHash hamming distance — a banded pigeonhole
    * equi-join, NOT an all-pairs scan: each doc emits one row per band
    * keyed by that band's exact bit pattern; candidates are pairs sharing
    * ≥1 (band, pattern) key (an equi-join shuffle on a small key), and the
    * exact hamming filter runs only on candidates. The 8-byte signature
    * rides along with the probe rows, so no re-join to recover it. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < SimhashBits,
      s"maxHamming must be in [0, $SimhashBits), got $maxHamming")
    val s = simhash(docs)
    val bandCols = simhashBandDefs(maxHamming).zipWithIndex.map {
      case ((off, w), i) =>
        struct(lit(i).as("band"),
          shiftright(col("simhash"), off).bitwiseAND((1 << w) - 1).as("band_val"))
    }
    val probes = s
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.band_val").as("band_val"))
    val a = probes.toDF("doc_a", "sim_a", "band", "band_val")
    val b = probes.toDF("doc_b", "sim_b", "band", "band_val")
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---- corpus-fingerprint pair-frame cache --------------------------------

  /** Materialized pair-frame cache — the BPE / q145 layout-cache
    * discipline applied to the banded detector chains: q27/q28/q29/q60/
    * q79/q90/q106/q107/q114/q190 each re-derive a MinHash-banded,
    * SimHash-banded or exact-Jaccard pair frame from raw text, and in a
    * production pipeline the pair frame is materialized ONCE per corpus
    * version and every consumer reads it. Each variant is built once per
    * (source path, content fingerprint, [[PairsCodeToken]]); a
    * REGENERATED corpus at the same path changes the fingerprint (file
    * list + sizes + mtimes) and an ALGORITHM change bumps the code
    * token, so stale frames can never serve either way. Keying, the
    * ready-marker + rename publish, age-gated GC and the cluster-true
    * Hadoop-FS discipline live in [[CorpusCache]] (round 12 — shared
    * with the q145 layout cache). ExtSpec pins cached ≡ fresh per
    * variant. */
  /** Code token for the pair-frame cache key: hashes every algorithm
    * parameter a cached frame bakes in — MinHash k and band count, the
    * shingle width, SimHash bits, and the exact-Jaccard superset frame's
    * slice/threshold bounds — each interpolated from the constant the
    * algorithm itself reads, so a parameter change CANNOT miss the
    * token. Changing any of them invalidates all published variants
    * automatically; without the token, a machine that built frames
    * under the old parameters would silently serve them to the new code
    * (the `_1e8` variant suffix covers CORPUS-construction changes the
    * same way, by hand). */
  private[graft] val PairsCodeToken: String = CorpusCache.md5Hex(
    s"mh$MinhashK|b$Bands|sh$ShingleWidth|sb$SimhashBits|" +
      s"jc$JaccardCacheMaxId|f$JaccardCacheFloor|v1").take(8)

  private[ext] def materializedPairFrame(s: org.apache.spark.sql.SparkSession,
      dir: String, variant: String, build: () => DataFrame): DataFrame = {
    val fp = Rollup.dirFingerprint(s, s"$dir/documents.parquet")
    val table = CorpusCache.materialize(s, "graft_pairs", dir, fp,
      PairsCodeToken, variant,
      stage => build().write.mode("overwrite").parquet(s"$stage/data"))
    s.read.parquet(s"$table/data")
  }

  /** Build every corpus-keyed cache artifact the registered queries
    * consume — the bench's UNTIMED prewarm hook (round 12): on a fresh
    * machine the six pair-frame variants, the q145 layout and the BPE
    * merge table otherwise land in whichever timed first iteration
    * touches them, so per-query medians carry a one-time infra cost that
    * is neither the query's steady state nor comparable across runs.
    * Builders run the BUILD closures only (parquet writes inside
    * [[CorpusCache.materialize]]); no registered query's full plan runs,
    * so no query is systematically JIT-advantaged beyond the existing
    * composite warm-up's shared-expression class. Idempotent: a warm
    * machine pays six `_READY` existence probes. */
  def prewarmCaches(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    jaccardPairsCached(s, dir, JaccardCacheMaxId, JaccardCacheFloor)
    minhashCandidatesCached(s, dir, 0.0)
    simhashPairsCached(s, dir, 2)
    val du = graft.Tables.documents(s, dir).select("doc_id", "text")
    minhashCandidatesCachedOn(s, dir, "i711u_1e8", () => corpusI711u(du), 0.5)
    val dr = graft.Tables.documents(s, dir).select("doc_id", "text", "source")
    minhashCandidatesCachedOn(s, dir, "i711r_1e8", () => corpusI711r(dr), 0.5)
    simhashPairsCachedOn(s, dir, "i711r_1e8", () => corpusI711r(dr), 2)
    ()
  }

  /** The exact-Jaccard cache's slice bound and threshold floor: ONE frame
    * (pairs among doc_id < 1000 at raw jaccard ≥ 0.05) serves every exact
    * consumer — q106 as-is; q107 re-filtered at 0.3; q27/q60/q79
    * re-filtered at 0.3 AND both ids < 300 (Jaccard is pairwise, so a
    * sub-slice's pair set is exactly the id-restricted superset frame). */
  final val JaccardCacheMaxId = 1000
  final val JaccardCacheFloor = 0.05

  /** Exact-Jaccard pairs for a registered slice, served from the cached
    * superset frame. Filters run on the cached RAW jaccard (see
    * [[jaccardPairsWithRaw]]), so results are bit-identical to a fresh
    * `jaccardPairs(docs.filter(doc_id < maxId), minJaccard)`. */
  def jaccardPairsCached(s: org.apache.spark.sql.SparkSession, dir: String,
      maxId: Int, minJaccard: Double): DataFrame = {
    require(maxId <= JaccardCacheMaxId && minJaccard >= JaccardCacheFloor,
      s"slice $maxId / threshold $minJaccard not derivable from the " +
        s"cached frame (<= $JaccardCacheMaxId at >= $JaccardCacheFloor)")
    materializedPairFrame(s, dir, "jp1000", () =>
      jaccardPairsWithRaw(
        graft.Tables.documents(s, dir)
          .filter(col("doc_id") < JaccardCacheMaxId)
          .select("doc_id", "text"),
        JaccardCacheFloor))
      .filter(col("doc_a") < maxId && col("doc_b") < maxId &&
        col("jaccard_raw") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash candidates over the raw corpus (or an id-bounded slice of
    * it), served from ONE cached threshold-0 frame: band collisions are
    * per-doc, so a slice's candidate set is exactly the id-restricted
    * full-corpus set, and `est_jaccard` (multiples of 1/16 — exact at 4
    * decimals) re-filters losslessly. */
  def minhashCandidatesCached(s: org.apache.spark.sql.SparkSession,
      dir: String, minEstimate: Double,
      maxId: Option[Int] = None): DataFrame =
    materializedPairFrame(s, dir, "mh_full", () =>
      minhashCandidates(
        graft.Tables.documents(s, dir).select("doc_id", "text"), 0.0))
      .filter(col("est_jaccard") >= minEstimate &&
        maxId.map(m => col("doc_a") < m && col("doc_b") < m)
          .getOrElse(lit(true)))

  /** MinHash candidates over a NAMED injected-corpus variant (q114's
    * clone+reformat corpus, q190's clone+reverse corpus): the variant
    * string IS the construction identity, so callers must pass the same
    * corpus for the same name — both registered consumers build theirs
    * from the fingerprinted source table, which also keys the cache.
    * If the CONSTRUCTION changes (offsets, clone rules), the variant
    * name MUST change with it — the content fingerprint only tracks the
    * source table, not the code (the `_1e8` suffix marks the round-11
    * offset scheme). */
  def minhashCandidatesCachedOn(s: org.apache.spark.sql.SparkSession,
      dir: String, variant: String, corpus: () => DataFrame,
      minEstimate: Double): DataFrame =
    materializedPairFrame(s, dir, s"mh_$variant", () =>
      minhashCandidates(corpus().select("doc_id", "text"), 0.0))
      .filter(col("est_jaccard") >= minEstimate)

  /** SimHash pairs over the raw corpus, cached per hamming budget (the
    * budget shapes the banding itself, so it is part of the key). */
  def simhashPairsCached(s: org.apache.spark.sql.SparkSession,
      dir: String, maxHamming: Int): DataFrame =
    materializedPairFrame(s, dir, s"sh_full_h$maxHamming", () =>
      simhashPairs(
        graft.Tables.documents(s, dir).select("doc_id", "text"), maxHamming))

  /** SimHash pairs over a NAMED injected-corpus variant. */
  def simhashPairsCachedOn(s: org.apache.spark.sql.SparkSession,
      dir: String, variant: String, corpus: () => DataFrame,
      maxHamming: Int): DataFrame =
    materializedPairFrame(s, dir, s"sh_${variant}_h$maxHamming", () =>
      simhashPairs(corpus().select("doc_id", "text"), maxHamming))

  // ---- maintained pair index (persisted, crash-safe, append ≡ rebuild) --

  /** Persisted MinHash pair INDEX — the incremental-maintenance twin of
    * the fingerprint-keyed pair-frame cache above: the cache rebuilds
    * ALL pairs whenever the corpus fingerprint changes, which is the
    * right contract for a reproducible corpus VERSION but the wrong cost
    * model for a live ingest stream, where each admitted batch should
    * fold in at band-join-the-new-docs cost (q71's admit discipline
    * applied to the index itself; the [[Similarity.appendToIvfIndex]] /
    * [[Multimodal.appendToMediaHashIndex]] precedent). State under `dir`:
    *
    *  - `sigs`: (doc_id, sig_0..sig_{k-1}) — per-doc MinHash signatures.
    *    The expensive raw-text shingling is paid exactly once per doc,
    *    at admit time; no maintenance op ever re-reads covered text.
    *  - `pairs`: (doc_a, doc_b, est_jaccard) — every band-collision pair
    *    at threshold 0. Scores are agreement fractions (multiples of
    *    1/[[MinhashK]], exact at 4 decimals), so [[readPairIndex]]
    *    re-filters losslessly at any threshold, like the cache.
    *
    * Append ≡ rebuild EXACTLY: a band-collision pair is discovered when
    * the LATER of its two docs arrives — new×stored and new×new band
    * joins cover every pair involving the batch, stored old×old pairs
    * are already in the index, and scores depend only on the two sigs.
    *
    * Layout (round 13 — append is O(batch) in PUBLISH IO, not only in
    * compute): both artifacts are `batch=`-partitioned trees, one
    * partition per maintenance op, keyed by a DETERMINISTIC
    * content-derived token of the batch ([[pairBatchToken]]). An append
    * writes ONLY its own batch's rows — staged under a hidden
    * `_staging_<token>` dir (invisible to Spark readers), committed with
    * ONE atomic directory rename to `batch=<token>` — so every
    * pre-existing file stays byte-identical (asserted in ExtSpec).
    * The previous shape merged new pairs into the full stored set and
    * republished BOTH whole artifacts per batch: compute was O(batch)
    * but publish IO was O(index), the wrong cost model for the live
    * ingest loop this index exists for. Cross-op duplicate pairs cannot
    * arise (old×old pairs never reappear — one join side is always
    * new), so dropping the global merge loses nothing.
    *
    * Crash discipline: BOTH ops commit `pairs` FIRST, then `sigs` —
    * `pairs` is the consumed artifact, so a crash between the two
    * leaves readers serving the CORRECT (new) pair set while `sigs`
    * lags one op behind. Recovery follows the same single-writer
    * contract as every maintained index here: the writer REPLAYS the
    * interrupted op before issuing a different one. An append replay
    * passes the id guard (the batch's docs are still absent from
    * `sigs`), derives the SAME batch token from the same content, and
    * re-commits over its own `batch=` dir — idempotent by construction;
    * a rebuild replay overwrites both artifacts (the
    * [[graft.pipeline.Store.publishAtomicWith]] staging+backup swap, so
    * a crashed REBUILD still serves readers the last committed tree via
    * the `__backup` path). Crashed append stagings are `_`-hidden (no
    * reader ever lists them) and swept by the next writer (single
    * writer ⇒ any staging present at op start is a dead leak). The
    * reverse commit order would be strictly worse on both paths: a
    * crashed append would strand a state whose guard rejects the very
    * batch needed to finish it, and a crashed rebuild would leave
    * readers silently serving the OLD corpus's pairs under the new
    * signatures. */
  def buildPairIndex(docs: DataFrame, dir: String): Unit = {
    import graft.pipeline.Store
    val s = docs.sparkSession
    Store.repairPublished(s, s"$dir/sigs", "pair-index build")
    Store.repairPublished(s, s"$dir/pairs", "pair-index build")
    // sigs are STAGED (not yet published): the band join and both score
    // joins read one materialized frame instead of replaying the shingle
    // aggregation three times through the lineage, and `pairs` can
    // publish first (see the class doc's crash ordering) even though it
    // derives from the new signatures
    val staged = s"$dir/sigs__building"
    minhashSignatures(docs).write.mode("overwrite").parquet(staged)
    try {
      val sigs = s.read.parquet(staged)
      val tok = pairBatchToken(sigs)
      Store.publishAtomicWith(s, s"$dir/pairs", "pair-index build") { st =>
        candidatesFromSigs(sigs, 0.0).withColumn("batch", lit(tok))
          .write.partitionBy("batch").parquet(st)
      }
      Store.publishAtomicWith(s, s"$dir/sigs", "pair-index build") { st =>
        sigs.withColumn("batch", lit(tok))
          .write.partitionBy("batch").parquet(st)
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(staged)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
  }

  /** Deterministic content-derived batch token over the signatures'
    * doc_ids — [[graft.pipeline.Store.batchToken]]; a replayed append
    * (same docs) lands on the SAME `batch=` partition and overwrites
    * itself, the idempotency the dropped global pair merge used to
    * provide. The commit/sweep protocol is the shared one in Store
    * (also behind the IVF and media-hash indexes). */
  private[ext] def pairBatchToken(sigs: DataFrame): String =
    graft.pipeline.Store.batchToken(sigs, "doc_id")

  private def commitBatchPartition(spark: org.apache.spark.sql.SparkSession,
      table: String, token: String, df: DataFrame): Unit =
    graft.pipeline.Store.commitBatchPartition(spark, table, token, df)

  private def sweepBatchLeftovers(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    graft.pipeline.Store.sweepBatchLeftovers(spark, table)

  /** Fold one admitted batch into the index WITHOUT re-reading covered
    * text: shingle + sign the batch only, band-join the new bands
    * against stored ∪ new bands (old×old can never appear — one side is
    * always new), score from signatures, and commit ONLY the batch's
    * rows as a new `batch=` partition per artifact (see the class doc:
    * publish IO is O(batch); pre-existing files stay byte-identical).
    * At 100 TB the stored band side co-partitions by (band, band_key)
    * and the batch side is the small probe. */
  def appendToPairIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame): Unit = {
    import graft.pipeline.Store
    Store.repairPublished(spark, s"$dir/sigs", "pair-index append")
    Store.repairPublished(spark, s"$dir/pairs", "pair-index append")
    sweepBatchLeftovers(spark, s"$dir/pairs")
    sweepBatchLeftovers(spark, s"$dir/sigs")
    val oldSigs = readPairIndexSigs(spark, dir)
    // the batch's signatures feed FOUR consumers (the id guard, the band
    // probe, both score joins, the sigs commit) — stage them as parquet
    // once so the raw-text shingle aggregation runs once, not once per
    // consumer through the lineage (measured 3.1 s → 1.3 s at sf0.1)
    val staged = s"$dir/sigs__incoming"
    minhashSignatures(batch).write.mode("overwrite").parquet(staged)
    try {
      val newSigs = spark.read.parquet(staged)
      // doc_id is the corpus identity: silently re-admitting a covered
      // id would double its band rows and corrupt the pair set in ways
      // the append ≡ rebuild pin could only catch after the fact — fail
      // LOUDLY (one bounded metadata join; the q71 admit gate runs
      // upstream)
      val collided = newSigs.select("doc_id")
        .join(oldSigs.select("doc_id"), "doc_id").limit(1).count()
      if (collided > 0)
        sys.error(s"pair-index append: batch contains doc_ids already " +
          s"covered by $dir/sigs — route batches through the admit gate")
      val tok = pairBatchToken(newSigs)
      val newBands = lshBands(newSigs)
      val allBands = lshBands(oldSigs).unionByName(newBands)
      val cand = allBands.as("x").join(newBands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
        .distinct()
      val allSigs = oldSigs.unionByName(newSigs)
      val newPairs = scoreCandidates(cand, allSigs, 0.0)
      commitBatchPartition(spark, s"$dir/pairs", tok, newPairs)
      commitBatchPartition(spark, s"$dir/sigs", tok, newSigs)
    } finally {
      val p = new org.apache.hadoop.fs.Path(staged)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true); ()
    }
  }

  /** Fold the index's accumulated `batch=` partitions into ONE — the
    * small-file compaction a high-cadence append loop needs (every
    * append adds a partition; a year of hourly folds is ~9k dirs whose
    * listing/footer overhead eventually taxes every read). Both
    * artifacts are rewritten from their OWN stored rows — no text is
    * re-shingled and no band join re-runs; this is a layout op, not a
    * recompute — through the [[graft.pipeline.Store.publishAtomicWith]]
    * staging+backup swap, `pairs` first (the class-doc crash ordering;
    * a crash between the two publishes leaves both artifacts correct,
    * one compacted and one not, so no replay is even required).
    * No-op below two partitions. Returns the partition count folded.
    * Value-pinned ≡ before, and append-after-compact ≡ rebuild, in
    * ExtSpec. */
  def compactPairIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Int = {
    import graft.pipeline.Store
    Store.repairPublished(spark, s"$dir/sigs", "pair-index compact")
    Store.repairPublished(spark, s"$dir/pairs", "pair-index compact")
    sweepBatchLeftovers(spark, s"$dir/pairs")
    sweepBatchLeftovers(spark, s"$dir/sigs")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/sigs"))
      .count(_.getPath.getName.startsWith("batch="))
    if (nBatches >= 2) {
      val sigs = readPairIndexSigs(spark, dir)
      val pairs = readPairIndex(spark, dir, 0.0)
      val tok = pairBatchToken(sigs)
      // each publish WRITES its staging from the live tree before any
      // rename touches that tree, so the swap never reads-after-replace
      Store.publishAtomicWith(spark, s"$dir/pairs", "pair-index compact") {
        st => pairs.withColumn("batch", lit(tok))
          .write.partitionBy("batch").parquet(st)
      }
      Store.publishAtomicWith(spark, s"$dir/sigs", "pair-index compact") {
        st => sigs.withColumn("batch", lit(tok))
          .write.partitionBy("batch").parquet(st)
      }
    }
    nBatches
  }

  /** Candidate pairs at `minEstimate` from the persisted index alone —
    * zero text scans, lossless threshold re-filter (stored scores are
    * exact 1/[[MinhashK]] multiples). Read-only: a crashed REBUILD swap
    * is served from its backup; repair belongs to the next writer. The
    * internal `batch` partition column is maintenance bookkeeping, not
    * part of the pair contract — dropped here. */
  def readPairIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      minEstimate: Double): DataFrame =
    graft.pipeline.Store.readRecoverableReadOnly(spark, s"$dir/pairs",
        "pair-index read")
      .filter(col("est_jaccard") >= minEstimate)
      .select("doc_a", "doc_b", "est_jaccard")

  /** The index's per-doc MinHash signatures — state for derived
    * monitors ([[bandLoadFromIndex]]) and the append path's stored
    * side; same read-only recovery contract as [[readPairIndex]]. */
  def readPairIndexSigs(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.pipeline.Store.readRecoverableReadOnly(spark, s"$dir/sigs",
        "pair-index sigs read")
      .select(col("doc_id") +: (0 until MinhashK).map(i => col(s"sig_$i")): _*)

  // ---- registered queries ----------------------------------------------

  /** Exact dedup with injected duplicates (docs with doc_id%7==0 appear
    * twice) so the collapse is observable. */
  val q26ExactDedup: QuerySpec = QuerySpec(
    "q26_exact_dedup",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 7 = 0)
      |SELECT md5(text) AS fingerprint,
      |  min(doc_id) AS keeper_doc_id,
      |  count(*) AS n_copies
      |FROM corpus
      |GROUP BY md5(text)
      |ORDER BY keeper_doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select(injectedId(col("doc_id"), 100000000L).as("doc_id"),
          col("text")))
    exactDedupGroups(corpus)
      .select(col("fingerprint"), col("keeper_doc_id"), col("n_copies"))
      .orderBy("keeper_doc_id")
  }

  /** Shared CTE block computing the exact 3-gram Jaccard pair set
    * `(doc_a, doc_b, jaccard)` — ONE source of truth for q27's oracle and
    * q60's edge set (a threshold or shingle tweak landing in only one of
    * them would silently desynchronize the cluster oracle from the pair
    * oracle). Pre-stripped plain string: assemble by concatenation, never
    * re-stripMargin. */
  private def ngramPairsSqlCtes(maxDocId: Int, minJaccard: Double): String =
    ngramPairsSqlCtesFrom("documents", minJaccard, s"doc_id < $maxDocId AND ")

  /** Generalized form over any (doc_id, text) relation — also consumed by
    * the q75 corpus-build composition, whose pair set runs over the
    * funnel-surviving subset instead of raw documents. */
  def ngramPairsSqlCtesFrom(srcRel: String, minJaccard: Double,
      pred: String = ""): String =
    s"""docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM $srcRel
       |  WHERE ${pred}len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
       |      i -> array_to_string(w[i:i+2], ' '))) AS shingle
       |    FROM docs)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    floor(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) * 10000 + 0.5) / 10000 AS jaccard
       |  FROM common
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= $minJaccard)""".stripMargin

  /** Exact 3-gram Jaccard near-dup pairs on a bounded slice — the oracle
    * for the MinHash path. */
  val q27NgramJaccard: QuerySpec = QuerySpec(
    "q27_ngram_jaccard",
    "WITH " + ngramPairsSqlCtes(300, 0.3) + "\n" +
      "SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b") { (s, dir) =>
    jaccardPairsCached(s, dir, 300, 0.3)
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB CTE chain replaying [[minhashSignatures]] + [[lshBands]] +
    * [[minhashCandidates]] over any (doc_id, text) relation, ending in a
    * `pairs(doc_a, doc_b, est_jaccard)` CTE — generated from the same hash
    * constants (one source of truth), and drop-in compatible with
    * [[ngramPairsSqlCtesFrom]] so a pair consumer (the corpus-build
    * manifest) can swap the exact and banded generators without touching
    * its tail SQL. The oracle replays the exact signature arithmetic —
    * md5-arithmetic base hash makes it bitwise identical — and may freely
    * use the same band equi-join (the RESULT is what's compared, and the
    * candidate set is definitionally band-collision-dependent). */
  def minhashPairsSqlCtesFrom(srcRel: String, minAgree: Int,
      pairsCte: String = "pairs"): String = {
    val rows = MinhashK / Bands
    val sigExprs = (0 until MinhashK).map { i =>
      val (a, b) = hashParams(i)
      s"min((h * $a + $b) % $P) AS sig_$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until Bands).map { bnd =>
      val parts = (0 until rows).map(r => s"sig_${bnd * rows + r}")
      s"SELECT doc_id, $bnd AS band, concat_ws('_', ${parts.mkString(", ")}) AS band_key FROM mh_sig"
    }.mkString("\n  UNION ALL ")
    val agreeExpr = (0 until MinhashK)
      .map(i => s"(CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    "mh_docs AS (\n" +
      s"  SELECT doc_id, string_split(text, ' ') AS w FROM $srcRel\n" +
      "  WHERE len(string_split(text, ' ')) >= 3),\n" +
      "mh_sh AS (\n" +
      "  SELECT DISTINCT doc_id, shingle FROM (\n" +
      "    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),\n" +
      "      i -> array_to_string(w[i:i+2], ' '))) AS shingle\n" +
      "    FROM mh_docs)),\n" +
      "mh_hs AS (SELECT doc_id, " + md5Hash32Sql("shingle") + " % 2147483647 AS h FROM mh_sh),\n" +
      "mh_sig AS (SELECT doc_id,\n    " + sigExprs + "\n  FROM mh_hs GROUP BY doc_id),\n" +
      "mh_bands AS (\n  " + bandSelects + "),\n" +
      "mh_cand AS (\n" +
      "  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b\n" +
      "  FROM mh_bands x JOIN mh_bands y\n" +
      "    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),\n" +
      s"$pairsCte AS (\n" +
      "  SELECT doc_a, doc_b,\n" +
      s"    round(CAST($agreeExpr AS DOUBLE) / $MinhashK, 4) AS est_jaccard\n" +
      "  FROM mh_cand JOIN mh_sig a ON a.doc_id = doc_a JOIN mh_sig b ON b.doc_id = doc_b\n" +
      s"  WHERE $agreeExpr >= $minAgree)"
  }

  private def minhashOracleSql(minAgree: Int): String =
    "WITH " + minhashPairsSqlCtesFrom("documents", minAgree) + "\n" +
      "SELECT doc_a, doc_b, est_jaccard FROM pairs ORDER BY doc_a, doc_b"

  /** MinHash+LSH near-dup candidates over the FULL corpus — the
    * sub-quadratic scale path. Full value-level oracle: the md5-arithmetic
    * base hash replays bit-for-bit in DuckDB; DedupSpec additionally pins
    * recall against exact Jaccard (q27). Threshold 0.3 ⇔ ≥5 of 16
    * signature agreements (5/16 = 0.3125 is the smallest multiple ≥ 0.3). */
  val q28MinhashLsh: QuerySpec = QuerySpec(
    "q28_minhash_lsh", minhashOracleSql(minAgree = 5)) { (s, dir) =>
    minhashCandidatesCached(s, dir, 0.3)
      .orderBy("doc_a", "doc_b")
  }

  /** LSH band-load audit — the operational health metric for banded
    * dedup at 100 TB: per band, the distinct key count, the LARGEST
    * bucket (docs sharing one band key), singleton share, and the total
    * collision-pair volume Σ C(bucket, 2) — which IS the band join's
    * output size. A hot band key (boilerplate shingles collapsing the
    * signature rows) turns the "sub-quadratic" band join quadratic in
    * that bucket; this card is what pages the pipeline owner BEFORE the
    * join blows up, and what schedules a banding-parameter rebuild (the
    * [[Similarity.ivfIndexAudit]] discipline applied to LSH). Scale
    * shape: two map-side-combined hash-aggs — (band, band_key) buckets,
    * then the 4-row per-band fold; no window, no join, no collect.
    * Collision arithmetic stays in BIGINT: n·(n−1)/2 overflows only past
    * ~4.2e9 docs on ONE key, a corpus that has long since paged the
    * owner via max_bucket. */
  def bandLoadAudit(docs: DataFrame): DataFrame =
    bandLoadFromBands(lshBands(minhashSignatures(docs)))

  /** The audit's fold, shared between the text-scan form and the
    * state-derived form so a metric tweak can't desynchronize them. */
  private def bandLoadFromBands(bands: DataFrame): DataFrame =
    bands
      .groupBy("band", "band_key").agg(count(lit(1)).as("n"))
      .groupBy("band").agg(
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_bucket"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_singleton_keys"),
        expr("sum(n * (n - 1) div 2)").as("collision_pairs"))
      .orderBy("band")

  /** [[bandLoadAudit]] derived from a maintained pair index's PERSISTED
    * signatures ([[readPairIndexSigs]]) — zero text scans, the
    * state-derivation discipline of every other monitoring card
    * (q185–q195): the live band-health monitor for a corpus under
    * incremental maintenance reads the index, not the corpus. Banding
    * is a pure function of the signatures, so state-derived ≡ text-scan
    * exactly (pinned in ExtSpec; the streaming twin re-audits per
    * admitted micro-batch in StreamingSpec). */
  def bandLoadFromIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    bandLoadFromBands(lshBands(readPairIndexSigs(spark, dir)))

  /** Duplicate-mass card — the review summary over [[exactDedupGroups]]:
    * cluster sizes folded into the buckets a dedup review reads (unique /
    * k=2 / 3-4 / 5-9 / ≥10) with cluster counts, doc counts and the
    * exact doc-share ppm — "how much of the corpus sits in big duplicate
    * clusters" is the number that decides whether exact dedup alone
    * recovers meaningful tokens or the near-dup chains have to run.
    * One digest hash-agg + the shared one-row bucket fold
    * ([[Redaction.bucketCard]], the q63/q189 funnel discipline — no
    * window, no cross join, no driver collect). Ids are irrelevant to
    * the card (clusters key on content alone), so it takes a bare text
    * column. */
  def dupMassCard(corpusText: DataFrame): DataFrame = {
    val groups = corpusText
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("k"))
      .select(col("k"))
    Redaction.bucketCard(groups, col("k"), Seq(
        (1, "k=1", col("k") === 1),
        (2, "k=2", col("k") === 2),
        (3, "k=3-4", col("k").between(3, 4)),
        (5, "k=5-9", col("k").between(5, 9)),
        (10, "k>=10", col("k") >= 10)))
      .withColumnRenamed("n_groups", "n_clusters")
      .withColumnRenamed("n_rows", "n_docs")
      .withColumnRenamed("rows_ppm", "docs_ppm")
  }

  /** q199: the duplicate-mass card over the corpus with q26's injected
    * clone class (%7 docs duplicated), so the non-unique buckets are
    * populated and differ from a trivial all-unique card. */
  val q199DupMass: QuerySpec = QuerySpec(
    "q199_dup_mass",
    """WITH corpus AS (
      |  SELECT text FROM documents
      |  UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0),
      |g AS (SELECT count(*) AS k FROM corpus GROUP BY md5(text)),
      |t AS (
      |  SELECT CAST(sum(k) AS BIGINT) AS total,
      |    CAST(coalesce(sum(CASE WHEN k = 1 THEN 1 END), 0) AS BIGINT) AS g_1,
      |    CAST(coalesce(sum(CASE WHEN k = 1 THEN k END), 0) AS BIGINT) AS r_1,
      |    CAST(coalesce(sum(CASE WHEN k = 2 THEN 1 END), 0) AS BIGINT) AS g_2,
      |    CAST(coalesce(sum(CASE WHEN k = 2 THEN k END), 0) AS BIGINT) AS r_2,
      |    CAST(coalesce(sum(CASE WHEN k BETWEEN 3 AND 4 THEN 1 END), 0) AS BIGINT) AS g_3,
      |    CAST(coalesce(sum(CASE WHEN k BETWEEN 3 AND 4 THEN k END), 0) AS BIGINT) AS r_3,
      |    CAST(coalesce(sum(CASE WHEN k BETWEEN 5 AND 9 THEN 1 END), 0) AS BIGINT) AS g_5,
      |    CAST(coalesce(sum(CASE WHEN k BETWEEN 5 AND 9 THEN k END), 0) AS BIGINT) AS r_5,
      |    CAST(coalesce(sum(CASE WHEN k >= 10 THEN 1 END), 0) AS BIGINT) AS g_10,
      |    CAST(coalesce(sum(CASE WHEN k >= 10 THEN k END), 0) AS BIGINT) AS r_10
      |  FROM g)
      |SELECT * FROM (
      |  SELECT 1 AS k_floor, 'k=1' AS bucket, g_1 AS n_clusters, r_1 AS n_docs,
      |    CAST((1000000 * r_1) // total AS BIGINT) AS docs_ppm FROM t
      |  UNION ALL SELECT 2, 'k=2', g_2, r_2, CAST((1000000 * r_2) // total AS BIGINT) FROM t
      |  UNION ALL SELECT 3, 'k=3-4', g_3, r_3, CAST((1000000 * r_3) // total AS BIGINT) FROM t
      |  UNION ALL SELECT 5, 'k=5-9', g_5, r_5, CAST((1000000 * r_5) // total AS BIGINT) FROM t
      |  UNION ALL SELECT 10, 'k>=10', g_10, r_10, CAST((1000000 * r_10) // total AS BIGINT) FROM t)
      |ORDER BY k_floor""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
    dupMassCard(d.select(col("text")).unionAll(
      d.filter(col("doc_id") % 7 === 0).select(col("text"))))
  }

  /** q197: the band-load audit over the corpus — full value-level oracle
    * (the md5-arithmetic signature chain replays bit-for-bit in DuckDB;
    * the unused trailing pairs CTE rides along from the shared
    * generator, one source of truth with q28). */
  val q197BandLoad: QuerySpec = QuerySpec(
    "q197_band_load",
    "WITH " + minhashPairsSqlCtesFrom("documents", 0) + ",\n" +
      """buckets AS (
        |  SELECT band, band_key, count(*) AS n
        |  FROM mh_bands GROUP BY band, band_key)
        |SELECT band,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(n) AS BIGINT) AS max_bucket,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_singleton_keys,
        |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS collision_pairs
        |FROM buckets GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
    bandLoadAudit(Tables.documents(s, dir).select("doc_id", "text"))
  }

  /** q200: dedup yield curve — the card that CHOOSES the near-dup
    * threshold: for each candidate cutoff (est-Jaccard = t/16, the
    * detector's native granularity), how many docs and how many
    * whitespace tokens would star-rule dedup remove (a doc is removed
    * iff some smaller-id doc estimates ≥ t against it — q79's keeper
    * discipline). Thresholding is a RE-FILTER of the one cached
    * threshold-0 pair frame, so five cutoffs cost one 5-row
    * broadcast-axis join over the pairs (the reduced-BNLJ
    * scalar-threshold pattern, q198) + one distinct + one token join —
    * the corpus is never re-shingled per cutoff. Corpus totals are the
    * 1-row literalize class (q175's nOrders). All ratios are exact
    * floor-div ppm; est thresholds k/16 are binary-exact doubles, so
    * the >= comparisons carry no float haze. */
  /** The q200 operator over any pair frame (doc_b = the star-rule
    * removal victim) and (doc_id, toks) token frame: removal counts and
    * token mass at each `thresholdsX16` cutoff, exact floor-div ppm.
    * `totals` are folded in as literals (1-row metadata literalize) so
    * the final pass is join-free. */
  def dedupYieldCurve(pairs: DataFrame, toks: DataFrame,
      thresholdsX16: Seq[Int]): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val totRow = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_toks")).head()
    val (nDocs, nToks) = (totRow.getLong(0), totRow.getLong(1))
    val axis = thresholdsX16.toDF("threshold_x16")
    val removed = pairs
      .join(broadcast(axis),
        col("est_jaccard") >= col("threshold_x16").cast("double") / 16)
      .select("threshold_x16", "doc_b").distinct()
    val grouped = removed.join(toks, removed("doc_b") === toks("doc_id"))
      .groupBy("threshold_x16")
      .agg(count(lit(1)).as("docs_removed"),
        sum(col("toks")).as("tokens_removed"))
    broadcast(axis).join(grouped, Seq("threshold_x16"), "left")
      .select(col("threshold_x16"),
        coalesce(col("docs_removed"), lit(0L)).as("docs_removed"),
        expr(s"CAST(1000000 * coalesce(docs_removed, 0) div $nDocs AS LONG)")
          .as("docs_removed_ppm"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        expr(s"CAST(1000000 * coalesce(tokens_removed, 0) div $nToks AS LONG)")
          .as("tokens_removed_ppm"))
      .orderBy("threshold_x16")
  }

  val q200DedupYield: QuerySpec = QuerySpec(
    "q200_dedup_yield",
    "WITH " + minhashPairsSqlCtesFrom("documents", 8) + """,
      |tok AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(toks) AS BIGINT) AS n_toks FROM tok),
      |axis AS (SELECT unnest([8, 10, 12, 14, 16]) AS threshold_x16),
      |rem AS (
      |  SELECT DISTINCT a.threshold_x16, p.doc_b
      |  FROM pairs p JOIN axis a
      |    ON p.est_jaccard >= CAST(a.threshold_x16 AS DOUBLE) / 16),
      |g AS (
      |  SELECT threshold_x16, CAST(count(*) AS BIGINT) AS docs_removed,
      |    CAST(sum(toks) AS BIGINT) AS tokens_removed
      |  FROM rem JOIN tok ON tok.doc_id = rem.doc_b
      |  GROUP BY threshold_x16)
      |SELECT a.threshold_x16,
      |  CAST(coalesce(docs_removed, 0) AS BIGINT) AS docs_removed,
      |  CAST(1000000 * coalesce(docs_removed, 0) // n_docs AS BIGINT)
      |    AS docs_removed_ppm,
      |  CAST(coalesce(tokens_removed, 0) AS BIGINT) AS tokens_removed,
      |  CAST(1000000 * coalesce(tokens_removed, 0) // n_toks AS BIGINT)
      |    AS tokens_removed_ppm
      |FROM axis a LEFT JOIN g ON g.threshold_x16 = a.threshold_x16
      |CROSS JOIN tot
      |ORDER BY a.threshold_x16""".stripMargin) { (s, dir) =>
    dedupYieldCurve(
      minhashCandidatesCached(s, dir, 0.5),
      Tables.documents(s, dir).select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("toks")),
      Seq(8, 10, 12, 14, 16))
  }

  /** The q202 operator: per-source exact-dup recoverable mass. Keeper =
    * min doc_id per content digest (q26's star rule); every NON-keeper
    * copy is charged to ITS OWN source, so a syndicated article that
    * originated elsewhere still counts against the re-publisher — the
    * ledger a per-source dedup rollout reads to decide where dedup pays
    * before near-dup chains run anywhere. One digest hash-agg + one
    * join back on the digest (same exchange class) + one source
    * aggregate; ppm shares are per-source floor-div, exact. */
  def sourceDedupGain(corpus: DataFrame): DataFrame = {
    val fp = corpus.select(col("doc_id"), col("source"), col("toks"),
      md5(col("text")).as("fp"))
    val keepers = fp.groupBy("fp").agg(min(col("doc_id")).as("keeper_id"))
    fp.join(keepers, "fp")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(when(col("doc_id") =!= col("keeper_id"), 1L).otherwise(0L))
          .as("dup_docs"),
        sum(when(col("doc_id") =!= col("keeper_id"), col("toks"))
          .otherwise(lit(0L))).as("dup_tokens"))
      .select(col("source"), col("n_docs"), col("dup_docs"),
        expr("CAST(1000000 * dup_docs div n_docs AS LONG)")
          .as("dup_docs_ppm"),
        col("dup_tokens"),
        expr("CAST(1000000 * dup_tokens div n_tokens AS LONG)")
          .as("dup_tokens_ppm"))
      .orderBy("source")
  }

  /** q202: per-source dedup gain over the corpus with q26's injected
    * clone class (%7 docs duplicated under offset ids, source kept), so
    * every source shows a non-trivial recoverable mass. */
  val q202SourceDedupGain: QuerySpec = QuerySpec(
    "q202_source_dedup_gain",
    """WITH corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000000, source, text FROM documents
      |  WHERE doc_id % 7 = 0),
      |fp AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
      |    md5(text) AS fp
      |  FROM corpus),
      |k AS (SELECT fp, min(doc_id) AS keeper_id FROM fp GROUP BY fp),
      |g AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(toks) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN fp.doc_id <> k.keeper_id THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dup_docs,
      |    CAST(sum(CASE WHEN fp.doc_id <> k.keeper_id THEN toks ELSE 0 END)
      |      AS BIGINT) AS dup_tokens
      |  FROM fp JOIN k USING (fp) GROUP BY source)
      |SELECT source, n_docs, dup_docs,
      |  CAST(1000000 * dup_docs // n_docs AS BIGINT) AS dup_docs_ppm,
      |  dup_tokens,
      |  CAST(1000000 * dup_tokens // n_tokens AS BIGINT) AS dup_tokens_ppm
      |FROM g ORDER BY source""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "source", "text")
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select(injectedId(col("doc_id"), 100000000L).as("doc_id"),
          col("source"), col("text")))
    sourceDedupGain(corpus.withColumn("toks",
      size(TextAnalysis.tokens(col("text"))).cast("long")))
  }

  /** q201: MinHash calibration card — q106's inverse direction. Recall
    * (q106) asks "what share of true near-dups does banding catch, by
    * EXACT band"; this asks "when the estimator reports k/16, what is
    * the exact Jaccard really, by ESTIMATED band" — the bias/error
    * profile that decides whether a stored estimate can drive the
    * threshold directly or needs an exact re-check pass (q107's
    * two-stage discipline). Both sides come from the cached id<1000
    * frames (no new shingle pass); pairs whose exact Jaccard sits below
    * the exact frame's 0.05 floor are COUNTED (`n_below_floor` — the
    * false-alarm mass) but excluded from the error stats. Error
    * arithmetic is integer-exact: jaccard and est are 4-dp floor
    * values, recovered to integer ×10000 via floor(x·10000+0.5) in
    * both engines, so sums carry no float-order haze. */
  /** The q201 operator over any estimated (doc_a, doc_b, est_jaccard)
    * and exact (doc_a, doc_b, jaccard) pair frames — error profile of
    * the estimate by estimated band, integer-exact (see the q201 doc). */
  def minhashCalibrationCard(est: DataFrame, exact: DataFrame): DataFrame = {
    val j = est.join(exact, Seq("doc_a", "doc_b"), "left")
      .select((col("est_jaccard") * 16).cast("int").as("est_x16"),
        floor(col("est_jaccard") * 10000 + lit(0.5)).cast("long").as("e4"),
        floor(col("jaccard") * 10000 + lit(0.5)).cast("long").as("j4"))
    j.groupBy("est_x16")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("j4").isNull, 1L).otherwise(0L)).as("n_below_floor"),
        count(col("j4")).as("nj"),
        sum(col("j4")).as("sj"),
        sum(abs(col("e4") - col("j4"))).as("se"))
      .select(col("est_x16"), col("n_candidates"), col("n_below_floor"),
        when(col("nj") > 0,
          expr("CAST(100 * sj div nj AS LONG)")).as("mean_exact_ppm"),
        when(col("nj") > 0,
          expr("CAST(100 * se div nj AS LONG)")).as("mean_abs_err_ppm"))
      .orderBy("est_x16")
  }

  val q201MinhashCalibration: QuerySpec = QuerySpec(
    "q201_minhash_calibration",
    "WITH " + ngramPairsSqlCtesFrom("documents", 0.05, "doc_id < 1000 AND ") +
      ",\n" + minhashPairsSqlCtesFrom(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 1000)",
        minAgree = 0, pairsCte = "mh_pairs") + """,
      |j AS (
      |  SELECT CAST(m.est_jaccard * 16 AS INTEGER) AS est_x16,
      |    CAST(floor(m.est_jaccard * 10000 + 0.5) AS BIGINT) AS e4,
      |    CAST(floor(p.jaccard * 10000 + 0.5) AS BIGINT) AS j4
      |  FROM mh_pairs m LEFT JOIN pairs p
      |    ON p.doc_a = m.doc_a AND p.doc_b = m.doc_b)
      |SELECT est_x16,
      |  CAST(count(*) AS BIGINT) AS n_candidates,
      |  CAST(sum(CASE WHEN j4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_below_floor,
      |  CASE WHEN count(j4) > 0
      |    THEN CAST(100 * sum(j4) // count(j4) AS BIGINT) END
      |    AS mean_exact_ppm,
      |  CASE WHEN count(j4) > 0
      |    THEN CAST(100 * sum(abs(e4 - j4)) // count(j4) AS BIGINT) END
      |    AS mean_abs_err_ppm
      |FROM j GROUP BY est_x16
      |ORDER BY est_x16""".stripMargin) { (s, dir) =>
    minhashCalibrationCard(
      minhashCandidatesCached(s, dir, 0.0, maxId = Some(1000)),
      jaccardPairsCached(s, dir, 1000, 0.05))
  }

  /** DuckDB oracle for [[simhash]] + [[simhashPairs]]: identical signature
    * arithmetic (md5-arithmetic token hash), but an all-pairs comparison —
    * 500² oracle-side pairs at the gate SF is nothing for DuckDB, and an
    * algorithm-independent oracle is exactly what proves the banded
    * pigeonhole join loses no pairs. */
  /** DuckDB CTE chain replaying [[simhash]] over any (doc_id, text)
    * relation, ending in a `{sigCte}(doc_id, simhash)` CTE — same
    * single-source-of-truth discipline as [[minhashPairsSqlCtesFrom]],
    * so q29's oracle and any detector-composition oracle (q190) share
    * the exact signature arithmetic. */
  private[ext] def simhashSigSqlCtesFrom(srcRel: String,
      sigCte: String = "sig"): String = {
    val bitSums = (0 until SimhashBits).map { b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS bit_$b"
    }.mkString(",\n    ")
    val sigExpr = (0 until SimhashBits)
      .map(b => s"(CASE WHEN bit_$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"${sigCte}_tok AS (\n" +
      s"  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM $srcRel),\n" +
      s"${sigCte}_th AS (SELECT doc_id, " + md5Hash48Sql("token") +
      s" AS h FROM ${sigCte}_tok),\n" +
      s"${sigCte}_bits AS (SELECT doc_id,\n    " + bitSums +
      s"\n  FROM ${sigCte}_th GROUP BY doc_id),\n" +
      s"$sigCte AS (SELECT doc_id, CAST($sigExpr AS BIGINT) AS simhash " +
      s"FROM ${sigCte}_bits)"
  }

  private def simhashOracleSql(maxHamming: Int): String =
    "WITH " + simhashSigSqlCtesFrom("documents") + "\n" +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n" +
      "  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming\n" +
      "FROM sig a JOIN sig b ON a.doc_id < b.doc_id\n" +
      s"WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming\n" +
      "ORDER BY doc_a, doc_b"

  /** SimHash near-dup pairs over the FULL corpus via the banded
    * hamming-ball equi-join (oracle: all-pairs replay of the same
    * signatures — algorithm-independent, so it pins the pigeonhole join's
    * losslessness, not just the arithmetic). */
  val q29Simhash: QuerySpec = QuerySpec(
    "q29_simhash", simhashOracleSql(maxHamming = 2)) { (s, dir) =>
    simhashPairsCached(s, dir, 2)
      .orderBy("doc_a", "doc_b")
  }

  /** Shingle-containment pairs on the bounded slice (direction a→b:
    * fraction of a's shingles appearing in b). */
  val q55Containment: QuerySpec = QuerySpec(
    "q55_containment",
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE doc_id < 300 AND len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |      i -> array_to_string(w[i:i+2], ' '))) AS shingle
      |    FROM docs)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b,
      |  floor(CAST(n_common AS DOUBLE) / sa.n * 10000 + 0.5) / 10000 AS containment
      |FROM common JOIN sizes sa ON sa.doc_id = doc_a
      |WHERE CAST(n_common AS DOUBLE) / sa.n >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    containmentPairs(Tables.documents(s, dir).filter(col("doc_id") < 300), 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** Near-dup CLUSTERS from a candidate pair frame: connected components
    * by iterative min-label propagation, each doc labeled with the
    * smallest doc_id reachable from it (= the cluster's canonical
    * representative — the "keep one copy per near-dup group" step that
    * turns pairwise dedup output into an actual training-set filter).
    *
    * Scale shape: labels converge in O(component diameter) rounds — tiny
    * for near-dup clusters, which are dense by construction — each round
    * being one equi-join + one min-aggregate (map-side combinable) over
    * the CLUSTERED docs only, not the corpus. Every round persists its
    * result and drops the previous one, so lineage stays one round deep
    * (the Lloyd lesson: an iterated unmaterialized DataFrame re-executes
    * all prior rounds multiplicatively). For adversarially long chains at
    * planet scale, swap the loop body for the alternating large-star /
    * small-star rounds of Kiveris et al.'s "Connected Components in
    * MapReduce" — same per-round plan shape, provably O(log n) rounds.
    * Deterministic: min-labels are order-independent, which is what lets
    * q60 carry a full recursive-CTE DuckDB oracle. */
  def clustersFromPairs(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().persist()
    // eager localCheckpoint EVERY round, not persist: a cache keeps the
    // data but the LOGICAL PLAN still nests — each round references the
    // previous frame twice, so the plan doubles per round and a deep
    // iteration OOMs the driver merely STRINGIFYING it (AQE logs plans;
    // found by the 60-hop-chain test). Checkpointing materializes the
    // same bytes a persist+count would and truncates lineage to the
    // blocks; superseded rounds' blocks are GC-released with their frame.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint(true)
    var it = 0
    var done = labels.isEmpty
    while (!done && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("label")).as("nbr"))
      val next = labels.withColumnRenamed("label", "old")
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("label"),
          col("old"))
        .localCheckpoint(true)
      done = next.filter(col("label") < col("old")).count() == 0
      labels = next.select("doc_id", "label")
      it += 1
    }
    // a silent non-converged result would disagree with the exact oracle
    // and misassign representatives — fail loudly instead
    if (!done) sys.error(
      s"clustersFromPairs did not converge in $maxIters rounds " +
        "(component diameter exceeds the bound; raise maxIters or use " +
        "clustersFromPairsStar, whose round count is O(log n))")
    val out = labels.select(col("doc_id"), col("label").as("cluster_rep"))
      .localCheckpoint(true)
    edges.unpersist()
    out
  }

  /** Connected components by alternating large-star / small-star edge
    * contraction (the public MapReduce CC construction of Kiveris et al.)
    * — the adversarial-chain form [[clustersFromPairs]]'s doc promises:
    * min-label propagation needs O(diameter) rounds, so a pathological
    * duplication CHAIN (each doc near-dup of the next) stalls it, while
    * star contraction converges in O(log n) rounds regardless of
    * diameter. Each round:
    *
    *   - large-star: every node connects its strictly-LARGER neighbors
    *     to the minimum of its closed neighborhood;
    *   - small-star: every node connects its smaller-or-equal neighbors
    *     (edges oriented large→small) and itself to that minimum;
    *
    * both are one groupBy-min + one equi-join over the current edge set,
    * which contracts toward single-level stars rooted at component
    * minima. Same per-round persist/release discipline as the label
    * loop; same deterministic min-rep output, so the two operators are
    * interchangeable (q79 pins this one against q60's recursive-CTE
    * oracle, and PropertySpec runs both against a driver union-find). */
  def clustersFromPairsStar(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // eager localCheckpoint per round for the same reason as the label
    // loop: the plan references `edges` several times per round, so an
    // un-truncated lineage grows geometrically with rounds
    var edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .distinct().localCheckpoint(true)
    var it = 0
    // carry the row count across rounds: each round compared
    // next.count() to a RE-COUNT of the previous frame (one extra job
    // per round on an already-checkpointed frame), and the initial
    // isEmpty was a second bootstrap job — with tiny per-round data the
    // loop's cost is job orchestration, not data (guide §1.2)
    var edgeCount = edges.count()
    var done = edgeCount == 0L
    while (!done && it < maxIters) {
      val nbrs = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val lmins = nbrs.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = nbrs.join(lmins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // orient large→small for the small-star pass; self-loops (v landed
      // on its own min) carry no information and would survive as noise
      val directed = large.select(
        greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val smins = directed.groupBy("u").agg(min(col("v")).as("m"))
      val next = directed.join(smins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(smins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct().localCheckpoint(true)
      val nextCount = next.count()
      done = nextCount == edgeCount && next.exceptAll(edges).isEmpty
      edges = next
      edgeCount = nextCount
      it += 1
    }
    if (!done) sys.error(
      s"clustersFromPairsStar did not converge in $maxIters rounds — " +
        "O(log n) bound exceeded, which indicates a bug, not a deep graph")
    // fixpoint edges are (member → component-min) stars; the minima name
    // themselves, same contract as clustersFromPairs / the q60 oracle
    edges.select(col("u").as("doc_id"), col("v").as("cluster_rep"))
      .unionByName(edges.select(col("v").as("doc_id"), col("v").as("cluster_rep")))
      .distinct()
      .localCheckpoint(true)
  }

  /** q60: 3-gram-Jaccard near-dup clusters with canonical representatives
    * — transitive closure of q27's pair set. Oracle: DuckDB recursive CTE
    * computing min reachable id over the SAME pairs CTEs. */
  val q60NearDupClusters: QuerySpec = QuerySpec(
    "q60_neardup_clusters",
    "WITH RECURSIVE " + ngramPairsSqlCtes(300, 0.3) + ",\n" +
      """edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
        |FROM reach GROUP BY src
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    clustersFromPairs(jaccardPairsCached(s, dir, 300, 0.3))
      .orderBy("doc_id")
  }

  /** q81: normalization-aware dedup over a corpus with injected
    * reformatted copies (doc_id % 11 == 3 docs reappear uppercased, with
    * doubled spacing and trailing punctuation) — those groups show
    * n_copies = 2 with n_raw_variants = 2: collapsed here, invisible to
    * the raw-byte dedup (q26). */
  val q81NormalizedDedup: QuerySpec = QuerySpec(
    "q81_normalized_dedup",
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000000, upper(text) || '  !!' AS text
      |  FROM documents WHERE doc_id % 11 = 3),
      |fp AS (
      |  SELECT doc_id,
      |    md5(${normalizeForDedupSql("text")}) AS norm_fp,
      |    md5(text) AS raw_fp
      |  FROM corpus)
      |SELECT norm_fp,
      |  min(doc_id) AS keeper_doc_id,
      |  count(*) AS n_copies,
      |  CAST(count(DISTINCT raw_fp) AS BIGINT) AS n_raw_variants
      |FROM fp
      |GROUP BY norm_fp
      |ORDER BY keeper_doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 11 === 3)
        .select(injectedId(col("doc_id"), 300000000L).as("doc_id"),
          concat(upper(col("text")), lit("  !!")).as("text")))
    normalizedDedupGroups(corpus).orderBy("keeper_doc_id")
  }

  // ---- Repeated-span removal (C4-style boilerplate dedup) ---------------

  final val SpanTokens = 3
  final val SpanMaxDocFreq = 2

  /** Cross-document repeated-span removal — the C4 / RefinedWeb recipe's
    * sub-document dedup step: whole-doc dedup (q26) misses the nav bars,
    * cookie banners and license headers that repeat across otherwise
    * distinct pages, so each doc is cut into NON-overlapping
    * `spanTokens`-token spans (the stand-in for sentences — the corpus has
    * no sentence punctuation) and any span appearing in more than
    * `maxDocFreq` DISTINCT docs is removed from every doc; survivors are
    * reassembled in order.
    *
    * Scale shape: one scan-local explode; one doc-frequency aggregate
    * shuffled on the span (map-side combinable); the frequent-span set —
    * boilerplate is by definition a SMALL distinct set on a real corpus —
    * broadcasts into a left-anti probe, so the corpus spans are never
    * shuffled for the filter; reassembly is one doc_id exchange (the same
    * class as any per-doc aggregate). Output keeps the rewritten text as
    * an md5 plus span accounting: the gate-visible contract without
    * shipping the full text through the oracle compare. */
  /** Non-overlapping `spanTokens`-token spans per doc — the extraction
    * shared by the q80 removal and the q110 miner. */
  private def spanRows(docs: DataFrame, spanTokens: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w), $spanTokens), " +
          s"i -> struct(i AS idx, concat_ws(' ', slice(w, i, $spanTokens)) AS span))"))
        .as("s"))
      .select(col("doc_id"), col("s.idx").as("idx"), col("s.span").as("span"))

  def dedupSpans(docs: DataFrame, spanTokens: Int = SpanTokens,
      maxDocFreq: Int = SpanMaxDocFreq): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val spans = spanRows(docs, spanTokens)
    val frequent = spans.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .filter(col("doc_freq") > maxDocFreq)
      .select("span")
    val kept = spans.join(broadcast(frequent), Seq("span"), "left_anti")
    val totals = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    val reassembled = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept_spans"),
      // array_sort on (idx, span) structs orders by idx — unique per doc,
      // so the reassembly is deterministic under any partitioning
      md5(expr("concat_ws(' ', transform(" +
        "array_sort(collect_list(struct(idx, span))), s -> s.span))"))
        .as("kept_md5"))
    totals.join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept_spans"), lit(0L)).as("n_kept_spans"),
        (col("n_spans") - coalesce(col("n_kept_spans"), lit(0L))).as("n_removed"),
        // a doc whose every span was boilerplate reassembles to the empty
        // string — md5('') in both engines, not NULL
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
  }

  /** q80: repeated-span removal over the full corpus. Full value-level
    * oracle: span extraction, the distinct-doc frequency cut, and the
    * ORDERED reassembly all replay in DuckDB (string_agg ORDER BY idx ≡
    * the array_sort-by-idx fold). */
  val q80SpanDedup: QuerySpec = QuerySpec(
    "q80_span_dedup",
    s"""WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |spans AS (
      |  SELECT doc_id, i AS idx, array_to_string(w[i:i+${SpanTokens - 1}], ' ') AS span
      |  FROM docs, unnest(generate_series(1, len(w), $SpanTokens)) AS t(i)),
      |freq AS (
      |  SELECT span FROM (
      |    SELECT span, count(DISTINCT doc_id) AS df FROM spans GROUP BY span)
      |  WHERE df > $SpanMaxDocFreq),
      |kept AS (
      |  SELECT * FROM spans WHERE span NOT IN (SELECT span FROM freq)),
      |tot AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    md5(string_agg(span, ' ' ORDER BY idx)) AS kept_md5
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id AS doc_id,
      |  CAST(t.n_spans AS BIGINT) AS n_spans,
      |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept_spans,
      |  CAST(t.n_spans - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(a.kept_md5, md5('')) AS kept_md5
      |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    dedupSpans(Tables.documents(s, dir)).orderBy("doc_id")
  }

  // ---- Boilerplate span miner --------------------------------------------

  final val BoilerplateTopK = 20

  /** Boilerplate n-gram miner — the OBSERVABILITY face of q80's removal:
    * q80 silently deletes every span above the doc-frequency cut; before
    * tuning that cut, a corpus owner wants to SEE the candidates — the
    * nav bars, license headers and cookie banners ranked by reach. Top-k
    * spans by distinct-doc frequency with occurrence counts and corpus
    * share, total-ordered (doc_freq, occurrences, span) so the cut line
    * is explicit.
    *
    * Scale shape: the q80 extraction (scan-local explode) + one span
    * aggregate (map-side combinable), then a global top-k that plans as
    * TakeOrderedAndProject — per-partition heads, never a full sort; the
    * corpus-size denominator rides a 1-row broadcast. */
  def boilerplateSpans(docs: DataFrame, spanTokens: Int = SpanTokens,
      topK: Int = BoilerplateTopK): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import graft.functions.Functions.round4
    val total = broadcast(docs.agg(count(lit(1)).as("n_docs_total")))
    spanRows(docs, spanTokens)
      .groupBy("span")
      .agg(countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("n_occurrences"))
      .crossJoin(total)
      .select(col("span"), col("doc_freq"), col("n_occurrences"),
        round4(col("doc_freq").cast("double") / col("n_docs_total"))
          .as("pct_docs"))
      .orderBy(col("doc_freq").desc, col("n_occurrences").desc, col("span"))
      .limit(topK)
  }

  /** q110: the top-20 3-token boilerplate candidates over the corpus. */
  val q110BoilerplateSpans: QuerySpec = QuerySpec(
    "q110_boilerplate_spans", {
      import graft.functions.Functions.round4Sql
      s"""WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |spans AS (
        |  SELECT doc_id, array_to_string(w[i:i+${SpanTokens - 1}], ' ') AS span
        |  FROM docs, unnest(generate_series(1, len(w), $SpanTokens)) AS t(i)),
        |t AS (SELECT count(*) AS n_docs_total FROM documents),
        |f AS (
        |  SELECT span, count(DISTINCT doc_id) AS doc_freq,
        |    count(*) AS n_occurrences
        |  FROM spans GROUP BY span)
        |SELECT span, doc_freq, n_occurrences,
        |  ${round4Sql("CAST(doc_freq AS DOUBLE) / n_docs_total")} AS pct_docs
        |FROM f CROSS JOIN t
        |ORDER BY doc_freq DESC, n_occurrences DESC, span
        |LIMIT $BoilerplateTopK""".stripMargin
    }) { (s, dir) =>
    boilerplateSpans(Tables.documents(s, dir))
  }

  // ---- Winnowing fingerprints (MOSS) -------------------------------------

  final val WinnowGram = 4
  final val WinnowWindow = 5
  final val WinnowMinShared = 3L

  /** Winnowing document fingerprints (the public MOSS construction,
    * Schleimer et al. "Winnowing: Local Algorithms for Document
    * Fingerprinting"): hash every `k`-token gram, slide a window of `w`
    * consecutive gram-hashes, select each window's MINIMUM. The selection
    * GUARANTEES any substring of at least w+k-1 tokens shared between two
    * docs contributes at least one identical selected fingerprint —
    * arbitrary-alignment substring matching that the non-overlapping span
    * dedup (q80) structurally misses (a copied paragraph at a different
    * token offset realigns every span), at ~2/(w+1) of the gram density
    * instead of every position.
    *
    * Scale shape: selection is scan-local array arithmetic per doc (the
    * O(n·w) window mins run inside one projection); only the selected
    * fingerprints — a fraction of the grams — reach the equi-join.
    * Gram hashes are md5-arithmetic, so the whole construction replays
    * bitwise in DuckDB. */
  def winnowFingerprints(docs: DataFrame, k: Int = WinnowGram,
      w: Int = WinnowWindow): DataFrame = {
    require(k >= 1 && w >= 1, s"invalid winnowing params k=$k w=$w")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("wt"))
      // need one full window of gram hashes: grams = n-k+1 >= w; also
      // keeps both sequence() calls ascending (the descending-sequence trap)
      .filter(size(col("wt")) >= k + w - 1)
      .select(col("doc_id"), expr(
        s"transform(sequence(1, size(wt) - ${k - 1}), i -> " +
          s"cast(conv(substring(md5(concat_ws(' ', slice(wt, i, $k))), 1, 8), 16, 10) as long))")
        .as("h"))
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, size(h) - ${w - 1}), j -> array_min(slice(h, j, $w)))")))
        .as("fp"))
  }

  final val WinnowMaxDocFreq = 64L

  /** Substring-clone candidate pairs: docs sharing at least `minShared`
    * selected fingerprints. One fingerprint equi-join — sub-quadratic,
    * the same join class as the shingle/band joins — with the standard
    * winnowing-at-scale guard: a fingerprint selected by more than
    * `maxDocFreq` distinct docs is cross-corpus boilerplate (q80's
    * territory, not pairwise-clone evidence) and would make the join
    * QUADRATIC on its key, so the hot set — tiny by construction — is
    * excluded via a broadcast anti-probe. No result change at the gate
    * SFs (max observed doc-freq: 6 at sf0.1, 18 at the 3x corpus). */
  def winnowPairs(docs: DataFrame, minShared: Long = WinnowMinShared,
      maxDocFreq: Long = WinnowMaxDocFreq): DataFrame = {
    // ONE fp exchange feeds all three selection consumers (hot-set
    // aggregate, both pair-join sides) via ReuseExchange — the r12 form
    // re-evaluated the shingle+md5 selection per consumer (3 corpus
    // scans). The repartition is not an extra shuffle at scale: a
    // corpus-sized cold side can't broadcast, so the pair self-join
    // needs exactly this fp clustering anyway, and the hot aggregate's
    // two phases ride the same exchange (guide §2.4). Measured at
    // sf0.1: q82 median 3.33 → 2.85 s (same min), rows identical
    // (ProfileWinnow differential).
    val s = winnowFingerprints(docs).repartition(col("fp"))
    val hot = s.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDocFreq).select("fp")
    val cold = s.join(broadcast(hot), Seq("fp"), "left_anti")
    cold.as("a").join(cold.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Shared DuckDB CTE block replaying [[winnowFingerprints]] — ends in a
    * `sel(doc_id, fp)` CTE; one source of truth for the q82 and q83
    * oracles (a gram width or window tweak landing in only one would
    * silently desynchronize the pair oracle from the decontamination
    * oracle). */
  private[ext] def winnowSelSqlCtes: String =
    s"""docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= ${WinnowGram + WinnowWindow - 1}),
      |grams AS (
      |  SELECT doc_id, list_transform(generate_series(1, len(w) - ${WinnowGram - 1}),
      |    i -> CAST(('0x' || substr(md5(array_to_string(w[i:i+${WinnowGram - 1}], ' ')), 1, 8)) AS BIGINT)) AS h
      |  FROM docs),
      |sel AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(h) - ${WinnowWindow - 1}),
      |    j -> list_min(h[j:j+${WinnowWindow - 1}])))) AS fp
      |  FROM grams)""".stripMargin

  /** q82: winnowing substring-clone candidates over the full corpus.
    * Full value-level oracle — gram hashing, window-min selection and the
    * shared-count cut all replay exactly in DuckDB. */
  val q82WinnowFingerprints: QuerySpec = QuerySpec(
    "q82_winnow_fingerprints",
    "WITH " + winnowSelSqlCtes + s""",
      |hot AS (
      |  SELECT fp FROM (
      |    SELECT fp, count(DISTINCT doc_id) AS df FROM sel GROUP BY fp)
      |  WHERE df > $WinnowMaxDocFreq),
      |cold AS (SELECT * FROM sel WHERE fp NOT IN (SELECT fp FROM hot))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  count(*) AS n_shared
      |FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |HAVING count(*) >= $WinnowMinShared
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    winnowPairs(Tables.documents(s, dir)).orderBy("doc_a", "doc_b")
  }

  /** Winnow-based decontamination: the q65 overlap audit at winnowing
    * density — contamination is measured over SELECTED fingerprints
    * (~2/(w+1) of the grams) instead of every n-gram, so the broadcast
    * eval index and the corpus-side probe shrink by the same factor
    * while the winnowing guarantee still holds: any absorbed eval run of
    * at least w+k-1 tokens is certain to register a hit. Shorter
    * overlaps may escape — the deliberate trade that makes the index
    * broadcastable for a REAL eval suite at 100 TB (q65's every-gram
    * form stays as the exhaustive gate-scale audit). Same broadcast
    * shape as q65; the selection scan runs twice (eval + corpus split of
    * one frame) — the documented probe re-scan trade. */
  def winnowDecontaminate(docs: DataFrame, evalMod: Int): DataFrame = {
    require(evalMod >= 2, s"evalMod must be >= 2, got $evalMod")
    val sel = winnowFingerprints(docs)
    val ev = sel.filter(col("doc_id") % evalMod === 0)
      .select("fp").distinct().withColumn("hit", lit(1))
    sel.filter(col("doc_id") % evalMod =!= 0)
      .join(broadcast(ev), Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("doc_id"), col("n_fps"), col("n_hit"),
        graft.functions.Functions.round4(
          col("n_hit").cast("double") / col("n_fps")).as("contamination"),
        (col("n_hit") > 0).as("contaminated"))
  }

  /** q83: winnow-fingerprint decontamination (eval slice = doc_id % 50,
    * mirroring q65 so the two contamination measures are directly
    * comparable doc-for-doc). */
  val q83WinnowDecontaminate: QuerySpec = QuerySpec(
    "q83_winnow_decontaminate",
    "WITH " + winnowSelSqlCtes + s""",
      |ev AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 50 = 0),
      |c AS (SELECT doc_id, fp FROM sel WHERE doc_id % 50 <> 0)
      |SELECT c.doc_id AS doc_id,
      |  count(*) AS n_fps,
      |  CAST(sum(CASE WHEN ev.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  ${graft.functions.Functions.round4Sql(
        "CAST(sum(CASE WHEN ev.fp IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS contamination,
      |  sum(CASE WHEN ev.fp IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
      |FROM c LEFT JOIN ev ON c.fp = ev.fp
      |GROUP BY c.doc_id
      |ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
    winnowDecontaminate(Tables.documents(s, dir), evalMod = 50)
      .orderBy("doc_id")
  }

  // ---- Benchmark decontamination ---------------------------------------

  /** Distinct word-n-gram md5 fingerprints per doc, exploded to
    * (doc_id, gram) rows (same generator and drop-short-docs contract as
    * [[shingleRows]]). */
  def ngramFingerprintRows(docs: DataFrame, n: Int): DataFrame =
    gramRows(docs, n, "gram", hashed = true)

  /** Benchmark decontamination: for every training doc, the count and
    * fraction of its distinct n-grams that also appear in the eval set
    * (the overlap audit run before training so eval answers aren't in the
    * corpus — the published GPT-3/Llama recipe, with n=13-ish; n is a
    * parameter, 4 here so the synthetic corpus produces hits).
    *
    * Scale shape: the eval side is a benchmark suite — thousands of docs
    * against billions — so its distinct gram set is broadcast and the
    * probe is a scan-local hash lookup per training gram followed by one
    * doc_id aggregate; the training corpus is never shuffled on text or
    * joined against itself. */
  def evalContamination(docs: DataFrame, evalMod: Int, n: Int): DataFrame = {
    val grams = ngramFingerprintRows(docs, n)
    val isEval = col("doc_id") % evalMod === 0
    val evalGrams = grams.filter(isEval).select("gram").distinct()
      .withColumn("hit", lit(1))
    grams.filter(!isEval)
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        graft.functions.Functions.round4(
          col("n_hit").cast("double") / col("n_grams")).as("contamination"),
        (col("n_hit") > 0).as("contaminated"))
  }

  /** CTE fragment for the q65 n-gram contamination oracle — distinct
    * per-doc 4-gram md5s (`ngg`) and the eval slice's gram set (`ngev`) —
    * shared with the q102 defense-in-depth card (one source of truth for
    * the gram width and eval slice). */
  private[ext] def ngramDeconSqlCtes: String =
    """ngd AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 4),
      |ngg AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 3),
      |      i -> md5(array_to_string(w[i:i+3], ' ')))) AS gram
      |    FROM ngd)),
      |ngev AS (SELECT DISTINCT gram FROM ngg WHERE doc_id % 50 = 0)""".stripMargin

  /** q65: 4-gram eval-set overlap over the full corpus (eval slice =
    * doc_id % 50). Full value-level oracle: md5 gram fingerprints replay
    * exactly in DuckDB. */
  val q65Decontaminate: QuerySpec = QuerySpec(
    "q65_decontaminate",
    s"""WITH $ngramDeconSqlCtes
      |SELECT ngg.doc_id AS doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN ngev.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  floor(CAST(sum(CASE WHEN ngev.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) * 10000 + 0.5) / 10000 AS contamination,
      |  sum(CASE WHEN ngev.gram IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
      |FROM ngg LEFT JOIN ngev ON ngg.gram = ngev.gram
      |WHERE ngg.doc_id % 50 <> 0
      |GROUP BY ngg.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    evalContamination(Tables.documents(s, dir), evalMod = 50, n = 4)
      .orderBy("doc_id")
  }

  // ---- Incremental batch dedup -----------------------------------------

  /** Incremental dedup: admit a NEW batch of docs against the existing
    * corpus — exact-duplicate check on the content fingerprint (vs the
    * corpus AND within the batch itself: the first occurrence of a
    * batch-internal copy wins, later ones reject — without this, two
    * identical docs arriving in one increment would both be admitted)
    * plus a near-duplicate check on shared 3-gram shingles (Jaccard vs
    * the corpus side; batch-internal NEAR-dups are left to the next
    * full-corpus clustering pass — q60 — since admitting at most one of
    * them is a policy, not an invariant). The decision the ingest path
    * makes per batch, without ever re-deduplicating the corpus itself.
    *
    * Scale shape: the batch is small (one ingest increment) and the corpus
    * is indexed — at scale the fingerprint and shingle frames are
    * pre-materialized index tables, so each increment costs a
    * batch-fingerprint broadcast anti-probe, a batch-sized keeper window,
    * and a shingle equi-join whose left side is batch-sized. Nothing scans
    * or shuffles the corpus text. */
  def admitBatch(corpus: DataFrame, batch: DataFrame,
      minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the batch side is ALWAYS the broadcast build side: the corpus (and
    // at scale its pre-materialized fingerprint/shingle index tables) is
    // only scanned and hash-probed, never shuffled on a join key. A plain
    // batch-LEFT-join-corpus would force the huge side to shuffle, so the
    // corpus-hit test is an inner probe (corpus ⨝ broadcast(batch))
    // re-joined to the batch
    val batchFp = batch.select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .withColumn("batch_keeper",
        min(col("doc_id")).over(Window.partitionBy("fingerprint")))
    val corpusHits = corpus.select(md5(col("text")).as("fingerprint"))
      .join(broadcast(batchFp.select("fingerprint").distinct()), "fingerprint")
      .distinct().withColumn("corpus_hit", lit(1))
    val exact = batchFp.join(broadcast(corpusHits), Seq("fingerprint"), "left")
      .withColumn("exact_hit",
        when(col("corpus_hit").isNotNull
          || col("doc_id") =!= col("batch_keeper"), lit(1)))
    val bsh = shingleRows(batch)
    val csh = shingleRows(corpus)
    val bsizes = bsh.groupBy("doc_id").agg(count(lit(1)).as("n_b"))
    val csizes = csh.groupBy("doc_id").agg(count(lit(1)).as("n_c"))
    // same probe shape for shingles: corpus-side stream, batch broadcast;
    // everything after the probe is batch-pair-sized
    val common = csh.toDF("c_doc", "shingle")
      .join(broadcast(bsh.toDF("b_doc", "shingle")), "shingle")
      .groupBy("b_doc", "c_doc").agg(count(lit(1)).as("n_common"))
    // corpus-side shingle counts are looked up only for the hit docs
    // (batch-bounded), again as a probe — joining the full per-doc count
    // index directly would shuffle it corpus-wide. The probe re-evaluates
    // the `common` subtree (Spark does not dedupe identical subtrees):
    // a DELIBERATE trade — two shuffle-free scans of the corpus index
    // beat one corpus-wide shuffle of it, and a cache can't live inside
    // a lazily-returned operator without leaking for the session
    val cHitSizes = csizes.toDF("c_doc", "n_c")
      .join(broadcast(common.select("c_doc").distinct()), "c_doc")
    val near = common
      .join(broadcast(bsizes.toDF("b_doc", "n_b")), "b_doc")
      .join(broadcast(cHitSizes), "c_doc")
      .filter(col("n_common").cast("double")
        / (col("n_b") + col("n_c") - col("n_common")) >= minJaccard)
      .groupBy(col("b_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_neardup"))
    exact.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("exact_hit").isNotNull.as("is_exact_dup"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        when(col("exact_hit").isNotNull, "reject_exact")
          .when(coalesce(col("n_neardup"), lit(0L)) > 0, "reject_neardup")
          .otherwise("admit").as("decision"))
  }

  /** q71: admit the doc_id % 10 == 7 slice as the incoming batch against
    * the rest of the corpus (Jaccard ≥ 0.5 near-dup bar). */
  val q71IncrementalDedup: QuerySpec = QuerySpec(
    "q71_incremental_dedup",
    """WITH batch AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7),
      |corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
      |cfp AS (SELECT DISTINCT md5(text) AS fingerprint FROM corpus),
      |bsh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |      i -> array_to_string(w[i:i+2], ' '))) AS shingle
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM batch
      |          WHERE len(string_split(text, ' ')) >= 3))),
      |csh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |      i -> array_to_string(w[i:i+2], ' '))) AS shingle
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      |          WHERE len(string_split(text, ' ')) >= 3))),
      |bsizes AS (SELECT doc_id, count(*) AS n_b FROM bsh GROUP BY doc_id),
      |csizes AS (SELECT doc_id, count(*) AS n_c FROM csh GROUP BY doc_id),
      |near AS (
      |  SELECT b_doc AS doc_id, count(*) AS n_neardup FROM (
      |    SELECT b.doc_id AS b_doc, c.doc_id AS c_doc, count(*) AS n_common
      |    FROM bsh b JOIN csh c ON b.shingle = c.shingle
      |    GROUP BY b.doc_id, c.doc_id) j
      |  JOIN bsizes ON bsizes.doc_id = j.b_doc
      |  JOIN csizes ON csizes.doc_id = j.c_doc
      |  WHERE CAST(n_common AS DOUBLE) / (n_b + n_c - n_common) >= 0.5
      |  GROUP BY b_doc),
      |bfp AS (
      |  SELECT doc_id, md5(text) AS fingerprint,
      |    min(doc_id) OVER (PARTITION BY md5(text)) AS batch_keeper
      |  FROM batch)
      |SELECT b.doc_id,
      |  (cfp.fingerprint IS NOT NULL OR b.doc_id <> b.batch_keeper) AS is_exact_dup,
      |  CAST(coalesce(near.n_neardup, 0) AS BIGINT) AS n_neardup,
      |  CASE WHEN cfp.fingerprint IS NOT NULL OR b.doc_id <> b.batch_keeper
      |         THEN 'reject_exact'
      |       WHEN coalesce(near.n_neardup, 0) > 0 THEN 'reject_neardup'
      |       ELSE 'admit' END AS decision
      |FROM bfp b
      |LEFT JOIN cfp ON b.fingerprint = cfp.fingerprint
      |LEFT JOIN near ON near.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
    admitBatch(
      d.filter(col("doc_id") % 10 =!= 7),
      d.filter(col("doc_id") % 10 === 7),
      minJaccard = 0.5)
      .orderBy("doc_id")
  }

  /** q79: the SAME clustering contract as q60, computed by star
    * contraction — the O(log n)-round scale form. Identical recursive-CTE
    * oracle (the semantics are equal by construction; the oracle proves
    * it value-level on the gate slice). */
  val q79NearDupClustersStar: QuerySpec = QuerySpec(
    "q79_neardup_clusters_star", q60NearDupClusters.oracle.get) { (s, dir) =>
    clustersFromPairsStar(jaccardPairsCached(s, dir, 300, 0.3))
      .orderBy("doc_id")
  }

  /** Cross-source duplication matrix — WHERE the near-dups come from:
    * pair counts and mean similarity by unordered source pair, the
    * mirror-site / syndication report a corpus audit starts with (a hot
    * off-diagonal cell means one source republishes another and should be
    * capped or dropped wholesale; a hot diagonal cell means a source
    * self-duplicates). Candidates are the q28 banded MinHash set — the
    * sparse sub-quadratic pair source — with the two source labels
    * attached by id equi-joins against a 2-column (doc_id, source)
    * projection; the aggregate output is ≤ sources² rows, metadata.
    * avg(est_jaccard) sums multiples of 1/16 (exact in binary, so the
    * unordered sum is deterministic) and floor-rounds via round4 in both
    * engines. */
  def sourceOverlapMatrix(docs: DataFrame,
      minEstimate: Double = 0.5): DataFrame =
    sourceOverlapMatrixFrom(minhashCandidates(docs, minEstimate),
      docs.select(col("doc_id"), col("source")))

  /** [[sourceOverlapMatrix]] from an existing (cached) pair frame. */
  def sourceOverlapMatrixFrom(pairs: DataFrame, src: DataFrame): DataFrame = {
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"), col("est_jaccard"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"),
        graft.functions.Functions.round4(avg(col("est_jaccard"))).as("avg_est"))
  }

  /** q90: the overlap matrix over the full corpus (the q28/q86 pair CTEs
    * plus two label joins and one small aggregate). */
  val q90SourceOverlap: QuerySpec = QuerySpec(
    "q90_source_overlap",
    "WITH " + minhashPairsSqlCtesFrom("documents",
      math.ceil(0.5 * MinhashK).toInt) + s""",
      |lab AS (
      |  SELECT p.est_jaccard, da.source AS sa, db.source AS sb
      |  FROM pairs p
      |  JOIN documents da ON p.doc_a = da.doc_id
      |  JOIN documents db ON p.doc_b = db.doc_id)
      |SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
      |  count(*) AS n_pairs,
      |  ${graft.functions.Functions.round4Sql("avg(est_jaccard)")} AS avg_est
      |FROM lab GROUP BY 1, 2
      |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
    sourceOverlapMatrixFrom(minhashCandidatesCached(s, dir, 0.5),
      Tables.documents(s, dir).select(col("doc_id"), col("source")))
      .orderBy("src_a", "src_b")
  }

  // ---- Bloom-filter admission (distributed bit array) -------------------

  /** Bits in the distributed bloom "bit array" — sized so k*n/m stays ≪ 1
    * at every bench SF; at real scale m grows with the corpus fingerprint
    * count (m ≈ 10–20 bits per inserted key keeps fpp < 1%). */
  final val BloomBits = 1 << 20
  final val BloomHashes = 5

  private def bloomBucketCols(fp: Column): Seq[Column] =
    (0 until BloomHashes).map(i =>
      pmod(xxhash64(fp, lit(i)), lit(BloomBits.toLong)))

  /** Bloom-filter batch admission — the cheapest possible "have we seen
    * this document before" gate for a continuously-ingesting corpus:
    * where q71's shingle-index admit buys near-dup detection with an
    * index probe per increment, this buys EXACT-dup screening with a
    * fixed-size summary that never looks at the corpus text again.
    *
    * The bloom bit array is modeled as a DISTRIBUTED RELATION of set
    * bucket ids — `{ xxhash64(fp, seed_i) mod m : i < k }` over the
    * corpus fingerprints — not a driver-side object: build is one
    * map-side-combined distinct aggregate (k tiny rows per corpus doc),
    * the probe is one equi-join on bucket id with the k-row-per-doc batch
    * side broadcast, and a doc is "maybe present" iff all k of its
    * buckets hit. Semantically identical to the classic bit-array bloom
    * filter (no false negatives; fpp ≈ (1-e^(-kn/m))^k) but partitioned,
    * incrementally appendable (new corpus docs add bucket rows), and
    * never bounded by one executor's memory.
    *
    * Validation-harness contract (same as q47/q59): exact anchors both
    * engines can compute (batch size, exact dup/new split via the
    * fingerprint join) plus bloom-property booleans the engine PROVES on
    * the data and the oracle pins as literal TRUE — no-false-negatives
    * is structural (an exact dup has its keys' buckets inserted by
    * definition); the false-positive bound holds with huge slack at the
    * configured m. xxhash64 exists only Spark-side, which is exactly why
    * the booleans, not the raw bloom verdicts, are the contract. */
  def bloomAdmitAudit(corpus: DataFrame, batch: DataFrame): DataFrame = {
    val corpusFp = corpus.select(md5(col("text")).as("fingerprint")).distinct()
    val batchFp = batch.select(col("doc_id"), md5(col("text")).as("fingerprint"))
    // the distributed "bit array": distinct set bucket ids
    val bits = corpusFp
      .select(explode(array(bloomBucketCols(col("fingerprint")): _*)).as("bucket"))
      .distinct()
    // probe: all k buckets must hit; batch side is the broadcast build side
    val probes = batchFp.select(col("doc_id"),
      posexplode(array(bloomBucketCols(col("fingerprint")): _*)))
      .select(col("doc_id"), col("col").as("bucket"))
    val bloomMaybe = bits.join(broadcast(probes), "bucket")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") === BloomHashes)
      .select(col("doc_id"), lit(true).as("bloom_maybe"))
    // exact membership: corpus-streams-probe-batch, as in admitBatch
    val exactHits = corpusFp
      .join(broadcast(batchFp.select("fingerprint").distinct()), "fingerprint")
      .select(col("fingerprint"), lit(true).as("exact_dup"))
    val decided = batchFp
      .join(broadcast(exactHits), Seq("fingerprint"), "left")
      .join(bloomMaybe, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("bloom_maybe"), lit(false)).as("bloom_maybe"))
    decided.agg(
      count(lit(1)).as("n_batch"),
      sum(when(col("exact_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
      sum(when(!col("exact_dup"), 1L).otherwise(0L)).as("n_exact_new"),
      (sum(when(col("exact_dup") && !col("bloom_maybe"), 1L).otherwise(0L)) === 0L)
        .as("bloom_no_false_negatives"),
      (sum(when(!col("exact_dup") && col("bloom_maybe"), 1L).otherwise(0L))
        .cast("double") <=
        greatest(lit(5.0), count(lit(1)).cast("double") * 0.01))
        .as("bloom_fp_within_bound"))
  }

  /** q94: bloom-screen the q71 batch slice against the rest of the
    * corpus. */
  val q94BloomAdmit: QuerySpec = QuerySpec(
    "q94_bloom_admit",
    """WITH batch AS (
      |  SELECT doc_id, md5(text) AS fingerprint
      |  FROM documents WHERE doc_id % 10 = 7),
      |cfp AS (
      |  SELECT DISTINCT md5(text) AS fingerprint
      |  FROM documents WHERE doc_id % 10 <> 7)
      |SELECT count(*) AS n_batch,
      |  CAST(sum(CASE WHEN cfp.fingerprint IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |  CAST(sum(CASE WHEN cfp.fingerprint IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_new,
      |  TRUE AS bloom_no_false_negatives,
      |  TRUE AS bloom_fp_within_bound
      |FROM batch LEFT JOIN cfp ON batch.fingerprint = cfp.fingerprint""".stripMargin) {
    (s, dir) =>
      val d = Tables.documents(s, dir)
      bloomAdmitAudit(
        d.filter(col("doc_id") % 10 =!= 7),
        d.filter(col("doc_id") % 10 === 7))
  }

  // ---- MinHash banding recall audit --------------------------------------

  /** Recall of the MinHash band CANDIDATE generation against exact
    * Jaccard, per similarity band — the text-side twin of q97's ANN
    * recall audit: banding misses a true pair only when all
    * [[Bands]] band signatures differ, a probability that falls with
    * similarity (1-(1-j^r)^b), so the audit reports recall bucketed by
    * the exact Jaccard decile — the curve a dedup owner tunes b×r
    * against. Candidates are taken PRE-threshold (estimate filter 0):
    * banding recall and estimate precision are separate dials, and this
    * audit isolates the first.
    *
    * Scale shape: the exact side is the audit's cost and runs on a
    * bounded slice by contract (the q27 rule — exact pairwise Jaccard is
    * the quadratic wall the bands exist to avoid); the banded side is
    * the production q28 plan on the same slice; the comparison is an
    * id-pair left join + one tiny per-decile aggregate. */
  def minhashRecallAudit(docs: DataFrame, minJaccard: Double): DataFrame =
    minhashRecallAuditFrom(jaccardPairs(docs, minJaccard),
      minhashCandidates(docs, 0.0))

  /** [[minhashRecallAudit]] from existing (cached) exact and banded pair
    * frames over the same corpus. */
  def minhashRecallAuditFrom(exact: DataFrame,
      candidates: DataFrame): DataFrame = {
    val caught = candidates
      .select(col("doc_a"), col("doc_b"), lit(1L).as("caught"))
    exact.join(caught, Seq("doc_a", "doc_b"), "left")
      .select(floor(col("jaccard") * 10).cast("long").as("band"),
        coalesce(col("caught"), lit(0L)).as("caught"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_pairs"), sum(col("caught")).as("n_caught"))
      .select(col("band"), col("n_pairs"), col("n_caught"),
        expr("CAST(n_caught * 100 DIV n_pairs AS BIGINT)").as("recall_pct"))
  }

  /** q106: banding recall over the q27 slice, exact floor 0.05 — BELOW
    * the q28 dedup threshold on purpose: the corpus's pair mass is
    * bimodal (weak j<0.1 overlaps vs j≥0.9 clones), and the audit's
    * value is showing recall ~0 on the weak band and 100 on the clone
    * band — the curve that justifies the b×r choice. Oracle: the
    * exact-pair CTEs and the banded CTEs (both already value-pinned by
    * q27/q28) joined per pair, folded per decile. */
  val q106MinhashRecall: QuerySpec = QuerySpec(
    "q106_minhash_recall",
    "WITH " + ngramPairsSqlCtes(1000, 0.05) + ",\n" +
      minhashPairsSqlCtesFrom(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 1000)",
        minAgree = 0, pairsCte = "mh_pairs") + """,
      |j AS (
      |  SELECT p.jaccard,
      |    CASE WHEN m.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
      |  FROM pairs p LEFT JOIN mh_pairs m
      |    ON m.doc_a = p.doc_a AND m.doc_b = p.doc_b)
      |SELECT CAST(floor(jaccard * 10) AS BIGINT) AS band,
      |  count(*) AS n_pairs,
      |  CAST(sum(caught) AS BIGINT) AS n_caught,
      |  CAST(sum(caught) * 100 // count(*) AS BIGINT) AS recall_pct
      |FROM j GROUP BY 1
      |ORDER BY band""".stripMargin) { (s, dir) =>
    minhashRecallAuditFrom(jaccardPairsCached(s, dir, 1000, 0.05),
      minhashCandidatesCached(s, dir, 0.0, maxId = Some(1000)))
      .orderBy("band")
  }

  // ---- quality-aware cluster survivorship --------------------------------

  /** Near-dup survivorship by QUALITY: clusters keep their best-scoring
    * member instead of the smallest id. Min-id reps (q60/q79) make the
    * clustering oracle-checkable, but a production dedup wants the copy
    * worth training on — the cleanest extraction among the mirror, the
    * quote-wrapped repost, and the truncated syndication. Keeper = argmax
    * of (quality, lowest-id tiebreak) per cluster, with the cluster_rep
    * label retained so the survivorship choice stays auditable against
    * the q60 clustering.
    *
    * Scale shape: the [[clustersFromPairs]] rounds plus ONE quality
    * projection (scan-local arithmetic), one per-cluster max-struct
    * aggregate (map-side combinable — the D3 keep-first idiom, no
    * window), and one keeper re-join on cluster_rep — the same exchange
    * class as the aggregate that produced it. */
  def qualityKeeperClusters(docs: DataFrame, minJaccard: Double): DataFrame =
    qualityKeeperClustersFrom(docs, jaccardPairs(docs, minJaccard))

  /** [[qualityKeeperClusters]] from an existing (cached) pair frame. */
  def qualityKeeperClustersFrom(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import graft.functions.Functions.round4
    val clusters = clustersFromPairs(pairs)
    val (lenS, ttr, stop) = TextAnalysis.qualityParts(col("text"))
    val scored = docs
      .select(col("doc_id"), TextAnalysis.qualityScore(lenS, ttr, stop).as("q"))
      .join(clusters, "doc_id")
    val keepers = scored.groupBy("cluster_rep")
      .agg(max(struct(col("q"), (-col("doc_id")).as("neg"))).as("m"))
      .select(col("cluster_rep"), (-col("m.neg")).as("keeper_doc_id"))
    scored.join(keepers, "cluster_rep")
      .select(col("doc_id"), col("cluster_rep"), col("keeper_doc_id"),
        (col("doc_id") === col("keeper_doc_id")).as("kept"),
        round4(col("q")).as("quality"))
  }

  /** q107: quality survivorship over the q60 clustering. Oracle: the
    * recursive-CTE clusters plus the shared quality blend, keeper via
    * the same (quality desc, id) total order. */
  val q107QualityKeeper: QuerySpec = QuerySpec(
    "q107_quality_keeper", {
      import graft.functions.Functions.round4Sql
      "WITH RECURSIVE " + ngramPairsSqlCtes(1000, 0.3) + ",\n" +
        s"""edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |cl AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
        |  FROM reach GROUP BY src),
        |sc AS (
        |  SELECT p.doc_id, cl.cluster_rep,
        |    ${TextAnalysis.QualityBlendSql} AS q
        |  FROM (${TextAnalysis.qualityPartsSql("")}) p
        |  JOIN cl ON cl.doc_id = p.doc_id),
        |k AS (
        |  SELECT cluster_rep, doc_id AS keeper_doc_id FROM (
        |    SELECT cluster_rep, doc_id,
        |      row_number() OVER (PARTITION BY cluster_rep
        |        ORDER BY q DESC, doc_id) AS rn
        |    FROM sc) WHERE rn = 1)
        |SELECT sc.doc_id AS doc_id, sc.cluster_rep AS cluster_rep,
        |  k.keeper_doc_id AS keeper_doc_id,
        |  (sc.doc_id = k.keeper_doc_id) AS kept,
        |  ${round4Sql("q")} AS quality
        |FROM sc JOIN k ON k.cluster_rep = sc.cluster_rep
        |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    qualityKeeperClustersFrom(
      Tables.documents(s, dir).filter(col("doc_id") < 1000),
      jaccardPairsCached(s, dir, 1000, 0.3))
      .orderBy("doc_id")
  }

  // ---- maximal duplicated-span profile -----------------------------------

  final val DupSpanTokens = 4

  /** Maximal duplicated-span profile — the sliding-window complement to
    * q80's fixed non-overlapping cut (and the exact-substring face of the
    * Lee et al. "Deduplicating Training Data" finding): every OVERLAPPING
    * `spanTokens`-token shingle that appears in ≥2 distinct docs marks
    * its token interval as duplicated, and overlapping marked intervals
    * merge (gaps-and-islands: shingles at positions p, p' chain iff
    * p' − p ≤ L−1) into MAXIMAL duplicated spans — so a 40-token lifted
    * passage reports as ONE span of ~40 tokens, where q80 sees it only as
    * ceil(40/3) independent cells and q110 only as its most frequent
    * grams. Per doc: span count, longest span, covered-token total (no
    * double counting — intervals are merged), and the covered fraction.
    *
    * Scale shape: scan-local shingle explode → one span-keyed doc-freq
    * aggregate; duplicated shingles rejoin by a SHUFFLE join on the
    * shingle key — deliberately not a broadcast: at df≥2 the duplicated
    * set is corpus-sized in the worst case, unlike q80's >maxDocFreq
    * boilerplate cut (a real RefinedWeb-scale run raises minDf or
    * pre-filters by q110's miner to get a broadcastable set; the join
    * form is the one that never OOMs). Island merging is two windows
    * partitioned by doc_id — parallelism = document count, bounded per
    * task by document length (the q70 cliff does not apply). */
  def dupSpanProfile(docs: DataFrame,
      spanTokens: Int = DupSpanTokens): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2, got $spanTokens")
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= spanTokens)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${spanTokens - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', slice(w, i, $spanTokens)) AS g))"))
        .as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.g").as("g"))
      // ONE g-keyed exchange serves the doc-freq aggregate AND the
      // rejoin's probe side (round 14, the q82/q99 pattern): without it
      // the scan-local shingle explode — the operator's per-task cost —
      // is evaluated once under the aggregate and AGAIN as the probe
      .repartition(col("g"))
    val dupGrams = grams.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select("g")
    val marked = grams.join(dupGrams.hint("shuffle_hash"), "g")
    val wPos = Window.partitionBy("doc_id").orderBy("pos")
    val islands = marked
      .withColumn("new_island",
        when(col("pos") - lag(col("pos"), 1).over(wPos) <= spanTokens - 1, 0L)
          .otherwise(1L))
      .withColumn("island",
        sum(col("new_island")).over(
          wPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg((max(col("pos")) - min(col("pos")) + spanTokens).as("span_tokens"))
    val profile = islands.groupBy("doc_id").agg(
      count(lit(1)).as("n_dup_spans"),
      max(col("span_tokens")).as("max_span_tokens"),
      sum(col("span_tokens")).as("covered_tokens"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(profile, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        floor(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens") * 1e6 + 0.5).cast("long").as("cover_micro"))
  }

  /** q128: the duplicated-span profile over the full corpus. */
  val q128DupSpanProfile: QuerySpec = QuerySpec(
    "q128_dup_span_profile",
    s"""WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(w[i:i+${DupSpanTokens - 1}], ' ') AS g
      |  FROM docs, unnest(generate_series(1, len(w) - ${DupSpanTokens - 1})) AS t(i)
      |  WHERE len(w) >= $DupSpanTokens),
      |dup AS (
      |  SELECT g FROM (
      |    SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g)
      |  WHERE df >= 2),
      |marked AS (SELECT grams.* FROM grams JOIN dup USING (g)),
      |flagged AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
      |      <= ${DupSpanTokens - 1} THEN 0 ELSE 1 END AS new_island
      |  FROM marked),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flagged),
      |spans AS (
      |  SELECT doc_id, island,
      |    max(pos) - min(pos) + $DupSpanTokens AS span_tokens
      |  FROM isl GROUP BY doc_id, island),
      |prof AS (
      |  SELECT doc_id, count(*) AS n_dup_spans,
      |    max(span_tokens) AS max_span_tokens,
      |    sum(span_tokens) AS covered_tokens
      |  FROM spans GROUP BY doc_id)
      |SELECT d.doc_id AS doc_id,
      |  CAST(len(d.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
      |  CAST(coalesce(p.max_span_tokens, 0) AS BIGINT) AS max_span_tokens,
      |  CAST(coalesce(p.covered_tokens, 0) AS BIGINT) AS covered_tokens,
      |  CAST(floor(CAST(coalesce(p.covered_tokens, 0) AS DOUBLE) / len(d.w)
      |    * 1e6 + 0.5) AS BIGINT) AS cover_micro
      |FROM docs d LEFT JOIN prof p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    dupSpanProfile(Tables.documents(s, dir)).orderBy("doc_id")
  }

  /** Per-source agreement card between the two sub-quadratic near-dup
    * detector families: doc-level verdicts (does the doc participate in
    * ANY flagged pair?) from the MinHash-banded path ([[minhashCandidates]],
    * shingle-set similarity — order-sensitive) and the SimHash hamming
    * path ([[simhashPairs]], token-bag similarity — order-blind), folded
    * into the 2×2 confusion counts plus exact-integer observed/chance
    * agreement and Cohen's kappa in ppm. q106 calibrates ONE detector
    * against exact Jaccard; this card measures where the two FAMILIES
    * diverge per source — the input to "which detector do we trust on
    * this feed", and a drift alarm when a source's kappa moves.
    *
    * Exactness: all four cells are integer counts; po = (a+d)/n,
    * pe = (r₁c₁ + r₀c₀)/n², kappa = (po−pe)/(1−pe) are computed as one
    * integer floor-division each after clearing denominators —
    * DECIMAL(38,0) holds 10⁶·n² exactly past 10¹⁵ docs per source, and
    * Spark `div` and DuckDB `//` share truncation-toward-zero semantics
    * (kappa may be negative). kappa_ppm is NULL only in the degenerate
    * pe = 1 slice (both detectors unanimous), via the same nullif in
    * both engines.
    *
    * Scale shape: both detectors are the existing banded equi-join
    * paths; verdicts are two DISTINCT contractions of the pair frames
    * joined back id-to-id; the card itself is one per-source hash-agg
    * folding to a sources-bounded metadata frame. Nothing new shuffles
    * the text. */
  def detectorAgreement(docs: DataFrame, minEstimate: Double,
      maxHamming: Int): DataFrame =
    detectorAgreementFrom(docs, minhashCandidates(docs, minEstimate),
      simhashPairs(docs, maxHamming))

  /** [[detectorAgreement]] from existing (cached) pair frames of the two
    * detector families over the same corpus. */
  def detectorAgreementFrom(docs: DataFrame, mhPairs: DataFrame,
      shPairs: DataFrame): DataFrame = {
    val mhFlag = mhPairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().withColumn("mh", lit(true))
    val shFlag = shPairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().withColumn("sh", lit(true))
    val flagged = docs.select("doc_id", "source")
      .join(mhFlag, Seq("doc_id"), "left")
      .join(shFlag, Seq("doc_id"), "left")
      .select(col("source"), coalesce(col("mh"), lit(false)).as("mh"),
        coalesce(col("sh"), lit(false)).as("sh"))
    flagged.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("mh") && col("sh"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("mh") && !col("sh"), 1L).otherwise(0L)).as("n_minhash_only"),
        sum(when(!col("mh") && col("sh"), 1L).otherwise(0L)).as("n_simhash_only"),
        sum(when(!col("mh") && !col("sh"), 1L).otherwise(0L)).as("n_neither"))
      .withColumn("chance", expr(
        "(CAST(n_both AS DECIMAL(38,0)) + n_minhash_only)" +
          " * (CAST(n_both AS DECIMAL(38,0)) + n_simhash_only)" +
          " + (CAST(n_simhash_only AS DECIMAL(38,0)) + n_neither)" +
          " * (CAST(n_minhash_only AS DECIMAL(38,0)) + n_neither)"))
      .withColumn("nn", expr("CAST(n_docs AS DECIMAL(38,0)) * n_docs"))
      .select(col("source"), col("n_docs"), col("n_both"),
        col("n_minhash_only"), col("n_simhash_only"), col("n_neither"),
        expr("CAST((1000000 * (CAST(n_both AS DECIMAL(38,0)) + n_neither))" +
          " DIV n_docs AS BIGINT)").as("po_ppm"),
        expr("CAST((1000000 * chance) DIV nn AS BIGINT)").as("pe_ppm"),
        expr("CAST((1000000 * (CAST(n_docs AS DECIMAL(38,0))" +
          " * (n_both + n_neither) - chance))" +
          " DIV nullif(nn - chance, 0) AS BIGINT)").as("kappa_ppm"))
      .orderBy("source")
  }

  /** q190: the detector-agreement card over the corpus with two planted
    * duplicate classes chosen to SPLIT the detectors: exact copies
    * (doc_id%7==0, +1e8 — both families flag) and token-REVERSED
    * copies (doc_id%11==3, +3e8 — identical token bag, so SimHash
    * sees hamming 0, while the 3-gram shingle set is destroyed and
    * MinHash stays silent). Kappa then quantifies exactly the
    * order-sensitivity gap between the families. Oracle: the shared
    * minhash/simhash CTE generators over the same injected corpus. */
  val q190DetectorKappa: QuerySpec = QuerySpec(
    "q190_detector_kappa", {
      val minAgree = math.ceil(0.5 * MinhashK).toInt
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000, text, source FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 300000000,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text,
        |    source
        |  FROM documents WHERE doc_id % 11 = 3),
        |""".stripMargin +
        minhashPairsSqlCtesFrom("corpus", minAgree) + ",\n" +
        simhashSigSqlCtesFrom("corpus", "sh_sig") + ",\n" +
        """sh_pairs AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM sh_sig a JOIN sh_sig b ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
          |mh_flag AS (SELECT DISTINCT doc_id FROM (
          |  SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b AS doc_id FROM pairs)),
          |sh_flag AS (SELECT DISTINCT doc_id FROM (
          |  SELECT doc_a AS doc_id FROM sh_pairs UNION ALL SELECT doc_b AS doc_id FROM sh_pairs)),
          |f AS (
          |  SELECT c.source, m.doc_id IS NOT NULL AS mh, s2.doc_id IS NOT NULL AS sh
          |  FROM corpus c
          |  LEFT JOIN mh_flag m ON m.doc_id = c.doc_id
          |  LEFT JOIN sh_flag s2 ON s2.doc_id = c.doc_id),
          |conf AS (
          |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
          |    CAST(coalesce(sum(CASE WHEN mh AND sh THEN 1 END), 0) AS HUGEINT) AS aa,
          |    CAST(coalesce(sum(CASE WHEN mh AND NOT sh THEN 1 END), 0) AS HUGEINT) AS bb,
          |    CAST(coalesce(sum(CASE WHEN NOT mh AND sh THEN 1 END), 0) AS HUGEINT) AS cc,
          |    CAST(coalesce(sum(CASE WHEN NOT mh AND NOT sh THEN 1 END), 0) AS HUGEINT) AS dd
          |  FROM f GROUP BY source)
          |SELECT source, CAST(n AS BIGINT) AS n_docs, CAST(aa AS BIGINT) AS n_both,
          |  CAST(bb AS BIGINT) AS n_minhash_only, CAST(cc AS BIGINT) AS n_simhash_only,
          |  CAST(dd AS BIGINT) AS n_neither,
          |  CAST((1000000 * (aa + dd)) // n AS BIGINT) AS po_ppm,
          |  CAST((1000000 * ((aa+bb)*(aa+cc) + (cc+dd)*(bb+dd))) // (n*n) AS BIGINT) AS pe_ppm,
          |  CAST((1000000 * (n*(aa+dd) - ((aa+bb)*(aa+cc) + (cc+dd)*(bb+dd))))
          |    // nullif(n*n - ((aa+bb)*(aa+cc) + (cc+dd)*(bb+dd)), 0) AS BIGINT) AS kappa_ppm
          |FROM conf ORDER BY source""".stripMargin
    }) { (s, dir) =>
    val corpus =
      corpusI711r(Tables.documents(s, dir).select("doc_id", "text", "source"))
    detectorAgreementFrom(corpus,
      minhashCandidatesCachedOn(s, dir, "i711r_1e8", () => corpus, 0.5),
      simhashPairsCachedOn(s, dir, "i711r_1e8", () => corpus, 2))
  }

  val all: Seq[QuerySpec] = Seq(
    q26ExactDedup, q27NgramJaccard, q28MinhashLsh, q29Simhash, q55Containment,
    q60NearDupClusters, q65Decontaminate, q71IncrementalDedup,
    q79NearDupClustersStar, q80SpanDedup, q81NormalizedDedup,
    q82WinnowFingerprints, q83WinnowDecontaminate, q90SourceOverlap,
    q94BloomAdmit, q106MinhashRecall, q107QualityKeeper,
    q110BoilerplateSpans, q128DupSpanProfile, q190DetectorKappa,
    q197BandLoad, q199DupMass, q200DedupYield, q201MinhashCalibration,
    q202SourceDedupGain)
}

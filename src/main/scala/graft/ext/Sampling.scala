package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` / `sampleBy()` draw from `rand(seed)`, whose per-row
  * values depend on the physical partition layout — a different
  * `maxPartitionBytes`, file count, or cluster size yields a DIFFERENT
  * sample from the same seed. A corpus pipeline needs the opposite:
  * membership decided by the record itself, so the sample is stable
  * across re-runs, engines, and scale-ups, and so downstream joins
  * against the sample stay consistent. The bucket is md5-prefix
  * arithmetic on the key (same construction as the q34 hash fallback —
  * SURVEY.md §7.4 "semantic, not bitwise"), reproducible in ANY engine,
  * which also makes the operator fully oracle-checkable.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from the record key. `salt`
    * gives every OPERATION its own decision stream: without it, the
    * sampler, the mixture's fractional copy, the split assigner, and the
    * packer's shard would all rank records by the SAME md5 value — e.g.
    * a 20% sample would land 100% inside the 90% train split and val/test
    * would be sample-free. Composed pipeline stages must be decorrelated,
    * so each public operator below passes a distinct salt. */
  def hashBucket(key: Column, buckets: Int = 100, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(buckets)).cast("int")

  /** SQL twin of [[hashBucket]] — the single source of the oracle-side
    * bucket spelling (q53/q61/q62/q64 all assemble from here; a widened
    * hex prefix edited in one copy but not another would silently break
    * that query's engine parity). */
  def hashBucketSql(keyExpr: String, buckets: Int, salt: String = ""): String = {
    val salted = if (salt.isEmpty) s"CAST($keyExpr AS VARCHAR)"
      else s"'$salt' || CAST($keyExpr AS VARCHAR)"
    s"CAST(CAST(('0x' || substr(md5($salted), 1, 8)) AS BIGINT) % $buckets AS INT)"
  }

  /** Keep ~`pct`% of rows, decided per-record (scan-local filter — no
    * shuffle, pushes nothing but costs one md5 per row). */
  def deterministicSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key, salt = "sample:") < pct)

  /** Stratified deterministic sample: per-stratum keep percentage,
    * default percentage for unlisted strata. The rate lookup is a
    * when-chain (broadcast-free for small strata maps). */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
      pctByStratum: Seq[(String, Int)], defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.foldLeft(when(lit(false), 0)) {
      case (acc, (s, p)) => acc.when(col(strataCol) === s, p)
    }.otherwise(defaultPct)
    df.filter(hashBucket(key, salt = "strata:") < pct)
  }

  /** Language-stratified corpus sample: downsample dominant en, keep all
    * de, mid-rate the rest — the canonical corpus-balancing move. */
  val q53StratifiedSample: QuerySpec = QuerySpec(
    "q53_stratified_sample",
    s"""WITH bucketed AS (
      |  SELECT doc_id, lang,
      |    ${hashBucketSql("doc_id", 100, "strata:")} AS bucket
      |  FROM documents)
      |SELECT lang, count(*) AS n_sampled,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM bucketed
      |WHERE bucket < (CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 100 ELSE 50 END)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    stratifiedSample(Tables.documents(s, dir), "lang", col("doc_id"),
      Seq("en" -> 20, "de" -> 100), defaultPct = 50)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang")
  }

  /** Weighted corpus mixture — the data-mixing step of an LLM training
    * pipeline: per-source weights may EXCEED 1 (epoch repetition:
    * upsample a high-quality source 2.5×), producing ⌊w⌋ full copies of
    * every row plus one fractional copy whose membership is the same
    * deterministic md5 bucket as [[deterministicSample]]. Emits a `copy`
    * index (0-based) so downstream sharding/shuffling can treat repeats
    * as distinct rows.
    *
    * Scan-local: weight lookup is a literal when-chain, membership is
    * per-record arithmetic, repetition is a generator — no shuffle, no
    * join, no state, so it composes under any downstream partitioning at
    * any scale. Weights are split driver-side into integer (copies, pct)
    * pairs, so both engines compare integers only — no float thresholds
    * to drift cross-engine, which is what lets q61 carry a full oracle. */
  def mixCorpus(df: DataFrame, sourceCol: String, key: Column,
      weightBySource: Seq[(String, Double)], defaultWeight: Double = 0.0): DataFrame = {
    // fractional weights are quantized to WHOLE percent (the bucket
    // granularity); refuse a weight the quantization would silently
    // distort into zero rather than drop a source the caller asked for
    def split(w: Double): (Int, Int) = {
      require(w >= 0, s"mixture weight must be non-negative, got $w")
      val full = math.floor(w).toInt
      val pct = math.round((w - full) * 100).toInt
      require(w == 0 || full > 0 || pct > 0,
        s"mixture weight $w is below the 1% granularity (smallest nonzero: 0.005)")
      (full, pct)
    }
    val (defFull, defPct) = split(defaultWeight)
    val fullCol = weightBySource.foldLeft(when(lit(false), 0)) {
      case (acc, (s, w)) => acc.when(col(sourceCol) === s, split(w)._1)
    }.otherwise(defFull)
    val pctCol = weightBySource.foldLeft(when(lit(false), 0)) {
      case (acc, (s, w)) => acc.when(col(sourceCol) === s, split(w)._2)
    }.otherwise(defPct)
    df.withColumn("__n_copies",
        fullCol + when(hashBucket(key, salt = "mix:") < pctCol, 1).otherwise(0))
      // filter BEFORE the generator: sequence(0, -1) is Spark's DESCENDING
      // [0, -1], not empty
      .filter(col("__n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__n_copies") - 1)))
      .drop("__n_copies")
  }

  /** q61: source-weighted mixture of the documents corpus (src0 upsampled
    * 2.5 epochs, src1 kept, src2 downsampled, everything else 25%),
    * summarized per (source, copy) so the oracle pins both the repetition
    * plan and the fractional memberships. */
  val q61CorpusMixture: QuerySpec = QuerySpec(
    "q61_corpus_mixture",
    s"""WITH b AS (
      |  SELECT doc_id, source,
      |    ${hashBucketSql("doc_id", 100, "mix:")} AS bucket
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |    (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1 WHEN 'src2' THEN 0 ELSE 0 END)
      |    + (CASE WHEN bucket < (CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 0 WHEN 'src2' THEN 40 ELSE 25 END)
      |       THEN 1 ELSE 0 END) AS n_copies
      |  FROM b),
      |x AS (
      |  SELECT doc_id, source, unnest(generate_series(0, n_copies - 1)) AS copy
      |  FROM c WHERE n_copies > 0)
      |SELECT source, copy, count(*) AS n_rows,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM x GROUP BY source, copy
      |ORDER BY source, copy""".stripMargin) { (s, dir) =>
    mixCorpus(Tables.documents(s, dir), "source", col("doc_id"),
      Seq("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4), defaultWeight = 0.25)
      // DuckDB's generate_series yields BIGINT — align the copy dtype
      .withColumn("copy", col("copy").cast("long"))
      .groupBy("source", "copy")
      .agg(count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "copy")
  }

  /** Deterministic train/val/test assignment: the record's md5 bucket
    * decides its split, so membership survives re-runs, engine changes,
    * repartitioning, and incremental corpus growth (a doc added tomorrow
    * cannot move today's docs between splits — the property random-seed
    * splits lose the moment data or partitioning changes). Scan-local. */
  def assignSplit(key: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(key, salt = "split:")
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** SQL twin of [[assignSplit]] — shared by the q64 and q75 oracles so
    * the split thresholds can't drift between them. */
  def assignSplitSql(keyExpr: String, trainPct: Int = 90, valPct: Int = 5): String = {
    val b = hashBucketSql(keyExpr, 100, "split:")
    s"CASE WHEN $b < $trainPct THEN 'train' " +
      s"WHEN $b < ${trainPct + valPct} THEN 'val' ELSE 'test' END"
  }

  /** q64: 90/5/5 corpus split summary — per-split counts and id ranges
    * pin every membership decision. */
  val q64TrainValTestSplit: QuerySpec = QuerySpec(
    "q64_train_val_test_split",
    s"""SELECT
      |  ${assignSplitSql("doc_id")} AS split,
      |  count(*) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM documents GROUP BY 1
      |ORDER BY split""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("split", assignSplit(col("doc_id")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("split")
  }

  /** Leakage-safe train/val/test split: near-duplicate docs must land in
    * the SAME split — a per-doc hash split (q64) puts members of a
    * near-dup cluster on both sides of the train/test boundary, which is
    * eval leakage (the model trains on a near-copy of a test doc). The
    * split key becomes the doc's near-dup CLUSTER REPRESENTATIVE
    * (MinHash-banded candidates → star-contraction components — both the
    * sub-quadratic scale forms), falling back to the doc's own id when it
    * has no near-dups; membership stays deterministic and incremental-
    * corpus-stable for exactly the reasons [[assignSplit]] documents.
    *
    * Scale shape: the pair mining is q28's band equi-join, the
    * clustering is q79's O(log n) contraction over the (sparse) pair
    * set, and the split itself is scan-local — the only corpus-wide
    * extra vs q64 is the signature aggregate. */
  def leakageSafeSplit(docs: DataFrame, minEstimate: Double = 0.5): DataFrame =
    leakageSafeSplitFrom(docs, Dedup.minhashCandidates(docs, minEstimate))

  /** [[leakageSafeSplit]] from an existing (cached) pair frame. */
  def leakageSafeSplitFrom(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = Dedup.clustersFromPairsStar(pairs)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("split_key"),
        col("cluster_rep").isNotNull.as("clustered"))
      .withColumn("split", assignSplit(col("split_key")))
  }

  /** q86: leakage-safe split over the full corpus. Oracle: the q28
    * MinHash pair CTEs + the q60 recursive-CTE components + the shared
    * split fragment over the coalesced representative. */
  val q86LeakageSafeSplit: QuerySpec = QuerySpec(
    "q86_leakage_safe_split",
    "WITH RECURSIVE " +
      Dedup.minhashPairsSqlCtesFrom("documents",
        math.ceil(0.5 * Dedup.MinhashK).toInt) + s""",
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |labels AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS rep
      |  FROM reach GROUP BY src)
      |SELECT d.doc_id AS doc_id,
      |  coalesce(l.rep, d.doc_id) AS split_key,
      |  (l.rep IS NOT NULL) AS clustered,
      |  ${assignSplitSql("coalesce(l.rep, d.doc_id)")} AS split
      |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    leakageSafeSplitFrom(Tables.documents(s, dir),
      Dedup.minhashCandidatesCached(s, dir, 0.5)).orderBy("doc_id")
  }

  /** Per-tier keep rates (percent) for [[qualityTierSample]] — ONE home
    * shared by the Scala rate chain and the oracle's CASE (assembled from
    * this Seq) so a tuned rate can't land in only one engine. */
  final val TierRates: Seq[(String, Int)] = Seq(
    "high" -> 100, "medium" -> 50, "low" -> 10)

  /** Tier-rated deterministic sample — the CCNet-style corpus-balancing
    * move: keep ALL high-quality docs, half of medium, a thin slice of
    * low (the tail still contributes diversity, just not volume). Tiers
    * are [[TextAnalysis.qualityTier]]'s published 0.6/0.4 bands, so the
    * sample agrees with the q23 profiling view by construction;
    * membership is the per-record hash decision every operator in this
    * module uses (scan-local, partitioning-independent, own salt). */
  def qualityTierSample(docs: DataFrame): DataFrame = {
    val (lenScore, ttr, stopRatio) = TextAnalysis.qualityParts(col("text"))
    val q = TextAnalysis.qualityScore(lenScore, ttr, stopRatio)
    val tier = TextAnalysis.qualityTier(q)
    val rate = TierRates.foldLeft(when(lit(false), 0)) {
      case (acc, (t, p)) => acc.when(tier === t, p)
    }.otherwise(0)
    docs.select(col("doc_id"), tier.as("tier"),
      (hashBucket(col("doc_id"), 100, salt = "tier:") < rate).as("kept"))
  }

  /** q88: tier-rated sampling over the full corpus, all rows with their
    * keep decision (audit shape, like q84's `selected`). */
  val q88QualityTierSample: QuerySpec = QuerySpec(
    "q88_quality_tier_sample",
    "WITH p AS (\n  " +
      TextAnalysis.qualityPartsSql("") + "),\n" +
      s"f AS (\n  SELECT doc_id, ${TextAnalysis.QualityBlendSql} AS q FROM p),\n" +
      s"t AS (\n  SELECT doc_id, ${TextAnalysis.qualityTierSql("q")} AS tier FROM f)\n" +
      s"""SELECT doc_id, tier,
        |  (${hashBucketSql("doc_id", 100, "tier:")} <
        |    CASE tier ${TierRates.map { case (t, p) => s"WHEN '$t' THEN $p" }
          .mkString(" ")} ELSE 0 END) AS kept
        |FROM t
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    qualityTierSample(Tables.documents(s, dir)).orderBy("doc_id")
  }

  /** Target token shares (percent) for [[tokenMixture]]'s registered
    * query — concentrate on src0/src1, thin the rest. */
  final val TokenShares: Seq[(String, Int)] = Seq(
    "src0" -> 30, "src1" -> 20, "src2" -> 10, "src3" -> 5)

  /** Token-share mixture — [[mixCorpus]]'s inverse: the caller states the
    * token DISTRIBUTION the training run should see (DoReMi/Pile-style
    * domain shares) and the operator solves for each source's repetition
    * weight from the corpus's actual token counts. With a token budget of
    * the corpus total B, a source with share p% and S tokens gets
    * target T = B·p DIV 100, i.e. T DIV S full epochs plus a fractional
    * epoch of ((T mod S)·100 DIV S)% of its docs (the usual hash-bucket
    * membership, own salt). ALL of that is integer arithmetic on token
    * counts — no double ratio ever materializes, so the rate table is
    * bitwise cross-engine and q91 carries a full oracle (the
    * floating-point weight quantization this avoids is exactly the
    * rounding-tie class SURVEY.md §7.4 bans). Unlisted sources get share
    * 0 and drop out.
    *
    * Scale shape: ONE rate pass (a per-source agg — map-side partials,
    * low-cardinality shuffle of partials only) whose ≤|sources|-row
    * result is reduced driver-side — the same bounded-metadata class as
    * the IVF centroid literalize and [[mixCorpus]]'s weight spec — into
    * literal when-chain rates for the LISTED sources (the share spec is
    * a small named list by construction; unlisted sources drop out), and
    * ONE apply pass that is a pure scan-local projection, join-free. Two
    * corpus scans total; a broadcast-join rate attach was measured to
    * plan a THIRD full scan for the corpus-total row, which the driver
    * reduction removes. */
  def tokenMixture(docs: DataFrame,
      sharePctBySource: Seq[(String, Int)] = TokenShares): DataFrame = {
    require(sharePctBySource.nonEmpty, "at least one target share required")
    sharePctBySource.foreach { case (s, p) =>
      require(p >= 0 && p <= 100, s"share for $s must be in [0,100], got $p") }
    require(sharePctBySource.map(_._2).sum <= 100,
      s"shares exceed 100%: $sharePctBySource")
    val withTok = docs.select(col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val srcTokens = withTok.groupBy("source")
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("src_tokens")).toMap
    val total = srcTokens.values.sum
    // exact integer replay of the SQL oracle's // arithmetic — all Long,
    // no double weight ever materializes
    val rates = sharePctBySource.collect {
      case (s, p) if p > 0 && srcTokens.contains(s) =>
        val sTok = srcTokens(s)
        val t = total * p / 100
        (s, t / sTok, t % sTok * 100 / sTok)
    }
    val fullCol = rates.foldLeft(when(lit(false), 0L)) {
      case (acc, (s, f, _)) => acc.when(col("source") === s, f)
    }.otherwise(0L)
    val pctCol = rates.foldLeft(when(lit(false), 0L)) {
      case (acc, (s, _, pc)) => acc.when(col("source") === s, pc)
    }.otherwise(0L)
    withTok
      .withColumn("__n_copies", fullCol +
        when(hashBucket(col("doc_id"), 100, salt = "tokmix:") < pctCol,
          1L).otherwise(0L))
      .filter(col("__n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n_copies") - 1)))
      .select("doc_id", "source", "n_tokens", "copy")
  }

  /** q91: the token-share mixture summarized per (source, copy) — the
    * oracle pins the rate table (via the integer arithmetic), the
    * fractional memberships, and the achieved token volumes. */
  val q91TokenMixture: QuerySpec = QuerySpec(
    "q91_token_mixture",
    s"""WITH tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |tot AS (SELECT sum(n_tokens) AS total_tokens FROM tok),
      |rates AS (
      |  SELECT source,
      |    ((t.total_tokens * (CASE source ${TokenShares.map { case (s, p) =>
          s"WHEN '$s' THEN $p" }.mkString(" ")} ELSE 0 END)) // 100)
      |      // sum(n_tokens) AS full_copies,
      |    ((((t.total_tokens * (CASE source ${TokenShares.map { case (s, p) =>
          s"WHEN '$s' THEN $p" }.mkString(" ")} ELSE 0 END)) // 100)
      |      % sum(n_tokens)) * 100) // sum(n_tokens) AS frac_pct
      |  FROM tok, tot t GROUP BY source, t.total_tokens),
      |c AS (
      |  SELECT tok.doc_id, tok.source, tok.n_tokens,
      |    CAST(r.full_copies + (CASE WHEN ${hashBucketSql("doc_id", 100, "tokmix:")}
      |      < r.frac_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
      |  FROM tok JOIN rates r ON tok.source = r.source),
      |x AS (
      |  SELECT doc_id, source, n_tokens,
      |    unnest(generate_series(0, n_copies - 1)) AS copy
      |  FROM c WHERE n_copies > 0)
      |SELECT source, copy, count(*) AS n_rows,
      |  CAST(sum(n_tokens) AS BIGINT) AS tok_sum, min(doc_id) AS first_doc
      |FROM x GROUP BY source, copy
      |ORDER BY source, copy""".stripMargin) { (s, dir) =>
    tokenMixture(Tables.documents(s, dir))
      .withColumn("copy", col("copy").cast("long"))
      .groupBy("source", "copy")
      .agg(count(lit(1)).as("n_rows"), sum(col("n_tokens")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("source", "copy")
  }

  final val EpochShards = 8
  final val ShuffleEpoch = 1

  /** Deterministic epoch shuffle — the training-order step between
    * corpus build and the data loader: every doc gets a shard and a
    * position within it, both pure functions of (doc_id, epoch), so the
    * epoch-1 order is reproducible across runs, engines, and cluster
    * sizes, and each epoch is a fresh decorrelated permutation (the salt
    * carries the epoch). No `rand()`: a layout-dependent shuffle order
    * is silently different data on every re-run — the exact failure
    * [[hashBucket]]'s doc explains.
    *
    * Scale shape: shard assignment is scan-local; the only ordered step
    * is the per-shard `row_number`, and nShards is chosen to match the
    * WRITER count (thousands of output files at 100 TB), so each shard
    * is ~N/nShards rows by hash uniformity — the per-shard sort IS the
    * per-output-file sort a shard writer needs anyway. No global sort,
    * no low-cardinality skew (shards are uniform by construction). */
  def epochShuffle(docs: DataFrame, epoch: Int = ShuffleEpoch,
      nShards: Int = EpochShards): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    docs.select(col("doc_id"),
        hashBucket(col("doc_id"), nShards, salt = s"epoch$epoch:").as("shard"),
        md5(concat(lit(s"order$epoch:"), col("doc_id").cast("string")))
          .as("ord"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("ord")
  }

  /** q89: the epoch-1 shuffle order. Both engines order by the same
    * lowercase-hex md5 string, so the per-shard permutation is
    * byte-identical cross-engine. */
  val q89EpochShuffle: QuerySpec = QuerySpec(
    "q89_epoch_shuffle",
    s"""SELECT doc_id, shard, pos FROM (
      |  SELECT doc_id,
      |    ${hashBucketSql("doc_id", EpochShards, s"epoch$ShuffleEpoch:")} AS shard,
      |    row_number() OVER (
      |      PARTITION BY ${hashBucketSql("doc_id", EpochShards, s"epoch$ShuffleEpoch:")}
      |      ORDER BY md5('order$ShuffleEpoch:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    epochShuffle(Tables.documents(s, dir)).orderBy("doc_id")
  }

  // ---- exact-k deterministic sample --------------------------------------

  final val ExactSampleK = 100

  /** Exactly-k uniform sample — the fixed-size contract the percentage
    * samplers above can't give ("hand me exactly 1000 eval docs,
    * reproducibly"): rank every row by a salted md5 draw (60 bits — a
    * full-width total order, not a bucket) and keep the k smallest.
    * Deterministic across runs, engines, and partitionings, like every
    * sampler in this module; uniform because the draw is independent of
    * any attribute.
    *
    * Scale shape: the draw is scan-local and the k smallest plan as
    * TakeOrderedAndProject — per-partition heaps of k rows merged on the
    * driver, NO global sort, no single-partition window; the classic
    * distributed bottom-k. (A reservoir sampler is the streaming cousin;
    * this is the batch form a 100 TB table wants.) */
  def exactKSample(docs: DataFrame, k: Int = ExactSampleK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val draw = conv(substring(
        md5(concat(lit("ksample:"), col("doc_id").cast("string"))), 1, 15),
      16, 10).cast("long")
    docs.select(col("doc_id"), col("lang"), col("source"), draw.as("draw"))
      .orderBy(col("draw"), col("doc_id"))
      .limit(k)
  }

  /** Weighted exact-k sample — sequential Poisson sampling (Ohlsson):
    * priority = draw / weight, keep the k SMALLEST priorities, giving
    * inclusion probability ≈ proportional to weight (here: token count,
    * so long docs are sampled ∝ their token mass — the right frame for
    * token-level corpus estimates). The priority is one exact division
    * of two integers (the 60-bit draw of [[exactKSample]] over the
    * scan-local token count) — deterministic cross-engine, no
    * transcendental (the -ln(u)/w exponential-jump form would cost the
    * oracle; Ohlsson's u/w form is the standard rational equivalent).
    * Same TakeOrdered bottom-k plan as [[exactKSample]]: no global sort,
    * no shuffle. */
  def weightedKSample(docs: DataFrame, k: Int = ExactSampleK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val draw = conv(substring(
        md5(concat(lit("wsample:"), col("doc_id").cast("string"))), 1, 15),
      16, 10).cast("long")
    val w = size(TextAnalysis.tokens(col("text")))
    docs.select(col("doc_id"), col("lang"), col("source"),
        w.cast("long").as("weight"),
        (draw.cast("double") / w).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** q131: the token-weighted sample over documents. The oracle replays
    * the identical integer-ratio priority; no rounding is needed because
    * both engines divide the same exact integers. */
  val q131WeightedSample: QuerySpec = QuerySpec(
    "q131_weighted_sample",
    s"""SELECT doc_id, lang, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
      |  CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |    / len(string_split(text, ' ')) AS priority
      |FROM documents
      |ORDER BY priority, doc_id
      |LIMIT $ExactSampleK""".stripMargin) { (s, dir) =>
    weightedKSample(Tables.documents(s, dir))
  }

  /** q125: the exact-k sample over documents. */
  val q125ExactKSample: QuerySpec = QuerySpec(
    "q125_exact_k_sample",
    s"""SELECT doc_id, lang, source,
      |  CAST(('0x' || substr(md5('ksample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS draw
      |FROM documents
      |ORDER BY draw, doc_id
      |LIMIT $ExactSampleK""".stripMargin) { (s, dir) =>
    exactKSample(Tables.documents(s, dir))
  }

  val all: Seq[QuerySpec] = Seq(
    q53StratifiedSample, q61CorpusMixture, q64TrainValTestSplit,
    q86LeakageSafeSplit, q88QualityTierSample, q89EpochShuffle,
    q91TokenMixture, q125ExactKSample, q131WeightedSample)
}

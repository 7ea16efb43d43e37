package graft.ext

import graft.{QuerySpec, Tables}
import graft.functions.Functions.{round6, round6Sql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data selection under a token budget — the DataComp/DsDm-style step
  * between scoring and training: rank the corpus by quality, then keep
  * the best docs until the budget is spent. The greedy prefix over a
  * TOTAL order (quality band DESC, then a deterministic hash tiebreak)
  * makes the selected set reproducible across runs, engines, and
  * partitionings — the same determinism contract as `Sampling`.
  *
  * Scale shape — a global running sum without a global sort: the same
  * two-level prefix-sum decomposition as q70's chunked window. Docs get
  * a scan-local (band, bucket) group key whose lexicographic order IS
  * the selection order; per-group token sums (≤ bands × buckets rows —
  * metadata, not data) take ONE tiny running-sum window for the group
  * offsets, which broadcast back; each doc's exact global cumulative is
  * then its group offset plus a within-group window — parallel across
  * all (band, bucket) groups. No full-corpus sort, no single-partition
  * window over data rows.
  */
object Selection {

  final val SelectBudgetTokens = 10000L
  final val SelectBands = 20
  final val SelectBuckets = 256

  final val CapPerSource = 10
  final val CapBuckets = 16

  /** Every doc with its priority band and the selected flag: selected ⇔
    * the doc STARTS before the budget is exhausted in (band DESC,
    * bucket, doc_id) order (greedy prefix — the first doc to cross the
    * boundary is still taken, matching "fill the budget"). */
  def selectUnderBudget(docs: DataFrame,
      budgetTokens: Long = SelectBudgetTokens): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val (lenScore, ttr, stopRatio) = TextAnalysis.qualityParts(col("text"))
    val q = TextAnalysis.qualityScore(lenScore, ttr, stopRatio)
    val assigned = docs
      .withColumn("band", floor(q * SelectBands).cast("int"))
      .select(col("doc_id"), col("band"),
        Sampling.hashBucket(col("doc_id"), SelectBuckets, salt = "select:")
          .as("bucket"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    // group metadata: ≤ bands × buckets rows; the running sum over it is
    // a single-partition window over METADATA (the q70 block-map
    // argument), never over corpus rows
    val groups = assigned.groupBy("band", "bucket")
      .agg(sum(col("n_tokens")).as("grp_tokens"))
    val wOff = Window.orderBy(col("band").desc, col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = groups
      .withColumn("grp_off", sum(col("grp_tokens")).over(wOff) - col("grp_tokens"))
      .select("band", "bucket", "grp_off")
    val wIn = Window.partitionBy("band", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assigned
      .join(broadcast(offsets), Seq("band", "bucket"))
      .withColumn("cum",
        col("grp_off") + sum(col("n_tokens")).over(wIn))
      .select(col("doc_id"), col("band"), col("n_tokens"),
        (col("cum") - col("n_tokens") < budgetTokens).as("selected"))
  }

  /** q84: budget selection over the full corpus. The oracle replays the
    * SAME total order as one flat running sum — DuckDB at gate scale can
    * afford the global window the Spark plan exists to avoid, which is
    * exactly what proves the two-level decomposition exact. */
  val q84BudgetSelect: QuerySpec = QuerySpec(
    "q84_budget_select",
    "WITH p AS (\n  " +
      TextAnalysis.qualityPartsSql(", text") + "),\n" +
      s"f AS (\n  SELECT doc_id, text, ${TextAnalysis.QualityBlendSql} AS q FROM p),\n" +
      s"""t AS (
        |  SELECT doc_id,
        |    CAST(floor(q * $SelectBands) AS INT) AS band,
        |    ${Sampling.hashBucketSql("doc_id", SelectBuckets, "select:")} AS bucket,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM f),
        |c AS (
        |  SELECT doc_id, band, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY band DESC, bucket, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, band, n_tokens,
        |  (cum - n_tokens < $SelectBudgetTokens) AS selected
        |FROM c
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    selectUnderBudget(Tables.documents(s, dir)).orderBy("doc_id")
  }

  /** Per-source document cap — the RefinedWeb/C4-style "no single domain
    * dominates the corpus" rule: keep at most `k` docs per source,
    * preferring the highest-quality ones under the same total order as
    * [[selectUnderBudget]] (quality band DESC, then doc_id).
    *
    * Scale shape — top-K per key without sorting a key's whole row set in
    * one task: the obvious `row_number() OVER (PARTITION BY source)`
    * serializes each source's full history through ONE task, and source
    * cardinality is exactly what a web corpus can't promise to be large
    * (a handful of giant domains is the norm — the q70 skew cliff with a
    * sort attached). So the cap runs the map-side-combine form of top-K:
    * phase 1 ranks within (source, hash-bucket) — parallelism sources ×
    * buckets, each group corpus/(sources × buckets) rows — and keeps k
    * per group, a superset of the answer (any row in a source's global
    * top-k is top-k within its own bucket); phase 2 re-ranks the
    * ≤ buckets × k survivors per source — metadata-scale rows — to the
    * exact global cap. ExtSpec pins phase-1+2 ≡ the naive single window. */
  def capPerSource(docs: DataFrame, k: Int = CapPerSource,
      buckets: Int = CapBuckets): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val (lenScore, ttr, stopRatio) = TextAnalysis.qualityParts(col("text"))
    val q = TextAnalysis.qualityScore(lenScore, ttr, stopRatio)
    val assigned = docs.select(col("doc_id"), col("source"),
      floor(q * SelectBands).cast("int").as("band"),
      Sampling.hashBucket(col("doc_id"), buckets, salt = "cap:").as("bucket"))
    val wBucket = Window.partitionBy("source", "bucket")
      .orderBy(col("band").desc, col("doc_id"))
    val survivors = assigned
      .withColumn("rn", row_number().over(wBucket))
      .filter(col("rn") <= k)
      .drop("rn", "bucket")
    val wSource = Window.partitionBy("source")
      .orderBy(col("band").desc, col("doc_id"))
    survivors
      // filter on the raw rank, cast after: a predicate on CAST(rn)
      // doesn't match InferWindowGroupLimit, and the trim is the point
      .withColumn("rn2", row_number().over(wSource))
      .filter(col("rn2") <= k)
      .withColumn("src_rank", col("rn2").cast("long"))
      .drop("rn2")
  }

  /** q87: the cap over the full corpus. The oracle replays the SAME
    * total order as ONE flat per-source window — affordable at gate
    * scale, which is exactly what proves the two-phase form exact. */
  val q87SourceCap: QuerySpec = QuerySpec(
    "q87_source_cap",
    "WITH p AS (\n  " +
      TextAnalysis.qualityPartsSql(", source") + "),\n" +
      s"f AS (\n  SELECT doc_id, source, ${TextAnalysis.QualityBlendSql} AS q FROM p),\n" +
      s"""t AS (
        |  SELECT doc_id, source,
        |    CAST(floor(q * $SelectBands) AS INT) AS band
        |  FROM f),
        |r AS (
        |  SELECT doc_id, source, band,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY band DESC, doc_id) AS src_rank
        |  FROM t)
        |SELECT doc_id, source, band, src_rank
        |FROM r WHERE src_rank <= $CapPerSource
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    capPerSource(Tables.documents(s, dir)).orderBy("doc_id")
  }

  // ---- DSIR importance weights -------------------------------------------

  final val DsirBuckets = 256
  final val DsirTargetSource = "src0"

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling") — score every document by how
    * target-like its token distribution is: hashed-unigram bag features,
    * a target-vs-raw probability ratio per feature bucket, and the
    * per-doc mean ratio as the importance weight. Here the target domain
    * is the `targetSource` slice of the corpus and raw is the whole
    * corpus; real deployments point the target side at a curated corpus.
    *
    * Cross-engine exactness: bucket probabilities are add-one-smoothed
    * RATIONAL counts, the per-bucket ratio is quantized to integer
    * micro-units (the q76 trick), and the per-doc aggregate carries the
    * exact BIGINT micro-sum — the only float is the final rounded mean.
    *
    * Scale shape: the feature table is ≤ `buckets` rows built by one
    * token explode → map-side-combined aggregate (conditional target
    * counts ride the same pass — the corpus is NOT scanned twice for the
    * two distributions); totals fold over those ≤ buckets rows, and the
    * ratio table broadcasts. Doc scoring is explode → broadcast hash
    * probe → one doc_id aggregate. Nothing shuffles the corpus on text;
    * model state is O(buckets), independent of vocabulary. */
  def dsirWeights(docs: DataFrame, targetSource: String = DsirTargetSource,
      buckets: Int = DsirBuckets): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toks = docs
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .withColumn("b", Sampling.hashBucket(col("token"), buckets, salt = "dsir:"))
    val bucketCounts = toks.groupBy("b").agg(
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("c_t"),
      count(lit(1)).as("c_r"))
    val totals = bucketCounts.agg(
      sum(col("c_t")).as("n_t"), sum(col("c_r")).as("n_r"))
    // exact bigint products, one deterministic double division, micro-round
    val ratios = bucketCounts.crossJoin(broadcast(totals))
      .select(col("b"),
        floor(((col("c_t") + 1) * (col("n_r") + buckets)).cast("double") /
          ((col("c_r") + 1) * (col("n_t") + buckets)) * 1e6 + 0.5)
          .cast("long").as("r_micro"))
    toks.join(broadcast(ratios), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("r_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"), col("sum_micro"),
        round6(col("sum_micro").cast("double") / col("n_tokens") / 1e6)
          .as("dsir_weight"))
  }

  /** q122: DSIR weights for every doc, exact micro-sums alongside. */
  val q122DsirWeights: QuerySpec = QuerySpec(
    "q122_dsir_weights",
    s"""WITH tok AS (
      |  SELECT doc_id, source,
      |    unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |ft AS (
      |  SELECT doc_id, source, token,
      |    ${Sampling.hashBucketSql("token", DsirBuckets, "dsir:")} AS b
      |  FROM tok WHERE token <> ''),
      |bc AS (
      |  SELECT b,
      |    CAST(sum(CASE WHEN source = '$DsirTargetSource' THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
      |    CAST(count(*) AS BIGINT) AS c_r
      |  FROM ft GROUP BY b),
      |tt AS (
      |  SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
      |    CAST(sum(c_r) AS BIGINT) AS n_r FROM bc),
      |rt AS (
      |  SELECT b,
      |    CAST(floor(CAST((c_t + 1) * (n_r + $DsirBuckets) AS DOUBLE) /
      |      ((c_r + 1) * (n_t + $DsirBuckets)) * 1e6 + 0.5) AS BIGINT) AS r_micro
      |  FROM bc CROSS JOIN tt)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(r_micro) AS BIGINT) AS sum_micro,
      |  ${round6Sql("CAST(sum(r_micro) AS DOUBLE) / count(*) / 1e6")} AS dsir_weight
      |FROM ft JOIN rt USING (b)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    dsirWeights(Tables.documents(s, dir)).orderBy("doc_id")
  }

  val all: Seq[QuerySpec] = Seq(q84BudgetSelect, q87SourceCap, q122DsirWeights)
}

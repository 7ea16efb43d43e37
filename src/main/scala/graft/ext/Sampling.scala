package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic bucket in [0, buckets) from the record key. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets)).cast("int")

  /** Keep ~`pct`% of rows, decided per-record (scan-local filter — no
    * shuffle, pushes nothing but costs one md5 per row). */
  def deterministicSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Stratified deterministic sample: per-stratum keep percentage,
    * default percentage for unlisted strata. The rate lookup is a
    * when-chain (broadcast-free for small strata maps). */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
      pctByStratum: Seq[(String, Int)], defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.foldLeft(when(lit(false), 0)) {
      case (acc, (s, p)) => acc.when(col(strataCol) === s, p)
    }.otherwise(defaultPct)
    df.filter(hashBucket(key) < pct)
  }

  /** Language-stratified corpus sample: downsample dominant en, keep all
    * de, mid-rate the rest — the canonical corpus-balancing move. */
  val q53StratifiedSample: QuerySpec = QuerySpec(
    "q53_stratified_sample",
    """WITH bucketed AS (
      |  SELECT doc_id, lang,
      |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
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

  val all: Seq[QuerySpec] = Seq(q53StratifiedSample)
}

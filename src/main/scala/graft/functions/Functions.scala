package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable column-expression functions (SURVEY.md §2.5, §2.9).
  *
  * Everything here is a pure Catalyst expression composition — no Scala
  * UDFs — so whole-stage codegen, constant folding, and predicate pushdown
  * survive (`SURVEY.md §4.2`). These replace the reference's row-wise
  * `Series.apply` helpers (`src/transformation.py:339-568`).
  */
object Functions {

  /** Keyword-containment classifier (ref `extract_brand`
    * `src/transformation.py:388-407`, `categorize_product` `:412-433`):
    * first (label, keywords) whose keyword is contained in lower(col) wins;
    * null input → `nullLabel`, no match → `default`. Folds to one
    * codegen'd CASE WHEN chain — at 100 TB this is a scan-local map with
    * zero shuffle; if keyword lists ever grow beyond literals, swap for a
    * broadcast join against a keyword table. */
  def keywordClassify(
      c: Column,
      mapping: Seq[(String, Seq[String])],
      default: String,
      nullLabel: String = "Unknown"): Column = {
    val lowered = lower(c)
    val matched = mapping.foldLeft(when(c.isNull, nullLabel)) {
      case (acc, (label, keywords)) =>
        val pred = keywords.map(k => lowered.contains(lit(k))).reduce(_ || _)
        acc.when(pred, label)
    }
    matched.otherwise(default)
  }

  /** Right-closed binning, `pd.cut(bins=[b0..bn], labels)` semantics
    * (`src/transformation.py:354-358`, `:438-442`, `:477-481`): value in
    * (b_i, b_{i+1}] → label_i; outside (≤ b0) or null → null. The last
    * bound may be Double.PositiveInfinity. */
  def cutRightClosed(c: Column, bounds: Seq[Double], labels: Seq[String]): Column = {
    require(labels.nonEmpty, "cutRightClosed needs at least one label")
    require(bounds.length == labels.length + 1, "need n+1 bounds for n labels")
    val cases = labels.indices.map { i =>
      val lo = bounds(i)
      val hi = bounds(i + 1)
      val pred =
        if (hi.isPosInfinity) c > lit(lo)
        else c > lit(lo) && c <= lit(hi)
      (pred, labels(i))
    }
    cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
      case (acc, (p, l)) => acc.when(p, l)
    } // no otherwise → null outside all bins, matching pd.cut
  }

  /** Threshold ladder (first `value >= threshold` wins), e.g. customer
    * segmentation `src/transformation.py:339-349`. Thresholds must be
    * descending. */
  def thresholdLadder(c: Column, ladder: Seq[(Double, String)], default: String): Column = {
    require(ladder.nonEmpty, "thresholdLadder needs at least one (threshold, label)")
    ladder.foldLeft[Option[Column]](None) {
      case (None, (t, l))      => Some(when(c >= lit(t), l))
      case (Some(acc), (t, l)) => Some(acc.when(c >= lit(t), l))
    }.map(_.otherwise(default)).get
  }

  /** `safe_divide` (`src/utils.py:120-125`): 0 or null denominator →
    * default instead of null/Inf. */
  def safeDivide(n: Column, d: Column, default: Double = 0.0): Column =
    when(d =!= 0 && d.isNotNull, n / d).otherwise(lit(default))

  /** Season from month (`src/transformation.py:508-518`). */
  def season(month: Column): Column =
    when(month.isin(12, 1, 2), "Winter")
      .when(month.isin(3, 4, 5), "Spring")
      .when(month.isin(6, 7, 8), "Summer")
      .otherwise("Fall")

  /** Order risk score (`src/transformation.py:539-556`): additive flags,
    * capped at 100 — pure expression instead of the reference's
    * `DataFrame.apply(axis=1)` Python row loop. */
  def riskScore(totalAmount: Column, customerName: Column, weekdayName: Column): Column =
    least(lit(100),
      when(totalAmount > 1000, 30).otherwise(0)
        + when(customerName.isNotNull && customerName.contains("Unknown"), 20).otherwise(0)
        + when(weekdayName.isin("Saturday", "Sunday"), 10).otherwise(0))

  /** Risk level from score (`src/transformation.py:560-568`). */
  def riskLevel(score: Column): Column =
    when(score >= 50, "High").when(score >= 25, "Medium").otherwise("Low")

  /** Quality level from overall score (`src/validation.py:239-250`). */
  def qualityLevel(score: Column): Column =
    when(score >= 95, "excellent")
      .when(score >= 85, "good")
      .when(score >= 70, "fair")
      .when(score >= 50, "poor")
      .otherwise("critical")

  /** Estimated profit margin step function (`src/transformation.py:457-467`). */
  def profitMargin(price: Column): Column =
    when(price < 100, 0.15)
      .when(price < 500, 0.20)
      .when(price < 1000, 0.25)
      .otherwise(0.30)

  /** Two-phase salted aggregation for skewed keys (100 TB design rule,
    * SURVEY.md §7.4): phase 1 aggregates on (key, salt) spreading a hot
    * key over `saltBuckets` reducers; phase 2 combines the partials on the
    * key alone. Correct for any algebraic aggregate expressed as
    * (partial, combine) — here sum/count, which also yields avg. AQE's
    * skew-join handling covers joins; this covers the groupBy side. */
  def saltedSumCount(df: org.apache.spark.sql.DataFrame, key: String,
      valueCol: String, saltBuckets: Int = 16): org.apache.spark.sql.DataFrame = {
    // salt must be DETERMINISTIC per row content: a partition-id or
    // monotonic-id salt changes across task retries, so a partial stage
    // retry re-buckets rows mid-aggregation and silently drops or
    // double-counts them. Hashing (key, value) keeps the hot key spread
    // whenever its values vary while staying stable across attempts.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(key), col(valueCol)), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }

  /** Cross-engine-deterministic 2-decimal rounding (money fields,
    * `src/transformation.py:634-638`). Spark's `round()` goes through a
    * decimal-string HALF_UP while DuckDB rounds the binary double — they
    * disagree on .xx5 ties, which breaks oracle hash-parity. The floor
    * form is pure IEEE arithmetic, identical in any engine. */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** SQL fragment equivalent of [[round2]] for the DuckDB oracle. */
  def round2Sql(expr: String): String = s"floor(($expr) * 100 + 0.5) / 100"

  /** Order-independent 2-dp money sum: each TERM is quantized to integer
    * CENTS — `floor(x·100 + 0.5)`, the same pure-double arithmetic as
    * [[round2]], bit-identical in any engine — and the aggregation is an
    * exact BIGINT sum, immune to the float-accumulation-order ulp drift
    * that can flip a round-to-cents boundary between engines or
    * partitionings (observed: q49 at sf0.1, spark .645000x vs duck
    * .644999x). NOT a DECIMAL cast of the term: double→decimal conversion
    * itself disagrees across engines (Spark converts via the shortest
    * decimal representation, DuckDB via the exact binary value — terms
    * near a half-cent split). Quantizing the term changes semantics from
    * round-the-sum to sum-the-rounded — the accounting convention — and
    * the oracle mirrors it. */
  def moneySum(term: Column): Column =
    sum(floor(term * 100 + lit(0.5)).cast("long")).cast("double") / 100

  /** SQL fragment equivalent of [[moneySum]] for the DuckDB oracle. */
  def moneySumSql(expr: String): String =
    s"CAST(CAST(sum(CAST(floor(($expr) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100"

  /** 4-decimal variant of [[round2]] (same cross-engine tie rationale). */
  def round4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** SQL fragment equivalent of [[round4]] for the DuckDB oracle. */
  def round4Sql(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"

  /** 6-decimal variant of [[round2]] — same floor arithmetic; the
    * engines' native round() differs on doubles near a decimal tie
    * (shortest-repr vs exact-binary rounding), this form cannot. */
  def round6(c: Column): Column = floor(c * 1000000 + lit(0.5)) / 1000000

  /** SQL fragment equivalent of [[round6]] for the DuckDB oracle. */
  def round6Sql(expr: String): String = s"floor(($expr) * 1000000 + 0.5) / 1000000"

  /** Email domain (`split('@')[-1]`, `src/transformation.py:366`). */
  def emailDomain(email: Column): Column = substring_index(email, "@", -1)

  /** Customer type from email domain (`src/transformation.py:363-373`). */
  def customerType(email: Column): Column = {
    val domain = lower(emailDomain(email))
    val business = Seq("company.com", "corp.com", "business.com")
      .map(bd => domain.contains(lit(bd))).reduce(_ || _)
    when(email.isNull, "Unknown").when(business, "Business").otherwise("Individual")
  }
}

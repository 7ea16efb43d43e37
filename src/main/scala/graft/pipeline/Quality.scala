package graft.pipeline

import graft.functions.Functions.{qualityLevel, round4, round4Sql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality scoring engine (ref `DataValidator`,
  * `src/validation.py:29-282`): weighted
  * 0.3·completeness + 0.3·validity + 0.2·consistency + 0.2·accuracy
  * (`src/validation.py:64-66`), plus per-record valid/invalid counts.
  *
  * The reference computes each metric in separate passes with two Python
  * row loops (`iterrows` at `validation.py:260`); here the entire report is
  * ONE wide hash-aggregate over the table — a single distributed pass with
  * map-side partials, then scalar arithmetic on the 1-row result. At
  * 100 TB this is the difference between one scan and nine.
  *
  * Both the Spark aggregates and the DuckDB oracle SQL are generated from
  * the same column-list constants below, so parity is structural.
  */
object Quality {

  final val RequiredFields =
    Seq("order_id", "customer_name", "product", "quantity", "price", "order_date")
  final val CanonicalColumns = Seq(
    "order_id", "customer_name", "customer_email", "product",
    "product_category", "quantity", "price", "discount", "order_date",
    "source", "ingested_at", "api_post_id", "total_amount")
  final val StringColumns = Seq(
    "order_id", "customer_name", "customer_email", "product",
    "product_category", "source")
  final val PositiveNumericFields = Seq("quantity", "price", "total_amount")

  final val OrderIdPattern = "^[A-Z]{3}-\\d{4}$|^API-\\d{4}$|^ORD-\\d{9}-\\d+$"
  final val EmailPattern = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"

  /** Single-row quality report over the canonical order schema.
    * `asOf` pins the wall clock (ref uses `datetime.now()`,
    * `validation.py:224`) for oracle reproducibility. */
  def metrics(df: DataFrame, asOf: String = Enrich.DefaultAsOf): DataFrame = {
    val cols = CanonicalColumns.filter(df.columns.contains(_))
    val strCols = StringColumns.filter(df.columns.contains(_))
    def has(cs: String*): Boolean = cs.forall(df.columns.contains(_))

    def frac(pred: Column): Column = avg(when(pred, 1.0).otherwise(0.0))

    // Every check is guarded on column presence — the reference scores
    // only the fields a source actually has (`validation.py:103-237`
    // guards with `if field in data.columns`), and the stage must compose
    // over raw CSV/JSON schemas, not just the canonical domain. On the
    // canonical schema all guards pass, so oracle parity is unchanged.

    // --- completeness (validation.py:103-112): non-null cells / cells
    val nonNullCells =
      if (cols.isEmpty) lit(0L) else cols.map(c => count(col(c))).reduce(_ + _)
    val totalCells = count(lit(1)) * math.max(cols.length, 1)
    val completeness =
      if (cols.isEmpty) lit(100.0)
      else nonNullCells.cast("double") / totalCells * 100

    // --- validity checks (validation.py:114-154), fixed reference order
    val validityChecks: Seq[Column] =
      (if (has("order_id")) Seq(frac(col("order_id").rlike(OrderIdPattern))) else Nil) ++
        (if (has("customer_email")) Seq(frac(col("customer_email").rlike(EmailPattern))) else Nil) ++
        PositiveNumericFields.filter(has(_))
          .map(f => frac(col(f).isNotNull && col(f) > 0)) ++
        (if (has("order_date")) Seq(frac(col("order_date").isNotNull)) else Nil)

    // --- consistency (validation.py:156-190)
    // countDistinct is NOT computed in the wide aggregate below: a single
    // distinct aggregate makes Catalyst rewrite the WHOLE agg as a
    // two-level group-by-key plan, so every row is shuffled keyed on
    // order_id carrying ~40 partial-aggregate buffers (measured: the
    // exchange was q14's dominant stage). Instead the distinct count runs
    // as its own narrow pass (group-by-key of the key column alone,
    // map-side combined) and is attached via a 1-row broadcast cross
    // join; the consistency mean is then composed in the SAME
    // left-to-right addition order, so the float result is bit-identical
    // (guide §2.3: shuffle fewer bytes; §1.2: fix the algorithm first).
    val needsUnique = has("order_id")
    // np.isclose(price*qty, total, rtol=0.01) = |a-b| <= 1e-8 + 0.01|b|
    val totalsClose =
      if (has("price", "quantity", "total_amount"))
        Seq(frac(abs(col("price") * col("quantity") - col("total_amount"))
          <= lit(1e-8) + lit(0.01) * abs(col("total_amount"))))
      else Nil
    val lengthConsistency: Seq[Column] = strCols.map { c =>
      val lens = length(col(c))
      least(lit(1.0), greatest(lit(0.0),
        coalesce(lit(1.0) - stddev_samp(lens) / avg(lens), lit(1.0))))
    }
    // aggregate-expression components other than the unique ratio
    val consistencyRest = totalsClose ++ lengthConsistency

    // --- accuracy (validation.py:192-237)
    val asOfTs = lit(asOf).cast("timestamp")
    val accuracyChecks: Seq[Column] =
      (if (has("price")) Seq(frac(col("price") >= 1 && col("price") <= 10000)) else Nil) ++
        (if (has("quantity")) Seq(frac(col("quantity") >= 1 && col("quantity") <= 100)) else Nil) ++
        (if (has("customer_name"))
          Seq(frac(length(col("customer_name")) >= 2 && length(col("customer_name")) <= 100)) else Nil) ++
        (if (has("product"))
          Seq(frac(length(col("product")) >= 2 && length(col("product")) <= 200)) else Nil) ++
        (if (has("order_date"))
          Seq(frac(col("order_date") >= asOfTs - expr("INTERVAL 1825 DAY")
            && col("order_date") <= asOfTs)) else Nil)

    // --- per-record validity (validation.py:252-282) — one vectorized pass
    val rowChecks = RequiredFields.filter(df.columns.contains(_))
      .map(col(_).isNotNull) ++
      (if (df.columns.contains("price")) Seq(col("price") > 0) else Nil) ++
      (if (df.columns.contains("quantity")) Seq(col("quantity") > 0) else Nil)
    val rowValid = rowChecks.reduceOption(_ && _).getOrElse(lit(true))
    val validRecords = sum(when(rowValid, 1L).otherwise(0L))

    // a dimension with nothing to check scores perfect (vacuous truth),
    // matching the reference's skip-absent-fields behavior
    def mean(cs: Seq[Column]): Column =
      if (cs.isEmpty) lit(1.0) else cs.reduce(_ + _) / cs.length

    // wide single pass: every non-distinct aggregate, with the
    // consistency components emitted separately so the mean can be
    // re-assembled (same fold order) once the unique ratio arrives
    val restCols = consistencyRest.zipWithIndex
      .map { case (c, i) => c.as(s"__cons_$i") }
    val aggExprs = Seq(
      completeness.as("completeness"),
      (mean(validityChecks) * 100).as("validity"),
      (mean(accuracyChecks) * 100).as("accuracy"),
      validRecords.as("valid_records"),
      count(lit(1)).as("total_records")) ++ restCols
    val aggedBase = df.agg(aggExprs.head, aggExprs.tail: _*)
    // narrow distinct pass (only when the key exists), attached as a
    // 1-row broadcast — the keySkewHistogram literalize pattern
    val withUnique =
      if (needsUnique)
        aggedBase.crossJoin(broadcast(
          df.agg(countDistinct(col("order_id")).as("__cd"))))
      else aggedBase
    val uniqueRatio: Seq[Column] =
      if (needsUnique)
        Seq(col("__cd").cast("double") / col("total_records"))
      else Nil
    val consistencyChecks: Seq[Column] =
      uniqueRatio ++ consistencyRest.indices.map(i => col(s"__cons_$i"))
    val agged = withUnique.select(
      col("completeness"),
      col("validity"),
      (mean(consistencyChecks) * 100).as("consistency"),
      col("accuracy"),
      col("valid_records"),
      col("total_records"))

    // floor-based round4, not native round(): these are ratios of small
    // integers, exactly the value class whose shortest decimal
    // representation can land on a rounding tie that Spark (shortest-repr
    // HALF_UP) and DuckDB (exact-binary) resolve differently
    agged.select(
      round4(col("completeness")).as("completeness"),
      round4(col("validity")).as("validity"),
      round4(col("consistency")).as("consistency"),
      round4(col("accuracy")).as("accuracy"),
      round4(col("completeness") * 0.3 + col("validity") * 0.3
        + col("consistency") * 0.2 + col("accuracy") * 0.2).as("overall_score"),
      qualityLevel(col("completeness") * 0.3 + col("validity") * 0.3
        + col("consistency") * 0.2 + col("accuracy") * 0.2).as("quality_level"),
      col("valid_records"),
      (col("total_records") - col("valid_records")).as("invalid_records"),
      col("total_records"))
  }

  /** DuckDB oracle reproducing [[metrics]] over relation `rel` exposing the
    * canonical columns. Generated from the same constants. */
  def oracleSql(rel: String, asOf: String = Enrich.DefaultAsOf): String = {
    def frac(pred: String): String = s"avg(CASE WHEN $pred THEN 1.0 ELSE 0.0 END)"
    val nonNull = CanonicalColumns.map(c => s"count($c)").mkString(" + ")
    val validity = Seq(
      frac(s"regexp_matches(order_id, '$OrderIdPattern')"),
      frac(s"regexp_matches(customer_email, '$EmailPattern')")) ++
      PositiveNumericFields.map(f => frac(s"$f IS NOT NULL AND $f > 0")) :+
      frac("order_date IS NOT NULL")
    val lenCons = StringColumns.map { c =>
      s"least(1.0, greatest(0.0, COALESCE(1.0 - stddev(length($c)) / avg(length($c)), 1.0)))"
    }
    val consistency = Seq(
      s"CAST(count(DISTINCT order_id) AS DOUBLE) / count(*)",
      frac("abs(price * quantity - total_amount) <= 1e-8 + 0.01 * abs(total_amount)")) ++ lenCons
    val accuracy = Seq(
      frac("price >= 1 AND price <= 10000"),
      frac("quantity >= 1 AND quantity <= 100"),
      frac("length(customer_name) >= 2 AND length(customer_name) <= 100"),
      frac("length(product) >= 2 AND length(product) <= 200"),
      frac(s"order_date >= TIMESTAMP '$asOf 00:00:00' - INTERVAL 1825 DAY " +
        s"AND order_date <= TIMESTAMP '$asOf 00:00:00'"))
    val rowValid = (RequiredFields.map(f => s"$f IS NOT NULL") ++
      Seq("price > 0", "quantity > 0")).mkString(" AND ")
    def mean(xs: Seq[String]): String =
      "(" + xs.mkString("(", " + ", ")") + s" / ${xs.length})"
    s"""WITH agged AS (
       |  SELECT
       |    CAST(($nonNull) AS DOUBLE) / (count(*) * ${CanonicalColumns.length}) * 100 AS completeness,
       |    ${mean(validity)} * 100 AS validity,
       |    ${mean(consistency)} * 100 AS consistency,
       |    ${mean(accuracy)} * 100 AS accuracy,
       |    CAST(sum(CASE WHEN $rowValid THEN 1 ELSE 0 END) AS BIGINT) AS valid_records,
       |    count(*) AS total_records
       |  FROM $rel)
       |SELECT
       |  ${round4Sql("completeness")} AS completeness,
       |  ${round4Sql("validity")} AS validity,
       |  ${round4Sql("consistency")} AS consistency,
       |  ${round4Sql("accuracy")} AS accuracy,
       |  ${round4Sql("completeness*0.3 + validity*0.3 + consistency*0.2 + accuracy*0.2")} AS overall_score,
       |  CASE WHEN completeness*0.3 + validity*0.3 + consistency*0.2 + accuracy*0.2 >= 95 THEN 'excellent'
       |       WHEN completeness*0.3 + validity*0.3 + consistency*0.2 + accuracy*0.2 >= 85 THEN 'good'
       |       WHEN completeness*0.3 + validity*0.3 + consistency*0.2 + accuracy*0.2 >= 70 THEN 'fair'
       |       WHEN completeness*0.3 + validity*0.3 + consistency*0.2 + accuracy*0.2 >= 50 THEN 'poor'
       |       ELSE 'critical' END AS quality_level,
       |  valid_records,
       |  total_records - valid_records AS invalid_records,
       |  total_records
       |FROM agged""".stripMargin
  }
}

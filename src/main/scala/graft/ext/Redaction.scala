package graft.ext

import graft.QuerySpec
import graft.pipeline.OrdersDomain
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII handling for training-data pipelines: regex detection over free
  * text plus deterministic pseudonymization of structured identity columns
  * (the privacy pass a corpus runs before anything ships to training —
  * generalizes the reference's email/field validators,
  * `/root/reference/src/validation.py:145-158`, from *checking* PII shape
  * to *removing* it).
  *
  * Redaction is deterministic (md5-derived pseudonyms), so the same
  * person maps to the same token across the corpus — joins and
  * frequency statistics survive redaction, which a random mask would
  * destroy — and the operator carries a full value-level DuckDB oracle.
  * All patterns are backref-free character-class regexes with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB).
  *
  * Scale shape: one scan-local projection — no shuffle, no UDF; the
  * regexes and md5 run inside whole-stage codegen.
  */
object Redaction {

  /** Conservative email pattern (char-class only — portable). */
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"

  /** Deterministic pseudonym for an identity value; null-safe (null in →
    * null out, so missingness statistics survive redaction too). */
  def pseudonym(c: Column, prefix: String): Column =
    when(c.isNull, lit(null)).otherwise(
      concat(lit(prefix), substring(md5(c), 1, 10)))

  /** Local part / domain of an email, split at the FIRST '@' — plain
    * string ops (instr + substring), not regex: the split runs twice per
    * row and the one genuine regex should be the detector, not the
    * splitter. Identical semantics to DuckDB strpos + substr.
    *
    * A value WITHOUT '@' (a name typed into the email field) must fail
    * CLOSED: the whole value is treated as the identifying local part
    * (pseudonymized in [[maskEmail]]) and the domain is null — emitting
    * the raw value as a "domain" would leak the very field the privacy
    * pass exists to remove. */
  private def emailLocal(email: Column): Column =
    when(instr(email, "@") === 0, email)
      .otherwise(email.substr(lit(1), instr(email, "@") - 1))

  def emailDomain(email: Column): Column =
    when(instr(email, "@") === 0, lit(null))
      .otherwise(email.substr(instr(email, "@") + 1, length(email)))

  /** Mask an email keeping its domain (the routing-relevant, non-identifying
    * half): hash of the local part + the literal domain; an '@'-less value
    * becomes a bare pseudonym with no domain suffix. */
  def maskEmail(email: Column): Column =
    when(email.isNull, lit(null))
      .when(instr(email, "@") === 0, substring(md5(email), 1, 10))
      .otherwise(concat(
        substring(md5(emailLocal(email)), 1, 10),
        lit("@"), emailDomain(email)))

  /** Per-record redaction over an orders-domain frame — a pure projection:
    * it adds no exchange and PRESERVES the input's row order, so callers
    * that need sorted output should sort the (narrow) input first. Sorting
    * the redacted output instead would double-execute the projection:
    * range partitioning samples its child to pick boundaries, so every
    * expression below the sort runs twice (measured 9.4 s vs 3.6 s at
    * sf0.1). */
  def redactOrders(domain: DataFrame): DataFrame = {
    val freeText = concat_ws(" ", col("customer_name"), col("customer_email"))
    domain.select(
      col("order_id"),
      pseudonym(col("customer_name"), "user_").as("customer_name_redacted"),
      maskEmail(col("customer_email")).as("customer_email_redacted"),
      emailDomain(col("customer_email")).as("email_domain"),
      size(regexp_extract_all(freeText, lit(EmailRe), lit(0))).as("n_emails_in_text"),
      (when(col("customer_name").isNull, 0).otherwise(1)
        + when(col("customer_email").isNull, 0).otherwise(1)).as("n_redacted"))
  }

  /** k-anonymity risk card over a structured identity table: group rows
    * by their quasi-identifier tuple, measure each group's size k (the
    * number of people hiding behind identical quasi-identifiers), and
    * fold the k distribution into the five buckets a privacy review
    * actually reads — k=1 (unique, re-identifiable outright), k=2,
    * k=3-4, k=5-9, k>=10. Complements [[redactOrders]]: redaction
    * removes DIRECT identifiers; this card quantifies the residual
    * linkage risk carried by the columns that stay (the reference's
    * validators check PII *shape*, `/root/reference/src/validation.py:
    * 145-158`; neither engine side re-identifies anyone — the card is
    * pure counting).
    *
    * Scale shape: ONE map-side-combined hash-agg on the quasi-identifier
    * tuple (the only full-data shuffle, bounded by distinct-tuple
    * cardinality), then a second agg folding the group frame to a single
    * row of bucket counters, exploded to the fixed five-row card — the
    * q63 funnel discipline: no unpartitioned window, no cross join, no
    * driver collect. rows_ppm is exact integer arithmetic
    * (1e6·n_rows div total; 1e6·n ≤ 1e18 keeps LONG exact past 10^12
    * rows). */
  def kAnonymityCard(customers: DataFrame): DataFrame = {
    val groups = customers
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 5000.0d).cast("int").as("bal_band"))
      .agg(count(lit(1)).as("k"))
    val buckets: Seq[(Int, String, Column)] = Seq(
      (1, "k=1", col("k") === 1),
      (2, "k=2", col("k") === 2),
      (3, "k=3-4", col("k").between(3, 4)),
      (5, "k=5-9", col("k").between(5, 9)),
      (10, "k>=10", col("k") >= 10))
    val folded = groups.agg(
      sum(col("k")).as("total"),
      buckets.flatMap { case (kf, _, cond) =>
        Seq(
          coalesce(sum(when(cond, lit(1L))), lit(0L)).as(s"g_$kf"),
          coalesce(sum(when(cond, col("k"))), lit(0L)).as(s"r_$kf"))
      }: _*)
    folded
      .select(col("total"), explode(array(buckets.map { case (kf, label, _) =>
        struct(lit(kf).as("k_floor"), lit(label).as("bucket"),
          col(s"g_$kf").as("n_groups"), col(s"r_$kf").as("n_rows"))
      }: _*)).as("s"))
      .select(col("s.k_floor"), col("s.bucket"), col("s.n_groups"),
        col("s.n_rows"),
        expr("CAST((1000000 * s.n_rows) DIV total AS BIGINT)").as("rows_ppm"))
      .orderBy("k_floor")
  }

  /** q189: the k-anonymity card over the customer table with the
    * quasi-identifier tuple (nation, market segment, account-balance
    * band) — the classic linkage-attack surface: none of the three
    * columns is an identifier alone, their combination often is. */
  val q189KAnonymity: QuerySpec = QuerySpec(
    "q189_k_anonymity",
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 5000.0) AS INT) AS bal_band,
      |    count(*) AS k
      |  FROM customer GROUP BY 1, 2, 3),
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
      |  SELECT 1 AS k_floor, 'k=1' AS bucket, g_1 AS n_groups, r_1 AS n_rows,
      |    CAST((1000000 * r_1) // total AS BIGINT) AS rows_ppm FROM t
      |  UNION ALL SELECT 2, 'k=2', g_2, r_2, CAST((1000000 * r_2) // total AS BIGINT) FROM t
      |  UNION ALL SELECT 3, 'k=3-4', g_3, r_3, CAST((1000000 * r_3) // total AS BIGINT) FROM t
      |  UNION ALL SELECT 5, 'k=5-9', g_5, r_5, CAST((1000000 * r_5) // total AS BIGINT) FROM t
      |  UNION ALL SELECT 10, 'k>=10', g_10, r_10, CAST((1000000 * r_10) // total AS BIGINT) FROM t)
      |ORDER BY k_floor""".stripMargin) { (s, dir) =>
    kAnonymityCard(graft.Tables.customer(s, dir))
  }

  /** q66: redaction over the deterministically-dirty domain (so the
    * null-safety path is exercised: %83 rows arrive with a null name and
    * must leave with one). */
  val q66PiiRedact: QuerySpec = QuerySpec(
    "q66_pii_redact",
    "WITH " + OrdersDomain.OracleCte + ",\n" + OrdersDomain.DirtyOracleCte + "\n" +
      s"""SELECT order_id,
         |  CASE WHEN customer_name IS NULL THEN NULL
         |    ELSE 'user_' || substr(md5(customer_name), 1, 10) END AS customer_name_redacted,
         |  CASE WHEN customer_email IS NULL THEN NULL
         |    WHEN strpos(customer_email, '@') = 0 THEN substr(md5(customer_email), 1, 10)
         |    ELSE substr(md5(substr(customer_email, 1, strpos(customer_email, '@') - 1)), 1, 10)
         |      || '@' || substr(customer_email, strpos(customer_email, '@') + 1) END AS customer_email_redacted,
         |  CASE WHEN strpos(customer_email, '@') = 0 THEN NULL
         |    ELSE substr(customer_email, strpos(customer_email, '@') + 1) END AS email_domain,
         |  CAST(len(regexp_extract_all(concat_ws(' ', customer_name, customer_email),
         |    '$EmailRe')) AS INT) AS n_emails_in_text,
         |  (CASE WHEN customer_name IS NULL THEN 0 ELSE 1 END
         |    + CASE WHEN customer_email IS NULL THEN 0 ELSE 1 END) AS n_redacted
         |FROM dirty_domain
         |ORDER BY order_id""".stripMargin) { (s, dir) =>
    redactOrders(OrdersDomain.dirtyFromTpch(s, dir).orderBy("order_id"))
  }

  val all: Seq[QuerySpec] = Seq(q66PiiRedact, q189KAnonymity)
}

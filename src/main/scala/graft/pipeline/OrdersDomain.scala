package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter from the TPC-H-ish test tables to the reference's canonical
  * 13-column order record (SURVEY.md §1.3, built at
  * `src/ingestion.py:132-148`).
  *
  * Every derived column is a deterministic expression of the source keys so
  * the DuckDB oracle can reproduce it exactly (no wall clock, no engine
  * hash). `ingested_at` is synthesized as shipdate+1d — the reference's
  * `datetime.now()` (`src/ingestion.py:143`) cannot hash-match an oracle.
  *
  * Scale: one projection over lineitem ⨝ orders ⨝ customer ⨝ part; the two
  * dimension joins (customer, part) broadcast at test SF and stay
  * shuffle-free; the orders join shuffles on orderkey once.
  */
object OrdersDomain {

  final val Sources = Seq("api_rest", "file_csv", "file_json", "database")

  /** The 4-way source join projected to the RAW columns the canonical
    * record derives from, plus the (cheap) `order_id` key — the narrow
    * frame the sorted variants below range-partition on. Splitting the
    * join from [[projectDomain]] lets a global sort sit BETWEEN them, so
    * the range exchange's boundary-sampling pass (which executes the
    * full exchange child once, before the real pass does it again) only
    * ever computes the join + key, never the ~13 derived string/decimal
    * expressions (guide §1.2/§5: don't compute things twice). */
  private def joinedRaw(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(
        concat(lit("ORD-"), lpad(col("l_orderkey").cast("string"), 9, "0"),
          lit("-"), col("l_linenumber").cast("string")).as("order_id"),
        col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_shipdate"),
        col("c_name"), col("p_name"), col("p_type"))
  }

  /** Canonical 13-column projection over [[joinedRaw]]'s output — pure
    * order-preserving column derivation, no shuffle. */
  private def projectDomain(raw: DataFrame): DataFrame =
    raw.select(
        col("order_id"),
        col("c_name").as("customer_name"),
        concat(lower(replace(col("c_name"), lit("#"), lit("."))),
          lit("@example.com")).as("customer_email"),
        col("p_name").as("product"),
        col("p_type").as("product_category"),
        col("l_quantity").cast("int").as("quantity"),
        graft.functions.Functions.round2(col("l_extendedprice") / col("l_quantity")).as("price"),
        graft.functions.Functions.round2(col("l_extendedprice") * col("l_discount")).as("discount"),
        col("l_shipdate").as("order_date"),
        element_at(
          array(Sources.map(lit): _*),
          (pmod(col("l_orderkey"), lit(4)) + 1).cast("int")).as("source"),
        (col("l_shipdate") + expr("INTERVAL 1 DAY")).as("ingested_at"),
        col("l_orderkey").as("api_post_id"))
      .withColumn("total_amount",
        graft.functions.Functions.round2(col("price") * col("quantity") - col("discount")))

  def fromTpch(spark: SparkSession, dir: String): DataFrame =
    projectDomain(joinedRaw(spark, dir))

  /** [[fromTpch]] globally sorted by order_id, with the sort INSIDE the
    * plan: join → narrow sort → derived-column projection. Identical
    * rows in identical order to `fromTpch(...).orderBy("order_id")`
    * (the projection is order-preserving and computes the same
    * expressions), but the range exchange sorts 9 raw columns instead
    * of 13 derived ones and — the real win — the sampling pass no
    * longer evaluates the derived projection at all, so the heavy
    * expressions run once per query instead of twice. */
  def fromTpchOrdered(spark: SparkSession, dir: String): DataFrame =
    projectDomain(joinedRaw(spark, dir).orderBy("order_id"))

  /** SQL CTE reproducing [[fromTpch]] for the DuckDB oracle. */
  final val OracleCte: String =
    """orders_domain AS (
      |  SELECT
      |    'ORD-' || lpad(CAST(l_orderkey AS VARCHAR), 9, '0')
      |      || '-' || CAST(l_linenumber AS VARCHAR) AS order_id,
      |    c_name AS customer_name,
      |    lower(replace(c_name, '#', '.')) || '@example.com' AS customer_email,
      |    p_name AS product,
      |    p_type AS product_category,
      |    CAST(l_quantity AS INT) AS quantity,
      |    floor((l_extendedprice / l_quantity) * 100 + 0.5) / 100 AS price,
      |    floor((l_extendedprice * l_discount) * 100 + 0.5) / 100 AS discount,
      |    l_shipdate AS order_date,
      |    (['api_rest','file_csv','file_json','database'])[CAST(l_orderkey % 4 AS INT) + 1] AS source,
      |    l_shipdate + INTERVAL 1 DAY AS ingested_at,
      |    l_orderkey AS api_post_id,
      |    floor(((floor((l_extendedprice / l_quantity) * 100 + 0.5) / 100) * CAST(l_quantity AS INT)
      |      - floor((l_extendedprice * l_discount) * 100 + 0.5) / 100) * 100 + 0.5) / 100 AS total_amount
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN part     ON l_partkey = p_partkey
      |)""".stripMargin

  /** Deterministically "dirty" variant used by the cleaning queries: nulls
    * and invalid values injected on key residues so the clean stage has
    * real work whose effect the oracle can replicate
    * (exercises F1-F5 of SURVEY.md §2.2). */
  def dirtyFromTpch(spark: SparkSession, dir: String): DataFrame =
    dirtyProject(fromTpch(spark, dir))

  /** [[dirtyFromTpch]] globally sorted by order_id — the [[fromTpchOrdered]]
    * narrow-sort placement (dirt injection is an order-preserving
    * projection on top). */
  def dirtyFromTpchOrdered(spark: SparkSession, dir: String): DataFrame =
    dirtyProject(fromTpchOrdered(spark, dir))

  /** [[dirtyFromTpch]] range-partitioned (NOT yet sorted) on order_id —
    * the input shape for the Clean-stage keep-first fusion: the keyed
    * dedup's ClusteredDistribution(order_id) is satisfied by the range
    * partitioning (equal keys share a range), EnsureRequirements adds
    * only the one local (key, tiebreak…) sort the dedup needs, the dedup
    * preserves both, and a downstream global `orderBy("order_id")` is
    * then satisfied without a second exchange or sort. One exchange +
    * one sort where the naive spelling (hash exchange for the dedup,
    * then a range exchange + sort for the output order) pays two of
    * each — guide §2.4 "two operations keyed the same way share one
    * exchange". The exchange child is the NARROW join (9 raw cols), so
    * the boundary-sampling pass never evaluates the derived columns. */
  def dirtyFromTpchRanged(spark: SparkSession, dir: String): DataFrame =
    dirtyProject(projectDomain(
      joinedRaw(spark, dir).repartitionByRange(col("order_id"))))

  private def dirtyProject(base: DataFrame): DataFrame = {
    base
      .withColumn("quantity",
        when(col("api_post_id") % 97 === 0, lit(null)).otherwise(col("quantity")))
      .withColumn("discount",
        when(col("api_post_id") % 89 === 0, lit(null)).otherwise(col("discount")))
      .withColumn("customer_name",
        when(col("api_post_id") % 83 === 0, lit(null)).otherwise(col("customer_name")))
      .withColumn("price",
        when(col("api_post_id") % 79 === 0, -col("price")).otherwise(col("price")))
      .withColumn("product",
        when(col("api_post_id") % 73 === 0, lit(null)).otherwise(col("product")))
  }

  /** SQL CTE reproducing [[dirtyFromTpch]] (applies on top of
    * [[OracleCte]]). */
  final val DirtyOracleCte: String =
    """dirty_domain AS (
      |  SELECT
      |    order_id,
      |    CASE WHEN api_post_id % 83 = 0 THEN NULL ELSE customer_name END AS customer_name,
      |    customer_email,
      |    CASE WHEN api_post_id % 73 = 0 THEN NULL ELSE product END AS product,
      |    product_category,
      |    CASE WHEN api_post_id % 97 = 0 THEN NULL ELSE quantity END AS quantity,
      |    CASE WHEN api_post_id % 79 = 0 THEN -price ELSE price END AS price,
      |    CASE WHEN api_post_id % 89 = 0 THEN NULL ELSE discount END AS discount,
      |    order_date, source, ingested_at, api_post_id, total_amount
      |  FROM orders_domain
      |)""".stripMargin
}

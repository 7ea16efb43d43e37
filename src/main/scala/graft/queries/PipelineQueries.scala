package graft.queries

import graft.QuerySpec
import graft.pipeline.{Clean, Enrich, OrdersDomain, Quality, Standardize}
import org.apache.spark.sql.functions._

/** The reference's 4-stage pipeline (SURVEY.md §3.1) exercised through the
  * oracle gate: the TPC-H→canonical adapter, cleaning, enrichment,
  * standardization, and quality scoring each get a query whose DuckDB SQL
  * reproduces the full stage composition via CTEs.
  */
object PipelineQueries {

  private val baseCtes =
    "WITH " + OrdersDomain.OracleCte + ",\n" + OrdersDomain.DirtyOracleCte +
      ",\n" + Clean.OracleCte

  /** The adapter itself (ingestion synthesis, `src/ingestion.py:132-148`). */
  val q10OrdersDomain: QuerySpec = QuerySpec(
    "q10_orders_domain",
    "WITH " + OrdersDomain.OracleCte + "\n" +
      """SELECT order_id, customer_name, customer_email, product,
        |  product_category, quantity, price, discount, order_date, source,
        |  ingested_at, api_post_id, total_amount
        |FROM orders_domain
        |ORDER BY order_id""".stripMargin) { (s, dir) =>
    // narrow-sort placement (r13): the global sort sits between the join
    // and the derived-column projection, so the range boundary-sampling
    // pass computes only the join + key and the 13 derived expressions
    // run once, above the sort, instead of twice below it
    OrdersDomain.fromTpchOrdered(s, dir)
  }

  /** Cleaning stage over the deterministically-dirty domain
    * (F1-F5 + D2-D3, `src/transformation.py:27-229`). */
  val q11Clean: QuerySpec = QuerySpec(
    "q11_clean",
    baseCtes + "\n" +
      """SELECT order_id, customer_name, customer_email, product,
        |  product_category, quantity, price, discount, order_date, source,
        |  ingested_at, api_post_id, total_amount
        |FROM cleaned
        |ORDER BY order_id""".stripMargin) { (s, dir) =>
    // exchange-fused spelling (r13): range-partition the dirty domain on
    // order_id ONCE — the keep-first dedup's clustering requirement is
    // satisfied by the range partitioning (EnsureRequirements adds only
    // its local (key, tiebreak…) sort), and the final global order is
    // satisfied without a second exchange or sort (guide §2.4). Same
    // rows, same order; one exchange + one sort instead of two + two.
    Clean(OrdersDomain.dirtyFromTpchRanged(s, dir)).orderBy("order_id")
  }

  /** Enrichment stage (~20 derived columns, `src/transformation.py:233-575`)
    * over the clean canonical domain. */
  val q12Enrich: QuerySpec = QuerySpec(
    "q12_enrich",
    "WITH " + OrdersDomain.OracleCte + "\nSELECT order_id,\n" +
      Enrich.oracleSelectList() +
      "\nFROM orders_domain\nORDER BY order_id") { (s, dir) =>
    // sort the NARROW domain, then enrich: enrichment is a pure
    // order-preserving projection, and range partitioning samples its
    // child to pick boundaries — sorting the enriched output would
    // execute all ~20 derived columns twice (the q66 lesson)
    Enrich(OrdersDomain.fromTpchOrdered(s, dir),
      brands = Enrich.PartBrands, categories = Enrich.PartCategories)
      .select(col("order_id"), col("customer_segment"), col("customer_value_tier"),
        col("customer_type"), col("product_brand"), col("product_category_detailed"),
        col("product_price_tier"), col("estimated_profit_margin"),
        col("estimated_profit"), col("revenue_tier"), col("order_year"),
        col("order_month"), col("order_day"), col("order_weekday"),
        col("order_quarter"), col("season"), col("days_since_order"),
        col("risk_score"), col("risk_level"))
  }

  /** Full clean → enrich → standardize composition — the reference's
    * `transform_all` (`src/transformation.py:669-726`) as ONE lazy Catalyst
    * plan. */
  val q13FullTransform: QuerySpec = QuerySpec(
    "q13_full_transform",
    baseCtes + "\n" +
      """SELECT upper(order_id) AS order_id,
        |  customer_name,
        |  lower(trim(customer_email)) AS customer_email,
        |  product,
        |  floor(price * 100 + 0.5) / 100 AS price,
        |  quantity,
        |  floor(total_amount * 100 + 0.5) / 100 AS total_amount,
        |  lower(source) AS source,
        |  CASE WHEN total_amount >= 1000 THEN 'VIP'
        |       WHEN total_amount >= 500 THEN 'Premium'
        |       WHEN total_amount >= 100 THEN 'Standard'
        |       ELSE 'Budget' END AS customer_segment,
        |  CASE WHEN contains(lower(product), 'widget') THEN 'WidgetWorks'
        |       WHEN contains(lower(product), 'bolt') THEN 'BoltHaus'
        |       WHEN contains(lower(product), 'rod') THEN 'RodCo'
        |       WHEN contains(lower(product), 'gear') THEN 'GearLabs'
        |       WHEN contains(lower(product), 'anvil') THEN 'AnvilCorp'
        |       ELSE 'Other' END AS product_brand,
        |  floor((total_amount * (CASE WHEN price < 100 THEN 0.15 WHEN price < 500 THEN 0.20
        |       WHEN price < 1000 THEN 0.25 ELSE 0.30 END)) * 100 + 0.5) / 100 AS estimated_profit,
        |  CASE WHEN month(order_date) IN (12, 1, 2) THEN 'Winter'
        |       WHEN month(order_date) IN (3, 4, 5) THEN 'Spring'
        |       WHEN month(order_date) IN (6, 7, 8) THEN 'Summer'
        |       ELSE 'Fall' END AS season,
        |  least(100,
        |    (CASE WHEN total_amount > 1000 THEN 30 ELSE 0 END)
        |    + (CASE WHEN customer_name IS NOT NULL AND contains(customer_name, 'Unknown') THEN 20 ELSE 0 END)
        |    + (CASE WHEN dayname(order_date) IN ('Saturday', 'Sunday') THEN 10 ELSE 0 END)) AS risk_score
        |FROM cleaned
        |ORDER BY order_id""".stripMargin) { (s, dir) =>
    // one fused range exchange (r13): the dirty domain is range-
    // partitioned on order_id, the keep-first dedup rides that exchange
    // with its one local sort, the declared orderBy is satisfied without
    // another exchange, and enrich + standardize run ONCE as
    // order-preserving projections above it. Ordering is identical:
    // standardize's upper(order_id) is a no-op on the already-uppercase
    // ORD- keys.
    val transformed = Standardize(Enrich(
      Clean(OrdersDomain.dirtyFromTpchRanged(s, dir)).orderBy("order_id"),
      brands = Enrich.PartBrands, categories = Enrich.PartCategories))
    transformed.select(
      col("order_id"), col("customer_name"), col("customer_email"),
      col("product"), col("price"), col("quantity"), col("total_amount"),
      col("source"), col("customer_segment"), col("product_brand"),
      col("estimated_profit"), col("season"), col("risk_score"))
  }

  /** Quality scoring over the dirty domain (so every component metric has
    * non-trivial value; `src/validation.py:29-282`). */
  val q14QualityScore: QuerySpec = QuerySpec(
    "q14_quality_score",
    "WITH " + OrdersDomain.OracleCte + ",\n" + OrdersDomain.DirtyOracleCte +
      ",\nq AS (" + Quality.oracleSql("dirty_domain") + ")\nSELECT * FROM q") { (s, dir) =>
    Quality.metrics(OrdersDomain.dirtyFromTpch(s, dir))
  }

  val all: Seq[QuerySpec] = Seq(
    q10OrdersDomain, q11Clean, q12Enrich, q13FullTransform, q14QualityScore)
}

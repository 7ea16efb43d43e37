package graft.pipeline

import graft.functions.Functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment stage (ref `DataEnricher`, `src/transformation.py:233-575`):
  * ~20 derived business-intelligence columns, every one a pure Catalyst
  * `Column` expression (zero UDFs → whole-stage codegen; SURVEY.md §2.9).
  *
  * Determinism for the oracle (SURVEY.md §7.4): wall-clock derived fields
  * (`days_since_order`, `processed_at`) take a pinned `asOf` timestamp; the
  * reference's global `record_id = 1..n` sequence
  * (`src/transformation.py:323-325`) is NOT reproduced as a global window —
  * a single-partition sort at 100 TB — the keyed `order_id` already carries
  * identity (deliberate scale deviation, documented in VERDICT notes).
  */
object Enrich {

  /** Pinned "as of" date for oracle-checked runs; one day after the last
    * o_orderdate in the test data (2001-08-01). */
  final val DefaultAsOf = "2002-01-01"

  /** Brand keyword map of the reference (`src/transformation.py:393-400`) —
    * used as-is for reference-domain data (unit fixtures). */
  final val RefBrands: Seq[(String, Seq[String])] = Seq(
    "Apple" -> Seq("iphone", "ipad", "macbook", "airpods", "apple watch"),
    "Samsung" -> Seq("galaxy", "samsung"),
    "Nintendo" -> Seq("nintendo", "switch"),
    "Amazon" -> Seq("kindle", "echo", "alexa"),
    "Sony" -> Seq("playstation", "sony"),
    "Microsoft" -> Seq("xbox", "surface"))

  /** Category keyword map (`src/transformation.py:417-425`). */
  final val RefCategories: Seq[(String, Seq[String])] = Seq(
    "Mobile" -> Seq("iphone", "phone", "mobile"),
    "Computer" -> Seq("macbook", "laptop", "computer", "surface"),
    "Audio" -> Seq("airpods", "headphones", "speaker", "echo"),
    "Gaming" -> Seq("nintendo", "xbox", "playstation", "switch"),
    "Tablet" -> Seq("ipad", "tablet"),
    "Wearable" -> Seq("watch", "fitness"),
    "E-Reader" -> Seq("kindle", "reader"))

  /** Keyword maps instantiated for the test-data part nouns
    * (anvil/bolt/gear/gizmo/plate/ring/rod/widget) so the classifier has
    * observable behavior over the sfDir tables. */
  final val PartBrands: Seq[(String, Seq[String])] = Seq(
    "WidgetWorks" -> Seq("widget"),
    "BoltHaus" -> Seq("bolt"),
    "RodCo" -> Seq("rod"),
    "GearLabs" -> Seq("gear"),
    "AnvilCorp" -> Seq("anvil"))

  final val PartCategories: Seq[(String, Seq[String])] = Seq(
    "Fasteners" -> Seq("bolt", "ring"),
    "Tooling" -> Seq("rod", "gear", "anvil"),
    "Gadgets" -> Seq("widget", "gizmo"))

  private def has(df: DataFrame, c: String): Boolean = df.columns.contains(c)

  /** Calculated fields (`src/transformation.py:309-331`). */
  def addCalculated(df: DataFrame, asOf: String = DefaultAsOf): DataFrame = {
    val d1 =
      if (!has(df, "total_amount") && has(df, "price") && has(df, "quantity")) {
        val disc = if (has(df, "discount")) col("discount") else lit(0)
        df.withColumn("total_amount", col("price") * col("quantity") - disc)
      } else df
    d1.withColumn("processed_at", lit(asOf).cast("timestamp"))
  }

  /** Customer intelligence (`src/transformation.py:334-380`). */
  def addCustomerIntelligence(df: DataFrame): DataFrame = {
    val d1 = if (has(df, "total_amount")) {
      df.withColumn("customer_segment",
        thresholdLadder(col("total_amount"),
          Seq(1000.0 -> "VIP", 500.0 -> "Premium", 100.0 -> "Standard"), "Budget"))
        .withColumn("customer_value_tier",
          cutRightClosed(col("total_amount"),
            Seq(0, 50, 200, 500, 1000, Double.PositiveInfinity),
            Seq("Low", "Medium", "High", "Premium", "VIP")))
    } else df
    if (has(d1, "customer_email"))
      d1.withColumn("customer_type", customerType(col("customer_email")))
    else d1
  }

  /** Product intelligence (`src/transformation.py:383-452`). */
  def addProductIntelligence(df: DataFrame,
      brands: Seq[(String, Seq[String])] = RefBrands,
      categories: Seq[(String, Seq[String])] = RefCategories): DataFrame = {
    val d1 = if (has(df, "product")) {
      df.withColumn("product_brand",
        keywordClassify(col("product"), brands, default = "Other"))
        .withColumn("product_category_detailed",
          keywordClassify(col("product"), categories, default = "Electronics"))
    } else df
    if (has(d1, "price"))
      d1.withColumn("product_price_tier",
        cutRightClosed(col("price"),
          Seq(0, 100, 500, 1000, 2000, Double.PositiveInfinity),
          Seq("Budget", "Mid-Range", "Premium", "Luxury", "Ultra-Premium")))
    else d1
  }

  /** Financial analytics (`src/transformation.py:455-495`). */
  def addFinancialAnalytics(df: DataFrame): DataFrame = {
    val d1 = if (has(df, "price"))
      df.withColumn("estimated_profit_margin", profitMargin(col("price")))
    else df
    val d2 = if (has(d1, "total_amount") && has(d1, "estimated_profit_margin"))
      // rounded HERE so the stage output matches oracleSelectList verbatim
      // (consumers shouldn't need to know to re-round money columns)
      d1.withColumn("estimated_profit",
        round2(col("total_amount") * col("estimated_profit_margin")))
    else d1
    if (has(d2, "total_amount"))
      d2.withColumn("revenue_tier",
        cutRightClosed(col("total_amount"),
          Seq(0, 100, 300, 600, 1000, Double.PositiveInfinity),
          Seq("Low", "Medium", "High", "Premium", "Enterprise")))
    else d2
  }

  /** Temporal analytics (`src/transformation.py:498-531`); `asOf` replaces
    * `datetime.now()` for reproducibility. */
  def addTemporalAnalytics(df: DataFrame, asOf: String = DefaultAsOf): DataFrame =
    if (!has(df, "order_date")) df
    else df
      .withColumn("order_year", year(col("order_date")))
      .withColumn("order_month", month(col("order_date")))
      .withColumn("order_day", dayofmonth(col("order_date")))
      .withColumn("order_weekday", date_format(col("order_date"), "EEEE"))
      .withColumn("order_quarter", quarter(col("order_date")))
      .withColumn("season", season(col("order_month")))
      .withColumn("days_since_order",
        datediff(lit(asOf).cast("date"), col("order_date").cast("date")))

  /** Record id (M12, `src/transformation.py:323-325`). The reference's
    * `record_id = range(1, n+1)` forces a global order; at 100 TB a
    * sequential id is a single-partition sort, so the DEFAULT here is
    * `monotonically_increasing_id` (unique, partition-prefixed, fully
    * parallel). Pass `sequentialBy` only when a true 1..n sequence is
    * required and the data is small enough to window globally. */
  def addRecordId(df: DataFrame, sequentialBy: Option[Seq[String]] = None): DataFrame =
    sequentialBy match {
      case Some(orderCols) =>
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(orderCols.map(col): _*)
        df.withColumn("record_id", row_number().over(w).cast("long"))
      case None =>
        df.withColumn("record_id", monotonically_increasing_id())
    }

  /** Risk assessment (`src/transformation.py:534-575`). */
  def addRiskAssessment(df: DataFrame): DataFrame = {
    val total: Column = if (has(df, "total_amount")) col("total_amount") else lit(0.0)
    val name: Column = if (has(df, "customer_name")) col("customer_name") else lit(null)
    val weekday: Column = if (has(df, "order_weekday")) col("order_weekday") else lit(null)
    df.withColumn("risk_score", riskScore(total, name, weekday))
      .withColumn("risk_level", riskLevel(col("risk_score")))
  }

  /** Full stage, reference order (`src/transformation.py:241-297`). */
  def apply(df: DataFrame,
      asOf: String = DefaultAsOf,
      brands: Seq[(String, Seq[String])] = RefBrands,
      categories: Seq[(String, Seq[String])] = RefCategories): DataFrame =
    addRiskAssessment(
      addTemporalAnalytics(
        addFinancialAnalytics(
          addProductIntelligence(
            addCustomerIntelligence(
              addCalculated(df, asOf)), brands, categories)), asOf))

  /** Oracle SELECT-list fragment reproducing the enrichment columns over a
    * relation exposing the canonical schema (pinned asOf = DefaultAsOf,
    * PartBrands keyword map). */
  def oracleSelectList(asOf: String = DefaultAsOf): String =
    s"""  CASE WHEN total_amount >= 1000 THEN 'VIP'
       |       WHEN total_amount >= 500 THEN 'Premium'
       |       WHEN total_amount >= 100 THEN 'Standard'
       |       ELSE 'Budget' END AS customer_segment,
       |  CASE WHEN total_amount > 0 AND total_amount <= 50 THEN 'Low'
       |       WHEN total_amount > 50 AND total_amount <= 200 THEN 'Medium'
       |       WHEN total_amount > 200 AND total_amount <= 500 THEN 'High'
       |       WHEN total_amount > 500 AND total_amount <= 1000 THEN 'Premium'
       |       WHEN total_amount > 1000 THEN 'VIP' END AS customer_value_tier,
       |  CASE WHEN customer_email IS NULL THEN 'Unknown'
       |       WHEN contains(lower(customer_email), 'company.com')
       |         OR contains(lower(customer_email), 'corp.com')
       |         OR contains(lower(customer_email), 'business.com') THEN 'Business'
       |       ELSE 'Individual' END AS customer_type,
       |  CASE WHEN product IS NULL THEN 'Unknown'
       |       WHEN contains(lower(product), 'widget') THEN 'WidgetWorks'
       |       WHEN contains(lower(product), 'bolt') THEN 'BoltHaus'
       |       WHEN contains(lower(product), 'rod') THEN 'RodCo'
       |       WHEN contains(lower(product), 'gear') THEN 'GearLabs'
       |       WHEN contains(lower(product), 'anvil') THEN 'AnvilCorp'
       |       ELSE 'Other' END AS product_brand,
       |  CASE WHEN product IS NULL THEN 'Unknown'
       |       WHEN contains(lower(product), 'bolt') OR contains(lower(product), 'ring') THEN 'Fasteners'
       |       WHEN contains(lower(product), 'rod') OR contains(lower(product), 'gear')
       |         OR contains(lower(product), 'anvil') THEN 'Tooling'
       |       WHEN contains(lower(product), 'widget') OR contains(lower(product), 'gizmo') THEN 'Gadgets'
       |       ELSE 'Electronics' END AS product_category_detailed,
       |  CASE WHEN price > 0 AND price <= 100 THEN 'Budget'
       |       WHEN price > 100 AND price <= 500 THEN 'Mid-Range'
       |       WHEN price > 500 AND price <= 1000 THEN 'Premium'
       |       WHEN price > 1000 AND price <= 2000 THEN 'Luxury'
       |       WHEN price > 2000 THEN 'Ultra-Premium' END AS product_price_tier,
       |  CAST(CASE WHEN price < 100 THEN 0.15 WHEN price < 500 THEN 0.20
       |       WHEN price < 1000 THEN 0.25 ELSE 0.30 END AS DOUBLE) AS estimated_profit_margin,
       |  floor((total_amount * (CASE WHEN price < 100 THEN 0.15 WHEN price < 500 THEN 0.20
       |       WHEN price < 1000 THEN 0.25 ELSE 0.30 END)) * 100 + 0.5) / 100 AS estimated_profit,
       |  CASE WHEN total_amount > 0 AND total_amount <= 100 THEN 'Low'
       |       WHEN total_amount > 100 AND total_amount <= 300 THEN 'Medium'
       |       WHEN total_amount > 300 AND total_amount <= 600 THEN 'High'
       |       WHEN total_amount > 600 AND total_amount <= 1000 THEN 'Premium'
       |       WHEN total_amount > 1000 THEN 'Enterprise' END AS revenue_tier,
       |  CAST(year(order_date) AS INT) AS order_year,
       |  CAST(month(order_date) AS INT) AS order_month,
       |  CAST(day(order_date) AS INT) AS order_day,
       |  dayname(order_date) AS order_weekday,
       |  CAST(quarter(order_date) AS INT) AS order_quarter,
       |  CASE WHEN month(order_date) IN (12, 1, 2) THEN 'Winter'
       |       WHEN month(order_date) IN (3, 4, 5) THEN 'Spring'
       |       WHEN month(order_date) IN (6, 7, 8) THEN 'Summer'
       |       ELSE 'Fall' END AS season,
       |  CAST(datediff('day', CAST(order_date AS DATE), DATE '$asOf') AS INT) AS days_since_order,
       |  least(100,
       |    (CASE WHEN total_amount > 1000 THEN 30 ELSE 0 END)
       |    + (CASE WHEN customer_name IS NOT NULL AND contains(customer_name, 'Unknown') THEN 20 ELSE 0 END)
       |    + (CASE WHEN dayname(order_date) IN ('Saturday', 'Sunday') THEN 10 ELSE 0 END)) AS risk_score,
       |  CASE WHEN least(100,
       |    (CASE WHEN total_amount > 1000 THEN 30 ELSE 0 END)
       |    + (CASE WHEN customer_name IS NOT NULL AND contains(customer_name, 'Unknown') THEN 20 ELSE 0 END)
       |    + (CASE WHEN dayname(order_date) IN ('Saturday', 'Sunday') THEN 10 ELSE 0 END)) >= 50 THEN 'High'
       |       WHEN least(100,
       |    (CASE WHEN total_amount > 1000 THEN 30 ELSE 0 END)
       |    + (CASE WHEN customer_name IS NOT NULL AND contains(customer_name, 'Unknown') THEN 20 ELSE 0 END)
       |    + (CASE WHEN dayname(order_date) IN ('Saturday', 'Sunday') THEN 10 ELSE 0 END)) >= 25 THEN 'Medium'
       |       ELSE 'Low' END AS risk_level""".stripMargin
}

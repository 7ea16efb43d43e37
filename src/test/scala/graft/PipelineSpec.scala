package graft

import graft.pipeline.{Clean, Enrich, Quality, Standardize}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ports of the reference's canonical unit tests (FIXTURES.md §A,
  * ref `tests.py:25-388`): the 3-row clean fixture, the messy-data cleaning
  * fixture, enrichment assertions, and the metamorphic quality test (#9). */
class PipelineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_name", StringType),
    StructField("customer_email", StringType),
    StructField("product", StringType),
    StructField("quantity", LongType),
    StructField("price", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("order_date", StringType),
    StructField("source", StringType),
    StructField("ingested_at", StringType)))

  /** Clean 3-row fixture (`tests.py:29-41`). */
  private def cleanFixture: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("API-0001", "John Doe", "john@example.com", "iPhone 15", 1L, 999.99, 999.99, "2024-01-15", "api_rest", "2024-01-20 10:00:00"),
      Row("API-0002", "Jane Smith", "jane@example.com", "MacBook Pro", 1L, 1999.99, 1999.99, "2024-01-16", "api_rest", "2024-01-20 10:00:00"),
      Row("API-0003", "Bob Wilson", "bob@example.com", "AirPods Pro", 2L, 249.99, 499.98, "2024-01-17", "api_rest", "2024-01-20 10:00:00")),
    schema)

  /** Corrupted variant (metamorphic, `tests.py:303-306`): bad email,
    * negative price, null quantity. */
  private def corruptFixture: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("API-0001", "John Doe", "invalid-email", "iPhone 15", 1L, 999.99, 999.99, "2024-01-15", "api_rest", "2024-01-20 10:00:00"),
      Row("API-0002", "Jane Smith", "jane@example.com", "MacBook Pro", 1L, -100.0, 1999.99, "2024-01-16", "api_rest", "2024-01-20 10:00:00"),
      Row("API-0003", "Bob Wilson", "bob@example.com", "AirPods Pro", null, 249.99, 499.98, "2024-01-17", "api_rest", "2024-01-20 10:00:00")),
    schema)

  private val asOf = "2024-06-01"

  private def metricsMap(df: DataFrame): Map[String, Double] = {
    val row = Quality.metrics(df, asOf).collect().head
    Seq("completeness", "validity", "consistency", "accuracy", "overall_score")
      .map(m => m -> row.getAs[Double](m)).toMap
  }

  test("quality: clean fixture scores > 80 with completeness >= 95 (tests.py:98)") {
    val m = metricsMap(cleanFixture)
    assert(m("overall_score") > 80, s"overall=${m("overall_score")}")
    assert(m("completeness") >= 95)
    val level = Quality.metrics(cleanFixture, asOf).collect().head.getAs[String]("quality_level")
    assert(Set("excellent", "good", "fair").contains(level))
  }

  test("quality: metamorphic corruption strictly lowers completeness/validity/accuracy (tests.py:312-314)") {
    val clean = metricsMap(cleanFixture)
    val dirty = metricsMap(corruptFixture)
    assert(dirty("completeness") < clean("completeness"))
    assert(dirty("validity") < clean("validity"))
    assert(dirty("accuracy") < clean("accuracy"))
  }

  test("quality: valid/invalid record counts (validation.py:252-282)") {
    val r = Quality.metrics(corruptFixture, asOf).collect().head
    // row2 has price<0, row3 has null quantity → 1 valid
    assert(r.getAs[Long]("valid_records") == 1L)
    assert(r.getAs[Long]("invalid_records") == 2L)
  }

  test("clean: messy fixture — dedup keep-first, case repair, numeric coercion (test_2.py:91-121)") {
    val messySchema = StructType(Seq(
      StructField("order_id", StringType), StructField("customer_name", StringType),
      StructField("customer_email", StringType), StructField("product", StringType),
      StructField("quantity", StringType), StructField("price", StringType),
      StructField("ingested_at", StringType)))
    val messy = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("API-0001", "john doe", "JOHN@EXAMPLE.COM", " iPhone 15 ", "1", "999.99", "2024-01-20 10:00:00"),
        Row("API-0001", "john doe", "JOHN@EXAMPLE.COM", " iPhone 15 ", "1", "999.99", "2024-01-21 10:00:00"),
        Row("API-0002", "JANE SMITH", "jane@example.com", "MacBook Pro", "not-a-number", "1999.99", "2024-01-20 10:00:00")),
      messySchema)
    val out = Clean(messy).orderBy("order_id").collect()
    assert(out.length == 2, "duplicate API-0001 must collapse to keep-first")
    val r1 = out(0)
    assert(r1.getAs[String]("customer_name") == "John Doe")
    assert(r1.getAs[String]("customer_email") == "john@example.com")
    assert(r1.getAs[String]("product") == "iPhone 15")
    assert(r1.getAs[Double]("price") == 999.99)
    assert(r1.getAs[Double]("quantity") == 1.0)
    // keep-first by ingested_at: the 01-20 row survives
    assert(r1.getAs[java.sql.Timestamp]("ingested_at").toString.startsWith("2024-01-20"))
    // unparseable quantity coerced to null then imputed to 1
    assert(out(1).getAs[Double]("quantity") == 1.0)
  }

  test("clean: invalid records removed (negative price, null critical field)") {
    val bad = cleanFixture
      .withColumn("price", when(col("order_id") === "API-0002", -5.0).otherwise(col("price")))
      .withColumn("product", when(col("order_id") === "API-0003", lit(null)).otherwise(col("product")))
    assert(Clean(bad).count() == 1)
  }

  test("enrich: fixture gains the 8 canonical enrichment columns (tests.py:141-144)") {
    val e = Enrich(Clean(cleanFixture), asOf = asOf)
    val expected = Seq("customer_segment", "product_brand", "estimated_profit_margin",
      "risk_score", "risk_level", "season", "order_year", "order_month")
    expected.foreach(c => assert(e.columns.contains(c), s"missing $c"))
    val rows = e.orderBy("order_id").collect()
    // iPhone 15 → Apple (tests.py:155)
    assert(rows(0).getAs[String]("product_brand") == "Apple")
    // 999.99 → Premium (transformation.py:339-349)
    assert(rows(0).getAs[String]("customer_segment") == "Premium")
    assert(rows.forall(r => Set("VIP", "Premium", "Standard", "Budget")
      .contains(r.getAs[String]("customer_segment"))))
    assert(rows.forall { r =>
      val s = r.getAs[Int]("risk_score"); s >= 0 && s <= 100
    })
    // Jan order → Winter
    assert(rows(0).getAs[String]("season") == "Winter")
    assert(rows(0).getAs[Int]("order_year") == 2024)
  }

  test("enrich: pd.cut right-closed bin edges (transformation.py:353-359)") {
    import graft.functions.Functions.cutRightClosed
    val vals = Seq(0.0, 50.0, 50.01, 1000.0, 1000.01, -3.0)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vals.map(Row(_)): _*),
      StructType(Seq(StructField("v", DoubleType))))
    val out = df.select(cutRightClosed(col("v"),
      Seq(0, 50, 200, 500, 1000, Double.PositiveInfinity),
      Seq("Low", "Medium", "High", "Premium", "VIP")).as("t"))
      .collect().map(_.getAs[String]("t"))
    assert(out.toSeq == Seq(null, "Low", "Medium", "Premium", "VIP", null))
  }

  test("standardize: upper ids, lower emails, 2-dec money (transformation.py:608-645)") {
    val raw = cleanFixture
      .withColumn("order_id", lit("api-0009"))
      .withColumn("customer_email", lit(" MIXED@Example.COM "))
      .withColumn("price", lit(3.14159))
    val out = Standardize(raw).collect().head
    assert(out.getAs[String]("order_id") == "API-0009")
    assert(out.getAs[String]("customer_email") == "mixed@example.com")
    assert(out.getAs[Double]("price") == 3.14)
  }

  test("customer_type: business domain detection (transformation.py:363-373)") {
    import graft.functions.Functions.customerType
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a@company.com"), Row("b@gmail.com"), Row(null)),
      StructType(Seq(StructField("e", StringType))))
    val out = df.select(customerType(col("e")).as("t")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("Business", "Individual", "Unknown"))
  }
}

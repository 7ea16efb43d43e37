package graft

import graft.ext.Similarity
import graft.functions.{ArrayDotProduct, QualityAggregator}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FunctionsSpec extends SparkSpec {

  test("native dot product equals higher-order-function composition bitwise") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val both = e.select(
      Similarity.dot(col("embedding"), col("embedding")).as("native"),
      Similarity.dotComposed(col("embedding"), col("embedding")).as("composed"))
    // null-safe inequality: plain =!= evaluates to NULL (filtered away)
    // when either side is NULL — exactly the divergence class to catch
    assert(both.filter(!(col("native") <=> col("composed"))).count() == 0)
  }

  test("native dot participates in whole-stage codegen (no fallback)") {
    val e = Tables.embeddings(spark, sf)
    val plan = e.select(Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the compact plan
    assert(plan.contains("*(1) Project [arraydotproduct"), plan.take(500))
  }

  test("graft_dot registered for SQL via function registry and extensions") {
    ArrayDotProduct.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM emb_v ORDER BY vec_id LIMIT 1")
      .collect().head
    assert(r.getAs[Double]("d") > 0)
    // extensions path: force a FRESH session — getOrCreate on an active
    // session ignores withExtensions, which would make this vacuous
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")),
        "GraftExtensions did not register graft_dot in a fresh session")
    } finally {
      SparkSession.setDefaultSession(SparkSpec.spark)
      SparkSession.setActiveSession(SparkSpec.spark)
    }
  }

  test("graft_dot wrong arity raises an analysis error, not IndexOutOfBounds") {
    ArrayDotProduct.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_arity_v")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(embedding) FROM emb_arity_v").collect()
    }
    assert(!e.isInstanceOf[IndexOutOfBoundsException])
    assert(e.getMessage.contains("graft_dot"))
  }

  test("null and length-mismatch semantics of graft_dot") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)), StructField("b", ArrayType(DoubleType))))
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(Seq(1.0, 2.0, 3.0), Seq(2.0, 3.0)), // length mismatch → shorter
      Row(null, Seq(1.0)),                    // null array → null
      Row(Seq(1.0, null, 2.0), Seq(1.0, 1.0, 1.0))), schema) // null elem → 0
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getAs[Double]("d") == 8.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getAs[Double]("d") == 3.0)
  }

  test("quality Aggregator: per-group quality in one pass") {
    import spark.implicits._
    val inputs = Seq(
      ("api", QualityAggregator.QualityInput(true, true, true, true, true, 6, 6)),
      ("api", QualityAggregator.QualityInput(true, false, true, true, true, 5, 6)),
      ("csv", QualityAggregator.QualityInput(false, false, false, false, false, 0, 6)))
      .toDF("src", "q").as[(String, QualityAggregator.QualityInput)]
    val byGroup = inputs.groupByKey(_._1)
      .mapValues(_._2)
      .agg(QualityAggregator.agg.toColumn.name("quality"))
      .collect().toMap
    assert(byGroup("api").completeness > byGroup("csv").completeness)
    assert(byGroup("csv").score >= 0.0)
    assert(byGroup("api").score > 80)
  }

  test("scalacheck-style invariants: binning, ladder, risk bounds") {
    import graft.functions.Functions._
    val vals = (-100 to 2500 by 7).map(_.toDouble)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vals.map(Row(_)): _*),
      StructType(Seq(StructField("v", DoubleType))))
    val out = df.select(
      col("v"),
      cutRightClosed(col("v"), Seq(0, 100, 500, 1000, 2000, Double.PositiveInfinity),
        Seq("a", "b", "c", "d", "e")).as("bin"),
      thresholdLadder(col("v"), Seq(1000.0 -> "hi", 100.0 -> "mid"), "lo").as("seg"),
      riskScore(col("v"), lit("Unknown x"), lit("Saturday")).as("risk")).collect()
    out.foreach { r =>
      val v = r.getAs[Double]("v")
      val bin = r.getAs[String]("bin")
      if (v <= 0) assert(bin == null) else assert(bin != null)
      val risk = r.getAs[Int]("risk")
      assert(risk >= 0 && risk <= 100)
      val seg = r.getAs[String]("seg")
      assert((v >= 1000) == (seg == "hi"))
    }
  }
}

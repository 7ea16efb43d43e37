package graft

import graft.pipeline.{Config, GraftConfig, Ingest, Pipeline, Quality}
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The reference's configuration contract (`utils.py:50-115`, test #8
  * `tests.py:260-280`): YAML file → dot-notation access with defaults,
  * missing file → built-in defaults, and the loaded config driving the
  * pipeline's stage toggles (`run_pipeline.py --no-validation`). */
class ConfigSpec extends SparkSpec {

  private val sampleYaml =
    """# engine configuration
      |database:
      |  path: "data/orders.parquet"   # trailing comment
      |  connection_timeout: 30
      |  batch_size: 1000
      |api:
      |  base_url: "https://jsonplaceholder.typicode.com"
      |  retry_attempts: 3
      |  retry_delay: 5
      |files:
      |  supported_formats: ["csv", "json"]
      |pipeline:
      |  batch_size: 2000
      |  log_level: "INFO"
      |  enable_monitoring: true
      |data_quality:
      |  quality_threshold: 85.5
      |  required_fields:
      |    - order_id
      |    - customer_name
      |transformation:
      |  enable_cleaning: true
      |  enable_enrichment: false
      |""".stripMargin

  test("dot-notation access, types, and per-call defaults (tests.py:260-280)") {
    val c = Config.parse(sampleYaml)
    assert(c.getString("database.path", "").endsWith(".parquet"))
    assert(c.getString("api.base_url", "").toLowerCase.contains("jsonplaceholder"))
    assert(c.getInt("pipeline.batch_size", -1) == 2000)
    assert(c.getDouble("data_quality.quality_threshold", -1.0) == 85.5)
    assert(c.getBoolean("pipeline.enable_monitoring", default = false))
    assert(c.getBoolean("transformation.enable_enrichment", default = true) == false)
    assert(c.getStrings("files.supported_formats", Nil) == Seq("csv", "json"))
    assert(c.getStrings("data_quality.required_fields", Nil) ==
      Seq("order_id", "customer_name"))
    // absent key → caller default, nested miss included
    assert(c.getOrElse("non.existent.key", "default_value") == "default_value")
    assert(c.get("database.path.too.deep").isEmpty)
  }

  test("yaml edge shapes: dash lists at key indent, 1.1 booleans, malformed scalars") {
    val c = Config.parse(
      """data_quality:
        |  required_fields:
        |  - order_id
        |  - price
        |pipeline:
        |  enable_monitoring: yes
        |  batch_size: "1,000"
        |  quality_threshold: high
        |""".stripMargin)
    // dash items at the KEY's indent are valid YAML and must parse as a list
    assert(c.getStrings("data_quality.required_fields", Nil) == Seq("order_id", "price"))
    assert(c.getBoolean("pipeline.enable_monitoring", default = false))
    // malformed scalars fall back to the caller default instead of throwing
    assert(c.getInt("pipeline.batch_size", 1000) == 1000)
    assert(c.getDouble("pipeline.quality_threshold", 80.0) == 80.0)
  }

  test("bad export format fails fast, before any storage work") {
    val posts = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 1L, "iPhone post")),
      StructType(Seq(StructField("id", LongType), StructField("userId", LongType),
        StructField("title", StringType))))
    val out = Files.createTempDirectory("cfg_bad").toString
    val report = Pipeline.run(spark, Seq(Ingest.postsToOrders(posts)), out,
      GraftConfig(exportFormats = Seq("csv", "avro")))
    assert(!report.success)
    assert(report.stages.map(_.stage) == Seq("configuration"))
    assert(report.stages.head.error.exists(_.contains("avro")))
    // nothing was written — the upsert never ran
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "orders")))
  }

  test("missing file and malformed text fall back to defaults (utils.py:59-73)") {
    val missing = Config.load("/nonexistent/config.yaml")
    assert(missing.getInt("pipeline.batch_size", -1) == 1000)
    assert(missing.getStrings("data_quality.required_fields", Nil) ==
      Quality.RequiredFields)
    val malformed = Config.parse("\tnot: yaml\n  ][")
    assert(malformed.getInt("api.retry_attempts", -1) == 3)
  }

  test("loaded file feeds GraftConfig and toggles pipeline stages off") {
    val dir = Files.createTempDirectory("cfg")
    val yml = dir.resolve("config.yaml")
    Files.write(yml,
      """transformation:
        |  enable_validation: false
        |  enable_enrichment: false
        |  enable_standardization: false
        |data_quality:
        |  quality_threshold: 90
        |""".stripMargin.getBytes("UTF-8"))
    val gc: GraftConfig = Config.load(yml.toString).toGraftConfig
    assert(gc.qualityThreshold == 90.0)
    assert(!gc.enableValidation && !gc.enableEnrichment && !gc.enableStandardization)
    assert(gc.enableCleaning) // untouched key keeps its code default
    val posts = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 1L, "iPhone post")),
      StructType(Seq(StructField("id", LongType), StructField("userId", LongType),
        StructField("title", StringType))))
    val out = Files.createTempDirectory("cfg_out").toString
    val report = Pipeline.run(spark, Seq(Ingest.postsToOrders(posts)), out, gc)
    assert(report.success, report.toString)
    assert(report.stages.map(_.stage) == Seq("ingestion", "cleaning", "storage"))
  }

  test("config-enabled storage stage: incremental layout, exports, summary report") {
    val dir = Files.createTempDirectory("cfg2")
    Files.write(dir.resolve("config.yaml"),
      """storage:
        |  incremental: true
        |  export_formats: ["csv", "json"]
        |  summary_report: true
        |""".stripMargin.getBytes("UTF-8"))
    val gc = Config.load(dir.resolve("config.yaml").toString).toGraftConfig
    assert(gc.incrementalStorage && gc.summaryReport)
    assert(gc.exportFormats == Seq("csv", "json"))
    val posts = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 1L, "iPhone post"), Row(2L, 2L, "watch post")),
      StructType(Seq(StructField("id", LongType), StructField("userId", LongType),
        StructField("title", StringType))))
    val out = Files.createTempDirectory("cfg2_out").toString
    val report = Pipeline.run(spark, Seq(Ingest.postsToOrders(posts)), out,
      gc.copy(asOf = "2024-06-01"))
    assert(report.success, report.toString)
    // incremental layout: table is partitioned by __bucket
    val stored = graft.pipeline.Store.readOrdersIncremental(spark, s"$out/orders")
    assert(stored.count() == 2)
    assert(spark.read.parquet(s"$out/orders").columns.contains("__bucket"))
    // exports landed
    assert(spark.read.option("header", "true").csv(s"$out/exports/orders_csv").count() == 2)
    assert(spark.read.json(s"$out/exports/orders_json").count() == 2)
    // summary report parses and counts match
    val rep = spark.read.option("multiLine", "true").json(s"$out/orders_summary.json")
    assert(rep.collect().head.getAs[Long]("total_records") == 2)
    // a rerun through the incremental path stays idempotent
    val report2 = Pipeline.run(spark, Seq(Ingest.postsToOrders(posts)), out,
      gc.copy(asOf = "2024-06-01"))
    assert(report2.recordsStored == 2)
  }
}

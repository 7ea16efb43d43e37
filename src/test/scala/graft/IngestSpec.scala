package graft

import graft.pipeline.Ingest
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IngestSpec extends SparkSpec {

  private def postsDf(rows: (Long, Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, u, t) => Row(i, u, t) }: _*),
    StructType(Seq(StructField("id", LongType), StructField("userId", LongType),
      StructField("title", StringType))))

  test("postsToOrders: mock API posts fixture (tests.py:61-64, test_2.py:47-48)") {
    val posts = postsDf((1L, 1L, "iPhone post"), (2L, 2L, "MacBook post"))
    val orders = Ingest.postsToOrders(posts).orderBy("order_id").collect()
    assert(orders(0).getAs[String]("order_id") == "API-0001")
    assert(orders(0).getAs[String]("product") == "iPhone 15") // 'phone' keyword
    assert(orders(0).getAs[String]("customer_name") == "Customer 1")
    assert(orders(0).getAs[String]("customer_email") == "customer1@example.com")
    // price formula: 50 + (id % 20) * 25.99 (ingestion.py:137)
    assert(orders(0).getAs[Double]("price") == 75.99)
    assert(orders(1).getAs[Double]("price") == 101.98)
    assert(orders(0).getAs[Double]("total_amount") == 75.99)
  }

  test("postsToOrders: md5 fallback lands in the default product list (ingestion.py:188-190)") {
    val posts = postsDf((3L, 1L, "zzz qqq unmatched title"))
    val p = Ingest.postsToOrders(posts).collect().head.getAs[String]("product")
    assert(Ingest.DefaultProducts.contains(p))
  }

  test("readJsonDir accepts all three envelope shapes (ingestion.py:297-305)") {
    def run(content: String): Long = {
      val dir = Files.createTempDirectory("json_in").toString
      Files.writeString(Paths.get(dir, "data.json"), content)
      Ingest.readJsonDir(spark, dir).count()
    }
    assert(run("""[{"order_id": "A", "price": 1.0}, {"order_id": "B", "price": 2.0}]""") == 2)
    assert(run("""{"orders": [{"order_id": "A", "price": 1.0}, {"order_id": "B", "price": 2.0}]}""") == 2)
    assert(run("""{"order_id": "A", "price": 1.0}""") == 1)
  }

  test("readJsonDir: one directory mixing envelope shapes loses no rows") {
    val dir = Files.createTempDirectory("json_mixed").toString
    Files.writeString(Paths.get(dir, "wrapped.json"),
      """{"orders": [{"order_id": "W1", "price": 1.0}, {"order_id": "W2", "price": 2.0}]}""")
    Files.writeString(Paths.get(dir, "bare.json"),
      """[{"order_id": "B1", "price": 3.0}]""")
    Files.writeString(Paths.get(dir, "single.json"),
      """{"order_id": "S1", "price": 4.0}""")
    val out = Ingest.readJsonDir(spark, dir)
    val ids = out.select("order_id").collect().map(_.getString(0)).toSet
    assert(ids == Set("W1", "W2", "B1", "S1"),
      s"rows dropped from a mixed-envelope directory: got $ids")
  }

  test("quarantineBatch: clean files move to processed/, corrupt ones to errors/ (ingestion.py:243-252)") {
    // JSON route: one good file, one malformed file
    val jd = Files.createTempDirectory("q_json").toString
    Files.writeString(Paths.get(jd, "good.json"),
      """[{"order_id": "A", "price": 1.0}]""")
    Files.writeString(Paths.get(jd, "broken.json"),
      """{"order_id": "B", "price": """) // truncated mid-document
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((1L, 1L)))
    assert(Files.exists(Paths.get(jd, "processed", "good.json")))
    assert(Files.exists(Paths.get(jd, "errors", "broken.json")))
    // the source directory is drained; a re-run is a no-op
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((0L, 0L)))

    // CSV route: contract schema as the gate — self-inference would widen
    // price to string to accommodate the very row the gate should reject
    val cd = Files.createTempDirectory("q_csv").toString
    Files.writeString(Paths.get(cd, "good.csv"),
      "order_id,price\nA,1.5\nB,2.5\n")
    Files.writeString(Paths.get(cd, "bad.csv"),
      "order_id,price\nC,not_a_number\n")
    val contract = StructType(Seq(
      StructField("order_id", StringType), StructField("price", DoubleType)))
    val (p, e) = Ingest.quarantineBatch(spark, cd, "csv", contract = contract)
    assert((p, e) == ((1L, 1L)), s"csv classify got ($p, $e)")
    assert(Files.exists(Paths.get(cd, "processed", "good.csv")))
    assert(Files.exists(Paths.get(cd, "errors", "bad.csv")))
  }

  test("quarantineBatch edges: every-file-corrupt batch routes all to errors/; archived subdirs stay put") {
    val jd = Files.createTempDirectory("q_allbad").toString
    Files.writeString(Paths.get(jd, "b1.json"), """{"x": [""")
    Files.writeString(Paths.get(jd, "b2.json"), """not json at all"""")
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((0L, 2L)))
    assert(Files.exists(Paths.get(jd, "errors", "b1.json")) &&
      Files.exists(Paths.get(jd, "errors", "b2.json")))
    // a new arrival is classified alone; the archived files are untouched
    Files.writeString(Paths.get(jd, "late.json"), """[{"x": 1}]""")
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((1L, 0L)))
    assert(Files.exists(Paths.get(jd, "processed", "late.json")))
    assert(Files.exists(Paths.get(jd, "errors", "b1.json")),
      "re-run disturbed already-quarantined files")
  }

  test("quarantineBatch hardening: recurring names, glob metacharacters, json contract") {
    val jd = Files.createTempDirectory("q_hard").toString
    // a recurring drop name: yesterday's copy is already archived
    Files.writeString(Paths.get(jd, "orders.json"), """[{"x": 1}]""")
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((1L, 0L)))
    Files.writeString(Paths.get(jd, "orders.json"), """[{"x": 2}]""")
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((1L, 0L)),
      "a name collision with the archive must disambiguate, not wedge")
    assert(Files.exists(Paths.get(jd, "processed", "orders.json")) &&
      Files.exists(Paths.get(jd, "processed", "orders.json.1")))
    // glob metacharacters in a data file name must not derail the batch
    Files.writeString(Paths.get(jd, "w[1].json"), """[{"x": 3}]""")
    Files.writeString(Paths.get(jd, "plain.json"), """not json"""")
    assert(Ingest.quarantineBatch(spark, jd, "json") == ((1L, 1L)))
    assert(Files.exists(Paths.get(jd, "processed", "w[1].json")))
    assert(Files.exists(Paths.get(jd, "errors", "plain.json")))
    // a json contract: well-formed files VIOLATING the declared types
    // are corrupt, not silently re-inferred into acceptance
    val contract = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType)))
    Files.writeString(Paths.get(jd, "typed_ok.json"), """[{"x": 4}]""")
    Files.writeString(Paths.get(jd, "typed_bad.json"), """[{"x": "NaL"}]""")
    assert(Ingest.quarantineBatch(spark, jd, "json", contract = contract)
      == ((1L, 1L)), "type-violating json must land in errors/")
    assert(Files.exists(Paths.get(jd, "processed", "typed_ok.json")) &&
      Files.exists(Paths.get(jd, "errors", "typed_bad.json")))
  }

  test("readCsvDir infers header and types, adds provenance (S3/S5)") {
    val dir = Files.createTempDirectory("csv_in").toString
    Files.writeString(Paths.get(dir, "a.csv"),
      "order_id,price\nCSV-0001,12.5\nCSV-0002,99.0")
    val df = Ingest.readCsvDir(spark, dir)
    assert(df.count() == 2)
    assert(df.schema("price").dataType == DoubleType)
    assert(df.columns.contains("source_file"))
    assert(df.select("source").distinct().collect().head.getString(0) == "file_csv")
  }

  test("collectAll: name-aligned union + keep-first dedup (ingestion.py:356-420)") {
    val api = Ingest.postsToOrders(postsDf((1L, 1L, "iPhone post")))
    val csvish = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("API-0001", 5.0),  // duplicate key, later ingest ts missing → keep-first wins
        Row("FILE-0001", 7.0)),
      StructType(Seq(StructField("order_id", StringType), StructField("price", DoubleType))))
    val all = Ingest.collectAll(Seq(api, csvish))
    assert(all.count() == 2)
    val a1 = all.filter(col("order_id") === "API-0001").collect().head
    // union-by-name null-fills the csv frame's missing columns
    assert(all.filter(col("order_id") === "FILE-0001")
      .collect().head.getAs[String]("customer_name") == null)
    assert(a1.getAs[String]("customer_name") != null)
  }
}

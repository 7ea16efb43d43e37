package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AdvancedSpec extends SparkSpec {

  test("DSv2 posts source: one partition per page, schema, determinism") {
    val df = spark.read.format("graft.sources.PostsDataSource")
      .option("limit", "250").option("pageSize", "100").load()
    assert(df.columns.toSeq == Seq("id", "userId", "title", "body"))
    assert(df.count() == 250)
    assert(df.rdd.getNumPartitions == 3) // ceil(250/100) pages
    // jsonplaceholder shape: 10 posts per user
    assert(df.filter(col("userId") === 1).count() == 10)
    val again = spark.read.format("graft.sources.PostsDataSource")
      .option("limit", "250").option("pageSize", "100").load()
    assert(df.exceptAll(again).count() == 0)
  }

  test("DSv2 limit pushdown trims the page plan") {
    val df = spark.read.format("graft.sources.PostsDataSource")
      .option("limit", "500").option("pageSize", "100").load()
      .limit(42)
    assert(df.count() == 42)
    // pushed limit 42 → a single 100-row page planned, not 5: assert on
    // the BatchScan's actual input partitions (the limit operator itself
    // always runs single-partition, so rdd partition counts prove nothing)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan planned")
    assert(scans.head.inputPartitions.length == 1,
      s"limit not pushed: ${scans.head.inputPartitions.length} pages planned")
  }

  test("asof join: inclusive match, no-prior-row yields null, ties right-before-left") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("t", TimestampType), StructField("id", LongType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, ts("2024-01-01 10:00:00"), 100L),
      Row(1L, ts("2024-01-01 12:00:00"), 101L),
      Row(2L, ts("2024-01-01 09:00:00"), 102L)), schema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, ts("2024-01-01 10:00:00"), 7L), // equal ts → inclusive match
      Row(1L, ts("2024-01-01 11:30:00"), 8L),
      Row(2L, ts("2024-01-01 09:30:00"), 9L)), schema) // after left → no match
    val out = AsOfJoin.asof(left, right, "k", "t", "t",
      Map("id" -> "matched_id"), tiebreak = "id")
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("matched_id") == 7L)  // inclusive at equal ts
    assert(out(1).getAs[Long]("matched_id") == 8L)  // latest preceding
    assert(out(2).isNullAt(out(2).fieldIndex("matched_id"))) // nothing prior
  }

  test("sessionization: gap splits, single-event sessions allowed") {
    val df = SparkEntry.queries("q42_sessionize")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // session ids are 1..k contiguous per user
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      val ids = rs.map(_.getAs[Long]("session_id")).sorted
      assert(ids.toSeq == (1L to ids.length))
    }
    assert(rows.forall(_.getAs[Long]("duration_sec") >= 0))
  }
}

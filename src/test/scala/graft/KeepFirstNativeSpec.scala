package graft

import graft.operators.KeepFirst
import graft.pipeline.Clean
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** [[graft.plans.KeepFirstExec]]: the native keep-first dedup matches the
  * aggregate form row-for-row (including null keys and null tiebreaks) and
  * plans as exactly one exchange + one sort + the streaming pass. */
class KeepFirstNativeSpec extends SparkSpec {

  import spark.implicits._

  // dup keys, a null key group, null tiebreak values, and a singleton
  private def fixture = Seq(
    (Some("a"), Some(3), Some("x")),
    (Some("a"), Some(1), Some("y")),
    (Some("a"), Some(1), None), // null tiebreak sorts first within o=1
    (Some("a"), Some(1), None), // exact duplicate row
    (None, Some(9), Some("n1")),
    (None, Some(2), Some("n2")), // null keys form ONE group
    (Some("b"), None, Some("w")), // null first-tiebreak wins for b
    (Some("b"), Some(5), Some("w")),
    (Some("c"), Some(4), Some("q")))
    .toDF("k", "o", "v")

  test("native pick equals the min-struct aggregate pick") {
    val nat = Clean.dedupKeepFirst(fixture, key = "k", orderCols = Seq("o", "v"))
    val agg = Clean.dedupKeepFirstAgg(fixture, key = "k", orderCols = Seq("o", "v"))
    assert(nat.columns.toSeq == fixture.columns.toSeq)
    val n = nat.collect().map(_.toSeq).toSet
    val a = agg.collect().map(_.toSeq).toSet
    assert(n == a, s"native $n != aggregate $a")
    assert(n.size == 4) // a, b, c, and the null-key group
  }

  test("native pick equals the aggregate pick on the real dirty domain with planted dups") {
    val dirty = pipeline.OrdersDomain.dirtyFromTpch(spark, sf)
    // planted later-arriving duplicates: a third of the keys twice
    val withDups = dirty.unionAll(dirty.filter(col("api_post_id") % 3 === 0)
      .withColumn("ingested_at", col("ingested_at") + expr("INTERVAL 1 DAY")))
    val nat = Clean.dedupKeepFirst(withDups)
    val agg = Clean.dedupKeepFirstAgg(withDups)
    assert(nat.count() == dirty.count())
    assert(nat.exceptAll(agg).count() == 0 && agg.exceptAll(nat).count() == 0)
  }

  test("multi-key grouping and column-order preservation") {
    val df = Seq((1, "x", 9.0), (1, "x", 3.0), (1, "y", 5.0), (2, "x", 7.0))
      .toDF("k1", "k2", "m")
    val out = KeepFirst.native(df, Seq("k1", "k2"), Seq("m"))
    assert(out.columns.toSeq == Seq("k1", "k2", "m"))
    assert(out.orderBy("k1", "k2").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1, "x", 3.0), Seq(1, "y", 5.0), Seq(2, "x", 7.0)))
  }

  test("physical plan: one exchange, one sort, no SortAggregate, no window") {
    val dirty = pipeline.OrdersDomain.dirtyFromTpch(spark, sf)
    val plan = Clean.dedupKeepFirst(dirty).queryExecution.executedPlan
    // materialize AQE's final plan before counting
    Clean.dedupKeepFirst(dirty).write.format("noop").mode("overwrite").save()
    val s = plan.toString
    assert(s.contains("KeepFirst"), s)
    assert(!s.contains("SortAggregate"), "dedup regressed to SortAggregate")
    assert(!s.contains("WindowGroupLimit"), "dedup regressed to the window form")
    // above the base scans: exactly the dedup's hash exchange and its sort
    // (the 4-table build contributes one more exchange pair at most — count
    // the operators ABOVE the KeepFirst node's child sort instead)
    val keepFirst = plan.collect {
      case e if e.getClass.getSimpleName == "KeepFirstExec" => e
    }
    assert(keepFirst.size == 1)
    val below = keepFirst.head.children.head
    assert(below.isInstanceOf[SortExec], s"child of KeepFirstExec is $below")
    val exchanges = below.collect { case x: ShuffleExchangeExec => x }
    assert(exchanges.size == 1,
      s"expected exactly the dedup exchange below the sort, got $exchanges")
  }

  test("unknown column fails loudly") {
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      KeepFirst.native(df, Seq("missing"), Seq("b")))
    assert(e.getMessage.contains("missing"))
  }
}

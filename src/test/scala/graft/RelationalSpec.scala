package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("q01 groups by returnflag/linestatus") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    assert(df.columns.contains("sum_qty") && df.columns.contains("count_order"))
    val rows = df.collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
  }

  test("q02 topk is sorted descending by totalprice") {
    val prices = SparkEntry.queries("q02_topk_orders")(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q08 keep-first dedup yields one row per customer, the earliest") {
    val df = SparkEntry.queries("q08_dedup_key_keepfirst")(spark, sf)
    val total = df.count()
    assert(df.select("o_custkey").distinct().count() == total)
    // earliest order date per customer
    val expected = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(min("o_orderdate").as("d"))
    val joined = df.join(expected, "o_custkey")
      .filter(col("o_orderdate") =!= col("d")).count()
    assert(joined == 0)
  }

  test("q09 union-by-name null-fills missing columns") {
    val df = SparkEntry.queries("q09_union_by_name")(spark, sf)
    assert(df.columns.toSet == Set("entity_key", "entity_name", "acctbal", "segment"))
    assert(df.filter(col("segment").isNull).count() > 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entity resolution: every probe resolves at distance 1 to its own name") {
    import graft.queries.Relational
    val rows = Relational.resolveEntities(Tables.part(spark, sf)).collect()
    assert(rows.nonEmpty)
    // the typo model drops exactly one char, and the dictionary always
    // contains the original — so a correct resolver scores lev=1 on a hit
    rows.foreach { r =>
      assert(r.getAs[Int]("lev") >= 1, s"$r")
    }
    val hits = rows.count(_.getAs[Boolean]("hit"))
    assert(hits.toDouble / rows.length >= 0.9,
      s"resolution accuracy collapsed: $hits/${rows.length}")
    // cube sanity rides along: grand total row equals the orders count
    val cube = SparkEntry.queries("q129_cube")(spark, sf)
      .filter(col("status") === "ALL" && col("priority") === "ALL").collect()
    assert(cube.length == 1)
    assert(cube.head.getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
  }

  test("entity resolution: large-dictionary shuffle path ≡ broadcast path, and never broadcasts") {
    import graft.queries.Relational
    val parts = Tables.part(spark, sf)
    val viaBroadcast = Relational.resolveEntities(parts).collect()
    val shuffled = Relational.resolveEntities(parts, broadcastDict = false)
    val viaShuffle = shuffled.collect()
    assert(viaBroadcast.map(_.toSeq).toSeq == viaShuffle.map(_.toSeq).toSeq,
      "shuffle-join dictionary path diverges from the broadcast path")
    // the point of the variant: the dictionary side must NOT broadcast
    // (inspect the AQE FINAL plan — materialized by the collect above)
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"large-dict path still broadcasts:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffle join on the block key:\n$plan")
  }
}

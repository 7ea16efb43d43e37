package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot differencing — CDC-style change detection between two
  * versions of a keyed table: the incremental-pipeline primitive behind
  * "what changed since the last run" (the set the reference's
  * `INSERT OR REPLACE` upsert applies blindly,
  * `/root/reference/src/storage.py:114-228` — here made explicit so a
  * pipeline can ship the delta instead of the table).
  *
  * Scale shape: ONE full-outer sort-merge join on the key — both sides
  * shuffle-partition on o_orderkey and nothing else moves; with both
  * snapshots bucketed by key (Store.scala's layout) the join is
  * shuffle-free. Row comparison is per-column — never a stringified
  * row-hash, whose float→string formatting differs across engines.
  */
object Snapshot {

  /** Deterministic "next snapshot" of orders: ~1% deleted (key % 97),
    * 20% price-adjusted (key % 5, applied to survivors), ~1% inserted
    * (key % 101 cloned past the key range). The +10.00 adjustment is
    * exact in IEEE doubles — no rounding step to drift cross-engine.
    *
    * The insert offset is DERIVED from the scanned max key — the next
    * multiple of 10,000,000 strictly above it (pure integer `div`, exact
    * in both engines) — so cloned keys can never collide with real ones
    * at any SF (TPC-H orderkeys reach ~6,000,000×SF; a fixed +10,000,000
    * would collide from SF≈2 and silently fan out the full-outer diff).
    * The 1-row max aggregate rides a broadcast crossJoin — index-metadata
    * scale, not a data-plane collect. */
  final val InsertOffsetUnit = 10000000L

  def nextOrdersSnapshot(orders: DataFrame): DataFrame = {
    val off = broadcast(orders.agg(
      ((expr(s"max(o_orderkey) div $InsertOffsetUnit") + 1L)
        * InsertOffsetUnit).as("__off")))
    val survivors = orders.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    val inserts = orders.filter(col("o_orderkey") % 101 === 0)
      .crossJoin(off)
      .withColumn("o_orderkey", col("o_orderkey") + col("__off"))
      .drop("__off")
    survivors.unionByName(inserts)
  }

  /** Classified delta between two order snapshots, changed rows only. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("o_orderkey").as("k1"),
      col("o_totalprice").as("old_totalprice"))
    val b = v2.select(col("o_orderkey").as("k2"),
      col("o_totalprice").as("new_totalprice"))
    a.join(b, col("k1") === col("k2"), "full_outer")
      .withColumn("change_type",
        when(col("k1").isNull, "insert")
          .when(col("k2").isNull, "delete")
          .when(col("old_totalprice") =!= col("new_totalprice"), "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(coalesce(col("k1"), col("k2")).as("o_orderkey"),
        col("change_type"), col("old_totalprice"), col("new_totalprice"))
  }

  /** q69: the orders delta between the base snapshot and the
    * deterministic next snapshot. */
  val q69SnapshotDiff: QuerySpec = QuerySpec(
    "q69_snapshot_diff",
    s"""WITH off AS (
      |  SELECT (max(o_orderkey) // ${Snapshot.InsertOffsetUnit} + 1)
      |    * ${Snapshot.InsertOffsetUnit} AS v FROM orders),
      |v2 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
      |      ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT v FROM off), o_totalprice
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |d AS (
      |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |    CASE WHEN a.o_orderkey IS NULL THEN 'insert'
      |         WHEN b.o_orderkey IS NULL THEN 'delete'
      |         WHEN a.o_totalprice <> b.o_totalprice THEN 'update'
      |         ELSE 'unchanged' END AS change_type,
      |    a.o_totalprice AS old_totalprice,
      |    b.o_totalprice AS new_totalprice
      |  FROM orders a FULL JOIN v2 b ON a.o_orderkey = b.o_orderkey)
      |SELECT o_orderkey, change_type, old_totalprice, new_totalprice
      |FROM d WHERE change_type <> 'unchanged'
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    snapshotDiff(orders, nextOrdersSnapshot(orders))
      .orderBy("o_orderkey")
  }

  val all: Seq[QuerySpec] = Seq(q69SnapshotDiff)
}

package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.Functions.{moneySum, moneySumSql, round2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators over the TPC-H-ish test tables: aggregation,
  * top-k, joins (broadcast + shuffle), windows, dedup, union-by-name.
  *
  * These generalize the reference's aggregate/sort/dedup surface
  * (SURVEY.md §2.3-§2.6; e.g. top-k retrieval `src/storage.py:231-246`,
  * value counts `src/storage.py:507-513`, key dedup
  * `src/transformation.py:64-73`, multi-source union
  * `src/ingestion.py:256`) and add the join-bearing queries the reference
  * only declared via FK (`src/storage.py:95`).
  *
  * Scale notes (100 TB design):
  *  - dimension joins (nation/region) are explicit `broadcast()`;
  *  - fact-fact joins shuffle on their join key once and aggregate with
  *    partial (map-side) aggregation — no repartition in between;
  *  - top-k is expressed as orderBy+limit so Catalyst plans
  *    TakeOrderedAndProject (no global sort materialization);
  *  - keyed dedup is a window over the key partition (single shuffle),
  *    not a global dropDuplicates row-pick which is non-deterministic.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (generalizes A10/A13 revenue
    * aggregates, `src/storage.py:495-530`). Filter is pushed to the
    * parquet scan; aggregation is hash-agg with map-side partials. */
  val q01PricingSummary: QuerySpec = QuerySpec(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2)      AS sum_qty,
      |  ${moneySumSql("l_extendedprice")} AS sum_base_price,
      |  ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${moneySumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      |  floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
      |  floor(${moneySumSql("l_extendedprice")} / count(l_extendedprice) * 10000 + 0.5) / 10000 AS avg_price,
      |  floor(${moneySumSql("l_discount")} / count(l_discount) * 1000000 + 0.5) / 1000000 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    // money sums via moneySum (exact integer-cents accumulation — see its
    // doc); quantity sums/avgs stay float: integral values sum exactly.
    // moneySum on l_discount relies on TPC-H discounts being exact
    // multiples of 0.01 — finer-grained rates would quantize; a source
    // with 3-dp rates needs a 10^3 variant of the same trick
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        graft.functions.Functions.round4(avg(col("l_quantity"))).as("avg_qty"),
        graft.functions.Functions.round4(
          moneySum(col("l_extendedprice")) / count(col("l_extendedprice")))
          .as("avg_price"),
        graft.functions.Functions.round6(
          moneySum(col("l_discount")) / count(col("l_discount")))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Top-k retrieval: `SELECT * ... ORDER BY ... LIMIT n`
    * (`src/storage.py:231-246`). Catalyst plans TakeOrderedAndProject —
    * per-partition top-k then driver merge; no full sort at 100 TB. */
  val q02TopkOrders: QuerySpec = QuerySpec(
    "q02_topk_orders",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  round(o_totalprice, 2) AS o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderpriority"))
  }

  /** Revenue per customer: customer ⨝ orders ⨝ lineitem, shuffle joins on
    * the fact keys, then hash-agg + top-k. */
  val q03RevenueByCustomer: QuerySpec = QuerySpec(
    "q03_revenue_by_customer",
    s"""SELECT c_custkey, c_name,
      |  ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  count(*) AS n_lines
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Revenue by region: broadcast the small dims (region/nation →
    * customer), shuffle only on the fact join. Exercises the
    * broadcast-hash-join path that matters at 1000 executors. */
  val q04RegionRevenue: QuerySpec = QuerySpec(
    "q04_region_revenue",
    s"""SELECT r_name,
      |  ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  count(*) AS n_lines
      |FROM region
      |JOIN nation   ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY r_name
      |ORDER BY revenue DESC, r_name""".stripMargin) { (s, dir) =>
    val dims = broadcast(
      Tables.region(s, dir)
        .join(Tables.nation(s, dir), col("r_regionkey") === col("n_regionkey")))
    Tables.customer(s, dir)
      .join(dims, col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("r_name")
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("r_name"))
  }

  /** Per-customer running revenue + order sequence — the windowed query
    * SURVEY.md §2.7 plans (reference's only window is the degenerate
    * global record_id, `src/transformation.py:323-325`). One shuffle on
    * the partition key; running sum accumulates in order within the
    * partition, so it scales with the widest customer, not the table. */
  val q05RunningRevenue: QuerySpec = QuerySpec(
    "q05_running_revenue",
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS order_seq,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100 AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, order_seq""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // integer-cents accumulation (Functions.moneySum rationale): the
    // cumulative float sum is frame-ordered in both engines, but exact
    // cents cost nothing and close even the window-internals drift class
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("order_seq"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / 100).as("running_total"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** Top-10 value counts (`value_counts().head(10)`,
    * `src/storage.py:507-513`): group-count + top-k. */
  val q06PriorityCounts: QuerySpec = QuerySpec(
    "q06_priority_counts",
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY n DESC, o_orderpriority
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("o_orderpriority"))
      .limit(10)
  }

  /** Full-row dedup (`drop_duplicates()`, `src/transformation.py:54-62`)
    * on a projection: one shuffle on all grouped columns. */
  val q07DedupFull: QuerySpec = QuerySpec(
    "q07_dedup_full",
    """SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus, l_shipdate""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus", "l_shipdate")
      .dropDuplicates()
      .orderBy("l_returnflag", "l_linestatus", "l_shipdate")
  }

  /** Keyed dedup with deterministic keep-first semantics
    * (`drop_duplicates(subset=['order_id'], keep='first')`,
    * `src/transformation.py:64-73`): row_number over the key partition
    * ordered by the arrival column — NOT dropDuplicates(key), whose row
    * pick is arbitrary and irreproducible across runs/engines
    * (SURVEY.md §7.4). Keeps each customer's earliest order. */
  val q08DedupKeyKeepFirst: QuerySpec = QuerySpec(
    "q08_dedup_key_keepfirst",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(o_totalprice, 2) AS o_totalprice
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** Name-aligned, null-filling union across heterogeneous sources
    * (`pd.concat(ignore_index=True)`, `src/ingestion.py:256,:329,:410` →
    * `unionByName(allowMissingColumns=true)`; plain positional union
    * would be wrong, SURVEY.md §1.2). */
  val q09UnionByName: QuerySpec = QuerySpec(
    "q09_union_by_name",
    """SELECT * FROM (
      |  SELECT c_custkey AS entity_key, c_name AS entity_name,
      |         c_acctbal AS acctbal, c_mktsegment AS segment
      |  FROM customer
      |  UNION ALL BY NAME
      |  SELECT s_suppkey AS entity_key, s_name AS entity_name,
      |         s_acctbal AS acctbal
      |  FROM supplier)
      |ORDER BY entity_name, entity_key""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("entity_key"), col("c_name").as("entity_name"),
      col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey").as("entity_key"), col("s_name").as("entity_name"),
      col("s_acctbal").as("acctbal"))
    c.unionByName(sup, allowMissingColumns = true)
      .orderBy("entity_name", "entity_key")
  }

  /** Grouped top-k: top-3 customers by revenue per nation. rank ≤ k with
    * k > 1 keeps the window form on purpose — Catalyst plans it as
    * WindowGroupLimit (per-partition top-k before the exchange), the right
    * physical shape when k rows per group must survive. */
  val q49GroupedTopk: QuerySpec = QuerySpec(
    "q49_grouped_topk",
    s"""WITH rev AS (
      |  SELECT n_name, c_custkey, c_name,
      |    ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      |  FROM nation
      |  JOIN customer ON n_nationkey = c_nationkey
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY n_name, c_custkey, c_name)
      |SELECT n_name, rnk, c_custkey, c_name, revenue FROM (
      |  SELECT *, row_number() OVER (PARTITION BY n_name
      |    ORDER BY revenue DESC, c_custkey) AS rnk
      |  FROM rev)
      |WHERE rnk <= 3
      |ORDER BY n_name, rnk""".stripMargin) { (s, dir) =>
    val rev = broadcast(Tables.nation(s, dir))
      .join(Tables.customer(s, dir), col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("n_name", "c_custkey", "c_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    val w = Window.partitionBy("n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
    rev.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("n_name", "rnk", "c_custkey", "c_name", "revenue")
      .orderBy("n_name", "rnk")
  }

  /** Multi-granularity totals in one pass: revenue by (region, nation)
    * with ROLLUP — one shuffle computes all three grouping levels, where
    * the naive form is three scans + a union. */
  val q50Rollup: QuerySpec = QuerySpec(
    "q50_rollup",
    s"""SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  ${moneySumSql("o_totalprice")} AS revenue,
      |  count(*) AS n_orders
      |FROM region
      |JOIN nation   ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey
      |JOIN orders   ON c_custkey = o_custkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin) { (s, dir) =>
    val dims = broadcast(
      Tables.region(s, dir)
        .join(Tables.nation(s, dir), col("r_regionkey") === col("n_regionkey")))
    Tables.customer(s, dir)
      .join(dims, col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .select("r_name", "n_name", "o_totalprice")
      // ROLLUP spelled as its grouping sets: Dataset.rollup over a
      // join-derived frame trips Spark 4.1's ambiguous-self-join detection
      // under count() (Expand duplicates the grouping attrs); groupingSets
      // plans the identical Expand+Aggregate without the false positive
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue"), col("n_orders"))
      .orderBy("region", "nation")
  }

  /** Pivot: order counts by status × priority. Pivot values are pinned
    * (not inferred) so the plan is a single pass with no value-discovery
    * job — mandatory at scale. */
  val q51Pivot: QuerySpec = QuerySpec(
    "q51_pivot",
    """SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
      |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
      |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
      |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
      |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val renames = vals.map(v =>
      v -> ("p" + v.head + "_" + v.drop(2).toLowerCase.replace(' ', '_')))
    val pivoted = Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", vals)
      .count()
    renames.foldLeft(pivoted) { case (d, (from, to)) =>
      d.withColumn(to, coalesce(col(s"`$from`"), lit(0L))).drop(from)
    }
      .orderBy("o_orderstatus")
  }

  /** Left semi + anti joins: customers with / without a >$400k order.
    * Semi/anti never materialize the probe side's payload — the build side
    * carries only the join key, and the o_totalprice filter is pushed to
    * the orders scan. */
  val q52SemiAnti: QuerySpec = QuerySpec(
    "q52_semi_anti",
    """SELECT 'with_big_order' AS cohort, count(*) AS n_customers FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |UNION ALL
      |SELECT 'without_big_order', count(*) FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY cohort""".stripMargin) { (s, dir) =>
    val big = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000).select("o_custkey")
    val c = Tables.customer(s, dir)
    val semi = c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_customers"))
      .select(lit("with_big_order").as("cohort"), col("n_customers"))
    val anti = c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_customers"))
      .select(lit("without_big_order").as("cohort"), col("n_customers"))
    semi.unionByName(anti).orderBy("cohort")
  }

  /** CUBE: all four aggregation levels of (order status, priority) in one
    * Expand+Aggregate pass — q50's rollup plus the cross-margins a
    * dashboard wants. Same groupingSets spelling (and for the same
    * ambiguous-self-join reason), same coalesce('ALL') labeling. Scale
    * shape: Expand multiplies rows by the 4 grouping sets BEFORE the
    * map-side combine, so the exchange still carries only group rows. */
  val q129Cube: QuerySpec = QuerySpec(
    "q129_cube",
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  ${moneySumSql("o_totalprice")} AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("revenue"), col("n_orders"))
      .orderBy("status", "priority")
  }

  // ---- entity resolution (blocked fuzzy match to a dictionary) -----------

  final val ResolveProbeMod = 50

  /** Entity resolution — fuzzy-match dirty strings to a canonical
    * dictionary, the record-linkage step upstream of every keyed join on
    * human-entered data: probes (every `ResolveProbeMod`-th part's name
    * with ONE deterministically-dropped character — the typo model) are
    * matched against the distinct-name dictionary by Levenshtein
    * distance, restricted to a BLOCK (same first word, length within
    * ±2) so no all-pairs comparison exists. Best match = min (distance,
    * canon_id) — deterministic; `hit` records whether resolution
    * recovered the original name, so the query doubles as its own
    * accuracy audit.
    *
    * Scale shape: the dictionary is a distinct-name aggregate (master
    * data — small by definition; 64 rows here) and BROADCASTS; probes
    * are scan-local string surgery, the block predicates prune the
    * broadcast probe to a handful of lev() calls per row, and the
    * per-probe argmin is a WindowGroupLimit over ≤block rows. The corpus
    * never shuffles.
    *
    * `broadcastDict = false` is the LARGE-dictionary path: when the
    * canonical dictionary outgrows the broadcast threshold (an entity
    * dictionary harvested from the corpus itself rather than master
    * data), the same block equi-key carries a shuffle join instead —
    * both sides hash-partition on the block word, the length band and
    * lev() still run inside the join, and the per-probe argmin is
    * unchanged. Cost = one shuffle of probes + dictionary on a key with
    * dictionary-bounded fan-in; semantics are identical (RelationalSpec
    * pins the differential). */
  def resolveEntities(parts: DataFrame, probeMod: Int = ResolveProbeMod,
      broadcastDict: Boolean = true): DataFrame = {
    require(probeMod >= 1, s"probeMod must be >= 1, got $probeMod")
    import org.apache.spark.sql.expressions.Window
    val dict = parts.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("canon_id"))
      .select(col("canon_id"), col("p_name").as("dict_name"),
        element_at(split(col("p_name"), " "), 1).as("dict_block"))
    val probes = parts
      .filter(pmod(col("p_partkey"), lit(probeMod)) === 0)
      .selectExpr("p_partkey AS probe_id", "p_name AS true_name",
        // drop one char of the SECOND word at a key-dependent position
        s"""concat(
          |  substring(p_name, 1, length(split(p_name, ' ')[0]) + 1
          |    + pmod(p_partkey, length(split(p_name, ' ')[1]))),
          |  substring(p_name, length(split(p_name, ' ')[0]) + 3
          |    + pmod(p_partkey, length(split(p_name, ' ')[1])))
          |) AS variant""".stripMargin)
      .withColumn("probe_block", element_at(split(col("variant"), " "), 1))
    val dictSide = if (broadcastDict) broadcast(dict) else dict.hint("shuffle_hash")
    val candidates = probes
      .join(dictSide,
        col("probe_block") === col("dict_block") &&
          abs(length(col("variant")) - length(col("dict_name"))) <= 2)
      .withColumn("lev", levenshtein(col("variant"), col("dict_name")))
    val w = Window.partitionBy("probe_id").orderBy(col("lev"), col("canon_id"))
    candidates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .select(col("probe_id"), col("variant"), col("canon_id"),
        col("dict_name").as("matched_name"), col("lev"),
        (col("dict_name") === col("true_name")).as("hit"))
      .orderBy("probe_id")
  }

  /** q130: resolution of typo'd part names against the name dictionary. */
  val q130EntityResolution: QuerySpec = QuerySpec(
    "q130_entity_resolution",
    s"""WITH dict AS (
      |  SELECT min(p_partkey) AS canon_id, p_name AS dict_name,
      |    string_split(p_name, ' ')[1] AS dict_block
      |  FROM part GROUP BY p_name),
      |probes AS (
      |  SELECT p_partkey AS probe_id, p_name AS true_name,
      |    substr(p_name, 1, len(string_split(p_name, ' ')[1]) + 1
      |        + (p_partkey % len(string_split(p_name, ' ')[2])))
      |      || substr(p_name, len(string_split(p_name, ' ')[1]) + 3
      |        + (p_partkey % len(string_split(p_name, ' ')[2]))) AS variant
      |  FROM part WHERE p_partkey % $ResolveProbeMod = 0),
      |cand AS (
      |  SELECT probe_id, true_name, variant, canon_id, dict_name,
      |    levenshtein(variant, dict_name) AS lev
      |  FROM probes JOIN dict
      |    ON string_split(variant, ' ')[1] = dict_block
      |    AND abs(len(variant) - len(dict_name)) <= 2),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY probe_id
      |    ORDER BY lev, canon_id) AS rn FROM cand)
      |SELECT probe_id, variant, canon_id, dict_name AS matched_name,
      |  CAST(lev AS INT) AS lev, (dict_name = true_name) AS hit
      |FROM best WHERE rn <= 1
      |ORDER BY probe_id""".stripMargin) { (s, dir) =>
    resolveEntities(Tables.part(s, dir))
  }

  /** q143: the rank-family window surface in one pass — rank,
    * dense_rank, ntile quartiles, percent_rank, cume_dist per priority
    * group, all over ONE window spec (one hash-partition exchange + one
    * per-group sort serves all five functions; ties broken by the key so
    * both engines see a total order). percent_rank/cume_dist are integer
    * ratios evaluated in IEEE double by both engines — identical
    * bit-for-bit — rounded to 6 dp by the shared floor spelling anyway.
    * The `% 37` probe slice keeps gate output bounded; the plan is the
    * same at any scale (window state = one group's rows, the q57-class
    * cost the scaladoc on groupedPercentilesScalable discusses). */
  val q143RankWindows: QuerySpec = QuerySpec(
    "q143_rank_windows",
    """SELECT o_orderkey, o_orderpriority,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pct_rank,
      |  floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cdist
      |FROM orders WHERE o_orderkey % 37 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.round6
    val o = Tables.orders(s, dir).filter(pmod(col("o_orderkey"), lit(37)) === 0)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_orderkey"), col("o_orderpriority"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round6(percent_rank().over(w)).as("pct_rank"),
        round6(cume_dist().over(w)).as("cdist"))
      .orderBy("o_orderkey")
  }

  /** q144: window FRAME surface — trailing ROWS-frame moving aggregates
    * and the value-position family (first_value, nth_value) over event
    * streams, the per-entity trend shape (3-event moving spend, session
    * anchor value). Everything runs in exact integer CENTS (the q132
    * discipline: floor(value·100 + 0.5) in both engines) so frame sums
    * have no float-order term, and the `frame_n` ramp (1,2,3,3,…) pins
    * the frame boundary semantics themselves. Both window specs share
    * (partition, order), so Spark plans ONE Window operator and ONE
    * exchange for all four expressions (plan-guarded). The `% 23` slice
    * bounds gate output; the plan is identical at any scale. */
  val q144FrameWindows: QuerySpec = QuerySpec(
    "q144_frame_windows",
    """WITH e AS (
      |  SELECT event_id, ts, event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_id % 23 = 0)
      |SELECT event_id, event_type, cents,
      |  CAST(sum(cents) OVER w3 AS BIGINT) AS mov_sum3,
      |  count(*) OVER w3 AS frame_n,
      |  first_value(cents) OVER wrun AS first_cents,
      |  nth_value(cents, 2) OVER wrun AS second_cents
      |FROM e
      |WINDOW
      |  w3 AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |  wrun AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .filter(pmod(col("event_id"), lit(23)) === 0)
      .select(col("event_id"), col("ts"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val ord = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val w3 = ord.rowsBetween(-2, Window.currentRow)
    val wrun = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("event_id"), col("event_type"), col("cents"),
        sum(col("cents")).over(w3).as("mov_sum3"),
        count(lit(1)).over(w3).as("frame_n"),
        first(col("cents")).over(wrun).as("first_cents"),
        nth_value(col("cents"), 2).over(wrun).as("second_cents"))
      .orderBy("event_id")
  }

  val all: Seq[QuerySpec] = Seq(
    q01PricingSummary, q02TopkOrders, q03RevenueByCustomer, q04RegionRevenue,
    q05RunningRevenue, q06PriorityCounts, q07DedupFull, q08DedupKeyKeepFirst,
    q09UnionByName, q49GroupedTopk, q50Rollup, q51Pivot, q52SemiAnti,
    q129Cube, q130EntityResolution, q143RankWindows, q144FrameWindows)
}

package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Distribution-drift audit between two snapshots — the dataset-shift
    * monitor a recurring ingestion pipeline runs before publishing a new
    * snapshot (the reference republishes blindly; here the shift is
    * measured so a pipeline can gate on it).
    *
    * Per (dimension, bin): both snapshots' counts, shares, and an EXACT
    * integer drift numerator `|cnt1*total2 - cnt2*total1|` (the
    * total-variation-distance contribution scaled by `total1*total2`) —
    * kept rational on purpose: KL/PSI's `ln` terms are irrational and
    * their sums order-sensitive across engines, while cross-multiplied
    * counts are exact in any summation order. TVD per dimension =
    * `sum(drift_num) / (2*total1*total2)`.
    *
    * Scale shape: one projection explodes each row into its 3
    * (dimension, bin) pairs, ONE map-side-combined groupBy over ~3N tiny
    * rows, then a bin-level full-outer join (bin cardinality, not row
    * cardinality) against the other snapshot's counts; totals ride a
    * 1-row broadcast. No row-level join between the snapshots.
    * `drift_num` longs: cnt ≤ N per bin and total ≤ N, so the product
    * stays within Long up to N ≈ 3e9 rows per snapshot; beyond that,
    * swap the numerator to DECIMAL(38,0) — documented, not hit at any
    * bench SF. */
  def snapshotDrift(v1: DataFrame, v2: DataFrame): DataFrame = {
    def binned(df: DataFrame): DataFrame = df.select(explode(array(
      struct(lit("orderstatus").as("dimension"),
        col("o_orderstatus").as("bin")),
      struct(lit("orderpriority").as("dimension"),
        col("o_orderpriority").as("bin")),
      struct(lit("price_bucket").as("dimension"),
        floor(col("o_totalprice") / 50000.0).cast("long").cast("string")
          .as("bin")))).as("db"))
      .select(col("db.dimension"), col("db.bin"))
      .groupBy("dimension", "bin").count()
    driftJoin(binned(v1), binned(v2), v1, v2)
  }

  /** The drift-table assembly shared by q93 (orders) and q103 (corpus):
    * bin-level full-outer join of the two snapshots' per-dimension counts,
    * totals riding a 1-row broadcast, exact-integer TVD numerators
    * (`drift_num` = |cnt_v1·total_v2 − cnt_v2·total_v1| — a zero-float
    * cross-multiplied share difference; divide by total_v1·total_v2 for
    * the real-valued delta). */
  private def driftJoin(b1: DataFrame, b2: DataFrame,
      v1: DataFrame, v2: DataFrame): DataFrame =
    driftJoinCounts(b1, b2,
      v1.agg(count(lit(1)).as("total_v1")),
      v2.agg(count(lit(1)).as("total_v2")))

  private def driftJoinCounts(b1: DataFrame, b2: DataFrame,
      t1: DataFrame, t2: DataFrame): DataFrame = {
    val c1 = b1.withColumnRenamed("count", "cnt_v1")
    val c2 = b2.withColumnRenamed("count", "cnt_v2")
    val totals = broadcast(t1.crossJoin(t2))
    import graft.functions.Functions.round6
    c1.join(c2, Seq("dimension", "bin"), "full_outer")
      .na.fill(0L, Seq("cnt_v1", "cnt_v2"))
      .crossJoin(totals)
      .select(col("dimension"), col("bin"), col("cnt_v1"), col("cnt_v2"),
        round6(col("cnt_v1").cast("double") / col("total_v1")).as("share_v1"),
        round6(col("cnt_v2").cast("double") / col("total_v2")).as("share_v2"),
        abs(col("cnt_v1") * col("total_v2") - col("cnt_v2") * col("total_v1"))
          .as("drift_num"))
  }

  /** Shared oracle CTE: the deterministic next snapshot (all columns —
    * q69's copy keeps only the diffed ones). */
  private def v2AllColsCte: String =
    s"""off AS (
      |  SELECT (max(o_orderkey) // ${Snapshot.InsertOffsetUnit} + 1)
      |    * ${Snapshot.InsertOffsetUnit} AS v FROM orders),
      |v2 AS (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
      |      ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT v FROM off), o_orderstatus,
      |    o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 101 = 0)""".stripMargin

  private def binnedSql(rel: String): String =
    s"""SELECT dimension, bin, count(*) AS cnt FROM (
      |    SELECT 'orderstatus' AS dimension, o_orderstatus AS bin FROM $rel
      |    UNION ALL
      |    SELECT 'orderpriority', o_orderpriority FROM $rel
      |    UNION ALL
      |    SELECT 'price_bucket',
      |      CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR)
      |    FROM $rel) GROUP BY 1, 2""".stripMargin

  /** q93: snapshot-to-snapshot distribution drift, exact-integer TVD
    * numerators. */
  val q93SnapshotDrift: QuerySpec = QuerySpec(
    "q93_snapshot_drift", {
      import graft.functions.Functions.round6Sql
      s"""WITH $v2AllColsCte,
        |b1 AS (${binnedSql("orders")}),
        |b2 AS (${binnedSql("v2")}),
        |t AS (SELECT (SELECT count(*) FROM orders) AS total_v1,
        |             (SELECT count(*) FROM v2) AS total_v2)
        |SELECT coalesce(b1.dimension, b2.dimension) AS dimension,
        |  coalesce(b1.bin, b2.bin) AS bin,
        |  coalesce(b1.cnt, 0) AS cnt_v1,
        |  coalesce(b2.cnt, 0) AS cnt_v2,
        |  ${round6Sql("coalesce(b1.cnt, 0) / CAST(total_v1 AS DOUBLE)")} AS share_v1,
        |  ${round6Sql("coalesce(b2.cnt, 0) / CAST(total_v2 AS DOUBLE)")} AS share_v2,
        |  abs(coalesce(b1.cnt, 0) * total_v2
        |    - coalesce(b2.cnt, 0) * total_v1) AS drift_num
        |FROM b1 FULL JOIN b2
        |  ON b1.dimension = b2.dimension AND b1.bin = b2.bin
        |CROSS JOIN t
        |ORDER BY dimension, bin""".stripMargin
    }) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    snapshotDrift(orders, nextOrdersSnapshot(orders))
      .orderBy("dimension", "bin")
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

  // ---- Corpus quality drift (q103) ---------------------------------------

  /** Deterministic "next corpus snapshot" of documents — the crawl-over-
    * crawl evolution a corpus monitor watches: ~8% of docs dropped
    * (doc_id % 13 — a source went dark), ~14% mutated by appended
    * boilerplate (doc_id % 7 gains " the a the a" — shifts length, TTR
    * and stopword density, i.e. the QUALITY distribution, not just
    * counts), ~9% re-crawled duplicates inserted past the id range
    * (doc_id % 11 = 3, offset derived from the scanned max id exactly as
    * [[nextOrdersSnapshot]] so clone ids can never collide at any SF). */
  def nextDocsSnapshot(docs: DataFrame): DataFrame = {
    val off = broadcast(docs.agg(
      ((expr(s"max(doc_id) div $InsertOffsetUnit") + 1L)
        * InsertOffsetUnit).as("__off")))
    val survivors = docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" the a the a")))
          .otherwise(col("text")))
    val inserts = docs.filter(col("doc_id") % 11 === 3)
      .crossJoin(off)
      .withColumn("doc_id", col("doc_id") + col("__off"))
      .drop("__off")
    survivors.unionByName(inserts).select("doc_id", "text", "lang", "source")
  }

  /** Corpus-to-corpus distribution drift over the dimensions a training-
    * data pipeline actually monitors between crawls: the QUALITY-SCORE
    * decile (the blend shared with q23/q63/q88 —
    * [[TextAnalysis.qualityScore]]), language and source composition.
    * Same exact-integer TVD output contract as [[snapshotDrift]].
    *
    * Scale shape: each snapshot is one scan → scan-local quality
    * arithmetic → a 3-way explode to (dimension, bin) pairs → ONE
    * map-side-combined groupBy of tiny rows; the snapshots then meet only
    * at bin cardinality (≤ 10 deciles + langs + sources) in a full-outer
    * join — no row-level join between corpora, totals on a 1-row
    * broadcast. */
  /** The corpus's (dimension, bin) counts — quality decile, lang, source
    * — as one scan-local projection + one map-side-combined aggregate.
    * STREAMING-CAPABLE by construction: every expression is per-row, and
    * the aggregation state is bin cardinality (≤ 10 deciles + langs +
    * sources), so a continuous monitor can maintain these counts in
    * complete output mode with BOUNDED state — the property that makes
    * drift a streaming metric rather than a batch job
    * (StreamingSpec pins stream ≡ batch). */
  def corpusBins(df: DataFrame): DataFrame = {
    val (lenS, ttr, stop) = TextAnalysis.qualityParts(col("text"))
    val q = TextAnalysis.qualityScore(lenS, ttr, stop)
    df.select(col("lang"), col("source"),
        least(lit(9L), floor(q * 10)).cast("string").as("decile"))
      .select(explode(array(
        struct(lit("quality_decile").as("dimension"), col("decile").as("bin")),
        struct(lit("lang").as("dimension"), col("lang").as("bin")),
        struct(lit("source").as("dimension"), col("source").as("bin")))).as("db"))
      .select(col("db.dimension"), col("db.bin"))
      .groupBy("dimension", "bin").count()
  }

  def corpusScoreDrift(v1: DataFrame, v2: DataFrame): DataFrame =
    driftJoin(corpusBins(v1), corpusBins(v2), v1, v2)

  /** Drift from PRE-AGGREGATED bin counts — the monitor form: a frozen
    * reference release keeps only its bins table (metadata scale), the
    * live side maintains [[corpusBins]] incrementally, and the drift
    * table derives entirely from the two count sets. Totals are
    * recovered from the 'lang' dimension (every doc contributes exactly
    * one lang bin), so no row-level frame is ever needed —
    * `driftFromBins(corpusBins(a), corpusBins(b)) ≡ corpusScoreDrift(a,
    * b)` by construction (pinned in ExtSpec). */
  def driftFromBins(b1: DataFrame, b2: DataFrame): DataFrame = {
    def total(b: DataFrame, as: String) =
      b.filter(col("dimension") === "lang")
        .agg(sum(col("count")).as(as))
    driftJoinCounts(b1, b2, total(b1, "total_v1"), total(b2, "total_v2"))
  }

  private def corpusBinnedSql(rel: String): String =
    s"""SELECT dimension, bin, count(*) AS cnt FROM (
      |    SELECT 'quality_decile' AS dimension,
      |      CAST(least(9, CAST(floor((${TextAnalysis.QualityBlendSql}) * 10) AS BIGINT)) AS VARCHAR) AS bin
      |    FROM (${TextAnalysis.qualityPartsSql(", lang, source", rel)})
      |    UNION ALL
      |    SELECT 'lang', lang FROM $rel
      |    UNION ALL
      |    SELECT 'source', source FROM $rel) GROUP BY 1, 2""".stripMargin

  /** q103: crawl-over-crawl corpus drift — quality deciles, language and
    * source shares, exact-integer TVD numerators; the decile boundary is
    * deterministic cross-engine because both engines evaluate the SAME
    * IEEE blend arithmetic (the q23/q63/q88-proven fragments). */
  val q103CorpusDrift: QuerySpec = QuerySpec(
    "q103_corpus_drift", {
      import graft.functions.Functions.round6Sql
      s"""WITH off AS (
        |  SELECT (max(doc_id) // $InsertOffsetUnit + 1)
        |    * $InsertOffsetUnit AS v FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' the a the a' ELSE text END AS text,
        |    lang, source
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + (SELECT v FROM off), text, lang, source
        |  FROM documents WHERE doc_id % 11 = 3),
        |b1 AS (${corpusBinnedSql("documents")}),
        |b2 AS (${corpusBinnedSql("v2")}),
        |t AS (SELECT (SELECT count(*) FROM documents) AS total_v1,
        |             (SELECT count(*) FROM v2) AS total_v2)
        |SELECT coalesce(b1.dimension, b2.dimension) AS dimension,
        |  coalesce(b1.bin, b2.bin) AS bin,
        |  coalesce(b1.cnt, 0) AS cnt_v1,
        |  coalesce(b2.cnt, 0) AS cnt_v2,
        |  ${round6Sql("coalesce(b1.cnt, 0) / CAST(total_v1 AS DOUBLE)")} AS share_v1,
        |  ${round6Sql("coalesce(b2.cnt, 0) / CAST(total_v2 AS DOUBLE)")} AS share_v2,
        |  abs(coalesce(b1.cnt, 0) * total_v2
        |    - coalesce(b2.cnt, 0) * total_v1) AS drift_num
        |FROM b1 FULL JOIN b2
        |  ON b1.dimension = b2.dimension AND b1.bin = b2.bin
        |CROSS JOIN t
        |ORDER BY dimension, bin""".stripMargin
    }) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    corpusScoreDrift(docs, nextDocsSnapshot(docs))
      .orderBy("dimension", "bin")
  }

  // ---- Embedding-space drift (q111) --------------------------------------

  /** Deterministic "next embeddings snapshot": ~8% of vectors dropped
    * (vec_id % 13 — their source docs left the corpus), ~14% re-embedded
    * with a shifted encoder (vec_id % 7 gains +0.25 per dimension — 0.25
    * is a power of two, exact in IEEE at any width), ~9% re-crawled
    * duplicates appended past the id range (vec_id % 11 = 3, derived
    * offset). ALL v2 arithmetic runs in DOUBLE after an exact
    * float→double widening, so both engines see bit-identical inputs. */
  def nextEmbeddingsSnapshot(emb: DataFrame): DataFrame = {
    val off = broadcast(emb.agg(
      ((expr(s"max(vec_id) div $InsertOffsetUnit") + 1L)
        * InsertOffsetUnit).as("__off")))
    val widened = transform(col("embedding"), x => x.cast("double"))
    val survivors = emb.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"), col("label"),
        when(col("vec_id") % 7 === 0,
          transform(col("embedding"), x => x.cast("double") + 0.25))
          .otherwise(widened).as("e"))
    val inserts = emb.filter(col("vec_id") % 11 === 3)
      .crossJoin(off)
      .select((col("vec_id") + col("__off")).as("vec_id"), col("label"),
        widened.as("e"))
    survivors.unionByName(inserts)
  }

  /** Embedding-space drift between two corpus snapshots, per label: the
    * encoder-regression monitor — a re-embedding run or a crawl shift
    * moves class centroids, and every ANN index / semantic-decon
    * threshold downstream was tuned on the OLD geometry. Centroids are
    * the q32-proven round-4 per-dimension averages; the drift metrics
    * (centroid cosine, L2 shift) are computed FROM the rounded centroids
    * with order-fixed array arithmetic, so no unordered float sum ever
    * crosses the oracle boundary.
    *
    * Scale shape: one posexplode + (label × dim)-cardinality aggregate
    * per snapshot — the q32 plan twice — then a label-cardinality join;
    * the snapshots never meet row-level. */
  def embeddingDrift(v1: DataFrame, v2: DataFrame): DataFrame = {
    import graft.functions.Functions.{round4, round6}
    def cents(df: DataFrame, e: Column): DataFrame = df
      .select(col("label"), posexplode(e).as(Seq("dim_idx", "v")))
      .groupBy("label", "dim_idx")
      .agg(round(avg(col("v").cast("double")), 4).as("cv"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("dim_idx"), col("cv")))),
        s => s.getField("cv")).as("c"))
    val c1 = cents(v1, col("embedding")).withColumnRenamed("c", "c1")
    val c2 = cents(v2, col("e")).withColumnRenamed("c", "c2")
    val n1 = v1.groupBy("label").agg(count(lit(1)).as("n_v1"))
    val n2 = v2.groupBy("label").agg(count(lit(1)).as("n_v2"))
    val d11 = Similarity.dot(col("c1"), col("c1"))
    val d22 = Similarity.dot(col("c2"), col("c2"))
    val d12 = Similarity.dot(col("c1"), col("c2"))
    c1.join(c2, Seq("label")).join(n1, Seq("label")).join(n2, Seq("label"))
      .select(col("label"), col("n_v1"), col("n_v2"),
        round6(d12 / (sqrt(d11) * sqrt(d22))).as("centroid_cos"),
        round4(sqrt(greatest(lit(0.0), d11 - lit(2.0) * d12 + d22)))
          .as("l2_shift"))
  }

  /** q111: per-label embedding drift between the base snapshot and the
    * deterministic next one. */
  val q111EmbeddingDrift: QuerySpec = QuerySpec(
    "q111_embedding_drift", {
      import graft.functions.Functions.{round4Sql, round6Sql}
      def centsSql(rel: String, out: String) =
        s"""$out AS (
          |  SELECT label, list(cv ORDER BY i) AS c FROM (
          |    SELECT label, i, round(avg(v), 4) AS cv FROM (
          |      SELECT label, unnest(generate_series(1, len(e))) AS i,
          |        unnest(e) AS v FROM $rel)
          |    GROUP BY label, i)
          |  GROUP BY label)""".stripMargin
      s"""WITH off AS (
        |  SELECT (max(vec_id) // $InsertOffsetUnit + 1)
        |    * $InsertOffsetUnit AS v FROM embeddings),
        |e1 AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |e2 AS (
        |  SELECT vec_id, label,
        |    CASE WHEN vec_id % 7 = 0
        |      THEN list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.25)
        |      ELSE CAST(embedding AS DOUBLE[]) END AS e
        |  FROM embeddings WHERE vec_id % 13 <> 0
        |  UNION ALL
        |  SELECT vec_id + (SELECT v FROM off), label,
        |    CAST(embedding AS DOUBLE[])
        |  FROM embeddings WHERE vec_id % 11 = 3),
        |${centsSql("e1", "c1")},
        |${centsSql("e2", "c2")},
        |n1 AS (SELECT label, count(*) AS n_v1 FROM e1 GROUP BY label),
        |n2 AS (SELECT label, count(*) AS n_v2 FROM e2 GROUP BY label)
        |SELECT c1.label AS label, n_v1, n_v2,
        |  ${round6Sql("list_dot_product(c1.c, c2.c) / " +
             "(sqrt(list_dot_product(c1.c, c1.c)) * sqrt(list_dot_product(c2.c, c2.c)))")}
        |    AS centroid_cos,
        |  ${round4Sql("sqrt(greatest(0.0, list_dot_product(c1.c, c1.c) " +
             "- 2.0 * list_dot_product(c1.c, c2.c) + list_dot_product(c2.c, c2.c)))")}
        |    AS l2_shift
        |FROM c1 JOIN c2 ON c1.label = c2.label
        |JOIN n1 ON n1.label = c1.label
        |JOIN n2 ON n2.label = c1.label
        |ORDER BY label""".stripMargin
    }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    embeddingDrift(emb, nextEmbeddingsSnapshot(emb)).orderBy("label")
  }

  val all: Seq[QuerySpec] =
    Seq(q69SnapshotDiff, q93SnapshotDrift, q103CorpusDrift, q111EmbeddingDrift)
}

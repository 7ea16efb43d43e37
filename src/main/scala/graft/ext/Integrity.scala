package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-table corpus integrity audit — the manifest consistency check a
  * multimodal training pipeline runs before every build: documents and
  * their embedding rows are produced by DIFFERENT jobs (text ingest vs.
  * the embedding batch), so drift between the two tables (docs the
  * embedder never processed, orphan vectors for deleted docs, a
  * dimension change mid-corpus) is an operational fact of life, and a
  * mixture/dedup/ANN stage that silently inner-joins the two tables
  * hides exactly the rows that are broken.
  *
  * One row per document source (coverage of that source's docs by
  * embeddings, with dim bounds over the matched vectors) plus one
  * `(embeddings)` row auditing the reverse direction (orphan vectors
  * with no backing doc). All counts are exact integers; dim bounds are
  * min/max (order-independent), so the whole audit is oracle-pinned.
  *
  * Scale shape: ONE outer equi-join on the id (both sides shuffle on
  * the key — at 100 TB neither side is broadcastable and a co-located
  * bucket layout on doc_id is the amortization, `Store.bucketedLayout`'s
  * pattern), followed by a low-cardinality hash aggregate on source;
  * the reverse direction is an anti-join aggregated to ONE row.
  * Payload columns never travel: the join carries (id, source) against
  * (id, dim) — the embedding arrays reduce to `size()` at the scan. */
object Integrity {

  def corpusIntegrity(docs: DataFrame, emb: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"))
    val e = emb.select(col("vec_id"), size(col("embedding")).as("dim"))
    val docSide = d.join(e, d("doc_id") === e("vec_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        count(col("vec_id")).as("n_matched"),
        (count(lit(1)) - count(col("vec_id"))).as("n_unmatched"),
        min(col("dim")).as("dim_min"),
        max(col("dim")).as("dim_max"))
      .select(lit("documents").as("entity"), col("source"), col("n_total"),
        col("n_matched"), col("n_unmatched"), col("dim_min"), col("dim_max"))
    val orphans = e.join(d, e("vec_id") === d("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_total"),
        count(col("doc_id")).as("n_matched"),
        (count(lit(1)) - count(col("doc_id"))).as("n_unmatched"),
        min(col("dim")).as("dim_min"),
        max(col("dim")).as("dim_max"))
      .select(lit("embeddings").as("entity"), lit("(all)").as("source"),
        col("n_total"), col("n_matched"), col("n_unmatched"),
        col("dim_min"), col("dim_max"))
    docSide.unionByName(orphans).orderBy("entity", "source")
  }

  /** q100: the integrity audit over the gate tables. */
  val q100CorpusIntegrity: QuerySpec = QuerySpec(
    "q100_corpus_integrity",
    """WITH e AS (
      |  SELECT vec_id, CAST(len(embedding) AS INT) AS dim FROM embeddings),
      |doc_side AS (
      |  SELECT 'documents' AS entity, d.source AS source,
      |    CAST(count(*) AS BIGINT) AS n_total,
      |    CAST(count(e.vec_id) AS BIGINT) AS n_matched,
      |    CAST(count(*) - count(e.vec_id) AS BIGINT) AS n_unmatched,
      |    min(e.dim) AS dim_min, max(e.dim) AS dim_max
      |  FROM documents d LEFT JOIN e ON d.doc_id = e.vec_id
      |  GROUP BY d.source),
      |emb_side AS (
      |  SELECT 'embeddings' AS entity, '(all)' AS source,
      |    CAST(count(*) AS BIGINT) AS n_total,
      |    CAST(count(d.doc_id) AS BIGINT) AS n_matched,
      |    CAST(count(*) - count(d.doc_id) AS BIGINT) AS n_unmatched,
      |    min(e.dim) AS dim_min, max(e.dim) AS dim_max
      |  FROM e LEFT JOIN documents d ON e.vec_id = d.doc_id)
      |SELECT entity, source, n_total, n_matched, n_unmatched, dim_min, dim_max
      |FROM (SELECT * FROM doc_side UNION ALL SELECT * FROM emb_side)
      |ORDER BY entity, source""".stripMargin) { (s, dir) =>
    corpusIntegrity(Tables.documents(s, dir), Tables.embeddings(s, dir))
  }

  /** Defense-in-depth contamination card — the union view of the three
    * registered decontamination detectors, per training doc: lexical
    * 4-gram overlap (q65), winnow-density fingerprints (q83), and
    * embedding-space proximity (q98, joined on the doc↔vec id bridge
    * q100 audits). Production decontamination runs EXACTLY this way —
    * multiple detectors with different blind spots (verbatim copies,
    * misaligned substrings, paraphrases), a doc dropped if ANY flags it —
    * and the per-detector flags are what make the drop auditable. Each
    * detector keeps its own registered eval definition, so the card's
    * columns agree row-for-row with q65/q83/q98 (pinned in ExtSpec).
    *
    * Scale shape: nothing new — the three detectors keep their own
    * audited plans (broadcast eval gram/fingerprint sets, IVF-cell-scoped
    * probes), and the card adds three id-only left joins from the doc
    * list. Detectors that cannot see a doc (too short to fingerprint,
    * doc is the semantic eval side) report false, never null — the card
    * is a complete verdict over the whole training slice. */
  def contaminationCard(docs: DataFrame, emb: DataFrame): DataFrame = {
    val ng = Dedup.evalContamination(docs, evalMod = 50, n = 4)
      .select(col("doc_id"), col("contaminated").as("ng"))
    val wn = Dedup.winnowDecontaminate(docs, evalMod = 50)
      .select(col("doc_id"), col("contaminated").as("wn"))
    val sem = Similarity.semanticDecontaminate(
        emb.filter(col("label") =!= 0), emb.filter(col("label") === 0), 0.4)
      .filter(col("dropped"))
      .select(col("vec_id").as("doc_id"), lit(true).as("sm"))
    val flags = docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
      .join(ng, Seq("doc_id"), "left")
      .join(wn, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ng"), lit(false)).as("ngram_hit"),
        coalesce(col("wn"), lit(false)).as("winnow_hit"),
        coalesce(col("sm"), lit(false)).as("semantic_hit"))
    flags.select(col("doc_id"), col("ngram_hit"), col("winnow_hit"),
      col("semantic_hit"),
      (col("ngram_hit").cast("long") + col("winnow_hit").cast("long") +
        col("semantic_hit").cast("long")).as("n_detectors"),
      (col("ngram_hit") || col("winnow_hit") || col("semantic_hit"))
        .as("flagged"))
  }

  /** q102: the contamination card over the gate tables. Oracle composes
    * the three detectors' shared CTE fragments (q65's gram set, q82/q83's
    * winnow selection, q98's Lloyd-chain hits) — one source of truth with
    * the individual oracles. */
  val q102ContaminationCard: QuerySpec = QuerySpec(
    "q102_contamination_card",
    "WITH " + Dedup.winnowSelSqlCtes + ",\n" +
      Dedup.ngramDeconSqlCtes + ",\n" +
      Similarity.semanticDeconSqlCtes + s""",
      |ng_hit AS (
      |  SELECT ngg.doc_id AS doc_id,
      |    max(CASE WHEN ngev.gram IS NOT NULL THEN 1 ELSE 0 END) AS hit
      |  FROM ngg LEFT JOIN ngev ON ngg.gram = ngev.gram
      |  WHERE ngg.doc_id % 50 <> 0 GROUP BY ngg.doc_id),
      |w_ev AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 50 = 0),
      |w_hit AS (
      |  SELECT c.doc_id AS doc_id,
      |    max(CASE WHEN w_ev.fp IS NOT NULL THEN 1 ELSE 0 END) AS hit
      |  FROM sel c LEFT JOIN w_ev ON c.fp = w_ev.fp
      |  WHERE c.doc_id % 50 <> 0 GROUP BY c.doc_id),
      |base AS (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0)
      |SELECT b.doc_id AS doc_id,
      |  coalesce(ng.hit, 0) = 1 AS ngram_hit,
      |  coalesce(w.hit, 0) = 1 AS winnow_hit,
      |  (h.cand_id IS NOT NULL) AS semantic_hit,
      |  CAST(coalesce(ng.hit, 0) + coalesce(w.hit, 0)
      |    + (CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_detectors,
      |  (coalesce(ng.hit, 0) + coalesce(w.hit, 0)
      |    + (CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END)) > 0 AS flagged
      |FROM base b
      |LEFT JOIN ng_hit ng ON ng.doc_id = b.doc_id
      |LEFT JOIN w_hit w ON w.doc_id = b.doc_id
      |LEFT JOIN hits h ON h.cand_id = b.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    contaminationCard(Tables.documents(s, dir), Tables.embeddings(s, dir))
      .orderBy("doc_id")
  }

  /** Defense-in-depth DUPLICATION card — the q102 pattern applied to the
    * dedup family: per training doc, the verdict of each registered
    * duplicate detector — raw-byte identity (q26's md5 groups),
    * normalization-aware identity (q81's canonical fingerprint), and
    * MinHash-banded near-duplication (q28's candidates contracted to
    * components by q79's star rounds, the q86 construction). The three
    * have strictly widening reach and DIFFERENT keep-first keepers; the
    * card makes the union policy ("drop if any detector demotes the
    * doc") auditable per row instead of buried in a pipeline's plumbing.
    *
    * Scale shape: two 16-byte-digest shuffles (raw + normalized groups
    * joined back on their digest), the q28/q79 banded pair + contraction
    * chain, and three id-only joins from the doc list — every piece the
    * plan its own query ships. */
  def dedupCard(docs: DataFrame): DataFrame =
    dedupCardFrom(docs, Dedup.minhashCandidates(docs, 0.5))

  /** [[dedupCard]] from an existing (cached) MinHash pair frame. */
  def dedupCardFrom(docs: DataFrame, mhPairs: DataFrame): DataFrame = {
    // group stats as WINDOWS over the digest frame instead of two
    // groupBy-then-join-back passes: the r12 form evaluated the md5 +
    // normalization digests once per consumer (both group builds, the
    // probe side, and the final sort's sampling pass — 3x each); the
    // window form computes them ONCE below the fp exchange, and the two
    // digest-keyed shuffles carry only (doc_id, fp, nfp). This is also
    // the 100 TB shape: the per-digest group frames are corpus-sized, so
    // the join-back could never broadcast at scale (guide §2.4/§3).
    // min/count over the full partition are value-identical to the
    // grouped aggregates.
    import org.apache.spark.sql.expressions.Window
    val wFp = Window.partitionBy("fp")
    val wNfp = Window.partitionBy("nfp")
    val near = Dedup.clustersFromPairsStar(mhPairs)
      .withColumnRenamed("cluster_rep", "near_rep")
    // NULL-text rows are excluded up front: the pre-window (r12) form's
    // inner joins on fp/nfp dropped them implicitly (md5(NULL) joins
    // nothing), while Window.partitionBy groups nulls together — the
    // filter keeps the two spellings row-identical on any corpus
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        md5(Dedup.normalizeForDedup(col("text"))).as("nfp"))
      .withColumn("exact_keeper", min(col("doc_id")).over(wFp))
      .withColumn("c1", count(lit(1)).over(wFp))
      .withColumn("norm_keeper", min(col("doc_id")).over(wNfp))
      .withColumn("c2", count(lit(1)).over(wNfp))
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("c1") > 1).as("in_exact_group"), col("exact_keeper"),
        (col("c2") > 1).as("in_norm_group"), col("norm_keeper"),
        col("near_rep"),
        (col("doc_id") =!= col("exact_keeper")
          || col("doc_id") =!= col("norm_keeper")
          || (col("near_rep").isNotNull
            && col("doc_id") =!= col("near_rep"))).as("drop_candidate"))
  }

  /** q114: the duplication card over the corpus with q26's injected
    * exact copies and q81's reformatted copies, so all three detectors
    * have work. Oracle: digest groups in SQL, the q28 chain + q60's
    * recursive components for the near side. */
  val q114DedupCard: QuerySpec = QuerySpec(
    "q114_dedup_card", {
      val corpusSql =
        """corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id + 300000000,
          |    upper(text) || '  !!' AS text
          |  FROM documents WHERE doc_id % 11 = 3)""".stripMargin
      s"""WITH RECURSIVE $corpusSql,
        |${Dedup.minhashPairsSqlCtesFrom("corpus", math.ceil(0.5 * Dedup.MinhashK).toInt)},
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS near_rep
        |  FROM reach GROUP BY src),
        |b AS (
        |  SELECT doc_id, md5(text) AS fp,
        |    md5(${Dedup.normalizeForDedupSql("text")}) AS nfp
        |  FROM corpus),
        |g1 AS (SELECT fp, min(doc_id) AS exact_keeper, count(*) AS c1
        |       FROM b GROUP BY fp),
        |g2 AS (SELECT nfp, min(doc_id) AS norm_keeper, count(*) AS c2
        |       FROM b GROUP BY nfp)
        |SELECT b.doc_id AS doc_id,
        |  (g1.c1 > 1) AS in_exact_group, g1.exact_keeper AS exact_keeper,
        |  (g2.c2 > 1) AS in_norm_group, g2.norm_keeper AS norm_keeper,
        |  l.near_rep AS near_rep,
        |  (b.doc_id <> g1.exact_keeper OR b.doc_id <> g2.norm_keeper
        |    OR (l.near_rep IS NOT NULL AND b.doc_id <> l.near_rep))
        |    AS drop_candidate
        |FROM b JOIN g1 USING (fp) JOIN g2 USING (nfp)
        |LEFT JOIN labels l ON l.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    val corpus =
      Dedup.corpusI711u(Tables.documents(s, dir).select("doc_id", "text"))
    dedupCardFrom(corpus,
      Dedup.minhashCandidatesCachedOn(s, dir, "i711u_1e8", () => corpus, 0.5))
      .orderBy("doc_id")
  }

  val all: Seq[QuerySpec] =
    Seq(q100CorpusIntegrity, q102ContaminationCard, q114DedupCard)
}

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

  val all: Seq[QuerySpec] = Seq(q100CorpusIntegrity)
}

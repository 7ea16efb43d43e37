package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[QuerySpec]] in one of the query
  * modules under `graft.queries`; this object is just the aggregation point
  * the driver reads.
  */
object SparkEntry {

  private def specs: Seq[QuerySpec] =
    queries_registry

  // Single source of truth for the registered capability surface.
  private lazy val queries_registry: Seq[QuerySpec] =
    graft.queries.Relational.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.Profiling.all ++
      graft.ext.TextAnalysis.all ++
      graft.ext.Dedup.all ++
      graft.ext.Similarity.all ++
      graft.ext.Sampling.all ++
      graft.ext.Packing.all ++
      graft.ext.Redaction.all ++
      graft.ext.Snapshot.all ++
      graft.ext.CorpusBuild.all ++
      graft.ext.LmScore.all ++
      graft.ext.Selection.all ++
      graft.pipeline.Ingest.all ++
      graft.ext.Multimodal.all ++
      graft.ext.Integrity.all ++
      graft.ext.Rollup.all ++
      graft.queries.Advanced.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline: adapter → clean → enrich → standardize. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_full_transform")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage stage (ref `src/storage.py`): keyed upsert into the orders
  * table, run-telemetry and quality-metric sinks, file exports, retrieval,
  * and database stats.
  *
  * The reference's SQLite `INSERT OR REPLACE` with per-row loops
  * (`storage.py:167-203`) becomes: union existing ∪ incoming → keep-latest
  * per key (one hash aggregate with map-side combine) → atomic directory
  * swap. At real scale the
  * same call-sites swap to Delta/Iceberg `MERGE INTO` — the upsert
  * *semantic* (latest-wins by ingest time, unique `order_id`) is what this
  * module pins down. No per-row driver loops anywhere.
  */
object Store {

  /** Latest-wins keyed upsert into a parquet table directory (S7).
    * `orderCol` decides recency (ties → incoming wins via priority). */
  def upsertOrders(spark: SparkSession, incoming: DataFrame, tablePath: String,
      key: String = "order_id", orderCol: String = "ingested_at"): Long = {
    // keep-latest = max(struct(orderCol, __gen, rest…)) per key: struct
    // ordering is field-by-field with nulls smallest, so max ≡ a window's
    // (orderCol DESC NULLS LAST, __gen DESC) pick — but with a map-side
    // partial combine instead of a full sort of every version. Applied on
    // FIRST write too: an incoming batch can itself carry duplicate keys,
    // and the unique-key invariant must hold from the first version.
    def keepLatest(df: DataFrame): DataFrame = {
      val outCols = df.columns.filterNot(_ == "__gen")
      val ordCols =
        (if (df.columns.contains(orderCol)) Seq(orderCol) else Nil) ++
          (if (df.columns.contains("__gen")) Seq("__gen") else Nil)
      val rest = outCols.filterNot(c => c == key || ordCols.contains(c))
      val packedCols = ordCols ++ rest
      if (packedCols.isEmpty) df.dropDuplicates(key)
      else {
        val packed = struct(packedCols.map(col): _*)
        df.groupBy(col(key)).agg(max(packed).as("__row"))
          .select(outCols.map(c =>
            if (c == key) col(c) else col(s"__row.$c").as(c)): _*)
      }
    }
    val merged = readTable(spark, tablePath) match {
      case Some(cur) =>
        keepLatest(cur.withColumn("__gen", lit(0))
          .unionByName(incoming.withColumn("__gen", lit(1)),
            allowMissingColumns = true))
      case None => keepLatest(incoming)
    }
    // staging write, then swap via backup: the old table is moved aside,
    // not deleted, before the new one is published — a crash between the
    // renames leaves a recoverable __backup instead of no table at all
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(tablePath + "__staging")
    val backup = new org.apache.hadoop.fs.Path(tablePath + "__backup")
    val target = new org.apache.hadoop.fs.Path(tablePath)
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(backup, true)
    if (fs.exists(target) && !fs.rename(target, backup))
      sys.error(s"upsert swap: could not move $target aside")
    if (!fs.rename(staging, target)) {
      if (fs.exists(backup)) fs.rename(backup, target)
      sys.error(s"upsert swap: could not publish $staging over $target")
    }
    fs.delete(backup, true)
    spark.read.parquet(tablePath).count()
  }

  /** Read the published table; if the target directory is absent but a
    * `__backup` exists, a crash interrupted [[upsertOrders]]' swap between
    * its two renames (old moved aside, new not yet published) — recover by
    * re-publishing the backup so readers and the next upsert see the last
    * committed version instead of a missing table. */
  private def readTable(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val backup = new org.apache.hadoop.fs.Path(path + "__backup")
    if (!fs.exists(target) && fs.exists(backup)) fs.rename(backup, target)
    if (fs.exists(target)) Some(spark.read.parquet(path))
    else None
  }

  /** Run-telemetry sink (S9; `pipeline_runs` DDL `storage.py:70-82`). */
  def appendPipelineRun(spark: SparkSession, path: String, runId: String,
      pipelineName: String, startTime: String, endTime: String, status: String,
      recordsProcessed: Long, recordsFailed: Long,
      errorMessage: Option[String]): Unit = {
    import spark.implicits._
    Seq((runId, pipelineName, startTime, endTime, status, recordsProcessed,
      recordsFailed, errorMessage.orNull))
      .toDF("run_id", "pipeline_name", "start_time", "end_time", "status",
        "records_processed", "records_failed", "error_message")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Long-format quality-metrics sink (S10; DDL `storage.py:85-97`). */
  def appendQualityMetrics(spark: SparkSession, path: String, runId: String,
      metrics: Seq[(String, Double)], metricType: String, sourceTable: String,
      measuredAt: String): Unit = {
    import spark.implicits._
    metrics.map { case (name, value) =>
      (runId, name, value, metricType, sourceTable, measuredAt)
    }.toDF("run_id", "metric_name", "metric_value", "metric_type",
      "source_table", "measured_at")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** A15: average of a named metric over time (`storage.py:358-360`). */
  def avgMetric(spark: SparkSession, metricsPath: String, metricName: String): Option[Double] = {
    readTable(spark, metricsPath).flatMap { df =>
      val r = df.filter(col("metric_name") === metricName)
        .agg(avg(col("metric_value")).as("v")).collect().head
      Option(r.getAs[java.lang.Double]("v")).map(_.doubleValue())
    }
  }

  /** Partitioned parquet write: the scale-path layout (partition pruning
    * replaces the reference's SQLite B-tree indexes, SURVEY.md §4.1).
    * A filter on a partition column shows up as PartitionFilters in the
    * scan and skips directories entirely. */
  def exportPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table write: the co-located-join layout. Two tables
    * bucketed by the same key into the same bucket count join WITHOUT a
    * shuffle exchange on either side — at 100 TB, pre-bucketing the orders
    * table by `order_id` turns every upsert/merge/retrieval join into a
    * local zipper (replaces the reference's SQLite B-tree index role for
    * joins, as partition pruning does for point lookups). `sortCols`
    * additionally persists per-bucket sort order so sort-merge joins skip
    * their sort. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** File exports S11-S13 (`storage.py:392-442`). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  def exportJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
  def exportParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S8 retrieval: `SELECT * ORDER BY col DESC LIMIT n` — planned by
    * Catalyst as TakeOrderedAndProject (per-partition top-k). */
  def getOrders(spark: SparkSession, tablePath: String, limit: Int,
      orderBy: String = "ingested_at"): DataFrame =
    spark.read.parquet(tablePath).orderBy(col(orderBy).desc).limit(limit)

  /** S14 stats probe over a stored orders table. */
  def tableStats(spark: SparkSession, tablePath: String): DataFrame = {
    val df = spark.read.parquet(tablePath)
    df.agg(
      count(lit(1)).as("row_count"),
      countDistinct(col("order_id")).as("distinct_orders"),
      max(col("ingested_at")).as("latest_ingest"))
  }
}

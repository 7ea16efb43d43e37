package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * only through these helpers so that scans stay uniform (plain parquet reads
  * → full Catalyst pushdown/pruning; see SURVEY.md §4.2).
  */
object Tables {
  final val Names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` arrives in whichever physical form the driver generated:
    * parquet TIMESTAMP(NANOS) — which Spark reads only as a raw long
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set in every session
    * builder here) and we truncate to micros, the same ns→µs truncation
    * DuckDB applies — or naive TIMESTAMP(MICROS), which Spark 4 infers as
    * TIMESTAMP_NTZ and both engines read identically as-is. Either way the
    * two engines see the same wall-clock values. (Streaming consumers that
    * need a watermark get the NTZ→LTZ mapping at the stream source —
    * `Streaming.parquetFileSource` — not here, so batch/oracle outputs keep
    * the table's native type.) */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standardization stage (ref `DataStandardizer.standardize_data`,
  * `src/transformation.py:585-660`): order_id upper-cased, names
  * title-cased, emails lower+trim, source lower, money fields rounded to 2
  * decimals. Pure projections — stays inside whole-stage codegen. */
object Standardize {

  final val RoundedFields = Seq("price", "total_amount", "estimated_profit")

  private def has(df: DataFrame, c: String): Boolean = df.columns.contains(c)

  def apply(df: DataFrame): DataFrame = {
    val steps: Seq[DataFrame => DataFrame] = Seq[DataFrame => DataFrame](
      (d: DataFrame) => if (has(d, "order_id")) d.withColumn("order_id", upper(col("order_id"))) else d,
      (d: DataFrame) => if (has(d, "customer_name")) d.withColumn("customer_name", initcap(col("customer_name"))) else d,
      (d: DataFrame) => if (has(d, "customer_email")) d.withColumn("customer_email", lower(trim(col("customer_email")))) else d,
      (d: DataFrame) => if (has(d, "source")) d.withColumn("source", lower(col("source"))) else d) ++
      RoundedFields.map(f => (d: DataFrame) =>
        if (has(d, f)) d.withColumn(f, graft.functions.Functions.round2(col(f))) else d)
    steps.foldLeft(df)((d, s) => s(d))
  }
}

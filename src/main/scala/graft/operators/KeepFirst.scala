package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge

/** Public wrapper for the native keep-first dedup
  * ([[graft.plans.KeepFirstExec]]): resolves the key/tiebreak columns on
  * the analyzed plan and registers the planner strategy idempotently via
  * the public `experimental.extraStrategies` hook (the
  * [[AsOfJoin.asofNative]] pattern).
  *
  * `tiebreak` must totally order rows within a key group for the pick to
  * be deterministic — callers pass every non-key column
  * ([[graft.pipeline.Clean.KeepFirstTiebreak]] ++ rest). */
object KeepFirst {
  def native(df: DataFrame, keys: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    Bridge.registerStrategy(spark, graft.plans.KeepFirstStrategy)
    val plan = Bridge.analyzed(df)
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"keepFirst: column $n not found"))
    Bridge.ofRows(spark,
      graft.plans.KeepFirstNode(plan, keys.map(attr), tiebreak.map(attr)))
  }
}

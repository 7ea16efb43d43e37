package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the sfDir tables and,
  * when cross-engine expressible, the equivalent DuckDB oracle SQL.
  *
  * Conventions that make the driver's hash-compare deterministic
  * (see SURVEY.md §7.4):
  *   - every computed column is aliased identically in Spark and SQL;
  *   - every query ends in a total ORDER BY (ties broken by a key column);
  *   - floating-point aggregates are rounded in BOTH engines;
  *   - no wall-clock functions — "as of" dates are pinned literals.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle))

  /** For operators whose semantics aren't expressible in portable SQL
    * (MinHash, SimHash, LSH ANN, …) — driver records a rows-only check;
    * ScalaTest carries the semantic assertions instead. */
  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}

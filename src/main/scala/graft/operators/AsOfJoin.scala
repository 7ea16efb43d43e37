package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.time <= left.time` on the same key (inclusive) — the classic
  * time-series operator Spark lacks natively.
  *
  * Preference order from the builder brief: (a) compose existing ops —
  * which suffices here, so no custom SparkPlan. The naive composition
  * (range join + per-left-row top-1) explodes as |left per key| × |right
  * per key|; this implementation is the SCALABLE union-tag pattern:
  *
  *   union(right tagged 0, left tagged 1)
  *     → one window over (key) ordered by (time, tag, tiebreak)
  *     → carry the latest right values forward with last(_, ignoreNulls)
  *     → keep left rows.
  *
  * One shuffle on the key, state bounded by the window frame, zero row
  * blow-up — the same shape holds at 100 TB. Ties at equal time resolve
  * right-before-left (inclusive semantics, matching DuckDB's ASOF JOIN
  * `ON l.t >= r.t`, the oracle for q41).
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (renamed as given)
    * @return left rows + the as-of matched value columns (null if no
    *         right row precedes the left row) */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      valueCols: Map[String, String], // right col -> output name
      tiebreak: String): DataFrame = {
    val pairs = valueCols.toSeq
    val outputs = pairs.map(_._2)
    val leftCols = left.columns.toSeq
    // Carry ALL right values as ONE struct: per-column last(ignoreNulls)
    // would graft an older row's value over a newer row's legitimate NULL,
    // fabricating a row that never existed. The struct itself is non-null
    // exactly for right rows, so one carry moves the whole matched row
    // atomically. Right rows with null key/time are dropped up front —
    // SQL equality/inequality never matches them (DuckDB ASOF agrees).
    val l = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(1))
    val r0 = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key), col(rightTime).as("__t"), lit(0).as("__tag"),
        col(tiebreak).as("__tb"),
        struct(pairs.map { case (in, out) => col(in).as(out) }: _*).as("__vals"))
    // left rows don't need a tiebreak: __tag already sorts them after every
    // equal-time right row, and their order among themselves is irrelevant
    // to the carried value (unionByName null-fills __tb / __vals)
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ outputs.map(o => col(s"__vals.$o").as(o)): _*)
  }

  /** The same as-of semantics through the native physical operator
    * ([[graft.plans.AsOfJoinExec]]) — a streaming merge with O(1) state per
    * partition instead of a window carry over the union. Registers the
    * planner strategy on the session idempotently via the public
    * `experimental.extraStrategies` hook.
    *
    * `left` and `right` must not share attribute lineage (load the right
    * side separately rather than filtering one frame twice) — the node
    * binds key/time columns by exprId. */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      valueCols: Map[String, String],
      tiebreak: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = left.sparkSession
    Bridge.registerStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "asofNative sides must not share attribute lineage; re-read the right side")
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofNative: column $n not found"))
    val pairs = valueCols.toSeq
    val carried = pairs.map { case (in, out) =>
      org.apache.spark.sql.catalyst.expressions
        .AttributeReference(out, attr(rPlan, in).dataType, nullable = true)()
    }
    Bridge.ofRows(spark, graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      pairs.map { case (in, _) => attr(rPlan, in) },
      attr(rPlan, tiebreak), carried))
  }
}

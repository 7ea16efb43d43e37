package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join: logical node + planner strategy + physical operator —
  * the tier-(c) path of SURVEY.md §7.3 (custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`), for the one operator in the inventory
  * Spark genuinely lacks.
  *
  * Physical shape: each side hash-clusters on its key (EnsureRequirements
  * inserts the exchanges and keeps them co-partitioned) and sorts within
  * partitions by (key, time); the exec then runs a single streaming merge
  * pass per partition holding exactly ONE buffered right row — O(1) state,
  * no row blow-up, left-outer semantics. Equivalent to the union-tag
  * composition in [[graft.operators.AsOfJoin]] (the differential test in
  * AsOfNativeSpec pins that), but as a first-class operator: no synthetic
  * tag/null columns in the plan, and downstream operators see the left
  * side's partitioning and ordering unchanged.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    rightTiebreak: Attribute,
    carriedOut: Seq[Attribute]) extends BinaryNode {
  require(carriedOut.length == rightValues.length &&
    carriedOut.zip(rightValues).forall { case (c, v) => c.dataType == v.dataType },
    "carriedOut must mirror rightValues in arity and types")
  override def output: Seq[Attribute] = left.output ++ carriedOut
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, rtb, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, rtb, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    rightTiebreak: Attribute,
    carriedOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carriedOut
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Right additionally sorts by the tiebreak so equal-time rows resolve
    * to the largest tiebreak — the same pick as the union-tag window's
    * `last()` over (time, tag, tiebreak). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  // the merge consumes children in their sorted order and emits left rows
  // untouched, so both properties pass straight through
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val valueTypes = rightValues.map(_.dataType)
    val rValueIdxs = rightValues.map(v => right.output.indexWhere(_.exprId == v.exprId))
    val numValues = rightValues.length

    val outputAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullValues = new GenericInternalRow(numValues)
      val joined = new JoinedRow
      // downstream operators (shuffle writers, collect) require UnsafeRow
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)

      // lookahead right row (reused buffer — values copied when kept)
      var rRow: InternalRow = null
      var rKey: Any = null
      var rTime: Any = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val row = rIter.next()
          val k = row.get(rKeyIdx, keyType)
          val t = row.get(rTimeIdx, timeType)
          if (k != null && t != null) { rRow = row; rKey = k; rTime = t }
        }
      }
      advanceRight()

      // best match so far: values copied out of the right row, plus its key
      var bestKey: Any = null
      var bestValues: InternalRow = null
      def copyValues(row: InternalRow): InternalRow = {
        val out = new GenericInternalRow(numValues)
        var i = 0
        while (i < numValues) {
          out.update(i, InternalRow.copyValue(row.get(rValueIdxs(i), valueTypes(i))))
          i += 1
        }
        out
      }

      lIter.map { lRow =>
        numOutputRows += 1
        val k = lRow.get(lKeyIdx, keyType)
        val t = lRow.get(lTimeIdx, timeType)
        if (k == null || t == null) toUnsafe(joined(lRow, nullValues))
        else {
          // consume right rows that are usable for this (or an earlier) key
          var done = false
          while (!done && rRow != null) {
            val kc = keyOrd.compare(rKey, k)
            if (kc < 0) advanceRight()
            else if (kc == 0 && timeOrd.compare(rTime, t) <= 0) {
              // copy: rKey may be a view into the iterator's reused buffer
              bestKey = InternalRow.copyValue(rKey)
              bestValues = copyValues(rRow)
              advanceRight()
            } else done = true
          }
          if (bestValues != null && bestKey != null && keyOrd.compare(bestKey, k) == 0) {
            numMatched += 1
            toUnsafe(joined(lRow, bestValues))
          } else toUnsafe(joined(lRow, nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Σ aᵢ·bᵢ over two float/double arrays with
  * double accumulation (SURVEY.md §7.3 "custom Expression" tier; the
  * preference order of the builder brief: composition → Expression →
  * custom plan).
  *
  * Motivation: the composed form `aggregate(zip_with(a, b, *), 0d, +)`
  * allocates an intermediate product array per row and walks it twice; a
  * cosine needs three such chains (dot, ‖a‖, ‖b‖). This expression is one
  * fused, allocation-free loop and participates in whole-stage codegen —
  * the hot inner kernel of the similarity operators at scale.
  *
  * Semantics: left-to-right IEEE double accumulation — identical to the
  * composed form (and to DuckDB `list_dot_product`) on equal-length,
  * null-free arrays, which is what the oracle-checked queries feed it.
  * At the edges the forms deliberately DIVERGE: null array → null in
  * both, but null ELEMENTS contribute 0 here (composed form poisons the
  * sum to null) and a length mismatch uses the shorter length (composed
  * form null-pads → null) — the total-function behavior the LSH
  * fixed-size plane literals rely on. FunctionsSpec pins these edges.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  // resolved once, not per interpreted-eval row
  @transient private lazy val leftIsFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left).get == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right).get == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level entry point (Spark 4 classic Column↔Expression bridge). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(
      ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Shared SQL builder with arity validation — wrong argument counts get
    * a proper analysis error instead of IndexOutOfBoundsException. */
  def build(exprs: Seq[Expression]): ArrayDotProduct = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_dot`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    ArrayDotProduct(exprs(0), exprs(1))
  }

  /** SQL registration: `SELECT graft_dot(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", build, "scala_udf")
}

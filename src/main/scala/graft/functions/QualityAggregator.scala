package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The weighted quality score as a reusable typed `Aggregator`
  * (SURVEY.md §7.3 "quality score as Aggregator" depth item; semantics of
  * `src/validation.py:29-101` restricted to the per-row-decidable checks).
  *
  * One buffer of counters merges associatively — partial aggregation and
  * tree-reduce safe, unlike the reference's whole-table pandas passes. The
  * full 13-column report (string-length CV, uniqueness ratio) stays in
  * [[graft.pipeline.Quality]]'s wide agg; this Aggregator covers the
  * per-record component (completeness over required fields, validity,
  * accuracy) as a plug-in `TypedColumn` usable in any groupBy — e.g.
  * per-source or per-day quality without a second scan.
  */
object QualityAggregator {

  /** Pre-projected per-row facts (built by [[QualityInput.fromOrder]]). */
  final case class QualityInput(
      orderIdValid: Boolean, emailValid: Boolean,
      quantityPositive: Boolean, pricePositive: Boolean,
      dateParsed: Boolean, nonNullRequired: Int, requiredFields: Int)

  final case class Buf(rows: Long, orderIdOk: Long, emailOk: Long,
      qtyOk: Long, priceOk: Long, dateOk: Long,
      nonNullCells: Long, totalCells: Long)

  final case class Result(completeness: Double, validity: Double,
      accuracyProxy: Double, score: Double)

  val agg: Aggregator[QualityInput, Buf, Result] =
    new Aggregator[QualityInput, Buf, Result] {
      def zero: Buf = Buf(0, 0, 0, 0, 0, 0, 0, 0)
      def reduce(b: Buf, in: QualityInput): Buf = Buf(
        b.rows + 1,
        b.orderIdOk + (if (in.orderIdValid) 1 else 0),
        b.emailOk + (if (in.emailValid) 1 else 0),
        b.qtyOk + (if (in.quantityPositive) 1 else 0),
        b.priceOk + (if (in.pricePositive) 1 else 0),
        b.dateOk + (if (in.dateParsed) 1 else 0),
        b.nonNullCells + in.nonNullRequired,
        b.totalCells + in.requiredFields)
      def merge(a: Buf, b: Buf): Buf = Buf(
        a.rows + b.rows, a.orderIdOk + b.orderIdOk, a.emailOk + b.emailOk,
        a.qtyOk + b.qtyOk, a.priceOk + b.priceOk, a.dateOk + b.dateOk,
        a.nonNullCells + b.nonNullCells, a.totalCells + b.totalCells)
      def finish(b: Buf): Result = {
        if (b.rows == 0) Result(0, 0, 0, 0)
        else {
          val completeness = 100.0 * b.nonNullCells / math.max(1, b.totalCells)
          val validity = 100.0 * (b.orderIdOk + b.emailOk + b.qtyOk +
            b.priceOk + b.dateOk) / (5.0 * b.rows)
          val accuracy = 100.0 * (b.qtyOk + b.priceOk) / (2.0 * b.rows)
          Result(completeness, validity, accuracy,
            0.4 * completeness + 0.4 * validity + 0.2 * accuracy)
        }
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }
}

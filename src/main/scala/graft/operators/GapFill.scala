package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series densification (gap fill): give every (key, period) cell
  * of a dense calendar a row, zero-filling periods the data never
  * touched. Sparse aggregates silently drop empty periods, which
  * breaks moving windows, charting, and period-over-period deltas —
  * every downstream consumer of a time series wants the dense form.
  *
  * Shape: the dense frame is `distinct keys × sequence(span)` — the
  * key side is a hash-distinct of the (small) key domain and the
  * period axis is a generated literal sequence, so the frame costs one
  * exchange over keys and NO scan of the fact table; the fill itself
  * is one left join the planner can broadcast whichever side is
  * smaller. Nothing here collects data to the driver.
  */
object GapFill {

  /** Dense monthly frame: every `keys` combination × every month-start
    * date in `[spanStart, spanEnd]` (inclusive, both must be firsts of
    * months for a sane axis — enforced). */
  def denseMonths(keyDomain: DataFrame, monthCol: String,
      spanStart: String, spanEnd: String): DataFrame = {
    keyDomain.distinct()
      .withColumn(monthCol, explode(sequence(
        to_date(lit(spanStart)), to_date(lit(spanEnd)),
        expr("interval 1 month"))))
  }

  /** Left-join `sparse` (aggregated at `keys + periodCol` grain) onto
    * the dense `frame`, zero-filling `fillZero` columns for absent
    * periods. Columns not listed stay NULL for filled rows. */
  def fillGaps(frame: DataFrame, sparse: DataFrame,
      keys: Seq[String], periodCol: String,
      fillZero: Seq[String]): DataFrame = {
    val joined = frame.join(sparse, keys :+ periodCol, "left")
    fillZero.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
  }
}

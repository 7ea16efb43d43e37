package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build: turn a change log (one row
  * per observed version of a key) into validity intervals — the
  * point-in-time dimension shape every warehouse keeps for "what was
  * this key's attribute AS OF date d" lookups (the probe side of
  * [[RangeJoin.pointInInterval]] or the as-of join).
  *
  * Intervals are HALF-OPEN `[valid_from, valid_to)`: `valid_to` is the
  * NEXT change's `valid_from` (so consecutive versions chain with no
  * gap and no overlap) and NULL marks the current version. Zero-length
  * intervals (two changes at the same order coordinate) are kept, not
  * merged — they record that a version existed and was immediately
  * superseded, and the tie-break column makes their order
  * deterministic.
  *
  * Scale shape: ONE exchange on the key columns + ONE sort feeding a
  * `lead` window — no self-join, no driver state. At 100 TB this is
  * the same plan as any keyed window; skewed keys are per-key version
  * chains, which are naturally bounded by the entity's change rate.
  */
object Scd2 {

  /** @param changes  change log; every column is carried through
    * @param keys     dimension key columns
    * @param orderCol version coordinate (date/timestamp/long)
    * @param tieBreak extra columns making same-coordinate changes
    *                 deterministic (e.g. a monotonic source id)
    * @return `changes` + `valid_from`, `valid_to` (null = open),
    *         `is_current` */
  def fromChangeLog(changes: DataFrame, keys: Seq[String],
      orderCol: String, tieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "scd2: at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieBreak).map(col): _*)
    changes
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}

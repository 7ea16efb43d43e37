package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The native as-of physical operator ([[graft.plans.AsOfJoinExec]])
  * against the composed union-tag implementation and edge cases. */
class AsOfNativeSpec extends SparkSpec {

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
  private def signups = Tables.events(spark, sf)
    .filter(col("event_type") === "signup")
    .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  test("native as-of equals the composed union-tag as-of row-for-row") {
    val vals = Map("event_id" -> "signup_event_id", "value" -> "signup_value")
    val native = AsOfJoin.asofNative(purchases, signups, "user_id", "ts", "ts",
      vals, "event_id")
    val composed = AsOfJoin.asof(purchases, signups, "user_id", "ts", "ts",
      vals, "event_id")
    assert(native.count() == purchases.count(), "left-outer: one row per left row")
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0,
      "native and composed as-of disagree")
  }

  test("physical plan uses AsOfJoinExec, no Union/Window") {
    val df = AsOfJoin.asofNative(purchases, signups, "user_id", "ts", "ts",
      Map("value" -> "signup_value"), "event_id")
    df.collect() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("Union") && !plan.contains("RunningWindow") &&
      !plan.contains("Window("), "composed-shape operators leaked into the native plan")
  }

  test("null right values carry atomically; null keys/times never match") {
    import spark.implicits._
    // right rows: (k=1,t=10) has v=5/w=1; (k=1,t=20) has v=null/w=2 — a
    // left row at t=30 must get the WHOLE t=20 row (null v included), not
    // an older v grafted onto a newer w. Null-key/time rows never match.
    val l = Seq((Option(1L), Option(30L)), (Option.empty[Long], Option(30L)),
      (Option(2L), Option.empty[Long]))
      .toDF("user_id", "ts")
    def r = Seq(
      (Option(1L), Option(10L), Option(5.0), Option(1L)),
      (Option(1L), Option(20L), Option.empty[Double], Option(2L)),
      (Option.empty[Long], Option(10L), Option(9.0), Option(3L)),
      (Option(2L), Option.empty[Long], Option(9.0), Option(4L)))
      .toDF("user_id", "ts", "v", "w")
    val vals = Map("v" -> "m_v", "w" -> "m_w")
    val native = AsOfJoin.asofNative(l, r, "user_id", "ts", "ts", vals, "w")
      .orderBy("user_id")
    val composed = AsOfJoin.asof(l, r, "user_id", "ts", "ts", vals, "w")
      .orderBy("user_id")
    for (out <- Seq(native, composed)) {
      val rows = out.collect()
      assert(rows.length == 3)
      val matched = rows.find(x => !x.isNullAt(x.fieldIndex("m_w")) &&
        x.getAs[Long]("m_w") == 2L)
        .getOrElse(fail(s"t=20 row not matched in ${rows.mkString(";")}"))
      assert(matched.isNullAt(matched.fieldIndex("m_v")),
        "older v grafted over the matched row's null v")
      assert(rows.count(x => x.isNullAt(x.fieldIndex("m_w"))) == 2,
        "null-key/null-time left rows must not match")
    }
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0)
  }

  test("left rows before any right match carry nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100.0), (1L, 30L, 200.0), (2L, 5L, 300.0))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 20L, 7.0)).toDF("k", "t", "rv")
    val out = AsOfJoin.asofNative(
      l.select(col("k").as("user_id"), col("t").as("ts"), col("lv")),
      r.select(col("k").as("user_id"), col("t").as("ts"), col("rv"),
        col("t").as("tb")),
      "user_id", "ts", "ts", Map("rv" -> "rv_out"), "tb")
      .orderBy("user_id", "ts").collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(out(0).fieldIndex("rv_out")), "t=10 precedes r@20")
    assert(out(1).getAs[Double]("rv_out") == 7.0, "t=30 matches r@20")
    assert(out(2).isNullAt(out(2).fieldIndex("rv_out")), "key 2 has no right rows")
  }
}

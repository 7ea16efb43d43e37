package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler for the q47/q59/q18 profiling family (r13): splits the
  * validation queries into their component passes to see where the time
  * goes. Not registered anywhere. */
object ProfileProfiling {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.build()
    val li = Tables.lineitem(spark, dir)
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s median=${ts.sorted.apply(2)}%.2f min=${ts.min}%.2f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount")
    // pass 1: the sketch aggregate alone
    val approxAggs =
      numCols.map(c => approx_count_distinct(col(c), rsd = 0.02).as(s"${c}__and")) ++
        numCols.flatMap(c => Seq(
          expr(s"percentile_approx($c, 0.5, 10000)").cast("double").as(s"${c}__ap50"),
          expr(s"percentile_approx($c, 0.99, 10000)").cast("double").as(s"${c}__ap99")))
    t("p1_sketches")(li.agg(approxAggs.head, approxAggs.tail: _*))
    // pass 1 variants
    val hllOnly = numCols.map(c => approx_count_distinct(col(c), rsd = 0.02).as(s"${c}__and"))
    t("p1_hll_only")(li.agg(hllOnly.head, hllOnly.tail: _*))
    val pctOnly = numCols.flatMap(c => Seq(
      expr(s"percentile_approx($c, 0.5, 10000)").cast("double").as(s"${c}__ap50"),
      expr(s"percentile_approx($c, 0.99, 10000)").cast("double").as(s"${c}__ap99")))
    t("p1_pct_only")(li.agg(pctOnly.head, pctOnly.tail: _*))
    val pctArr = numCols.map(c =>
      expr(s"percentile_approx($c, array(0.5, 0.99), 10000)").as(s"${c}__ap"))
    t("p1_pct_array")(li.agg(pctArr.head, pctArr.tail: _*))
    // pass 2: exact distinct + rank checks (fixed literal thresholds)
    val checkAggs = numCols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__nd"))) ++
      numCols.flatMap(c => Seq(
        sum(when(col(c) < lit(25.0), 1L).otherwise(0L)).as(s"${c}__lt50"),
        sum(when(col(c) <= lit(25.0), 1L).otherwise(0L)).as(s"${c}__le50")))
    t("p2_exact_expand")(li.agg(checkAggs.head, checkAggs.tail: _*))
    // pass 2 without countDistinct
    val noNd = numCols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      sum(when(col(c) < lit(25.0), 1L).otherwise(0L)).as(s"${c}__lt50")))
    t("p2_no_distinct")(li.agg(noNd.head, noNd.tail: _*))
    // separate narrow distincts
    numCols.foreach { c =>
      t(s"p2_nd_$c")(li.select(col(c)).agg(countDistinct(col(c))))
    }
    // q18 components
    val pexact = numCols.map(c => expr(s"percentile($c, 0.5)").as(s"${c}__m"))
    t("q18_pct_exact")(li.agg(pexact.head, pexact.tail: _*))
    val basic = numCols.flatMap(c => Seq(count(col(c)), avg(col(c)),
      stddev_samp(col(c)), min(col(c)), max(col(c))))
    t("q18_basic_aggs")(li.agg(basic.head, basic.tail: _*))
    spark.stop()
  }
}

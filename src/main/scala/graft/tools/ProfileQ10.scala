package graft.tools

import graft.pipeline.{Clean, Enrich, OrdersDomain, Standardize}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler for the q10-q14 family (not registered anywhere). */
object ProfileQ10 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => DataFrame): Unit = {
      // warm once, then time 3
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s median=${ts.sorted.apply(1)}%.2f  all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    import org.apache.spark.sql.functions._
    val dirty = OrdersDomain.dirtyFromTpch(spark, dir)
    // differential: native vs aggregate form on data WITH real duplicates
    val withDups = dirty.unionAll(dirty.filter(col("api_post_id") % 3 === 0)
      .withColumn("ingested_at", col("ingested_at") + expr("INTERVAL 1 DAY")))
    val nat = Clean.dedupKeepFirst(withDups).orderBy("order_id")
    val agg = Clean.dedupKeepFirstAgg(withDups).orderBy("order_id")
    println("native count=" + nat.count() + " agg count=" + agg.count())
    println("diff rows=" + nat.exceptAll(agg).count() + " / " + agg.exceptAll(nat).count())
    t("dedup_native")(Clean.dedupKeepFirst(dirty))
    t("dedup_agg")(Clean.dedupKeepFirstAgg(dirty))
    t("clean_unsorted")(Clean(dirty))
    t("clean_sorted")(Clean(dirty).orderBy("order_id"))
    println(Clean.dedupKeepFirst(dirty).queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("KeepFirst") || l.contains("Sort ") || l.contains("Exchange hash"))
      .mkString("\n"))
    spark.stop()
  }
}

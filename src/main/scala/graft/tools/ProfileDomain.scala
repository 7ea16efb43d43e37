package graft.tools

import graft.GraftSession
import graft.pipeline.{Clean, OrdersDomain}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch component profiler for the r13 orders-domain family. */
object ProfileDomain {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.build()
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s median=${ts.sorted.apply(2)}%.2f min=${ts.min}%.2f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    t("scan_lineitem")(li)
    t("domain_unsorted")(OrdersDomain.fromTpch(spark, dir))
    t("domain_ordered")(OrdersDomain.fromTpchOrdered(spark, dir))
    t("dirty_ranged")(OrdersDomain.dirtyFromTpchRanged(spark, dir))
    t("clean_fused")(Clean(OrdersDomain.dirtyFromTpchRanged(spark, dir))
      .orderBy("order_id"))
    t("clean_unsorted")(Clean(OrdersDomain.dirtyFromTpch(spark, dir)))
    spark.stop()
  }
}

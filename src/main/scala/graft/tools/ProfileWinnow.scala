package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch differential profiler for the q82 winnow pair join (r13): the
  * committed form re-evaluates the fingerprint selection for each of its
  * three consumers (hot-set aggregate, join left, broadcast join right);
  * the candidate form repartitions the selection on fp once so all three
  * read one exchange. Not registered anywhere. */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.build()
    val docs = Tables.documents(spark, dir)
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s median=${ts.sorted.apply(2)}%.2f min=${ts.min}%.2f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    import graft.ext.Dedup
    // current form
    t("pairs_rescan")(Dedup.winnowPairs(docs).orderBy("doc_a", "doc_b"))
    // shared-exchange form (inline copy of winnowPairs with repartition)
    def pairsShared: DataFrame = {
      val s = Dedup.winnowFingerprints(docs).repartition(col("fp"))
      val hot = s.groupBy("fp")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") > Dedup.WinnowMaxDocFreq).select("fp")
      val cold = s.join(broadcast(hot), Seq("fp"), "left_anti")
      cold.as("a").join(cold.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= Dedup.WinnowMinShared)
    }
    t("pairs_shared_exch")(pairsShared.orderBy("doc_a", "doc_b"))
    // sanity: identical results
    val a = Dedup.winnowPairs(docs)
    val b = pairsShared
    println("diff=" + a.exceptAll(b).count() + "/" + b.exceptAll(a).count())
    spark.stop()
  }
}

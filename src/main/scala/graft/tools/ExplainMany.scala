package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump `explain("formatted")` for many registered queries in ONE session:
  * `runMain graft.tools.ExplainMany <outDir> <suffix> <q1,q2,...|all> [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` per query. Measurement harness for
  * the optimization rounds (plans/r13 deliverable); never registered.
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.build()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val plan =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          // same rendering as df.explain("formatted"), captured as a string
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case t: Throwable => s"EXPLAIN FAILED: $t" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

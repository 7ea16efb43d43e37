package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the maintained pair index (not registered
  * anywhere): measures the production claim behind
  * [[graft.ext.Dedup.appendToPairIndex]] — folding an admitted batch in
  * costs a small fraction of rebuilding all pairs from raw text. */
object ProfilePairIndex {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def time[A](what: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$what%-28s $sec%6.2f s")
      sec
    }
    // warm the codegen/JIT paths once on a small slice
    val w = java.nio.file.Files.createTempDirectory("pidx_warm").toString
    graft.ext.Dedup.buildPairIndex(docs.filter(col("doc_id") < 500), w)
    val covered = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val d1 = java.nio.file.Files.createTempDirectory("pidx_full").toString
    val d2 = java.nio.file.Files.createTempDirectory("pidx_incr").toString
    val full = time("rebuild: all docs")(
      graft.ext.Dedup.buildPairIndex(docs, d1))
    time("build: 90% base")(graft.ext.Dedup.buildPairIndex(covered, d2))
    val appendSec = time("append: 10% batch")(
      graft.ext.Dedup.appendToPairIndex(spark, d2, batch))
    println(f"append/rebuild = ${appendSec / full}%.2f")
    // value pin: the two states agree
    val a = graft.ext.Dedup.readPairIndex(spark, d1, 0.0)
    val b = graft.ext.Dedup.readPairIndex(spark, d2, 0.0)
    println("diff=" + a.exceptAll(b).count() + "/" + b.exceptAll(a).count())
    Seq(w, d1, d2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    spark.stop()
  }
}

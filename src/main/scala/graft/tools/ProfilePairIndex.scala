package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the maintained pair index (not registered
  * anywhere): measures the production claims behind
  * [[graft.ext.Dedup.appendToPairIndex]] —
  *  (a) folding an admitted batch in costs a small fraction of
  *      rebuilding all pairs from raw text (covered text is never
  *      re-shingled), and
  *  (b) round 13: an append's PUBLISH IO is O(batch), not O(index) —
  *      each fold writes only its own `batch=` partitions, so bytes
  *      written per append stay flat while the index grows.
  * Reports per-append wall seconds, bytes written (new files), and the
  * index's total size at that point. */
object ProfilePairIndex {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def time[A](what: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$what%-28s $sec%6.2f s")
      sec
    }
    def treeBytes(root: String): Long = {
      def walk(f: java.io.File): Long =
        if (!f.exists()) 0L
        else if (f.isDirectory) f.listFiles().map(walk).sum
        else f.length()
      walk(new java.io.File(root))
    }
    // warm the codegen/JIT paths once on a small slice
    val w = java.nio.file.Files.createTempDirectory("pidx_warm").toString
    graft.ext.Dedup.buildPairIndex(docs.filter(col("doc_id") < 500), w)
    val d1 = java.nio.file.Files.createTempDirectory("pidx_full").toString
    val d2 = java.nio.file.Files.createTempDirectory("pidx_incr").toString
    val full = time("rebuild: all docs")(
      graft.ext.Dedup.buildPairIndex(docs, d1))
    // base = half the corpus; five equal batches fold in the other half —
    // bytes-written per fold must stay ~flat while index bytes grow
    time("build: 50% base")(
      graft.ext.Dedup.buildPairIndex(docs.filter(col("doc_id") % 10 < 5), d2))
    var lastAppendSec = 0.0
    (5 to 9).foreach { m =>
      val before = treeBytes(d2)
      lastAppendSec = time(s"append: 10% batch ($m)")(
        graft.ext.Dedup.appendToPairIndex(spark, d2,
          docs.filter(col("doc_id") % 10 === m)))
      val after = treeBytes(d2)
      println(f"  bytes written ${(after - before) / 1024.0}%9.1f KiB;" +
        f" index now ${after / 1024.0}%9.1f KiB")
    }
    println(f"last-append/rebuild = ${lastAppendSec / full}%.2f")
    // value pin: the two states agree
    val a = graft.ext.Dedup.readPairIndex(spark, d1, 0.0)
    val b = graft.ext.Dedup.readPairIndex(spark, d2, 0.0)
    println("diff=" + a.exceptAll(b).count() + "/" + b.exceptAll(a).count())
    Seq(w, d1, d2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q170 suite-vs-focus gap (not registered
  * anywhere): runs the PageRank body under the candidate edge-storage
  * strategies, with optional synthetic heap pressure approximating the
  * suite context (the bench JVM runs 193 queries in 8 GB), and prints
  * per-run times plus the edge RDD's storage counters so an eviction or
  * recompute shows up as numbers, not a guess.
  *
  * Env:
  *   PR_MODES     comma list of persist|disk|scratch (default all)
  *   PR_PRESSURE  bytes of live on-heap ballast to hold across runs
  *                (default 0; try 3e9 to approximate late-suite heap)
  *   PR_ITERS     timed runs per mode (default 5)
  */
object ProfileQ170 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val modes = sys.env.getOrElse("PR_MODES", "persist,disk,scratch")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val pressure = sys.env.getOrElse("PR_PRESSURE", "0").toDouble.toLong
    val iters = sys.env.getOrElse("PR_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PR_SHUF", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ballast: live references the GC cannot reclaim, approximating the
    // late-suite old-gen occupancy the focus protocol never sees
    val ballast = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var held = 0L
    while (held < pressure) {
      ballast += new Array[Byte](16 * 1024 * 1024); held += 16L * 1024 * 1024
    }
    println(s"ballast=${held / 1e9}GB modes=${modes.mkString(",")}")
    // PR_PLAN=<path>: dump the ITERATION plan (the q170 fn collects
    // internally, so ExplainMany only sees a LocalTableScan) and exit
    sys.env.get("PR_PLAN").foreach { path =>
      val op0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
      val (result, edges) = graft.queries.Advanced.pageRankPlan(spark, op0)
      try {
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
          result.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode) +
            "\n\n== Edge build (cached) ==\n" +
            edges.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        println(s"wrote $path")
      } finally edges.unpersist()
      spark.stop(); return
    }
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.format("noop").mode("overwrite").save()

    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
      .distinct()

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    modes.foreach { mode =>
      // one warm pass, then timed
      (0 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val gc0 = gcMillis()
        val rows = runOnce(spark, op, mode, dir)
        val sec = (System.nanoTime() - t0) / 1e9
        val gcd = gcMillis() - gc0
        if (i > 0)
          println(f"$mode%-8s run$i sec=$sec%6.2f gc_ms=$gcd%5d rows=$rows")
      }
    }
    // phase breakdown: edges build+count vs N-iteration collect
    if (sys.env.get("PR_PHASES").contains("1")) {
      import org.apache.spark.sql.expressions.Window
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val rawEdges = op.as("a").join(op.as("b"),
            col("a.ok") === col("b.ok") && col("a.part") =!= col("b.part"))
          .select(col("a.part").as("src"), col("b.part").as("dst"))
        val edges = rawEdges
          .repartition(col("src"))
          .dropDuplicates("src", "dst")
          .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count()
        val t1 = System.nanoTime()
        (0 to 5).foreach { n =>
          val s0 = edges.select(col("src").as("node")).distinct()
            .select(col("node"), lit(1000000L).as("score"))
          val sFinal = (1 to n).foldLeft(s0) { (sc, _) =>
            edges.join(sc.hint("shuffle_hash"), col("src") === col("node"))
              .groupBy(col("dst").as("node"))
              .agg((lit(150000L) +
                expr("(85 * sum(score div outdeg)) div 100")).as("score"))
          }
          val tn0 = System.nanoTime()
          sFinal.select(col("node").as("partkey"), col("score").as("score_ppm"))
            .orderBy(col("score_ppm").desc, col("partkey")).limit(20)
            .collect()
          println(f"  iter$i: $n%d-round collect ${(System.nanoTime() - tn0) / 1e9}%6.2f s (edges build ${(t1 - t0) / 1e9}%5.2f)")
        }
        edges.unpersist()
      }
    }
    spark.stop()
  }

  private def runOnce(spark: SparkSession, op: DataFrame, mode: String,
      dir: String): Int = {
    import org.apache.spark.sql.expressions.Window
    if (sys.env.get("PR_NEW").contains("1")) return runOnceNew(spark, op, mode)
    val rawEdges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.part") =!= col("b.part"))
      .select(col("a.part").as("src"), col("b.part").as("dst"))
    val built = rawEdges
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
    var scratch: Option[java.io.File] = None
    val edges = mode match {
      case "persist" =>
        val e = built.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      case "disk" =>
        val e = built.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        e.count(); e
      case "scratch" =>
        val d = java.nio.file.Files.createTempDirectory("pr_edges").toFile
        scratch = Some(d)
        built.write.mode("overwrite").parquet(d.toString)
        spark.read.parquet(d.toString)
      case other => sys.error(s"unknown mode $other")
    }
    try {
      val s0 = edges.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("score"))
      runIters(edges, s0, mode, spark)
    } finally {
      edges.unpersist()
      scratch.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    }
  }

  /** The committed round-14 shape (adjacency-list edges), via the real
    * plan builder. */
  private def runOnceNew(spark: SparkSession, op: DataFrame,
      mode: String): Int = {
    println("    opBytes=" +
      op.queryExecution.optimizedPlan.stats.sizeInBytes)
    graft.queries.Advanced.pageRank(spark, op).collect().length
  }

  private def runIters(edges: DataFrame, s0: DataFrame, mode: String,
      spark: SparkSession): Int = {
    val sFinal = (1 to 5).foldLeft(s0) { (sc, _) =>
      edges.join(sc.hint("shuffle_hash"), col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg((lit(150000L) +
          expr("(85 * sum(score div outdeg)) div 100")).as("score"))
    }
    val res = sFinal
      .select(col("node").as("partkey"), col("score").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("partkey")).limit(20)
      .collect()
    if (mode != "scratch") {
      val info = spark.sparkContext.getRDDStorageInfo
      info.foreach { r =>
        println(s"    rdd=${r.id} cached=${r.numCachedPartitions}/" +
          s"${r.numPartitions} mem=${r.memSize} disk=${r.diskSize}")
      }
    }
    res.length
  }
}

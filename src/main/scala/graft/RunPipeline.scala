package graft

import graft.pipeline.{GraftConfig, Ingest, OrdersDomain, Pipeline}

/** CLI entry mirroring the reference's `run_pipeline.py:263-326`:
  *
  *   runMain graft.RunPipeline <sfDir> <outDir>
  *       [--no-validation] [--no-enrichment] [--no-standardization]
  *   runMain graft.RunPipeline <sfDir> <outDir> --health
  *
  * Sources: the canonical orders domain (API-shaped, from the sfDir
  * tables) — the file-drop sources run through the streaming layer.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val flags = args.filter(_.startsWith("--")).toSet
    val known = Set("--health", "--no-validation", "--no-enrichment",
      "--no-standardization")
    val unknown = flags -- known
    require(unknown.isEmpty,
      s"unknown flag(s): ${unknown.mkString(", ")} — known: ${known.toSeq.sorted.mkString(", ")}")
    val Array(sfDir, outDir) = positional.take(2)
    // all load-bearing confs (codegen-cache cap, shuffle partitions, UTC,
    // nanosAsLong) live in ONE factory — see GraftSession's scaladoc
    val spark = GraftSession.build(defaultCpus = "4")
    try {
      if (flags.contains("--health")) {
        val h = Pipeline.healthCheck(spark, sfDir, outDir)
        println(s"HEALTH overall=${h.overall}")
        h.components.foreach(c => println(s"  ${c.component}: ${c.status} (${c.detail})"))
      } else {
        val config = GraftConfig(
          enableValidation = !flags.contains("--no-validation"),
          enableEnrichment = !flags.contains("--no-enrichment"),
          enableStandardization = !flags.contains("--no-standardization"))
        val report = Pipeline.run(spark,
          Seq(OrdersDomain.fromTpch(spark, sfDir)), outDir, config)
        println(s"PIPELINE run_id=${report.runId} success=${report.success} " +
          s"stored=${report.recordsStored} quality=${report.qualityScore.getOrElse(-1.0)} " +
          s"level=${report.qualityLevel.getOrElse("n/a")}")
        report.stages.foreach(s => println(
          f"  ${s.stage}%-16s ${if (s.success) "ok" else "FAIL"} ${s.seconds}%6.2fs ${s.error.getOrElse("")}"))
      }
    } finally spark.stop()
  }
}

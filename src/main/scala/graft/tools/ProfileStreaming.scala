package graft.tools

import graft.{GraftSession, Tables}
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Scratch profiler for the streaming/maintenance micro-batch loops
  * (round 14, VERDICT item 7) — times every foreachBatch maintenance
  * path per micro-batch via the engine's own StreamingQueryProgress
  * (triggerExecution / addBatch durations), plus hand-driven timings for
  * the pair-index fold. Not registered anywhere; output is committed as
  * plans/r14/streaming_profile.txt.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), PS_BATCHES (default 8).
  */
object ProfileStreaming {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Split `df` into n single-file parquet batches under a fresh dir
    * (one file per trigger for AvailableNow file sources). */
  private def splitBatches(df: DataFrame, keyCol: String, n: Int,
      prefix: String): (String, org.apache.spark.sql.types.StructType) = {
    val dir = tmp(prefix)
    (0 until n).foreach { m =>
      val stage = s"$dir/b$m"
      df.filter(pmod(col(keyCol), lit(n)) === m).coalesce(1)
        .write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$dir/batch_$m%03d.parquet"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    }
    (dir, df.schema)
  }

  private def report(name: String, q: StreamingQuery): Unit = {
    q.awaitTermination()
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val d = p.durationMs
      println(f"$name%-22s batch=${p.batchId}%2d rows=${p.numInputRows}%6d " +
        f"trigger_ms=${d.getOrDefault("triggerExecution", -1L)}%6d " +
        f"addBatch_ms=${d.getOrDefault("addBatch", -1L)}%6d")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("PS_BATCHES", "8").toInt
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    // 1. rollup + vocab maintenance (the q139/q141 artifact fold)
    {
      val (in, schema) = splitBatches(docs, "doc_id", nBatches, "ps_maint_in")
      val art = tmp("ps_maint_art")
      spark.sparkContext.setJobDescription("streaming: rollup+vocab maintenance")
      report("maintain_rollup_vocab", graft.ext.Rollup.maintainStream(
        Streaming.parquetFileSource(spark, in, schema), art,
        tmp("ps_maint_ck"), compactEvery = 3))
    }

    // 2. corpus admission (documented gate-scale shape: re-derives corpus
    //    fingerprints per batch — the duration should GROW with batch id)
    {
      val (in, schema) = splitBatches(docs.select("doc_id", "text"),
        "doc_id", nBatches, "ps_admit_in")
      spark.sparkContext.setJobDescription("streaming: corpus admission")
      report("corpus_admit", Streaming.corpusAdmitStream(
        Streaming.parquetFileSource(spark, in, schema),
        tmp("ps_admit_corpus") + "/corpus", tmp("ps_admit_ck")))
    }

    // 3. media admission (index-backed dedup state — the amortized shape)
    {
      val m = graft.ext.Multimodal.mediaFromDocuments(docs)
      val (in, schema) = splitBatches(m, "media_id", nBatches, "ps_media_in")
      spark.sparkContext.setJobDescription("streaming: media admission")
      report("media_admit", Streaming.mediaAdmitStream(
        Streaming.parquetFileSource(spark, in, schema),
        tmp("ps_media_out") + "/media", tmp("ps_media_idx") + "/index",
        tmp("ps_media_ck")))
    }

    // 4. late-data ledger over events
    {
      val (in, schema) = splitBatches(events, "event_id", nBatches, "ps_late_in")
      spark.sparkContext.setJobDescription("streaming: late-data ledger")
      report("late_audit", Streaming.lateAuditStream(
        Streaming.parquetFileSource(spark, in, schema),
        tmp("ps_late_out"), tmp("ps_late_ck")))
    }

    // 5. pair-index maintenance fold (hand-driven, timed per batch)
    {
      val d = docs.select("doc_id", "text")
      val idx = tmp("ps_pidx") + "/index"
      (0 until nBatches).foreach { m =>
        val batch = d.filter(pmod(col("doc_id"), lit(nBatches)) === m)
        val t0 = System.nanoTime()
        if (m == 0) graft.ext.Dedup.buildPairIndex(batch, idx)
        else graft.ext.Dedup.appendToPairIndex(spark, idx, batch)
        val tAppend = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.ext.Dedup.bandLoadFromIndex(spark, idx).collect()
        val tAudit = (System.nanoTime() - t1) / 1e9
        println(f"pair_index_fold        batch=$m%2d " +
          f"append_s=$tAppend%6.2f band_audit_s=$tAudit%6.2f")
      }
    }
    spark.stop()
  }
}

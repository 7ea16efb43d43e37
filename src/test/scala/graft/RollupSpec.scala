package graft

import graft.ext.Rollup
import org.apache.spark.sql.functions._

class RollupSpec extends SparkSpec {

  test("stats rollup: build + append ≡ one-shot over the full corpus") {
    val docs = Tables.documents(spark, sf)
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("stats_rollup").toString
    Rollup.buildStatsRollup(first, dir)
    Rollup.appendToStatsRollup(spark, dir, second)
    val merged = Rollup.readStatsRollup(spark, dir)
    val full = Rollup.statsRollup(docs)
    assert(merged.exceptAll(full).count() == 0 &&
      full.exceptAll(merged).count() == 0,
      "incremental rollup must equal the one-shot build")
    // crash window: rollup moved aside, publish not done — reader recovers
    val p = new java.io.File(dir + "/rollup")
    assert(p.renameTo(new java.io.File(dir + "/rollup__backup")))
    val recovered = Rollup.readStatsRollup(spark, dir)
    assert(recovered.exceptAll(full).count() == 0, "backup recovery lost state")
  }

  test("stats rollup: a group appearing ONLY in the appended batch merges in") {
    import spark.implicits._
    val a = Seq((0L, "x", "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = Seq((1L, "y", "en", "srcB", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("stats_rollup_new").toString
    Rollup.buildStatsRollup(a, dir)
    Rollup.appendToStatsRollup(spark, dir, b)
    val rows = Rollup.readStatsRollup(spark, dir).orderBy("source").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("source")).toSeq == Seq("srcA", "srcB"))
    assert(rows.map(_.getAs[Long]("sum_chars")).toSeq == Seq(10L, 30L))
  }

  test("finalize: micro-unit mean and sample variance are exact on a fixture") {
    import spark.implicits._
    // chars 10 and 20: mean 15, sample var = ((10-15)^2+(20-15)^2)/1 = 50
    val docs = Seq(
      (0L, "a", "en", "s", 10L), (1L, "b", "en", "s", 20L),
      (2L, "c", "en", "solo", 7L) // single doc → variance NULL
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Rollup.finalizeRollup(Rollup.statsRollup(docs))
      .orderBy("source").collect()
    val s = rows.find(_.getAs[String]("source") == "s").get
    assert(s.getAs[Long]("n_docs") == 2L)
    assert(s.getAs[Long]("mean_chars_micro") == 15L * Rollup.Micro)
    assert(s.getAs[Long]("var_chars_micro") == 50L * Rollup.Micro)
    val solo = rows.find(_.getAs[String]("source") == "solo").get
    assert(solo.isNullAt(solo.fieldIndex("var_chars_micro")),
      "single-doc group must have NULL variance")
    // round-half-up: chars 10, 11 → mean 10.5 → 10_500_000 micro
    val odd = Seq((0L, "a", "en", "s", 10L), (1L, "b", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Rollup.finalizeRollup(Rollup.statsRollup(odd)).head()
    assert(m.getAs[Long]("mean_chars_micro") == 10500000L)
  }

  test("vocab index: union-append ≡ one-shot estimates; estimate tracks exact; crash recovers") {
    val docs = Tables.documents(spark, sf)
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("vocab_idx").toString
    Rollup.buildVocabIndex(first, dir)
    Rollup.appendToVocabIndex(spark, dir, second)
    def ests(df: org.apache.spark.sql.DataFrame) =
      Rollup.vocabEstimate(df).orderBy("source").collect()
        .map(r => r.getAs[String]("source") ->
          r.getAs[Long]("est_distinct_tokens")).toMap
    val merged = ests(Rollup.readVocabIndex(spark, dir))
    val oneShot = ests(Rollup.vocabSketch(docs))
    assert(merged == oneShot,
      s"union-append estimates diverge from the one-shot build:\n$merged\n$oneShot")
    // estimates track the exact distinct counts within the HLL envelope
    val exact = docs.select(col("source"),
        explode(graft.ext.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("source").agg(countDistinct(col("token")).as("nd"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("nd")).toMap
    exact.foreach { case (src, nd) =>
      val est = merged(src)
      assert(math.abs(est.toDouble - nd) <= math.max(0.05 * nd, 2.0),
        s"$src: est $est vs exact $nd outside the 5% envelope")
    }
    // crash window: index moved aside, publish not done — the reader
    // serves the backup WITHOUT renaming (repair is writer-only; a
    // reader rename inside a live publish would steal the backup)
    val p = new java.io.File(dir + "/vocab")
    assert(p.renameTo(new java.io.File(dir + "/vocab__backup")))
    assert(ests(Rollup.readVocabIndex(spark, dir)) == oneShot,
      "backup read lost sketch state")
    assert(!p.exists(), "a CONSUMER read must not repair the swap")
    // the next writer op repairs and folds normally
    Rollup.appendToVocabIndex(spark, dir, docs.limit(0))
    assert(p.exists(), "the writer must complete the crashed swap")
    assert(ests(Rollup.readVocabIndex(spark, dir)) == oneShot)
  }

  test("drift probe: shifted batch mean trips the z-flag, matched batch does not") {
    import spark.implicits._
    def corpus(source: String, base: Long, n: Int, shift: Long) =
      (0 until n).map(i =>
        (i.toLong, "t", "en", source,
          base + (i % 5) + shift)) // spread 0..4 around base
    // index: tight distribution around 100; matched batch same; shifted +50
    val idx = corpus("stable", 100L, 200, 0L) ++ corpus("moved", 100L, 200, 0L)
    val bat = corpus("stable", 100L, 200, 0L) ++ corpus("moved", 100L, 200, 50L)
    val iDf = idx.toDF("doc_id", "text", "lang", "source", "n_chars")
    val bDf = bat.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Rollup.driftVsRollup(
      Rollup.statsRollup(iDf, Seq("source")),
      Rollup.statsRollup(bDf, Seq("source")))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(!rows("stable").getAs[Boolean]("drifted"),
      "identical distribution must not drift")
    assert(rows("moved").getAs[Boolean]("drifted"),
      "a +50-char mean shift at spread ~1.4 must trip the 3-sigma flag")
    // means are exact micro-units: base 100 + mean of (0..4 cycle) = 102
    assert(rows("stable").getAs[Long]("mean_idx_micro") == 102L * Rollup.Micro)
    assert(rows("moved").getAs[Long]("mean_bat_micro") == 152L * Rollup.Micro)
  }

  test("drift probe: DECIMAL(38,0) overflow fails loudly instead of reading as not-drifted") {
    import spark.implicits._
    // sums/counts past the documented ~10^12-doc bound: delta ~ 2.8e37
    // fits DECIMAL(38,0) but delta^2 saturates → NULL under non-ANSI mode
    val idx = Seq(("a", 4000000000000000000L, 8000000000000000000L,
      9000000000000000000L)).toDF("source", "n_docs", "sum_chars", "sumsq_chars")
    val bat = Seq(("a", 1000000000000000000L, 9000000000000000000L))
      .toDF("source", "n_docs", "sum_chars")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // ANSI mode (the session default) already throws on the saturating
    // product — loud, good. The guard exists for non-ANSI deployments
    // where the product silently NULLs: prove BOTH paths fail loudly.
    val eAnsi = intercept[Exception](Rollup.driftVsRollup(idx, bat).collect())
    assert(messages(eAnsi).exists(m =>
      m.contains("overflow") || m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected a loud overflow error under ANSI, got: $eAnsi")
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val eNull = intercept[Exception](Rollup.driftVsRollup(idx, bat).collect())
      assert(messages(eNull).exists(_.contains("overflow")),
        s"expected the raise_error guard under non-ANSI NULL products, got: $eNull")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  test("drift probe: NULL stats on the way IN stay a NULL verdict, not a fake overflow") {
    import spark.implicits._
    // a group whose chars were never measured: sums are NULL for data
    // reasons — the overflow guard must not fire on it
    val idx = Seq(
      ("m", 5L, Option.empty[Long], Option.empty[Long]),
      ("ok", 5L, Option(500L), Option(50010L)))
      .toDF("source", "n_docs", "sum_chars", "sumsq_chars")
    val bat = Seq(
      ("m", 3L, Option.empty[Long]),
      ("ok", 3L, Option(300L)))
      .toDF("source", "n_docs", "sum_chars")
    val rows = Rollup.driftVsRollup(idx, bat)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("m").isNullAt(rows("m").fieldIndex("drifted")),
      "missing input stats must yield NULL, not an overflow abort")
    assert(!rows("ok").getAs[Boolean]("drifted"))
  }

  test("maintenance loop: all-empty micro-batches fold without bricking the artifact") {
    import spark.implicits._
    val keys = Seq("source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("maint_empty").toString
    val docs = Seq((1L, "alpha beta", "en", "s1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val empty = docs.filter(lit(false))
    // enough empty batches to force a fold → a 0-row base with NULL __upto
    (0L to 5L).foreach { b =>
      Rollup.applyMaintenanceBatch(spark, s"$dir/rollup",
        Rollup.statsRollup(empty, keys), b, keys,
        Rollup.mergeRollups(_, _, keys), compactEvery = 3)
    }
    assert(Rollup.readMaintainedRollup(spark, dir, keys).count() == 0,
      "empty stream must read as an empty rollup, not crash")
    // the artifact keeps working: a real batch lands and reads back
    Rollup.applyMaintenanceBatch(spark, s"$dir/rollup",
      Rollup.statsRollup(docs, keys), 6L, keys,
      Rollup.mergeRollups(_, _, keys), compactEvery = 3)
    val after = Rollup.readMaintainedRollup(spark, dir, keys).collect()
    assert(after.length == 1 && after.head.getAs[Long]("n_docs") == 1L)
  }

  test("maintenance loop: consumers read through a crashed swap WITHOUT repairing; the writer repairs") {
    import spark.implicits._
    val keys = Seq("source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("maint_swap").toString
    val docs = Seq((1L, "alpha", "en", "s1", 10L), (2L, "beta", "en", "s2", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    (0L to 4L).foreach { b =>
      Rollup.applyMaintenanceBatch(spark, s"$dir/rollup",
        Rollup.statsRollup(docs.filter(col("doc_id") === (b % 2 + 1)), keys),
        b, keys, Rollup.mergeRollups(_, _, keys), compactEvery = 3)
    }
    val before = Rollup.readMaintainedRollup(spark, dir, keys)
      .orderBy("source").collect().map(_.toSeq).toSeq
    // simulate a publish crashed between its two renames: base moved
    // aside, replacement never landed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/rollup/base"),
      new org.apache.hadoop.fs.Path(s"$dir/rollup/base__backup")))
    val during = Rollup.readMaintainedRollup(spark, dir, keys)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(during == before, "reader must serve the backup contents")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rollup/base")),
      "a CONSUMER read must not rename the writer's backup")
    // the next writer operation repairs and proceeds
    Rollup.applyMaintenanceBatch(spark, s"$dir/rollup",
      Rollup.statsRollup(docs, keys), 5L, keys,
      Rollup.mergeRollups(_, _, keys), compactEvery = 3)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rollup/base")),
      "the writer must have completed the crashed swap")
    assert(Rollup.readMaintainedRollup(spark, dir, keys).count() == 2)
  }

  test("maintenance read: a fold's publish+GC landing mid-snapshot retries and serves the folded state") {
    import spark.implicits._
    val keys = Seq("source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("maint_race").toString
    val docs = Seq(
      (1L, "alpha", "en", "s1", 10L), (2L, "beta", "en", "s2", 20L),
      (3L, "gamma", "en", "s3", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // three live partials, no base yet (compactEvery high)
    (0L to 2L).foreach { b =>
      Rollup.applyMaintenanceBatch(spark, s"$dir/rollup",
        Rollup.statsRollup(docs.filter(col("doc_id") === b + 1), keys),
        b, keys, Rollup.mergeRollups(_, _, keys), compactEvery = 10)
    }
    val want = Rollup.statsRollup(docs, keys).collect().map(_.toSeq).toSet
    val hookCalls = scala.collection.mutable.ArrayBuffer[Int]()
    val got = Rollup.readMaintainedRetrying(spark, s"$dir/rollup", keys,
      Rollup.mergeRollups(_, _, keys), None, { attempt =>
        hookCalls += attempt
        if (attempt == 1) {
          // the racing fold completes NOW — after this snapshot listed
          // the partials, before it materializes them: batch 3 lands
          // with compactEvery=1, folding everything into the base and
          // GC-ing every partial directory out from under the listing
          Rollup.applyMaintenanceBatch(spark, s"$dir/rollup",
            Rollup.statsRollup(docs.filter(lit(false)), keys), 3L, keys,
            Rollup.mergeRollups(_, _, keys), compactEvery = 1)
        }
      }).collect().map(_.toSeq).toSet
    assert(got == want,
      "retried read must serve the folded state, not fail or undercount")
    // the first attempt saw live partials and died on their vanished
    // files; the second found everything in the base (no parts → no
    // second hook call) — exactly one retry, zero double-counting
    assert(hookCalls.toSeq == Seq(1),
      s"expected one raced attempt then a clean base read: $hookCalls")

    // mechanism proof — the retry LOOP observably runs: yank ONE listed
    // partial directory (no fold), so attempt 1 must die on the vanished
    // files and attempt 2 must re-list and serve the survivors
    val dir2 = java.nio.file.Files.createTempDirectory("maint_race2").toString
    (0L to 2L).foreach { b =>
      Rollup.applyMaintenanceBatch(spark, s"$dir2/rollup",
        Rollup.statsRollup(docs.filter(col("doc_id") === b + 1), keys),
        b, keys, Rollup.mergeRollups(_, _, keys), compactEvery = 10)
    }
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hook2 = scala.collection.mutable.ArrayBuffer[Int]()
    val got2 = Rollup.readMaintainedRetrying(spark, s"$dir2/rollup", keys,
      Rollup.mergeRollups(_, _, keys), None, { attempt =>
        hook2 += attempt
        if (attempt == 1) assert(fs.delete(
          new org.apache.hadoop.fs.Path(s"$dir2/rollup/parts/batch=2"), true))
      }).collect().map(_.toSeq).toSet
    assert(hook2.toSeq == Seq(1, 2),
      s"attempt 1 must fail on the vanished partial and retry: $hook2")
    val survivors = Rollup.statsRollup(docs.filter(col("doc_id") <= 2), keys)
      .collect().map(_.toSeq).toSet
    assert(got2 == survivors, "retry must re-list and serve the survivors")
  }

  test("q145 layout GC is age-gated on the NEWEST RECURSIVE mtime: young stale fingerprints and active builds survive, crashed leaks go") {
    val d = java.nio.file.Files.createTempDirectory("q145_gc").toString
    Tables.documents(spark, sf).write.parquet(s"$d/documents.parquet")
    def md5(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tmp = System.getProperty("java.io.tmpdir")
    val pathKey = md5(d)
    val oldMs = System.currentTimeMillis() - Rollup.Q145StaleGcGraceMs - 60000L
    // plant superseded siblings of this table's cache key: staleness is
    // keyed on the newest mtime found RECURSIVELY, so both the dir AND
    // its files must be backdated to read as past-grace
    def plant(suffix: String, backdate: Boolean): java.io.File = {
      val f = new java.io.File(s"$tmp/graft_q145_${pathKey}_$suffix")
      assert(f.mkdirs())
      val ready = new java.io.File(f, "_READY")
      java.nio.file.Files.writeString(ready.toPath, "ready")
      if (backdate) { assert(ready.setLastModified(oldMs))
        assert(f.setLastModified(oldMs)) }
      f
    }
    val young = plant("youngfp", backdate = false)
    val old = plant("oldfp", backdate = true)
    // a crashed builder's staging leak, fully past grace → reaped
    val crashed = plant("tok_somefp__build_layout_99999", backdate = true)
    // an ACTIVE long build: top dir mtime old, but a nested file is
    // fresh (parquet parts keep landing) — the old top-level-mtime gate
    // reaped exactly this mid-write (the round-12 ADVICE fix)
    val active = plant("tok_otherfp__build_layout_88888", backdate = true)
    java.nio.file.Files.writeString(
      new java.io.File(active, "part-live").toPath, "writing")
    try {
      assert(Rollup.prunedRangeStats(spark, d)._1.count() > 0)
      assert(young.exists(),
        "a stale sibling inside the grace period must survive the GC")
      assert(!old.exists(), "a stale sibling past the grace period must go")
      assert(!crashed.exists(), "a crashed staging leak past grace must go")
      assert(active.exists(),
        "a staging dir with a FRESH nested file is an active build and " +
          "must survive regardless of its top-level mtime")
    } finally {
      new java.io.File(tmp).listFiles().toSeq
        .filter(_.getName.startsWith(s"graft_q145_$pathKey"))
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    }
  }

  test("cache publish race: the loser adopts the winner's artifact without nesting a duplicate copy inside it") {
    // Hadoop FileSystem.rename into an EXISTING directory does not fail
    // like java.io.File.renameTo — the local FS copies the source INSIDE
    // it — so a lost publish race must be detected by the nested-copy
    // probe, not the rename's return value. Simulate the interleaving by
    // having the build closure itself publish the winner's table before
    // our rename runs.
    val root = java.nio.file.Files.createTempDirectory("race_root")
    try {
      spark.conf.set("spark.graft.cacheRoot", "file:" + root.toString)
      val src = java.nio.file.Files.createTempDirectory("race_src").toString
      val winnerMark = s"$root/winner_marker"
      val table = graft.ext.CorpusCache.materialize(spark, "graft_race",
        src, "fpX", "tok1", "variantA", { stage =>
          // The stage string is a scheme-qualified Hadoop URI
          // ("file:/tmp/..."); java.nio would treat it as a RELATIVE
          // path and litter the cwd, so strip the scheme first.
          val stageLocal = stage.stripPrefix("file:")
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(stageLocal))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(stageLocal, "payload"), "loser-build")
          // the "winner" publishes the same key first
          val winner = s"$root/graft_race_" +
            graft.ext.CorpusCache.md5Hex(src) + "_tok1_fpX/variantA"
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(winner))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(winner, "payload"), "winner-build")
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(winner, "_READY"), "ready")
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(winnerMark), "done")
        })
      val local = table.stripPrefix("file:")
      assert(new java.io.File(s"$local/_READY").exists())
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(local, "payload")) == "winner-build",
        "the winner's artifact must be the one served")
      val entries = new java.io.File(local).listFiles().map(_.getName).toSet
      assert(!entries.exists(_.contains("__build_")),
        s"loser's stage must not nest inside the published table: $entries")
      assert(!new java.io.File("file:").exists(),
        "the build closure must not litter the working directory with a " +
          "literal 'file:' tree (scheme-qualified URI fed to java.nio)")
    } finally {
      spark.conf.unset("spark.graft.cacheRoot")
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
    }
  }

  test("corpus caches honor a configurable non-tmpdir spark.graft.cacheRoot through the Hadoop FS API") {
    val d = java.nio.file.Files.createTempDirectory("cache_root_src").toString
    Tables.documents(spark, sf).write.parquet(s"$d/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_cache_root")
    try {
      spark.conf.set("spark.graft.cacheRoot", "file:" + root.toString)
      // q145 layout: builds + probes under the configured root
      val stats = Rollup.prunedRangeStats(spark, d)._1
      assert(stats.count() > 0)
      val entries = root.toFile.listFiles().toSeq.map(_.getName)
      assert(entries.exists(_.startsWith("graft_q145_")),
        s"layout cache must land under the configured root, got $entries")
      // pair frame: cached ≡ fresh through the configured root
      val cached = graft.ext.Dedup
        .jaccardPairsCached(spark, d.toString, 300, 0.3)
        .collect().map(_.toSeq).toSet
      val fresh = graft.ext.Dedup.jaccardPairs(
        Tables.documents(spark, sf).filter(col("doc_id") < 300)
          .select("doc_id", "text"), 0.3).collect().map(_.toSeq).toSet
      assert(cached == fresh,
        "pair frame served from a configured cache root diverges")
      val entries2 = root.toFile.listFiles().toSeq.map(_.getName)
      assert(entries2.exists(_.startsWith("graft_pairs_")),
        s"pair-frame cache must land under the configured root, got $entries2")
    } finally {
      spark.conf.unset("spark.graft.cacheRoot")
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
    }
  }

  test("bins index: 3-way append in any order ≡ one-shot; derivers read through a crash window") {
    import graft.queries.Profiling
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("bins_idx").toString
    // integer counts merge exactly, so a shuffled arrival order must be
    // byte-identical to the one-shot build (not just envelope-close)
    Rollup.buildBinsIndex(events.filter(col("event_id") % 3 === 2), dir)
    Rollup.appendToBinsIndex(spark, dir, events.filter(col("event_id") % 3 === 0))
    Rollup.appendToBinsIndex(spark, dir, events.filter(col("event_id") % 3 === 1))
    val idx = Rollup.readBinsIndex(spark, dir)
    val oneShot = Profiling.medianBins(events)
    assert(idx.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(idx).count() == 0,
      "appended bins diverge from the one-shot aggregate")
    // every bins deriver answers from the index alone
    val fromIdx = Profiling.medianFromBins(idx)
    val batch = Profiling.groupedExactMedian(events)
    assert(fromIdx.exceptAll(batch).count() == 0 &&
      batch.exceptAll(fromIdx).count() == 0,
      "index-derived medians disagree with the rank selection")
    // crash window: bins moved aside, publish not done — reader recovers
    val p = new java.io.File(dir + "/bins")
    assert(p.renameTo(new java.io.File(dir + "/bins__backup")))
    val recovered = Rollup.readBinsIndex(spark, dir)
    assert(recovered.exceptAll(oneShot).count() == 0,
      "backup recovery lost bins state")
  }
}

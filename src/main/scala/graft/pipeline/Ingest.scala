package graft.pipeline

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion stage (ref `src/ingestion.py`): the posts→orders synthesizer,
  * CSV/JSON directory readers with the reference's envelope tolerance, and
  * the multi-source name-aligned combine.
  *
  * The REST fetch itself (`src/ingestion.py:56-107`) is a driver-side
  * connector concern (session pooling / retry / rate limit); in this
  * zero-egress environment the synthesizer takes any posts-shaped
  * DataFrame, which is exactly what a DataSource V2 REST reader would
  * produce partition-by-partition at scale.
  */
object Ingest {

  /** Keyword → product map (`src/ingestion.py:174-182`). */
  final val ProductMapping: Seq[(String, String)] = Seq(
    "phone" -> "iPhone 15",
    "computer" -> "MacBook Pro",
    "music" -> "AirPods Pro",
    "watch" -> "Apple Watch",
    "tablet" -> "iPad Air",
    "game" -> "Nintendo Switch",
    "book" -> "Kindle Paperwhite")

  /** Fallback list indexed by title hash (`src/ingestion.py:188-190`).
    * The reference uses Python's process-seeded `hash()` — irreproducible
    * even run-to-run; we pin md5-prefix arithmetic, identical in any
    * engine (SURVEY.md §7.4 semantic-not-bitwise). */
  final val DefaultProducts =
    Seq("iPhone 15", "MacBook Pro", "AirPods Pro", "iPad Air", "Apple Watch")

  def productName(title: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lowered = lower(title)
    val hashIdx = pmod(conv(substring(md5(title), 1, 8), 16, 10).cast("long"),
      lit(DefaultProducts.length)).cast("int")
    val fallback = element_at(array(DefaultProducts.map(lit): _*), hashIdx + 1)
    ProductMapping.foldLeft(when(lit(false), "")) {
      case (acc, (k, p)) => acc.when(lowered.contains(k), p)
    }.otherwise(fallback)
  }

  /** posts(id, userId, title) → canonical order records
    * (`src/ingestion.py:110-160`); `asOf` pins the reference's
    * `datetime.now()` order/ingest dates. */
  def postsToOrders(posts: DataFrame, asOf: String = Enrich.DefaultAsOf): DataFrame =
    posts.select(
      format_string("API-%04d", col("id")).as("order_id"),
      concat(lit("Customer "), col("userId")).as("customer_name"),
      concat(lit("customer"), col("userId"), lit("@example.com")).as("customer_email"),
      productName(col("title")).as("product"),
      lit("Electronics").as("product_category"),
      lit(1).as("quantity"),
      graft.functions.Functions.round2(lit(50.0) + pmod(col("id"), lit(20)) * 25.99).as("price"),
      lit(0.0).as("discount"),
      lit(asOf).cast("date").as("order_date"),
      lit("api_rest").as("source"),
      lit(asOf).cast("timestamp").as("ingested_at"),
      col("id").as("api_post_id"))
      .withColumn("total_amount",
        graft.functions.Functions.round2(col("price") * col("quantity") - col("discount")))

  /** CSV directory scan (`src/ingestion.py:213-272`): header + inferred
    * schema + per-file provenance columns (S5). */
  def readCsvDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir)
      .withColumn("source", lit("file_csv"))
      .withColumn("source_file", input_file_name())

  /** JSON directory scan tolerating the reference's three envelope shapes
    * (`src/ingestion.py:293-305`): top-level array, {"orders": [...]},
    * single object. */
  def readJsonDir(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(dir)
    val unwrapped =
      if (!raw.columns.contains("orders")) raw
      else {
        // one directory can MIX envelope shapes: wrapped files carry rows
        // under `orders`, bare files (top-level array / single object)
        // carry them in top-level columns with orders = null after schema
        // merge — a bare explode would silently drop every bare-file row
        val wrapped = raw.filter(col("orders").isNotNull)
          .select(explode(col("orders")).as("o")).select("o.*")
        val bareCols = raw.columns.filterNot(_ == "orders")
        if (bareCols.isEmpty) wrapped
        else wrapped.unionByName(
          raw.filter(col("orders").isNull).select(bareCols.toIndexedSeq.map(col): _*),
          allowMissingColumns = true)
      }
    unwrapped
      .withColumn("source", lit("file_json"))
      .withColumn("source_file", input_file_name())
  }

  /** Batch-path mirror of the reference's processed/errors file moves
    * (`src/ingestion.py:243-252`): classify every data file at the top of
    * `dir` by whether parsing it produces any corrupt record, then rename
    * clean files into `processedDir` and corrupt ones into `errorsDir`.
    *
    * The classification is ONE distributed read with a per-file
    * any-corrupt aggregate — output is file-count-bounded driver metadata
    * (the partition-listing class) — and the moves are pure namenode
    * renames, no data copy, so the op costs one scan regardless of file
    * sizes. Files that parse to zero rows (empty) count as processed,
    * matching the reference's "no exception → processed" rule. Returns
    * (processedCount, errorCount). The streaming path gets the same
    * behavior from `cleanSource=archive` ([[graft.streaming.Streaming]]).
    *
    * Hostile names: files are first STAGED under glob-safe numbered
    * names (renames, no copies) because Spark path resolution treats
    * read paths as globs and comma-splits lists — and multiLine-json
    * schema inference re-globs even resolved paths. A `_names` manifest
    * in the staging dir maps staged → original; a crash mid-quarantine
    * is recovered on the next call by restoring originals (collision-
    * disambiguated) and reclassifying. Archive collisions with a
    * recurring drop name get a numbered suffix instead of wedging the
    * batch. Residual limitation: a glob-metacharacter in the DIRECTORY
    * path (not the file name) still breaks multiLine-json inference
    * inside Spark itself — csv, and json under a `contract` schema,
    * are immune.
    */
  def quarantineBatch(spark: SparkSession, dir: String, format: String,
      processedDir: String = null, errorsDir: String = null,
      contract: org.apache.spark.sql.types.StructType = null): (Long, Long) = {
    require(format == "csv" || format == "json",
      s"quarantineBatch: unsupported format $format")
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val procDir = new org.apache.hadoop.fs.Path(
      Option(processedDir).getOrElse(s"$dir/processed"))
    val errDir = new org.apache.hadoop.fs.Path(
      Option(errorsDir).getOrElse(s"$dir/errors"))
    // Spark treats read paths as GLOBS (and comma-splits path lists): a
    // file literally named `data[1].json` would match the wrong files or
    // abort the whole batch — and multiLine-json schema inference
    // re-globs RESOLVED paths internally, so escaping alone cannot save
    // it. A quarantine is a rename pipeline anyway, so normalize FIRST:
    // stage every file under a glob-safe numbered name, classify the
    // staged names, then archive under the original names. A `_names`
    // manifest inside the staging dir makes a crash recoverable: the
    // next run restores originals and reclassifies from scratch.
    val staging = new org.apache.hadoop.fs.Path(s"$dir/.quarantine_stage")
    val namesFile = new org.apache.hadoop.fs.Path(staging, "_names")
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    if (fs.exists(staging)) { // a previous run crashed mid-quarantine
      if (fs.exists(namesFile)) {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(namesFile), java.nio.charset.StandardCharsets.UTF_8))
        try {
          Iterator.continually(in.readLine()).takeWhile(_ != null).foreach { l =>
            val Array(stagedName, orig) = l.split("\t", 2)
            val sp = new org.apache.hadoop.fs.Path(staging, stagedName)
            if (fs.exists(sp)) {
              // never lose a staged file to a name collision with a
              // file that arrived after the crash
              val back = Iterator.single(
                new org.apache.hadoop.fs.Path(base, dec(orig)))
                .concat(Iterator.from(1).map(i =>
                  new org.apache.hadoop.fs.Path(base, s"${dec(orig)}.$i")))
                .find(!fs.exists(_)).get
              if (!fs.rename(sp, back))
                sys.error(s"quarantineBatch: could not restore $sp")
            }
          }
        } finally in.close()
      }
      fs.delete(staging, true)
    }
    // top-level data files only — already-archived subdirectories stay put
    val files = fs.listStatus(base).filter(_.isFile).map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
    if (files.isEmpty) return (0L, 0L)
    fs.mkdirs(staging)
    val ext = s".$format"
    val staged = files.zipWithIndex.map { case (f, i) =>
      (new org.apache.hadoop.fs.Path(staging, s"f_$i$ext"), f.getName)
    }
    val out = fs.create(namesFile, true)
    try out.write(staged.zipWithIndex.map { case ((sp, orig), _) =>
      s"${sp.getName}\t${enc(orig)}\n"
    }.mkString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    files.zip(staged).foreach { case (f, (sp, _)) =>
      if (!fs.rename(f, sp))
        sys.error(s"quarantineBatch: could not stage $f")
    }
    // the DIRECTORY path may still carry glob metacharacters even though
    // the staged file names cannot — escape the full path for the read
    def escapeGlob(p: String): String =
      p.replaceAll("([{}\\[\\]*?\\\\])", "\\\\$1")
    val paths = staged.map { case (sp, _) => escapeGlob(sp.toString) }.toSeq
    val parsed = format match {
      case "json" =>
        val r = spark.read.option("multiLine", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "__corrupt")
        // honor the caller's contract for json exactly like csv: rows
        // violating the declared types surface as corrupt records
        // instead of being re-inferred into acceptance
        Option(contract)
          .map(c => r.schema(c.add("__corrupt", "string")))
          .getOrElse(r)
          .json(paths: _*)
      case "csv" =>
        // corrupt-record capture needs a schema the bad rows VIOLATE: the
        // caller's contract schema when given (the reliable gate — pure
        // self-inference widens types to accommodate the very rows it
        // should reject), else one inferred from the batch (still catches
        // token-count breakage)
        val expected = Option(contract).getOrElse(
          spark.read.option("header", "true")
            .option("inferSchema", "true").csv(paths: _*).schema)
        spark.read.option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "__corrupt")
          .schema(expected.add("__corrupt", "string"))
          .csv(paths: _*)
    }
    // anchor the aggregate on EVERY data column: the readers refuse plans
    // whose only referenced column is the corrupt-record marker, and CSV
    // column pruning would skip parsing — and therefore corrupt-flagging —
    // any column the plan doesn't touch
    // (hash, not count(struct(…)): a count of a never-null struct is
    // constant-folded to count(1), which un-references the columns again)
    val dataCols = parsed.columns.filterNot(_ == "__corrupt")
    // an EVERY-file-corrupt batch infers a corrupt-only schema, and the
    // raw file readers refuse corrupt-column-only plans outright —
    // re-read under an explicit schema with a never-present probe column
    // so the plan always references a real data column
    val (classified, anchor) =
      if (dataCols.nonEmpty)
        (parsed, max(hash(dataCols.toIndexedSeq.map(col): _*)))
      else {
        val probeSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__probe",
            org.apache.spark.sql.types.StringType)))
        val reader = spark.read.option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "__corrupt")
          .schema(probeSchema.add("__corrupt", "string"))
        val re = format match {
          case "json" => reader.option("multiLine", "true").json(paths: _*)
          case "csv" => reader.option("header", "true").csv(paths: _*)
        }
        (re, count(col("__probe")))
      }
    val verdictCol =
      if (classified.columns.contains("__corrupt")) col("__corrupt").isNotNull
      else lit(false) // schema merge saw no corrupt rows anywhere
    val bad = classified
      .groupBy(input_file_name().as("__file"))
      .agg(max(verdictCol.cast("int")).as("__bad"), anchor.as("__n"))
      .filter(col("__bad") === 1)
      .collect() // one row per FILE — bounded metadata, not data
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    fs.mkdirs(procDir); fs.mkdirs(errDir)
    var (nProc, nErr) = (0L, 0L)
    staged.foreach { case (sp, origName) =>
      val target = if (bad.contains(sp.toUri.getPath)) errDir else procDir
      // a recurring drop name (yesterday's orders.csv already archived)
      // must not wedge the batch: rename refuses an existing target, so
      // disambiguate with a numbered suffix instead of aborting mid-loop
      val dest = Iterator.single(new org.apache.hadoop.fs.Path(target, origName))
        .concat(Iterator.from(1).map(i =>
          new org.apache.hadoop.fs.Path(target, s"$origName.$i")))
        .find(!fs.exists(_)).get
      if (!fs.rename(sp, dest))
        sys.error(s"quarantineBatch: could not move $sp to $dest")
      if (target == errDir) nErr += 1 else nProc += 1
    }
    fs.delete(staging, true)
    (nProc, nErr)
  }

  /** Multi-source combine (`src/ingestion.py:356-420`): name-aligned
    * null-filling union + deterministic keep-first dedup on order_id.
    * The reference's `keep='first'` after `pd.concat([api, csv, json])`
    * is really source priority by concat order — encoded here as an
    * explicit priority column so the semantics survive distribution. */
  def collectAll(sources: Seq[DataFrame]): DataFrame = {
    val prioritized = sources.zipWithIndex.map { case (df, i) =>
      df.withColumn("__src_priority", lit(i))
    }
    val unioned = prioritized.reduce(_.unionByName(_, allowMissingColumns = true))
    Clean.dedupKeepFirst(unioned,
        orderCols = "__src_priority" +: Clean.KeepFirstTiebreak)
      .drop("__src_priority")
  }

  // ---- registered queries ----------------------------------------------

  /** Posts synthesized deterministically from `documents` (id=doc_id+1,
    * userId from doc residue, title=text) → the S2 synthesizer, oracle-
    * checked including the md5 fallback branch. */
  val q34PostsToOrders: QuerySpec = QuerySpec(
    "q34_posts_to_orders",
    """WITH posts AS (
      |  SELECT doc_id + 1 AS id, doc_id % 10 + 1 AS userId, text AS title
      |  FROM documents)
      |SELECT
      |  printf('API-%04d', id) AS order_id,
      |  'Customer ' || userId AS customer_name,
      |  'customer' || userId || '@example.com' AS customer_email,
      |  CASE WHEN contains(lower(title), 'phone') THEN 'iPhone 15'
      |       WHEN contains(lower(title), 'computer') THEN 'MacBook Pro'
      |       WHEN contains(lower(title), 'music') THEN 'AirPods Pro'
      |       WHEN contains(lower(title), 'watch') THEN 'Apple Watch'
      |       WHEN contains(lower(title), 'tablet') THEN 'iPad Air'
      |       WHEN contains(lower(title), 'game') THEN 'Nintendo Switch'
      |       WHEN contains(lower(title), 'book') THEN 'Kindle Paperwhite'
      |       ELSE (['iPhone 15','MacBook Pro','AirPods Pro','iPad Air','Apple Watch'])[
      |         CAST(CAST(('0x' || substr(md5(title), 1, 8)) AS BIGINT) % 5 AS INT) + 1]
      |  END AS product,
      |  'Electronics' AS product_category,
      |  1 AS quantity,
      |  floor((50.0 + (id % 20) * 25.99) * 100 + 0.5) / 100 AS price,
      |  CAST(0.0 AS DOUBLE) AS discount,
      |  DATE '2002-01-01' AS order_date,
      |  'api_rest' AS source,
      |  TIMESTAMP '2002-01-01 00:00:00' AS ingested_at,
      |  id AS api_post_id,
      |  floor((floor((50.0 + (id % 20) * 25.99) * 100 + 0.5) / 100) * 100 + 0.5) / 100 AS total_amount
      |FROM posts
      |ORDER BY order_id""".stripMargin) { (s, dir) =>
    val posts = Tables.documents(s, dir).select(
      (col("doc_id") + 1).as("id"),
      (col("doc_id") % 10 + 1).as("userId"),
      col("text").as("title"))
    postsToOrders(posts).orderBy("order_id")
  }

  /** Batch twin of the streaming tumbling-window aggregation over
    * `events` (SURVEY.md §2.8): hourly windows × event_type. */
  val q35EventsWindow: QuerySpec = QuerySpec(
    "q35_events_window",
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  ${graft.functions.Functions.moneySumSql("value")} AS sum_value,
      |  floor(${graft.functions.Functions.moneySumSql("value")}
      |    / count(value) * 10000 + 0.5) / 10000 AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    // moneySum: exact integer-cents accumulation — the unordered float
    // sum was the one piece of this aggregate that could drift a rounding
    // boundary between engines (see Functions.moneySum)
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Functions.moneySum(col("value")).as("sum_value"),
        graft.functions.Functions.round4(
          graft.functions.Functions.moneySum(col("value")) / count(col("value")))
          .as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"))
      .orderBy("window_start", "event_type")
  }

  /** Semi-structured JSON extraction from `events.props`
    * (S4's payload-parsing capability in-plane). */
  val q36EventsJson: QuerySpec = QuerySpec(
    "q36_events_json",
    """SELECT event_type,
      |  count(*) AS n,
      |  floor(avg(CAST(json_extract_string(props, '$.k') AS INT)) * 10000 + 0.5) / 10000 AS avg_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Functions.round4(avg(col("k"))).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  val all: Seq[QuerySpec] = Seq(q34PostsToOrders, q35EventsWindow, q36EventsJson)
}

package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the batch-prep step between a cleaned corpus and a
  * pretraining data loader: documents are grouped into "bins" of roughly
  * `budget` tokens each, so every training sequence is assembled from one
  * bin with minimal padding.
  *
  * Packing is the classic offline bin-packing problem; the streaming-
  * friendly industrial approximation used here is cumulative-offset
  * binning: within a shard, lay documents end-to-end in a deterministic
  * order and cut every `budget` tokens — a document whose START offset
  * falls in bin k belongs to bin k (so a bin can overflow by at most one
  * document's tokens; the loader truncates or spills, exactly as with
  * concatenate-and-chunk pretraining pipelines).
  *
  * The 100 TB shape: a GLOBAL cumulative sum would be a single-partition
  * window — the canonical scale anti-pattern — so packing is per SHARD:
  * the shard is a deterministic md5 bucket of the key ([[Sampling.hashBucket]]
  * arithmetic, so shard membership survives re-partitioning and engine
  * changes), shards are independent (windows partition by shard → one
  * exchange on shard id, every shard's prefix-sum runs parallel), and the
  * shard count — not data size — bounds the window state. Everything is
  * expressible as one window aggregate: fully deterministic, so q62
  * carries a value-level DuckDB oracle replaying the same window.
  */
object Packing {

  /** Assign each row a (shard, bin, start_offset) under a token budget.
    * `tokenCol` must be a per-row token count expression. */
  def packSequences(df: DataFrame, key: Column, tokenCol: Column,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    val sharded = df
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("shard", Sampling.hashBucket(key, shards, salt = "pack:"))
    // running total INCLUSIVE of the current row, minus the row itself =
    // the row's start offset in its shard's concatenated token stream
    val w = Window.partitionBy(col("shard")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("start_offset") / budget).cast("long"))
  }

  /** q62: pack the documents corpus into 2048-token bins across 8 shards
    * (whitespace token counts, q24's arithmetic), summarized per
    * (shard, bin) so the oracle pins the full packing plan: how many
    * docs land in each bin, the tokens packed, and the bin's start
    * boundaries. */
  val q62SequencePacking: QuerySpec = QuerySpec(
    "q62_sequence_packing",
    s"""WITH t AS (
      |  SELECT doc_id,
      |    ${Sampling.hashBucketSql("doc_id", 8, "pack:")} AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
      |  FROM t)
      |SELECT shard, CAST(floor(CAST(start_offset AS DOUBLE) / 2048) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM o GROUP BY 1, 2
      |ORDER BY shard, bin""".stripMargin) { (s, dir) =>
    packSequences(Tables.documents(s, dir), col("doc_id"),
      size(TextAnalysis.tokens(col("text"))), budget = 2048L, shards = 8)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_packed"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "bin")
  }

  /** Extend an existing packing with a new batch WITHOUT repacking — the
    * incremental form of [[packSequences]] for append-only ingest: per
    * shard, the batch's documents continue from the shard's current
    * end-of-stream offset. Equivalence contract: when every batch key
    * sorts after the shard's existing keys (monotone ids — the
    * append-only case), `resume(pack(A), B) ≡ pack(A ∪ B)` row for row —
    * the existing manifest rows are untouched by construction, so the
    * property is proven by the q101 oracle (which packs the union from
    * scratch) and differentially in ExtSpec over random splits.
    *
    * Scale shape: the carried state is ONE aggregate row per shard (the
    * end offset = max(start+len), an order-independent max), broadcast
    * into the batch's packing; the manifest is never re-shuffled or
    * rewritten — each increment is O(batch) work plus a shards-row
    * manifest aggregate, which is what makes per-batch manifest
    * maintenance viable at corpus scale (a full repack per batch would
    * re-window the whole corpus). */
  def resumePacking(manifest: DataFrame, newDocs: DataFrame, key: Column,
      tokenCol: Column, budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val ends = manifest.groupBy("shard")
      .agg(max(col("start_offset") + col("n_tokens")).as("__base"))
    packSequences(newDocs, key, tokenCol, budget, shards)
      .drop("bin")
      .join(broadcast(ends), Seq("shard"), "left")
      .withColumn("start_offset",
        col("start_offset") + coalesce(col("__base"), lit(0L)))
      .withColumn("bin", floor(col("start_offset") / budget).cast("long"))
      .drop("__base")
  }

  /** q101: incremental packing — docs < 250 are the existing manifest,
    * the rest arrive as a batch and resume per-shard; the oracle packs
    * the WHOLE corpus from scratch (q62's window arithmetic at 1024×4),
    * so a full match proves incremental ≡ batch value-level. */
  val q101PackingResume: QuerySpec = QuerySpec(
    "q101_packing_resume",
    s"""WITH t AS (
      |  SELECT doc_id,
      |    ${Sampling.hashBucketSql("doc_id", 4, "pack:")} AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
      |  FROM t)
      |SELECT shard, CAST(floor(CAST(start_offset AS DOUBLE) / 1024) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM o GROUP BY 1, 2
      |ORDER BY shard, bin""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tok = size(TextAnalysis.tokens(col("text")))
    val manifest = packSequences(
      docs.filter(col("doc_id") < 250), col("doc_id"), tok, 1024L, 4)
    val resumed = resumePacking(
      manifest, docs.filter(col("doc_id") >= 250), col("doc_id"), tok, 1024L, 4)
    manifest.select("doc_id", "shard", "n_tokens", "start_offset", "bin")
      .unionByName(resumed.select("doc_id", "shard", "n_tokens", "start_offset", "bin"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_packed"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "bin")
  }

  /** Split each document into overlapping token windows — the
    * context-length chunking step between a cleaned corpus and embedding
    * / pretraining consumers (window = model context budget, stride <
    * window gives the standard sliding overlap so no boundary text is
    * lost). Chunk ids derive from the start position, so they are stable
    * under re-partitioning; the final short tail chunk is kept (the
    * loader pads or merges it).
    *
    * Scale shape: one scan-local explode per document — no shuffle, no
    * state; output size is n_tokens/stride rows per doc. */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // stride > window would skip tokens between consecutive chunks,
    // breaking the no-boundary-text-lost contract the doc promises (and
    // the tiling property test assumes) — reject rather than silently gap
    require(stride <= window,
      s"stride must be <= window for gap-free coverage, got stride=$stride window=$window")
    // a start position is generated only if the PREVIOUS window did not
    // already reach the document's end — without this, any doc whose
    // length lands in the overlap zone emits a final chunk that is a
    // strict subset of the one before it (duplicate training text)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("n_tokens"),
        explode(expr(
          s"transform(filter(sequence(1, size(w), $stride), " +
            s"s -> s = 1 OR s - $stride + ${window - 1} < size(w)), " +
            s"s -> struct(s AS start, concat_ws(' ', slice(w, s, $window)) AS txt))"))
          .as("c"))
      .select(col("doc_id"),
        (floor((col("c.start") - 1) / lit(stride.toDouble)) + 1).cast("int")
          .as("chunk_idx"),
        col("c.start").cast("int").as("start_token"),
        least(lit(window), col("n_tokens") - col("c.start") + 1).cast("int")
          .as("n_chunk_tokens"),
        md5(col("c.txt")).as("chunk_hash"))
  }

  /** q73: 32-token windows with stride 24 (8-token overlap) over the full
    * corpus; the md5 chunk hash pins every chunk's exact text. */
  val q73DocumentChunks: QuerySpec = QuerySpec(
    "q73_document_chunks",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (
      |  SELECT doc_id, len(w) AS n_tokens,
      |    unnest(list_transform(list_filter(generate_series(1, len(w), 24),
      |      s -> s = 1 OR s - 24 + 31 < len(w)),
      |      s -> {'start': s, 'txt': array_to_string(w[s:s+31], ' ')})) AS u
      |  FROM d)
      |SELECT doc_id,
      |  CAST(floor((u.start - 1) * 1.0 / 24) AS INT) + 1 AS chunk_idx,
      |  CAST(u.start AS INT) AS start_token,
      |  CAST(least(32, n_tokens - u.start + 1) AS INT) AS n_chunk_tokens,
      |  md5(u.txt) AS chunk_hash
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    chunkDocuments(Tables.documents(s, dir), window = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
  }

  final val AssemblyBudget = 2048L
  final val AssemblyShards = 8
  final val AssemblyEpoch = 1

  /** Epoch assembly — the sampling-family capstone (what q75's manifest
    * is for the dedup family): corpus → target token mixture
    * ([[Sampling.tokenMixture]]) → deterministic epoch order (the
    * [[Sampling.epochShuffle]] construction, keyed by the (doc, copy)
    * INSTANCE so repeated epochs of an upsampled doc scatter
    * independently instead of packing back-to-back) → per-shard
    * cumulative-offset bins ([[packSequences]]'s window). One declarative
    * DAG producing exactly what a pretraining loader consumes: for every
    * training instance, its shard, bin, and start offset in the shard's
    * token stream — reproducible across runs, engines, partitionings,
    * and cluster sizes.
    *
    * Scale shape is the union of its stages' shapes, all already
    * plan-guarded individually: one rate-pass agg (driver-reduced
    * metadata), then ONE apply pass whose only exchange is the shard
    * partition and whose only ordered step is the per-shard window. */
  def assembleEpoch(docs: DataFrame,
      sharePctBySource: Seq[(String, Int)] = Sampling.TokenShares,
      epoch: Int = AssemblyEpoch, budget: Long = AssemblyBudget,
      shards: Int = AssemblyShards): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    val inst = concat(col("doc_id").cast("string"), lit(":"),
      col("copy").cast("string"))
    val sharded = Sampling.tokenMixture(docs, sharePctBySource)
      .withColumn("shard",
        Sampling.hashBucket(inst, shards, salt = s"epoch$epoch:"))
      .withColumn("ord", md5(concat(lit(s"order$epoch:"), inst)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"), col("copy"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("start_offset") / budget).cast("long"))
      .select("doc_id", "copy", "source", "shard", "bin", "n_tokens",
        "start_offset")
  }

  /** q92: the epoch assembly summarized per (shard, bin) — the oracle
    * replays mixture rates (q91's integer CTEs), the instance-keyed
    * shuffle order, and the packing window in one statement, pinning the
    * whole composition. */
  val q92EpochAssembly: QuerySpec = {
    val instSql = "CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)"
    QuerySpec(
      "q92_epoch_assembly",
      s"""WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT sum(n_tokens) AS total_tokens FROM tok),
        |rates AS (
        |  SELECT source,
        |    ((t.total_tokens * (CASE source ${Sampling.TokenShares.map {
            case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")} ELSE 0 END)) // 100)
        |      // sum(n_tokens) AS full_copies,
        |    ((((t.total_tokens * (CASE source ${Sampling.TokenShares.map {
            case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")} ELSE 0 END)) // 100)
        |      % sum(n_tokens)) * 100) // sum(n_tokens) AS frac_pct
        |  FROM tok, tot t GROUP BY source, t.total_tokens),
        |c AS (
        |  SELECT tok.doc_id, tok.source, tok.n_tokens,
        |    CAST(r.full_copies + (CASE WHEN ${Sampling.hashBucketSql(
            "doc_id", 100, "tokmix:")}
        |      < r.frac_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
        |  FROM tok JOIN rates r ON tok.source = r.source),
        |x AS (
        |  SELECT doc_id, source, n_tokens,
        |    unnest(generate_series(0, n_copies - 1)) AS copy
        |  FROM c WHERE n_copies > 0),
        |y AS (
        |  SELECT doc_id, source, n_tokens, copy,
        |    ${Sampling.hashBucketSql(instSql, AssemblyShards,
            s"epoch$AssemblyEpoch:")} AS shard,
        |    md5('order$AssemblyEpoch:' || $instSql) AS ord
        |  FROM x),
        |o AS (
        |  SELECT shard, n_tokens, doc_id,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id, copy
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS start_offset
        |  FROM y)
        |SELECT shard,
        |  CAST(floor(CAST(start_offset AS DOUBLE) / $AssemblyBudget) AS BIGINT) AS bin,
        |  count(*) AS n_instances, CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM o GROUP BY 1, 2
        |ORDER BY shard, bin""".stripMargin) { (s, dir) =>
      assembleEpoch(Tables.documents(s, dir))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_instances"),
          sum(col("n_tokens")).as("tokens_packed"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("shard", "bin")
    }
  }

  // ---- packing efficiency audit ------------------------------------------

  /** Packing efficiency audit — the padding/truncation accounting a
    * pretraining loader team reads before accepting a packed manifest:
    * cumulative-offset binning trades the NP-hard bin pack for a single
    * window, at the cost of bins that under-fill (padding the loader
    * burns compute on) or overflow by their last document's tail (tokens
    * a truncate-policy loader drops). Per shard: bin count, packed
    * tokens, padded and truncated tokens under the budget, and the fill
    * ratio — the number that justifies (or indicts) the budget choice.
    *
    * Scale shape: the [[packSequences]] plan plus two map-side-combined
    * aggregates (bins, then shards) — nothing new moves; the per-bin
    * load rows are metadata scale (corpus tokens / budget). */
  def packingEfficiency(docs: DataFrame, key: Column, tokenCol: Column,
      budget: Long, shards: Int): DataFrame = {
    import graft.functions.Functions.round4
    val binLoads = packSequences(docs, key, tokenCol, budget, shards)
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("load"))
    binLoads.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("load")).as("tokens_packed"),
        sum(greatest(lit(0L), lit(budget) - col("load"))).as("padded_tokens"),
        sum(greatest(lit(0L), col("load") - lit(budget))).as("truncated_tokens"))
      .select(col("shard"), col("n_bins"), col("tokens_packed"),
        col("padded_tokens"), col("truncated_tokens"),
        round4(col("tokens_packed").cast("double")
          / (col("n_bins") * budget)).as("fill_ratio"))
  }

  /** q105: the audit over q62's exact packing (2048-token bins, 8
    * shards) — the oracle replays the q62 window and folds the same
    * greatest-arithmetic per bin. */
  val q105PackingEfficiency: QuerySpec = QuerySpec(
    "q105_packing_efficiency", {
      import graft.functions.Functions.round4Sql
      s"""WITH t AS (
        |  SELECT doc_id,
        |    ${Sampling.hashBucketSql("doc_id", 8, "pack:")} AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
        |  FROM t),
        |b AS (
        |  SELECT shard, CAST(floor(CAST(start_offset AS DOUBLE) / 2048) AS BIGINT) AS bin,
        |    CAST(sum(n_tokens) AS BIGINT) AS load
        |  FROM o GROUP BY 1, 2)
        |SELECT shard, count(*) AS n_bins,
        |  CAST(sum(load) AS BIGINT) AS tokens_packed,
        |  CAST(sum(greatest(0, 2048 - load)) AS BIGINT) AS padded_tokens,
        |  CAST(sum(greatest(0, load - 2048)) AS BIGINT) AS truncated_tokens,
        |  ${round4Sql("CAST(sum(load) AS DOUBLE) / (count(*) * 2048)")} AS fill_ratio
        |FROM b GROUP BY shard
        |ORDER BY shard""".stripMargin
    }) { (s, dir) =>
    packingEfficiency(Tables.documents(s, dir), col("doc_id"),
      size(TextAnalysis.tokens(col("text"))), budget = 2048L, shards = 8)
      .orderBy("shard")
  }

  // ---- length-bucketed batching audit ------------------------------------

  final val LengthBuckets: Seq[Int] = Seq(16, 32, 64, 128, 256, 512)

  /** Power-of-two padded-length class for a token count — the bucketed
    * batching rule (batch sequences of similar length together, pad to
    * the class size, not the batch/corpus max). */
  def lengthBucket(n: Column): Column =
    LengthBuckets.init.foldLeft(when(lit(false), 0)) {
      case (acc, b) => acc.when(n <= b, b)
    }.otherwise(LengthBuckets.last).cast("long")

  private def lengthBucketSql(nExpr: String): String =
    "CAST(CASE " + LengthBuckets.init.map(b =>
      s"WHEN $nExpr <= $b THEN $b").mkString(" ") +
      s" ELSE ${LengthBuckets.last} END AS BIGINT)"

  /** Length-bucketed batching audit — pad-to-class vs pad-to-corpus-max
    * accounting: dynamic-padding loaders group sequences into length
    * classes precisely because padding every sequence to the global max
    * burns attention FLOPs on pad tokens. Per class: membership, real
    * tokens, padding under the class size, padding the naive global-max
    * policy would have spent, and the class utilization — the table that
    * justifies the bucket boundaries.
    *
    * Scale shape: token counts and class assignment are scan-local; ONE
    * map-side-combined aggregate at class cardinality; the global max
    * rides a 1-row broadcast. No window, no join on data rows. */
  def lengthBucketAudit(docs: DataFrame): DataFrame = {
    import graft.functions.Functions.round4
    val base = docs.select(
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
    val mx = broadcast(base.agg(max(col("n")).as("max_n")))
    base
      .withColumn("bucket_len", lengthBucket(col("n")))
      .crossJoin(mx)
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        sum(col("bucket_len") - col("n")).as("padded_tokens"),
        sum(col("max_n") - col("n")).as("naive_padded_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("n_tokens"),
        col("padded_tokens"), col("naive_padded_tokens"),
        round4(col("n_tokens").cast("double")
          / (col("n_docs") * col("bucket_len"))).as("util_pct"))
  }

  /** q109: the bucketed-batching audit over the corpus. */
  val q109LengthBuckets: QuerySpec = QuerySpec(
    "q109_length_buckets", {
      import graft.functions.Functions.round4Sql
      s"""WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |m AS (SELECT max(n) AS max_n FROM t),
        |b AS (SELECT n, ${lengthBucketSql("n")} AS bucket_len FROM t)
        |SELECT bucket_len, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(sum(bucket_len - n) AS BIGINT) AS padded_tokens,
        |  CAST(sum(max_n - n) AS BIGINT) AS naive_padded_tokens,
        |  ${round4Sql("CAST(sum(n) AS DOUBLE) / (count(*) * bucket_len)")} AS util_pct
        |FROM b CROSS JOIN m
        |GROUP BY bucket_len
        |ORDER BY bucket_len""".stripMargin
    }) { (s, dir) =>
    lengthBucketAudit(Tables.documents(s, dir)).orderBy("bucket_len")
  }

  val all: Seq[QuerySpec] = Seq(q62SequencePacking, q73DocumentChunks,
    q92EpochAssembly, q101PackingResume, q105PackingEfficiency,
    q109LengthBuckets)
}

package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model quality scoring — the CCNet-style filter: score each
  * document by how probable its token sequence is under an n-gram model
  * trained on the corpus itself, then flag the low-probability tail
  * (boilerplate, gibberish, wrong-language residue score low).
  *
  * The model is a bigram conditional P(b|a) = c(a,b) / Σ_b' c(a,b') —
  * two hash aggregates over one token-pair explode. The per-doc score is
  * the mean bigram probability. Real pipelines score log-perplexity
  * under a pruned KenLM; the mean-probability form keeps every step
  * RATIONAL (ratios of bigint counts — no transcendental, no
  * cross-engine ulp), which is what lets q76 carry a full value-level
  * oracle. Each probability is quantized to integer MICRO-units
  * scan-locally before the per-doc aggregate (the moneySum trick at
  * 1e-6), so the unordered sum is exact integer arithmetic.
  *
  * Scale shape: the model is vocab²-bounded and broadcast; doc scoring
  * is one explode → broadcast probe → one doc_id aggregate. Nothing
  * shuffles the corpus on text. At real scale the broadcast side is the
  * PRUNED model ([[prunedBigramModel]]: top-K continuations per prefix,
  * misses scored with a smoothing floor — q78) whose size is vocab×K
  * instead of vocab²; the exact model (q76) doubles as its oracle anchor
  * (with K above the max continuation fan-out the two scorers are
  * proven identical, see ExtSpec).
  */
object LmScore {

  /** Continuations kept per prefix in the pruned model. */
  final val PrunedTopK = 3
  /** Micro-probability floor for bigrams the pruned model dropped —
    * the (integer, cross-engine-exact) stand-in for backoff smoothing. */
  final val PrunedSmoothMicro = 100L

  /** Bigram (token_a, token_b) occurrence rows, one per position. */
  private def bigramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))

  /** Conditional bigram model over the corpus: (a, b, p_micro) where
    * p_micro = round(c(a,b) / c(a,·) · 1e6) — integer micro-probability. */
  def bigramModel(docs: DataFrame): DataFrame = {
    val counts = bigramRows(docs).groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val prefix = counts.groupBy("a").agg(sum(col("c_ab")).as("c_a"))
    counts.join(prefix, "a")
      .select(col("a"), col("b"),
        floor(col("c_ab").cast("double") / col("c_a") * 1e6 + 0.5)
          .cast("long").as("p_micro"))
  }

  /** Top-K-per-prefix pruning of [[bigramModel]]: keep the K most frequent
    * continuations of each prefix (ties broken by token — deterministic in
    * both engines), probabilities still normalized by the FULL prefix
    * total, so retained entries keep their true conditional probability
    * (the standard pruned-LM normalization). Model size drops from vocab²
    * to vocab×K — what makes the broadcast feasible at a real vocab. */
  def prunedBigramModel(docs: DataFrame, k: Int = PrunedTopK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = bigramRows(docs).groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val prefix = counts.groupBy("a").agg(sum(col("c_ab")).as("c_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("c_ab").desc, col("b"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .join(prefix, "a")
      .select(col("a"), col("b"),
        floor(col("c_ab").cast("double") / col("c_a") * 1e6 + 0.5)
          .cast("long").as("p_micro"))
  }

  /** Per-doc mean bigram probability under the PRUNED model: bigrams the
    * model dropped score the smoothing floor via a left probe (same
    * broadcast join shape as [[scoreDocs]]; `n_hits` makes the coverage
    * observable). */
  def scoreDocsPruned(docs: DataFrame, k: Int = PrunedTopK,
      smoothMicro: Long = PrunedSmoothMicro,
      minMeanProb: Double = 0.033): DataFrame = {
    val model = prunedBigramModel(docs, k)
    bigramRows(docs)
      .join(broadcast(model), Seq("a", "b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("p_micro").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(coalesce(col("p_micro"), lit(smoothMicro))).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hits"),
        graft.functions.Functions.round6(
          col("sum_micro").cast("double") / col("n_bigrams") / 1e6)
          .as("mean_prob"),
        (col("sum_micro").cast("double") / col("n_bigrams") / 1e6 < minMeanProb)
          .as("low_quality"))
  }

  /** Per-doc mean bigram probability under [[bigramModel]], plus the
    * low-quality flag at `minMeanProb`. */
  def scoreDocs(docs: DataFrame, minMeanProb: Double): DataFrame = {
    val model = bigramModel(docs)
    bigramRows(docs)
      .join(broadcast(model), Seq("a", "b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.functions.Functions.round6(
          col("sum_micro").cast("double") / col("n_bigrams") / 1e6)
          .as("mean_prob"),
        (col("sum_micro").cast("double") / col("n_bigrams") / 1e6 < minMeanProb)
          .as("low_quality"))
  }

  /** q76: LM scores over the full corpus (threshold at the corpus's own
    * low-probability tail). Self-trained, so every doc bigram exists in
    * the model and the probe join is lossless — a held-out model would
    * add a smoothing constant to both sides. */
  val q76LmScore: QuerySpec = QuerySpec(
    "q76_lm_score",
    """WITH bg AS (
      |  SELECT doc_id, u.a AS a, u.b AS b FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
      |      i -> {'a': w[i], 'b': w[i+1]})) AS u
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |          WHERE len(string_split(text, ' ')) >= 2))),
      |counts AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
      |prefix AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM counts GROUP BY a),
      |model AS (
      |  SELECT counts.a, counts.b,
      |    CAST(floor(CAST(c_ab AS DOUBLE) / c_a * 1e6 + 0.5) AS BIGINT) AS p_micro
      |  FROM counts JOIN prefix ON counts.a = prefix.a),
      |scored AS (
      |  SELECT bg.doc_id, count(*) AS n_bigrams,
      |    CAST(sum(p_micro) AS BIGINT) AS sum_micro
      |  FROM bg JOIN model ON bg.a = model.a AND bg.b = model.b
      |  GROUP BY bg.doc_id)
      |SELECT doc_id, n_bigrams,
      |  floor(CAST(sum_micro AS DOUBLE) / n_bigrams / 1e6 * 1000000 + 0.5) / 1000000 AS mean_prob,
      |  (CAST(sum_micro AS DOUBLE) / n_bigrams / 1e6 < 0.033) AS low_quality
      |FROM scored
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    scoreDocs(Tables.documents(s, dir), minMeanProb = 0.033)
      .orderBy("doc_id")
  }

  /** q78: LM scores under the pruned top-K model — the broadcast that
    * actually ships at a real vocabulary. Same rational micro-unit
    * arithmetic as q76, so the oracle replays the pruning (row_number
    * with the same deterministic tiebreak) value-exactly. */
  val q78LmScorePruned: QuerySpec = QuerySpec(
    "q78_lm_score_pruned",
    s"""WITH bg AS (
      |  SELECT doc_id, u.a AS a, u.b AS b FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
      |      i -> {'a': w[i], 'b': w[i+1]})) AS u
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |          WHERE len(string_split(text, ' ')) >= 2))),
      |counts AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
      |prefix AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM counts GROUP BY a),
      |pruned AS (
      |  SELECT a, b, p_micro FROM (
      |    SELECT counts.a, counts.b,
      |      CAST(floor(CAST(c_ab AS DOUBLE) / c_a * 1e6 + 0.5) AS BIGINT) AS p_micro,
      |      row_number() OVER (PARTITION BY counts.a
      |        ORDER BY c_ab DESC, counts.b) AS rk
      |    FROM counts JOIN prefix ON counts.a = prefix.a)
      |  WHERE rk <= $PrunedTopK),
      |scored AS (
      |  SELECT bg.doc_id, count(*) AS n_bigrams,
      |    CAST(sum(CASE WHEN p.p_micro IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |    CAST(sum(coalesce(p.p_micro, $PrunedSmoothMicro)) AS BIGINT) AS sum_micro
      |  FROM bg LEFT JOIN pruned p ON bg.a = p.a AND bg.b = p.b
      |  GROUP BY bg.doc_id)
      |SELECT doc_id, n_bigrams, n_hits,
      |  floor(CAST(sum_micro AS DOUBLE) / n_bigrams / 1e6 * 1000000 + 0.5) / 1000000 AS mean_prob,
      |  (CAST(sum_micro AS DOUBLE) / n_bigrams / 1e6 < 0.033) AS low_quality
      |FROM scored
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    scoreDocsPruned(Tables.documents(s, dir)).orderBy("doc_id")
  }

  // ---- PMI collocation mining --------------------------------------------

  final val CollocMinSupport = 8
  final val CollocTopK = 25

  /** Collocation mining — pointwise-mutual-information scoring of adjacent
    * token pairs, the association signal phrase/tokenizer induction and
    * boilerplate forensics read (a pair glued far above chance is a fixed
    * phrase): PMI ratio = p(ab) / (p(a)·p(b)) with p(ab) = c_ab/M over
    * bigram positions and p(a) = c_a/N over token positions, kept as a
    * RATIONAL ratio quantized to micro-units (no log — the q68/q76 rule),
    * which preserves the PMI ORDER exactly. A minimum support floor keeps
    * the rare-pair ratio explosion (the classic PMI failure mode) out of
    * the ranking.
    *
    * Scale shape: bigram and unigram counts are the two [[bigramModel]]
    * aggregates (map-side combined); totals fold to one broadcast row;
    * the unigram table broadcasts into the surviving ≥minSupport pairs
    * (vocab-sized — the same broadcast budget as the exact bigram model,
    * with the same pruned-at-real-vocab note); top-k plans as
    * TakeOrdered. */
  def collocations(docs: DataFrame, minSupport: Int = CollocMinSupport,
      k: Int = CollocTopK): DataFrame = {
    require(minSupport >= 1 && k >= 1, "collocation params must be positive")
    val counts = bigramRows(docs).groupBy("a", "b")
      .agg(count(lit(1)).as("c_ab"))
    val uni = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c_ab")).as("m_bigrams"))
      .crossJoin(uni.agg(sum(col("c")).as("n_tokens")))
    val ratio = (col("c_ab").cast("double") / col("m_bigrams")) /
      ((col("c_a").cast("double") / col("n_tokens")) *
        (col("c_b").cast("double") / col("n_tokens")))
    counts.filter(col("c_ab") >= minSupport)
      .join(broadcast(uni.select(col("t").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(uni.select(col("t").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        floor(ratio * 1e6 + 0.5).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(k)
  }

  /** q126: top collocations by micro-exact PMI ratio. */
  val q126Collocations: QuerySpec = QuerySpec(
    "q126_collocations",
    s"""WITH bg AS (
      |  SELECT u.a AS a, u.b AS b FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |      i -> {'a': w[i], 'b': w[i+1]})) AS u
      |    FROM (SELECT string_split(text, ' ') AS w FROM documents
      |          WHERE len(string_split(text, ' ')) >= 2))),
      |counts AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY a, b),
      |uni AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t <> '' GROUP BY t),
      |tt AS (
      |  SELECT (SELECT CAST(sum(c_ab) AS BIGINT) FROM counts) AS m_bigrams,
      |    (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_tokens)
      |SELECT counts.a, counts.b, c_ab,
      |  ua.c AS c_a, ub.c AS c_b,
      |  CAST(floor((CAST(c_ab AS DOUBLE) / m_bigrams) /
      |    ((CAST(ua.c AS DOUBLE) / n_tokens) * (CAST(ub.c AS DOUBLE) / n_tokens))
      |    * 1e6 + 0.5) AS BIGINT) AS pmi_micro
      |FROM counts
      |  JOIN uni ua ON ua.t = counts.a
      |  JOIN uni ub ON ub.t = counts.b
      |  CROSS JOIN tt
      |WHERE c_ab >= $CollocMinSupport
      |ORDER BY pmi_micro DESC, a, b
      |LIMIT $CollocTopK""".stripMargin) { (s, dir) =>
    collocations(Tables.documents(s, dir))
  }

  val all: Seq[QuerySpec] = Seq(q76LmScore, q78LmScorePruned, q126Collocations)
}

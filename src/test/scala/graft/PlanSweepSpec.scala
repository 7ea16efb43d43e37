package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Global physical-plan floor for the ENTIRE query registry — the guard
  * that no FUTURE query (or refactor of a shared helper) ships the one
  * plan class that cannot survive 100 TB, without anyone remembering to
  * add a per-query guard (PlanQualitySpec pins deeper per-query shapes):
  *
  *  1. `CartesianProductExec` is banned outright — a shuffled data×data
  *     cross product has no 100 TB story.
  *  2. `BroadcastNestedLoopJoinExec` must broadcast a REDUCTION: its
  *     build side must contain an aggregate / limit / literal relation
  *     on every scan path. Broadcasting a 1-row global aggregate (the
  *     scalar-threshold pattern), k centroids, or a literal query set is
  *     the legitimate — and bounded — use; a BNLJ whose broadcast side
  *     is a raw unreduced table scan would ship the table to every
  *     executor and is exactly as scale-hostile as a cartesian.
  */
class PlanSweepSpec extends SparkSpec {

  /** The adjudicated exceptions: each broadcasts a CALLER-BOUNDED panel
    * (a filtered query set or the documented exact-baseline side) that the
    * plan cannot prove is a reduction. All six are the brute-force
    * baseline / audit twins of operators whose scale path ships
    * separately (q33/q44 LSH+IVF ANN, q46 LSH near-dup, q85 SemDeDup);
    * the audits exist precisely to measure those scale paths' recall.
    * Nothing may join this list without the same written adjudication. */
  private val baselineBnljAllowed: Set[String] = Set(
    "q31_cosine_topk", // exact top-k baseline: broadcast query panel
    "q45_embedding_neardup", // exact near-dup baseline (LSH twin = q46)
    "q97_ann_recall", // recall audit re-runs the q31 exact chain
    "q112_hard_negatives", // mines vs the exact chain on a query panel
    "q113_ann_mrr", // MRR audit re-runs the exact chain
    "q123_jl_distortion") // JL audit: exact pairwise on a sampled panel

  private val reducedNodes = Set(
    "HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec",
    "GlobalLimitExec", "LocalLimitExec", "CollectLimitExec",
    "TakeOrderedAndProjectExec")
  private val rawScanNodes = Set("FileSourceScanExec", "BatchScanExec",
    "RowDataSourceScanExec")

  /** Every plan reachable from `p`: the main tree plus, recursively, the
    * plans hanging off scalar/IN/EXISTS subquery expressions at ANY node
    * — `collect` alone never descends into those, so a cartesian inside
    * a threshold subquery would otherwise escape the floor. */
  private def withSubqueryPlans(p: SparkPlan): Seq[SparkPlan] =
    p +: p.collect { case n => n.subqueries }.flatten
      .collect { case sp: SparkPlan => sp }
      .flatMap(withSubqueryPlans)

  private def offences(root: SparkPlan): Seq[String] =
    withSubqueryPlans(root).flatMap(offencesOne).distinct

  private def offencesOne(plan: SparkPlan): Seq[String] = {
    val carts = plan.collect {
      case p if p.getClass.getSimpleName == "CartesianProductExec" =>
        "CartesianProduct"
    }
    val badBnlj = plan.collect {
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        val names = build.collect { case n => n.getClass.getSimpleName }
        val raw = names.exists(rawScanNodes)
        val reduced = names.exists(reducedNodes)
        if (raw && !reduced)
          Some("BroadcastNestedLoopJoin over an UNREDUCED scan")
        else None
    }.flatten
    carts ++ badBnlj
  }

  /** Queries adjudicated to carry an UNPARTITIONED WindowExec: each
    * global window rides a metadata frame (bins / digit classes /
    * stripes / band thresholds / bootstrap means — cardinality set by a
    * value DOMAIN or a constant, never by corpus size, each loudly
    * guarded at its documented bound), where one partition is the
    * point: the whole frame is at most a few thousand rows. Nothing may
    * join this list without the same written adjudication in the
    * operator's scaladoc. */
  private val metadataGlobalWindowAllowed: Set[String] = Set(
    "q158_ks_drift", // CDF cum over value-domain bins (binsGuard)
    "q159_mann_whitney", // rank cum over the same guarded bins state
    "q161_benford_audit", // cum over ≤9 leading-digit classes
    "q166_percentile_rank", // cum over value-domain bins (binsGuard)
    "q169_bootstrap_ci", // rank over exactly 32 resample means
    "q172_pareto_frontier", // prefix-max over O(stripes) boundary rows
    "q84_budget_select", // cum over ≤ O(100) quality-band thresholds
    "q191_vocab_coverage") // cum over the Zipf-bounded freq-of-freq frame

  /** InMemoryTableScan is a LEAF that hides the cache-build subplan —
    * descend into it, or a global window buried under a persist()
    * escapes the sweep. */
  private def cachedPlans(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan
    }

  private def allPlans(root: SparkPlan): Seq[SparkPlan] = {
    val direct = withSubqueryPlans(root)
    direct ++ direct.flatMap(cachedPlans).flatMap(allPlans)
  }

  private def globalWindows(root: SparkPlan): Seq[String] =
    allPlans(root).flatMap(_.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        "unpartitioned WindowExec over " +
          w.windowExpression.map(_.toString.take(60)).mkString("; ")
    }).distinct

  test("registry sweep: every WindowExec partitions, except adjudicated metadata frames") {
    // A window with an empty partition spec funnels its whole input
    // through ONE task — the quiet single-partition bottleneck a 100 TB
    // plan cannot carry. Every global window in the registry must ride
    // an adjudicated bounded metadata frame, allowlisted BY QUERY so a
    // new query (or a refactor widening a helper's input) fails here
    // the day it ships, not in a 1000-executor postmortem. sparkPlan
    // (pre-AQE) is exact for this: AQE neither adds nor removes
    // WindowExec nodes, and the cache descent covers the subplans an
    // executed AQE tree would hide behind InMemoryTableScan leaves.
    val verdicts = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan =
          try q(spark, sf).queryExecution.sparkPlan
          catch {
            case e: Exception => fail(s"$name failed to plan: ${e.getMessage}")
          }
        val hits = globalWindows(plan)
        if (metadataGlobalWindowAllowed(name)) {
          // a stale allowlist row is a failure too: the adjudication
          // must die with the plan shape it adjudicated
          if (hits.isEmpty)
            Seq(s"$name: allowlisted but carries NO global window — " +
              "remove the stale adjudication")
          else Nil
        } else hits.map(o => s"$name: $o")
    }
    assert(verdicts.isEmpty,
      s"unadjudicated global windows in the registry:\n${verdicts.mkString("\n")}")
  }

  test("registry sweep: no cartesian products; BNLJ broadcasts only reductions") {
    val verdicts = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        // sparkPlan (pre-AQE) exposes the real join nodes; AQE never
        // introduces a cartesian and only ever narrows joins further
        val plan =
          try q(spark, sf).queryExecution.sparkPlan
          catch {
            case e: Exception => fail(s"$name failed to plan: ${e.getMessage}")
          }
        offences(plan)
          .filterNot(o => o.startsWith("BroadcastNestedLoopJoin")
            && baselineBnljAllowed(name))
          .map(o => s"$name: $o")
    }
    assert(verdicts.isEmpty,
      s"scale-hostile plans in the registry:\n${verdicts.mkString("\n")}")
  }
}

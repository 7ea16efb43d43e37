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

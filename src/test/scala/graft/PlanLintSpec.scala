package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Scale lint over EVERY query's physical plan: the two classic 100 TB
  * plan killers must never appear —
  *
  *  - `CartesianProductExec`: an unbroadcast cross join multiplies
  *    partitions; every pair generator here is supposed to be an equality
  *    join on block/bucket keys. (1-row scalar attaches compile to
  *    BroadcastNestedLoopJoin, which is fine and NOT flagged.)
  *  - `WindowExec` with an empty partition spec: a global ORDER BY window
  *    funnels the whole dataset through one task. Top-k must be
  *    TakeOrderedAndProject or the graft_topk heap aggregate; ranks must
  *    partition or pre-aggregate. A global window is tolerated ONLY when
  *    an aggregation sits between it and every scan — then its input is an
  *    already-collapsed frame (a value histogram, a per-strategy summary)
  *    whose cardinality is bounded by construction, not by data volume.
  *
  * Catching these at spec time means no future operator can silently
  * reintroduce a plan that only works at test scale. */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def offenders(plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def aggregatesBelow(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => aggregatesBelow(a.executedPlan)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(aggregatesBelow)
    }
    def walk(p: SparkPlan): Unit = {
      p match {
        case _: CartesianProductExec => out += "CartesianProduct"
        case w: WindowExec if w.partitionSpec.isEmpty && !aggregatesBelow(w.child) =>
          out += "GlobalWindow"
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }

  test("no query plan contains a cartesian product or a global window") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // mm_features drops to an RDD decode pipeline whose plan is opaque by
      // design; everything else must lint clean
      if (name == "mm_features") None
      else {
        val plan = fn(spark, sf).queryExecution.executedPlan
        val hits = offenders(plan)
        if (hits.nonEmpty) Some(s"$name: ${hits.mkString(",")}") else None
      }
    }
    assert(bad.isEmpty, s"scale-hostile plans:\n${bad.mkString("\n")}")
  }
}

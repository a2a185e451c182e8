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
  *  - `ScalaUDF` anywhere in a plan: boxed per-row eval outside codegen;
  *    every scalar extension here is a native `Expression` with
  *    `doGenCode`.
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
      // third lint: no ScalaUDF anywhere — every graft scalar extension must
      // be a native codegen Expression (r6 closed the last one; this pins it
      // so no future operator silently reintroduces boxed per-row eval)
      if (p.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])))
        out += "ScalaUDF"
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }

  test("no query plan contains a cartesian product, global window, or UDF") {
    // mm_features drops to an RDD decode pipeline whose plan is opaque by
    // design. imp_als/imp_ml_tree call MLlib model.transform, which wraps
    // predict in MLlib's OWN ScalaUDF (a bounded prediction projection we
    // cannot rewrite) — only the UDF lint is waived for them, so a
    // cartesian/global-window regression there still fails.
    val udfWaived = Set("imp_als", "imp_ml_tree")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (name == "mm_features") None
      else {
        val plan = fn(spark, sf).queryExecution.executedPlan
        val hits = offenders(plan)
          .filterNot(h => h == "ScalaUDF" && udfWaived.contains(name))
        if (hits.nonEmpty) Some(s"$name: ${hits.mkString(",")}") else None
      }
    }
    assert(bad.isEmpty, s"scale-hostile plans:\n${bad.mkString("\n")}")
  }
}

package graft.queries

import graft.SparkSpec

/** Whole-registry PLAN-SHAPE audit: no registered query may plan a
  * `CartesianProduct` — the unbroadcast cross join that silently turns
  * a linear pipeline quadratic at scale (exactly the regression class
  * r13 caught in q149's candidate stage, one query at a time; this
  * pins it for all of them at once, including every future addition,
  * since the audit iterates `Registry.queries` itself).
  *
  * Deliberately NOT banned: `BroadcastNestedLoopJoin` — the engine's
  * one-row `crossJoin(broadcast(bounds))` calendar-bounds device
  * (q128/q157–q159/q84 …) compiles to a BNLJ against a literally
  * single-row side, which is a constant-cost plan, not a pair space.
  * A data-sized nested loop would first have to get past the byte
  * budget gates and per-query plan asserts (BandedAnnSpec,
  * AnalyticsOpsSpec) that guard the known-risky paths individually. */
class RegistryPlanAuditSpec extends SparkSpec {

  test("no registry query plans a CartesianProduct at sf0.001") {
    val offenders = Registry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, run) =>
        val plan = run(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name -> plan.take(400))
        else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n:\n$p" }.mkString("\n\n"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over EVERY declared query: no
  * cartesian product may ever appear (the broadcast single-row query
  * vectors plan as BroadcastNestedLoopJoin, which is fine), and every
  * events/documents scan must prune columns (ReadSchema never the full
  * table when the query touches a subset). Catches scale-killers at
  * test time instead of in a 100 TB run.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("no declared query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian in: $offenders")
  }

  test("single-table scans prune columns down to what the query needs") {
    // spot checks with known narrow needs: scan stage must not read
    // the wide text/props columns it doesn't use
    val plans = Map(
      "q_buffer_cap" -> "props", // uses only user_id/event_id/ts
      "q_quantiles" -> "props",  // uses only event_type/value
      "q_fingerprint" -> "lang"  // uses only doc_id/text
    )
    plans.foreach { case (q, mustNotRead) =>
      val scan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      assert(!scan.contains(mustNotRead), s"$q reads pruned column $mustNotRead: $scan")
    }
  }
}

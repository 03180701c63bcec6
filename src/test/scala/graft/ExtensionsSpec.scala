package graft

import org.scalatest.funsuite.AnyFunSuite

/** Extension operators with contracts beyond the DuckDB oracle —
  * currently X29's scale companion: the range-partitioned global
  * ranking must reproduce the window-ranked Spearman bit-for-bit.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("scalable rank correlation == declared window form, at two SFs") {
    // ranks are exact integers in both forms, so equality is exact —
    // any boundary mistake in the offset arithmetic (off-by-one at a
    // range-partition edge, a group straddling partitions) shifts a
    // rank and breaks sum_d2 immediately
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val declared = SparkEntry.queries("q_rank_corr")(spark, dir).collect().toSeq
      val scalable = graft.operators.Extensions.rankCorrScalable(spark, dir).collect().toSeq
      assert(scalable === declared, s"scalable form diverged at $dir")
    }
  }

  test("the scalable form never sorts a whole event type in one task") {
    val plan = graft.operators.Extensions
      .rankCorrScalable(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    // the corpus-sized sorts run inside range partitions, and every
    // local-rank window partitions on (__pid, event_type) — the only
    // event_type-keyed exchanges left feed the tiny counts/offsets
    // aggregate and the final ≤|types|-row result
    assert(plan.contains("rangepartitioning"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), "driver-sized exchange leaked in")
    val localRankWindows = plan.linesIterator.filter(l =>
      l.contains("row_number()") && l.contains("windowspecdefinition")).toSeq
    assert(localRankWindows.nonEmpty)
    localRankWindows.foreach { l =>
      assert(l.contains("__pid"), s"a rank window lost its partition-id key:\n$l")
    }
  }
}

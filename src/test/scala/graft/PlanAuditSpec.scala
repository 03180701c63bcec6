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

  test("q_dedup_near reuses the cached shingle index and broadcasts no pair set") {
    val plan = SparkEntry.queries("q_dedup_near")(spark, sf)
      .queryExecution.executedPlan.toString
    // the persist() on the shingle index is load-bearing (r6: the
    // index was recomputed up to 7x per run) — the plan must read it
    // through InMemoryTableScan
    assert(plan.contains("InMemoryTableScan"), "shingle index is not cached in the near-dup plan")
    // and no join may carry an explicit broadcast HINT on a side whose
    // row count is corpus-proportional — neither the (id_a, id_b) pair
    // stream (~quadratic on low-similarity corpora, the r6 driver-OOM
    // shape) nor any per-document table (one row per doc: the r8
    // cardinality-table hint the round-9 rework removed). A hint is
    // honored regardless of size, so Catalyst can never retract it at
    // scale; size-based auto-broadcast remains fine. The ONLY side a
    // dedup plan may ever hint is an LSH candidate list, whose volume
    // is bounded by true similarity, not corpus size — and candidate
    // lists are exactly the pair-shaped {id_a, id_b} outputs below.
    def hintedSides(q: String): Seq[Set[String]] =
      SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
            case (h, side) if h.exists(_.strategy.isDefined) =>
              side.output.map(_.name).toSet
          }
      }.flatten
    assert(hintedSides("q_dedup_near").isEmpty,
      s"near-dup plan carries broadcast hints: ${hintedSides("q_dedup_near")}")
    val minhashHints = hintedSides("q_dedup_minhash")
    assert(minhashHints.forall(_ == Set("id_a", "id_b")),
      s"minhash plan hint-broadcasts a non-candidate (corpus-proportional) side: $minhashHints")
    // positive controls so this detector can never rot into vacuity:
    // minhash and fuzzy DO hint-broadcast their LSH candidate lists
    assert(minhashHints.nonEmpty, "broadcast-hint detector went blind (minhash)")
    assert(hintedSides("q_dedup_fuzzy").exists(s => Set("id_a", "id_b").subsetOf(s)),
      "broadcast-hint detector went blind (fuzzy)")
  }

  test("q_dedup_minhash builds signatures with the one-pass sketch aggregate") {
    val plan = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash_sig") && plan.contains("ObjectHashAggregate"),
      "minhash signatures are not built by the MinHashSketch aggregate")
    // the shared shingle index feeds the signature build AND both
    // sides of the Jaccard verify — it must come from cache, not be
    // re-shuffled per consumer (r7 verdict task 3)
    assert(plan.contains("InMemoryTableScan"),
      "minhash plan rebuilds the shingle index instead of reading the shared cache")
  }

  test("q_dedup_simhash and q_dedup_fuzzy read the shared cached shingle index") {
    Seq("q_dedup_simhash", "q_dedup_fuzzy").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"$q rebuilds the shingle index instead of reading the shared cache")
    }
    // and the cached sketch itself is built by the one-pass aggregate
    // (one int[60] buffer per doc, map-side partial merge), not 60
    // separate sum() columns
    val sketchPlan = graft.operators.Dedup.simSketch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(sketchPlan.contains("graft_simhash_sketch") && sketchPlan.contains("ObjectHashAggregate"),
      "simhash sketch is not built by the SimHashSketch aggregate")
  }

  test("similarity top-K plans through the pushdown and matches the stock plan row-for-row") {
    Seq("q_sim_bucketed", "q_sim_l2", "q_sim_cosine").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      assert(df.queryExecution.executedPlan.toString.contains("ScoredTopK"),
        s"$q does not plan through ScoredTopKPushdown")
      val pushed = df.collect().toSeq
      spark.conf.set("spark.graft.topk.pushdown", "false")
      try {
        val stock = SparkEntry.queries(q)(spark, sf)
        assert(!stock.queryExecution.executedPlan.toString.contains("ScoredTopK"),
          "pushdown kill-switch has no effect")
        assert(stock.collect().toSeq === pushed, s"$q: pushdown changed the result")
      } finally spark.conf.unset("spark.graft.topk.pushdown")
    }
  }

  test("the pushdown actually prunes: early abandonment fires on real data") {
    // correctness alone can't tell a live optimization from dead code:
    // the exec's metrics must show rows skipped by the running-bound
    // check. L2 is the load-bearing case — its partial sum races past
    // the k-th best for every distant candidate. (The cosine bound is
    // sound but provably loose on THIS corpus: isotropic vectors are
    // the Cauchy–Schwarz worst case, so for q_sim_cosine we only
    // assert full metric coverage, not pruning.)
    def metricsOf(q: String, dir: String): (Long, Long) = {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val exec = df.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.ScoredTopKExec => e
      }
      assert(exec.nonEmpty, s"$q lost the ScoredTopKExec node")
      (exec.get.metrics("prunedRows").value, exec.get.metrics("scoredRows").value)
    }
    val (l2Pruned, l2Scored) = metricsOf("q_sim_l2", "/root/testdata/sf0.01")
    assert(l2Pruned > 0, s"L2 early abandonment never fired (scored=$l2Scored)")
    val (cosPruned, cosScored) = metricsOf("q_sim_cosine", "/root/testdata/sf0.01")
    val corpus = Tables(spark, "/root/testdata/sf0.01", "embeddings").count() - 1
    assert(cosPruned + cosScored === corpus, "metrics do not cover the candidate stream")
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

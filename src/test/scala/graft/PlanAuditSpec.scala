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

  private def globalWindows(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.catalyst.plans.logical
    df.queryExecution.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w
    }
  }

  /** Structural bar for an empty-partition Window's input: it must
    * pass through an Aggregate (a dictionary collapse), a Limit (a
    * top-K bound), or a lineage-truncating checkpoint of one
    * (LogicalRDD — the rocAucOf score dictionary). A global window
    * whose child reaches a file scan through NONE of those sorts raw
    * corpus rows on one task — always wrong at scale.
    */
  private def boundedInput(w: org.apache.spark.sql.catalyst.plans.logical.Window): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical
    w.child.collectFirst {
      case a: logical.Aggregate => a: Any
      case l: logical.GlobalLimit => l: Any
      case l: logical.LocalLimit => l: Any
      case r: org.apache.spark.sql.execution.LogicalRDD => r: Any
    }.nonEmpty
  }

  /** Audited global-window sites (r17 VERDICT #2, mechanized r18):
    * every declared query that plans ANY empty-partition Window, with
    * the boundedness argument for its input. Counts are EXACT — a new
    * global window anywhere in the surface (or a fix that removes
    * one) fails the sweep by name until this audit is updated. Every
    * input below is plan-constant-bounded, never corpus- or
    * vocabulary-proportional (the r17 q_cell_labels defect class:
    * its corpus-total window over the vocab-sized perTok is exactly
    * what this table refuses to admit).
    */
  private val auditedGlobalWindows: Map[String, Int] = Map(
    "q_ab_test" -> 1,         // 1-row scalar-aggregate fold
    "q_anneal_plan" -> 1,     // |sources| dictionary
    "q_batch_plan" -> 1,      // per-partition counts (≤ shuffle.partitions)
    "q_bin_provenance" -> 2,  // per-partition counts ×2
    "q_burstiness" -> 1,      // |sources| dictionary
    "q_clf_agreement" -> 1,   // fixed logit-bin dictionary
    "q_clf_auc" -> 2,         // ≤2·10⁵+1 score dictionary (one side checkpoint-truncated)
    "q_clf_calibration" -> 3, // score/probability-bin dictionaries (same bound)
    "q_cluster_sizes" -> 2,   // duplicate-cluster size histogram (≤√N distinct sizes)
    "q_compact_plan" -> 2,    // per-partition counts ×2
    "q_decontam_report" -> 1, // eval-battery bench_id dictionary
    "q_distinctive" -> 1,     // |sources| dictionary
    "q_label_noise" -> 2,     // 2×2 (y, pred) confusion cells
    "q_lsh_recall" -> 1,      // fixed band-count dictionary
    "q_lsh_stats" -> 1,       // fixed band dictionary
    "q_mix_convergence" -> 1, // |langs| dictionary
    "q_mix_sample" -> 1,      // |langs| dictionary
    "q_mix_weights" -> 1,     // |langs| dictionary
    "q_pack_chunks" -> 1,     // per-partition counts
    "q_pack_efficiency" -> 1, // per-partition counts
    "q_pipeline" -> 1,        // per-partition counts
    "q_qte" -> 1,             // ≤2-row per-variant quantile fold
    "q_quality_blend" -> 3,   // per-partition counts ×3
    "q_rank_eval" -> 3,       // judged top-20 ranking + 4-grade relevance histogram
    "q_rrf_fusion" -> 2,      // two top-20 retrieval legs (Limit-bounded)
    "q_semantic_mix" -> 1,    // K-cell dictionary
    "q_silhouette" -> 1,      // K-cell dictionary
    "q_source_drift" -> 2,    // doc-length histogram (≤ max doc length rows)
    "q_source_kl" -> 1,       // top-V vocab marginal (limit(vocabV))
    "q_split_balance" -> 3,   // length histogram ×2 + |sources| dictionary
    "q_split_time" -> 2,      // (split, event_type) cells + per-partition counts
    "q_srm" -> 2,             // ≤2-row variant cells ×2
    "q_token_budget" -> 2,    // |sources| dictionary ×2
    "q_train_order" -> 9,     // per-partition counts + |sources| dictionaries
    "q_unimax" -> 6,          // |langs| dictionary (the waterfilling ladder)
    "q_zipf_fit" -> 1,        // top-100 distribution head (Limit-bounded)
    "q_zonemap_skip" -> 2,    // per-partition counts ×2 (two rankedByRange layouts)
    "q_zorder" -> 1           // per-partition counts
  )

  test("no declared query plans an unaudited single-partition Window (r17 VERDICT #1/#2)") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val ws = globalWindows(fn(spark, sf))
      val rawScan = ws.filterNot(boundedInput)
      val audited = auditedGlobalWindows.getOrElse(name, 0)
      if (rawScan.nonEmpty || ws.size != audited)
        Some(s"$name: ${ws.size} global windows (audited $audited, " +
          s"${rawScan.size} over a raw scan) — a NEW one must be argued " +
          "bounded in auditedGlobalWindows; a REMOVED one must update the audit")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("planted: a corpus-wide global window is flagged by the sweep's structural bar") {
    import org.apache.spark.sql.functions.{col, length, sum}
    import org.apache.spark.sql.expressions.{Window => W}
    val planted = Tables(spark, sf, "documents")
      .withColumn("t", sum(length(col("text"))).over(
        W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    val ws = globalWindows(planted)
    assert(ws.nonEmpty, "planted window missing from the optimized plan")
    assert(ws.exists(w => !boundedInput(w)),
      "a global window straight over the documents scan must fail the structural bar")
  }

  test("the X112/X100 broadcast sides are literally bounded in the plan (r18 probe fix)") {
    // The 100x probe's two worst movers were 'fixed-size' sides that
    // weren't: anchors/eval-suite filters of the form vec_id % 50 = 0
    // with NO upper bound scale with the corpus, degrading the
    // documented Theta(N*A)/Theta(N*E) NLJ shapes to Theta(N^2/50).
    // Pin the bound STRUCTURALLY: the optimized plans must carry a
    // literal vec_id upper bound (50 * the 64-slot batch) on the
    // broadcast side. Removing the cap turns this red before any
    // probe runs.
    val bound = (50L * graft.operators.Similarity.hardNegAnchorSlots).toString
    assert(bound === (50L * graft.operators.Curation.evalSuiteSlots).toString,
      "the two slot constants drifted apart; update this pin's bound handling")
    // Match the PREDICATE, not the bare literal (ADVICE r18): a whole-
    // plan substring check on "3200" would stay green on any unrelated
    // literal containing it (13200, 320000) after the cap regressed.
    val boundPred = s"""vec_id#\\d+L? < $bound\\)""".r
    for (q <- Seq("q_hard_negatives", "q_decontam_semantic")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan.toString
      assert(boundPred.findFirstIn(plan).isDefined,
        s"$q lost its literal (vec_id < $bound) broadcast-side bound — " +
          s"the fixed-size contract regressed:\n$plan")
    }
  }

  test("q_watermark is one scan, join-free (X154's scale contract)") {
    // the screen is pure in-row HOF arithmetic: scan -> projections ->
    // final sort. A join or a second scan means the hash partition
    // started reading something it shouldn't need.
    val plan = SparkEntry.queries("q_watermark")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"watermark grew a join:\n$plan")
    assert("FileScan".r.findAllIn(plan).size === 1, s"watermark re-scans:\n$plan")
  }

  test("q_label_noise reads the shared gate-scored cache in BOTH CL passes") {
    // both CL passes (global thresholds + assignment) must read the
    // memoized gate table — the expensive clf/rule scan itself runs
    // inside the cached plan only. (The plan STRING shows a FileScan
    // per InMemoryTableScan because each prints the relation's child,
    // so counting FileScans is not a scan count; counting the
    // InMemoryTableScans is — a pass that regressed to reading
    // parquet directly drops this below 2.)
    val plan = SparkEntry.queries("q_label_noise")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2,
      s"a CL pass stopped reading the gate-scored cache:\n$plan")
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
    // Hints are read off the ANALYZED plan: the optimized plan swaps
    // any subtree matching a persisted memo (r16: the pair tables) for
    // an InMemoryRelation, which would hide a corpus-proportional hint
    // inside the cached builder from this audit entirely.
    def hintedSides(q: String): Seq[Set[String]] =
      SparkEntry.queries(q)(spark, sf).queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
            if h.hints.strategy.isDefined =>
          h.child.output.map(_.name).toSet
      }
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

  test("unit-norm declaration makes cosine-ranked search prune on the real corpus") {
    // Verdict r8 task 4: the norm-free cosine bound is provably loose
    // on isotropic vectors, so q_sim_cosine never pruned. On a
    // pre-normalized corpus (the standard vector-store layout) cosine
    // is a pure dot with |x| = 1, and under the opt-in declaration
    // the pinned-suffix-norm bound prunes even here. Same row-identity
    // pin as every other pushdown path.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val raw = Tables(spark, dir, "embeddings")
    val normed = raw
      .select(col("vec_id"),
        graft.operators.VectorOps.normalize(col("embedding")).as("nemb"))
      .cache()
    val qn: Array[Double] = {
      val q = raw.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).map(_.toDouble).toArray
      val n = math.sqrt(q.map(v => v * v).sum)
      q.map(_ / n)
    }
    def topk = normed.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(graft.operators.VectorOps.dot(col("nemb"), typedlit(qn)), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
    try {
      spark.conf.set("spark.graft.topk.unitNorm", "true")
      val q = topk
      assert(q.queryExecution.executedPlan.toString.contains("ScoredTopK"),
        "unit-norm dot query does not plan through the pushdown")
      val pushed = q.collect().toSeq
      val exec = q.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.ScoredTopKExec => e
      }.get
      assert(exec.metrics("prunedRows").value > 0,
        "the unit-norm bound never pruned on the isotropic corpus — the fast path is dead")
      spark.conf.unset("spark.graft.topk.unitNorm")
      // without the declaration the pure-dot pattern must NOT match
      assert(!topk.queryExecution.executedPlan.toString.contains("ScoredTopK"),
        "pure-dot pattern matched without the unit-norm declaration")
      assert(topk.collect().toSeq === pushed, "unit-norm pushdown changed the result")
    } finally {
      spark.conf.unset("spark.graft.topk.unitNorm")
      normed.unpersist()
    }
  }

  test("pushdown keeps rows whose vectors hide a null AFTER the prune checkpoint") {
    // The adversarial case for early abandonment: a row whose prefix
    // distance races past the k-th best (prune fires at i=16) but
    // whose element 60 is NULL. The stock plan scores it NULL, and
    // under ASC NULLS FIRST a null-score row sorts ahead of every real
    // score — so a pushdown that drops it on the prune returns
    // different rows. The fix completes every prune with an
    // isNullAt-only suffix scan when the array type admits nulls.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dim = 64
    val qv = Array.tabulate(dim)(i => 0.1 + 0.001 * (i % 7))
    def near(seed: Int) = Seq.tabulate(dim)(i => 0.1 + 0.002 * ((seed + i) % 5)): Seq[Any]
    def far(seed: Int) = Seq.tabulate(dim)(i => 500.0 + seed + i): Seq[Any]
    def farWithNull(seed: Int) =
      Seq.tabulate[Any](dim)(i => if (i == 60) null else 500.0 + seed + i)
    val rows =
      (1 to 120).map(i => Row(i.toLong, near(i))) ++       // fill the heap
      (201 to 240).map(i => Row(i.toLong, far(i))) ++      // pruned, legitimately
      (301 to 303).map(i => Row(i.toLong, farWithNull(i))) // must NOT be dropped
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema).cache()
    try {
      def topk = df
        .select(col("vec_id"),
          round(graft.operators.VectorOps.l2Sq(col("emb"), typedlit(qv)), 4).as("dist_sq"))
        .orderBy(col("dist_sq").asc, col("vec_id").asc)
        .limit(5)
      val q = topk
      assert(q.queryExecution.executedPlan.toString.contains("ScoredTopK"),
        "interior-null scenario does not plan through the pushdown")
      val pushed = q.collect().toSeq
      val exec = q.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.ScoredTopKExec => e
      }.get
      assert(exec.metrics("prunedRows").value > 0,
        "prune never fired — the adversarial scenario is vacuous")
      // the three null-element rows must lead the result (NULLS FIRST)
      assert(pushed.take(3).map(_.getLong(0)).toSet === Set(301L, 302L, 303L),
        s"null-element rows lost or misplaced: $pushed")
      spark.conf.set("spark.graft.topk.pushdown", "false")
      try assert(topk.collect().toSeq === pushed, "pushdown diverged from the stock plan")
      finally spark.conf.unset("spark.graft.topk.pushdown")
    } finally df.unpersist()
  }

  test("non-default null orderings fall through to the stock plan") {
    // the exec's comparators encode ASC NULLS FIRST / DESC NULLS LAST;
    // an explicit contrary ordering must not match the strategy
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sf, "embeddings")
    val qv = Array.fill(64)(0.1f)
    def plan(sorted: org.apache.spark.sql.DataFrame) =
      sorted.limit(10).queryExecution.executedPlan.toString
    val scored = df.select(col("vec_id"),
      round(graft.operators.VectorOps.l2Sq(col("embedding"), typedlit(qv)), 4).as("d"))
    assert(!plan(scored.orderBy(col("d").asc_nulls_last, col("vec_id").asc))
      .contains("ScoredTopK"), "ASC NULLS LAST score matched the pushdown")
    assert(plan(scored.orderBy(col("d").asc, col("vec_id").asc))
      .contains("ScoredTopK"), "control: default ordering no longer matches")
  }

  test("q_profile reads orders in exactly one scan") {
    // r8 verdict: the per-column agg+union form scanned orders five
    // times — 5x the IO on exactly the table class (the biggest one)
    // profiling targets first. The single-aggregate form must keep a
    // single FileScan however many columns are profiled.
    // collect() can't see through AdaptiveSparkPlanExec (it hides its
    // children), so count scan nodes in the rendered plan instead
    val plan = SparkEntry.queries("q_profile")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans === 1, s"q_profile plans $scans file scans:\n$plan")
  }

  test("q_boilerplate_strip's strip phase is join-free: the corpus never shuffles") {
    // X52's scale contract: the df>threshold hot set is literalized
    // into the plan (the build-time collect is bounded by
    // boilerplateMax), so the strip phase is scan -> in-row
    // filter/reassemble -> final sort. Any Join or extra Exchange
    // here means the corpus text started moving again.
    val plan = SparkEntry.queries("q_boilerplate_strip")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"strip phase grew a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"strip phase plans $exchanges exchanges (want the final sort only):\n$plan")
    assert("FileScan".r.findAllIn(plan).size === 1, s"strip phase re-scans:\n$plan")
  }

  test("q_clf_calibration is one scan, join-free, one aggregate exchange") {
    // X149's scale contract: both gates are in-row column work, so
    // the whole reliability table is scan -> projections -> ONE
    // hash-aggregate exchange to <=10 bins -> dictionary windows ->
    // final sort. A Join or a second FileScan means a gate started
    // reading the corpus twice.
    val plan = SparkEntry.queries("q_clf_calibration")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"calibration grew a join:\n$plan")
    assert("FileScan".r.findAllIn(plan).size === 1, s"calibration re-scans:\n$plan")
  }

  test("q_gate_ablation is one scan, join-free (X168's scale contract)") {
    // The marginal-attribution table is the SAME single withRuleFlags
    // scan as X73, collapsed map-side into one counter row; the 4-row
    // unpivot explodes a 1-row aggregate. A Join or second FileScan
    // means a rule started re-reading the corpus.
    val plan = SparkEntry.queries("q_gate_ablation")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"gate ablation grew a join:\n$plan")
    assert("FileScan".r.findAllIn(plan).size === 1, s"gate ablation re-scans:\n$plan")
  }

  test("q_sample_plan is one scan, join-free, one aggregate exchange (X169)") {
    val plan = SparkEntry.queries("q_sample_plan")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sample plan grew a join:\n$plan")
    assert("FileScan".r.findAllIn(plan).size === 1, s"sample plan re-scans:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"sample plan shuffles more than the one source aggregate:\n$plan")
  }

  test("q_lsh_tune and q_minhash_err reuse the cached pair/signature machinery, no corpus re-scan storm") {
    // X166 reads ONLY the memoized X5a pair table (one pass, all four
    // configs map-side); X170 adds the per-doc signature dictionary
    // joined twice by id. Neither may plan a nested loop, and the
    // memoized InMemoryRelation must actually be in the plan (the
    // sweep/estimator never rebuild the collision join).
    for (q <- Seq("q_lsh_tune", "q_minhash_err")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q planned a nested loop:\n$plan")
      assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"),
        s"$q does not read the memoized pair table:\n$plan")
    }
  }

  test("q_lsh_recall keeps equi-joins only and reuses the cached shingle index") {
    // X150 composes the X5a truth build and the X5b candidate build —
    // both hot-key-capped equi-join machines — plus a pair-keyed left
    // join. Nothing in it may degenerate to a nested loop, and both
    // pair tables must read the SAME memoized index (InMemoryRelation
    // present, no fresh corpus scan beside it).
    val plan = SparkEntry.queries("q_lsh_recall")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q_lsh_recall degenerated to a nested loop:\n$plan")
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"q_lsh_recall bypasses the cached shingle index:\n$plan")
  }

  test("q_containment and q_dedup_incr keep equi-joins only") {
    // X54 drops the AllPairs length filter — the one predicate in the
    // X5a join that is NOT an equi-key — so it must still plan hash/
    // merge joins on the shingle (resp. band) keys, never a nested
    // loop over pairs
    for (q <- Seq("q_containment", "q_dedup_incr")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q degenerated to a nested loop:\n$plan")
    }
  }

  test("a bucketed band index makes the X53 join shuffle-free on the index side") {
    // X53's scaladoc claims the production index is "written once,
    // bucketed by (band, k1, k2), and every nightly batch joins
    // co-located" — this substantiates the claim with a REAL bucketed
    // write + join plan: the bucketed scan must reach the sort-merge
    // join with NO Exchange above it (only the batch side shuffles).
    // Broadcast pinned off (both knobs — AQE re-plans small sides) so
    // the test exercises the shuffle shape it claims to.
    val dedup = graft.operators.Dedup
    val dir = "/root/testdata/sf0.01"
    val (bands, _) = dedup.incrementalIndex(spark, dir)
    val warehouse = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val tbl = s"band_index_${System.nanoTime()}"
    bands.write
      .option("path", s"$warehouse/$tbl")
      .bucketBy(4, "band", "k1", "k2")
      .sortBy("band", "k1", "k2")
      .format("parquet")
      .saveAsTable(tbl)
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      prev.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val idx = spark.table(tbl)
      // the incoming batch as a LOCAL relation (one micro-batch worth
      // of band rows), so the joined plan's exchange count is
      // decisive: 1 = the incoming side only, 2 = the "bucketed"
      // index shuffled after all
      import spark.implicits._
      val newBands = dedup.minhashBands(
        dedup.shingleIndex(spark, dir)
          .filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 0))
        .withColumnRenamed("doc_id", "new_id")
      val incoming = newBands.as[(Long, Int, Long, Long)].collect().toSeq
        .toDF("new_id", "band", "k1", "k2")
      val joined = incoming.join(idx, Seq("band", "k1", "k2"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"want exactly one exchange (the incoming side); got $exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"), s"index scan is not bucketed:\n$plan")
      // and bucketing changed only the plan, not the result
      val viaBuckets = joined.select("new_id", "idx_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val viaShuffle = incoming.join(bands, Seq("band", "k1", "k2"))
        .select("new_id", "idx_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(viaBuckets.nonEmpty && viaBuckets === viaShuffle)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("q_range_join plans an equi-join on the time bin, never a nested loop") {
    // the binned rewrite is the whole point of R21: the naive BETWEEN
    // join has no equi-key, so Catalyst would plan
    // BroadcastNestedLoopJoin — O(|alerts| x |events|) comparisons.
    // The declared plan must carry the (user_id, bin) keys into a
    // hash/merge join and keep the BETWEEN as a residual.
    val plan = SparkEntry.queries("q_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"),
      s"range join lost its equi-join:\n$plan")
    // positive control: the un-binned formulation really does plan a
    // nested loop — if Spark ever learns native range joins, this
    // flags the binning as removable
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark2, sf, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"), col("value"))
    val alerts = e.filter(col("value") > 300)
      .select(col("user_id").as("a_user"), col("t").as("t0"))
    val naive = e.join(alerts,
      col("user_id") === col("a_user") && col("t") >= col("t0")
        && col("t") < col("t0") + 86400000000L)
    // equi-key user_id IS present here, so Spark keeps a hash join;
    // drop it to model a keyless interval join
    val keyless = e.join(alerts,
      col("t") >= col("t0") && col("t") < col("t0") + 86400000000L)
    assert(keyless.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "nested-loop detector went blind (keyless interval join)")
    assert(!naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("q_interarrival shuffles event data exactly once") {
    // R22's scale contract: the per-user aggregate reuses the lag
    // window's hash(user_id) clustering, so the plan carries ONE
    // hash exchange end to end (the SessionsSpec single-shuffle
    // shape, inherited because groupBy key == window partition key).
    val plan = SparkEntry.queries("q_interarrival")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1,
      s"q_interarrival plans $hashExchanges hash exchanges:\n$plan")
  }

  test("q_rank_corr shuffles event data exactly once for both rank windows") {
    // X29: both row_number windows AND the final aggregate share the
    // event_type partitioning — the plan must carry one hash exchange
    // and re-sort within partitions, never re-shuffle per window.
    val plan = SparkEntry.queries("q_rank_corr")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1,
      s"q_rank_corr plans $hashExchanges hash exchanges:\n$plan")
  }

  test("q_revenue_top pushes its filters to the scans and bounds the sort") {
    // R23's point is composed-join efficiency: the date/segment
    // predicates must reach the parquet readers (pruned before any
    // join), and the top-10 must plan as TakeOrderedAndProject
    // (per-partition bounded heaps), never a global Sort+Limit.
    val plan = SparkEntry.queries("q_revenue_top")(spark, sf)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("o_orderdate") && pushed.contains("l_shipdate")
      && pushed.contains("c_mktsegment"),
      s"q_revenue_top filters did not reach the scans:\n$pushed")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q_revenue_top lost its bounded top-K plan:\n$plan")
  }

  test("single-table scans prune columns down to what the query needs") {
    // spot checks with known narrow needs: scan stage must not read
    // the wide text/props columns it doesn't use
    val plans = Map(
      "q_buffer_cap" -> "props",   // uses only user_id/event_id/ts
      "q_quantiles" -> "props",    // uses only event_type/value
      "q_fingerprint" -> "lang",   // uses only doc_id/text
      "q_sessionize" -> "props",   // uses only user_id/ts/event_id/value
      "q_join_full" -> "props",    // events side needs only user_id
      "q_string_agg" -> "o_totalprice" // only o_custkey/o_orderpriority
    )
    plans.foreach { case (q, mustNotRead) =>
      val scan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      assert(!scan.contains(mustNotRead), s"$q reads pruned column $mustNotRead: $scan")
    }
  }

  test("the packing prefix sum is two-pass: range partition, broadcast offsets, partitioned windows") {
    // the X30/X31 scale claim — no single-partition corpus window.
    // Every Window in either plan must be partitioned (Spark logs its
    // "No Partition Defined" warning exactly when the spec list before
    // ORDER BY is empty, rendering as "Window [..], [ordspec]" with no
    // partition spec — the offsets prefix window over the tiny
    // per-partition table is the one allowed exception, bounded by
    // shuffle.partitions rows)
    Seq("q_pack_chunks", "q_split_hash", "q_source_cap", "q_quality_blend",
        "q_quality_cut", "q_pack_efficiency", "q_compact_plan",
        "q_zorder").foreach { q =>
      val qe = SparkEntry.queries(q)(spark, sf).queryExecution
      import org.apache.spark.sql.catalyst.plans.logical
      val windows = qe.optimizedPlan.collect { case w: logical.Window => w }
      assert(windows.nonEmpty, s"$q lost its window stages")
      // the only global-order window allowed is the per-partition
      // offsets prefix — its input is the tiny counts AGGREGATE
      // (≤ shuffle.partitions rows), never a corpus scan
      windows.filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
          s"$q plans a corpus-wide single-partition window:\n$w")
      }
      // and the offsets rejoin must broadcast, never shuffle the
      // corpus; the corpus side's one exchange is the range partition
      val plan = qe.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q does not broadcast its per-partition offsets:\n$plan")
      assert(plan.toLowerCase.contains("rangepartitioning"),
        s"$q lost its range repartition:\n$plan")
    }
  }

  test("range prefix-sum/rank queries execute ONE range exchange shared by both branches") {
    // prefixSumByRange / rankedByRange join spark_partition_id()-keyed
    // offsets back onto the same repartitionByRange subtree; split
    // points are SAMPLED per instantiation, so correctness silently
    // depends on both branches reading one executed exchange. Pin the
    // reuse structurally: the final (post-AQE) plan must carry a
    // ReusedExchange/reused stage, and exactly ONE range exchange may
    // execute. A plan change that breaks canonical-equality reuse
    // fails here instead of producing wrong prefix sums at 100 TB.
    Seq("q_pack_chunks", "q_split_hash", "q_quality_cut", "q_pack_efficiency",
        "q_weighted_sample", "q_cluster_sample", "q_source_cap",
        "q_source_quantiles", "q_compact_plan", "q_zorder",
        "q_split_time").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // AQE finalizes stage reuse at runtime
      // the rendered AQE plan appends an "== Initial Plan ==" section;
      // only the final section describes what executed
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val reused = plan.linesIterator.filter(_.contains("ReusedExchange")).toSeq
      assert(reused.exists(_.contains("rangepartitioning")),
        s"$q no longer reuses the range exchange across branches:\n$plan")
      // exactly one REPARTITION_BY_NUM range exchange executes (the
      // final ORDER BY adds its own ENSURE_REQUIREMENTS range sort)
      val live = plan.linesIterator.count(l =>
        l.contains("Exchange rangepartitioning") && l.contains("REPARTITION_BY_NUM")
          && !l.contains("ReusedExchange"))
      assert(live === 1,
        s"$q executes $live sampled range exchanges (branches diverged):\n$plan")
    }
    // and the guard is live in BOTH operators: a session with reuse
    // disabled must refuse to build either plan rather than silently
    // mis-join partition ids
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      Seq("q_pack_chunks", "q_split_hash").foreach { q =>
        val err = intercept[IllegalArgumentException] {
          SparkEntry.queries(q)(spark, sf)
        }
        assert(err.getMessage.contains("exchange.reuse"), s"$q guard is dead")
      }
    } finally spark.conf.unset("spark.sql.exchange.reuse")
  }

  test("q_semdedup shuffles the corpus by cell once, shared by both self-join sides") {
    // the X36 scale claim: cell assignment is narrow literal-centroid
    // work, and the within-cell pairwise join co-partitions both
    // sides with ONE executed corpus exchange (the second side reads
    // a ReusedExchange). On the test corpus AQE auto-broadcasts one
    // side (hint-free, so it retracts at scale) — force broadcast off
    // to audit the 100 TB shape the plan degrades to.
    assert(!SparkEntry.queries("q_semdedup")(spark, sf)
      .queryExecution.executedPlan.toString.contains("CartesianProduct"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_semdedup")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val reused = plan.linesIterator.filter(_.contains("ReusedExchange")).toSeq
      assert(reused.exists(_.contains("hashpartitioning(cell")),
        s"q_semdedup no longer shares the cell exchange across join sides:\n$plan")
      val cellExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(cell") && !l.contains("ReusedExchange"))
      assert(cellExchanges === 1,
        s"q_semdedup executes $cellExchanges cell exchanges (sides diverged):\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"q_semdedup degenerated to an unkeyed join:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q_latest is an argmax aggregate, never a per-key history sort") {
    // R26's scale claim: latest-per-key must plan as an aggregate with
    // map-side partials (the shuffle carries one row per key), not the
    // oracle's row_number window (which sorts every key's history)
    val plan = SparkEntry.queries("q_latest")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q_latest plans a window:\n$plan")
    assert(plan.contains("partial_max"),
      s"q_latest does not partial-aggregate before the shuffle:\n$plan")
  }

  test("q_resample's fill window is user-partitioned, never a corpus sort") {
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q_resample")(spark, sf).queryExecution
    val windows = qe.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty, "q_resample lost its fill window")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"q_resample plans a corpus-wide single-partition window")
  }

  test("q_source_sim's pairwise work runs over aggregated profiles, never documents") {
    // the X40 scale claim: the corpus collapses to the (source, tok)
    // profile matrix FIRST; every join input must sit above an
    // aggregate — a join whose input is a raw documents scan would be
    // the corpus-pairwise shape this operator exists to avoid
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q_source_sim")(spark, sf).queryExecution
    val joins = qe.optimizedPlan.collect { case j: logical.Join => j }
    assert(joins.nonEmpty, "q_source_sim lost its profile joins")
    def bounded(p: logical.LogicalPlan): Boolean = p.collectFirst {
      case a: logical.Aggregate => a
      case l: logical.GlobalLimit => l
    }.nonEmpty
    // every join has at least one aggregate/limit-bounded side (the
    // raw token stream may appear only against the V-bounded vocab)…
    joins.foreach { j =>
      assert(bounded(j.left) || bounded(j.right),
        s"q_source_sim joins two corpus-shaped sides:\n$j")
    }
    // …and the pair-producing self-join is bounded on BOTH sides
    assert(joins.exists(j => bounded(j.left) && bounded(j.right)),
      "q_source_sim's profile self-join no longer sits above aggregates")
  }

  test("q_vocab_coverage broadcasts the V-bounded vocab and plans no window") {
    val plan = SparkEntry.queries("q_vocab_coverage")(spark, sf)
      .queryExecution.executedPlan.toString
    // the dictionary side is bounded by V (a plan constant): its join
    // must be a hint-free broadcast, and nothing should sort the
    // corpus (the top-V build is a bounded TakeOrderedAndProject)
    assert(plan.contains("BroadcastHashJoin"),
      s"q_vocab_coverage does not broadcast the vocab dictionary:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q_vocab_coverage lost the bounded top-V build:\n$plan")
    assert(!plan.contains("Window"), s"q_vocab_coverage plans a window:\n$plan")
  }

  test("q_sim_ivf is join-free: literal centroids and probe cells, filter + top-K only") {
    val plan = SparkEntry.queries("q_sim_ivf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"IVF probe plans a join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"IVF top-10 is not a bounded sort:\n$plan")
  }

  private def hashExchanges(plan: String): Seq[String] =
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq

  test("q_mix_sample touches the corpus with zero shuffles: one lang-keyed tiny agg, broadcast back") {
    val plan = SparkEntry.queries("q_mix_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    val ex = hashExchanges(plan)
    assert(ex.size == 1 && ex.head.contains("lang"),
      s"q_mix_sample should shuffle only the |langs|-row rate build:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q_mix_sample thresholds are not broadcast onto the corpus:\n$plan")
  }

  test("q_bpe_encode is join-free: merges are literals, one doc-keyed aggregate") {
    val plan = SparkEntry.queries("q_bpe_encode")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"q_bpe_encode joins against a merge table instead of inlining literals:\n$plan")
    assert(hashExchanges(plan).size == 1,
      s"q_bpe_encode should shuffle once (the per-doc count):\n$plan")
  }

  test("q_cms_freq builds the sketch one-pass with map-side partials and a bounded top-K") {
    val plan = SparkEntry.queries("q_cms_freq")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_cms") && plan.contains("ObjectHashAggregate"),
      s"CMS counters are not built by the one-pass partial-merging aggregate:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q_cms_freq's exact top-20 is not a bounded sort:\n$plan")
  }

  test("q_zipf_fit never globally sorts the vocab: bounded top-K feeds the regression") {
    val plan = SparkEntry.queries("q_zipf_fit")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q_zipf_fit materializes a global vocab sort:\n$plan")
    assert(hashExchanges(plan).size == 1,
      s"q_zipf_fit should shuffle once (the token count):\n$plan")
  }

  test("q_novelty aggregates the gram stream once; everything after is doc-cardinality") {
    val plan = SparkEntry.queries("q_novelty")(spark, sf)
      .queryExecution.executedPlan.toString
    val ex = hashExchanges(plan)
    // one gram-keyed exchange (the first-occurrence agg), one
    // doc-keyed (novel counts); the gram-cardinality first-occurrence
    // table must never be broadcast or re-joined against the stream
    assert(ex.size == 2 && ex.exists(_.contains("gram")) && ex.exists(_.contains("first_doc")),
      s"q_novelty's exchange profile drifted from {gram, first_doc}:\n$plan")
  }

  test("q_rrf_fusion's legs end in distributed top-Ks; windows run over the bounded merge only") {
    val plan = SparkEntry.queries("q_rrf_fusion")(spark, sf)
      .queryExecution.executedPlan.toString
    // each leg's limit must plan as TakeOrderedAndProject (distributed
    // top-20), never a global Sort + CollectLimit over the corpus
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"rrf legs lost their TakeOrdered top-Ks:\n$plan")
    // the unpartitioned rank windows are legitimate ONLY because they
    // sit above the 20-row limits; both must consume a limit subtree
    assert(plan.contains("Window"), "rank windows disappeared")
    // and the corpus-sized inputs never reach a single-partition
    // exchange except the post-limit fusion (≤40 rows)
    val singleParts = plan.linesIterator.filter(_.contains("Exchange SinglePartition")).size
    assert(singleParts <= 3,
      s"too many single-partition exchanges ($singleParts) — a corpus-sized sort leaked in:\n$plan")
  }

  test("q_time_drift collapses to the (type, bin) matrix before any window") {
    val plan = SparkEntry.queries("q_time_drift")(spark, sf)
      .queryExecution.executedPlan.toString
    // the 1-row midpoint aggregate rides the sanctioned broadcast
    // nested-loop join; the event stream itself shuffles once into
    // the (type, bin) count matrix, and every window partitions by
    // event_type OVER THAT MATRIX (bin-bounded), never over raw rows
    assert(plan.contains("BroadcastNestedLoopJoin"), "midpoint should broadcast as 1 row")
    val ex = hashExchanges(plan)
    assert(ex.exists(l => l.contains("event_type") && l.contains("bin")),
      s"missing the (event_type, bin) collapse exchange:\n$plan")
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("event_type")),
      s"a drift window lost its event_type key:\n${windows.mkString("\n")}")
  }

  test("q_sim_sq8 is one narrow codegen'd scan into a bounded top-K — no join, no exchange") {
    // X64's scale shape: bounds and query codes are plan literals
    // (collected at construction), so the scoring pass must be a
    // single WholeStageCodegen scan feeding TakeOrderedAndProject —
    // any Exchange or Join here means the quantizer fell out of the
    // narrow path
    val plan = SparkEntry.queries("q_sim_sq8")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"SQ8 scoring plans a join:\n$plan")
    assert(!plan.contains("Exchange"), s"SQ8 scoring shuffles:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"SQ8 top-10 is not a bounded sort:\n$plan")
    assert(plan.contains("*(1)"),
      s"SQ8 arithmetic fell out of whole-stage codegen (no *(n) stage):\n$plan")
  }

  test("q_dup_pagerank iterates over checkpointed edges — the MinHash build never re-runs") {
    // the localCheckpoints are load-bearing: 3 unrolled iterations
    // each consume the edge set, and without materialization every
    // one would re-run the shingle→signature→band→verify pipeline
    // (and the per-iteration degree join would re-aggregate raw
    // pairs). The executed plan must read ONLY materialized RDDs.
    val plan = SparkEntry.queries("q_dup_pagerank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"PageRank re-reads parquet — a checkpoint is not materializing:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"PageRank plan shows no checkpointed edge scan:\n$plan")
  }

  test("q_cdc_chunks chunks narrowly: shuffles only the finished chunk hashes") {
    // X66's whole point at scale: boundary detection and chunk
    // extraction are per-row array lambdas — no per-doc Window, no
    // join; the only movement is the chunk-hash aggregate (2 hash
    // exchanges: the count-distinct expand pair) plus the final sort
    val plan = SparkEntry.queries("q_cdc_chunks")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"CDC chunking plans a join:\n$plan")
    assert(!plan.contains("Window"), s"CDC chunking plans a per-doc window:\n$plan")
    assert(hashExchanges(plan).size == 2,
      s"CDC should shuffle chunk hashes twice (distinct expand + final agg):\n$plan")
  }

  test("q_quality_clf serves with no dictionary: one doc-keyed shuffle, no join, no window") {
    val plan = SparkEntry.queries("q_quality_clf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the hashing trick means NO weight-table join; plan has one:\n$plan")
    assert(!plan.contains("Window"), s"classifier plans a window:\n$plan")
    assert(hashExchanges(plan).size == 1,
      s"classifier should shuffle once (the doc aggregate):\n$plan")
  }

  test("q_split_leakage derives splits as a projection — no join beyond the dedup machinery") {
    // split membership is a pure function of doc_id (Packing.splitOf):
    // the plan must contain the leakage logic as narrow projections on
    // the verified-pair output, with NO extra join or exchange beyond
    // what q_dedup_minhash itself plans (plus the final per-eval-doc
    // aggregate)
    def joins(p: String): Int =
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r
        .findAllIn(p).size
    val leak = SparkEntry.queries("q_split_leakage")(spark, sf)
      .queryExecution.executedPlan.toString
    val minhash = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .queryExecution.executedPlan.toString
    // the pair list is consumed twice (two orientations), so allow up
    // to 2x the minhash machinery's joins — but not a single join more
    // (a split-table join would add doc_id-keyed joins on top)
    assert(joins(leak) <= 2 * joins(minhash),
      s"leakage plan joined beyond the pair machinery: ${joins(leak)} vs minhash ${joins(minhash)}:\n$leak")
    // a column named exactly `split` (the X31 output) in this plan
    // would mean a materialized split table joined in; the oriented
    // projections only ever bind sa/sb/eval_split
    assert("\\bsplit#".r.findFirstIn(leak).isEmpty,
      "a materialized split table leaked into the plan")
  }

  private def joinOps(p: String): Int =
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r
      .findAllIn(p).size

  test("q_rule_filter is one narrow codegen'd pass: no join, no window, no hash exchange") {
    // X73's whole scale claim: every rule is a per-row array lambda,
    // so the corpus cost is exactly one scan — the only exchange is
    // the presentation sort's range partitioning
    val plan = SparkEntry.queries("q_rule_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinOps(plan) == 0, s"rule cascade plans a join:\n$plan")
    assert(!plan.contains("Window"), s"rule cascade plans a window:\n$plan")
    assert(hashExchanges(plan).isEmpty, s"rule cascade shuffles beyond the sort:\n$plan")
  }

  test("q_dup_fraction windows stay doc-keyed — coverage never partitions corpus-wide") {
    val plan = SparkEntry.queries("q_dup_fraction")(spark, sf)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"expected the islands windows in:\n$plan")
    assert(windows.forall(_.contains("doc_id")),
      s"a coverage window lost its doc_id key:\n${windows.mkString("\n")}")
  }

  test("q_snapshot_diff is ONE full-outer id join into the 4-row classify") {
    val plan = SparkEntry.queries("q_snapshot_diff")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinOps(plan) == 1 && plan.contains("FullOuter"),
      s"snapshot diff should plan exactly one full-outer join:\n$plan")
    assert(!plan.contains("Window"), s"snapshot diff plans a window:\n$plan")
  }

  test("q_upsert: one full-outer id join, feed collapsed map-side, no window") {
    val plan = SparkEntry.queries("q_upsert")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinOps(plan) == 1 && plan.contains("FullOuter"),
      s"upsert should plan exactly one full-outer merge join:\n$plan")
    assert(!plan.contains("Window"), s"upsert plans a window:\n$plan")
    // the latest-op argmax must show a partial aggregate BELOW the
    // feed's exchange (map-side collapse — the feed shuffles collapsed
    // keys, not raw ops); struct-max plans as SortAggregate pairs
    assert(plan.linesIterator.count(_.trim.startsWith("+- SortAggregate")) >= 2
      || plan.contains("partial_max"),
      s"feed argmax lost its map-side partial:\n$plan")
  }

  test("q_tok_fertility joins only the doc metadata — merges stay plan literals") {
    val plan = SparkEntry.queries("q_tok_fertility")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinOps(plan) == 1,
      s"fertility should join once (doc→lang); a merge-table join leaked in:\n$plan")
    assert(!plan.contains("Window"), s"fertility plans a window:\n$plan")
  }

  test("q_quality_blend's three independent rankings each reuse their one sampled exchange") {
    // the r14 payload-pruning find made structural: the nested
    // rank-thrice form executed EIGHT sampled range exchanges (each
    // ranking's offsets branch pruned the other features below its
    // exchange and diverged); the independent-rankings form must show
    // exactly 3 live sampled exchanges, each with a reused twin
    val df = SparkEntry.queries("q_quality_blend")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val live = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && l.contains("REPARTITION_BY_NUM")
        && !l.contains("ReusedExchange"))
    val reused = plan.linesIterator.count(l =>
      l.contains("ReusedExchange") && l.contains("rangepartitioning"))
    assert(live == 3 && reused == 3,
      s"quality blend: $live live / $reused reused sampled exchanges (want 3/3):\n$plan")
  }

  test("q_token_budget windows run over the |sources| dictionary, never the corpus") {
    // X74's scale claim: the corpus contributes ONE aggregate with
    // map-side partials; both allocator windows (the total frame and
    // the remainder prefix) read the tiny dictionary AGGREGATE
    val qe = SparkEntry.queries("q_token_budget")(spark, sf).queryExecution
    import org.apache.spark.sql.catalyst.plans.logical
    val windows = qe.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty, "q_token_budget lost its allocator windows")
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
        s"an allocator window reads corpus rows, not the source dictionary:\n$w")
    }
    assert(joinOps(qe.executedPlan.toString) == 0,
      "the allocator should be window-only over one aggregate — a join leaked in")
  }

  test("q_source_centroid collapses to the (source, dim) matrix; the marginal broadcasts") {
    // X71's scale shape: the corpus-proportional stream shuffles ONCE
    // into |sources|×d integer partials; the d-row corpus marginal is
    // a declared broadcast (stats would SMJ two plan-constant sides)
    val plan = SparkEntry.queries("q_source_centroid")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(hashExchanges(plan).exists(l => l.contains("source") && l.contains("dim")),
      s"missing the (source, dim) collapse exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a plan-constant side fell into a sort-merge join:\n$plan")
    assert(!plan.contains("Window"), s"centroid plans a window:\n$plan")
  }

  test("q_source_dispersion collapses to the (source, dim) matrix — no pairwise join, no window") {
    // X79's reason to exist: the naive form is an O(n²) self-join.
    // The plan must contain exactly ONE join (the id-keyed doc→source
    // metadata join), a (source, dim) collapse exchange, and nothing
    // window-shaped.
    val plan = SparkEntry.queries("q_source_dispersion")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinOps(plan) == 1,
      s"dispersion should join once (doc→source); a pairwise join leaked in:\n$plan")
    assert(hashExchanges(plan).exists(l => l.contains("source") && l.contains("dim")),
      s"missing the (source, dim) collapse exchange:\n$plan")
    assert(!plan.contains("Window"), s"dispersion plans a window:\n$plan")
  }

  test("q_train_order runs two reused range machines and windows only dictionaries") {
    // X81 composes prefixSumByRange (funding cutoff) and rankedByRange
    // (per-epoch positions): each samples split points per
    // instantiation, so each must execute exactly ONE range exchange
    // read by both its branches — two live sampled exchanges total,
    // both reused. And the corpus may never pass through a
    // single-partition window: every empty-partitionSpec window must
    // sit over an aggregate (the |sources| dictionary), the
    // cluster-sample/pack-chunks discipline.
    val df = SparkEntry.queries("q_train_order")(spark, sf)
    df.collect() // AQE finalizes stage reuse at runtime
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val live = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && l.contains("REPARTITION_BY_NUM")
        && !l.contains("ReusedExchange"))
    assert(live === 2,
      s"train-order executes $live sampled range exchanges, expected 2 (one per machine):\n$plan")
    val reused = plan.linesIterator.filter(l =>
      l.contains("ReusedExchange") && l.contains("rangepartitioning")).toSeq
    assert(reused.size >= 2,
      s"a range machine lost branch reuse (${reused.size} reused):\n$plan")
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q_train_order")(spark, sf).queryExecution
    qe.optimizedPlan.collect { case w: logical.Window => w }
      .filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
          s"train-order plans a corpus-wide single-partition window:\n$w")
      }
  }

  test("q_silhouette is narrow argsort work: one scan, one ≤K collapse, dictionary-window verdict") {
    // X99's scale claim: the K candidate distances are literal structs
    // sorted per row (no join, no K× explode), the rollup is one
    // cid-keyed aggregate with map-side partials, and the corpus mean
    // is a window over those ≤K rows — never a second corpus pass.
    val qe = SparkEntry.queries("q_silhouette")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(joinOps(plan) == 0, s"silhouette plans a join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"silhouette reads the corpus more than once:\n$plan")
    assert(hashExchanges(plan).count(_.contains("cid")) == 1,
      s"expected exactly one cid collapse exchange:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"the cell aggregate lost its map-side partial:\n$plan")
    // the one window sits over the aggregate (dictionary-sized input)
    import org.apache.spark.sql.catalyst.plans.logical
    qe.optimizedPlan.collect { case w: logical.Window => w }
      .filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
          s"silhouette plans a corpus-wide single-partition window:\n$w")
      }
  }

  test("q_decontam_semantic broadcasts the eval suite; the corpus never shuffles before the flag filter") {
    // X100's scale claim: a threshold-cosine sweep has no equi-key, so
    // the ONLY sound distributed shape is corpus-stream × broadcast
    // eval suite (Θ(N·E), E fixed). The plan must be one broadcast
    // nested-loop join — never a SortMergeJoin or a CartesianProduct —
    // and the only hash exchange is the ≤|flagged|-row argmax collapse.
    val plan = SparkEntry.queries("q_decontam_semantic")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval sweep lost its broadcast NLJ shape:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"semantic decontam shuffles or cartesians the corpus:\n$plan")
    assert(joinOps(plan) == 1, s"expected exactly one join (the eval sweep):\n$plan")
    assert(hashExchanges(plan).count(_.contains("vec_id")) == 1,
      s"expected exactly one vec_id argmax collapse exchange:\n$plan")
    assert(!plan.contains("Window"), s"semantic decontam plans a window:\n$plan")
  }

  test("q_burstiness reads the corpus zero times in the declared plan — the V×S matrix is the input") {
    // X101 materializes the (source, tok) collapse once
    // (localCheckpoint): the declared plan must read ONLY that
    // checkpoint (no parquet scan — without the materialization the
    // three consumers were three separate corpus tokenizes, measured
    // r14), join small sides broadcast-only, and window only the
    // ≤|sources| dictionary.
    val qe = SparkEntry.queries("q_burstiness")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"burstiness re-reads the corpus — the checkpoint fell off:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed V×S matrix as the only input:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a grid join fell off broadcast:\n$plan")
    import org.apache.spark.sql.catalyst.plans.logical
    qe.optimizedPlan.collect { case w: logical.Window => w }
      .filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
          s"burstiness plans a corpus-wide single-partition window:\n$w")
      }
  }

  test("q_distinctive reads the corpus zero times in the declared plan (the X101 checkpoint discipline)") {
    val qe = SparkEntry.queries("q_distinctive")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"distinctive-terms re-reads the corpus — the checkpoint fell off:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed (source, tok) matrix as the only input:\n$plan")
    import org.apache.spark.sql.catalyst.plans.logical
    qe.optimizedPlan.collect { case w: logical.Window => w }
      .filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
          s"distinctive-terms plans a corpus-wide single-partition window:\n$w")
      }
  }

  test("q_vocab_saturation is two aggregates — vocab collapse then |sources| rollup, no join") {
    // X80's exact path: the (source, tok) collapse with map-side
    // partials, then the frequency-of-frequencies rollup. Anything
    // join- or window-shaped here means an estimator fell off the
    // two-aggregate plan.
    val plan = SparkEntry.queries("q_vocab_saturation")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"vocab saturation plans a join:\n$plan")
    assert(!plan.contains("Window"), s"vocab saturation plans a window:\n$plan")
    assert(hashExchanges(plan).exists(l => l.contains("source") && l.contains("tok")),
      s"missing the (source, tok) vocabulary collapse:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"vocabulary aggregate lost its map-side partial:\n$plan")
  }

  test("q_source_overlap shuffles only |sources| signature rows — no shingle-set join") {
    // X83's mergeability cashed out in the plan: the 64-slot min
    // aggregate partial-aggregates the shingle stream map-side, the
    // only hash exchange carries source-keyed signature rows, and the
    // pair matrix rides the sanctioned tiny-aggregate broadcast
    // nested loop — never a sort-merge join of shingle sets.
    val plan = SparkEntry.queries("q_source_overlap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"pair matrix lost its broadcast nested loop:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized side fell into a sort-merge join:\n$plan")
    val ex = hashExchanges(plan)
    assert(ex.nonEmpty && ex.forall(_.contains("source")),
      s"a non-signature hash exchange appeared:\n${ex.mkString("\n")}")
    assert(!plan.contains("Window"), s"overlap plans a window:\n$plan")
  }

  test("q_char_entropy windows stay doc-keyed over the collapsed (doc, char) stream") {
    // X82: the n-per-doc window runs over the ≤|alphabet|-per-doc
    // count matrix, never raw characters corpus-wide, and nothing
    // joins.
    val plan = SparkEntry.queries("q_char_entropy")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"char entropy plans a join:\n$plan")
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"an entropy window lost its doc_id key:\n${windows.mkString("\n")}")
  }

  test("q_winnow hashes each gram once and selects via one doc-keyed sliding frame") {
    // X78's scale shape: ONE posexplode of the gram stream, ONE
    // per-doc window. The pin that matters is md5 appearing exactly
    // once in the plan text — the all-array draft let project
    // collapse inline the gram-hash transform into every window
    // slice (O(doc²) md5s, measured 3m17s vs 4s at sf0.01), and
    // repeated expression text is exactly how that regression reads
    // in a plan.
    val plan = SparkEntry.queries("q_winnow")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"winnow plans a join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Generate")) == 1,
      s"gram stream should explode exactly once:\n$plan")
    assert("md5\\(".r.findAllIn(plan).size == 1,
      s"gram hash is computed more than once — the HOF-inlining regression:\n$plan")
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"a selection window lost its doc_id key:\n${windows.mkString("\n")}")
  }

  test("q_clf_agreement runs both gates in one corpus pass: one scan, no join, one ≤11-bin collapse") {
    // X108's scale shape: the classifier and the rule cascade are
    // both narrow in-row column work on the SAME projection, so the
    // corpus is read once and joined never; the only hash exchange
    // is the ≤11-row bin aggregate, and the kappa window runs over
    // that dictionary, not the corpus
    val plan = SparkEntry.queries("q_clf_agreement")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"both gates must share one documents scan:\n$plan")
    assert(joinOps(plan) == 0, s"gate agreement plans a join:\n$plan")
    val ex = hashExchanges(plan)
    assert(ex.size == 1 && ex.head.contains("bin"),
      s"the only hash exchange should be the bin collapse:\n$plan")
  }
}

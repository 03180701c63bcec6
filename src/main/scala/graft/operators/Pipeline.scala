package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** The production curation pipeline composed as ONE DAG — SURVEY
  * §2.5's composition-mandate row, not an X-numbered operator of its
  * own: normalize (X23) → boilerplate strip (X52, r14) → curation
  * gates (X35) → near-dup keep/drop (X5b+X21+X26) → per-source caps
  * (X38) → sequence packing (X30) → train/val/test split (X31), with
  * DSIR importance weights (X58, r14) emitted on the final survivors
  * and the X73 rule-failure count plus the X82 character entropy
  * (both r14) as per-row diagnostics on the stripped corpus
  * (admission stays the gates' job; the rule breakdown and the
  * gibberish screen are what a curator reads to tune them),
  * per document, with every stage's verdict on the row — the artifact
  * a real training-data run materializes (the "fate table": why each
  * document was kept or dropped, where the survivors landed, and the
  * selection signal a resampling run reads off it).
  *
  * Every stage is the DECLARED operator's factored body pointed at
  * the previous stage's survivors instead of the raw table
  * ([[Curation.withGateVerdicts]], [[Dedup.shinglesOf]]/
  * [[Dedup.minhashPairsOf]], [[Clustering.connectedComponents]],
  * [[Curation.sourceCapFrom]], [[Packing.packChunksFrom]],
  * [[Packing.splitHashFrom]]) — so the composition is the per-stage
  * semantics by construction, and the oracle states the same chain as
  * rewired CTEs of the per-stage oracle SQL (the dedup stage reuses
  * [[Dedup.minhashCandSqlOver]] + [[Clustering.ccLabelCtes]]
  * verbatim over the admitted corpus).
  *
  * Scale shape (100 TB): the corpus is read from parquet EXACTLY ONCE
  * — the gated frame is materialized (`localCheckpoint`, standing in
  * for the intermediate-corpus write a durable pipeline does) and
  * every downstream stage, including the iterative CC fixpoint and
  * both range-partitioned rankings, reads that materialization
  * (PipelineSpec pins parquet records-read == corpus rows across the
  * whole run). No stage introduces an exchange class the standalone
  * operators don't have: doc_id hash joins (AQE-broadcastable — the
  * verdict frames are bounded by the admitted set), the dedup family's
  * banded equi-joins, and the range exchanges of
  * [[Extensions.rankedByRange]]/[[Packing.prefixSumByRange]]. The
  * unkeyed final `orderBy` is presentation, as in every declared
  * query. The one deliberate sf-scale shortcut: the shingle index of
  * the ADMITTED corpus is rebuilt by its two consumers inside one job
  * rather than persisted (a durable run persists it like
  * [[Dedup.shingleIndex]] does; both reads hit the checkpoint, not
  * the files).
  */
object Pipeline {

  /** Stage chain, composed. Returns one row per corpus document:
    * gate verdicts for all; dup verdict for gate-survivors; cap
    * rank/verdict for dedup-survivors; pack/split placement for the
    * finally-kept — NULL past the stage that dropped the doc, `kept`
    * the end-to-end verdict.
    */
  private def pipelineFate(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan, materialized immediately: the X52 hot-set df
    // pass below is an EAGER job at plan-build time, and it must read
    // these blocks — not parquet — for the one-scan pin to survive.
    // (A durable pipeline writes this normalized corpus; the second
    // checkpoint below stands in for its cleaned-corpus write.)
    val norm = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        TextAnalysis.normText(col("text")).as("text"))
      .localCheckpoint()
    // X52 between normalize and the gates: strip corpus-frequent
    // windows so boilerplate never pollutes the gate statistics or
    // feeds the dedup shingles
    val stripped = Dedup.boilerplateCleanFrom(norm)
    val gated = Curation.withGateVerdicts(stripped).localCheckpoint()
    val admitted = gated.filter(col("is_kept") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    val labels = Clustering.connectedComponents(
      Dedup.minhashPairsOf(Dedup.shinglesOf(admitted.select(col("doc_id"), col("text")))))
    val dkeep = admitted.select(col("doc_id"))
      .join(labels.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"), 1L)
          .otherwise(0L).as("dup_kept"))
    val deduped = admitted
      .join(dkeep.filter(col("dup_kept") === 1).select(col("doc_id")), Seq("doc_id"))
    val capped = Curation.sourceCapFrom(deduped.select(col("doc_id"), col("source")))
    val keptDocs = deduped
      .join(capped.filter(col("is_kept") === 1).select(col("doc_id")), Seq("doc_id"))
    val packed = Packing.packChunksFrom(keptDocs.select(col("doc_id"), col("text")))
    val splits = Packing.splitHashFrom(keptDocs.select(col("doc_id")))
    // X58 on the survivors: the raw model is the full stripped corpus
    // (every doc the pipeline saw), scoring only the finally-kept set
    // — the selection signal a resampling run reads off the fate table
    val dsir = Curation.dsirFrom(
      gated.select(col("doc_id"), col("lang"), col("text")),
      keptDocs.select(col("doc_id"), col("text")))
    // X73 (r14) as a fate-table DIAGNOSTIC on the stripped corpus:
    // the rule-failure count rides every row (admission stays the X35
    // gates' job — the rule breakdown is what a curator reads to tune
    // them). Narrow projection off the gate checkpoint: no new scan,
    // the one-scan pin is untouched.
    val rules = Curation.withRuleFlags(gated.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_failed").as("rule_failed"))
    // X82 (r14) as a second fate-table diagnostic, same contract as
    // the rule count: character entropy of the stripped text — the
    // gibberish screen a curator reads next to the rule breakdown.
    // Off the gate checkpoint, so the one-scan pin is untouched;
    // empty-after-strip docs carry NULL (no distribution exists).
    val ent = TextAnalysis.charEntropyFrom(gated.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("entropy_bits"))
    gated
      .select(
        col("doc_id"), col("bp_dropped"),
        col("is_en"), col("is_quality"), col("is_repetitive"),
        col("is_kept").as("gate_kept"))
      .join(rules, Seq("doc_id"), "left")
      .join(ent, Seq("doc_id"), "left")
      .join(dkeep, Seq("doc_id"), "left")
      .join(
        capped.select(
          col("doc_id"), col("src_rank"), col("is_kept").as("cap_kept")),
        Seq("doc_id"), "left")
      .join(
        packed.select(col("doc_id"), col("tok"), col("bin"), col("bin_offset"), col("crosses")),
        Seq("doc_id"), "left")
      .join(splits.select(col("doc_id"), col("split"), col("pos")), Seq("doc_id"), "left")
      .join(dsir.select(col("doc_id"), col("logratio").as("dsir_logratio")),
        Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("gate_kept") === 1 && col("dup_kept") === 1 && col("cap_kept") === 1, 1L)
          .otherwise(0L))
      .orderBy("doc_id")
  }

  /** The same chain as rewired CTEs of the per-stage oracle SQL. The
    * dedup stage is [[Dedup.minhashCandSqlOver]] over the admitted
    * corpus + [[Clustering.ccLabelCtes]] — string-identical to the
    * standalone cluster oracles' chain, so every verify run pins the
    * composed Spark DAG ≡ the textbook per-stage composition.
    */
  private def pipelineSql: String = {
    val dedupChain = Dedup.minhashCandSqlOver(
      Dedup.corpusChainSqlOver("corpus AS (SELECT doc_id, text FROM admitted)"))
    val ct = Dedup.chunkTokens
    s"""WITH RECURSIVE norm0 AS (
       |  SELECT doc_id, source, lang,
       |    trim(regexp_replace(lower(nfc_normalize(text)), ' +', ' ', 'g')) AS text
       |  FROM documents),
       |bp0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM norm0),
       |bpc AS (
       |  SELECT doc_id, i, array_to_string(toks[(i*$ct+1):(i*$ct+$ct)], ' ') AS chunk
       |  FROM bp0, LATERAL unnest(range(len(toks) // $ct)) AS u(i)
       |  WHERE len(toks) >= $ct),
       |bphot AS (
       |  SELECT md5(chunk) AS h FROM bpc
       |  GROUP BY md5(chunk) HAVING count(DISTINCT doc_id) > ${Dedup.boilerplateDf}),
       |bpkeep AS (
       |  SELECT doc_id, i, chunk FROM bpc
       |  WHERE md5(chunk) NOT IN (SELECT h FROM bphot)),
       |bpbody AS (
       |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY i) AS body, count(*) AS n_kept
       |  FROM bpkeep GROUP BY doc_id),
       |norm1 AS (
       |  SELECT n.doc_id, n.source, n.lang,
       |    CASE WHEN len(b.toks) < $ct THEN CAST(0 AS BIGINT)
       |         ELSE CAST(len(b.toks) // $ct - COALESCE(y.n_kept, 0) AS BIGINT)
       |    END AS bp_dropped,
       |    CASE WHEN len(b.toks) < $ct THEN n.text
       |         ELSE trim(COALESCE(y.body, '') ||
       |           CASE WHEN len(b.toks) % $ct > 0
       |                THEN ' ' || array_to_string(
       |                  b.toks[(len(b.toks) // $ct * $ct + 1):len(b.toks)], ' ')
       |                ELSE '' END)
       |    END AS text
       |  FROM norm0 n JOIN bp0 b USING (doc_id) LEFT JOIN bpbody y USING (doc_id)),
       |t0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    CASE WHEN len(string_split(text, ' ')) >= 2
       |         THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
       |              i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])
       |         ELSE [] END AS bgs
       |  FROM norm1),
       |g0 AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN 10 * len(list_filter(w, x -> x IN (${Curation.stopListSql})))
       |         >= len(w) THEN 1 ELSE 0 END AS BIGINT) AS is_en,
       |    CAST(CASE WHEN len(w) >= 20 AND 10 * len(list_distinct(w)) >= 3 * len(w)
       |         THEN 1 ELSE 0 END AS BIGINT) AS is_quality,
       |    CAST(CASE WHEN 5 * COALESCE(list_max(list_transform(list_distinct(bgs),
       |         b -> len(list_filter(bgs, x -> x = b)))), 0) > len(bgs)
       |         THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
       |  FROM t0),
       |gv AS (
       |  SELECT doc_id, is_en, is_quality, is_repetitive,
       |    CAST(CASE WHEN is_en = 1 AND is_quality = 1 AND is_repetitive = 0
       |         THEN 1 ELSE 0 END AS BIGINT) AS gate_kept
       |  FROM g0),
       |admitted AS (
       |  SELECT n.doc_id, n.source, n.text
       |  FROM norm1 n JOIN gv USING (doc_id) WHERE gv.gate_kept = 1),
       |$dedupChain,
       |${Clustering.ccLabelCtes},
       |dkeep AS (
       |  SELECT a.doc_id,
       |    CAST(CASE WHEN COALESCE(l.cluster_id, a.doc_id) = a.doc_id
       |         THEN 1 ELSE 0 END AS BIGINT) AS dup_kept
       |  FROM admitted a LEFT JOIN labels l ON l.doc_id = a.doc_id),
       |deduped AS (
       |  SELECT a.doc_id, a.source, a.text
       |  FROM admitted a JOIN dkeep k ON k.doc_id = a.doc_id AND k.dup_kept = 1),
       |capv AS (
       |  SELECT doc_id, src_rank,
       |    CAST(CASE WHEN src_rank <= ${Curation.sourceCapM} THEN 1 ELSE 0 END AS BIGINT) AS cap_kept
       |  FROM (
       |    SELECT doc_id,
       |      CAST(row_number() OVER (PARTITION BY source
       |        ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS src_rank
       |    FROM deduped)),
       |keptd AS (
       |  SELECT d.doc_id, d.text
       |  FROM deduped d JOIN capv c ON c.doc_id = d.doc_id AND c.cap_kept = 1),
       |pt AS (
       |  SELECT doc_id, md5('pack' || CAST(doc_id AS VARCHAR)) AS k,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
       |  FROM keptd),
       |pk AS (
       |  SELECT doc_id, tok,
       |    COALESCE(SUM(tok) OVER (ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM pt),
       |pk2 AS (
       |  SELECT doc_id, tok, CAST(cb // ${Packing.ctxBudget} AS BIGINT) AS bin,
       |    CAST(cb % ${Packing.ctxBudget} AS BIGINT) AS bin_offset,
       |    CAST(CASE WHEN (cb + tok - 1) // ${Packing.ctxBudget} > cb // ${Packing.ctxBudget}
       |         THEN 1 ELSE 0 END AS BIGINT) AS crosses
       |  FROM pk),
       |sd AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS u,
       |    md5('ord' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM keptd),
       |sl AS (
       |  SELECT doc_id, h,
       |    CASE WHEN u < 90 THEN 'train' WHEN u < 95 THEN 'val' ELSE 'test' END AS split
       |  FROM sd),
       |sp AS (
       |  SELECT doc_id, split,
       |    CAST(row_number() OVER (PARTITION BY split ORDER BY h, doc_id) AS BIGINT) AS pos
       |  FROM sl),
       |dp AS (
       |  SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS bg
       |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM norm1) t,
       |       LATERAL unnest(generate_series(1, len(w) - 1)) AS dsu(i)
       |  WHERE len(w) >= 2),
       |dcr AS (
       |  SELECT bg, count(*) AS c_r,
       |    sum(CASE WHEN lang = '${Curation.dsirTargetLang}' THEN 1 ELSE 0 END) AS c_t
       |  FROM dp GROUP BY bg),
       |dtot AS (SELECT sum(c_r) AS tr, sum(c_t) AS tt, count(*) AS b FROM dcr),
       |ddict AS (
       |  SELECT bg,
       |    CAST(round(1000000.0 * ln(CAST(c_t + 1 AS DOUBLE) / (tt + b)), 0) AS BIGINT)
       |    - CAST(round(1000000.0 * ln(CAST(c_r + 1 AS DOUBLE) / (tr + b)), 0) AS BIGINT)
       |      AS delta6
       |  FROM dcr, dtot),
       |dsirw AS (
       |  SELECT dp.doc_id,
       |    CAST(floor((abs(sum(delta6)) + 50) / 100)
       |         * (CASE WHEN sum(delta6) < 0 THEN -1 ELSE 1 END) AS BIGINT)
       |      / 10000.0 AS dsir_logratio
       |  FROM dp JOIN ddict USING (bg)
       |  JOIN keptd kd ON kd.doc_id = dp.doc_id
       |  GROUP BY dp.doc_id)
       |,${Curation.ruleFailedCteSql("norm1")}
       |,${TextAnalysis.charEntropyCteSql("norm1")}
       |SELECT gv.doc_id, n1.bp_dropped, rf.rule_failed, e.entropy_bits,
       |  gv.is_en, gv.is_quality, gv.is_repetitive, gv.gate_kept,
       |  k.dup_kept, c.src_rank, c.cap_kept,
       |  p.tok, p.bin, p.bin_offset, p.crosses, s.split, s.pos, w.dsir_logratio,
       |  CAST(CASE WHEN gv.gate_kept = 1 AND k.dup_kept = 1 AND c.cap_kept = 1
       |       THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM gv
       |JOIN norm1 n1 ON n1.doc_id = gv.doc_id
       |LEFT JOIN rf ON rf.doc_id = gv.doc_id
       |LEFT JOIN ent e ON e.doc_id = gv.doc_id
       |LEFT JOIN dkeep k ON k.doc_id = gv.doc_id
       |LEFT JOIN capv c ON c.doc_id = gv.doc_id
       |LEFT JOIN pk2 p ON p.doc_id = gv.doc_id
       |LEFT JOIN sp s ON s.doc_id = gv.doc_id
       |LEFT JOIN dsirw w ON w.doc_id = gv.doc_id
       |ORDER BY gv.doc_id""".stripMargin
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_pipeline" -> QueryDef(
      pipelineFate,
      Some(pipelineSql),
      "composed curation pipeline: normalize → strip → gates → dedup → caps → pack → split + DSIR + rule diagnostics, one DAG"),
  )
}

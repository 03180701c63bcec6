package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Text-analysis operators a training-data pipeline runs over every
  * document (north-star obligations beyond SURVEY §2.5 X2): token
  * counting (whitespace + BPE-ish greedy chunking), language-ID by
  * stopword ratio, quality scoring, and a position-weighted document
  * fingerprint. All pure column expressions / HOFs — per-row narrow
  * work that scales embarrassingly; the only shuffle anywhere is the
  * fingerprint's per-doc aggregate, keyed by doc_id (no hot keys).
  *
  * Determinism: counts and flags are integers; the two ratios are
  * exact-in-double fractions of small ints rounded at 4 dp (no
  * representable half-way ties for denominators ≤ 1000).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  import Hashing.h32

  /** Token counting: whitespace tokens vs BPE-ish greedy ≤4-char
    * chunks (`[a-z]{1,4}` — leftmost-greedy in both regex engines).
    * The chunk count is the "token budget" estimator a pipeline uses
    * before running a real tokenizer.
    */
  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0))).cast("long").as("n_bpe_tokens"),
        col("n_chars"))
      .orderBy("doc_id")

  private val stopwords = Seq("the", "a", "of", "to", "and", "is", "in")

  /** Language-ID heuristic: share of closed-class English tokens.
    * Prediction is pure integer arithmetic (10·stop ≥ n ⇔ ratio ≥
    * 10%), so no float can flip a label.
    */
  private def langId(s: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    val nStop = size(filter(w, t => t.isin(stopwords.map(lit(_)): _*)))
    docs(s, dir)
      .select(
        col("doc_id"), col("lang"),
        size(w).cast("long").as("n_tokens"),
        nStop.cast("long").as("n_stop"),
        when(nStop * 10 >= size(w), lit("en")).otherwise(lit("other")).as("pred"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length, mean token length, type-token ratio,
    * and the integer-arithmetic keep/drop flag a filtering pipeline
    * would apply (≥20 tokens and TTR ≥ 30%).
    */
  private def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    val nTok = size(w)
    val nDistinct = size(array_distinct(w))
    val tokChars = aggregate(transform(w, t => length(t)), lit(0), (acc, x) => acc + x)
    docs(s, dir)
      .select(
        col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        nDistinct.cast("long").as("n_distinct"),
        tokChars.cast("long").as("token_chars"),
        round(tokChars.cast("double") / nTok, 4).as("avg_token_len"),
        round(nDistinct.cast("double") * 100 / nTok, 4).as("ttr_pct"),
        when(nTok >= 20 && nDistinct * 10 >= nTok * 3, lit(1L)).otherwise(lit(0L)).as("is_quality"))
      .orderBy("doc_id")
  }

  /** Position-weighted rolling fingerprint: Σ (h32(tokᵢ) mod 2²⁰−3) ·
    * ((i mod 64)+1) over all token occurrences — order-sensitive
    * (unlike a set hash), bounded to exact-integer range, and
    * computable by both engines bit-identically.
    */
  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum((h32(col("tok")) % 1048573) * ((col("pos") % 64) + 1)).cast("long").as("fingerprint"))
      .orderBy("doc_id")

  /** Data profiling — the first thing any pipeline runs against a new
    * table: per-column counts, null counts, distinct counts, min/max.
    * One aggregate pass per profiled column unioned into a tall
    * result; numeric and string extrema live in separate typed columns
    * (no cross-engine float→string formatting in the output).
    */
  private def profile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    def num(c: String): DataFrame = o.agg(
      lit(c).as("col_name"),
      count(lit(1)).as("n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      round(min(col(c)).cast("double"), 4).as("min_num"),
      round(max(col(c)).cast("double"), 4).as("max_num"),
      lit(null).cast("string").as("min_str"),
      lit(null).cast("string").as("max_str"))
    def str(c: String): DataFrame = o.agg(
      lit(c).as("col_name"),
      count(lit(1)).as("n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      lit(null).cast("double").as("min_num"),
      lit(null).cast("double").as("max_num"),
      min(col(c)).as("min_str"),
      max(col(c)).as("max_str"))
    Seq(num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
        str("o_orderstatus"), str("o_orderpriority"))
      .reduce(_ unionByName _)
      .orderBy("col_name")
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_token_count" -> QueryDef(
      tokenCount,
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS n_bpe_tokens,
             |  n_chars
             |FROM documents ORDER BY doc_id""".stripMargin),
      "token counting: whitespace + BPE-ish greedy chunks"),
    "q_lang_id" -> QueryDef(
      langId,
      Some("""SELECT doc_id, lang,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(string_split(text, ' '),
             |       x -> x IN ('the', 'a', 'of', 'to', 'and', 'is', 'in'))) AS BIGINT) AS n_stop,
             |  CASE WHEN 10 * len(list_filter(string_split(text, ' '),
             |       x -> x IN ('the', 'a', 'of', 'to', 'and', 'is', 'in')))
             |       >= len(string_split(text, ' '))
             |       THEN 'en' ELSE 'other' END AS pred
             |FROM documents ORDER BY doc_id""".stripMargin),
      "language-ID heuristic by stopword ratio"),
    "q_quality_score" -> QueryDef(
      qualityScore,
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             |SELECT doc_id,
             |  CAST(len(w) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
             |  CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS token_chars,
             |  round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w), 4) AS avg_token_len,
             |  round(CAST(len(list_distinct(w)) AS DOUBLE) * 100 / len(w), 4) AS ttr_pct,
             |  CAST(CASE WHEN len(w) >= 20 AND 10 * len(list_distinct(w)) >= 3 * len(w)
             |       THEN 1 ELSE 0 END AS BIGINT) AS is_quality
             |FROM t ORDER BY doc_id""".stripMargin),
      "quality scoring: length / token-length / type-token ratio + keep flag"),
    "q_fingerprint" -> QueryDef(
      fingerprint,
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(w) AS tok, unnest(generate_series(1, len(w))) AS i
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum((('0x' || substr(md5(tok), 1, 8))::BIGINT % 1048573) * (((i - 1) % 64) + 1)) AS BIGINT) AS fingerprint
             |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "position-weighted rolling document fingerprint"),
    "q_profile" -> QueryDef(
      profile,
      Some {
        def num(c: String) =
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  round(CAST(min($c) AS DOUBLE), 4) AS min_num,
             |  round(CAST(max($c) AS DOUBLE), 4) AS max_num,
             |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |FROM orders""".stripMargin
        def str(c: String) =
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |  min($c) AS min_str, max($c) AS max_str
             |FROM orders""".stripMargin
        Seq(num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
            str("o_orderstatus"), str("o_orderpriority"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
      },
      "per-column data profiling: counts / nulls / distinct / extrema"),
  )
}

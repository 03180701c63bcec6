package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Shuffle-health operators (SURVEY.md §2.5, X128+): the audits and
  * mitigations a 100 TB deployment runs on its own EXECUTION plan, not
  * its data content. Every big join/aggregation in this engine shuffles
  * on some key; a single hot key turns a 1000-executor stage into a
  * one-straggler stage. This module makes that risk a first-class,
  * oracle-checked query surface:
  *
  *  - X128 `q_key_skew` — the detector: per declared hot-key family
  *    (the keys this engine's own operators shuffle on), the exact
  *    key-cardinality profile, the max/avg skew ratio, and the salt
  *    factor a mitigation would need.
  *
  * Reference: the reference daemon (SURVEY §1) is single-threaded and
  * never shuffles; this family exists purely for the Spark-scale
  * execution model (SURVEY §4).
  */
object Shuffle {

  /** The hot-key families this engine's own operators shuffle on:
    * sessionize/funnel/upsert group events by user; the tumble/rate
    * windows group by event_type; Q3-style joins shuffle orders on
    * custkey and lineitem on partkey; every per-source rollup groups
    * documents by source. Auditing exactly these keys makes X128 the
    * planner's pre-flight check, not a generic profiler.
    */
  private[graft] val skewFamilies: Seq[(String, String)] = Seq(
    "documents" -> "source",
    "events" -> "event_type",
    "events" -> "user_id",
    "lineitem" -> "l_partkey",
    "orders" -> "o_custkey")

  /** The skew verdict threshold: a key family is flagged when its
    * hottest key holds more than 4x the average key's rows — the point
    * where AQE's skew-join splitting starts to matter and a
    * stream-static or aggregate path (which AQE cannot rescue) needs
    * explicit salting.
    */
  private[graft] val skewThreshold = 4L

  /** The (key, count) dictionary for one audited key family — the ONE
    * corpus-scale pass (narrow single-column scan, map-side partial
    * agg, one exchange to the key dictionary). Factored out of
    * [[keySkewOf]] so ShuffleSpec can pin column pruning (ReadSchema
    * carries only the audited key) on the pre-checkpoint plan.
    */
  private[graft] def keyCounts(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))

  /** X128 core — audit one key family's count dictionary into a 1-row
    * profile. The dictionary is localCheckpointed because it has two
    * consumers (the totals aggregate and the hot-key argmax scan) —
    * the q_dedup_sweep lesson: without the checkpoint each consumer
    * re-runs the corpus scan + exchange.
    *
    * Numerics are exact end-to-end: skew_ratio = max_cnt*n_keys/n_rows
    * is an exact rational rounded 4dp HALF_UP in integer space
    * ((20000*num + den) DIV (2*den), DECIMAL(38,0) so 10^13 rows x
    * 10^9 keys stays in range); salt_n = ceil(max/avg) by integer
    * ceiling division; hot_key is the STRING-MIN key among the max-
    * count ties (deterministic in both engines byte-wise).
    */
  private[graft] def keySkewOf(
      df: DataFrame, keyCol: String, label: String): DataFrame = {
    val cnts = keyCounts(df, keyCol).localCheckpoint(true)
    val tot = cnts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_cnt"))
    cnts.crossJoin(broadcast(tot))
      .filter(col("c") === col("max_cnt"))
      .groupBy(col("n_rows"), col("n_keys"), col("max_cnt"))
      .agg(min(col("k")).as("hot_key"))
      .withColumn("q4", expr(
        """CAST((CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 20000
          |       + CAST(n_rows AS DECIMAL(38,0)))
          |  DIV (2 * CAST(n_rows AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .select(
        lit(label).as("key_name"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_keys").cast("long").as("n_keys"),
        col("max_cnt").cast("long").as("max_cnt"),
        col("hot_key"),
        (col("q4") / lit(10000.0)).as("skew_ratio"),
        expr(
          s"""CAST(CASE WHEN CAST(max_cnt AS DECIMAL(38,0)) * n_keys
             |         > $skewThreshold * CAST(n_rows AS DECIMAL(38,0))
             |    THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("is_skewed"),
        expr(
          s"""CAST(CASE WHEN CAST(max_cnt AS DECIMAL(38,0)) * n_keys
             |         > $skewThreshold * CAST(n_rows AS DECIMAL(38,0))
             |    THEN (CAST(max_cnt AS DECIMAL(38,0)) * n_keys
             |          + CAST(n_rows AS DECIMAL(38,0)) - 1)
             |         DIV CAST(n_rows AS DECIMAL(38,0))
             |    ELSE 1 END AS BIGINT)""".stripMargin).as("salt_n"))
  }

  /** X128 — shuffle-key skew audit (`q_key_skew`): the pre-flight
    * check a planner runs before committing a 100 TB shuffle. Per
    * declared hot-key family: row count, key cardinality, hottest
    * key + its row count, the exact max/avg skew ratio, the >4x
    * verdict, and the salt factor (ceil(max/avg) — how many ways the
    * hot key must split so no reducer holds more than ~the average
    * load) a mitigation would use.
    *
    * The shipped corpus is HEALTHY — every family's ratio sits in
    * [1.0, 2.5], all verdicts 0, all salt_n 1 (the degenerate-audit
    * pass state, the X127 precedent) — so ShuffleSpec drives the fired
    * branch through the same [[keySkewOf]] on a synthetic zipf fixture
    * and recounts every field sequentially at two SFs.
    *
    * Scale: per family ONE narrow single-column scan collapsed
    * map-side to the key dictionary, a localCheckpoint of that
    * dictionary, a 1-row broadcast totals join back, and a
    * dictionary-bounded argmax scan. Five families = five independent
    * small plans; nothing corpus-wide survives past the first agg.
    */
  private def keySkew(s: SparkSession, dir: String): DataFrame =
    skewFamilies.map { case (t, k) =>
      keySkewOf(Tables(s, dir, t), k, s"$t.$k")
    }.reduce(_ unionByName _).orderBy("key_name")

  private def skewSql(table: String, key: String): String =
    s"""SELECT '$table.$key' AS key_name, CAST(t.n AS BIGINT) AS n_rows,
       |  CAST(t.nk AS BIGINT) AS n_keys, CAST(t.mx AS BIGINT) AS max_cnt,
       |  (SELECT min(k) FROM (SELECT CAST($key AS VARCHAR) k, count(*) c
       |                       FROM $table GROUP BY $key) c2
       |   WHERE c2.c = t.mx) AS hot_key,
       |  CAST((CAST(t.mx AS HUGEINT) * t.nk * 20000 + t.n)
       |       // (2 * CAST(t.n AS HUGEINT)) AS BIGINT) / 10000.0 AS skew_ratio,
       |  CAST(CASE WHEN CAST(t.mx AS HUGEINT) * t.nk > $skewThreshold * CAST(t.n AS HUGEINT)
       |       THEN 1 ELSE 0 END AS BIGINT) AS is_skewed,
       |  CAST(CASE WHEN CAST(t.mx AS HUGEINT) * t.nk > $skewThreshold * CAST(t.n AS HUGEINT)
       |       THEN (CAST(t.mx AS HUGEINT) * t.nk + t.n - 1) // CAST(t.n AS HUGEINT)
       |       ELSE 1 END AS BIGINT) AS salt_n
       |FROM (SELECT sum(c) n, count(*) nk, max(c) mx
       |      FROM (SELECT count(*) c FROM $table GROUP BY $key) cc) t""".stripMargin

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_key_skew" -> QueryDef(
      keySkew,
      Some(skewFamilies.map { case (t, k) => skewSql(t, k) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")),
      "X128 shuffle-key skew audit: per hot-key family, exact skew ratio + salt recommendation"))
}

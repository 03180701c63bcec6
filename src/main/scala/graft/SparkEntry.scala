package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY.md §2 registers here as a
  * (name → QueryDef) pair in one of the operator modules; this object
  * is just the aggregation point the driver harness reads.
  */
object SparkEntry {

  /** All declared operators, in SURVEY.md §2 order. */
  def registry: ListMap[String, QueryDef] =
    operators.Etl.defs ++
      operators.Relational.defs ++
      operators.Sessions.defs ++
      operators.Extensions.defs ++
      operators.Dedup.defs ++
      operators.Clustering.defs ++
      operators.Similarity.defs ++
      operators.TextAnalysis.defs ++
      operators.Search.defs ++
      operators.Curation.defs ++
      operators.Packing.defs ++
      operators.Multimodal.defs ++
      operators.Pipeline.defs ++
      operators.Shuffle.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_window_tumble — the truest batch analog of the reference's whole
    * purpose: periodic batched aggregation of sensor events (SURVEY §7.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftConf.ensure(spark)
    operators.Etl.windowTumble(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Every oracle passes through [[OracleSql.materializeShared]] so a
    * multiply-referenced CTE can never be silently inlined into an
    * exponential recompute (the failure that blew the r14 check
    * budget) — see that object's doc for the mechanism.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql), _)) =>
      k -> OracleSql.materializeShared(sql)
    }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine hash helpers. The oracle-parity contract depends on
  * Spark and DuckDB computing these identically, so there is exactly
  * ONE definition shared by every operator (Dedup, TextAnalysis).
  */
object Hashing {
  /** 32-bit hash both engines compute identically: first 8 hex chars
    * of md5, read as an integer — DuckDB side:
    * `('0x' || substr(md5(x), 1, 8))::BIGINT`.
    */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit hash (first 15 hex chars of md5 — the widest prefix that
    * stays inside signed BIGINT on both engines) — DuckDB side:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}

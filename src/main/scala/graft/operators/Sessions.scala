package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import scala.collection.immutable.ListMap

/** Gap-based sessionization (SURVEY.md §2.4 R17) — the classic
  * event-analytics operator the relational surface was missing: group
  * each user's event stream into sessions separated by inactivity
  * gaps, then aggregate per session. This is the batch analog of the
  * streaming module's `session_window()` path (GatewaySpec covers the
  * streaming side); the batch form is what a 100 TB backfill runs.
  *
  * Determinism: timestamps are exact integer microseconds (the same
  * ns→µs truncation both engines apply to the parquet, SURVEY §7.3),
  * the gap test and the running session counter are pure integer
  * arithmetic, and the event order inside a user is totaled by
  * (us, event_id). The one float measure is round(sum(value), 4).
  *
  * Scale shape: ONE shuffle, on user_id, for the window; the
  * per-session aggregate reuses that clustering (hash(user_id)
  * already co-locates every (user_id, session_id) group, so
  * EnsureRequirements inserts no second exchange). Session state is
  * a running sum inside a sorted partition — no driver state, no
  * skew beyond the per-user event volume itself.
  */
object Sessions {

  /** Inactivity gap that closes a session: 8 hours. Chosen so the
    * synthetic events stream (median per-user gap ≈ 7.3 h) yields a
    * real mix of single- and multi-event sessions at every SF.
    */
  private val gapUs: Long = 480L * 60 * 1000000

  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      // first event of a user has a NULL lag → condition null → 1
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) <= gapUs, 0L).otherwise(1L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_sessionize" -> QueryDef(
      sessionize,
      Some(s"""WITH e AS (
              |  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events),
              |f AS (
              |  SELECT user_id, us, event_id, value,
              |    CASE WHEN us - lag(us) OVER (
              |           PARTITION BY user_id ORDER BY us, event_id) <= $gapUs
              |         THEN 0 ELSE 1 END AS new_s
              |  FROM e),
              |g AS (
              |  SELECT user_id, us, value,
              |    sum(new_s) OVER (
              |      PARTITION BY user_id ORDER BY us, event_id
              |      ROWS UNBOUNDED PRECEDING) AS session_id
              |  FROM f)
              |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              |  CAST(count(*) AS BIGINT) AS n_events,
              |  min(us) AS start_us, max(us) AS end_us,
              |  round(sum(value), 4) + 0 AS sum_value
              |FROM g GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin),
      "R17 gap-based sessionization: 8h-inactivity sessions per user"),
  )
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch ETL operators whose correctness contract goes beyond the
  * DuckDB oracle: q_outlier_mad's gate is recomputed here in plain
  * driver-side integer arithmetic — an independent third
  * implementation, so a shared misunderstanding between the Spark and
  * DuckDB formulations can't pass silently.
  */
class EtlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_outlier_mad matches an exact driver-side median/MAD recount") {
    import org.apache.spark.sql.functions._
    val raw = Tables(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // exact median of longs in doubled units: 2·middle or middle sum
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val byType = raw.groupBy(_._2)
    val expected = byType.toSeq.flatMap { case (_, rows) =>
      val m2 = med2(rows.map(_._3).toSeq)
      val devs = rows.toSeq.map { case (id, _, c) => id -> math.abs(2 * c - m2) }
      val mad4 = med2(devs.map(_._2))
      devs.collect { case (id, d2) if 2 * d2 > 3 * mad4 => id }
    }.toSet

    val got = SparkEntry.queries("q_outlier_mad")(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty, "vacuous spike gate")
  }
}

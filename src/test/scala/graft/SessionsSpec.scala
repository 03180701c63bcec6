package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of gap-based sessionization (SURVEY §2.4 R17) beyond
  * the DuckDB hash gate: sessions must PARTITION the event stream,
  * consecutive sessions must be separated by more than the gap, and
  * the plan must shuffle event data exactly once (the per-session
  * aggregate reuses the window's hash(user_id) clustering).
  */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.01"
  private val gapUs = 480L * 60 * 1000000

  test("sessions partition the event stream and respect the gap") {
    val rows = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    val totalEvents = Tables(spark, sf, "events").count()
    assert(rows.map(_.getLong(2)).sum === totalEvents,
      "session event counts do not partition the stream")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), "session start after end")
    }
    // consecutive sessions of a user are separated by MORE than the
    // gap — otherwise the splitter fired early
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to ordered.length),
        s"user $user session ids are not dense from 1")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) - a.getLong(4) > gapUs,
            s"user $user sessions ${a.getLong(1)}/${b.getLong(1)} closer than the gap")
        case _ =>
      }
    }
    // multi-event sessions exist (the gap isn't splitting every event)
    assert(rows.exists(_.getLong(2) > 1), "no multi-event session — gap too small for this corpus")
  }

  test("sessionization shuffles event data exactly once") {
    val plan = SparkEntry.queries("q_sessionize")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1,
      s"sessionize plans $hashExchanges hash exchanges — the session aggregate must reuse the window's user_id clustering:\n$plan")
  }
}

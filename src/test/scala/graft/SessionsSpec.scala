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

  test("q_funnel equals a sequential per-user scan and every depth occurs") {
    // R28 re-derived the obvious way: walk each user's time-ordered
    // events once, advancing a stage pointer — the chained-minima
    // formulation must agree exactly. Non-vacuity: all four depths
    // (0..3) occur, else a stage constraint is untested.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val evs = Tables(spark, dir, "events")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val stages = Seq("view", "click", "purchase")
      val w = graft.operators.Relational.funnelWindowUs
      val expected = evs.groupBy(_._1).map { case (u, rows) =>
        val ordered = rows.sortBy(_._3)
        val ts = Array(-1L, -1L, -1L)
        var stage = 0
        var anchor = Long.MinValue
        ordered.foreach { case (_, tp, us) =>
          if (stage < 3 && tp == stages(stage) && us > anchor
            && (stage == 0 || us <= anchor + w)) {
            ts(stage) = us; anchor = us; stage += 1
          }
        }
        u -> (ts(0), ts(1), ts(2), stage.toLong)
      }
      val got = SparkEntry.queries("q_funnel")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got === expected, s"funnel recount diverges at $dir")
      val depths = got.values.map(_._4).toSet
      assert(Set(1L, 2L, 3L).subsetOf(depths),
        s"depths $depths at $dir — a stage constraint is untested (conversion window vacuous)")
    }
  }

  test("q_retention equals a sequential cohort recount, day 0 is 100%, later cells decay") {
    // R29 re-derived: first signup day per user, distinct activity
    // days, the (cohort, offset) matrix with integer HALF_UP pcts.
    // Day 0 must be exactly 100.0 for every cohort (the signup IS
    // day-0 activity), and some later cell must sit below 100% —
    // the reason the operator is DAILY: a weekly matrix is all-100%
    // on this corpus and discriminates nothing (measured).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val evs = Tables(spark, dir, "events")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val week = (us: Long) => Math.floorDiv(us, 86400000000L)
      val cohort = evs.filter(_._2 == "signup").groupBy(_._1)
        .map { case (u, rs) => u -> rs.map(r => week(r._3)).min }
      val activity = evs.map(r => (r._1, week(r._3))).distinct
      val expected = activity.flatMap { case (u, aw) =>
        cohort.get(u).filter(aw >= _).map(cw => (cw, aw - cw))
      }.groupBy(identity).map { case ((cw, off), xs) =>
        val nAct = xs.length.toLong
        val nCoh = cohort.values.count(_ == cw).toLong
        (cw, off) -> (nAct, nCoh, (2000000L * nAct + nCoh) / (2 * nCoh) / 10000.0)
      }
      val got = SparkEntry.queries("q_retention")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(got === expected, s"retention recount diverges at $dir")
      val w0 = got.collect { case ((_, 0L), (_, _, pct)) => pct }
      assert(w0.nonEmpty && w0.forall(_ == 100.0),
        s"day-0 retention not 100% at $dir: $w0")
      assert(got.exists { case ((_, off), (_, _, pct)) => off > 0 && pct < 100.0 },
        s"no decaying cell at $dir — the matrix discriminates nothing")
    }
  }

  test("q_funnel plans no window and shuffles only user-keyed aggregates") {
    val plan = SparkEntry.queries("q_funnel")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"funnel plans a window:\n$plan")
    val ex = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(_.contains("user_id")),
      s"a non-user-keyed exchange appeared:\n${ex.mkString("\n")}")
  }
}

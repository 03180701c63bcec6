package graft

import org.scalatest.funsuite.AnyFunSuite

/** Simulates the driver's t1 smoke: `entry` must work on a session the
  * engine did not configure (no GraftConf call, no extensions) — entry
  * is responsible for its own session prerequisites.
  */
class EntrySpec extends AnyFunSuite {
  test("entry runs on an unconfigured session and returns rows") {
    val bare = SparkFixture.spark.newSession()
    assert(SparkEntry.entry(bare).count() > 0)
  }

  test("every declared query has an oracle") {
    // the driver records a weaker rows-only check for missing oracles;
    // this engine declares none without one
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }
}

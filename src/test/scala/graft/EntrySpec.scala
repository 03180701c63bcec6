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

  test("README's declared-operator count matches the registry (drift fails the build)") {
    // the README/SURVEY counts drifted for five rounds before r7 synced
    // them by hand (r7 verdict task 7): every prose claim of the query
    // count must now track the registry mechanically, or this fails
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")), "UTF-8")
    val claims = """\((\d+) declared operators\)""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toList
    assert(claims.nonEmpty, "README no longer states the declared-operator count")
    claims.foreach { n =>
      assert(n === SparkEntry.queries.size,
        s"README claims $n declared operators; registry has ${SparkEntry.queries.size}")
    }
    // the oracle-compare claim ("compare (N queries)") must match too
    """compare \((\d+) queries\)""".r.findAllMatchIn(readme).map(_.group(1).toInt).foreach { n =>
      assert(n === SparkEntry.oracleSql.size,
        s"README claims $n oracle queries; registry has ${SparkEntry.oracleSql.size}")
    }
  }
}

package graft

import graft.operators.Shuffle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X128 shuffle-key skew audit certificates: every declared field
  * recounted sequentially from the raw key columns at two SFs, the
  * fired (skewed) branch driven through the SAME keySkewOf machinery
  * on a zipf fixture (the shipped corpus is healthy — X127 precedent),
  * and the column-pruning plan pin on the dictionary pass.
  */
class ShuffleSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Sequential recount of one family's full audit row. */
  private def recount(keys: Seq[String], label: String)
      : (String, Long, Long, Long, String, Double, Long, Long) = {
    val cnt = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = keys.size.toLong
    val nk = cnt.size.toLong
    val mx = cnt.values.max
    val hot = cnt.filter(_._2 == mx).keys.min
    val q4 = ((BigInt(mx) * nk * 20000 + n) / (BigInt(n) * 2)).toLong
    val skewed = if (BigInt(mx) * nk > BigInt(n) * Shuffle.skewThreshold) 1L else 0L
    val salt = if (skewed == 1L) ((BigInt(mx) * nk + n - 1) / BigInt(n)).toLong else 1L
    (label, n, nk, mx, hot, q4 / 10000.0, skewed, salt)
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"q_key_skew: every family's row recounts sequentially at $sf") {
      val got = SparkEntry.queries("q_key_skew")(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
      val want = Shuffle.skewFamilies.map { case (t, k) =>
        val keys = Tables(spark, sf, t)
          .select(col(k).cast("string")).collect().map(_.getString(0)).toSeq
        recount(keys, s"$t.$k")
      }.sortBy(_._1)
      assert(got.toSeq === want)
      // the shipped corpus is HEALTHY: no family fires, no salt needed —
      // the degenerate-audit pass state the scaladoc claims
      assert(got.forall(r => r._7 == 0L && r._8 == 1L))
    }

  test("keySkewOf fires on a zipf fixture: verdict, ratio and salt factor exact") {
    import spark.implicits._
    // one hot key with 900 rows + 100 singleton keys: n=1000, nk=101,
    // max=900 -> ratio 90.9001 exact, salt = ceil(900*101/1000) = 91
    val keys = Seq.fill(900)("hot") ++ (1 to 100).map(i => f"k$i%03d")
    val df = keys.toDF("k2")
    val row = Shuffle.keySkewOf(df, "k2", "fixture.k2").collect().head
    assert(row.getLong(1) === 1000L)
    assert(row.getLong(2) === 101L)
    assert(row.getLong(3) === 900L)
    assert(row.getString(4) === "hot")
    assert(row.getDouble(5) === ((BigInt(900) * 101 * 20000 + 1000) / BigInt(2000)).toLong / 10000.0)
    assert(row.getLong(6) === 1L, "zipf fixture must fire the skew verdict")
    assert(row.getLong(7) === 91L, "salt = ceil(max/avg)")
    // recount certificate on the fixture too (both branches now certified)
    assert((row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getString(4), row.getDouble(5), row.getLong(6), row.getLong(7))
      === recount(keys, "fixture.k2"))
  }

  test("keySkewOf is repartition-invariant (order-free aggregates only)") {
    import spark.implicits._
    val keys = Seq.fill(50)("a") ++ Seq.fill(7)("b") ++ (1 to 20).map("c" + _)
    val a = Shuffle.keySkewOf(keys.toDF("k2"), "k2", "f").collect().head
    val b = Shuffle.keySkewOf(keys.reverse.toDF("k2").repartition(7), "k2", "f")
      .collect().head
    assert(a === b)
  }

  test("dictionary pass prunes the scan to the audited key column") {
    val plan = Shuffle.keyCounts(
      Tables(spark, "/root/testdata/sf0.001", "events"), "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<user_id"),
      s"events scan must read only user_id:\n$plan")
  }
}

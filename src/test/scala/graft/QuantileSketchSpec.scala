package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

/** R16's 100 TB path: the exact `percentile` declared as `q_quantiles`
  * materializes every group value in the aggregation buffer, which
  * cannot hold at scale; `Relational.quantilesApprox` is the
  * Greenwald–Khanna sketch form (fixed memory, mergeable partials).
  * Sketches have no cross-engine parity (DuckDB's approx_quantile is
  * a reservoir algorithm), so the sketch is verified here against the
  * sorted truth with its own rank-error guarantee instead of being
  * oracle-declared.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_percentile sketch stays within its rank-error bound of the sorted truth") {
    // coarse sketch (accuracy = 100 → rank error ≤ n/100 ≈ 20 of
    // ~2000 per group) so the bound is genuinely exercised rather
    // than the sketch degenerating to exact
    val acc = 100
    val approx = Relational.quantilesApprox(spark, sf, acc).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val values = Tables(spark, sf, "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(approx.keySet === values.keySet && approx.nonEmpty)
    for ((et, (p50, p90, n)) <- approx) {
      val v = values(et)
      assert(n === v.length.toLong)
      def assertRank(x: Double, p: Double): Unit = {
        val eps = v.length.toDouble / acc
        val lo = math.max(0, math.floor(p * v.length - eps).toInt - 1)
        val hi = math.min(v.length - 1, math.ceil(p * v.length + eps).toInt)
        assert(x >= v(lo) && x <= v(hi),
          s"$et p=$p sketch=$x outside rank window [${v(lo)}, ${v(hi)}]")
      }
      assertRank(p50, 0.5)
      assertRank(p90, 0.9)
    }
  }

  test("HLL++ cardinality sketch stays within its rsd bound of the exact distinct count") {
    // 5 sigma of the configured 5% rsd — astronomically unlikely to
    // flake if the sketch honors its guarantee, tight enough to catch
    // a broken estimator
    val rsd = 0.05
    val approx = Relational.distinctApprox(spark, sf, rsd).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "events")
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.length.toLong }
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    for ((et, est) <- approx) {
      val truth = exact(et)
      assert(math.abs(est - truth) <= math.max(1L, math.ceil(5 * rsd * truth).toLong),
        s"$et HLL estimate $est vs exact $truth exceeds 5x rsd")
    }
  }

  test("default-accuracy sketch tracks the exact interpolated path closely at this scale") {
    // at sf0.01 the default 1/10000 accuracy has rank error < 1
    // element per group: the sketch must return an element adjacent
    // to the exact interpolated percentile
    val exact = SparkEntry.queries("q_quantiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Relational.quantilesApprox(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((et, (e50, e90)) <- exact) {
      val (a50, a90) = approx(et)
      // interpolation can land between elements: allow the gap between
      // adjacent order statistics, measured generously as 1% of range
      assert(math.abs(a50 - e50) <= 0.5, s"$et p50 sketch $a50 vs exact $e50")
      assert(math.abs(a90 - e90) <= 0.5, s"$et p90 sketch $a90 vs exact $e90")
    }
  }
}

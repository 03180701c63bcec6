package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sketch-based dedup paths are judged against the complete
  * inverted-index Jaccard truth: both end in the same exact-Jaccard
  * verification, so LSH output must be a subset; recall is the quality
  * of the banding. Deterministic (fixed hash, fixed data).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("banded MinHash LSH: subset of exact-Jaccard truth, high recall") {
    val near = SparkEntry.queries("q_dedup_near")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.nonEmpty && mh.nonEmpty)
    assert(mh.subsetOf(near))
    assert(mh.size.toDouble >= 0.8 * near.size)
  }

  test("df cap is exact: nearPairs capped == uncapped, with df headroom") {
    // The r6 verdict's top integrity item: this pin was claimed in the
    // Dedup scaladoc before it existed. It compares the FULL pipeline
    // output (ids + shared + n_union) with the production cap against
    // maxDf = Long.MaxValue (cap disabled → pure uncapped inverted-
    // index join), at both test SFs, and asserts the corpus actually
    // leaves the cap headroom so silent drift fails here, not in prod.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val sh = graft.operators.Dedup.shingles(spark, dir).persist()
      try {
        def rows(maxDf: Long) = graft.operators.Dedup.nearPairs(sh, maxDf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val capped = rows(graft.operators.Dedup.nearMaxDf)
        val uncapped = rows(Long.MaxValue)
        assert(capped.nonEmpty, s"vacuous pin at $dir")
        assert(capped == uncapped, s"df cap changed q_dedup_near output at $dir")
        val maxDf = sh.groupBy("shingle").count()
          .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
        assert(maxDf <= graft.operators.Dedup.nearMaxDf,
          s"corpus drift: max shingle df $maxDf exceeds cap ${graft.operators.Dedup.nearMaxDf} at $dir")
        // exercise the high-df CORRECTION JOIN (short-circuited away
        // when no shingle exceeds the cap): with an artificially tiny
        // cap some shingles go high, candidate generation narrows,
        // but every surviving pair must still carry counts identical
        // to the uncapped truth — the correction term is exact
        val tinyCap = 2L
        assert(maxDf > tinyCap, s"tiny cap does not exercise the correction branch at $dir")
        val tight = rows(tinyCap)
        val truth = uncapped.map { case (a, b, s, u) => (a, b) -> ((s, u)) }.toMap
        assert(tight.nonEmpty, s"vacuous correction-branch pin at $dir")
        tight.foreach { case (a, b, s, u) =>
          assert(truth.get((a, b)).contains((s, u)),
            s"correction join produced wrong counts for ($a,$b) at $dir")
        }
      } finally sh.unpersist()
    }
  }

  test("MinHash sketch aggregate == 8-column min() signatures, elementwise") {
    // The TypedImperativeAggregate (one-pass, map-side partial merge)
    // must be bit-identical to the declarative 8-column min() form it
    // replaced in the q_dedup_minhash / q_dedup_fuzzy candidate path.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val sh = graft.operators.Dedup.shingles(spark, dir).persist()
      try {
        def sigs(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
        val sketch = sigs(graft.operators.Dedup.minhashSig(sh))
        val minCols = sigs(graft.operators.Dedup.minhashSigMinCols(sh))
        assert(sketch.nonEmpty, s"vacuous pin at $dir")
        assert(sketch === minCols, s"sketch aggregate diverged from min() path at $dir")
      } finally sh.unpersist()
    }
  }

  test("synthesized near-dup pairs are all recovered by every variant") {
    val expected = (0L until 500L by 25L).map(i => (i, i + 200000L)).toSet
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(pairs("q_dedup_near")))
    assert(expected.subsetOf(pairs("q_dedup_minhash")))
    assert(expected.subsetOf(pairs("q_dedup_simhash")))
    val embedExpected = (0L until 500L by 20L).map(i => (i, i + 100000L)).toSet
    assert(embedExpected.subsetOf(pairs("q_dedup_embed")))
  }
}

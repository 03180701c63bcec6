package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the result-preserving claims TextAnalysis makes about its
  * scale guards (r6 ADVICE item 3): the co-occurrence df floor bounds
  * the quadratic pair stream, and these tests prove it does not
  * change the declared top-30 on the test corpora — so a sparser
  * corpus where the floor starts dropping ranked pairs fails here,
  * loudly, instead of silently passing a mirrored oracle.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("cooccur df floor is result-preserving: floored top-30 == unfloored, with headroom") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def top30(minDf: Long) =
        graft.operators.TextAnalysis.cooccurTop(spark, dir, minDf)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
      val floored = top30(graft.operators.TextAnalysis.cooccurMinDf)
      val unfloored = top30(1L)
      assert(floored.nonEmpty, s"vacuous pin at $dir")
      assert(floored === unfloored, s"df floor changed the co-occurrence top-30 at $dir")
      // headroom: the 30th-ranked pair clears the floor comfortably,
      // so corpus drift has to travel far before the pin above trips
      val last = floored.last._3
      assert(last >= graft.operators.TextAnalysis.cooccurMinDf,
        s"30th-ranked n_docs $last is below the floor at $dir")
    }
  }
}

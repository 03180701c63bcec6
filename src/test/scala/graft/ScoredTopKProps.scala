package graft

import graft.plans.ScoredTopKPushdown.{cosineUpperBound, roundScale, unitDotUpperBound}
import org.scalacheck.{Gen, Prop, Properties}

/** Soundness of the early-abandonment math in the similarity top-K
  * pushdown (graft.plans.ScoredTopK): pruning a row is only correct
  * if the prefix bound NEVER undershoots the row's true final score —
  * otherwise a true top-K member could be skipped. These laws hold
  * for every vector pair and every prefix split, independent of the
  * PlanAuditSpec equivalence pin on real corpus data.
  */
object ScoredTopKProps extends Properties("ScoredTopK") {

  private val elem: Gen[Double] = Gen.chooseNum(-10.0, 10.0)
  private val vecPair: Gen[(List[Double], List[Double])] = for {
    n <- Gen.chooseNum(2, 64)
    x <- Gen.listOfN(n, elem)
    q <- Gen.listOfN(n, elem)
  } yield (x, q)

  private def cosine(x: Seq[Double], q: Seq[Double]): Double = {
    val dot = x.zip(q).map { case (a, b) => a * b }.sum
    dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(q.map(v => v * v).sum))
  }

  property("cosine prefix bound >= true final cosine, at every split") =
    Prop.forAll(vecPair) { case (x, q) =>
      val qNorm = math.sqrt(q.map(v => v * v).sum)
      val truth = cosine(x, q)
      // skip degenerate zero-norm cases (score is NaN; the exec never
      // prunes NaN because round keeps it NaN and NaN sorts greatest)
      (qNorm == 0 || x.forall(_ == 0.0)) || {
        (1 until x.length).forall { i =>
          val dot = x.take(i).zip(q).map { case (a, b) => a * b }.sum
          val xPreSq = x.take(i).map(v => v * v).sum
          val qSufSq = q.drop(i).map(v => v * v).sum
          cosineUpperBound(dot, xPreSq, qSufSq, qNorm) >= truth - 1e-12
        }
      }
    }

  property("unit-dot prefix bound >= true final dot for unit-norm x, at every split") =
    Prop.forAll(vecPair) { case (x0, q) =>
      val nrm = math.sqrt(x0.map(v => v * v).sum)
      nrm == 0 || {
        val x = x0.map(_ / nrm) // the declared contract: |x| = 1
        val truth = x.zip(q).map { case (a, b) => a * b }.sum
        (1 until x.length).forall { i =>
          val dot = x.take(i).zip(q).map { case (a, b) => a * b }.sum
          val xPreSq = x.take(i).map(v => v * v).sum
          val qSufNorm = math.sqrt(q.drop(i).map(v => v * v).sum)
          unitDotUpperBound(dot, xPreSq, qSufNorm) >= truth - 1e-12
        }
      }
    }

  property("L2 partial sum <= true final distance, at every split") =
    Prop.forAll(vecPair) { case (x, q) =>
      val truth = x.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      (1 until x.length).forall { i =>
        x.take(i).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum <= truth + 1e-12
      }
    }

  property("roundScale matches Catalyst Round HALF_UP on doubles") =
    Prop.forAll(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0, 6)) { (v: Double, s: Int) =>
      val expected = BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
      roundScale(v, s) == expected
    }

  property("rounding is monotone: bound >= score implies round(bound) >= round(score)") =
    Prop.forAll(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0, 6)) {
      (a: Double, d: Double, s: Int) =>
        roundScale(a + d, s) >= roundScale(a, s)
    }
}

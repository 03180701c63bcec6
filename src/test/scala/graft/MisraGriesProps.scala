package graft

import graft.functions.MisraGries
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** The Misra–Gries guarantees, verified over arbitrary partitionings
  * and merge groupings (Spark may split a stream across any number of
  * partial buffers and merge in any order — the serialize round-trip
  * sits between map and reduce sides):
  *
  *  - SUPERSET: every token with true count > spill survives;
  *  - BOUNDS: counter ≤ true ≤ counter + spill for present tokens,
  *    true ≤ spill for absent ones;
  *  - BUDGET: spill ≤ N / (capacity + 1) (Mergeable Summaries);
  *  - LOSSLESS: spill == 0 ⟹ counters ARE the exact counts.
  *
  * These laws are exactly what makes the certificate in
  * `TextAnalysis.heavyHittersOver` sound: counter values may depend
  * on partition order once spills fire, but the bounds never do.
  */
object MisraGriesProps extends Properties("MisraGries") {

  private val capacity = 8
  private val agg = MisraGries(BoundReference(0, StringType, nullable = true), capacity)

  private type Buf = MisraGries.Buffer

  // a Zipf-ish mix: a few hot tokens over a wide cold alphabet, so
  // streams genuinely overflow the 8-entry buffer
  private val token: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("hot1", "hot2", "hot3"),
    3 -> Gen.choose(0, 30).map("warm" + _),
    2 -> Gen.choose(0, 500).map("cold" + _))

  private def fold(vs: Seq[String]): Buf =
    vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(UTF8String.fromString(v)))
    }

  /** Partition the stream, fold each part, round-trip every partial
    * through serialize/deserialize, then merge left-to-right — the
    * actual distributed execution shape.
    */
  private def distributed(vs: Seq[String], nParts: Int): Buf =
    vs.grouped(math.max(1, vs.length / nParts)).toSeq
      .map(p => agg.deserialize(agg.serialize(fold(p))))
      .reduce(agg.merge)

  private def counts(b: Buf): Map[String, Long] =
    b.counts.map { case (t, c) => t.toString -> c }.toMap

  property("superset: true count > spill implies present") =
    Prop.forAll(Gen.nonEmptyListOf(token), Gen.chooseNum(1, 6)) { (vs, nParts) =>
      val b = distributed(vs, nParts)
      val cs = counts(b)
      val truth = vs.groupBy(identity).view.mapValues(_.size.toLong)
      truth.forall { case (t, n) => n <= b.spill || cs.contains(t) }
    }

  property("bounds: counter <= true <= counter + spill; absent <= spill") =
    Prop.forAll(Gen.nonEmptyListOf(token), Gen.chooseNum(1, 6)) { (vs, nParts) =>
      val b = distributed(vs, nParts)
      val cs = counts(b)
      val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.forall { case (t, n) =>
        cs.get(t) match {
          case Some(c) => c <= n && n <= c + b.spill
          case None    => n <= b.spill
        }
      } && cs.keys.forall(truth.contains)
    }

  property("budget: spill <= N / (capacity + 1), size <= capacity") =
    Prop.forAll(Gen.nonEmptyListOf(token), Gen.chooseNum(1, 6)) { (vs, nParts) =>
      val b = distributed(vs, nParts)
      b.spill <= vs.length / (capacity + 1) && b.counts.size <= capacity
    }

  property("lossless regime: spill == 0 implies exact counts") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.oneOf((0 until capacity).map("t" + _))),
      Gen.chooseNum(1, 6)) { (vs, nParts) =>
      // alphabet <= capacity: no update can overflow, and merges of
      // sub-alphabets can't either, so the sketch must be exact
      val b = distributed(vs, nParts)
      val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      b.spill == 0L && counts(b) == truth
    }

  property("serialize/deserialize round-trips buffer and spill") =
    Prop.forAll(Gen.listOf(token)) { vs =>
      val b = fold(vs)
      val r = agg.deserialize(agg.serialize(b))
      r.spill == b.spill && counts(r) == counts(b)
    }

  property("null input rows leave the buffer unchanged") =
    Prop.forAll(Gen.nonEmptyListOf(token)) { vs =>
      val b = fold(vs)
      val before = (counts(b), b.spill)
      val after = agg.update(b, InternalRow(null))
      (counts(after), after.spill) == before
    }
}

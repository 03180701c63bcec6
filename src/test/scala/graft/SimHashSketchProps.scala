package graft

import graft.functions.SimHashSketch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** Buffer-algebra laws of the SimHash sketch aggregate: Spark may
  * split a group's rows across any number of partial buffers, merge
  * them in any grouping, and round-trip buffers through
  * serialize/deserialize between map and reduce sides — the packed
  * sketch must always equal a single sequential fold. Null inputs
  * must mirror the declarative `sum(when(bit).otherwise(-1))` form:
  * every bit counter decrements.
  */
object SimHashSketchProps extends Properties("SimHashSketch") {

  private val agg = SimHashSketch(BoundReference(0, LongType, nullable = true))

  private val hash60: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val maybeHash: Gen[Option[Long]] =
    Gen.frequency(9 -> hash60.map(Some(_)), 1 -> Gen.const(None))

  private def fold(vs: Seq[Option[Long]]): Array[Int] =
    vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(v.orNull))
    }

  property("arbitrary partitioning + merge == sequential fold") =
    Prop.forAll(Gen.nonEmptyListOf(maybeHash), Gen.chooseNum(1, 8)) { (vs, nParts) =>
      val parts = vs.grouped(math.max(1, vs.length / nParts)).toSeq
      val merged = parts.map(fold).reduce { (a, b) => agg.merge(a.clone(), b.clone()) }
      merged.sameElements(fold(vs)) && agg.eval(merged) == agg.eval(fold(vs))
    }

  property("serialize/deserialize round-trips the buffer") =
    Prop.forAll(Gen.nonEmptyListOf(maybeHash)) { vs =>
      agg.deserialize(agg.serialize(fold(vs))).sameElements(fold(vs))
    }

  property("eval packs the per-bit majority vote") =
    Prop.forAll(Gen.nonEmptyListOf(hash60)) { vs =>
      val expected = (0 until SimHashSketch.bits).map { j =>
        val votes = vs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << j else 0L
      }.sum
      agg.eval(fold(vs.map(Some(_)))) == expected
    }

  property("null input decrements every counter (otherwise(-1) parity)") =
    Prop.forAll(Gen.chooseNum(1, 5)) { n =>
      fold(Seq.fill(n)(None)).forall(_ == -n)
    }
}

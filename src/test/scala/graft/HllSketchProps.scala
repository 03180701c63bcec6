package graft

import graft.functions.HllSketch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** Buffer-algebra laws of the HLL register sketch: Spark may split a
  * group's rows across any number of partial buffers, merge them in
  * any grouping, and round-trip buffers through serialize/deserialize
  * between map and reduce sides — the (s, v) statistics must always
  * equal a single sequential fold. Two laws the other sketches don't
  * have: merge is IDEMPOTENT (max-registers — replaying any input
  * subset changes nothing, the property the streaming dial's
  * at-least-once absorption rests on), and eval's s/v must equal the
  * definitional register sum recomputed from scratch.
  */
object HllSketchProps extends Properties("HllSketch") {

  private val agg = HllSketch(BoundReference(0, LongType, nullable = true))

  private val hash60: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val maybeHash: Gen[Option[Long]] =
    Gen.frequency(9 -> hash60.map(Some(_)), 1 -> Gen.const(None))

  private def fold(vs: Seq[Option[Long]]): Array[Byte] =
    vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(v.orNull))
    }

  private def sv(buf: Array[Byte]): (Long, Long) = {
    val row = agg.eval(buf).asInstanceOf[GenericInternalRow]
    (row.getLong(0), row.getLong(1))
  }

  property("arbitrary partitioning + merge == sequential fold") =
    Prop.forAll(Gen.nonEmptyListOf(maybeHash), Gen.chooseNum(1, 8)) { (vs, nParts) =>
      val parts = vs.grouped(math.max(1, vs.length / nParts)).toSeq
      val merged = parts.map(fold).reduce { (a, b) => agg.merge(a.clone(), b.clone()) }
      merged.sameElements(fold(vs)) && sv(merged) == sv(fold(vs))
    }

  property("merge is idempotent: re-merging any prefix changes nothing") =
    Prop.forAll(Gen.nonEmptyListOf(hash60), Gen.chooseNum(0, 10)) { (vs, k) =>
      val all = fold(vs.map(Some(_)))
      val replay = fold(vs.take(math.min(k, vs.length)).map(Some(_)))
      agg.merge(all.clone(), replay).sameElements(all)
    }

  property("serialize/deserialize round-trips the buffer") =
    Prop.forAll(Gen.nonEmptyListOf(maybeHash)) { vs =>
      agg.deserialize(agg.serialize(fold(vs))).sameElements(fold(vs))
    }

  property("eval == definitional register sum (s = sum 2^(53-M_j), v = empties)") =
    Prop.forAll(Gen.nonEmptyListOf(hash60)) { vs =>
      val regs = new Array[Int](HllSketch.m)
      vs.foreach { h =>
        val j = ((h >>> 52) & (HllSketch.m - 1)).toInt
        val w = h & ((1L << 52) - 1)
        val rho = 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      val s = regs.map(r => 1L << (53 - r)).sum
      val v = regs.count(_ == 0).toLong
      sv(fold(vs.map(Some(_)))) == ((s, v))
    }

  property("null input is ignored (count-distinct semantics)") =
    Prop.forAll(Gen.nonEmptyListOf(hash60)) { vs =>
      val withNulls = vs.flatMap(h => Seq(Some(h), None))
      fold(withNulls).sameElements(fold(vs.map(Some(_))))
    }
}

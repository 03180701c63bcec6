package graft

import graft.functions.TopKSketch
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** TopKSketch's one law is stronger than the sketch family's: the
  * selection is an EXACT top-K under a total order (score4 DESC, id
  * ASC), so the result must be IDENTICAL — not just bounded — under
  * every partitioning, merge grouping, and serialize round-trip Spark
  * may choose. Verified against a plain sort-take reference, with
  * heavy score ties (small score alphabet) so the id tie-break is
  * genuinely exercised.
  */
object TopKSketchProps extends Properties("TopKSketch") {

  private val k = 5
  private val agg = TopKSketch(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    BoundReference(2, LongType, nullable = true), k)

  // small score alphabet → many ties; ids unique by construction
  private val rows: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(-5L, 5L), Gen.choose(0L, 1000L)))
      .map(_.zipWithIndex.map { case ((s, p), i) => (s, i.toLong, p) })

  private def fold(vs: Seq[(Long, Long, Long)]): Array[Long] =
    vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(v._1, v._2, v._3))
    }

  private def evalIds(buf: Array[Long]): Seq[(Long, Long, Long, Long)] = {
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  private def reference(vs: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] =
    vs.sortBy(t => (-t._1, t._2)).take(k).zipWithIndex
      .map { case ((s, i, p), r) => ((r + 1).toLong, s, i, p) }

  property("exact top-K under any partitioning + merge order + serde") =
    Prop.forAll(rows, Gen.choose(1, 6), Gen.long) { (vs, nParts, seed) =>
      val rnd = new scala.util.Random(seed)
      val parts = vs.groupBy(_ => rnd.nextInt(nParts)).values.toList
      val shuffled = rnd.shuffle(parts)
      val merged = shuffled
        .map(p => agg.deserialize(agg.serialize(fold(p))))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      evalIds(merged) == reference(vs)
    }

  property("null slots are skipped, not counted") = Prop.forAll(rows) { vs =>
    val buf = vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      val b2 = agg.update(b, InternalRow(null, v._2, v._3))
      agg.update(b2, InternalRow(v._1, v._2, v._3))
    }
    evalIds(buf) == reference(vs)
  }
}

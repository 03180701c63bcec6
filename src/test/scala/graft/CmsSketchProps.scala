package graft

import graft.functions.CmsSketch
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import java.security.MessageDigest

/** Count–min laws over arbitrary partitionings and merge orders (the
  * distributed execution shape: fold partials, serialize round-trip,
  * merge):
  *
  *  - ORDER-FREE: the distributed sketch is bit-identical to the
  *    sequential one — CMS merge is pure addition, so unlike
  *    Misra–Gries there is no order-dependent regime at all;
  *  - NEVER-UNDER: estimate(t) ≥ true count for every seen token;
  *  - ROW-MASS: every row's counters sum to N — each update adds
  *    exactly one unit per row;
  *  - RELATIONAL: the counter grid equals the groupBy-(row, bucket)
  *    sum of exact token counts — the q_cms_freq oracle's derivation.
  */
object CmsSketchProps extends Properties("CmsSketch") {

  private val depth = 4
  private val width = 32 // narrow on purpose: collisions must occur
  private val agg = CmsSketch(BoundReference(0, StringType, nullable = true), depth, width)

  private val token: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("hot1", "hot2", "hot3"),
    3 -> Gen.choose(0, 30).map("warm" + _),
    2 -> Gen.choose(0, 500).map("cold" + _))

  private def fold(vs: Seq[String]): Array[Long] =
    vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(UTF8String.fromString(v)))
    }

  private def distributed(vs: Seq[String], nParts: Int): Array[Long] =
    vs.grouped(math.max(1, vs.length / nParts)).toSeq
      .map(p => agg.deserialize(agg.serialize(fold(p))))
      .reduce(agg.merge)

  private def bucket(j: Int, tok: String): Int = {
    val md = MessageDigest.getInstance("MD5")
    md.update(s"cms$j".getBytes("UTF-8"))
    md.update(tok.getBytes("UTF-8"))
    val d = md.digest()
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % width).toInt
  }

  private def estimate(grid: Array[Long], tok: String): Long =
    (0 until depth).map(j => grid(j * width + bucket(j, tok))).min

  property("order-free: distributed == sequential, bit for bit") =
    Prop.forAll(Gen.nonEmptyListOf(token), Gen.chooseNum(1, 6)) { (vs, nParts) =>
      distributed(vs, nParts).sameElements(fold(vs))
    }

  property("never-under + relational: est >= true, grid == groupBy sum") =
    Prop.forAll(Gen.nonEmptyListOf(token), Gen.chooseNum(1, 6)) { (vs, nParts) =>
      val grid = distributed(vs, nParts)
      val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val relational = new Array[Long](depth * width)
      truth.foreach { case (t, c) =>
        (0 until depth).foreach(j => relational(j * width + bucket(j, t)) += c)
      }
      truth.forall { case (t, c) => estimate(grid, t) >= c } &&
        grid.sameElements(relational)
    }

  property("row-mass: each row's counters sum to N") =
    Prop.forAll(Gen.nonEmptyListOf(token), Gen.chooseNum(1, 6)) { (vs, nParts) =>
      val grid = distributed(vs, nParts)
      (0 until depth).forall { j =>
        (0 until width).map(b => grid(j * width + b)).sum == vs.length.toLong
      }
    }
}

package graft

import graft.functions.MinHashSketch
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** Pure buffer-algebra properties of the MinHash sketch aggregate:
  * Spark may split a group's rows across any number of partial
  * buffers, merge them in any grouping, and round-trip buffers
  * through serialize/deserialize between map and reduce sides — the
  * result must always equal a single sequential fold. These laws are
  * what make the map-side partial aggregation CORRECT, independent of
  * the DedupSpec equivalence pin on real corpus data.
  */
object MinHashSketchProps extends Properties("MinHashSketch") {

  private val agg = MinHashSketch(BoundReference(0, LongType, nullable = true))

  // the caller feeds base hashes pre-reduced mod 2^31 (Dedup.minhashBase)
  private val baseHash: Gen[Long] = Gen.chooseNum(0L, 2147483647L)

  private def fold(vs: Seq[Long]): Array[Long] =
    vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(v))
    }

  property("arbitrary partitioning + merge == sequential fold") =
    Prop.forAll(Gen.nonEmptyListOf(baseHash), Gen.chooseNum(1, 8)) { (vs, nParts) =>
      val parts = vs.grouped(math.max(1, vs.length / nParts)).toSeq
      val merged = parts.map(fold).reduce { (a, b) =>
        agg.merge(a.clone(), b.clone())
      }
      merged.sameElements(fold(vs))
    }

  property("merge is commutative") =
    Prop.forAll(Gen.nonEmptyListOf(baseHash), Gen.nonEmptyListOf(baseHash)) { (xs, ys) =>
      agg.merge(fold(xs), fold(ys)).sameElements(agg.merge(fold(ys), fold(xs)))
    }

  property("serialize/deserialize round-trips the buffer") =
    Prop.forAll(Gen.listOf(baseHash)) { vs =>
      val b = fold(vs)
      agg.deserialize(agg.serialize(b)).sameElements(b)
    }

  property("null input rows leave the buffer unchanged") =
    Prop.forAll(Gen.nonEmptyListOf(baseHash)) { vs =>
      val b = fold(vs)
      agg.update(b.clone(), InternalRow(null)).sameElements(b)
    }

  property("slots match the direct affine-mix minimum") =
    Prop.forAll(Gen.nonEmptyListOf(baseHash)) { vs =>
      val b = fold(vs)
      (0 until MinHashSketch.numHashes).forall { i =>
        b(i) == vs.map(v =>
          (v * MinHashSketch.mixA(i) + MinHashSketch.mixB(i)) % MinHashSketch.mod).min
      }
    }
}

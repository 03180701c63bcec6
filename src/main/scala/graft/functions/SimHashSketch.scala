package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** One-pass SimHash sketch aggregate: for each group, maintains the
  * [[SimHashSketch.bits]] per-bit majority-vote counters (+1 when the
  * input hash has the bit set, −1 when it doesn't) in a single
  * 240-byte buffer and evaluates to the packed 60-bit sketch long.
  * The same 100 TB shape as [[MinHashSketch]]: ObjectHashAggregate
  * with full map-side partial aggregation — each partition ships one
  * int[60] buffer per doc instead of 60 separate `sum()` columns
  * through a 60-buffer hash aggregate, and `merge` is an elementwise
  * add.
  *
  * Semantics are IDENTICAL to the declarative form
  * `sum(when(bit_j(h) = 1, 1).otherwise(-1))` + packing — including
  * the null case: a null input hash falls into the `otherwise(-1)` of
  * EVERY bit column there, so it decrements every counter here too.
  * DedupSpec pins the two paths equal per doc; SimHashSketchProps
  * pins the buffer algebra (partition-invariant merge, serde
  * round-trip, null handling).
  *
  * Registered as SQL function `graft_simhash_sketch` by
  * [[GraftExtensions]]; used via `call_function` from
  * `graft.operators.Dedup.simSketch`.
  */
case class SimHashSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  import SimHashSketch._

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) {
      // parity with sum(when(bit = 1, 1).otherwise(-1)): a null hash
      // takes the otherwise(-1) branch on every bit column
      var j = 0
      while (j < bits) { buffer(j) -= 1; j += 1 }
    } else {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) buffer(j) += 1 else buffer(j) -= 1
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sim = 0L
    var j = 0
    while (j < bits) {
      if (buffer(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(java.lang.Integer.BYTES * bits)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_sketch requires BIGINT input, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_simhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)
}

object SimHashSketch {
  /** Sketch width: 15 hex md5 chars — the widest prefix that stays in
    * signed BIGINT in both Spark and DuckDB (shared with the oracle).
    */
  val bits: Int = 60
}

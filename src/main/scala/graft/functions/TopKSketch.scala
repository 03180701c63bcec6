package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** One-pass EXACT per-group top-K under the total order
  * (score4 DESC, id ASC) — the bounded-heap aggregate that replaces a
  * corpus-partition `row_number()` window for "best K per group"
  * shapes (X112's per-anchor hard negatives): a window sorts every
  * group in one task; this keeps K rows per partial buffer, merges
  * map-side, and ships K·3 longs per group through the shuffle.
  *
  * Unlike the Misra–Gries/MinHash sketches this is NOT fold-order
  * dependent: the selection is an exact top-K under a TOTAL order
  * (integer score, unique-id tie-break), so any partition/merge order
  * yields the identical result — the spec can pin equality against a
  * window twin, not just laws.
  *
  * Input: three BIGINTs (score4 — the 4dp score in ten-thousandths —
  * id, payload) + the foldable K. Output: ARRAY<STRUCT<rank, score4,
  * id, payload>> sorted by rank 1..≤K. Null in any input slot skips
  * the row.
  *
  * Registered as SQL function `graft_topk` by [[GraftExtensions]].
  */
case class TopKSketch(
    score4: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1, s"graft_topk k must be >= 1, got $k")

  /** buffer layout: [n, s4_0, id_0, p_0, …] — entries sorted by
    * (s4 DESC, id ASC), n ≤ k.
    */
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](1 + 3 * k)
    b(0) = 0L
    b
  }

  /** entry at slot `i` beats (s, d) under (s4 DESC, id ASC)? */
  private def beats(buf: Array[Long], i: Int, s: Long, d: Long): Boolean = {
    val bs = buf(1 + 3 * i)
    bs > s || (bs == s && buf(2 + 3 * i) < d)
  }

  private def insert(buf: Array[Long], s: Long, d: Long, p: Long): Array[Long] = {
    val n = buf(0).toInt
    if (n == k && beats(buf, k - 1, s, d)) return buf
    // binary-search-free insert: K is small (a config constant)
    var pos = n.min(k - 1)
    if (n == k) pos = k - 1 else buf(0) = n + 1
    while (pos > 0 && !beats(buf, pos - 1, s, d)) {
      buf(1 + 3 * pos) = buf(1 + 3 * (pos - 1))
      buf(2 + 3 * pos) = buf(2 + 3 * (pos - 1))
      buf(3 + 3 * pos) = buf(3 + 3 * (pos - 1))
      pos -= 1
    }
    buf(1 + 3 * pos) = s
    buf(2 + 3 * pos) = d
    buf(3 + 3 * pos) = p
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val s = score4.eval(input)
    val d = id.eval(input)
    val p = payload.eval(input)
    if (s == null || d == null || p == null) return buffer
    insert(buffer, s.asInstanceOf[Long], d.asInstanceOf[Long], p.asInstanceOf[Long])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val n2 = b2(0).toInt
    var i = 0
    var b = b1
    while (i < n2) {
      b = insert(b, b2(1 + 3 * i), b2(2 + 3 * i), b2(3 + 3 * i))
      i += 1
    }
    b
  }

  override def eval(buffer: Array[Long]): Any = {
    val n = buffer(0).toInt
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](
        (i + 1).toLong, buffer(1 + 3 * i), buffer(2 + 3 * i), buffer(3 + 3 * i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val n = buffer(0).toInt
    val bb = ByteBuffer.allocate(java.lang.Long.BYTES * (1 + 3 * n))
    bb.putLong(n.toLong)
    var i = 1
    while (i <= 3 * n) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val b = createAggregationBuffer()
    b(0) = n.toLong
    var i = 1
    while (i <= 3 * n) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("score4", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score4, id, payload)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires BIGINT inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(score4 = newChildren(0), id = newChildren(1), payload = newChildren(2))
}

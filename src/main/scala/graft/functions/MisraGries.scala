package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.collection.mutable

/** Misra–Gries frequent-items sketch (the deterministic heavy-hitters
  * summary): maintains at most `capacity` (token → counter) entries in
  * a fixed-size buffer, decrementing all counters when a new token
  * arrives into a full buffer. The classic guarantees, which
  * `MisraGriesProps` property-tests over the merge algebra:
  *
  *  - every token with true frequency > spill is present (candidate
  *    SUPERSET of the true heavy hitters), where `spill` is the total
  *    decrement weight this summary has absorbed;
  *  - for a present token, counter ≤ true ≤ counter + spill; for an
  *    absent token, true ≤ spill;
  *  - spill ≤ N / (capacity + 1) on a single stream, and merge adds
  *    the two inputs' spills plus the rank-(capacity+1) combined
  *    counter it prunes by (Agarwal et al., "Mergeable Summaries",
  *    PODS'12 — summing counters then subtracting the (k+1)-th
  *    largest preserves both bounds).
  *
  * This is the 100 TB shape for "top tokens over a corpus": constant
  * memory per partition, one `capacity`-entry buffer shipped per
  * partition through map-side partial merge, no shuffle keyed by the
  * (unbounded) vocabulary. An exact recount of the ≤`capacity`
  * candidates then turns the sketch into a PROVABLY exact top-K
  * whenever the K-th recounted frequency exceeds the final spill —
  * the certificate `graft.operators.TextAnalysis.heavyHitters`
  * checks (and falls back to the exact plan when it fails).
  *
  * Counter VALUES are partition-order-dependent once any decrement
  * has fired (the bounds above are not): tests pin exact values only
  * in the spill == 0 regime, properties otherwise.
  *
  * Registered as SQL function `graft_mg_topk(tok, capacity)` by
  * [[GraftExtensions]]; returns struct(spill BIGINT,
  * toks ARRAY<STRING>, cnts ARRAY<BIGINT>) with entries sorted
  * (count desc, token asc) so the output is deterministic whenever
  * the counters are.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Buffer]
  with UnaryLike[Expression] {

  import MisraGries.Buffer

  override def createAggregationBuffer(): Buffer = new Buffer(mutable.HashMap.empty, 0L)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String]
      buffer.counts.get(tok) match {
        case Some(c) => buffer.counts.update(tok, c + 1)
        case None if buffer.counts.size < capacity =>
          // UTF8String may alias a reused row buffer — copy on store
          buffer.counts.update(tok.clone(), 1L)
        case None =>
          // full: decrement every counter by 1 (dropping zeros) and
          // discard the incoming token; one unit of every retained
          // counter plus the new token's unit become spill
          buffer.spill += 1
          buffer.counts.filterInPlace((_, c) => c > 1)
          buffer.counts.mapValuesInPlace((_, c) => c - 1)
      }
    }
    buffer
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    b2.counts.foreach { case (tok, c) =>
      b1.counts.update(tok, b1.counts.getOrElse(tok, 0L) + c)
    }
    b1.spill += b2.spill
    if (b1.counts.size > capacity) {
      // prune to `capacity` entries by subtracting the (capacity+1)-th
      // largest combined counter from every entry (Mergeable
      // Summaries): err bounds add, superset property survives
      val cut = b1.counts.values.toArray.sorted(Ordering.Long.reverse).apply(capacity)
      b1.spill += cut
      b1.counts.filterInPlace((_, c) => c > cut)
      b1.counts.mapValuesInPlace((_, c) => c - cut)
    }
    b1
  }

  override def eval(buffer: Buffer): Any = {
    val entries = buffer.counts.toArray
      .sortBy { case (tok, c) => (-c, tok.toString) }
    InternalRow(
      buffer.spill,
      new GenericArrayData(entries.map(_._1.clone(): Any)),
      new GenericArrayData(entries.map(_._2: Any)))
  }

  override def serialize(buffer: Buffer): Array[Byte] = {
    val toks = buffer.counts.toArray
    val size = 8 + 4 + toks.map { case (t, _) => 4 + t.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buffer.spill)
    bb.putInt(toks.length)
    toks.foreach { case (t, c) =>
      val bytes = t.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val spill = bb.getLong
    val n = bb.getInt
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    new Buffer(m, spill)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("spill", LongType, nullable = false),
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnts", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_mg_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Mutable sketch state: live counters + total decrement weight. */
  final class Buffer(val counts: mutable.HashMap[UTF8String, Long], var spill: Long)
}

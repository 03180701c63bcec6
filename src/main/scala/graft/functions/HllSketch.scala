package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** One-pass HyperLogLog register sketch (Flajolet–Fusy–Gandouet–
  * Meunier 2007) over the house 60-bit md5-prefix hash — the
  * cardinality member of the sketch family (CMS counts frequencies,
  * MinHash signatures sets, Misra–Gries finds hitters; this counts
  * DISTINCTS in constant memory).
  *
  * What makes it worth having next to Spark's own
  * `approx_count_distinct`: HLL++ register layouts are
  * engine-private, so R6/X43 had to be ScalaTest-bound-verified
  * rather than oracle-declared ("no cross-engine sketch parity").
  * This sketch is built ENTIRELY from cross-engine-deterministic
  * pieces — md5-prefix hash, top-8-bit bucket, leading-zero rank via
  * integer bit length — so DuckDB derives the IDENTICAL 256 registers
  * relationally and the estimate is hash-match oracle-certifiable,
  * exactly like the MinHash/SimHash/CMS sketches before it (X157).
  *
  * Layout: p = 8 → m = 256 registers, one byte each. For input hash
  * h ∈ [0, 2⁶⁰): bucket j = h ≫ 52 (top 8 bits), w = h mod 2⁵²,
  * rank ρ = 53 − bitlen(w) (the leading-zero count of the 52-bit
  * field + 1; w = 0 → 53). Register M_j = max ρ seen. Declarative
  * twin: `groupBy(key, j).agg(max(rho))` — TextAnalysisSpec pins the
  * two equal register-for-register; this form ships ONE 256-byte
  * buffer per group through ObjectHashAggregate map-side partials
  * instead of a (key × 256)-row exchange.
  *
  * `eval` returns the estimate's two sufficient statistics, NOT the
  * estimate — struct(s, v) where s = Σ_j 2^(53−M_j) over all 256
  * registers (empty registers contribute 2⁵³; s ≤ 2⁶¹ so BIGINT
  * holds) and v = empty-register count — so the bias-corrected
  * estimate algebra stays in declarative SQL SHARED with the oracle
  * (the ClfScore three-derivations discipline).
  *
  * Null inputs are ignored (distinct-count semantics: NULL is not a
  * domain value — `count(DISTINCT x)` drops it on both engines).
  *
  * Merge is elementwise max — associative, commutative, IDEMPOTENT:
  * replaying an input leaves every register unchanged, which is what
  * makes the streaming twin absorb at-least-once delivery for free.
  * HllSketchProps property-tests the register algebra over arbitrary
  * partition/merge/serde orders.
  *
  * Registered as SQL function `graft_hll` by [[GraftExtensions]].
  */
case class HllSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  import HllSketch._

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = ((h >>> 52) & (m - 1)).toInt
      val w = h & ((1L << 52) - 1)
      // bitlen(w) = 64 - nlz(w); w = 0 -> bitlen 0 -> rho 53
      val rho = (53 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buffer(j)) buffer(j) = rho
    }
    buffer
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (b2(j) > b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buffer: Array[Byte]): Any = {
    var s = 0L
    var v = 0L
    var j = 0
    while (j < m) {
      s += 1L << (53 - buffer(j)) // empty register: 2^53
      if (buffer(j) == 0) v += 1
      j += 1
    }
    new GenericInternalRow(Array[Any](s, v))
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll requires BIGINT input, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_hll"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  /** Register count m = 2⁸ — standard error 1.04/√m ≈ 6.5 %, a
    * 256-byte buffer. The bucket takes the hash's TOP 8 bits so the
    * 52-bit rank field below it stays independent of the bucket.
    */
  val m: Int = 256
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking — `graft_cdc_chunks(tokens)` → the array
  * of md5 hex digests of each chunk's token text (X66's chunk
  * stream). Boundary AFTER token i (1-based) when the 32-bit house
  * hash (first 8 md5 hex chars as an integer) of the trailing
  * [[CdcChunks.window]]-token window is ≡ 0 mod
  * [[CdcChunks.divisor]]; a final boundary always sits at the last
  * token.
  *
  * Why a native expression: the declarative form — `filter` over a
  * position `sequence` + `transform`/`zip_with` chunk assembly — is
  * semantically identical but plans as nested higher-order functions,
  * which evaluate INTERPRETED per array element (HOF lambdas are
  * CodegenFallback); at sf0.1 that was 15.8 s vs DuckDB's 0.4 s for
  * the same rule — a 40× interpretation tax, not algorithmic cost.
  * This expression runs the whole per-document loop in one call with
  * a thread-local MessageDigest, entering through a single static
  * call from generated code (the [[NfcNormalize]] pattern), so the
  * chunking stays inside the WholeStageCodegen span and the operator
  * keeps its fully-narrow shape.
  *
  * Engine parity: the oracle computes the identical rule in SQL
  * (md5-prefix hash, same window/divisor, lag-window starts); both
  * sides emit full 32-char lowercase md5 hex per chunk.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.chunks($c);")

  override def prettyName: String = "graft_cdc_chunks"

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Rolling-window width (tokens) of the boundary rule. */
  val window = 4
  /** Boundary divisor: expected chunk length in tokens. */
  val divisor = 8

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 8 md5 hex chars as a long — the h32 house hash. */
  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  /** The full chunk loop for one token array (called once per row
    * from generated code). Semantics identical to the declarative
    * form: boundaries at 1-based positions i ∈ [window, n] with
    * h32(join(tokens[i-window+1..i])) % divisor == 0, plus n itself.
    */
  def chunks(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i).toString; i += 1 }
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n >= window) {
      val sb = new java.lang.StringBuilder
      var p = window // 1-based boundary position
      while (p <= n) {
        sb.setLength(0)
        var j = p - window
        while (j < p) {
          if (j > p - window) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        if (h32(sb.toString) % divisor == 0) bounds += p
        p += 1
      }
    }
    if (bounds.isEmpty || bounds.last != n) bounds += n
    val out = new Array[Any](bounds.length)
    var prev = 0 // 0-based exclusive start of the current chunk
    var k = 0
    val sb = new java.lang.StringBuilder
    while (k < bounds.length) {
      val b = bounds(k)
      sb.setLength(0)
      var j = prev
      while (j < b) {
        if (j > prev) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(k) = UTF8String.fromString(md5Hex(sb.toString))
      prev = b
      k += 1
    }
    new GenericArrayData(out)
  }
}

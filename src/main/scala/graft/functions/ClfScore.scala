package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The X67 hashed-feature classifier scan — `graft_clf_score(text)` →
  * `struct<score6: bigint, n_feats: bigint>`: the summed per-feature
  * weight and the feature count over word unigrams + adjacent
  * bigrams, hashed into [[ClfScore.buckets]] buckets.
  *
  * Why a native expression (the [[CdcChunks]] argument): the
  * declarative form materializes the feature ARRAY (split + zip_with
  * bigram concat) and folds it with an `aggregate` HOF whose lambda
  * computes TWO md5 digests per feature through a
  * conv(substring(md5(concat(...)))) chain — interpreted per element,
  * with every intermediate a freshly allocated string. It is the
  * costliest in-row work in the engine (the gate-scored memo build
  * that the whole classifier-audit family and three streaming feeds
  * pay). This expression runs the identical arithmetic in one native
  * per-row loop with a thread-local MessageDigest, never materializes
  * the feature array, and — because the OUTER digest depends only on
  * the bucket id — replaces half the digests outright with a
  * [[ClfScore.buckets]]-entry weight table computed once per JVM.
  *
  * Engine parity is exact and spec-pinned (CurationSpec: native ≡ the
  * HOF form column-for-column on the corpus at two SFs): tokens are
  * `split(text, ' ', -1)` with Spark's trailing-empty semantics, the
  * inner hash is the first 8 md5 hex chars of the feature as an
  * unsigned int mod [[ClfScore.buckets]], and the weight is the
  * first 8 md5 hex chars of `'qw' + bucket` mod 200001 minus 100000 —
  * digit-identical to the SQL the DuckDB oracle replays.
  */
case class ClfScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("score6", LongType, nullable = false),
    StructField("n_feats", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_clf_score requires STRING input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ClfScore.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClfScore.score($c);")

  override def prettyName: String = "graft_clf_score"

  override protected def withNewChildInternal(newChild: Expression): ClfScore =
    copy(child = newChild)
}

object ClfScore {
  /** Hashing-trick bucket count — MUST stay equal to
    * `Curation.clfBuckets` (CurationSpec pins the equality and the
    * column parity).
    */
  val buckets = 64

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars of the string as an unsigned long —
    * Spark's `conv(substring(md5(s), 1, 8), 16, 10)`.
    */
  private def h32(s: String): Long = {
    val d = md5.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 digest bytes, big-endian unsigned
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Per-bucket weight table: the outer digest of the SQL form
    * depends only on the bucket id, so it is paid [[buckets]] times
    * per JVM instead of once per feature.
    */
  private lazy val weights: Array[Long] =
    Array.tabulate(buckets)(b => h32("qw" + b) % 200001L - 100000L)

  /** One document's classifier scan (called once per row from
    * generated code): unigrams + adjacent bigrams, summed weights and
    * the feature count. Token semantics are exactly Spark's
    * `split(text, ' ')` (limit −1: consecutive separators yield empty
    * tokens, trailing empties kept).
    */
  def score(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val w = weights
    var score = 0L
    var i = 0
    while (i < toks.length) {
      score += w((h32(toks(i)) % buckets).toInt)
      i += 1
    }
    var n = toks.length.toLong
    if (toks.length >= 2) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < toks.length - 1) {
        sb.setLength(0)
        sb.append(toks(j)).append(' ').append(toks(j + 1))
        score += w((h32(sb.toString) % buckets).toInt)
        j += 1
      }
      n += toks.length - 1
    }
    new GenericInternalRow(Array[Any](score, n))
  }
}

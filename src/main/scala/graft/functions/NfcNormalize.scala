package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — `graft_nfc(s)` — the first step of any
  * text-normalization pass over a crawled corpus: the same visible
  * string arrives as composed codepoints or base+combining-mark
  * sequences ("é" vs "e"+U+0301), and every downstream exact
  * operation (hashing, dedup, shingling, tokenization) silently
  * treats them as different documents until they are canonicalized.
  *
  * Spark ships no normalization function, and a Scala UDF would drop
  * the whole normalization chain out of WholeStageCodegen — so this
  * is a native expression with `doGenCode`, like the vector math in
  * [[ArrayDot]]. The generated code short-circuits on
  * `Normalizer.isNormalized` (true for ASCII and for already-NFC
  * text, i.e. almost every row of a real corpus) and returns the
  * input UTF8String untouched — no allocation beyond the transient
  * java.lang.String bridge; only genuinely decomposed rows pay the
  * normalize-and-reencode.
  *
  * Semantics parity: java.text.Normalizer and DuckDB's utf8proc both
  * implement Unicode canonical composition, so the oracle's
  * `nfc_normalize` is byte-identical — `q_normalize`'s md5 column is
  * hash-compared across engines on planted decomposed rows.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val js = ctx.freshName("js")
      s"""
         |java.lang.String $js = $c.toString();
         |if (java.text.Normalizer.isNormalized($js, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($js, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Interpreted path — identical logic to the generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val js = s.toString
    if (java.text.Normalizer.isNormalized(js, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(js, java.text.Normalizer.Form.NFC))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector math.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`,
  * VectorOps) is semantically right but higher-order functions are
  * CodegenFallback — every row pays lambda interpretation and a
  * materialized intermediate array. These expressions implement the
  * same left-to-right double accumulation as a tight loop with
  * `doGenCode`, so the scoring stays inside WholeStageCodegen and
  * allocates nothing. Bit-identical to the HOF path by construction —
  * same element order, same double arithmetic, AND the same null
  * semantics: a length mismatch (zip_with null-pads → null product →
  * null fold) or any null element yields NULL exactly as the HOF
  * does, so the optimizer rewrite (RewriteVectorHofs) can never
  * change any result (VectorExprSpec asserts === incl. null/ragged).
  */
trait VectorElementCodegen { self: Expression =>
  protected def elemType(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType

  protected def getter(dt: DataType, arr: String, i: String): String =
    elemType(dt) match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other      => throw new IllegalStateException(s"unsupported element type $other")
    }

  protected def read(dt: DataType, arr: ArrayData, i: Int): Double =
    elemType(dt) match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other      => throw new IllegalStateException(s"unsupported element type $other")
    }

  protected def checkArrayOfFloating(dt: DataType, side: String): Option[String] =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => None
      case other => Some(s"$side must be array<float|double>, got ${other.simpleString}")
    }
}

/** Σ aᵢ·bᵢ in double, sequential — `graft_dot(a, b)`. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorElementCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val err = checkArrayOfFloating(left.dataType, "left")
      .orElse(checkArrayOfFloating(right.dataType, "right"))
    err match {
      case Some(m) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(m)
      case None    => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // HOF parity: zip_with null-pads unequal lengths and a null element
    // nulls the whole fold — so both cases are NULL here too
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += read(left.dataType, x, i) * read(right.dataType, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${getter(left.dataType, a, i)} * ${getter(right.dataType, b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² in double, sequential — `graft_l2_sq(a, b)`. */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with VectorElementCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val err = checkArrayOfFloating(left.dataType, "left")
      .orElse(checkArrayOfFloating(right.dataType, "right"))
    err match {
      case Some(m) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(m)
      case None    => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = read(left.dataType, x, i) - read(right.dataType, y, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${getter(left.dataType, a, i)} - ${getter(right.dataType, b, i)};
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ² in double, sequential — `graft_norm_sq(a)`. */
case class ArrayNormSq(child: Expression)
    extends UnaryExpression with VectorElementCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkArrayOfFloating(child.dataType, "input") match {
      case Some(m) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(m)
      case None    => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null // HOF parity: null element nulls the fold
      val v = read(child.dataType, x, i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = ${getter(child.dataType, a, i)};
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNormSq =
    copy(child = newChild)
}

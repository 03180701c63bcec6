package graft.plans

import graft.functions.{ArrayDot, ArrayL2Sq, ArrayNormSq}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Limit, LogicalPlan, Project, ReturnAnswer, Sort}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, TakeOrderedAndProjectExec, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Similarity top-K pushdown (SURVEY.md §4's last stretch row: "skip
  * scoring below threshold").
  *
  * `orderBy(score).limit(k)` already plans to TakeOrderedAndProject —
  * a bounded per-partition heap, no full sort — so the only work left
  * on the table is the SCORING itself: the stock plan evaluates the
  * full distance/similarity expression for every candidate row before
  * the heap rejects it. At 100 TB candidate volume that evaluation IS
  * the query. This strategy recognizes the vector top-K pattern
  *
  *   Limit(k, Sort(score, id, Project(.. round(metric(x, LITERAL q), s) ..)))
  *
  * (the query vector is a plan literal — a vector-search API takes the
  * query as a parameter, which also lets Catalyst constant-fold the
  * query-side norm) and plans a [[ScoredTopKExec]] that maintains the
  * running k-th-best score and abandons each row's scoring loop as
  * soon as a sound upper bound on its final score falls below that
  * threshold:
  *
  *  - squared-L2, ascending: the partial sum only grows, so the
  *    partial IS the bound — the classic early-abandoning kNN loop.
  *  - cosine, descending: after a prefix with running dot `a`, prefix
  *    norm² `c²`, and the query's remaining norm² `|q_suf|²` (plan
  *    constants), the final cosine is at most
  *        max_t (a + |q_suf|·t) / (|q|·sqrt(c² + t²))
  *      = sqrt(a² + |q_suf|²·c²) / (c·|q|)   for a > 0
  *      = |q_suf| / |q|                       for a ≤ 0  (limit t→∞)
  *    over the unknown suffix norm t of x (Cauchy–Schwarz on the
  *    suffix dot; ScoredTopKProps property-tests the bound).
  *  - pure dot, descending, under the opt-in unit-norm declaration
  *    (`spark.graft.topk.unitNorm=true` — cosine search over a
  *    corpus normalized at write time, the standard vector-store
  *    layout): the suffix norm is pinned at sqrt(1 − c²), so the
  *    bound `a + |q_suf|·sqrt(1 + ε − c²)` tightens to the running
  *    dot itself as the prefix consumes the norm — it prunes even on
  *    isotropic corpora where the norm-free cosine bound cannot.
  *
  * Honest effectiveness note: the L2 bound prunes aggressively on any
  * data (every distant candidate's partial sum races past the k-th
  * best — PlanAuditSpec pins prunedRows > 0). The cosine bound is
  * sound everywhere but only TIGHT when vectors are anisotropic or
  * clustered (real embedding corpora); on this repo's isotropic
  * synthetic vectors — the Cauchy–Schwarz worst case, where a suffix
  * really could align with q — it rarely fires before the final
  * dims, and the operator degrades gracefully to fused score+top-K.
  *
  * Pruning respects the declared rounding: a row is skipped only when
  * its rounded bound is strictly below the rounded k-th best, so ties
  * (broken by the id column) are always fully scored. Null scores
  * (ragged/null vectors) are kept in a separate id-ordered bounded
  * buffer so NULLS FIRST/LAST ordering survives exactly — including
  * when the null element sits AFTER the point where the bound fired:
  * unless the array type's containsNull rules it out, a prune is
  * completed by an isNullAt-only scan of the unvisited suffix, and a
  * row hiding a null there is rerouted to the null buffer instead of
  * dropped (the stock plan scores it NULL, which sorts FIRST under the
  * L2 pattern's ASC ordering — dropping it would change the result).
  * The strategy also only matches the DEFAULT null ordering for each
  * sort direction, since those are what the exec's comparators encode. Each
  * partition emits at most 2·k rows; the stock TakeOrderedAndProject
  * on top does the global merge, so distribution semantics are
  * unchanged. Disable with `spark.graft.topk.pushdown=false`
  * (PlanAuditSpec compares both paths row-for-row).
  */
object ScoredTopKPushdown extends SparkStrategy {

  /** Sound upper bound on the final cosine given a scored prefix.
    * See scaladoc above; exposed for the property test.
    */
  private[graft] def cosineUpperBound(
      dot: Double, xPreSq: Double, qSufSq: Double, qNorm: Double): Double =
    if (xPreSq <= 0 || dot <= 0) math.sqrt(qSufSq) / qNorm
    else math.sqrt(dot * dot + qSufSq * xPreSq) / (math.sqrt(xPreSq) * qNorm)

  /** Slack the unit-norm declaration absorbs: float32 write-time
    * normalization leaves |x|² within ~1e-6 of 1 at realistic dims;
    * 1e-5 keeps the bound sound for float or double normalization
    * while costing at most sqrt(1e-5) ≈ 0.003·|q_suf| of tightness.
    */
  private[graft] val unitNormHeadroom: Double = 1e-5

  /** Sound upper bound on the final dot product when x is DECLARED
    * unit-norm: the suffix norm is pinned at sqrt(1 − |x_pre|²), so
    * Cauchy–Schwarz on the suffix gives a bound that tightens to the
    * running dot as the prefix consumes the norm — tight even on
    * isotropic corpora, unlike the norm-free cosine bound above.
    */
  private[graft] def unitDotUpperBound(dot: Double, xPreSq: Double, qSufNorm: Double): Double =
    dot + qSufNorm * math.sqrt(math.max(0.0, 1.0 + unitNormHeadroom - xPreSq))

  /** Replicates Catalyst Round(_, s) HALF_UP on doubles. */
  private[graft] def roundScale(v: Double, s: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private def literalVec(l: Literal): Option[Array[Double]] = l match {
    case Literal(a: ArrayData, ArrayType(FloatType, _)) =>
      Some(a.toFloatArray().map(_.toDouble))
    case Literal(a: ArrayData, ArrayType(DoubleType, _)) =>
      Some(a.toDoubleArray())
    case _ => None
  }

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.topk.pushdown", "true").toBoolean

  /** The unit-norm declaration (`spark.graft.topk.unitNorm=true`,
    * default false): the caller asserts every stored vector scored by
    * a pure-dot DESC top-K has L2 norm ≤ 1 + [[UnitDotSpec.headroom]]
    * — the standard vector-store layout, where embeddings are
    * normalized once at write time and cosine IS the dot product.
    * Under that declaration the prefix bound `dot + |q_suf|·sqrt(1 +
    * headroom − |x_pre|²)` is sound AND tight (the suffix norm is
    * pinned, not adversarial), so cosine-ranked search prunes even on
    * isotropic corpora where the norm-free Cauchy–Schwarz bound
    * cannot. If the declaration is violated by more than the headroom
    * the pushdown may drop true top-K rows — which is why it is
    * opt-in, off by default, and documented as a data contract.
    */
  private def unitNormDeclared: Boolean =
    SQLConf.get.getConfString("spark.graft.topk.unitNorm", "false").toBoolean

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // QueryExecution plans ReturnAnswer(root); Spark's SpecialLimits
    // matches that wrapper directly, so this strategy must unwrap it
    // first or it never sees the Limit node at all
    case ReturnAnswer(inner) => apply(inner)
    // null orderings must be the DEFAULT for each direction (NULLS
    // FIRST for ASC, NULLS LAST for DESC): the exec's null buffer and
    // tiebreak comparator hardcode exactly those, so an explicit
    // `NULLS LAST` ASC query must fall through to the stock plan
    // rather than silently reorder null-score or null-id rows
    case Limit(IntegerLiteral(limit),
        Sort(order @ Seq(SortOrder(s1: AttributeReference, dir, sNulls, _),
                         SortOrder(id: AttributeReference, Ascending, NullsFirst, _)), true,
          Project(projectList, child), _))
        if enabled && limit > 0 && id.dataType == LongType &&
          sNulls == (if (dir == Descending) NullsLast else NullsFirst) =>
      val scoreExpr = projectList.collectFirst {
        case a @ Alias(e, _) if a.exprId == s1.exprId => e
      }
      val spec: Option[ScoreSpec] = scoreExpr.flatMap {
        case r: Round =>
          (r.scale, r.child) match {
            // cosine DESC: dot(x, q) / (|x| * |q|) with the q-side norm
            // already constant-folded to a literal
            case (IntegerLiteral(s),
                  Divide(ArrayDot(x: AttributeReference, ql: Literal),
                         Multiply(Sqrt(ArrayNormSq(x2: AttributeReference)), Literal(qn: Double, DoubleType), _), _))
                if dir == Descending && x.exprId == x2.exprId =>
              literalVec(ql).map(q => CosineSpec(q, qn, s))
            // squared L2 ASC
            case (IntegerLiteral(s), ArrayL2Sq(x: AttributeReference, ql: Literal))
                if dir == Ascending =>
              literalVec(ql).map(q => L2Spec(q, s))
            // pure dot DESC over declared-unit-norm vectors: cosine
            // search on a pre-normalized corpus (see unitNormDeclared)
            case (IntegerLiteral(s), ArrayDot(x: AttributeReference, ql: Literal))
                if dir == Descending && unitNormDeclared =>
              literalVec(ql).map(q => UnitDotSpec(q, s))
            case _ => None
          }
        case _ => None
      }
      (spec, scoreExpr) match {
        case (Some(sp), Some(_)) =>
          val xAttr = scoreExpr.get.collectFirst {
            case ArrayDot(x: AttributeReference, _) => x
            case ArrayL2Sq(x: AttributeReference, _) => x
          }.get
          val xOrd = child.output.indexWhere(_.exprId == xAttr.exprId)
          val idOrd = child.output.indexWhere(_.exprId == id.exprId)
          val isFloat = if (xOrd < 0) None else child.output(xOrd).dataType match {
            case ArrayType(FloatType, _)  => Some(true)
            case ArrayType(DoubleType, _) => Some(false)
            case _                        => None
          }
          if (idOrd < 0 || isFloat.isEmpty) Nil
          else {
            val hasNulls = child.output(xOrd).dataType
              .asInstanceOf[ArrayType].containsNull
            val topk = ScoredTopKExec(limit, sp, isFloat.get, hasNulls, xOrd, idOrd, projectList, planLater(child))
            Seq(TakeOrderedAndProjectExec(limit, order, topk.output, topk, 0))
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Which metric the exec scores, plus its plan-time query constants. */
private[plans] sealed trait ScoreSpec extends Serializable {
  def q: Array[Double]
  def scale: Int
  /** true ⇒ larger is better (cosine DESC); false ⇒ smaller (L2 ASC) */
  def descending: Boolean
}

private[plans] case class CosineSpec(q: Array[Double], qNorm: Double, scale: Int) extends ScoreSpec {
  override def descending: Boolean = true
  /** qSufSq(i) = Σ_{j ≥ i} q_j² — suffix norms for the prefix bound. */
  val qSufSq: Array[Double] = {
    val a = new Array[Double](q.length + 1)
    var i = q.length - 1
    while (i >= 0) { a(i) = a(i + 1) + q(i) * q(i); i -= 1 }
    a
  }
}

private[plans] case class L2Spec(q: Array[Double], scale: Int) extends ScoreSpec {
  override def descending: Boolean = false
}

/** Pure dot product, descending, with the x side DECLARED unit-norm
  * (`spark.graft.topk.unitNorm=true`). With |x| pinned, the unknown
  * suffix norm is sqrt(1 − |x_pre|²) instead of a free variable, so
  * the Cauchy–Schwarz bound on the remaining contribution is tight:
  * bound = dot + |q_suf|·sqrt(1 + headroom − |x_pre|²).
  */
private[plans] case class UnitDotSpec(q: Array[Double], scale: Int) extends ScoreSpec {
  override def descending: Boolean = true
  /** qSufNorm(i) = sqrt(Σ_{j ≥ i} q_j²) — suffix norms of the query. */
  val qSufNorm: Array[Double] = {
    val a = new Array[Double](q.length + 1)
    var i = q.length - 1
    while (i >= 0) { a(i) = a(i + 1) + q(i) * q(i); i -= 1 }
    a.map(math.sqrt)
  }
}


/** Per-partition early-abandoning top-K over a scored projection.
  * Emits each partition's local top-`limit` rows (plus up to `limit`
  * null-scored rows, id-ordered) AFTER applying `projectList`; a
  * TakeOrderedAndProjectExec above does the global merge.
  */
case class ScoredTopKExec(
    limit: Int,
    spec: ScoreSpec,
    xIsFloat: Boolean,
    xContainsNull: Boolean,
    xOrd: Int,
    idOrd: Int,
    projectList: Seq[NamedExpression],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)

  // observability: "measure, don't guess" — prunedRows proves the
  // early abandonment is live (PlanAuditSpec asserts it is non-zero
  // on real data), scoredRows is the work that remained
  override lazy val metrics = Map(
    "prunedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows pruned by the running top-K bound"),
    "scoredRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows fully scored"))

  override protected def withNewChildInternal(newChild: SparkPlan): ScoredTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val k = limit
    val sp = spec
    val isFloat = xIsFloat
    val hasNulls = xContainsNull
    val xo = xOrd
    val io = idOrd
    val pl = projectList
    val cOut = child.output
    val xType = cOut(xo).dataType
    val prunedMetric = longMetric("prunedRows")
    val scoredMetric = longMetric("scoredRows")
    child.execute().mapPartitions { iter =>
      import graft.plans.ScoredTopKPushdown.{cosineUpperBound, roundScale, unitDotUpperBound}
      // (rounded score, id, idIsNull, row copy)
      type Entry = (Double, Long, Boolean, InternalRow)
      val q = sp.q
      val n = q.length
      val desc = sp.descending
      // true iff a beats b under (score dir, id ASC NULLS FIRST);
      // doubles compared with java.lang.Double.compare — the same
      // total order (NaN greatest, -0 < 0) Catalyst sorts with
      def better(a: Entry, b: Entry): Boolean = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) { if (desc) c > 0 else c < 0 }
        else if (a._3 != b._3) a._3 // null id sorts first
        else a._2 < b._2
      }
      val heap = new java.util.PriorityQueue[Entry](k, (a: Entry, b: Entry) =>
        if (better(a, b)) 1 else if (better(b, a)) -1 else 0) // head = worst
      // null-scored rows: keep the k FIRST by id so NULLS FIRST/LAST
      // ordering above stays exact whatever the data does
      val nullHeap = new java.util.PriorityQueue[Entry](k, (a: Entry, b: Entry) => {
        val c = if (a._3 != b._3) { if (a._3) -1 else 1 } else java.lang.Long.compare(a._2, b._2)
        -c // head = largest id = first evicted
      })
      while (iter.hasNext) {
        val row = iter.next()
        val full = heap.size() == k
        val kth = if (full) heap.peek()._1 else 0.0
        var pruned = false
        var score: java.lang.Double = null
        if (row.isNullAt(xo)) score = null
        else {
          val arr = row.get(xo, xType).asInstanceOf[ArrayData]
          if (arr.numElements() != n) score = null
          else {
            var dot = 0.0
            var xSq = 0.0
            var sumSq = 0.0 // l2 running sum
            var nullElem = false
            var i = 0
            while (i < n && !pruned && !nullElem) {
              if (arr.isNullAt(i)) nullElem = true
              else {
                val xi = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
                sp match {
                  case c: CosineSpec =>
                    dot += xi * q(i); xSq += xi * xi
                    i += 1
                    if (full && (i & 15) == 0 && i < n) {
                      val bound = cosineUpperBound(dot, xSq, c.qSufSq(i), c.qNorm)
                      if (java.lang.Double.compare(roundScale(bound, sp.scale), kth) < 0) pruned = true
                    }
                  case u: UnitDotSpec =>
                    dot += xi * q(i); xSq += xi * xi
                    i += 1
                    if (full && (i & 15) == 0 && i < n) {
                      val bound = unitDotUpperBound(dot, xSq, u.qSufNorm(i))
                      if (java.lang.Double.compare(roundScale(bound, sp.scale), kth) < 0) pruned = true
                    }
                  case _: L2Spec =>
                    val d = xi - q(i); sumSq += d * d
                    i += 1
                    if (full && (i & 15) == 0 && i < n &&
                        java.lang.Double.compare(roundScale(sumSq, sp.scale), kth) > 0) pruned = true
                }
              }
            }
            // a prune decision is only the final word when the TYPE
            // rules out null elements: otherwise the unvisited suffix
            // could hide a null, which the stock plan scores as NULL —
            // and under ASC NULLS FIRST a null-score row sorts ahead
            // of every real score, so dropping it would change the
            // result. Finish with an isNullAt-only scan (no arithmetic,
            // no bound checks) and reroute such rows to the null buffer.
            if (pruned && hasNulls) {
              var j = i
              while (j < n && !nullElem) {
                if (arr.isNullAt(j)) nullElem = true
                j += 1
              }
              if (nullElem) pruned = false
            }
            if (!pruned) {
              if (nullElem) score = null
              else score = sp match {
                case c: CosineSpec  => roundScale(dot / (math.sqrt(xSq) * c.qNorm), sp.scale)
                case _: UnitDotSpec => roundScale(dot, sp.scale)
                case _: L2Spec      => roundScale(sumSq, sp.scale)
              }
            }
          }
        }
        if (pruned) prunedMetric += 1 else scoredMetric += 1
        if (!pruned) {
          val idNull = row.isNullAt(io)
          val id = if (idNull) 0L else row.getLong(io)
          if (score == null) {
            val e = (0.0, id, idNull, row.copy())
            if (nullHeap.size() < k) nullHeap.offer(e)
            else {
              val worst = nullHeap.peek()
              val eFirst = if (e._3 != worst._3) e._3 else e._2 < worst._2
              if (eFirst) { nullHeap.poll(); nullHeap.offer(e) }
            }
          } else {
            val e = (score.doubleValue(), id, idNull, row.copy())
            if (!full) heap.offer(e)
            else if (better(e, heap.peek())) { heap.poll(); heap.offer(e) }
          }
        }
      }
      val proj = UnsafeProjection.create(pl, cOut)
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow](heap.size() + nullHeap.size())
      val hi = heap.iterator(); while (hi.hasNext) out += hi.next()._4
      val ni = nullHeap.iterator(); while (ni.hasNext) out += ni.next()._4
      out.iterator.map(proj)
    }
  }
}

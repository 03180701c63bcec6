package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType)` embeddings,
  * built from codegen'd higher-order functions (`zip_with`,
  * `aggregate`, `transform`) — no UDFs, so the whole scoring pipeline
  * stays inside WholeStageCodegen and distributes trivially.
  *
  * All math is done in DOUBLE (elements cast up first) so results are
  * bit-comparable with the DuckDB oracle, which computes in double.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ with elements cast to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ aᵢ² in double. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalize a vector (elements in double): the write-time
    * transform that turns cosine search into pure-dot search and makes
    * the `spark.graft.topk.unitNorm` pushdown declaration true (see
    * graft.plans.ScoredTopKPushdown). Zero vectors normalize to NaN
    * elements — score NaN, sorted greatest, never silently dropped.
    *
    * The norm rides in as a HOF ARGUMENT (`array_repeat`), not inside
    * the lambda body: lambda bodies are re-evaluated per element, so
    * `transform(a, x => x / norm(a))` would fold the whole norm
    * aggregate d times per row — O(d²), the same interpreted-HOF
    * double-evaluation measured 2× slower in the shingle-index dead
    * end (Dedup.shingles). Arguments evaluate once per row.
    */
  def normalize(a: Column): Column =
    zip_with(a, array_repeat(norm(a), size(a)), (x, n) => x.cast("double") / n)

  /** Squared L2 distance (cheaper than L2 when only ordering matters). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  // ---- native fast path -------------------------------------------------
  // Same math, same sequential double accumulation, but as codegen'd
  // Catalyst expressions (graft.functions.ArrayDot/ArrayNormSq) instead
  // of CodegenFallback HOFs — bit-identical results, no per-row lambda
  // interpretation or intermediate array. Requires the session to carry
  // spark.sql.extensions=graft.functions.GraftExtensions (Verify/Bench/
  // Explain and the test fixture all do); VectorExprSpec pins the
  // HOF≡native equality exactly.

  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def normSqNative(a: Column): Column = call_function("graft_norm_sq", a)

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(normSqNative(a)) * sqrt(normSqNative(b)))
}

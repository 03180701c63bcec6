package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must actually fire on the declarative HOF form
  * (optimized plan contains the native expressions, not
  * aggregate/zip_with) and be bit-exact against the unrewritten
  * interpreted result.
  */
class RewriteVectorHofsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("HOF dot/normSq rewrite to native expressions and stay bit-exact") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val hof = e.crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        VectorOps.dot(col("embedding"), col("qe")).as("d"),
        VectorOps.normSq(col("embedding")).as("n2"))

    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("arraydot"), s"dot not rewritten:\n$optimized")
    assert(optimized.contains("arraynormsq"), s"normSq not rewritten:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived:\n$optimized")

    // bit-exact vs the explicitly-native formulation
    val native = e.crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        VectorOps.dotNative(col("embedding"), col("qe")).as("d"),
        VectorOps.normSqNative(col("embedding")).as("n2"))
    assert(hof.orderBy("vec_id").collect().toSeq === native.orderBy("vec_id").collect().toSeq)
  }
}

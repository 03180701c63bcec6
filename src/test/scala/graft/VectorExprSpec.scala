package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd vector expressions must be bit-identical to
  * the HOF formulation — same element order, same double accumulation
  * — so swapping them can never change a hash-checked query result.
  * Checked over every embedding (float arrays) and their double-cast
  * variants, plus a malformed-type rejection.
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("graft_dot / graft_norm_sq are bit-identical to the HOF path") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val pairs = e.crossJoin(broadcast(q))
    val bad = pairs.select(
        VectorOps.dot(col("embedding"), col("qe")).as("hof_dot"),
        VectorOps.dotNative(col("embedding"), col("qe")).as("nat_dot"),
        VectorOps.normSq(col("embedding")).as("hof_n"),
        VectorOps.normSqNative(col("embedding")).as("nat_n"))
      .filter(col("hof_dot") =!= col("nat_dot") || col("hof_n") =!= col("nat_n"))
      .count()
    assert(bad === 0L)
  }

  test("bit-identical on double arrays too") {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
    val bad = e.crossJoin(broadcast(q))
      .filter(
        VectorOps.cosine(col("emb"), col("qe")) =!=
          VectorOps.cosineNative(col("emb"), col("qe")))
      .count()
    assert(bad === 0L)
  }

  test("null semantics match the HOF fold exactly (ragged + null element)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)),        // clean → 11.0
      Row(Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0)),   // ragged → NULL both paths
      Row(Seq(1.0, null, 2.0), Seq(3.0, 4.0, 5.0))) // null element → NULL
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("hof"),
      VectorOps.dotNative(col("a"), col("b")).as("nat"),
      VectorOps.normSq(col("a")).as("hofN"),
      VectorOps.normSqNative(col("a")).as("natN"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    out.foreach { case (hof, nat, hofN, natN) =>
      assert(hof === nat)
      assert(hofN === natN)
    }
    assert(out(0)._1 === Some(11.0) && out(1)._1 === None && out(2)._1 === None)
  }

  test("non-array input is rejected at analysis") {
    val e = Tables(spark, sf, "embeddings")
    intercept[org.apache.spark.sql.AnalysisException] {
      e.select(VectorOps.dotNative(col("vec_id"), col("embedding"))).collect()
    }
  }
}

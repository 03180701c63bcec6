package graft

import graft.operators.FrameCodec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties promised by FIXTURES.md: random int16 batches
  * roundtrip through the Spark encode/decode expressions, and randomly
  * generated RFM2Pi wire frames (Scala-side byte encoding) decode back
  * to their source values through the Spark parse expressions.
  */
object FrameCodecProps extends Properties("FrameCodec") {
  private lazy val spark = SparkFixture.spark

  // Keep the suite fast: each evaluation is a Spark job over the whole
  // generated batch, so fewer, larger samples beat many tiny ones.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val int16 = Gen.chooseNum(-32768, 32767)

  property("int16 batch roundtrip") = Prop.forAll(Gen.nonEmptyListOf(int16)) { vs =>
    import spark.implicits._
    val (lo, hi) = FrameCodec.encodeInt16(col("v"))
    val bad = vs.map(_.toLong).toDF("v")
      .select(col("v"), FrameCodec.decodeInt16(lo, hi).as("rt"))
      .filter(col("rt") =!= col("v"))
      .count()
    bad == 0L
  }

  property("generated RFM2Pi frames decode to their source values") =
    Prop.forAll(
      Gen.chooseNum(0, 255),
      Gen.nonEmptyListOf(int16).map(_.take(8))) { (node, values) =>
      import spark.implicits._
      // Scala-side wire encoding (the generator plays the radio board):
      val bytes = values.flatMap { v =>
        val u = v & 0xFFFF
        Seq(u & 0xFF, (u >> 8) & 0xFF)
      }
      val line = s"OK $node ${bytes.mkString(" ")}"
      val toks = FrameCodec.tokens(col("line"))
      val out = Seq(line).toDF("line")
        .filter(FrameCodec.rfm2piValid(col("line"), toks))
        .select(
          FrameCodec.rfm2piNode(toks).as("node"),
          FrameCodec.rfm2piValues(toks).as("values"))
        .as[(Long, Seq[Double])]
        .collect()
      out.length == 1 &&
        out(0)._1 == node.toLong &&
        out(0)._2 == values.map(_.toDouble)
    }
}

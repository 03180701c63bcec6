package graft

import graft.operators.FrameCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P1/P2/P3 frame codec over the actual Spark expressions (not a Scala
  * mirror): every assertion runs the column expressions through a real
  * local DataFrame (FIXTURES.md "Synthetic inputs for streaming tests").
  */
class FrameCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("P3 int16 encode→decode roundtrips exhaustively over the full domain") {
    val bad = spark.range(-32768, 32768).toDF("v")
      .select(col("v"), FrameCodec.encodeInt16(col("v")) match {
        case (lo, hi) => FrameCodec.decodeInt16(lo, hi).as("rt")
      })
      .filter(col("rt") =!= col("v"))
      .count()
    assert(bad === 0L)
  }

  test("P3 encode emits genuine bytes (0..255) for the full domain") {
    val (lo, hi) = FrameCodec.encodeInt16(col("v"))
    val bad = spark.range(-32768, 32768).toDF("v")
      .select(lo.as("lo"), hi.as("hi"))
      .filter(col("lo") < 0 || col("lo") > 255 || col("hi") < 0 || col("hi") > 255)
      .count()
    assert(bad === 0L)
  }

  test("P1/P2 socket dialect: parse, and drop malformed/unreliable frames") {
    val lines = Seq(
      "10 105.3 220.1",   // valid
      " 7 1 ",            // valid after trim
      "? 10 1 2",         // unreliable → drop
      "abc 1.0",          // non-numeric node → drop
      "10",               // too short → drop
      "10 1.5 oops"       // non-numeric value → drop
    ).toDF("line")
    val toks = FrameCodec.tokens(col("line"))
    val parsed = lines
      .filter(FrameCodec.socketValid(col("line"), toks))
      .select(
        FrameCodec.socketNode(toks).as("node"),
        FrameCodec.socketValues(toks).as("values"))
      .as[(Long, Seq[Double])]
      .collect()
      .toList
    assert(parsed === List((10L, Seq(105.3, 220.1)), (7L, Seq(1.0))))
  }

  test("P1/P2/P3 RFM2Pi dialect: decode byte pairs, drop bad frames") {
    val lines = Seq(
      "OK 10 12 0 34 1",  // valid: 12, 290
      "OK 5 255 255",     // valid: -1
      "OK 10 12 0 34",    // odd byte count → drop
      "OK 10",            // no payload → drop
      "OK 10 300 1",      // byte out of range → drop
      "NOK 10 1 2",       // bad prefix → drop
      "? OK 10 1 2"       // unreliable → drop
    ).toDF("line")
    val toks = FrameCodec.tokens(col("line"))
    val parsed = lines
      .filter(FrameCodec.rfm2piValid(col("line"), toks))
      .select(
        FrameCodec.rfm2piNode(toks).as("node"),
        FrameCodec.rfm2piValues(toks).as("values"))
      .as[(Long, Seq[Double])]
      .collect()
      .toList
    assert(parsed === List((10L, Seq(12.0, 290.0)), (5L, Seq(-1.0))))
  }
}

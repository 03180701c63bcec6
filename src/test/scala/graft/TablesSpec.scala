package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the one operational dependency this engine has
  * on the driver's testdata generator: the physical encoding of
  * `events.ts`. It has already shipped in two generations — parquet
  * TIMESTAMP(NANOS) (readable in Spark 4 only as raw longs via the
  * legacy flag) and TIMESTAMP(MICROS) with isAdjustedToUTC=false
  * (which Spark reads as TIMESTAMP_NTZ) — and the r12→r13 handoff
  * proved the failure mode: a generator change silently errored every
  * events-table query in the round-12 driver run. [[Tables]] now
  * branches on the type Spark actually read; this spec pins all three
  * branches to the SAME instants so the next generator change is a
  * red test here, not 20 missing correctness rows.
  */
class TablesSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark

  // One reference row: 2024-01-01T00:00:01.234567Z.
  private val micros = 1704067201234567L

  // r13 ADVICE: delete the per-test temp dirs instead of leaking
  // parquet on every run. Loads are eagerly materialized below, so
  // nothing reads the files after afterAll.
  private val tmpDirs = scala.collection.mutable.ListBuffer.empty[java.io.File]
  override def afterAll(): Unit =
    tmpDirs.foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(d))

  private def writeAndLoad(writeDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-enc").toString
    tmpDirs += new java.io.File(dir)
    writeDf.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables(spark, dir, "events")
  }

  test("native TIMESTAMP ts passes through unchanged") {
    val df = writeAndLoad(
      spark.range(1).select(
        col("id").as("event_id"),
        timestamp_micros(lit(micros)).as("ts")))
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) === micros)
  }

  test("TIMESTAMP_NTZ ts is cast to the same UTC instant") {
    val df = writeAndLoad(
      spark.range(1).select(
        col("id").as("event_id"),
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts")))
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) === micros)
  }

  test("raw-long nanos ts (the legacy nanosAsLong read) truncates to the same microseconds") {
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); under the legacy
    // flag it READS one as LongType, which is indistinguishable from a
    // plain int64 column to the loader — so a plain long column
    // exercises exactly the branch the nanos generation takes.
    val df = writeAndLoad(
      spark.range(1).select(
        col("id").as("event_id"),
        lit(micros * 1000L + 999L).as("ts"))) // sub-µs ns that must truncate, not round
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) === micros)
  }

  test("a fourth, unknown ts encoding fails loudly instead of passing through") {
    // r13 ADVICE: the old `case _ => df` silently admitted any future
    // encoding into every events query; now it names the type and throws.
    val ex = intercept[IllegalStateException] {
      writeAndLoad(
        spark.range(1).select(
          col("id").as("event_id"),
          lit("2024-01-01T00:00:01Z").as("ts")))
    }
    assert(ex.getMessage.contains("unexpected type"))
  }
}

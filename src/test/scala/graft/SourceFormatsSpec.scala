package graft

import org.scalatest.funsuite.AnyFunSuite

/** S7 — file-format coverage beyond parquet: a gateway archive is
  * parquet here, but real feeds arrive as JSON-lines and CSV (emoncms
  * exports both). The engine must round-trip the full events schema —
  * timestamps at microsecond precision, doubles exactly, the embedded
  * JSON props string with its quoting — through both text formats
  * with zero row drift. No oracle (the driver contract is
  * parquet-in); equality against the parquet source IS the check.
  */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  private def roundtrip(format: String, options: Map[String, String]): Unit = {
    val src = Tables(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$format").toString
    src.write.options(options).format(format).mode("overwrite").save(dir)
    val back = spark.read.options(options).schema(src.schema).format(format).load(dir)
    assert(back.count() === src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty,
      s"$format roundtrip drifted")
  }

  test("events round-trip through JSON lines exactly") {
    roundtrip("json", Map(
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))
  }

  test("events round-trip through CSV exactly") {
    roundtrip("csv", Map(
      "header" -> "true",
      "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS"))
  }

  test("events round-trip through ORC exactly") {
    // the other columnar archive format Spark ships natively — same
    // binary-exact contract as parquet (no timestampFormat games)
    roundtrip("orc", Map.empty)
  }
}

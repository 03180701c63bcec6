package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite in the forked test JVM
  * (Test / fork := true ⇒ all suites run sequentially in one JVM, so
  * getOrCreate returns the same session and nobody stops it).
  */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftConf.ensure(s)
    s
  }
}

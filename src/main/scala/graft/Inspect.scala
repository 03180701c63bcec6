package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.5/§7.1): runs the
  * named queries exactly like [[Bench]] (same master/shuffle conf,
  * same table warmup, same timed action) but with the Spark UI LEFT
  * ON and the session held open afterwards, so per-operator SQL
  * metrics / stage timelines can be read for the executed plans.
  * Pure tooling — never part of the driver contract or any query.
  *
  * Usage:
  *   SPARK_GRAFT_QUERIES=q_x,q_y tools/inspect.sh   # holds UI on :4040
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val holdSec = sys.env.getOrElse("SPARK_GRAFT_INSPECT_HOLD_SEC", "600").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_INSPECT_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "true")
      // match Bench's codegen-class cache sizing (r21) so inspect
      // numbers stay comparable to bench numbers
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.ensure(spark)
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    for (r <- 1 to reps) {
      spark.catalog.clearCache()
      operators.Clustering.releaseLabels(spark)
      // r20 ADVICE: Bench releases the BPE merge memo per pass too —
      // without this, rep>=2 timings for the BPE queries measure memo
      // hits and stop being comparable to bench numbers
      operators.TextAnalysis.releaseBpe(spark)
      for ((name, fn) <- queries) {
        spark.sparkContext.setJobDescription(s"$name rep$r")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case t: Throwable => System.err.println(s"inspect ERROR $name: $t") }
        System.err.println(f"inspect rep$r $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        spark.sparkContext.setJobDescription(null)
      }
    }
    System.err.println(s"inspect: holding UI at http://localhost:4040 for $holdSec s")
    Thread.sleep(holdSec * 1000L)
    spark.stop()
  }
}

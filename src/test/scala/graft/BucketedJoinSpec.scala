package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite


/** Proof of the 100 TB claim written in Relational.scala's header: if
  * both join sides are bucketed on the join key, the orders⋈customer
  * shuffle disappears entirely. This is the layout the engine assumes
  * for fact-fact joins at scale; here we materialize both tables
  * bucketed into a throwaway warehouse and assert the physical plan
  * has NO shuffle and produces the same result as the plain join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    // tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    // static conf and cannot be pointed elsewhere post-session.
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // disable broadcast so the test can't pass by broadcasting instead
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders").write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables(spark, sf, "customer").write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("rev"))

      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan feeds SortMergeJoin directly: no Exchange anywhere
      // before the aggregation's own shuffle — in fact the groupBy is on
      // a non-bucket key, so allow exactly the aggregate exchange.
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected only the final agg exchange, plan:\n$plan")

      // same answer as the unbucketed join
      val plain = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("rev"))
      assert(
        joined.orderBy("c_nationkey").collect().toSeq ===
          plain.orderBy("c_nationkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}

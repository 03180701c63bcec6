package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed ANN vs brute force (VERDICT r1 next-round #6): the probe
  * must only ever scan probed buckets, and its recall against the
  * exact top-10 is a fixed, measured property of the deterministic
  * data (5/10 on isotropic vectors at sf0.001 — the LSH worst case).
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed top-10 comes from probed buckets only, recall@10 >= 4") {
    val bucketed = SparkEntry.queries("q_sim_bucketed")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = SparkEntry.queries("q_sim_cosine")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).take(10).toSet
    assert(bucketed.size === 10)
    // every hit is within Hamming-1 of the query bucket in AT LEAST
    // one of the two plane sets — i.e. it really came from a probe
    val e = Similarity.planeSets.zipWithIndex.foldLeft(Tables(spark, sf, "embeddings")) {
      case (d, (ps, i)) => d.withColumn(s"b$i", Similarity.bucketOf(col("embedding"), ps))
    }
    val qbs = e.filter(col("vec_id") === 0).select("b0", "b1").head()
    val hitBuckets = e.filter(col("vec_id").isin(bucketed.toSeq: _*))
      .select("b0", "b1").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(hitBuckets.forall { case (b0, b1) =>
      Integer.bitCount(b0 ^ qbs.getInt(0)) <= 1 || Integer.bitCount(b1 ^ qbs.getInt(1)) <= 1
    })
    assert((bucketed & brute).size >= 4)
  }

  test("OR-amplification: two-set recall dominates single-set, probes fixed not N-dependent") {
    val brute = SparkEntry.queries("q_sim_cosine")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).take(10).toSet
    def top10(sets: Seq[Seq[(Int, Int)]]): Set[Long] =
      Similarity.probedCandidates(spark, sf, sets)
        .select(
          col("vec_id"),
          graft.operators.VectorOps.cosine(
            col("embedding"), typedlit(Similarity.queryVec(spark, sf))).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10).collect().map(_.getLong(0)).toSet
    val single = top10(Similarity.planeSets.take(1))
    val both = top10(Similarity.planeSets)
    // the second plane set can only ADD candidates: the amplified
    // probe's recall against the exact top-10 dominates the single set
    assert((both & brute).size >= (single & brute).size)
    // and it genuinely widened the candidate pool on this corpus
    val nSingle = Similarity.probedCandidates(spark, sf, Similarity.planeSets.take(1)).count()
    val nBoth = Similarity.probedCandidates(spark, sf).count()
    assert(nBoth > nSingle)
    // still a probe, not a scan: candidates are a strict corpus subset
    assert(nBoth < Tables(spark, sf, "embeddings").count() - 1)
  }

  test("IVF probe scans one cell only and ranks it exactly") {
    val (clustered, topk) = Similarity.ivfTopK(spark, sf, k = 10)
    val rows = topk.collect()
    assert(rows.length === 10)
    // every hit lives in the query's cell — the probe never left it
    val qCell = clustered.filter(col("vec_id") === 0).select("cell").head().getInt(0)
    val hitIds = rows.map(_.getLong(0)).toSet
    val cells = clustered.filter(col("vec_id").isin(hitIds.toSeq: _*))
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(cells === Set(qCell))
    // the cell is a strict subset of the corpus (real pruning)
    val cellSize = clustered.filter(col("cell") === qCell).count()
    assert(cellSize < clustered.count())
    // within the probed cell the ranking is exact: scores descending
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse)
  }
}

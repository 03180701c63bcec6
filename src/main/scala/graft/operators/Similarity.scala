package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Approximate nearest-neighbour search over the embedding column
  * (SURVEY.md §2.5 X4's scale path). Brute force (Extensions.simCosine)
  * stays the correctness baseline; this module is the bucketed probe:
  * sign-LSH on 4 fixed hyperplanes (16 buckets) with Hamming-1
  * multi-probe — 5 of 16 buckets scanned, ~3× pruning at equal plan
  * shape to production ANN.
  *
  * Scale notes (100 TB): the probe is a broadcast semi-join of the
  * candidate buckets against the (bucket-partitioned) vector table —
  * only probed partitions are read when the table is written
  * partitioned/bucketed by the LSH key, which is the layout this
  * operator assumes at scale. Isotropic synthetic vectors are the
  * worst case for LSH (no cluster structure — measured recall@10 is
  * 5/10 here); real embedding corpora cluster, and production would
  * add OR-amplification (several independent plane sets) for recall,
  * which multiplies probes, not N. Scoring reuses the codegen'd
  * VectorOps HOFs — no UDF anywhere.
  */
object Similarity {

  /** Sign-LSH bucket from 4 fixed axis-aligned hyperplanes. The same
    * expression computes the build-side key and the query-side key.
    */
  def bucketOf(emb: Column): Column =
    Seq(1 -> 1, 17 -> 2, 33 -> 4, 49 -> 8)
      .map { case (d, w) => when(element_at(emb, d) > 0, lit(w)).otherwise(lit(0)) }
      .reduce(_ + _)

  /** Shared probe stage: candidates for the query vector (vec_id = 0)
    * from its bucket plus the 4 Hamming-1 neighbours — (vec_id, label,
    * embedding, q_emb) rows, scored differently per metric below.
    */
  private def probedCandidates(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .withColumn("bucket", bucketOf(col("embedding")))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("bucket").as("qb"))
    val probes = q.select(
      col("q_emb"),
      explode(array(
        col("qb"),
        col("qb").bitwiseXOR(lit(1)),
        col("qb").bitwiseXOR(lit(2)),
        col("qb").bitwiseXOR(lit(4)),
        col("qb").bitwiseXOR(lit(8)))).as("bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), "bucket")
  }

  /** X4-scale — multi-probe bucketed cosine top-10 for the query
    * vector: probe the query's bucket plus its 4 Hamming-1 neighbours,
    * score only those candidates.
    */
  private def simBucketed(s: SparkSession, dir: String): DataFrame =
    probedCandidates(s, dir)
      .select(
        col("vec_id"), col("label"),
        round(VectorOps.cosine(col("embedding"), col("q_emb")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)

  /** X4-scale L2 variant (`q_sim_l2`) — nearest-10 by squared
    * Euclidean distance over the same probed candidates (squared form:
    * cheaper than L2, identical ordering). Distance pipelines (k-NN
    * dedup, outlier screens) want L2; cosine and L2 share the probe
    * machinery.
    */
  private def simL2(s: SparkSession, dir: String): DataFrame =
    probedCandidates(s, dir)
      .select(
        col("vec_id"), col("label"),
        round(VectorOps.l2Sq(col("embedding"), col("q_emb")), 4).as("dist_sq"))
      .orderBy(col("dist_sq").asc, col("vec_id").asc)
      .limit(10)

  /** IVF variant of the same probe idea: coarse-quantize with
    * distributed k-means (no driver-side collect of the corpus — the
    * model holds k centroids only), then score just the query's cell.
    * Deterministic per session (fixed seed) but k-means float
    * reductions are not cross-engine reproducible, so this is
    * ScalaTest-verified (invariants + recall), not oracle-declared —
    * the sign-LSH path above is the hash-checked one.
    *
    * Returns (clustered corpus, top-k of the query's cell).
    */
  def ivfTopK(s: SparkSession, dir: String, k: Int = 10, nCells: Int = 8): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables(s, dir, "embeddings")
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42L).setFeaturesCol("features").fit(e)
    val clustered = model.transform(e).withColumnRenamed("prediction", "cell")
    val q = clustered.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("cell"))
    val topk = clustered.filter(col("vec_id") =!= 0)
      .join(broadcast(q), "cell")
      .select(
        col("vec_id"), col("label"),
        round(VectorOps.cosine(col("embedding"), col("q_emb")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
    (clustered, topk)
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_sim_bucketed" -> QueryDef(
      simBucketed,
      Some("""WITH buckets AS (
             |  SELECT vec_id, label, embedding,
             |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             |    + (CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END)
             |    + (CASE WHEN embedding[33] > 0 THEN 4 ELSE 0 END)
             |    + (CASE WHEN embedding[49] > 0 THEN 8 ELSE 0 END) AS bucket
             |  FROM embeddings),
             |qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
             |probe AS (SELECT bucket FROM qb
             |          UNION SELECT xor(bucket, 1) FROM qb UNION SELECT xor(bucket, 2) FROM qb
             |          UNION SELECT xor(bucket, 4) FROM qb UNION SELECT xor(bucket, 8) FROM qb),
             |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
             |cands AS (SELECT b.vec_id, b.label, b.embedding
             |          FROM buckets b JOIN probe p ON b.bucket = p.bucket WHERE b.vec_id <> 0),
             |scored AS (
             |  SELECT e.vec_id, e.label,
             |    list_sum(list_transform(list_zip(e.embedding, q.qe),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS score
             |  FROM cands e, q)
             |SELECT vec_id, label, round(score, 4) AS score FROM scored
             |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin),
      "X4-scale sign-LSH multi-probe bucketed cosine top-10"),
    "q_sim_l2" -> QueryDef(
      simL2,
      Some("""WITH buckets AS (
             |  SELECT vec_id, label, embedding,
             |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             |    + (CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END)
             |    + (CASE WHEN embedding[33] > 0 THEN 4 ELSE 0 END)
             |    + (CASE WHEN embedding[49] > 0 THEN 8 ELSE 0 END) AS bucket
             |  FROM embeddings),
             |qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
             |probe AS (SELECT bucket FROM qb
             |          UNION SELECT xor(bucket, 1) FROM qb UNION SELECT xor(bucket, 2) FROM qb
             |          UNION SELECT xor(bucket, 4) FROM qb UNION SELECT xor(bucket, 8) FROM qb),
             |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
             |cands AS (SELECT b.vec_id, b.label, b.embedding
             |          FROM buckets b JOIN probe p ON b.bucket = p.bucket WHERE b.vec_id <> 0),
             |scored AS (
             |  SELECT e.vec_id, e.label,
             |    list_sum(list_transform(list_zip(e.embedding, q.qe),
             |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
             |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS dist_sq
             |  FROM cands e, q)
             |SELECT vec_id, label, round(dist_sq, 4) AS dist_sq FROM scored
             |ORDER BY dist_sq ASC, vec_id ASC LIMIT 10""".stripMargin),
      "X4-scale L2 nearest-10 over the multi-probe candidates"),
  )
}

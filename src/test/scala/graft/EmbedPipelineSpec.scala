package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X134 composed embedding-pipeline pins — the [[PipelineSpec]]
  * mandate applied to the vector side: (a) embeddings read from
  * parquet exactly once end-to-end, (b) the final plan runs off the
  * materialized intermediate, (c) composition changes nothing — the
  * prune stage's columns equal the standalone declared q_embed_prune
  * row-for-row on the (norm-healthy) corpus, (d) a full sequential
  * fate recount at two SFs, and (e) the branches the healthy corpus
  * cannot reach (broken-norm gate) driven through the same
  * embedPipelineOf on a fixture.
  */
class EmbedPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  private def fate(dir: String = sf): DataFrame =
    SparkEntry.queries("q_embed_pipeline")(spark, dir)

  test("embedding pipeline reads the embeddings parquet exactly once, end to end") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // the centroid literals are a memoized bounded artifact — warm them
    // so their ≤K-row pushdown scan is construction, not pipeline, cost
    operators.Clustering.centroids(spark, sf)
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      private def count(qe: QueryExecution): Unit = {
        val n = qe.executedPlan.toString.linesIterator
          .count(l => l.contains("FileScan") && l.contains("embeddings"))
        scans.addAndGet(n)
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        count(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        count(qe)
    }
    def quiesce(): Unit = {
      val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
      var last = -1
      var stableSince = System.nanoTime
      while (System.nanoTime < deadline &&
        (scans.get() != last || System.nanoTime - stableSince < 1000L * 1000 * 1000)) {
        if (scans.get() != last) { last = scans.get(); stableSince = System.nanoTime }
        Thread.sleep(100)
      }
    }
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    quiesce()
    scans.set(0)
    spark.listenerManager.register(listener)
    try {
      val rows = fate().collect()
      assert(rows.length == nVecs)
      quiesce()
      assert(scans.get() == 1,
        s"expected exactly one embeddings scan across the pipeline, saw ${scans.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("final embedding-pipeline plan runs off the materialized intermediate") {
    val plan = fate().queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"final plan still scans files:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD") ||
      plan.contains("checkpoint"),
      s"final plan does not read the checkpointed scan:\n$plan")
  }

  test("composition changes nothing: prune columns equal standalone q_embed_prune") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // the live corpus is norm-healthy (X127), so every vector reaches
      // the prune stage and the composed columns must equal the
      // standalone declared operator's output exactly
      val standalone = SparkEntry.queries("q_embed_prune")(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toMap
      val composed = fate(dir).collect()
      assert(composed.forall(_.getLong(1) == 1L), "corpus unexpectedly norm-broken")
      composed.foreach { r =>
        val want = standalone(r.getLong(0))
        val got = (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(got === want, s"prune stage diverges for vec ${r.getLong(0)} at $dir")
      }
      assert(composed.length === standalone.size)
    }
  }

  test("fate table recounts sequentially at two SFs (cap + kept off the verdicts)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val m = operators.Clustering.embedPipeM
      val rows = fate(dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
          r.getLong(5), r.getLong(6),
          if (r.isNullAt(7)) None else Some(r.getLong(7)), r.getLong(8)))
      // cap_rank: per cell, kept-middle vectors ordered by vec_id
      val wantCap = rows.filter(_._6 == 0L).groupBy(_._3).toSeq.flatMap { case (_, vs) =>
        vs.sortBy(_._1).zipWithIndex.map { case (v, i) => v._1 -> (i + 1).toLong }
      }.toMap
      rows.foreach { r =>
        val cap = wantCap.get(r._1)
        assert(r._7 === cap, s"cap_rank diverges for vec ${r._1} at $dir")
        val kept = if (r._2 == 1L && r._6 == 0L && cap.exists(_ <= m)) 1L else 0L
        assert(r._8 === kept, s"kept diverges for vec ${r._1} at $dir")
      }
      // verdict deciles: exactly ceil(n/10) prototypes and outliers per cell
      rows.groupBy(_._3).foreach { case (cid, vs) =>
        val n = vs.length
        val cut = (n + 9) / 10
        assert(vs.count(_._6 == 1L) == cut, s"proto count off in cell $cid at $dir")
        assert(vs.count(_._6 == 2L) == cut, s"outlier count off in cell $cid at $dir")
        assert(vs.forall(_._4 == n.toLong), s"cell size column off in cell $cid")
      }
      // the cap must BIND in some cells and NOT in others (the X57
      // both-branches-live sizing rule; the smallest cell's kept middle
      // sits under M on the shipped corpus)
      assert(rows.exists(r => r._7.exists(_ > m)), s"cap never binds at $dir")
      val cellMax = rows.filter(_._7.isDefined).groupBy(_._3)
        .map { case (_, vs) => vs.flatMap(_._7).max }
      assert(cellMax.exists(_ <= m), s"cap binds in every cell at $dir")
    }
  }

  test("q_coreset: sequential greedy recount at two SFs; radii monotone; cover guarantee holds") {
    def r4(d: Double): Double =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      def d2(a: Array[Double], b: Array[Double]): Double =
        r4(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      // seed: max ppm-snapped norm2, min vec_id tie
      val seed = vecs.maxBy { case (id, v) =>
        (math.round(v.map(x => x * x).sum * 1000000.0), -id)
      }._1
      var chosen = Vector(seed)
      var want = Vector[(Long, Long, Option[Double])]((1L, seed, None))
      val byId = vecs.toMap
      for (r <- 2 to graft.operators.Clustering.coresetK) {
        val (id, rad) = vecs.map { case (vid, v) =>
          (vid, chosen.map(c => d2(byId(c), v)).min)
        }.maxBy { case (vid, d) => (d, -vid) }
        chosen = chosen :+ id
        want = want :+ ((r.toLong, id, Some(rad)))
      }
      val finalRadius =
        vecs.map { case (_, v) => chosen.map(c => d2(byId(c), v)).min }.max
      val got = SparkEntry.queries("q_coreset")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getDouble(3)))
      assert(got.toSeq === want.map { case (r, id, rad) => (r, id, rad, finalRadius) },
        s"greedy recount diverges at $dir")
      // Gonzalez invariants on the declared output: radii non-increasing,
      // and the final cover radius never exceeds the last pick's radius
      val radii = got.flatMap(_._3)
      assert(radii.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
        s"selection radii not monotone at $dir: ${radii.toSeq}")
      assert(got.head._4 <= radii.last, s"cover guarantee violated at $dir")
    }
  }

  test("coresetOf: planted blobs — one pick per blob, radius collapses to intra-blob scale") {
    import spark.implicits._
    // three tight blobs at distance ~200 apart, intra-blob d2 <= 0.02
    val blobs = Seq(
      (Array(0.0f, 0.0f), 100L), (Array(10.0f, 0.0f), 200L), (Array(0.0f, 10.0f), 300L))
    val vecs = (for (((c, base), i) <- blobs.zipWithIndex; j <- 0 until 4) yield {
      val eps = 0.01f * j
      (base + j, Seq(c(0) + eps, c(1) - eps))
    }).toDF("vec_id", "embedding")
    val got = graft.operators.Clustering.coresetOf(vecs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val blobOf = got.map(_._2 / 100)
    assert(blobOf.distinct.length === 3,
      s"k-center must pick one vector per separated blob, got $got")
    assert(got.head._3 <= 0.02,
      s"cover radius should collapse to intra-blob scale, got ${got.head._3}")
  }

  test("embedPipelineOf: broken-norm vectors gate out with NULL stages; tiny cells keep their middle") {
    import spark.implicits._
    val cents = Seq(1L -> Array(1.0, 0.0), 2L -> Array(0.0, 1.0))
    val vecs = Seq(
      (10L, Seq(1.0f, 0.0f)),   // cell 1, d2 = 0 -> prototype
      (11L, Seq(0.8f, 0.6f)),   // cell 1 middle (unit norm)
      (12L, Seq(0.6f, 0.8f)),   // cell 2... check: d2 to c1 = 0.8, to c2 = 0.4 -> cell 2
      (13L, Seq(0.0f, 1.0f)),   // cell 2, d2 = 0 -> prototype
      (14L, Seq(0.5f, 0.0f)),   // n2 = 0.25 -> norm gate fails
      (15L, Seq(0.28f, 0.96f)), // cell 2 far-ish (unit norm)
      (16L, Seq(0.96f, 0.28f))  // cell 1 far-ish (unit norm)
    ).toDF("vec_id", "embedding")
    val got = operators.Clustering.embedPipelineOf(vecs, cents, m = 40L).collect()
      .map(r => r.getLong(0) -> r).toMap
    // broken norm: gate 0, every later stage NULL, kept 0
    val broken = got(14L)
    assert(broken.getLong(1) == 0L && broken.isNullAt(2) && broken.isNullAt(6) &&
      broken.isNullAt(7) && broken.getLong(8) == 0L)
    // 3-vector cells: cut = 1 -> one proto, one outlier, one kept middle
    // cell 1 distances: 10 -> 0, 16 -> 0.08, 11 -> 0.4; cell 2: 13 -> 0,
    // 15 -> 0.08, 12 -> 0.4 — middle is the 0.08 vector in both
    for ((proto, mid, outl, cell) <- Seq((10L, 16L, 11L, 1L), (13L, 15L, 12L, 2L))) {
      assert(got(proto).getLong(6) == 1L, s"vec $proto should be prototype")
      assert(got(outl).getLong(6) == 2L, s"vec $outl should be outlier")
      val m0 = got(mid)
      assert(m0.getLong(2) == cell && m0.getLong(6) == 0L &&
        m0.getLong(7) == 1L && m0.getLong(8) == 1L,
        s"vec $mid should be the kept middle of cell $cell")
    }
  }
}

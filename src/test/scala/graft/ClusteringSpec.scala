package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

/** X21 connected components: alternating-star result pinned against a
  * driver-side union-find ground truth on adversarial graph shapes
  * (the long chain forces multiple alternating rounds; label
  * propagation would need O(n)), plus the corpus planted-pair truth
  * set and the star-forest output invariants.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  /** Run CC through the declared entry point. `localThreshold` "0"
    * forces the distributed alternating-star fixpoint; the default
    * lets the r20 local union-find finish engage (these fixture graphs
    * are tiny) — the matching tests below pin BOTH paths against the
    * driver union-find truth so neither can drift.
    */
  private def cc(edges: Seq[(Long, Long)],
      localThreshold: String = "200000"): Map[Long, (Long, Long)] = {
    import spark.implicits._
    spark.conf.set("spark.graft.cc.localEdgeThreshold", localThreshold)
    try Clustering.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  /** Driver-side union-find: (member → (min of component, size)). */
  private def truth(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.map(x => x -> find(x))
    val byRoot = members.groupBy(_._2)
    members.map { case (x, r) =>
      val comp = byRoot(r).map(_._1)
      x -> (comp.min, comp.size.toLong)
    }.toMap
  }

  test("chain, cliques, bridges, and isolated pairs match union-find") {
    val chain = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val cliqueA = for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)
    val cliqueB = for (i <- 200L to 203L; j <- (i + 1) to 203L) yield (j, i) // reversed pairs
    val bridge = Seq((104L, 200L)) // merges the two cliques
    val isolated = Seq((300L, 301L), (302L, 303L), (400L, 400L)) // self-loop must vanish
    val edges = chain ++ cliqueA ++ cliqueB ++ bridge ++ isolated
    val got = cc(edges)
    val want = truth(edges.filter(e => e._1 != e._2))
    assert(got == want)
    // r20: the distributed fixpoint must agree with the local finish
    assert(cc(edges, localThreshold = "0") == want)
    // the 40-node chain is ONE cluster labeled by its minimum
    assert(got(40L) == (1L, 40L))
    // bridged cliques merged: every member labeled 100, size 5+4
    assert(got(203L) == (100L, 9L))
  }

  test("randomized graphs match union-find across densities") {
    val rnd = new scala.util.Random(42)
    for (density <- Seq(20, 60, 200)) {
      val edges = Seq.fill(density)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(e => e._1 != e._2)
      assert(cc(edges) == truth(edges), s"density $density")
      // r20: same graph through the distributed fixpoint path
      assert(cc(edges, localThreshold = "0") == truth(edges), s"density $density (fixpoint)")
    }
  }

  test("empty pair set yields an empty, correctly-typed result") {
    import spark.implicits._
    val out = Clustering.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id", "cluster_size"))
    assert(out.count() == 0)
  }

  test("q_dedup_keep keeps exactly one canonical doc per cluster, everything else verbatim") {
    val keep = SparkEntry.queries("q_dedup_keep")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clusters = SparkEntry.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full corpus coverage: 500 docs + the planted copies
    assert(keep.length > 500 && keep.map(_._1).distinct.length == keep.length)
    keep.foreach { case (id, cid, kept) =>
      clusters.get(id) match {
        case Some(c) => // cluster member: verdict = "am I the canonical min?"
          assert(cid == c && kept == (if (id == c) 1L else 0L), s"doc $id wrong verdict")
        case None => // unclustered doc keeps itself
          assert(cid == id && kept == 1L, s"unclustered doc $id not kept")
      }
    }
    // exactly one survivor per cluster, and it is the minimum
    val byCluster = keep.filter(k => clusters.contains(k._1)).groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._3 == 1L) == 1 && members.filter(_._3 == 1L).head._1 == cid)
    }
    // the two queries share one memoized CC run per (session, dir)
    assert(graft.operators.Clustering.clusterLabels(spark, sf)
      eq graft.operators.Clustering.clusterLabels(spark, sf))
    // plan shape: the labels side sits over a checkpointed RDD with
    // unknown compile-time stats, so the static plan is SMJ — it is
    // AQE's runtime exchange statistics that must flip the join to a
    // broadcast of the (dup-rate-bounded) labels side. Pin the FINAL
    // adaptive plan, not the static one.
    val keepDf = SparkEntry.queries("q_dedup_keep")(spark, sf)
    keepDf.collect()
    val finalPlan = keepDf.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"AQE did not broadcast the labels side of q_dedup_keep:\n$finalPlan")
  }

  test("q_cluster_sizes: histogram recount off q_dedup_cluster + corpus, shares close") {
    // X153 recounted sequentially at two SFs: cluster sizes from the
    // declared X21 labels, singletons by subtraction from the planted
    // corpus universe (q_dedup_keep's row count IS that universe),
    // buckets by the same ladder, shares in BigInt HALF_UP.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val labels = SparkEntry.queries("q_dedup_cluster")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val universe = SparkEntry.queries("q_dedup_keep")(spark, dir).count()
      val sizes = labels.map(r => r._2 -> r._3).distinct.map(_._2.toLong) ++
        Seq.fill((universe - labels.length).toInt)(1L)
      def bucket(sz: Long): Long =
        if (sz <= 4) sz else if (sz <= 8) 5 else if (sz <= 16) 9
        else if (sz <= 32) 17 else 33
      val byB = sizes.groupBy(bucket).toSeq.sortBy(_._1)
      val tot = BigInt(sizes.sum)
      val dup = BigInt(sizes.filter(_ >= 2).sum)
      val top = sizes.max
      val expected = byB.map { case (b, ss) =>
        val nd = BigInt(ss.sum)
        (b, ss.size.toLong, ss.sum,
          ((20000 * nd + tot) / (2 * tot)).toLong / 10000.0,
          top,
          ((20000 * dup + tot) / (2 * tot)).toLong / 10000.0)
      }
      val got = SparkEntry.queries("q_cluster_sizes")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getDouble(5))).toSeq
      assert(got === expected, s"cluster-size histogram recount diverges at $dir")
      // internal consistency: every corpus doc appears exactly once
      assert(got.map(_._3).sum === universe, s"histogram loses docs at $dir")
      assert(got.exists(_._1 == 1L) && got.exists(_._1 > 1L),
        s"histogram must show singletons AND dup clusters at $dir")
    }
    // the bucket ladder's upper rungs, exercised directly
    val lows = Seq(1L, 4L, 5L, 8L, 9L, 16L, 17L, 32L, 33L, 1000L)
      .map(sz => if (sz <= 4) sz else if (sz <= 8) 5L else if (sz <= 16) 9L
      else if (sz <= 32) 17L else 33L)
    assert(lows === Seq(1L, 4L, 5L, 5L, 9L, 9L, 17L, 17L, 33L, 33L))
  }

  test("q_dedup_cluster groups every planted near-dup with its source") {
    val rows = SparkEntry.queries("q_dedup_cluster")(spark, sf).collect()
    val label = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // planted copies (doc_id % 25 == 0, shifted +200000) must share
    // their source's cluster — and the source is the cluster min for
    // pairs that contain only the two of them
    val planted = label.keys.filter(_ >= 200000L)
    assert(planted.nonEmpty, "corpus lost its planted near-dups")
    planted.foreach { p =>
      assert(label.contains(p - 200000L) && label(p) == label(p - 200000L),
        s"planted copy $p not clustered with its source")
    }
    // output invariants: one row per member; cluster_id is the min
    // member of its cluster; sizes agree with membership
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.forall(_.getLong(2) == members.length.toLong))
    }
  }

  test("q_kmeans_assign matches an independent driver-side argmin over raw vectors") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_kmeans_assign")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = (1L to 8L).map(cid => cid -> vecs(cid))
    assert(got.keySet === vecs.keySet, "assignment dropped or invented vectors")
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      // the query's round-4-before-argmin rule, Catalyst Round semantics
      BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    vecs.foreach { case (id, v) =>
      val (bestCid, bestD2) = cents.map { case (cid, c) => (cid, d2(v, c)) }
        .minBy { case (cid, d) => (d, cid) }
      assert(got(id) === ((bestCid, bestD2)), s"vector $id assigned wrong centroid")
    }
    // centroids are their own nearest centroid at distance zero
    (1L to 8L).foreach(cid => assert(got(cid) === ((cid, 0.0))))
  }

  test("q_kmeans_update matches driver-side per-cluster means and partial-aggregates before the shuffle") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_kmeans_update")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === 8 * 64, "update must emit one mean per (cluster, dimension)")
    val assign = SparkEntry.queries("q_kmeans_assign")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val members = vecs.keys.groupBy(assign)
    members.foreach { case (cid, ids) =>
      (0 until 64).foreach { d =>
        val exact = ids.map(vecs(_)(d).toDouble).sum / ids.size
        val exp = BigDecimal(exact).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        // distributed partial-sum order differs from this sequential
        // sum; a boundary-straddling ulp can move the rounded value by
        // one bucket at most (the scaladoc's float caveat)
        assert(math.abs(got((cid, d + 1L)) - exp) <= 1.0001e-4,
          s"cluster $cid dim ${d + 1} mean ${got((cid, d + 1L))} != $exp")
      }
    }
    // the scale claim: aggregation must start map-side, BEFORE the
    // exchange — the shuffle then carries partial sums, not N×d rows
    val plan = SparkEntry.queries("q_kmeans_update")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_avg"),
      s"centroid update does not partial-aggregate before the shuffle:\n$plan")
  }

  test("the composed Lloyd loop (assign → update → re-literalize) is distributed k-means") {
    import org.apache.spark.sql.functions._
    // SURVEY §2.5 X33's claim — "a driver loop alternating X32/X33 IS
    // distributed k-means" — proven by composition: three iterations
    // at sf0.001, re-literalizing the emitted K×d means each round.
    val hist = Clustering.lloyd(spark, sf, 3)
    assert(hist.length == 3)
    hist.foreach { case (cents, _) =>
      assert(cents.map(_._1) == (1L to 8L) && cents.forall(_._2.length == 64))
    }
    // (a) within-cluster SSE non-increasing across iterations. Lloyd
    // guarantees it exactly; the round-4 contract on d2 and on the
    // means adds ≤ 0.5e-4 noise per term, ~500 terms → 0.05 headroom
    // (the SSE is carried ×10⁴ as an exact integer, hence 500 units).
    val sses = hist.map(_._2)
    sses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 500L, s"SSE increased across an iteration: $sses")
    }
    assert(sses.last < sses.head, s"three iterations improved nothing: $sses")
    // (b) iteration 2 is reproducible from the DECLARED update query's
    // emitted (cid, dim, mean) rows — the row output is a sufficient
    // centroid state, not just a report. Build centroids from
    // q_kmeans_update's output and check the round-2 assignment
    // decisions match the composed loop's exactly (the round-4-before-
    // argmin rule makes the decision itself portable).
    val emitted = SparkEntry.queries("q_kmeans_update")(spark, sf).collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray
      }
    emitted.zip(hist.head._1).foreach { case ((cidE, vE), (cidL, vL)) =>
      assert(cidE == cidL)
      vE.zip(vL).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1.0001e-4, s"cluster $cidE means diverged: $a vs $b")
      }
    }
    def assignUnder(cents: Seq[(Long, Array[Double])]): Map[Long, Long] =
      Tables(spark, sf, "embeddings")
        .select(col("vec_id"),
          Clustering.bestCentroidOf(cents).getField("cid").cast("long").as("cid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assignUnder(emitted) == assignUnder(hist.head._1),
      "round-2 assignments from the emitted rows diverge from the composed loop")
  }

  test("q_kmeans_assign is narrow per-row work: no join, no aggregate, one sort exchange") {
    // K centroids are plan literals, so the argmin must compile to a
    // projection — the K-way cross join + window the oracle states
    // must NOT appear in the Spark plan
    val plan = SparkEntry.queries("q_kmeans_assign")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"k-means assignment plans a join:\n$plan")
    assert(!plan.contains("Window"), s"k-means assignment plans a window:\n$plan")
    assert(!plan.contains("HashAggregate"), s"k-means assignment plans an aggregate:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 1,
      s"k-means assignment should shuffle only for the final order-by:\n$plan")
  }

  test("q_cluster_sample: driver recount, cap binds in some cells only, repartition-stable") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val m = Clustering.clusterSampleM
    val got = SparkEntry.queries("q_cluster_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // Independent driver truth: argmin assignment (round-4, cid
    // tie-break) + md5-prefix uniform + per-cell (u, vec_id) rank
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = Clustering.centroids(spark, dir)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(a: Array[Float], b: Array[Float]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    def h32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    // every embeddings row is a corpus member here, including vec_id 0
    // — the house convention of the clustering family (q_kmeans_assign
    // ranks row 0 too)
    val assigned = vecs.toSeq.map { case (id, v) =>
      (id, cents.map { case (cid, c) => (r4(d2(v, c)), cid) }.min._2, h32(s"cs$id"))
    }
    val cellPop = assigned.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cid, rows) =>
      rows.sortBy { case (id, _, u) => (u, id) }.zipWithIndex
        .take(m).map { case ((id, _, _), i) => (id, cid, (i + 1).toLong) }
    }.sortBy(_._1)
    assert(got.toSeq === expected, "declared sample diverges from the driver recount")

    // the M=60 quota binds in some cells and not others at this SF
    // (r13 ADVICE: at M=25 the cap bound everywhere and the keep-all
    // branch was untested) — both branches non-vacuous
    val kept = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(kept.values.exists(_ == m), s"no cell binds the cap: $kept")
    assert(kept.exists { case (cid, k) => k < m && k == cellPop(cid) },
      s"no under-cap cell kept all its rows: kept=$kept pop=$cellPop")
    // ranks are contiguous 1..k within every cell
    got.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.size.toLong),
        s"ranks not contiguous in cell $cid")
    }

    // the salted-hash selection is stable under physical layout: the
    // same ranking built over a repartitioned input matches row-for-row
    val reparted = graft.Tables(spark, dir, "embeddings")
      .repartition(7, col("label"))
      .select(
        col("vec_id"),
        Clustering.bestCentroid(spark, dir).getField("cid").cast("long").as("cid"),
        graft.operators.Hashing.h32(
          concat(lit("cs"), col("vec_id").cast("string"))).as("u"))
    val got2 = graft.operators.Extensions
      .rankedByRange(reparted, "cid", Seq("u", "vec_id"), "cs_rank")
      .filter(col("cs_rank") <= m)
      .select(col("vec_id"), col("cid"), col("cs_rank").cast("long").as("cs_rank"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq === got.toSeq, "sample changed under repartitioning")
  }

  test("q_dup_pagerank matches a sequential integer power-iteration recount") {
    // The X65 pin: the distributed damped update — integer millionths,
    // floor division per edge, 17/20 damping — recomputed in plain
    // sequential Scala over the same verified-pair edge list must
    // agree EXACTLY (integer fixed point has one right answer; any
    // float in the distributed path would drift from this recount).
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val pairs = graft.operators.Dedup.minhashPairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      val inbound = sym.map { case (s0, d0) => d0 -> s0 }
        .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      val n = deg.size
      assert(n > 0, s"no dup-graph nodes at $dir — the recount is vacuous")
      var r: Map[Long, Long] = deg.map { case (v, _) => v -> 1000000L / n }.toMap
      for (_ <- 1 to Clustering.prIters)
        r = deg.map { case (v, _) =>
          v -> (150000L / n + 17L * inbound(v).map(u => r(u) / deg(u)).sum / 20L)
        }.toMap
      val got = SparkEntry.queries("q_dup_pagerank")(spark, dir)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      val want = deg.keys.toSeq.sorted.map(v => (v, deg(v), r(v)))
      assert(got === want, s"distributed PageRank diverges from the recount at $dir")
      val mass = r.values.sum
      assert(mass <= 1000000L && mass > 0L,
        s"rank mass $mass escaped [1, 1e6] — floor division can only LOSE mass")
      info(s"$dir: ${n} dup-graph nodes, rank mass ${mass}/1000000 after ${Clustering.prIters} rounds")
    }
  }

  test("q_semantic_mix equals a driver fixed-point KL recount off the declared assignment") {
    // the recount path runs through q_kmeans_assign's own (oracle-
    // green) cell assignment, so this pins the X77 composition
    // independently: histogram → per-term snap → integer sum →
    // integer HALF_UP round, all replayed sequentially
    import java.math.{BigDecimal => JBD, RoundingMode}
    def snap6(x: Double): Long =
      JBD.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValueExact
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val cid = SparkEntry.queries("q_kmeans_assign")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val src = Tables(spark, dir, "documents").select("doc_id", "source")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val prof = cid.toSeq.flatMap { case (v, c) => src.get(v).map(s0 => (s0, c)) }
        .groupBy(identity).map { case ((s0, c), xs) => (s0, c) -> xs.size.toLong }
      val ci = prof.groupBy(_._1._2).map { case (c, xs) => c -> xs.values.sum }
      val tc = ci.values.sum
      val ts = prof.groupBy(_._1._1).map { case (s0, xs) => s0 -> xs.values.sum }
      val expected = ts.map { case (s0, t) =>
        val t6 = prof.collect { case ((`s0`, c), n) =>
          val p = n.toDouble / t
          val q = ci(c).toDouble / tc
          snap6(1000000.0 * p * math.log(p / q))
        }.sum
        val q4 = (math.abs(t6) + 50) / 100 * (if (t6 < 0) -1 else 1)
        s0 -> ((t, q4 / 10000.0))
      }
      val got = SparkEntry.queries("q_semantic_mix")(spark, dir)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === expected, s"semantic-mix recount diverges at $dir")
      assert(got.values.exists(_._2 > 0.0), s"vacuous pin at $dir: every source KL is 0")
    }
  }

  test("q_source_centroid matches a driver integer-fixed-point recount") {
    // X71's order-free claim made operational: the recount snaps every
    // component with the SAME shortest-repr HALF_UP rule Spark's round
    // uses (BigDecimal.valueOf), sums exactly in BigInt, and replays
    // the IEEE tail (cast, sqrt, divide, round-4) — any accumulation-
    // order sensitivity or decimal-overflow null in the distributed
    // plan diverges here.
    import java.math.{BigDecimal => JBD, RoundingMode}
    def snap(x: Double): Long =
      JBD.valueOf(x * 1000000.0).setScale(0, RoundingMode.HALF_UP).longValueExact
    def r4(x: Double): Double =
      JBD.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val emb = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val src = Tables(spark, dir, "documents").select("doc_id", "source")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val dims = emb.head._2.length
      val sums = emb.toSeq.groupBy { case (id, _) => src(id) }.map { case (s0, vs) =>
        val a = Array.fill(dims)(BigInt(0))
        vs.foreach { case (_, v) => for (d <- 0 until dims) a(d) += snap(v(d).toDouble) }
        s0 -> (vs.size.toLong, a)
      }
      val global = Array.fill(dims)(BigInt(0))
      sums.values.foreach { case (_, a) => for (d <- 0 until dims) global(d) += a(d) }
      val expected = sums.map { case (s0, (nd, a)) =>
        val dot = (0 until dims).map(d => a(d) * global(d)).sum
        val na = (0 until dims).map(d => a(d) * a(d)).sum
        val nb = (0 until dims).map(d => global(d) * global(d)).sum
        s0 -> (nd,
          r4(dot.doubleValue / (math.sqrt(na.doubleValue) * math.sqrt(nb.doubleValue))),
          r4(math.sqrt(na.doubleValue) / (nd.toDouble * 1000000.0)))
      }
      val got = SparkEntry.queries("q_source_centroid")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got === expected, s"source-centroid recount diverges at $dir")
      assert(got.size >= 2, s"vacuous centroid pin at $dir")
    }
  }

  test("q_source_dispersion equals a brute-force pairwise recount, to the integer") {
    // X79's whole claim is that the one-pass variance identity equals
    // the O(n²) pairwise sum it replaces. The recount computes the
    // LITERAL pairwise sum Σ_{i<j}||x_i−x_j||² over snapped-integer
    // vectors in BigInt, then applies the same integer HALF_UP
    // round-4 — so both the identity and the rounding are certified,
    // not re-derived.
    import java.math.{BigDecimal => JBD, RoundingMode}
    def snap(x: Double): Long =
      JBD.valueOf(x * 1000000.0).setScale(0, RoundingMode.HALF_UP).longValueExact
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val emb = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(f => snap(f.toDouble)))
        .toMap
      val src = Tables(spark, dir, "documents").select("doc_id", "source")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = emb.toSeq.groupBy { case (id, _) => src(id) }.collect {
        case (s0, vs) if vs.size >= 2 =>
          val vecs = vs.map(_._2)
          val n = vecs.size
          var pairSum = BigInt(0)
          for (i <- vecs.indices; j <- (i + 1) until n; d <- vecs(i).indices) {
            val diff = BigInt(vecs(i)(d) - vecs(j)(d))
            pairSum += diff * diff
          }
          val s2 = vecs.map(v => v.map(x => BigInt(x) * BigInt(x)).sum).sum
          val den = BigInt(n) * BigInt(n - 1) * BigInt(1000000000000L)
          val dnn = BigInt(n) * BigInt(1000000000000L)
          val q4 = (BigInt(2) * pairSum * 20000 + den) / (den * 2)
          val qn = (s2 * 20000 + dnn) / (dnn * 2)
          s0 -> (n.toLong, q4.toLong / 10000.0, qn.toLong / 10000.0)
      }
      val got = SparkEntry.queries("q_source_dispersion")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got === expected, s"dispersion pairwise recount diverges at $dir")
      assert(got.size >= 2 && got.values.exists(_._2 > 0), s"vacuous dispersion pin at $dir")
    }
  }

  test("q_source_family equals a union-find over the declared overlap edges, both branches live") {
    // X84's composition certified off its own (oracle-green) input:
    // threshold q_source_overlap at familyMinMatch, union-find on the
    // driver, family = lexicographic min member, singletons size 1.
    // Non-vacuity in BOTH directions: at least one multi-source
    // family (the threshold finds real overlap) and at least one
    // singleton (it doesn't glue everything).
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val edges = SparkEntry.queries("q_source_overlap")(spark, dir)
        .collect().filter(_.getLong(2) >= Clustering.familyMinMatch)
        .map(r => (r.getString(0), r.getString(1)))
      val all = Tables(spark, dir, "documents").select("source").distinct()
        .collect().map(_.getString(0)).sorted
      val parent = scala.collection.mutable.Map(all.map(s0 => s0 -> s0): _*)
      def find(x: String): String =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val fam = all.map(s0 => s0 -> find(s0)).toMap
      // path-compressed roots are not necessarily the min member; remap
      val minOf = fam.groupBy(_._2).map { case (r, xs) => r -> xs.keys.min }
      val sizes = fam.groupBy(_._2).map { case (r, xs) => minOf(r) -> xs.size.toLong }
      val expected = all.map(s0 => (s0, minOf(fam(s0)), sizes(minOf(fam(s0))))).toSeq
      val got = SparkEntry.queries("q_source_family")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got === expected, s"family recount diverges at $dir")
      assert(got.exists(_._3 >= 2), s"no multi-source family at $dir — threshold vacuous")
      assert(got.exists(_._3 == 1), s"no singleton at $dir — threshold glues everything")
      got.filter(r => r._1 == r._2).foreach { case (s0, f, _) =>
        assert(f == got.filter(_._2 == f).map(_._1).min, s"family $f is not its min member")
      }
    }
  }

  test("q_dup_flow equals a rollup of the declared X68 pairs through source metadata") {
    // X87 is pure composition: recount it off the (oracle-green)
    // q_substr_dedup output joined to sources on the driver, and pin
    // the unordered-pair invariant.
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val src = Tables(spark, dir, "documents").select("doc_id", "source")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val pairs = SparkEntry.queries("q_substr_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val expected = pairs.groupBy { case (a, b, _, _) =>
        val (sa, sb) = (src(a), src(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }.map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_._3).max, rs.map(_._4).sum)
      }
      val got = SparkEntry.queries("q_dup_flow")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got === expected, s"dup-flow rollup diverges at $dir")
      assert(got.nonEmpty, s"no duplication flow at $dir — vacuous")
      got.keys.foreach { case (a, b) => assert(a <= b, s"pair ($a,$b) not in canonical order") }
    }
  }

  test("q_dedup_rep picks each cluster's longest member; rep≠min-id occurs and is pinned") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    // ground truth off the oracle-green declared cluster labels + the
    // dedup corpus's own text lengths (copies are not in `documents`)
    val members = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val len = graft.operators.Dedup.corpus(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = members.groupBy(_._2).map { case (cid, ms) =>
      val ids = ms.map(_._1)
      val rep = ids.maxBy(id => (len(id), -id))
      cid -> (ids.length.toLong, rep, len(rep),
        if (rep == ids.min) 1L else 0L)
    }
    val got = SparkEntry.queries("q_dedup_rep")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected, "q_dedup_rep diverges from the sequential argmax recount")
    // the operator's reason to exist: clusters where the quality rep
    // is NOT the canonical min X26 keeps — and the dull case too
    val flags = got.values.map(_._4).toSet
    assert(flags == Set(0L, 1L),
      s"rep_is_min branches degenerate (saw $flags) — the keep-longest rule is vacuous vs X26")
  }

  test("q_silhouette: sequential recount at two SFs; verdict low on the isotropic corpus") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      val cents = Clustering.centroids(spark, dir)
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      def d2(a: Array[Float], b: Array[Float]) = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
        s
      }
      // per row: sort the K (round-4 d2, cid) candidates, s = 1 - sqrt(own/next)
      // snapped to millionths — the one fixed IEEE op sequence the query uses
      val perRow = vecs.map { case (_, v) =>
        val sorted = cents.map { case (cid, c) => (r4(d2(v, c)), cid) }.sorted
        val (dOwn, cid) = sorted.head
        val dNxt = sorted(1)._1
        val s = if (dNxt == 0.0) 0.0 else 1.0 - math.sqrt(dOwn / dNxt)
        (cid, BigDecimal(s * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
      def mean4(num: BigInt, den: BigInt): Double =
        ((num * 20000 + den * 1000000) / (den * 2000000)).toDouble / 10000.0
      val byCell = perRow.groupBy(_._1)
      val tNum = BigInt(perRow.map(_._2).sum); val tDen = BigInt(perRow.length)
      val expected = byCell.toSeq.map { case (cid, rows) =>
        (cid, rows.length.toLong,
          mean4(BigInt(rows.map(_._2).sum), BigInt(rows.length)), mean4(tNum, tDen))
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_silhouette")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(got.toSeq === expected, s"silhouette recount diverges at $dir")
      // the verdict DETECTS the isotropic corpus's lack of structure:
      // low but strictly positive (own centroid is still nearest)
      val overall = got.head._4
      assert(overall > 0.0 && overall < 0.2,
        s"overall silhouette $overall outside the isotropic band — fixture or math drifted")
      assert(got.map(_._1).toSeq == (1L to Clustering.centroidK).toSeq,
        "every cell must report (K rows always)")
    }
  }

  test("q_eff_size: sequential 1/m recount off the oracle-green labels; discount strictly binds") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val sizes = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val toks = graft.operators.Dedup.corpus(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def round4of(num: BigInt, den: BigInt): Double =
      ((num * 20000 + den) / (2 * den)).toDouble / 10000.0
    val expected = toks.groupBy { case (id, _) =>
      srcOf(if (id >= 200000) id - 200000 else id)
    }.toSeq.map { case (src, rows) =>
      val ms = rows.map { case (id, tok) => (tok, sizes.getOrElse(id, 1L)) }
      val ppm = ms.map { case (tok, m) => (BigInt(tok) * 2000000 + m) / (2 * m) }.sum
      (src, rows.length.toLong, ms.count(_._2 > 1).toLong, ms.map(_._1).sum,
        round4of(ppm, BigInt(1000000)),
        round4of(ppm, BigInt(ms.map(_._1).sum) * 1000000))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_eff_size")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === expected, "effective-size recount diverges from the labels")
    // the discount binds wherever duplication exists, and never inflates
    got.foreach { r =>
      assert(r._5 <= r._4.toDouble, s"effective tokens exceed raw for ${r._1}")
      if (r._3 > 0) assert(r._5 < r._4.toDouble, s"dup source ${r._1} not discounted")
      assert(r._6 > 0.0 && r._6 <= 1.0, s"ratio out of range for ${r._1}")
    }
    assert(got.exists(_._3 > 0), "vacuous pin: no duplicated members anywhere")
  }

  test("q_embed_prune: sequential decile recount off the assignment, all three verdicts live") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // ground truth off the oracle-green X32 assignment: exact rank
      // under (d2, vec_id) per cell, ceil-decile cuts, proto-first CASE
      val assigned = SparkEntry.queries("q_kmeans_assign")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cid, rows) =>
        val n = rows.length.toLong
        val cut = (n + 9) / 10
        rows.sortBy(t => (t._3, t._1)).zipWithIndex.map { case ((v, _, d2), i) =>
          val rk = (i + 1).toLong
          val verdict = if (rk <= cut) 1L else if (rk >= n - cut + 1) 2L else 0L
          (v, cid, d2, n, rk, verdict)
        }
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_embed_prune")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got.toSeq === expected.toSeq, s"prune recount diverges at $dir")
      // the screen must discriminate: prototypes, outliers AND keeps
      assert(Set(0L, 1L, 2L).subsetOf(got.map(_._6).toSet),
        s"a verdict branch is vacuous at $dir")
      // exactly ceil(n/10) per side per cell (no decile overlap at
      // these cell sizes — overlap resolves proto-first by CASE order)
      got.groupBy(_._2).foreach { case (cid, rows) =>
        val n = rows.head._4
        val cut = (n + 9) / 10
        assert(rows.count(_._6 == 1L) == cut, s"cell $cid proto count off at $dir")
        assert(rows.count(_._6 == 2L) == cut, s"cell $cid outlier count off at $dir")
      }
    }
  }

  test("q_sem_diversity: sequential entropy recount off the assignment; entropy discriminates") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val cells = SparkEntry.queries("q_kmeans_assign")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val labels = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val expected = labels.groupBy(_._2).toSeq.map { case (lab, vs) =>
        val byCell = vs.map(v => cells(v._1)).groupBy(identity).map(_._2.length.toLong)
        val n = vs.length.toLong
        val h6 = byCell.map { c =>
          val p = c.toDouble / n
          math.round(1e6 * p * math.log(p))
        }.sum
        val ent = math.floorDiv(math.abs(h6) + 50, 100) / 10000.0
        val top = (20000 * byCell.max + n) / (2 * n) / 10000.0
        (lab, n, byCell.size.toLong, ent, top)
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_sem_diversity")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(got.toSeq === expected, s"diversity recount diverges at $dir")
      // the measure must discriminate across slices, and every H must
      // sit inside [0, ln K]
      assert(got.map(_._4).distinct.length > 1, s"entropy constant across labels at $dir")
      val lnK = math.log(Clustering.centroidK.toDouble)
      got.foreach { case (lab, _, nc, h, top) =>
        assert(h >= 0.0 && h <= lnK + 1e-4, s"label $lab entropy $h outside [0, ln K] at $dir")
        assert(top >= 1.0 / Clustering.centroidK - 1e-4 && top <= 1.0,
          s"label $lab top share $top out of range at $dir")
        assert(nc >= 1 && nc <= Clustering.centroidK, s"label $lab cell count $nc at $dir")
      }
    }
  }

  test("q_cluster_nmi: sequential recount; independent labels ≈ 0; cell-relabeled fixture = 1") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val cells = SparkEntry.queries("q_kmeans_assign")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val labels = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long")).collect()
        .map(r => cells(r.getLong(0)) -> r.getLong(1))
      val cont = labels.groupBy(identity).map { case ((cid, lab), xs) =>
        (cid, lab, xs.length.toLong) }.toSeq
      val n = labels.length.toLong
      val ma = cont.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
      val mb = cont.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
      val mi6 = cont.map { case (i, j, c) =>
        math.round(1e6 * (c.toDouble / n) * math.log(n.toDouble * c / (ma(i).toDouble * mb(j))))
      }.sum
      def h6(m: Iterable[Long]): Long =
        m.map(a => math.round(-1e6 * (a.toDouble / n) * math.log(a.toDouble / n))).sum
      val nmi = BigDecimal(mi6.toDouble / math.sqrt(h6(ma.values).toDouble * h6(mb.values)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expected = cont.groupBy(_._1).toSeq.map { case (cid, rows) =>
        val nc = rows.map(_._3).sum
        val (topLab, maxc) = rows.map(r => (r._2, r._3)).sortBy(t => (-t._2, t._1)).head
        (cid, nc, topLab, (20000 * maxc + nc) / (2 * nc) / 10000.0, nmi)
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_cluster_nmi")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(got.toSeq === expected, s"NMI recount diverges at $dir")
      // the synthetic labels are round-robin, independent of geometry:
      // the verdict must sit in the near-zero band — the score's whole
      // point is that it CAN say "these clusters mean nothing"
      assert(got.head._5 < 0.1, s"NMI ${got.head._5} not near-zero for independent labels at $dir")
    }
    // perfect agreement through the SAME declared code path: relabel
    // every vector by its own cell id -> diagonal contingency -> NMI 1,
    // purity 1 everywhere
    import spark.implicits._
    val dir0 = "/root/testdata/sf0.001"
    val cells0 = SparkEntry.queries("q_kmeans_assign")(spark, dir0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixDir = "/tmp/graft_nmi_fixture"
    Tables(spark, dir0, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), cells0(r.getLong(0)).toInt))
      .toSeq.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$fixDir/embeddings.parquet")
    val perfect = SparkEntry.queries("q_cluster_nmi")(spark, fixDir).collect()
      .map(r => (r.getDouble(3), r.getDouble(4)))
    assert(perfect.forall(_._1 == 1.0), "purity below 1 on the cell-relabeled fixture")
    assert(perfect.forall(_._2 == 1.0), "NMI below 1 on the cell-relabeled fixture")
  }

  test("q_cell_labels: sequential lift recount; every cell labeled; labels are not stopwords-only") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val cells = SparkEntry.queries("q_kmeans_assign")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val toks = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .flatMap(r => r.getString(1).split(" ").map(t => (cells(r.getLong(0)), t)))
      val n = toks.length.toLong
      val ct = toks.groupBy(identity).map { case ((c, t), xs) => (c, t, xs.length.toLong) }
      val nC = ct.groupBy(_._1).map { case (c, v) => c -> v.map(_._3).sum }
      val cT = ct.groupBy(_._2).map { case (t, v) => t -> v.map(_._3).sum }
      val expected = ct.filter(_._3 >= Clustering.cellLabelMinCount)
        .map { case (c, t, cnt) =>
          val lift = (BigInt(20000) * cnt * n + BigInt(nC(c)) * cT(t)) /
            (BigInt(nC(c)) * cT(t) * 2)
          (c, t, cnt, lift.toLong)
        }
        .groupBy(_._1).toSeq.flatMap { case (c, rows) =>
          rows.toSeq.sortBy(r => (-r._4, -r._3, r._2)).take(3).zipWithIndex
            .map { case ((_, t, cnt, l4), i) =>
              (c, (i + 1).toLong, t, cnt, l4 / 10000.0) }
        }.sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_cell_labels")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      assert(got.toSeq === expected, s"label recount diverges at $dir")
      // every cell gets its three labels, each genuinely over-represented
      assert(got.map(_._1).distinct.length == Clustering.centroidK,
        s"a cell went unlabeled at $dir")
      assert(got.forall(_._5 > 1.0),
        s"a label with lift <= 1 at $dir — the ranking favors corpus glue")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the batch-assembly operators (SURVEY §2.5 X30/X31)
  * beyond the DuckDB hash gate: the packed layout must be a real
  * concat-and-chunk stream (recounted by independent driver-side
  * arithmetic), and the split must be a deterministic partition with
  * dense per-split shuffle positions.
  *
  * The SCALE claim — two-pass range-partitioned prefix sum/rank ≡ the
  * textbook single-window form — is pinned by the oracle itself: the
  * Spark side runs the distributed plan, the DuckDB side runs the
  * single window, and the hash gate compares them on every verify.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.01"

  test("packing matches an independent sequential recount of the shuffled token stream") {
    // recompute the concat-and-chunk layout with a plain driver-side
    // fold over (order key, tok) — no window functions, no prefix-sum
    // machinery — and require bit-identical bins/offsets/flags
    val got = SparkEntry.queries("q_pack_chunks")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    import org.apache.spark.sql.functions._
    val stream = Tables(spark, sf, "documents")
      .select(
        col("doc_id"),
        md5(concat(lit("pack"), col("doc_id").cast("string"))).as("k"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val budget = 512L
    var cum = 0L
    stream.foreach { case (_, id, tok) =>
      val (bin, off, gTok, crosses) = got(id)
      assert(bin === cum / budget, s"doc $id bin")
      assert(off === cum % budget, s"doc $id offset")
      assert(gTok === tok, s"doc $id tok")
      assert(crosses === (if ((cum + tok - 1) / budget > cum / budget) 1L else 0L), s"doc $id crosses")
      cum += tok
    }
    // layout sanity: no window is skipped — with every doc shorter
    // than the budget (true of this corpus; asserted so drift fails
    // loudly), some doc starts in every window except possibly the
    // final one, which a straddler from the previous window may fill
    // entirely on its own
    assert(stream.map(_._3).max < budget)
    val bins = got.values.map(_._1).toSet
    assert(bins.max >= (cum - 1) / budget - 1)
    assert(bins === (0L to bins.max).toSet, "a context window has no starting doc")
  }

  test("prefixSumByRange equals a sequential fold on randomized data, empty partitions included") {
    // the corpus oracle pins the helper on real token counts only;
    // this covers the general contract — negatives, zeros, and far
    // more partitions than rows (so most range partitions are empty)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    Seq(1, 7, 200).foreach { n =>
      val rows = (1L to n.toLong).map(i => (s"k${rnd.nextInt(1000000)}%06d-$i", rnd.nextInt(2001) - 500L))
      val df = rows.toDF("k", "v")
      val got = graft.operators.Packing.prefixSumByRange(df, Seq("k"), "v", "p")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      var cum = 0L
      rows.sortBy(_._1).foreach { case (k, v) =>
        assert(got(k) === cum, s"n=$n key $k prefix")
        cum += v
      }
    }
  }

  test("split is a 90/5/5 hash partition with dense per-split positions") {
    val rows = SparkEntry.queries("q_split_hash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length === rows.length, "split dropped or duplicated docs")
    val bySplit = rows.groupBy(_._2)
    assert(bySplit.keySet === Set("train", "val", "test"))
    // exact sizes are hash-determined; the gate is the rate contract
    // (±5 pp of 90/5/5 at n=500), not a seed-dependent constant
    val n = rows.length.toDouble
    assert(math.abs(bySplit("train").length / n - 0.90) < 0.05)
    assert(math.abs(bySplit("val").length / n - 0.05) < 0.05)
    assert(math.abs(bySplit("test").length / n - 0.05) < 0.05)
    // positions are a dense 1..n permutation within each split — the
    // contract an epoch-sharding dataloader actually needs
    bySplit.foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length.toLong), s"split $s positions not dense")
    }
  }

  test("the shuffle order is independent of the split assignment's hash") {
    // two salts: within each split, position order must NOT replay
    // doc_id order or the split hash's order — check rank correlation
    // of pos vs doc_id is far from ±1 on the big split
    val train = SparkEntry.queries("q_split_hash")(spark, sf)
      .filter("split = 'train'")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .sortBy(_._1)
    val n = train.length.toLong
    val posByIdRank = train.map(_._2)
    // Spearman rho of (doc_id rank, pos): both are 1..n permutations
    val d2 = posByIdRank.zipWithIndex.map { case (p, i) => val d = p - (i + 1L); d * d }.sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    assert(math.abs(rho) < 0.2, s"shuffle order correlates with doc order: rho=$rho")
  }

  test("q_pack_efficiency equals a sequential concat-and-chunk recount at every candidate length") {
    def md5Hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents").select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
        .sortBy { case (id, _) => (md5Hex(s"pack$id"), id) }
      val toks = docs.map(_._2)
      val cums = toks.scanLeft(0L)(_ + _).dropRight(1)
      val total = toks.sum
      val nd = docs.length.toLong
      val expected = graft.operators.Packing.ctxCandidates.map { c =>
        val nc = toks.zip(cums).count { case (tok, cb) => (cb + tok - 1) / c > cb / c }.toLong
        val bins = (total + c - 1) / c
        c -> ((nd, total, bins, bins * c - total, nc,
          ((20000L * nc + nd) / (2L * nd)) / 10000.0))
      }.toMap
      val got = SparkEntry.queries("q_pack_efficiency")(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
      assert(got === expected, s"pack-efficiency recount diverges at $dir")
      // the report is non-degenerate: some doc crosses at the smallest
      // candidate, and waste is always bounded by the context length
      assert(got(graft.operators.Packing.ctxCandidates.head)._5 > 0)
      got.foreach { case (c, (_, _, _, waste, _, _)) => assert(waste >= 0 && waste < c) }
    }
  }

  test("q_compact_plan equals a sequential greedy bin-pack per source; multi-file sources exist") {
    import org.apache.spark.sql.functions._
    val target = graft.operators.Packing.targetFileBytes
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("source"), col("doc_id"), length(col("text")).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // driver-side greedy replay: per source in doc_id order, cut at
      // the byte target off the exclusive prefix
      val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, id, bytes) =>
          val f = cum / target; cum += bytes
          ((src, f), (id, bytes))
        }.groupBy(_._1).map { case (k, xs) =>
          k -> (xs.length.toLong, xs.map(_._2._2).sum,
            xs.map(_._2._1).min, xs.map(_._2._1).max)
        }
      }
      val got = SparkEntry.queries("q_compact_plan")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(got === expected, s"compaction plan diverges from the greedy replay at $dir")
      // conservation: planned bytes == corpus bytes, no doc lost
      assert(got.values.map(_._2).sum === docs.map(_._3).sum, s"byte leak at $dir")
      assert(got.values.map(_._1).sum === docs.length.toLong, s"doc leak at $dir")
    }
    // the operator's reason to exist fires at sf0.01: sources larger
    // than one target file get split, and every non-final file is
    // near-full (short by at most one straddling document)
    val at01 = SparkEntry.queries("q_compact_plan")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val bySrc = at01.groupBy(_._1)
    assert(bySrc.exists(_._2.length > 1), "no source split into several files — target too big")
    val maxDoc = Tables(spark, "/root/testdata/sf0.01", "documents")
      .agg(max(length(col("text")).cast("long"))).head().getLong(0)
    bySrc.foreach { case (src, fs) =>
      fs.sortBy(_._2).dropRight(1).foreach { case (_, seq, bytes) =>
        assert(bytes > target - maxDoc,
          s"$src file $seq holds $bytes bytes — greedy cut drifted from the target")
      }
    }
  }

  test("q_zorder equals a sequential interleave recount and out-prunes the id-ordered layout") {
    import org.apache.spark.sql.functions._
    val F = graft.operators.Packing.zorderFiles.toInt
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Tables(spark, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val (u0, u1) = (rows.map(_._2).min, rows.map(_._2).max)
      val (t0, t1) = (rows.map(_._3).min, rows.map(_._3).max)
      val n = rows.length.toLong
      def interleave(a: Long, b: Long): Long =
        (0 until 8).map { i =>
          ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
        }.sum
      val coords = rows.map { case (id, u, us) =>
        val ub = (u - u0) * 256 / (u1 - u0 + 1)
        val tb = (us - t0) * 256 / (t1 - t0 + 1)
        (id, ub, tb, interleave(ub, tb))
      }
      // sequential replay of the declared layout
      val zFiles = coords.sortBy(c => (c._4, c._1)).zipWithIndex
        .map { case ((_, ub, tb, _), i) => (i.toLong * F / n, ub, tb) }
        .groupBy(_._1).map { case (f, xs) =>
          f -> (xs.length.toLong,
            xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).min, xs.map(_._3).max)
        }
      val got = SparkEntry.queries("q_zorder")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(got === zFiles, s"z-order stats diverge from the sequential replay at $dir")
      // the skipping claim, measured: for a point predicate on ONE
      // dimension, how many of the F files does the min/max rectangle
      // force open, averaged over the dimension's occupied values?
      // The id-ordered (≈ time-ordered) layout prunes time perfectly
      // and users not at all; Z-order must beat it on the WORST
      // dimension — that trade is the whole reason the operator exists.
      def avgOpen(files: Iterable[(Long, Long)], probes: Seq[Long]): Double =
        probes.map(v => files.count { case (lo, hi) => lo <= v && v <= hi }).sum
          .toDouble / probes.length
      def worst(stats: Iterable[(Long, Long, Long, Long, Long)]): Double = {
        val uProbes = coords.map(_._2).distinct.toSeq
        val tProbes = coords.map(_._3).distinct.toSeq
        math.max(
          avgOpen(stats.map(s => (s._2, s._3)), uProbes),
          avgOpen(stats.map(s => (s._4, s._5)), tProbes))
      }
      val idFiles = coords.sortBy(_._1).zipWithIndex
        .map { case ((_, ub, tb, _), i) => (i.toLong * F / n, ub, tb) }
        .groupBy(_._1).map { case (_, xs) =>
          (xs.length.toLong,
            xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).min, xs.map(_._3).max)
        }
      val (zWorst, idWorst) = (worst(got.values), worst(idFiles))
      assert(zWorst < 0.7 * idWorst,
        s"z-order worst-dimension pruning ($zWorst files) does not clearly beat " +
          s"the id-ordered layout ($idWorst files) at $dir")
    }
  }

  test("q_bin_provenance: sequential rollup off the declared packing; dominance verdict exact") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bins = SparkEntry.queries("q_pack_chunks")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val src = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = bins.groupBy(_._2).map { case (bin, ds) =>
        val bySrc = ds.keys.toSeq.map(src).groupBy(identity).map { case (s0, xs) => s0 -> xs.size.toLong }
        val n = bySrc.values.sum
        val (topSrc, topC) = bySrc.maxBy { case (s0, c) => (c, s0) }
        bin -> (n, bySrc.size.toLong, topSrc, ((20000L * topC + n) / (2 * n)).toDouble / 10000.0)
      }
      val worst = expected.values.map(_._4).max
      val got = SparkEntry.queries("q_bin_provenance")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getDouble(5)))
      assert(got.map(g => g._1 -> ((g._2._1, g._2._2, g._2._3, g._2._4))).toMap === expected,
        s"bin provenance diverges from the sequential rollup at $dir")
      assert(got.forall(_._2._5 == worst), s"worst-dominance verdict wrong at $dir")
      assert(got.map(_._2._1).sum === bins.size.toLong, s"doc leak at $dir")
      // the audit is non-degenerate: bins genuinely mix sources, and
      // dominance varies across bins (a constant column would mean
      // the shuffle or the rollup is broken)
      assert(got.forall(_._2._2 > 1), s"single-source bin at $dir — shuffle broken?")
      assert(got.map(_._2._4).distinct.length > 1, s"dominance constant across bins at $dir")
    }
  }

  test("the z-order layout, written for real, serves a point predicate from stats-pruned files") {
    // X92's claim made physical (the X7/X34 partition-pin precedent):
    // materialize the 16 planned files as a file_id-partitioned
    // parquet layout, prune with the DECLARED stats table the way a
    // manifest-driven reader (Delta/Iceberg) does — files whose
    // [min,max] rectangle misses the predicate are never opened —
    // and read the scan's own partition metric to prove it.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val F = graft.operators.Packing.zorderFiles
    val stats = SparkEntry.queries("q_zorder")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // rebuild the per-event assignment exactly as the spec above did
    val rows = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (u0, u1) = (rows.map(_._2).min, rows.map(_._2).max)
    val (t0, t1) = (rows.map(_._3).min, rows.map(_._3).max)
    val n = rows.length.toLong
    def interleave(a: Long, b: Long): Long =
      (0 until 8).map { i =>
        ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }.sum
    val assign = rows.map { case (id, u, us) =>
      val ub = (u - u0) * 256 / (u1 - u0 + 1)
      (id, ub, interleave(ub, (us - t0) * 256 / (t1 - t0 + 1)))
    }.sortBy(c => (c._3, c._1)).zipWithIndex
      .map { case ((id, ub, _), i) => (id, ub, i.toLong * F / n) }
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_layout").toString
    try {
      import spark.implicits._
      assign.map { case (id, ub, f) => (id, ub, f) }.toSeq
        .toDF("event_id", "ub", "file_id")
        .write.mode("overwrite").partitionBy("file_id").parquet(tmp)
      val layout = spark.read.parquet(tmp)
      // a point predicate on the WEAK dimension of a time-ordered
      // table: one user bucket; candidate files from the stats alone
      val probeUb = assign.map(_._2).groupBy(identity).maxBy(_._2.length)._1
      val cand = stats.filter { case (_, lo, hi, _, _) => lo <= probeUb && probeUb <= hi }
        .map(_._1)
      assert(cand.nonEmpty && cand.length < F,
        s"stats prune nothing for ub=$probeUb (${cand.length} of $F files) — pin vacuous")
      def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        val scan = df.queryExecution.executedPlan.collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scan.nonEmpty, "no FileSourceScanExec in the probe plan")
        scan.get.metrics("numPartitions").value
      }
      val probe = layout.filter(col("file_id").isin(cand: _*) && col("ub") === probeUb)
      assert(partitionsRead(probe) === cand.length.toLong,
        "probe opened files outside the stats-pruned candidate set")
      assert(partitionsRead(spark.read.parquet(tmp)) === F)
      // and pruning loses nothing: the pruned read returns every
      // matching event (the stats candidates COVER the predicate)
      val full = layout.filter(col("ub") === probeUb).count()
      assert(probe.count() === full && full > 0,
        s"stats-pruned read dropped rows ($full matching events)")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("X164 zone-map skip, made physical: files-read == n_files - files_skipped on both layouts") {
    // VERDICT r19 #5: q_zonemap_skip models zone-map pruning
    // arithmetically — give it the X7/X34/X92 physical treatment.
    // Materialize BOTH audited layouts (natural event_id order and the
    // Z-order sort) as file_id-partitioned parquet, prune with a real
    // two-step zone-map read (stats first, then a partition-pruned
    // scan of the surviving files — how Delta/Iceberg/external zone
    // maps actually read), and pin the scan's own partition metric to
    // the DECLARED audit's n_files − files_skipped for every predicate
    // in the battery, plus soundness: the pruned read returns exactly
    // the audit's rows_matching.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val F = graft.operators.Packing.zorderFiles.toInt
    val audit = SparkEntry.queries("q_zonemap_skip")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(6)))).toMap
    val rows = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (u0, u1) = (rows.map(_._2).min, rows.map(_._2).max)
    val (t0, t1) = (rows.map(_._3).min, rows.map(_._3).max)
    val n = rows.length.toLong
    def interleave(a: Long, b: Long): Long =
      (0 until 8).map { i =>
        ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }.sum
    val bucketed = rows.map { case (id, u, us) =>
      val ub = (u - u0) * 256 / (u1 - u0 + 1)
      val tb = (us - t0) * 256 / (t1 - t0 + 1)
      (id, ub, tb, interleave(ub, tb))
    }
    def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scan = df.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.nonEmpty, "no FileSourceScanExec in the probe plan")
      scan.get.metrics("numPartitions").value
    }
    import spark.implicits._
    for ((layout, key) <- Seq[(String, ((Long, Long, Long, Long)) => (Long, Long))](
        "natural" -> (r => (0L, r._1)),
        "zorder" -> (r => (r._4, r._1)))) {
      val assign = bucketed.sortBy(key).zipWithIndex
        .map { case ((id, ub, tb, _), i) => (id, ub, tb, i.toLong * F / n) }
      val zones = assign.groupBy(_._4).map { case (f, rs) =>
        f -> ((rs.map(_._2).min, rs.map(_._2).max, rs.map(_._3).min, rs.map(_._3).max))
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_zonemap_$layout").toString
      try {
        assign.toSeq.toDF("event_id", "ub", "tb", "file_id")
          .write.mode("overwrite").partitionBy("file_id").parquet(tmp)
        val lay = spark.read.parquet(tmp)
        assert(partitionsRead(lay) === F.toLong)
        for ((pname, ul, uh, tl, th) <- graft.operators.Packing.zonePreds) {
          val survivors = zones.filter { case (_, (ub0, ub1, tb0, tb1)) =>
            !(ub1 < ul || ub0 > uh || tb1 < tl || tb0 > th)
          }.keys.toSeq
          val (nFiles, skipped, matching) = audit((layout, pname))
          assert(nFiles === F.toLong)
          assert(survivors.length.toLong === nFiles - skipped,
            s"$layout/$pname: physical survivor set ${survivors.length} != " +
              s"audit n_files - files_skipped = ${nFiles - skipped}")
          val pred = col("ub").between(ul, uh) && col("tb").between(tl, th)
          val probe = lay.filter(col("file_id").isin(survivors: _*) && pred)
          assert(partitionsRead(probe) === survivors.length.toLong,
            s"$layout/$pname: scan opened files outside the zone-map survivor set")
          // soundness: skipping loses nothing — the pruned read holds
          // every matching row, and exactly the audit's count of them
          assert(probe.count() === lay.filter(pred).count())
          assert(probe.count() === matching, s"$layout/$pname: matching-row audit diverges")
        }
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }
    // the headline claims stay pinned: Z-order prunes the 2-D cell
    // strictly harder than natural, and natural prunes nothing on the
    // user slice while Z-order does
    assert(audit(("zorder", "user_slice"))._2 > 0L && audit(("natural", "user_slice"))._2 === 0L)
  }

  test("q_batch_plan: sequential replay at two SFs; bucketing beats naive batching") {
    import org.apache.spark.sql.functions._
    val B = 16
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val toks = Tables(SparkFixture.spark, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      def bucketOf(t: Long) = if (t < 32) 0L else if (t < 64) 1L else if (t < 128) 2L else 3L
      def batches(rows: Seq[Long]): Seq[(Long, Long, Long)] =
        rows.grouped(B).map(g => (g.length.toLong, g.max, g.sum)).toSeq
      val perBatch = toks.groupBy(t => bucketOf(t._2)).toSeq.flatMap { case (b, rows) =>
        batches(rows.sortBy(r => (r._2, r._1)).map(_._2)).zipWithIndex.map {
          case ((n, mx, sm), i) => (b, i.toLong, n, mx, sm, n * mx - sm)
        }
      }.sortBy(r => (r._1, r._2))
      val padBucketed = perBatch.map(_._6).sum
      val padNaive = batches(toks.sortBy(_._1).map(_._2)).map { case (n, mx, sm) => n * mx - sm }.sum
      val expected = perBatch.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, padBucketed, padNaive))
      val got = SparkEntry.queries("q_batch_plan")(SparkFixture.spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      assert(got.toSeq === expected, s"batch-plan replay diverges at $dir")
      // conservation: every doc is in exactly one batch
      assert(got.map(_._3).sum == toks.length.toLong, s"doc count not conserved at $dir")
      // every batch except possibly each bucket's last is full
      got.groupBy(_._1).foreach { case (b, rows) =>
        val maxBatch = rows.map(_._2).max
        rows.filter(_._2 < maxBatch).foreach(r =>
          assert(r._3 == B.toLong, s"non-final batch ($b, ${r._2}) underfull at $dir"))
      }
      // the operator's reason to exist, measured: bucketed padding
      // strictly beats naive arrival-order batching on this corpus
      assert(padBucketed < padNaive,
        s"bucketing does not beat naive batching at $dir ($padBucketed vs $padNaive)")
    }
  }

  test("q_batch_plan runs two reused range machines; verdicts broadcast, never windowed over bins") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_batch_plan")(SparkFixture.spark, "/root/testdata/sf0.01")
    df.collect() // AQE finalizes stage reuse
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val live = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && l.contains("REPARTITION_BY_NUM")
        && !l.contains("ReusedExchange"))
    assert(live === 2,
      s"batch-plan executes $live sampled range exchanges, expected 2 (one per machine):\n$plan")
    val reused = plan.linesIterator.filter(l =>
      l.contains("ReusedExchange") && l.contains("rangepartitioning")).toSeq
    assert(reused.size >= 2,
      s"a range machine lost branch reuse (${reused.size} reused):\n$plan")
    // the verdict totals must be broadcast joins, not single-partition
    // windows over the corpus-proportional batch table (the range
    // machines' own __pid-partitioned windows are the legal ones)
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q_batch_plan")(SparkFixture.spark, "/root/testdata/sf0.01")
      .queryExecution
    val empty = qe.optimizedPlan.collect { case w: logical.Window => w }
      .filter(_.partitionSpec.isEmpty)
    // rankedByRange's offsets prefix window partitions by the group;
    // the constant-group naive machine makes that partitionSpec a
    // literal, which Catalyst folds to empty — but its input is the
    // ≤|partitions|-row offsets aggregate, which is the allowed shape
    empty.foreach { w =>
      assert(w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty,
        s"batch-plan windows the corpus-proportional bin table:\n$w")
    }
  }

  test("q_split_balance: sequential KS + deviation recount; train hugs the corpus") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          graft.operators.Packing.splitOf(col("doc_id")).as("split"),
          col("n_chars").cast("long"), col("source")).collect()
        .map(r => (r.getString(1), r.getLong(2), r.getString(3)))
      val n = docs.length.toLong
      val expected = docs.groupBy(_._1).toSeq.map { case (split, ds) =>
        val ns = ds.length.toLong
        // KS: sup over observed lengths of |ECDF_s - ECDF_all|, both
        // sides of each step (the left-limit argument)
        val lens = docs.map(_._2).distinct.sorted
        val ksNum = lens.map { v =>
          val cs = ds.count(_._2 <= v).toLong
          val csm = ds.count(_._2 < v).toLong
          val ca = docs.count(_._2 <= v).toLong
          val cam = docs.count(_._2 < v).toLong
          math.max(math.abs(cs * n - ca * ns), math.abs(csm * n - cam * ns))
        }.max
        val ks = (BigInt(ksNum) * 20000 + BigInt(ns) * n) / (BigInt(ns) * n * 2)
        val dev = docs.map(_._3).distinct.map { src =>
          val csk = ds.count(_._3 == src).toLong
          val ck = docs.count(_._3 == src).toLong
          (BigInt(math.abs(csk * n - ck * ns)) * 20000 + BigInt(ns) * n) /
            (BigInt(ns) * n * 2)
        }.max
        (split, ns, ks.toLong / 10000.0, dev.toLong / 10000.0)
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_split_balance")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(got.toSeq === expected, s"balance recount diverges at $dir")
      assert(got.map(_._2).sum == n, s"split sizes don't cover the corpus at $dir")
      // the 90% slice is nearly the corpus — its KS must undercut both
      // small slices (a failure here means the salt realized a freak
      // draw, which is exactly what the audit exists to surface)
      val byName = got.map(g => g._1 -> g._3).toMap
      assert(byName("train") < byName("val") && byName("train") < byName("test"),
        s"train KS not the smallest at $dir: $byName")
      got.foreach { case (sp, _, ks, dev) =>
        assert(ks >= 0 && ks <= 1 && dev >= 0 && dev <= 1, s"stat out of [0,1] for $sp at $dir")
      }
    }
  }

  test("q_pack_split_audit: recount off the declared pack; corpus-wide fires, per-split pack clean") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // ground truth off the oracle-green X30 layout + the pure split fn
      val assigned = SparkEntry.queries("q_pack_chunks")(spark, dir)
        .select(col("doc_id"), col("bin"),
          graft.operators.Packing.splitOf(col("doc_id")).as("split"))
        .collect().map(r => (r.getLong(1), r.getString(2)))
      val byBin = assigned.groupBy(_._1)
      val nBins = byBin.size.toLong
      val nStraddle = byBin.values.count(_.map(_._2).distinct.length > 1).toLong
      val share = ((20000 * nStraddle + nBins) / (2 * nBins)) / 10000.0
      val expected = byBin.toSeq.sortBy(_._1).map { case (b, rows) =>
        val ns = rows.map(_._2).distinct.length.toLong
        (b, rows.length.toLong, ns, if (ns > 1) 1L else 0L, nBins, share)
      }
      val got = SparkEntry.queries("q_pack_split_audit")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
      assert(got.toSeq === expected, s"audit recount diverges at $dir")
      // the corpus-wide pack MUST fire (that is the misconfiguration
      // it detects) — and not everywhere (single-split bins exist)
      assert(got.exists(_._4 == 1L), s"no straddling bin at $dir — audit vacuous")
      assert(got.exists(_._4 == 0L), s"every bin straddles at $dir")
    }
    // the clean state: packing ONE split through the same machinery
    // yields zero straddle everywhere — the per-split pack the audit
    // certifies a production loader against
    val trainOnly = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(graft.operators.Packing.splitOf(col("doc_id")) === "train")
    val clean = graft.operators.Packing.packSplitAuditFrom(trainOnly).collect()
    assert(clean.nonEmpty && clean.forall(_.getLong(3) == 0L),
      "a single-split pack reported straddling bins")
  }

  test("q_zonemap_skip: sequential recount; skipping is sound; zorder beats natural where it should") {
    // X164's certificate: rebuild buckets, z-values, both layouts'
    // file assignments, zones and skip verdicts sequentially; then
    // the two qualitative claims — (a) SOUNDNESS: skipped rows never
    // include a matching row (recounted per file), (b) the layout
    // story: natural prunes nothing on the pure user slice while
    // zorder does, and zorder is at least as good on the 2-D cell.
    import org.apache.spark.sql.functions._
    val pk = graft.operators.Packing
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables(spark, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val (u0, u1) = (ev.map(_._2).min, ev.map(_._2).max)
      val (t0, t1) = (ev.map(_._3).min, ev.map(_._3).max)
      val n = ev.length.toLong
      def interleave(a: Long, b: Long): Long =
        (0 until 8).map { i => (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1)) }.sum
      val rows = ev.map { case (id, u, t) =>
        val ub = (u - u0) * 256 / (u1 - u0 + 1)
        val tb = (t - t0) * 256 / (t1 - t0 + 1)
        (id, ub, tb, interleave(ub, tb))
      }
      val layouts = Map(
        "natural" -> rows.sortBy(_._1),
        "zorder" -> rows.sortBy(r => (r._4, r._1)))
      val want = (for {
        (layout, ordered) <- layouts.toSeq
        files = ordered.zipWithIndex
          .map { case (r, i) => (i.toLong * pk.zorderFiles / n, r) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        (pred, ul, uh, tl, th) <- pk.zonePreds
      } yield {
        val zones = files.map { case (f, rs) =>
          (f, rs.size.toLong, rs.map(_._2).min, rs.map(_._2).max,
            rs.map(_._3).min, rs.map(_._3).max, rs)
        }
        val skipped = zones.filter { case (_, _, ub0, ub1, tb0, tb1, _) =>
          ub1 < ul || ub0 > uh || tb1 < tl || tb0 > th }
        // SOUNDNESS: no skipped file contains a matching row
        skipped.foreach { case (f, _, _, _, _, _, rs) =>
          assert(!rs.exists(r => r._2 >= ul && r._2 <= uh && r._3 >= tl && r._3 <= th),
            s"$layout/$pred skipped file $f holds a matching row at $dir")
        }
        val rowsSkipped = skipped.map(_._2).sum
        val matching = rows.count(r => r._2 >= ul && r._2 <= uh && r._3 >= tl && r._3 <= th).toLong
        (layout, pred) -> ((files.size.toLong, skipped.size.toLong, n, rowsSkipped,
          matching, ((20000L * rowsSkipped + n) / (2L * n)) / 10000.0))
      }).toMap
      val got = SparkEntry.queries("q_zonemap_skip")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
      assert(got === want, s"zonemap recount diverges at $dir")
      // the layout story the operator exists to quantify
      assert(got(("natural", "user_slice"))._2 === 0L,
        s"natural layout should prune nothing on a pure user slice at $dir")
      assert(got(("zorder", "user_slice"))._2 > 0L,
        s"zorder should prune the user slice at $dir")
      assert(got(("zorder", "cell"))._2 >= got(("natural", "cell"))._2,
        s"zorder should prune the 2-D cell at least as well at $dir")
    }
  }
}

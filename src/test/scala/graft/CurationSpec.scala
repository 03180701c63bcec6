package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the corpus-curation operators (SURVEY §2.5 X15/X16)
  * beyond the DuckDB hash gate: decontamination must catch every
  * planted contaminated doc, and the deterministic sample must be
  * exactly reproducible — including under repartitioning, which is
  * precisely what rand()-based sampling cannot promise.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.01"

  test("decontamination flags every planted benchmark copy, with positive evidence") {
    val rows = SparkEntry.queries("q_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every synthesized contaminated doc (drop-first-word copy of a
    // benchmark doc, id + 300000) shares all its surviving 8-grams
    // with the original and MUST be flagged
    val planted = (0L until 500L by 50L).map(_ + 300000L)
    planted.foreach { id =>
      assert(rows.contains(id), s"planted contaminated doc $id not flagged")
    }
    assert(rows.values.forall(_ > 0), "flagged doc with zero shared grams")
    // flagging is evidence-based, not set-membership: a flagged
    // NATURAL training doc (if any) is fine, but the bulk of the
    // corpus must not be flagged — 8-grams of random text don't collide
    assert(rows.size < 30, s"decontamination flagged ${rows.size} docs — threshold too weak")
  }

  test("decontamination streams the corpus grams into a broadcast join, never a corpus-wide shuffle") {
    // r10: the pre-join `distinct` shuffled the ENTIRE training gram
    // stream just to drop repeats the join would discard anyway. The
    // only hash exchanges allowed are the (small) benchmark-side gram
    // distinct and the post-join countDistinct pair — the train side
    // must feed the broadcast join straight from its explode.
    val plan = SparkEntry.queries("q_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark gram set is not broadcast — the join would shuffle the corpus")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges <= 3,
      s"decontaminate plans $hashExchanges hash exchanges — a corpus-wide gram shuffle is back:\n$plan")
  }

  test("PII redaction flags exactly the planted addresses and masks them from the hash") {
    val rows = SparkEntry.queries("q_pii_redact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every planted doc (id % 20 == 0) carries exactly its one planted
    // address; the rest of the corpus has none
    rows.foreach { case (id, n, _) =>
      assert(n === (if (id % 20 == 0) 1L else 0L),
        s"doc $id reports $n emails")
    }
    // the redacted hash is not the hash of the raw text for planted
    // docs (the mask really changed the bytes)
    val raw = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions.col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_._1 % 20 == 0).foreach { case (id, _, h) =>
      assert(h !== raw(id), s"planted doc $id hash unchanged — mask did not fire")
    }
  }

  test("stratified sample is deterministic, rate-correct, and repartition-stable") {
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val s1 = sample(SparkEntry.queries("q_sample_stratified")(spark, sf))
    val s2 = sample(SparkEntry.queries("q_sample_stratified")(spark, sf))
    assert(s1 === s2, "sample is not run-to-run deterministic")
    assert(s1.nonEmpty)
    // the per-stratum rate is enforced exactly
    s1.foreach { case (id, lang, u) =>
      assert(u >= 0 && u < (if (lang == "en") 20 else 5),
        s"doc $id ($lang) kept with uniform $u outside its stratum rate")
    }
    // both strata are represented (the sample is genuinely stratified)
    assert(s1.exists(_._2 == "en") && s1.exists(_._2 != "en"))
    // the keep decision is a function of doc_id alone — repartitioning
    // the input cannot change the sample (the auditability property
    // rand()-based sampling lacks)
    val repart = Tables(spark, sf, "documents").repartition(17)
      .select(
        col("doc_id"), col("lang"),
        (graft.operators.Hashing.h32(concat(lit("smpl"), col("doc_id"))) % 100).as("u"))
      .filter(col("u") < when(col("lang") === "en", 20).otherwise(5))
      .select(col("doc_id"), col("lang"), col("u").cast("long").as("u"))
      .orderBy("doc_id")
    assert(sample(repart) === s1, "sample changed under repartitioning")
  }

  test("q_decontam_report: recount at two SFs; burned/unburned/untouched branches on a fixture") {
    // Corpus pass: every declared cell recounted sequentially from
    // raw text (distinct 8-gram sets per doc, X15's planted train
    // corpus), and the shipped plant burns the whole suite — the
    // expected worst-case read (suite_burned_share 1.0).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = Tables(spark, dir, "documents")
        .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
      def gset(t: String): Set[String] =
        t.split(" ", -1).sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
      val bench = d.filter(_._1 % 50 == 0)
      val train = d.filter(_._1 % 50 != 0) ++
        bench.map { case (id, t) => (id + 300000, t.split(" ", -1).drop(1).mkString(" ")) }
      val tsets = train.map { case (id, t) => id -> gset(t) }.filter(_._2.nonEmpty)
      val expected = bench.map { case (bid, bt) =>
        val bg = gset(bt)
        val shared = tsets.map { case (_, tg) => (tg intersect bg).size }.filter(_ > 0)
        val burned = if (shared.nonEmpty && 2 * shared.max > bg.size) 1L else 0L
        (bid, bg.size.toLong, shared.size.toLong,
          (if (shared.isEmpty) 0 else shared.max).toLong, burned)
      }.sortBy(_._1)
      val nb = expected.map(_._5).sum; val ni = expected.size
      val share = ((20000L * nb + ni) / (2L * ni)) / 10000.0
      val got = SparkEntry.queries("q_decontam_report")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSeq
      assert(got === expected.map(e => (e._1, e._2, e._3, e._4, e._5, share)),
        s"decontam report recount diverges at $dir")
      assert(share === 1.0, s"the X15 plant must burn the whole suite at $dir")
    }
    // Fixture: the branches the plant can't show — an item whose worst
    // offender is under half (not burned), and an untouched item.
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val b1 = words("a", 20) // will be half-copied (11 tokens -> 4 of 13 grams)
    val b2 = words("b", 20) // untouched
    val b3 = words("c", 20) // fully copied -> burned
    val benchDf = Seq((1L, b1), (2L, b2), (3L, b3)).toDF("doc_id", "text")
    val trainDf = Seq(
      (10L, words("a", 11) + " " + words("x", 30)), // shares grams a0..a3-led = 4 of b1's 13
      (11L, b3),                                    // verbatim copy of b3
      (12L, words("z", 40))).toDF("doc_id", "text")
    val got = graft.operators.Curation.decontamReportOf(benchDf, trainDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    val want = Seq(
      (1L, 13L, 1L, 4L, 0L, 0.3333), // touched, under half -> NOT burned
      (2L, 13L, 0L, 0L, 0L, 0.3333), // untouched
      (3L, 13L, 1L, 13L, 1L, 0.3333)) // verbatim -> burned
    assert(got === want, s"fixture branches wrong: ${got.mkString(", ")}")
  }

  test("q_mix_temperature: recount per (T, lang), T=1 baseline, T=2 == q_mix_weights, flattening monotone") {
    // X151's four certificates: (1) every cell matches a driver-side
    // recompute with the identical iterated-sqrt composition in the
    // same lang-ordered accumulation, and every quotient sits far
    // from its round-4 boundary (the X25 float argument, swept);
    // (2) the T=1 rows are the natural distribution (weight = share,
    // epochs = 1); (3) the T=2 weights equal the declared X25 query;
    // (4) flattening is monotone — weight spread shrinks and worst
    // epochs grow as T rises.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("q_mix_temperature")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSeq
      val counts = got.filter(_._1 == 1L).map(r => r._2 -> r._3).sortBy(_._1)
      val want = graft.operators.Curation.mixTemperatures.flatMap { t =>
        def p(n: Long): Double = t match {
          case 1 => n.toDouble
          case 2 => math.sqrt(n.toDouble)
          case 4 => math.sqrt(math.sqrt(n.toDouble))
          case _ => math.sqrt(math.sqrt(math.sqrt(n.toDouble)))
        }
        val sp = counts.map(c => p(c._2)).sum // lang-ordered accumulation
        val nn = counts.map(_._2).sum
        def r4(x: Double): Double =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val rows = counts.map { case (lang, n) =>
          val w = p(n) / sp
          val e = p(n) * nn / (sp * n)
          for (exact <- Seq(w, e)) {
            // Unlike X25 (whose measured corpus headroom was 7e-6 and
            // asserted as such), the sweep's tightest cells sit ~1e-8
            // off a boundary (T=8 en epochs at sf0.001: 0.56764998).
            // That is still SAFE — the ordered window + identical
            // sqrt/division composition make the pre-round double
            // bit-identical in both engines, so only a quotient
            // landing EXACTLY on .5 at double precision could split
            // HALF_UP vs round-half-away. Assert exactly that.
            val frac = (exact * 10000) % 1
            assert(frac != 0.5,
              s"T=$t $lang quotient $exact lands exactly on a round-4 boundary at $dir")
          }
          (t.toLong, lang, n, r4(w), r4(e))
        }
        val mx = rows.map(_._5).max
        rows.map { case (t, l, n, w, e) => (t, l, n, w, e, mx) }
      }
      assert(got === want, s"temperature-sweep recount diverges at $dir")
      // T=1 baseline: every slice trains at exactly 1 epoch
      assert(got.filter(_._1 == 1L).forall(_._5 == 1.0), s"T=1 epochs != 1 at $dir")
      // T=2 equals the declared X25 weights
      val x25 = SparkEntry.queries("q_mix_weights")(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      got.filter(_._1 == 2L).foreach { r =>
        assert(r._4 === x25(r._2), s"T=2 weight for ${r._2} diverges from q_mix_weights at $dir")
      }
      // monotone flattening: spread shrinks, worst epochs grow with T
      val byT = graft.operators.Curation.mixTemperatures.map(t =>
        got.filter(_._1 == t.toLong))
      val spreads = byT.map(rows => rows.map(_._4).max - rows.map(_._4).min)
      val worst = byT.map(_.head._6)
      assert(spreads === spreads.sorted.reverse, s"weight spread not flattening: $spreads")
      assert(worst === worst.sorted, s"max epochs not monotone in T: $worst")
    }
  }

  test("mix weights match a driver-side lang-ordered recompute, far from round-4 boundaries") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("q_mix_weights")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
      // ground truth in the same canonical lang order the ordered
      // window frame states
      val total = rows.map(r => math.sqrt(r._2.toDouble)).sum
      rows.foreach { case (lang, n, w) =>
        val exact = math.sqrt(n.toDouble) / total
        val expected = BigDecimal(exact).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(w == expected, s"$lang weight drifted at $dir")
        // headroom pin: the quotient sits >= 1e-6 absolute from the
        // nearest rounding boundary, so no realistic reassociation
        // ulp can ever flip the 4th decimal (measured min: 7e-6)
        val frac = (exact * 10000) % 1
        assert(math.abs(frac - 0.5) > 0.01,
          s"$lang weight $exact is within 1e-6 of a round-4 boundary at $dir")
      }
      assert(math.abs(rows.map(_._3).sum - 1.0) < 5e-4, "weights do not normalize")
    }
  }

  test("q_curate_verdict gates agree with the standalone declared gate queries") {
    val verdict = SparkEntry.queries("q_curate_verdict")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val en = SparkEntry.queries("q_lang_id")(spark, sf)
      .collect().map(r => r.getLong(0) -> (if (r.getString(4) == "en") 1L else 0L)).toMap
    val quality = SparkEntry.queries("q_quality_score")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    // q_repetition runs on the PLANTED corpus (every 30th doc
    // replaced); the verdict runs on real text — compare off-plant
    val rep = SparkEntry.queries("q_repetition")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    verdict.foreach { case (id, (e, q, r, kept)) =>
      assert(e === en(id), s"doc $id language gate disagrees with q_lang_id")
      assert(q === quality(id), s"doc $id quality gate disagrees with q_quality_score")
      if (id % 30 != 0)
        assert(r === rep.getOrElse(id, 0L), s"doc $id repetition gate disagrees with q_repetition")
      assert(kept === (if (e == 1 && q == 1 && r == 0) 1L else 0L), s"doc $id verdict wrong")
    }
    // the decision is non-vacuous in both directions on this corpus
    assert(verdict.values.exists(_._4 == 1L) && verdict.values.exists(_._4 == 0L))
  }

  test("the verdict gates run unchanged on a stream and match batch row-for-row") {
    // the factoring claim: the gate projection is stateless narrow
    // work, so the SAME code path is the online admission filter —
    // no rewrite, no state store, no watermark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .limit(100).as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs.toSeq)
    val q = graft.operators.Curation
      .verdictGates(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("verdict_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("verdict_stream")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val batch = SparkEntry.queries("q_curate_verdict")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(streamed === batch, "streaming verdict diverges from batch on identical rows")
    assert(streamed.size === docs.length)
  }

  test("q_curate_verdict is one scan, zero exchanges before the final order-by") {
    val plan = SparkEntry.queries("q_curate_verdict")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate") && !plan.contains("Window"),
      s"composed verdict lost its narrow shape:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 1,
      s"composed verdict shuffles before the final sort:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"composed verdict reads the corpus $scans times:\n$plan")
  }

  test("bloom decontamination is a strict superset of exact, with a bounded FP tax") {
    val exact = SparkEntry.queries("q_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = SparkEntry.queries("q_decontam_bloom")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives, ever: a truly shared gram sets all its
    // bits, so every exactly-contaminated doc is flagged with at
    // least as much evidence
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"bloom missed exactly-contaminated doc $id")
      assert(bloom(id) >= nShared,
        s"doc $id: bloom evidence ${bloom(id)} < exact $nShared")
    }
    // and the FP tax stays a tax, not a flood (filter ~11% full at
    // this eval-set size → ~0.1% gram-level FPs)
    assert(bloom.size < exact.size + 30,
      s"bloom flagged ${bloom.size} docs vs ${exact.size} exact — filter saturated")
  }

  test("weighted sample caps per source, ranks contiguously, and biases toward large docs") {
    val docs = Tables(spark, sf, "documents")
    val sample = SparkEntry.queries("q_weighted_sample")(spark, sf).collect()
    val bySource = sample.groupBy(_.getString(1))
    bySource.foreach { case (src, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.length <= 15, s"$src oversampled: ${ranks.length}")
      assert(ranks === (1L to ranks.length).toArray, s"$src ranks not contiguous: ${ranks.toSeq}")
    }
    // Efraimidis–Spirakis with w = n_chars: inclusion odds scale with
    // document size, so the sampled mean size must exceed the corpus
    // mean (deterministic fixture, deterministic sample)
    val sizes = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampledIds = sample.map(_.getLong(0)).toSet
    val sampledMean = sampledIds.toSeq.map(sizes).sum.toDouble / sampledIds.size
    val corpusMean = sizes.values.sum.toDouble / sizes.size
    assert(sampledMean > corpusMean,
      f"size-weighted sample mean $sampledMean%.1f not above corpus mean $corpusMean%.1f")
  }

  /** Driver-side DSIR recount: the operator's exact fixed-point
    * pipeline (per-bigram round-6 ln snap, integer delta sum, integer
    * HALF_UP round-4) in independent collection code. Returns
    * (doc_id -> (n_bigrams, logratio), doc_id -> exact s6 total).
    */
  private def dsirDriver(dir: String): (Map[Long, (Long, Double)], Map[Long, Long]) = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(text: String): Seq[String] = {
      val w = text.split(" ", -1)
      if (w.length < 2) Seq.empty
      else (0 until w.length - 1).map(i => w(i) + " " + w(i + 1))
    }
    val occ = docs.flatMap { case (id, lang, text) => bigrams(text).map(bg => (id, lang, bg)) }
    val cR = occ.groupBy(_._3).view.mapValues { rows =>
      (rows.length.toLong,
        rows.count(_._2 == graft.operators.Curation.dsirTargetLang).toLong)
    }.toMap
    val tr = cR.values.map(_._1).sum
    val tt = cR.values.map(_._2).sum
    val b = cR.size.toLong
    // round-6 snap exactly as Spark's round(1e6 * ln, 0): the DOUBLE
    // product first (not an exact decimal multiply), then HALF_UP on
    // its shortest-repr decimal (scala BigDecimal(double) is
    // valueOf-based, same as Spark's Round)
    def snap6(x: Double): Long =
      BigDecimal(1000000.0 * x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val delta6 = cR.map { case (bg, (cr, ct)) =>
      bg -> (snap6(math.log((ct + 1).toDouble / (tt + b)))
        - snap6(math.log((cr + 1).toDouble / (tr + b))))
    }
    val s6ByDoc = occ.groupBy(_._1).view
      .mapValues(rows => rows.map(r => delta6(r._3)).sum).toMap
    val result = occ.groupBy(_._1).map { case (id, rows) =>
      val s6 = s6ByDoc(id)
      val q4 = ((s6.abs + 50) / 100) * (if (s6 < 0) -1L else 1L)
      id -> (rows.length.toLong, q4 / 10000.0)
    }
    (result, s6ByDoc)
  }

  test("q_dsir_weights: en slice scores higher and matches a full driver recount") {
    val (expected, _) = dsirDriver(sf)
    val got = SparkEntry.queries("q_dsir_weights")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expected, "DSIR weights diverge from the driver recount")
    // the operator does its job: target-language docs average a higher
    // target/raw logratio than the rest (that is what importance
    // resampling then exploits)
    val langs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, other) = got.toSeq.partition { case (id, _) =>
      langs(id) == graft.operators.Curation.dsirTargetLang
    }
    assert(en.nonEmpty && other.nonEmpty, "vacuous slice split")
    val enMean = en.map(_._2._2).sum / en.size
    val otherMean = other.map(_._2._2).sum / other.size
    assert(enMean > otherMean,
      f"en mean logratio $enMean%.4f not above non-en $otherMean%.4f")
  }

  test("DSIR integer HALF_UP rounding is pinned on a boundary-landing total") {
    // r13 found a real x.xxxx5 tie at sf0.1 (doc 706): a double
    // round(total/1e6, 4) puts Spark and DuckDB on opposite sides.
    // Verify the declared query resolves every boundary-landing doc
    // (|s6| ≡ 50 mod 100 — the exact ties) to the integer HALF_UP
    // image, against the driver-recounted exact totals.
    val dir = "/root/testdata/sf0.1"
    val (_, s6ByDoc) = dsirDriver(dir)
    val boundary = s6ByDoc.filter { case (_, s6) => s6.abs % 100 == 50 }
    assert(boundary.nonEmpty,
      "no boundary-landing totals at sf0.1 — the tie case is no longer exercised")
    val got = SparkEntry.queries("q_dsir_weights")(spark, dir)
      .filter(col("doc_id").isin(boundary.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    boundary.foreach { case (id, s6) =>
      val q4 = ((s6.abs + 50) / 100) * (if (s6 < 0) -1L else 1L)
      assert(got(id) === q4 / 10000.0,
        s"doc $id: boundary total $s6 rounded to ${got(id)}, expected ${q4 / 10000.0}")
    }
    info(s"${boundary.size} boundary-landing doc(s) at sf0.1: ${boundary.keys.toSeq.sorted.take(5).mkString(", ")}")
  }

  test("q_split_leakage matches a driver recount over the verified pair list and never flags train") {
    def splitOf(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split$id".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 100
      if (u < 90) "train" else if (u < 95) "val" else "test"
    }
    // the verified edge list is exactly q_dedup_minhash's (id_a, id_b)
    // — itself oracle-green — so recounting leakage from it in the
    // driver is an independent path through the split orientation
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .flatMap { case (a, b) =>
        val (sa, sb) = (splitOf(a), splitOf(b))
        Seq(
          if (sa == "train" && sb != "train") Some((b, sb, a)) else None,
          if (sb == "train" && sa != "train") Some((a, sa, b)) else None
        ).flatten
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((id, sp), rows) => (id, sp, rows.length.toLong, rows.map(_._3).min) }
      .toSet
    val got = SparkEntry.queries("q_split_leakage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected, "leakage rows diverge from the driver recount")
    assert(got.nonEmpty, "no leakage found at sf0.01 — the check is vacuous at this SF")
    // orientation invariants: the flagged doc is never in train, and
    // its witness always is
    got.foreach { case (evalId, evalSplit, _, trainId) =>
      assert(evalSplit != "train" && splitOf(evalId) == evalSplit,
        s"eval doc $evalId mis-assigned split $evalSplit")
      assert(splitOf(trainId) == "train", s"witness $trainId is not a train doc")
    }
  }

  test("q_quality_clf matches a sequential hashing-trick recount; both verdicts non-vacuous") {
    // X67: the whole serving path — feature stream, bucket hash,
    // md5-derived weight, integer sum, sign-explicit truncating mean —
    // recomputed in plain Scala must agree exactly per doc.
    def h32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val w = text.split(" ", -1).toSeq
      val feats = w ++ (if (w.size >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Nil)
      val score6 = feats.map(f => h32("qw" + (h32(f) % 64).toString) % 200001 - 100000).sum
      val n = feats.size.toLong
      val mean = if (score6 < 0) -(math.abs(score6) / n) else score6 / n
      (id, n, mean, score6 >= 0)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_quality_clf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got === expected.toSeq, "declared classifier diverges from the sequential recount")
    val kept = got.count(_._4)
    assert(kept > 0 && kept < got.size,
      s"verdict is vacuous: $kept/${got.size} kept — both branches must be exercised")
    info(s"$kept/${got.size} docs keep=true at sf0.01")
  }

  test("the in-row classifier twin equals the declared explode+aggregate form") {
    // withClfColumns is the streaming shape (no explode, no extra
    // aggregate); it must be the SAME function as q_quality_clf —
    // any feature-set or rounding drift between the two breaks the
    // stream ≡ batch story silently
    val inRow = graft.operators.Curation.withClfColumns(
      Tables(spark, sf, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("clf_n_feats"), col("clf_logit6"), col("clf_keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val declared = SparkEntry.queries("q_quality_clf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(inRow === declared, "in-row classifier twin diverges from the declared operator")
  }

  test("q_rule_filter matches a sequential rule recount; every rule fires both ways at sf0.01") {
    val stop = Set("the", "a", "of", "and", "to", "in", "that", "with")
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val expected = Tables(spark, dir, "documents").select("doc_id", "text")
        .collect().map { r =>
          val (id, w) = (r.getLong(0), r.getString(1).split(" ", -1))
          val n = w.length.toLong
          val slen = w.map(_.length.toLong).sum
          val nstop = w.distinct.count(stop)
          val maxc = w.groupBy(identity).values.map(_.size).max.toLong
          val flags = Seq(n >= 20 && n <= 80,
            3 * n <= slen && 2 * slen <= 9 * n, nstop >= 2, 5 * maxc <= n)
          (id, n, flags(0), flags(1), flags(2), flags(3),
            flags.count(!_).toLong, flags.forall(identity))
        }.sortBy(_._1).toSeq
      val got = SparkEntry.queries("q_rule_filter")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5), r.getLong(6), r.getBoolean(7))).toSeq
      assert(got === expected, s"rule-cascade recount diverges at $dir")
      if (dir == sf) {
        val cols = Seq[((Long, Long, Boolean, Boolean, Boolean, Boolean, Long, Boolean)) => Boolean](
          _._3, _._4, _._5, _._6, _._8)
        val names = Seq("r_wordcount", "r_meanwordlen", "r_stopwords", "r_repetition", "keep")
        cols.zip(names).foreach { case (f, nm) =>
          assert(got.exists(f) && got.exists(!f(_)),
            s"rule $nm is vacuous at $dir — one branch never fires")
        }
      }
    }
  }

  test("q_token_budget spends the budget exactly; funded/partial/unfunded branches all fire") {
    def md5Hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val perSrc = Tables(spark, dir, "documents").select("source", "text")
        .collect().map(r => r.getString(0) -> r.getString(1).split(" ", -1).length.toLong)
        .groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._2).sum }
      val t = perSrc.values.sum
      val b = 3 * t / 2
      val e = math.min(b / t, 4L)
      val rem = if (e < 4) b - e * t else 0L
      var cum = 0L
      val expected = perSrc.toSeq.sortBy { case (s0, _) => (md5Hex(s"budget$s0"), s0) }
        .map { case (s0, n) =>
          val extra = math.max(0L, math.min(n, rem - cum))
          cum += n
          s0 -> ((n, e, extra, e * n + extra, ((20000L * (e * n + extra) + n) / (2L * n)) / 10000.0))
        }.toMap
      val got = SparkEntry.queries("q_token_budget")(spark, dir)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))).toMap
      assert(got === expected, s"token-budget recount diverges at $dir")
      // rem < T by construction, so the remainder fill completes and
      // the allocation spends the budget EXACTLY
      assert(got.values.map(_._4).sum === b,
        s"allocation ${got.values.map(_._4).sum} != budget $b at $dir")
      if (dir == sf) {
        assert(got.values.exists(v => v._3 == v._1), "no fully-funded remainder source")
        assert(got.values.exists(v => v._3 > 0 && v._3 < v._1), "no partially-funded source")
        assert(got.values.exists(_._3 == 0), "no unfunded source")
      }
    }
  }

  test("q_quality_cut keeps exactly the top 30% per source by TTR rank, recounted sequentially") {
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val scored = Tables(spark, dir, "documents").select("doc_id", "source", "text")
        .collect().map { r =>
          val w = r.getString(2).split(" ", -1)
          (r.getLong(0), r.getString(1), w.distinct.length.toLong * 1000000L / w.length)
        }
      val expected: Map[Long, (String, Long, Long, Long)] =
        scored.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
          val n = xs.length.toLong
          xs.sortBy { case (id, _, sc) => (-sc, id) }.zipWithIndex.map {
            case ((id, s0, sc), i) =>
              id -> ((s0, sc, i + 1L, if (10L * (i + 1) <= 3 * n) 1L else 0L))
          }
        }.toMap
      val got = SparkEntry.queries("q_quality_cut")(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      assert(got.toMap === expected, s"quality-cut recount diverges at $dir")
      // the relative rule's signature: every source keeps exactly
      // floor(3n/10) docs, regardless of its absolute score level
      got.values.groupBy(_._1).foreach { case (s0, vs) =>
        val kept = vs.count(_._4 == 1L)
        assert(kept === (3 * vs.size / 10), s"source $s0 kept $kept of ${vs.size}")
      }
    }
  }

  test("q_snapshot_diff classifies exactly the planted deltas, all four classes non-vacuous") {
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val ids = Tables(spark, dir, "documents")
        .select("doc_id").collect().map(_.getLong(0))
      val added = ids.filter(_ % 13 == 5)
      val removed = ids.filter(_ % 23 == 0).map(_ + 200000L)
      val changed = ids.filter(id => id % 17 == 0 && id % 13 != 5)
      val unchanged = ids.filter(id => id % 13 != 5 && id % 17 != 0)
      val expected = Seq(
        "added" -> added, "changed" -> changed,
        "removed" -> removed, "unchanged" -> unchanged)
        .map { case (st, xs) =>
          assert(xs.nonEmpty, s"class '$st' vacuous at $dir — the plant covers nothing")
          st -> (xs.length.toLong, xs.min, xs.max)
        }.toMap
      val got = SparkEntry.queries("q_snapshot_diff")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got === expected, s"snapshot-diff classification diverges at $dir")
    }
  }

  test("q_train_order: sequential recount, budget exact to the token, X74-consistent") {
    // X81's full contract re-derived on the driver: the same epoch
    // allocation, the same salted funding order with the prefix-sum
    // cutoff (boundary doc truncated), the same per-epoch shuffle
    // ranking — compared row-for-row. Then the two cross-operator
    // invariants that make it X74's materialization rather than a
    // lookalike: sum(tok_take) == B exactly, and the per-source
    // remainder sums equal q_token_budget's extra_tokens column.
    def md5Hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents").select("doc_id", "source", "text")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2).split(" ", -1).length.toLong))
      val t = docs.map(_._3).sum
      val budget = 3 * t / 2
      val fe = math.min(budget / t, 4L)
      val rem = if (fe < 4) budget - fe * t else 0L
      // X74's remainder fill over sources in salted order
      val srcTok = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val srcOrder = srcTok.keys.toSeq.sortBy(s0 => (md5Hex("budget" + s0), s0))
      var left = rem
      val extra = srcOrder.map { s0 =>
        val e = math.max(0L, math.min(srcTok(s0), left)); left -= e; s0 -> e
      }.toMap
      // remainder round: docs funded in salted order, boundary truncated
      val remRows = docs.groupBy(_._2).toSeq.flatMap { case (s0, ds) =>
        var cum = 0L
        ds.sortBy { case (id, _, _) => (md5Hex("order" + id), id) }.flatMap {
          case (id, _, tok) =>
            val take = math.min(tok, extra(s0) - cum)
            cum += tok
            if (take > 0) Some((id, fe + 1, take)) else None
        }
      }
      val fullRows = for (e <- 1L to fe; (id, _, tok) <- docs) yield (id, e, tok)
      val expected = (fullRows ++ remRows).groupBy(_._2).toSeq.flatMap { case (e, rows) =>
        rows.sortBy { case (id, _, _) => (md5Hex(s"shuffle$e:$id"), id) }.zipWithIndex
          .map { case ((id, _, take), i) => (e, (i + 1).toLong, id, take) }
      }.sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_train_order")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got === expected, s"train-order recount diverges at $dir")
      assert(got.map(_._4).sum === budget,
        s"emitted tokens != budget at $dir: ${got.map(_._4).sum} vs $budget")
      // cross-operator: q_token_budget's extra_tokens per source
      val tb = SparkEntry.queries("q_token_budget")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
      val docSrc = docs.map(d => d._1 -> d._2).toMap
      val remBySrc = remRows.groupBy(r => docSrc(r._1)).view.mapValues(_.map(_._3).sum).toMap
      tb.foreach { case (s0, (xtra, _)) =>
        assert(remBySrc.getOrElse(s0, 0L) === xtra,
          s"source $s0 remainder ${remBySrc.getOrElse(s0, 0L)} != q_token_budget extra $xtra")
      }
      assert(got.map(_._4).sum === tb.values.map(_._2).sum,
        s"total emitted != q_token_budget total_alloc at $dir")
      // non-vacuity: a truncated boundary doc exists (tok_take < doc tokens)
      val tokOf = docs.map(d => d._1 -> d._3).toMap
      assert(remRows.exists { case (id, _, take) => take < tokOf(id) },
        s"no truncated boundary doc at $dir — the partial-funding branch is vacuous")
    }
  }

  test("q_bootstrap: sequential recount; replicate spread matches sigma/sqrt(n) theory") {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    def pois(u6: Long): Long =
      if (u6 < 367879L) 0L else if (u6 < 735759L) 1L else if (u6 < 919699L) 2L
      else if (u6 < 981012L) 3L else if (u6 < 996340L) 4L
      else if (u6 < 999406L) 5L else 6L
    val B = graft.operators.Curation.bootstrapB
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val toks = Tables(spark, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val expected = (1 to B).map { r =>
        val ws = toks.map { case (id, tok) => (pois(h32(s"boot${r}_$id") % 1000000L), tok) }
        val nEff = ws.map(_._1).sum
        val num = ws.map { case (w, t) => w * t }.sum
        r.toLong -> (nEff, (20000L * num + nEff) / (2L * nEff) / 10000.0)
      }.toMap
      val got = SparkEntry.queries("q_bootstrap")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got === expected, s"bootstrap replicates diverge from the driver replay at $dir")
      // statistical closure on the larger corpus: the replicate spread
      // IS the standard error — it must agree with sigma/sqrt(n)
      // within a loose factor, and the true mean must sit inside the
      // replicate range (these are deterministic numbers; the bounds
      // only fail if the weighting scheme is broken)
      if (dir == sf) {
        val means = got.values.map(_._2).toSeq
        val mm = means.sum / means.size
        val repSd = math.sqrt(means.map(m => (m - mm) * (m - mm)).sum / (means.size - 1))
        val n = toks.length.toDouble
        val trueMean = toks.map(_._2).sum / n
        val sigma = math.sqrt(toks.map(t => (t._2 - trueMean) * (t._2 - trueMean)).sum / (n - 1))
        val theory = sigma / math.sqrt(n)
        assert(repSd > 0.5 * theory && repSd < 2.0 * theory,
          f"replicate sd $repSd%.4f vs theory $theory%.4f — bootstrap miscalibrated")
        assert(means.min <= trueMean && trueMean <= means.max,
          f"true mean $trueMean%.2f outside the replicate range [${means.min}, ${means.max}]")
        // and the Poisson weights themselves: P(w=0) on the grid is
        // 0.367879; the realized share over B x n draws must be close
        val zeros = (1 to B).flatMap(r => toks.map { case (id, _) =>
          if (pois(h32(s"boot${r}_$id") % 1000000L) == 0L) 1 else 0 }).sum
        val share = zeros.toDouble / (B * toks.length)
        assert(math.abs(share - 0.367879) < 0.01,
          f"P(w=0) realized $share%.4f — hash-uniform grid is biased")
      }
    }
  }

  test("q_split_cluster: zero cross-split near-dup leakage by construction; naive split leaks") {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    def splitOf(id: Long): String = {
      val u = h32(s"split$id") % 100
      if (u < 90) "train" else if (u < 95) "val" else "test"
    }
    val dir = sf
    val got = SparkEntry.queries("q_split_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    // sequential recount off the oracle-green cluster labels
    val labels = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, (skey, split, moved)) =>
      val expKey = labels.getOrElse(id, id)
      assert(skey == expKey, s"doc $id split key $skey != canonical $expKey")
      assert(split == splitOf(expKey), s"doc $id split $split != hash of $expKey")
      assert(moved == (if (splitOf(expKey) == splitOf(id)) 0L else 1L), s"doc $id moved flag")
    }
    // the remediation, OBSERVED: no verified near-dup pair straddles
    // splits under the cluster key — while the naive X31 split audit
    // (q_split_leakage) finds real leaks on the same pair set
    val pairs = graft.operators.Dedup.minhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(got(a)._2 == got(b)._2,
        s"near-dup pair ($a, $b) straddles splits ${got(a)._2}/${got(b)._2}")
    }
    val naiveLeaks = SparkEntry.queries("q_split_leakage")(spark, dir).count()
    assert(naiveLeaks > 0, "naive split leaks nothing — the remediation pin is vacuous")
    // the fix's blast radius is real but bounded: both moved branches
    // fire, and the split proportions stay ≈ 90/5/5
    assert(got.values.map(_._3).toSet == Set(0L, 1L), "moved branches degenerate")
    val n = got.size.toDouble
    val trainShare = got.values.count(_._2 == "train") / n
    assert(trainShare > 0.85 && trainShare < 0.95, s"train share drifted to $trainShare")
  }

  test("q_upsert: sequential merge recount; every precedence branch non-vacuous") {
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val ids = Tables(spark, dir, "documents")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      // driver-side replay of the merge semantics: per key, the
      // highest-seq op wins (ins=1 < u1=2 < u2=3 < del=4)
      def lastOp(id: Long): Option[(String, Long)] = {
        val ops = Seq(
          (1L, "i1", id % 13 == 5), (2L, "u1", id % 7 == 3),
          (3L, "u2", id % 14 == 3), (4L, "D", id % 11 == 4)
        ).filter(_._3)
        if (ops.isEmpty) None
        else Some((ops.maxBy(_._1)._2, ops.length.toLong))
      }
      val expected = ids.flatMap { id =>
        val inBase = id % 13 != 5
        lastOp(id) match {
          case Some(("D", _))  => None // deleted — absent whatever came before
          case Some((tag, n))  =>
            Some(id -> (tag, if (inBase) "updated" else "inserted", n))
          case None            =>
            if (inBase) Some(id -> ("base", "kept", 0L)) else None
        }
      }.toMap
      val got = SparkEntry.queries("q_upsert")(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
      assert(got.keySet === expected.keySet, s"live-row key set diverges at $dir")
      expected.foreach { case (id, (tag, origin, n)) =>
        val (_, gotOrigin, gotN) = got(id)
        assert(gotOrigin == origin && gotN == n,
          s"doc $id at $dir: got ($gotOrigin, $gotN) want ($origin, $n)")
      }
      // every path of the precedence lattice must actually fire
      def branch(p: Long => Boolean, what: String): Unit =
        assert(ids.exists(p), s"$what vacuous at $dir")
      branch(id => id % 13 != 5 && id % 7 != 3 && id % 14 != 3 && id % 11 != 4,
        "kept (untouched base row)")
      branch(id => id % 13 != 5 && id % 7 == 3 && id % 11 != 4, "plain update")
      branch(id => id % 13 != 5 && id % 14 == 3 && id % 11 != 4,
        "latest-wins double update")
      branch(id => id % 13 == 5 && id % 11 != 4 && id % 7 != 3, "plain insert")
      branch(id => id % 13 == 5 && id % 7 == 3 && id % 11 != 4, "insert-then-update")
      branch(id => id % 13 != 5 && id % 7 == 3 && id % 11 == 4, "update-then-delete")
      branch(id => id % 13 == 5 && id % 11 == 4, "insert-then-delete")
      // and latest-wins is OBSERVABLE: a double-updated key must carry
      // the u2 payload, not u1 (hash inequality is the witness)
      val dbl = ids.find(id => id % 14 == 3 && id % 11 != 4).get
      val (h, _, _) = got(dbl)
      val Seq(u1h, u2h) = {
        val t = Tables(spark, dir, "documents")
          .filter(col("doc_id") === dbl)
          .select(md5(concat(col("text"), lit(" u1"))),
            md5(concat(col("text"), lit(" u2"))))
          .head()
        Seq(t.getString(0), t.getString(1))
      }
      assert(h == u2h && h != u1h, s"doc $dbl at $dir carries ${h} — latest-wins broken")
    }
  }

  test("q_decontam_semantic: sequential cosine recount; flagged and clean eval items both live") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      def cos(a: Array[Double], b: Array[Double]) = {
        var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dp / (math.sqrt(na) * math.sqrt(nb))
      }
      val evalSet = vecs.filter(_._1 % 50 == 0)
      val train = vecs.filter(_._1 % 50 != 0) ++
        vecs.filter(_._1 % 100 == 0).map { case (id, v) =>
          (id + 200000) -> v.zipWithIndex.map { case (x, i) => if (i == 3) x * 1.25 else x }
        }
      val expected = train.flatMap { case (tid, tv) =>
        val hits = evalSet.map { case (eid, ev) => (eid, r4(cos(tv, ev))) }
          .filter(_._2 >= 0.95)
        if (hits.isEmpty) None
        else {
          val best = hits.maxBy { case (eid, sc) => (sc, -eid) }
          Some((tid, hits.length.toLong, best._1, best._2))
        }
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_decontam_semantic")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq === expected.toSeq, s"semantic-decontam recount diverges at $dir")
      // the operator's two branches: every planted copy flagged against
      // its source eval item, and the unplanted eval items stay clean
      val planted = vecs.collect { case (id, _) if id % 100 == 0 => id }
      assert(got.map(_._1).toSet == planted.map(_ + 200000).toSet,
        s"flagged set is not exactly the planted copies at $dir")
      assert(got.forall { case (tid, _, eid, _) => tid - 200000 == eid },
        s"a planted copy matched the wrong eval item at $dir")
      val cleanEval = vecs.collect { case (id, _) if id % 50 == 0 && id % 100 != 0 => id }
      assert(cleanEval.nonEmpty && cleanEval.forall(e => !got.exists(_._3 == e)),
        s"no clean eval items left at $dir — the planted/clean split is vacuous")
    }
  }

  test("q_split_time: sequential recount; exact p80 cut, populated embargo, guaranteed gap") {
    val embargo = 43200000000L
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables(spark, dir, "events")
        .select(unix_micros(col("ts")).as("tsu"), col("event_id"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val n = ev.length
      val k = (8 * n + 9) / 10 // = ceil(0.8n)
      val b = ev.map(e => (e._1, e._2)).sorted.apply(k - 1)._1
      def splitOf(tsu: Long) =
        if (tsu > b) "test" else if (tsu > b - embargo) "embargo" else "train"
      val groups = ev.groupBy(e => (splitOf(e._1), e._3))
      val mt = ev.map(_._1).filter(_ <= b - embargo).max
      val nt = ev.map(_._1).filter(_ > b).min
      val expected = groups.toSeq.map { case ((sp, et), rows) =>
        (sp, et, rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max,
          nt - mt, if (nt - mt > embargo) 1L else 0L)
      }.sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_split_time")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(got.toSeq === expected, s"split_time recount diverges at $dir")
      // the cut is an ORDER STATISTIC: exactly ceil(0.8n) events at or
      // below the boundary, so test size is exact by construction
      assert(got.filter(_._1 == "test").map(_._3).sum == n - k,
        s"test split is not exactly n - ceil(0.8n) at $dir")
      // all three buckets populated (the embargo band is not vacuous)
      assert(got.map(_._1).toSet == Set("train", "embargo", "test"),
        s"a split bucket is empty at $dir")
      // the de Prado guarantee: train and test separated by > embargo
      assert(got.forall(r => r._6 > embargo && r._7 == 1L),
        s"train->test gap does not clear the embargo at $dir")
    }
  }

  test("q_clf_agreement: bins, rates and corpus kappa match a recount over the two declared gates") {
    // the agreement table must be EXACTLY what you'd get by joining
    // the two oracle-green gate queries yourself — recount it from
    // q_quality_clf and q_rule_filter driver-side with BigInt kappa
    val clf = SparkEntry.queries("q_quality_clf")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val rule = SparkEntry.queries("q_rule_filter")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(clf.keySet == rule.keySet, "gate queries cover different docs")
    val rows = clf.toSeq.map { case (id, (logit6, ck)) =>
      ((logit6 + 100000L) / 20000L, if (ck) 1L else 0L, if (rule(id)) 1L else 0L)
    }
    def rate4(num: Long, den: Long): Double = ((20000L * num + den) / (2L * den)) / 10000.0
    val byBin = rows.groupBy(_._1)
    val (ta, tb, tc, td) = rows.foldLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), (_, ck, rk)) =>
      (a + ck * rk, b + ck * (1 - rk), c + (1 - ck) * rk, d + (1 - ck) * (1 - rk))
    }
    val tn = BigInt(ta) + tb + tc + td
    val peNum = (BigInt(ta) + tb) * (BigInt(ta) + tc) + (BigInt(tc) + td) * (BigInt(tb) + td)
    val knum = tn * (BigInt(ta) + td) - peNum
    val kden = tn * tn - peNum
    val kappa =
      if (kden == 0) 0.0
      else ((knum.abs * 20000 + kden) / (kden * 2)).toLong * (if (knum < 0) -1 else 1) / 10000.0
    val expected = byBin.toSeq.map { case (bin, rs) =>
      val n = rs.length.toLong
      (bin, n, rate4(rs.map(_._2).sum, n), rate4(rs.map(_._3).sum, n),
        rate4(rs.count(r => r._2 == r._3).toLong, n), kappa)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_clf_agreement")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected, "agreement table diverges from the two-gate recount")
    // kappa is a chance-corrected correlation: bounded, and identical
    // on every row (it is the corpus verdict riding the bin table)
    assert(kappa >= -1.0 && kappa <= 1.0, s"kappa $kappa out of range")
    assert(got.map(_._6).distinct.size == 1, "kappa differs across bins")
    // the binning is keyed on the classifier's own sign boundary, so
    // the clf keep rate must saturate: exactly 0 below bin 5, 1 at or
    // above it — a structural invariant, not a data accident
    assert(got.forall { r => r._3 == (if (r._1 >= 5) 1.0 else 0.0) },
      s"clf keep rate does not saturate at the sign-boundary bin: $got")
  }

  /** X129 sequential recount engine: dict → tie-corrected AUC +
    * cumulative-from-top ROC bins, all BigInt — independent of the
    * distributed window/aggregate chain.
    */
  private def aucRecount(pairs: Seq[(Long, Long)])
      : Seq[(Long, Long, Double, Double, Double)] = {
    def rate4(num: BigInt, den: BigInt): Double =
      ((num * 20000 + den) / (den * 2)).toLong / 10000.0
    val dict = pairs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, ps) =>
        (s, ps.count(_._2 == 1L).toLong, ps.count(_._2 == 0L).toLong)
      }
    val p = BigInt(dict.map(_._2).sum)
    val n = BigInt(dict.map(_._3).sum)
    val num2 = dict.foldLeft((BigInt(0), BigInt(0))) {
      case ((acc, nnb), (_, np, nn)) => (acc + np * (2 * nnb + nn), nnb + nn)
    }._1
    val auc =
      if (p == 0 || n == 0) 0.5
      else ((num2 * 20000 + 2 * p * n) / (4 * p * n)).toLong / 10000.0
    val bins = dict.groupBy(d => (d._1 + 100000L) / 20000L).toSeq
      .sortBy(-_._1)
    bins.foldLeft((Seq.empty[(Long, Long, Double, Double, Double)], BigInt(0), BigInt(0))) {
      case ((out, tp0, fp0), (bin, ds)) =>
        val tp = tp0 + ds.map(_._2).sum
        val fp = fp0 + ds.map(_._3).sum
        val row = (bin, ds.map(d => d._2 + d._3).sum,
          if (p == 0) 0.0 else rate4(tp, p),
          if (n == 0) 0.0 else rate4(fp, n), auc)
        (row +: out, tp, fp)
    }._1
  }

  test("q_clf_auc: ROC points and AUC match a sequential recount off the two declared gates") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val clf = SparkEntry.queries("q_quality_clf")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val rule = SparkEntry.queries("q_rule_filter")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getBoolean(7)).toMap
      val pairs = clf.toSeq.map { case (id, s) => (s, if (rule(id)) 1L else 0L) }
      val got = SparkEntry.queries("q_clf_auc")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toSeq
      assert(got === aucRecount(pairs), s"ROC/AUC recount diverges at $dir")
      // the AUC verdict rides identically on every row, and the ROC is
      // monotone in the threshold: lower bins admit MORE of both classes
      assert(got.map(_._5).distinct.size == 1, "auc differs across bins")
      assert(got.sortBy(_._1).sliding(2).forall {
        case Seq(a, b) => a._3 >= b._3 && a._4 >= b._4
        case _ => true
      }, s"ROC not monotone: $got")
    }
  }

  test("q_clf_calibration: reliability table and ECE/MCE match a BigInt recount off the two gates") {
    // X149's exactness: p6 = 5·(logit6+1e5) is an exact integer, so
    // the whole table (bin means, observed rates, gaps, ECE, MCE) has
    // ONE correct value — recounted here sequentially in BigInt off
    // the same two declared gate queries X129's recount trusts.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val clf = SparkEntry.queries("q_quality_clf")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val rule = SparkEntry.queries("q_rule_filter")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getBoolean(7)).toMap
      val rows = clf.toSeq.map { case (id, s) =>
        val p6 = 5L * (s + 100000L)
        (math.min(p6 / 100000L, 9L), p6, if (rule(id)) 1L else 0L)
      }
      val byBin = rows.groupBy(_._1).toSeq.map { case (bin, rs) =>
        val n = BigInt(rs.size)
        val sp6 = rs.map(r => BigInt(r._2)).sum
        val sy = BigInt(rs.map(_._3).sum)
        val mp4 = ((2 * sp6 + 100 * n) / (200 * n)).toLong
        val ob4 = ((20000 * sy + n) / (2 * n)).toLong
        (bin, n.toLong, mp4, ob4, mp4 - ob4)
      }.sortBy(_._1)
      val tn = BigInt(byBin.map(_._2).sum)
      val sgap = byBin.map(b => BigInt(b._2) * math.abs(b._5)).sum
      val ece = ((2 * sgap + tn) / (2 * tn)).toLong / 10000.0
      val mce = byBin.map(b => math.abs(b._5)).max / 10000.0
      val expected = byBin.map { case (bin, n, mp4, ob4, gap4) =>
        (bin, n, mp4 / 10000.0, ob4 / 10000.0, gap4 / 10000.0, ece, mce)
      }
      val got = SparkEntry.queries("q_clf_calibration")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
      assert(got === expected, s"calibration recount diverges at $dir")
      // non-vacuous: multiple bins populated and a real miscalibration
      // signal (X67 is unfitted — a flat-zero gap would mean the audit
      // cannot see what it exists to see)
      assert(got.size >= 2, s"degenerate single-bin table at $dir")
      assert(got.exists(r => math.abs(r._5) > 0), s"vacuous gap column at $dir")
    }
  }

  test("rocAucOf closed forms: separation 1.0 / reversed 0.0 / all-ties 0.5 / single-class 0.5") {
    import spark.implicits._
    def auc(pairs: Seq[(Long, Long)]): Double =
      graft.operators.Curation.rocAucOf(pairs.toDF("s", "y"))
        .collect().head.getDouble(4)
    val pos = Seq(10L, 20L, 30L); val neg = Seq(1L, 2L, 3L)
    assert(auc(pos.map((_, 1L)) ++ neg.map((_, 0L))) === 1.0, "perfect separation")
    assert(auc(pos.map((_, 0L)) ++ neg.map((_, 1L))) === 0.0, "reversed labels")
    assert(auc(Seq((7L, 1L), (7L, 1L), (7L, 0L))) === 0.5, "all-ties tie-correction")
    assert(auc(Seq((1L, 1L), (5L, 1L))) === 0.5, "single-class convention")
    // half-overlap fixture: pos {1,3}, neg {2}: pairs won = 1 of 2 -> 0.5;
    // shift one pos above: pos {2,3}, neg {2}: one tie + one win -> 0.75
    assert(auc(Seq((1L, 1L), (3L, 1L), (2L, 0L))) === 0.5, "interleaved")
    assert(auc(Seq((2L, 1L), (3L, 1L), (2L, 0L))) === 0.75, "tie contributes half")
  }

  test("rocAucOf is repartition-invariant and its declared plan reads no parquet") {
    import spark.implicits._
    val pairs = (1 to 200).map(i => ((i * 37 % 23).toLong, (i % 2).toLong))
    val a = graft.operators.Curation.rocAucOf(pairs.toDF("s", "y")).collect().toSeq
    val b = graft.operators.Curation.rocAucOf(
      pairs.reverse.toDF("s", "y").repartition(13)).collect().toSeq
    assert(a === b, "rocAucOf must be order- and partitioning-free")
    val plan = SparkEntry.queries("q_clf_auc")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"post-checkpoint plan must be dictionary-only:\n$plan")
  }

  test("q_kanon: ladder recounts sequentially at two SFs; k_anon is the real min class") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val classes = Tables(spark, dir, "customer")
        .select(col("c_nationkey").cast("long"), col("c_mktsegment")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).map(_._2.length.toLong).toSeq
      val n = classes.sum
      val want = graft.operators.Curation.kanonLadder.map { k =>
        val below = classes.filter(_ < k)
        (k.toLong, classes.size.toLong, classes.min, below.size.toLong, below.sum,
          ((20000L * below.sum + n) / (2L * n)) / 10000.0)
      }
      val got = SparkEntry.queries("q_kanon")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSeq
      assert(got === want, s"k-anonymity recount diverges at $dir")
    }
  }

  test("q_ldiversity: ladder recounts sequentially at two SFs; l_div is the real min distinct") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val classes = Tables(spark, dir, "customer")
        .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
          col("c_acctbal")).collect()
        .map(r => ((r.getLong(0), r.getString(1)),
          math.floor(r.getDouble(2) / 1000).toLong))
        .groupBy(_._1).toSeq.map { case (_, vs) =>
          (vs.length.toLong, vs.map(_._2).distinct.length.toLong)
        }
      val n = classes.map(_._1).sum
      val want = graft.operators.Curation.ldivLadder.map { lvl =>
        val below = classes.filter(_._2 < lvl)
        (lvl.toLong, classes.size.toLong, classes.map(_._2).min,
          below.size.toLong, below.map(_._1).sum,
          ((20000L * below.map(_._1).sum + n) / (2L * n)) / 10000.0)
      }
      val got = SparkEntry.queries("q_ldiversity")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSeq
      assert(got === want, s"l-diversity recount diverges at $dir")
    }
  }

  test("ldivOf: strict <l semantics and the homogeneity case k-anonymity misses") {
    import spark.implicits._
    // class x: LARGE (5 rows) but homogeneous (1 value) — the attack;
    // class y: 3 rows, 3 distinct values; class z: 2 rows, 2 values
    val df = (Seq.fill(5)(("x", 7L)) ++
      Seq(("y", 1L), ("y", 2L), ("y", 3L), ("z", 1L), ("z", 2L)))
      .toDF("q", "s")
    val got = graft.operators.Curation.ldivOf(df, Seq("q"), "s", Seq(2, 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      (2L, 3L, 1L, 1L, 5L, 0.5),   // only x below l=2 (z has exactly 2 -> safe)
      (3L, 3L, 1L, 2L, 7L, 0.7)))  // x and z below l=3; y exactly 3 -> safe
  }

  test("q_tcloseness: ladder recounts sequentially at two SFs; t_max is the real max EMD") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Tables(spark, dir, "customer")
        .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
          col("c_acctbal")).collect()
        .map(r => ((r.getLong(0), r.getString(1)),
          math.floor(r.getDouble(2) / 1000).toLong))
      val bands = rows.map(_._2).distinct.sorted
      val m = bands.length
      val nn = rows.length.toLong
      val gCum = bands.map(b => b -> rows.count(_._2 <= b).toLong).toMap
      val classes = rows.groupBy(_._1).toSeq.map { case (_, vs) =>
        val n = vs.length.toLong
        val num = bands.map { b =>
          (BigInt(vs.count(_._2 <= b)) * nn - BigInt(gCum(b)) * n).abs
        }.sum
        (n, num, BigInt(n) * nn * (m - 1))
      }
      val e4 = classes.map { case (_, num, den) =>
        if (m <= 1) 0L else ((num * 20000 + den) / (den * 2)).toLong
      }
      val want = graft.operators.Curation.tcloseLadder.map { lvl =>
        val viol = classes.filter { case (_, num, den) => m > 1 && num * 100 > den * lvl }
        val risk = viol.map(_._1).sum
        (lvl.toLong, classes.size.toLong, e4.max / 10000.0, viol.size.toLong, risk,
          ((20000L * risk + nn) / (2L * nn)) / 10000.0)
      }
      val got = SparkEntry.queries("q_tcloseness")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSeq
      assert(got === want, s"t-closeness recount diverges at $dir")
    }
  }

  test("tcloseOf: the diverse-but-skewed class l-diversity misses is exactly what fires") {
    import spark.implicits._
    // corpus bands are uniform over {0,1,2,3}; class x mirrors the
    // corpus (EMD 0 — safe at every t); class y is l-DIVERSE (3
    // distinct values) but all in the TOP bands — the skew attack
    val x = Seq(0L, 1L, 2L, 3L).flatMap(b => Seq(("x", b), ("x", b)))
    val y = Seq(("y", 2L), ("y", 3L), ("y", 3L), ("y", 1L))
    // pad the corpus marginal toward uniform with 4 singleton classes
    val pad = Seq(("p0", 0L), ("p1", 0L), ("p2", 0L), ("p3", 1L))
    val df = (x ++ y ++ pad).toDF("q", "s")
    val got = graft.operators.Curation.tcloseOf(df, Seq("q"), "s", Seq(10, 45))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    // hand recount: 16 rows, cum corpus = [5, 9, 12, 16].
    // y (n=4, cum [0,1,2,4]): terms 20+20+16+0 = 56, den 192 -> EMD 0.2917
    //   -> fires at 0.10, safe at 0.45;
    // x (n=8, cum [2,4,6,8]): terms 8+8+0+0 = 16, den 384 -> EMD 0.0417
    //   -> safe even at 0.10 (it mirrors the corpus);
    // pads p0-p2 (EMD 0.4583) fire at both; p3 (0.3333) only at 0.10.
    assert(got === Seq((10L, 5L, 8L), (45L, 3L, 3L)),
      s"skew fixture report diverges: $got")
  }

  test("q_profile_drift: every metric recounts sequentially at two SFs; only real drifts flag") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4)))
      val v1 = docs.filter(_._1 % 13 != 5).map { case (id, t, l, s, nc) =>
        (id, t, if (id % 19 == 0) null else l, s,
          if (id % 7 == 0) nc + nc / 10 else nc)
      }
      def q4(num: BigInt, den: BigInt): Long = ((num * 20000 + den) / (den * 2)).toLong
      def stats(v: Seq[(Long, String, String, String, Long)]) = {
        val n = v.size.toLong
        Map(
          ("doc_id", "n_rows") -> n * 10000,
          ("lang", "null_share") -> q4(v.count(_._3 == null), n),
          ("lang", "n_distinct") -> v.map(_._3).filter(_ != null).distinct.size.toLong * 10000,
          ("source", "n_distinct") -> v.map(_._4).distinct.size.toLong * 10000,
          ("n_chars", "mean") -> q4(v.map(x => BigInt(x._5)).sum, n),
          ("text", "len_mean") -> q4(BigInt(v.map(_._2.length.toLong).sum), n))
      }
      val (s1, s2) = (stats(v1.toSeq), stats(docs.toSeq))
      val want = s1.keys.toSeq.sorted.map { k =>
        val (a, b) = (s1(k), s2(k))
        (k._1, k._2, a / 10000.0, b / 10000.0, math.abs(b - a) / 10000.0,
          if (20L * math.abs(b - a) > math.max(a, b)) 1L else 0L)
      }
      val got = SparkEntry.queries("q_profile_drift")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getLong(5))).toSeq
      assert(got === want, s"profile drift recount diverges at $dir")
      // the planted regressions — and ONLY those — must flag: the row
      // drop (added docs) and the NULLed lang extractor both exceed 5%;
      // the 1-in-7 +10% length bug dilutes to ~1.4% and must NOT
      val flagged = got.filter(_._6 == 1L).map(r => (r._1, r._2)).toSet
      assert(flagged === Set(("doc_id", "n_rows"), ("lang", "null_share")),
        s"wrong flag set at $dir: $flagged")
    }
  }

  test("q_dp_release: noise recounts from MessageDigest hashes; calibration tracks 1/eps") {
    import org.apache.spark.sql.functions.col
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val counts = Tables(spark, dir, "documents")
        .select(col("source")).collect().map(_.getString(0))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ladder = graft.operators.Curation.dpLadder
      val rows = for {
        (src, n) <- counts.toSeq.sortBy(_._1)
        (tag, eps, inv) <- ladder
      } yield {
        val u = (h32(s"dp$src$tag") % 1000000L + 0.5 - 500000.0) / 1000000.0
        val lap = -inv * (if (u < 0) -1.0 else 1.0) * math.log(1.0 - 2.0 * math.abs(u))
        val noise6 = math.round(lap * 1000000.0)
        val m = n * 1000000L + noise6
        (src, eps, n, (if (m < 0) -1 else 1) * ((math.abs(m) + 50) / 100) / 10000.0,
          ((math.abs(noise6) + 50) / 100) / 10000.0)
      }
      val an4ByEps = rows.groupBy(_._2).view
        .mapValues { rs =>
          val s4 = rs.map(r => math.round(r._5 * 10000)).sum
          ((2 * s4 + rs.size) / (2L * rs.size)) / 10000.0
        }.toMap
      val want = rows.map(r => (r._1, r._2, r._3, r._4, r._5, an4ByEps(r._2)))
        .sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_dp_release")(spark, dir).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSeq
      assert(got === want, s"DP release recount diverges at $dir")
      // calibration: E|Lap(1/eps)| = 1/eps — mean |noise| must sit within
      // a loose factor-of-2 band of it, and ranks must invert with eps
      val m = an4ByEps
      assert(m(0.1) > m(1.0) && m(1.0) > m(10.0), "noise must shrink with eps")
      assert(m(0.1) > 5.0 && m(0.1) < 20.0, s"eps=0.1 calibration off: ${m(0.1)}")
      assert(m(10.0) > 0.05 && m(10.0) < 0.2, s"eps=10 calibration off: ${m(10.0)}")
    }
  }

  test("kanonOf: strict <k semantics — a class of size exactly k is not at risk") {
    import spark.implicits._
    // classes: x->1 row, y->2 rows, z->5 rows
    val df = (Seq.fill(1)("x") ++ Seq.fill(2)("y") ++ Seq.fill(5)("z")).toDF("q")
    val got = graft.operators.Curation.kanonOf(df, Seq("q"), Seq(2, 3, 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      (2L, 3L, 1L, 1L, 1L, 0.125),   // size-2 class NOT at risk at k=2
      (3L, 3L, 1L, 2L, 3L, 0.375),
      (6L, 3L, 1L, 3L, 8L, 1.0)))
  }

  test("q_anneal_plan: recount off the rule gate, floor-shortfall bounds, both upweight directions") {
    import org.apache.spark.sql.functions.{col, size, split}
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // ground truth off the oracle-green X73 verdicts + raw documents
      val keep = SparkEntry.queries("q_rule_filter")(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(7))).toMap
      val bySource = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
        .groupBy(_._2).map { case (s, docs) =>
          val toks = docs.map(d => keep(d._1))
          s -> (toks.map(_._1).sum, toks.filter(_._2).map(_._1).sum)
        }
      val t = bySource.values.map(_._1).sum
      val tq = bySource.values.map(_._2).sum
      val b = 3 * t / 2
      val ba = b / 10
      val bp = b - ba
      val expected = bySource.toSeq.sortBy(_._1).map { case (s, (ts, tqs)) =>
        val up = (BigInt(20000) * tqs * t + BigInt(tq) * ts) / (BigInt(tq) * ts * 2)
        (s, ts, tqs, bp * ts / t, ba * tqs / tq, up.toLong / 10000.0)
      }
      val got = SparkEntry.queries("q_anneal_plan")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
      assert(got.toSeq === expected, s"anneal-plan recount diverges at $dir")
      // floor-division shortfall is bounded by the dictionary size —
      // the allocations never overshoot and never leave a full
      // source's worth unfunded
      val preShort = bp - got.map(_._4).sum
      val annShort = ba - got.map(_._5).sum
      assert(preShort >= 0 && preShort < got.length, s"stable shortfall $preShort at $dir")
      assert(annShort >= 0 && annShort < got.length, s"anneal shortfall $annShort at $dir")
      // the anneal genuinely REWEIGHTS: some source turned up, some down
      assert(got.exists(_._6 > 1.0) && got.exists(_._6 < 1.0),
        s"upweight vacuous at $dir: ${got.map(_._6).toSeq}")
    }
  }

  test("q_mix_convergence: recount off the declared sample; boundary lang exact; formula can fail") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val byLang = Tables(spark, dir, "documents")
        .groupBy(col("lang")).agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nMin = byLang.values.min
      val keptByLang = SparkEntry.queries("q_mix_sample")(spark, dir)
        .groupBy(col("lang")).agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("k")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def ok3(n: Long, thr: Long, kept: Long): Long = {
        val d = BigInt(kept) * 1000000 - BigInt(n) * thr
        if (d * d <= BigInt(9) * n * thr * (1000000L - thr)) 1L else 0L
      }
      val expected = byLang.toSeq.sortBy(_._1).map { case (lang, n) =>
        val thr = math.floor(1e6 * math.sqrt(nMin.toDouble / n)).toLong
        val kept = keptByLang.getOrElse(lang, 0L)
        (lang, n, thr, kept, (2000000L * kept + n) / (2 * n), ok3(n, thr, kept))
      }
      val got = SparkEntry.queries("q_mix_convergence")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got.toSeq === expected, s"convergence recount diverges at $dir")
      // the deterministic boundary: the rarest language has thr = 1e6
      // and ZERO binomial variance — its verdict demands kept == n_l
      // exactly, and holds
      val boundary = got.find(_._3 == 1000000L)
      assert(boundary.isDefined, s"no thr=1e6 boundary language at $dir")
      assert(boundary.get._4 == boundary.get._2 && boundary.get._6 == 1L,
        s"boundary language not exact at $dir: ${boundary.get}")
      // healthy corpus: every language inside 3 sigma (the all-pass
      // state IS the audit's pass state)
      assert(got.forall(_._6 == 1L), s"a healthy language failed 3σ at $dir: $got")
      // ...and the verdict formula genuinely discriminates: the same
      // kept counts scored against a perturbed (halved) threshold must
      // fail for the largest language
      val big = got.maxBy(_._2)
      assert(ok3(big._2, big._3 / 2, big._4) == 0L,
        s"perturbed threshold not rejected at $dir — the 3σ formula is vacuous")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_watermark: green counts and z recount per doc; the z>=2 flag is integer-exact") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val texts = Tables(spark, dir, "documents").select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = SparkEntry.queries("q_watermark")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      assert(got.length === texts.size, "one row per document")
      got.foreach { case (id, n, g, z, flag) =>
        val w = texts(id).split(" ", -1)
        val gr = w.count(t => java.lang.Long.parseLong(md5hex("wm " + t).take(8), 16) % 2 == 0)
        assert((n, g) === (w.length.toLong, gr.toLong), s"doc $id green recount diverges")
        // z: the same one-op-sequence double, rounded exactly as Spark
        // rounds (BigDecimal HALF_UP on the double)
        val zExp = new java.math.BigDecimal((2.0 * gr - w.length) / math.sqrt(w.length.toDouble))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
        assert(z === zExp, s"doc $id z diverges: $z vs $zExp")
        // the verdict is the INTEGER test, provably == (z >= 2): the
        // unrounded statistic clears 2 iff (2g-n) >= 0 and (2g-n)^2 >= 4n
        val d = 2L * gr - w.length
        val intFlag = if (d >= 0 && d * d >= 4L * w.length) 1L else 0L
        assert(flag === intFlag, s"doc $id flag diverges from the integer test")
        assert((((2.0 * gr - w.length) / math.sqrt(w.length.toDouble)) >= 2.0) ===
          (intFlag == 1L), s"doc $id: integer flag != z>=2 on the raw double")
      }
      // natural text fires at the null's tail rate, not en masse — and
      // both tails are populated (the screen discriminates)
      val rate = got.count(_._5 == 1L).toDouble / got.length
      assert(rate <= 0.10, s"watermark screen fired on ${rate * 100}% of natural text at $dir")
      assert(got.exists(_._4 > 0) && got.exists(_._4 < 0),
        s"vacuous: z does not straddle 0 at $dir")
    }
  }

  test("q_label_noise: confident-learning grid recounts off the declared gate queries") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // the same (p6, y) pairs the operator derives, read through the
      // DECLARED gate queries (the X149 spec convention)
      val logit = SparkEntry.queries("q_quality_clf")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val keep = SparkEntry.queries("q_rule_filter")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
      val py = logit.keys.toSeq.sorted.map { id =>
        (BigInt(5L * (logit(id) + 100000L)), if (keep(id)) 1L else 0L)
      }
      val one = py.filter(_._2 == 1L).map(_._1)
      val zro = py.filter(_._2 == 0L).map(t => BigInt(1000000) - t._1)
      val (s1, n1) = (one.sum, BigInt(one.size))
      val (s0, n0) = (zro.sum, BigInt(zro.size))
      val assigned = py.map { case (p6, y) =>
        val m1 = p6 * n1 - s1
        val m0 = (BigInt(1000000) - p6) * n0 - s0
        val conf1 = n1 > 0 && m1 >= 0
        val conf0 = n0 > 0 && m0 >= 0
        val pred =
          if (conf1 && conf0) { if (m1 * n0 >= m0 * n1) 1L else 0L }
          else if (conf1) 1L else if (conf0) 0L else -1L
        (y, pred)
      }
      val counts = assigned.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val confMass = assigned.count(_._2 != -1L).toLong
      val noiseMass = assigned.count(a => a._2 != -1L && a._2 != a._1).toLong
      val expected = (for { i <- Seq(0L, 1L); j <- Seq(-1L, 0L, 1L) } yield {
        val n = counts.getOrElse((i, j), 0L)
        val nLabel = Seq(-1L, 0L, 1L).map(jj => counts.getOrElse((i, jj), 0L)).sum
        val share = if (nLabel == 0) 0.0 else ((20000L * n + nLabel) / (2 * nLabel)) / 10000.0
        val noise = if (j != -1L && j != i) 1L else 0L
        val rate = if (confMass == 0) 0.0
          else ((20000L * noiseMass + confMass) / (2 * confMass)) / 10000.0
        (i, j, n, share, noise, rate)
      }).sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_label_noise")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getDouble(5)))
      assert(got.length === 6, "the grid must be the complete 2x3 — zeros stated")
      assert(got.toSeq === expected, s"label-noise recount diverges at $dir")
      // conservation + non-vacuity: every doc lands in the grid, both
      // classes exist, and the estimator found a nonzero but sane
      // off-diagonal (the clf imperfectly mimics the rule — X129's AUC
      // daylight is exactly what this should surface)
      assert(got.map(_._3).sum === py.size.toLong, "grid loses documents")
      assert(got.filter(_._1 == 0L).map(_._3).sum > 0 &&
        got.filter(_._1 == 1L).map(_._3).sum > 0, "a label class is absent")
      val rate = got.head._6
      assert(rate > 0.0 && rate < 0.5, s"noise rate $rate outside the sane band at $dir")
    }
  }

  test("graft_clf_score: the native classifier scan == the HOF form column-for-column (r17)") {
    // The gate-scored hot path moved to a native expression; the
    // declarative HOF twin stays as the parity reference (and the
    // shape the DuckDB oracle replays). Equality must hold on the
    // real corpus at two SFs AND on the split-semantics edges (empty
    // text, consecutive/trailing spaces, multi-byte chars) where a
    // tokenizer divergence would hide.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    assert(graft.functions.ClfScore.buckets.toLong === graft.operators.Curation.clfBuckets,
      "bucket constants drifted between the native expression and the operator")
    def cols(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("clf_n_feats"), col("clf_score6"),
        col("clf_logit6"), col("clf_keep"))
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      val nat = cols(graft.operators.Curation.withClfColumns(d))
      val hof = cols(graft.operators.Curation.withClfColumnsHof(d))
      assert(nat.nonEmpty && nat === hof, s"native clf scan diverges from the HOF form at $dir")
      assert(nat.exists(_._5) && nat.exists(!_._5), s"vacuous: one keep class absent at $dir")
    }
    val edge = Seq((1L, ""), (2L, " "), (3L, "a"), (4L, "a b"), (5L, "a  b "), (6L, "é ü x"))
      .toDF("doc_id", "text")
    assert(cols(graft.operators.Curation.withClfColumns(edge)) ===
      cols(graft.operators.Curation.withClfColumnsHof(edge)),
      "split-semantics edges diverge between native and HOF")
  }

  test("q_unimax: iterative waterfilling recount at two SFs; fixtures drive all-capped, remainder and ties") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // independent recount: the SEQUENTIAL waterfilling definition, not
    // the closed form the query uses — sorted ascending by (capacity,
    // lang), cap while the smallest remaining capacity is at most the
    // exact fair share of what remains, then uniform base + one extra
    // token each to the largest-capacity uncapped
    def waterfill(counts: Seq[(String, Long)], e: Long): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
      val total = counts.map(_._2).sum
      val budget = 3 * total / 2
      val sorted = counts.map { case (l, n) => (l, n, n * e) }.sortBy(t => (t._3, t._1))
      var rem = budget
      var k = 0
      while (k < sorted.size && sorted(k)._3 * (sorted.size - k) <= rem) {
        rem -= sorted(k)._3; k += 1
      }
      val u = sorted.size - k
      val (base, extra) = if (u == 0) (0L, 0L) else (rem / u, rem % u)
      val unalloc = if (u == 0) rem else 0L
      sorted.zipWithIndex.map { case ((l, n, c), i) =>
        val alloc =
          if (i < k) c
          else base + (if (i >= sorted.size - extra) 1L else 0L)
        (l, n, c, alloc, if (i < k) 1L else 0L, budget, unalloc)
      }.sortBy(_._1)
    }
    def run(counts: Seq[(String, Long)], e: Long) =
      graft.operators.Curation.unimaxOf(counts.toDF("lang", "n_tokens"), e)
        .select(col("lang"), col("n_tokens"), col("capacity"), col("allocation"),
          col("capped"), col("budget"), col("unallocated"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val counts = Tables(spark, dir, "documents")
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("lang").agg(sum(col("tok")).as("n")).as[(String, Long)].collect().toSeq
      val declared = SparkEntry.queries("q_unimax")(spark, dir)
        .select(col("lang"), col("n_tokens"), col("capacity"), col("allocation"),
          col("capped"), col("budget"), col("unallocated"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val expect = waterfill(counts, graft.operators.Curation.unimaxEpochCap)
      assert(declared === expect, s"declared diverges from the sequential waterfill at $dir")
      // conservation + the fairness contract, off the declared rows
      val budget = declared.head._6
      assert(declared.map(_._4).sum + declared.head._7 === budget, s"budget not conserved at $dir")
      declared.foreach { r => assert(r._4 <= r._3, s"allocation exceeds capacity: $r") }
      declared.filter(_._5 == 1L).foreach { r =>
        assert(r._4 === r._3, s"capped language not at capacity: $r") }
      val un = declared.filter(_._5 == 0L).map(_._4)
      assert(un.nonEmpty && declared.exists(_._5 == 1L),
        s"both branches must be live on the corpus at $dir")
      assert(un.max - un.min <= 1L, s"uncapped allocations not uniform(+-1) at $dir")
      // fairness: every uncapped language gets at least any capped one
      if (declared.exists(_._5 == 1L))
        assert(un.min >= declared.filter(_._5 == 1L).map(_._4).max,
          s"an uncapped language got less than a capped one at $dir")
    }
    // all-capped: E = 1 makes budget 3T/2 exceed total capacity T
    val allCap = run(Seq(("aa", 100L), ("bb", 300L)), 1L)
    assert(allCap.forall(_._5 == 1L) && allCap.forall(r => r._4 == r._3))
    assert(allCap.head._7 === 200L, s"unallocated must surface the surplus: $allCap")
    assert(allCap === waterfill(Seq(("aa", 100L), ("bb", 300L)), 1L))
    // remainder spread: R % U = 1 — the extra token goes to the
    // LARGEST-capacity uncapped language, deterministically
    val rem = run(Seq(("aa", 2L), ("dd", 9L), ("ee", 10L)), 2L)
    assert(rem === waterfill(Seq(("aa", 2L), ("dd", 9L), ("ee", 10L)), 2L))
    assert(rem.find(_._1 == "aa").get._5 === 1L)
    assert(rem.find(_._1 == "dd").get._4 === 13L && rem.find(_._1 == "ee").get._4 === 14L,
      s"remainder token must land on the largest capacity: $rem")
    // capacity tie: identical counts order by lang; recount agrees
    val tie = Seq(("bb", 5L), ("aa", 5L), ("cc", 50L))
    assert(run(tie, 2L) === waterfill(tie, 2L))
    // randomized sweep (fixed seed — deterministic): 30 dictionaries
    // over skewed counts and E in 1..4; the closed form must equal the
    // sequential definition on every one, and the invariants must hold
    val rnd = new scala.util.Random(20260816L)
    for (case_ <- 1 to 30) {
      val langs = 1 + rnd.nextInt(8)
      val counts = (0 until langs).map { j =>
        (f"l$j%02d", 1L + (if (rnd.nextBoolean()) rnd.nextInt(20) else rnd.nextInt(2000)).toLong)
      }
      val e = 1L + rnd.nextInt(4)
      val got = run(counts, e)
      assert(got === waterfill(counts, e), s"case $case_: closed form diverges for $counts E=$e")
      val budget = got.head._6
      assert(got.map(_._4).sum + got.head._7 === budget, s"case $case_: budget not conserved")
      got.foreach(r => assert(r._4 <= r._3 && r._4 >= 0, s"case $case_: allocation out of range: $r"))
    }
  }

  test("X167 q_decontam_sweep: sequential gram recount at two SFs; flags monotone, n=8 row == X15") {
    // The sweep must equal a driver-side replay (split words, slide an
    // n-window, set-intersect with the benchmark's distinct grams) at
    // every n; a doc sharing a 16-gram shares its sub-8-grams, so
    // flagged counts can only fall as n grows; and the n = 8 row must
    // be exactly the declared q_decontaminate's aggregate.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val bench = d.filter(_._1 % 50 == 0)
      val train = d.filter(_._1 % 50 != 0) ++ bench.map { case (id, t) =>
        (id + 300000, t.split(" ", 2).lift(1).getOrElse(""))
      }
      def gramsOf(t: String, n: Int): Seq[String] = {
        val w = t.split(" ")
        if (w.length < n) Seq.empty
        else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
      }
      val expected = graft.operators.Curation.decontamSweepNs.map { n =>
        val bg = bench.flatMap(b => gramsOf(b._2, n)).toSet
        val perDoc = train.map { case (id, t) =>
          (id, gramsOf(t, n).toSet.intersect(bg).size.toLong)
        }.filter(_._2 > 0)
        (n.toLong, bg.size.toLong, perDoc.length.toLong, perDoc.map(_._2).sum)
      }
      val got = SparkEntry.queries("q_decontam_sweep")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got === expected, s"decontam sweep diverges from the recount at $dir")
      assert(got.sliding(2).forall { case Seq(a, b) => a._3 >= b._3 },
        s"flagged docs not monotone in gram length at $dir")
      assert(got.forall(_._3 > 0), s"vacuous: a gram length flags nothing at $dir")
      // the n = 8 row IS the declared X15 aggregate
      val x15 = SparkEntry.queries("q_decontaminate")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val n8 = got.find(_._1 == 8L).get
      assert((n8._3, n8._4) === ((x15.length.toLong, x15.map(_._2).sum)),
        s"n=8 sweep row diverges from q_decontaminate at $dir")
    }
  }

  test("X168 q_gate_ablation: recount off the declared rule flags at two SFs; attribution sane") {
    // Per-rule fail / fail-only counts must equal a recount off the
    // oracle-green q_rule_filter rows; marginal attribution must obey
    // its own algebra: the docs failing ONLY rule k, summed over k,
    // are exactly the n_failed = 1 docs, and never exceed the dropped
    // set.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rf = SparkEntry.queries("q_rule_filter")(spark, dir).collect()
        .map(r => (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getLong(6)))
      val nDocs = rf.length.toLong
      val nDropped = rf.count(_._5 > 0).toLong
      def share(num: Long, den: Long): Double =
        if (den == 0) 0.0 else ((20000 * num + den) / (2 * den)).toDouble / 10000.0
      val flagOf = Map[String, ((Boolean, Boolean, Boolean, Boolean, Long)) => Boolean](
        "wordcount" -> (_._1), "meanwordlen" -> (_._2),
        "stopwords" -> (_._3), "repetition" -> (_._4))
      val expected = graft.operators.Curation.ablationRules.map(_._1).sorted.map { nm =>
        val f = flagOf(nm)
        val nf = rf.count(r => !f(r)).toLong
        val no = rf.count(r => !f(r) && r._5 == 1).toLong
        (nm, nDocs, nDropped, nf, no, share(nf, nDocs), share(no, nDropped))
      }
      val got = SparkEntry.queries("q_gate_ablation")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toSeq
      assert(got === expected, s"gate ablation diverges from the recount at $dir")
      assert(got.map(_._5).sum === rf.count(_._5 == 1).toLong,
        s"fail-only counts must partition the n_failed = 1 docs at $dir")
      assert(got.map(_._5).sum <= nDropped, s"marginals exceed the dropped set at $dir")
      assert(got.exists(_._5 > 0), s"vacuous: no rule owns a rejection alone at $dir")
      assert(got.exists(r => r._4 > r._5),
        s"vacuous: no rule overlaps another at $dir (ablation table would be trivial)")
    }
  }

  test("X169 q_sample_plan: BigInt recount at two SFs; error targets order the plan") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val toks = Tables(spark, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val expected = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
        val n = BigInt(rows.length)
        val sx = rows.map(r => BigInt(r._2)).sum
        val qx = rows.map(r => BigInt(r._2) * r._2).sum
        val mean4 = ((BigInt(20000) * sx + n) / (2 * n)).toLong
        val cv2 = if (sx == 0) BigInt(0)
          else (BigInt(2000000) * (n * qx - sx * sx) + sx * sx) / (2 * sx * sx)
        (src, n.toLong, mean4.toDouble / 10000.0, cv2.toLong.toDouble / 1000000.0,
          ((BigInt(153664) * cv2 + 99999999) / 100000000).toLong,
          ((BigInt(38416) * cv2 + 999999) / 1000000).toLong)
      }
      val got = SparkEntry.queries("q_sample_plan")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(got === expected, s"sample plan diverges from the BigInt recount at $dir")
      // the 1% target needs ~25x the 5% sample (exactly, modulo ceil)
      assert(got.forall(r => r._6 >= r._5), s"error targets out of order at $dir")
      assert(got.exists(_._5 > 0), s"vacuous: every source reads zero variance at $dir")
      // the two targets differ by exactly (5%/1%)² = 25x before the
      // ceil: n_req_1pct must sit inside [25·n_req_5pct − 24, 25·n_req_5pct]
      assert(got.forall(r => r._6 <= 25 * r._5 && r._6 >= 25 * r._5 - 24),
        s"1% plan breaks the exact 25x relation at $dir")
      // and the plan must genuinely separate sources (a constant cv²
      // column would mean the variance math collapsed)
      assert(got.map(_._5).distinct.length > 1,
        s"vacuous: every source reads the same plan at $dir")
    }
  }

  test("X172 q_bloom_plan: exact-count recount at two SFs; sizing algebra and the shipped-filter verdict") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      def gramsOf(t: String): Seq[String] = {
        val w = t.split(" ")
        if (w.length < 8) Seq.empty
        else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" "))
      }
      val nOf = Map(
        "bench_grams" -> d.filter(_._1 % 50 == 0).flatMap(x => gramsOf(x._2)).toSet.size.toLong,
        "train_grams" -> d.filter(_._1 % 50 != 0).flatMap(x => gramsOf(x._2)).toSet.size.toLong)
      val expected = (for {
        nm <- Seq("bench_grams", "train_grams")
        (bp, c4) <- graft.operators.Curation.bloomPlanTargets
      } yield {
        val n = nOf(nm)
        val bits = (n * c4 + 9999) / 10000
        (nm, bp, n, bits, (bits + 63) / 64,
          (2 * c4 * 6931 + 100000000L) / 200000000L, bits <= 16384L)
      }).sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_bloom_plan")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toSeq
      assert(got === expected, s"bloom plan diverges from the recount at $dir")
      // the sizing constants resolve to the textbook optima
      assert(got.filter(_._2 == 100L).forall(_._6 == 7L))
      assert(got.filter(_._2 == 10L).forall(_._6 == 10L))
      // the 100 TB argument is live: the train-side set must need a
      // strictly larger filter than the battery side at every target
      val byKey = got.map(r => (r._1, r._2) -> r._4).toMap
      assert(byKey(("train_grams", 100L)) > byKey(("bench_grams", 100L)),
        s"train-vs-bench sizing not separated at $dir")
      // both verdict branches live somewhere across the surface: at
      // sf0.001 the battery fits the shipped filter, train never does
      if (dir == "/root/testdata/sf0.001")
        assert(got.exists(_._7) , s"no set fits the shipped filter at $dir")
      assert(got.exists(!_._7), s"every set fits the shipped filter at $dir (vacuous)")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the result-preserving claims TextAnalysis makes about its
  * scale guards (r6 ADVICE item 3): the co-occurrence df floor bounds
  * the quadratic pair stream, and these tests prove it does not
  * change the declared top-30 on the test corpora — so a sparser
  * corpus where the floor starts dropping ranked pairs fails here,
  * loudly, instead of silently passing a mirrored oracle.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("BPE merge loop: hand-checked merges, deterministic ties, graceful exhaustion") {
    import spark.implicits._
    import graft.operators.TextAnalysis.bpeMergesFrom
    // abab×3 + ab×2 + cd×1: step 1 merges (a,b) with weight 2·3+2 = 8;
    // after it the only repeated pair is the SELF-pair (ab,ab), which
    // the contract excludes (see bpeMergesFrom scaladoc), so step 2
    // falls to (c,d); then nothing remains — the loop must STOP with
    // 2 of the 10 requested merges, not throw
    val wf = Seq(("abab", 3L), ("ab", 2L), ("cd", 1L)).toDF("word", "freq")
    assert(bpeMergesFrom(wf, 10) === Seq((1L, "a", "b", 8L), (2L, "c", "d", 1L)))
    // equal-count ties resolve by (l, r) ascending — engine-portable
    val tie = Seq(("cd", 1L), ("ab", 1L)).toDF("word", "freq")
    assert(bpeMergesFrom(tie, 10) === Seq((1L, "a", "b", 1L), (2L, "c", "d", 1L)))
    // empty vocabulary yields no merges at all
    assert(bpeMergesFrom(Seq.empty[(String, Long)].toDF("word", "freq"), 3) === Seq.empty)
  }

  test("repetition flag fires on exactly the planted boilerplate docs") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_repetition")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, mx, flag) =>
      assert(mx >= 1 && mx <= n, s"doc $id max bigram count $mx outside [1, $n]")
      if (id % 30 == 0)
        // planted: first word x40 -> one bigram repeated n times
        assert(flag === 1L && mx === n, s"planted doc $id not flagged (max=$mx of $n)")
      else
        // natural docs over a 30-word vocabulary stay far under the
        // 20% top-bigram share
        assert(flag === 0L, s"natural doc $id flagged repetitive (max=$mx of $n)")
    }
  }

  test("cooccur df floor is result-preserving: floored top-30 == unfloored, with headroom") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def top30(minDf: Long) =
        graft.operators.TextAnalysis.cooccurTop(spark, dir, minDf)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
      val floored = top30(graft.operators.TextAnalysis.cooccurMinDf)
      val unfloored = top30(1L)
      assert(floored.nonEmpty, s"vacuous pin at $dir")
      assert(floored === unfloored, s"df floor changed the co-occurrence top-30 at $dir")
      // headroom: the 30th-ranked pair clears the floor comfortably,
      // so corpus drift has to travel far before the pin above trips
      val last = floored.last._3
      assert(last >= graft.operators.TextAnalysis.cooccurMinDf,
        s"30th-ranked n_docs $last is below the floor at $dir")
    }
  }

  test("lm score is a well-formed log-probability: non-positive, full coverage") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("q_lm_score")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // every multi-token doc is scored, exactly once
      val eligible = graft.Tables(spark, dir, "documents")
        .filter(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")) >= 2).count()
      assert(rows.length.toLong == eligible && rows.map(_._1).distinct.length == rows.length)
      // each term is ln(c_bigram / c_prefix) with c_bigram <= c_prefix,
      // so the average is <= 0; a positive score means the model or
      // join keys drifted
      assert(rows.forall(_._3 <= 0.0), s"positive log-prob at $dir")
      assert(rows.forall(_._2 >= 1L))
      // and the corpus is not degenerate: scores vary across docs
      assert(rows.map(_._3).distinct.length > 10, s"collapsed score distribution at $dir")
    }
  }

  test("graft_nfc composes decomposed text, codegen and interpreted paths agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, length}
    val decomposed = "NFC\u0301  Te\u0301st" // combining U+0301 marks
    val composed = "NF\u0106  T\u00e9st"     // precomposed equivalents
    // enough rows that the projection runs under WholeStageCodegen
    val df = Seq.fill(200)(decomposed).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), call_function("graft_nfc", col("t")).as("n"),
        length(call_function("graft_nfc", col("t"))).as("len"))
    val rows = df.collect()
    assert(rows.forall(_.getString(1) == composed))
    assert(rows.forall(_.getInt(2) == composed.length)) // 9, was 11
    // interpreted path (no codegen): same result via the eval helper
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.NfcNormalize.nfc(
      UTF8String.fromString(decomposed)).toString == composed)
    // already-normalized input comes back as the SAME object (the
    // fast path real corpora take on ~every row), and NFC is
    // idempotent
    val already = UTF8String.fromString(composed)
    assert(graft.functions.NfcNormalize.nfc(already) eq already)
    // null propagates
    val withNull = Seq((1L, "ascii"), (2L, null)).toDF("id", "t")
      .select(call_function("graft_nfc", col("t")).as("n"))
    assert(withNull.collect().map(r => Option(r.getString(0))).toSet
      == Set(Some("ascii"), None))
  }

  test("heavy hitters: certified sketch path == exact top-K in every regime") {
    import spark.implicits._
    import graft.operators.TextAnalysis.heavyHittersOver
    def exact(toks: org.apache.spark.sql.DataFrame, k: Int) = toks
      .groupBy("tok").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("cnt"))
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc,
        org.apache.spark.sql.functions.col("tok").asc)
      .limit(k)
    def run(toks: org.apache.spark.sql.DataFrame, cap: Int, k: Int) = {
      val got = heavyHittersOver(toks, cap, k).collect().map(r => (r.getString(0), r.getLong(1)))
      val want = exact(toks, k).collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == want.toSeq, s"cap=$cap k=$k")
      got
    }
    // lossless regime (vocab < capacity): the declared-query shape
    val rnd = new scala.util.Random(7)
    val small = Seq.tabulate(5000)(_ => "tok" + rnd.nextInt(20)).toDF("tok").repartition(4)
    assert(run(small, 64, 10).length == 10)
    // spilling regime, skewed: vocab >> capacity but hot tokens
    // dominate — certificate holds, sketch path stays exact
    val skewed = (Seq.tabulate(4000)(i => "hot" + (i % 5)) ++
      Seq.tabulate(2000)(_ => "cold" + rnd.nextInt(1500))).toDF("tok").repartition(4)
    assert(run(skewed, 16, 5).forall(_._1.startsWith("hot")))
    // adversarially flat: every token nearly tied, certificate MUST
    // fail and the fallback exact plan answers
    val flat = Seq.tabulate(3000)(i => "t" + (i % 300)).toDF("tok").repartition(4)
    run(flat, 8, 20)
    // corpus pin: the declared query's certified path equals the
    // declarative exact aggregate at both test SFs
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val toks = graft.Tables(spark, dir, "documents")
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("tok"))
      run(toks, graft.operators.TextAnalysis.mgCapacity, 20)
    }
  }

  test("q_source_drift equals a sequential driver-side two-sample KS recount per source") {
    // The distributed statistic evaluates F(v) and F(v-) at the
    // SOURCE's jump points only, arguing by step-function dominance
    // that this attains the true sup (the left-limit argument in the
    // X56 scaladoc). This recount is the textbook SEQUENTIAL sweep
    // over the merged samples — independent code, exact integers —
    // so a hole in that argument fails here, not in production.
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables(spark, dir, "documents")
        .select(col("source"), col("n_chars")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val nTotal = docs.length.toLong
      val allSorted = docs.map(_._2).sorted
      def cumAll(v: Long): Long = {
        // count of corpus lengths <= v (binary search on the sorted array)
        var lo = 0; var hi = allSorted.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (allSorted(mid) <= v) lo = mid + 1 else hi = mid
        }
        lo.toLong
      }
      val expected = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
        val xs = rows.map(_._2).sorted
        val nS = xs.length.toLong
        // sweep every corpus jump point: at each distinct corpus value
        // v, F_s(v) = #{x_s <= v}/n_s — the true sup over the full
        // merged grid, no left-limit shortcut
        var ksNum = BigInt(0)
        allSorted.distinct.foreach { v =>
          val cs = BigInt(xs.count(_ <= v)) * nTotal
          val ca = BigInt(cumAll(v)) * nS
          if ((cs - ca).abs > ksNum) ksNum = (cs - ca).abs
        }
        val den = BigInt(nS) * nTotal
        val q4 = (ksNum * 20000 + den) / (den * 2)
        (src, nS, q4.toLong / 10000.0)
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_source_drift")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got === expected, s"KS drift diverges from the sequential recount at $dir")
      assert(got.exists(_._3 > 0.0), s"vacuous pin at $dir: every source KS is 0")
    }
  }

  test("q_tok_fertility equals a per-language recount from the per-doc encode, ratios >= 1") {
    // X70 composes the oracle-green X44 per-doc encode with a language
    // aggregate; the recount re-derives every language row from
    // q_bpe_encode's own output with driver-side integer HALF_UP
    // rounds, so an aggregation or rounding drift fails loudly here.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val perDoc = SparkEntry.queries("q_bpe_encode")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val metaRows = Tables(spark, dir, "documents")
        .selectExpr("doc_id", "lang", "CAST(n_chars AS BIGINT) AS n_chars")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val agg = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
      perDoc.foreach { case (id, (nw, nb)) =>
        val (lang, nc) = metaRows(id)
        val (d, w, b, c) = agg.getOrElse(lang, (0L, 0L, 0L, 0L))
        agg(lang) = (d + 1, w + nw, b + nb, c + nc)
      }
      val expected = agg.map { case (lang, (d, w, b, c)) =>
        lang -> (d, b,
          ((20000L * b + w) / (2L * w)) / 10000.0,
          ((20000L * c + b) / (2L * b)) / 10000.0)
      }.toMap
      val got = SparkEntry.queries("q_tok_fertility")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      assert(got === expected, s"fertility recount diverges at $dir")
      got.foreach { case (lang, (_, _, fert, cpt)) =>
        assert(fert >= 1.0, s"$lang fertility $fert < 1 — a word encodes to < 1 token?")
        assert(cpt >= 1.0, s"$lang chars/token $cpt < 1 — a token spans < 1 char?")
      }
    }
  }

  test("q_vocab_saturation equals a sequential frequency-of-frequencies recount") {
    // X80's estimators re-derived from scratch: tokenize, count, build
    // the freq-of-freqs, apply Good–Turing P0 and bias-corrected Chao1
    // with BigInt HALF_UP — so the distributed conditional aggregate
    // AND the integer rounding are both certified. Estimator sanity
    // rides along: chao1 is a richness floor (>= vocab), P0 a
    // probability, and the corpus must be non-degenerate in the ways
    // the estimators care about (hapaxes and doubletons both present).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Tables(spark, dir, "documents").select("source", "text").collect()
      val expected = rows.groupBy(_.getString(0)).map { case (src, rs) =>
        val counts = scala.collection.mutable.Map.empty[String, Long]
        rs.foreach(_.getString(1).split(" ", -1).foreach(t =>
          counts.update(t, counts.getOrElse(t, 0L) + 1)))
        val n = counts.valuesIterator.sum
        val v = counts.size.toLong
        val n1 = counts.valuesIterator.count(_ == 1L).toLong
        val n2 = counts.valuesIterator.count(_ == 2L).toLong
        val q4u = (BigInt(20000) * n1 + n) / (BigInt(2) * n)
        val q4c = (BigInt(20000) * n1 * (n1 - 1) + 2 * (BigInt(n2) + 1)) /
          (BigInt(4) * (n2 + 1))
        src -> (n, v, n1, n2, q4u.toLong / 10000.0, v.toDouble + q4c.toLong / 10000.0)
      }
      val got = SparkEntry.queries("q_vocab_saturation")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5), r.getDouble(6))).toMap
      assert(got === expected, s"vocab-saturation recount diverges at $dir")
      got.foreach { case (src, (_, v, _, _, p0, chao1)) =>
        assert(p0 >= 0.0 && p0 <= 1.0, s"$src unseen mass $p0 outside [0,1]")
        assert(chao1 >= v.toDouble, s"$src chao1 $chao1 below observed vocab $v")
      }
      assert(got.values.exists(_._3 > 0) && got.values.exists(_._4 > 0),
        s"degenerate corpus at $dir: no hapaxes or no doubletons — estimator pin vacuous")
    }
  }

  test("q_char_entropy equals a sequential fixed-point recount and respects entropy bounds") {
    // X82's arithmetic replayed per doc: exact char counts, the same
    // IEEE term (c/n)·log₂(n/c) snapped to 1e-6 HALF_UP, integer sum,
    // integer round-4. Bounds ride along: 0 ≤ H ≤ log₂(distinct)
    // (+1e-4 rounding slack), and the corpus must actually spread
    // (min < max) or the screen screens nothing.
    import java.math.{BigDecimal => JBD, RoundingMode}
    def snap6(x: Double): Long =
      JBD.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValueExact
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      val expected = rows.filter(_.getString(1).nonEmpty).map { r =>
        val counts = r.getString(1).toSeq.groupBy(identity).map { case (_, g) => g.size.toLong }
        val n = counts.sum
        val st = counts.map { c =>
          snap6(1000000.0 * (c.toDouble / n) * math.log(n.toDouble / c) / math.log(2.0))
        }.sum
        r.getLong(0) -> (n, counts.size.toLong, (st + 50) / 100 / 10000.0)
      }.toMap
      val got = SparkEntry.queries("q_char_entropy")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got === expected, s"char-entropy recount diverges at $dir")
      got.foreach { case (id, (_, dct, h)) =>
        assert(h >= 0.0 && h <= math.log(dct.toDouble) / math.log(2.0) + 1e-4,
          s"doc $id entropy $h outside [0, log2($dct)]")
      }
      val hs = got.values.map(_._3)
      assert(hs.min < hs.max, s"flat entropy surface at $dir — the screen is vacuous")
    }
  }

  test("q_corpus_card equals a sequential datasheet recount") {
    // X86 re-derived from the raw rows: volumes, distincts, the X73
    // rule replay for the clean share, the global vocab/hapax split,
    // and both integer-rounded ratios.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Tables(spark, dir, "documents")
        .select("doc_id", "source", "lang", "n_chars", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      val stop = Set("the", "a", "of", "and", "to", "in", "that", "with")
      def cleanDoc(t: String): Boolean = {
        val w = t.split(" ", -1)
        val n = w.length
        val slen = w.map(_.length.toLong).sum
        val maxc = w.groupBy(identity).values.map(_.size).max
        (n >= 20 && n <= 80) && (3L * n <= slen && 2 * slen <= 9L * n) &&
          w.toSet.intersect(stop).size >= 2 && 5L * maxc <= n
      }
      val nd = rows.length.toLong
      val nt = rows.map(_._5.split(" ", -1).length.toLong).sum
      val clean = rows.count(r => cleanDoc(r._5)).toLong
      val vc = rows.flatMap(_._5.split(" ", -1)).groupBy(identity)
        .map { case (_, xs) => xs.size.toLong }
      val expected = (nd, rows.map(_._2).distinct.length.toLong,
        rows.map(_._3).distinct.length.toLong, nt, rows.map(_._4).sum,
        (20000 * nt + nd) / (2 * nd) / 10000.0,
        vc.size.toLong, vc.count(_ == 1L).toLong,
        (2000000 * clean + nd) / (2 * nd) / 10000.0)
      val r = SparkEntry.queries("q_corpus_card")(spark, dir).collect()
      assert(r.length == 1, "card must be one row")
      val got = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
        r(0).getLong(4), r(0).getDouble(5), r(0).getLong(6), r(0).getLong(7),
        r(0).getDouble(8))
      assert(got === expected, s"corpus-card recount diverges at $dir")
      assert(got._9 > 0.0 && got._9 < 100.0,
        s"rule-clean share degenerate at $dir — both rule branches must be live")
    }
  }

  test("q_vocab_growth: sequential recount; growth monotone; Heaps fit in the sane band") {
    import org.apache.spark.sql.functions._
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docRows = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val uOf = docRows.map { case (id, _) => id -> h32(s"heaps$id") % 1048576L }.toMap
      val tokMin = scala.collection.mutable.Map.empty[String, Long]
      docRows.foreach { case (id, text) =>
        val w = text.split(" ")
        if (w.length >= 3) (0 to w.length - 3).foreach { i =>
          val g = s"${w(i)} ${w(i + 1)} ${w(i + 2)}"
          val u = uOf(id)
          if (!tokMin.get(g).exists(_ <= u)) tokMin(g) = u
        }
      }
      val thrs = graft.operators.TextAnalysis.heapsThresholds
      val exp = thrs.map { t =>
        t -> (uOf.values.count(_ < t).toLong, tokMin.values.count(_ < t).toLong)
      }.filter { case (_, (n, v)) => n > 0 && v > 0 }
      // fixed-point OLS replay
      val pts = exp.map { case (_, (n, v)) =>
        (math.round(math.log(n.toDouble) * 1e6), math.round(math.log(v.toDouble) * 1e6))
      }
      val (np, sx, sy) = (pts.length.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val den = np * sxx - sx * sx
      val beta = BigDecimal((np * sxy - sx * sy).toDouble / den)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = SparkEntry.queries("q_vocab_growth")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.map(g => g._1 -> ((g._2, g._3))).toMap ===
        exp.toMap.map { case (t, nv) => t -> nv },
        s"checkpoint counts diverge from the sequential replay at $dir")
      assert(got.forall(_._4 == beta), s"Heaps beta diverges from the driver OLS at $dir")
      // growth must be monotone in the nested prefixes (supersets)
      val sorted = got.sortBy(_._1).toSeq
      sorted.sliding(2).foreach { case Seq(a, b) =>
        assert(a._2 <= b._2 && a._3 <= b._3, s"non-monotone growth at $dir: $a -> $b")
      }
      // the fit lives where a pre-saturation combinatorial vocabulary
      // should: near-linear, strictly positive (a token-level fit on
      // this 31-word corpus would collapse to ~0 — the reason the
      // operator fits the shingle space)
      assert(beta > 0.5 && beta < 1.3, s"Heaps beta $beta out of the sane band at $dir")
    }
  }

  test("q_burstiness: BigInt grid recount at two SFs; absent-cell contribution live") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val byDoc = Tables(spark, dir, "documents")
        .select(col("source"), col("text")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      // exact integer recount over the COMPLETE V×S grid, zeros included
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      byDoc.foreach { case (src, text) =>
        text.split(" ", -1).foreach(t => counts((src, t)) = counts.getOrElse((src, t), 0L) + 1)
      }
      val sources = counts.keys.map(_._1).toSeq.distinct
      val vocab = counts.keys.map(_._2).toSeq.distinct
      val tS = sources.map(s => s -> counts.collect { case ((`s`, _), c) => c }.sum).toMap
      val tAll = BigInt(tS.values.sum)
      val expected = vocab.map { w =>
        val cW = BigInt(sources.map(s => counts.getOrElse((s, w), 0L)).sum)
        val nSrc = sources.count(s => counts.contains((s, w)))
        val num = sources.map { s =>
          (BigInt(counts.getOrElse((s, w), 0L)) * tAll - BigInt(tS(s)) * cW).abs
        }.sum
        val den = 2 * cW * tAll
        val dp = ((num * 20000 + den) / (2 * den)).toDouble / 10000.0
        (w, cW.toLong, nSrc.toLong, dp)
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_burstiness")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq === expected, s"burstiness recount diverges at $dir")
      // the standard implementation mistake is dropping absent (tok,
      // source) cells; a token missing from ≥1 source must exist so
      // the zero-cell term |0·T − T_s·c_w| is actually exercised
      assert(got.exists(_._3 < sources.length),
        s"every token present in every source at $dir — the absent-cell branch is vacuous")
      // dispersion sanity: some spread exists (not all tokens equal)
      assert(got.map(_._4).distinct.length > 1, s"degenerate DP at $dir")
    }
  }

  test("q_distinctive: sequential log-odds recount at two SFs; both signs live, z sane") {
    import org.apache.spark.sql.functions._
    val a0 = 500L
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val byDoc = Tables(spark, dir, "documents")
        .select(col("source"), col("text")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      byDoc.foreach { case (src, text) =>
        text.split(" ", -1).foreach(t => counts((src, t)) = counts.getOrElse((src, t), 0L) + 1)
      }
      val tS = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val cW = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val n = BigInt(tS.values.sum)
      def snap6(x: Double) =
        BigDecimal(x * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expected = counts.toSeq.map { case ((src, tok), c) =>
        val num1 = BigInt(c) * n + BigInt(a0) * cW(tok)
        val den1 = (BigInt(tS(src)) + a0) * n - num1
        val num2 = BigInt(cW(tok) - c) * n + BigInt(a0) * cW(tok)
        val den2 = (n - tS(src) + a0) * n - num2
        val d6 = snap6(math.log(num1.toDouble / den1.toDouble)) -
          snap6(math.log(num2.toDouble / den2.toDouble))
        val lo = ((math.abs(d6) + 50) / 100) * (if (d6 < 0) -1L else 1L)
        val v = n.toDouble / num1.toDouble + n.toDouble / num2.toDouble
        val z = r4((d6 / 1000000.0) / math.sqrt(v)) + 0.0
        (src, tok, c, lo / 10000.0, z)
      }.sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_distinctive")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      assert(got.toSeq === expected, s"distinctive-terms recount diverges at $dir")
      // the statistic does its job: significantly over- AND
      // under-represented cells exist, and z stays in a sane band
      // (prior-smoothed log-odds on this corpus: no |z| blowups)
      assert(got.exists(_._5 > 2.0) && got.exists(_._5 < -2.0),
        s"no significant cells in either direction at $dir — the prior drowned the signal")
      assert(got.forall(r => math.abs(r._5) < 10.0), s"z blew up at $dir")
    }
  }

  test("q_lang_confusion: recount off the declared predictions; grid complete; eval discriminates") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // ground truth off the oracle-green X9 rows: per doc, the stored
      // lang (collapsed en/other) and the declared prediction
      val rows = SparkEntry.queries("q_lang_id")(spark, dir)
        .select(col("lang"), col("pred")).collect()
        .map(r => (if (r.getString(0) == "en") "en" else "other", r.getString(1)))
      val cells = Seq(("en", "en"), ("en", "other"), ("other", "en"), ("other", "other"))
        .map(k => k -> rows.count(_ == k).toLong).toMap
      val (tp, fp, fn, tn) = (cells(("en", "en")), cells(("other", "en")),
        cells(("en", "other")), cells(("other", "other")))
      def r4(num: Long, den: Long): Double =
        if (den == 0) 0.0 else ((20000L * num + den) / (2L * den)) / 10000.0
      val expected = cells.toSeq.sortBy(_._1).map { case ((t, p), c) =>
        (t, p, c, r4(tp + tn, tp + fp + fn + tn), r4(tp, tp + fp),
          r4(tp, tp + fn), r4(2 * tp, 2 * tp + fp + fn))
      }
      val got = SparkEntry.queries("q_lang_confusion")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      assert(got.toSeq === expected, s"confusion recount diverges at $dir")
      // the complete 2x2 grid is always present (zeros included), the
      // counts cover the corpus, and the eval genuinely discriminates:
      // the heuristic is honestly imperfect, so the off-diagonal is
      // non-empty and F1 sits strictly inside (0, 1)
      assert(got.length == 4, s"grid incomplete at $dir")
      assert(got.map(_._3).sum == rows.length, s"grid does not cover the corpus at $dir")
      assert(fp + fn > 0, s"no misclassification at $dir — the eval is vacuous here")
      val f1 = got.head._7
      assert(f1 > 0.0 && f1 < 1.0, s"F1 $f1 not strictly inside (0,1) at $dir")
    }
  }

  test("q_topic_mix: complete grid, every share/lift recounts sequentially at two SFs") {
    import org.apache.spark.sql.functions.col
    val lex = graft.operators.TextAnalysis.topicLexicons
    val minHits = graft.operators.TextAnalysis.topicMinHits
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("source"), col("text")).collect()
        .map(r => (r.getString(0), r.getString(1).split(" ").distinct.toSet))
      val sources = docs.map(_._1).distinct.sorted
      val nS = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val nC = docs.length.toLong
      def q4(num: BigInt, den: BigInt): Double =
        ((num * 20000 + den) / (den * 2)).toLong / 10000.0
      val want = (for (s <- sources; (t, ws) <- lex.toSeq) yield {
        val hits = docs.count { case (src, w) =>
          src == s && ws.count(w.contains) >= minHits
        }.toLong
        val hc = docs.count { case (_, w) => ws.count(w.contains) >= minHits }.toLong
        val lift = if (hc == 0) 0.0
          else q4(BigInt(hits) * nC, BigInt(nS(s)) * hc)
        (s, t, hits, q4(BigInt(hits), BigInt(nS(s))), lift)
      }).sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_topic_mix")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      assert(got === want, s"topic mix recount diverges at $dir")
      // the grid is COMPLETE: |sources| x |topics| rows, no absent cells
      assert(got.size === sources.size * lex.size, "grid not complete")
    }
  }

  test("q_lang_mix: per-source table recounts sequentially at two SFs; both directions live") {
    import org.apache.spark.sql.functions.col
    val stop = Set("the", "a", "of", "to", "and", "is", "in")
    def en(h: Seq[String]): Boolean = 10 * h.count(stop.contains) >= h.size
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("source"), col("text")).collect()
        .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
        .filter(_._2.size >= 2)
      val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ds) =>
        val halves = ds.map { case (_, w) =>
          (en(w.take(w.size / 2)), en(w.drop(w.size / 2)))
        }
        val mixed = halves.count(h => h._1 != h._2).toLong
        val n = ds.size.toLong
        (s, n, mixed, halves.count(h => h._1 && !h._2).toLong,
          halves.count(h => !h._1 && h._2).toLong,
          ((20000L * mixed + n) / (2L * n)) / 10000.0)
      }
      val got = SparkEntry.queries("q_lang_mix")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSeq
      assert(got === want, s"lang-mix recount diverges at $dir")
      if (dir.endsWith("0.01")) {
        assert(got.map(_._4).sum > 0 && got.map(_._5).sum > 0,
          "both code-switch directions should be live on the corpus")
      }
    }
  }

  test("langMixOf: engineered halves, odd-split convention, n<2 ineligibility") {
    import spark.implicits._
    val docs = Seq(
      // 6 words: front half all stopwords -> en; back half none -> mixed, en-front
      ("sX", "the a of xx yy zz"),
      // reverse direction
      ("sX", "xx yy zz the a of"),
      // uniform: both halves en -> not mixed
      ("sX", "the xx the yy the zz"),
      // 5 words: halves are first 2 / last 3 — 'the' as word 3 belongs
      // to the BACK half, so front={xx,yy} other, back en -> mixed
      ("sY", "xx yy the the zz"),
      // single word: ineligible, must not appear in sZ at all
      ("sZ", "the")
    ).toDF("source", "text")
    val got = graft.operators.TextAnalysis.langMixOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      ("sX", 3L, 2L, 1L, 1L, 0.6667),
      ("sY", 1L, 1L, 0L, 1L, 1.0)))
  }

  test("q_template_detect: recounts sequentially at two SFs and finds the planted template") {
    import org.apache.spark.sql.functions.col
    val plen = graft.operators.TextAnalysis.templatePrefixLen
    val floor = graft.operators.TextAnalysis.templateMinDocs
    val stamp = graft.operators.Search.phraseTerms.mkString("", " ", " ")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")).collect()
        .map { r =>
          val t = if (r.getLong(0) % 15 == 0) stamp + r.getString(2) else r.getString(2)
          (r.getLong(0), r.getString(1), t.split(" ").take(plen).mkString(" "))
        }
      val nAll = docs.length.toLong
      val tpl = docs.groupBy(_._3).toSeq
        .map { case (p, ds) =>
          (p, ds.length.toLong, ds.map(_._2).distinct.length.toLong, ds.map(_._1).min)
        }
        .filter(_._2 >= floor).sortBy(_._1)
      val inTpl = tpl.map(_._2).sum
      val share = ((20000L * inTpl + nAll) / (2L * nAll)) / 10000.0
      val want = tpl.map(t => (t._1, t._2, t._3, t._4, share))
      val got = SparkEntry.queries("q_template_detect")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSeq
      assert(got === want, s"template recount diverges at $dir")
      assert(got.exists(_._1 == graft.operators.Search.phraseTerms.mkString(" ")),
        s"the planted template must be found at $dir")
    }
  }

  test("templateDetectOf: floor semantics and cross-source vs source-local spread") {
    import spark.implicits._
    val docs = Seq(
      // template A: 3 docs (at the floor), two sources
      (1L, "s1", "dear customer your invoice xx"),
      (2L, "s2", "dear customer your account yy"),
      (3L, "s1", "dear customer your order zz"),
      // template B: 2 docs (below floor) -> must NOT appear
      (4L, "s1", "terms and conditions aa"),
      (5L, "s2", "terms and conditions bb"),
      // singleton
      (6L, "s3", "something entirely different")
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.TextAnalysis.templateDetectOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(("dear customer your", 3L, 2L, 1L, 0.5)),
      s"floor/spread semantics wrong: ${got.toSeq}")
  }

  test("topicMixOf: membership threshold both branches + absent-topic lift-0 convention") {
    import spark.implicits._
    // one lexicon word is not membership; two distinct are; repeats of
    // one word never count (distinct-word intersect)
    val docs = Seq(
      ("sA", "join join join join"),          // 1 distinct relational word
      ("sA", "join group other"),             // 2 -> member
      ("sB", "filter sort agg"),              // 3 -> member
      ("sB", "nothing here")                  // 0
    ).toDF("source", "text")
    val got = graft.operators.TextAnalysis.topicMixOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(("sA", "relational"))._1 === 1L, "repeat-word doc must not count")
    assert(got(("sB", "relational"))._1 === 1L)
    assert(got(("sA", "relational"))._2 === 0.5)
    // no doc mentions two streaming words: topic absent corpus-wide,
    // lift defined 0 on every cell, zero cells still present
    assert(got(("sA", "streaming")) === ((0L, 0.0, 0.0)))
    assert(got(("sB", "streaming")) === ((0L, 0.0, 0.0)))
    // relational corpus rate = 2/4; sB rate = 1/2 -> lift exactly 1
    assert(got(("sB", "relational"))._3 === 1.0)
  }

  test("q_hll_distinct: native == declarative registers; sequential recount at two SFs") {
    import org.apache.spark.sql.functions._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // sequential truth: per-source registers off the raw text
      val regs = scala.collection.mutable.Map.empty[(String, Long), Long]
      val exact = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
      Tables(spark, dir, "documents").select(col("source"), col("text")).collect()
        .foreach { r =>
          val (src, ws) = (r.getString(0), r.getString(1).split(" ", -1))
          ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).foreach { bg =>
            exact.getOrElseUpdate(src, scala.collection.mutable.Set.empty) += bg
            val h = h60(bg)
            val j = h >>> 52
            val w = h & ((1L << 52) - 1)
            val rho = 53L - (64 - java.lang.Long.numberOfLeadingZeros(w))
            val k = (src, j)
            if (rho > regs.getOrElse(k, 0L)) regs(k) = rho
          }
        }
      // declarative twin must carry exactly the sequential registers
      val toks = graft.operators.TextAnalysis.hllBigrams(
        Tables(spark, dir, "documents").select(col("source"), col("text")))
      val decl = graft.operators.TextAnalysis.hllRegistersDeclarative(toks)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(decl === regs.toMap, s"declarative registers diverge at $dir")
      // estimate recount: s/v per source off the registers, exact
      // integer raw estimate, LC branch via math.log
      val expected = exact.keys.toSeq.sorted.map { src =>
        val mjs = (0L until 256L).map(j => regs.getOrElse((src, j), 0L))
        val s = mjs.map(mj => 1L << (53 - mj)).sum
        val v = mjs.count(_ == 0).toLong
        val estRaw = ((BigInt(2) * 718273 * 65536 * BigInt("9007199254740992") +
          BigInt(1000000) * s) / (BigInt(2000000) * s)).toLong
        val (est, branch) =
          if (estRaw <= 640 && v > 0)
            (math.round(256.0 * math.log(256.0 / v)), "lc")
          else (estRaw, "raw")
        val ex = exact(src).size.toLong
        (src, ex, est, (20000 * est + ex) / (2 * ex) / 10000.0, v, branch)
      }
      val got = SparkEntry.queries("q_hll_distinct")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getString(5)))
      assert(got.toSeq === expected, s"hll estimate diverges at $dir")
      // the sketch does its job: every estimate within the ~6.5%
      // standard-error band (3 sigma) of the exact count, raw branch
      // live on the ~700-bigram sources
      got.foreach { case (src, ex, est, ratio, _, _) =>
        assert(math.abs(est - ex).toDouble / ex < 0.25,
          s"$src estimate $est too far from exact $ex at $dir (ratio $ratio)")
      }
      assert(got.exists(_._6 == "raw"), s"raw branch never fired at $dir")
    }
  }

  test("q_hist_quantiles: sequential recount at two SFs; exact always inside [lo, hi]") {
    import org.apache.spark.sql.functions._
    def binOf(n: Long): (Long, Long, Long) = {
      if (n < 32) (n, n, n)
      else {
        val b = 64 - java.lang.Long.numberOfLeadingZeros(n)
        val shift = b - 5
        val top = n >> shift
        ((b - 5).toLong * 16 + top, top << shift, ((top + 1) << shift) - 1)
      }
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val lens = Tables(spark, dir, "documents").select(col("source"), col("text"))
        .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val expected = lens.keys.toSeq.sorted.flatMap { src =>
        val v = lens(src)
        Seq((50L, 1L, 2L), (90L, 9L, 10L), (99L, 99L, 100L)).map { case (q, qn, qd) =>
          val rank = (qn * v.length + qd - 1) / qd
          val exact = v(rank.toInt - 1)
          // winning bin: least idx whose cumulative count reaches rank
          val bins = v.map(binOf).groupBy(_._1).view
            .mapValues(bs => (bs.head._2, bs.head._3, bs.length.toLong)).toSeq
            .sortBy(_._1)
          var cum = 0L
          val (_, (lo, hi, _)) = bins.find { case (_, (_, _, c)) => cum += c; cum >= rank }.get
          val est = (lo + hi) / 2
          (src, q, v.length.toLong, est, lo, hi, exact,
            (20000 * est + exact) / (2 * exact) / 10000.0)
        }
      }
      val got = SparkEntry.queries("q_hist_quantiles")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
      assert(got.toSeq === expected, s"hist-quantile recount diverges at $dir")
      // the sketch's whole guarantee, pinned on every row
      got.foreach { case (src, q, _, est, lo, hi, exact, _) =>
        assert(lo <= exact && exact <= hi,
          s"$src p$q exact $exact escaped the winning bin [$lo, $hi] at $dir")
        assert(lo <= est && est <= hi)
      }
    }
  }

  test("histBinned: exact below 32, top-5-bit bins above, bounds tile the line") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the boundary octave: 31 is exact, 32 opens the first 2^1-wide
    // bin, 33 shares it, 48 starts a new bin mid-octave
    val got = graft.operators.TextAnalysis.histBinned(
      Seq(1L, 31L, 32L, 33L, 48L, 63L, 64L, 1000000L).toDF("n"))
      .select(col("n"), col("idx"), col("lo"), col("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((1L, 1L, 1L)))
    assert(got(31L) === ((31L, 31L, 31L)))
    assert(got(32L) === ((32L, 32L, 33L)))   // b=6, top=16: idx 16+16
    assert(got(33L) === ((32L, 32L, 33L)))   // same bin as 32
    assert(got(48L) === ((40L, 48L, 49L)))   // top=24: idx 16+24
    assert(got(63L) === ((47L, 62L, 63L)))
    assert(got(64L) === ((48L, 64L, 67L)))   // next octave: width 4
    // wide values: bin width <= n/16 (the 2^-s guarantee)
    val (_, lo, hi) = got(1000000L)
    assert(lo <= 1000000L && 1000000L <= hi && (hi - lo + 1) * 16 <= 2 * 1000000L)
  }

  test("hllEstimate: LC branch fires on tiny domains and v=0 falls back to raw") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted registers: 5 distinct values -> 5 observed buckets at
    // rho=1, 251 empty -> est_raw tiny -> linear counting
    val s5 = 5L * (1L << 52) + 251L * (1L << 53)
    // all 256 buckets at rho=1 (v=0): raw is the only defined branch
    // even when est_raw lands under the 640 threshold
    val s0 = 256L * (1L << 52)
    val got = graft.operators.TextAnalysis.hllEstimate(
      Seq(("tiny", s5, 251L), ("nolc", s0, 0L)).toDF("source", "s", "v_empty"))
      .select(col("source"), col("hll_est"), col("branch"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got("tiny")._2 === "lc")
    assert(got("tiny")._1 === math.round(256.0 * math.log(256.0 / 251.0)))
    assert(got("nolc")._2 === "raw")
    // sanity on the lc value itself: ~5 for 5 planted distincts
    assert(got("tiny")._1 === 5L)
  }

  test("q_entity_stats: java-regex recount over the planted corpus; every counter live") {
    // X162's certificate: re-derive the planted corpus and recount
    // every entity kind with java.util.regex sequentially — the
    // DuckDB oracle does the same with RE2, so a pass on both sides
    // certifies the grammar subset matches identical spans. Base
    // texts are digit-free word salad, so every count is plant-exact.
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      def planted(id: Long, text: String): String = {
        val sb = new StringBuilder(text)
        if (id % 7 == 3) sb.append(s" reach u$id@example.com or u$id@test.org")
        if (id % 11 == 5) sb.append(s" see https://site$id.example.org/p")
        if (id % 13 == 6) sb.append(s" node 10.${id % 250}.0.${id % 200}")
        if (id % 17 == 2) sb.append(s" since ${id % 45 + 1980}")
        sb.toString
      }
      val pats = graft.operators.TextAnalysis.entityPatterns
        .map { case (n, p) => n -> java.util.regex.Pattern.compile(p) }
      val want = docs.groupBy(_._2).map { case (src, ds) =>
        val counts = ds.map { case (id, _, t) =>
          val full = planted(id, t)
          pats.map { case (n, p) =>
            var c = 0L; val m = p.matcher(full); while (m.find()) c += 1; n -> c
          }.toMap
        }
        val sums = pats.map { case (n, _) => n -> counts.map(_(n)).sum }.toMap
        src -> ((ds.size.toLong, sums("emails"), sums("urls"), sums("ipv4s"),
          sums("years"), counts.count(_.values.sum > 0).toLong))
      }
      val got = SparkEntry.queries("q_entity_stats")(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      assert(got === want, s"entity recount diverges at $dir")
      // every kind live somewhere (the plant guarantees it)
      val totals = got.values.toSeq
      assert(totals.map(_._2).sum > 0 && totals.map(_._3).sum > 0 &&
        totals.map(_._4).sum > 0 && totals.map(_._5).sum > 0,
        s"an entity kind went vacuous at $dir")
    }
  }
}

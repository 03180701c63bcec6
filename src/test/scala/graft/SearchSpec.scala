package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the relevance-ranking operators (SURVEY §2.5
  * X17/X18) beyond the DuckDB hash gate — chiefly the SCALE claim:
  * each query explodes the token stream exactly once (the naive
  * df-by-self-join form re-ran the whole scan+explode subtree,
  * because Catalyst does not merge duplicated subtrees).
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.01"

  test("no window is ever keyed by a token column (the Zipf hot-key trap)") {
    // A window partitioned by `tok` puts every occurrence of a hot
    // token on ONE sort task; AQE can skew-split joins but not
    // windows, so a token-keyed window is scale-dead. tfidf's only
    // window is the per-doc rank; bm25 has none.
    Seq("q_tfidf", "q_bm25").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      val tokWindows = plan.linesIterator
        .filter(_.contains("Window ")).filter(_.contains("[tok"))
      assert(tokWindows.isEmpty, s"$q windows over tok: ${tokWindows.mkString}")
    }
    // "Window [" is the exec node; WindowGroupLimit (the rank
    // pushdown, two phases) must not be counted
    val tfidfWindows = "Window \\[".r.findAllIn(
      SparkEntry.queries("q_tfidf")(spark, sf)
        .queryExecution.executedPlan.toString).size
    assert(tfidfWindows === 1, s"tfidf should plan exactly the per-doc rank window, found $tfidfWindows")
  }

  test("bm25 folds its per-term dfs into the one-row stats aggregate (no second token pass)") {
    val plan = SparkEntry.queries("q_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    val explodes = "Generate explode".r.findAllIn(plan).size
    assert(explodes === 1,
      s"bm25 explodes the corpus $explodes times — dfs must come from the stats row, not a second pass")
    assert(!plan.contains("Window"), "bm25 needs no window at all")
  }

  test("tfidf emits a dense per-doc rank over descending rounded scores") {
    val rows = SparkEntry.queries("q_tfidf")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq === (1L to ranked.length),
        s"doc $doc ranks are not dense from 1")
      val scores = ranked.map(_.getDouble(5)).toSeq
      assert(scores === scores.sorted.reverse, s"doc $doc scores not descending: $scores")
    }
    assert(rows.forall(_.getLong(1) <= 3), "rank beyond top-3 leaked")
    // tf and df are exact integers a consumer can re-weight with
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(4) >= 1))
  }

  test("bm25 ranks by descending rounded score with matched-term counts in 1..3") {
    val rows = SparkEntry.queries("q_bm25")(spark, sf).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse, "bm25 scores not descending")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
    // matching more query terms can only help: the top hit matches all
    assert(rows.head.getLong(1) === 3, "top bm25 hit misses a query term — scoring is off")
  }

  test("phrase search finds every planted phrase via the positional index") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("q_phrase_search")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows.nonEmpty, s"vacuous at $dir")
      // the planted truth set: every 15th doc carries the phrase at
      // position 0 and must be a hit
      val nDocs = graft.Tables(spark, dir, "documents").count()
      (0L until nDocs by 15L).foreach { id =>
        assert(rows.get(id).exists(_ >= 1L), s"planted doc $id missed at $dir")
      }
      // adjacency is position math: hits require the CONSECUTIVE
      // phrase, so every reported doc really contains it
      val texts = graft.Tables(spark, dir, "documents")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.foreach { case (id, n) =>
        val t = if (id % 15 == 0) "hash join order " + texts(id) else texts(id)
        val occ = t.split(" ").sliding(3).count(_.sameElements(Seq("hash", "join", "order")))
        assert(occ.toLong == n, s"doc $id: reported $n hits, text has $occ at $dir")
      }
    }
  }

  test("rrf fusion matches a driver recount from its two legs, and two-leg docs dominate") {
    // recount the fusion from the legs' own declared outputs — both
    // oracle-green — ranking in the driver exactly as the operator
    // ranks (rounded score desc, id asc)
    val lex = SparkEntry.queries("q_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val den = SparkEntry.queries("q_sim_cosine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (lex.keySet ++ den.keySet).map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        den.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, lex.get(id), den.get(id), r4(rrf))
    }
    val got = SparkEntry.queries("q_rrf_fusion")(spark, sf).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3))
    }
    assert(got.map(_._1).toSet.size === got.length, "duplicate doc in fused output")
    assert(got.toSet === expected, "fusion diverges from the driver recount")
    // with k = 60 and 20-deep legs, min two-leg score 2/80 beats max
    // one-leg score 1/61 — membership in both legs ALWAYS outranks
    // either leg alone, which is the fusion's whole point
    val (both, single) = got.partition(r => r._2.isDefined && r._3.isDefined)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._4).min > single.map(_._4).max,
        "a two-leg doc scored below a single-leg doc")
    // the output order is the fused ranking
    val scores = got.map(_._4).toSeq
    assert(scores === scores.sorted.reverse, "output not in descending rrf order")
  }

  test("q_rank_eval: metrics recount sequentially from the declared ranking and grades at two SFs") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val terms = graft.operators.Search.bm25Terms.toSet
      // graded truth, recomputed independently from raw text
      val rel = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map { r =>
          val occ = r.getString(1).split(" ").count(terms.contains)
          r.getLong(0) -> (if (occ >= 12) 3L else if (occ >= 9) 2L else if (occ >= 5) 1L else 0L)
        }.toMap
      // the declared ranking, re-ranked exactly as the eval does
      val ranked = SparkEntry.queries("q_bm25")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(2)))
        .sortBy { case (id, sc) => (-sc, id) }
        .zipWithIndex.map { case ((id, _), i) => (i + 1L, rel(id)) }
      def t6(rk: Long, g: Long): Long =
        math.round(1000000.0 * ((1L << g) - 1) / (math.log(rk + 1.0) / math.log(2.0)))
      val histDesc = rel.values.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(-_._1)
      val idealRel = (1 to 20).map { rk =>
        histDesc.foldLeft((0L, -1L)) { case ((cum, found), (g, c)) =>
          if (found >= 0) (cum, found)
          else if (rk <= cum + c) (cum, g) else (cum + c, -1L)
        }._2
      }
      val firstRel3 = ranked.find(_._2 == 3L).map(_._1)
      val mrr = firstRel3.map(r => ((20000L + r) / (2L * r)) / 10000.0).getOrElse(0.0)
      val want = graft.operators.Search.rankEvalKs.map { k =>
        val dcg6 = ranked.filter(_._1 <= k).map { case (rk, g) => t6(rk, g) }.sum
        val idcg6 = idealRel.take(k).zipWithIndex
          .map { case (g, i) => t6(i + 1L, g) }.sum
        val hits = ranked.count { case (rk, g) => rk <= k && g >= 2 }.toLong
        val ndcg = if (idcg6 == 0) 0.0
          else ((BigInt(dcg6) * 20000 + idcg6) / (BigInt(idcg6) * 2)).toLong / 10000.0
        (k.toLong, ((20000L * hits + k) / (2L * k)) / 10000.0, ndcg, mrr)
      }
      val got = SparkEntry.queries("q_rank_eval")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
      assert(got === want, s"rank-eval recount diverges at $dir")
      // the eval must be able to say "imperfect": BM25 length-normalizes,
      // the grade counts occurrences, so strict daylight exists at sf0.01
      if (dir.endsWith("0.01")) {
        assert(got.exists(r => r._3 > 0.0 && r._3 < 1.0),
          s"nDCG degenerate at $dir: $got")
        assert(got.head._4 > 0.0, "MRR vacuous: no rel-3 doc ranked at all")
      }
    }
  }
}

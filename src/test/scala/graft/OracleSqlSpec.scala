package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[OracleSql.materializeShared]] is load-bearing: every declared
  * oracle passes through it, and a wrong transform either corrupts
  * an oracle (syntax error → driver-red) or misses a shared CTE
  * (exponential DuckDB inlining → the r14 budget blowout). Certify
  * the discriminators one by one, then idempotency over the REAL
  * declared surface.
  */
class OracleSqlSpec extends AnyFunSuite {

  test("multiply-referenced CTE is marked, singly-referenced is not") {
    val sql = """WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a), c AS (SELECT x FROM a)
                |SELECT * FROM b JOIN c USING (x)""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1 AS x)"))
    // b and c are each referenced once — untouched
    assert(out.contains("b AS (SELECT x FROM a)"))
    assert(out.contains("c AS (SELECT x FROM a)"))
  }

  test("recursive CTE is never marked, non-recursive members of the same WITH are") {
    val sql = """WITH RECURSIVE base AS (SELECT 1 AS x),
                |r AS (SELECT x FROM base UNION ALL SELECT x + 1 FROM r WHERE x < 3)
                |SELECT * FROM r JOIN base USING (x)""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out.contains("base AS MATERIALIZED (SELECT 1"))
    assert(out.contains("r AS (SELECT x FROM base"))
  }

  test("named WINDOW clause is never marked even when referenced twice") {
    val sql = """WITH t AS (SELECT 1 AS x)
                |SELECT sum(x) OVER w, avg(x) OVER w FROM t
                |WINDOW w AS (PARTITION BY x ORDER BY x)""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out.contains("WINDOW w AS (PARTITION BY"))
  }

  test("parens and fake references inside string literals do not confuse the scan") {
    // the literal contains an unbalanced '(' and the text 'a a a' —
    // masked out, so CTE a still counts exactly one true reference
    val sql = """WITH a AS (SELECT '((( a a a' AS s)
                |SELECT * FROM a""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql, "single-reference CTE with a hostile literal must pass through")
  }

  test("an apostrophe inside a -- comment cannot desync the string mask (r15 ADVICE)") {
    // Before the comment-aware mask, the apostrophe in the comment
    // opened string state, so the NEXT literal's opening quote CLOSED
    // it — the literal body (containing `z AS (` and a fake second
    // reference to a) was then scanned as code: `a` counted 2 refs and
    // was wrongly marked, with "MATERIALIZED " injected INSIDE the
    // comment's text stream. The comment body must be masked instead.
    val sql = """WITH a AS (SELECT 1 AS x) -- don't trip
                |SELECT 'z AS ( a a' AS s FROM a""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql,
      "single-reference CTE after an apostrophe-bearing comment must pass through")
  }

  test("an apostrophe inside a /* */ block comment cannot desync the string mask (r16 ADVICE)") {
    // The line-comment fix left block comments unmasked, so this
    // apostrophe opened string state and the next literal's quote
    // closed it — the literal body (a fake `a` reference) was scanned
    // as code. Block-comment bodies must be masked identically.
    val sql = """WITH a AS (SELECT 1 AS x) /* don't trip */
                |SELECT 'z AS ( a a' AS s FROM a""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql,
      "single-reference CTE after an apostrophe-bearing block comment must pass through")
  }

  test("nested block comments are masked to their true end (DuckDB/Postgres nesting)") {
    // A single-flag scanner closes at the FIRST inner star-slash and
    // treats `FROM a` in the outer comment's tail as a live reference.
    val sql = """WITH a AS (SELECT 1 AS x) /* outer /* inner */ still comment, FROM a */
                |SELECT x FROM a""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql, "references inside a nested block comment must not count")
  }

  test("a column alias or ORDER BY column sharing the CTE name is not a reference (r16 ADVICE)") {
    // Position-blind counting saw three word matches (definition,
    // alias, ORDER BY) and marked this single-use CTE — semantically
    // free but the q_dedup_simhash-class perf cliff. Only table
    // positions (FROM/JOIN/comma) count.
    val sql = """WITH a AS (SELECT 1 AS x)
                |SELECT x AS a FROM a ORDER BY a""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql, s"alias collision must not mark the CTE: $out")
    // and the converse: genuine FROM/JOIN/comma references still count
    val sql2 = """WITH a AS (SELECT 1 AS x)
                 |SELECT * FROM a JOIN a AS b USING (x)""".stripMargin
    assert(OracleSql.materializeShared(sql2).contains("a AS MATERIALIZED"),
      "two genuine table references must still mark")
  }

  test("a CTE name defined twice (nested shadowing) is never marked (DuckDB duplicate-alias)") {
    // DuckDB 1.0 rejects an outer MATERIALIZED CTE whose name a CTE
    // nested in another body reuses — measured on q_dup_flow (r17):
    // `Binder Error: Duplicate alias "m"`. Both definitions must stay
    // unmarked; non-colliding shared CTEs in the same query still mark.
    val sql = """WITH p AS (
                |  WITH m AS (SELECT 1 AS id) SELECT id FROM m
                |),
                |m AS (SELECT 1 AS id, 'x' AS s),
                |shared AS (SELECT id FROM p)
                |SELECT * FROM shared JOIN shared s2 USING (id)
                |  JOIN m ma ON ma.id = p0.id JOIN m mb ON mb.id = p0.id
                |  , p p0""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(!out.contains("m AS MATERIALIZED"), s"shadowed name must never be marked: $out")
    assert(out.contains("shared AS MATERIALIZED"), "non-colliding shared CTE must still mark")
  }

  test("a comma-preceded column QUALIFIER is not a table reference (r17 review)") {
    // `COALESCE(lex.doc_id, den.doc_id)` puts `den` right after a
    // comma — the one comma context that is NOT a FROM-list item. A
    // single-use CTE must stay unmarked despite qualified-column hits.
    val sql = """WITH den AS (SELECT 1 AS doc_id, 2 AS r)
                |SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id, den.r
                |FROM lex FULL JOIN den ON lex.doc_id = den.doc_id
                |ORDER BY den.r, den.doc_id""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql, s"qualifier hits must not mark the single-use CTE: $out")
    // and a genuine comma FROM-list reference still counts
    val sql2 = """WITH den AS (SELECT 1 AS x)
                 |SELECT * FROM other, den WHERE other.x = den.x AND den.x IN (SELECT x FROM den)"""
      .stripMargin
    assert(OracleSql.materializeShared(sql2).contains("den AS MATERIALIZED"),
      "comma FROM-list + subquery references must still mark")
  }

  test("a comma-preceded expression-context hit is not a table reference (r18 ADVICE)") {
    // A SELECT-list bare column, a GROUP BY item, and a function
    // argument all sit right after a comma; none is a FROM-list item.
    // A single-use CTE must stay unmarked through all three (the
    // spurious mark is semantics-safe but the measured perf-cliff
    // over-marking class).
    val sql = """WITH den AS (SELECT 1 AS den)
                |SELECT a, den, greatest(a, den) AS g
                |FROM t JOIN den USING (den)
                |GROUP BY a, den""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out === sql, s"expression-context hits must not mark the single-use CTE: $out")
    // a FROM-list comma ref after a USING join still counts (ON and
    // USING are continue-tokens in the backward clause scan: a
    // depth-0 comma after a join condition is back in the FROM list)
    val sql2 = """WITH den AS (SELECT 1 AS x)
                 |SELECT * FROM o JOIN t USING (x), den WHERE t.y IN (SELECT x FROM den)"""
      .stripMargin
    assert(OracleSql.materializeShared(sql2).contains("den AS MATERIALIZED"),
      "comma FROM-list ref after a USING join must still count")
  }

  test("a WINDOW spec sharing a shared CTE's name does not suppress its mark (r17 review)") {
    // window names and CTE names live in separate namespaces; the
    // defCounts shadow rule must only count QUERY-body definitions,
    // or this legal query loses its materialization.
    val sql = """WITH w AS (SELECT 1 AS x)
                |SELECT sum(x) OVER w AS s, b.x FROM w JOIN w b USING (x)
                |WINDOW w AS (PARTITION BY x)""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out.contains("WITH w AS MATERIALIZED (SELECT 1"),
      s"the shared CTE must still mark beside a same-named window spec: $out")
    assert(out.contains("WINDOW w AS (PARTITION BY"), "the window spec itself must stay unmarked")
  }

  test("a multiply-referenced CTE is still marked when a comment precedes it") {
    val sql = """WITH a AS (SELECT 1 AS x), -- shared 'twice'
                |b AS (SELECT x FROM a), c AS (SELECT x FROM a)
                |SELECT * FROM b JOIN c USING (x)""".stripMargin
    val out = OracleSql.materializeShared(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1"),
      s"comment must not hide the shared CTE: $out")
    assert(!out.contains("b AS MATERIALIZED") && !out.contains("c AS MATERIALIZED"))
  }

  test("already-marked CTEs pass through; transform is idempotent on synthetic input") {
    val sql = """WITH a AS MATERIALIZED (SELECT 1 AS x), b AS (SELECT x FROM a), c AS (SELECT x FROM a)
                |SELECT * FROM b JOIN c USING (x), a""".stripMargin
    val once = OracleSql.materializeShared(sql)
    assert(once === OracleSql.materializeShared(once))
    assert(once.contains("a AS MATERIALIZED (SELECT 1"))
  }

  test("the inline-ctes marker opts an oracle out entirely") {
    val sql = s"""${OracleSql.inlineMarker}
                 |WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a), c AS (SELECT x FROM a)
                 |SELECT * FROM b JOIN c USING (x)""".stripMargin
    assert(OracleSql.materializeShared(sql) === sql,
      "marked oracle must pass through untouched")
  }

  test("the assembled declared surface is a fixed point (no shared CTE left unmarked)") {
    // SparkEntry.oracleSql already applies the transform; re-applying
    // must change nothing. This sweeps every real oracle: if a future
    // generator shape slips past the scanner in a way a second pass
    // WOULD catch (the only observable miss class), this pins it.
    val oracles = SparkEntry.oracleSql
    assert(oracles.size >= 197, s"declared oracle surface shrank: ${oracles.size}")
    for ((name, sql) <- oracles) {
      assert(OracleSql.materializeShared(sql) === sql,
        s"$name: assembled oracle is not a fixed point of materializeShared")
    }
  }
}

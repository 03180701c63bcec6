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

package graft

/** Post-processor for the DuckDB oracle SQL the driver replays.
  *
  * DuckDB inlines a CTE at every reference site unless it is marked
  * `AS MATERIALIZED`. For a linear chain that is harmless, but the
  * moment a CTE is referenced twice its whole upstream is computed
  * twice — and an unrolled iteration chain where each step reads its
  * predecessor from two places (pairs + apply, the BPE/PCA/Lloyd
  * shape) recomputes the prefix 2^N times. That single mechanism is
  * what grew the r14 oracle check past the driver's budget
  * (q_bpe_merges 89 s, q_bpe_encode 72 s, q_pipeline minutes — all
  * sub-second once shared CTEs materialize; the q_pca_power
  * 11-min → 0.13 s fix in r13 was the first sighting).
  *
  * Hand-marking every generator is a losing game — 197 oracles and
  * growing, and one miss silently costs minutes. So the assembly
  * point ([[SparkEntry.oracleSql]]) runs every oracle through
  * [[materializeShared]]: every CTE referenced more than once is
  * marked `AS MATERIALIZED` mechanically. The transform is purely
  * syntactic and semantics-preserving (materialization never changes
  * a result, only the evaluation strategy); recursive CTEs
  * (self-referencing — materialization is meaningless and rejected
  * there) are left alone, and already-marked CTEs pass through
  * unchanged, so the transform is idempotent and composes with
  * generators that hand-mark their hot CTEs.
  */
object OracleSql {

  /** Replace the contents of single-quoted SQL string literals and
    * `--` line comments with 'x' (same length, so indexes stay
    * aligned with the original): paren balancing and identifier
    * counting must not see literal or comment content — a regex
    * character class inside a redaction pattern would otherwise
    * unbalance the CTE body scan, and an apostrophe inside a comment
    * would desync the string state, after which a literal containing
    * text like `x AS (` could be treated as code (r15 ADVICE).
    * Standard '' escaping degrades gracefully (the escaped quote
    * toggles state twice, masking everything between the outer
    * quotes).
    */
  private def mask(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var inStr = false
    var inCmt = false
    while (i < out.length) {
      if (inStr) {
        if (out(i) == '\'') inStr = false else out(i) = 'x'
      } else if (inCmt) {
        if (out(i) == '\n') inCmt = false else out(i) = 'x'
      } else if (out(i) == '\'') {
        inStr = true
      } else if (out(i) == '-' && i + 1 < out.length && out(i + 1) == '-') {
        inCmt = true
        out(i) = 'x' // mask both dashes so `name AS (` in a comment can't match
      }
      i += 1
    }
    new String(out)
  }

  /** Opt-out marker: an oracle whose first line carries this comment
    * is passed through untouched. Materialization is semantically
    * free but NOT always cheap — it denies DuckDB whole-tree
    * optimization, and for q_dedup_simhash that is a 6× sf1-shape
    * regression (all-inline 14.6 s vs any-marked 70–287 s: the 8
    * signature-UNION legs recompute the chain inlined, but the
    * materialized plan loses statistics into a far worse probe-join
    * order). A generator that has MEASURED inlining to be faster
    * opts out explicitly; the default stays materialize-shared,
    * because the opposite failure mode (2^N chain recompute) is
    * unbounded while re-inlining is at worst a constant factor.
    */
  val inlineMarker = "-- graft:inline-ctes"

  private val cteDef = """([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+\(""".r

  /** Mark every multiply-referenced, non-recursive CTE in `sql` as
    * `AS MATERIALIZED`. Over-approximation is safe: materializing a
    * singly-referenced CTE changes nothing semantically, so name
    * collisions with base tables or columns only ever add a harmless
    * mark. Under-approximation cannot happen — a CTE referenced
    * twice has its name in the text at least three times (definition
    * + two references).
    */
  def materializeShared(sql: String): String = {
    if (sql.contains(inlineMarker)) return sql
    val m = mask(sql)
    // Insertion points (index of the body-opening paren) for CTEs
    // that qualify, collected on the masked text, applied to the
    // original (masking preserves length/indexes).
    val inserts = cteDef.findAllMatchIn(m).flatMap { mt =>
      val name = mt.group(1)
      val open = mt.end - 1
      // Balanced-paren scan for the body extent on the masked text.
      var depth = 0
      var i = open
      var close = -1
      while (i < m.length && close < 0) {
        m.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      // A named-WINDOW clause (`WINDOW w AS (PARTITION BY …)`) matches
      // the same `name AS (` shape but must never be marked: a CTE
      // body always opens with a query keyword, a window spec never
      // does — discriminate on the first body token.
      val bodyHead = m.drop(open + 1).dropWhile(_.isWhitespace)
      val isQueryBody = Seq("SELECT", "VALUES", "WITH", "FROM")
        .exists(k => bodyHead.regionMatches(true, 0, k, 0, k.length))
      if (close < 0 || !isQueryBody) None // window spec / unbalanced — leave untouched
      else {
        val word = ("""\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
        val selfRefs = word.findAllIn(m.substring(open, close + 1)).size
        val totalRefs = word.findAllIn(m).size - 1 - selfRefs // minus definition
        if (selfRefs > 0) None // recursive CTE — cannot materialize
        else if (totalRefs >= 2) Some(open)
        else None
      }
    }.toSeq
    // Apply right-to-left so earlier indexes stay valid.
    inserts.sorted.reverse.foldLeft(sql) { (acc, pos) =>
      acc.substring(0, pos) + "MATERIALIZED " + acc.substring(pos)
    }
  }
}

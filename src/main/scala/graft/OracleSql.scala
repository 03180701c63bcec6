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

  /** Replace the contents of single-quoted SQL string literals, `--`
    * line comments, and slash-star block comments with 'x' (same
    * length, so indexes stay aligned with the original): paren
    * balancing and identifier counting must not see literal or
    * comment content — a regex character class inside a redaction
    * pattern would otherwise unbalance the CTE body scan, and an
    * apostrophe inside a comment would desync the string state, after
    * which a literal containing text like `x AS (` could be treated
    * as code (r15 ADVICE for line comments; r16 ADVICE extended the
    * same argument to block comments, which NEST in DuckDB/Postgres —
    * hence the depth counter, a single flag would close at the first
    * inner star-slash). Standard '' escaping degrades gracefully (the
    * escaped quote toggles state twice, masking everything between
    * the outer quotes).
    */
  private def mask(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var inStr = false
    var inLine = false
    var blk = 0 // block-comment nesting depth
    while (i < out.length) {
      if (inStr) {
        if (out(i) == '\'') inStr = false else out(i) = 'x'
      } else if (inLine) {
        if (out(i) == '\n') inLine = false else out(i) = 'x'
      } else if (blk > 0) {
        if (out(i) == '*' && i + 1 < out.length && out(i + 1) == '/') {
          out(i) = 'x'; out(i + 1) = 'x'; blk -= 1; i += 1
        } else if (out(i) == '/' && i + 1 < out.length && out(i + 1) == '*') {
          out(i) = 'x'; out(i + 1) = 'x'; blk += 1; i += 1
        } else if (out(i) != '\n') out(i) = 'x'
      } else if (out(i) == '\'') {
        inStr = true
      } else if (out(i) == '-' && i + 1 < out.length && out(i + 1) == '-') {
        inLine = true
        out(i) = 'x' // mask both dashes so `name AS (` in a comment can't match
      } else if (out(i) == '/' && i + 1 < out.length && out(i + 1) == '*') {
        blk = 1
        out(i) = 'x'; out(i + 1) = 'x'; i += 1
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

  /** Positions where `name` occurs as a TABLE reference in the masked
    * text — a word-boundary occurrence whose previous token is FROM,
    * JOIN, or a comma (the FROM-list separator), excluding CTE
    * definition sites (followed by `AS (` or `AS MATERIALIZED (`,
    * which a comma can also precede inside a WITH list). This is the
    * r16 ADVICE fix for position-BLIND counting: the old whole-text
    * count treated a column alias or ORDER BY column that happened to
    * share the CTE's name as a reference, over-marking a single-use
    * CTE — semantically free but a measured perf cliff (the
    * q_dedup_simhash 6× class is exactly "materialized when it
    * shouldn't be"). A match whose next character is `.` is a COLUMN
    * QUALIFIER (`COALESCE(lex.doc_id, den.doc_id)` puts `den` after a
    * comma — the r17 review's over-marking class), never a FROM-list
    * item, and is excluded. The accepted contexts are exhaustive for
    * the SELECT-only oracles this engine generates; a form that slips
    * past UNDER-counts, which the mandatory slow-oracle gate in
    * tools/check.py catches as a timing cliff rather than silently.
    */
  private def tableRefPositions(m: String, name: String): Seq[Int] = {
    def prevToken(pos: Int): String = {
      var j = pos - 1
      while (j >= 0 && m.charAt(j).isWhitespace) j -= 1
      if (j < 0) return ""
      val c = m.charAt(j)
      if (!c.isLetterOrDigit && c != '_') return c.toString
      val end = j
      while (j >= 0 && { val ch = m.charAt(j); ch.isLetterOrDigit || ch == '_' }) j -= 1
      m.substring(j + 1, end + 1)
    }
    def isDefinitionSite(after: Int): Boolean = {
      var j = after
      while (j < m.length && m.charAt(j).isWhitespace) j += 1
      if (!m.regionMatches(true, j, "AS", 0, 2)) return false
      j += 2
      if (j < m.length && { val ch = m.charAt(j); ch.isLetterOrDigit || ch == '_' }) return false
      while (j < m.length && m.charAt(j).isWhitespace) j += 1
      if (m.regionMatches(true, j, "MATERIALIZED", 0, 12)) {
        j += 12
        while (j < m.length && m.charAt(j).isWhitespace) j += 1
      }
      j < m.length && m.charAt(j) == '('
    }
    // A comma-preceded match is a table reference ONLY when that comma
    // belongs to a FROM list (r18 ADVICE: a SELECT-list bare column,
    // GROUP BY item, or function argument like `greatest(a, den)` also
    // sits right after a comma and was spuriously marking single-use
    // CTEs MATERIALIZED — the measured perf-cliff over-marking class).
    // Decide by walking BACKWARD at the match's paren depth: the
    // nearest depth-0 clause keyword settles it — FROM accepts, any
    // expression-clause head (SELECT/BY/HAVING/CASE arms/…) rejects;
    // ON and USING are *continue* tokens because a depth-0 comma after
    // a join condition is back in the FROM list (`JOIN c USING (x),
    // a`), while a bare depth-0 comma INSIDE those clauses is not
    // legal SQL. Crossing an unmatched `(` first means the comma
    // separates call arguments or a nested expression list — reject
    // (balanced parens, e.g. a FROM-list subquery, are skipped whole).
    // Both residual miss classes stay perf-only under the mandatory
    // slow-oracle gate in tools/check.py.
    val clauseReject = Set("SELECT", "WHERE", "BY", "HAVING",
      "WHEN", "THEN", "ELSE", "CASE", "IN", "VALUES", "SET",
      "WINDOW", "LIMIT", "OVER", "RETURNING")
    def commaInFromList(pos: Int): Boolean = {
      var j = pos - 1
      var depth = 0
      while (j >= 0) {
        val c = m.charAt(j)
        if (c == ')') depth += 1
        else if (c == '(') {
          if (depth == 0) return false
          depth -= 1
        } else if (depth == 0 && (c.isLetterOrDigit || c == '_')) {
          val end = j
          while (j >= 0 && { val ch = m.charAt(j); ch.isLetterOrDigit || ch == '_' }) j -= 1
          val tok = m.substring(j + 1, end + 1).toUpperCase
          if (tok == "FROM") return true
          if (clauseReject.contains(tok)) return false
          j += 1 // identifier/alias/number: keep walking past it
        }
        j -= 1
      }
      false
    }
    val word = ("""(?i)\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
    word.findAllMatchIn(m).collect {
      case mt if {
        val pt = prevToken(mt.start)
        val qualifier = mt.end < m.length && m.charAt(mt.end) == '.'
        (pt.equalsIgnoreCase("FROM") || pt.equalsIgnoreCase("JOIN") ||
          (pt == "," && commaInFromList(mt.start))) &&
        !qualifier && !isDefinitionSite(mt.end)
      } => mt.start
    }.toSeq
  }

  /** Mark every multiply-referenced, non-recursive CTE in `sql` as
    * `AS MATERIALIZED`. References are counted positionally (see
    * [[tableRefPositions]]); marking a CTE never changes a result,
    * only DuckDB's evaluation strategy, so the residual risk on both
    * sides is performance, which the slow-oracle gate measures.
    */
  def materializeShared(sql: String): String = {
    if (sql.contains(inlineMarker)) return sql
    val m = mask(sql)
    // One scan collecting every `name AS (` site with its body extent
    // and whether the body opens with a query keyword — a named-WINDOW
    // clause (`WINDOW w AS (PARTITION BY …)`) matches the same shape
    // but is NOT a CTE definition and must count as neither an
    // insertion candidate nor a definition (r17 review: counting a
    // window spec in defCounts would silently unmark a genuine shared
    // CTE that happens to share the window's name — legal SQL, the
    // namespaces are separate).
    case class Def(name: String, open: Int, close: Int, isQueryBody: Boolean)
    val defs = cteDef.findAllMatchIn(m).map { mt =>
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
      val bodyHead = m.drop(open + 1).dropWhile(_.isWhitespace)
      val isQueryBody = Seq("SELECT", "VALUES", "WITH", "FROM")
        .exists(k => bodyHead.regionMatches(true, 0, k, 0, k.length))
      Def(mt.group(1), open, close, isQueryBody)
    }.toSeq
    // A name DEFINED more than once (an outer CTE colliding with one
    // nested inside another CTE's body — legal SQL, the inner shadows)
    // must never be marked: DuckDB 1.0's binder rejects an outer
    // MATERIALIZED CTE whose name a nested CTE reuses ("Duplicate
    // alias"), measured on q_dup_flow in r17 — the position-blind r16
    // counter only dodged it by ALSO over-marking the enclosing CTE,
    // which isolates the nested scope. Skipping the collision is
    // semantics-preserving (inlining always binds); the refs are
    // cross-scope-ambiguous anyway, so no honest count exists.
    val defCounts = defs.filter(_.isQueryBody)
      .groupBy(_.name).view.mapValues(_.size).toMap
    // Insertion points (index of the body-opening paren) for CTEs
    // that qualify, collected on the masked text, applied to the
    // original (masking preserves length/indexes).
    val inserts = defs.flatMap { d =>
      if (d.close < 0 || !d.isQueryBody) None // window spec / unbalanced — leave untouched
      else if (defCounts.getOrElse(d.name, 0) > 1) None // shadowed name — never mark
      else {
        val refs = tableRefPositions(m, d.name)
        val selfRefs = refs.count(p => p > d.open && p < d.close)
        if (selfRefs > 0) None // recursive CTE — cannot materialize
        else if (refs.size >= 2) Some(d.open)
        else None
      }
    }
    // Apply right-to-left so earlier indexes stay valid.
    inserts.sorted.reverse.foldLeft(sql) { (acc, pos) =>
      acc.substring(0, pos) + "MATERIALIZED " + acc.substring(pos)
    }
  }
}

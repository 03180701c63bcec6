package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering the native vector expressions as SQL
  * functions (`graft_dot`, `graft_norm_sq`). Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * — done by Verify/Bench/Explain and the test fixture; any downstream
  * session that wants the fast path does the same.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_norm_sq"),
      new ExpressionInfo(classOf[ArrayNormSq].getName, "graft_norm_sq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayNormSq(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2_sq"),
      new ExpressionInfo(classOf[ArrayL2Sq].getName, "graft_l2_sq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayL2Sq(children(0), children(1))))
    // one-pass MinHash signature sketch (the analyzer wraps the
    // AggregateFunction into an AggregateExpression on resolution)
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "graft_minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSketch(children(0))))
    // one-pass upper-triangle gram accumulator (X93 scale path)
    ext.injectFunction((
      FunctionIdentifier("graft_gram_sketch"),
      new ExpressionInfo(classOf[GramSketch].getName, "graft_gram_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GramSketch(children(0))))
    // codegen'd Unicode NFC normalization
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children(0))))
    // Misra–Gries frequent-items sketch: graft_mg_topk(tok, capacity)
    // (capacity must be a foldable integer literal — validated here so
    // SQL misuse gets a clean analysis error, not an NPE/cast crash)
    ext.injectFunction((
      FunctionIdentifier("graft_mg_topk"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_mg_topk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"graft_mg_topk(tok, capacity) takes exactly 2 arguments, got ${children.length}")
        val cap = children(1) match {
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case e => throw new IllegalArgumentException(
            s"graft_mg_topk capacity must be a foldable INT literal, got ${e.sql}")
        }
        if (cap < 1)
          throw new IllegalArgumentException(s"graft_mg_topk capacity must be >= 1, got $cap")
        MisraGries(children(0), cap)
      }))
    // count–min sketch: graft_cms(tok, depth, width) — same
    // foldable-literal validation discipline as graft_mg_topk
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsSketch].getName, "graft_cms"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3)
          throw new IllegalArgumentException(
            s"graft_cms(tok, depth, width) takes exactly 3 arguments, got ${children.length}")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
          e match {
            case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
              l.eval().asInstanceOf[Int]
            case l => throw new IllegalArgumentException(
              s"graft_cms $name must be a foldable INT literal, got ${l.sql}")
          }
        val depth = intLit(children(1), "depth")
        val width = intLit(children(2), "width")
        if (depth < 1 || depth > CmsSketch.maxDepth)
          throw new IllegalArgumentException(
            s"graft_cms depth must be in [1, ${CmsSketch.maxDepth}], got $depth")
        if (width < 1)
          throw new IllegalArgumentException(s"graft_cms width must be >= 1, got $width")
        CmsSketch(children(0), depth, width)
      }))
    // content-defined chunking: token array -> chunk md5 array in one
    // native per-row loop (the HOF form pays a ~40x interpretation tax)
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CdcChunks(children(0))))
    // X67 hashed-feature classifier scan: text -> (score6, n_feats)
    // in one native loop with a per-JVM bucket-weight table (the
    // CdcChunks argument; this is the gate-scored hot path)
    ext.injectFunction((
      FunctionIdentifier("graft_clf_score"),
      new ExpressionInfo(classOf[ClfScore].getName, "graft_clf_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ClfScore(children(0))))
    // one-pass HyperLogLog register sketch (X157 scale path): the
    // cross-engine-deterministic cardinality member of the family
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllSketch(children(0))))
    // one-pass SimHash majority-vote sketch
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_sketch"),
      new ExpressionInfo(classOf[SimHashSketch].getName, "graft_simhash_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashSketch(children(0))))
    // exact bounded top-K per group: graft_topk(score4, id, payload, k)
    // (k a foldable INT literal — the graft_mg_topk validation rule)
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKSketch].getName, "graft_topk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 4)
          throw new IllegalArgumentException(
            s"graft_topk(score4, id, payload, k) takes exactly 4 arguments, got ${children.length}")
        val kk = children(3) match {
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case e => throw new IllegalArgumentException(
            s"graft_topk k must be a foldable INT literal, got ${e.sql}")
        }
        TopKSketch(children(0), children(1), children(2), kk)
      }))
    // HOF dot/normSq/l2Sq patterns rewrite to the native expressions
    ext.injectOptimizerRule(_ => graft.plans.RewriteVectorHofs)
    // vector top-K pushdown: early-abandon scoring below the running
    // k-th-best bound (spark.graft.topk.pushdown=false to disable)
    ext.injectPlannerStrategy(_ => graft.plans.ScoredTopKPushdown)
  }
}

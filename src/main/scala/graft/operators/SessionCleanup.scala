package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Teardown backstop for the session-keyed memo caches (the dedup
  * shingle/sketch indexes in [[Dedup]], the ANN query vectors in
  * [[Similarity]]). The manual calls — [[Dedup.releaseIndexes]], which
  * also covers the query vectors — remain the intended lifecycle for
  * long-lived drivers; this hook bounds the damage when callers forget
  * them:
  *
  *  - the first memo insert per SparkContext arms a listener that
  *    releases every entry belonging to that context's sessions at
  *    application end;
  *  - every arm() first sweeps entries whose context has already
  *    stopped (their cached blocks are gone with the executors, so the
  *    memoized plans are unreachable dead weight).
  *
  * Spark exposes no finer-grained session-close event to hook — all
  * sessions of a driver share one context — so entries of a LIVE
  * context's abandoned sessions still need the manual release; what
  * this removes is the unbounded JVM-lifetime pinning across
  * context restarts (create → use → stop → create …), the multi-
  * session driver pattern the r8 ADVICE flagged.
  */
private[graft] object SessionCleanup {

  private val armed = scala.collection.concurrent.TrieMap.empty[SparkContext, Unit]

  def arm(s: SparkSession): Unit = {
    release(_.sparkContext.isStopped)
    val sc = s.sparkContext
    if (armed.putIfAbsent(sc, ()).isEmpty)
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          release(_.sparkContext eq sc)
          armed.remove(sc)
        }
      })
  }

  private def release(cond: SparkSession => Boolean): Unit = {
    Dedup.releaseIndexes(cond)
    Similarity.releaseQueryVecs(cond)
    Clustering.releaseLabels(cond)
    TextAnalysis.releaseBpe(cond)
  }
}

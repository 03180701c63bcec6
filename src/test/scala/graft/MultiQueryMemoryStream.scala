package graft

import org.apache.spark.sql.{Encoder, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, MemoryStream}

import java.util.concurrent.atomic.AtomicInteger

/** A MemoryStream safe to share across several concurrently-
  * RESTARTING queries (the hot-reload tests): the stock MemoryStream
  * enforces strictly-monotone commits, which is right for a single
  * consumer but inherently racy for fan-out — N queries share the one
  * stream object while each tracks its own per-checkpoint progress,
  * so after a stop/restart cycle a lagging sibling can re-commit an
  * offset another query already passed, and the whole restarted query
  * dies with "Offsets committed out of order" (observed ~1-in-3 full-
  * suite runs under load; never in isolation).
  *
  * That strictness is a test-harness artifact, not a semantics issue:
  * `commit` is an advisory buffer-truncation point (the socket source
  * the production gateway reads ignores it entirely, Kafka treats it
  * as progress metadata), so dropping a LAGGING commit merely keeps a
  * few more rows buffered — it can never lose or duplicate data,
  * which the assertions of every test using this class still verify
  * end-to-end through the sink contents.
  */
final class MultiQueryMemoryStream[A: Encoder](id: Int, sqlContext: SQLContext)
    extends MemoryStream[A](id, sqlContext.sparkSession, None) {
  override def commit(end: OffsetV2): Unit = synchronized {
    end match {
      case l: LongOffset if l.offset < lastOffsetCommitted.offset =>
        () // a lagging sibling query — ignore, keep the buffer
      case _ => super.commit(end)
    }
  }
}

object MultiQueryMemoryStream {
  // ids only need to not collide with the stock MemoryStream counter
  // within one test JVM
  private val ids = new AtomicInteger(9000)
  def apply[A: Encoder]()(implicit sqlContext: SQLContext): MultiQueryMemoryStream[A] =
    new MultiQueryMemoryStream[A](ids.getAndIncrement(), sqlContext)
}

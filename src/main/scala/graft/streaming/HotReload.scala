package graft.streaming

import graft.streaming.Gateway.GatewayConf
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

/** B6 — the runnable hot-reload loop (※ oemgateway.py ·
  * check_settings: the daemon re-reads the ConfigObj every cycle and
  * applies changed `runtime_settings` to the live components).
  *
  * A running Spark plan cannot be mutated, so the honest equivalent —
  * documented at [[Gateway.hotReloadNote]] and proven by GatewaySpec's
  * kill-restart test — is stop + restart from checkpoint: windowed
  * state survives in the state store, the new settings (active flags,
  * periods, sink targets) take effect on restart, and the idempotent
  * sink absorbs the replayed tail.
  *
  * This class is the loop itself: a daemon thread polls the conf file
  * and, when its *content* changes (content compare, not mtime — the
  * reference also compares parsed settings, and mtime granularity is
  * filesystem-dependent), re-parses it and runs the restart cycle.
  * Parse errors in the rewritten conf are logged and skipped — the
  * running queries keep the last good settings, matching the
  * reference's keep-running-on-bad-reload behavior.
  *
  * Driver-side only (query lifecycle is a driver concern in Spark);
  * nothing here touches the data path, so scale is unaffected.
  *
  * `startQueries` must call the supplied callback with each query AS
  * IT STARTS (not just return the completed Seq): when starting query
  * 3 of 3 throws, queries 1–2 exist but a thrown call returns
  * nothing, so the callback is the only way [[HotReload]] can stop
  * the survivors before reverting — otherwise the revert collides
  * with them on the same checkpoint dirs / query names and the
  * "failed" conf's orphans keep running untracked.
  * [[Gateway.start]]/[[Gateway.run]] take the callback directly.
  */
final class HotReload(
    confPath: Path,
    pollMillis: Long,
    parse: String => GatewayConf,
    startQueries: (GatewayConf, StreamingQuery => Unit) => Unit)
  extends AutoCloseable {

  @volatile private var current: Seq[StreamingQuery] = Nil
  @volatile private var running = true
  private var lastText = readConf()
  private val reloadCount = new AtomicLong(0)
  private val failCount = new AtomicLong(0)
  private var lastGood: GatewayConf = parse(lastText)

  current = startTracked(lastGood)

  private def readConf(): String =
    new String(Files.readAllBytes(confPath), UTF_8)

  private def stop(qs: Seq[StreamingQuery]): Unit = qs.foreach { q =>
    try q.stop()
    catch { case NonFatal(e) => System.err.println(s"hot-reload: stop failed: ${e.getMessage}") }
  }

  private def stopAll(): Unit = stop(current)

  /** Run `startQueries`, tracking partial progress: if it throws
    * after starting a subset, that subset is STOPPED before the
    * failure propagates, so the caller (revert included) never races
    * half-started queries for checkpoints or query names.
    */
  private def startTracked(conf: GatewayConf): Seq[StreamingQuery] = {
    val started = scala.collection.mutable.ArrayBuffer[StreamingQuery]()
    try {
      startQueries(conf, started += _)
      started.toSeq
    } catch {
      case NonFatal(e) =>
        if (started.nonEmpty)
          System.err.println(
            s"hot-reload: start failed after ${started.size} queries; stopping the partial set")
        stop(started.toSeq)
        throw e
    }
  }

  /** One reload cycle. Failure handling (r6 verdict task 5): a bad
    * conf that fails to PARSE is rejected before anything stops —
    * the running queries never notice. A conf that parses but fails
    * to START (sink dir, checkpoint, Spark state) happens after the
    * old queries are stopped, so the cycle first stops whatever
    * subset the failed start DID create ([[startTracked]]) and then
    * restarts the last good conf instead — the gateway keeps running
    * on the previous settings, matching the reference's
    * keep-running-on-bad-reload behavior. Every failure path
    * increments [[failures]]; nothing here can escape and kill the
    * watcher thread.
    */
  private def reloadCycle(text: String): Unit = {
    val parsed =
      try Some(parse(text))
      catch {
        case NonFatal(e) =>
          failCount.incrementAndGet()
          System.err.println(s"hot-reload: ignoring invalid conf: ${e.getMessage}")
          None
      }
    parsed.foreach { conf =>
      stopAll()
      try {
        current = startTracked(conf)
        lastGood = conf
        reloadCount.incrementAndGet()
      } catch {
        case NonFatal(e) =>
          System.err.println(
            s"hot-reload: restart with new conf failed (${e.getMessage}); reverting to last good conf")
          try current = startTracked(lastGood)
          catch {
            case NonFatal(e2) =>
              failCount.incrementAndGet()
              System.err.println(s"hot-reload: revert to last good conf failed: ${e2.getMessage}")
          }
          // incremented LAST so failures ≥ 1 implies the revert attempt
          // has completed and `queries` reflects the outcome
          failCount.incrementAndGet()
      }
    }
  }

  private val watcher = new Thread(() => {
    while (running) {
      try {
        Thread.sleep(pollMillis)
        val text = try readConf() catch { case _: java.io.IOException => lastText }
        if (running && text != lastText) {
          lastText = text
          reloadCycle(text)
        }
      } catch {
        case _: InterruptedException => () // close() racing the sleep
        case NonFatal(e) =>
          // never let a cycle error kill the watcher: next rewrite
          // still gets a chance to reload
          System.err.println(s"hot-reload: watcher cycle error: ${e.getMessage}")
      }
    }
  }, s"gateway-hot-reload-${confPath.getFileName}")
  watcher.setDaemon(true)
  watcher.start()

  /** The queries currently running (changes identity on each reload). */
  def queries: Seq[StreamingQuery] = current

  /** How many successful reload cycles have run. */
  def reloads: Long = reloadCount.get()

  /** How many reload attempts failed (parse, start, or revert). */
  def failures: Long = failCount.get()

  override def close(): Unit = {
    running = false
    watcher.join(Math.max(pollMillis * 4, 2000L))
    current.foreach(_.stop())
  }
}

object HotReload {

  /** Production shape: watch an oemgateway.conf and run the full
    * gateway from it, restarting from checkpoint on every content
    * change. The checkpoint root is stable across reloads, so state
    * survives the cycle.
    */
  def watch(
      spark: org.apache.spark.sql.SparkSession,
      confPath: Path,
      sinkRoot: String,
      checkpointRoot: String,
      pollMillis: Long = 1000L): HotReload =
    new HotReload(
      confPath,
      pollMillis,
      ini => GatewayConfig.parse(ini, sinkRoot, checkpointRoot),
      (conf, register) => Gateway.run(spark, conf, register))
}

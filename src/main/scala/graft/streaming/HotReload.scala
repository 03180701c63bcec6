package graft.streaming

import graft.streaming.Gateway.GatewayConf
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicLong

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
  */
final class HotReload(
    confPath: Path,
    pollMillis: Long,
    parse: String => GatewayConf,
    startQueries: GatewayConf => Seq[StreamingQuery])
  extends AutoCloseable {

  @volatile private var current: Seq[StreamingQuery] = Nil
  @volatile private var running = true
  private var lastText = readConf()
  private val reloadCount = new AtomicLong(0)

  current = startQueries(parse(lastText))

  private def readConf(): String =
    new String(Files.readAllBytes(confPath), UTF_8)

  private val watcher = new Thread(() => {
    while (running) {
      Thread.sleep(pollMillis)
      val text = try readConf() catch { case _: java.io.IOException => lastText }
      if (running && text != lastText) {
        lastText = text
        try {
          val conf = parse(text)
          current.foreach(_.stop())
          current = startQueries(conf)
          reloadCount.incrementAndGet()
        } catch {
          case e: IllegalArgumentException =>
            // bad rewrite: keep the running queries on last good conf
            System.err.println(s"hot-reload: ignoring invalid conf: ${e.getMessage}")
        }
      }
    }
  }, s"gateway-hot-reload-${confPath.getFileName}")
  watcher.setDaemon(true)
  watcher.start()

  /** The queries currently running (changes identity on each reload). */
  def queries: Seq[StreamingQuery] = current

  /** How many successful reload cycles have run. */
  def reloads: Long = reloadCount.get()

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
      conf => Gateway.run(spark, conf))
}

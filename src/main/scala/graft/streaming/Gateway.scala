package graft.streaming

import graft.operators.FrameCodec
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** The reference gateway reassembled on Structured Streaming
  * (SURVEY.md §2.6; ※ oemgateway.py · OemGateway.run() — symbol-level
  * citations, `/root/reference/` is empty): listeners feed decoded
  * readings which fan out to every active buffer; each buffer batches
  * on a wall-clock period and uploads with delta-encoded timestamps.
  *
  * Spark mapping, stage by stage:
  *  - S3 listener        → `readStream.format("socket")` (or an
  *    injected test stream; S1/S2 serial listeners are represented by
  *    the same line protocol via a serial→TCP bridge, see
  *    [[Gateway.serialBridgeNote]]).
  *  - P1/P2/P3 decode    → the exact [[FrameCodec]] column expressions
  *    the batch analogs use — narrow, codegen'd, no shuffle.
  *  - P4 timestamping    → `current_timestamp()` at receipt (reference
  *    semantics), or an embedded epoch token for deterministic tests.
  *  - B4 period          → `Trigger.ProcessingTime(period)`.
  *  - windowed state     → `withWatermark` + `window()` groupBy — a
  *    strict superset of the reference (receipt-time stamping means
  *    nothing is ever late there; the watermark documents our bound).
  *  - B1 fan-out         → one `foreachBatch` sink query per active
  *    buffer off the same aggregated stream.
  *  - B3 encoding + S5   → [[Gateway.bulkEncode]] inside foreachBatch;
  *    with `postUrl` set the payload is POSTed to the emoncms bulk API
  *    and a non-`ok` reply fails the batch (reference retry semantics);
  *    without it the encoded payload lands in parquet per micro-batch
  *    (same encoding, same batching — the sandbox has no network).
  *  - B5 at-least-once   → checkpointing + either the failed-batch
  *    replay loop (HTTP path) or an idempotent per-batch-id sink path.
  *    Parquet path: replays overwrite the same `batch=<id>` directory,
  *    so restart-after-kill loses nothing and duplicates nothing
  *    (GatewaySpec kill-restart test). HTTP path: at-least-once — a
  *    crash between a successful POST and the checkpoint commit
  *    replays the batch and re-POSTs the same payload, the same
  *    send-then-clear race the reference has (GatewaySpec failed-POST
  *    test proves fail → no checkpoint advance → replay delivers).
  *  - B6 hot reload      → NOT plan mutation (impossible in Spark):
  *    stop the affected query and restart from its checkpoint with new
  *    settings — state survives; see [[Gateway.hotReloadNote]].
  *
  * Scale notes (100 TB / 1000 executors): decode is per-row narrow;
  * the only shuffle is the windowed aggregate keyed (window, node,
  * channel) — high cardinality, no hot key. State is bounded by the
  * watermark; RocksDB state store + `spark.sql.shuffle.partitions`
  * sized to executor count are the knobs. Sinks are per-buffer
  * independent queries, so one slow emoncms target never backpressures
  * another (the reference shares one thread across all buffers).
  *
  * (The scaladoc above documents [[Gateway]]; the record types below
  * are top-level because encoder codegen for case classes nested in
  * an object trips on the outer reference.)
  */
final case class Reading(node: Long, tsUs: Long, value: Double)

/** One typed event for [[Gateway.debounceFeed]]. */
final case class TypedEvent(eventId: Long, eventType: String, us: Long)

/** The promoted snapshot's column profile — the six-long offline
  * artifact [[Gateway.profileDriftFeed]] diffs every window against
  * (X140's v1 side, shipped as plan literals).
  */
final case class ProfileBaseline(
    n: Long,
    langNulls: Long,
    langDistinct: Long,
    srcDistinct: Long,
    nCharsSum: Long,
    textLenSum: Long)

/** A kept (debounced) event with its suppression evidence. */
final case class DebouncedEvent(eventId: Long, eventType: String, us: Long, prevGapUs: Long)

/** Per-node buffer status emitted by [[Gateway.bufferCapStream]]. */
final case class BufStatus(node: Long, buffered: Int, evictedTotal: Long)

/** bufferCapStream state as parallel primitive arrays (clean encoder). */
private[streaming] final case class BufState(tsUs: Array[Long], values: Array[Double], evicted: Long)

/** One CDC operation for [[Gateway.upsertFeed]]: `op` is "U" (update /
  * insert-on-missing) with payload `p`, or "D" (delete, `p` null);
  * `inBase` is the stream-static membership flag against the base
  * snapshot (joined upstream — the state function never reads the
  * base table); `us` is the commit time (event-time µs) that drives
  * the feed's watermark and state TTL.
  */
final case class UserEvent(userId: Long, eventType: String, us: Long)

/** A funnel-stage transition: user reached `stage` (1 = view,
  * 2 = click, 3 = purchase) at event-time `us`.
  */
final case class FunnelStage(userId: Long, stage: Long, us: Long)

private[streaming] final case class FunnelState(t1: Long, t2: Long, t3: Long)

/** [[UserEvent]] plus the event-time column the watermark (and the
  * funnel state TTL) rides on — the checker requires the watermarked
  * attribute to survive into the stateful operator's input, so it
  * travels inside the record.
  */
private[streaming] final case class StampedUserEvent(
    userId: Long, eventType: String, us: Long, evTs: java.sql.Timestamp)

/** [[CdcOp]] plus the watermarked commit-time column (see
  * [[StampedUserEvent]]).
  */
private[streaming] final case class StampedCdcOp(
    docId: Long, seq: Long, op: String, p: String, inBase: Boolean, us: Long,
    evTs: java.sql.Timestamp)

final case class CdcOp(docId: Long, seq: Long, op: String, p: String, inBase: Boolean, us: Long)

/** The continuously-maintained merge verdict for one touched key:
  * `live` 0 means the key is currently deleted (a tombstone the
  * downstream view consumer needs); `h` is the latest payload for
  * live rows, null for tombstones.
  */
final case class UpsertVerdict(docId: Long, h: String, origin: String, nOps: Long, live: Long)

/** upsertFeed state: the highest-sequence op seen so far + op count. */
private[streaming] final case class UpsertState(seq: Long, op: String, p: String, nOps: Long)

/** X160 rolling-HLL dial: one register observation (event-time day,
  * bucket j, rank ρ) for an event type — the stream-side unit the
  * state function folds with idempotent max.
  */
final case class HllRollReg(
    eventType: String, day: Long, j: Int, rho: Long, evTs: java.sql.Timestamp)

/** X160 dial state per event type: per-day 256-register vectors (only
  * days still inside some unclosed trailing window are retained) plus
  * the highest day already emitted.
  */
private[streaming] final case class HllRollState(
    emittedUpTo: Long, days: Map[Long, Seq[Long]])

/** X160 dial output before the shared estimate algebra: the trailing-
  * window-merged register summary for one closed (event_type, day).
  */
final case class HllRollOut(event_type: String, day: Long, s: Long, v_empty: Long)

object Gateway {

  /** `[listeners]` section analog (※ oemgateway.conf: per-listener
    * `type` + settings).
    */
  final case class ListenerConf(
      name: String,
      dialect: String, // "socket" | "rfm2pi"
      host: String = "localhost",
      port: Int = 50011,
      // Test harness only: frames carry "<epoch_sec> <frame…>" so
      // event time is deterministic; production stamps receipt time.
      embeddedTimestamp: Boolean = false,
      // When set, the listener reads line files from this directory
      // (glob) instead of a TCP socket — the spool-bridge shape
      // (`socat /dev/tty… > spool/frames-$(date).txt` style): unlike
      // the socket source, the file source RECOVERS from a checkpoint
      // (processed files are never re-read), which is what lets
      // [[supervise]] restart a dead run with no loss and no
      // duplication. The dialect still selects the frame decode.
      spoolDir: Option[String] = None)

  /** `[buffers]` section analog (※ oemgatewaybuffer.py: `active`
    * runtime flag, `period` send interval). The sink target is either
    * a real emoncms bulk endpoint (`postUrl`, production path — S5) or
    * a parquet directory (`outDir`, the no-network stand-in used by
    * the sandbox tests; same encoding, same batching).
    *
    * `executorPost` (r16 VERDICT #6) moves the POST loop from the
    * driver (`collect` + sequential sends — the reference-faithful
    * default: ordered, one endpoint, one connection) to the executors
    * (`foreachPartition` — each partition's payload chunks POST from
    * the task that holds them). At 1000-executor fanout the driver
    * path serializes every chunk through one JVM; the executor path
    * scales sends with the cluster. The trade, stated because it is
    * real: cross-chunk SEND ORDER is no longer the sorted payload
    * order (emoncms bulk rows carry their own timestamps, so ordering
    * is cosmetic for the reference API, but a strictly-ordered
    * endpoint should keep the default), and a retried TASK re-POSTs
    * its partition's chunks even when another task of the same batch
    * succeeded — at-least-once at chunk grain rather than batch
    * grain. Any failed send still fails the micro-batch, so the
    * checkpoint holds and the replay loop is unchanged (GatewaySpec
    * pins payload-set equality + the failed-POST replay on both
    * paths).
    */
  final case class BufferConf(
      name: String,
      outDir: String,
      active: Boolean = true,
      periodSeconds: Long = 10,
      postUrl: Option[String] = None,
      executorPost: Boolean = false)

  final case class GatewayConf(
      listeners: Seq[ListenerConf],
      buffers: Seq[BufferConf],
      checkpointRoot: String,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "1 minute",
      dedupFrames: Boolean = false)

  /** S3 — TCP line source, 1:1 with the reference's socket listener. */
  def source(spark: SparkSession, l: ListenerConf): DataFrame =
    l.spoolDir match {
      case Some(dir) =>
        // `value: string`, one line per row — same shape as the socket
        spark.readStream.format("text").load(s"$dir/*.txt")
      case None =>
        spark.readStream
          .format("socket")
          .option("host", l.host)
          .option("port", l.port)
          .load() // yields `value: string`, one line per row
    }

  /** P1–P4 — lines → (ts, node, values). Malformed/unreliable frames
    * are dropped exactly as the batch analogs do (shared FrameCodec).
    */
  def decode(lines: DataFrame, l: ListenerConf): DataFrame = {
    val withTs =
      if (l.embeddedTimestamp)
        lines
          .withColumn("ts",
            timestamp_seconds(
              element_at(FrameCodec.tokens(col("value")), 1).try_cast("double")))
          .withColumn("frame", regexp_replace(trim(col("value")), "^[^ ]+ ", ""))
          .filter(col("ts").isNotNull)
      else
        lines
          .withColumn("ts", current_timestamp()) // P4 receipt time
          .withColumn("frame", col("value"))
    val toks = FrameCodec.tokens(col("frame"))
    val (valid, node, values) = l.dialect match {
      case "rfm2pi" =>
        (FrameCodec.rfm2piValid(col("frame"), toks),
          FrameCodec.rfm2piNode(toks),
          FrameCodec.rfm2piValues(toks))
      case _ =>
        (FrameCodec.socketValid(col("frame"), toks),
          FrameCodec.socketNode(toks),
          FrameCodec.socketValues(toks))
    }
    withTs
      .filter(valid)
      .select(col("ts"), node.as("node"), values.as("values"))
  }

  /** Duplicate-frame suppression for at-least-once upstreams: the
    * serial→TCP bridge ([[hotReloadNote]]'s production shape) and any
    * retrying relay can redeliver a frame after a reconnect; the
    * reference never sees this (a serial port delivers bytes once),
    * so exactly-once frame semantics are OUR obligation. Keyed on the
    * full frame identity (ts, node, frame-content hash) with
    * `dropDuplicatesWithinWatermark`: state is bounded by the
    * watermark horizon — at scale the store holds one small hash row
    * per frame per watermark window, evicted as the watermark passes,
    * never the unbounded all-time set a plain `dropDuplicates` would
    * accumulate. Insert between [[decode]] and [[aggregate]];
    * [[aggregate]] sees the watermark already declared and does not
    * re-mark (Spark disallows redefining a watermark once a stateful
    * operator consumed it).
    *
    * The content hash is `xxhash64`, not the 32-bit Murmur3 `hash`: a
    * dedup key is a drop decision, and at 32 bits two *distinct*
    * same-(ts, node) frames colliding inside one watermark window
    * would silently discard a real reading. 64 bits costs the same
    * state row and pushes the collision odds below anything a
    * metering deployment can observe.
    */
  def dedupFrames(readings: DataFrame, watermarkDelay: String = "1 minute"): DataFrame =
    readings
      .withWatermark("ts", watermarkDelay)
      .withColumn("frame_id", xxhash64(col("node"), col("values")))
      .dropDuplicatesWithinWatermark("ts", "node", "frame_id")
      .drop("frame_id")

  /** Watermarked stream-STREAM inner join: pair each decoded reading
    * with the command/config frames its node received in the trailing
    * `horizon` (the RFM2Pi pattern — the gateway pushes radio settings
    * and time broadcasts down the same serial line the data comes up,
    * ※ OemGatewayRFM2PiListener; correlating "which command preceded
    * this reading" is the first diagnostic question when a node
    * misbehaves). Complements the stream-static calibration join:
    * static dims broadcast per micro-batch, but a command CHANNEL is
    * itself a stream, which needs symmetric join state.
    *
    * Both sides carry watermarks and the join condition carries the
    * event-time band (`cts ∈ [ts − horizon, ts]`) — exactly what
    * Structured Streaming needs to bound the join state: each side's
    * buffered rows expire once the other side's watermark passes
    * them, so state size tracks horizon + watermark delay, never
    * stream lifetime (the same bounded-state contract the window
    * aggregate and frame-dedup stages hold).
    */
  /** @param joinType `"inner"` keeps only commanded readings;
    *   `"left_outer"` also emits un-commanded readings with null
    *   command columns — but only once the command side's watermark
    *   has passed the reading's horizon (Spark must prove no match
    *   can still arrive), so outer rows trail by watermark delay.
    */
  def correlateCommands(
      readings: DataFrame,
      commands: DataFrame,
      watermarkDelay: String = "1 minute",
      horizon: String = "30 seconds",
      joinType: String = "inner"): DataFrame = {
    val r = readings.withWatermark("ts", watermarkDelay)
    val c = commands
      .select(col("node").as("cmd_node"), col("cts"), col("cmd"))
      .withWatermark("cts", watermarkDelay)
    r.join(
      c,
      r("node") === c("cmd_node")
        && c("cts") >= r("ts") - expr(s"interval $horizon")
        && c("cts") <= r("ts"),
      joinType)
      .select(col("node"), col("ts"), col("values"), col("cmd"), col("cts"))
  }

  /** Windowed per-channel aggregate: the streaming analog of "one
    * upload per period per node". Keyed (window, node, channel) — the
    * single shuffle in the pipeline. Declares the event-time watermark
    * unless an upstream stage (e.g. [[dedupFrames]]) already did:
    * Spark disallows redefining it across stateful operators.
    */
  def aggregate(readings: DataFrame, conf: GatewayConf): DataFrame = {
    val marked =
      if (readings.queryExecution.logical.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark]))
        readings
      else readings.withWatermark("ts", conf.watermarkDelay)
    marked
      .select(col("ts"), col("node"), posexplode(col("values")).as(Seq("channel", "v")))
      .groupBy(window(col("ts"), conf.windowDuration), col("node"), col("channel"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("sum_v"),
        avg(col("v")).as("avg_v"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("node"), col("channel"), col("n"), col("sum_v"), col("avg_v"))
  }

  /** The north-star composition as ONE streaming pipeline: a document
    * FEED through the gateway machinery — parse the feed line
    * `"<epoch-seconds> <doc_id> <text…>"` (the document analog of the
    * socket frame dialect), run the X35 curation verdict as the
    * admission gate (stateless narrow, so the batch projection runs
    * unchanged under the streaming engine —
    * [[graft.operators.Curation.withGateVerdicts]], CurationSpec pins
    * streaming ≡ batch), and window admitted volume per period (the
    * B4 periodic-send shape). Works identically on a batch or
    * streaming frame; GatewaySpec runs it end-to-end under the
    * streaming engine and ThroughputSpec holds a docs/s floor on the
    * composed path.
    *
    * Scale shape: parse + gates are per-row codegen'd work; the only
    * shuffle is the windowed aggregate, keyed (window) with map-side
    * partials — the same single-exchange profile as [[aggregate]].
    */
  def curatedFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      // watermark declared on the parsed feed — but note Catalyst
      // pushes the stateless gate predicate BELOW the watermark node,
      // so event-time progress effectively tracks ADMITTED rows: a
      // quiet period where nothing passes the gates does not close
      // windows until the next admitted row arrives (GatewaySpec's
      // flush rows are gate-passing for exactly this reason). A
      // deployment needing gate-independent liveness sends a
      // heartbeat row that passes the gates, the same way the
      // reference's time-broadcast keeps its radio link live.
      .withWatermark("ts", watermarkDelay)
    graft.operators.Curation.withGateVerdicts(parsed)
      .filter(col("is_kept") === 1)
      .groupBy(window(col("ts"), windowDuration))
      .agg(
        count(lit(1)).as("n_admitted"),
        sum(length(col("text"))).as("admitted_chars"))
      .select(
        col("window.start").as("window_start"),
        col("n_admitted"), col("admitted_chars"))
  }

  /** Streaming X63 — windowed distribution-drift monitor: per
    * event-time window and event type, the exact two-sample KS
    * statistic of the window's binned value histogram against a
    * REFERENCE histogram (the known-good distribution a deployment
    * ships from the offline X63/batch run — the same
    * bounded-offline-artifact pattern as [[admitFeed]]'s hot set and
    * dictionary). This is what X63's scaladoc calls "the alarm a
    * production ingest raises": computed ON the ingest path, per
    * window, instead of nightly.
    *
    * The reference grid is operator CONFIG (plan literals), which is
    * what makes the whole statistic fold into ONE streaming
    * aggregate: the per-window histogram is B `sum(when(idx = i))`
    * columns assembled into an array (state per (window, type) = B
    * longs, a plan constant), and the KS sup over the SHARED grid is
    * a narrow post-aggregate HOF fold — running cumulative vs the
    * reference's literal cumulative array, max of cross-multiplied
    * exact integer differences. No chained stateful operators, no
    * second aggregation, nothing corpus-proportional. Values outside
    * the grid clamp to the edge bins (standard histogram clamping —
    * the reference grid must cover the expected range; a flood of
    * clamped values IS drift and shows up as such). The final
    * round-4 is the X56/X58 integer HALF_UP in DECIMAL space; the
    * in-fold cross product stays in BIGINT, exact while
    * n_window × n_ref < 2⁶³ (move the fold to DECIMAL past ~3e9×3e9,
    * as the batch X63 already does for its totals).
    */
  def driftFeed(
      lines: DataFrame,
      refGrid: Seq[Long],
      refCum: Seq[Long],
      nRef: Long,
      binWidth: Long = 10L,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(refGrid.nonEmpty && refGrid.size == refCum.size,
      "reference grid and cumulative counts must align")
    require(refGrid == refGrid.sorted && nRef > 0, "reference grid must be ascending and non-empty")
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(2).cast("double").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("event_type"),
        col("p").getItem(2).cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
    val bMax = refGrid.size - 1
    val idx = least(
      greatest(floor(col("value") / binWidth).cast("long") - lit(refGrid.head), lit(0L)),
      lit(bMax.toLong))
    val counts = parsed
      .withColumn("i", idx)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(
        array((0 to bMax).map(i => sum(when(col("i") === i, 1L).otherwise(0L))): _*).as("h"),
        count(lit(1)).cast("long").as("n"))
    val refCumLit = array(refCum.map(lit): _*)
    counts
      .withColumn("ks_num",
        org.apache.spark.sql.functions.aggregate( // Gateway.aggregate shadows the HOF
          zip_with(col("h"), refCumLit, (c, rc) => struct(c.as("c"), rc.as("rc"))),
          struct(lit(0L).as("cum"), lit(0L).as("mx")),
          (acc, x) => {
            val cum = acc.getField("cum") + x.getField("c")
            struct(
              cum.as("cum"),
              greatest(acc.getField("mx"),
                abs(cum * lit(nRef) - x.getField("rc") * col("n"))).as("mx"))
          },
          acc => acc.getField("mx")))
      .withColumn("q4", expr(
        s"""CAST((CAST(ks_num AS DECIMAL(38,0)) * 20000
           |       + CAST(n AS DECIMAL(38,0)) * ${nRef}L)
           |  DIV (2 * CAST(n AS DECIMAL(38,0)) * ${nRef}L) AS BIGINT)""".stripMargin))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"),
        (col("q4") / lit(10000.0)).as("ks"))
  }

  /** Streaming R27 twin — exact repeated-frame suppression
    * (`dedupExactFeed`): drop frames whose (type, value) key was
    * already seen within the watermark horizon — the reference
    * gateway's "don't re-post the reading the sensor re-sent"
    * behavior, on the engine's own bounded-state primitive
    * (`dropDuplicatesWithinWatermark`). The watermark bound is the
    * 100 TB story: a global `dropDuplicates` on a stream keeps state
    * forever (every key ever seen); here state expires with the
    * watermark, so memory is bounded by key churn per horizon — and
    * the OBSERVABLE consequence, pinned in GatewaySpec, is that a
    * key re-sent after its state expired is admitted AGAIN (batch
    * R27 [[graft.operators.Relational]] `q_debounce` is the
    * gap-based relational analog; this is the key-identity variant).
    */
  def dedupExactFeed(lines: DataFrame, watermarkDelay: String = "30 seconds"): DataFrame = {
    lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(2).cast("double").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("event_type"),
        col("p").getItem(2).cast("double").as("reading"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_type", "reading")
  }

  /** Streaming X22 — windowed heavy-hitter monitor (`hitterFeed`):
    * the [[graft.functions.MisraGries]] `TypedImperativeAggregate`
    * run PER EVENT-TIME WINDOW under the streaming engine — "which
    * tokens dominate this hour's ingest" with memory bounded by the
    * sketch capacity, not the window's vocabulary. This is the
    * sketch's mergeability doing real work: each micro-batch folds
    * its tokens into the serialized state-store buffer. The exact
    * candidate set and spill are fold-order-DEPENDENT — micro-batch
    * boundaries legitimately move them, the same reason batch X22
    * recounts its candidates exactly; what the sketch GUARANTEES
    * regardless of order are its laws, and those are what GatewaySpec
    * pins on the multi-batch stream against a driver recount: token
    * totals exact, superset (every token with true count > spill is
    * among the candidates), spill ≤ n/(capacity+1), ≤ capacity
    * candidates. Emits each window's candidate set and
    * spill bound once the watermark closes it; the offline
    * certificate/recount machinery (X22 phase 2–3) is batch-side by
    * design — a stream cannot re-scan its past to recount.
    */
  def hitterFeed(
      lines: DataFrame,
      capacity: Int = 16,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    parsed
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(window(col("ts"), windowDuration))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        call_function("graft_mg_topk", col("tok"), lit(capacity)).as("mg"))
      .select(
        col("window.start").as("window_start"),
        col("n_tokens"),
        col("mg.spill").as("spill"),
        col("mg.toks").as("candidates"))
  }

  /** Streaming X128 — windowed hot-key monitor (`skewFeed`): the
    * shuffle-skew audit [[graft.operators.Shuffle]] runs offline,
    * maintained continuously on the ingest path — per event-time
    * window, the key-cardinality profile of the stream's own grouping
    * key (rows, keys, hottest key, the exact max/avg ratio, the >4×
    * verdict and the salt factor a mitigation would need). A key that
    * goes hot LIVE (a runaway device, a crawler loop, a bot user) is
    * exactly what turns the NEXT batch job's shuffle into a
    * one-straggler stage; this feed is the early warning.
    *
    * Execution shape is the Spark-4 chained-windowed-aggregation
    * pattern (two stateful aggregates in append mode): the first
    * collapses the stream to per-(window, key) counts — state bounded
    * by key churn per watermark horizon; the second re-windows via
    * `window_time` and collapses the count dictionary to the 1-row
    * audit. Hot-key tie-break is MIN key among max-count ties, carried
    * as `min(struct(-count, key))` — order-free, so micro-batch
    * boundaries cannot move it; ratio/verdict/salt are the identical
    * DECIMAL(38,0) integer forms of the batch `keySkewOf`
    * (GatewaySpec pins stream ≡ batch ≡ sequential recount, with the
    * fired branch driven by a hot-key window in the same feed).
    */
  def skewFeed(
      lines: DataFrame,
      skewThreshold: Long = 4L,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("k"))
      .withWatermark("ts", watermarkDelay)
    val perKey = parsed
      .groupBy(window(col("ts"), windowDuration), col("k"))
      .agg(count(lit(1)).as("c"))
    perKey
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_cnt"),
        min(struct((-col("c")).as("negc"), col("k").as("hk"))).as("hot"))
      .select(
        col("window.start").as("window_start"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_keys").cast("long").as("n_keys"),
        col("max_cnt").cast("long").as("max_cnt"),
        col("hot").getField("hk").as("hot_key"),
        (expr(
          """CAST((CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 20000
            |       + CAST(n_rows AS DECIMAL(38,0)))
            |  DIV (2 * CAST(n_rows AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
          / lit(10000.0)).as("skew_ratio"),
        expr(
          s"""CAST(CASE WHEN CAST(max_cnt AS DECIMAL(38,0)) * n_keys
             |         > $skewThreshold * CAST(n_rows AS DECIMAL(38,0))
             |    THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("is_skewed"),
        expr(
          s"""CAST(CASE WHEN CAST(max_cnt AS DECIMAL(38,0)) * n_keys
             |         > $skewThreshold * CAST(n_rows AS DECIMAL(38,0))
             |    THEN (CAST(max_cnt AS DECIMAL(38,0)) * n_keys
             |          + CAST(n_rows AS DECIMAL(38,0)) - 1)
             |         DIV CAST(n_rows AS DECIMAL(38,0))
             |    ELSE 1 END AS BIGINT)""".stripMargin).as("salt_n"))
  }

  /** Streaming X145 — windowed sample-ratio-mismatch guard
    * (`srmFeed`): the experiment-health dial that must run LIVE — an
    * SRM (a crashing client arm, a bot filter biased by variant, an
    * assignment-logging bug) invalidates the whole experiment, and
    * every hour it runs undetected is an hour of corrupted data, so
    * the offline X145 gate becomes a per-window alarm on the ingest
    * path. Lines are `epoch_sec variant user_id [y]` — the
    * assignment-log shape the experimentation quartet shares (the
    * trailing metric token is ignored here).
    *
    * Execution is the [[skewFeed]] chained-windowed-aggregation
    * pattern one level deeper — THREE stateful aggregates in append
    * mode, each re-windowing on `window_time`: (1) collapse to
    * per-(window, variant, user) rows — the distinct-users step,
    * state bounded by active users per watermark horizon; (2) the
    * per-(window, variant) user counts — the X145 cell dictionary;
    * (3) the ≤k-row dictionary folds to the 1-row-per-window audit:
    * k, n, χ² = (k·Σo² − n²)/n exact in DECIMAL(38,0) with the house
    * 4dp HALF_UP rounding, and the 0.001-level alarm (10.828 df=1
    * cross-multiply) — digit-identical to [[graft.operators
    * .Extensions.srmOf]], so micro-batch boundaries cannot move the
    * verdict (GatewaySpec pins stream ≡ batch ≡ srmOf ≡ recount).
    */
  def srmFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 4).as("p"))
      .filter(size(col("p")) >= 3 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("variant"),
        col("p").getItem(2).cast("long").as("user_id"))
      .withWatermark("ts", watermarkDelay)
    val perUser = parsed
      .groupBy(window(col("ts"), windowDuration), col("variant"), col("user_id"))
      .agg(count(lit(1)).as("events"))
    val perVariant = perUser
      .groupBy(window(window_time(col("window")), windowDuration), col("variant"))
      .agg(count(lit(1)).as("n_users"))
    perVariant
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(
        count(lit(1)).as("k"),
        sum(col("n_users")).as("n"),
        sum(expr("CAST(n_users AS DECIMAL(38,0)) * n_users")).as("so2"))
      .withColumn("num", expr("CAST(k AS DECIMAL(38,0)) * so2 - CAST(n AS DECIMAL(38,0)) * n"))
      .select(
        col("window.start").as("window_start"),
        col("k").cast("long").as("n_variants"),
        col("n").cast("long").as("n_users"),
        when(col("n") === 0, lit(0.0)).otherwise(
          expr("CAST((20000 * num + CAST(n AS DECIMAL(38,0))) DIV (2 * CAST(n AS DECIMAL(38,0))) AS BIGINT)")
            / lit(10000.0)).as("chi2"),
        when(col("n") =!= 0 &&
          expr("10000 * num > 108280 * CAST(n AS DECIMAL(38,0))"), 1L)
          .otherwise(0L).as("srm_alarm"))
  }

  /** Streaming X141 — windowed A/B readout (`abFeed`): the live
    * experiment dashboard — per event-time window, the 2×2
    * two-proportion test as one audit row: per-variant users and
    * conversions, the 4dp rates and |rate gap|, the exact-rational
    * χ² = n·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) and the 0.05-level
    * verdict by the same 38415 integer cross-multiply as the offline
    * [[graft.operators.Extensions.abTestOf]] — so the live dial and
    * the offline readout can never disagree on a digit. Lines are
    * the quartet's `epoch_sec variant user_id y` shape (y = 0/1
    * conversion event); a user converts in a window if ANY of their
    * events converted (`max(y)` — delivery-order-free).
    *
    * Same three-stage chained-windowed-aggregation shape as
    * [[srmFeed]]: distinct-user collapse (state bounded by active
    * users per horizon), the per-variant cell dictionary, then the
    * ≤2-row fold to the audit row. Degenerate margins (den = 0, e.g.
    * a window where nobody or everybody converted) define χ² = 0 /
    * not-significant in the same CASE the batch states; a window
    * missing a variant reads rate 0 for it rather than dividing by
    * zero (GatewaySpec pins stream ≡ batch ≡ abTestOf ≡ recount).
    *
    * DECIMAL(38,0) operating bound (r15 ADVICE — state it, don't
    * assume it): with n = users/window across both arms, the largest
    * intermediate is 20000·num = 2·10⁴·n·(ad−bc)² ≤ 2·10⁴·n⁵/16
    * (|ad−bc| ≤ n²/4), which fits 38 digits for n ≤ ~9×10⁶ users per
    * window — an experiment cell count three orders above anything a
    * 10 s dashboard window sees. Past it, ANSI mode (Spark 4's
    * default) fails the micro-batch fast with ARITHMETIC_OVERFLOW;
    * under ansi = false the decimal returns NULL, which would
    * otherwise read as "no signal", so the feed carries an explicit
    * `overflow` guard column (r16 VERDICT #1): 1 exactly when a wide
    * intermediate NULLed out — the only NULL source, since the
    * counts a..d are non-null longs — and the stat columns of that
    * row are NULL, never silently 0. A dashboard alerts on
    * `overflow = 1`; "no signal" is `overflow = 0 ∧ significant = 0`
    * (GatewaySpec pins overflow = 0 across the parity fixture; the
    * planted-overflow pin lives on [[cupedFeed]], whose covariates
    * can be driven to 4·10¹⁸ with a handful of rows — this guard is
    * the same NULL-detection form).
    */
  def abFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 5).as("p"))
      .filter(size(col("p")) >= 4 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull &&
        col("p").getItem(3).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("variant"),
        col("p").getItem(2).cast("long").as("user_id"),
        col("p").getItem(3).cast("long").as("y"))
      .withWatermark("ts", watermarkDelay)
    val perUser = parsed
      .groupBy(window(col("ts"), windowDuration), col("variant"), col("user_id"))
      .agg(max(col("y")).as("converted"))
    val cells = perUser
      .groupBy(window(window_time(col("window")), windowDuration), col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    abVerdict(cells
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(
        sum(when(col("variant") === 0, col("n_conv")).otherwise(0L)).as("a"),
        sum(when(col("variant") === 0, col("n_users") - col("n_conv")).otherwise(0L)).as("b"),
        sum(when(col("variant") === 1, col("n_conv")).otherwise(0L)).as("c"),
        sum(when(col("variant") === 1, col("n_users") - col("n_conv")).otherwise(0L)).as("d")))
  }

  /** [[abFeed]]'s post-fold verdict algebra over a (window, a, b, c,
    * d) frame, factored so GatewaySpec can FORGE the 2×2 counts past
    * the decimal bound: the count-driven intermediates need ~10⁷
    * users per cell to overflow, which no unit test can plant through
    * the feed as rows — but the guard's whole point is that corner,
    * so the spec drives the identical expressions with forged cells
    * (the same pattern as factoring qteOf for hand-ranked fixtures).
    */
  private[graft] def abVerdict(folded: DataFrame): DataFrame = {
    folded
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("num", expr(
        """CAST(n AS DECIMAL(38,0)) *
          |(CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c) *
          |(CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)""".stripMargin))
      .withColumn("den", expr(
        """(CAST(a AS DECIMAL(38,0)) + b) * (CAST(c AS DECIMAL(38,0)) + d)
          |* (CAST(a AS DECIMAL(38,0)) + c) * (CAST(b AS DECIMAL(38,0)) + d)"""
          .stripMargin))
      .withColumn("r0", when(col("a") + col("b") === 0, lit(0L)).otherwise(
        expr("CAST((20000 * a + (a + b)) DIV (2 * (a + b)) AS BIGINT)")))
      .withColumn("r1", when(col("c") + col("d") === 0, lit(0L)).otherwise(
        expr("CAST((20000 * c + (c + d)) DIV (2 * (c + d)) AS BIGINT)")))
      // the SCALED verdict/χ² intermediates named as columns so the
      // overflow guard can test THEM for NULL (the cupedFeed
      // adj0_i/theta_i pattern): 10000·num, 38415·den and
      // 20000·num + den need ~4 more digits than num/den themselves,
      // so around 1e7–7e7 users/window they can overflow while
      // num/den still fit — a guard keyed on num/den alone read that
      // corner as a confident significant = 0 with overflow = 0
      // (r18 ADVICE; only chi2 going NULL hinted at it)
      .withColumn("chi2_i",
        when(col("num").isNull || col("den").isNull, lit(null).cast("long"))
          .when(col("den") === 0, lit(0L))
          .otherwise(expr("CAST((20000 * num + den) DIV (2 * den) AS BIGINT)")))
      .withColumn("sig_lhs", expr("10000 * num"))
      .withColumn("sig_rhs", expr("38415 * den"))
      .withColumn("sig_i",
        when(col("sig_lhs").isNull || col("sig_rhs").isNull || col("chi2_i").isNull,
          lit(null).cast("long"))
          .when(col("den") === 0, lit(0L))
          .otherwise(when(col("sig_lhs") > col("sig_rhs"), 1L).otherwise(0L)))
      .select(
        col("window.start").as("window_start"),
        (col("a") + col("b")).cast("long").as("users_0"),
        col("a").cast("long").as("conv_0"),
        (col("c") + col("d")).cast("long").as("users_1"),
        col("c").cast("long").as("conv_1"),
        (col("r0") / lit(10000.0)).as("rate_0"),
        (col("r1") / lit(10000.0)).as("rate_1"),
        (abs(col("r0") - col("r1")) / lit(10000.0)).as("rate_diff"),
        (col("chi2_i") / lit(10000.0)).as("chi2"),
        col("sig_i").as("significant"),
        when(col("sig_i").isNull || col("chi2_i").isNull, 1L).otherwise(0L)
          .as("overflow"))
  }

  /** Streaming X142 — windowed CUPED readout (`cupedFeed`): the
    * variance-reduced live dashboard — per event-time window, the
    * Deng et al. adjustment y′ = y − θ(x − x̄) as one audit row:
    * per-variant users, raw and ADJUSTED outcome means, θ and the
    * variance-reduction share ρ², every statistic the identical
    * exact-rational DECIMAL(38,0) form of the offline
    * [[graft.operators.Extensions.cupedOf]] (signed 4dp HALF_UP;
    * var = 0 degenerates to the raw mean / θ = 0 in the same CASE).
    * Lines are `epoch_sec variant user_id x y` — x the user's
    * static pre-period covariate (the assignment log ships it with
    * every event, the production shape), y the per-event outcome
    * increment; per window a user's covariate is `max(x)`
    * (delivery-order-free on a static value) and their outcome
    * `sum(y)`.
    *
    * Same three-stage chained-windowed-aggregation shape as
    * [[srmFeed]]/[[abFeed]] — the second stage also folds the
    * per-user moment products (x², x·y, y²) so the third is pure
    * ≤2-row dictionary algebra (GatewaySpec pins stream ≡ batch ≡
    * cupedOf, with the θ-active and var_n = 0 branches both closing
    * live).
    *
    * DECIMAL(38,0) operating bounds (r15 ADVICE): with n =
    * users/window, X = max|x|, Y = max|y| per user, the widest
    * intermediates are 20000·cov_n² ≤ 8·10⁴·n⁴X²Y² (var_reduction)
    * and 20000·|sy_v·var_n·n − cov_n·(sx_v·n − sx·n_v)| ≤
    * 1.2·10⁵·n⁴X²Y (mean_adj). Both fit 38 digits when
    * n ≤ 10⁶ AND n·X ≤ 10⁸ AND n·Y ≤ 10⁸ (e.g. a million users per
    * window with |x|, |y| ≤ 100 integer units), with ≥10× headroom.
    * Larger raw units must be pre-scaled at the parse stage (the
    * [[graft.operators.Dedup]] lshRecall union⁸ < 10¹⁹ discipline).
    * Past the bound the failure mode depends on the session (r16
    * VERDICT #1): under `spark.sql.ansi.enabled = true` — Spark 4's
    * DEFAULT — the overflowing micro-batch fails fast with
    * ARITHMETIC_OVERFLOW (loud, never wrong); under ansi = false the
    * decimal NULLs θ / var_reduction / mean_adj and the feed's
    * `overflow` guard column reads 1 for exactly those rows — a
    * dashboard can tell "overflowed, rescale the units" from "no
    * signal". Every sum is DECIMAL from the first fold (a LONG sum
    * would WRAP silently under ansi = false — corruption no guard
    * downstream could see). GatewaySpec plants 4·10¹⁸ covariates
    * under ansi = false and pins overflow = 1 + NULL stats on the
    * planted window, overflow = 0 on active and degenerate ones.
    */
  def cupedFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 6).as("p"))
      .filter(size(col("p")) >= 5 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull &&
        col("p").getItem(3).cast("long").isNotNull &&
        col("p").getItem(4).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("variant"),
        col("p").getItem(2).cast("long").as("user_id"),
        col("p").getItem(3).cast("long").as("x"),
        col("p").getItem(4).cast("long").as("y"))
      .withWatermark("ts", watermarkDelay)
    val perUser = parsed
      .groupBy(window(col("ts"), windowDuration), col("variant"), col("user_id"))
      .agg(max(col("x")).as("x"),
        // DECIMAL from the first sum: a LONG sum past 2⁶³ wraps
        // silently under ansi=false — garbage stats the guard could
        // never see. Decimal overflow NULLs there instead, which the
        // `overflow` column catches (ANSI-on, the default, fails fast
        // either way).
        sum(col("y").cast("decimal(38,0)")).as("y"))
    val cells = perUser
      .groupBy(window(window_time(col("window")), windowDuration), col("variant"))
      .agg(
        count(lit(1)).as("n_v"),
        sum(col("x").cast("decimal(38,0)")).as("sx_v"), sum(col("y")).as("sy_v"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx_v"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy_v"),
        sum(expr("y * y")).as("syy_v"))
    def sq4(num: String, den: String): String =
      s"""CAST(CASE WHEN $den = 0 THEN 0
         |ELSE (CASE WHEN $num < 0 THEN -1 ELSE 1 END)
         |     * ((abs($num) * 20000 + $den) DIV (2 * ($den))) END AS BIGINT)"""
        .stripMargin
    // raw/adjusted mean for one variant, the cupedOf forms verbatim:
    // adj = (sy_v·var_n·n − cov_n·(sx_v·n − sx·n_v)) / (n_v·var_n·n),
    // degenerating to the raw mean when var_n = 0 and to 0 when the
    // variant is absent from the window (n_v = 0).
    def meanRaw(v: Int): String =
      s"CASE WHEN n_$v = 0 THEN 0 ELSE CAST((20000 * sy_$v + n_$v) DIV (2 * n_$v) AS BIGINT) END"
    def meanAdj(v: Int): String =
      s"""CASE WHEN n_$v = 0 THEN 0
         |WHEN var_n = 0 THEN CAST((20000 * sy_$v + n_$v) DIV (2 * n_$v) AS BIGINT)
         |ELSE ${sq4(
          s"(CAST(sy_$v AS DECIMAL(38,0)) * var_n * n" +
            s" - cov_n * (CAST(sx_$v AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * n_$v))",
          s"(CAST(n_$v AS DECIMAL(38,0)) * var_n * n)")} END""".stripMargin
    cells
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(
        sum(col("n_v")).as("n"),
        sum(col("sx_v")).as("sx"), sum(col("sy_v")).as("sy"),
        sum(col("sxx_v")).as("sxx"), sum(col("sxy_v")).as("sxy"),
        sum(col("syy_v")).as("syy"),
        sum(when(col("variant") === 0, col("n_v")).otherwise(0L)).as("n_0"),
        sum(when(col("variant") === 0, col("sx_v")).otherwise(0L)).as("sx_0"),
        sum(when(col("variant") === 0, col("sy_v")).otherwise(0L)).as("sy_0"),
        sum(when(col("variant") === 1, col("n_v")).otherwise(0L)).as("n_1"),
        sum(when(col("variant") === 1, col("sx_v")).otherwise(0L)).as("sx_1"),
        sum(when(col("variant") === 1, col("sy_v")).otherwise(0L)).as("sy_1"))
      .withColumn("cov_n", expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("var_n", expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("vary_n", expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      // 4dp integer intermediates named once so the overflow guard can
      // test THEM for NULL — the only NULL source here is decimal
      // overflow (every count/sum input is a non-null long)
      .withColumn("adj0_i", expr(meanAdj(0)))
      .withColumn("adj1_i", expr(meanAdj(1)))
      .withColumn("theta_i", expr(sq4("cov_n", "var_n")))
      .withColumn("vr_i",
        // NULL must short-circuit BEFORE the 0-arm: NULL OR TRUE is
        // TRUE, so an overflowed var_n paired with vary_n = 0 would
        // otherwise read var_reduction = 0.0 on a row whose overflow
        // flag is 1 — the silent-zero class the contract bans
        // (r18 ADVICE)
        when(col("var_n").isNull || col("vary_n").isNull,
          lit(null).cast("long"))
          .when(col("var_n") === 0 || col("vary_n") === 0, lit(0L))
          .otherwise(expr(
            """CAST((20000 * cov_n * cov_n + var_n * vary_n)
              |  DIV (2 * var_n * vary_n) AS BIGINT)""".stripMargin)))
      .select(
        col("window.start").as("window_start"),
        col("n_0").cast("long").as("users_0"),
        col("n_1").cast("long").as("users_1"),
        (expr(meanRaw(0)) / lit(10000.0)).as("mean_0"),
        (expr(meanRaw(1)) / lit(10000.0)).as("mean_1"),
        (col("adj0_i") / lit(10000.0)).as("mean_adj_0"),
        (col("adj1_i") / lit(10000.0)).as("mean_adj_1"),
        (col("theta_i") / lit(10000.0)).as("theta"),
        (col("vr_i") / lit(10000.0)).as("var_reduction"),
        when(col("adj0_i").isNull || col("adj1_i").isNull ||
          col("theta_i").isNull || col("vr_i").isNull, 1L)
          .otherwise(0L).as("overflow"))
  }

  /** Streaming X144 — windowed quantile-treatment-effect readout
    * (`qteFeed`): the distributional live dial that completes the
    * experimentation quartet (SRM → A/B → CUPED → QTE) — per
    * event-time window, each arm's EXACT type-1 p25/p50/p75 of the
    * per-user outcome and the median gap, the same order statistics
    * as the offline [[graft.operators.Extensions.qteOf]] (positions
    * (n+3)÷4, (n+1)÷2, (3n+3)÷4 — integers, no interpolation, so no
    * float can move a digit). Lines are the quartet's
    * `epoch_sec variant user_id y` shape.
    *
    * Execution: the [[srmFeed]] three-stage chain with a HISTOGRAM
    * second stage — (1) per-(window, variant, user) outcome sums;
    * (2) per-(window, variant, y) user counts: state bounded by
    * DISTINCT outcome values per arm (a count metric's support),
    * never by users — the streaming substitute for the batch
    * range-machine rank; (3) one row per window collecting the
    * ≤ǀsupportǀ·2 histogram, quantiles recovered by a post-agg HOF
    * fold over the sorted histogram (the [[driftFeed]] discipline:
    * the only state is aggregates; the fold is stateless plan work) —
    * cum-count threshold scan, exactly "smallest y whose cumulative
    * count reaches the position" (GatewaySpec pins stream ≡ batch ≡
    * qteOf ≡ recount).
    */
  def qteFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 5).as("p"))
      .filter(size(col("p")) >= 4 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull &&
        col("p").getItem(3).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("variant"),
        col("p").getItem(2).cast("long").as("user_id"),
        col("p").getItem(3).cast("long").as("y"))
      .withWatermark("ts", watermarkDelay)
    val perUser = parsed
      .groupBy(window(col("ts"), windowDuration), col("variant"), col("user_id"))
      .agg(sum(col("y")).as("y"))
    val hist = perUser
      .groupBy(window(window_time(col("window")), windowDuration), col("variant"), col("y"))
      .agg(count(lit(1)).as("c"))
    // exact type-1 order statistic off a sorted (y, c) histogram:
    // the smallest y whose cumulative user count reaches `pos`
    def ostat(arr: String, pos: String): String =
      s"""aggregate($arr, named_struct('cum', CAST(0 AS BIGINT), 'q', CAST(NULL AS BIGINT)),
         |  (a, e) -> named_struct('cum', a.cum + e.c,
         |    'q', CASE WHEN a.q IS NULL AND a.cum + e.c >= $pos THEN e.y ELSE a.q END)).q"""
        .stripMargin
    def quantiles(v: Int): Seq[(String, String)] = {
      val pos = Map(
        "p25" -> s"CAST((n_$v + 3) DIV 4 AS BIGINT)",
        "p50" -> s"CAST((n_$v + 1) DIV 2 AS BIGINT)",
        "p75" -> s"CAST((3 * n_$v + 3) DIV 4 AS BIGINT)")
      Seq("p25", "p50", "p75").map(p =>
        s"${p}_$v" -> s"coalesce(${ostat(s"h_$v", pos(p))}, CAST(0 AS BIGINT))")
    }
    hist
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(collect_list(struct(col("variant"), col("y"), col("c"))).as("hist"))
      .withColumn("h_0", expr("sort_array(filter(hist, e -> e.variant = 0))"))
      .withColumn("h_1", expr("sort_array(filter(hist, e -> e.variant = 1))"))
      .withColumn("n_0", expr("aggregate(h_0, CAST(0 AS BIGINT), (a, e) -> a + e.c)"))
      .withColumn("n_1", expr("aggregate(h_1, CAST(0 AS BIGINT), (a, e) -> a + e.c)"))
      .select(
        Seq(
          col("window.start").as("window_start"),
          col("n_0").cast("long").as("users_0"),
          col("n_1").cast("long").as("users_1")) ++
          (quantiles(0) ++ quantiles(1)).map { case (n, e) =>
            expr(e).cast("long").as(n)
          } :+
          // qteOf's median_gap is max−min over PRESENT arms: with one
          // arm absent there is nothing to compare — gap 0, same as a
          // single qteOf row
          when(col("n_0") === 0 || col("n_1") === 0, lit(0L))
            .otherwise(abs(expr(quantiles(0)(1)._2) - expr(quantiles(1)(1)._2)))
            .cast("long").as("median_gap"): _*)
  }

  /** Streaming X149 — windowed calibration-drift monitor
    * (`calibrationFeed`): the admission classifier's live health
    * dial — X149 reads calibration once, offline; what production
    * needs is the TREND, because concept drift shows up as ECE
    * creep (the score stays discriminative long after it stops
    * meaning its magnitude). Per event-time window, one audit row:
    * docs, populated bins, ECE and MCE — every number the identical
    * integer form of the offline [[graft.operators.Curation
    * .clfCalibration]] math on that window's slice (exact-rational
    * p6 squash, per-bin 4dp HALF_UP means, ECE folded from ROUNDED
    * bin gaps), so the dial and the audit can never disagree.
    * Lines are the [[admitFeed]] document shape
    * (`epoch_sec doc_id text`).
    *
    * Execution: both gates are stateless in-row column work (the
    * [[admitFeed]] precedent); the only state is the skewFeed
    * two-stage chain — per-(window, bin) integer sums, the bin
    * gap computed STATELESSLY between the stages, then the ≤10-row
    * dictionary folds to the audit row (GatewaySpec pins stream ≡
    * batch ≡ a BigInt recount of the X149 forms).
    */
  def calibrationFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val scored = graft.operators.Curation.withRuleFlags(
      graft.operators.Curation.withClfColumns(parsed))
      .select(
        col("ts"),
        ((col("clf_logit6") + 100000L) * 5L).as("p6"),
        col("keep").cast("long").as("y"))
    scored
      .groupBy(window(col("ts"), windowDuration),
        expr("least(p6 DIV 100000, 9)").cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p6")).as("sp6"), sum(col("y")).as("sy"))
      .withColumn("mp4", expr("CAST((2 * sp6 + 100 * n) DIV (200 * n) AS BIGINT)"))
      .withColumn("ob4", expr("CAST((20000 * sy + n) DIV (2 * n) AS BIGINT)"))
      .withColumn("agap", abs(col("mp4") - col("ob4")))
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(
        sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_bins"),
        sum(col("n") * col("agap")).as("sgap"),
        max(col("agap")).as("mce4"))
      .select(
        col("window.start").as("window_start"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_bins").cast("long").as("n_bins"),
        (expr("CAST((2 * sgap + n_docs) DIV (2 * n_docs) AS BIGINT)")
          / lit(10000.0)).as("ece"),
        (col("mce4") / lit(10000.0)).as("mce"))
  }

  /** Streaming X154 — windowed synthetic-text monitor
    * (`watermarkFeed`): the green-list screen as an ingest dial —
    * a crawl whose watermark-flag rate jumps off the ~2.3% null tail
    * is suddenly full of machine-generated text (or re-crawling one
    * generator's output), and that is a THIS-WINDOW question. Lines
    * are the admission shape (`epoch_sec doc_id text`); per
    * event-time window one audit row: docs, flagged docs (the
    * IDENTICAL integer-exact (2g−n)² ≥ 4n verdict as the batch
    * X154), the 4dp flag share, and the mean z — each per-doc z
    * snapped to millionths BEFORE summing (the X51 term discipline),
    * so the window mean is an exact integer quotient and micro-batch
    * boundaries cannot move a digit. Stateless in-row HOF work +
    * ONE watermark-bounded windowed sum (the novelFeed class);
    * GatewaySpec pins stream ≡ batch frame ≡ a per-doc recount off
    * the declared q_watermark rows.
    */
  def watermarkFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        split(col("p").getItem(2), " ").as("w"))
      .select(
        col("ts"),
        size(col("w")).cast("long").as("n"),
        expr("size(filter(w, x -> CAST(conv(substring(md5(concat('wm ', x)), 1, 8), 16, 10) AS BIGINT) % 2 = 0))")
          .cast("long").as("g"))
      .select(
        col("ts"),
        ((col("g") * 2 >= col("n")) &&
          (col("g") * 2 - col("n")) * (col("g") * 2 - col("n")) >= col("n") * 4)
          .cast("long").as("flagged"),
        // per-doc z snapped to integer millionths before the window sum
        round(lit(1000000.0) * (lit(2L) * col("g") - col("n")) / sqrt(col("n")), 0)
          .cast("long").as("z6"))
      .withWatermark("ts", watermarkDelay)
    parsed
      .groupBy(window(col("ts"), windowDuration))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("flagged")).as("n_flagged"),
        sum(col("z6")).as("sz6"))
      .select(
        col("window.start").as("window_start"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_flagged").cast("long").as("n_flagged"),
        (expr("CAST((20000 * n_flagged + n_docs) DIV (2 * n_docs) AS BIGINT)")
          / lit(10000.0)).as("flag_share"),
        // signed 4dp HALF_UP mean off the exact integer z6 sum
        (expr(
          """CAST(CASE WHEN sz6 >= 0
            |  THEN (2 * sz6 + 100 * n_docs) DIV (200 * n_docs)
            |  ELSE -((2 * -sz6 + 100 * n_docs) DIV (200 * n_docs)) END AS BIGINT)"""
            .stripMargin) / lit(10000.0)).as("mean_z"))
  }

  /** Streaming X138 — windowed ranking-quality monitor
    * (`rankEvalFeed`): the live dial on the retrieval stack — the
    * offline X138 eval scores a ranking once; production wants the
    * TREND, because an index rebuild, a scorer regression, or corpus
    * drift shows up as nDCG creep long before users complain. Input
    * is the judged impression log (`epoch_sec rank rel` — the rank a
    * document was served at and its editorial grade riding the log);
    * per event-time window and cut-off K ∈ {5, 10, 20} one audit row:
    * precision@K, nDCG@K, MRR — every number the IDENTICAL form of
    * the offline [[graft.operators.Search]] X138 math (per-term
    * round-to-millionths of gain/log₂(rank+1) BEFORE summing, exact
    * rational precision/MRR, 4dp HALF_UP), so the dial and the
    * offline eval can never disagree on a digit.
    *
    * The IDEAL ordering cannot be learned from served impressions
    * (top-20 ≠ the corpus), so the corpus relevance histogram ships
    * as a bounded offline artifact in plan literals (the
    * [[novelFeed]] pattern) — the cumulative-coverage grid is pure
    * integer work done at plan build, only the log₂ terms evaluate
    * in Spark expressions (the same `round(1e6·(2^rel−1)/log2(rk+1))`
    * composition as the batch side).
    *
    * Execution: the [[abFeed]] three-stage chain — (1) per
    * (window, rank, doc) the max grade seen (replay absorbed by the
    * max), (2) per (window, rank) the impression count / hit count /
    * Σ gain-term fold, (3) the ≤20-row dictionary collapses to one
    * sorted array per window, and the K-ladder is stateless HOF
    * algebra over it (GatewaySpec pins stream ≡ the batch
    * `q_rank_eval` rows on the same judged ranking).
    *
    * Multi-impression handling (r16 ADVICE → closed structurally
    * r18): lines may carry an optional 4th token, the served
    * document's id (`epoch_sec rank rel doc`). Stage 1 keys state by
    * (rank, doc), so REPLAY of an impression is still absorbed by
    * max(rel) — but two DISTINCT documents genuinely served at the
    * same rank in one window now score as two impressions: stage 2
    * folds each rank slot to its impression count, relevant-hit
    * count, and the Σ of per-document 6dp gain terms, and the
    * K-ladder uses the per-rank AVERAGE (exact HALF_UP rationals —
    * (2·Σt6 + c) div (2c), which degenerates to the single term when
    * c = 1), so live nDCG/P@K read as the impression-weighted
    * quality of the traffic actually served, never the best document
    * shown (the upper-bound bias the r16 review flagged). Id-less
    * logs parse doc = "" — every impression at a rank shares one
    * state slot and the old max(rel) reduction applies verbatim, so
    * the dial stays digit-exact vs the batch `q_rank_eval` on one
    * judged ranking per window (GatewaySpec pins both: the parity
    * fixture and a two-docs-at-one-rank window averaging, not
    * maxing). MRR keeps min-rank-of-any-rel-3 — for interleaved
    * traffic it is a best-case dial by definition (documented, not
    * averaged: reciprocal rank has no per-slot decomposition).
    * State bound: 20 rank slots × distinct docs served per slot per
    * window (exactly 20 for id-less logs).
    */
  def rankEvalFeed(
      lines: DataFrame,
      relHist: Seq[(Long, Long)],
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(relHist.nonEmpty, "corpus relevance histogram artifact must be non-empty")
    val ks = graft.operators.Search.rankEvalKs
    // ideal (rank, rel) grid from the histogram artifact: rank r's
    // ideal grade is the largest rel whose >=-cumulative count covers
    // r — integer logic, safe to fold at plan build
    val cumGe = relHist.sortBy(-_._1)
      .scanLeft((Long.MaxValue, 0L)) { case ((_, c), (r, n)) => (r, c + n) }.drop(1)
    val idealPairs = (1 to ks.max).flatMap { rk =>
      cumGe.filter(_._2 >= rk).map(_._1).maxOption.map(rel => (rk.toLong, rel))
    }
    val idealLit = idealPairs
      .map { case (rk, rel) =>
        s"named_struct('rk', CAST($rk AS BIGINT), 'rel', CAST($rel AS BIGINT))"
      }
      .mkString("array(", ", ", ")")
    def t6(rkE: String, relE: String): String =
      s"CAST(round(1000000.0 * CAST(shiftleft(1, CAST($relE AS INT)) - 1 AS DOUBLE)" +
        s" / log2($rkE + 1), 0) AS BIGINT)"
    def dcg6(arr: String): String =
      s"aggregate(filter($arr, e -> e.rk <= k), CAST(0 AS BIGINT)," +
        s" (a, e) -> a + ${t6("e.rk", "e.rel")})"
    val parsed = lines
      .select(split(col("value"), " ", 4).as("p"))
      .filter(size(col("p")) >= 3 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("rk"),
        col("p").getItem(2).cast("long").as("rel"),
        // optional doc id: id-less logs collapse each rank slot to
        // ONE state key ("") — the pre-r18 max(rel) semantics exactly
        // (get(), not getItem: a missing 4th token must read NULL,
        // not throw under ANSI mode)
        coalesce(get(col("p"), lit(3)), lit("")).as("doc"))
      .filter(col("rk") >= 1L && col("rk") <= ks.max.toLong &&
        col("rel") >= 0L && col("rel") <= 3L)
      .withWatermark("ts", watermarkDelay)
    parsed
      .groupBy(window(col("ts"), windowDuration), col("rk"), col("doc"))
      .agg(max(col("rel")).as("rel"))
      // per rank slot: impressions served, relevant hits, Σ of the
      // per-document 6dp gain terms, and the best grade (for MRR)
      .groupBy(window(window_time(col("window")), windowDuration), col("rk"))
      .agg(
        count(lit(1)).as("c"),
        sum(when(col("rel") >= 2, 1L).otherwise(0L)).as("hit_c"),
        sum(expr(t6("rk", "rel"))).as("sum_t6"),
        max(col("rel")).as("max_rel"))
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(collect_list(struct(col("rk"), col("c"), col("hit_c"),
        col("sum_t6"), col("max_rel"))).as("a0"))
      .select(
        col("window.start").as("window_start"),
        expr("sort_array(a0)").as("arr"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      // Σ over ranks ≤ k of the per-rank relevant-impression SHARE,
      // 6dp HALF_UP ((2e6·hit_c + c) div 2c == 1e6·hit when c = 1)
      .withColumn("hits6", expr(
        """aggregate(filter(arr, e -> e.rk <= k), CAST(0 AS BIGINT),
          |  (a, e) -> a + ((2000000 * e.hit_c + e.c) DIV (2 * e.c)))"""
          .stripMargin))
      // Σ over ranks ≤ k of the per-rank AVERAGE gain term, same
      // exact-rational form ((2·Σt6 + c) div 2c == the term at c = 1)
      .withColumn("dcg6", expr(
        """aggregate(filter(arr, e -> e.rk <= k), CAST(0 AS BIGINT),
          |  (a, e) -> a + ((2 * e.sum_t6 + e.c) DIV (2 * e.c)))"""
          .stripMargin))
      .withColumn("idcg6", expr(dcg6(idealLit)))
      .withColumn("r1",
        expr("array_min(transform(filter(arr, e -> e.max_rel = 3), e -> e.rk))"))
      .select(
        col("window_start"),
        col("k"),
        // (2·hits6 + 100k) div 200k == the old (20000·hits + k) div 2k
        // when every rank served one impression — digit-exact parity
        (expr("CAST((2 * hits6 + 100 * k) DIV (200 * k) AS BIGINT)")
          / lit(10000.0)).as("p_at_k"),
        when(col("idcg6") === 0, lit(0.0)).otherwise(
          expr("CAST((20000 * dcg6 + idcg6) DIV (2 * idcg6) AS BIGINT)")
            / lit(10000.0)).as("ndcg"),
        (coalesce(expr("CAST((20000 + r1) DIV (2 * r1) AS BIGINT)"), lit(0L))
          / lit(10000.0)).as("mrr"))
  }

  /** Streaming X151 — windowed mixture-temperature sweep
    * (`temperatureFeed`): "what would the resampled mix look like on
    * what we ingested THIS window" — the offline X151 alpha-sweep
    * grid as a live dial, so a crawl whose language balance drifts
    * shows its repetition-risk consequences (`epochs`, `max_epochs`)
    * while the batch is still being written. Lines are
    * `epoch_sec doc_id lang`; per (window, T ∈ {1,2,4,8}, slice) one
    * row with the identical iterated-sqrt p ∝ n^(1/T), 4dp weight /
    * epochs quotients, and the per-T max-epochs verdict column.
    *
    * Float parity with the batch (the X25/X151 argument, re-proved
    * for the fold): the batch normalizer is a lang-ORDERED window sum
    * — a left fold over doubles in lang order from 0.0 — and here the
    * per-window dictionary is `sort_array`ed before an `aggregate`
    * HOF folds the identical doubles in the identical order, so the
    * same ulp story holds and GatewaySpec pins stream ≡ batch
    * digit-for-digit.
    *
    * Execution: ONE stateful windowed count per (window, lang) (the
    * [[skewFeed]] chain stage 1), the ≤ǀslicesǀ dictionary collapses
    * to a sorted array per window, and the whole temperature grid is
    * stateless per-row HOF algebra over that array.
    */
  def temperatureFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val p = (nE: String) =>
      s"CASE WHEN t = 1 THEN CAST($nE AS DOUBLE) WHEN t = 2 THEN sqrt($nE) " +
        s"WHEN t = 4 THEN sqrt(sqrt($nE)) ELSE sqrt(sqrt(sqrt($nE))) END"
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(2).as("lang"))
      .withWatermark("ts", watermarkDelay)
    parsed
      .groupBy(window(col("ts"), windowDuration), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(collect_list(struct(col("lang"), col("n_docs"))).as("d0"))
      .select(
        col("window.start").as("window_start"),
        expr("sort_array(d0)").as("dict"),
        explode(array(graft.operators.Curation.mixTemperatures.map(lit(_)): _*)).as("t"))
      .withColumn("sp", expr(
        s"aggregate(transform(dict, e -> ${p("e.n_docs")}), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"))
      .withColumn("nn", expr("aggregate(dict, CAST(0 AS BIGINT), (a, e) -> a + e.n_docs)"))
      .withColumn("max_epochs", expr(
        s"array_max(transform(dict, e -> round(${p("e.n_docs")} * nn / (sp * e.n_docs), 4)))"))
      .select(
        col("window_start"),
        col("t").cast("long").as("t"),
        explode(col("dict")).as("e"),
        col("sp"), col("nn"), col("max_epochs"))
      .select(
        col("window_start"),
        col("t"),
        col("e.lang").as("lang"),
        col("e.n_docs").cast("long").as("n_docs"),
        expr(s"round(${p("e.n_docs")} / sp, 4)").as("weight"),
        expr(s"round(${p("e.n_docs")} * nn / (sp * e.n_docs), 4)").as("epochs"),
        col("max_epochs"))
  }

  /** Streaming X156 — windowed UniMax allocation dial (`unimaxFeed`):
    * "if we trained on what arrived THIS window, what would the fair
    * language budget look like" — the offline X156 waterfilling as a
    * live dial beside [[temperatureFeed]], so a crawl whose language
    * balance drifts shows its allocation consequences (which
    * languages cap at the repetition bound, how much budget the head
    * language absorbs) as they happen. Lines are the admission shape
    * `epoch_sec doc_id lang text…`; per-doc token counts are in-row.
    *
    * Execution: (1) collapse to (window, lang, doc) with `max(tok)` —
    * at-least-once replay of a document is absorbed here, the
    * [[clusterSizesFeed]] discipline; (2) re-window to the per-lang
    * token dictionary; (3) one sorted array per window, and the WHOLE
    * closed-form waterfilling — capped prefix K (first-failure rule),
    * uniform base, remainder to the largest capacities — is stateless
    * HOF algebra over it (batch X156 uses analytic windows, which do
    * not stream; slice/aggregate folds over the ≤ǀlangsǀ dictionary
    * compute the identical integers in O(ǀlangsǀ²) per window, which
    * is nothing). Digit-identical integer forms end-to-end, so
    * GatewaySpec pins stream ≡ the declared `q_unimax` rows when the
    * feed carries the batch corpus in one window.
    */
  def unimaxFeed(
      lines: DataFrame,
      epochsCap: Long = graft.operators.Curation.unimaxEpochCap,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 4).as("p"))
      .filter(size(col("p")) === 4 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("lang"),
        size(split(col("p").getItem(3), " ")).cast("long").as("tok"))
      .withWatermark("ts", watermarkDelay)
    val perDoc = parsed
      .groupBy(window(col("ts"), windowDuration), col("lang"), col("doc_id"))
      .agg(max(col("tok")).as("tok"))
    val perLang = perDoc
      .groupBy(window(window_time(col("window")), windowDuration), col("lang"))
      .agg(sum(col("tok")).as("n_tokens"))
    // per-row helpers over the sorted dictionary (1-based rank r):
    // capacity is the struct's FIRST field so sort_array orders by
    // (capacity, lang); pprev(r) folds the prefix before r
    def pprev(r: String): String =
      s"aggregate(slice(arr, 1, $r - 1), CAST(0 AS BIGINT), (a, e) -> a + e.c)"
    perLang
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(collect_list(struct(
        (col("n_tokens") * lit(epochsCap)).as("c"),
        col("lang"), col("n_tokens"))).as("d0"))
      .select(
        col("window.start").as("window_start"),
        expr("sort_array(d0)").as("arr"))
      .withColumn("nl", size(col("arr")).cast("long"))
      .withColumn("total",
        expr("aggregate(arr, CAST(0 AS BIGINT), (a, e) -> a + e.n_tokens)"))
      .withColumn("budget", expr("(3 * total) div 2"))
      // first-failure rule: smallest rank whose capacity exceeds the
      // exact fair share of what remains — NULL-filtered indexed scan
      .withColumn("kk", expr(
        s"""coalesce(array_min(filter(
           |  transform(sequence(1, CAST(nl AS INT)),
           |    r -> IF(element_at(arr, r).c * (nl - r + 1) > budget - ${pprev("r")},
           |            CAST(r AS BIGINT), CAST(NULL AS BIGINT))),
           |  x -> x IS NOT NULL)), nl + 1) - 1""".stripMargin))
      .withColumn("pk", expr(pprev("CAST(kk AS INT) + 1")))
      .withColumn("r", col("budget") - col("pk"))
      .withColumn("u", col("nl") - col("kk"))
      .withColumn("base", when(col("u") === 0, lit(0L)).otherwise(expr("r div u")))
      .withColumn("remx", when(col("u") === 0, lit(0L)).otherwise(expr("r % u")))
      .select(
        col("window_start"),
        posexplode(col("arr")).as(Seq("p0", "e")),
        col("nl"), col("budget"), col("kk"),
        col("base"), col("remx"), col("u"), col("r"))
      .withColumn("i", (col("p0") + 1).cast("long"))
      .select(
        col("window_start"),
        col("e.lang").as("lang"),
        col("e.n_tokens").cast("long").as("n_tokens"),
        col("e.c").cast("long").as("capacity"),
        when(col("i") <= col("kk"), col("e.c"))
          .otherwise(col("base") +
            when(col("i") >= col("nl") - col("remx") + 1, 1L).otherwise(0L))
          .cast("long").as("allocation"),
        col("i"), col("kk"), col("budget"), col("u"), col("r"))
      .withColumn("epochs",
        expr("(20000 * allocation + n_tokens) div (2 * n_tokens)").cast("double") / 10000.0)
      .select(
        col("window_start"), col("lang"), col("n_tokens"), col("capacity"),
        col("allocation"), col("epochs"),
        when(col("i") <= col("kk"), 1L).otherwise(0L).as("capped"),
        col("budget").cast("long").as("budget"),
        when(col("u") === 0, col("r")).otherwise(lit(0L)).cast("long").as("unallocated"))
  }

  /** Streaming X157 — windowed distinct-shingle cardinality dial
    * (`hllFeed`): the live version of `q_hll_distinct`'s sketch side
    * — per window and source, the deterministic-HLL estimate of the
    * distinct bigram shingles ingested, the number an ingest owner
    * watches to catch a source that suddenly collapses to templates
    * (distinct shingles flat while volume grows) or explodes in
    * vocabulary (a crawl that drifted into another language). Lines
    * are the admission shape `epoch_sec source text…`; no exact audit
    * column in the stream — the audit lives in the batch query; the
    * stream ships ONLY the sketch (that being its whole point).
    *
    * Replay absorption is structural, not bolted on: the stateful
    * stage keys (window, source, bucket) → max(ρ), and register max
    * is IDEMPOTENT (HllSketchProps) — an at-least-once redelivery of
    * any line leaves every register bit-identical, with no extra
    * per-doc dedup state (contrast [[unimaxFeed]], which needs the
    * per-doc collapse). State is bounded by 256 registers per
    * (window, source) regardless of volume. The estimate algebra
    * downstream is the SAME [[graft.operators.TextAnalysis.hllEstimate]]
    * the batch query and the oracle share — GatewaySpec pins stream ≡
    * batch digit-for-digit at two SFs.
    */
  def hllFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 &&
        col("p").getItem(0).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("source"),
        split(col("p").getItem(2), " ").as("w"))
      .withWatermark("ts", watermarkDelay)
    // Total-guard (ADVICE r18): a 1-word (or empty) line gives
    // sequence(1, 0), which Spark evaluates as the DESCENDING array
    // [1, 0] — element_at(w, 0) then throws INVALID_INDEX_OF_ZERO and
    // one short line kills the whole streaming query. Same rule as the
    // dedup feed's guard: generator-adjacent lambdas must be total.
    // A <2-word doc contributes zero bigrams, exactly what the oracle's
    // empty generate_series(1, 0) yields.
    val regs = parsed
      .select(col("ts"), col("source"), explode(expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END"))
        .as("tok"))
      .select(col("ts"), col("source"),
        graft.operators.Hashing.h60(col("tok")).as("h"))
      .select(col("ts"), col("source"),
        expr("h DIV 4503599627370496").as("j"),
        expr("h % 4503599627370496").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(53L))
          .otherwise(lit(53L) - length(bin(col("w")))))
      .groupBy(window(col("ts"), windowDuration), col("source"), col("j"))
      .agg(max(col("rho")).as("mj"))
    val perKey = regs
      .groupBy(window(window_time(col("window")), windowDuration), col("source"))
      .agg(
        count(lit(1)).as("obs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))")).as("s_obs"))
      .select(
        col("window.start").as("window_start"),
        col("source"),
        (col("s_obs") + (lit(256L) - col("obs")) * lit(1L << 53)).as("s"),
        (lit(256L) - col("obs")).as("v_empty"))
    graft.operators.TextAnalysis.hllEstimate(perKey)
      .select(col("window_start"), col("source"), col("hll_est"),
        col("v_empty").cast("long").as("v_empty"), col("branch"))
  }

  /** Streaming X160 — rolling-window distinct-user dial
    * (`hllRollingFeed`): the live version of `q_hll_rolling`'s sketch
    * side — per event type and closed event-time DAY, the HLL
    * estimate of distinct users over the trailing
    * [[graft.operators.Extensions.hllRollingDays]]-day window, the
    * WAU/MAU-style dial that completes the sketch cube (VERDICT r18
    * #8: [[hllFeed]] covers per-window registers; this feed adds the
    * RANGE-max MERGE over per-day register state). Lines are
    * `epoch_sec event_type user_id`.
    *
    * Execution: register coordinates (day, j, ρ) are computed IN-ROW
    * by the same expressions as the batch cube, then ONE
    * `flatMapGroupsWithState` keyed by event type holds per-day
    * 256-register vectors and, whenever the watermark closes a day,
    * emits that day's trailing-window merge (elementwise max over the
    * retained ≤[[graft.operators.Extensions.hllRollingDays]] day
    * vectors — registers are mergeable, which is the whole reason a
    * rolling distinct can stream at all; the exact-audit column stays
    * batch-only, the [[hllFeed]] argument). State per event type is
    * ≤ rollingDays × 256 longs and is evicted as days leave every
    * future window, with an idle-horizon timeout dropping the key
    * entirely; replay absorption is structural (register max is
    * idempotent, and a replay of an already-closed day is ignored at
    * the fold — the watermark contract says nothing on-time can
    * arrive there). Day keying matches the cube's
    * `unix_micros DIV 86400000000`; downstream the emitted (s,
    * v_empty) rows run the SAME
    * [[graft.operators.TextAnalysis.hllEstimate]] algebra as batch +
    * oracle. GatewaySpec pins stream ≡ the batch cube's sketch
    * columns at two SFs.
    */
  def hllRollingFeed(
      lines: DataFrame,
      rollingDays: Int = graft.operators.Extensions.hllRollingDays,
      watermarkDelay: String = "30 days"): DataFrame = {
    val sp = lines.sparkSession
    import sp.implicits._
    val dayMs = 86400000L
    val regs = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("evTs"),
        col("p").getItem(1).as("eventType"),
        col("p").getItem(2).as("user_id"))
      .withWatermark("evTs", watermarkDelay)
      .select(col("evTs"), col("eventType"),
        expr("CAST(unix_micros(evTs) DIV 86400000000 AS BIGINT)").as("day"),
        graft.operators.Hashing.h60(col("user_id")).as("h"))
      .select(col("evTs"), col("eventType"), col("day"),
        expr("CAST(h DIV 4503599627370496 AS INT)").as("j"),
        expr("h % 4503599627370496").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(53L))
          .otherwise(lit(53L) - length(bin(col("w")))))
      .select(col("eventType"), col("day"), col("j"), col("rho"), col("evTs"))
      .as[HllRollReg]
    val rolled = regs
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (et: String, it: Iterator[HllRollReg], state: GroupState[HllRollState]) =>
          // -1 sentinel, NOT Long.MinValue: the eviction bound below
          // computes upTo - rollingDays, which would wrap past
          // Long.MaxValue and evict everything (pre-1970 event times
          // — negative day indexes — are out of the dial's domain)
          val prev = state.getOption.getOrElse(HllRollState(-1L, Map.empty))
          val local = scala.collection.mutable.Map.empty[Long, Array[Long]]
          prev.days.foreach { case (k, v) => local(k) = v.toArray }
          it.foreach { r =>
            // a day at/under the emission horizon is closed: the
            // watermark contract says nothing on-time arrives there,
            // so a replayed row is ignored, not re-merged
            if (r.day > prev.emittedUpTo) {
              val arr = local.getOrElseUpdate(r.day, Array.fill(256)(0L))
              if (r.rho > arr(r.j)) arr(r.j) = r.rho
            }
          }
          val wm = state.getCurrentWatermarkMs()
          val closed = local.keys
            .filter(d => d > prev.emittedUpTo && (d + 1) * dayMs <= wm)
            .toSeq.sorted
          val out = closed.map { d =>
            val merged = Array.fill(256)(0L)
            local.foreach { case (k, arr) =>
              if (k >= d - (rollingDays - 1) && k <= d) {
                var i = 0
                while (i < 256) { if (arr(i) > merged(i)) merged(i) = arr(i); i += 1 }
              }
            }
            var s0 = 0L
            var v0 = 0L
            var i = 0
            while (i < 256) {
              s0 += 1L << (53 - merged(i)).toInt
              if (merged(i) == 0L) v0 += 1
              i += 1
            }
            HllRollOut(et, d, s0, v0)
          }
          val upTo = if (closed.nonEmpty) closed.max else prev.emittedUpTo
          // retain only days a still-open trailing window can read
          val kept = local.filter { case (k, _) => k > upTo - rollingDays }
          val unemitted = kept.keys.filter(_ > upTo)
          if (state.hasTimedOut && unemitted.isEmpty) {
            // idle past the GC horizon with nothing left to close:
            // the dial's emitted history lives downstream
            state.remove()
          } else {
            state.update(HllRollState(upTo, kept.map { case (k, v) => k -> v.toSeq }.toMap))
            val target =
              if (unemitted.nonEmpty) (unemitted.min + 1) * dayMs
              else wm + 370L * dayMs // GC horizon for an idle key
            state.setTimeoutTimestamp(math.max(target, wm + 1L))
          }
          out.iterator
      }
    graft.operators.TextAnalysis.hllEstimate(rolled.toDF())
      .select(col("event_type"), col("day"),
        col("hll_est").as("hll_users"), col("branch"))
  }

  /** Streaming X158 — windowed length-quantile dial
    * (`histQuantilesFeed`): the live version of `q_hist_quantiles` —
    * per window and source, p50/p90/p99 of ingested document token
    * counts read from the same HdrHistogram bin dictionary, the
    * length-distribution drift dial an ingest owner pairs with
    * [[hllFeed]] (a source whose p99 collapses toward its p50 went
    * template-shaped; a p99 blow-up is a concatenation/parse bug).
    * Lines are the admission shape `epoch_sec source text…`.
    *
    * Execution: ONE stateful windowed count per (window, source, bin)
    * — state bounded by the ≤ ~1000-bin dictionary per key, counts
    * mergeable — then the ≤1000-row dictionary collapses to one
    * sorted array per window-source and rank selection is stateless
    * HOF algebra over it (the batch side's cumulative window does not
    * stream; the fold over the sorted dictionary computes the
    * identical integers). No exact-audit column in the stream — the
    * audit lives in the batch query (the [[hllFeed]] argument).
    * GatewaySpec pins stream ≡ the batch sketch columns at two SFs.
    * Unlike [[hllFeed]] the per-bin COUNT state is not idempotent, so
    * at-least-once replay is absorbed one stage earlier: the
    * (window, source, doc-slot) collapse does not exist here because
    * the line carries no doc id — replay tolerance is the watermark
    * dedup upstream ([[dedupFrames]]) as for the other count dials.
    */
  def histQuantilesFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 &&
        col("p").getItem(0).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("source"),
        size(split(col("p").getItem(2), " ")).cast("long").as("n"))
      .withWatermark("ts", watermarkDelay)
    val binned = graft.operators.TextAnalysis.histBinned(parsed)
      .groupBy(window(col("ts"), windowDuration), col("source"), col("idx"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("cnt"))
    binned
      .groupBy(window(window_time(col("window")), windowDuration), col("source"))
      .agg(collect_list(struct(col("idx"), col("lo"), col("hi"), col("cnt"))).as("d0"))
      .select(
        col("window.start").as("window_start"),
        col("source"),
        expr("sort_array(d0)").as("arr"))
      .withColumn("n_docs",
        expr("aggregate(arr, CAST(0 AS BIGINT), (a, e) -> a + e.cnt)"))
      .select(col("window_start"), col("source"), col("arr"), col("n_docs"),
        explode(array(
          struct(lit(50L).as("q_pct"), lit(1L).as("qn"), lit(2L).as("qd")),
          struct(lit(90L).as("q_pct"), lit(9L).as("qn"), lit(10L).as("qd")),
          struct(lit(99L).as("q_pct"), lit(99L).as("qn"), lit(100L).as("qd"))))
          .as("q"))
      .withColumn("rk", expr("CAST((q.qn * n_docs + q.qd - 1) DIV q.qd AS BIGINT)"))
      // least bin reaching the rank: fold carries (cum, lo, hi, done)
      .withColumn("win", expr(
        """aggregate(arr,
          |  named_struct('cum', CAST(0 AS BIGINT), 'lo', CAST(0 AS BIGINT),
          |               'hi', CAST(0 AS BIGINT), 'done', false),
          |  (a, e) -> IF(a.done, a,
          |    IF(a.cum + e.cnt >= rk,
          |       named_struct('cum', a.cum + e.cnt, 'lo', e.lo, 'hi', e.hi,
          |                    'done', true),
          |       named_struct('cum', a.cum + e.cnt, 'lo', a.lo, 'hi', a.hi,
          |                    'done', false))))""".stripMargin))
      .select(
        col("window_start"),
        col("source"),
        col("q.q_pct").as("q_pct"),
        col("n_docs"),
        expr("CAST((win.lo + win.hi) DIV 2 AS BIGINT)").as("est"),
        col("win.lo").as("lo"),
        col("win.hi").as("hi"))
  }

  /** Streaming X155 — windowed label-noise monitor
    * (`labelNoiseFeed`): confident learning as a drift dial — the
    * offline X155 estimates label error once; what production wants
    * is the TREND, because a rule-gate regression (or a crawl whose
    * text distribution moved under the classifier) shows up as
    * off-diagonal creep per window. Lines are the admission shape
    * (`epoch_sec doc_id text`); both gates run in-row (the
    * [[calibrationFeed]] precedent) and the CL assignment is
    * STATELESS because the class thresholds ship as the offline
    * artifact in plan literals (Σp6 and count per class — the
    * [[novelFeed]] bounded-artifact pattern; a live threshold would
    * make the verdict depend on micro-batch boundaries). Per window
    * one audit row: docs, the six given×{pred 0, pred 1, excluded}
    * cell counts as COLUMNS (complete by construction — the X101
    * absent-cell rule without a second stateful stage), and the 4dp
    * noise rate. Integer end-to-end, so GatewaySpec pins stream ≡
    * batch frame ≡ the declared `q_label_noise` grid when the feed
    * carries the batch corpus and the batch corpus's own thresholds.
    */
  def labelNoiseFeed(
      lines: DataFrame,
      s1: Long, n1: Long, s0: Long, n0: Long,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val assigned = graft.operators.Curation.withRuleFlags(
      graft.operators.Curation.withClfColumns(parsed))
      .select(
        col("ts"),
        ((col("clf_logit6") + 100000L) * 5L).as("p6"),
        col("keep").cast("long").as("y"))
      .withColumn("m1", expr(s"CAST(p6 AS DECIMAL(38,0)) * ${n1}L - ${s1}L"))
      .withColumn("m0", expr(s"CAST(1000000 - p6 AS DECIMAL(38,0)) * ${n0}L - ${s0}L"))
      .withColumn("pred",
        when(lit(n1) > 0L && col("m1") >= 0L && lit(n0) > 0L && col("m0") >= 0L,
          when(col("m1") * lit(n0) >= col("m0") * lit(n1), 1L).otherwise(0L))
          .when(lit(n1) > 0L && col("m1") >= 0L, 1L)
          .when(lit(n0) > 0L && col("m0") >= 0L, 0L)
          .otherwise(-1L))
    def cell(y: Long, p: Long): org.apache.spark.sql.Column =
      sum(when(col("y") === y && col("pred") === p, 1L).otherwise(0L))
    assigned
      .groupBy(window(col("ts"), windowDuration))
      .agg(
        count(lit(1)).as("n_docs"),
        cell(0L, 0L).as("n_00"), cell(0L, 1L).as("n_01"), cell(0L, -1L).as("n_0x"),
        cell(1L, 0L).as("n_10"), cell(1L, 1L).as("n_11"), cell(1L, -1L).as("n_1x"))
      .withColumn("conf_mass", col("n_00") + col("n_01") + col("n_10") + col("n_11"))
      .withColumn("noise_mass", col("n_01") + col("n_10"))
      .select(
        col("window.start").as("window_start"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_00").cast("long").as("n_00"), col("n_01").cast("long").as("n_01"),
        col("n_0x").cast("long").as("n_0x"), col("n_10").cast("long").as("n_10"),
        col("n_11").cast("long").as("n_11"), col("n_1x").cast("long").as("n_1x"),
        when(col("conf_mass") === 0L, lit(0.0)).otherwise(
          expr("CAST((20000 * noise_mass + conf_mass) DIV (2 * conf_mass) AS BIGINT)")
            / lit(10000.0)).as("noise_rate"))
  }

  /** Streaming X153 — windowed duplicate-cluster size histogram
    * (`clusterSizesFeed`): the release-card dedup shape as a live
    * dial — the offline X153 states how the promoted corpus
    * duplicates; what an ingest pipeline wants per window is whether
    * TODAY'S crawl is suddenly template-heavy (one giant cluster) or
    * pair-noisy (many 2-clusters), because the remediations differ
    * (keep-one dedup vs upstream template investigation). Lines are
    * label assignments `epoch_sec doc_id cluster_id` — the output
    * grain of an incremental-dedup assigner ([[dedupIncFeed]]'s
    * world); a SINGLETON (no duplicate partner) ships with a unique
    * sentinel cluster_id (the producer uses −doc_id), which is the
    * live substitute for the batch side's corpus anti-join (X153's
    * "histogram must state the singletons or the shares lie").
    *
    * Execution is the [[srmFeed]] chained-windowed-aggregation shape
    * one stage deeper — FOUR stateful aggregates in append mode, each
    * re-windowing on `window_time`: (1) collapse to (window, cluster,
    * doc) — at-least-once replay of a label row is absorbed here,
    * state bounded by labeled docs per horizon; (2) per-(window,
    * cluster) distinct-doc size — the live `sizes` dictionary;
    * (3) per-(window, bucket) cluster/doc/max counts — ≤9 rows per
    * window by construction (exact 1–4, power-of-two ranges, 33+
    * tail); (4) the ≤9-row dictionary collapses to one sorted array
    * per window and the shares/top-cluster ride out as stateless HOF
    * algebra over it, digit-identical to the batch X153 forms
    * (4dp HALF_UP in integer space), so GatewaySpec pins stream ≡
    * the declared `q_cluster_sizes` rows when the feed carries the
    * batch labels + sentinel singletons split across micro-batches.
    *
    * Scale: nothing here is pairwise — the feed consumes ASSIGNED
    * labels; state is docs-per-horizon at stage 1 (the admission
    * stream's own cardinality), clusters at stage 2, ≤9 rows after.
    */
  def clusterSizesFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val bucket = "CASE WHEN sz <= 4 THEN sz WHEN sz <= 8 THEN 5 " +
      "WHEN sz <= 16 THEN 9 WHEN sz <= 32 THEN 17 ELSE 33 END"
    val parsed = lines
      .select(split(col("value"), " ", 4).as("p"))
      .filter(size(col("p")) >= 3 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(2).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).cast("long").as("cluster_id"))
      .withWatermark("ts", watermarkDelay)
    val perDoc = parsed
      .groupBy(window(col("ts"), windowDuration), col("cluster_id"), col("doc_id"))
      .agg(count(lit(1)).as("events"))
    val sizes = perDoc
      .groupBy(window(window_time(col("window")), windowDuration), col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
    val hist = sizes
      .groupBy(
        window(window_time(col("window")), windowDuration),
        expr(bucket).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"), max(col("sz")).as("mx"))
    hist
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(collect_list(
        struct(col("bucket_lo"), col("n_clusters"), col("n_docs"), col("mx"))).as("h0"))
      .select(
        col("window.start").as("window_start"),
        expr("sort_array(h0)").as("h"))
      .withColumn("tot", expr("aggregate(h, CAST(0 AS BIGINT), (a, e) -> a + e.n_docs)"))
      .withColumn("dup", expr(
        "aggregate(h, CAST(0 AS BIGINT), (a, e) -> a + CASE WHEN e.bucket_lo = 1 THEN CAST(0 AS BIGINT) ELSE e.n_docs END)"))
      .withColumn("top", expr("array_max(transform(h, e -> e.mx))"))
      .select(col("window_start"), explode(col("h")).as("e"),
        col("tot"), col("dup"), col("top"))
      .select(
        col("window_start"),
        col("e.bucket_lo").as("bucket_lo"),
        col("e.n_clusters").cast("long").as("n_clusters"),
        col("e.n_docs").cast("long").as("n_docs"),
        (expr("CAST((20000 * e.n_docs + tot) DIV (2 * tot) AS BIGINT)")
          / lit(10000.0)).as("doc_share"),
        col("top").cast("long").as("top_cluster"),
        (expr("CAST((20000 * dup + tot) DIV (2 * tot) AS BIGINT)")
          / lit(10000.0)).as("dup_doc_share"))
  }

  /** Streaming X140 — windowed profile-drift gate
    * (`profileDriftFeed`): the snapshot-promotion regression check as
    * a live dial — the offline X140 diffs two corpus versions
    * nightly; the live form diffs EVERY window's column profile
    * against the last PROMOTED snapshot's profile, so an extractor
    * that starts NULLing `lang` or inflating `n_chars` mid-crawl
    * flags within a window instead of at the next nightly. Lines are
    * the profile grain `epoch_sec doc_id lang source n_chars text…`
    * (text is the tail, spaces and all); a missing lang ships as the
    * `-` token (the wire form of NULL — the stream analog of the
    * batch synthesis's NULLed extractor).
    *
    * The baseline profile is the offline artifact: SIX longs (rows,
    * lang nulls, lang/source distincts, n_chars and text-length sums)
    * shipped as plan literals — the [[novelFeed]] bounded-artifact
    * pattern; a live baseline would make the verdict depend on
    * micro-batch boundaries. Three chained stages: (0) collapse to
    * (window, doc) — at-least-once replay of a line is absorbed here
    * (the [[clusterSizesFeed]] discipline; every profile field is
    * static per doc), state bounded by docs per horizon; (1) the
    * (window, lang, source) profile dictionary — bounded by
    * |langs|×|sources|, the columns being profiled are categorical by
    * construction, and distinct counts NEVER run as streaming
    * DISTINCT aggregates (unsupported, and a cardinality landmine);
    * (2) a stateless HOF fold over the dictionary (distincts =
    * array_distinct over the dict, the [[temperatureFeed]]
    * discipline). The ≤6-metric unpivot and the 4dp integer
    * drift/flag forms ride out digit-identical to the batch X140
    * (20·|v2i−v1i| > max — no float can flip the flag), so
    * GatewaySpec pins stream ≡ the declared `q_profile_drift` rows
    * when the feed carries the batch v2 corpus against the batch v1
    * baseline artifact in one window, with a replayed chunk absorbed.
    */
  def profileDriftFeed(
      lines: DataFrame,
      baseline: ProfileBaseline,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 6).as("p"))
      .filter(size(col("p")) === 6 &&
        col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull &&
        col("p").getItem(4).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("lang"),
        col("p").getItem(3).as("source"),
        col("p").getItem(4).cast("long").as("n_chars"),
        length(col("p").getItem(5)).cast("long").as("text_len"))
      .withWatermark("ts", watermarkDelay)
    // stage 0 — collapse to (window, doc): at-least-once replay of a
    // line is absorbed here (every profile field is static per doc, so
    // max is the identity on the single value), the
    // [[clusterSizesFeed]] discipline; without it a redelivered chunk
    // inflates every count/sum and flags spurious drift (r17 review)
    val perDoc = parsed
      .groupBy(window(col("ts"), windowDuration), col("doc_id"))
      .agg(
        max(col("lang")).as("lang"),
        max(col("source")).as("source"),
        max(col("n_chars")).as("n_chars"),
        max(col("text_len")).as("text_len"))
    val dict = perDoc
      .groupBy(window(window_time(col("window")), windowDuration), col("lang"), col("source"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("n_chars")).as("nc_sum"),
        sum(col("text_len")).as("len_sum"))
    val folded = dict
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(collect_list(struct(
        col("lang"), col("source"), col("cnt"), col("nc_sum"), col("len_sum"))).as("d"))
      .withColumn("b_n", expr("aggregate(d, CAST(0 AS BIGINT), (a, e) -> a + e.cnt)"))
      .withColumn("b_lang_nulls", expr(
        "aggregate(d, CAST(0 AS BIGINT), (a, e) -> a + CASE WHEN e.lang = '-' THEN e.cnt ELSE CAST(0 AS BIGINT) END)"))
      .withColumn("b_lang_d", expr(
        "size(array_distinct(transform(filter(d, e -> e.lang != '-'), e -> e.lang)))").cast("long"))
      .withColumn("b_src_d", expr(
        "size(array_distinct(transform(d, e -> e.source)))").cast("long"))
      .withColumn("b_nc_sum", expr("aggregate(d, CAST(0 AS BIGINT), (a, e) -> a + e.nc_sum)"))
      .withColumn("b_len_sum", expr("aggregate(d, CAST(0 AS BIGINT), (a, e) -> a + e.len_sum)"))
    def q4(num: String, den: String): String =
      s"CAST((20000 * CAST($num AS DECIMAL(38,0)) + $den) DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT)"
    val metricRows = Seq(
      ("doc_id", "n_rows", s"${baseline.n}L * 10000", "b_n * 10000"),
      ("lang", "null_share",
        s"${q4(baseline.langNulls.toString, baseline.n.toString)}",
        q4("b_lang_nulls", "b_n")),
      ("lang", "n_distinct", s"${baseline.langDistinct}L * 10000", "b_lang_d * 10000"),
      ("source", "n_distinct", s"${baseline.srcDistinct}L * 10000", "b_src_d * 10000"),
      ("n_chars", "mean",
        s"${q4(baseline.nCharsSum.toString, baseline.n.toString)}",
        q4("b_nc_sum", "b_n")),
      ("text", "len_mean",
        s"${q4(baseline.textLenSum.toString, baseline.n.toString)}",
        q4("b_len_sum", "b_n")))
    val stacked = metricRows.map { case (c, m, e1, e2) =>
      s"'$c', '$m', CAST($e1 AS BIGINT), CAST($e2 AS BIGINT)"
    }.mkString(s"stack(${metricRows.size}, ", ", ", ")")
    folded
      .select(
        col("window.start").as("window_start"),
        expr(s"$stacked AS (col_name, metric, v1i, v2i)"))
      .select(
        col("window_start"), col("col_name"), col("metric"),
        (col("v1i") / lit(10000.0)).as("v1"),
        (col("v2i") / lit(10000.0)).as("v2"),
        (abs(col("v2i") - col("v1i")) / lit(10000.0)).as("drift"),
        when(lit(20L) * abs(col("v2i") - col("v1i"))
          > greatest(col("v1i"), col("v2i")), 1L).otherwise(0L).as("flagged"))
  }

  /** Streaming X131 — windowed topic-composition monitor
    * (`topicFeed`): "what domains are we ingesting RIGHT NOW" — the
    * offline X131 table as a live dial. Per event-time window and
    * topic lexicon: docs, lexicon members (≥ the X131 two-distinct-
    * word threshold, the identical in-row test), and the 4dp integer
    * share. The lexicons ride as plan literals (the [[novelFeed]]
    * bounded-artifact pattern), the flags are stateless in-row HOF
    * work, and the ONLY state is one watermark-bounded windowed
    * aggregate whose per-topic sums unpivot AFTER the aggregate —
    * integer counts end-to-end, so micro-batch boundaries cannot move
    * a digit (GatewaySpec pins stream ≡ batch ≡ sequential recount).
    */
  def topicFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val lex = graft.operators.TextAnalysis.topicLexicons
    val minHits = graft.operators.TextAnalysis.topicMinHits
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val flagged = lex.foldLeft(
      parsed.withColumn("__tw", array_distinct(split(col("text"), " ")))) {
      case (df, (t, words)) =>
        df.withColumn(s"__h_$t",
          (size(array_intersect(col("__tw"), array(words.map(lit(_)): _*)))
            >= minHits).cast("long"))
    }
    val agg = flagged
      .groupBy(window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("n_docs"),
        lex.keys.toSeq.map(t => sum(col(s"__h_$t")).as(s"h_$t")): _*)
    val stacked = lex.keys.map(t =>
      s"'$t', h_$t").mkString(s"stack(${lex.size}, ", ", ", ")")
    agg
      .select(col("window.start").as("window_start"), col("n_docs"),
        expr(s"$stacked AS (topic, hits)"))
      .select(
        col("window_start"), col("topic"),
        col("n_docs").cast("long").as("n_docs"),
        col("hits").cast("long").as("hits"),
        (expr("CAST((20000 * hits + n_docs) DIV (2 * n_docs) AS BIGINT)")
          / lit(10000.0)).as("share"))
  }

  /** Streaming X162 — windowed entity-mention audit (`entityFeed`):
    * per (event-time window, source), the email/URL/IPv4/year mention
    * counters of the declared batch `q_entity_stats` — the live
    * pre-flight a PII/redaction stage reads on the ingest path. Line
    * format `"<epoch> <source> <text>"`. Every counter is a stateless
    * in-row `regexp_extract_all` length over the SAME
    * [[graft.operators.TextAnalysis.entityPatterns]] grammar the
    * batch/oracle pair certifies (the X35 admission pattern: narrow
    * projection, no join), so the only state is ONE watermark-bounded
    * windowed aggregate and micro-batch boundaries cannot move a
    * digit — counts are exact integers. Since each doc lands in
    * exactly one window, the window-summed counters equal the batch
    * per-source totals, which is how GatewaySpec ties the dial to the
    * declared query (plus a per-window sequential recount).
    */
  def entityFeed(
      lines: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val pats = graft.operators.TextAnalysis.entityPatterns
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("source"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val counted = pats.foldLeft(parsed) { case (df, (name, pat)) =>
      df.withColumn(name,
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long"))
    }
    counted
      .groupBy(window(col("ts"), windowDuration), col("source"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("emails")).cast("long").as("emails"),
        sum(col("urls")).cast("long").as("urls"),
        sum(col("ipv4s")).cast("long").as("ipv4s"),
        sum(col("years")).cast("long").as("years"),
        sum(when(col("emails") + col("urls") + col("ipv4s") + col("years") > 0, 1L)
          .otherwise(0L)).cast("long").as("docs_with_entities"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("emails"), col("urls"), col("ipv4s"), col("years"),
        col("docs_with_entities"))
  }

  /** Streaming X163 — windowed winsorized-mean dial (`winsorizeFeed`):
    * per (event-time window, event type), raw vs winsorized mean and
    * the clip counts, against STATIC cuts — the offline artifact the
    * declared batch `q_winsorize` derives from its (type, cents)
    * dictionary, shipped here as plan-literal maps (the
    * labelNoiseFeed/novelFeed pattern: a live quantile would make the
    * clamp depend on micro-batch boundaries; the batch cut table is
    * ≤|event types| rows, a bounded artifact like X100's eval suite).
    * Line format `"<epoch> <event_type> <value>"`. The clamp and clip
    * flags are stateless in-row integer work on cents; the means are
    * the batch query's identical `(200·Σ + n) DIV (2n)` HALF_UP
    * integer forms, so stream ≡ batch frame ≡ BigInt recount
    * digit-for-digit. Types absent from the cut artifact are dropped
    * (un-audited types have no defined clamp), and since every event
    * lands in one window the window-summed n/clipped counts equal the
    * batch totals — GatewaySpec pins both.
    */
  def winsorizeFeed(
      lines: DataFrame,
      cuts: Seq[(String, Long, Long)],
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(cuts.nonEmpty, "winsorize cut artifact must be non-empty")
    val loMap = map(cuts.flatMap { case (t, lo, _) => Seq(lit(t), lit(lo)) }: _*)
    val hiMap = map(cuts.flatMap { case (t, _, hi) => Seq(lit(t), lit(hi)) }: _*)
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(2).cast("double").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).as("event_type"),
        expr("CAST(round(CAST(p[2] AS DOUBLE) * 100) AS BIGINT)").as("cents"))
      .withWatermark("ts", watermarkDelay)
      .withColumn("lo_cut", element_at(loMap, col("event_type")))
      .withColumn("hi_cut", element_at(hiMap, col("event_type")))
      .filter(col("lo_cut").isNotNull)
    parsed
      .select(col("ts"), col("event_type"), col("cents"), col("lo_cut"), col("hi_cut"),
        greatest(col("lo_cut"), least(col("hi_cut"), col("cents"))).as("wcents"),
        (col("cents") < col("lo_cut")).cast("long").as("is_lo"),
        (col("cents") > col("hi_cut")).cast("long").as("is_hi"))
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(
        count(lit(1)).as("nn"),
        min(col("lo_cut")).as("lo_cut"),
        min(col("hi_cut")).as("hi_cut"),
        sum(col("is_lo")).as("clipped_lo"),
        sum(col("is_hi")).as("clipped_hi"),
        sum(col("cents")).as("sc"),
        sum(col("wcents")).as("sw"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("nn").cast("long").as("n"),
        col("lo_cut").cast("long").as("lo_cut"),
        col("hi_cut").cast("long").as("hi_cut"),
        col("clipped_lo").cast("long").as("clipped_lo"),
        col("clipped_hi").cast("long").as("clipped_hi"),
        (expr("CAST((200 * sc + nn) DIV (2 * nn) AS BIGINT)") / lit(10000.0))
          .as("mean_raw"),
        (expr("CAST((200 * sw + nn) DIV (2 * nn) AS BIGINT)") / lit(10000.0))
          .as("mean_wins"))
  }

  /** Streaming X171 — JSON schema-drift monitor (`schemaDriftFeed`):
    * per event-time window, the `props` key inventory and how many
    * keys fall OUTSIDE a static known-key artifact — the live form of
    * the batch `q_schema_drift`, deployed the way a schema monitor
    * actually runs: the offline first-seen dictionary (the batch
    * query's own key set up to the deployment cut) ships as plan
    * literals (the novelFeed pattern), so per-key novelty is a
    * stateless `array_contains` and needs no global first-seen state.
    * Line format `"<epoch> <event_id> <props-json>"` (props may
    * contain spaces — limit-3 split). Distinct key counts NEVER run
    * as streaming DISTINCT (the profileDriftFeed rule): stage 1
    * collapses to the (window, key) dictionary — state bounded by
    * distinct keys per horizon, not events — and stage 2 re-windows
    * it (the skewFeed chained-aggregation pattern) into one audit row
    * per window. Batch first-seen semantics and the dial's
    * vs-artifact semantics agree whenever a new key's first window
    * is its only window (true of the planted day-named keys, which
    * is how GatewaySpec ties the dial to the declared query's rows).
    */
  def schemaDriftFeed(
      lines: DataFrame,
      knownKeys: Seq[String],
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(knownKeys.nonEmpty, "known-key artifact must be non-empty")
    val known = array(knownKeys.map(lit): _*)
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(2).as("props"))
      .withWatermark("ts", watermarkDelay)
    val perKey = parsed
      .select(col("ts"), explode(expr("json_object_keys(props)")).as("key"))
      .withColumn("is_new",
        when(array_contains(known, col("key")), 0L).otherwise(1L))
      .groupBy(window(col("ts"), windowDuration), col("key"), col("is_new"))
      .agg(count(lit(1)).as("mentions"))
    perKey
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(
        sum(col("mentions")).as("key_mentions"),
        count(lit(1)).as("n_keys"),
        sum(col("is_new")).as("n_new_keys"))
      .select(
        col("window.start").as("window_start"),
        col("key_mentions").cast("long").as("key_mentions"),
        col("n_keys").cast("long").as("n_keys"),
        col("n_new_keys").cast("long").as("n_new_keys"))
  }

  /** Streaming X37/X80 — windowed novel-vocabulary monitor
    * (`novelFeed`): per event-time window, the fraction of incoming
    * tokens OUTSIDE a static reference vocabulary — the live
    * saturation dial whose offline twins are X37 (per-doc OOV) and
    * X80 (per-source unseen mass). A crawl that suddenly spikes OOV
    * is yielding new vocabulary (or drifting into another language /
    * gibberish — X9/X82 decide which); one that flatlines near 0 is
    * re-crawling what the corpus already has. The reference vocab is
    * the bounded offline artifact (X37's top-V list) shipped as plan
    * literals, so the per-token test is a stateless `array_contains`
    * — no stream-static join, no state beyond ONE watermark-bounded
    * windowed sum. Counts are exact integers; the OOV percentage
    * rounds 4dp in integer space, so micro-batch boundaries cannot
    * move a digit (the [[driftFeed]] argument) and GatewaySpec pins
    * stream ≡ batch ≡ sequential recount.
    */
  def novelFeed(
      lines: DataFrame,
      vocab: Seq[String],
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(vocab.nonEmpty, "reference vocabulary must be non-empty")
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val vocabArr = array(vocab.map(lit): _*)
    parsed
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("oov", when(array_contains(vocabArr, col("tok")), 0L).otherwise(1L))
      .groupBy(window(col("ts"), windowDuration))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(col("oov")).cast("long").as("n_oov"))
      .select(
        col("window.start").as("window_start"),
        col("n_tokens"), col("n_oov"),
        (expr("(2000000 * n_oov + n_tokens) div (2 * n_tokens)").cast("double") / lit(10000.0))
          .as("oov_pct"))
  }

  /** Streaming X52+X35+X58 — the full ingest-time admission path the
    * r14 batch pipeline runs, on a live document feed: strip
    * corpus-frequent boilerplate windows (X52 phase 2 — the hot-chunk
    * set is the bounded artifact a deployment refreshes offline from
    * the historic corpus, [[graft.operators.Dedup.boilerplateHotSet]],
    * and ships here as plan literals; the strip itself is a stateless
    * narrow projection, identical batch and stream), gate on the X35
    * curation verdicts (stateless), then score each admitted doc's
    * DSIR importance weight (X58) against the PREBUILT dictionary
    * ([[graft.operators.Curation.dsirDict]], Heaps-law bounded): the
    * (doc, bigram) stream inner-joins the static dictionary — a
    * stateless stream-static equi-join, the [[dedupFeed]] shape — and
    * one watermark-bounded windowed aggregate keyed (window, doc_id)
    * sums the exact 1e-6 integer deltas, emitting each admitted doc's
    * `(window_start, doc_id, bp_dropped, n_bigrams, logratio,
    * clf_logit6, clf_keep)` once its window closes. The integer sum
    * is order-free, so stream micro-batching cannot change a weight
    * (the X48/X58 fixed-point discipline is exactly what makes
    * stream ≡ batch pinnable row-for-row).
    *
    * The X67 quality-classifier verdict rides the same path (r14
    * second wave): [[graft.operators.Curation.withClfColumns]]
    * computes it IN-ROW on the stripped text — no feature explode, no
    * second streaming aggregate; the per-doc-constant columns forward
    * through the existing aggregate as max(). GatewaySpec pins stream
    * ≡ batch ≡ the in-row twin, and CurationSpec pins the in-row twin
    * ≡ the declared explode+aggregate operator.
    *
    * Scale shape: strip + gates + bigram explode are per-row codegen'd
    * work; the dictionary join auto-broadcasts while the dict is small
    * and shuffles on `bg` beyond (the batch X58 profile); the only
    * stateful operator is the (window, doc_id)-keyed aggregate whose
    * state is bounded by watermark × admission rate.
    */
  /** Streaming composition flagship — the FULL ingest pipeline as ONE
    * streaming query (`ingestFeed`): `q_pipeline` is the offline
    * composition (one corpus scan through strip → gates → near-dup →
    * caps → packing); this is its wire-format twin for everything a
    * stream CAN decide per document — strip against the offline hot
    * set (X52), the admission gates (X35) and the in-row classifier
    * (X67), then incremental near-dup against the prebuilt band/
    * shingle index (X53, the dedupFeed machinery inlined so the dup
    * verdict lands on the SAME row as the gate verdicts), a static
    * (doc → source) dimension join, and the per-(window, source)
    * admission summary with a live per-window source cap (X38's
    * batch cap is corpus-total and ordered; the streaming form a
    * throttler actually enforces is per-window — the flag says
    * "this source exceeded its budget THIS window"). Packing/split
    * stay batch-only by nature (they need global prefix sums).
    *
    * Fates are disjoint, quarantine-first (the X53 story: the
    * per-batch near-dup quarantine runs AT ingest, before curation
    * compute is spent): dup (matches the index at ≥ 0.6 Jaccard) →
    * gate_fail → clf_reject (gate-passers the classifier rejects) →
    * admitted. `n_stripped` rides independently (docs that lost
    * ≥ 1 window).
    *
    * Execution: every stage is stateless in-row work or a
    * stream-static join (hot set and merges as plan literals, band/
    * set/meta as static frames — broadcast or AQE's choice); the
    * only STATE is the two chained windowed aggregates (per-doc
    * flag collapse across the band explode, then the per-source
    * dictionary rollup). GatewaySpec pins stream ≡ batch ≡ a
    * recount off the same building-block functions plus an exact
    * Jaccard recount of every dup flag.
    */
  def ingestFeed(
      lines: DataFrame,
      hotChunks: Seq[String],
      indexBands: DataFrame,
      indexSets: DataFrame,
      meta: DataFrame,
      capPerWindow: Long = 1000L,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    import graft.functions.MinHashSketch.{mixA, mixB, mod => mhMod}
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
      .join(meta, Seq("doc_id"), "left")
      .withColumn("source", coalesce(col("source"), lit("unknown")))
    val gated = graft.operators.Curation.withClfColumns(
      graft.operators.Curation.withGateVerdicts(
        graft.operators.Dedup.stripWithHot(parsed, hotChunks)))
      .withColumn("gate", (col("is_kept") === 1).cast("long"))
      .withColumn("clf", when(col("clf_keep"), 1L).otherwise(0L))
      .withColumn("strp", when(col("bp_dropped") > 0, 1L).otherwise(0L))
    // the dedupFeed signature machinery inlined, TOTAL-guarded for
    // short docs (the winnow lesson: generator-adjacent lambdas must
    // be total or InferFiltersFromGenerate evaluates them on the rows
    // the guard exists to drop)
    val shingled = gated
      .withColumn("w", split(col("text"), " "))
      .withColumn("shingles", expr(
        "CASE WHEN size(w) >= 3 THEN array_distinct(transform(sequence(1, size(w) - 2), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2)))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END"))
      .withColumn("n_a", size(col("shingles")))
    def sigSlot(i: Int) =
      array_min(transform(col("shingles"), sh =>
        ((conv(substring(md5(sh), 1, 8), 16, 10).cast("long") % 2147483648L)
          * mixA(i) + mixB(i)) % mhMod))
    shingled
      .select(col("ts"), col("doc_id"), col("source"), col("strp"), col("gate"),
        col("clf"), col("shingles"), col("n_a"),
        explode(array((0 until graft.operators.Dedup.nBands).map(b =>
          struct(
            lit(b).as("band"),
            sigSlot(2 * b).as("k1"),
            sigSlot(2 * b + 1).as("k2"))): _*)).as("bk"))
      .select(col("ts"), col("doc_id"), col("source"), col("strp"), col("gate"),
        col("clf"), col("shingles"), col("n_a"),
        col("bk.band").as("band"), col("bk.k1").as("k1"), col("bk.k2").as("k2"))
      .join(indexBands, Seq("band", "k1", "k2"), "left")
      .join(indexSets, Seq("idx_id"), "left")
      .withColumn("hit", when(
        size(array_intersect(col("shingles"), col("idx_shingles"))) * 10 >=
          (col("n_a") + col("n_b")
            - size(array_intersect(col("shingles"), col("idx_shingles")))) * 6, 1L)
        .otherwise(0L))
      .groupBy(window(col("ts"), windowDuration), col("source"), col("doc_id"))
      .agg(
        max(col("strp")).as("strp"), max(col("gate")).as("gate"),
        max(col("clf")).as("clf"), max(col("hit")).as("dup"))
      .groupBy(window(window_time(col("window")), windowDuration), col("source"))
      .agg(
        count(lit(1)).as("n_seen"),
        sum(col("strp")).as("n_stripped"),
        sum(col("dup")).as("n_dup"),
        sum((lit(1L) - col("dup")) * (lit(1L) - col("gate"))).as("n_gate_fail"),
        sum((lit(1L) - col("dup")) * col("gate") * (lit(1L) - col("clf"))).as("n_clf_reject"),
        sum((lit(1L) - col("dup")) * col("gate") * col("clf")).as("n_admitted"))
      .select(
        col("window.start").as("window_start"),
        col("source"),
        col("n_seen").cast("long").as("n_seen"),
        col("n_stripped").cast("long").as("n_stripped"),
        col("n_gate_fail").cast("long").as("n_gate_fail"),
        col("n_clf_reject").cast("long").as("n_clf_reject"),
        col("n_dup").cast("long").as("n_dup"),
        col("n_admitted").cast("long").as("n_admitted"),
        (expr("CAST((20000 * n_admitted + n_seen) DIV (2 * n_seen) AS BIGINT)")
          / lit(10000.0)).as("admit_rate"),
        when(col("n_admitted") > capPerWindow, 1L).otherwise(0L).as("cap_fired"))
  }

  def admitFeed(
      lines: DataFrame,
      hotChunks: Seq[String],
      dict: DataFrame,
      windowDuration: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val stripped = graft.operators.Dedup.stripWithHot(parsed, hotChunks)
    val admitted = graft.operators.Curation.withClfColumns(
      graft.operators.Curation.withGateVerdicts(stripped)
        .filter(col("is_kept") === 1))
      // carry columns must be plain references: bigramPairsOf projects
      // them on both sides of its explode
      .withColumn("clf_k", when(col("clf_keep"), lit(1L)).otherwise(lit(0L)))
    graft.operators.Curation
      .bigramPairsOf(admitted, col("ts"), col("bp_dropped"),
        col("clf_logit6"), col("clf_k"))
      .join(dict, Seq("bg"))
      .groupBy(window(col("ts"), windowDuration), col("doc_id"))
      .agg(
        max(col("bp_dropped")).as("bp_dropped"),
        count(lit(1)).cast("long").as("n_bigrams"),
        graft.operators.Curation.dsirLogratio,
        // X67 rides the same aggregate: the in-row classifier columns
        // are constant per doc, so max() just forwards them
        max(col("clf_logit6")).as("clf_logit6"),
        (max(col("clf_k")) === 1L).as("clf_keep"))
      .select(
        col("window.start").as("window_start"),
        col("doc_id"), col("bp_dropped"), col("n_bigrams"), col("logratio"),
        col("clf_logit6"), col("clf_keep"))
  }

  /** Streaming X53 — incremental near-dedup of an incoming document
    * feed against a PREBUILT static index
    * ([[graft.operators.Dedup.incrementalIndex]]), the ingest-time
    * quarantine the batch `q_dedup_incr` runs nightly. Everything on
    * the stream side is computed IN-ROW — shingle set, the 8 MinHash
    * slots (an `array_min` over the row's own shingles equals the
    * [[graft.functions.MinHashSketch]] aggregate over the same set),
    * band keys — so the stream needs NO streaming aggregate at all:
    * two stateless stream-static equi-joins (band match, then the
    * matched index doc's shingle set for the exact-Jaccard verify)
    * and one watermark-bounded `dropDuplicatesWithinWatermark` to
    * flag each incoming doc once. Emits `(ts, doc_id)` quarantine
    * rows in append mode with no window to flush.
    *
    * Scale note: the verify carries the incoming doc's shingle array
    * through its ≤ [[graft.operators.Dedup.nBands]] band rows — the
    * micro-batch-side mirror of the batch form's broadcast-candidates
    * verify; the alternative (re-join candidates to the incoming
    * batch) trades that for a third join. The static band table is
    * bucketed by band key in production, so the band join is
    * co-located and the historic corpus text is never touched.
    */
  def dedupFeed(
      lines: DataFrame,
      indexBands: DataFrame,
      indexSets: DataFrame,
      watermarkDelay: String = "30 seconds"): DataFrame = {
    import graft.functions.MinHashSketch.{mixA, mixB, mod => mhMod}
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
      .withWatermark("ts", watermarkDelay)
    val shingled = parsed
      .select(col("ts"), col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("ts"), col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(col("w")) - 2), i =>
          concat(
            element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1), lit(" "),
            element_at(col("w"), i + 2)))).as("shingles"))
    def sigSlot(i: Int) =
      array_min(transform(col("shingles"), sh =>
        ((conv(substring(md5(sh), 1, 8), 16, 10).cast("long") % 2147483648L)
          * mixA(i) + mixB(i)) % mhMod))
    shingled
      .select(col("ts"), col("doc_id"), col("shingles"), size(col("shingles")).as("n_a"),
        explode(array((0 until graft.operators.Dedup.nBands).map(b =>
          struct(
            lit(b).as("band"),
            sigSlot(2 * b).as("k1"),
            sigSlot(2 * b + 1).as("k2"))): _*)).as("bk"))
      .select(col("ts"), col("doc_id"), col("shingles"), col("n_a"),
        col("bk.band").as("band"), col("bk.k1").as("k1"), col("bk.k2").as("k2"))
      .join(indexBands, Seq("band", "k1", "k2"))
      .join(indexSets, Seq("idx_id"))
      .withColumn("shared", size(array_intersect(col("shingles"), col("idx_shingles"))))
      .filter(col("shared") * 10 >= (col("n_a") + col("n_b") - col("shared")) * 6)
      .select(col("ts"), col("doc_id"))
      .dropDuplicatesWithinWatermark("doc_id")
  }

  /** Streaming X125 — the release manifest maintained CONTINUOUSLY:
    * the same canonical-row 60-bit hash the batch manifest XORs, kept
    * as a running (count, checksum) aggregate over the ingest stream
    * — after any prefix of the feed, the emitted row IS the manifest
    * of everything ingested so far, and when the stream has delivered
    * a table's worth of rows it must equal the batch `q_manifest` row
    * bit-for-bit (GatewaySpec pins it). XOR's self-inverse algebra is
    * what makes this a streaming-native integrity check: the state is
    * 16 bytes regardless of volume, and any dropped or duplicated row
    * flips the checksum off the batch value — the at-least-once
    * DETECTOR, where the dedup feeds are the at-least-once absorbers.
    *
    * Input: document rows ("doc_id|lang|source|text" tab-free lines,
    * '|'-joined exactly like the batch canon). One global streaming
    * aggregate in Complete mode — a single 2-column row per trigger.
    */
  def manifestFeed(lines: DataFrame): DataFrame =
    lines
      .select(
        conv(substring(md5(col("value")), 1, 15), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))

  /** Streaming X111 — media frame-dedup admission on the ingest path:
    * each incoming container line ("ts hexbytes") is TLV-decoded with
    * the SAME [[graft.operators.Multimodal.MediaCodec]] parser the
    * batch path uses, fingerprinted per sampled frame, and its
    * in-row print SET is swept against the STATIC per-video print
    * index ([[graft.operators.Multimodal.framePrintSets]] — the
    * bounded offline artifact, broadcast like X100's eval suite); any
    * indexed video sharing ≥ `minShared` prints emits a quarantine
    * row `(ts, doc_id, idx_doc, shared)` — re-uploaded/re-encoded
    * video is flagged AT INGEST, before it reaches a training
    * snapshot.
    *
    * Stateless by construction: a container's full print set arrives
    * in ONE row, so the pair verdict is a per-row array intersect
    * against the broadcast index (no streaming aggregate, no
    * explode-then-count state) — the engine runs the same keyless
    * broadcast nested-loop per micro-batch as the batch pair join's
    * semantics at Θ(batch·ǀindexǀ). One watermark-bounded
    * `dropDuplicatesWithinWatermark` on the (doc, idx) pair absorbs
    * at-least-once replay (the [[dedupFeed]] shape). GatewaySpec
    * pins the streamed quarantine set ≡ the batch `q_media_dedup`
    * is_dup pairs exactly.
    */
  def mediaFeed(
      lines: DataFrame,
      printSets: DataFrame,
      minShared: Int = graft.operators.Multimodal.mediaDupMinShared,
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    // capture the fingerprint width at construction (session conf is
    // driver-side); the closure below runs on executors
    val printSpace = graft.operators.Multimodal.mediaPrintSpace(spark)
    val parsed = lines
      .select(split(col("value"), " ", 2).as("p"))
      .filter(size(col("p")) === 2 && col("p").getItem(0).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        unhex(col("p").getItem(1)).as("container"))
      .as[(java.sql.Timestamp, Array[Byte])]
      .map { case (ts, bytes) =>
        val (docId, prints) = graft.operators.Multimodal.printsOf(bytes, printSpace)
        (ts, docId, prints)
      }
      .toDF("ts", "doc_id", "prints")
      .withWatermark("ts", watermarkDelay)
    parsed
      .join(broadcast(printSets),
        col("doc_id") =!= col("idx_doc") &&
          size(array_intersect(col("prints"), col("idx_prints"))) >= minShared)
      .select(col("ts"), col("doc_id"), col("idx_doc"),
        size(array_intersect(col("prints"), col("idx_prints"))).cast("long").as("shared"))
      .dropDuplicatesWithinWatermark("doc_id", "idx_doc")
  }

  /** Streaming X100 — semantic-decontam admission on the ingest path:
    * each incoming embedding row ("ts vec_id v1,v2,…") is scored
    * against the STATIC eval-suite embeddings (the bounded offline
    * artifact — [[graft.operators.Curation.evalVecs]], the same
    * hot-set/dictionary pattern as [[admitFeed]]) and every pair
    * clearing the cosine threshold emits a quarantine row
    * `(ts, vec_id, eval_id, score)` — contaminated vectors are
    * flagged AT INGEST, before they ever reach a training snapshot,
    * instead of by the nightly batch sweep.
    *
    * The scoring join is stream-static with a THRESHOLD condition
    * (no equi-key exists for cosine — the X100 argument), which the
    * engine executes per micro-batch as the same broadcast
    * nested-loop the batch plan uses: stateless, Θ(batch·E) with E
    * human-fixed. No streaming aggregate; one watermark-bounded
    * `dropDuplicatesWithinWatermark` on the (vec, eval) pair absorbs
    * at-least-once replay (the [[dedupFeed]] shape). The round-4
    * compare-on-rounded threshold is identical to the batch chain,
    * so GatewaySpec pins streamed pairs ≡ batch
    * [[graft.operators.Curation.semanticHits]] row-for-row.
    */
  def decontamFeed(
      lines: DataFrame,
      evalVecs: DataFrame,
      threshold: Double = graft.operators.Curation.semThreshold,
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("vec_id"),
        transform(split(col("p").getItem(2), ","), x => x.cast("double")).as("tv"))
      // malformed vector guard: any non-numeric component poisons the
      // whole row (the P2 discard discipline, element-wise)
      .filter(!exists(col("tv"), _.isNull))
      .withWatermark("ts", watermarkDelay)
    parsed
      .join(broadcast(evalVecs),
        round(graft.operators.VectorOps.cosine(col("tv"), col("ev")), 4)
          >= threshold)
      .select(col("ts"), col("vec_id"), col("eval_id"),
        round(graft.operators.VectorOps.cosine(col("tv"), col("ev")), 4).as("score"))
      .dropDuplicatesWithinWatermark("vec_id", "eval_id")
  }

  /** Streaming X72+X73 — incremental snapshot delta on the ingest
    * path: classify each incoming document against the STATIC
    * previous-version manifest (doc_id → content hash — the bounded
    * offline artifact a recrawl ships, the [[admitFeed]] hot-set /
    * dictionary pattern), drop 'unchanged' (the whole economics of
    * recrawl processing), and run the X73 rule cascade on what
    * remains — so only genuinely NEW text that also passes the
    * published quality rules proceeds downstream.
    *
    * 'removed' is structurally invisible here: a stream carries rows,
    * not absences, so deletions remain the batch `q_snapshot_diff`'s
    * job (documented asymmetry, not a gap).
    *
    * Everything is STATELESS: one narrow hash projection, one
    * stream-static left equi-join on doc_id (the manifest is
    * broadcast at this size and bucketed on doc_id at 100 TB), and
    * the X73 narrow rule columns
    * ([[graft.operators.Curation.withRuleFlags]] — the same
    * projection as the declared batch query, which is what GatewaySpec
    * pins stream ≡ batch on). Append mode with no window to flush,
    * no streaming aggregate, no state store.
    */
  def deltaFeed(lines: DataFrame, manifest: DataFrame): DataFrame = {
    val parsed = lines
      .select(split(col("value"), " ", 3).as("p"))
      .filter(size(col("p")) === 3 && col("p").getItem(0).cast("long").isNotNull &&
        col("p").getItem(1).cast("long").isNotNull)
      .select(
        timestamp_seconds(col("p").getItem(0).cast("long")).as("ts"),
        col("p").getItem(1).cast("long").as("doc_id"),
        col("p").getItem(2).as("text"))
    graft.operators.Curation.withRuleFlags(
      parsed
        .withColumn("nh", md5(col("text")))
        .join(manifest, Seq("doc_id"), "left_outer")
        .withColumn("status",
          when(col("old_hash").isNull, "added")
            .when(col("old_hash") =!= col("nh"), "changed")
            .otherwise("unchanged"))
        .filter(col("status") =!= "unchanged"))
      .select(col("ts"), col("doc_id"), col("status"), col("n_failed"), col("keep"))
  }

  /** B3 — bulk-upload delta encoding: one reference time per
    * micro-batch (`sentat`), every row's time expressed as an offset
    * against it (※ OemGatewayEmoncmsBuffer._send_data payload
    * `data=[[t−T,node,v…]]&sentat=T`). Pure plan — the one-row agg is
    * broadcast, no driver-side collect.
    */
  def bulkEncode(batch: DataFrame): DataFrame = {
    val ref = batch.agg(min(col("window_start")).as("sentat"))
    batch
      .crossJoin(broadcast(ref))
      .withColumn("offset_s",
        (unix_micros(col("window_start")) - unix_micros(col("sentat"))) / lit(1000000L))
  }

  /** S5 — the emoncms bulk-upload request body, shaped like the
    * reference's: `data=[[Δt,node,v…],…]&sentat=T` with one reference
    * time per micro-batch and rows ordered by (offset, node, channel)
    * (※ OemGatewayEmoncmsBuffer._send_data). GatewaySpec pins the
    * exact bytes.
    *
    * Two deliberate departures from the reference, recorded here:
    *  - **Row shape**: our rows are `[Δt, node, channel, avg_v]` —
    *    windowed per-channel aggregates with an explicit channel index
    *    — where the reference forwards raw frames as `[Δt, node, v1,
    *    v2, …]`. A stock emoncms server would read our channel number
    *    as the first input value; a deployment targeting stock emoncms
    *    should pivot channels back into positional values (one
    *    `groupBy(offset, node).pivot(channel)` away). We keep the
    *    channel-indexed form because the aggregate (not the raw frame)
    *    is this engine's unit of delivery, and it is unambiguous under
    *    per-channel windowing.
    *  - **Bounded POSTs**: the reference caps its send buffer (~1000
    *    records per request); an unbounded micro-batch here would build
    *    one unbounded string on the driver. `maxRows` slices the sorted
    *    row list into that many rows per payload — several payload rows
    *    (= several POSTs) per micro-batch when the batch is large, each
    *    sharing the batch's `sentat`.
    */
  def emoncmsPayload(batch: DataFrame, maxRows: Int = 1000): DataFrame =
    bulkEncode(batch)
      .select(
        struct(
          col("offset_s").cast("double").as("t"),
          col("node").cast("double").as("node"),
          col("channel").cast("double").as("channel"),
          col("avg_v").as("v")).as("r"),
        unix_seconds(col("sentat")).as("sentat"))
      .groupBy(col("sentat"))
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(
        col("sentat"),
        explode(expr(
          s"transform(sequence(0, int((size(rs) - 1) / $maxRows)), i -> slice(rs, i * $maxRows + 1, $maxRows))"))
          .as("chunk"))
      .select(concat(
        lit("data="),
        to_json(expr("transform(chunk, x -> array(x.t, x.node, x.channel, x.v))")),
        lit("&sentat="), col("sentat")).as("payload"))

  /** B2 — the reference's capped in-memory FIFO, as real streaming
    * state (※ oemgatewaybuffer.py: oldest entries dropped when the
    * buffer is full). `flatMapGroupsWithState` keyed by node holds the
    * newest `cap` readings and counts lifetime evictions; the batch
    * analog (Etl.bufferCap) verifies the same keep-newest-K semantics
    * relationally. State size is bounded by cap × nodes — the same
    * bound the reference enforces, which is what makes this safe on an
    * unbounded stream.
    */
  def bufferCapStream(readings: Dataset[Reading], cap: Int): Dataset[BufStatus] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.node)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (node: Long, it: Iterator[Reading], state: GroupState[BufState]) =>
          val prev = state.getOption.getOrElse(BufState(Array.empty, Array.empty, 0L))
          val incoming = it.toArray.sortBy(r => (r.tsUs, r.value))
          val allTs = prev.tsUs ++ incoming.map(_.tsUs)
          val allVs = prev.values ++ incoming.map(_.value)
          val evictNow = math.max(0, allTs.length - cap)
          val next = BufState( // FIFO: oldest out first
            allTs.drop(evictNow), allVs.drop(evictNow), prev.evicted + evictNow)
          state.update(next)
          Iterator.single(BufStatus(node, next.tsUs.length, next.evicted))
      }
  }

  /** Streaming R27, gap semantics — `debounceFeed`: the EXACT twin of
    * the batch `q_debounce` rule (keep an event iff it is its type's
    * first or arrived more than τ after the type's PREVIOUS event),
    * as per-type streaming state. [[dedupExactFeed]] covers the
    * key-identity variant on the engine's built-in primitive; the
    * gap rule needs the previous event's TIMESTAMP, which is
    * `flatMapGroupsWithState` territory: state = the last-seen µs
    * per type (one long — bounded by ǀtypesǀ, not traffic), each
    * micro-batch's events for a type sorted by (us, event_id) before
    * the fold so batch boundaries cannot reorder the comparison.
    * Exactly-once parity holds when events arrive in event-time
    * order (the gateway's spool/socket contract); GatewaySpec pins
    * the streamed keep set ≡ the batch `q_debounce` rows over the
    * same events, split across micro-batches.
    */
  /** Streaming R28 — the conversion funnel as a LIVE stage-transition
    * stream: per user, the view→click→purchase chain under the batch
    * q_funnel's exact window-and-order constraints, emitted as a
    * `FunnelStage` row the moment each stage is reached — the event
    * stream a product-analytics dashboard actually consumes (batch
    * q_funnel is the nightly table; this is its real-time form).
    *
    * State per user is THREE timestamps (the same bound the batch
    * scaladoc promises a streaming funnel would hold) updated by the
    * identical fold: earliest view anchors; a click counts only
    * strictly after the view and within the window; purchase likewise
    * relative to the click. Events are processed in event-time order
    * within each micro-batch (sorted; the tie rule is us then stage
    * rank, so a same-instant click never precedes its view), and the
    * per-user in-order delivery ACROSS batches is the gateway's
    * receipt-time contract ([[debounceFeed]]'s). A replayed event
    * finds its stage already set and emits nothing — at-least-once
    * replay is absorbed by the state itself, no dedup operator.
    * Depth-0 users never emit (nothing happened); the batch twin
    * carries them as −1 rows.
    *
    * State TTL (the 100 TB answer — user_id is unbounded, so
    * `NoTimeout` is a slow leak): `EventTimeTimeout` expires a user
    * once the watermark passes their last admissible stage instant —
    * anchor (= latest stage timestamp) + `windowUs` — because any
    * event that could still advance the funnel must carry
    * `us ≤ anchor + windowUs < watermark`, and input older than the
    * watermark is dropped at the operator (the watermarked column
    * feeds the stateful op), so the dropped state is unreachable:
    * a post-expiry replay — even of a view that a fresh state would
    * admit — is late by construction and filtered before the state
    * function (GatewaySpec pins exactly this). One deliberate
    * semantic consequence: a user who re-views after expiry with a
    * FRESH timestamp starts a NEW funnel (stage 1 emits again) — the
    * production semantics for a conversion window, and exactly where
    * the TTL'd stream diverges from the batch twin's single-earliest-
    * anchor over unbounded history. Stream ≡ batch parity therefore
    * holds on horizon-bounded feeds (span < `windowUs`), which is
    * what GatewaySpec pins, plus the expiry + re-admission pin.
    *
    * `watermarkDelay` (r16 ADVICE — the 0 s default was a silent-drop
    * trap): any event whose timestamp trails a prior micro-batch's
    * max event time by more than the delay is dropped BEFORE the
    * state function, so the delay must cover the source's real
    * cross-batch reordering. The default is 10 minutes — generous
    * for the gateway's near-in-order receipt contract; set it
    * explicitly for tighter state horizons, and watch
    * [[droppedLateRows]] (sums `numRowsDroppedByWatermark` from the
    * query's progress) to make the drop path observable rather than
    * silent.
    */
  def funnelFeed(
      events: Dataset[UserEvent],
      windowUs: Long = graft.operators.Relational.funnelWindowUs,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelStage] = {
    val s = events.sparkSession
    import s.implicits._
    val rank = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    events
      .filter(e => rank.contains(e.eventType)) // junk types never create state
      .toDF()
      .withColumn("evTs", timestamp_micros(col("us")))
      .withWatermark("evTs", watermarkDelay)
      .as[StampedUserEvent] // the watermarked column must reach the stateful op
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[StampedUserEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // Watermark passed anchor + window: nothing on-time can
            // advance this funnel any more — free the state.
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val out = Seq.newBuilder[FunnelStage]
            it.toArray
              .filter(e => rank.contains(e.eventType))
              .sortBy(e => (e.us, rank(e.eventType)))
              .foreach { e =>
                e.eventType match {
                  case "view" if st.t1 < 0 =>
                    st = st.copy(t1 = e.us); out += FunnelStage(user, 1L, e.us)
                  case "click" if st.t1 >= 0 && st.t2 < 0 &&
                      e.us > st.t1 && e.us <= st.t1 + windowUs =>
                    st = st.copy(t2 = e.us); out += FunnelStage(user, 2L, e.us)
                  case "purchase" if st.t2 >= 0 && st.t3 < 0 &&
                      e.us > st.t2 && e.us <= st.t2 + windowUs =>
                    st = st.copy(t3 = e.us); out += FunnelStage(user, 3L, e.us)
                  case _ => ()
                }
              }
            if (st.t1 < 0) {
              // nothing admitted ever (shouldn't happen post-filter):
              // hold no state for this user
              if (state.exists) state.remove()
            } else {
              state.update(st)
              // anchor = the latest stage reached; complete funnels keep
              // absorbing replays until the same horizon passes
              val anchor = if (st.t3 >= 0) st.t3 else if (st.t2 >= 0) st.t2 else st.t1
              val expiryMs = anchor / 1000L + windowUs / 1000L + 1L
              // setTimeoutTimestamp must be strictly above the watermark
              state.setTimeoutTimestamp(math.max(expiryMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  def debounceFeed(events: Dataset[TypedEvent], tolUs: Long): Dataset[DebouncedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[TypedEvent], state: GroupState[Long]) =>
          val sorted = it.toArray.sortBy(e => (e.us, e.eventId))
          var lastUs = state.getOption.getOrElse(Long.MinValue)
          val kept = sorted.flatMap { e =>
            val gap = if (lastUs == Long.MinValue) -1L else e.us - lastUs
            val keep = gap == -1L || gap > tolUs
            lastUs = e.us // gap-from-previous-EVENT: every event advances the anchor
            if (keep) Some(DebouncedEvent(e.eventId, tpe, e.us, gap)) else None
          }
          state.update(lastUs)
          kept.iterator
      }
  }

  /** Streaming X89 — `upsertFeed`: the batch CDC merge (`q_upsert`)
    * as a continuously-maintained view — the Delta streaming-MERGE
    * shape: a change feed arrives as a stream, per-key state holds
    * the highest-sequence operation seen so far, and every
    * micro-batch emits each touched key's CURRENT merged verdict
    * (latest payload + origin for live keys, a tombstone for deleted
    * ones — downstream view consumers need the tombstone, so `live`
    * is a column, not a filter).
    *
    * Latest-wins is by SEQUENCE, not arrival: an op whose seq is
    * below the state's only increments the op count, so the verdict
    * is invariant under cross-batch reordering — GatewaySpec delivers
    * the ops SCRAMBLED across micro-batches and pins each key's final
    * verdict ≡ the batch `q_upsert` row. Untouched base rows are not
    * the stream's business (the batch full-outer's kept side); a
    * consumer materializes base ∪ live verdicts.
    *
    * Scale shape: state is ONE (seq, op, payload, count) per DISTINCT
    * touched key — bounded by the live change-key set, not traffic,
    * and orders of magnitude under the table size (the same argument
    * as the batch side's feed-pays-the-shuffle). `inBase` rides in on
    * each op from an upstream stream-static id join against the base
    * snapshot (the admitFeed dictionary pattern); the state function
    * itself never touches the base table.
    *
    * State TTL (the 100 TB answer — the touched-key set still grows
    * without bound over the feed's lifetime): `EventTimeTimeout`
    * expires a key once the watermark passes its last commit time +
    * `retainUs`. After expiry the key's verdict lives only in the
    * downstream materialized view; a fresh on-time op re-creates
    * state from scratch (nOps restarts — the op COUNT is a
    * retention-window statistic, not all-history). Ops older than
    * the watermark are dropped at the operator (the watermarked
    * commit-time column feeds the stateful op), so `watermarkDelay`
    * must cover the source's maximum commit-time reordering — size
    * it like any watermark; out-of-order delivery inside the delay
    * is still resolved by SEQUENCE, not arrival (GatewaySpec
    * delivers the ops scrambled and pins batch parity, plus expiry +
    * re-admission). The default is 10 minutes, not 0 s (r16 ADVICE:
    * a 0 s default silently drops any CDC op whose commit time
    * trails a prior micro-batch — a dropped DELETE leaves a stale
    * live = 1 verdict with no error); a dropped-late op is counted
    * in the query's progress — monitor it via [[droppedLateRows]]
    * (GatewaySpec plants a late op at an explicit 0 s delay and pins
    * both the stale verdict AND a nonzero counter, then the same
    * delivery under the default admitting it).
    */
  def upsertFeed(
      ops: Dataset[CdcOp],
      retainUs: Long = 7L * 86400000000L,
      watermarkDelay: String = "10 minutes"): Dataset[UpsertVerdict] = {
    val s = ops.sparkSession
    import s.implicits._
    ops
      .toDF()
      .withColumn("evTs", timestamp_micros(col("us")))
      .withWatermark("evTs", watermarkDelay)
      .as[StampedCdcOp] // the watermarked column must reach the stateful op
      .groupByKey(_.docId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (id: Long, it: Iterator[StampedCdcOp], state: GroupState[UpsertState]) =>
          if (state.hasTimedOut) {
            // Key idle past the retention horizon: the downstream view
            // holds its verdict; drop the merge state.
            state.remove()
            Iterator.empty
          } else {
            val incoming = it.toArray.sortBy(_.seq)
            var st = state.getOption.getOrElse(UpsertState(Long.MinValue, null, null, 0L))
            var inBase = false
            var lastUs = Long.MinValue
            incoming.foreach { o =>
              inBase = o.inBase
              lastUs = math.max(lastUs, o.us)
              st =
                if (o.seq > st.seq) UpsertState(o.seq, o.op, o.p, st.nOps + 1)
                else st.copy(nOps = st.nOps + 1)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(lastUs / 1000L + retainUs / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
            val live = st.op != "D"
            Iterator.single(UpsertVerdict(
              id,
              if (live) st.p else null,
              if (inBase) "updated" else "inserted",
              st.nOps,
              if (live) 1L else 0L))
          }
      }
  }

  /** Rows dropped as too-late input (older than the watermark) summed
    * across every stateful operator in the query's RETAINED progress
    * reports (Spark keeps the last ~100 micro-batches; this is a
    * recent-window counter, not all-history — a monitor samples it
    * per trigger). This is the observability half of the r16 ADVICE
    * on [[funnelFeed]]/[[upsertFeed]]'s watermark sizing: a
    * mis-sized `watermarkDelay` shows up HERE as a nonzero count
    * instead of as silently-missing verdicts. Zero-cost — reads the
    * `numRowsDroppedByWatermark` metric Spark already maintains.
    */
  def droppedLateRows(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(p => Option(p.stateOperators).iterator.flatten)
      .map(_.numRowsDroppedByWatermark)
      .sum

  /** B4 variant — session windows (gap-based batching): the reference
    * only has fixed periods; `session_window` closes a batch after
    * `gap` of silence per node, a strictly richer trigger the engine
    * gets built-in.
    */
  def aggregateSessions(readings: DataFrame, gap: String, watermarkDelay: String): DataFrame =
    readings
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("node"))
      .agg(count(lit(1)).as("n_frames"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("node"), col("n_frames"))

  /** Shared driver-side HTTP client for the bulk sink (foreachBatch
    * runs on the driver; one client serves every buffer query).
    */
  private lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  /** S5 — one emoncms bulk POST, with the reference's acceptance rule:
    * the server must answer `ok`, anything else (or a transport
    * failure, or a server that stalls past the 60 s response timeout —
    * the reference's own timeout) means the upload did not happen
    * (※ OemGatewayEmoncmsBuffer._send_data: reply != 'ok' → keep the
    * buffer, resend next period). Here "keep the buffer" = throw, so
    * the micro-batch fails and the checkpoint does not advance — the
    * restart replays the same batch. GatewaySpec's failed-POST test
    * exercises exactly this: a non-`ok` reply fails the batch, the
    * restart re-delivers the identical payload once.
    *
    * The body is proper `application/x-www-form-urlencoded`: each
    * value is percent-encoded at send time (the pinned payload string
    * stays the readable raw form; encoding is a transport concern).
    */
  private[streaming] def postBulk(url: String, payload: String): Unit = {
    val encoded = payload.split("&").map { kv =>
      val i = kv.indexOf('=')
      kv.take(i + 1) + java.net.URLEncoder.encode(kv.drop(i + 1), "UTF-8")
    }.mkString("&")
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .timeout(java.time.Duration.ofSeconds(60))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(encoded))
      .build()
    val resp = httpClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    val body = resp.body().trim
    if (resp.statusCode() != 200 || body != "ok")
      throw new java.io.IOException(
        s"emoncms rejected bulk upload (HTTP ${resp.statusCode()}, reply '$body') — batch kept for resend")
  }

  /** B1+B4+B5+S5 — start one sink query per active buffer off the
    * shared aggregated stream. Each query has its own checkpoint and
    * its own trigger period. Delivery:
    *  - `postUrl` set (production): POST the B3-encoded bulk payload;
    *    a non-`ok` reply or transport failure fails the batch, so the
    *    checkpoint is not advanced and the replay IS the reference's
    *    "keep buffer, resend next period" retry loop.
    *  - otherwise (sandbox): write the encoded rows to
    *    `outDir/batch=<id>` with overwrite, so a replayed batch id is
    *    idempotent (at-least-once delivery + idempotent sink).
    *
    * `register` is called with each query the moment it starts, BEFORE
    * the next buffer's start is attempted: a caller that must clean up
    * after a partial start (buffer 3 of 3 throws — [[HotReload]]'s
    * revert path) sees exactly the queries that exist, which the
    * returned Seq cannot provide (a mid-map throw discards it).
    */
  def start(
      aggregated: DataFrame,
      conf: GatewayConf,
      register: StreamingQuery => Unit = _ => ()): Seq[StreamingQuery] =
    conf.buffers.filter(_.active).map { b =>
      val q = aggregated.writeStream
        .queryName(s"gateway-${b.name}")
        .outputMode("update")
        .option("checkpointLocation", s"${conf.checkpointRoot}/${b.name}")
        .trigger(Trigger.ProcessingTime(s"${b.periodSeconds} seconds"))
        .foreachBatch { (df: DataFrame, id: Long) =>
          if (!df.isEmpty) b.postUrl match {
            case Some(url) if b.executorPost =>
              // executor-side sends (see BufferConf.executorPost): each
              // task POSTs the chunks it holds; any failure fails the
              // task → the batch → the checkpoint holds. postBulk is an
              // object method, so each executor JVM lazily builds its
              // own HttpClient — nothing driver-side is serialized.
              emoncmsPayload(df).foreachPartition {
                (it: Iterator[org.apache.spark.sql.Row]) =>
                  it.foreach(r => postBulk(url, r.getString(0)))
              }
            case Some(url) =>
              // one payload row per 1000-record chunk (usually one per
              // micro-batch); collecting them is the sink edge, same as
              // the reference's bounded POST-per-period — and the
              // sequential single-client loop is the ORDERED delivery
              // option executorPost gives up.
              emoncmsPayload(df).collect().foreach(r => postBulk(url, r.getString(0)))
            case None =>
              bulkEncode(df)
                .withColumn("batch_id", lit(id))
                .write.mode("overwrite")
                .parquet(s"${b.outDir}/batch=$id")
          }
        }
        .start()
      register(q)
      q
    }

  /** Full pipeline from config (production path: socket listeners).
    * `dedup_frames = yes` in the conf's `[settings]` inserts
    * [[dedupFrames]] between decode and aggregate — the knob for
    * at-least-once upstream bridges.
    */
  def run(
      spark: SparkSession,
      conf: GatewayConf,
      register: StreamingQuery => Unit = _ => ()): Seq[StreamingQuery] = {
    require(conf.listeners.nonEmpty, "gateway config declares no listeners")
    val decoded = conf.listeners
      .map(l => decode(source(spark, l), l))
      .reduce(_ unionByName _)
    val deduped =
      if (conf.dedupFrames) dedupFrames(decoded, conf.watermarkDelay) else decoded
    start(aggregate(deduped, conf), conf, register)
  }

  /** Handle over a supervised gateway: the restart loop plus the
    * currently-live queries ([[supervise]]).
    */
  final class Supervisor private[streaming] (
      getQueries: () => Seq[StreamingQuery],
      shutdown: () => Unit) {
    def queries: Seq[StreamingQuery] = getQueries()
    def restartCount: Int = restarts
    @volatile private[streaming] var restarts = 0
    def stop(): Unit = shutdown()
  }

  /** Run-forever semantics — the reference daemon's actual contract
    * (its main loop never exits; a dropped serial/socket peer is
    * retried forever). Two distinct failure modes need covering:
    *
    *  - a query that TERMINATES (failed sink batch, source that
    *    refuses at start while the bridge is down): detected via
    *    `isActive`;
    *  - a peer that dies SILENTLY: Spark's socket source treats EOF
    *    as idle, not failure — the query stays active forever reading
    *    nothing, which is how a bare [[run]] outlives its bridge in
    *    the worst way. `idleTimeoutMs > 0` restarts when no query has
    *    processed a row for that long. Silence and death are
    *    indistinguishable from this side of the wire (the reference
    *    has the same blind spot), so set it well above the expected
    *    reporting period; a false-positive restart is harmless —
    *    which is the point of the design:
    *
    * every restart stops the remainder, waits `backoffMs`, and
    * relaunches the WHOLE pipeline against the SAME checkpoints —
    * windowed state resumes from the state store and the idempotent/
    * replayed sinks absorb the reprocessed tail, the B5 kill-restart
    * contract applied automatically (GatewaySpec pins no loss and no
    * duplication across a peer-drop restart). A relaunch that itself
    * fails (bridge still down) counts as another dead round and is
    * retried, like the reference's reconnect-forever serial loop.
    * `maxRestarts` bounds crash loops in tests; production leaves it
    * unbounded.
    *
    * Source caveat, learned the hard way: Spark's socket source does
    * NOT support recovery (its own production warning) — a restarted
    * run fails committing offsets its fresh connection never served.
    * Supervised restarts therefore pair with a RECOVERABLE listener:
    * the `spoolDir` file listener here (the bridge appends line
    * files; processed files are never re-read), or Kafka in a real
    * deployment. The TCP socket path remains the live/low-latency
    * listener for runs that are not expected to restart.
    */
  def supervise(
      spark: SparkSession,
      conf: GatewayConf,
      backoffMs: Long = 1000,
      maxRestarts: Int = Int.MaxValue,
      idleTimeoutMs: Long = 0,
      register: StreamingQuery => Unit = _ => ()): Supervisor = {
    @volatile var stopped = false
    @volatile var current: Seq[StreamingQuery] =
      try run(spark, conf, register) catch { case _: Exception => Seq.empty }
    lazy val sup: Supervisor = new Supervisor(
      () => current,
      () => {
        stopped = true
        current.foreach(q => try q.stop() catch { case _: Exception => () })
      })
    val loop = new Thread(() => {
      // (runId, batchId) of the last data-bearing progress per query:
      // a NEW data batch anywhere counts as liveness
      val seen = scala.collection.mutable.Map.empty[java.util.UUID, Long]
      var lastActivity = System.nanoTime()
      while (!stopped && sup.restarts < maxRestarts) {
        var fresh = false
        current.foreach { q =>
          val p = try q.lastProgress catch { case _: Exception => null }
          if (p != null && p.numInputRows > 0 && !seen.get(q.runId).contains(p.batchId)) {
            seen(q.runId) = p.batchId
            fresh = true
          }
        }
        if (fresh) lastActivity = System.nanoTime()
        val dead = current.isEmpty || current.exists(q => !q.isActive)
        val stale = idleTimeoutMs > 0 &&
          (System.nanoTime() - lastActivity) > idleTimeoutMs * 1000000L
        if (dead || stale) {
          current.foreach(q => try q.stop() catch { case _: Exception => () })
          Thread.sleep(backoffMs)
          if (!stopped) {
            current = try run(spark, conf, register) catch { case _: Exception => Seq.empty }
            sup.restarts += 1
            seen.clear()
            lastActivity = System.nanoTime()
          }
        } else Thread.sleep(math.min(backoffMs, 200L))
      }
      // a stop() racing an in-flight relaunch could otherwise leave
      // the fresh queries running: the loop owns the final cleanup
      if (stopped) current.foreach(q => try q.stop() catch { case _: Exception => () })
    }, "gateway-supervisor")
    loop.setDaemon(true)
    loop.start()
    sup
  }

  /** S1/S2 — there is no serial source in Spark (nor serial hardware
    * here). The production design is the reference's own line protocol
    * over a ~20-line bridge: `socat /dev/ttyAMA0,b9600 TCP-LISTEN:
    * 50011,fork` (or equivalent), then the S3 socket listener consumes
    * it unchanged — the RFM2Pi radio settings writeback (frequency/
    * group/baseid ※ OemGatewayRFM2PiListener) stays in the bridge,
    * outside the query engine, exactly where the reference keeps its
    * serial-port side effects.
    */
  val serialBridgeNote: String =
    "serial→TCP bridge (e.g. socat) feeds the socket listener; radio config writeback lives in the bridge" +
      " — rehearsed end-to-end in GatewaySpec (\"S1 rehearsal\"): a byte pipe plays the UART with" +
      " mid-line write fragmentation, a line-unaware pump plays socat, init writeback runs first"

  /** B6 — the reference hot-applies `runtime_settings` by mutating
    * live objects (※ oemgateway.py · check_settings). A running Spark
    * plan cannot be mutated; the honest equivalent is stop + restart
    * from checkpoint: windowed state survives in the state store, the
    * new settings (period, active flags, sink target) take effect on
    * restart, and the idempotent sink absorbs the replayed tail.
    * GatewaySpec's kill-restart test demonstrates exactly this cycle.
    */
  val hotReloadNote: String =
    "hot reload = stop query + restart from checkpoint with new conf; state survives, sink idempotency absorbs replay"
}

package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Multimodal-column plumbing (north-star obligation): image/audio/
  * video payloads ride as opaque `binary` columns next to a typed
  * metadata struct; decode / feature-extract / frame-sample run
  * partition-wise over the binary batches. No media codec libraries
  * exist in this environment, so the container format is SYNTHETIC
  * BUT REAL: assets are packed into a deterministic `GFTM` binary
  * container (magic + version + media-type byte + typed TLV header +
  * payload, [[MediaCodec]]), and [[mediaDecode]] PARSES those bytes
  * back — bounds-checked, unknown-tags-skipped, validated — inside
  * `mapPartitions` (the JVM analog of `mapInPandas`; a production
  * deploy swaps the TLV parser for libjpeg/ffmpeg bindings behind the
  * same per-partition iterator, nothing else changes). The decode
  * query's oracle derives the expected metadata WITHOUT parsing
  * (direct md5 arithmetic), so every verify run certifies the binary
  * parser byte-for-byte.
  *
  * Scale notes (100 TB): payloads dominate row size, so the asset
  * table at scale is parquet with the binary column in its own chunk
  * (columnar pruning keeps metadata-only queries from reading bytes at
  * all — q_multimodal_meta never touches `payload`), decode is
  * per-partition streaming with no shuffle, and frame samples project
  * slices instead of materializing full decodes.
  */
object Multimodal {

  /** Typed asset row: the payload plus the metadata a real ingest
    * would carry (here derived deterministically from the corpus so
    * every engine can reproduce it).
    */
  final case class MediaAsset(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** The `GFTM` synthetic container codec — a real binary format with
    * a real parser, standing where libjpeg/ffmpeg would:
    *
    * {{{
    * bytes 0-3   magic "GFTM"
    * byte  4     version (0x01)
    * byte  5     media type (0=image, 1=audio, 2=video)
    * then TLV entries to end of buffer:
    *   tag (1 byte) | length (2 bytes, big-endian) | value
    *   0x01 width  (4-byte int)   0x02 height (4-byte int)
    *   0x03 doc id (8-byte long)  0x7F payload (length bytes)
    *   anything else: skip `length` bytes (forward compatibility —
    *   every produced container carries one unknown tag on purpose,
    *   so the skip path is exercised on every row, not just in a
    *   unit test)
    * }}}
    *
    * [[decode]] validates magic/version/media-type, bounds-checks
    * every read, tolerates any TLV order, and requires all four
    * typed fields — a parse, not a projection.
    */
  object MediaCodec {
    val Magic: Array[Byte] = Array('G', 'F', 'T', 'M').map(_.toByte)
    val MagicHex = "4746544D"
    val Version: Byte = 1
    val mediaTypes: IndexedSeq[String] = IndexedSeq("image", "audio", "video")

    final case class Decoded(
        docId: Long, mediaType: String, width: Int, height: Int, payload: Array[Byte])

    def decode(container: Array[Byte]): Decoded = {
      val buf = java.nio.ByteBuffer.wrap(container) // big-endian
      require(buf.remaining() >= 6, "container truncated before header")
      val magic = new Array[Byte](4)
      buf.get(magic)
      require(java.util.Arrays.equals(magic, Magic), "bad magic")
      require(buf.get() == Version, "unsupported container version")
      val mt = buf.get() & 0xFF
      require(mt < mediaTypes.length, s"unknown media type code $mt")
      var width, height = -1
      var docId = -1L
      var payload: Array[Byte] = null
      while (buf.hasRemaining) {
        require(buf.remaining() >= 3, "truncated TLV header")
        val tag = buf.get() & 0xFF
        val len = buf.getShort() & 0xFFFF
        require(buf.remaining() >= len, s"TLV $tag overruns the container")
        tag match {
          case 0x01 => require(len == 4, "width TLV must be 4 bytes"); width = buf.getInt()
          case 0x02 => require(len == 4, "height TLV must be 4 bytes"); height = buf.getInt()
          case 0x03 => require(len == 8, "doc-id TLV must be 8 bytes"); docId = buf.getLong()
          case 0x7F => payload = new Array[Byte](len); buf.get(payload)
          case _    => buf.position(buf.position() + len) // unknown: skip
        }
      }
      require(width >= 0 && height >= 0 && docId >= 0 && payload != null,
        "container missing a required field")
      Decoded(docId, mediaTypes(mt), width, height, payload)
    }

    def sampleFrames(payload: Array[Byte], frameBytes: Int): Seq[Array[Byte]] =
      payload.grouped(frameBytes).toSeq
  }

  /** The synthetic asset table: payload = md5 digest bytes of the
    * text (16 opaque bytes), metadata from the digest's leading hex
    * pairs — deterministic, reproducible in any engine.
    */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    val h = md5(col("text"))
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        unhex(h).as("payload"),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("width"),
        conv(substring(h, 3, 2), 16, 10).cast("int").as("height"))
      .as[MediaAsset]
  }

  /** The corpus as `GFTM` containers — the encode side, stated as
    * pure column arithmetic (one hex string assembled per row, then
    * `unhex`): header, one DELIBERATE unknown tag (0x0A, so the
    * parser's skip path runs on every row), width/height/doc-id TLVs,
    * payload TLV. Deterministic, so the decode oracle can state the
    * expected output without ever parsing.
    */
  def containers(s: SparkSession, dir: String): DataFrame = {
    val h = md5(col("text"))
    val hexParts = concat(
      lit(MediaCodec.MagicHex), lit("01"),
      lpad(hex(col("doc_id") % 3), 2, "0"),
      lit("0A0002"), lpad(hex(col("doc_id") % 65536), 4, "0"), // unknown tag
      lit("010004"), lpad(substring(h, 1, 2), 8, "0"),
      lit("020004"), lpad(substring(h, 3, 2), 8, "0"),
      lit("030008"), lpad(hex(col("doc_id")), 16, "0"),
      lit("7F0010"), h)
    Tables(s, dir, "documents")
      .select(col("doc_id"), unhex(hexParts).as("container"))
  }

  /** Partition-wise decode: the batch shape a real extractor uses —
    * one iterator pass per partition, codec state amortized across the
    * partition (the JVM mirror of `mapInPandas` batches). Emits the
    * q_multimodal_meta schema, derived ENTIRELY by parsing the
    * container bytes — the oracle derives the same values without
    * parsing, so the hash compare certifies the parser.
    */
  private def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    containers(s, dir).select(col("container")).as[Array[Byte]]
      .mapPartitions { it =>
        // per-partition codec setup would happen here, once
        it.map { bytes =>
          val d = MediaCodec.decode(bytes)
          val byteSum = d.payload.foldLeft(0L)((acc, b) => acc + (b & 0xFF))
          (d.docId, d.mediaType, d.payload.length.toLong,
            d.width.toLong, d.height.toLong, byteSum, byteSum % 256)
        }
      }
      .toDF("doc_id", "media_type", "n_bytes", "width", "height", "byte_sum", "brightness")
      .orderBy("doc_id")
  }

  /** Decode + feature-extract in one partition pass over containers
    * (doc_id, media_type, brightness) — the compact extractor shape
    * MultimodalSpec cross-checks against the relational reproduction.
    */
  def decodeBrightness(s: SparkSession, in: DataFrame): DataFrame = {
    import s.implicits._
    in.select(col("container")).as[Array[Byte]].mapPartitions { it =>
      it.map { bytes =>
        val d = MediaCodec.decode(bytes)
        (d.docId, d.mediaType,
          (d.payload.foldLeft(0L)((acc, b) => acc + (b & 0xFF)) % 256).toInt)
      }
    }.toDF("doc_id", "media_type", "brightness")
  }

  /** Metadata/feature query over the asset table — everything here is
    * hex arithmetic both engines compute identically; the payload
    * column itself is never read (columnar pruning at scale). The
    * checksum reproduces the decode stub's byte sum relationally.
    */
  private def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val h = md5(col("text"))
    val byteSum = (0 until 16)
      .map(i => conv(substring(h, 2 * i + 1, 2), 16, 10).cast("long"))
      .reduce(_ + _)
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        length(unhex(h)).cast("long").as("n_bytes"),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("width"),
        conv(substring(h, 3, 2), 16, 10).cast("long").as("height"),
        byteSum.as("byte_sum"),
        (byteSum % 256).as("brightness"))
      .orderBy("doc_id")
  }

  /** X43 — per-modality payload statistics: the "dataset card" a
    * multimodal corpus ships with (asset counts, byte volume, exact
    * duplicate payloads, extent extrema per media type). Unlike
    * `q_multimodal_meta` this aggregates over the BINARY column
    * itself — `length(payload)` and `count(DISTINCT payload)` on
    * byte-array semantics, so the oracle also certifies cross-engine
    * parity of binary equality/size, the contract every downstream
    * payload dedup rests on.
    *
    * Scale shape: one scan, map-side partial aggregation to
    * |media_types| groups; the distinct rides the same Expand-based
    * distinct-aggregate path as X13's profiling (the payload bytes do
    * shuffle for the exact distinct — at 100 TB swap the HLL++ R6
    * companion in for the approximate card, same module precedent).
    */
  private def mediaStats(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).cast("long").as("n_assets"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        countDistinct(col("payload")).cast("long").as("n_distinct_payloads"),
        max(col("width")).cast("long").as("max_width"),
        max(col("height")).cast("long").as("max_height"))
      .orderBy("media_type")

  /** The 100 TB form of [[mediaStats]]'s duplicate cardinality: the
    * exact `count(DISTINCT payload)` shuffles the payload BYTES for
    * the distinct (fine at sf, the scaladoc above owns it); this
    * companion swaps in HLL++ (`approx_count_distinct`, the R6 scale
    * path) so only constant-size sketches reach the exchange — the
    * map-side partials absorb the bytes. MultimodalSpec pins the
    * estimate within the rsd bound of the exact count at two SFs, so
    * the swap is verified code, not a comment.
    */
  private[graft] def mediaStatsApprox(
      s: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    assets(s, dir).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).cast("long").as("n_assets"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        approx_count_distinct(col("payload"), rsd).cast("long").as("n_distinct_payloads"),
        max(col("width")).cast("long").as("max_width"),
        max(col("height")).cast("long").as("max_height"))
      .orderBy("media_type")

  /** The no-parse derivation of the asset metadata (direct md5
    * arithmetic) — the oracle for BOTH the metadata query and the
    * container-decode query: for the latter it is the independent
    * ground truth the parsed bytes must reproduce.
    */
  private def metaSql: String = {
    val byteSum = (0 until 16)
      .map(i => s"('0x' || substr(md5(text), ${2 * i + 1}, 2))::BIGINT")
      .mkString(" + ")
    s"""SELECT doc_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |  CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS n_bytes,
       |  ('0x' || substr(md5(text), 1, 2))::BIGINT AS width,
       |  ('0x' || substr(md5(text), 3, 2))::BIGINT AS height,
       |  CAST($byteSum AS BIGINT) AS byte_sum,
       |  CAST(($byteSum) % 256 AS BIGINT) AS brightness
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** X105 frame geometry: 16-byte payloads split into 4-byte frames,
    * every 2nd frame sampled — the stub scale of a real video
    * pipeline's "decode container → split frames → keep every k-th"
    * (uniform temporal sampling, the standard pre-captioning step).
    */
  private[graft] val frameBytes = 4
  private[graft] val frameStride = 2

  /** X105 — frame-sampling plan (`q_frame_sample`): the declared form
    * of the brief's "frame-sample" multimodal obligation —
    * [[MediaCodec.sampleFrames]] existed as plumbing; this runs it as
    * an operator: video containers only (partition-prunable
    * predicate), GFTM TLV decode per partition (the mapInPandas
    * batch shape in JVM form), payload split into [[frameBytes]]
    * frames, every [[frameStride]]-th frame kept, and per sampled
    * frame the two features a downstream embedder's dataloader
    * needs: the frame byte sum (the decode checksum, X12's
    * discipline at frame grain) and the leading byte (the "luma
    * probe" stand-in). The oracle derives every value from md5 hex
    * arithmetic WITHOUT parsing — so the hash compare certifies the
    * parser + splitter + stride end to end, the container-decode
    * pattern extended one level down.
    *
    * Scale shape: a narrow per-partition iterator pass (codec state
    * amortized), ×2 fan-out in-row, no shuffle but the final sort;
    * the video-only filter prunes at the scan. Real frame decode
    * (the image/audio libs absent in this container) swaps into the
    * same mapPartitions body without touching the plan.
    */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    containers(s, dir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("container")).as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val d = MediaCodec.decode(bytes)
          assert(d.mediaType == "video", s"non-video container reached the frame sampler")
          MediaCodec.sampleFrames(d.payload, frameBytes).zipWithIndex
            .filter(_._2 % frameStride == 0)
            .map { case (f, i) =>
              (d.docId, i.toLong,
                f.foldLeft(0L)((acc, b) => acc + (b & 0xFF)),
                (f.head & 0xFF).toLong)
            }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_sum", "first_byte")
      .orderBy("doc_id", "frame_idx")
  }

  private def frameSampleSql: String = {
    val frameSum = (0 until frameBytes)
      .map(i => s"('0x' || substr(h, 8 * frame_idx + ${2 * i + 1}, 2))::BIGINT")
      .mkString(" + ")
    s"""WITH v AS (
       |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 2),
       |f AS (SELECT doc_id, unnest([0, 2]) AS frame_idx, h FROM v)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST($frameSum AS BIGINT) AS frame_sum,
       |  ('0x' || substr(h, 8 * frame_idx + 1, 2))::BIGINT AS first_byte
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Pairs below this shared-phash count are evidence, not verdicts. */
  private[graft] val mediaDupMinShared = 2

  /** X111 — media frame-level dedup (`q_media_dedup`): the dedup
    * family extended to multimodal grain. Text near-dup (X5) shingles
    * characters; video near-dup fingerprints SAMPLED FRAMES and calls
    * two videos duplicates when enough frames collide — the
    * production shape for catching re-encodes, crops and re-uploads
    * that exact payload hashing (X43's distinct-payload count)
    * misses. Here the per-frame fingerprint is the frame byte sum mod
    * 256 — the luma-histogram stand-in, deterministic and derivable
    * by BOTH engines (a real deploy swaps in pHash/dHash inside the
    * same mapPartitions body; nothing else changes, exactly the X12
    * decode contract). Per video: the DISTINCT fingerprint set; then
    * a bucketed self-join ON the fingerprint (the SimHash band-join
    * shape — collision-bounded, NO all-pairs) counts shared prints
    * per pair. Output per colliding pair: shared count, containment
    * = shared/min(ǀAǀ,ǀBǀ) (4dp integer HALF_UP), and the integer
    * verdict shared ≥ [[mediaDupMinShared]] — both branches live at
    * sf0.01 (MultimodalSpec pins dup and non-dup pairs nonempty and
    * recounts the whole table sequentially).
    *
    * The oracle derives every fingerprint from md5 hex arithmetic
    * WITHOUT parsing — the hash compare certifies parser + frame
    * split + fingerprint + pair algebra end to end.
    *
    * Scale shape: video-only prunable predicate, per-partition
    * decode, one distinct over (doc, phash) (≤4/video), the
    * phash-keyed equi-join (256 buckets here; a pHash swap widens the
    * key space and SHRINKS buckets), per-doc counts joined back onto
    * the collision-bounded pair table (the X5a shape). No corpus
    * all-pairs anywhere.
    */
  /** The distinct per-video frame fingerprints — X111's inner table,
    * factored so the streaming admission filter
    * ([[graft.streaming.Gateway.mediaFeed]]) indexes EXACTLY the
    * prints the batch pair join consumes.
    */
  private[graft] def framePrints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    containers(s, dir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("container")).as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val d = MediaCodec.decode(bytes)
          MediaCodec.sampleFrames(d.payload, frameBytes)
            .map(f => (d.docId, f.foldLeft(0L)((acc, b) => acc + (b & 0xFF)) % 256))
        }
      }
      .toDF("doc_id", "phash").distinct()
  }

  /** The prints grouped per indexed video (sorted array) — the
    * bounded offline artifact the streaming filter broadcasts, like
    * X100's eval suite.
    */
  private[graft] def framePrintSets(s: SparkSession, dir: String): DataFrame =
    framePrints(s, dir)
      .groupBy(col("doc_id").as("idx_doc"))
      .agg(sort_array(collect_set(col("phash"))).as("idx_prints"))

  /** The per-frame fingerprint of one decoded container — shared by
    * the batch path above and the streaming decode.
    */
  private[graft] def printsOf(bytes: Array[Byte]): (Long, Seq[Long]) = {
    val d = MediaCodec.decode(bytes)
    d.docId -> MediaCodec.sampleFrames(d.payload, frameBytes)
      .map(f => f.foldLeft(0L)((acc, b) => acc + (b & 0xFF)) % 256)
      .distinct.sorted
  }

  private def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    val ph = framePrints(s, dir).localCheckpoint()
    val sizes = ph.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = ph.as("a").join(ph.as("b"),
        col("a.phash") === col("b.phash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("mn", least(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (expr("CAST((20000 * shared + mn) DIV (2 * mn) AS BIGINT)") / lit(10000.0))
          .as("containment"),
        (col("shared") >= mediaDupMinShared).cast("long").as("is_dup"))
      .orderBy("doc_a", "doc_b")
  }

  private def mediaDedupSql: String = {
    val frameSum = (k: String) => (0 until frameBytes)
      .map(i => s"('0x' || substr(h, 8 * $k + ${2 * i + 1}, 2))::BIGINT")
      .mkString(" + ")
    s"""WITH v AS (
       |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 2),
       |fr AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS fi, h FROM v),
       |ph AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, (${frameSum("fi")}) % 256 AS phash FROM fr),
       |sizes AS (SELECT doc_id, count(*) AS n FROM ph GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM ph a JOIN ph b ON a.phash = b.phash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.doc_a, p.doc_b, CAST(p.shared AS BIGINT) AS shared,
       |  CAST((20000 * p.shared + least(sa.n, sb.n))
       |    // (2 * least(sa.n, sb.n)) AS BIGINT) / 10000.0 AS containment,
       |  CAST(p.shared >= $mediaDupMinShared AS BIGINT) AS is_dup
       |FROM pairs p
       |JOIN sizes sa ON p.doc_a = sa.doc_id
       |JOIN sizes sb ON p.doc_b = sb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_multimodal_meta" -> QueryDef(
      multimodalMeta,
      Some(metaSql),
      "multimodal asset metadata/features over the opaque binary payload"),
    "q_media_decode" -> QueryDef(
      mediaDecode,
      Some(metaSql),
      "X12 container decode: GFTM TLV parse in mapPartitions vs the no-parse oracle"),
    "q_media_stats" -> QueryDef(
      mediaStats,
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             |    from_hex(md5(text)) AS payload,
             |    ('0x' || substr(md5(text), 1, 2))::BIGINT AS width,
             |    ('0x' || substr(md5(text), 3, 2))::BIGINT AS height
             |  FROM documents)
             |SELECT media_type, CAST(count(*) AS BIGINT) AS n_assets,
             |  CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
             |  CAST(count(DISTINCT payload) AS BIGINT) AS n_distinct_payloads,
             |  CAST(max(width) AS BIGINT) AS max_width,
             |  CAST(max(height) AS BIGINT) AS max_height
             |FROM a GROUP BY media_type ORDER BY media_type""".stripMargin),
      "X43 per-modality payload statistics: counts/bytes/exact-dup cardinality/extents"),
    "q_frame_sample" -> QueryDef(
      frameSample,
      Some(frameSampleSql),
      "X105 frame-sampling plan: video containers decoded, every 2nd frame kept, per-frame features"),
    "q_media_dedup" -> QueryDef(
      mediaDedup,
      Some(mediaDedupSql),
      "X111 media frame-level dedup: per-frame fingerprints, bucketed pair join, containment + verdict"),
  )
}

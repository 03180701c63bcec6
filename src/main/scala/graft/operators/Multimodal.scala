package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Multimodal-column plumbing (north-star obligation): image/audio/
  * video payloads ride as opaque `binary` columns next to a typed
  * metadata struct; decode / feature-extract / frame-sample run
  * partition-wise over the binary batches. No media codecs exist in
  * this environment, so the DECODE STEP IS A DETERMINISTIC STUB
  * ([[MediaCodec.decodeStub]] — clearly marked); everything Spark-side
  * — schema, binary transport, partitioning, the partition-iterator
  * batch shape (`mapPartitions`, the JVM analog of `mapInPandas`), and
  * the frame-slicing arithmetic — is real and tested
  * (MultimodalSpec).
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

  /** Deterministic fake decoder — the `???` stand-in for libjpeg/
    * ffmpeg. Produces a "brightness" feature (byte sum mod 256) and
    * fixed-stride "frames" (4-byte slices), so tests can cross-check
    * the partition-wise path against pure column arithmetic.
    */
  object MediaCodec {
    def decodeStub(payload: Array[Byte]): Int =
      payload.foldLeft(0)((acc, b) => acc + (b & 0xFF)) % 256

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

  /** Partition-wise decode: the batch shape a real extractor uses —
    * one iterator pass per partition, codec state amortized across the
    * partition (the JVM mirror of `mapInPandas` batches).
    */
  def decodeBrightness(s: SparkSession, in: Dataset[MediaAsset]): DataFrame = {
    import s.implicits._
    in.mapPartitions { it =>
      // codec init would happen here, once per partition
      it.map(a => (a.doc_id, a.media_type, MediaCodec.decodeStub(a.payload)))
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

  val defs: ListMap[String, QueryDef] = ListMap(
    "q_multimodal_meta" -> QueryDef(
      multimodalMeta,
      Some {
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
      },
      "multimodal asset metadata/features over the opaque binary payload"),
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
  )
}

package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal path is a real binary parse: assets are packed into
  * the `GFTM` TLV container by column arithmetic and decoded back by
  * [[MediaCodec.decode]] inside mapPartitions. Pins: transport is
  * byte-exact, the partition-wise decode reproduces the relational
  * (no-parse) metadata exactly, the parser rejects corrupt containers
  * and skips unknown tags, and frame sampling slices correctly.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("binary payload transport: 16 opaque bytes per asset, typed metadata") {
    val a = Multimodal.assets(spark, sf)
    val bad = a.filter(x =>
      x.payload.length != 16 || x.width < 0 || x.width > 255 ||
        x.height < 0 || x.height > 255 ||
        !Set("image", "audio", "video").contains(x.media_type)).count()
    assert(bad === 0L)
  }

  test("planted-id headroom: base doc_ids leave the +200k..+900k plant ranges clear") {
    // r19 ADVICE: the media plants (+600000/+900000) and the text
    // near-dup plants (+200000/+300000) assume every base doc_id
    // within a 1,000,000-id block stays below 100,000; a denser corpus
    // would let plant ids collide with real ids (or plant families
    // with each other) IDENTICALLY on both engines — invisible to the
    // oracle. Pin it on every shipped SF so corpus drift fails loudly
    // here, the same place the build scripts assert it for the
    // synthesized 10x/100x corpora.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val maxMod = Tables(spark, dir, "documents")
        .agg(max(col("doc_id") % 1000000L)).head().getLong(0)
      assert(maxMod < 100000L,
        s"$dir: max doc_id % 1e6 = $maxMod >= 100000 — plant ranges would collide")
    }
  }

  test("partition-wise container decode equals the relational (no-parse) metadata") {
    import spark.implicits._
    val viaPartitions = Multimodal.decodeBrightness(spark, Multimodal.containers(spark, sf))
      .select("doc_id", "brightness").as[(Long, Int)].collect().toMap
    val viaColumns = SparkEntry.queries("q_multimodal_meta")(spark, sf)
      .select("doc_id", "brightness").as[(Long, Long)].collect().toMap
    assert(viaPartitions.size === viaColumns.size)
    assert(viaPartitions.forall { case (id, b) => viaColumns(id) == b.toLong })
  }

  test("full decode row-set matches the declared metadata query exactly") {
    val decoded = SparkEntry.queries("q_media_decode")(spark, sf).collect()
    val meta = SparkEntry.queries("q_multimodal_meta")(spark, sf).collect()
    assert(decoded.length === meta.length)
    decoded.zip(meta).foreach { case (d, m) => assert(d === m) }
  }

  test("the parser is a parser: corrupt containers are rejected, unknown tags skipped") {
    import spark.implicits._
    val one = Multimodal.containers(spark, sf)
      .select(col("container")).as[Array[Byte]].head()
    // every produced container already carries the deliberate unknown
    // tag 0x0A — decoding one proves the skip path
    val d = MediaCodec.decode(one)
    assert(d.payload.length === 16 && Set("image", "audio", "video")(d.mediaType))
    // corrupt magic
    val badMagic = one.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](MediaCodec.decode(badMagic))
    // truncated mid-TLV
    assertThrows[IllegalArgumentException](MediaCodec.decode(one.dropRight(3)))
    // bad version
    val badVer = one.clone(); badVer(4) = 9.toByte
    assertThrows[IllegalArgumentException](MediaCodec.decode(badVer))
    // a container missing its payload TLV fails the completeness check
    assertThrows[IllegalArgumentException](MediaCodec.decode(one.dropRight(16 + 3)))
  }

  test("HLL++ media-stats companion stays within rsd of the exact distinct at two SFs") {
    // 5 sigma of the configured rsd, and every non-sketch column
    // byte-identical — the 100 TB swap changes ONLY the estimate
    val rsd = 0.05
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val exact = SparkEntry.queries("q_media_stats")(spark, d).collect()
        .map(r => r.getString(0) -> r).toMap
      val approx = operators.Multimodal.mediaStatsApprox(spark, d, rsd).collect()
      assert(approx.length === exact.size)
      approx.foreach { a =>
        val e = exact(a.getString(0))
        assert(a.getLong(1) === e.getLong(1) && a.getLong(2) === e.getLong(2) &&
          a.getLong(4) === e.getLong(4) && a.getLong(5) === e.getLong(5),
          s"non-sketch columns diverged for ${a.getString(0)} at $d")
        val (est, truth) = (a.getLong(3), e.getLong(3))
        assert(math.abs(est - truth) <= math.max(1L, math.ceil(5 * rsd * truth).toLong),
          s"${a.getString(0)} HLL estimate $est vs exact $truth exceeds 5x rsd at $d")
      }
    }
  }

  test("frame sampling slices the payload at the declared stride") {
    val a = Multimodal.assets(spark, sf).head()
    val frames = MediaCodec.sampleFrames(a.payload, 4)
    assert(frames.length === 4 && frames.forall(_.length === 4))
    assert(frames.flatten.toSeq === a.payload.toSeq)
  }

  test("q_frame_sample: independent digest recount at two SFs; videos only, stride respected") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val texts = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // independent truth: java MessageDigest, not the Spark md5/hex
      // chain the query and oracle share
      val expected = texts.filter(_._1 % 3 == 2).flatMap { case (id, text) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8"))
        digest.grouped(4).toSeq.zipWithIndex.filter(_._2 % 2 == 0).map {
          case (f, i) =>
            (id, i.toLong, f.map(b => (b & 0xFF).toLong).sum, (f.head & 0xFF).toLong)
        }
      }.sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_frame_sample")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === expected.toSeq, s"frame-sample recount diverges at $dir")
      // exactly the video slice, exactly 2 of 4 frames per asset
      assert(got.forall(_._1 % 3 == 2), s"a non-video doc leaked into the sampler at $dir")
      assert(got.map(_._2).toSet == Set(0L, 2L), s"stride broken at $dir")
      assert(got.length == texts.count(_._1 % 3 == 2) * 2, s"frame count wrong at $dir")
    }
  }

  test("q_media_dedup: sequential pair recount off MessageDigest; both verdict branches; banded join plan") {
    import org.apache.spark.sql.functions._
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // independent truth: java MessageDigest payload hex (originals +
      // the two planted re-encode families) -> distinct 32-bit frame
      // fingerprints per video -> all-pairs recount (affordable
      // sequentially; the ENGINE must never do this)
      val vids = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
        .filter(_._1 % 3 == 2)
      val payloads =
        vids.map { case (id, t) => id -> md5hex(t) } ++
          vids.filter(_._1 % 15 == 2).map { case (id, t) =>
            (id + 600000L) -> (md5hex(t).substring(0, 16) + md5hex(t + "#").substring(16, 32)) } ++
          vids.filter(_._1 % 21 == 2).map { case (id, t) =>
            (id + 900000L) -> (md5hex(t).substring(0, 8) + md5hex(t + "%").substring(8, 32)) }
      val ph = payloads
        .map { case (id, h) =>
          id -> h.grouped(8).map(x => java.lang.Long.parseLong(x, 16)).toSet
        }.sortBy(_._1)
      val expected = (for {
        ((a, pa), ia) <- ph.zipWithIndex
        (b, pb) <- ph.drop(ia + 1)
        shared = (pa & pb).size.toLong
        if shared > 0
      } yield {
        val mn = math.min(pa.size, pb.size).toLong
        (a, b, shared, (20000L * shared + mn) / (2L * mn) / 10000.0,
          if (shared >= Multimodal.mediaDupMinShared) 1L else 0L)
      }).sortBy(r => (r._1, r._2))
      val got = SparkEntry.queries("q_media_dedup")(spark, dir)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      assert(got.toSeq === expected.toSeq, s"pair recount diverges at $dir")
      // the verdict must discriminate, not rubber-stamp
      assert(got.exists(_._5 == 1L), s"no dup pair at $dir — threshold vacuous")
      assert(got.exists(_._5 == 0L), s"every pair a dup at $dir — threshold vacuous")
      // plant-exact pin (r18 #2): both planted families are recovered
      // with their planted verdicts — the branches are live by
      // construction, not by hash-width collision luck
      val dupPairs = got.filter(_._5 == 1L).map(t => (t._1, t._2)).toSet
      val nonDupPairs = got.filter(_._5 == 0L).map(t => (t._1, t._2)).toSet
      val plantedDups = vids.filter(_._1 % 15 == 2).map(v => (v._1, v._1 + 600000L)).toSet
      val plantedOverlaps = vids.filter(_._1 % 21 == 2).map(v => (v._1, v._1 + 900000L)).toSet
      assert(plantedDups.nonEmpty && plantedDups.subsetOf(dupPairs),
        s"planted 2-frame re-encodes not all flagged dup at $dir")
      assert(plantedOverlaps.nonEmpty && plantedOverlaps.subsetOf(nonDupPairs),
        s"planted 1-frame overlaps not all scored non-dup at $dir")
    }
    // scale shape: the pair source is a phash-keyed equi-join on the
    // checkpointed fingerprint table — never a cartesian/BNLJ all-pairs
    val plan = SparkEntry.queries("q_media_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q_media_dedup fell back to all-pairs:\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"q_media_dedup re-scans parquet past the checkpointed fingerprints:\n$plan")
  }
}

package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing is real even though the codec is a stub:
  * binary payloads survive the Dataset round-trip, the partition-wise
  * decode path (mapPartitions) agrees with the relational reproduction
  * of the same feature, and frame sampling slices the payload
  * correctly.
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

  test("partition-wise decode stub equals the relational feature") {
    import spark.implicits._
    val viaPartitions = Multimodal.decodeBrightness(spark, Multimodal.assets(spark, sf))
      .select("doc_id", "brightness").as[(Long, Int)].collect().toMap
    val viaColumns = SparkEntry.queries("q_multimodal_meta")(spark, sf)
      .select("doc_id", "brightness").as[(Long, Long)].collect().toMap
    assert(viaPartitions.size === viaColumns.size)
    assert(viaPartitions.forall { case (id, b) => viaColumns(id) == b.toLong })
  }

  test("frame sampling slices the payload at the declared stride") {
    val a = Multimodal.assets(spark, sf).head()
    val frames = Multimodal.MediaCodec.sampleFrames(a.payload, 4)
    assert(frames.length === 4 && frames.forall(_.length === 4))
    assert(frames.flatten.toSeq === a.payload.toSeq)
  }
}

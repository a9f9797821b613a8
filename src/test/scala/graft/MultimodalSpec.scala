package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, "x" * 100),   // 100-byte blob
      (2L, "y" * 1000),  // 1000-byte blob
      (3L, "")           // empty blob
    ).toDF("media_id", "payload")
      .withColumn("bytes", col("payload").cast("binary"))
  }

  test("decode stub emits typed metadata with stable dimensions") {
    val widths = media.withColumn("meta", MultimodalOps.decodeImageMetaStub("bytes"))
      .select("media_id", "meta.width").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(widths === Map(1L -> 116, 2L -> (1000 % 640 + 16), 3L -> 16))
  }

  test("feature extractor: deterministic, batch-shaped, null-safe, fixed dim") {
    val a = MultimodalOps.extractFeaturesStub(media, "media_id", "bytes", dim = 8, batchSize = 2)
      .collect().map(f => f.mediaId -> f).toMap
    val b = MultimodalOps.extractFeaturesStub(media, "media_id", "bytes", dim = 8, batchSize = 64)
      .collect().map(f => f.mediaId -> f).toMap
    // batch size must not change results
    assert(a.keySet === b.keySet)
    for (id <- a.keySet) {
      assert(a(id).checksum === b(id).checksum)
      assert(a(id).feature.toSeq === b(id).feature.toSeq)
      assert(a(id).feature.length === 8)
      assert(a(id).feature.forall(f => f >= -1f && f <= 1f))
    }
    assert(a(3L).nBytes === 0) // empty blob handled
    assert(a(1L).checksum !== a(2L).checksum)
  }

  test("resize stub shrinks bytes and rewrites metadata") {
    val withMeta = media.filter(col("media_id") === 2L)
      .withColumn("meta", MultimodalOps.decodeImageMetaStub("bytes"))
    val resized = MultimodalOps.resizeStub(withMeta, "bytes", "meta", 16, 16)
      .select(length(col("bytes")).as("n"), col("meta.width"), col("meta.height"))
      .collect().head
    assert(resized.getInt(1) === 16 && resized.getInt(2) === 16)
    assert(resized.getInt(0) < 1000 && resized.getInt(0) >= 1)
  }

  test("frame sampling explodes every k-th fixed-size frame") {
    val frames = MultimodalOps.frameSampleStub(
        media.filter(col("media_id") === 2L), "media_id", "bytes",
        frameBytes = 100, everyK = 3)
      .select(col("frame_idx"), length(col("frame_bytes")).as("len"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // 1000 bytes / 100 = 10 frames; every 3rd -> frames 0,3,6,9
    assert(frames.map(_._1).toSeq === Seq(0, 3, 6, 9))
    assert(frames.forall(_._2 == 100))
  }

  test("pointer layout externalizes blobs to (uri, offset, length)") {
    val out = MultimodalOps.withPointerLayout(media, "media_id", "bytes", "store://media")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(out === Set((1L, "store://media/1", 100L), (2L, "store://media/2", 1000L),
      (3L, "store://media/3", 0L)))
  }
}

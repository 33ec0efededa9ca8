package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The mapPartitions batch-decode plumbing ([[Multimodal.decodeFeatures]])
  * — the iterator shape a real media decoder plugs into. */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures: distributed results match a driver-side recomputation") {
    import spark.implicits._
    val media = graft.sources.Tables.documents(spark, sf)
      .limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[Multimodal.MediaRow]
    val got = Multimodal.decodeFeatures(media).collect().map(f => f.doc_id -> f).toMap
    val local = media.collect()
    assert(local.nonEmpty)
    local.foreach { r =>
      val f = got(r.doc_id)
      assert(f.byte_len == r.media.length.toLong)
      var ck = 0L
      r.media.foreach(b => ck = ck * 31 + (b & 0xff))
      assert(f.checksum == ck, s"checksum mismatch for doc ${r.doc_id}")
      val expected = Multimodal.stubDecode(r.media)
      assert(f.features.length == 8)
      assert(f.features.sameElements(expected), s"feature mismatch for doc ${r.doc_id}")
    }
  }

  test("stubDecode: deterministic, 8-dim, empty input -> zero vector") {
    assert(Multimodal.stubDecode(Array.emptyByteArray).forall(_ == 0.0f))
    val bytes = "hello multimodal".getBytes("UTF-8")
    assert(Multimodal.stubDecode(bytes).sameElements(Multimodal.stubDecode(bytes)))
    assert(Multimodal.stubDecode(bytes).length == 8)
  }
}

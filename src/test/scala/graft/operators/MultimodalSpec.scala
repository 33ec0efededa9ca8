package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The media decode path: real pure-JVM PPM/WAV parsers
  * ([[Multimodal.parsePpm]]/[[Multimodal.parseWav]]) plus the
  * mapPartitions batch-decode plumbing ([[Multimodal.decodeFeatures]]).
  * The oracled mm_decode entry verifies decoded content against DuckDB;
  * these tests pin the parser GRAMMAR edges the fixed writers can't
  * reach (hand-written headers, corrupt inputs). */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures: distributed results match a driver-side recomputation") {
    import spark.implicits._
    // mixed-format corpus: real PPM rows, real WAV rows, and raw text
    // bytes (the unknown-format fallback) through ONE typed pipeline
    val media = graft.sources.Tables.documents(spark, sf)
      .limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[Multimodal.MediaRow]
      .map { r =>
        if (r.doc_id % 3 == 0) Multimodal.MediaRow(r.doc_id, Multimodal.synthPpm(r.doc_id, 5, 4))
        else if (r.doc_id % 3 == 1) Multimodal.MediaRow(r.doc_id, Multimodal.synthWav(r.doc_id, 40, 8000))
        else r
      }
    val got = Multimodal.decodeFeatures(media).collect().map(f => f.doc_id -> f).toMap
    val local = media.collect()
    assert(local.nonEmpty)
    local.foreach { r =>
      val f = got(r.doc_id)
      assert(f.byte_len == r.media.length.toLong)
      var ck = 0L
      r.media.foreach(b => ck = ck * 31 + (b & 0xff))
      assert(f.checksum == ck, s"checksum mismatch for doc ${r.doc_id}")
      val expected = Multimodal.extractFeatures(r.media)
      assert(f.features.length == 8)
      assert(f.features.sameElements(expected), s"feature mismatch for doc ${r.doc_id}")
    }
  }

  test("parsePpm: real grammar — comments, flexible whitespace, exact raster") {
    // hand-written header with multiple comments and mixed separators
    // (nothing synthPpm emits): 2x2 image, 12 raster bytes 0..11
    val header = "P6 # inline comment\n#another\n 2\t2 #dims done\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ (0 until 12).map(_.toByte)
    val img = Multimodal.parsePpm(bytes)
    assert(img.width == 2 && img.height == 2 && img.maxval == 255)
    assert(img.pixels.sameElements((0 until 12).map(_.toByte)))
    // roundtrip of the writer for a sweep of shapes
    for (id <- Seq(0L, 1L, 7L, 123456L); w <- Seq(1, 4, 16); h <- Seq(1, 3, 13)) {
      val p = Multimodal.parsePpm(Multimodal.synthPpm(id, w, h))
      assert(p.width == w && p.height == h && p.maxval == 255)
      assert(p.pixels.length == w * h * 3)
      (0 until w * h * 3).foreach { j =>
        assert((p.pixels(j) & 0xff) == ((id * 7 + j.toLong * 13) % 256).toInt)
      }
    }
  }

  test("parsePpm: rejects corrupt inputs instead of mis-decoding") {
    val good = Multimodal.synthPpm(42L, 4, 3)
    intercept[IllegalArgumentException](Multimodal.parsePpm(good.dropRight(1))) // truncated raster
    intercept[IllegalArgumentException](Multimodal.parsePpm(good :+ 0.toByte)) // trailing junk
    intercept[IllegalArgumentException](Multimodal.parsePpm("P5\n2 2\n255\n".getBytes)) // wrong magic
    intercept[IllegalArgumentException](Multimodal.parsePpm("P6\n0 2\n255\n".getBytes)) // zero dim
    intercept[IllegalArgumentException](Multimodal.parsePpm("P6\n2 2\n70000\n".getBytes)) // bad maxval
  }

  test("parseWav: chunk walking, odd-size padding, signed little-endian samples") {
    val a = Multimodal.parseWav(Multimodal.synthWav(9L, 33, 12000))
    assert(a.sampleRate == 12000 && a.nChannels == 1 && a.bitsPerSample == 16)
    assert(a.samples.length == 33)
    (0 until 33).foreach { i =>
      assert(a.samples(i) == ((9L * 31 + i.toLong * 17) % 4001 - 2000).toShort)
    }
    assert(a.samples.exists(_ < 0), "the formula must produce negative samples")
    // endianness + sign pin: sample -2 must decode from bytes FE FF
    val one = Multimodal.synthWav(0L, 1, 8000) // sample 0 = -2000
    assert(Multimodal.parseWav(one).samples.head == -2000)
    val dataOff = one.length - 2
    assert((one(dataOff) & 0xff) == ((-2000 & 0xff)) &&
      (one(dataOff + 1) & 0xff) == ((-2000 >> 8) & 0xff))
  }

  test("parseWav: rejects corrupt containers") {
    val good = Multimodal.synthWav(5L, 8, 8000)
    intercept[IllegalArgumentException](Multimodal.parseWav(good.dropRight(1))) // RIFF size wrong
    intercept[IllegalArgumentException](Multimodal.parseWav("RIFX1234WAVE".getBytes)) // bad magic
    // a file whose chunks never include fmt/data
    val noData = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    noData.put("RIFF".getBytes).putInt(12).put("WAVE".getBytes)
      .put("LIST".getBytes).putInt(0)
    intercept[IllegalArgumentException](Multimodal.parseWav(noData.array()))
  }

  test("extractFeatures: dispatches on magic bytes; stub is the fallback") {
    val img = Multimodal.extractFeatures(Multimodal.synthPpm(3L, 4, 3))
    assert(img(0) == 4f && img(1) == 3f && img(2) == 255f && img(6) == 12f)
    val wav = Multimodal.extractFeatures(Multimodal.synthWav(3L, 16, 8000))
    assert(wav(0) == 8000f && wav(1) == 1f && wav(2) == 16f && wav(3) == 16f)
    val bytes = "hello multimodal".getBytes("UTF-8")
    assert(Multimodal.extractFeatures(bytes).sameElements(Multimodal.stubDecode(bytes)))
    assert(Multimodal.stubDecode(Array.emptyByteArray).forall(_ == 0.0f))
  }
}

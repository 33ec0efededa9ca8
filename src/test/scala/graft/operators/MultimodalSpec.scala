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
        (r.doc_id % 6) match {
          case 0 => Multimodal.MediaRow(r.doc_id, Multimodal.synthPpm(r.doc_id, 5, 4))
          case 1 => Multimodal.MediaRow(r.doc_id, Multimodal.synthWav(r.doc_id, 40, 8000))
          case 2 => Multimodal.MediaRow(r.doc_id, Multimodal.synthPng(r.doc_id, 4, 6))
          case 3 => Multimodal.MediaRow(r.doc_id, Multimodal.synthGif(r.doc_id, 6, 5))
          case 4 => Multimodal.MediaRow(r.doc_id, Multimodal.synthWavMulaw(r.doc_id, 30, 8000))
          case _ => r // raw text bytes: the unknown-format stub fallback
        }
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

  test("parseWav: G.711 mu-law expansion — format dispatch, bias formula, sign, extremes") {
    val a = Multimodal.parseWav(Multimodal.synthWavMulaw(9L, 33, 8000))
    assert(a.sampleRate == 8000 && a.nChannels == 1 && a.bitsPerSample == 8)
    assert(a.samples.length == 33)
    (0 until 33).foreach { i =>
      val u = 255 - ((9L * 37 + i.toLong * 41) % 256).toInt
      val mag = ((132 + (u & 0x0f) * 8) << ((u >> 4) & 7)) - 132
      val want = if ((u & 0x80) != 0) -mag else mag
      assert(a.samples(i) == want.toShort, s"sample $i")
    }
    // the codec's extremes: encoded 0x00 expands to -32124 (max
    // negative), encoded 0xFF to 0 — pin them with a hand-built file
    val two = Multimodal.synthWavMulaw(0L, 2, 8000)
    two(44) = 0x00.toByte; two(45) = 0xff.toByte
    val ext = Multimodal.parseWav(two)
    assert(ext.samples(0) == -32124 && ext.samples(1) == 0)
    // mu-law must be 8-bit: a fmt chunk claiming 16 rejects
    val bad = Multimodal.synthWavMulaw(1L, 4, 8000)
    bad(34) = 16.toByte // bits-per-sample field in fmt
    intercept[IllegalArgumentException](Multimodal.parseWav(bad))
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

  test("parsePng: roundtrip across shapes — all five filters inverted exactly") {
    for (id <- Seq(0L, 1L, 7L, 123456L); w <- Seq(1, 3, 8); h <- Seq(1, 5, 11)) {
      // synthPng filters row y with type y%5, so h >= 5 covers
      // None/Sub/Up/Average/Paeth in one image; h < 5 covers the
      // y=0 edge cases (Up/Paeth with no prior row)
      val img = Multimodal.parsePng(Multimodal.synthPng(id, w, h))
      assert(img.width == w && img.height == h)
      assert(img.bitDepth == 8 && img.colorType == 2)
      assert(img.pixels.length == w * h * 3)
      (0 until w * h * 3).foreach { j =>
        assert((img.pixels(j) & 0xff) == ((id * 11 + j.toLong * 19) % 251).toInt,
          s"pixel $j of ${w}x$h id=$id")
      }
    }
  }

  test("parsePng: rejects corrupt containers, bad crcs, corrupt zlib") {
    val good = Multimodal.synthPng(42L, 4, 5)
    intercept[IllegalArgumentException](Multimodal.parsePng(good.take(8))) // sig only
    intercept[IllegalArgumentException](Multimodal.parsePng(good.dropRight(1))) // truncated
    // flip one raster-affecting byte inside the first IDAT payload:
    // crc must catch it (find IDAT, corrupt payload byte, keep length)
    val flipped = good.clone()
    val idatAt = (8 until good.length - 4).find(p =>
      good(p) == 'I' && good(p + 1) == 'D' && good(p + 2) == 'A' && good(p + 3) == 'T').get
    flipped(idatAt + 4) = (flipped(idatAt + 4) ^ 0x5a).toByte
    intercept[IllegalArgumentException](Multimodal.parsePng(flipped))
    // a structurally-valid file whose zlib stream is garbage: rebuild
    // the IDAT chunk with junk payload and a CORRECT crc
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, idatAt - 4) // up to IDAT length field
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val bb = java.nio.ByteBuffer.allocate(4).putInt(junk.length)
    out.write(bb.array()); out.write("IDAT".getBytes("US-ASCII")); out.write(junk)
    val crc = new java.util.zip.CRC32()
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(junk)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    // IEND from the original (last 12 bytes)
    out.write(good, good.length - 12, 12)
    intercept[IllegalArgumentException](Multimodal.parsePng(out.toByteArray))
  }

  test("parsePng: (stride+1)*h Int overflow rejects instead of NegativeArraySizeException (r14 ADVICE)") {
    // w=1 RGB, h=715e6: passes the IHDR bound (w*h*3 = 2.145e9 just
    // under Int.MaxValue) and the 1040x inflation bound (2.8 MB IDAT),
    // but (stride+1)*h = 2.86e9 overflows Int — must reject, not throw
    // NegativeArraySizeException out of the allocation
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    def chunk(id: String, payload: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(payload.length).array())
      out.write(id.getBytes("US-ASCII")); out.write(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(id.getBytes("US-ASCII")); crc.update(payload)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(1).putInt(715000000).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", new Array[Byte](2800000))
    chunk("IEND", Array.emptyByteArray)
    val ex = intercept[IllegalArgumentException](Multimodal.parsePng(out.toByteArray))
    assert(ex.getMessage.contains("exceeds array bounds"))
    // and the production dispatch degrades it to stub features
    assert(Multimodal.extractFeatures(out.toByteArray).length == 8)
  }

  test("parsers terminate and reject on adversarial sizes (no hang, no overflow)") {
    // WAV: declared chunk size >= 2^31 used to truncate to a negative
    // Int, pass the overrun check, and leave pos unchanged — an
    // executor-hanging infinite loop on corrupt lake bytes
    val evil = Multimodal.synthWav(1L, 4, 8000).clone()
    // first chunk is fmt_ at offset 12; poison its size field to 0xFFFFFFF8 (-8 as Int)
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte; evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    // fix the RIFF size check is unaffected (header untouched); must REJECT, not hang
    intercept[IllegalArgumentException](Multimodal.parseWav(evil))
    // PPM: a 15-digit dimension token used to wrap Int silently
    intercept[IllegalArgumentException](
      Multimodal.parsePpm("P6\n999999999999999 2\n255\n".getBytes))
    // PPM: w*h*3 wrapping Int (dims individually fine)
    intercept[IllegalArgumentException](
      Multimodal.parsePpm("P6\n99999 99999\n255\n".getBytes))
  }

  test("parseGif: LZW roundtrip across shapes — width growth, KwKwK-free literal streams, mid-stream clear") {
    // small shapes: 9-bit codes at most; 40x15 crosses 512 entries
    // (10-bit); 70x70 = 4900 px crosses the 4095 ceiling, forcing the
    // encoder's mid-stream CLEAR and the decoder's reset path
    for (id <- Seq(0L, 1L, 7L, 123456L); (w, h) <- Seq((4, 3), (40, 15), (70, 70))) {
      val img = Multimodal.parseGif(Multimodal.synthGif(id, w, h))
      assert(img.width == w && img.height == h && img.palBits == 7)
      assert(img.pixels.length == w * h * 3)
      (0 until w * h).foreach { j =>
        val idx = ((id * 13 + j.toLong * 23) % 97).toInt
        assert((img.pixels(3 * j) & 0xff) == (idx * 3) % 256, s"R pixel $j id=$id ${w}x$h")
        assert((img.pixels(3 * j + 1) & 0xff) == (idx * 5 + 1) % 256)
        assert((img.pixels(3 * j + 2) & 0xff) == (idx * 7 + 2) % 256)
      }
    }
  }

  test("lzwDecode: the KwKwK case decodes (a stream a literal-only encoder never emits)") {
    // hand-build min=2: clear=4, end=5. Stream: CLEAR, 1, 6 — code 6 is
    // the entry being defined (string(1)+first(1) = [1,1]) — then END.
    // widths: 3 bits after clear; after the KwKwK add dict=7, width
    // stays 3 (bump at 8). Bits LSB-first: 100 (4), 001 (1), 011 (6), 101 (5)
    val codes = Seq(4, 1, 6, 5)
    var cur = 0; var n = 0
    val bb = new java.io.ByteArrayOutputStream()
    codes.foreach { c => cur |= c << n; n += 3; while (n >= 8) { bb.write(cur & 0xff); cur >>= 8; n -= 8 } }
    if (n > 0) bb.write(cur & 0xff)
    val out = Multimodal.lzwDecode(bb.toByteArray, 2, 3)
    assert(out.toSeq == Seq[Byte](1, 1, 1))
  }

  test("parseGif: rejects corrupt containers") {
    val good = Multimodal.synthGif(42L, 8, 5)
    intercept[IllegalArgumentException](Multimodal.parseGif(good.take(12))) // truncated header
    intercept[IllegalArgumentException](Multimodal.parseGif(good.dropRight(8))) // truncated data
    // interlace flag set in the image descriptor
    val inter = good.clone()
    // descriptor offset is structural, not searched: 13-byte header +
    // 384-byte global table + 7-byte comment extension (0x2c also
    // occurs as palette DATA, so a byte scan finds the wrong offset)
    val imgAt = 13 + 3 * 128 + 7
    assert((good(imgAt) & 0xff) == 0x2c, "descriptor offset drifted")
    inter(imgAt + 9) = (inter(imgAt + 9) | 0x40).toByte
    intercept[IllegalArgumentException](Multimodal.parseGif(inter))
    // unknown block type where a descriptor should be
    val junk = good.clone(); junk(imgAt) = 0x7f.toByte
    intercept[IllegalArgumentException](Multimodal.parseGif(junk))
    // trailer before any image
    val noImg = good.take(imgAt) :+ 0x3b.toByte
    intercept[IllegalArgumentException](Multimodal.parseGif(noImg))
  }

  test("byte-flip fuzz: every single-byte corruption of every format parses or degrades — no hang, no escape, no giant alloc") {
    // the production contract over arbitrary lake bytes, swept
    // systematically: flip one bit (low and high) at EVERY position of
    // a valid file in each format; extractFeatures must return 8
    // features every time — either a successful (possibly different)
    // decode or the stub fallback — never an uncaught exception, an
    // unbounded allocation (the IHDR/descriptor dim-flip class), or a
    // non-terminating loop (the WAV chunk-size class)
    val files = Seq(
      Multimodal.synthPpm(5L, 6, 4),
      Multimodal.synthWav(5L, 24, 8000),
      Multimodal.synthPng(5L, 4, 5),
      Multimodal.synthGif(5L, 8, 6),
      Multimodal.synthWavMulaw(5L, 20, 8000))
    var parsedSome = 0
    for (f <- files; pos <- f.indices; delta <- Seq(0x01, 0x80)) {
      val c = f.clone()
      c(pos) = (c(pos) ^ delta).toByte
      val feats = Multimodal.extractFeatures(c)
      assert(feats != null && feats.length == 8,
        s"contract broken at pos=$pos delta=$delta of ${f.length}-byte file")
      parsedSome += 1
    }
    assert(parsedSome == files.map(_.length).sum * 2)
  }

  test("extractFeatures: corrupt inputs degrade to stub, never throw") {
    // text that merely starts with a known magic must not fail the job
    val fakePpm = "P6 this is just text, not an image at all".getBytes("US-ASCII")
    assert(Multimodal.extractFeatures(fakePpm).sameElements(Multimodal.stubDecode(fakePpm)))
    val fakeRiff = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    assert(Multimodal.extractFeatures(fakeRiff).sameElements(Multimodal.stubDecode(fakeRiff)))
    val truncPng = Multimodal.synthPng(3L, 4, 4).dropRight(3)
    assert(Multimodal.extractFeatures(truncPng).sameElements(Multimodal.stubDecode(truncPng)))
  }

  test("extractFeatures: dispatches on magic bytes; stub is the fallback") {
    val img = Multimodal.extractFeatures(Multimodal.synthPpm(3L, 4, 3))
    assert(img(0) == 4f && img(1) == 3f && img(2) == 255f && img(6) == 12f)
    val wav = Multimodal.extractFeatures(Multimodal.synthWav(3L, 16, 8000))
    assert(wav(0) == 8000f && wav(1) == 1f && wav(2) == 16f && wav(3) == 16f)
    val png = Multimodal.extractFeatures(Multimodal.synthPng(3L, 4, 3))
    assert(png(0) == 4f && png(1) == 3f && png(2) == 8f && png(3) == 2f && png(5) == 12f)
    val gif = Multimodal.extractFeatures(Multimodal.synthGif(3L, 4, 3))
    assert(gif(0) == 4f && gif(1) == 3f && gif(2) == 7f && gif(4) == 12f)
    val bytes = "hello multimodal".getBytes("UTF-8")
    assert(Multimodal.extractFeatures(bytes).sameElements(Multimodal.stubDecode(bytes)))
    assert(Multimodal.stubDecode(Array.emptyByteArray).forall(_ == 0.0f))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.parseJpeg]]/[[Multimodal.synthJpeg]] — the baseline
  * JPEG entropy layer (the oracled half) and the IDCT numerics (the
  * half a float pipeline cannot oracle cross-engine, pinned here
  * against closed-form blocks instead). Pure byte-level tests, no
  * Spark session needed. */
class JpegSpec extends AnyFunSuite {

  test("coefficient roundtrip: DC prediction chain + AC runs/ZRL/EOB across shapes") {
    for (id <- Seq(0L, 1L, 7L, 58L, 123456L); n <- Seq(1, 2, 6, 40)) {
      val img = Multimodal.parseJpeg(Multimodal.synthJpeg(id, n))
      assert(img.width == 8 * n && img.height == 8)
      assert(img.blocks.length == n)
      (0 until n).foreach { b =>
        val zz = img.blocks(b)
        assert(zz(0) == ((id * 7 + b * 13) % 61).toInt - 30, s"DC of block $b id=$id")
        assert(zz(1) == ((id * 11 + b * 17) % 19).toInt - 9, s"AC1 of block $b id=$id")
        assert(zz(19) == ((id * 5 + b * 23) % 15).toInt - 7, s"AC19 of block $b id=$id")
        (2 until 64).filter(_ != 19).foreach(k => assert(zz(k) == 0, s"zz($k) of block $b"))
      }
    }
  }

  test("the encoded stream really exercises ZRL and both magnitude signs") {
    // across ids 0..39 x blocks, zigzag-1 takes value 0 for some blocks
    // (forcing the 18-zero ZRL+run path) and nonzero for others (the
    // 17-zero path); signs of all three coefficients flip across blocks
    var sawZeroV1 = false; var sawNeg = false; var sawPos = false
    for (id <- 0L until 40L; b <- 0 until 4) {
      val v1 = ((id * 11 + b * 17) % 19).toInt - 9
      if (v1 == 0) sawZeroV1 = true
      if (v1 < 0) sawNeg = true
      if (v1 > 0) sawPos = true
    }
    assert(sawZeroV1 && sawNeg && sawPos)
  }

  test("IDCT numerics: DC-only block is flat at DC/8 + 128; a known two-coefficient block matches a direct evaluation") {
    // build a single-block jpeg whose coefficients we control exactly by
    // picking the id: block 0 of id=30 has DC = (30*7)%61-30 = 210%61-30
    // = 27-30 = -3; AC1 = (30*11)%19-9 = 330%19-9 = 7-9 = -2;
    // AC19 = (30*5)%15-7 = 0-7 = -7
    val img = Multimodal.parseJpeg(Multimodal.synthJpeg(30L, 1))
    assert(img.blocks(0)(0) == -3 && img.blocks(0)(1) == -2 && img.blocks(0)(19) == -7)
    // direct double evaluation of the same IDCT definition, written
    // independently: f(x,y) = 1/4 sum_u sum_v C(u)C(v) F(u,v) cos cos
    val nat = new Array[Int](64)
    // zigzag 0 -> (0,0); zigzag 1 -> (0,1); zigzag 19 -> natural index:
    // recompute the standard walk independently
    val zz = Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    nat(zz(0)) = -3; nat(zz(1)) = -2; nat(zz(19)) = -7
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8)
          s += c(u) * c(v) * nat(u * 8 + v) *
            math.cos((2 * y + 1) * u * math.Pi / 16) *
            math.cos((2 * x + 1) * v * math.Pi / 16)
        val want = math.max(0, math.min(255, math.round(s / 4 + 128).toInt))
        assert((img.pixels(y * 8 + x) & 0xff) == want, s"pixel ($x,$y)")
      }
    }
    // DC-only closed form: id=60 block 0 -> DC=(60*7)%61-30=54-30=24? no:
    // 420%61=54 -> 24; AC1=(660%19)-9=14-9=5 nonzero, so use a synthetic
    // hand check instead: IDCT of DC-only c has every sample c/8
    val flat = new Array[Int](64); flat(0) = 16
    var ok = true
    (0 until 8).foreach { y => (0 until 8).foreach { x =>
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8)
        s += c(u) * c(v) * flat(u * 8 + v) *
          math.cos((2 * y + 1) * u * math.Pi / 16) *
          math.cos((2 * x + 1) * v * math.Pi / 16)
      if (math.round(s / 4) != 2) ok = false // 16/8 = 2, flat
    } }
    assert(ok, "DC-only IDCT is not flat at DC/8")
  }

  test("rejects corrupt containers: truncation, bad huffman, progressive, stray markers") {
    val good = Multimodal.synthJpeg(9L, 2)
    intercept[IllegalArgumentException](Multimodal.parseJpeg(good.take(4)))
    intercept[IllegalArgumentException](Multimodal.parseJpeg(good.dropRight(6))) // truncated scan
    // SOF0 -> SOF2 (progressive)
    val prog = good.clone()
    val sofAt = (2 until good.length - 1).find(p =>
      (good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Multimodal.parseJpeg(prog))
    // not a jpeg at all
    intercept[IllegalArgumentException](Multimodal.parseJpeg("JFIF but not".getBytes))
  }

  test("byte-flip fuzz over the jpeg container: parse or degrade, never escape") {
    val f = Multimodal.synthJpeg(5L, 3)
    for (pos <- f.indices; delta <- Seq(0x01, 0x80)) {
      val c = f.clone(); c(pos) = (c(pos) ^ delta).toByte
      val feats = Multimodal.extractFeatures(c)
      assert(feats != null && feats.length == 8, s"contract broken at pos=$pos delta=$delta")
    }
  }

  test("color 4:2:0 roundtrip: per-component table routing, MCU interleave, restarts, chroma dequant") {
    for (id <- Seq(0L, 1L, 7L, 58L, 123456L); n <- Seq(1, 2, 3, 4, 9)) {
      val f = Multimodal.synthJpegColor(id, n)
      val img = Multimodal.parseJpeg(f)
      assert(img.width == 16 * n && img.height == 16)
      assert(img.components.length == 3)
      val y = img.components(0); val cb = img.components(1); val cr = img.components(2)
      assert(y.hSamp == 2 && y.vSamp == 2 && cb.hSamp == 1 && cr.vSamp == 1)
      assert(y.blocks.length == 4 * n && cb.blocks.length == n && cr.blocks.length == n)
      assert(img.blocks eq y.blocks, "first component must alias the gray-era blocks field")
      // luma: MCU-interleaved scan order lands in component raster order —
      // sequential block b = 4m+i of MCU m sits at raster row i/2, col 2m + i%2
      (0 until 4 * n).foreach { b =>
        val m = b / 4; val i = b % 4
        val zz = y.blocks((i / 2) * (2 * n) + (m * 2 + i % 2))
        assert(zz(0) == ((id * 7 + b * 13) % 61).toInt - 30, s"Y DC b=$b id=$id n=$n")
        assert(zz(1) == ((id * 11 + b * 17) % 19).toInt - 9, s"Y z1 b=$b id=$id n=$n")
        assert(zz(19) == ((id * 5 + b * 23) % 15).toInt - 7, s"Y z19 b=$b id=$id n=$n")
      }
      // chroma: one block per MCU; the all-twos quant table (id 1)
      // doubles every dequantized value — a wrong-table route shows as 2x
      (0 until n).foreach { m =>
        assert(cb.blocks(m)(0) == 2 * (((id * 3 + m * 29) % 41).toInt - 20), s"Cb DC m=$m id=$id")
        assert(cb.blocks(m)(4) == 2 * (((id * 13 + m * 7) % 17).toInt - 8), s"Cb z4 m=$m id=$id")
        assert(cr.blocks(m)(0) == 2 * (((id * 17 + m * 11) % 37).toInt - 18), s"Cr DC m=$m id=$id")
        assert(cr.blocks(m)(33) == 2 * (((id * 19 + m * 23) % 13).toInt - 6), s"Cr z33 m=$m id=$id")
      }
      // files spanning > one restart interval really contain RSTn bytes
      // (scan FFs are stuffed with 00, so FF D0..D7 pairs are unambiguous)
      if (n > 2)
        assert(f.sliding(2).exists(p =>
          (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7),
          s"no restart marker in a $n-MCU stream with DRI=2")
    }
  }

  test("color IDCT + 4:2:0 upsample + BT.601: RGB matches a direct independent evaluation") {
    val img = Multimodal.parseJpeg(Multimodal.synthJpegColor(30L, 1))
    assert(img.rgb.length == 16 * 16 * 3)
    // independent IDCT of the two chroma blocks; the luma plane
    // (img.pixels) is already pinned by the grayscale IDCT test's
    // independent evaluation of the same plane math
    def idct(zzBlock: Array[Int]): Array[Int] = {
      val zz = Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
      val nat = new Array[Int](64)
      (0 until 64).foreach(k => nat(zz(k)) = zzBlock(k))
      def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      val out = new Array[Int](64)
      for (py <- 0 until 8; px <- 0 until 8) {
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8)
          s += c(u) * c(v) * nat(u * 8 + v) *
            math.cos((2 * py + 1) * u * math.Pi / 16) *
            math.cos((2 * px + 1) * v * math.Pi / 16)
        out(py * 8 + px) = math.max(0, math.min(255, math.round(s / 4 + 128).toInt))
      }
      out
    }
    val cbP = idct(img.components(1).blocks(0))
    val crP = idct(img.components(2).blocks(0))
    def cl(v: Long): Int = math.max(0L, math.min(255L, v)).toInt
    for (y <- 0 until 16; x <- 0 until 16) {
      val lum = img.pixels(y * 16 + x) & 0xff
      val cbv = cbP((y / 2) * 8 + x / 2) - 128
      val crv = crP((y / 2) * 8 + x / 2) - 128
      val o = (y * 16 + x) * 3
      assert((img.rgb(o) & 0xff) == cl(math.round(lum + 1.402 * crv)), s"R ($x,$y)")
      assert((img.rgb(o + 1) & 0xff) ==
        cl(math.round(lum - 0.344136 * cbv - 0.714136 * crv)), s"G ($x,$y)")
      assert((img.rgb(o + 2) & 0xff) == cl(math.round(lum + 1.772 * cbv)), s"B ($x,$y)")
    }
    // grayscale files carry no RGB raster
    assert(Multimodal.parseJpeg(Multimodal.synthJpeg(30L, 1)).rgb.isEmpty)
  }

  test("undersized segment bodies reject cleanly (r14 ADVICE): no out-of-bounds escape") {
    // each declares a legal-looking length too short for its fixed
    // body layout — previously read past the segment end and escaped
    // as ArrayIndexOutOfBoundsException, killing the task
    val sof = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02).map(_.toByte) // SOF0, no body
    val dht = Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x03, 0x00).map(_.toByte) // DHT, no bit counts
    val sos = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte) // SOS before SOF, no body
    val dri = Array(0xff, 0xd8, 0xff, 0xdd, 0x00, 0x02).map(_.toByte) // DRI, no interval
    for (f <- Seq(sof, dht, sos, dri)) {
      intercept[IllegalArgumentException](Multimodal.parseJpeg(f))
      // and the production dispatch degrades to stub features
      assert(Multimodal.extractFeatures(f).length == 8)
    }
  }

  test("byte-flip fuzz over the color jpeg container: parse or degrade, never escape") {
    val f = Multimodal.synthJpegColor(5L, 3)
    for (pos <- f.indices; delta <- Seq(0x01, 0x80)) {
      val c = f.clone(); c(pos) = (c(pos) ^ delta).toByte
      val feats = Multimodal.extractFeatures(c)
      assert(feats != null && feats.length == 8, s"contract broken at pos=$pos delta=$delta")
    }
  }
}

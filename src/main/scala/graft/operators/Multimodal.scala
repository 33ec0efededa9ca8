package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star extension surface, SURVEY §7.5):
  * media as opaque `binary` columns with typed metadata, decode /
  * feature-extraction, and frame sampling.
  *
  * The container has no image/audio codec LIBRARIES, but two media
  * formats are simple enough to parse in pure JVM code — binary PPM
  * (P6) images and RIFF/WAV PCM audio — so since r12 the decode path is
  * REAL: [[parsePpm]]/[[parseWav]] are honest binary parsers (header
  * grammar with comments, chunk walking with odd-size padding,
  * little-endian signed samples), [[decodeFeatures]] dispatches on the
  * magic bytes, and the oracled [[mmDecode]] entry verifies decoded
  * content against DuckDB's independent recomputation. Since r13 the
  * dispatch covers THREE compression families on top of the raw
  * formats: [[parsePng]] (DEFLATE — crc'd chunk walk, java.util.zip
  * zlib inflate, all five scanline filters; oracled by
  * [[mmDecodePng]]), [[parseGif]] (variable-width LZW with dictionary
  * resets; [[mmDecodeGif]]), and [[parseJpeg]] (baseline JPEG — the
  * canonical-Huffman entropy layer oracled by [[mmDecodeJpeg]], the
  * IDCT pinned in JpegSpec), plus G.711 μ-law companding inside the
  * WAV walker ([[mmDecodeMulaw]]) and the all-formats dispatch
  * capstone [[mmDecodeMixed]]. Remaining formats (FLAC/H.264) would
  * slot into the same dispatch without changing any plan shape;
  * [[stubDecode]] remains as the unknown-format / corrupt-input
  * fallback (see [[extractFeatures]]), and a byte-flip fuzz spec sweeps
  * every format's container for hangs/escapes/unbounded allocations.
  *
  * Scale: per-row projection and a generate (explode) — no shuffles at
  * all; media bytes stay columnar in parquet and are never collected.
  */
object Multimodal {

  /** Media metadata extraction: treat document text bytes as an opaque
    * media blob, derive typed metadata. Width/height/frames/format are
    * the STUB decode (pure arithmetic on n_chars, engine-independent);
    * byte_len is real binary handling. */
  def mmMetaExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("media", col("text").cast("binary"))
      .select(col("doc_id"),
        octet_length(col("media")).cast("long").as("byte_len"),
        (lit(320L) + col("n_chars") % 320).as("width"),
        (lit(240L) + col("n_chars") % 240).as("height"),
        (lit(1L) + col("n_chars") % 30).as("n_frames"),
        when(col("n_chars") % 3 === 0, "jpeg")
          .when(col("n_chars") % 3 === 1, "png")
          .otherwise("webp").as("fmt"))
      .orderBy("doc_id")

  private val mmMetaExtractSql: String =
    """SELECT doc_id, octet_length(text::BLOB)::BIGINT AS byte_len,
      |  320 + n_chars % 320 AS width,
      |  240 + n_chars % 240 AS height,
      |  1 + n_chars % 30 AS n_frames,
      |  CASE WHEN n_chars % 3 = 0 THEN 'jpeg'
      |       WHEN n_chars % 3 = 1 THEN 'png' ELSE 'webp' END AS fmt
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: one output row per sampled frame of each "video",
    * evenly spaced across the stub duration — the row-explosion shape a
    * video pipeline uses before per-frame feature extraction. */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("duration_s", (col("n_chars") % 60 + 1).cast("double"))
      .withColumn("n_frames", lit(1L) + col("n_chars") % 30)
      .select(col("doc_id"), col("duration_s"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("t_offset", col("frame_idx") * (col("duration_s") / col("n_frames")))
      .select("doc_id", "frame_idx", "t_offset")
      .orderBy("doc_id", "frame_idx")

  private val mmFrameSampleSql: String =
    """SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx,
      |  unnest(generate_series(0, n_frames - 1)) * (duration_s / n_frames) AS t_offset
      |FROM (SELECT doc_id, (n_chars % 60 + 1)::DOUBLE AS duration_s,
      |        1 + n_chars % 30 AS n_frames FROM documents) t
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize planning (STUB decode, real plumbing): compute the scaled
    * dimensions that fit each "image" into a 224×224 budget preserving
    * aspect ratio — integer arithmetic both engines share; the actual
    * pixel resample would live in the [[decodeFeatures]] mapPartitions
    * stage next to the codec. Emits original + target dims + scale
    * in per-mille (fixed-point, engine-identical). */
  def mmResize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (lit(320L) + col("n_chars") % 320).as("width"),
        (lit(240L) + col("n_chars") % 240).as("height"))
      .withColumn("scale_pm", // integer div: `/` on Columns is double division
        least(expr("224000 div width"), expr("224000 div height"), lit(1000L)))
      .select(col("doc_id"), col("width"), col("height"),
        expr("width * scale_pm div 1000").as("out_w"),
        expr("height * scale_pm div 1000").as("out_h"),
        col("scale_pm"))
      .orderBy("doc_id")

  private val mmResizeSql: String =
    """SELECT doc_id, width, height,
      |  width * scale_pm // 1000 AS out_w,
      |  height * scale_pm // 1000 AS out_h,
      |  scale_pm
      |FROM (SELECT doc_id, width, height,
      |        least(224000 // width, 224000 // height, 1000) AS scale_pm
      |      FROM (SELECT doc_id, 320 + n_chars % 320 AS width,
      |              240 + n_chars % 240 AS height FROM documents) a) b
      |ORDER BY doc_id""".stripMargin

  // ----- real pure-JVM media codecs + the mapPartitions batch-decode
  // ----- path (ScalaTest-verified) -----------------------------------

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: Long, features: Array[Float])

  /** Decoded binary PPM (P6): dims, sample depth, raw RGB bytes. */
  case class PpmImage(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  /** Decoded RIFF/WAV PCM: format fields + 16-bit signed samples. */
  case class WavAudio(sampleRate: Int, nChannels: Int, bitsPerSample: Int,
                      samples: Array[Short])

  /** Binary PPM (P6) parser — the real Netpbm grammar, not a fixed
    * offset: after the `P6` magic, three ASCII integers (width, height,
    * maxval) separated by arbitrary whitespace, with `#`-to-end-of-line
    * comments allowed anywhere a token separator can appear; EXACTLY one
    * whitespace byte after maxval, then `width*height*3` raw bytes (one
    * per sample for maxval < 256). Truncated or oversized payloads and
    * out-of-range maxval are rejected — a decoder that "works" on well-
    * formed files only is how corrupt lake objects poison a pipeline. */
  def parsePpm(bytes: Array[Byte]): PpmImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 ppm")
    var pos = 2
    def isWs(b: Byte): Boolean = b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    def nextInt(): Int = {
      var scanning = true
      while (scanning) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else scanning = false
      }
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"ppm: expected digit at offset $pos")
      // Accumulate in Long: `v * 10 + digit` in Int wraps on adversarial
      // headers, and a wrapped-but-positive value that happens to match
      // the payload length would accept garbage dimensions.
      var v = 0L
      var digits = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); digits += 1; pos += 1
        require(digits <= 9, "ppm: integer token too long")
      }
      v.toInt
    }
    val w = nextInt(); val h = nextInt(); val mv = nextInt()
    require(w > 0 && h > 0, s"ppm: bad dimensions ${w}x$h")
    require(mv > 0 && mv < 65536, s"ppm: bad maxval $mv")
    require(pos < bytes.length && isWs(bytes(pos)), "ppm: missing separator after maxval")
    pos += 1 // exactly ONE whitespace byte before the raster, per spec
    val n64 = w.toLong * h * 3 * (if (mv < 256) 1 else 2)
    require(n64 < Int.MaxValue, s"ppm: raster size $n64 overflows")
    val n = n64.toInt
    require(bytes.length - pos == n,
      s"ppm: raster is ${bytes.length - pos} bytes, expected $n")
    PpmImage(w, h, mv, java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
  }

  /** RIFF/WAV parser — a real chunk walker: validates the
    * RIFF/WAVE container and declared size, then iterates `(fourcc,
    * size-LE-u32, payload, pad-to-even)` chunks, skipping unknown ones
    * (LIST/INFO junk is normal in the wild), until both `fmt ` and
    * `data` are found. Two format codes decode: 1 (integer PCM,
    * 16-bit — samples as little-endian SIGNED 16-bit, the two
    * byte-order/sign mistakes a naive reader makes being exactly what
    * [[mmDecode]]'s signed content_sum pins) and 7 (G.711 μ-law,
    * 8-bit COMPANDED — expanded to 16-bit magnitudes with the
    * standard bias-132 formula, pinned by [[mmDecodeMulaw]]). */
  def parseWav(bytes: Array[Byte]): WavAudio = {
    def u32(p: Int): Long =
      (bytes(p) & 0xffL) | (bytes(p + 1) & 0xffL) << 8 |
        (bytes(p + 2) & 0xffL) << 16 | (bytes(p + 3) & 0xffL) << 24
    def u16(p: Int): Int = (bytes(p) & 0xff) | (bytes(p + 1) & 0xff) << 8
    def fourcc(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "not a RIFF/WAVE file")
    require(u32(4) == bytes.length - 8,
      s"wav: RIFF size ${u32(4)} != ${bytes.length - 8}")
    var pos = 12
    var fmt = -1; var rate = -1; var ch = -1; var bits = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      // Validate the declared size UNSIGNED before any Int truncation: a
      // size >= 2^31 truncated to a negative Int passes `body + size <=
      // length` and can move `pos` backward (size == -8 leaves it fixed),
      // hanging the executor on corrupt input instead of rejecting it.
      val size64 = u32(pos + 4)
      val body = pos + 8
      require(body.toLong + size64 <= bytes.length, s"wav: chunk '$id' overruns file")
      val size = size64.toInt
      if (id == "fmt ") {
        require(size >= 16, "wav: fmt chunk too short")
        fmt = u16(body)
        require(fmt == 1 || fmt == 7, s"wav: unsupported format code $fmt")
        ch = u16(body + 2); rate = u32(body + 4).toInt; bits = u16(body + 14)
        if (fmt == 1) require(bits == 16, s"wav: only 16-bit PCM supported, got $bits")
        else require(bits == 8, s"wav: mu-law must be 8-bit, got $bits")
      } else if (id == "data") {
        require(fmt != -1, "wav: data before fmt")
        if (fmt == 1) {
          require(size % 2 == 0, "wav: odd data size for 16-bit samples")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = (((bytes(body + 2 * i) & 0xff) |
              (bytes(body + 2 * i + 1) << 8))).toShort
            i += 1
          }
        } else {
          // G.711 mu-law expansion (the COMPANDED audio codec, r13):
          // complement, split sign/exponent/mantissa, and expand with
          // the standard bias-132 formula — ((132 + 8m) << e) - 132,
          // negated when the sign bit is set. Max magnitude 32124.
          samples = new Array[Short](size)
          var i = 0
          while (i < size) {
            val u = (~bytes(body + i)) & 0xff
            val mag = ((132 + ((u & 0x0f) << 3)) << ((u >> 4) & 7)) - 132
            samples(i) = (if ((u & 0x80) != 0) -mag else mag).toShort
            i += 1
          }
        }
      } // any other chunk (LIST, JUNK, ...) is skipped
      pos = body + size + (size & 1) // RIFF pads odd chunks to even
    }
    require(rate > 0 && samples != null, "wav: missing fmt or data chunk")
    WavAudio(rate, ch, bits, samples)
  }

  // ----- GIF: the second compressed codec — LZW, a different
  // ----- compression family from PNG's DEFLATE, pure JVM (r13) --------

  /** Decoded GIF frame: dims, palette bit depth, RGB bytes (palette
    * applied). */
  case class GifImage(width: Int, height: Int, palBits: Int, pixels: Array[Byte])

  def isGifMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** GIF87a/89a parser — the real format end to end, pure JVM: logical
    * screen descriptor, global/local color tables, extension-block
    * skipping (sub-block chains), and a full VARIABLE-WIDTH LZW decoder
    * (LSB-first bit packing, clear/end codes, dictionary growth with
    * code-width bumps at powers of two up to 12 bits, the
    * just-assigned-code `code == dictSize` case, and mid-stream CLEAR
    * resets). Interlaced images, out-of-palette indices, truncated
    * streams, and pixel counts that disagree with the descriptor are
    * rejected — the corrupt-lake-object contract shared with the other
    * parsers. First image frame only (animation frames would loop the
    * same block walk). */
  def parseGif(bytes: Array[Byte]): GifImage = {
    require(isGifMagic(bytes), "not a gif")
    def u16(p: Int): Int = (bytes(p) & 0xff) | (bytes(p + 1) & 0xff) << 8
    require(bytes.length >= 14, "gif: truncated header")
    var pos = 13
    val packed = bytes(10) & 0xff
    var palette: Array[Byte] = null
    var palBits = 0
    if ((packed & 0x80) != 0) {
      palBits = (packed & 7) + 1
      val len = 3 * (1 << palBits)
      require(pos + len <= bytes.length, "gif: global color table overruns file")
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => throw new IllegalArgumentException("gif: trailer before any image")
        case 0x21 => // extension: label + sub-block chain
          pos += 2
          while ({ require(pos < bytes.length, "gif: truncated extension")
                   val n = bytes(pos) & 0xff; pos += 1 + n; n != 0 }) ()
        case 0x2c =>
          require(pos + 10 <= bytes.length, "gif: truncated image descriptor")
          val w = u16(pos + 5); val h = u16(pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          require((ipacked & 0x40) == 0, "gif: interlace not supported")
          require(w > 0 && h > 0 && w.toLong * h * 3 < Int.MaxValue,
            s"gif: bad dimensions ${w}x$h")
          pos += 10
          if ((ipacked & 0x80) != 0) { // local color table overrides
            palBits = (ipacked & 7) + 1
            val len = 3 * (1 << palBits)
            require(pos + len <= bytes.length, "gif: local color table overruns file")
            palette = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
            pos += len
          }
          require(palette != null, "gif: no color table")
          require(pos < bytes.length, "gif: missing lzw code size")
          val minCode = bytes(pos) & 0xff; pos += 1
          require(minCode >= 2 && minCode <= 11, s"gif: bad lzw min code $minCode")
          val data = new java.io.ByteArrayOutputStream()
          while ({ require(pos < bytes.length, "gif: truncated image data")
                   val n = bytes(pos) & 0xff; pos += 1
                   require(pos + n <= bytes.length, "gif: image sub-block overruns file")
                   data.write(bytes, pos, n); pos += n; n != 0 }) ()
          // Allocation bound BEFORE decoding: an LZW code is >= 3 bits
          // and emits at most 4096 bytes (the longest dictionary
          // string), so the raster can't exceed ~10923x the data bytes
          // — corrupt u16 dims reject here instead of allocating
          // hundreds of MB (the PNG bound's twin, same fuzz finding).
          require(w.toLong * h <= data.size.toLong * 10924 + 16,
            s"gif: declared ${w}x$h exceeds any possible LZW expansion of ${data.size} bytes")
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          val nPal = 1 << palBits
          val out = new Array[Byte](w * h * 3)
          var j = 0
          while (j < idx.length) {
            val i = idx(j) & 0xff
            require(i < nPal, s"gif: pixel index $i outside $nPal-color palette")
            out(3 * j) = palette(3 * i); out(3 * j + 1) = palette(3 * i + 1)
            out(3 * j + 2) = palette(3 * i + 2)
            j += 1
          }
          return GifImage(w, h, palBits, out)
        case b => throw new IllegalArgumentException(f"gif: unknown block 0x$b%02x")
      }
    }
    throw new IllegalArgumentException("gif: no image block")
  }

  /** GIF-variant LZW: LSB-first codes of growing width (min+1 .. 12),
    * CLEAR resets the dictionary, END terminates; exactly `expected`
    * indices must decode. */
  private[operators] def lzwDecode(data: Array[Byte], minCode: Int,
                                   expected: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var got = 0
    var dictSize = end + 1
    var width = minCode + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8
    def nextCode(): Int = {
      require(bitPos + width <= totalBits, "gif: lzw stream truncated")
      var v = 0; var i = 0
      while (i < width) {
        v |= ((data((bitPos + i) >> 3) >> ((bitPos + i) & 7)) & 1) << i
        i += 1
      }
      bitPos += width; v
    }
    // walk code -> root via prefix links; returns the FIRST byte and
    // appends the string to out
    def emit(code: Int): Byte = {
      var sp = 0; var c = code
      while (c >= clear) { // dictionary entry (clear/end never stored)
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      val first = c.toByte
      require(got + sp + 1 <= expected, "gif: lzw decodes more pixels than the descriptor")
      out(got) = first; got += 1
      while (sp > 0) { sp -= 1; out(got) = stack(sp); got += 1 }
      first
    }
    var done = false
    while (!done) {
      val code = nextCode()
      if (code == clear) { dictSize = end + 1; width = minCode + 1; prev = -1 }
      else if (code == end) done = true
      else if (prev == -1) {
        require(code < clear, s"gif: first code after clear must be a literal, got $code")
        emit(code); prev = code
      } else {
        require(code <= dictSize, s"gif: code $code beyond dictionary $dictSize")
        if (code == dictSize) {
          // the KwKwK case: the code being defined right now —
          // string(prev) + first(prev); add the entry, then emit it
          require(dictSize < 4096, "gif: dictionary overflow")
          var c = prev
          while (c >= clear) c = prefix(c)
          prefix(dictSize) = prev; suffix(dictSize) = c.toByte
          dictSize += 1
          emit(code)
        } else {
          // common case: emit first, then add (prev, first-of-emitted)
          val first = emit(code)
          if (dictSize < 4096) {
            prefix(dictSize) = prev; suffix(dictSize) = first
            dictSize += 1
          }
        }
        if (dictSize == (1 << width) && width < 12) width += 1
        prev = code
      }
      if (got == expected && !done) {
        // next code must be END (possibly after a benign CLEAR)
        val c2 = nextCode()
        require(c2 == end || c2 == clear, "gif: data after full raster")
        done = true
      }
    }
    require(got == expected, s"gif: decoded $got of $expected pixels")
    out
  }

  // ----- JPEG (baseline, grayscale): the third compressed codec —
  // ----- entropy coding (canonical Huffman + bit unstuffing + DC
  // ----- prediction), a third family after DEFLATE and LZW (r13) ----

  /** One frame component of a decoded JPEG: its SOF0 id, sampling
    * factors, quant-table id, and DEQUANTIZED coefficient blocks in
    * component raster order (zigzag layout, DC prediction applied). */
  case class JpegComponent(id: Int, hSamp: Int, vSamp: Int, qId: Int,
                           blocks: Array[Array[Int]])

  /** Decoded baseline JPEG: dims, the DEQUANTIZED coefficient blocks of
    * the FIRST (gray/luma) component (zigzag order, DC prediction
    * applied — the lossless layer the oracle pins), the IDCT'd
    * gray/luma pixels cropped to width x height (the numeric layer
    * JpegSpec pins), and — r14 color support — every component's
    * blocks plus the upsampled BT.601 RGB raster (empty for
    * grayscale). Defaults keep the r13 grayscale call sites source-
    * compatible. */
  case class JpegImage(width: Int, height: Int, blocks: Array[Array[Int]],
                       pixels: Array[Byte],
                       components: Seq[JpegComponent] = Nil,
                       rgb: Array[Byte] = Array.empty)

  def isJpegMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  /** Zigzag index order (public JPEG constant): zigzag position k lives
    * at natural position ZigzagNat(k) = row*8 + col. */
  private val ZigzagNat: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    // walk anti-diagonals, alternating direction
    for (s <- 0 until 15) {
      val range = if (s % 2 == 0) (math.min(s, 7) to math.max(0, s - 7) by -1)
                  else (math.max(0, s - 7) to math.min(s, 7))
      for (r <- range) { out(k) = r * 8 + (s - r); k += 1 }
    }
    out
  }

  /** Annex K luminance Huffman tables (public JPEG standard constants).
    * The decoder never assumes them — it builds from the file's own
    * DHT — but the writer emits the standard ones. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.range(0, 12)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Annex K chrominance Huffman tables (public JPEG standard
    * constants, K.3.3.2) — emitted by [[synthJpegColor]] as DHT ids 1
    * so the color path exercises per-component table ROUTING: a decoder
    * that mixes up table ids desynchronizes the chroma scan
    * immediately. */
  private val DcBitsC = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValsC = Array.range(0, 12)
  private val AcBitsC = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcValsC: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes from (bits-per-length, values) — JPEG's
    * own construction: ascending code within a length, shifted left at
    * each length boundary. Returns symbol → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) { out += vals(vi) -> ((code, len)); code += 1; vi += 1; i += 1 }
      code <<= 1
    }
    out.result()
  }

  /** Baseline JPEG parser — the real marker + entropy grammar, pure
    * JVM: SOI, APPn/COM skip, DQT (8-bit tables, ids 0-3), SOF0 (8-bit
    * precision, ONE grayscale component or THREE YCbCr components with
    * 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 sampling — r14; SOF2 progressive et
    * al. reject), DHT (canonical Huffman built from the FILE's tables,
    * never assumed — classes 0/1, ids 0-3), DRI restart intervals,
    * SOS, then the MCU-interleaved entropy-coded scan: bitwise
    * canonical-Huffman decode with 0xFF00 byte unstuffing, RSTn
    * markers (byte realign + per-component DC prediction reset),
    * per-component DC category/EXTEND prediction, AC (run,size)
    * symbols with ZRL and EOB, per-component dequantization,
    * de-zigzag, a double-precision IDCT per plane with level shift +
    * clamp, chroma upsampling by replication, and BT.601 YCbCr→RGB.
    * Truncated scans, unknown Huffman codes, coefficient overruns past
    * index 63, missing segments, and UNDERSIZED SEGMENT BODIES (r14
    * ADVICE: every marker validates its minimum body length before any
    * fixed-offset read — a declared len of 2 with a fixed-layout body
    * previously escaped as ArrayIndexOutOfBounds) all reject — the
    * corrupt-lake contract of the other parsers. */
  def parseJpeg(bytes: Array[Byte]): JpegImage = {
    require(isJpegMagic(bytes), "not a jpeg")
    var pos = 2
    def u16(p: Int): Int = (bytes(p) & 0xff) << 8 | (bytes(p + 1) & 0xff)
    val qts = new Array[Array[Int]](4)
    var w = -1; var h = -1
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    val dcTabs = new Array[Map[(Int, Int), Int]](4) // (len, code) -> symbol
    val acTabs = new Array[Map[(Int, Int), Int]](4)
    var scanTabs: Array[(Int, Int)] = null // per component: (DC id, AC id)
    var dri = 0
    var scanAt = -1
    while (scanAt < 0) {
      require(pos + 4 <= bytes.length, "jpeg: truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff, f"jpeg: expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      require(len >= 2, f"jpeg: segment 0x$m%02x declares impossible length $len")
      require(pos + 2 + len <= bytes.length, f"jpeg: segment 0x$m%02x overruns file")
      val body = pos + 4
      val end = pos + 2 + len
      m match {
        case 0xdb => // DQT (8-bit precision only), several tables per segment
          var p = body
          while (p < end) {
            require(p + 65 <= end, "jpeg: truncated DQT")
            require((bytes(p) & 0xf0) == 0, "jpeg: 16-bit quant tables unsupported")
            val tq = bytes(p) & 0x0f
            require(tq <= 3, "jpeg: quant table id out of range")
            qts(tq) = (1 to 64).map(i => bytes(p + i) & 0xff).toArray
            p += 65
          }
        case 0xc0 => // SOF0 baseline
          require(len >= 10, "jpeg: truncated SOF0")
          require((bytes(body) & 0xff) == 8, "jpeg: only 8-bit precision")
          h = u16(body + 1); w = u16(body + 3)
          // x4 bound: the padded planes + the 3-byte RGB raster must all
          // index with Int arithmetic
          require(w > 0 && h > 0 && w.toLong * h * 4 < Int.MaxValue, s"jpeg: bad dims ${w}x$h")
          val nc = bytes(body + 5) & 0xff
          require(nc == 1 || nc == 3, s"jpeg: $nc components unsupported (1=gray, 3=YCbCr)")
          require(len >= 8 + 3 * nc, "jpeg: truncated SOF0 component specs")
          compIds = new Array[Int](nc); compH = new Array[Int](nc)
          compV = new Array[Int](nc); compQ = new Array[Int](nc)
          var i = 0
          while (i < nc) {
            val p = body + 6 + 3 * i
            compIds(i) = bytes(p) & 0xff
            compH(i) = (bytes(p + 1) & 0xf0) >> 4; compV(i) = bytes(p + 1) & 0x0f
            compQ(i) = bytes(p + 2) & 0xff
            require(compQ(i) <= 3, "jpeg: quant table id out of range")
            i += 1
          }
          if (nc == 1)
            require(compH(0) == 1 && compV(0) == 1, "jpeg: grayscale subsampling unsupported")
          else {
            require(compH(1) == 1 && compV(1) == 1 && compH(2) == 1 && compV(2) == 1,
              "jpeg: chroma sampling factors must be 1x1")
            require(compH(0) >= 1 && compH(0) <= 2 && compV(0) >= 1 && compV(0) <= 2,
              "jpeg: luma sampling beyond 2x2 unsupported")
          }
        case 0xc4 => // DHT, possibly several tables in one segment
          var p = body
          while (p < end) {
            require(p + 17 <= end, "jpeg: truncated DHT") // class/id + 16 counts
            val tc = (bytes(p) & 0xf0) >> 4; val th = bytes(p) & 0x0f
            require(tc <= 1, "jpeg: bad DHT table class")
            require(th <= 3, "jpeg: DHT table id out of range")
            val bits = (1 to 16).map(i => bytes(p + i) & 0xff).toArray
            val n = bits.sum
            require(p + 17 + n <= end, "jpeg: truncated DHT")
            val vals = (0 until n).map(i => bytes(p + 17 + i) & 0xff).toArray
            val dec = canonicalCodes(bits, vals).map { case (sym, (code, l)) => (l, code) -> sym }
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
            p += 17 + n
          }
        case 0xdd => // DRI restart interval
          require(len >= 4, "jpeg: truncated DRI")
          dri = u16(body)
        case 0xda => // SOS
          require(compIds != null, "jpeg: SOS before SOF0")
          require(len >= 3, "jpeg: truncated SOS")
          val ns = bytes(body) & 0xff
          require(ns == compIds.length, "jpeg: scan must cover all frame components")
          require(len >= 6 + 2 * ns, "jpeg: truncated SOS component specs")
          scanTabs = Array.tabulate(ns) { i =>
            val p = body + 1 + 2 * i
            require((bytes(p) & 0xff) == compIds(i), "jpeg: scan component order must match SOF0")
            val t = bytes(p + 1) & 0xff
            val td = (t & 0xf0) >> 4; val ta = t & 0x0f
            require(td <= 3 && ta <= 3, "jpeg: scan huffman table id out of range")
            (td, ta)
          }
          val sp = body + 1 + 2 * ns
          require((bytes(sp) & 0xff) == 0 && (bytes(sp + 1) & 0xff) == 63 &&
            (bytes(sp + 2) & 0xff) == 0, "jpeg: non-baseline spectral selection")
          scanAt = end
        case x if x >= 0xe0 && x <= 0xef => () // APPn
        case 0xfe => () // COM
        case 0xc2 => throw new IllegalArgumentException("jpeg: progressive (SOF2) unsupported")
        case x => throw new IllegalArgumentException(f"jpeg: unsupported marker 0x$x%02x")
      }
      pos = end
    }
    val nc = compIds.length
    require(w > 0 && (0 until nc).forall(i => qts(compQ(i)) != null) &&
      (0 until nc).forall(i => dcTabs(scanTabs(i)._1) != null && acTabs(scanTabs(i)._2) != null),
      "jpeg: missing DQT/SOF0/DHT before SOS")
    // entropy-coded scan: bit reader with 0xFF00 unstuffing
    var bp = scanAt; var bitBuf = 0; var bitCnt = 0
    def nextBit(): Int = {
      if (bitCnt == 0) {
        require(bp < bytes.length, "jpeg: scan truncated")
        val b = bytes(bp) & 0xff; bp += 1
        if (b == 0xff) {
          require(bp < bytes.length && bytes(bp) == 0, "jpeg: unexpected marker in scan")
          bp += 1
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def decodeSym(codes: Map[(Int, Int), Int]): Int = {
      var code = 0; var len = 0
      while (len <= 16) {
        code = code << 1 | nextBit(); len += 1
        codes.get((len, code)) match {
          case Some(s) => return s
          case None => ()
        }
      }
      throw new IllegalArgumentException("jpeg: invalid huffman code in scan")
    }
    def extend(v: Int, s: Int): Int = if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    def receive(s: Int): Int = { var v = 0; var i = 0; while (i < s) { v = v << 1 | nextBit(); i += 1 }; v }
    // MCU grid: for the single-component scan the MCU is one block and
    // this degenerates to the r13 ceil(w/8) x ceil(h/8) raster; for the
    // interleaved 3-component scan each MCU carries Hc x Vc blocks per
    // component and the component grids pad to the MCU boundary.
    val maxH = compH.max; val maxV = compV.max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val compBw = Array.tabulate(nc)(i => mcusX * compH(i))
    val compBh = Array.tabulate(nc)(i => mcusY * compV(i))
    (0 until nc).foreach { i =>
      require(compBw(i).toLong * 8 * compBh(i) * 8 <= Int.MaxValue,
        "jpeg: padded plane exceeds array bounds")
    }
    val compBlocks = Array.tabulate(nc)(i => new Array[Array[Int]](compBw(i) * compBh(i)))
    val preds = new Array[Int](nc)
    def decodeBlock(ci: Int): Array[Int] = {
      val qt = qts(compQ(ci))
      val zz = new Array[Int](64)
      val s = decodeSym(dcTabs(scanTabs(ci)._1))
      require(s <= 11, s"jpeg: DC category $s out of range")
      preds(ci) += extend(receive(s), s)
      zz(0) = preds(ci) * qt(0)
      var k = 1
      var eob = false
      while (!eob && k < 64) {
        val rs = decodeSym(acTabs(scanTabs(ci)._2))
        val run = rs >> 4; val size = rs & 0x0f
        if (size == 0) {
          if (rs == 0x00) eob = true // EOB
          else if (rs == 0xf0) { k += 16; require(k <= 64, "jpeg: ZRL past block end") } // ZRL
          else throw new IllegalArgumentException(f"jpeg: bad AC symbol 0x$rs%02x")
        } else {
          k += run
          require(k < 64, "jpeg: AC coefficient past block end")
          zz(k) = extend(receive(size), size) * qt(k)
          k += 1
        }
      }
      zz
    }
    val nMcus = mcusX * mcusY
    var rstN = 0
    var mcu = 0
    while (mcu < nMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        // restart boundary: discard the pad bits to the byte boundary,
        // consume RSTn (cycling 0xd0..0xd7), reset every component's
        // DC predictor — the spec's resynchronization contract
        bitCnt = 0
        require(bp + 2 <= bytes.length && (bytes(bp) & 0xff) == 0xff &&
          (bytes(bp + 1) & 0xff) == (0xd0 + rstN % 8), "jpeg: missing restart marker")
        bp += 2; rstN += 1
        java.util.Arrays.fill(preds, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < nc) {
        var v = 0
        while (v < compV(ci)) {
          var hh = 0
          while (hh < compH(ci)) {
            compBlocks(ci)((my * compV(ci) + v) * compBw(ci) + (mx * compH(ci) + hh)) =
              decodeBlock(ci)
            hh += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // IDCT per component plane (double math, deterministic in the JVM;
    // JpegSpec pins the numerics — the ORACLE pins only the lossless
    // layers), crop the first plane to w x h, then for color upsample
    // chroma by replication and convert BT.601 YCbCr -> RGB
    val planes = Array.tabulate(nc)(i => idctPlane(compBlocks(i), compBw(i), compBh(i)))
    val pixels = new Array[Byte](w * h)
    val pw0 = compBw(0) * 8
    var y = 0
    while (y < h) {
      System.arraycopy(planes(0), y * pw0, pixels, y * w, w)
      y += 1
    }
    val rgb =
      if (nc == 1) Array.empty[Byte]
      else {
        val out = new Array[Byte](w * h * 3)
        val pwCb = compBw(1) * 8; val pwCr = compBw(2) * 8
        var yy = 0
        while (yy < h) {
          val cyB = yy * compV(1) / maxV; val cyR = yy * compV(2) / maxV
          var x = 0
          while (x < w) {
            val lum = planes(0)(yy * pw0 + x) & 0xff
            val cb = (planes(1)(cyB * pwCb + x * compH(1) / maxH) & 0xff) - 128
            val cr = (planes(2)(cyR * pwCr + x * compH(2) / maxH) & 0xff) - 128
            val o = (yy * w + x) * 3
            out(o) = clamp255(math.round(lum + 1.402 * cr).toInt)
            out(o + 1) = clamp255(math.round(lum - 0.344136 * cb - 0.714136 * cr).toInt)
            out(o + 2) = clamp255(math.round(lum + 1.772 * cb).toInt)
            x += 1
          }
          yy += 1
        }
        out
      }
    val comps = (0 until nc).map(i =>
      JpegComponent(compIds(i), compH(i), compV(i), compQ(i), compBlocks(i)))
    JpegImage(w, h, compBlocks(0), pixels, comps, rgb)
  }

  private def clamp255(v: Int): Byte = math.max(0, math.min(255, v)).toByte

  /** IDCT of a component's blocks into its PADDED plane (bw*8 x bh*8
    * bytes, level-shifted and clamped) — callers crop/sample. */
  private def idctPlane(blocks: Array[Array[Int]], bw: Int, bh: Int): Array[Byte] = {
    val pw = bw * 8
    val out = new Array[Byte](pw * bh * 8)
    val cosT = Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
    var bi = 0
    while (bi < blocks.length) {
      val zz = blocks(bi)
      val nat = new Array[Int](64)
      var k = 0
      while (k < 64) { nat(ZigzagNat(k)) = zz(k); k += 1 }
      val bx = (bi % bw) * 8; val by = (bi / bw) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val cu = if (u == 0) 0.7071067811865476 else 1.0
              val cv = if (v == 0) 0.7071067811865476 else 1.0
              sum += cu * cv * nat(u * 8 + v) * cosT(y)(u) * cosT(x)(v)
              v += 1
            }
            u += 1
          }
          out((by + y) * pw + (bx + x)) = clamp255(math.round(sum / 4.0 + 128.0).toInt)
          x += 1
        }
        y += 1
      }
      bi += 1
    }
    out
  }

  /** Deterministic baseline-JPEG writer (grayscale, one 8-row band of
    * `nBlocks` blocks, all-ones quant table so coefficients survive
    * quantization exactly): block b of doc d carries DC
    * `(d*7 + b*13) % 61 - 30` (difference-coded across blocks, the DC
    * prediction chain) and two ACs — zigzag 1: `(d*11 + b*17) % 19 - 9`
    * and zigzag 19: `(d*5 + b*23) % 15 - 7` — the 17-zero gap forcing a
    * ZRL (15,0) symbol whenever zigzag-1 is nonzero, and an 18-gap ZRL
    * when it rounds to zero, so both run paths appear across ids.
    * Standard Annex K Huffman tables ride in DHT segments; scan bytes
    * are 0xFF-stuffed; the tail byte pads with 1s. */
  def synthJpeg(docId: Long, nBlocks: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      payload.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    m(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0 JFIF
    m(0xdb, 0 +: Array.fill(64)(1)) // DQT id 0, all ones
    val w = 8 * nBlocks
    m(0xc0, Array(8, 0, 8, (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0)) // SOF0 8 x w, gray
    m(0xc4, 0x00 +: (DcBits ++ DcVals)) // DHT DC0
    m(0xc4, 0x10 +: (AcBits ++ AcVals)) // DHT AC0
    m(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcEnc = canonicalCodes(DcBits, DcVals)
    val acEnc = canonicalCodes(AcBits, AcVals)
    val scan = new java.io.ByteArrayOutputStream()
    val bw = new JpegBitWriter(scan)
    var pred = 0
    var b = 0
    while (b < nBlocks) {
      val dc = ((docId * 7 + b * 13) % 61).toInt - 30
      val v1 = ((docId * 11 + b * 17) % 19).toInt - 9
      val v19 = ((docId * 5 + b * 23) % 15).toInt - 7
      putJpegBlock(bw, dcEnc, acEnc, dc - pred, Seq(1 -> v1, 19 -> v19))
      pred = dc
      b += 1
    }
    bw.flushOnes() // pad the tail byte with 1s
    scan.toByteArray.foreach(x => out.write(x & 0xff))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Entropy-scan bit writer shared by the JPEG synths: MSB-first bit
    * emission with 0xFF byte stuffing and a 1-padded flush (used at
    * restart boundaries and at scan end — a padded 0xFF is stuffed so
    * the reader's unstuffing sees it consistently). */
  private final class JpegBitWriter(scan: java.io.ByteArrayOutputStream) {
    private var bitBuf = 0; private var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = bitBuf << 1 | ((v >> i) & 1); bitCnt += 1
        if (bitCnt == 8) {
          scan.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) scan.write(0) // byte stuffing
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def putCoded(enc: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = enc(sym); putBits(c, l)
    }
    def putMagnitude(v: Int, s: Int): Unit =
      if (s > 0) putBits(if (v >= 0) v else v + (1 << s) - 1, s)
    def flushOnes(): Unit =
      if (bitCnt > 0) {
        bitBuf = bitBuf << (8 - bitCnt) | ((1 << (8 - bitCnt)) - 1)
        scan.write(bitBuf & 0xff)
        if ((bitBuf & 0xff) == 0xff) scan.write(0)
        bitBuf = 0; bitCnt = 0
      }
  }

  private def jpegCategory(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode one block: DC difference (category + magnitude), then the
    * given (zigzag index -> value) ACs with honest run lengths over the
    * zeros, ZRL splitting for gaps > 15, and a closing EOB. */
  private def putJpegBlock(bw: JpegBitWriter, dcEnc: Map[Int, (Int, Int)],
                           acEnc: Map[Int, (Int, Int)], dcDiff: Int,
                           acs: Seq[(Int, Int)]): Unit = {
    val s = jpegCategory(dcDiff)
    bw.putCoded(dcEnc, s); bw.putMagnitude(dcDiff, s)
    var lastNz = 0
    for ((k, v) <- acs if v != 0) {
      var run = k - lastNz - 1
      while (run > 15) { bw.putCoded(acEnc, 0xf0); run -= 16 } // ZRL
      bw.putCoded(acEnc, run << 4 | jpegCategory(v)); bw.putMagnitude(v, jpegCategory(v))
      lastNz = k
    }
    bw.putCoded(acEnc, 0x00) // EOB (blocks never fill to 63)
  }

  /** Deterministic baseline COLOR JPEG writer (r14): 4:2:0 YCbCr, one
    * row of `nMcus` 16x16 MCUs (4 luma + 1 Cb + 1 Cr blocks per MCU).
    * LUMA quant table all-ONES (id 0), CHROMA all-TWOS (id 1) — the
    * dequantized chroma sums are exactly 2x the raw coefficients, so a
    * decoder routing the wrong quant table is off by a visible factor;
    * Annex K LUMA Huffman tables as DHT ids 0, Annex K CHROMA tables as
    * ids 1 — routing the wrong Huffman table desynchronizes the scan
    * outright; and a DRI restart interval of 2 MCUs with cycling
    * RST0..7 markers, byte-aligned 1-padding, and per-restart DC
    * prediction resets. Luma block b (sequential across MCUs in scan
    * order): DC `(d*7+b*13)%61-30`, zigzag-1 `(d*11+b*17)%19-9`,
    * zigzag-19 `(d*5+b*23)%15-7` (single-ZRL path); Cb block m: DC
    * `(d*3+m*29)%41-20`, zigzag-4 `(d*13+m*7)%17-8`; Cr block m: DC
    * `(d*17+m*11)%37-18`, zigzag-33 `(d*19+m*23)%13-6` — a 32-zero gap
    * forcing DOUBLE ZRL on the chroma table. */
  def synthJpegColor(docId: Long, nMcus: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      payload.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    m(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0 JFIF
    m(0xdb, (0 +: Array.fill(64)(1)) ++ (1 +: Array.fill(64)(2))) // DQT ids 0 + 1
    val w = 16 * nMcus
    m(0xc0, Array(8, 0, 16, (w >> 8) & 0xff, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) // SOF0: 16 x w, YCbCr 4:2:0
    m(0xc4, 0x00 +: (DcBits ++ DcVals)) // DHT DC0 (luma)
    m(0xc4, 0x10 +: (AcBits ++ AcVals)) // DHT AC0 (luma)
    m(0xc4, 0x01 +: (DcBitsC ++ DcValsC)) // DHT DC1 (chroma)
    m(0xc4, 0x11 +: (AcBitsC ++ AcValsC)) // DHT AC1 (chroma)
    m(0xdd, Array(0, 2)) // DRI: restart every 2 MCUs
    m(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    val dcY = canonicalCodes(DcBits, DcVals); val acY = canonicalCodes(AcBits, AcVals)
    val dcC = canonicalCodes(DcBitsC, DcValsC); val acC = canonicalCodes(AcBitsC, AcValsC)
    val scan = new java.io.ByteArrayOutputStream()
    val bw = new JpegBitWriter(scan)
    val preds = new Array[Int](3)
    var mcu = 0
    while (mcu < nMcus) {
      if (mcu > 0 && mcu % 2 == 0) { // restart boundary
        bw.flushOnes()
        scan.write(0xff); scan.write(0xd0 + (mcu / 2 - 1) % 8)
        java.util.Arrays.fill(preds, 0)
      }
      var i = 0
      while (i < 4) { // the MCU's 2x2 luma blocks, indexed sequentially
        val b = mcu * 4 + i
        val dc = ((docId * 7 + b * 13) % 61).toInt - 30
        val v1 = ((docId * 11 + b * 17) % 19).toInt - 9
        val v19 = ((docId * 5 + b * 23) % 15).toInt - 7
        putJpegBlock(bw, dcY, acY, dc - preds(0), Seq(1 -> v1, 19 -> v19))
        preds(0) = dc
        i += 1
      }
      val dcb = ((docId * 3 + mcu * 29) % 41).toInt - 20
      val v4 = ((docId * 13 + mcu * 7) % 17).toInt - 8
      putJpegBlock(bw, dcC, acC, dcb - preds(1), Seq(4 -> v4))
      preds(1) = dcb
      val dcr = ((docId * 17 + mcu * 11) % 37).toInt - 18
      val v33 = ((docId * 19 + mcu * 23) % 13).toInt - 6
      putJpegBlock(bw, dcC, acC, dcr - preds(2), Seq(33 -> v33))
      preds(2) = dcr
      mcu += 1
    }
    bw.flushOnes()
    scan.toByteArray.foreach(x => out.write(x & 0xff))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  case class DecodedJpeg(doc_id: Long, width: Long, height: Long, n_blocks: Long,
                         dc_sum: Long, ac_sum: Long)

  /** THIRD COMPRESSED CODEC, ORACLED ON ITS LOSSLESS LAYERS (r13): per
    * doc, synthesize a baseline grayscale JPEG on the executors and run
    * the full [[parseJpeg]] read path. The oracle pins everything
    * DETERMINISTIC BY FORMAT: dims from SOF0, block count, and the
    * dequantized coefficient sums — which transit the canonical-Huffman
    * build from the file's DHT, bitwise decode with 0xFF unstuffing,
    * DC category/EXTEND prediction across the whole scan, AC
    * (run,size)/ZRL/EOB handling, and dequantization. A single mis-read
    * bit desynchronizes the entire remaining scan, so dc_sum/ac_sum are
    * maximally sensitive. The IDCT (the only lossy/numeric stage) is
    * pinned by JpegSpec against closed-form blocks instead — a float
    * pipeline has no cross-engine bit-exact oracle, and pretending
    * otherwise would just pin libm versions. */
  def mmDecodeJpeg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Tables.spread (r14) — same single-split pin as mmDecodeJpegColor
    val ids = Tables.spread(spark,
      Tables.documents(spark, sfDir).select(col("doc_id")), col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val n = (2 + id % 5).toInt
        val img = parseJpeg(synthJpeg(id, n))
        var dc = 0L; var ac = 0L
        img.blocks.foreach { zz =>
          dc += zz(0)
          var k = 1
          while (k < 64) { ac += zz(k); k += 1 }
        }
        DecodedJpeg(id, img.width.toLong, img.height.toLong,
          img.blocks.length.toLong, dc, ac)
      }
    }.toDF().orderBy("doc_id")
  }

  private val mmDecodeJpegSql: String =
    """SELECT doc_id,
      |  (8 * (2 + doc_id % 5))::BIGINT AS width,
      |  8::BIGINT AS height,
      |  (2 + doc_id % 5)::BIGINT AS n_blocks,
      |  list_sum(list_transform(generate_series(0, (2 + doc_id % 5)::INT - 1),
      |    b -> (doc_id * 7 + b * 13) % 61 - 30))::BIGINT AS dc_sum,
      |  (list_sum(list_transform(generate_series(0, (2 + doc_id % 5)::INT - 1),
      |     b -> (doc_id * 11 + b * 17) % 19 - 9))
      |   + list_sum(list_transform(generate_series(0, (2 + doc_id % 5)::INT - 1),
      |     b -> (doc_id * 5 + b * 23) % 15 - 7)))::BIGINT AS ac_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  case class DecodedJpegColor(doc_id: Long, width: Long, height: Long,
                              n_blocks_y: Long, dc_y: Long, ac_y: Long,
                              dc_cb: Long, ac_cb: Long, dc_cr: Long, ac_cr: Long)

  /** COLOR JPEG decode, oracled on its lossless layers (r14, verdict
    * item 4): per doc, synthesize a 4:2:0 YCbCr baseline JPEG
    * ([[synthJpegColor]]) on the executors and run the full
    * [[parseJpeg]] read path. The per-CHANNEL dequantized coefficient
    * sums transit everything the grayscale entry pins PLUS the color
    * machinery: per-component quant/Huffman table ROUTING (ids 0 vs 1,
    * wrong table = 2x-off sums or a desynchronized scan), the
    * interleaved 4:2:0 MCU block order, per-component DC prediction
    * chains, and DRI/RSTn restart handling (byte realignment +
    * predictor resets — a decoder that misses one restart marker
    * desynchronizes every later MCU). The IDCT/upsample/YCbCr float
    * tier is pinned in JpegSpec, as for grayscale. */
  def mmDecodeJpegColor(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Tables.spread (r14): synth+decode is the whole cost and ran on the
    // fixture's one split (twice, counting the final sort's sampling
    // pass — StageProf: two ~1.1 s single-task stages of a 2.5 s wall)
    val ids = Tables.spread(spark,
      Tables.documents(spark, sfDir).select(col("doc_id")), col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val n = (1 + id % 4).toInt
        val img = parseJpeg(synthJpegColor(id, n))
        def sums(blocks: Array[Array[Int]]): (Long, Long) = {
          var dc = 0L; var ac = 0L
          blocks.foreach { zz =>
            dc += zz(0)
            var k = 1
            while (k < 64) { ac += zz(k); k += 1 }
          }
          (dc, ac)
        }
        val (dy, ay) = sums(img.components(0).blocks)
        val (dcb, acb) = sums(img.components(1).blocks)
        val (dcr, acr) = sums(img.components(2).blocks)
        DecodedJpegColor(id, img.width.toLong, img.height.toLong,
          img.components(0).blocks.length.toLong, dy, ay, dcb, acb, dcr, acr)
      }
    }.toDF().orderBy("doc_id")
  }

  // chroma sums are 2x the raw coefficient formulas: the all-twos
  // chroma quant table (id 1) scales every dequantized value
  private val mmDecodeJpegColorSql: String =
    """SELECT doc_id,
      |  (16 * (1 + doc_id % 4))::BIGINT AS width,
      |  16::BIGINT AS height,
      |  (4 * (1 + doc_id % 4))::BIGINT AS n_blocks_y,
      |  list_sum(list_transform(generate_series(0, 4 * (1 + doc_id % 4)::INT - 1),
      |    b -> (doc_id * 7 + b * 13) % 61 - 30))::BIGINT AS dc_y,
      |  (list_sum(list_transform(generate_series(0, 4 * (1 + doc_id % 4)::INT - 1),
      |     b -> (doc_id * 11 + b * 17) % 19 - 9))
      |   + list_sum(list_transform(generate_series(0, 4 * (1 + doc_id % 4)::INT - 1),
      |     b -> (doc_id * 5 + b * 23) % 15 - 7)))::BIGINT AS ac_y,
      |  (2 * list_sum(list_transform(generate_series(0, (1 + doc_id % 4)::INT - 1),
      |    m -> (doc_id * 3 + m * 29) % 41 - 20)))::BIGINT AS dc_cb,
      |  (2 * list_sum(list_transform(generate_series(0, (1 + doc_id % 4)::INT - 1),
      |    m -> (doc_id * 13 + m * 7) % 17 - 8)))::BIGINT AS ac_cb,
      |  (2 * list_sum(list_transform(generate_series(0, (1 + doc_id % 4)::INT - 1),
      |    m -> (doc_id * 17 + m * 11) % 37 - 18)))::BIGINT AS dc_cr,
      |  (2 * list_sum(list_transform(generate_series(0, (1 + doc_id % 4)::INT - 1),
      |    m -> (doc_id * 19 + m * 23) % 13 - 6)))::BIGINT AS ac_cr
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Fallback feature extractor for bytes in no known format: hashes
    * byte windows into an 8-dim vector (deterministic, shape-compatible
    * with the real decoders' output). */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { f(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    f
  }

  /** Magic-byte dispatch to the real decoders: 8-dim features from
    * decoded CONTENT (dims/rate + per-channel sums), not raw bytes.
    * PPM → [w, h, maxval, ΣR, ΣG, ΣB, n_pixels, 0];
    * PNG → [w, h, bit_depth, color_type, Σpixels, n_pixels, 0, 0];
    * GIF → [w, h, pal_bits, Σpixels, n_pixels, 0, 0, 0];
    * WAV → [rate, channels, bits, n_samples, Σ|s|, Σs, 0, 0];
    * anything else → [[stubDecode]].
    *
    * Corrupt-input policy: a blob that merely STARTS with a known magic
    * (text beginning "P6", a truncated RIFF) must not fail the whole
    * Spark job — the parsers' rejections are caught here and the row
    * degrades to the [[stubDecode]] byte-hash features, so one bad lake
    * object costs one garbage feature vector, not the pipeline. Callers
    * that want hard-fail semantics (the oracled [[mmDecode]] over
    * self-synthesized bytes) call the parsers directly. */
  def extractFeatures(bytes: Array[Byte]): Array[Float] =
    try {
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
        val img = parsePpm(bytes)
        var r = 0L; var g = 0L; var b = 0L
        var i = 0
        while (i + 2 < img.pixels.length) {
          r += img.pixels(i) & 0xff; g += img.pixels(i + 1) & 0xff
          b += img.pixels(i + 2) & 0xff; i += 3
        }
        Array(img.width.toFloat, img.height.toFloat, img.maxval.toFloat,
          r.toFloat, g.toFloat, b.toFloat, (img.width * img.height).toFloat, 0f)
      } else if (bytes.length >= 8 && isPngMagic(bytes)) {
        val img = parsePng(bytes)
        var s = 0L
        img.pixels.foreach(b => s += (b & 0xff))
        Array(img.width.toFloat, img.height.toFloat, img.bitDepth.toFloat,
          img.colorType.toFloat, s.toFloat, (img.width * img.height).toFloat, 0f, 0f)
      } else if (bytes.length >= 2 && isJpegMagic(bytes)) {
        val img = parseJpeg(bytes)
        var dc = 0L; var ac = 0L; var ps = 0L
        img.blocks.foreach { zz =>
          dc += zz(0); var k = 1; while (k < 64) { ac += zz(k); k += 1 }
        }
        img.pixels.foreach(p => ps += (p & 0xff))
        Array(img.width.toFloat, img.height.toFloat, img.blocks.length.toFloat,
          dc.toFloat, ac.toFloat, ps.toFloat, 0f, 0f)
      } else if (bytes.length >= 6 && isGifMagic(bytes)) {
        val img = parseGif(bytes)
        var s = 0L
        img.pixels.foreach(b => s += (b & 0xff))
        Array(img.width.toFloat, img.height.toFloat, img.palBits.toFloat,
          s.toFloat, (img.width.toLong * img.height).toFloat, 0f, 0f, 0f)
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F') {
        val a = parseWav(bytes)
        var abs = 0L; var sum = 0L
        a.samples.foreach { s => abs += math.abs(s.toLong); sum += s.toLong }
        Array(a.sampleRate.toFloat, a.nChannels.toFloat, a.bitsPerSample.toFloat,
          a.samples.length.toFloat, abs.toFloat, sum.toFloat, 0f, 0f)
      } else stubDecode(bytes)
    } catch {
      // NonFatal, not IllegalArgumentException alone (r14 ADVICE): the
      // degrade-to-stub contract must hold for ANY parser escape — a
      // crafted segment length can surface as ArrayIndexOutOfBounds or
      // NegativeArraySize rather than the parsers' own requires, and
      // one corrupt lake object must never kill the Spark job.
      case scala.util.control.NonFatal(_) => stubDecode(bytes)
    }

  // ----- PNG: the first COMPRESSED codec in the dispatch (r12 verdict
  // ----- item 4) — zlib inflate via java.util.zip, pure JVM ------------

  /** Decoded PNG: IHDR fields + fully-defiltered raw sample bytes
    * (RGB triplets for color type 2, single bytes for grayscale 0). */
  case class PngImage(width: Int, height: Int, bitDepth: Int, colorType: Int,
                      pixels: Array[Byte])

  private val PngSig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def isPngMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => (bytes(i) & 0xff) == PngSig(i))

  /** PNG parser — the real format end to end, pure JVM: 8-byte
    * signature; big-endian `(len, fourcc, payload, crc32)` chunks with
    * EVERY crc verified (java.util.zip.CRC32 over type+payload, the
    * public polynomial); IHDR grammar (8-bit depth, color type 0/2,
    * deflate compression, no interlace); all IDAT payloads concatenated
    * into ONE zlib stream (chunk boundaries are arbitrary, per spec) and
    * inflated with java.util.zip.Inflater; then per-scanline defiltering
    * of all five filter types — None/Sub/Up/Average/Paeth, including
    * Paeth's exact tie-breaking order and Average's floor of the
    * left/up mean. Truncated streams, bad crcs, unknown filters, and
    * inflated sizes that disagree with the IHDR dims are all rejected —
    * the same corrupt-lake-object contract as [[parsePpm]]/[[parseWav]].
    * Ancillary chunks (tEXt, pHYs, ...) are skipped like WAV's LIST. */
  def parsePng(bytes: Array[Byte]): PngImage = {
    require(isPngMagic(bytes), "not a png")
    def be32(p: Int): Long =
      (bytes(p) & 0xffL) << 24 | (bytes(p + 1) & 0xffL) << 16 |
        (bytes(p + 2) & 0xffL) << 8 | (bytes(p + 3) & 0xffL)
    def fourcc(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    var pos = 8
    var w = -1; var h = -1; var depth = -1; var ctype = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= bytes.length) {
      val size64 = be32(pos) // validate unsigned before truncation, as in parseWav
      val id = fourcc(pos + 4)
      val body = pos + 8
      require(body.toLong + size64 + 4 <= bytes.length, s"png: chunk '$id' overruns file")
      val size = size64.toInt
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + size)
      require(crc.getValue == be32(body + size), s"png: bad crc on chunk '$id'")
      id match {
        case "IHDR" =>
          require(size == 13, "png: IHDR must be 13 bytes")
          w = be32(body).toInt; h = be32(body + 4).toInt
          depth = bytes(body + 8) & 0xff; ctype = bytes(body + 9) & 0xff
          require(w > 0 && h > 0 && w.toLong * h * 3 < Int.MaxValue,
            s"png: bad dimensions ${w}x$h")
          require(depth == 8, s"png: only 8-bit depth supported, got $depth")
          require(ctype == 0 || ctype == 2, s"png: only gray/rgb supported, got $ctype")
          require((bytes(body + 10) & 0xff) == 0, "png: unknown compression method")
          require((bytes(body + 11) & 0xff) == 0, "png: unknown filter method")
          require((bytes(body + 12) & 0xff) == 0, "png: interlace not supported")
        case "IDAT" =>
          require(w > 0, "png: IDAT before IHDR")
          idat.write(bytes, body, size)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tEXt, pHYs, gAMA, ...) skipped
      }
      pos = body + size + 4
    }
    require(sawEnd, "png: missing IEND")
    require(idat.size > 0, "png: missing IDAT")
    val bpp = if (ctype == 2) 3 else 1 // bytes per pixel at depth 8
    val stride = w * bpp
    // Allocation bound BEFORE allocating: DEFLATE expands at most
    // ~1032x (one distance-1 length-258 match per 2 bits), so declared
    // dims that imply more output than the IDAT payload could possibly
    // inflate to are corrupt — without this, one flipped bit in the
    // 4-byte IHDR width allocates gigabytes before the stream-length
    // check ever runs (found by the byte-flip fuzz spec).
    val rawLen = (stride + 1).toLong * h
    require(rawLen <= idat.size.toLong * 1040 + 1024,
      s"png: declared ${w}x$h exceeds any possible inflation of ${idat.size} IDAT bytes")
    // r14 ADVICE: the IHDR bound (w*h*3 < Int.MaxValue) does not bound
    // (stride+1)*h — a w=1, h≈7.1e8 RGB file passes both earlier checks
    // and the Int product overflows negative, escaping as
    // NegativeArraySizeException. Allocate only after the Long check.
    require(rawLen <= Int.MaxValue,
      s"png: raster ${w}x$h with filter bytes exceeds array bounds")
    val raw = new Array[Byte](rawLen.toInt) // +1 filter byte per scanline
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        require(n > 0 || inf.finished(), "png: truncated or stalled zlib stream")
        got += n
      }
      require(got == raw.length && (inf.finished() || inf.inflate(new Array[Byte](1)) == 0),
        s"png: inflated $got bytes, expected ${raw.length}")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"png: corrupt zlib stream: ${e.getMessage}")
    } finally inf.end()
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val rowIn = y * (stride + 1)
      val rowOut = y * stride
      val filter = raw(rowIn) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + 1 + x) & 0xff
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth: closest of left/up/upLeft to p, ties left>up>upLeft
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case f => throw new IllegalArgumentException(s"png: unknown filter $f on row $y")
        }
        out(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PngImage(w, h, depth, ctype, out)
  }

  /** Partition-parallel batch decode over binary media columns: the Spark
    * plumbing (typed Dataset, per-partition iteration, no driver
    * collection) for the decode/feature-extract stage; the per-row decode
    * is the REAL [[extractFeatures]] dispatch. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var ck = 0L
        r.media.foreach(b => ck = ck * 31 + (b & 0xff))
        MediaFeatures(r.doc_id, r.media.length.toLong, ck, extractFeatures(r.media))
      }
    }
  }

  /** Deterministic P6 writer (content-addressed: raster byte j of doc d
    * is `(d*7 + j*13) % 256`), with a comment line in the header so the
    * parser's comment handling is exercised by every row. */
  def synthPpm(docId: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# graft doc $docId\n$w $h\n255\n".getBytes("US-ASCII")
    val n = w * h * 3
    val out = java.util.Arrays.copyOf(header, header.length + n)
    var j = 0
    while (j < n) {
      out(header.length + j) = ((docId * 7 + j.toLong * 13) % 256).toByte; j += 1
    }
    out
  }

  /** Deterministic 16-bit mono PCM writer (sample i of doc d is
    * `(d*31 + i*17) % 4001 - 2000`, so ~half the samples are negative)
    * with a LIST junk chunk of ODD size between fmt and data, so the
    * parser's chunk-skip and pad-to-even logic is exercised by every
    * row. Layout: 12 (RIFF) + 24 (fmt) + 14 (LIST+pad) + 8 + 2n. */
  def synthWav(docId: Long, nSamples: Int, rate: Int): Array[Byte] = {
    val out = new Array[Byte](58 + 2 * nSamples)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(out.length - 8).put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("LIST".getBytes(ascii)).putInt(5).put("junk!".getBytes(ascii)).put(0.toByte)
    bb.put("data".getBytes(ascii)).putInt(2 * nSamples)
    var i = 0
    while (i < nSamples) {
      bb.putShort(((docId * 31 + i.toLong * 17) % 4001 - 2000).toShort); i += 1
    }
    out
  }

  /** Deterministic RGB-8 PNG writer (content-addressed: sample byte j of
    * doc d is `(d*11 + j*19) % 251`), with scanline y FILTERED with type
    * `y % 5` — so one image exercises None, Sub, Up, Average, AND Paeth,
    * and a decoder that mis-inverts any filter (or mis-handles Paeth's
    * tie order / Average's floor) shifts the decoded content sum. The
    * zlib stream comes from java.util.zip.Deflater; chunk crcs from
    * java.util.zip.CRC32. The IDAT payload is split in two chunks when
    * possible, pinning the concatenate-before-inflate requirement. */
  def synthPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val stride = w * 3
    val pix = new Array[Byte](stride * h)
    var j = 0
    while (j < pix.length) { pix(j) = ((docId * 11 + j.toLong * 19) % 251).toByte; j += 1 }
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = pix(y * stride + x) & 0xff
        val left = if (x >= 3) pix(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= 3) pix((y - 1) * stride + x - 3) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    var zlen = 0
    while (!defl.finished()) zlen += defl.deflate(zbuf, zlen, zbuf.length - zlen)
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(b => out.write(b))
    def chunk(id: String, payload: Array[Byte], off: Int, len: Int): Unit = {
      def be32(v: Long): Unit = { out.write((v >> 24).toInt & 0xff)
        out.write((v >> 16).toInt & 0xff); out.write((v >> 8).toInt & 0xff)
        out.write(v.toInt & 0xff) }
      be32(len.toLong)
      val tag = id.getBytes("US-ASCII")
      out.write(tag, 0, 4)
      out.write(payload, off, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tag, 0, 4); crc.update(payload, off, len)
      be32(crc.getValue)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr, 0, 13)
    val split = if (zlen > 1) zlen / 2 else zlen
    chunk("IDAT", zbuf, 0, split)
    if (split < zlen) chunk("IDAT", zbuf, split, zlen - split)
    chunk("IEND", Array.emptyByteArray, 0, 0)
    out.toByteArray
  }

  case class DecodedMedia(doc_id: Long, fmt: String, dim1: Long, dim2: Long,
                          depth: Long, n_units: Long, byte_len: Long, content_sum: Long)

  /** REAL DECODE, ORACLED (r11 verdict, next-round item 3): per doc,
    * synthesize content-addressed media bytes on the EXECUTORS (even
    * ids: a P6 image sized by the id; odd ids: mono 16-bit WAV), run
    * them through the real [[parsePpm]]/[[parseWav]] binary parsers
    * (dispatching on magic bytes, not on how the row was built), and
    * emit the decoded header fields + a content checksum. DuckDB
    * recomputes every column INDEPENDENTLY from the generation
    * formulas — the serialized header length via string construction,
    * the content sum via an explicit per-sample list fold — so a writer
    * bug (wrong header, wrong RIFF size) shifts byte_len and a parser
    * bug (comment handling, raster offset, chunk padding, endianness,
    * sign extension) shifts content_sum or the decoded dims.
    * dim1/dim2 are (width, height) for images and (sample_rate,
    * channels) for audio; depth is maxval / bits-per-sample.
    *
    * Scale: generate + parse are per-row map-side work inside one
    * mapPartitions (media bytes never leave the executor, exactly the
    * production decode shape); the only shuffle is the output sort. */
  def mmDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val bytes =
          if (id % 2 == 0) synthPpm(id, (4 + id % 13).toInt, (3 + id % 11).toInt)
          else synthWav(id, (32 + id % 97).toInt, (8000 + (id % 5) * 4000).toInt)
        if (bytes(0) == 'P') {
          val img = parsePpm(bytes)
          var s = 0L
          img.pixels.foreach(b => s += (b & 0xff))
          DecodedMedia(id, "ppm", img.width.toLong, img.height.toLong,
            img.maxval.toLong, img.width.toLong * img.height,
            bytes.length.toLong, s)
        } else {
          val a = parseWav(bytes)
          var s = 0L
          a.samples.foreach(x => s += x)
          DecodedMedia(id, "wav", a.sampleRate.toLong, a.nChannels.toLong,
            a.bitsPerSample.toLong, a.samples.length.toLong,
            bytes.length.toLong, s)
        }
      }
    }.toDF().orderBy("doc_id")
  }

  private val mmDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id, doc_id % 2 = 0 AS is_img,
      |    4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
      |    32 + doc_id % 97 AS n_samp,
      |    8000 + (doc_id % 5) * 4000 AS rate
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN is_img THEN 'ppm' ELSE 'wav' END AS fmt,
      |  (CASE WHEN is_img THEN w ELSE rate END)::BIGINT AS dim1,
      |  (CASE WHEN is_img THEN h ELSE 1 END)::BIGINT AS dim2,
      |  (CASE WHEN is_img THEN 255 ELSE 16 END)::BIGINT AS depth,
      |  (CASE WHEN is_img THEN w * h ELSE n_samp END)::BIGINT AS n_units,
      |  (CASE WHEN is_img THEN length('P6' || chr(10) || '# graft doc ' ||
      |          doc_id::VARCHAR || chr(10) || w::VARCHAR || ' ' ||
      |          h::VARCHAR || chr(10) || '255' || chr(10)) + w * h * 3
      |        ELSE 58 + 2 * n_samp END)::BIGINT AS byte_len,
      |  (CASE WHEN is_img THEN list_sum(list_transform(
      |          generate_series(0, w * h * 3 - 1), j -> (doc_id * 7 + j * 13) % 256))
      |        ELSE list_sum(list_transform(
      |          generate_series(0, n_samp - 1), i -> (doc_id * 31 + i * 17) % 4001 - 2000))
      |   END)::BIGINT AS content_sum
      |FROM m ORDER BY doc_id""".stripMargin

  /** Deterministic GIF89a writer (content-addressed: pixel j of doc d
    * indexes palette slot `(d*13 + j*23) % 97` in a 128-color global
    * table whose entry i is `((i*3)%256, (i*5+1)%256, (i*7+2)%256)`),
    * LZW-encoded with LITERAL-ONLY codes while mirroring the decoder's
    * dictionary bookkeeping exactly — the dictionary the decoder builds
    * is never referenced, but its SIZE drives the code-width schedule
    * (8→9→10→... bumps at powers of two) and forces a mid-stream CLEAR
    * before the 4096 ceiling, so every decode exercises variable-width
    * reads, width growth, and reset handling. A comment extension
    * rides between the palette and the image so the block-skip path
    * runs on every row; the stream is split into ≤255-byte sub-blocks
    * per the format. */
  def synthGif(docId: Long, w: Int, h: Int): Array[Byte] = {
    val minCode = 7; val clear = 1 << minCode; val end = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0; var nbits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code << nbits; nbits += width
      while (nbits >= 8) { bits.write(cur & 0xff); cur >>= 8; nbits -= 8 }
    }
    var dictSize = end + 1
    var prevExists = false
    put(clear)
    var j = 0
    val n = w * h
    while (j < n) {
      put(((docId * 13 + j.toLong * 23) % 97).toInt)
      if (prevExists) {
        if (dictSize < 4096) {
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        if (dictSize >= 4095) {
          put(clear); width = minCode + 1; dictSize = end + 1; prevExists = false
        }
      } else prevExists = true
      j += 1
    }
    put(end)
    if (nbits > 0) bits.write(cur & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16le(w); u16le(h)
    out.write(0x80 | (minCode - 1)) // global table, 2^7 = 128 entries
    out.write(0); out.write(0)      // bg index, aspect
    var i = 0
    while (i < clear) {
      out.write((i * 3) % 256); out.write((i * 5 + 1) % 256); out.write((i * 7 + 2) % 256)
      i += 1
    }
    out.write(0x21); out.write(0xfe) // comment extension, 2 sub-blocks
    out.write(3); out.write("doc".getBytes("US-ASCII"), 0, 3); out.write(0)
    out.write(0x2c); u16le(0); u16le(0); u16le(w); u16le(h); out.write(0)
    out.write(minCode)
    val z = bits.toByteArray
    var off = 0
    while (off < z.length) {
      val nblk = math.min(255, z.length - off)
      out.write(nblk); out.write(z, off, nblk); off += nblk
    }
    out.write(0)    // data terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  case class DecodedPng(doc_id: Long, width: Long, height: Long, depth: Long,
                        color_type: Long, n_pixels: Long, content_sum: Long)

  /** COMPRESSED-CODEC DECODE, ORACLED (r12 verdict item 4): per doc,
    * synthesize a real RGB-8 PNG on the executors ([[synthPng]]: zlib-
    * deflated, crc'd chunks, scanline y filtered with type y%5 so all
    * five PNG filters appear in every image, IDAT split in two), run it
    * through the full [[parsePng]] decode path — crc verification, IDAT
    * concatenation, Inflater, per-scanline defilter — and emit the IHDR
    * fields plus the decoded-content sum. DuckDB recomputes the content
    * sum INDEPENDENTLY from the generation formula
    * `(doc_id*11 + j*19) % 251` via an explicit per-sample list fold, so
    * any mis-inverted filter (Sub/Up/Average/Paeth, Paeth tie order,
    * Average floor), any zlib mishandling, and any raster-offset bug
    * shifts content_sum; dims/depth/color_type pin the IHDR grammar.
    * byte_len is deliberately NOT a column — a compressed stream's
    * length is not oracle-expressible, and pinning it would just test
    * the Deflater version.
    *
    * Scale: identical shape to [[mmDecode]] — synthesize + decode are
    * per-row map-side work, bytes never leave the executor, the only
    * shuffle is the output sort. */
  def mmDecodePng(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = (3 + id % 6).toInt; val h = (2 + id % 5).toInt
        val img = parsePng(synthPng(id, w, h))
        var s = 0L
        img.pixels.foreach(b => s += (b & 0xff))
        DecodedPng(id, img.width.toLong, img.height.toLong, img.bitDepth.toLong,
          img.colorType.toLong, img.width.toLong * img.height, s)
      }
    }.toDF().orderBy("doc_id")
  }

  private val mmDecodePngSql: String =
    """SELECT doc_id,
      |  (3 + doc_id % 6)::BIGINT AS width,
      |  (2 + doc_id % 5)::BIGINT AS height,
      |  8::BIGINT AS depth,
      |  2::BIGINT AS color_type,
      |  ((3 + doc_id % 6) * (2 + doc_id % 5))::BIGINT AS n_pixels,
      |  list_sum(list_transform(
      |    generate_series(0, (3 + doc_id % 6) * (2 + doc_id % 5) * 3 - 1),
      |    j -> (doc_id * 11 + j * 19) % 251))::BIGINT AS content_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Deterministic G.711 μ-law mono WAV writer (format code 7, 8-bit:
    * byte i of doc d is `(d*37 + i*41) % 256`) — fixed 44-byte layout
    * (12 RIFF + 24 fmt + 8 data header), no junk chunk, so byte_len is
    * closed-form for the oracle. */
  def synthWavMulaw(docId: Long, nSamples: Int, rate: Int): Array[Byte] = {
    val out = new Array[Byte](44 + nSamples)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(out.length - 8).put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(7).putShort(1).putInt(rate).putInt(rate).putShort(1).putShort(8)
    bb.put("data".getBytes(ascii)).putInt(nSamples)
    var i = 0
    while (i < nSamples) { bb.put(((docId * 37 + i.toLong * 41) % 256).toByte); i += 1 }
    // RIFF pads odd chunks to even — our container simply ends after
    // data, and parseWav's walker tolerates the final chunk being last
    out
  }

  case class DecodedMulaw(doc_id: Long, rate: Long, n_samples: Long,
                          byte_len: Long, content_sum: Long, abs_sum: Long)

  /** COMPANDED AUDIO DECODE, ORACLED (r13): per doc, synthesize an
    * 8-bit G.711 μ-law WAV on the executors and run it through the same
    * [[parseWav]] chunk walker as PCM — the format-code dispatch, the
    * expansion formula (complement, sign/exponent/mantissa split,
    * bias-132 reconstruction), and the sign handling are all pinned by
    * DuckDB recomputing both the signed content sum and the absolute
    * sum per sample from the generation formula with integer shifts.
    * byte_len IS oracled here (unlike PNG/GIF): μ-law is fixed-rate
    * companding, one byte per sample, so the container length is
    * closed-form. */
  def mmDecodeMulaw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val n = (24 + id % 61).toInt
        val bytes = synthWavMulaw(id, n, 8000)
        val a = parseWav(bytes)
        var s = 0L; var abs = 0L
        a.samples.foreach { x => s += x; abs += math.abs(x.toLong) }
        DecodedMulaw(id, a.sampleRate.toLong, a.samples.length.toLong,
          bytes.length.toLong, s, abs)
      }
    }.toDF().orderBy("doc_id")
  }

  private val mmDecodeMulawSql: String =
    """WITH m AS (
      |  SELECT doc_id, 24 + doc_id % 61 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, n,
      |    list_transform(generate_series(0, n - 1), i ->
      |      255 - ((doc_id * 37 + i * 41) % 256)) AS u
      |  FROM m),
      |e AS (
      |  SELECT doc_id, n,
      |    list_transform(u, x ->
      |      CASE WHEN x >= 128 THEN -(((132 + (x % 16) * 8) << ((x // 16) % 8)) - 132)
      |           ELSE ((132 + (x % 16) * 8) << ((x // 16) % 8)) - 132 END) AS samp
      |  FROM s)
      |SELECT doc_id, 8000::BIGINT AS rate, n::BIGINT AS n_samples,
      |  (44 + n)::BIGINT AS byte_len,
      |  list_sum(samp)::BIGINT AS content_sum,
      |  list_sum(list_transform(samp, v -> abs(v)))::BIGINT AS abs_sum
      |FROM e ORDER BY doc_id""".stripMargin

  case class DecodedGif(doc_id: Long, width: Long, height: Long, pal_bits: Long,
                        n_pixels: Long, content_sum: Long)

  /** SECOND COMPRESSED CODEC, ORACLED (r13): per doc, synthesize a real
    * GIF89a on the executors ([[synthGif]]: 128-color global palette,
    * comment extension, LITERAL-ONLY LZW whose width schedule and
    * mid-stream CLEARs mirror the decoder's dictionary growth), run it
    * through the full [[parseGif]] read path — block walk, extension
    * skip, variable-width LZW with resets, palette application — and
    * emit the descriptor fields plus the decoded-RGB content sum.
    * DuckDB recomputes the sum INDEPENDENTLY from the palette and
    * index formulas via a per-pixel list fold, so a bit-packing,
    * width-bump, clear-reset, or palette-lookup bug shifts
    * content_sum. Dims up to 40×15 push the dictionary past 512
    * entries — the 10-bit code path — inside the oracled corpus (the
    * spec drives it past 4095 for the reset path). LZW is a different
    * compression family from PNG's DEFLATE, so the two compressed
    * entries fail independently. Same scale shape as the other decode
    * entries: per-row map work, bytes never leave the executor. */
  def mmDecodeGif(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = (4 + (id % 10) * 4).toInt; val h = (3 + (id % 7) * 2).toInt
        val img = parseGif(synthGif(id, w, h))
        var s = 0L
        img.pixels.foreach(b => s += (b & 0xff))
        DecodedGif(id, img.width.toLong, img.height.toLong, img.palBits.toLong,
          img.width.toLong * img.height, s)
      }
    }.toDF().orderBy("doc_id")
  }

  private val mmDecodeGifSql: String =
    """SELECT doc_id,
      |  (4 + (doc_id % 10) * 4)::BIGINT AS width,
      |  (3 + (doc_id % 7) * 2)::BIGINT AS height,
      |  7::BIGINT AS pal_bits,
      |  ((4 + (doc_id % 10) * 4) * (3 + (doc_id % 7) * 2))::BIGINT AS n_pixels,
      |  list_sum(list_transform(
      |    generate_series(0, (4 + (doc_id % 10) * 4) * (3 + (doc_id % 7) * 2) - 1),
      |    j -> (((doc_id * 13 + j * 23) % 97) * 3) % 256
      |       + (((doc_id * 13 + j * 23) % 97) * 5 + 1) % 256
      |       + (((doc_id * 13 + j * 23) % 97) * 7 + 2) % 256))::BIGINT AS content_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  case class MixedDecoded(doc_id: Long, fmt: String, feat_sum: Long)

  /** HETEROGENEOUS DISPATCH, ORACLED (r13 capstone of the decode
    * family): every doc synthesizes a DIFFERENT format by `id % 5`
    * (PPM, PCM WAV, PNG, GIF, μ-law WAV) and flows through
    * [[extractFeatures]] — the PRODUCTION magic-byte dispatch, not the
    * parsers directly — in one distributed pass; the emitted value is
    * the feature-vector sum (every feature is an exact small integer,
    * so the fold is lossless). DuckDB recomputes each format's
    * features from its generation formulas in one CASE — a dispatch
    * bug (wrong parser for a magic, a format falling to the stub)
    * shifts exactly the affected residue class. This is the
    * production shape for a real media lake: one typed pipeline over
    * mixed bytes, no per-format branching above the dispatch. */
  def mmDecodeMixed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val (fmt, bytes) = (id % 5) match {
          case 0 => ("ppm", synthPpm(id, (4 + id % 13).toInt, (3 + id % 11).toInt))
          case 1 => ("pcm", synthWav(id, (32 + id % 97).toInt, (8000 + (id % 5) * 4000).toInt))
          case 2 => ("png", synthPng(id, (3 + id % 6).toInt, (2 + id % 5).toInt))
          case 3 => ("gif", synthGif(id, (4 + (id % 10) * 4).toInt, (3 + (id % 7) * 2).toInt))
          case _ => ("ulaw", synthWavMulaw(id, (24 + id % 61).toInt, 8000))
        }
        val f = extractFeatures(bytes)
        MixedDecoded(id, fmt, f.foldLeft(0L)((a, x) => a + x.toLong))
      }
    }.toDF().orderBy("doc_id")
  }

  private val mmDecodeMixedSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE doc_id % 5 WHEN 0 THEN 'ppm' WHEN 1 THEN 'pcm'
      |      WHEN 2 THEN 'png' WHEN 3 THEN 'gif' ELSE 'ulaw' END AS fmt,
      |    CASE doc_id % 5
      |    WHEN 0 THEN -- ppm: w + h + 255 + sum(all samples) + w*h
      |      (4 + doc_id % 13) + (3 + doc_id % 11) + 255
      |      + (4 + doc_id % 13) * (3 + doc_id % 11)
      |      + list_sum(list_transform(
      |          generate_series(0, (4 + doc_id % 13) * (3 + doc_id % 11) * 3 - 1),
      |          j -> (doc_id * 7 + j * 13) % 256))
      |    WHEN 1 THEN -- pcm wav: rate + 1 + 16 + n + sum|s| + sum(s)
      |      12000 + 1 + 16 + (32 + doc_id % 97)
      |      + list_sum(list_transform(generate_series(0, 32 + doc_id % 97 - 1),
      |          i -> abs((doc_id * 31 + i * 17) % 4001 - 2000)))
      |      + list_sum(list_transform(generate_series(0, 32 + doc_id % 97 - 1),
      |          i -> (doc_id * 31 + i * 17) % 4001 - 2000))
      |    WHEN 2 THEN -- png: w + h + 8 + 2 + sum(pixels) + w*h
      |      (3 + doc_id % 6) + (2 + doc_id % 5) + 8 + 2
      |      + (3 + doc_id % 6) * (2 + doc_id % 5)
      |      + list_sum(list_transform(
      |          generate_series(0, (3 + doc_id % 6) * (2 + doc_id % 5) * 3 - 1),
      |          j -> (doc_id * 11 + j * 19) % 251))
      |    WHEN 3 THEN -- gif: w + h + 7 + sum(rgb) + w*h
      |      (4 + (doc_id % 10) * 4) + (3 + (doc_id % 7) * 2) + 7
      |      + (4 + (doc_id % 10) * 4) * (3 + (doc_id % 7) * 2)
      |      + list_sum(list_transform(
      |          generate_series(0, (4 + (doc_id % 10) * 4) * (3 + (doc_id % 7) * 2) - 1),
      |          j -> (((doc_id * 13 + j * 23) % 97) * 3) % 256
      |             + (((doc_id * 13 + j * 23) % 97) * 5 + 1) % 256
      |             + (((doc_id * 13 + j * 23) % 97) * 7 + 2) % 256))
      |    ELSE -- mu-law wav: 8000 + 1 + 8 + n + sum|s| + sum(s)
      |      8000 + 1 + 8 + (24 + doc_id % 61)
      |      + list_sum(list_transform(generate_series(0, 24 + doc_id % 61 - 1), i ->
      |          abs(CASE WHEN 255 - ((doc_id * 37 + i * 41) % 256) >= 128
      |            THEN -(((132 + ((255 - ((doc_id * 37 + i * 41) % 256)) % 16) * 8)
      |                   << (((255 - ((doc_id * 37 + i * 41) % 256)) // 16) % 8)) - 132)
      |            ELSE ((132 + ((255 - ((doc_id * 37 + i * 41) % 256)) % 16) * 8)
      |                 << (((255 - ((doc_id * 37 + i * 41) % 256)) // 16) % 8)) - 132 END)))
      |      + list_sum(list_transform(generate_series(0, 24 + doc_id % 61 - 1), i ->
      |          CASE WHEN 255 - ((doc_id * 37 + i * 41) % 256) >= 128
      |            THEN -(((132 + ((255 - ((doc_id * 37 + i * 41) % 256)) % 16) * 8)
      |                   << (((255 - ((doc_id * 37 + i * 41) % 256)) // 16) % 8)) - 132)
      |            ELSE ((132 + ((255 - ((doc_id * 37 + i * 41) % 256)) % 16) * 8)
      |                 << (((255 - ((doc_id * 37 + i * 41) % 256)) // 16) % 8)) - 132 END))
      |    END AS feat_sum
      |  FROM documents)
      |SELECT doc_id, fmt, feat_sum::BIGINT AS feat_sum
      |FROM f ORDER BY doc_id""".stripMargin

  /** ViT PATCH/TOKEN ACCOUNTING — the budget arithmetic a multimodal
    * training pipeline runs per image BEFORE any decode: 16×16 patch
    * grid over the (stub) dimensions, tokens = patches·frames + 1 CLS,
    * aggregated per format with the count of images that would blow a
    * 4096-token budget (the resize trigger). Pure integer projection +
    * one map-combinable aggregate; the real decoder changes none of
    * it. */
  def mmPatchTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        (lit(320L) + col("n_chars") % 320).as("width"),
        (lit(240L) + col("n_chars") % 240).as("height"),
        (lit(1L) + col("n_chars") % 30).as("n_frames"),
        when(col("n_chars") % 3 === 0, "jpeg")
          .when(col("n_chars") % 3 === 1, "png")
          .otherwise("webp").as("fmt"))
      .withColumn("n_patches",
        expr("((width + 15) div 16) * ((height + 15) div 16)"))
      .withColumn("n_tokens", col("n_patches") * col("n_frames") + 1)
      .groupBy("fmt")
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(when(col("n_tokens") > 4096, 1L).otherwise(0L)).as("n_over_budget"))
      .orderBy("fmt")

  private val mmPatchTokensSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    320 + n_chars % 320 AS width, 240 + n_chars % 240 AS height,
      |    1 + n_chars % 30 AS n_frames,
      |    CASE WHEN n_chars % 3 = 0 THEN 'jpeg'
      |         WHEN n_chars % 3 = 1 THEN 'png' ELSE 'webp' END AS fmt
      |  FROM documents),
      |t AS (
      |  SELECT fmt,
      |    ((width + 15) // 16) * ((height + 15) // 16) * n_frames + 1 AS n_tokens
      |  FROM m)
      |SELECT fmt, count(*)::BIGINT AS n_media,
      |  sum(n_tokens)::BIGINT AS total_tokens,
      |  max(n_tokens)::BIGINT AS max_tokens,
      |  sum(CASE WHEN n_tokens > 4096 THEN 1 ELSE 0 END)::BIGINT AS n_over_budget
      |FROM t GROUP BY fmt ORDER BY fmt""".stripMargin

  /** EXACT MEDIA DEDUP BY CONTENT HASH — md5 over the opaque binary
    * column (both engines hash the same bytes), over a corpus where a
    * re-ingested copy of every document landed under new ids (the
    * daily-reingest duplication every media lake fights). One hash
    * group-by; keep = lowest id per content group — the binary twin of
    * dd_exact. */
  def mmDedupBytes(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + 100000L).as("doc_id"), col("media")))
    corpus
      .withColumn("h", md5(col("media")))
      .groupBy("h")
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .groupBy("n_copies")
      .agg(count(lit(1)).as("n_groups"), sum(col("keep_id")).as("keep_id_check"))
      .orderBy("n_copies")
  }

  private val mmDedupBytesSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents),
      |groups AS (
      |  SELECT md5(text) AS h, count(*)::BIGINT AS n_copies,
      |    min(doc_id)::BIGINT AS keep_id
      |  FROM corpus GROUP BY 1)
      |SELECT n_copies, count(*)::BIGINT AS n_groups,
      |  sum(keep_id)::BIGINT AS keep_id_check
      |FROM groups GROUP BY n_copies ORDER BY n_copies""".stripMargin

  /** PERCEPTUAL-STYLE NEAR-DUP over media bytes — the histogram-
    * signature technique image lakes use where [[mmDedupBytes]]' exact
    * md5 fails: a re-encoded or slightly-edited copy hashes differently
    * but its content HISTOGRAM barely moves. Signature = the 8-bucket
    * byte-value histogram of the first 64 content bytes, each count
    * quantized by ÷8 (the coarse-binning that absorbs small edits) and
    * serialized to a join key. The corpus is docs ∪ a one-byte-edited
    * re-ingest of every doc under new ids: md5 distinguishes all of
    * them (exact dedup finds NOTHING), while the quantized signature
    * collides for most edited pairs — `n_mixed_groups` counts the
    * near-dup catches, and the gap to the group total is the honest
    * quantization-boundary miss rate a deployment tunes with bucket
    * width. On real media the histogram comes from the decoder
    * ([[stubDecode]]'s role); the signature join shape is unchanged.
    *
    * Shape at scale: signature construction is a bounded per-row fold
    * (8×64 byte probes); ONE shuffle groups by the signature key —
    * the same bucketed equi-join scale shape as every dd_* entry,
    * never all-pairs. */
  def mmHistoNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    // Tables.spread (r14): the per-char histogram aggregate ran on the
    // fixture's one scan split (twice, via the union)
    val docs = Tables.spread(spark,
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), col("doc_id"))
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      expr("concat(substring(text, 1, 9), 'z', substring(text, 11))").as("text")))
    corpus
      .withColumn("sig", expr(
        """concat_ws(',', transform(
          |  transform(sequence(0, 7), b ->
          |    aggregate(sequence(1, least(64, length(text))), 0L,
          |      (acc, i) -> acc + if(ascii(substring(text, i, 1)) % 8 = b, 1L, 0L))),
          |  c -> cast(c div 8 as string)))""".stripMargin))
      .groupBy("sig")
      .agg(count(lit(1)).as("n_members"),
        max((col("doc_id") < 100000L).cast("long")).as("has_orig"),
        max((col("doc_id") >= 100000L).cast("long")).as("has_copy"))
      .groupBy("n_members")
      .agg(count(lit(1)).as("n_groups"),
        sum(col("has_orig") * col("has_copy")).as("n_mixed_groups"))
      .orderBy("n_members")
  }

  private val mmHistoNeardupSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, substr(text, 1, 9) || 'z' || substr(text, 11)
      |  FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    array_to_string(list_transform(
      |      list_transform(generate_series(0, 7), b ->
      |        len(list_filter(generate_series(1, least(64, len(text))),
      |          i -> ascii(text[i]) % 8 = b))),
      |      c -> (c // 8)::VARCHAR), ',') AS sig
      |  FROM corpus),
      |groups AS (
      |  SELECT sig, count(*)::BIGINT AS n_members,
      |    max(CASE WHEN doc_id < 100000 THEN 1 ELSE 0 END)::BIGINT AS has_orig,
      |    max(CASE WHEN doc_id >= 100000 THEN 1 ELSE 0 END)::BIGINT AS has_copy
      |  FROM sigs GROUP BY sig)
      |SELECT n_members, count(*)::BIGINT AS n_groups,
      |  sum(has_orig * has_copy)::BIGINT AS n_mixed_groups
      |FROM groups GROUP BY n_members ORDER BY n_members""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> (mmDecode _),
    "mm_decode_png" -> (mmDecodePng _),
    "mm_decode_gif" -> (mmDecodeGif _),
    "mm_decode_mulaw" -> (mmDecodeMulaw _),
    "mm_decode_mixed" -> (mmDecodeMixed _),
    "mm_decode_jpeg" -> (mmDecodeJpeg _),
    "mm_decode_jpeg_color" -> (mmDecodeJpegColor _),
    "mm_histo_neardup" -> (mmHistoNeardup _),
    "mm_meta_extract" -> (mmMetaExtract _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _),
    "mm_patch_tokens" -> (mmPatchTokens _),
    "mm_dedup_bytes" -> (mmDedupBytes _))

  val oracles: Map[String, String] = Map(
    "mm_decode" -> mmDecodeSql,
    "mm_decode_png" -> mmDecodePngSql,
    "mm_decode_gif" -> mmDecodeGifSql,
    "mm_decode_mulaw" -> mmDecodeMulawSql,
    "mm_decode_mixed" -> mmDecodeMixedSql,
    "mm_decode_jpeg" -> mmDecodeJpegSql,
    "mm_decode_jpeg_color" -> mmDecodeJpegColorSql,
    "mm_histo_neardup" -> mmHistoNeardupSql,
    "mm_meta_extract" -> mmMetaExtractSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql,
    "mm_patch_tokens" -> mmPatchTokensSql,
    "mm_dedup_bytes" -> mmDedupBytesSql)
}

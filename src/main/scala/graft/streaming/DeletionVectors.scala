package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Hadoop `Configuration` is not `Serializable`, but it IS `Writable`;
  * this wrapper ships one to executors through its own public
  * write/readFields contract (the same trick Spark's internal
  * `SerializableConfiguration` uses, re-done here against public API
  * only). Deletion-vector loads and writes run ON EXECUTORS — the DV
  * bytes belong next to the data files they mask, never funneled
  * through the driver — so the scheme-resolved FS config must travel. */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  private val bytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    conf.write(out); out.flush()
    bos.toByteArray
  }
  def toConf: Configuration = {
    if (conf == null) {
      val c = new Configuration(false)
      c.readFields(new DataInputStream(new ByteArrayInputStream(bytes)))
      conf = c
    }
    conf
  }
}

/** One deletion-vector descriptor, exactly the `deletionVector` struct
  * a Delta `add` action carries (delta-io/delta PROTOCOL.md "Deletion
  * Vector Descriptor Schema"):
  *
  *  - `storageType` `"u"`: on-disk, `pathOrInlineDv` = optional random
  *    prefix + Z85-encoded 16-byte UUID (always the LAST 20 chars); the
  *    file is `<table>/<prefix>/deletion_vector_<uuid>.bin`;
  *  - `"p"`: on-disk at an absolute path;
  *  - `"i"`: inline, `pathOrInlineDv` = Z85 of the serialized bitmap
  *    itself (no file, no offset);
  *  - `offset`: where the DV's `[size][data][checksum]` record starts
  *    inside the file (byte 0 of the file is its format version);
  *  - `sizeInBytes`: length of the serialized bitmap alone;
  *  - `cardinality`: rows the vector deletes — validated against the
  *    decoded bitmap, so a torn DV can never silently under-delete.
  */
final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                              offset: Int, sizeInBytes: Int, cardinality: Long)

/** The PUBLIC on-disk grammar of Delta Lake deletion vectors —
  * merge-on-read row deletes (delta-io/delta PROTOCOL.md "Deletion
  * Vectors"). A DV is a set of PHYSICAL row positions within one
  * parquet data file, serialized as a portable "RoaringBitmapArray":
  *
  *   [4-byte LE magic 1681511377][8-byte LE bitmap count]
  *   [standard 32-bit RoaringBitmap serializations, back to back]
  *
  * where 64-bit position p lives in bitmap (p >>> 32) as 32-bit value
  * (p & 0xFFFFFFFF). Each 32-bit bitmap is the roaring interchange
  * format (RoaringFormatSpec): cookie 12346 (no run containers;
  * descriptive header + offset header + containers) or 12347 (run
  * bitset; offsets only at >= 4 containers), containers keyed by the
  * value's high 16 bits — sorted u16 arrays up to 4096 values, 8 KiB
  * bitsets above, or run lists. The reader below decodes ALL of it;
  * the writer emits the 12346 array/bitmap subset (what small-to-dense
  * delete masks need — run emission adds nothing a reader can't
  * already consume).
  *
  * On disk a DV file is `[1-byte format version = 1]` then one
  * `[4-byte BE size][bitmap bytes][4-byte BE CRC-32 of the bytes]`
  * record per vector; a descriptor's `offset` points at its record.
  * All multi-byte fields INSIDE the bitmap are little-endian (roaring
  * spec), the file framing is big-endian (DataOutputStream) — mixing
  * them up is the classic interop bug, pinned by the spec's test
  * vectors in DeletionVectorSpec.
  *
  * Scale: a DV is metadata-sized relative to its file (worst case
  * ~1 bit per row vs the row itself), which is the entire point — a
  * selective DELETE on a 100 TB table writes kilobytes of bitmap
  * instead of rewriting terabytes of parquet ([[DeltaLog.deleteWhereDv]]).
  */
object DeletionVectors {

  // ---------------------------------------------------------------
  // Z85 (ZeroMQ base-85, RFC 32/Z85) — Delta encodes DV UUIDs and
  // inline bitmaps with it. 4 bytes -> 5 chars, big-endian value,
  // most significant char first.
  // ---------------------------------------------------------------

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 encodes 4-byte groups; got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Chars(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 decodes 5-char groups; got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Index(c) else -1
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** A UUID as Delta's 20-char Z85 form (16 big-endian bytes). */
  def encodeUuid(u: java.util.UUID): String = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    val b = java.nio.ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(b.getLong(), b.getLong())
  }

  /** Table-root-relative path of a `storageType="u"` DV: everything
    * before the final 20 chars is the random prefix directory. */
  def relativePath(pathOrInlineDv: String): String = {
    require(pathOrInlineDv.length >= 20,
      s"storageType=u pathOrInlineDv shorter than a Z85 UUID: $pathOrInlineDv")
    val prefix = pathOrInlineDv.dropRight(20)
    val uuid = decodeUuid(pathOrInlineDv.takeRight(20))
    (if (prefix.isEmpty) "" else s"$prefix/") + s"deletion_vector_$uuid.bin"
  }

  // ---------------------------------------------------------------
  // RoaringBitmapArray portable serialization
  // ---------------------------------------------------------------

  private val PortableMagic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4
  private val ArrayMaxCard = 4096

  private final class LeReader(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8); pos += 2; v }
    def i32(): Int = {
      val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8) |
        ((bytes(pos + 2) & 0xFF) << 16) | ((bytes(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    def i64(): Long = { val lo = i32() & 0xFFFFFFFFL; val hi = i32() & 0xFFFFFFFFL; lo | (hi << 32) }
    def skip(n: Int): Unit = pos += n
  }

  /** Decode one standard 32-bit roaring bitmap starting at the
    * reader's position, appending 64-bit values `(base | v32)`. */
  private def readBitmap32(r: LeReader, base: Long, out: scala.collection.mutable.ArrayBuilder[Long]): Unit = {
    val cookie = r.i32()
    val (size, runBits) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val bits = new Array[Byte]((n + 7) / 8)
        var i = 0
        while (i < bits.length) { bits(i) = r.u8().toByte; i += 1 }
        (n, bits)
      } else if (cookie == SerialCookieNoRun) (r.i32(), null)
      else throw new IllegalArgumentException(
        s"deletion vector: unknown roaring cookie $cookie (expected $SerialCookieNoRun/$SerialCookie)")
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) { keys(i) = r.u16(); cards(i) = r.u16() + 1; i += 1 }
    val hasOffsets = runBits == null || size >= NoOffsetThreshold
    if (hasOffsets) r.skip(4 * size) // containers are sequential; offsets are a seek aid
    def isRun(c: Int): Boolean = runBits != null && ((runBits(c / 8) >> (c % 8)) & 1) == 1
    i = 0
    while (i < size) {
      val hi = base | (keys(i).toLong << 16)
      if (isRun(i)) {
        val nRuns = r.u16()
        var j = 0
        while (j < nRuns) {
          val start = r.u16(); val len = r.u16()
          var v = 0
          while (v <= len) { out += hi | (start + v); v += 1 }
          j += 1
        }
      } else if (cards(i) <= ArrayMaxCard) {
        var j = 0
        while (j < cards(i)) { out += hi | r.u16(); j += 1 }
      } else {
        // bitmap container: 1024 little-endian 64-bit words
        var w = 0
        while (w < 1024) {
          val word = r.i64()
          if (word != 0L) {
            var b = 0
            while (b < 64) {
              if (((word >>> b) & 1L) == 1L) out += hi | (w * 64 + b)
              b += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialized RoaringBitmapArray -> sorted 64-bit row positions. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val r = new LeReader(bytes)
    val magic = r.i32()
    require(magic == PortableMagic,
      s"deletion vector: bad RoaringBitmapArray magic $magic (expected $PortableMagic)")
    val nBitmaps = r.i64()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"deletion vector: bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var i = 0L
    while (i < nBitmaps) { readBitmap32(r, i << 32, out); i += 1 }
    out.result()
  }

  /** Sorted distinct non-negative row positions -> serialized
    * RoaringBitmapArray (cookie-12346 array/bitmap containers). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "deletion vector positions must be >= 0")
    val sorted = positions.distinct.sorted
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val bos = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >>> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    def le64(v: Long): Unit = { le32((v & 0xFFFFFFFFL).toInt); le32((v >>> 32).toInt) }
    le32(PortableMagic)
    le64(nBitmaps)
    var bi = 0L
    var idx = 0
    while (bi < nBitmaps) {
      // the slice of 64-bit positions living in this 32-bit bitmap
      val end = {
        var e = idx
        while (e < sorted.length && (sorted(e) >>> 32) == bi) e += 1
        e
      }
      val vals = java.util.Arrays.copyOfRange(sorted, idx, end).map(v => (v & 0xFFFFFFFFL).toInt)
      idx = end
      // group by high-16 key, preserving order (vals are sorted unsigned)
      val containers = scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
      vals.foreach { v =>
        containers.getOrElseUpdate((v >>> 16) & 0xFFFF, scala.collection.mutable.ArrayBuffer.empty) += (v & 0xFFFF)
      }
      val size = containers.size
      le32(SerialCookieNoRun)
      le32(size)
      containers.foreach { case (key, cv) => le16(key); le16(cv.size - 1) }
      // offset header: byte position of each container from this
      // bitmap's cookie; header = 4 + 4 + 4*size (desc) + 4*size (offsets)
      var off = 8 + 8 * size
      containers.foreach { case (_, cv) =>
        le32(off)
        off += (if (cv.size <= ArrayMaxCard) 2 * cv.size else 8192)
      }
      containers.foreach { case (_, cv) =>
        if (cv.size <= ArrayMaxCard) cv.foreach(le16)
        else {
          val words = new Array[Long](1024)
          cv.foreach(v => words(v / 64) |= (1L << (v % 64)))
          words.foreach(le64)
        }
      }
      bi += 1
    }
    bos.toByteArray
  }

  // ---------------------------------------------------------------
  // DV file I/O (format version 1)
  // ---------------------------------------------------------------

  private def crc32(data: Array[Byte]): Int = {
    val c = new CRC32(); c.update(data); c.getValue.toInt
  }

  /** Write `positions` as a fresh single-vector DV file under
    * `tableRoot` and return its descriptor — runs wherever the caller
    * runs (executors, for [[DeltaLog.deleteWhereDv]]'s per-file tasks). */
  def writeDvFile(conf: Configuration, tableRoot: String, positions: Array[Long]): DvDescriptor = {
    val data = serialize(positions)
    val uuid = java.util.UUID.randomUUID()
    val rel = s"deletion_vector_$uuid.bin"
    val p = new Path(s"$tableRoot/$rel")
    val out = new DataOutputStream(p.getFileSystem(conf).create(p, false))
    try {
      out.writeByte(1) // file format version
      out.writeInt(data.length) // big-endian framing
      out.write(data)
      out.writeInt(crc32(data))
    } finally out.close()
    DvDescriptor("u", encodeUuid(uuid), offset = 1, sizeInBytes = data.length,
      cardinality = positions.distinct.length.toLong)
  }

  /** An inline (`storageType="i"`) descriptor for `positions`. */
  def inlineDescriptor(positions: Array[Long]): DvDescriptor = {
    var data = serialize(positions)
    if (data.length % 4 != 0) data = data ++ new Array[Byte](4 - data.length % 4) // Z85 pads to 4
    DvDescriptor("i", z85Encode(data), offset = 0, sizeInBytes = data.length,
      cardinality = positions.distinct.length.toLong)
  }

  /** Decode a descriptor's deleted row positions. `dvAbsPath` is the
    * already-resolved absolute DV file path for on-disk types (ignored
    * for inline) — path resolution is driver-side metadata work, the
    * byte decode runs here on executors. */
  def loadPositions(conf: Configuration, d: DvDescriptor, dvAbsPath: String): Array[Long] = {
    val out = d.storageType match {
      case "i" =>
        deserialize(z85Decode(d.pathOrInlineDv).take(math.max(d.sizeInBytes, 1)))
      case "u" | "p" =>
        val p = new Path(dvAbsPath)
        val in = new java.io.DataInputStream(p.getFileSystem(conf).open(p))
        try {
          var toSkip = d.offset.toLong
          while (toSkip > 0) toSkip -= in.skip(toSkip)
          val size = in.readInt() // big-endian framing
          require(size == d.sizeInBytes,
            s"deletion vector $dvAbsPath: stored size $size != descriptor sizeInBytes ${d.sizeInBytes}")
          val data = new Array[Byte](size)
          in.readFully(data)
          val check = in.readInt()
          require(check == crc32(data),
            s"deletion vector $dvAbsPath: CRC mismatch (stored $check)")
          deserialize(data)
        } finally in.close()
      case other =>
        throw new UnsupportedOperationException(
          s"deletion vector storageType '$other' (supported: u, i, p)")
    }
    require(out.length == d.cardinality,
      s"deletion vector decodes ${out.length} positions but descriptor declares " +
        s"cardinality ${d.cardinality} — refusing a torn/inconsistent vector")
    out
  }
}

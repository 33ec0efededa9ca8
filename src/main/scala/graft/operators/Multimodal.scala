package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star extension surface, SURVEY §7.5):
  * media as opaque `binary` columns with typed metadata, stub decode /
  * feature-extraction, and frame sampling.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake (documented below); everything Spark-side — binary
  * column handling, schema, batch iteration shape, partition parallelism —
  * is real and tested. Swapping [[stubDecode]] for a JNI/ONNX decoder
  * changes no plan shape.
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

  // ----- mapPartitions batch-decode path (ScalaTest-verified; the
  // ----- iterator shape a real decoder plugs into) -------------------

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: Long, features: Array[Float])

  /** STUB decoder: a real implementation would decode image/audio bytes
    * here (???-equivalent); this deterministic fake hashes byte windows
    * into an 8-dim feature vector so the batching/plumbing is testable. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { f(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    f
  }

  /** Partition-parallel batch decode over binary media columns: the Spark
    * plumbing (typed Dataset, per-partition iteration, no driver
    * collection) for a decode/feature-extract stage. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var ck = 0L
        r.media.foreach(b => ck = ck * 31 + (b & 0xff))
        MediaFeatures(r.doc_id, r.media.length.toLong, ck, stubDecode(r.media))
      }
    }
  }

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
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
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
    "mm_histo_neardup" -> (mmHistoNeardup _),
    "mm_meta_extract" -> (mmMetaExtract _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _),
    "mm_patch_tokens" -> (mmPatchTokens _),
    "mm_dedup_bytes" -> (mmDedupBytes _))

  val oracles: Map[String, String] = Map(
    "mm_histo_neardup" -> mmHistoNeardupSql,
    "mm_meta_extract" -> mmMetaExtractSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql,
    "mm_patch_tokens" -> mmPatchTokensSql,
    "mm_dedup_bytes" -> mmDedupBytesSql)
}

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta_extract" -> (mmMetaExtract _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _))

  val oracles: Map[String, String] = Map(
    "mm_meta_extract" -> mmMetaExtractSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql)
}

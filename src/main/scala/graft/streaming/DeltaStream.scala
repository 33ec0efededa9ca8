package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

/** STREAMING Delta source — tails a [[DeltaLog]] table's transaction log
  * as a Structured Streaming source (the connector tier the engine was
  * missing: everything upstream could only stream FROM files; a real
  * deployment streams from the lakehouse table other jobs append to).
  *
  * Offset model: the log VERSION is the offset — exactly the public
  * Delta streaming-source contract (initial snapshot at the stream's
  * first batch, then one micro-batch per committed version range).
  * Versions are immutable once committed, so `getBatch(start, end]` is a
  * pure function of the log and replays identically on restart: offsets
  * checkpointed by the engine give end-to-end exactly-once with any
  * idempotent sink (file sink, [[DeltaLog.appendBatch]]).
  *
  *  - `start = None` → INITIAL SNAPSHOT: the table's live file set AT
  *    `end` (one replay — compaction/vacuum history collapses for free).
  *  - `start = Some(v)` → TAIL: add actions of versions (v, end] with
  *    `dataChange = true`. OPTIMIZE rewrites (`dataChange = false` adds)
  *    are skipped — the data was already delivered; re-emitting a
  *    compaction would double-count at every scale.
  *  - A `dataChange = true` REMOVE in the tail (overwrite/delete) means
  *    the source cannot represent the change as an append; it REFUSES
  *    (like Delta's own source) unless `ignoreChanges=true`, in which
  *    case the new files are emitted and the rewrite is the caller's
  *    contract to handle downstream.
  *
  * Scale shape: each micro-batch plans ONE multi-file parquet scan over
  * just the new files (schema-asserted, filters/pruning push down as in
  * any batch scan); the log replay per trigger is metadata-sized and
  * checkpoint-bounded ([[DeltaLog.replay]]). State is a single long.
  *
  * The reference's pipeline reads its Delta tables only as batch
  * snapshots per cycle (reference pipeline/reduce.py:21,43); this source
  * is the continuous form of the same read.
  */
class DeltaStreamSource(
    spark: SparkSession,
    table: String,
    ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Int] = None,
    startingVersion: Option[Long] = None) extends Source with SupportsTriggerAvailableNow {

  import DeltaStreamSource.M

  override val schema: StructType = DeltaLog.snapshot(spark, table)._3

  override def getOffset: Option[V1Offset] = {
    val v = DeltaLog.latestVersion(spark, table)
    if (v < 0) None else Some(LongOffset(v))
  }

  /** ADMISSION CONTROL — `maxVersionsPerTrigger`: a table with a deep
    * backlog (or a brand-new stream over 100 TB of history) must not
    * become one giant first batch. With the limit set, each micro-batch
    * advances at most N versions; the very first batch is then the
    * snapshot at version `min(latest, N-1)` and the backlog drains as a
    * sequence of bounded batches (AvailableNow included — the engine's
    * wrapper keeps triggering until the prepared target is reached).
    * Versions, not files, are the granule because the offset is the
    * version: the cap composes with restart/exactly-once for free. */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Fixed at AvailableNow start (`prepareForTriggerAvailableNow`): the
    * drain's target. Implementing `SupportsTriggerAvailableNow` OURSELVES
    * (instead of the engine's generic wrapper) is what makes the rate
    * limit effective under AvailableNow — the generic wrapper cannot
    * split arbitrary offsets and jumps to the prepared end in one batch;
    * a version offset splits exactly. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(DeltaLog.latestVersion(spark, table))

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val latest = availableNowTarget.getOrElse(DeltaLog.latestVersion(spark, table))
    if (latest < 0) return null
    val startV = Option(start).map(verAny)
      .orElse(startingVersion.map(_ - 1)).getOrElse(-1L)
    val end = limit match {
      case f: ReadMaxFiles => math.min(latest, startV + f.maxFiles())
      case _ => latest
    }
    if (end <= startV) start else LongOffset(end)
  }

  override def reportLatestOffset(): V2Offset = {
    val v = DeltaLog.latestVersion(spark, table)
    if (v < 0) null else LongOffset(v)
  }

  private def verAny(o: V2Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  private def ver(o: V1Offset): Long = verAny(o)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = ver(end)
    start match {
      case None if startingVersion.isEmpty =>
        // initial snapshot: the replayed live set at endV
        StreamBridge.asStreaming(DeltaLog.read(spark, table, endV))
      case None =>
        // startingVersion: no snapshot — tail from that version on (the
        // public Delta source's time-travel streaming option; rows in
        // later-removed files stream as they were appended, append-only)
        tailBatch(startingVersion.get - 1, endV)
      case Some(s) => tailBatch(ver(s), endV)
    }
  }

  /** Add-actions of versions (startV, endV] as one multi-file scan. */
  private def tailBatch(startV: Long, endV: Long): DataFrame = {
    val adds = Seq.newBuilder[(String, com.fasterxml.jackson.databind.JsonNode)]
    for (v <- (startV + 1) to endV; line <- DeltaLog.readCommit(spark, table, v)) {
      val n = M.readTree(line)
      if (n.has("add")) {
        val a = n.get("add")
        if (a.has("deletionVector") && !a.get("deletionVector").isNull)
          throw new UnsupportedOperationException(
            s"version $v of $table adds a file with a deletion vector; the " +
              "streaming tail reads commit files whole and cannot mask its " +
              "deleted rows (even under ignoreChanges)")
        if (!a.has("dataChange") || a.get("dataChange").asBoolean(true))
          adds += a.get("path").asText() -> a
      }
      if (n.has("remove") && n.get("remove").path("dataChange").asBoolean(true) &&
          !ignoreChanges)
        throw new IllegalStateException(
          s"version ${v} of $table removes data (overwrite/delete); a streaming " +
            "tail cannot represent that as an append — set ignoreChanges=true " +
            "to stream the rewritten files anyway")
    }
    val files = adds.result()
    // schema/partition layout at endV (additive evolution is safe:
    // new files carry the new schema, the scan asserts it)
    val tailSchema = DeltaLog.snapshot(spark, table, endV)._3
    val partCols = DeltaLog.partitionColumnsAt(spark, table, endV)
    if (files.isEmpty) StreamBridge.emptyStreaming(spark, tailSchema)
    else if (partCols.isEmpty)
      StreamBridge.asStreaming(
        // resolvedPath: adds may be absolute (a shallow clone's v0, a
        // foreign writer) — same rule as every DeltaLog scan
        spark.read.schema(tailSchema).parquet(
          files.map(f => DeltaLog.resolvedPath(table, f._1)): _*))
    else
      StreamBridge.asStreaming(
        DeltaLog.readPartitioned(spark, table, files, tailSchema, partCols))
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaStreamSource[$table]"
}

object DeltaStreamSource {
  private val M = new com.fasterxml.jackson.databind.ObjectMapper()
}

/** `spark.readStream.format("graft.streaming.DeltaStreamProvider")
  * .option("path", table).load()` — V1 StreamSourceProvider: schema from
  * the log's metaData, one source instance per query. AvailableNow /
  * restart semantics come from the engine (Spark wraps V1 sources for
  * AvailableNow); `ignoreChanges` mirrors the public Delta option. */
class DeltaStreamProvider extends StreamSourceProvider {

  private def table(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta stream source requires .option(\"path\", <table dir>)"))

  override def sourceSchema(
      ctx: SQLContext, userSchema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) =
    ("graft-delta", userSchema.getOrElse(
      DeltaLog.snapshot(ctx.sparkSession, table(params))._3))

  override def createSource(
      ctx: SQLContext, metadataPath: String, userSchema: Option[StructType],
      providerName: String, params: Map[String, String]): Source =
    new DeltaStreamSource(ctx.sparkSession, table(params),
      ignoreChanges = params.get("ignoreChanges").exists(_.toBoolean),
      maxVersionsPerTrigger = params.get("maxVersionsPerTrigger").map(_.toInt),
      startingVersion = params.get("startingVersion").map(_.toLong))
}

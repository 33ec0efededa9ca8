package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental JSON-lines → parquet ingestion as ONE Structured Streaming
  * query per table — the Spark-native form of the reference's per-file
  * task fan-out (reference pipeline/preprocess.py:35-59, workflow.py:16-19):
  *
  *  - S7 discovery: the file source lists `stagingDir/<table>` each
  *    micro-batch and processes only unseen files (tracked in the
  *    checkpoint's source log — the reference re-lists with
  *    `rglob("*.json")` and relies on delete-after-ingest instead).
  *  - S4 read: schema-asserted JSON-lines (`spark.readStream.schema(s)
  *    .json(dir)`) — no inference scan, unlike the reference's pandas
  *    `read_json` (SURVEY §1.3).
  *  - T1/T2 cadence: `Trigger.AvailableNow` drains everything staged,
  *    in bounded micro-batches (`maxFilesPerTrigger`), then stops — the
  *    scheduled-batch shape of the reference's 15-minute Prefect flow.
  *    A long-lived deployment would use `Trigger.ProcessingTime`.
  *  - K2/T3 exactly-once append: the parquet sink records committed
  *    files in `_spark_metadata`; batch reads of the table honor that
  *    commit log, so a batch that fails mid-write is invisible until
  *    retried — the role Delta's transaction log plays in the reference
  *    (reference pipeline/preprocess.py:41-44). Re-running the stream
  *    with the same checkpoint re-processes nothing (T5 idempotency).
  *  - K3 retirement: `cleanSource=delete` removes a batch's source
  *    files once a SUBSEQUENT batch commits (reference `fs.rm`,
  *    pipeline/preprocess.py:45) — asynchronous and one batch late, so
  *    a quiesced stream leaves its final batch's files staged until the
  *    next cycle. That is at-least-once retirement, and it is safe: the
  *    checkpoint's source log, not file absence, prevents re-reads.
  *  - T4 mutual exclusion: one streaming query owns one sink; Spark
  *    serializes micro-batches within a query by construction, replacing
  *    the reference's FileLock (reference pipeline/settings.py:37-40).
  *
  * Scale: ingestion parallelism is input-file × partition parallelism on
  * executors; the driver only coordinates micro-batch boundaries. At
  * 100 TB/day this is the same query with a bigger `maxFilesPerTrigger`
  * and a real cluster — no code change.
  */
object Ingest {

  /** Drain everything currently staged for `table` into
    * `tablesDir/<table>`, exactly once. Blocks until the drain finishes.
    *
    * Crash-consistency guard: the streaming checkpoint (source log) and
    * the sink's `_spark_metadata` (commit log) must live and die
    * together. A maintenance crash can strand either half, and both
    * stranded states lose data SILENTLY if a drain proceeds:
    *  - checkpoint WITHOUT sink log (crash during the first-ever drain
    *    before any commit): resuming is safe only because nothing was
    *    committed — the checkpoint is retired and discovery restarts;
    *    no staged file was deleted (retirement is post-commit), so
    *    nothing is lost or doubled.
    *  - sink log WITHOUT checkpoint (crash between a compaction's
    *    checkpoint retirement and its table swap): a fresh query would
    *    number batches from 0, and FileStreamSink skips every batchId
    *    already in the sink log — the new data would be dropped without
    *    an error. Deleting the log instead would hide the OLD files
    *    from the fresh log the new query writes. There is no safe
    *    automatic choice at this layer, so it FAILS LOUD; the
    *    orchestrator repairs by finishing the compaction
    *    ([[PipelineMain]] does this on startup), which retires the log
    *    and returns the table to plain-parquet listing. */
  def drainTable(spark: SparkSession, stagingDir: String, tablesDir: String,
                 ckptDir: String, table: String, schema: StructType,
                 maxFilesPerTrigger: Int = 8): Unit =
    streamTable(spark, stagingDir, tablesDir, ckptDir, table, schema,
      Trigger.AvailableNow(), maxFilesPerTrigger).awaitTermination()

  /** Start (and return, still running) the ingestion query for `table`
    * under an arbitrary trigger — `Trigger.AvailableNow` gives the
    * batch-drain cadence ([[drainTable]] wraps it), a
    * `Trigger.ProcessingTime` gives the long-lived wall-clock mode the
    * reference's 15-minute schedule corresponds to
    * ([[PipelineMain.runLive]]). The crash-consistency guard runs either
    * way. */
  def streamTable(spark: SparkSession, stagingDir: String, tablesDir: String,
                  ckptDir: String, table: String, schema: StructType,
                  trigger: Trigger,
                  maxFilesPerTrigger: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    val ckptPath = s"$ckptDir/$table"
    val sinkLog = s"$tablesDir/$table/_spark_metadata"
    if (Fs.exists(spark, ckptPath) && !Fs.exists(spark, sinkLog))
      Fs.deleteRec(spark, ckptPath) // no commit ever happened; restart discovery
    if (!Fs.exists(spark, ckptPath) && Fs.exists(spark, sinkLog))
      throw new IllegalStateException(
        s"table $table has a sink commit log but no checkpoint — an interrupted " +
          "compaction left it half-retired; finish the compaction (retire the log " +
          "by rewriting the table) before draining, or new batches would be " +
          "silently skipped against the stale log")
    val src = spark.readStream
      .schema(schema)
      .option("timestampFormat", Synthesize.TsFmt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("cleanSource", "delete")
      .json(s"$stagingDir/$table")
    src.writeStream
      .format("parquet")
      .option("path", s"$tablesDir/$table")
      .option("checkpointLocation", s"$ckptDir/$table")
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** Drain all staged tables CONCURRENTLY (skips tables never staged):
    * each table is its own streaming query over its own checkpoint and
    * sink, with no cross-table dependency at ingest time (the
    * reference's O3 ordering constraint binds GENERATION — the keymap
    * must exist before lineitem is staged — not ingestion of the
    * self-contained staged files). Starting all queries before awaiting
    * any overlaps their micro-batches across the executor pool — on a
    * cluster, table count × file × partition parallelism instead of one
    * table at a time. Guard failures (the stranded-sink-log state)
    * still surface: start() runs the guard synchronously per table
    * before anything is awaited. */
  def drainAll(spark: SparkSession, stagingDir: String, tablesDir: String,
               ckptDir: String, schemas: Map[String, StructType]): Unit = {
    val queries = schemas.toSeq.collect {
      case (table, schema)
        if Fs.exists(spark, s"$stagingDir/$table") ||
          Fs.exists(spark, s"$ckptDir/$table") =>
        streamTable(spark, stagingDir, tablesDir, ckptDir, table, schema,
          Trigger.AvailableNow())
    }
    queries.foreach(_.awaitTermination())
  }
}

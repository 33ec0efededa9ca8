package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.Schemas

/** Runnable end-to-end pipeline — the `workflow.py` equivalent
  * (reference workflow.py:12-31): per cycle, GENERATE staged data →
  * INGEST it through the streaming drain → every `compactEvery` cycles
  * COMPACT the tables → REDUCE (the flagship Q3 variant per market
  * segment) → SERVE the results as one parquet file per segment.
  *
  * The reference runs these as four Prefect schedules (15 min / 15 min /
  * 6 h / 24 h) serialized by a shared FileLock
  * (pipeline/settings.py:37-40). Both forms exist here:
  *  - [[runPipeline]] drives N cycles back-to-back with
  *    `Trigger.AvailableNow` standing in for the wall-clock cadence (T1);
  *  - [[runLive]] is the long-lived form: ingestion runs as resident
  *    `Trigger.ProcessingTime` streaming queries while the generator
  *    stages batches on a wall-clock cadence.
  * Every maintenance step (generate+drain cycle, compaction, reduce)
  * holds the workDir's [[PipelineLock]], so overlapping invocations —
  * threads or separate JVMs — serialize instead of interleaving
  * destructively (T4 across processes). Work ordering inside a cycle
  * follows the reference's dependency (orders staged before lineitem so
  * the uuid keymap exists before it is consumed — O3,
  * reference pipeline/data.py:62).
  *
  * Usage: PipelineMain <sfDir> <workDir> [nCycles] [compactEvery] [--live] [--serve]
  */
object PipelineMain {

  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  private def schemas = Map(
    "orders" -> Schemas.stagedOrders,
    "lineitem" -> Schemas.stagedLineitem,
    "customer" -> Schemas.customer)

  private def lockFile(workDir: String) = s"$workDir/.pipeline.lock"

  /** Compact quiesced tables: synchronously retire committed staged
    * tail files first (the drain completed, so everything still staged
    * IS committed — the reference's rm-after-ingest, K3), then retire
    * the streaming checkpoint, THEN rewrite + swap + vacuum.
    *
    * Checkpoint-before-swap ordering is load-bearing: compactTable
    * retires the sink's `_spark_metadata` log, and if a crash left the
    * OLD checkpoint behind, the next cycle's drain would resume from it
    * and append under a FRESH sink log starting at batch 0 — which takes
    * precedence over directory listing and hides every compacted file
    * from batch readers (silent row loss). With the checkpoint retired
    * first, every crash point is safe: dying before compactTable leaves
    * the table + old sink log fully consistent and the next drain simply
    * starts a fresh checkpoint (the staged tail was already committed,
    * so nothing is re-ingested). */
  private def compact(spark: SparkSession, staging: String, tables: String,
                      ckpt: String, names: Seq[String]): Unit =
    names.foreach { t =>
      val dir = s"$tables/$t"
      if (Fs.exists(spark, dir)) {
        Fs.deleteRec(spark, s"$staging/$t")
        Fs.deleteRec(spark, s"$ckpt/$t")
        val (b, a) = Compact.compactTable(spark, dir) // size-derived target
        println(s"[pipeline] compacted $t: $b -> $a files")
      }
    }

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = pos.lift(1).getOrElse("/root/repo/target/pipe/main")
    val nCycles = pos.lift(2).map(_.toInt).getOrElse(4)
    val compactEvery = pos.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TypedImperativeAggregate (SimhashAgg) groups exceed the 128-entry
      // sort-fallback default in every partition at any real scale; keep
      // the map-side hash aggregate hashed.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Sort-based shuffle writer for EVERY exchange (r14, SCALE.md
      // round-14): the default bypassMergeThreshold=200 routes <=200-
      // partition shuffles through the per-reducer-file writer — one
      // file create per (map task x reducer), which on this host's
      // filesystem dominated the dd_* map stages (dd_containment x100n:
      // 11-30 s bypass vs 2.8-4.7 s sort writer, non-monotonic in the
      // partition count because 183 vs 276 straddled the threshold).
      // The single-spill-file sort writer is also the only writer that
      // exists at real cluster reducer counts.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val servePort = sys.env.getOrElse("GRAFT_SERVE_PORT", "8080").toInt
    val live = args.contains("--live")
    val wantServe = args.contains("--serve")
    val srv =
      if (live)
        // in live mode the service is up DURING ingestion, republishing
        // every compactEvery batches — the resident deployment form
        runLive(spark, sfDir, workDir, nBatches = nCycles,
          cadenceMs = 2000L, processingTimeMs = 500L,
          serve = wantServe, publishEvery = compactEvery, servePort = servePort)
      else {
        runPipeline(spark, sfDir, workDir, nCycles, compactEvery)
        if (wantServe)
          Some(Serve.start(spark, s"$workDir/results", Segments, port = servePort,
            watchdogMs = 1000L))
        else None
      }
    srv.foreach { s =>
      println(s"[pipeline] serving results on port ${s.port} (GET /health, " +
        s"/segments, /results/<segment>); Ctrl-C to stop")
      Thread.currentThread().join()
    }
    spark.stop()
  }

  /** Crash repair (run under the lock before any cycle): a previous run
    * that died between a compaction's checkpoint retirement and its
    * table swap leaves a sink commit log with no checkpoint — the one
    * state [[Ingest.drainTable]] fails loud on (a fresh drain would
    * silently skip batches against the stale log). Finishing the
    * compaction retires the log and returns the table to plain-parquet
    * listing; every other crash point is already consistent (see
    * compact()'s ordering note). */
  private def repair(spark: SparkSession, tables: String, ckpt: String): Unit =
    for (t <- schemas.keys) {
      if (Fs.exists(spark, s"$tables/$t/_spark_metadata") &&
          !Fs.exists(spark, s"$ckpt/$t")) {
        val (b, a) = Compact.compactTable(spark, s"$tables/$t")
        println(s"[pipeline] crash-repaired $t via compaction: $b -> $a files")
      }
    }

  /** The whole workflow on a caller-owned session (what `main` wraps;
    * also the E2E test entry). */
  def runPipeline(spark: SparkSession, sfDir: String, workDir: String,
                  nCycles: Int, compactEvery: Int): Unit = {
    runCycles(spark, sfDir, workDir, 0 until nCycles, nCycles, compactEvery)
    finishAndServe(spark, sfDir, workDir)
  }

  /** Bounded exponential-backoff retry — the reference's Prefect task
    * policy (retries with exponential backoff around every ingest task,
    * reference pipeline/preprocess.py:22-27) as a plain combinator. A
    * transient failure (FS hiccup, interrupted drain) heals without
    * manual restart BECAUSE every retried unit is idempotent: staging
    * re-writes the same content-addressed files, drains are
    * exactly-once against their sink commit log, compaction re-checks
    * its inputs — so a half-done attempt plus a full retry equals one
    * clean run. After `maxAttempts` the last failure propagates
    * (fail-loud, not spin-forever). `sleep` is a test seam. */
  private[streaming] def withRetry[T](what: String, maxAttempts: Int = 10,
                                      baseDelayMs: Long = 100L,
                                      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case scala.util.control.NonFatal(e) if attempt < maxAttempts =>
          val delay = baseDelayMs << math.min(attempt - 1, 6)
          println(s"[pipeline] $what failed (attempt $attempt/$maxAttempts): " +
            s"${e.getMessage}; retrying in ${delay}ms")
          sleep(delay)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Generate+drain the given batch slices, one lock-held cycle each.
    * Two overlapping invocations (same workDir, DISJOINT batch ids —
    * the reference's two schedulers generating distinct data) serialize
    * at cycle granularity: a drain never observes a half-staged batch
    * or races a compaction for the shared checkpoints. A failed cycle
    * retries whole with backoff ([[withRetry]]) — the lock is released
    * between attempts, so a competing healthy invocation is never
    * starved by a sick one. `chaos` is a crash-injection test seam
    * called between staging and drain. */
  def runCycles(spark: SparkSession, sfDir: String, workDir: String,
                batchIds: Seq[Int], nBatches: Int, compactEvery: Int,
                chaos: Int => Unit = _ => ()): Unit = {
    val staging = s"$workDir/staging"
    val tables = s"$workDir/tables"
    val ckpt = s"$workDir/ckpt"
    PipelineLock.withLock(lockFile(workDir))(repair(spark, tables, ckpt))
    for (cycle <- batchIds) {
      withRetry(s"cycle $cycle") {
        PipelineLock.withLock(lockFile(workDir)) {
          Synthesize.cycle(spark, sfDir, staging, tables, batchId = cycle, nBatches = nBatches)
          chaos(cycle)
          Ingest.drainAll(spark, staging, tables, ckpt, schemas)
          if ((cycle + 1) % compactEvery == 0)
            compact(spark, staging, tables, ckpt, Seq("customer"))
        }
      }
      println(s"[pipeline] cycle $cycle complete")
    }
  }

  /** Final maintenance + reduce + serve, under the lock. EVERY ingested
    * table compacts here because no further appends target any of them —
    * without a transactional format, compaction must quiesce a table
    * first. The dim also compacts mid-run on the reference's cadence
    * (runCycles' compactEvery), but that boundary only coincides with
    * the LAST append when nCycles % compactEvery == 0, and live mode
    * has no mid-run compaction at all — so relying on the cadence left
    * a finished run with `customer` still under a streaming sink log
    * (found by the r11 live-mode chaos soak: CONTROL and chaos runs
    * both kept `tables/customer/_spark_metadata` after a clean finish,
    * leaving the dir unreadable-as-plain-parquet to external tools and
    * the next drain pinned to a stale checkpoint lineage). Compaction
    * is idempotent on an already-compacted table, so the unconditional
    * finish-time pass costs one small rewrite at most.
    * ([[Manifest]] is the compaction-under-append form.) Idempotent:
    * a second invocation re-compacts a plain parquet dir and
    * re-overwrites the served results. */
  def finishAndServe(spark: SparkSession, sfDir: String, workDir: String): Unit =
    PipelineLock.withLock(lockFile(workDir)) {
      val staging = s"$workDir/staging"
      val tables = s"$workDir/tables"
      val ckpt = s"$workDir/ckpt"
      compact(spark, staging, tables, ckpt, Seq("orders", "lineitem", "customer"))
      publishResults(spark, workDir)
    }

  /** REDUCE + PUBLISH: the flagship per segment over the INGESTED
    * tables (staged schema: uuid keys, *_time columns — the
    * reference's reduce reads the same processed form,
    * pipeline/reduce.py:43-74). Each segment's top-50 is computed to a
    * STAGING path first and only then swapped into the served location
    * (retire + rename), so the window where a result directory holds a
    * HALF-written generation never exists — a concurrently-running
    * [[Serve]] sees the old committed generation, a beat of
    * absent-directory (its cache covers that), then the new one:
    * read-your-republish, never a torn read. Idempotent — a republish
    * overwrites its own staging and swaps again. Caller holds the
    * pipeline lock (or is [[runLive]]'s generator loop, which takes
    * it). */
  def publishResults(spark: SparkSession, workDir: String): Unit = {
    val tables = s"$workDir/tables"
    val results = s"$workDir/results"
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$tables/lineitem")
    val ord = spark.read.parquet(s"$tables/orders")
    val cust = spark.read.parquet(s"$tables/customer")
    val cutoff = lit(Synthesize.OrdTgtHi).cast("timestamp")
    for (seg <- Segments) {
      val top = ord.filter(col("o_order_time") < cutoff)
        .join(cust.filter(col("c_mktsegment") === seg), col("o_custkey") === col("c_custkey"))
        .join(li.filter(col("l_ship_time") > cutoff), col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_order_time")
        .agg(graft.functions.Exact.exactSum(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(50)
      val stage = s"$results/.stage_$seg"
      top.coalesce(1).write.mode("overwrite")
        .option("compression", "snappy").parquet(stage)
      Fs.deleteRec(spark, s"$results/$seg")
      Fs.renameOrFail(spark, stage, s"$results/$seg")
      println(s"[pipeline] served $seg: ${spark.read.parquet(s"$results/$seg").count()} rows")
    }
  }

  /** Long-lived wall-clock mode (the deployment form of the reference's
    * 15-minute schedules): resident `Trigger.ProcessingTime` ingestion
    * queries discover and commit staged batches as they appear, while
    * the generator stages a batch every `cadenceMs` under the lock.
    * After `nBatches` the streams stop gracefully and one
    * `AvailableNow` mop-up drain pins the deterministic end state
    * (everything staged is committed), then compact + reduce + serve.
    * Exactly-once holds throughout — the resident queries and the
    * mop-up share the same checkpoints.
    *
    * `serve = true` starts the [[Serve]] HTTP layer BEFORE the loop
    * (health answers "waiting" until the first publish) and returns it
    * running — the resident deployment form: the service is up while
    * ingestion streams and reduce republishes race underneath it, and
    * its generation-keyed cache carries readers across each republish
    * swap. `publishEvery = k` re-runs the reduce after every k-th
    * staged batch (under the lock, against whatever the resident
    * streams have committed so far — the reference's independent
    * 15-min ingest / 24-h reduce schedules compressed onto one
    * cadence). Caller stops the returned server. */
  def runLive(spark: SparkSession, sfDir: String, workDir: String,
              nBatches: Int, cadenceMs: Long, processingTimeMs: Long,
              serve: Boolean = false, publishEvery: Int = 0,
              servePort: Int = 0, onServe: Serve => Unit = _ => ()): Option[Serve] = {
    val staging = s"$workDir/staging"
    val tables = s"$workDir/tables"
    val ckpt = s"$workDir/ckpt"
    PipelineLock.withLock(lockFile(workDir)) {
      repair(spark, tables, ckpt)
      schemas.keys.foreach(t => Fs.mkdirs(spark, s"$staging/$t"))
    }
    // supervised (r13): runLive is the resident deployment form, so its
    // service carries the watchdog — a dead listener redeploys on the
    // same port while ingestion streams continue (reference
    // dashboard.py:52-61's health-check + redeploy loop)
    val srv = if (serve) Some(Serve.start(spark, s"$workDir/results", Segments, servePort,
                 watchdogMs = 500L))
              else None
    srv.foreach(onServe) // hand the running server out BEFORE the loop (test seam / supervisor registration)
    val queries = schemas.map { case (t, s) =>
      Ingest.streamTable(spark, staging, tables, ckpt, t, s,
        Trigger.ProcessingTime(processingTimeMs))
    }.toSeq
    try {
      for (b <- 0 until nBatches) {
        PipelineLock.withLock(lockFile(workDir)) {
          Synthesize.cycle(spark, sfDir, staging, tables, batchId = b, nBatches = nBatches)
        }
        println(s"[pipeline] live: staged batch $b")
        Thread.sleep(cadenceMs)
        if (publishEvery > 0 && (b + 1) % publishEvery == 0 &&
            schemas.keys.forall(t => Fs.exists(spark, s"$tables/$t"))) {
          // mid-run republish against the streams' committed state so
          // far; the lock serializes it with the generator, and Serve's
          // cache carries readers across the swap (skipped while the
          // resident streams haven't committed all tables yet)
          PipelineLock.withLock(lockFile(workDir))(publishResults(spark, workDir))
          println(s"[pipeline] live: republished results after batch $b")
        }
      }
    } finally {
      queries.foreach(_.stop())
      queries.foreach { q =>
        try q.awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      }
    }
    PipelineLock.withLock(lockFile(workDir)) {
      Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    }
    finishAndServe(spark, sfDir, workDir)
    srv
  }
}

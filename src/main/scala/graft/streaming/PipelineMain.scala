package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.Schemas

/** Runnable end-to-end pipeline — the `workflow.py` equivalent
  * (reference workflow.py:12-31): per cycle, GENERATE staged data →
  * INGEST it through the streaming drain → every `compactEvery` cycles
  * COMPACT the tables → REDUCE (the flagship Q3 variant per market
  * segment) → SERVE the results as one parquet file per segment.
  *
  * The reference runs these as four Prefect schedules (15 min / 15 min /
  * 6 h / 24 h); here one main drives N cycles back-to-back with
  * `Trigger.AvailableNow` standing in for the wall-clock cadence (T1) —
  * a deployment would run the same calls from its scheduler, or switch
  * the ingest trigger to `ProcessingTime`. Work ordering inside a cycle
  * follows the reference's dependency (orders staged before lineitem so
  * the uuid keymap exists before it is consumed — O3,
  * reference pipeline/data.py:62).
  *
  * Usage: PipelineMain <sfDir> <workDir> [nCycles] [compactEvery]
  */
object PipelineMain {

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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = args.lift(1).getOrElse("/root/repo/target/pipe/main")
    val nCycles = args.lift(2).map(_.toInt).getOrElse(4)
    val compactEvery = args.lift(3).map(_.toInt).getOrElse(2)
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
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runPipeline(spark, sfDir, workDir, nCycles, compactEvery)
    spark.stop()
  }

  /** The whole workflow on a caller-owned session (what `main` wraps;
    * also the E2E test entry). */
  def runPipeline(spark: SparkSession, sfDir: String, workDir: String,
                  nCycles: Int, compactEvery: Int): Unit = {
    val staging = s"$workDir/staging"
    val tables = s"$workDir/tables"
    val ckpt = s"$workDir/ckpt"
    val results = s"$workDir/results"
    val schemas = Map(
      "orders" -> Schemas.stagedOrders,
      "lineitem" -> Schemas.stagedLineitem,
      "customer" -> Schemas.customer)

    // Crash repair: a previous run that died between a compaction's
    // checkpoint retirement and its table swap leaves a sink commit log
    // with no checkpoint — the one state [[Ingest.drainTable]] fails
    // loud on (a fresh drain would silently skip batches against the
    // stale log). Finishing the compaction retires the log and returns
    // the table to plain-parquet listing; every other crash point is
    // already consistent (see compact()'s ordering note).
    for (t <- schemas.keys) {
      if (Fs.exists(spark, s"$tables/$t/_spark_metadata") &&
          !Fs.exists(spark, s"$ckpt/$t")) {
        val (b, a) = Compact.compactTable(spark, s"$tables/$t")
        println(s"[pipeline] crash-repaired $t via compaction: $b -> $a files")
      }
    }

    for (cycle <- 0 until nCycles) {
      Synthesize.cycle(spark, sfDir, staging, tables, batchId = cycle, nBatches = nCycles)
      Ingest.drainAll(spark, staging, tables, ckpt, schemas)
      if ((cycle + 1) % compactEvery == 0)
        compact(spark, staging, tables, ckpt, Seq("customer"))
      println(s"[pipeline] cycle $cycle complete")
    }
    // Final maintenance: compact the fact tables now that no further
    // appends target them. Without a transactional table format,
    // compaction must quiesce a table first: the swap retires the
    // streaming sink's _spark_metadata log, and a LATER streaming
    // append would start a new log that hides the compacted files from
    // batch readers (the log takes precedence). The static dim is
    // append-quiesced after cycle 0, so it compacts mid-run on the
    // reference's cadence; facts compact here. Delta/Iceberg is the
    // production answer for compaction interleaved with live appends
    // (SURVEY §7 — no such jars offline).
    compact(spark, staging, tables, ckpt, Seq("orders", "lineitem"))

    // REDUCE + SERVE: the flagship per segment over the INGESTED tables
    // (staged schema: uuid keys, *_time columns — the reference's
    // reduce reads the same processed form, pipeline/reduce.py:43-74)
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$tables/lineitem")
    val ord = spark.read.parquet(s"$tables/orders")
    val cust = spark.read.parquet(s"$tables/customer")
    val cutoff = lit(Synthesize.OrdTgtHi).cast("timestamp")
    for (seg <- Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")) {
      val top = ord.filter(col("o_order_time") < cutoff)
        .join(cust.filter(col("c_mktsegment") === seg), col("o_custkey") === col("c_custkey"))
        .join(li.filter(col("l_ship_time") > cutoff), col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_order_time")
        .agg(graft.functions.Exact.exactSum(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(50)
      top.coalesce(1).write.mode("overwrite")
        .option("compression", "snappy").parquet(s"$results/$seg")
      println(s"[pipeline] served $seg: ${spark.read.parquet(s"$results/$seg").count()} rows")
    }
  }
}

package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Schemas
import graft.sources.Tables

/** End-to-end pipeline behavior the oracle's checksums don't pin down at
  * the file level: incremental append counts, idempotent re-drain,
  * source-file retirement, static-dim skip, and compaction invariants. */
class PipelineSpec extends SparkSpec {

  private val base = "/root/repo/target/test-pipe"

  private def wipe(dir: String): Unit = Compact.deleteRecPublic(spark, dir)

  private def jsonFiles(dir: String): Long = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(f => f.toString.endsWith(".json")).count() finally s.close()
    }
  }

  test("ingest: incremental batches accumulate exactly the fixture row counts; re-drain is a no-op; staged files retire") {
    val root = s"$base/ingest"
    wipe(root)
    val staging = s"$root/staging"; val tables = s"$root/tables"; val ckpt = s"$root/ckpt"
    val schemas = Map(
      "orders" -> Schemas.stagedOrders,
      "lineitem" -> Schemas.stagedLineitem,
      "customer" -> Schemas.customer)

    Synthesize.cycle(spark, sf, staging, tables, batchId = 0, nBatches = 2)
    assert(jsonFiles(s"$staging/customer") > 0, "static dim staged on first cycle")
    Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    val ordersB0 = spark.read.parquet(s"$tables/orders").count()
    val fixtureOrders = Tables.orders(spark, sf).count()
    val evenOrders = Tables.orders(spark, sf).filter(col("o_orderkey") % 2 === 0).count()
    assert(ordersB0 == evenOrders, "first drain should hold exactly the batch-0 slice")

    Synthesize.cycle(spark, sf, staging, tables, batchId = 1, nBatches = 2)
    // (batch-0's customer file may still await the async cleaner here,
    // so assert specifically that no batch-1 customer file was created)
    val p = Paths.get(s"$staging/customer")
    val restaged = if (!Files.exists(p)) 0L
      else Files.walk(p).filter(f => f.getFileName.toString.contains("_b1_")).count()
    assert(restaged == 0, "static dim must NOT be re-staged once ingested (T5)")
    Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    assert(spark.read.parquet(s"$tables/orders").count() == fixtureOrders)
    assert(spark.read.parquet(s"$tables/lineitem").count() == Tables.lineitem(spark, sf).count())
    assert(spark.read.parquet(s"$tables/customer").count() == Tables.customer(spark, sf).count())

    // idempotent no-op drain: nothing staged, nothing appended
    Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    assert(spark.read.parquet(s"$tables/orders").count() == fixtureOrders,
      "re-drain with empty staging duplicated rows — exactly-once broken")

    // K3 retirement: FileStreamSource deletes a batch's files when a
    // SUBSEQUENT batch commits (and the cleaner is async) — so batch-0
    // fact files must be gone after the batch-1 drain, while the last
    // committed batch per table may leave one tail file until the next
    // cycle. Poll for the async cleaner, then assert exactly that.
    def b0FactFiles(): Long = {
      val p = Paths.get(staging)
      if (!Files.exists(p)) 0L
      else {
        val s = Files.walk(p)
        try s.filter { f =>
          val n = f.getFileName.toString
          n.endsWith(".json") && n.contains("_b0_") && !n.startsWith("customer")
        }.count() finally s.close()
      }
    }
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (b0FactFiles() > 0 && System.nanoTime() < deadline) Thread.sleep(250)
    assert(b0FactFiles() == 0,
      "batch-0 staged files were not retired after the batch-1 commit")
  }

  test("ingest quarantine: a corrupt JSON line is captured, good rows land (PERMISSIVE)") {
    val root = s"$base/corrupt"
    wipe(root)
    val staging = s"$root/staging/orders"
    Files.createDirectories(Paths.get(staging))
    // two good lines + one broken one, as a staged file
    Files.writeString(Paths.get(s"$staging/orders_b0_p0000.json"),
      """{"o_orderkey":"k1","o_custkey":1,"o_orderstatus":"O","o_totalprice":10.5,"o_order_time":"2024-01-01T00:00:00.000000Z","o_orderpriority":"1-URGENT"}
        |{"o_orderkey":"k2","o_custkey":2,"o_orderstatus":"F","o_totalprice":THIS_IS_NOT_JSON
        |{"o_orderkey":"k3","o_custkey":3,"o_orderstatus":"P","o_totalprice":30.5,"o_order_time":"2024-01-01T00:05:00.000000Z","o_orderpriority":"3-MEDIUM"}
        |""".stripMargin)
    // PERMISSIVE + corrupt-record column: bad lines become quarantine
    // rows instead of failing the batch (the reference's answer was 10
    // Prefect retries that would never succeed on a poison file)
    val schema = Schemas.stagedOrders
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val src = spark.readStream.schema(schema)
      .option("timestampFormat", Synthesize.TsFmt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(staging)
    val q = src.writeStream.format("parquet")
      .option("path", s"$root/tables/orders")
      .option("checkpointLocation", s"$root/ckpt/orders")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val t = spark.read.parquet(s"$root/tables/orders")
    assert(t.count() == 3, "expected 2 good + 1 quarantined row")
    assert(t.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(t.filter(col("_corrupt_record").isNull).count() == 2)
    assert(t.filter(col("o_orderkey") === "k1").count() == 1)
    assert(t.filter(col("o_orderkey") === "k3").count() == 1)
  }

  test("PipelineMain E2E: generate->ingest->compact->reduce->serve produces 5 segment results") {
    val root = s"$base/main-e2e"
    wipe(root)
    PipelineMain.runPipeline(spark, sf, root, nCycles = 2, compactEvery = 1)
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    segs.foreach { seg =>
      val res = spark.read.parquet(s"$root/results/$seg")
      assert(res.count() == 50, s"segment $seg should serve exactly top-50")
      assert(res.columns.sorted.sameElements(Array("l_orderkey", "o_order_time", "revenue")))
      // one data file per segment result, like the reference's layout
      assert(res.inputFiles.length == 1)
    }
    // the ingested fact tables hold the full fixture after both cycles
    assert(spark.read.parquet(s"$root/tables/orders").count() ==
      graft.sources.Tables.orders(spark, sf).count())
  }

  test("serve: health flips 503->200 when all segments land; results serve as JSON; republish is picked up without restart") {
    val root = s"$base/serve"
    wipe(root)
    val results = s"$root/results"
    val segs = Seq("AUTOMOBILE", "BUILDING")
    val srv = Serve.start(spark, results, segs)
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def get(path: String): (Int, String) = {
        val r = http.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${srv.port}$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      // not ready: no results yet
      assert(get("/health")._1 == 503)
      assert(get("/results/AUTOMOBILE")._1 == 503)
      // publish both segments (top-3 shaped like the reduce's output)
      val ord = Tables.orders(spark, sf)
      segs.foreach { s =>
        ord.limit(3).coalesce(1).write.mode("overwrite").parquet(s"$results/$s")
      }
      val (hc, hb) = get("/health")
      assert(hc == 200 && hb.contains("\"ok\""), s"health after publish: $hc $hb")
      assert(get("/segments")._2 == """["AUTOMOBILE","BUILDING"]""")
      val (rc, rb) = get("/results/AUTOMOBILE")
      assert(rc == 200 && rb.startsWith("[") && rb.contains("o_orderkey"))
      assert(get("/results/AUTOMOBILE?limit=1")._2.count(_ == '{') == 1)
      assert(get("/results/NOPE")._1 == 404)
      // republish with different content: served rows change, no restart
      ord.limit(5).coalesce(1).write.mode("overwrite").parquet(s"$results/AUTOMOBILE")
      assert(get("/results/AUTOMOBILE")._2.count(_ == '{') == 5,
        "republished generation must be served (cache keyed by file set)")
      // the dashboard view (reference dashboard.py's one consumer-visible
      // artifact): HTML with the title, the placeholder, and both
      // segments title-cased in the selector; unknown paths still 404
      val (dc, db) = get("/")
      assert(dc == 200 && db.contains("Top Unshipped Orders")
        && db.contains("Please select a product segment...")
        && db.contains(">Automobile<") && db.contains(">Building<"), db.take(200))
      assert(get("/dashboard")._1 == 200)
      assert(get("/nope")._1 == 404)
    } finally srv.stop()
  }

  test("dashboard HTML entity-escapes operator-supplied segment names") {
    val root = s"$base/serve-esc"
    wipe(root)
    // segment names are operator config, not request input — but the
    // HTML context still needs entities, not JSON backslashes (r9
    // advice: esc() gave '\"', which has no escaping power in HTML)
    val hostile = """AUTO"><script>alert(1)</script>&x"""
    val srv = Serve.start(spark, s"$root/results", Seq(hostile))
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      val body = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${srv.port}/")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      assert(!body.contains("<script>alert"), "raw segment text reached HTML")
      assert(!body.contains("""value="AUTO">"""), "quote terminated the attribute")
      assert(body.contains("&lt;script&gt;") && body.contains("&quot;&gt;")
        && body.contains("&amp;x"), body.take(400))
    } finally srv.stop()
  }

  test("retry/backoff: an injected transient failure mid-cycle (staged, not drained) heals on retry without manual restart, exactly once") {
    val root = s"$base/retry-heal"
    wipe(root)
    var failures = 0
    PipelineMain.runCycles(spark, sf, root, batchIds = Seq(0, 1), nBatches = 2,
      compactEvery = Int.MaxValue,
      chaos = cycle =>
        if (cycle == 1 && failures < 2) {
          failures += 1
          throw new RuntimeException(s"injected transient failure #$failures")
        })
    assert(failures == 2, "the injection must have fired twice before healing")
    PipelineMain.finishAndServe(spark, sf, root)
    // healed run == clean run: full fixture, nothing doubled by the
    // re-staged attempts (staging is content-addressed, drain exactly-once)
    assert(spark.read.parquet(s"$root/tables/orders").count() ==
      Tables.orders(spark, sf).count(), "orders lost or doubled across retries")
    assert(spark.read.parquet(s"$root/tables/lineitem").count() ==
      Tables.lineitem(spark, sf).count(), "lineitem lost or doubled across retries")
    assert(spark.read.parquet(s"$root/tables/orders")
      .select("o_orderkey").distinct().count() ==
      spark.read.parquet(s"$root/tables/orders").count(), "duplicate keys after retry")
  }

  test("withRetry: exponential backoff schedule, success stops retrying, exhaustion propagates the last failure") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val got = PipelineMain.withRetry("t", maxAttempts = 5, baseDelayMs = 100L,
      sleep = sleeps += _) {
      calls += 1
      if (calls < 4) throw new RuntimeException(s"boom $calls")
      42
    }
    assert(got == 42 && calls == 4)
    assert(sleeps.toSeq == Seq(100L, 200L, 400L), s"expected doubling backoff, got $sleeps")
    val e = intercept[RuntimeException] {
      PipelineMain.withRetry("t", maxAttempts = 3, baseDelayMs = 1L, sleep = _ => ()) {
        throw new RuntimeException("always")
      }
    }
    assert(e.getMessage == "always")
  }

  test("pipeline lock excludes a separate JVM while held, and admits it after release") {
    val lock = s"$base/locks/.pipeline.lock"
    wipe(s"$base/locks")
    val scalaLib = new java.io.File("/opt/spark/jars").listFiles()
      .map(_.getPath).filter(_.contains("scala-library")).head
    def probe(): String = {
      val pb = new ProcessBuilder("java", "-cp",
        s"/root/repo/target/scala-2.13/classes:$scalaLib",
        "graft.streaming.PipelineLock", "probe", lock)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      p.waitFor()
      out.linesIterator.toSeq.last
    }
    val held = new java.util.concurrent.atomic.AtomicBoolean(false)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => PipelineLock.withLock(lock) {
      held.set(true); release.await()
    })
    t.start()
    while (!held.get()) Thread.sleep(10)
    assert(probe() == "BUSY", "a second process acquired the held pipeline lock")
    release.countDown(); t.join()
    assert(probe() == "ACQUIRED", "lock not released after withLock exited")
  }

  test("pipeline lock is reentrant within a thread: nested withLock runs under the outer hold and releases once") {
    val lock = s"$base/locks-reentrant/.pipeline.lock"
    wipe(s"$base/locks-reentrant")
    // round-3 advice: FileChannel.lock on a fresh channel throws
    // OverlappingFileLockException when the JVM already holds the lock,
    // so composing locked helpers under one outer lock used to crash
    val r = PipelineLock.withLock(lock) {
      PipelineLock.withLock(lock) { 41 } + 1
    }
    assert(r == 42)
    assert(PipelineLock.tryProbe(lock), "lock not released after nested withLock exited")
  }

  test("two overlapping pipeline invocations on one workDir: cycles serialize, nothing lost or doubled") {
    val root = s"$base/overlap"
    wipe(root)
    // the reference's model: two schedulers share the lock and generate
    // DISTINCT batches; here each invocation drives half the batch ids,
    // racing over the same staging/tables/checkpoints
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(Seq(0, 1), Seq(2, 3)).map { ids =>
      new Thread(() => {
        try PipelineMain.runCycles(spark, sf, root, ids, nBatches = 4,
          compactEvery = Int.MaxValue)
        catch { case e: Throwable => errs.add(e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"overlapping invocation failed: ${errs.peek()}")
    PipelineMain.finishAndServe(spark, sf, root)
    assert(spark.read.parquet(s"$root/tables/orders").count() ==
      Tables.orders(spark, sf).count(), "orders lost or doubled across overlapping invocations")
    assert(spark.read.parquet(s"$root/tables/lineitem").count() ==
      Tables.lineitem(spark, sf).count(), "lineitem lost or doubled across overlapping invocations")
    assert(spark.read.parquet(s"$root/tables/customer").count() ==
      Tables.customer(spark, sf).count())
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").foreach { seg =>
      assert(spark.read.parquet(s"$root/results/$seg").count() == 50)
    }
  }

  test("live mode: resident ProcessingTime ingestion + wall-clock generator lands the full fixture exactly once") {
    val root = s"$base/live"
    wipe(root)
    PipelineMain.runLive(spark, sf, root, nBatches = 2,
      cadenceMs = 1500L, processingTimeMs = 300L)
    assert(spark.read.parquet(s"$root/tables/orders").count() ==
      Tables.orders(spark, sf).count(), "live ingestion lost or doubled orders")
    assert(spark.read.parquet(s"$root/tables/lineitem").count() ==
      Tables.lineitem(spark, sf).count())
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").foreach { seg =>
      assert(spark.read.parquet(s"$root/results/$seg").count() == 50)
    }
    // live mode never compacts mid-run, so the finish-time pass is the
    // ONLY thing retiring the streaming sink logs — a clean finish must
    // leave every table plain-parquet (r11 live-soak finding)
    Seq("orders", "lineitem", "customer").foreach { t =>
      assert(!Files.exists(Paths.get(s"$root/tables/$t/_spark_metadata")),
        s"$t still under a streaming sink log after a clean live finish")
    }
  }

  test("live + serve: service is up during ingestion, flips healthy on the mid-run republish, and serves the final generation without restart") {
    val root = s"$base/live-serve"
    wipe(root)
    @volatile var srvOpt: Option[Serve] = None
    @volatile var failure: Option[Throwable] = None
    val runner = new Thread(() => {
      try PipelineMain.runLive(spark, sf, root, nBatches = 2,
        cadenceMs = 1500L, processingTimeMs = 300L, serve = true, publishEvery = 1,
        onServe = s => srvOpt = Some(s))
      catch { case e: Throwable => failure = Some(e) }
    })
    runner.start()
    val http = java.net.http.HttpClient.newHttpClient()
    def get(port: Int, path: String): (Int, String) = {
      val r = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try {
      // the server hands itself out BEFORE the generator loop starts
      val deadline = System.currentTimeMillis() + 60000
      while (srvOpt.isEmpty && runner.isAlive && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val srv = srvOpt.getOrElse(fail("runLive(serve=true) never started the server"))
      try {
        // DURING the run: waiting before the first publish, healthy after
        // the mid-run republish (publishEvery=1 → after batch 0), both
        // observed while ingestion is still streaming
        var sawWaiting = false
        var healthyWhileRunning = false
        while (runner.isAlive && !healthyWhileRunning) {
          val c = get(srv.port, "/health")._1
          if (c == 503) sawWaiting = true
          if (c == 200) healthyWhileRunning = true
          Thread.sleep(100)
        }
        assert(sawWaiting, "health never reported waiting before the first publish")
        assert(healthyWhileRunning,
          "health never flipped to ok while ingestion was still running — the mid-run republish did not happen")
        runner.join(120000)
        assert(!runner.isAlive, "runLive did not complete")
        failure.foreach(throw _)
        assert(get(srv.port, "/health")._1 == 200, "service not healthy after run")
        val (rc, rb) = get(srv.port, "/results/AUTOMOBILE")
        assert(rc == 200 && rb.count(_ == '{') == 50, "final generation not served")
        // read-your-republish: the served rows are the FINAL reduce's rows
        val expect = spark.read.parquet(s"$root/results/AUTOMOBILE").count()
        assert(expect == 50 && rb.count(_ == '{') == expect.toInt)
      } finally srv.stop()
    } finally if (runner.isAlive) runner.join(120000)
  }

  test("live + serve: watchdog redeploys a killed server mid-run while streams continue") {
    val root = s"$base/live-watchdog"
    wipe(root)
    @volatile var srvOpt: Option[Serve] = None
    @volatile var failure: Option[Throwable] = None
    val runner = new Thread(() => {
      try PipelineMain.runLive(spark, sf, root, nBatches = 2,
        cadenceMs = 1500L, processingTimeMs = 300L, serve = true, publishEvery = 1,
        onServe = s => srvOpt = Some(s))
      catch { case e: Throwable => failure = Some(e) }
    })
    runner.start()
    val http = java.net.http.HttpClient.newHttpClient()
    def health(port: Int): Option[Int] =
      try Some(http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode())
      catch { case _: java.io.IOException => None }
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (srvOpt.isEmpty && runner.isAlive && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val srv = srvOpt.getOrElse(fail("runLive(serve=true) never started the server"))
      try {
        // confirm the listener answers (200 or 503 — transport-alive is
        // what the watchdog probes), then KILL it behind the
        // supervisor's back: the dashboard-process-death scenario
        val port = srv.port
        assert(health(port).nonEmpty, "server never answered before the kill")
        srv.simulateCrash()
        // the watchdog must redeploy on the SAME port while the run is
        // still going; probe until it answers again
        val recoverBy = System.currentTimeMillis() + 30000
        var recovered = false
        while (!recovered && System.currentTimeMillis() < recoverBy) {
          recovered = health(port).nonEmpty
          if (!recovered) Thread.sleep(100)
        }
        assert(recovered, "watchdog never redeployed the killed server")
        assert(srv.restarts >= 1, "recovery did not come from the watchdog")
        runner.join(120000)
        assert(!runner.isAlive, "runLive did not complete")
        failure.foreach(throw _)
        // streams continued through the kill: the full fixture landed
        // exactly once and the REDEPLOYED server serves the final rows
        assert(spark.read.parquet(s"$root/tables/orders").count() ==
          Tables.orders(spark, sf).count(), "kill+redeploy disturbed ingestion")
        assert(health(port).contains(200), "redeployed server not healthy after run")
        val rows = http.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/results/AUTOMOBILE")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
        assert(rows.count(_ == '{') == 50, "final generation not served after redeploy")
      } finally srv.stop()
    } finally if (runner.isAlive) runner.join(120000)
  }

  test("serve: mid-republish window serves the cached last generation, never a torn read") {
    val root = s"$base/serve-stale"
    wipe(root)
    val results = s"$root/results"
    val srv = Serve.start(spark, results, Seq("AUTOMOBILE"))
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def get(path: String): (Int, String) = {
        val r = http.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${srv.port}$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      Tables.orders(spark, sf).limit(3).coalesce(1)
        .write.mode("overwrite").parquet(s"$results/AUTOMOBILE")
      val (c1, b1) = get("/results/AUTOMOBILE")
      assert(c1 == 200 && b1.count(_ == '{') == 3)
      // simulate the republish window: the old generation is retired,
      // the new one not yet committed (publishResults' delete+rename gap)
      Fs.deleteRec(spark, s"$results/AUTOMOBILE")
      assert(get("/health")._1 == 503, "health must report the republish in flight")
      val (c2, b2) = get("/results/AUTOMOBILE")
      assert(c2 == 200 && b2 == b1, "mid-republish read must serve the cached generation")
      // the new generation commits: served rows switch
      Tables.orders(spark, sf).limit(5).coalesce(1)
        .write.mode("overwrite").parquet(s"$results/AUTOMOBILE")
      assert(get("/results/AUTOMOBILE")._2.count(_ == '{') == 5)
      // malformed limit answers 200 with the default, not a dropped exchange
      assert(get("/results/AUTOMOBILE?limit=abc")._1 == 200)
      // reflected segment text is JSON-escaped
      val (c4, b4) = get("/results/x%22y")
      assert(c4 == 404 && b4.contains("x\\\"y"))
    } finally srv.stop()
  }

  test("txn sink crash injection: process death between file adoption and manifest commit; same-checkpoint restart re-drains exactly once; vacuum reclaims the orphans") {
    val b = s"$base/stxn-crash"
    wipe(b)
    val src = s"$b/src"
    val tbl = s"$b/orders"
    val ckpt = s"$b/ckpt"
    val ord = Tables.orders(spark, sf)
    val total = ord.count()
    (0 until 4).foreach { i =>
      ord.filter(col("o_orderkey") % 4 === i).coalesce(1).write.mode("append").parquet(src)
    }
    @volatile var crashed = false
    def run(inject: Boolean): Unit = {
      val q = spark.readStream.schema(Schemas.orders)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          Manifest.appendBatch(spark, tbl, "ingest", id, batch,
            beforeCommit = () =>
              if (inject && id == 2 && !crashed) {
                crashed = true
                throw new RuntimeException("injected death between adoption and commit")
              })
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          if (!inject) throw e
      }
    }
    run(inject = true)
    assert(crashed, "the injected crash must have fired")
    // the ledger shows exactly the two pre-crash batches; the dead
    // writer's batch-2 files were adopted into data/ but belong to NO
    // manifest — a reader still sees only the committed snapshot
    assert(Manifest.lastCommittedBatch(spark, tbl, "ingest") == 1)
    val committedAtCrash = Manifest.read(spark, tbl).count()
    assert(committedAtCrash > 0 && committedAtCrash < total)
    val orphans = Fs.listFiles(spark, s"$tbl/data", _.endsWith(".parquet")).size -
      Manifest.snapshot(spark, tbl)._2.count(!_.startsWith("#txn|"))
    assert(orphans >= 1, "the crashed batch must leave adopted-but-uncommitted files")
    // restart from the SAME checkpoint — the real recovery path:
    // foreachBatch redelivers the failed batch with its original id
    run(inject = false)
    assert(Manifest.lastCommittedBatch(spark, tbl, "ingest") == 3)
    assert(Manifest.read(spark, tbl).count() == total, "rows lost or doubled across the crash")
    assert(Manifest.read(spark, tbl).select("o_orderkey").distinct().count() == total)
    // vacuum reclaims exactly the dead writer's orphans, nothing live
    assert(Manifest.vacuum(spark, tbl, retentionMs = 0) == orphans)
    assert(Manifest.read(spark, tbl).count() == total)
  }

  test("compaction crash window: a stranded sink log (checkpoint retired, swap not run) fails loud, and the startup repair recovers it") {
    val root = s"$base/ckpt-crash"
    wipe(root)
    val staging = s"$root/staging"; val tables = s"$root/tables"; val ckpt = s"$root/ckpt"
    val schemas = Map("orders" -> Schemas.stagedOrders)
    Synthesize.cycle(spark, sf, staging, tables, batchId = 0, nBatches = 2)
    Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    val afterB0 = spark.read.parquet(s"$tables/orders").count()
    assert(afterB0 > 0)
    // simulate the compaction crash window: checkpoint retired, but the
    // process died before compactTable swapped the sink log away
    Compact.deleteRecPublic(spark, s"$ckpt/orders")
    assert(Files.exists(Paths.get(s"$tables/orders/_spark_metadata")))
    // a fresh drain against the stale sink log would silently SKIP its
    // first batches (FileStreamSink drops any batchId <= the log's
    // latest) — the guard must refuse instead of losing rows
    Synthesize.cycle(spark, sf, staging, tables, batchId = 1, nBatches = 2)
    val ex = intercept[IllegalStateException] {
      Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    }
    assert(ex.getMessage.contains("sink commit log but no checkpoint"))
    assert(spark.read.parquet(s"$tables/orders").count() == afterB0,
      "failed drain must not have touched the table")
    // the orchestrator's startup repair: finish the compaction (retires
    // the sink log), after which the staged batch drains cleanly
    Compact.compactTable(spark, s"$tables/orders")
    Ingest.drainAll(spark, staging, tables, ckpt, schemas)
    assert(spark.read.parquet(s"$tables/orders").count() ==
      Tables.orders(spark, sf).count(),
      "post-repair drain must land the staged batch exactly once")
  }

  test("compaction crash recovery: a death between the swap moves loses no data") {
    val root = s"$base/crash"
    wipe(root)
    val dir = s"$root/orders"
    graft.sources.Tables.orders(spark, sf).repartition(4).write.parquet(dir)
    val expected = spark.read.parquet(dir).count()
    // simulate a crash after `move(dir, old)` but before `move(tmp, dir)`:
    // the table directory is gone; data lives only in .compact_old
    java.nio.file.Files.move(Paths.get(dir), Paths.get(dir + ".compact_old"))
    assert(!java.nio.file.Files.exists(Paths.get(dir)))
    // the next compaction run must restore before doing anything else
    val (before, after) = Compact.compactTable(spark, dir, targetFiles = 2)
    assert(before == 4 && after == 2)
    assert(spark.read.parquet(dir).count() == expected, "rows lost across crash recovery")
    assert(!java.nio.file.Files.exists(Paths.get(dir + ".compact_old")))
  }

  test("compaction: file count drops to target, contents bit-identical") {
    val root = s"$base/compact"
    wipe(root)
    val dir = s"$root/orders"
    Tables.orders(spark, sf).repartition(16).write.parquet(dir)
    val beforeDf = spark.read.parquet(dir).cache()
    val beforeRows = beforeDf.collect().toSet
    val (before, after) = Compact.compactTable(spark, dir, targetFiles = 2)
    beforeDf.unpersist()
    assert(before == 16 && after == 2, s"expected 16 -> 2 files, got $before -> $after")
    val afterRows = spark.read.parquet(dir).collect().toSet
    assert(afterRows == beforeRows, "compaction changed table contents")
    assert(!Files.exists(Paths.get(dir + ".compact_old")) &&
      !Files.exists(Paths.get(dir + ".compact_tmp")), "vacuum left retired dirs behind")
  }
}

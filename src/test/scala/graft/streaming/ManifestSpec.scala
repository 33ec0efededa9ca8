package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The manifest protocol's one job: a reader NEVER sees a mixed file
  * set while appends land mid-compaction (round-2 verdict item 8 — the
  * semantics [[Compact]]'s quiesce requirement gives up). */
class ManifestSpec extends SparkSpec {

  private val base = "/root/repo/target/test-manifest"

  test("compaction with an append racing between rewrite and commit: rebase keeps the appended rows, reader sees full data at every version") {
    val tbl = s"$base/orders-race"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    val total = ord.count()
    Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 3 === 0).repartition(4))
    Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 3 === 1).repartition(4))
    // the race: a third slice commits AFTER the compaction rewrote its
    // snapshot but BEFORE it commits — the compaction must lose the
    // version race once, rebase, and preserve the appended files
    val vCompact = Manifest.compact(spark, tbl, targetFiles = 2, beforeCommit = () => {
      Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 3 === 2).repartition(1)); ()
    })
    assert(vCompact == 3, "expected versions: 2 appends, the racing append, then the compaction")
    val (v, files) = Manifest.snapshot(spark, tbl)
    assert(v == 3 && files.size == 3, s"2 compacted + 1 raced-append file, got $files")
    assert(Manifest.read(spark, tbl).count() == total, "rows lost across the race")
    // snapshot isolation: EVERY committed version is a complete,
    // readable file set (all files exist — nothing vacuumed yet — and
    // counts never go backward)
    var prev = 0L
    for (ver <- 0L to v) {
      val fs = Manifest.filesAt(spark, tbl, ver)
      fs.foreach(f => assert(Fs.exists(spark, s"$tbl/$f"), s"v$ver references missing $f"))
      val n = spark.read.parquet(fs.map(f => s"$tbl/$f"): _*).count()
      assert(n >= prev, s"v$ver lost rows: $n < $prev")
      prev = n
    }
    assert(prev == total)
    // vacuum drops exactly the 8 pre-compaction files; reads unaffected
    assert(Manifest.vacuum(spark, tbl, retentionMs = 0) == 8)
    assert(Manifest.read(spark, tbl).count() == total)
  }

  test("concurrent appends from multiple threads: every committed row survives, versions are a total order") {
    val tbl = s"$base/orders-threads"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf).cache()
    val total = ord.count()
    Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 8 === 0).repartition(2))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 7).map { m =>
      new Thread(() => {
        try Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 8 === m).repartition(2))
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"append thread failed: ${Option(errs.peek()).map(_.toString)}")
    ord.unpersist()
    val (v, _) = Manifest.snapshot(spark, tbl)
    assert(v == 7, s"8 appends must produce versions 0..7, latest was $v")
    assert(Manifest.read(spark, tbl).count() == total,
      "concurrent appends dropped rows — the rename race is not safe")
  }

  test("vacuum expires old manifests together with their files: surviving versions stay fully readable, expired readers fail explicitly") {
    val tbl = s"$base/orders-vacuum"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    val total = ord.count()
    Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 2 === 0).repartition(2)) // v0
    Manifest.append(spark, tbl, ord.filter(col("o_orderkey") % 2 === 1).repartition(2)) // v1
    Manifest.compact(spark, tbl, targetFiles = 1) // v2: the 4 append files now dead in v2's view
    // generous retention: v0/v1 survive, so the pre-compaction files they
    // reference MUST survive too (round-3 advice: the old vacuum swept
    // them and dangled every older snapshot)
    assert(Manifest.vacuum(spark, tbl, retentionMs = 60 * 60 * 1000L) == 0,
      "vacuum removed files still referenced by a surviving manifest")
    for (v <- 0L to 2L) {
      val fs = Manifest.filesAt(spark, tbl, v)
      fs.foreach(f => assert(Fs.exists(spark, s"$tbl/$f"), s"surviving v$v dangles on $f"))
    }
    // zero retention: v0/v1 expire WITH their files in one pass; the
    // latest snapshot is untouched and still complete
    assert(Manifest.vacuum(spark, tbl, retentionMs = 0) == 4)
    assert(Manifest.read(spark, tbl).count() == total)
    intercept[Exception](Manifest.filesAt(spark, tbl, 0)) // missing manifest, not missing data files
    assert(Manifest.latestVersion(spark, tbl) == 2)
  }

  test("compaction aborts loudly when its inputs vanish from the manifest") {
    val tbl = s"$base/orders-abort"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    Manifest.append(spark, tbl, ord.repartition(3))
    val ex = intercept[IllegalStateException] {
      Manifest.compact(spark, tbl, targetFiles = 1, beforeCommit = () => {
        // a competing compactor rewrites the same inputs first
        Manifest.compact(spark, tbl, targetFiles = 2); ()
      })
    }
    assert(ex.getMessage.contains("vanished"))
  }

  test("copy-on-write replace: live snapshot swaps atomically, prior version stays time-travel readable") {
    val tbl = s"$base/orders-replace"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    val evens = ord.filter(col("o_orderkey") % 2 === 0)
    val odds = ord.filter(col("o_orderkey") % 2 === 1)
    val v0 = Manifest.append(spark, tbl, evens.repartition(2))
    val v1 = Manifest.replace(spark, tbl, odds.repartition(2))
    assert(v1 == v0 + 1)
    // live read sees ONLY the replacement rows
    val live = Manifest.read(spark, tbl)
    assert(live.count() == odds.count())
    assert(live.filter(col("o_orderkey") % 2 === 0).count() == 0)
    // the replaced snapshot remains pinned and complete under v0
    val pinned = spark.read.parquet(
      Manifest.filesAt(spark, tbl, v0).map(f => s"$tbl/$f"): _*)
    assert(pinned.count() == evens.count())
    assert(pinned.filter(col("o_orderkey") % 2 === 1).count() == 0)
    // vacuum with zero retention drops exactly v0's two files
    assert(Manifest.vacuum(spark, tbl, retentionMs = 0) == 2)
    assert(Manifest.read(spark, tbl).count() == odds.count())
  }

  test("per-file stats prune range reads; compaction degrades to conservative (read-all)") {
    val tbl = s"$base/orders-stats"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    val maxK = ord.agg(max(col("o_orderkey"))).head.getLong(0)
    val half = maxK / 2
    Manifest.append(spark, tbl,
      ord.filter(col("o_orderkey") <= half).repartition(1), statsCols = Seq("o_orderkey"))
    Manifest.append(spark, tbl,
      ord.filter(col("o_orderkey") > half).repartition(1), statsCols = Seq("o_orderkey"))
    // a low-range read touches exactly the low file
    val (kept, total) = Manifest.pruneFiles(spark, tbl, 1, half)
    assert(total == 2 && kept.size == 1, s"expected 1/2 files, got ${kept.size}/$total")
    val lowRows = spark.read.parquet(kept.map(f => s"$tbl/$f"): _*).count()
    assert(lowRows == ord.filter(col("o_orderkey") <= half).count())
    // stats survive an unrelated append's rebase
    Manifest.append(spark, tbl, ord.limit(0).repartition(1))
    assert(Manifest.pruneFiles(spark, tbl, 1, half)._1.size <= 2)
    // compaction rewrites to stats-less files: pruning must keep them
    // ALL (conservative), and the ranged read stays correct via the
    // residual predicate
    Manifest.compact(spark, tbl, targetFiles = 1)
    val (keptAfter, totalAfter) = Manifest.pruneFiles(spark, tbl, 1, half)
    assert(keptAfter.size == totalAfter, "stats-less files must never be pruned")
    val n = spark.read.parquet(keptAfter.map(f => s"$tbl/$f"): _*)
      .filter(col("o_orderkey") <= half).count()
    assert(n == lowRows)
  }

  test("appendBatch: replayed batch ids commit nothing; marker survives compaction; independent streams don't interfere") {
    val tbl = s"$base/orders-txn"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    val b0 = ord.filter(col("o_orderkey") % 2 === 0)
    val b1 = ord.filter(col("o_orderkey") % 2 === 1)
    assert(Manifest.appendBatch(spark, tbl, "s1", 0, b0.repartition(2)))
    assert(Manifest.appendBatch(spark, tbl, "s1", 1, b1.repartition(2)))
    val total = Manifest.read(spark, tbl).count()
    assert(total == ord.count())
    // replays of both batches are no-ops
    assert(!Manifest.appendBatch(spark, tbl, "s1", 0, b0))
    assert(!Manifest.appendBatch(spark, tbl, "s1", 1, b1))
    assert(Manifest.read(spark, tbl).count() == total)
    assert(Manifest.lastCommittedBatch(spark, tbl, "s1") == 1)
    // a DIFFERENT stream id has its own watermark
    assert(Manifest.lastCommittedBatch(spark, tbl, "s2") == -1)
    assert(Manifest.appendBatch(spark, tbl, "s2", 0, b0.limit(5).repartition(1)))
    assert(Manifest.read(spark, tbl).count() == total + 5)
    // compaction rewrites data files but both watermarks survive
    Manifest.compact(spark, tbl, targetFiles = 1)
    assert(Manifest.lastCommittedBatch(spark, tbl, "s1") == 1)
    assert(Manifest.lastCommittedBatch(spark, tbl, "s2") == 0)
    assert(Manifest.read(spark, tbl).count() == total + 5)
    // post-compaction appendBatch still idempotent
    assert(!Manifest.appendBatch(spark, tbl, "s1", 1, b1))
    assert(Manifest.appendBatch(spark, tbl, "s1", 2, b1.limit(3).repartition(1)))
    assert(Manifest.read(spark, tbl).count() == total + 8)
  }

  test("replace preserves txn markers: a replayed micro-batch after an overwrite still skips") {
    val tbl = s"$base/orders-replace-txn"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf)
    val b0 = ord.filter(col("o_orderkey") % 2 === 0)
    assert(Manifest.appendBatch(spark, tbl, "s1", 0, b0.repartition(2)))
    assert(Manifest.lastCommittedBatch(spark, tbl, "s1") == 0)
    // overwrite the DATA: the exactly-once ledger must ride through
    val replaced = ord.limit(10)
    Manifest.replace(spark, tbl, replaced.repartition(1))
    assert(Manifest.read(spark, tbl).count() == 10, "replace must swap the data set")
    assert(Manifest.lastCommittedBatch(spark, tbl, "s1") == 0,
      "replace dropped the txn marker — a foreachBatch redelivery would double-append")
    // the redelivery: same (stream, batch) must be a no-op post-replace
    assert(!Manifest.appendBatch(spark, tbl, "s1", 0, b0.repartition(2)))
    assert(Manifest.read(spark, tbl).count() == 10)
    // the stream continues past the overwrite with the next batch
    assert(Manifest.appendBatch(spark, tbl, "s1", 1, ord.limit(3).repartition(1)))
    assert(Manifest.read(spark, tbl).count() == 13)
  }

  test("2-D stats: z-ordered layout prunes a 2-D range read; an uncorrelated layout of the same data cannot") {
    val ztbl = s"$base/orders-z"
    val htbl = s"$base/orders-hash"
    Fs.deleteRec(spark, ztbl)
    Fs.deleteRec(spark, htbl)
    val z = graft.operators.Relational.withZval(Tables.orders(spark, sf))
      .withColumn("d", datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
      .withColumn("slab", expr("zval div 8192"))
      .select("o_orderkey", "o_custkey", "d", "slab")
    val slabs = z.select("slab").distinct().collect().map(_.getLong(0)).sorted
    slabs.foreach { s =>
      Manifest.append(spark, ztbl,
        z.filter(col("slab") === s).drop("slab").repartition(1),
        statsCols = Seq("o_custkey", "d"))
    }
    // same rows, same file count, laid out by orderkey hash — a key
    // uncorrelated with either query dimension, so every file's
    // bounding box spans both full ranges
    slabs.indices.foreach { i =>
      Manifest.append(spark, htbl,
        z.filter(col("o_orderkey") % slabs.size === i).drop("slab").repartition(1),
        statsCols = Seq("o_custkey", "d"))
    }
    val r = z.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(col("d")), max(col("d"))).first()
    val (cl, ch, dl, dh) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val box = Seq(
      (cl + (ch - cl) / 4, cl + (ch - cl) * 3 / 4),
      (dl + (dh - dl) / 4, dl + (dh - dl) * 3 / 4))
    val (keptZ, totZ) = Manifest.pruneFilesND(spark, ztbl, box)
    val (keptH, totH) = Manifest.pruneFilesND(spark, htbl, box)
    assert(totZ == slabs.size && totH == slabs.size)
    assert(keptH.size == totH,
      s"uncorrelated layout should keep every file, kept ${keptH.size}/$totH")
    assert(keptZ.size < totZ, s"z-order layout must prune, kept ${keptZ.size}/$totZ")
    // the pruned read is still exact
    val inBox = (df: org.apache.spark.sql.DataFrame) => df.filter(
      col("o_custkey").between(box(0)._1, box(0)._2) &&
        col("d").between(box(1)._1, box(1)._2))
    assert(inBox(spark.read.parquet(keptZ.map(f => s"$ztbl/$f"): _*)).count() ==
      inBox(z).count())
  }

  test("append with an all-NULL stats column commits stats-less; pruning keeps the file conservatively") {
    val tbl = s"$base/orders-null-stats"
    Fs.deleteRec(spark, tbl)
    val ord = Tables.orders(spark, sf).limit(100)
      .withColumn("nullkey", lit(null).cast("long"))
    // must not NPE at commit time (min/max of an all-NULL column is NULL)
    Manifest.append(spark, tbl, ord.repartition(2), statsCols = Seq("nullkey"))
    val (kept, totalFiles) = Manifest.pruneFiles(spark, tbl, 0L, 1L)
    assert(totalFiles == 2 && kept.size == 2,
      s"stats-less files must always be kept: $kept of $totalFiles")
    assert(Manifest.read(spark, tbl).count() == 100)
  }
}

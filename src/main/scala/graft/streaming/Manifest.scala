package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest-commit table protocol: snapshot-isolated reads and
  * compaction that can interleave with live appends — the semantics gap
  * [[Compact]] documents (its swap requires append-quiescence), solved
  * the way transactional table formats solve it (Delta's transaction
  * log, reference pipeline/preprocess.py:74-75; no such jars offline,
  * so this is the protocol reduced to its core).
  *
  * Layout: parquet data files live under `<table>/data/` (immutable once
  * committed, never overwritten); `<table>/_manifest/v<20-digit>.manifest`
  * holds one COMPLETE file list per committed version (one relative
  * path per line).
  *
  * Commit = write the new list to a temp name, then atomically publish
  * it at the next version number via [[Fs.commitFile]] (create-exclusive
  * — hard link on local FS, rename-no-overwrite on HDFS), so exactly one
  * of two racing committers wins the version; the loser re-reads the
  * new latest, REBASES its intent, and retries (optimistic
  * concurrency):
  *  - an append rebases trivially (its new files union any list);
  *  - a compaction rebases as `latest − rewrittenInputs + compacted`,
  *    preserving files that were appended mid-rewrite; if another
  *    actor already removed one of its inputs, it aborts loudly.
  *
  * Readers resolve the latest manifest ONCE and read exactly that file
  * set — never a directory listing — so a reader sees a committed
  * snapshot or a newer committed snapshot, never a mix of pre- and
  * post-compaction files and never a torn append. Atomic visibility
  * rests on atomic rename (local FS, HDFS); on object stores a real
  * table format is the answer, exactly as for [[Compact]].
  *
  * Vacuum deletes data files no manifest references, with a modification
  * -time retention window so a writer's files that are moved into
  * `data/` but not yet committed are never swept.
  *
  * Scale: the manifest is file-count-sized metadata (not data-sized);
  * appends/compactions move data only through executor-side parquet
  * jobs; the driver handles the file LIST — the same division of labor
  * as Delta's log.
  */
object Manifest {

  private def dataDir(table: String) = s"$table/data"
  private def manifestDir(table: String) = s"$table/_manifest"
  private def versionName(v: Long) = f"v$v%020d.manifest"

  /** Losing the version race is fine (the winner advanced `parent`, we
    * rebase); failing to commit WITHOUT the parent advancing is not a
    * race — it is an environmental rename/link failure (permissions,
    * quota, transient FS error), which Hadoop reports as `false` exactly
    * like a lost race. Retrying that forever spins silently, so a commit
    * loop throws after this many consecutive attempts at the SAME parent
    * version. */
  private val MaxStalledCommitAttempts = 8

  /** Run a rebase-and-retry commit loop with the no-progress guard
    * above. `attempt` receives the latest (parent, files) snapshot and
    * returns the rebased file list to commit (or throws to abort). */
  private def commitLoop(spark: SparkSession, table: String, what: String)
                        (attempt: (Long, Seq[String]) => Seq[String]): Long = {
    var lastParent = Long.MinValue
    var stalled = 0
    while (true) {
      val (parent, latest) = snapshot(spark, table)
      if (parent == lastParent) {
        stalled += 1
        if (stalled >= MaxStalledCommitAttempts)
          throw new IllegalStateException(
            s"$what commit to $table stalled: ${versionName(parent + 1)} failed " +
              s"$stalled times with no competing commit advancing v$parent — " +
              "an environmental create/rename failure, not a version race; aborting")
      } else { lastParent = parent; stalled = 0 }
      tryCommit(spark, table, attempt(parent, latest), parent) match {
        case Some(v) => return v
        case None    => ()
      }
    }
    -1L // unreachable
  }

  def latestVersion(spark: SparkSession, table: String): Long =
    Fs.listFiles(spark, manifestDir(table), _.endsWith(".manifest"))
      .map(f => new org.apache.hadoop.fs.Path(f._1).getName.drop(1).takeWhile(_.isDigit).toLong)
      .foldLeft(-1L)(math.max)

  /** A manifest ENTRY is `path` or `path|min|max[|min2|max2|...]` —
    * the optional per-file column-stats suffix ([[append]]'s
    * `statsCols`, one (min,max) pair per column IN ORDER) that
    * [[pruneFiles]]/[[pruneFilesND]] skip files by, the manifest-level
    * form of Delta/Iceberg data skipping (multi-column stats are what
    * OPTIMIZE ZORDER exists to make useful — see `pipe_zorder_prune`).
    * Entries are the commit-identity unit (rebase set-arithmetic runs
    * on whole entries, so stats travel with their file through racing
    * commits).
    *
    * A line starting with `#txn|` is a TRANSACTION MARKER, not a file:
    * `#txn|<streamId>|<batchId>` records the highest micro-batch a
    * streaming writer has committed (Delta's txnAppId/txnVersion).
    * Markers ride the manifest so the batch watermark and its data
    * commit are ONE atomic publish — the exactly-once property —
    * and every file-consuming path filters them out. */
  private def isMarker(entry: String): Boolean = entry.startsWith("#txn|")

  private def pathOf(entry: String): String = entry.takeWhile(_ != '|')

  /** The (min, max) pairs of an entry's stats suffix, positional by
    * stats column; empty for a stats-less entry. */
  private def statsOf(entry: String): Seq[(Long, Long)] =
    entry.split('|').drop(1).grouped(2).collect {
      case Array(mn, mx) => (mn.toLong, mx.toLong)
    }.toSeq

  /** Raw manifest entries (path + optional stats) of one version. */
  private[streaming] def entriesAt(spark: SparkSession, table: String, v: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"${manifestDir(table)}/${versionName(v)}")
    val fs = p.getFileSystem(Fs.conf(spark))
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      src.getLines().filter(_.nonEmpty).toList
    } finally in.close()
  }

  /** The committed relative data-file PATHS of one version (tests
    * assert per-version snapshot consistency with this). */
  private[streaming] def filesAt(spark: SparkSession, table: String, v: Long): Seq[String] =
    entriesAt(spark, table, v).filterNot(isMarker).map(pathOf)

  /** (version, raw manifest entries) of the latest committed snapshot;
    * (-1, empty) for a table with no commits. Entries, not paths —
    * commit rebases must preserve the stats suffix. */
  def snapshot(spark: SparkSession, table: String): (Long, Seq[String]) = {
    val v = latestVersion(spark, table)
    if (v < 0) (v, Seq.empty) else (v, entriesAt(spark, table, v))
  }

  /** Read the latest snapshot (exactly its committed file set). */
  def read(spark: SparkSession, table: String): DataFrame = {
    val (v, entries) = snapshot(spark, table)
    require(v >= 0, s"manifest table $table has no committed version")
    spark.read.parquet(entries.filterNot(isMarker).map(e => s"$table/${pathOf(e)}"): _*)
  }

  /** The highest micro-batch id `streamId` has committed to `table`
    * (−1 if none) — the restart-recovery read of the txn marker. */
  def lastCommittedBatch(spark: SparkSession, table: String, streamId: String): Long = {
    val (v, entries) = snapshot(spark, table)
    if (v < 0) -1L
    else entries.collect {
      case e if isMarker(e) && e.split('|')(1) == streamId => e.split('|')(2).toLong
    }.foldLeft(-1L)(math.max)
  }

  /** EXACTLY-ONCE streaming append: commit `df` + the advanced txn
    * marker for (streamId, batchId) in ONE manifest publish. A replayed
    * batch (id ≤ the committed watermark — the foreachBatch redelivery
    * after a crash/restart) is detected inside the commit loop against
    * the LATEST snapshot and skipped, so duplicate delivery cannot
    * double-append even when the replay races other writers. Returns
    * true if this call committed the batch.
    *
    * `beforeCommit` is a test seam between file adoption and the
    * manifest publish — the crash window where a dead writer leaves
    * adopted-but-uncommitted orphans that [[vacuum]]'s retention sweep
    * reclaims (PipelineSpec's crash-injection E2E). */
  def appendBatch(spark: SparkSession, table: String, streamId: String,
                  batchId: Long, df: DataFrame,
                  beforeCommit: () => Unit = () => ()): Boolean = {
    if (lastCommittedBatch(spark, table, streamId) >= batchId) return false
    val scratch = s"$table/.sbatch_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(scratch)
    Fs.deleteIfExists(spark, s"$scratch/_SUCCESS")
    val mine = adoptParts(spark, table, scratch, f"b$batchId%06d").map(_._1)
    beforeCommit()
    val marker = s"#txn|$streamId|$batchId"
    try {
      commitLoop(spark, table, "appendBatch") { (_, latest) =>
        val committed = latest.collect {
          case e if isMarker(e) && e.split('|')(1) == streamId => e.split('|')(2).toLong
        }.foldLeft(-1L)(math.max)
        if (committed >= batchId)
          throw new AlreadyCommitted  // lost to a concurrent replay of the same batch
        latest.filterNot(e => isMarker(e) && e.split('|')(1) == streamId) ++
          mine :+ marker
      }
      true
    } catch {
      case _: AlreadyCommitted =>
        // our data files are orphans; vacuum's retention window sweeps them
        false
    }
  }

  private final class AlreadyCommitted extends RuntimeException

  /** Data-skipping file selection: the latest snapshot's paths whose
    * stats range intersects [lo, hi] on the FIRST stats column — files
    * WITHOUT stats are always kept (pruning is strictly conservative,
    * so mixed stats/no-stats snapshots, e.g. after a compaction rewrote
    * stats-carrying inputs, stay correct). Returns (kept paths, total
    * file count). */
  def pruneFiles(spark: SparkSession, table: String, lo: Long, hi: Long): (Seq[String], Int) =
    pruneFilesND(spark, table, Seq((lo, hi)))

  /** Multi-dimensional data skipping: keep a file iff EVERY queried
    * range intersects the file's (min, max) on the corresponding stats
    * column ([[append]]'s `statsCols`, matched positionally).
    *
    * ORDERING CONTRACT (stats carry no column names in the entry
    * format): `ranges(i)` is matched against the i-th (min, max) pair,
    * which is the i-th column of the `statsCols` the file was APPENDED
    * with. Callers must therefore query in the same column order every
    * append used, and a table must use ONE consistent `statsCols`
    * order across all its appends — a mixed-order table would prune
    * against the wrong columns and silently drop live files from
    * reads. (The manifest format would need per-entry column names to
    * validate this at prune time; with positional stats the contract
    * lives here.) A file
    * with no stats — or fewer stats columns than queried ranges — is
    * kept conservatively. This is the scan-planning half of a 2-D
    * layout: z-ordered files have tight bounding boxes in BOTH
    * dimensions, so a 2-D range predicate prunes to the files whose
    * box the query box intersects (Delta/Iceberg OPTIMIZE ZORDER +
    * stats skipping). Returns (kept paths, total file count). */
  def pruneFilesND(spark: SparkSession, table: String,
                   ranges: Seq[(Long, Long)]): (Seq[String], Int) = {
    val (v, entries) = snapshot(spark, table)
    require(v >= 0, s"manifest table $table has no committed version")
    val dataEntries = entries.filterNot(isMarker)
    val kept = dataEntries.filter { e =>
      val st = statsOf(e)
      ranges.zipWithIndex.forall { case ((lo, hi), i) =>
        st.lift(i) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }.map(pathOf)
    (kept, dataEntries.size)
  }

  /** Try to commit `files` as version `parent + 1`; None if another
    * committer took that version first (caller re-reads and rebases). */
  private def tryCommit(spark: SparkSession, table: String,
                        files: Seq[String], parent: Long): Option[Long] = {
    val dir = manifestDir(table)
    Fs.mkdirs(spark, dir)
    // temp manifests live OUTSIDE the listed directory: losers delete
    // their temp concurrently with other committers' version listings,
    // and a listing must never observe a vanishing entry
    Fs.mkdirs(spark, s"$table/_tmp")
    val tmp = s"$table/_tmp/.tmp_${java.util.UUID.randomUUID().toString}"
    val p = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(Fs.conf(spark))
    val out = fs.create(p, false)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    val next = parent + 1
    if (Fs.commitFile(spark, tmp, s"$dir/${versionName(next)}")) Some(next)
    else { Fs.deleteIfExists(spark, tmp); None }
  }

  /** Move the parquet parts of a finished Spark write under `data/`
    * with collision-free names; returns (relative path, source part
    * file name) pairs — the source name keys per-file stats computed
    * before adoption. */
  private def adoptParts(spark: SparkSession, table: String,
                         scratch: String, tag: String): Seq[(String, String)] = {
    Fs.mkdirs(spark, dataDir(table))
    val parts = Fs.listFiles(spark, scratch, _.endsWith(".parquet")).map(_._1).sorted
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val rel = parts.zipWithIndex.map { case (src, i) =>
      val r = f"data/$tag-$uid-p$i%04d.parquet"
      require(Fs.rename(spark, src, s"$table/$r"), s"adopting $src failed")
      (r, new org.apache.hadoop.fs.Path(src).getName)
    }
    Fs.deleteRec(spark, scratch)
    rel
  }

  /** Per-part-file (min, max) of each of `statsCols` over a finished
    * scratch write, keyed by part file name — one metadata-sized
    * aggregation job (file-count rows to the driver, like the manifest
    * itself). A file whose min/max comes back NULL on ANY stats column
    * (all-NULL column) gets NO stats entry — stats pairs are
    * positional, so a per-column gap can't be encoded; the file
    * commits stats-less, which pruning already treats conservatively
    * (always kept). */
  private def partStats(spark: SparkSession, scratch: String,
                        statsCols: Seq[String]): Map[String, Seq[(Long, Long)]] =
    if (statsCols.isEmpty) Map.empty
    else {
      import org.apache.spark.sql.functions.{col, input_file_name, max, min}
      val aggs = statsCols.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(col(c).cast("long")).as(s"mn$i"), max(col(c).cast("long")).as(s"mx$i"))
      }
      spark.read.parquet(scratch)
        .groupBy(input_file_name().as("f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .filterNot(r => (1 to 2 * statsCols.size).exists(r.isNullAt))
        .map(r => (new org.apache.hadoop.fs.Path(r.getString(0)).getName,
          statsCols.indices.map(i => (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))))
        .toMap
    }

  private def withStats(adopted: Seq[(String, String)],
                        stats: Map[String, Seq[(Long, Long)]]): Seq[String] =
    adopted.map { case (rel, srcName) =>
      stats.get(srcName)
        .map(ps => (rel +: ps.flatMap { case (mn, mx) => Seq(mn.toString, mx.toString) })
          .mkString("|"))
        .getOrElse(rel)
    }

  /** Append `df` as new data files + one manifest commit. Returns the
    * committed version. Safe under concurrent appends/compactions.
    * `statsCols` (integer columns) record per-file min/max pairs in the
    * manifest entry, in order, for [[pruneFiles]]/[[pruneFilesND]] data
    * skipping. */
  def append(spark: SparkSession, table: String, df: DataFrame,
             statsCols: Seq[String] = Seq.empty): Long = {
    val scratch = s"$table/.append_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(scratch)
    Fs.deleteIfExists(spark, s"$scratch/_SUCCESS")
    val stats = partStats(spark, scratch, statsCols)
    val mine = withStats(adoptParts(spark, table, scratch, "append"), stats)
    commitLoop(spark, table, "append")((_, existing) => existing ++ mine)
  }

  /** Copy-on-write REPLACE: commit `df` as the table's ENTIRE new file
    * set — the file-level commit that MERGE/UPDATE/DELETE compile to in
    * Delta/Iceberg's copy-on-write mode. Prior files leave the live
    * snapshot atomically with the manifest commit and stay reachable
    * only through earlier versions (time travel) until [[vacuum]].
    * Returns the committed version. Unlike [[compact]] there is no
    * input-liveness precondition: replace wins over concurrent appends
    * by design (last-writer-wins table semantics), which is the
    * documented contract of an overwrite commit. Txn markers are NOT
    * files and are NOT replaced: they ride through the rebase, so a
    * streaming writer's batch watermark survives an overwrite and a
    * replayed micro-batch (foreachBatch redelivery) still skips —
    * replace overwrites the DATA, never the exactly-once ledger. */
  def replace(spark: SparkSession, table: String, df: DataFrame,
              statsCols: Seq[String] = Seq.empty): Long = {
    val scratch = s"$table/.replace_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(scratch)
    Fs.deleteIfExists(spark, s"$scratch/_SUCCESS")
    val stats = partStats(spark, scratch, statsCols)
    val mine = withStats(adoptParts(spark, table, scratch, "replace"), stats)
    commitLoop(spark, table, "replace")((_, latest) => latest.filter(isMarker) ++ mine)
  }

  /** Compact the CURRENT snapshot's files into `targetFiles`, committing
    * `latest − inputs + compacted` so appends that land mid-rewrite
    * survive. `beforeCommit` is a test seam for deterministic
    * interleaving. Fails loud if an input vanished from the latest
    * manifest (a competing remover). Returns the committed version. */
  def compact(spark: SparkSession, table: String, targetFiles: Int,
              beforeCommit: () => Unit = () => ()): Long = {
    val (v0, allEntries) = snapshot(spark, table)
    require(v0 >= 0, s"manifest table $table has no committed version")
    // rewrite DATA entries only; txn markers pass through the rebase
    // untouched (they are not in inputSet, so `latest.filterNot` keeps
    // them — a streaming writer's watermark survives compaction)
    val inputs = allEntries.filterNot(isMarker)
    val scratch = s"$table/.compact_${java.util.UUID.randomUUID().toString.take(8)}"
    // inputs are raw entries — strip the stats suffix to read; the
    // compacted outputs carry no stats (conservative: pruneFiles always
    // keeps stats-less files, so correctness is unaffected)
    spark.read.parquet(inputs.map(e => s"$table/${pathOf(e)}"): _*)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(scratch)
    Fs.deleteIfExists(spark, s"$scratch/_SUCCESS")
    val compacted = adoptParts(spark, table, scratch, "compact").map(_._1)
    beforeCommit()
    val inputSet = inputs.toSet
    commitLoop(spark, table, "compact") { (parent, latest) =>
      val missing = inputSet -- latest.toSet
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"compaction inputs vanished from $table manifest v$parent: $missing — a competing remover; aborting")
      latest.filterNot(inputSet) ++ compacted
    }
  }

  /** Garbage-collect in two coupled steps so every SURVIVING manifest
    * version stays fully readable (round-3 advice: the old form swept
    * data files still referenced by recent manifests, dangling the
    * time-travel surface):
    *  1. expire manifests older than `retentionMs` (never the latest) —
    *     readers pinned beyond the retention window lose their snapshot
    *     explicitly (missing manifest) rather than dangling on missing
    *     data files;
    *  2. delete data files referenced by NO surviving manifest and older
    *     than `retentionMs` (the mod-time guard also protects a writer's
    *     adopted-but-not-yet-committed files).
    * Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, table: String, retentionMs: Long = 10 * 60 * 1000L): Int = {
    val latest = latestVersion(spark, table)
    val cutoff = System.currentTimeMillis() - retentionMs
    val fs = new org.apache.hadoop.fs.Path(dataDir(table)).getFileSystem(Fs.conf(spark))
    def mtime(p: String) =
      fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getModificationTime
    val manifests = Fs.listFiles(spark, manifestDir(table), _.endsWith(".manifest")).map(_._1)
    def versionOf(p: String) =
      new org.apache.hadoop.fs.Path(p).getName.drop(1).takeWhile(_.isDigit).toLong
    val (expired, surviving) = manifests.partition(p =>
      versionOf(p) != latest && mtime(p) < cutoff)
    expired.foreach(Fs.deleteIfExists(spark, _))
    // compare by file NAME (unique by construction): the listing returns
    // fully-qualified URIs, the manifest stores table-relative paths
    val live = surviving.map(versionOf).flatMap(filesAt(spark, table, _))
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val dead = Fs.listFiles(spark, dataDir(table), _.endsWith(".parquet"))
      .map(_._1)
      .filterNot(p => live(new org.apache.hadoop.fs.Path(p).getName))
      .filter(p => mtime(p) < cutoff)
    dead.foreach(Fs.deleteIfExists(spark, _))
    dead.size
  }
}

package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** Small-file compaction + vacuum as a maintenance job — the parquet
  * equivalent of the reference's `optimize.compact()` + `vacuum(0)`
  * (reference pipeline/preprocess.py:62-93, every 6 h per workflow.py:20-23):
  *
  *  1. read the table directory,
  *  2. rewrite it as `targetFiles` partitions into a temp dir (K5),
  *  3. atomically swap temp into place (directory rename),
  *  4. delete the superseded files (K6 vacuum, retention 0).
  *
  * The swap is a pair of metadata-only renames: readers see the old
  * file set, a brief missing-directory window (fail-fast, retryable —
  * never a MIX of old and new files), or the new set. A crash inside
  * that window leaves the data in `.compact_old`; the next
  * `compactTable` call restores it before doing anything else, so no
  * crash point loses the table. What this
  * deliberately does NOT preserve is a streaming sink's `_spark_metadata`
  * commit log — compaction retires it (the rewritten files are not the
  * committed ones, so a stale log would hide them from batch readers).
  * Ingestion into a compacted table therefore resumes with a fresh
  * checkpoint + sink log, exactly like the reference's cadence where
  * compaction runs between ingest cycles under a shared lock (T4;
  * reference pipeline/settings.py:37-40). A transactional table format
  * (Delta/Iceberg) is the production answer when compaction must
  * interleave with live appends — not available offline (SURVEY §7).
  *
  * Scale: the rewrite is one distributed `repartition(k)` pass —
  * shuffle-bounded, no driver data movement; vacuum is a driver-side
  * metadata walk of the retired directory only.
  */
object Compact {

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }

  /** Recursive delete for sibling maintenance jobs (checkpoint
    * retirement when a compaction supersedes a streaming sink log). */
  def deleteRecPublic(p: Path): Unit = deleteRec(p)

  /** Compact `tableDir` to `targetFiles` files (pass <= 0 to size the
    * target from the data: ceil(bytes / 128 MB), the parquet-friendly
    * file size — so compaction never INCREASES the file count of a
    * small table). Returns (filesBefore, filesAfter) over data files. */
  def compactTable(spark: SparkSession, tableDir: String, targetFiles: Int = 0): (Int, Int) = {
    def dataFiles(dir: Path): Array[Path] =
      if (!Files.exists(dir)) Array.empty
      else {
        val s = Files.walk(dir)
        try s.toArray.map(_.asInstanceOf[Path])
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      }
    val dir = Paths.get(tableDir)
    // crash recovery: a previous run that died between the two swap
    // moves left the data only in `.compact_old` — restore it BEFORE
    // the scratch cleanup below, which would otherwise delete the last
    // surviving copy of the table.
    val oldP = Paths.get(tableDir + ".compact_old")
    if (!Files.exists(dir) && Files.exists(oldP))
      Files.move(oldP, dir, StandardCopyOption.ATOMIC_MOVE)
    val before = dataFiles(dir).length
    val target =
      if (targetFiles > 0) targetFiles
      else {
        val bytes = dataFiles(dir).map(Files.size(_)).sum
        math.max(1, math.ceil(bytes / (128.0 * 1024 * 1024)).toInt)
      }
    val tmp = Paths.get(tableDir + ".compact_tmp")
    val old = Paths.get(tableDir + ".compact_old")
    deleteRec(tmp); deleteRec(old)
    spark.read.parquet(tableDir)
      .repartition(target)
      .write.mode("overwrite").parquet(tmp.toString)
    // drop the scratch _SUCCESS marker so the swapped dir is data-only
    Files.deleteIfExists(tmp.resolve("_SUCCESS"))
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    deleteRec(old) // K6 vacuum, retention 0
    val after = dataFiles(dir).length
    (before, after)
  }
}

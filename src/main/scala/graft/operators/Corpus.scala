package graft.operators

import org.apache.spark.sql.SparkSession

/** Runtime corpus-size estimates for the LSH/IVF parameter derivations
  * ([[LshParams]]).
  *
  * Round-8 closure of the one measured scale-killer class left (SCALE.md's
  * 275× fixed-bucket control): the bands/planes/sub-cell derivations need a
  * corpus-size estimate, and a STALE estimate (a fixture constant, a
  * forgotten system property) silently degrades every bucketed candidate
  * path toward its quadratic form. So the estimate is now read from the
  * DATA: an exact row count from the parquet footers of the corpus table —
  * a metadata-only read (no row data, no Spark job), microseconds per file,
  * cached per path for the JVM's lifetime.
  *
  * Oracle synchronization (the reason previous rounds used a static
  * default): the DuckDB oracle SQL must be generated from the IDENTICAL
  * parameter values or the two engines bucket differently and the hash
  * gate fails spuriously. That is preserved by ordering, not by constants:
  * [[graft.Verify]] primes this object for its fixture dir BEFORE running
  * queries or dumping `oracle_sql.json`, and every derived-parameter query
  * re-primes (cached, idempotent) for its own sfDir on entry — so within a
  * process, plans and oracles always derive from the same footer count.
  * One sfDir per process is the harness contract (Verify/Bench/ScaleRun
  * all hold it); a service processing multiple corpora concurrently would
  * key the estimate per corpus path instead of per JVM.
  *
  * The fallback chain for sessions that never prime (unit tests driving a
  * single operator): system property (`graft.corpus.embeddings` /
  * `graft.corpus.documents`) then the verification fixture's 500 — the
  * values every oracle was originally verified at.
  */
object Corpus {

  private val rowCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Exact row count of a parquet file (or directory of part files) from
    * footers only — no row-group data is read and no Spark job runs. */
  def parquetRows(spark: SparkSession, path: String): Long =
    rowCache.computeIfAbsent(path, _ => {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val statuses =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        else Array(fs.getFileStatus(p))
      statuses.map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    })

  @volatile private var embPrimed: Option[Long] = None
  @volatile private var docPrimed: Option[Long] = None

  /** Derive (and pin) the corpus estimates from the fixture dir's footers.
    * Idempotent and cheap after the first call per path. Tolerant of a
    * dir missing either table (TPC-H-only callers): the missing side just
    * stays on its previous/fallback value. */
  def prime(spark: SparkSession, sfDir: String): Unit = {
    try embPrimed = Some(parquetRows(spark, s"$sfDir/embeddings.parquet"))
    catch { case _: Throwable => () }
    try docPrimed = Some(parquetRows(spark, s"$sfDir/documents.parquet"))
    catch { case _: Throwable => () }
  }

  /** Current embeddings-corpus estimate (primed → property → fixture). */
  def embeddings: Long = embPrimed
    .orElse(sys.props.get("graft.corpus.embeddings").map(_.toLong))
    .getOrElse(500L)

  /** Current documents-corpus estimate (primed → property → fixture). */
  def documents: Long = docPrimed
    .orElse(sys.props.get("graft.corpus.documents").map(_.toLong))
    .getOrElse(500L)
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared text primitives for the LLM-data-pipeline operators: whitespace
  * tokenization, word k-shingles, and md5-derived hashing that both Spark
  * and DuckDB compute identically (so every hash-based operator stays
  * oracle-verifiable — SURVEY §7.5).
  *
  * All of these are pure `functions._` column expressions: they run inside
  * WholeStageCodegen, never leave the JVM, and need no UDF. At 100 TB the
  * shingle arrays exist only inside the projection — no materialization.
  */
object Text {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** documents → (doc_id, sh: array<string> of distinct 3-shingles),
    * via the native codegen'd [[graft.plans.WordShingles]] expression
    * (~15× the interpreted higher-order-function equivalent, measured).
    * The equivalent oracle-side CTE is [[shingleCteSql]].
    *
    * Repartitions on doc_id ONLY when the input has fewer splits than
    * the needed width (the small-file fixtures), where shingle
    * construction — per-row compute-heavy — would otherwise run on too
    * few cores. At 100 TB the input has thousands of splits, the
    * condition is false, and no shuffle of text payloads happens at all.
    *
    * The width is derived from the DOCUMENT COUNT (~512 docs per task),
    * not from `spark.sql.shuffle.partitions` (r14, SCALE.md round-14):
    * the shingle/md5/sort map stages over this relation are CPU-dense
    * at tiny bytes, so the byte-based shuffle sizing under-resolves
    * them — the r13/r14 x100n A/Bs measured a per-task cost CLIFF
    * (p50 783 ms/task at 183 partitions vs 54 ms at 276, identical
    * data) that made dd_containment's wall non-monotonic in the global
    * partition count. Row-derived width pins these stages into the
    * measured-fast regime independently of the byte-derived session
    * value; at the verification fixtures (≤5k docs) it equals the core
    * floor, leaving those plans byte-identical. */
  def shingled(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.documents(spark, sfDir)
    graft.operators.Corpus.prime(spark, sfDir)
    val width = math.min(4096L, math.max(
      spark.sparkContext.defaultParallelism.toLong,
      (graft.operators.Corpus.documents + 511L) / 512L)).toInt
    val spread =
      if (raw.inputFiles.length < width) raw.repartition(width, col("doc_id"))
      else raw
    spread
      .select(col("doc_id"),
        graft.plans.WordShingles.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** DuckDB CTE producing the same (doc_id, s) shingle relation. */
  val shingleCteSql: String =
    """t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                 for i in generate_series(1, len(w) - 2)]) AS s
      |  FROM t WHERE len(w) >= 3)""".stripMargin

  /** 60-bit integer hash of a string via md5 — identical in both engines:
    * Spark `conv(substr(md5(x),1,15),16,10)`, DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`. 15 hex chars keep the value
    * positive within int64. */
  def hash60SparkSql(x: String): String =
    s"cast(conv(substr(md5($x), 1, 15), 16, 10) as bigint)"

  def hash60DuckSql(x: String): String =
    s"('0x' || substr(md5($x), 1, 15))::BIGINT"
}

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
    * cores (the single-small-file fixture), where shingle construction —
    * per-row compute-heavy — would otherwise run on one core. At 100 TB
    * the input has thousands of splits, the condition is false, and no
    * shuffle of text payloads happens at all. */
  def shingled(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.documents(spark, sfDir)
    val spread =
      if (raw.inputFiles.length < spark.sparkContext.defaultParallelism)
        raw.repartition(col("doc_id"))
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

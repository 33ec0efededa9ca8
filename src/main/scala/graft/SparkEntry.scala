package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Curation, Dedup, Events, Graph, IvfPq, Journeys, MlPrep, MlScore, Multimodal, Pq, Relational, Similarity, TextAnalysis, Tpch, TypedOps}
import graft.streaming.{Pipeline, StreamingOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's surface; each entry
  * with a DuckDB-expressible semantics also appears in `oracleSql` with
  * IDENTICAL column names/aliases (the driver's compare sorts columns by
  * name before hashing). Nondeterministic ops (true uuid4, rand) generate
  * their nondeterministic columns in-plan but project them onto
  * deterministic invariants the oracle CAN pin (count/uniqueness/format/
  * bounds — r12); per-value properties stay in ScalaTest (SynthSpec).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one analytical query (reference pipeline/reduce.py:24-78). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Unshipped(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Tpch.queries ++ Events.queries ++ Journeys.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      StreamingOps.queries ++ Pipeline.queries ++ MlScore.queries ++ MlPrep.queries ++ Curation.queries ++
      Pq.queries ++ IvfPq.queries ++ Graph.queries ++ Analytics.queries ++
      graft.sources.FormatRoundtrips.queries ++ TypedOps.queries

  /** Vector-validity quarantine, oracle side (r11; the Spark side is
    * [[graft.sources.Tables.embeddings]]'s `size(embedding) > 0`
    * filter). Injected as a CTE that SHADOWS the raw `embeddings`
    * table for the whole statement, so every oracle reference — plain,
    * aliased, self-joined, or inside a subquery — resolves to the
    * validated corpus with zero per-oracle editing and zero drift
    * between the 31 reference sites. On clean fixtures the predicate
    * keeps every row; on the widened nulls gate it drops exactly the
    * rows the Spark loader drops. */
  private val EmbQuarantineCte =
    // main.embeddings: inside the CTE body the bare name would resolve
    // to the CTE itself (circular); the schema-qualified name pins the
    // base view
    "embeddings AS (SELECT * FROM main.embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0)"

  private val EmbRef = java.util.regex.Pattern.compile("\\bembeddings\\b")

  private def quarantineEmb(sql: String): String =
    if (!EmbRef.matcher(sql).find()) sql
    else {
      val t = sql.dropWhile(_.isWhitespace)
      if (t.regionMatches(true, 0, "WITH RECURSIVE ", 0, 15))
        "WITH RECURSIVE " + EmbQuarantineCte + ", " + t.substring(15)
      else if (t.regionMatches(true, 0, "WITH ", 0, 5))
        "WITH " + EmbQuarantineCte + ", " + t.substring(5)
      else "WITH " + EmbQuarantineCte + "\n" + sql
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Every
    * SQL referencing the embeddings table is wrapped with the
    * quarantine CTE (see [[quarantineEmb]]). */
  def oracleSql: Map[String, String] =
    (Relational.oracles ++ Tpch.oracles ++ Events.oracles ++ Journeys.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      StreamingOps.oracles ++ Pipeline.oracles ++ MlScore.oracles ++ MlPrep.oracles ++ Curation.oracles ++
      Pq.oracles ++ IvfPq.oracles ++ Graph.oracles ++ Analytics.oracles ++
      graft.sources.FormatRoundtrips.oracles ++ TypedOps.oracles)
      .map { case (k, v) => k -> quarantineEmb(v) }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` fixture (north-star extension
  * surface, SURVEY §7.5): exact brute-force cosine top-k as the baseline,
  * random-hyperplane LSH bucketing as the scale path, and embedding-based
  * near-duplicate pairs.
  *
  * Scale design: brute-force is O(probes × corpus) — fine for a probe
  * batch against any corpus size because it is a broadcast of the probes,
  * a map-side dot product, and a TakeOrderedAndProject per probe; the
  * corpus never shuffles. The LSH variant turns the corpus scan into an
  * equi-join on a small int bucket key, so at 100 TB each probe touches
  * only its bucket's partitions. (IVF with a trained coarse quantizer is
  * the next step up; hyperplane LSH gives the same join shape without a
  * training pass.)
  *
  * Bit-exactness: cosine = dot/(√dot_aa·√dot_bb) where every dot product
  * is a strict left fold in array-index order in BOTH engines (Spark
  * `aggregate`, DuckDB `list_reduce`) over float→double casts — identical
  * IEEE operation sequence, so doubles compare equal and no rounding is
  * needed.
  */
object Similarity {

  /** Spark: strict-left-fold dot product of two double-array columns. */
  private def dotS(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"

  /** DuckDB: the same fold (list_reduce seeds with the first element;
    * Spark seeds 0.0 — adding 0.0 is exact, so results are identical). */
  private def dotD(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def embWithNorm(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .repartition(col("vec_id")) // single-file fixture → spread the per-row dot products
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr(s"sqrt(${dotS("emb", "emb")})"))
      .select("vec_id", "emb", "nrm")

  private val duckEmbCte: String =
    s"""e AS (SELECT vec_id, embedding, sqrt(${dotD("embedding", "embedding")}) AS nrm
       |  FROM embeddings)""".stripMargin

  /** Exact ANN baseline: brute-force cosine top-10 for each probe
    * (vec_id < 10). Probes broadcast; corpus is scanned once. */
  def annTopkExact(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embWithNorm(spark, sfDir)
    val probes = e.select(col("vec_id").as("probe_id"), col("emb").as("p_emb"), col("nrm").as("p_nrm"))
      .filter(col("probe_id") < 10)
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("neighbor_id"))
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", expr(s"${dotS("emb", "p_emb")}") / (col("nrm") * col("p_nrm")))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy("probe_id", "rank")
  }

  private val annTopkExactSql: String =
    s"""WITH $duckEmbCte
       |SELECT probe_id, neighbor_id, cosine, rank FROM (
       |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       |    ${dotD("e.embedding", "p.embedding")} / (e.nrm * p.nrm) AS cosine,
       |    row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY ${dotD("e.embedding", "p.embedding")} / (e.nrm * p.nrm) DESC,
       |               e.vec_id) AS rank
       |  FROM e JOIN e p ON p.vec_id < 10 AND e.vec_id <> p.vec_id) t
       |WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin

  /** Deterministic ±1 hyperplanes: sign p,j from md5("plane:p:j") parity.
    * Derived in Scala once and inlined as literals in BOTH the Spark plan
    * and the oracle SQL, so the bucketing is engine-independent. */
  private val Planes = 6
  private val Dim = 64
  private lazy val planes: Array[Array[Int]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dim) { (p, j) =>
      val h = mdt.digest(s"plane:$p:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1 else -1
    }
  }

  private def planeArrS(p: Int): String =
    planes(p).map(v => s"${v}.0D").mkString("array(", ", ", ")")
  private def planeArrD(p: Int): String =
    planes(p).map(v => s"${v}.0").mkString("([", ", ", "]::DOUBLE[])")

  private def bucketExprS: String =
    (0 until Planes).map { p =>
      s"(CASE WHEN ${dotS("emb", planeArrS(p))} > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("cast(", " + ", " as bigint)")

  private def bucketExprD(emb: String): String =
    (0 until Planes).map { p =>
      s"(CASE WHEN ${dotD(emb, planeArrD(p))} > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")

  /** LSH-bucketed ANN (scale path): assign every vector to one of 2^6
    * hyperplane-sign buckets, then rerank only the probe's bucket-mates
    * by exact cosine — an equi-join, not a scan. */
  def annLshBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embWithNorm(spark, sfDir).withColumn("bucket", expr(bucketExprS))
    val probes = e.select(col("vec_id").as("probe_id"), col("emb").as("p_emb"),
      col("nrm").as("p_nrm"), col("bucket"))
      .filter(col("probe_id") < 10)
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("neighbor_id"))
    e.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", expr(s"${dotS("emb", "p_emb")}") / (col("nrm") * col("p_nrm")))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("bucket"), col("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("probe_id", "rank")
  }

  private val annLshBucketedSql: String =
    s"""WITH $duckEmbCte,
       |bk AS (SELECT vec_id, embedding, nrm, ${bucketExprD("embedding")} AS bucket FROM e)
       |SELECT probe_id, neighbor_id, bucket, cosine, rank FROM (
       |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id, e.bucket,
       |    ${dotD("e.embedding", "p.embedding")} / (e.nrm * p.nrm) AS cosine,
       |    row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY ${dotD("e.embedding", "p.embedding")} / (e.nrm * p.nrm) DESC,
       |               e.vec_id) AS rank
       |  FROM bk e JOIN bk p ON e.bucket = p.bucket AND p.vec_id < 10
       |    AND e.vec_id <> p.vec_id) t
       |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs: probe decile (vec_id % 10 = 0)
    * against the corpus, top-100 closest pairs. (Fixture vectors have no
    * cosine > 0.5 pairs, so a threshold form would be vacuous — top-k
    * keeps the operator observable at every scale.) */
  def ddEmbedCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embWithNorm(spark, sfDir)
    val probes = e.select(col("vec_id").as("va"), col("emb").as("emb_a"), col("nrm").as("nrm_a"))
      .filter(col("va") % 10 === 0)
    e.join(broadcast(probes), col("va") < col("vec_id"))
      .withColumn("cosine", expr(s"${dotS("emb", "emb_a")}") / (col("nrm") * col("nrm_a")))
      .select(col("va"), col("vec_id").as("vb"), col("cosine"))
      .orderBy(col("cosine").desc, col("va"), col("vb"))
      .limit(100)
  }

  private val ddEmbedCosineSql: String =
    s"""WITH $duckEmbCte
       |SELECT a.vec_id AS va, b.vec_id AS vb,
       |  ${dotD("b.embedding", "a.embedding")} / (b.nrm * a.nrm) AS cosine
       |FROM e a JOIN e b ON a.vec_id % 10 = 0 AND a.vec_id < b.vec_id
       |ORDER BY cosine DESC, va, vb LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_exact" -> (annTopkExact _),
    "ann_lsh_bucketed" -> (annLshBucketed _),
    "dd_embed_cosine" -> (ddEmbedCosine _))

  val oracles: Map[String, String] = Map(
    "ann_topk_exact" -> annTopkExactSql,
    "ann_lsh_bucketed" -> annLshBucketedSql,
    "dd_embed_cosine" -> ddEmbedCosineSql)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.10 ML batch scoring — the last SURVEY §2 row, closed with the
  * shape SURVEY names (a Scala tree-walk batch scorer, no serving
  * layer): the reference ships a vestigial XGBoost `multi:softprob`
  * classifier (reference model.json:1 — 5 classes, 2 features) that
  * nothing loads; the CAPABILITY a user would port is "score every row
  * through a gradient-boosted tree ensemble in one pass".
  *
  * The model here is a content-addressed stand-in with the same shape
  * (5 classes × 4 depth-2 trees on two `part` features): thresholds
  * and leaf weights derive from md5 parity in Scala ONCE, then inline
  * as plain decimal literals into a dialect-neutral CASE expression
  * evaluated by BOTH engines — Spark runs it inside WholeStageCodegen
  * (no UDF, one map-side projection, zero shuffles; at 100 TB this is
  * scan-bound, embarrassingly parallel scoring), DuckDB runs the
  * identical text, so class margins are bit-exact and the oracle
  * hash-verifies train-free scoring end-to-end. Real-model parity
  * would swap the generated constants for parsed model.json values —
  * the expression compiler below is the engine piece either way.
  *
  * Determinism: every margin is a sum of literal doubles selected by
  * comparisons on raw column values — no transcendental softmax (rank
  * by margin is softmax rank, argmax ties to the lower class in both
  * engines).
  */
object MlScore {

  private val Classes = 5
  private val TreesPerClass = 4

  /** Uniform-ish value in [lo, hi) from md5 of a seed, rounded to 2
    * decimals so the inlined literal text parses to the same double in
    * any engine. */
  private def u(seed: String, lo: Double, hi: Double): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
    val v = ((h(0) & 0x7f).toLong << 24 | (h(1) & 0xff).toLong << 16 |
      (h(2) & 0xff).toLong << 8 | (h(3) & 0xff).toLong)
    val x = lo + (v % 10000) / 10000.0 * (hi - lo)
    math.rint(x * 100) / 100
  }

  /** One depth-2 tree as a dialect-neutral CASE expression over
    * p_retailprice (root) and p_size (both children). */
  private def treeExpr(c: Int, t: Int): String = {
    val s = s"gbt:$c:$t"
    val thr0 = u(s"$s:r", 900.0, 2000.0)
    val thrL = u(s"$s:l", 1.0, 50.0)
    val thrR = u(s"$s:rr", 1.0, 50.0)
    val w = (0 until 4).map(i => u(s"$s:w$i", -0.5, 0.5))
    s"(CASE WHEN p_retailprice < $thr0 " +
      s"THEN (CASE WHEN p_size < $thrL THEN ${w(0)} ELSE ${w(1)} END) " +
      s"ELSE (CASE WHEN p_size < $thrR THEN ${w(2)} ELSE ${w(3)} END) END)"
  }

  private def marginExpr(c: Int): String =
    (0 until TreesPerClass).map(t => treeExpr(c, t)).mkString("(", " + ", ")")

  /** argmax over the margin columns, ties to the lower class. */
  private val argmaxExpr: String =
    (0 until Classes - 1).map { c =>
      val geRest = (c + 1 until Classes).map(d => s"m$c >= m$d").mkString(" AND ")
      s"WHEN $geRest THEN $c"
    }.mkString("CASE ", " ", s" ELSE ${Classes - 1} END")

  private val greatestExpr: String =
    (0 until Classes).map(c => s"m$c").mkString("greatest(", ", ", ")")

  /** Score every part row through the ensemble: one codegen'd
    * projection, then the argmax — no shuffle until the output sort. */
  def mlScoreGbt(spark: SparkSession, sfDir: String): DataFrame = {
    val margins = (0 until Classes).map(c => expr(marginExpr(c)).as(s"m$c"))
    Tables.part(spark, sfDir)
      .select(col("p_partkey") +: margins: _*)
      .select(col("p_partkey"),
        expr(argmaxExpr).cast("long").as("pred_class"),
        expr(greatestExpr).as("pred_margin"))
      .orderBy("p_partkey")
  }

  private val mlScoreGbtSql: String = {
    val margins = (0 until Classes).map(c => s"${marginExpr(c)} AS m$c").mkString(",\n  ")
    s"""WITH m AS (SELECT p_partkey, $margins FROM part)
       |SELECT p_partkey,
       |  ($argmaxExpr)::BIGINT AS pred_class,
       |  $greatestExpr AS pred_margin
       |FROM m ORDER BY p_partkey""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_score_gbt" -> (mlScoreGbt _))

  val oracles: Map[String, String] = Map(
    "ml_score_gbt" -> mlScoreGbtSql)
}

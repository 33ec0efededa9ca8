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

  /** One depth-2 tree as a dialect-neutral CASE expression over the
    * price feature (root; `priceCol` names the column — the partial-
    * dependence query substitutes its exploded grid column here, a
    * parameter rather than post-hoc string surgery) and p_size (both
    * children). */
  private def treeExpr(c: Int, t: Int, priceCol: String = "p_retailprice"): String = {
    val s = s"gbt:$c:$t"
    val thr0 = u(s"$s:r", 900.0, 2000.0)
    val thrL = u(s"$s:l", 1.0, 50.0)
    val thrR = u(s"$s:rr", 1.0, 50.0)
    // Leaf weights as CAST(… AS DOUBLE) — dialect-neutral in both
    // engines. A bare `0.25` parses as DECIMAL in Spark SQL, making the
    // margin sum DECIMAL(5,2) while DuckDB's is DOUBLE (the same literal
    // hazard as op_sql_interface, r8 strict type gate); the cast keeps
    // both engines on identical left-to-right double additions.
    val w = (0 until 4).map(i => s"CAST(${u(s"$s:w$i", -0.5, 0.5)} AS DOUBLE)")
    s"(CASE WHEN $priceCol < $thr0 " +
      s"THEN (CASE WHEN p_size < $thrL THEN ${w(0)} ELSE ${w(1)} END) " +
      s"ELSE (CASE WHEN p_size < $thrR THEN ${w(2)} ELSE ${w(3)} END) END)"
  }

  private def marginExpr(c: Int, priceCol: String = "p_retailprice"): String =
    (0 until TreesPerClass).map(t => treeExpr(c, t, priceCol)).mkString("(", " + ", ")")

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

  // ---------------------------------------------------------------------
  // The REAL reference artifact (reference model.json:1): a 500-tree
  // XGBoost multi:softprob classifier (5 classes × 100 rounds, features
  // p_partkey / s_acctbal, trees up to 33 nodes). ml_score_gbt above
  // proves the expression-compiler plan at toy size; ml_score_xgb
  // parses the actual artifact and scores through the SAME compiler,
  // proving the one-projection tree-walk holds at 500 trees.
  // ---------------------------------------------------------------------

  /** Minimal reader for the XGBoost JSON model format (the PUBLIC
    * format, xgboost doc "Introduction to Model IO"): per tree,
    * parallel arrays `left_children`/`right_children` (−1 = leaf),
    * `split_indices` (feature ordinal), `split_conditions` (threshold
    * for splits, leaf VALUE for leaves), and `tree_info` mapping each
    * tree to its class. Parsed with Jackson (already on Spark's
    * classpath). Loaded once per JVM; the artifact path defaults to
    * the reference checkout and is overridable via GRAFT_XGB_MODEL. */
  private[operators] object Xgb {
    final case class Tree(cls: Int, left: Array[Int], right: Array[Int],
                          featIdx: Array[Int], cond: Array[Double],
                          defLeft: Array[Boolean])
    final case class Model(numClass: Int, baseScore: Double,
                           featNames: Seq[String], trees: Seq[Tree])

    val path: String =
      sys.env.getOrElse("GRAFT_XGB_MODEL", "/root/reference/model.json")

    lazy val model: Model = {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val learner = om.readTree(new java.io.File(path)).get("learner")
      def ints(n: com.fasterxml.jackson.databind.JsonNode): Array[Int] =
        (0 until n.size).map(n.get(_).asInt).toArray
      def dbls(n: com.fasterxml.jackson.databind.JsonNode): Array[Double] =
        (0 until n.size).map(n.get(_).asDouble).toArray
      val lp = learner.get("learner_model_param")
      val gb = learner.get("gradient_booster").get("model")
      val info = ints(gb.get("tree_info"))
      val ts = gb.get("trees")
      val trees = (0 until ts.size).map { i =>
        val t = ts.get(i)
        Tree(info(i), ints(t.get("left_children")), ints(t.get("right_children")),
          ints(t.get("split_indices")), dbls(t.get("split_conditions")),
          ints(t.get("default_left")).map(_ != 0))
      }
      val feats = (0 until learner.get("feature_names").size)
        .map(learner.get("feature_names").get(_).asText)
      Model(lp.get("num_class").asText.toInt, lp.get("base_score").asText.toDouble,
        feats, trees)
    }

    /** The model flattened to structure-of-arrays for the native
      * [[graft.plans.XgbEnsemble]] tree-walk (per-tree node arrays
      * concatenated; child indices rebased to global offsets). */
    lazy val ensemble: graft.plans.XgbEnsemble = {
      val m = model
      val offsets = m.trees.scanLeft(0)(_ + _.left.length)
      val reb = m.trees.zip(offsets).map { case (t, o) =>
        (t.left.map(c => if (c < 0) -1 else c + o), t.right.map(c => if (c < 0) -1 else c + o))
      }
      new graft.plans.XgbEnsemble(
        m.numClass, m.baseScore,
        m.trees.map(_.cls).toArray, offsets.init.toArray,
        reb.flatMap(_._1).toArray, reb.flatMap(_._2).toArray,
        m.trees.flatMap(_.featIdx).toArray, m.trees.flatMap(_.cond).toArray,
        m.trees.flatMap(_.defLeft).toArray)
    }
  }

  /** Double literal rendered so BOTH engines parse it as a DOUBLE:
    * Spark parses plain decimal SQL literals as DECIMAL (a 100-term
    * decimal sum would diverge from DuckDB's double arithmetic), so
    * every constant gets an exponent suffix — `1294.72e0` is DoubleType
    * in Spark and DOUBLE in DuckDB. Double.toString round-trips, so
    * both engines recover the exact same float64. */
  private def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** One XGBoost tree as a dialect-neutral CASE expression (text, for
    * the DuckDB oracle). `feature < threshold → left` is the xgboost
    * split rule; a NULL (missing) feature routes to the node's
    * `default_left` child — the artifact's learned missing direction,
    * mirrored in the native walk's NaN branch (XgbEnsemble.score).
    * Each subtree renders exactly ONCE (2^depth nodes, not the naive
    * 3^depth of a separate IS NULL arm duplicating the default child):
    * default_left folds missing into the left predicate
    * (`IS NULL OR feat < cond`); default_right needs nothing extra —
    * three-valued `NULL < cond` is NULL, so CASE already takes ELSE
    * (the right child) on missing. */
  private def treeSqlXgb(t: Xgb.Tree, feats: Seq[String], i: Int = 0): String =
    if (t.left(i) < 0) dlit(t.cond(i))
    else {
      val feat = feats(t.featIdx(i))
      val goLeft =
        if (t.defLeft(i)) s"$feat IS NULL OR $feat < ${dlit(t.cond(i))}"
        else s"$feat < ${dlit(t.cond(i))}"
      s"(CASE WHEN $goLeft THEN ${treeSqlXgb(t, feats, t.left(i))} " +
        s"ELSE ${treeSqlXgb(t, feats, t.right(i))} END)"
    }

  private def argmaxSql(n: Int): String =
    (0 until n - 1).map { c =>
      val geRest = (c + 1 until n).map(d => s"m$c >= m$d").mkString(" AND ")
      s"WHEN $geRest THEN $c"
    }.mkString("CASE ", " ", s" ELSE ${n - 1} END")

  /** Score every (part ⋈ supplier) row through the real 500-tree
    * ensemble. The supplier side is keymapped (p_partkey mod supplier
    * count — suppkeys are 0-based dense) and BROADCAST: at 100 TB the
    * part scan streams through ONE codegen'd projection whose scoring
    * call is the native [[graft.plans.XgbScore]] array tree-walk (a
    * nested-CASE compilation of 500 trees blows the 64 KB JVM method
    * limit and de-codegens the whole stage — see XgbScore's scaladoc).
    * argmax = array_position of array_max (first occurrence → ties to
    * the lower class, same rule as the oracle's CASE chain); margins
    * are bit-exact across engines because the walk accumulates the
    * same float64 constants in the same order as the oracle's
    * left-to-right SQL sum. */
  def mlScoreXgb(spark: SparkSession, sfDir: String): DataFrame = {
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_acctbal")
    val nSupp = supp.count()
    Tables.part(spark, sfDir)
      .withColumn("s_suppkey", col("p_partkey") % nSupp)
      .join(broadcast(supp), "s_suppkey")
      .withColumn("m", graft.plans.XgbScore.xgbMargins(
        col("p_partkey").cast("double"),
        // SQL NULL -> NaN, xgboost's missing encoding; the walk routes
        // NaN to each node's default_left child (never through `<`)
        coalesce(col("s_acctbal"), lit(Double.NaN)), Xgb.ensemble))
      .select(col("p_partkey"),
        (expr("array_position(m, array_max(m))") - 1L).cast("long").as("pred_class"),
        expr("array_max(m)").as("pred_margin"))
      .orderBy("p_partkey")
  }

  private def mlScoreXgbSql: String = {
    val m = Xgb.model
    val margins = (0 until m.numClass).map { c =>
      m.trees.filter(_.cls == c)
        .map(t => treeSqlXgb(t, m.featNames))
        .mkString(s"(${dlit(m.baseScore)} + ", " + ", s") AS m$c")
    }.mkString(",\n  ")
    val greatest = (0 until m.numClass).map(c => s"m$c").mkString("greatest(", ", ", ")")
    s"""WITH j AS (
       |  SELECT p_partkey, s_acctbal FROM part p
       |  JOIN supplier s ON s.s_suppkey = p.p_partkey % (SELECT count(*) FROM supplier)),
       |m AS (SELECT p_partkey,
       |  $margins
       |FROM j)
       |SELECT p_partkey,
       |  (${argmaxSql(m.numClass)})::BIGINT AS pred_class,
       |  $greatest AS pred_margin
       |FROM m ORDER BY p_partkey""".stripMargin
  }

  /** The real-artifact entry registers only where the artifact exists
    * (the driver and dev machines both have the reference checkout;
    * GRAFT_XGB_MODEL points anywhere else) — a missing file degrades
    * to the stand-in-only surface instead of breaking every query. */
  private lazy val xgbEntry: Option[(String, String)] =
    scala.util.Try(mlScoreXgbSql).toOption.map(("ml_score_xgb", _))

  // ---------------------------------------------------------------
  // §2.10 extension: distributed TRAINING (batch gradient descent)
  // ---------------------------------------------------------------

  /** GD hyper-parameters, shared by both engines. The link is the
    * RATIONAL sigmoid σ̃(z) = 0.5 + 0.5·z/(1+|z|) — same shape and
    * gradient sign as the logistic link but built from +,−,×,÷,|·|
    * only, so Spark and DuckDB produce BIT-IDENTICAL doubles per row
    * (IEEE ops are exactly specified; `exp` is libm-dependent and is
    * exactly what this avoids — the ta_lm_fluency / ivf centroid
    * trick applied to a training loop). */
  private val GdIters = 4
  private val GdLr = "0.5"
  private val GdScale = "1048576.0" // 2^20 fixed-point, the ivf convention
  private val LenThreshold = 306 // fixture median text length — splits classes

  /** Per-document features and label, as ONE dialect-neutral SQL
    * fragment both engines evaluate over `documents`: token count,
    * char count, type-token ratio — integer-derived rationals, exact
    * in both engines. Label: "is this a longer-than-median document"
    * (deterministic, learnable from x2 — the loop must actually
    * descend, which the decreasing SSE column proves). */
  private def gdFeatExprs(distinctFn: String, lenFn: String): Seq[String] = Seq(
    s"cast($lenFn AS DOUBLE) / 100.0 AS x1",
    "cast(length(text) AS DOUBLE) / 1000.0 AS x2",
    s"cast($distinctFn AS DOUBLE) / cast($lenFn AS DOUBLE) AS x3",
    s"(CASE WHEN length(text) > $LenThreshold THEN 1.0 ELSE 0.0 END) AS y")

  /** z and σ̃ with FIXED parenthesization — both engines must execute
    * the identical IEEE op sequence. `w*` are either decimal literals
    * (Spark, weights known driver-side) or column refs (DuckDB CTE). */
  private def gdZ(w0: String, w1: String, w2: String, w3: String): String =
    s"((($w0 + ($w1 * x1)) + ($w2 * x2)) + ($w3 * x3))"
  private def gdP(z: String): String =
    s"(0.5 + (0.5 * ($z / (1.0 + abs($z)))))"

  /** Distributed training: [[GdIters]] full-batch gradient-descent
    * steps of a linear model with the rational link, over document
    * quality features. Each step is ONE map-side-combinable aggregate
    * — per row the executor computes e·x_j for the d+1 gradient
    * components, rounds to 2^20 fixed point, and integer-sums; the
    * driver receives d+1 longs, updates d+1 doubles, and broadcasts
    * them into the next step as plain literals (shortest-round-trip
    * `Double.toString`, which both engines parse back to the exact
    * double). No parameter server, no shuffle beyond the partial-agg
    * tree, N passes over the corpus — the canonical data-parallel GD
    * shape at any scale. Output: the weight trajectory's final point
    * plus the fixed-point SSE before and after (after < before is the
    * "it actually learns" proof the oracle hash-pins). */
  def mlTrainGd(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Tables.documents(spark, sfDir)
      .selectExpr(gdFeatExprs("size(array_distinct(split(text, ' ')))",
        "size(split(text, ' '))"): _*)
    val f = Scratch.persist(feats) // N+2 passes over a projection-only frame
    def sseExpr(w: Array[Double]): org.apache.spark.sql.Column = {
      val p = gdP(gdZ(w(0).toString, w(1).toString, w(2).toString, w(3).toString))
      sum(expr(s"cast(round((($p - y) * ($p - y)) * $GdScale) as bigint)"))
    }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    val sse0 = f.agg(sseExpr(w)).head().getLong(0)
    var n = 0L
    for (_ <- 1 to GdIters) {
      val p = gdP(gdZ(w(0).toString, w(1).toString, w(2).toString, w(3).toString))
      val xs = Seq("1.0", "x1", "x2", "x3")
      val aggs = count(lit(1)).as("n") +: xs.zipWithIndex.map { case (x, j) =>
        sum(expr(s"cast(round((($p - y) * $x) * $GdScale) as bigint)")).as(s"g$j")
      }
      val r = f.agg(aggs.head, aggs.tail: _*).head()
      n = r.getLong(0)
      w = w.indices.map { j =>
        w(j) - (0.5 * ((r.getLong(j + 1).toDouble / 1048576.0) / n))
      }.toArray
    }
    val sseN = f.agg(sseExpr(w)).head().getLong(0)
    import spark.implicits._
    Seq((w(0), w(1), w(2), w(3), sse0, sseN, n, (sseN < sse0): Boolean))
      .toDF("w0", "w1", "w2", "w3", "sse_before", "sse_after", "n_docs", "descended")
  }

  /** The identical computation as unrolled DuckDB CTEs: weights flow
    * through the chain as single-row relations, each step CROSS JOINs
    * the previous weights into the per-row expressions — the SQL form
    * of broadcasting the parameter vector. */
  private def mlTrainGdSql: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH feat AS (SELECT ${gdFeatExprs("len(list_distinct(string_split(text, ' ')))",
        "len(string_split(text, ' '))").mkString(",\n    ")}
         |  FROM documents),
         |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""".stripMargin)
    def p(pref: String) = gdP(gdZ(s"$pref.w0", s"$pref.w1", s"$pref.w2", s"$pref.w3"))
    for (t <- 1 to GdIters) {
      val xs = Seq("1.0", "x1", "x2", "x3")
      val gs = xs.zipWithIndex.map { case (x, j) =>
        s"sum(cast(round(((${p("w")} - y) * $x) * $GdScale) AS BIGINT)) AS g$j"
      }.mkString(",\n    ")
      sb.append(
        s""",
           |g$t AS (SELECT count(*) AS n,
           |    $gs
           |  FROM feat CROSS JOIN w${t - 1} w),
           |w$t AS (SELECT ${(0 to 3).map(j =>
          s"(w.w$j - (0.5 * ((g.g$j / $GdScale) / g.n))) AS w$j").mkString(", ")}
           |  FROM w${t - 1} w CROSS JOIN g$t g)""".stripMargin)
    }
    sb.append(
      s""",
         |sse0 AS (SELECT cast(sum(cast(round(((${p("w")} - y) * (${p("w")} - y)) * $GdScale) AS BIGINT)) AS BIGINT) AS s,
         |    count(*) AS n FROM feat CROSS JOIN w0 w),
         |sseN AS (SELECT cast(sum(cast(round(((${p("w")} - y) * (${p("w")} - y)) * $GdScale) AS BIGINT)) AS BIGINT) AS s
         |  FROM feat CROSS JOIN w$GdIters w)
         |SELECT w.w0, w.w1, w.w2, w.w3,
         |  sse0.s AS sse_before, sseN.s AS sse_after,
         |  sse0.n AS n_docs, (sseN.s < sse0.s) AS descended
         |FROM w$GdIters w, sse0, sseN""".stripMargin)
    sb.toString
  }

  /** Model evaluation: the confusion matrix of [[mlScoreGbt]]'s argmax
    * against a content-addressed ground-truth label (md5 parity of the
    * row key — deterministic in both engines, the stand-in for a
    * labeled eval split). Scoring + labeling are ONE map-side
    * projection; the confusion matrix is a single 25-key aggregation
    * with map-side combine — at 100 TB the eval is scan-bound and the
    * driver receives classes² rows. */
  def mlEval(spark: SparkSession, sfDir: String): DataFrame = {
    val margins = (0 until Classes).map(c => expr(marginExpr(c)).as(s"m$c"))
    Tables.part(spark, sfDir)
      .select(col("p_partkey") +: margins: _*)
      .select(
        expr(s"${graft.functions.Text.hash60SparkSql("concat('label:', cast(p_partkey as string))")} % ${Classes}")
          .as("true_class"),
        expr(argmaxExpr).cast("long").as("pred_class"))
      .groupBy("true_class", "pred_class")
      .agg(count(lit(1)).as("n"))
      .orderBy("true_class", "pred_class")
  }

  private val mlEvalSql: String = {
    val margins = (0 until Classes).map(c => s"${marginExpr(c)} AS m$c").mkString(",\n  ")
    s"""WITH m AS (SELECT p_partkey, $margins FROM part),
       |scored AS (SELECT
       |    ${graft.functions.Text.hash60DuckSql("'label:' || p_partkey::VARCHAR")} % ${Classes} AS true_class,
       |    ($argmaxExpr)::BIGINT AS pred_class
       |  FROM m)
       |SELECT true_class, pred_class, count(*)::BIGINT AS n
       |FROM scored GROUP BY 1, 2 ORDER BY true_class, pred_class""".stripMargin
  }

  /** Calibration table: per predicted class, quintile bins of the
    * winning margin (rank-based `ntile(5)` with a key tie-break —
    * total order, deterministic bins in any engine) against the
    * empirical accuracy in each bin — the monotone-accuracy check a
    * scored 100 TB corpus is audited with before its scores gate
    * anything. Counts exact; the rate is one division per bin. The
    * ntile window partitions on pred_class, so bins compute in
    * parallel per class. */
  def mlCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val margins = (0 until Classes).map(c => expr(marginExpr(c)).as(s"m$c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pred_class").orderBy("pred_margin", "p_partkey")
    Tables.part(spark, sfDir)
      .select(col("p_partkey") +: margins: _*)
      .select(col("p_partkey"),
        expr(s"${graft.functions.Text.hash60SparkSql("concat('label:', cast(p_partkey as string))")} % ${Classes}")
          .as("true_class"),
        expr(argmaxExpr).cast("long").as("pred_class"),
        expr(greatestExpr).as("pred_margin"))
      .withColumn("bin", ntile(5).over(w).cast("long"))
      .groupBy("pred_class", "bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("true_class") === col("pred_class"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", col("n_correct").cast("double") / col("n"))
      .orderBy("pred_class", "bin")
  }

  private val mlCalibrationSql: String = {
    val margins = (0 until Classes).map(c => s"${marginExpr(c)} AS m$c").mkString(",\n  ")
    s"""WITH m AS (SELECT p_partkey, $margins FROM part),
       |scored AS (SELECT p_partkey,
       |    ${graft.functions.Text.hash60DuckSql("'label:' || p_partkey::VARCHAR")} % ${Classes} AS true_class,
       |    ($argmaxExpr)::BIGINT AS pred_class,
       |    $greatestExpr AS pred_margin
       |  FROM m),
       |binned AS (SELECT *,
       |    ntile(5) OVER (PARTITION BY pred_class
       |      ORDER BY pred_margin, p_partkey)::BIGINT AS bin
       |  FROM scored)
       |SELECT pred_class, bin, count(*)::BIGINT AS n,
       |  sum(CASE WHEN true_class = pred_class THEN 1 ELSE 0 END)::BIGINT AS n_correct,
       |  sum(CASE WHEN true_class = pred_class THEN 1 ELSE 0 END)::DOUBLE / count(*) AS accuracy
       |FROM binned GROUP BY 1, 2 ORDER BY pred_class, bin""".stripMargin
  }

  /** PARTIAL DEPENDENCE of the ensemble on the price feature — the
    * interpretability companion to [[graft.operators.MlPrep]]'s exact
    * linear SHAP, for the model family where SHAP has no closed form:
    * PD(v) = the corpus-average prediction with p_retailprice FORCED
    * to grid value v while every other feature keeps its row value
    * (Friedman 2001). The grid substitution is a PARAMETER of the
    * generated margin expression (`marginExpr(c, priceCol = "pd_v")`
    * names the exploded grid column at generation time — r8 advice
    * retired the post-hoc string replace); each row scores all [[PdGrid]] points
    * map-side — a 10× row expansion with NO shuffle beyond the final
    * 10-group aggregate. Published per grid point: the class-0 margin
    * mean (margins rounded to 2^30 fixed point BEFORE summing — the
    * exact associative-sum rule; one shared division after) and the
    * all-integer predicted-class-0 share. */
  private val PdGrid: Seq[Double] = (1000 to 1900 by 100).map(_.toDouble)

  def mlPartialDep(spark: SparkSession, sfDir: String): DataFrame = {
    val gridArr = PdGrid.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ", ", ")")
    val margins = (0 until Classes).map(c =>
      expr(marginExpr(c, priceCol = "pd_v")).as(s"m$c"))
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_size"), explode(expr(gridArr)).as("pd_v"))
      .select(col("pd_v") +: margins: _*)
      .withColumn("pred", expr(argmaxExpr).cast("long"))
      .withColumn("m0_fp", expr("cast(round(m0 * 1073741824) as bigint)"))
      .groupBy("pd_v")
      .agg(count(lit(1)).as("n"), sum(col("m0_fp")).as("s0"),
        sum(when(col("pred") === 0L, 1L).otherwise(0L)).as("n_pred0"))
      .withColumn("avg_margin0",
        expr("CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) / CAST(1073741824 AS DOUBLE)"))
      .withColumn("pred0_frac",
        expr("CAST(n_pred0 AS DOUBLE) / CAST(n AS DOUBLE)"))
      .select("pd_v", "n", "avg_margin0", "n_pred0", "pred0_frac")
      .orderBy("pd_v")
  }

  private def mlPartialDepSql: String = {
    val gridList = PdGrid.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
    val margins = (0 until Classes).map(c =>
      s"${marginExpr(c, priceCol = "pd_v")} AS m$c").mkString(",\n  ")
    s"""WITH g AS (SELECT p_partkey, p_size, unnest($gridList) AS pd_v FROM part),
       |m AS (SELECT pd_v, $margins FROM g),
       |scored AS (SELECT pd_v,
       |    ($argmaxExpr)::BIGINT AS pred,
       |    round(m0 * 1073741824)::BIGINT AS m0_fp
       |  FROM m)
       |SELECT pd_v, count(*)::BIGINT AS n,
       |  CAST(sum(m0_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    / CAST(1073741824 AS DOUBLE) AS avg_margin0,
       |  sum(CASE WHEN pred = 0 THEN 1 ELSE 0 END)::BIGINT AS n_pred0,
       |  CAST(sum(CASE WHEN pred = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS pred0_frac
       |FROM scored GROUP BY pd_v ORDER BY pd_v""".stripMargin
  }

  /** COHEN'S KAPPA — chance-corrected agreement between the ensemble's
    * predictions and the labels, the one-number answer to "is this
    * classifier better than its class-prior shadow" (and, swapping the
    * two columns for two annotators, the standard annotation-QA
    * statistic). With integer confusion counts, κ = (N·D − S) /
    * (N² − S) where D = Σ diagonal and S = Σ_c row_c·col_c — EVERY
    * term an exact int64 (S ≤ N² fits comfortably), ONE double
    * division at the end, so the statistic is bit-identical at any
    * parallelism. Shape: the scored scan feeds a ≤K² cell aggregate;
    * row/col marginals and their product-sum are K-row computations on
    * the aggregate — nothing data-sized moves after the confusion
    * groupBy. */
  def mlKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val margins = (0 until Classes).map(c => expr(marginExpr(c)).as(s"m$c"))
    val cells = Tables.part(spark, sfDir)
      .select(col("p_partkey") +: margins: _*)
      .select(
        expr(s"${graft.functions.Text.hash60SparkSql("concat('label:', cast(p_partkey as string))")} % ${Classes}")
          .as("true_class"),
        expr(argmaxExpr).cast("long").as("pred_class"))
      .groupBy("true_class", "pred_class")
      .agg(count(lit(1)).as("cn"))
    val rows = cells.groupBy("true_class").agg(sum(col("cn")).as("r"))
    val cols = cells.groupBy("pred_class").agg(sum(col("cn")).as("c"))
    val sExp = rows.join(cols, col("true_class") === col("pred_class"))
      .agg(coalesce(sum(col("r") * col("c")), lit(0L)).as("s_exp"))
    val diag = cells.filter(col("true_class") === col("pred_class"))
      .agg(coalesce(sum(col("cn")), lit(0L)).as("diag"))
    cells.agg(sum(col("cn")).as("n"))
      .crossJoin(broadcast(diag))
      .crossJoin(broadcast(sExp))
      .withColumn("po", col("diag").cast("double") / col("n").cast("double"))
      .withColumn("pe",
        col("s_exp").cast("double") / (col("n") * col("n")).cast("double"))
      .withColumn("kappa",
        (col("n") * col("diag") - col("s_exp")).cast("double")
          / (col("n") * col("n") - col("s_exp")).cast("double"))
      .select("n", "diag", "s_exp", "po", "pe", "kappa")
  }

  private val mlKappaSql: String = {
    val margins = (0 until Classes).map(c => s"${marginExpr(c)} AS m$c").mkString(",\n  ")
    s"""WITH m AS (SELECT p_partkey, $margins FROM part),
       |scored AS (SELECT
       |    ${graft.functions.Text.hash60DuckSql("'label:' || p_partkey::VARCHAR")} % ${Classes} AS true_class,
       |    ($argmaxExpr)::BIGINT AS pred_class
       |  FROM m),
       |cells AS (SELECT true_class, pred_class, count(*)::BIGINT AS cn
       |  FROM scored GROUP BY 1, 2),
       |r AS (SELECT true_class AS k, sum(cn)::BIGINT AS r FROM cells GROUP BY 1),
       |c AS (SELECT pred_class AS k, sum(cn)::BIGINT AS c FROM cells GROUP BY 1),
       |s AS (SELECT coalesce(sum(r.r * c.c), 0)::BIGINT AS s_exp
       |  FROM r JOIN c ON r.k = c.k),
       |d AS (SELECT coalesce(sum(cn), 0)::BIGINT AS diag
       |  FROM cells WHERE true_class = pred_class),
       |t AS (SELECT sum(cn)::BIGINT AS n FROM cells)
       |SELECT n, diag, s_exp,
       |  diag::DOUBLE / n::DOUBLE AS po,
       |  s_exp::DOUBLE / (n * n)::DOUBLE AS pe,
       |  (n * diag - s_exp)::DOUBLE / (n * n - s_exp)::DOUBLE AS kappa
       |FROM t, d, s""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("ml_score_gbt" -> (mlScoreGbt _),
      "ml_eval" -> (mlEval _),
      "ml_calibration" -> (mlCalibration _),
      "ml_kappa" -> (mlKappa _),
      "ml_partial_dep" -> (mlPartialDep _),
      "ml_train_gd" -> (mlTrainGd _)) ++
      xgbEntry.map { case (k, _) => k -> (mlScoreXgb _) }

  def oracles: Map[String, String] =
    Map("ml_score_gbt" -> mlScoreGbtSql,
      "ml_eval" -> mlEvalSql,
      "ml_calibration" -> mlCalibrationSql,
      "ml_kappa" -> mlKappaSql,
      "ml_partial_dep" -> mlPartialDepSql,
      "ml_train_gd" -> mlTrainGdSql) ++ xgbEntry
}

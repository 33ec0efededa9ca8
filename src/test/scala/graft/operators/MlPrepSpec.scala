package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants the DuckDB oracle can't express: split assignment
  * stability under physical layout changes, feature-hash bucket
  * totality, and the streaming pattern automaton's equivalence to the
  * regex it compiles (driven over adversarial synthetic sequences, not
  * just the fixture). */
class MlPrepSpec extends SparkSpec {

  test("ml_split assignment is invariant under repartitioning and stable across runs") {
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, sf)
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("b", expr(
        s"${graft.functions.Text.hash60SparkSql("concat('split:', cast(doc_id as string))")} % 10"))
      .select($"doc_id", $"b").as[(Long, Long)].collect().toMap
    val a = assign(base)
    val b = assign(base.repartition(17, $"lang"))
    val c = assign(base.repartition(3))
    assert(a === b, "split assignment changed under repartition-by-lang")
    assert(a === c, "split assignment changed under round-robin repartition")
    // 80/10/10 within loose tolerance on the smoke fixture (50 docs):
    // the md5 uniform should not collapse all mass into one split
    val sizes = a.values.groupBy(v => if (v < 8) "train" else if (v == 8) "val" else "test")
      .map { case (k, v) => k -> v.size }
    assert(sizes.getOrElse("train", 0) > sizes.getOrElse("test", 0),
      s"train split not dominant: $sizes")
  }

  test("ml_feature_hash buckets are total and within range") {
    val rows = MlPrep.mlFeatureHash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getLong(r.fieldIndex("bucket"))
      assert(b >= 0 && b < 64, s"bucket $b out of range")
      assert(r.getLong(r.fieldIndex("n_hits")) >= r.getLong(r.fieldIndex("n_distinct_tokens")))
    }
  }

  test("streaming pattern automaton equals the regex on adversarial sequences") {
    // the one-bit automaton in StreamingOps.opStreamPattern claims to
    // compute len(regexp findAll 'v[^p]*p') — verify on sequences that
    // stress every edge: leading p, trailing v, runs, interleavings
    val cases = Seq("", "p", "v", "vp", "pv", "vvp", "vpp", "vpvp", "ppvvppvv",
      "vcvcp", "pvcp", "vvvppp", "cecse", "vpvpvpv", "pppvvv", "vvpvv", "pvpvp")
    cases.foreach { s =>
      val regexCount = "v[^p]*p".r.findAllIn(s).length
      var armed = false; var n = 0L
      s.foreach { ch =>
        if (ch == 'v') armed = true
        else if (ch == 'p' && armed) { n += 1; armed = false }
      }
      assert(n === regexCount.toLong, s"automaton diverged from regex on '$s'")
    }
  }

  test("ml_ols: closed-form coefficients match a direct local least-squares fit") {
    import spark.implicits._
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val out = MlPrep.mlOls(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val xs = g.map(_._2); val ys = g.map(_._3); val n = g.length.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val varx = xs.map(x => (x - mx) * (x - mx)).sum
      val slope = cov / varx
      val intercept = my - slope * mx
      val got = out(flag)
      assert(math.abs(got.getAs[Double]("slope") - slope) <= 1e-6 * math.max(1.0, math.abs(slope)),
        s"$flag slope ${got.getAs[Double]("slope")} vs local $slope")
      assert(math.abs(got.getAs[Double]("intercept") - intercept) <= 1e-6 * math.abs(intercept),
        s"$flag intercept")
      val r2 = got.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$flag r2 out of range: $r2")
    }
  }

  test("ml_ols2: bivariate fit reduces residual variance vs univariate, r2 in range") {
    val uni = MlPrep.mlOls(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("r2")).toMap
    val bi = MlPrep.mlOls2(spark, sf).collect()
    assert(bi.length === uni.size)
    bi.foreach { r =>
      val flag = r.getString(0)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$flag r2 out of range: $r2")
      // adding a regressor can never reduce in-sample R^2 (allow fp slack)
      assert(r2 >= uni(flag) - 1e-12,
        s"$flag bivariate r2 $r2 below univariate ${uni(flag)}")
    }
  }

  test("ml_time_split: splits partition the events, no training row at/after the cut, cold set exact") {
    import org.apache.spark.sql.functions._
    val out = MlPrep.mlTimeSplit(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(out.keySet === Set("train", "test"))
    val ev = graft.sources.Tables.events(spark, sf)
    val total = ev.count()
    assert(out("train").getAs[Long]("n_events") + out("test").getAs[Long]("n_events") === total)
    assert(out("train").getAs[Long]("n_cold_users") === 0L)
    // recompute the cold-start population directly
    val cut = ev.agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"))
      .head().getLong(0)
    val trainU = ev.filter(unix_micros(col("ts")) < cut)
      .select("user_id").distinct()
    val cold = ev.filter(unix_micros(col("ts")) >= cut)
      .select("user_id").distinct()
      .join(trainU, Seq("user_id"), "left_anti").count()
    assert(out("test").getAs[Long]("n_cold_users") === cold)
    val cf = out("test").getAs[Double]("cold_frac")
    assert(cf >= 0.0 && cf <= 1.0)
  }

  test("ml_shap_linear: importances are non-negative and finite") {
    val out = MlPrep.mlShapLinear(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("phi_qty", "phi_disc").foreach { c =>
        val v = r.getAs[Double](c)
        assert(!v.isNaN && !v.isInfinite && v >= 0.0, s"$c = $v")
      }
    }
  }

  test("ml_stratified_kfold: every stratum spreads across folds by at most one row") {
    val out = MlPrep.mlStratifiedKfold(spark, sf).collect()
    assert(out.nonEmpty)
    // the round-robin construction guarantee, asserted directly
    assert(out.forall(_.getAs[Long]("spread") <= 1L))
    // each (fold, label) cell is non-empty only if the stratum has >= fold+1 rows;
    // stronger: folds partition each stratum exactly
    val byLabel = out.groupBy(_.getAs[Long]("label"))
    byLabel.foreach { case (label, rows) =>
      val ns = rows.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1L, s"label $label unbalanced: ${ns.mkString(",")}")
    }
  }
}

package graft.operators

import graft.SparkSpec

/** Invariants of the DiD estimator and the MRR retrieval metric that
  * the oracle hash can't state directly: internal consistency of the
  * published decomposition and metric range/ordering bounds. */
class CausalEvalSpec extends SparkSpec {

  test("ev_did: one row, positive cells, did equals its published decomposition") {
    val out = Events.evDid(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post").foreach { c =>
      assert(r.getAs[Long](c) > 0L, s"$c must be positive on the fixture")
    }
    val did = r.getAs[Double]("did")
    val recomputed = (r.getAs[Double]("m_t_post") - r.getAs[Double]("m_t_pre")) -
      (r.getAs[Double]("m_c_post") - r.getAs[Double]("m_c_pre"))
    assert(did === recomputed, s"did $did != decomposition $recomputed")
    Seq("m_t_pre", "m_t_post", "m_c_pre", "m_c_post").foreach { c =>
      val v = r.getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite && v >= 0.0, s"$c = $v")
    }
  }

  test("ml_mrr: metric within the n_hit-implied bounds, hits bounded by probes") {
    val out = Similarity.mlMrr(spark, sf).collect()
    assert(out.nonEmpty)
    var totalProbes = 0L
    out.foreach { r =>
      val n = r.getAs[Long]("n_probes")
      val h = r.getAs[Long]("n_hit")
      val mrr = r.getAs[Double]("mrr")
      totalProbes += n
      assert(h >= 0L && h <= n, s"n_hit $h outside [0, $n]")
      // every hit contributes rr in [1/20, 1]; misses contribute 0
      assert(mrr >= h.toDouble / (20.0 * n) - 1e-12, s"mrr $mrr below lower bound")
      assert(mrr <= h.toDouble / n + 1e-12, s"mrr $mrr above upper bound")
    }
    assert(totalProbes === 50L, s"probe batch must be exactly 50, got $totalProbes")
  }

  test("ml_kappa: kappa in [-1,1], consistent with po/pe, below raw accuracy") {
    val r = MlScore.mlKappa(spark, sf).head()
    val po = r.getAs[Double]("po")
    val pe = r.getAs[Double]("pe")
    val kappa = r.getAs[Double]("kappa")
    assert(po >= 0.0 && po <= 1.0)
    assert(pe > 0.0 && pe < 1.0, s"pe $pe degenerate")
    assert(kappa >= -1.0 && kappa <= 1.0, s"kappa $kappa out of range")
    // same statistic two ways: (po - pe) / (1 - pe) within fp tolerance
    assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-12)
    // chance correction can only shrink a better-than-chance agreement
    if (po > pe) assert(kappa < po + 1e-12)
  }

  test("ev_power_mde: MDE positive and shrinking in n, pooled rate consistent") {
    val out = Events.evPowerMde(spark, sf).collect()
      .map(r => r.getAs[String]("outcome") -> r).toMap
    assert(out.keySet === Set("err", "buy"))
    out.values.foreach { r =>
      val pbar = r.getAs[Double]("pbar")
      assert(pbar > 0.0 && pbar < 1.0, s"degenerate pooled rate $pbar")
      assert(r.getAs[Double]("mde_abs") > 0.0)
      assert(r.getAs[Double]("mde_rel") > 0.0)
      assert(r.getAs[Long]("conv") <= r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
      // closed form check: mde = 2.801585 * sqrt(2 p(1-p) / n_eff)
      val nA = r.getAs[Long]("n_a").toDouble
      val nB = r.getAs[Long]("n_b").toDouble
      val nEff = 2.0 * nA * nB / (nA + nB)
      val expected = (1.959964 + 0.841621) * math.sqrt(2.0 * pbar * (1.0 - pbar) / nEff)
      assert(math.abs(r.getAs[Double]("mde_abs") - expected) < 1e-12)
    }
  }

  test("ev_cuped: rho2 in [0,1), theta matches a local OLS slope, adjustment preserves the global mean") {
    import org.apache.spark.sql.functions._
    val r = Events.evCuped(spark, sf).head()
    val rho2 = r.getAs[Double]("rho2")
    assert(rho2 >= 0.0 && rho2 < 1.0, s"rho2 $rho2 out of [0,1)")
    // recompute theta locally from per-user (x, y)
    val ev = graft.sources.Tables.events(spark, sf)
    val cut = ev.agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"))
      .head().getLong(0)
    val xy = ev
      .withColumn("cents", when(col("event_type") === "purchase",
        expr("cast(round(value * 100) as bigint)")).otherwise(lit(0L)))
      .groupBy("user_id")
      .agg(sum(when(unix_micros(col("ts")) < cut, col("cents")).otherwise(0L)).as("x"),
        sum(when(unix_micros(col("ts")) >= cut, col("cents")).otherwise(0L)).as("y"))
      .collect().map(u => (u.getAs[Long]("x").toDouble, u.getAs[Long]("y").toDouble))
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val thetaLocal = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val theta = r.getAs[Double]("theta")
    assert(math.abs(theta - thetaLocal) < 1e-9 * math.max(1.0, math.abs(thetaLocal)),
      s"theta $theta vs local $thetaLocal")
    // CUPED is mean-preserving: the user-weighted mean of adjusted
    // variant means equals the raw pooled mean
    val nA = r.getAs[Long]("n_a").toDouble
    val nB = r.getAs[Long]("n_b").toDouble
    val pooledRaw = (r.getAs[Double]("mean_y_a") * nA + r.getAs[Double]("mean_y_b") * nB) / (nA + nB)
    val pooledAdj = (r.getAs[Double]("adj_a") * nA + r.getAs[Double]("adj_b") * nB) / (nA + nB)
    assert(math.abs(pooledRaw - pooledAdj) < 1e-9,
      s"adjustment moved the pooled mean: $pooledRaw -> $pooledAdj")
  }

  test("ml_partial_dep: every grid point scores the whole corpus, shares in range, PD varies") {
    val pd = MlScore.mlPartialDep(spark, sf).collect()
    assert(pd.length === 10, "one row per grid point")
    val total = graft.sources.Tables.part(spark, sf).count()
    pd.foreach { r =>
      assert(r.getAs[Long]("n") === total, "PD must average over the full corpus at each point")
      val f = r.getAs[Double]("pred0_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(!r.getAs[Double]("avg_margin0").isNaN)
    }
    // forcing the split feature across its span must move the ensemble
    val margins = pd.map(_.getAs[Double]("avg_margin0"))
    assert(margins.distinct.length > 1, "PD curve is flat — grid missed the split thresholds")
  }

  test("ev_srm: pooled counts cover all users, chi2 non-negative, flags ordered") {
    val out = Events.evSrm(spark, sf).collect()
    assert(out.nonEmpty)
    val all = out.find(_.getAs[String]("event_type") == "(all)").get
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(all.getAs[Long]("n_a") + all.getAs[Long]("n_b") === users,
      "pooled SRM row must count every distinct user exactly once")
    out.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      // the stricter flag implies the looser one
      if (r.getAs[Boolean]("srm_001")) assert(r.getAs[Boolean]("srm_05"))
    }
  }
}

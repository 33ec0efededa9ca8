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
}

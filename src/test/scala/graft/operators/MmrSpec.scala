package graft.operators

import graft.SparkSpec

/** Invariants of the greedy MMR selection that the oracle hash can't
  * state directly: selection validity (distinct, from the candidate
  * pool) and the greedy recurrence's first step. */
class MmrSpec extends SparkSpec {

  test("ann_mmr_select: 4 distinct picks, step 1 is the relevance argmax, scores finite") {
    val out = Similarity.annMmrSelect(spark, sf).collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("step")).toSeq === Seq(1L, 2L, 3L, 4L))
    val ids = out.map(_.getAs[Long]("cand_id"))
    assert(ids.distinct.length === 4, s"duplicate selections: ${ids.mkString(",")}")
    out.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(!s.isNaN && !s.isInfinite)
    }
    // step 1 must be the plain cosine argmax (MMR with empty selected set)
    val exact = Similarity.annTopkExact(spark, sf)
      .filter("probe_id = 0 AND rank = 1").collect()
    assert(out.head.getAs[Long]("cand_id") === exact.head.getAs[Long]("neighbor_id"))
    // MMR scores after step 1 are penalized: strictly below the step-1 score
    val s1 = out.head.getAs[Double]("score")
    out.tail.foreach(r => assert(r.getAs[Double]("score") <= s1))
  }

  test("emb_dim_variance: variances non-negative, shares sum to one, trace matches the diagonal") {
    val out = Similarity.embDimVariance(spark, sf).collect()
    assert(out.length === 64, "one row per embedding dimension")
    out.foreach { r =>
      assert(r.getAs[Double]("variance") >= 0.0,
        s"dim ${r.getAs[Long]("pos")} variance negative")
      assert(r.getAs[Double]("share") >= 0.0)
    }
    val shareSum = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum, not 1")
    // the first 16 variances must equal emb_covariance's diagonal (same
    // fixed-point construction, independent plans)
    val diag = Similarity.embCovariance(spark, sf)
      .filter("i = j").collect()
      .map(r => r.getAs[Long]("i") -> r.getAs[Double]("cov")).toMap
    out.filter(_.getAs[Long]("pos") < 16).foreach { r =>
      val pos = r.getAs[Long]("pos")
      assert(math.abs(r.getAs[Double]("variance") - diag(pos)) < 1e-12,
        s"dim $pos variance disagrees with the covariance diagonal")
    }
  }
}

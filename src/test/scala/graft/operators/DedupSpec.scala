package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-operator dedup invariants (SURVEY §5): the probabilistic paths
  * must agree with the exact path where their guarantees say they must. */
class DedupSpec extends SparkSpec {

  test("dd_exact is a fixpoint: one representative per distinct content") {
    val d = Dedup.ddExact(spark, sf).cache()
    try {
      val n = d.count()
      assert(n > 0)
      assert(d.select("content_key").distinct().count() == n)
      assert(d.select("doc_id_keep").distinct().count() == n,
        "same representative chosen for two different content groups")
      // idempotence: dedup of the deduped representatives changes nothing
      assert(d.groupBy("content_key").count().filter(col("count") > 1).count() == 0)
    } finally d.unpersist()
  }

  test("minhash-LSH near-dup pairs are a subset of the exact-Jaccard pairs") {
    // LSH candidates can MISS pairs (probabilistic recall) but every
    // emitted pair is verified with the exact Jaccard, so emitted ⊆ exact.
    val lsh = Dedup.ddMinhashLsh(spark, sf).select("doc_a", "doc_b")
    val exact = Dedup.ddNgramJaccard(spark, sf).select("doc_a", "doc_b")
    assert(lsh.exceptAll(exact).count() == 0, "LSH emitted a pair the exact join rejects")
  }

  test("connected components: 30-node path graph converges with bounded plan depth; exhausting the cap fails loud") {
    import spark.implicits._
    // a single 30-node chain — worst-case diameter for label propagation,
    // needing ~29 propagation rounds (many checkpoint cadences deep, so
    // lineage truncation is actually exercised; without it the plan
    // doubles per iteration and the driver OOMs around iteration 25)
    val pairs = (1 until 30)
      .map(i => (f"d$i%02d", f"d${i + 1}%02d")).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).cache()
    try {
      assert(labels.count() == 30)
      assert(labels.select("rep").distinct().count() == 1, "a path is ONE component")
      assert(labels.agg(min("rep")).head.getString(0) == "d01",
        "representative must be the minimum label")
      // bounded plan depth: without localCheckpoint the final plan holds
      // ~29 nested join/agg generations (hundreds of nodes); with
      // truncation every 10 iterations it is at most one cadence's worth
      val planNodes = labels.queryExecution.logical.collect { case p => p }.size
      assert(planNodes < 60,
        s"final plan holds $planNodes nodes — lineage not truncated")
    } finally labels.unpersist()
    // partial components must never be returned silently
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 5).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("simhash banding finds every pair within Hamming<=10 (vs brute force)") {
    val banded = Dedup.ddSimhash(spark, sf).select("doc_a", "doc_b")
    // brute-force all-pairs over the signatures, same threshold
    val ex = graft.functions.Text.shingled(spark, sf)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), expr(graft.functions.Text.hash60SparkSql("s")).as("h"))
    val sigs = ex.groupBy("doc_id").agg(graft.plans.SimhashAgg.simhash(col("h")).as("simhash"))
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.simhash ^ b.simhash)") <= 10)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    assert(banded.exceptAll(brute).count() == 0, "banding emitted a non-near pair")
    assert(brute.exceptAll(banded).count() == 0,
      "banding MISSED a pair within Hamming<=10 — the block-pair guarantee is broken")
  }
}

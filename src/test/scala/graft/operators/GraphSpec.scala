package graft.operators

import graft.SparkSpec

/** Invariants of the fixed-point integer PageRank the value-equality
  * oracle doesn't state. */
class GraphSpec extends SparkSpec {

  test("gr_pagerank: scores stay within the damping envelope and are deterministic") {
    val out = Graph.grPagerank(spark, sf).collect()
    assert(out.length == 25)
    val scores = out.map(_.getAs[Long]("score"))
    // every vertex keeps at least the teleport mass 0.15·S, and no
    // vertex can exceed total mass: integer-floor arithmetic only
    // loses mass, never creates it
    assert(scores.forall(_ >= 150000L), "teleport floor violated")
    assert(scores.forall(_ <= 1000000L * 500), "mass created from nothing")
    // ordered output: descending score, ascending key on ties
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    // integer arithmetic must be run-to-run identical (no doubles in
    // the pipeline anywhere — rerun and compare bit for bit)
    val again = Graph.grPagerank(spark, sf).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("gr_assoc_rules: lift/confidence bounds and support floor hold") {
    val out = Graph.grAssocRules(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 25)
    out.foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(nab >= 3, "support floor")
      assert(nab <= na && nab <= nb, "pair count exceeds a member count")
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }
}

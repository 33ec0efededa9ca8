package graft.operators

import graft.SparkSpec

/** E3/E4 invariants — the nondeterministic ops the DuckDB oracle cannot
  * check (SURVEY §5): uuid shape + uniqueness, seeded-rand bounds +
  * within-session determinism. */
class SynthSpec extends SparkSpec {

  test("op_uuid_gen: canonical uuid4 shape, unique per row") {
    val rows = Relational.opUuidGen(spark, sf).collect()
    assert(rows.nonEmpty)
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    rows.foreach { r =>
      val u = r.getString(1)
      assert(uuidRe.matches(u), s"not a v4 uuid: $u")
    }
    assert(rows.map(_.getString(1)).distinct.length == rows.length, "uuid collision")
  }

  test("op_rand_perturb: noised price in [0, price); same seed+layout => same values") {
    val a = Relational.opRandPerturb(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val price = r.getDouble(2); val noised = r.getDouble(3)
      assert(noised >= 0.0 && noised < price || price == 0.0,
        s"noised $noised out of [0, $price)")
    }
    val b = Relational.opRandPerturb(spark, sf).collect()
    assert(a.map(_.getDouble(3)).toSeq == b.map(_.getDouble(3)).toSeq,
      "seeded rand not deterministic across identical runs")
  }
}

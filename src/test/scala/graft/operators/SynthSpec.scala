package graft.operators

import graft.SparkSpec

/** E3/E4 per-value invariants — the properties of the nondeterministic
  * ops the invariant-aggregate oracles (op_uuid_gen / op_rand_perturb,
  * r12) cannot express per value: exact uuid shape of every row,
  * seeded-rand within-session determinism. */
class SynthSpec extends SparkSpec {

  test("uuid rows: canonical uuid4 shape, unique per row") {
    val rows = Relational.uuidGenRows(spark, sf).collect()
    assert(rows.nonEmpty)
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    rows.foreach { r =>
      val u = r.getString(1)
      assert(uuidRe.matches(u), s"not a v4 uuid: $u")
    }
    assert(rows.map(_.getString(1)).distinct.length == rows.length, "uuid collision")
  }

  test("rand rows: noised price in [0, price); same seed+layout => same values") {
    val a = Relational.randPerturbRows(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val price = r.getDouble(2); val noised = r.getDouble(3)
      assert(noised >= 0.0 && noised < price || price == 0.0,
        s"noised $noised out of [0, $price)")
    }
    val b = Relational.randPerturbRows(spark, sf).collect()
    assert(a.map(_.getDouble(3)).toSeq == b.map(_.getDouble(3)).toSeq,
      "seeded rand not deterministic across identical runs")
  }

  test("op_uuid_gen / op_rand_perturb: invariant aggregates all green") {
    val u = Relational.opUuidGen(spark, sf).collect().head
    val n = u.getLong(u.fieldIndex("n_rows"))
    assert(n > 0)
    Seq("n_distinct", "n_len36", "n_v4_format", "n_keys").foreach { c =>
      assert(u.getLong(u.fieldIndex(c)) == n, s"$c != n_rows")
    }
    val p = Relational.opRandPerturb(spark, sf).collect().head
    assert(p.getLong(p.fieldIndex("n_rows")) ==
      p.getLong(p.fieldIndex("n_in_bounds")) + p.getLong(p.fieldIndex("n_null_price")))
    assert(p.getLong(p.fieldIndex("n_null_noised")) ==
      p.getLong(p.fieldIndex("n_null_price")))
    assert(p.getLong(p.fieldIndex("noise_centered")) == 1L)
  }
}

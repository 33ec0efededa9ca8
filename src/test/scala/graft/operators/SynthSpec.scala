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

  test("dbgen-fidelity generators: sparse custkeys, Zipf-like part skew, correlated dates") {
    import org.apache.spark.sql.functions._
    val d = graft.streaming.Synthesize.dbgenDims(spark, sf)
    val o = graft.streaming.Synthesize.dbgenOrders(spark, d)
    val l = graft.streaming.Synthesize.dbgenLineitem(o, d)
    // sparse custkeys: never a multiple of 3, always inside [1, customers]
    assert(o.filter(col("o_custkey") % 3 === 0).count() == 0,
      "dbgen custkeys must skip multiples of 3")
    val (loC, hiC) = {
      val r = o.agg(min("o_custkey"), max("o_custkey")).first()
      (r.getLong(0), r.getLong(1))
    }
    assert(loC >= 1 && hiC <= d.customers, s"custkey range [$loC,$hiC] outside fixture dim")
    // Zipf-like part popularity: the hot decile of parts carries far
    // more than its uniform share (u^2 inverse-CDF => bottom-rank-10%
    // of keys holds ~sqrt(0.1) ~ 31.6% of rows)
    val n = l.count()
    val hotDecile = l.filter(col("l_partkey") <= math.max(1L, d.parts / 10)).count()
    assert(hotDecile.toDouble / n > 0.25,
      s"hot decile share ${hotDecile.toDouble / n} — no skew generated")
    assert(l.agg(max("l_partkey")).first().getLong(0) <= d.parts)
    // correlated dates: EVERY ship date is order date + [1, 121] days
    val bad = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .withColumn("delta_days", datediff(col("l_shipdate"), col("o_orderdate")))
      .filter(col("delta_days") < 1 || col("delta_days") > 121)
      .count()
    assert(bad == 0, s"$bad lineitems break the dbgen ship-date correlation")
    // lines per order within dbgen's 1..7
    val lpo = l.groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      .agg(min("c"), max("c")).first()
    assert(lpo.getLong(0) >= 1 && lpo.getLong(1) <= 7)
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

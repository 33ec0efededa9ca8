package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** E2 affine timestamp remap invariants (SURVEY §5: the algebraic ops get
  * property tests). The oracle already proves bit-exactness vs DuckDB;
  * these prove the *semantics*: endpoint mapping and order preservation. */
class AffineTimeSpec extends SparkSpec {

  test("affine remap preserves order and lands in the target window for in-range sources") {
    val rows = Relational.opAffineTime(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"), "o_orderkey")
      .select(col("o_orderdate").cast("long").as("src"),
        col("o_order_time").cast("long").as("dst"))
      .orderBy("src")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // order preservation (affine with positive slope is monotone)
    rows.sliding(2).foreach {
      case Array((s1, d1), (s2, d2)) =>
        assert(s1 <= s2)
        assert(d1 <= d2, s"order violated: src $s1<=$s2 but dst $d1>$d2")
      case _ =>
    }
    // fixture dates lie inside the declared source window, so every
    // output must lie inside the target window [2024-01-01, +15min]
    val tgtLo = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val tgtHi = java.time.Instant.parse("2024-01-01T00:15:00Z").getEpochSecond
    rows.foreach { case (_, d) => assert(d >= tgtLo && d <= tgtHi) }
  }

  test("affine formula: endpoints map exactly, interior by linear interpolation (scalacheck)") {
    // pure-Scala mirror of the µs arithmetic both engines run
    val srcLo = java.time.Instant.parse("1995-01-01T00:00:00Z").toEpochMilli * 1000L
    val srcHi = java.time.Instant.parse("2001-08-01T00:00:00Z").toEpochMilli * 1000L
    val tgtLo = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val tgtHi = java.time.Instant.parse("2024-01-01T00:15:00Z").toEpochMilli * 1000L
    val ratio = (tgtHi - tgtLo).toDouble / (srcHi - srcLo).toDouble
    def remap(us: Long): Long = tgtLo + math.floor((us - srcLo).toDouble * ratio).toLong
    assert(remap(srcLo) == tgtLo)
    // floor(x * (y/x)) can land one ulp under y — both engines round the
    // same way (that's what the oracle checks); the semantic bound is ±1µs
    assert(math.abs(remap(srcHi) - tgtHi) <= 1)
    val gen = Gen.choose(srcLo, srcHi)
    val prop = Prop.forAll(gen, gen) { (a: Long, b: Long) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      remap(lo) <= remap(hi) && remap(lo) >= tgtLo && remap(hi) <= tgtHi
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}

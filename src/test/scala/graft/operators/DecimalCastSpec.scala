package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression guard for the op_decimal_agg driver-gate failure (rounds
  * 7–8): `double::DECIMAL(18,2)` rounds by DIFFERENT rules per engine —
  * DuckDB rounds the decimal rendering half-up (1.005 → 1.01), Spark
  * Casts the exact binary expansion (1.00499999999999989… HALF_UP →
  * 1.00). The divergence is data-dependent (only sub-cent doubles that
  * straddle a half-cent boundary disagree), so a fixed fixture can pass
  * locally and fail at the driver. The engine-identical path is
  * `round(x*100)::BIGINT` cents, then an exact integer→decimal rescale.
  *
  * The DuckDB columns below were pinned by running the same expressions
  * in DuckDB 1.x (`SELECT v::DOUBLE::DECIMAL(18,2),
  * round(v::DOUBLE*100)::BIGINT`) — they are the oracle's actual
  * outputs, not re-derived from Spark. */
class DecimalCastSpec extends SparkSpec {

  // (value, DuckDB double::DECIMAL(18,2) in cents, DuckDB round(v*100)::BIGINT,
  //  direct cast diverges between engines?)
  // Mechanism: Spark Casts via the SHORTEST DECIMAL RENDERING
  // (BigDecimal(Double.toString(v)).setScale(2, HALF_UP) — 78123.305
  // renders as "78123.305" → .31), DuckDB via the IEEE PRODUCT v*100
  // (78123.305*100 = 7812330.499999999 → .30). round(v*100) at scale 0
  // is engine-identical because every half-integer below 2^51 is
  // exactly representable, so rendering- and binary-rounding agree.
  private val pinned: Seq[(Double, Long, Long, Boolean)] = Seq(
    (78123.305, 7812330L, 7812330L, true),
    (77563.165, 7756316L, 7756316L, true),
    (65730.385, 6573038L, 6573038L, true),
    (76821.665, 7682166L, 7682166L, true),
    (75456.025, 7545602L, 7545602L, true),
    (9711.925, 971193L, 971192L, false), // direct casts agree but differ from the cents path
    (38466.325, 3846633L, 3846632L, false),
    (75058.635, 7505864L, 7505863L, false),
    (1.005, 101L, 100L, false), // the value the r8 verdict flagged: engines agree here
    (0.615, 62L, 62L, false),
    (2.675, 268L, 268L, false),
    (0.125, 13L, 13L, false) // exactly-representable half: both round up
  )

  test("round(x*100) cents match DuckDB on every pinned boundary value") {
    import spark.implicits._
    val df = pinned.map(_._1).toDF("v")
      .withColumn("cents", expr("cast(round(v * 100) as bigint)"))
    val got = df.select("v", "cents").collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    pinned.foreach { case (v, _, duckCents, _) =>
      assert(got(v) == duckCents, s"Spark round($v*100)=${got(v)} != DuckDB $duckCents")
    }
  }

  test("the direct double->decimal cast DOES diverge (why the discipline exists)") {
    import spark.implicits._
    val df = pinned.map(_._1).toDF("v")
      .withColumn("dec", col("v").cast("decimal(18,2)"))
    val sparkCents = df.collect()
      .map(r => r.getDouble(0) -> r.getDecimal(1).movePointRight(2).longValueExact())
      .toMap
    pinned.foreach { case (v, duckDirect, _, diverges) =>
      if (diverges)
        assert(sparkCents(v) != duckDirect,
          s"pinned divergence at $v is stale: Spark direct cast now matches DuckDB ($duckDirect)")
      else
        assert(sparkCents(v) == duckDirect,
          s"Spark direct cast of $v = ${sparkCents(v)} != DuckDB $duckDirect (unexpected new divergence)")
    }
  }

  test("integer->decimal rescale is exact and pinned at DECIMAL(18,2)") {
    import spark.implicits._
    val df = pinned.map(_._1).toDF("v")
      .withColumn("price_dec",
        (expr("cast(round(v * 100) as bigint)").cast("decimal(16,0)")
          * lit(new java.math.BigDecimal("0.01")).cast("decimal(3,2)"))
          .cast("decimal(18,2)"))
    val f = df.schema("price_dec").dataType
    assert(f.sql == "DECIMAL(18,2)", s"rescale must pin DECIMAL(18,2), got ${f.sql}")
    df.collect().foreach { r =>
      val v = r.getDouble(0)
      val duckCents = pinned.find(_._1 == v).get._3
      val gotCents = r.getDecimal(1).movePointRight(2).longValueExact()
      assert(gotCents == duckCents, s"rescale($v) cents=$gotCents != $duckCents")
    }
    assert(pinned.exists(_._4), "pinned table must keep at least one divergent witness")
  }

  test("opDecimalAgg plan contains no double->decimal Cast") {
    val df = Relational.opDecimalAgg(spark, sf)
    // The analyzed plan must derive price_dec from bigint cents; a
    // cast(double as decimal) anywhere re-opens the engine divergence.
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.matches("(?s).*cast\\(o_totalprice.* as decimal.*"),
      "found a direct double->decimal cast of o_totalprice in the plan")
    assert(df.count() > 0)
  }
}

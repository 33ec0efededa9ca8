package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.prop.TableDrivenPropertyChecks

/** [[VectorExprs]] kernels must be BIT-IDENTICAL to the HOF trees they
  * replaced — `aggregate(zip_with(a, b, λ), seed, (acc, v) -> acc + v)`
  * — including the null semantics the fold inherits from zip_with's
  * null padding (length mismatch → null, null element → null). Each
  * case is checked through spark.sql so both the codegen path (row
  * batches) and the analyzer/registry wiring are exercised; a
  * seeded-random sweep guards the IEEE operation order (any pairwise /
  * fused reassociation would diverge on these values). */
class VectorExprsSpec extends SparkSpec with TableDrivenPropertyChecks {

  private def dArr(xs: Seq[java.lang.Double]): Seq[java.lang.Double] = xs
  private def rows2(a: Seq[java.lang.Double], b: Seq[java.lang.Double]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(a, b)), schema)
  }

  private def bothWays(a: Seq[java.lang.Double], b: Seq[java.lang.Double]): Unit = {
    rows2(a, b).createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS nd,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v) AS hd,
        |  vec_l2sq(a, b) AS nl,
        |  aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, v) -> acc + v) AS hl
        |FROM v""".stripMargin).collect()(0)
    assert(java.util.Objects.equals(r.get(0), r.get(1)), s"dot: ${r.get(0)} != ${r.get(1)}")
    assert(java.util.Objects.equals(r.get(2), r.get(3)), s"l2sq: ${r.get(2)} != ${r.get(3)}")
  }

  test("vec_dot / vec_l2sq match the HOF fold bit-for-bit on a seeded sweep") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(97)
      val a = dArr(Seq.fill(n)(java.lang.Double.valueOf(rnd.nextDouble() * 2e3 - 1e3)))
      val b = dArr(Seq.fill(n)(java.lang.Double.valueOf(rnd.nextDouble() * 2e-3 - 1e-3)))
      bothWays(a, b)
    }
  }

  test("null semantics mirror zip_with padding: mismatch/empty/null element") {
    bothWays(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)) // length mismatch → null
    bothWays(Nil, Nil)                          // empty → 0.0
    bothWays(Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)) // null element → null
    // null array → null (nullSafeEval path)
    rows2(null, Seq(dArr(Seq(1.0)): _*)).createOrReplaceTempView("v")
    val r = spark.sql("SELECT vec_dot(a, b), vec_l2sq(a, b) FROM v").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("vec_l2sq_long matches the bigint HOF fold; vec_l2sq widens longs like cast") {
    val schema = StructType(Seq(
      StructField("p", ArrayType(LongType, containsNull = false)),
      StructField("c", ArrayType(DoubleType, containsNull = false))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(3L, -7L, 1048576L, 0L), Seq(2.5, -7.25, 1048570.0, 9.75))),
      schema).createOrReplaceTempView("w")
    val r = spark.sql(
      """SELECT vec_l2sq_long(p, cast(array(1, 2, 3, 4) as array<bigint>)) AS nl,
        |  aggregate(zip_with(p, cast(array(1, 2, 3, 4) as array<bigint>),
        |    (x, y) -> (x - y) * (x - y)), cast(0 as bigint), (acc, v) -> acc + v) AS hl,
        |  vec_l2sq(p, c) AS nm,
        |  aggregate(zip_with(p, c, (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
        |    cast(0 as double), (acc, v) -> acc + v) AS hm
        |FROM w""".stripMargin).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getDouble(2) == r.getDouble(3))
  }

  test("kernels reject wrong element types at analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.contains("vec_dot") || e.getMessage.toLowerCase.contains("type"))
  }
}

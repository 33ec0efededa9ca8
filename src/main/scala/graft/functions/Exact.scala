package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine bit-exact numeric helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running the oracle SQL (Verify.scala). Floating-point SUMs are
  * order-dependent, and Spark's shuffle order differs from DuckDB's scan
  * order, so `sum(double)` can differ in the last bits — enough to flip a
  * rounding boundary and fail a hash compare.
  *
  * Fix: TPC-H money/quantity columns are exact decimals (≤ 2 fractional
  * digits; derived products ≤ 6). Scale each row to an integer, sum as
  * BIGINT (associative, exact), and divide once at the end. Both engines
  * then perform the *same single* floating-point division on the *same*
  * integer, giving bit-identical doubles at any parallelism — this also
  * holds on a 1000-executor cluster, where partial-aggregation order is
  * fully nondeterministic.
  *
  * Overflow headroom: int64 holds ~9.2e18; a 10^6-scaled charge sum stays
  * exact up to ~9.2e12 in money units (≈ sf10k totals), far beyond the
  * 100 TB target per-group sums. The oracle mirrors the same shape:
  * `sum(round(expr * 10^d)::BIGINT)::BIGINT / 10^d.0`.
  */
object Exact {

  /** Exact sum of a decimal-valued column with `d` true fractional digits.
    * Result is DoubleType, bit-identical across engines. */
  def exactSum(c: Column, d: Int): Column = {
    val scale = math.pow(10, d)
    sum(round(c * lit(scale)).cast("long")) / lit(scale)
  }

  /** Exact average: exact sum divided by count, with a fixed association
    * order `(sum / scale) / n` that the oracle must mirror. */
  def exactAvg(c: Column, d: Int): Column = {
    val scale = math.pow(10, d)
    (sum(round(c * lit(scale)).cast("long")) / lit(scale)) / count(lit(1))
  }

  /** Oracle-side SQL for [[exactSum]]. */
  def sqlSum(expr: String, d: Int): String = {
    val scale = "1" + "0" * d
    s"sum(round(($expr) * $scale)::BIGINT)::BIGINT / $scale.0"
  }

  /** Oracle-side SQL for [[exactAvg]]. */
  def sqlAvg(expr: String, d: Int): String = {
    val scale = "1" + "0" * d
    s"(sum(round(($expr) * $scale)::BIGINT)::BIGINT / $scale.0) / count(*)"
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The TYPED Dataset tier (builder preference (b): a custom typed
  * `Aggregator`/`TypedColumn` where a scalar expression can't express
  * the semantics but a full physical operator is overkill): a
  * case-class `Dataset[Line]` aggregated per key by a composable
  * `Aggregator` whose BUFFER is exact int64 cents — the same
  * cross-engine exactness contract as [[graft.functions.Exact]], but
  * carried through the typed API (Encoders end-to-end, compile-time
  * row shape, merge-order-free reduce/merge).
  *
  * Under the hood Catalyst plans this as a regular two-phase
  * (partial/final) object hash aggregate over the SAME shuffle as the
  * untyped groupBy — the typed surface costs schema encode/decode at
  * the boundary, not a different distribution strategy, which is why
  * it scales identically. */
object TypedOps {

  /** Typed input row (schema-checked at compile time). */
  final case class Line(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  /** Exact-accumulation buffer: counts + int64 cents. reduce/merge are
    * integer adds — associative and commutative, so ANY partial
    * aggregation order (1000 executors included) yields the same
    * buffer, and the single double division happens once in finish. */
  final case class Acc(n: Long, qtyC: Long, revC: Long)

  final case class Stats(n_items: Long, sum_qty: Double, avg_price: Double)

  /** The custom typed aggregate: per-group (count, exact quantity sum,
    * exact average price) — Aggregator[IN, BUF, OUT] with explicit
    * Encoders, usable as a `TypedColumn` on any Dataset[Line]. */
  object LineStats extends Aggregator[Line, Acc, Stats] {
    override def zero: Acc = Acc(0L, 0L, 0L)
    override def reduce(b: Acc, a: Line): Acc = Acc(
      b.n + 1,
      b.qtyC + math.round(a.l_quantity * 100),
      b.revC + math.round(a.l_extendedprice * 100))
    override def merge(x: Acc, y: Acc): Acc = Acc(x.n + y.n, x.qtyC + y.qtyC, x.revC + y.revC)
    override def finish(b: Acc): Stats =
      Stats(b.n, b.qtyC / 100.0, (b.revC / 100.0) / b.n)
    override def bufferEncoder: Encoder[Acc] = Encoders.product[Acc]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  def opTypedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the typed boundary DECLARES its non-null contract: Line's
    // primitive Double fields cannot hold SQL NULL (the encoder throws
    // NOT_NULL_ASSERT_VIOLATION — r10 null-jitter gate), so rows with
    // missing measures are filtered explicitly here and in the oracle,
    // the same WHERE a typed pipeline stage publishes as its input
    // precondition
    val ds = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[Line]
    ds.groupByKey(_.l_returnflag)
      .agg(LineStats.toColumn.name("s"))
      .toDF("l_returnflag", "s")
      .select(col("l_returnflag"), col("s.n_items").as("n_items"),
        col("s.sum_qty").as("sum_qty"), col("s.avg_price").as("avg_price"))
      .orderBy("l_returnflag")
  }

  private val opTypedAggSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  sum(round(l_quantity * 100)::BIGINT)::BIGINT / 100.0 AS sum_qty,
      |  (sum(round(l_extendedprice * 100)::BIGINT)::BIGINT / 100.0) / count(*) AS avg_price
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_typed_agg" -> (opTypedAgg _))

  val oracles: Map[String, String] = Map(
    "op_typed_agg" -> opTypedAggSql)
}

package graft

import org.apache.spark.sql.types._

/** Explicit schemas for every table the engine touches.
  *
  * The reference infers schemas at every stage (pandas JSON inference,
  * reference `pipeline/preprocess.py:38`; Delta schema accretion,
  * `pipeline/preprocess.py:41-44`). We declare them instead: explicit
  * StructTypes avoid full-file inference scans (critical at 100 TB — JSON
  * inference reads the data twice) and give stable, oracle-comparable
  * column types.
  *
  * Two families (see FIXTURES.md):
  *  - fixture schemas (classic TPC-H names, int keys) — what
  *    /root/testdata/sf* /<table>.parquet contains;
  *  - the reference's staged schema (uuid string keys, `*date → *_time`,
  *    reference `pipeline/data.py:74-108`) — produced by [[graft.streaming.Synthesize]]
  *    and consumed by the ingest pipeline.
  */
object Schemas {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Events with `ts` as Spark's native µs TimestampType — the shape every
    * operator consumes. Fixture generations have shipped `ts` as BOTH
    * parquet TIMESTAMP(MICROS) and TIMESTAMP(NANOS); [[graft.sources.Tables.events]]
    * probes the parquet footer's logical type (metadata-only) and picks the
    * matching read path, refusing loudly on anything else — the reference
    * gets unit-agnosticism for free from pyarrow (reference
    * pipeline/preprocess.py:38), so we must NOT hard-code one unit. */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Legacy-unit twin of [[events]]: a TIMESTAMP(NANOS) (or raw INT64
    * nanos) `ts` cannot be read as Spark's µs TimestampType directly; it is
    * read as raw INT64 (spark.sql.legacy.parquet.nanosAsLong) and
    * floor-divided to µs in [[graft.sources.Tables.events]] — the same
    * truncation DuckDB applies casting ns→µs, keeping oracle values
    * identical. Selected by the footer probe, never assumed. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Reference staged-table schemas (post data.py transforms): string uuid
    * orderkeys, `*date` renamed `*_time` (reference pipeline/data.py:74-108).
    * Used by the JSON-lines staging source (SURVEY §2.1 S4). */
  val stagedOrders: StructType = StructType(Seq(
    StructField("o_orderkey", StringType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_order_time", TimestampType),
    StructField("o_orderpriority", StringType)))

  val stagedLineitem: StructType = StructType(Seq(
    StructField("l_orderkey", StringType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_ship_time", TimestampType)))

  val byName: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)
}

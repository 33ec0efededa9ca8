package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Schemas

/** Fixture-table loaders (SURVEY §2.1 S3/S5/S6).
  *
  * Reads are plain parquet scans: Catalyst pushes filters and prunes
  * columns into the scan automatically (`PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`), which is the 100 TB-scale behavior we want —
  * a query that touches 2 columns reads 2 column chunks, and partition /
  * row-group pruning falls out of parquet footer stats. The reference got
  * the same properties from dask-expr + Delta file stats
  * (reference pipeline/reduce.py:21,43-54).
  */
object Tables {

  /** Path of a fixture table inside a scale-factor directory. */
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Load one fixture table. Schema is asserted (not inferred) so a
    * drifting fixture fails loudly instead of silently changing types. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.schema(Schemas.byName(name)).parquet(path(sfDir, name))

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS): read as int64 nanos and
    * floor-truncate to µs TimestampType (matches DuckDB's ns→µs cast). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Harness sessions (Verify/Bench/tests) set this at build time; the
    // runtime set here covers caller-owned sessions. It only changes how
    // TIMESTAMP(NANOS) parquet columns read — no fixture has others.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // integer `div`, not `/`: ns epoch values (~1.7e18) exceed double's
    // 2^53 integer range, so float division would corrupt low bits.
    // `div` truncates toward zero, which equals DuckDB's ns→µs cast for
    // the post-1970 fixture epochs; pre-epoch (negative) values would
    // need floor-division in both engines.
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  /** Streaming twin of [[events]]: the same fixture read through the
    * Structured Streaming file source (schema-asserted parquet scan +
    * the identical ns→µs conversion), for the T6 streaming window ops in
    * [[graft.streaming.StreamingOps]]. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // The fixture is a single parquet FILE; FileStreamSource derives its
    // basePath from the input path and requires a directory — a literal
    // file path fails ("Option 'basePath' must be a directory"). A glob
    // that matches only this file makes the source treat the parent dir
    // as base, which is also the shape a real deployment uses
    // (dir/*.parquet over an arriving-file directory).
    spark.readStream.schema(Schemas.eventsRaw)
      .parquet(s"$sfDir/events.parqu[e]t")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming twin of [[documents]] (same single-file glob trick as
    * [[eventsStream]]) for the stateful streaming dedup op. */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream.schema(Schemas.documents).parquet(s"$sfDir/documents.parqu[e]t")

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

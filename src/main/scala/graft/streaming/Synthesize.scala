package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Deterministic staged-data generator — the Spark re-expression of the
  * reference's generation flow (reference pipeline/data.py:37-121):
  * per cycle it derives a "staged" batch from the fixture tables and
  * appends it to a JSON-lines staging directory as timestamped files
  * (K1), applying the reference's transforms:
  *
  *  - J3 uuid keymap: `o_orderkey` → a 32-hex synthetic key, propagated
  *    into `l_orderkey` via an equi-join (reference pipeline/data.py:74-93).
  *    The reference uses `uuid4()`; we use md5("order:"||key) — the same
  *    shape, but content-addressed so DuckDB can recompute every key and
  *    the whole pipeline stays hash-verifiable (SURVEY §7 risk list).
  *    No broadcast hint on the keymap join — it is fact-proportional;
  *    AQE broadcasts when small.
  *  - E2 affine time remap: `*date` → `*_time` rescaled into a fixed
  *    target window (reference pipeline/data.py:24-26,96-108; fixed
  *    window instead of `now` for determinism).
  *  - E3 price perturbation: `l_extendedprice *= u`, u ∈ [0,1) derived
  *    from md5 of the row key (reference pipeline/data.py:101-103 uses
  *    `np.random.rand`; the md5-uniform is the seeded, verifiable form).
  *  - T5 static-table skip: `customer` is generated only if absent
  *    (reference pipeline/data.py:38,62-67) — facts grow, dims don't.
  *
  * Batches split the fixture on key parity/modulus so successive cycles
  * append disjoint slices, mimicking the reference's incremental growth.
  */
object Synthesize {

  /** Affine remap constants (shared with the oracle SQL). */
  val SrcLo = "1995-01-01 00:00:00"
  val SrcHi = "2001-08-01 00:00:00"
  val OrdTgtLo = "2024-01-01 00:00:00"
  val OrdTgtHi = "2024-01-01 00:15:00"
  val ShipTgtLo = "2024-01-01 00:00:00"
  val ShipTgtHi = "2024-01-04 00:00:00"

  /** ISO-with-µs timestamp format for the JSON-lines staging files (the
    * default JSON format truncates to millis; the affine remap produces
    * µs values that must survive the roundtrip bit-exactly). */
  val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private val P = "1000000007"

  /** Spark SQL for the affine µs remap of a timestamp column. */
  private def affineS(c: String, tgtLo: String, tgtHi: String): String = {
    s"""timestamp_micros(unix_micros(timestamp'$tgtLo') + cast(floor(
       |  cast(unix_micros($c) - unix_micros(timestamp'$SrcLo') as double) *
       |  (cast(unix_micros(timestamp'$tgtHi') - unix_micros(timestamp'$tgtLo') as double) /
       |   cast(unix_micros(timestamp'$SrcHi') - unix_micros(timestamp'$SrcLo') as double))) as bigint))""".stripMargin
  }

  /** DuckDB SQL for the same remap (µs epoch arithmetic, same IEEE ops). */
  def affineDuck(c: String, tgtLo: String, tgtHi: String): String =
    s"""make_timestamp(epoch_us(TIMESTAMP '$tgtLo') + floor(
       |  (epoch_us($c) - epoch_us(TIMESTAMP '$SrcLo'))::DOUBLE *
       |  ((epoch_us(TIMESTAMP '$tgtHi') - epoch_us(TIMESTAMP '$tgtLo'))::DOUBLE /
       |   (epoch_us(TIMESTAMP '$SrcHi') - epoch_us(TIMESTAMP '$SrcLo'))::DOUBLE))::BIGINT)""".stripMargin

  /** u ∈ [0,1): md5-derived uniform, the deterministic rand() stand-in.
    * 2^60 is a power of two, so long→double rounding and the division
    * are the same IEEE ops in Spark and DuckDB. */
  private def noiseS(keyExpr: String): String =
    s"cast(${Text.hash60SparkSql(s"concat('noise:', $keyExpr)")} as double) / 1152921504606846976.0D"

  def noiseDuck(keyExpr: String): String =
    s"(${Text.hash60DuckSql(s"'noise:' || $keyExpr")})::DOUBLE / 1152921504606846976.0"

  /** From-scratch deterministic table generation (S1, reference
    * pipeline/data.py:39-53 runs DuckDB's dbgen): an orders-shaped table
    * synthesized with `spark.range` + content-addressed column
    * expressions — every value a pure function of the row id, so DuckDB
    * regenerates the identical table from `generate_series`. This is the
    * 100 TB data-gen shape: `range(n)` partitions across executors, no
    * driver data, no source files. */
  def synthTable(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame =
    spark.range(1, n + 1)
      .select(
        col("id").as("o_orderkey"),
        expr(s"1 + (${Text.hash60SparkSql("concat('cust:', cast(id as string))")} % 1000)").as("o_custkey"),
        expr("element_at(array('O','F','P'), cast(id % 3 as int) + 1)").as("o_orderstatus"),
        expr(s"cast(1000 + (${Text.hash60SparkSql("concat('price:', cast(id as string))")} % 499000) as double) / 10.0").as("o_totalprice"),
        expr("timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0, cast(id % 2400 as int), 0, 0, 0)").as("o_orderdate"))

  /** Staged orders batch: uuid key + affine order time. `batchMod`
    * selects the cycle's slice (o_orderkey % nBatches == batchId).
    * `src` defaults to the fixture; [[dbgenOrders]] is the
    * dbgen-fidelity source (same schema). */
  def stagedOrders(spark: SparkSession, sfDir: String, batchId: Int, nBatches: Int,
                   src: Option[DataFrame] = None): DataFrame =
    src.getOrElse(Tables.orders(spark, sfDir))
      .filter(col("o_orderkey") % nBatches === batchId)
      .select(
        md5(concat(lit("order:"), col("o_orderkey").cast("string"))).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        expr(affineS("o_orderdate", OrdTgtLo, OrdTgtHi)).as("o_order_time"),
        col("o_orderpriority"))

  /** Staged lineitem batch: J3 keymap join + E3 noise + E2 ship-time
    * remap. The keymap is derived, not stored — md5 is content-addressed,
    * so the join result is verifiable against recomputation.
    * `srcOrders`/`srcLineitem` default to the fixture tables;
    * [[dbgenOrders]]/[[dbgenLineitem]] are the dbgen-fidelity pair. */
  def stagedLineitem(spark: SparkSession, sfDir: String, batchId: Int, nBatches: Int,
                     srcOrders: Option[DataFrame] = None,
                     srcLineitem: Option[DataFrame] = None): DataFrame = {
    val keymap = srcOrders.getOrElse(Tables.orders(spark, sfDir))
      .select(col("o_orderkey"),
        md5(concat(lit("order:"), col("o_orderkey").cast("string"))).as("o_orderkey_new"))
    srcLineitem.getOrElse(Tables.lineitem(spark, sfDir))
      .filter(col("l_orderkey") % nBatches === batchId)
      .join(keymap, col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_orderkey_new").as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"),
        (expr(noiseS("cast(l_orderkey as string), ':', cast(l_linenumber as string)")) *
          col("l_extendedprice")).as("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        expr(affineS("l_shipdate", ShipTgtLo, ShipTgtHi)).as("l_ship_time"))
  }

  // ----- dbgen-FIDELITY generation (r12 verdict item 5) ----------------

  /** Scale knobs for [[dbgenOrders]]/[[dbgenLineitem]], read once from
    * the fixture parquet footers (count() on a bare scan is a
    * footer-metadata read, no data pass). */
  final case class DbgenDims(orders: Long, customers: Long, parts: Long, suppliers: Long)

  def dbgenDims(spark: SparkSession, sfDir: String): DbgenDims = DbgenDims(
    Tables.orders(spark, sfDir).count(),
    Tables.customer(spark, sfDir).count(),
    Tables.part(spark, sfDir).count(),
    Tables.supplier(spark, sfDir).count())

  /** dbgen-fidelity ORDERS (reference pipeline/data.py:39-53 runs
    * DuckDB `dbgen`; the affine fixture remap reproduces its schema but
    * not its value distributions — SURVEY §2.1 S1's declared gap,
    * closed here behind the [[cycle]] `fidelity` flag): `spark.range`
    * synthesis in the fixture schema carrying dbgen's distribution
    * features, every value a pure hash of the row id so DuckDB
    * regenerates the identical table:
    *  - SPARSE customer keys — o_custkey skips every multiple of 3
    *    (dbgen leaves a third of customers order-less; the
    *    anti-correlation TPC-H q13/q22 are built on), via the integer
    *    map raw + raw div 2 + 1 over raw < 2C/3;
    *  - uniform order dates over 1995-01-01 + [0, 2255) days (dbgen's
    *    7-year span minus its 151-day end guard, shifted into the
    *    staging affine's source window).
    * Scale shape: `range(n)` partitions across executors, no driver
    * data, no source files — the 100 TB generation form. */
  def dbgenOrders(spark: SparkSession, d: DbgenDims): DataFrame = {
    val twoThirds = math.max(1L, 2 * d.customers / 3)
    def h(tag: String) = Text.hash60SparkSql(s"concat('$tag:', cast(id as string))")
    spark.range(1, d.orders + 1).select(
      col("id").as("o_orderkey"),
      expr(s"(${h("dbc")} % $twoThirds) + (${h("dbc")} % $twoThirds) div 2 + 1")
        .as("o_custkey"),
      expr(s"element_at(array('O','F','P'), cast(${h("dbs")} % 3 as int) + 1)")
        .as("o_orderstatus"),
      expr(s"cast(100000 + ${h("dbp")} % 400000 as double) / 100.0D").as("o_totalprice"),
      expr(s"timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0, " +
        s"cast(${h("dbd")} % 2255 as int), 0, 0, 0)").as("o_orderdate"),
      expr("element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), " +
        s"cast(${h("dbo")} % 5 as int) + 1)").as("o_orderpriority"))
  }

  /** dbgen-fidelity LINEITEM from a [[dbgenOrders]] frame — the two
    * distribution features the fixture remap can never synthesize:
    *  - ZIPF-LIKE part popularity: l_partkey = 1 + floor(P·u²) with u
    *    the hash-uniform, computed ENTIRELY in 30-bit integer
    *    arithmetic (h30² div 2^30, then ·P div 2^30 — no pow/exp, so
    *    both engines are bit-identical): pdf ∝ 1/√rank, the hot-part
    *    skew the skewed-TPCH literature models with Zipf and a 100 TB
    *    pipeline must survive (AQE skew-join / salting territory);
    *  - CORRELATED dates: l_shipdate = o_orderdate + [1, 121] days —
    *    dbgen's own L_SHIPDATE = O_ORDERDATE + random(1,121), making
    *    ship time a CHILD of order time instead of an independent
    *    uniform (q4/q12-class predicates live on this correlation);
    *  - 1-7 lines per order (dbgen's O_LINECOUNT), quantity 1-50, and
    *    extendedprice = quantity × dbgen's exact part-price formula
    *    ((90000 + pk/10 % 20001 + 100·(pk % 1000)) / 100).
    * The explode is `sequence(1, n)` per order — map-side, no shuffle;
    * the whole generator is one narrow stage over range(n). */
  def dbgenLineitem(orders: DataFrame, d: DbgenDims): DataFrame = {
    def h(tag: String) =
      Text.hash60SparkSql(s"concat('$tag:', cast(o_orderkey as string), ':', cast(l_linenumber as string))")
    val hl = Text.hash60SparkSql("concat('dbl:', cast(o_orderkey as string))")
    orders.select(col("o_orderkey"), col("o_orderdate"))
      .withColumn("l_linenumber",
        explode(expr(s"sequence(1, cast(1 + $hl % 7 as int))")))
      .withColumn("l_partkey",
        expr(s"1 + ((((${h("dbpk")} % 1073741824) * (${h("dbpk")} % 1073741824)) " +
          s"div 1073741824) * ${d.parts}) div 1073741824"))
      .select(
        col("o_orderkey").as("l_orderkey"),
        col("l_partkey"),
        expr(s"1 + ${h("dbsk")} % ${d.suppliers}").as("l_suppkey"),
        col("l_linenumber").cast("int").as("l_linenumber"),
        expr(s"cast(1 + ${h("dbq")} % 50 as double)").as("l_quantity"),
        (expr(s"cast(1 + ${h("dbq")} % 50 as double)") *
          expr("cast(90000 + (l_partkey div 10) % 20001 + 100 * (l_partkey % 1000) as double) / 100.0D"))
          .as("l_extendedprice"),
        expr(s"cast(${h("dbdi")} % 11 as double) / 100.0D").as("l_discount"),
        expr(s"cast(${h("dbtx")} % 9 as double) / 100.0D").as("l_tax"),
        expr(s"element_at(array('R','A','N'), cast(${h("dbrf")} % 3 as int) + 1)")
          .as("l_returnflag"),
        expr(s"element_at(array('O','F'), cast(${h("dbls")} % 2 as int) + 1)")
          .as("l_linestatus"),
        expr(s"o_orderdate + make_interval(0, 0, 0, cast(1 + ${h("dbsd")} % 121 as int), 0, 0, 0)")
          .as("l_shipdate"))
  }

  /** Write one staged batch as timestamped JSON-lines files into
    * `stagingDir/<table>/` (K1: append-by-new-file). Spark writes one
    * file per partition into a scratch dir; the parts are then moved to
    * flat `{table}_{batch}_{part}.json` names — the reference's
    * `{table}_{isotime}.json` naming (reference pipeline/data.py:110-121),
    * with batch id standing in for wall-clock time (determinism). */
  def writeStaged(df: DataFrame, stagingDir: String, table: String, batchId: Int): Unit = {
    val spark = df.sparkSession
    val tableDir = s"$stagingDir/$table"
    Fs.mkdirs(spark, tableDir)
    val tmp = s"$stagingDir/.tmp_${table}_$batchId"
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .json(tmp)
    val parts = Fs.listFiles(spark, tmp, _.endsWith(".json")).map(_._1).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = f"$tableDir/${table}_b${batchId}_p$i%04d.json"
      Fs.deleteIfExists(spark, dst) // idempotent re-stage (Hadoop rename won't overwrite)
      Fs.renameOrFail(spark, p, dst) // unchecked, a false here + the tmp
      // cleanup below would silently drop this part's rows from the batch
    }
    // scrap the _SUCCESS marker + dir
    Fs.deleteRec(spark, tmp)
  }

  /** Synthesize one generation cycle into the staging dir: the two fact
    * tables always; the static dim only when neither staged nor already
    * ingested into `tablesDir` (T5 idempotent skip). Mirrors the
    * reference's per-cycle `generate` flow (reference pipeline/data.py:126-132).
    *
    * `fidelity = true` (r12 verdict item 5) draws the fact rows from the
    * [[dbgenOrders]]/[[dbgenLineitem]] generators instead of fixture
    * slices, so the staged batches carry dbgen's value skew — sparse
    * customer keys, Zipf-like part popularity, ship dates correlated to
    * order dates — through the SAME staging transforms (uuid keymap,
    * affine remap, price noise; the affine map is monotonic, so the
    * date correlation survives it). The dim still stages from the
    * fixture: dbgen custkeys land inside [1, customers], so downstream
    * joins are unchanged. */
  def cycle(spark: SparkSession, sfDir: String, stagingDir: String, tablesDir: String,
            batchId: Int, nBatches: Int, fidelity: Boolean = false): Unit = {
    val (srcOrd, srcLi) =
      if (fidelity) {
        val d = dbgenDims(spark, sfDir)
        val o = dbgenOrders(spark, d)
        (Some(o), Some(dbgenLineitem(o, d)))
      } else (None, None)
    // Size each staged batch to the ingest appetite (8 = [[Ingest]]'s
    // default `maxFilesPerTrigger`: one generation cycle drains in one
    // micro-batch per table) — r14 optimization round: the fixture
    // tables read as 1-5 splits, so the whole md5/affine/JSON-encode
    // generation ran on 1-5 cores (StageProf: a 1.9 s single task per
    // cycle inside pipe_ingest_roundtrip). Only WIDENS narrow file
    // scans: generated (`range`, inputFiles = 0) or already-wide
    // inputs keep their planned layout — at 100 TB the generation
    // parallelism comes from the source itself and this is a no-op.
    def widen(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
      val n = df.inputFiles.length
      if (n >= 1 && n < 8) df.repartition(8, key) else df
    }
    writeStaged(widen(stagedOrders(spark, sfDir, batchId, nBatches, srcOrd),
      col("o_orderkey")), stagingDir, "orders", batchId)
    writeStaged(widen(stagedLineitem(spark, sfDir, batchId, nBatches, srcOrd, srcLi),
      col("l_orderkey")), stagingDir, "lineitem", batchId)
    // staged/ingested = actual FILES present: live mode pre-creates the
    // staging roots, and FileStreamSink creates the table dir at query
    // start before any commit — bare-directory existence would skip the
    // static dim forever and serve an empty customer table
    val custStagedOrIngested =
      Fs.listFiles(spark, s"$stagingDir/customer", _.endsWith(".json")).nonEmpty ||
        Fs.listFiles(spark, s"$tablesDir/customer", _.endsWith(".parquet")).nonEmpty
    if (!custStagedOrIngested)
      writeStaged(Tables.customer(spark, sfDir), stagingDir, "customer", batchId)
  }
}

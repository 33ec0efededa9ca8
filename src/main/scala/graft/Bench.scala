package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line:
  * `{"metric":"total","value":<sum of per-query medians>,"unit":"sec",
  *   "queries":{name:median,...},...,"full":"BENCH_FULL.json"}`.
  *
  * Measurement protocol (round-2 verdict: single unrepeated runs made
  * regressions and speedups unfalsifiable — BASELINE.md documents 2-4×
  * host swing between identical runs):
  *  - queries run in NAME ORDER (a HashMap's hash order differs across
  *    JVMs, which silently reshuffled cache attribution between rounds);
  *  - the shared dedup pair cache is materialized BEFORE any timing and
  *    reported as its own `cache_materialize` line, so no dd_* query's
  *    number absorbs the pipeline's most expensive stage;
  *  - per query: one untimed warm-up execution, then median-of-3 timed
  *    runs; all samples land in BENCH_FULL.json so a reader can judge
  *    spread.
  *
  * Output-size contract (root cause of rounds 1-3 recording
  * `parsed: None`): the consumer keeps only a ~2000-char TAIL of stdout
  * and json-parses the result line out of it. A line carrying medians +
  * samples for 100+ queries is several KB — its head gets truncated out
  * of the tail and the parse fails. So the stdout line is BUDGETED: it
  * always carries the aggregate fields, then per-query medians
  * slowest-first until ~1500 chars, with `omitted` counting the rest.
  * The COMPLETE per-query medians and samples are written to
  * BENCH_FULL.json next to the repo (path echoed in the line).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TypedImperativeAggregate (SimhashAgg) groups exceed the 128-entry
      // sort-fallback default in every partition at any real scale; keep
      // the map-side hash aggregate hashed.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full materialization via the noop v2 sink: every output column is
    // computed and serialized, unlike round 1's count() action, which
    // let Catalyst prune projections under the count (e.g. op_synth_uuid
    // never computed its md5 column).
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // Session warmup: codegen compiler, shuffle machinery — so the first
    // query's warm-up run isn't charged ~5s of one-time JVM cost.
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // The shared LSH pair relation, timed as its own line (see scaladoc).
    // Guarded like the per-query reps: if the pair pipeline throws, the
    // bench must still emit its one JSON line (cache_materialize = -1;
    // the dd_* consumers will then report failed individually too).
    val cacheSec =
      try time(graft.operators.Dedup.materializePairCache(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val Reps = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // timed reps are guarded too: a query that passes warm-up but
      // throws on a later rep must report as failed, not abort the
      // whole bench with no JSON line emitted
      val samples = try {
        run(fn(spark, sfDir)) // warm-up
        Seq.fill(Reps)(time(run(fn(spark, sfDir))))
      } catch { case _: Throwable => Seq.empty[Double] }
      // drop this query's scratch-persisted relations so their blocks
      // don't skew every later query's memory (outside the timing)
      graft.operators.Scratch.release()
      (name, samples, samples.nonEmpty)
    }
    // Locale.ROOT: a de_DE/fr_FR default locale would print "0,1234"
    // and corrupt the JSON line
    def fmt(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    // failed queries report -1 (NOT their elapsed-until-throw time, and
    // NOT in the total) so a broken query can never read as a speedup
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
    val medians = results.map { case (k, ss, _) => k -> median(ss) }
    val samplesJson = results.map { case (k, ss, _) =>
      s"\"$k\":" + ss.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"$k\"" }.mkString("[", ",", "]")
    val total = medians.collect { case (_, v) if v >= 0 => v }.sum + math.max(0.0, cacheSec)
    // Complete record → file (medians, all samples, failures).
    val allQs = (("cache_materialize" -> cacheSec) +: medians)
      .map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val fullPath = "BENCH_FULL.json"
    val fullJson = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$allQs,"samples":$samplesJson,"sf":"$sfDir","n_queries":${results.size},"failed":$failed,"action":"noop-write","protocol":"warmup+median-of-3"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), fullJson + "\n")
    catch { case _: Throwable => () } // stdout line below is self-sufficient
    // Budgeted stdout line: aggregates + slowest-first medians until the
    // char budget (see scaladoc — the consumer tail is ~2000 chars; stay
    // well under it so the WHOLE line survives even with a trailing sbt
    // status line). Failed queries (-1) sort first so they are never
    // silently omitted.
    val budget = 1500
    val ranked = ("cache_materialize" -> cacheSec) +:
      medians.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }.reverse
    val entries = ranked.map { case (k, v) => s"\"$k\":${fmt(v)}" }
    // n_queries + action give round-over-round totals their context:
    // r1-r2 measured fewer queries under weaker actions; r3+ reports
    // warm-up + median-of-3 (the first numbers stable round-over-round).
    def line(qs: Seq[String], omitted: Int): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qs.mkString("{", ",", "}")},"omitted":$omitted,"full":"$fullPath","sf":"$sfDir","n_queries":${results.size},"failed":$failed,"action":"noop-write","protocol":"warmup+median-of-3"}"""
    var keep = entries.length
    while (keep > 1 && line(entries.take(keep), entries.length - keep).length > budget) keep -= 1
    println(line(entries.take(keep), entries.length - keep))
    spark.stop()
  }
}

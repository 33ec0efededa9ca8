package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/** Event-stream operators over the `events` fixture (SURVEY §2.9 T6 and
  * §7.5): JSON prop extraction, tumbling/sliding time windows, and
  * sessionization — the batch forms. The window aggregations are exposed
  * as input-DataFrame → output-DataFrame transforms ([[tumblingAgg]],
  * [[slidingAgg]]) consumed verbatim by the Structured Streaming twins in
  * [[graft.streaming.StreamingOps]]: the batch oracle here validates the
  * exact column logic the streaming queries run (same expressions, same
  * windows).
  *
  * Scale: all window aggregations shuffle once on (window, key); the
  * sessionize path shuffles once on user_id and sorts within partitions —
  * at 100 TB that is one exchange on a high-cardinality key, no driver
  * involvement.
  */
object Events {

  /** Tumbling 1-hour (window, event_type) count + exact sum — shared by
    * the batch query below and the streaming twin (unsorted: streaming
    * aggregations cannot sort; callers order the final result). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 1-hour-every-30-min windows — shared batch/streaming. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("total_value"))

  /** JSON property extraction (driver `events.props` motivates
    * get_json_object — SURVEY §1.2). */
  def opJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .orderBy("event_id")

  private val opJsonExtractSql: String =
    """SELECT event_id, event_type, json_extract_string(props, '$.k')::BIGINT AS prop_k
      |FROM events ORDER BY event_id""".stripMargin

  /** Tumbling 1-hour windows per event type: count + exact sum. Spark's
    * `window()` aligns to the epoch; the oracle's time_bucket aligns to
    * 2000-01-01 — both are whole-hour origins, so buckets coincide. */
  def opEventsTumbling(spark: SparkSession, sfDir: String): DataFrame =
    tumblingAgg(Tables.events(spark, sfDir))
      .orderBy("window_start", "event_type")

  private val opEventsTumblingSql: String =
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       |  count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Sliding windows, 1 h wide every 30 min: each event lands in exactly
    * two windows. The oracle expands the window set explicitly
    * (k ∈ {0,1}) — same bucket math, engine-independent. */
  def opEventsSliding(spark: SparkSession, sfDir: String): DataFrame =
    slidingAgg(Tables.events(spark, sfDir))
      .orderBy("window_start")

  private val opEventsSlidingSql: String =
    s"""SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
       |  count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
       |GROUP BY 1 ORDER BY window_start""".stripMargin

  /** Sessionization with a 30-minute inactivity gap: session boundaries
    * via lag, session ids via running sum — the deterministic batch
    * equivalent of `session_window` (streaming twin lives in
    * [[graft.streaming.StreamingOps]]). */
  def opEventsSession(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  private val opEventsSessionSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, ts, value, event_id,
       |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > ${30L * 60 * 1000000}
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM (SELECT user_id, ts, value, event_id,
       |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |        FROM events) t),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
       |  FROM marked)
       |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** As-of join (an operator Spark has no native form of — builder
    * preference (a): compose existing ops): each `purchase` event is
    * joined to the same user's most recent strictly-preceding `view`
    * event. Instead of a per-row inequality join (quadratic, and a
    * BroadcastNestedLoopJoin in Spark), the union-and-carry construction
    * runs it in ONE shuffle on user_id: tag view timestamps, carry the
    * last seen one forward with a running `last(ignoreNulls)` window over
    * strictly-preceding rows, then keep the purchases. At 100 TB this is
    * the same single exchange + in-partition sort as sessionization. */
  def opAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .withColumn("view_ts", when(col("event_type") === "view", col("ts")))
      .withColumn("asof_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("asof_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofJoinSql: String =
    """SELECT event_id, user_id, ts, asof_view_ts FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_view_ts
      |  FROM events) t
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** As-of join with a lookback tolerance (the full ASOF semantics:
    * match only if the preceding event is within `tolerance`) — same
    * single-shuffle union-and-carry plan as [[opAsofJoin]], plus a
    * bound check; out-of-tolerance matches null out. */
  def opAsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val tolUs = 60L * 60 * 1000000 // 1 hour lookback
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .withColumn("view_ts", when(col("event_type") === "view", col("ts")))
      .withColumn("prev_view", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("asof_view_ts",
        when(unix_micros(col("ts")) - unix_micros(col("prev_view")) <= tolUs, col("prev_view")))
      .select(col("event_id"), col("user_id"), col("ts"), col("asof_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofToleranceSql: String =
    s"""SELECT event_id, user_id, ts,
       |  CASE WHEN epoch_us(ts) - epoch_us(prev_view) <= ${60L * 60 * 1000000}
       |       THEN prev_view END AS asof_view_ts
       |FROM (
       |  SELECT event_id, user_id, ts, event_type,
       |    last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view
       |  FROM events) t
       |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** The SAME as-of semantics through the native operator (builder
    * preference (c)): [[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]],
    * a custom Catalyst logical + physical operator registered via
    * `SparkSessionExtensions`. Two genuinely separate relations
    * (purchases, views) co-cluster on user_id, co-sort on (user_id, ts),
    * and stream-merge with O(1) per-partition state — no union, no
    * window carry. Standard ASOF backward semantics (`v.ts <= p.ts`, the
    * most recent view at-or-before each purchase), which the oracle runs
    * through DuckDB's own native `ASOF LEFT JOIN`. */
  def opAsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin.join(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts").as("asof_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofNativeSql: String =
    """SELECT p.event_id, p.user_id, p.ts, v.v_ts AS asof_view_ts
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS v_user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.v_user_id AND v.v_ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  /** FORWARD as-of through the native exec (pandas `merge_asof`
    * direction="forward"): each purchase joins the EARLIEST view at or
    * after it — "what did the user look at next". Same two-exchange
    * two-sort plan; the forward candidate is the merge's unconsumed
    * cursor row, still O(1) state. Oracle: correlated min-subquery
    * (DuckDB's ASOF is backward-only, so the oracle states the
    * definition directly). */
  def opAsofFwd(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin.join(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts", direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts").as("next_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofFwdSql: String =
    """SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT min(v.ts) FROM events v
      |   WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts >= p.ts)
      |    AS next_view_ts
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin

  /** STRICT backward as-of (pandas allow_exact_matches=False): the
    * greatest view time STRICTLY before each purchase — the form that
    * excludes simultaneous events (a view logged in the same microsecond
    * as its purchase is effect, not cause). Same exec, strict candidate
    * bound; exact-time rows are left at the cursor for later lefts. */
  def opAsofStrict(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin.join(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts", allowExactMatches = false)
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts").as("prev_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofStrictSql: String =
    """SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT max(v.ts) FROM events v
      |   WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts < p.ts)
      |    AS prev_view_ts
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin

  /** NEAREST as-of (pandas direction="nearest"): the closer of the
    * backward and forward candidates, ties to the earlier row. One
    * pass, both candidates live in the same O(1) merge state (buffered
    * backward row + unconsumed cursor). Oracle states the definition:
    * backward = max(ts <= p.ts), forward = min(ts > p.ts), pick by
    * distance with ties backward. */
  def opAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin.join(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts", direction = "nearest")
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts").as("nearest_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofNearestSql: String =
    """SELECT event_id, user_id, ts,
      |  CASE WHEN back IS NOT NULL AND (fwd IS NULL
      |            OR epoch_us(ts) - epoch_us(back) <= epoch_us(fwd) - epoch_us(ts))
      |       THEN back ELSE fwd END AS nearest_view_ts
      |FROM (
      |  SELECT p.event_id, p.user_id, p.ts,
      |    (SELECT max(v.ts) FROM events v
      |     WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts) AS back,
      |    (SELECT min(v.ts) FROM events v
      |     WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts > p.ts) AS fwd
      |  FROM events p WHERE p.event_type = 'purchase') t
      |ORDER BY event_id""".stripMargin

  /** Native as-of join with a lookback tolerance: matches farther than
    * 1 hour back null out. Since the candidate is the GREATEST
    * `v.ts <= p.ts`, "candidate out of tolerance" proves no in-tolerance
    * match exists — the exec checks the bound on the single buffered
    * candidate; the oracle post-filters DuckDB's ASOF result the same
    * way. */
  def opAsofNativeTol(spark: SparkSession, sfDir: String): DataFrame = {
    val tolUs = 60L * 60 * 1000000
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin.join(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts", toleranceUs = Some(tolUs))
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts").as("asof_view_ts"))
      .orderBy("event_id")
  }

  private val opAsofNativeTolSql: String =
    s"""SELECT event_id, user_id, ts,
       |  CASE WHEN epoch_us(ts) - epoch_us(asof_view_ts) <= ${60L * 60 * 1000000}
       |       THEN asof_view_ts END AS asof_view_ts
       |FROM (
       |  SELECT p.event_id, p.user_id, p.ts, v.v_ts AS asof_view_ts
       |  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
       |  ASOF LEFT JOIN
       |       (SELECT user_id AS v_user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
       |    ON p.user_id = v.v_user_id AND v.v_ts <= p.ts) t
       |ORDER BY event_id""".stripMargin

  /** Range (interval) join, bin-bucketed for scale: for every `error`
    * event, count the same user's events in the following 10 minutes.
    * The naive form is a θ-join on `ts BETWEEN e.ts AND e.ts+10min` —
    * a nested-loop at scale. Bucketing both sides into 10-minute bins
    * turns it into an equi-join on (user_id, bin) — each probe interval
    * spans ≤ 2 bins, so the right side is exploded into its bin and the
    * probe into (bin, bin+1), and the exact predicate filters the
    * candidates (the same bucket-then-verify shape as the LSH dedups;
    * identical results to the θ-join, which is what the oracle runs). */
  def opRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val binUs = 10L * 60 * 1000000
    val ev = Tables.events(spark, sfDir)
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t0"))
      .withColumn("bin", explode(array(
        expr(s"t0 div $binUs"), expr(s"t0 div $binUs + 1"))))
    val rhs = ev
      .select(col("user_id"), unix_micros(col("ts")).as("t1"))
      .withColumn("bin", expr(s"t1 div $binUs"))
    errs.join(rhs, Seq("user_id", "bin"))
      .filter(col("t1") > col("t0") && col("t1") <= col("t0") + binUs)
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_follow"))
      .orderBy("event_id")
  }

  private val opRangeJoinSql: String =
    s"""SELECT e.event_id, e.user_id, count(*) AS n_follow
       |FROM events e JOIN events f
       |  ON f.user_id = e.user_id
       | AND epoch_us(f.ts) > epoch_us(e.ts)
       | AND epoch_us(f.ts) <= epoch_us(e.ts) + ${10L * 60 * 1000000}
       |WHERE e.event_type = 'error'
       |GROUP BY e.event_id, e.user_id
       |ORDER BY e.event_id""".stripMargin

  /** A/B EXPERIMENT ANALYSIS — deterministic hash-based variant
    * assignment (md5 of the user id, the engine-portable form of every
    * experimentation platform's bucketing hash) and the two-proportion
    * conversion readout in ONE pass: per-user conversion flags reduce
    * per variant, then rates, lift and the pooled z-score evaluate as
    * one fixed IEEE expression over exact integer counts — bit-equal in
    * both engines. One shuffle on user_id (the per-user reduce), then
    * an aggregate-sized result; assignment is a map-side expression, so
    * at 100 TB nothing experiment-related adds data movement. */
  def opAbTest(spark: SparkSession, sfDir: String): DataFrame = {
    val u = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(
        // outcome = the user hit an error (the guardrail-metric read;
        // purchase incidence saturates at 100% over a 30-day fixture,
        // which would degenerate the pooled variance)
        max(when(col("event_type") === "error", 1L).otherwise(0L)).as("converted"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)"))), lit(0L)).as("cents"))
      .withColumn("variant",
        expr(s"${graft.functions.Text.hash60SparkSql("cast(user_id as string)")} % 2"))
    u.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("conv_b"),
        sum(when(col("variant") === 0, col("cents")).otherwise(0L)).as("cents_a"),
        sum(when(col("variant") === 1, col("cents")).otherwise(0L)).as("cents_b"))
      .withColumn("rate_a", col("conv_a").cast("double") / col("n_a"))
      .withColumn("rate_b", col("conv_b").cast("double") / col("n_b"))
      .withColumn("z_score", expr(
        """case when conv_a + conv_b = 0 or conv_a + conv_b = n_a + n_b then null
          |else (cast(conv_a as double) / n_a - cast(conv_b as double) / n_b)
          |  / sqrt((cast(conv_a + conv_b as double) / (n_a + n_b))
          |         * (1.0 - cast(conv_a + conv_b as double) / (n_a + n_b))
          |         * (1.0 / n_a + 1.0 / n_b)) end""".stripMargin))
      .select("n_a", "n_b", "conv_a", "conv_b", "cents_a", "cents_b",
        "rate_a", "rate_b", "z_score")
  }

  private val opAbTestSql: String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS converted,
       |    coalesce(sum(CASE WHEN event_type = 'purchase'
       |      THEN round(value * 100)::BIGINT END), 0)::BIGINT AS cents
       |  FROM events GROUP BY 1),
       |v AS (SELECT *, ${graft.functions.Text.hash60DuckSql("user_id::VARCHAR")} % 2 AS variant FROM u),
       |agg AS (
       |  SELECT
       |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
       |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
       |    sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)::BIGINT AS conv_a,
       |    sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)::BIGINT AS conv_b,
       |    sum(CASE WHEN variant = 0 THEN cents ELSE 0 END)::BIGINT AS cents_a,
       |    sum(CASE WHEN variant = 1 THEN cents ELSE 0 END)::BIGINT AS cents_b
       |  FROM v)
       |SELECT n_a, n_b, conv_a, conv_b, cents_a, cents_b,
       |  conv_a::DOUBLE / n_a AS rate_a,
       |  conv_b::DOUBLE / n_b AS rate_b,
       |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL
       |  ELSE (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
       |    / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
       |           * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
       |           * (1.0 / n_a + 1.0 / n_b)) END AS z_score
       |FROM agg""".stripMargin

  /** Sequence-pattern matching (the MATCH_RECOGNIZE capability as a
    * DataFrame op): each user's events collapse to an ordered string of
    * event-type initials (click/error/purchase/signup/view → c,e,p,s,v
    * — distinct by fixture construction), and a regex counts behavior
    * journeys over it — here `v[^p]*p`, "a view eventually followed by
    * a purchase", non-overlapping (both engines' regex scans resume
    * past each match, so counts agree). The per-user sequence is
    * ONE aggregation (collect into a struct array, sort, join) — the
    * same single shuffle on user_id every sessionize does; sequences
    * are user-session-sized, never corpus-sized, so the state per key
    * is bounded at any scale. Tie-break inside the sort is (ts,
    * event_id) — total order, deterministic string. Top-20 readout by
    * (journeys, events, user_id). */
  def evPattern(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(ts, event_id, substring(event_type, 1, 1) as c))), x -> x.c)"),
          "").as("seq"))
      .withColumn("n_journeys", expr("cast(regexp_count(seq, 'v[^p]*p') as bigint)"))
      .select(col("user_id"), col("n_events"), col("n_journeys"),
        md5(col("seq")).as("seq_md5"))
      .orderBy(col("n_journeys").desc, col("n_events").desc, col("user_id"))
      .limit(20)

  private val evPatternSql: String =
    """SELECT user_id, count(*)::BIGINT AS n_events,
      |  len(regexp_extract_all(
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
      |    'v[^p]*p'))::BIGINT AS n_journeys,
      |  md5(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)) AS seq_md5
      |FROM events GROUP BY user_id
      |ORDER BY n_journeys DESC, n_events DESC, user_id LIMIT 20""".stripMargin

  /** Time-to-convert distribution: per user, first `view` → first
    * LATER `purchase` latency, then the population stats every growth
    * dashboard reads (count / min / p50 / max). Latencies are exact
    * integer microseconds; the median follows [[Relational.opQuantiles]]'
    * proven idiom (exact-percentile interpolation of exact ints,
    * rounded to a whole µs before the compare). ONE shuffle on user_id
    * for the per-user firsts (map-side min-combine), then an
    * aggregate-sized readout — at 100 TB the heavy side never moves
    * twice. */
  def evTimeToConvert(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("first_view_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("first_purchase_us"))
      .filter(col("first_view_us").isNotNull &&
        col("first_purchase_us") > col("first_view_us"))
      .withColumn("delta_us", col("first_purchase_us") - col("first_view_us"))
      .agg(count(lit(1)).as("n_users"),
        min("delta_us").as("min_us"),
        expr("cast(round(percentile(delta_us, 0.5)) as bigint)").as("p50_us"),
        max("delta_us").as("max_us"))

  private val evTimeToConvertSql: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
      |  FROM events GROUP BY user_id),
      |d AS (
      |  SELECT first_purchase_us - first_view_us AS delta_us FROM firsts
      |  WHERE first_view_us IS NOT NULL AND first_purchase_us > first_view_us)
      |SELECT count(*)::BIGINT AS n_users, min(delta_us)::BIGINT AS min_us,
      |  round(quantile_cont(delta_us, 0.5))::BIGINT AS p50_us,
      |  max(delta_us)::BIGINT AS max_us
      |FROM d""".stripMargin

  /** Day-of-week × hour-of-day seasonality profile — the temporal
    * fingerprint behind traffic forecasting and anomaly baselines.
    * Counts are exact; each cell's share of total traffic is ONE
    * division against the window-summed total (the total is computed
    * over the 168-row AGGREGATED frame, so the empty-partition window
    * is grid-sized, never data-sized). Spark's `dayofweek` is
    * 1=Sunday; the −1 shift matches DuckDB's 0=Sunday convention. */
  def evSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val cell = Tables.events(spark, sfDir)
      .groupBy((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"))
    cell
      .withColumn("share",
        col("n_events").cast("double") /
          sum("n_events").over(Window.partitionBy()).cast("double"))
      .orderBy("dow", "hod")
  }

  private val evSeasonalitySql: String =
    """WITH cell AS (
      |  SELECT dayofweek(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hod,
      |    count(*)::BIGINT AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT dow, hod, n_events,
      |  n_events::DOUBLE / sum(n_events) OVER ()::DOUBLE AS share
      |FROM cell ORDER BY dow, hod""".stripMargin

  /** DAU / trailing-30-day-MAU stickiness — the engagement ratio, and
    * with it the RANGE-WINDOWED COUNT DISTINCT problem: a sliding
    * distinct cannot be window-aggregated directly (distinct doesn't
    * decompose over frames), so the corpus first reduces to distinct
    * (user, day) pairs — ONE shuffle, the big win: every later step
    * works on user-days, not events — and each pair then contributes
    * itself to the 30 forward days it keeps a user "monthly-active"
    * for (a bounded 30× explode of the REDUCED relation), giving MAU
    * as a plain per-day distinct. At extreme user counts the explode
    * swaps for per-day HLL sketch unions (`op_approx_distinct` is the
    * measured path) — same shape, approximate counts. Output days are
    * restricted to the observed grid; ratio is one division over
    * exact counts. */
  def evStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    val userDays = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val dau = userDays.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    val mau = userDays
      .select(col("user_id"),
        explode(expr("transform(sequence(0, 29), i -> day + make_interval(0, 0, 0, i))"))
          .as("target_day"))
      .groupBy("target_day").agg(countDistinct(col("user_id")).as("mau_30d"))
    dau.join(mau, dau("day") === mau("target_day"))
      // day as DATE: DuckDB's date_trunc('day', ts) returns DATE while
      // Spark's returns midnight TIMESTAMP — strict type gate (round 8)
      .select(col("day").cast("date").as("day"), col("dau"), col("mau_30d"),
        (col("dau").cast("double") / col("mau_30d")).as("stickiness"))
      .orderBy("day")
  }

  private val evStickinessSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |dau AS (SELECT day, count(DISTINCT user_id)::BIGINT AS dau FROM ud GROUP BY 1),
      |mau AS (
      |  SELECT target_day, count(DISTINCT user_id)::BIGINT AS mau_30d
      |  FROM (SELECT user_id, day + i * INTERVAL '1 day' AS target_day
      |        FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 29)) AS i) ii)
      |  GROUP BY 1)
      |SELECT day, dau, mau_30d, dau::DOUBLE / mau_30d AS stickiness
      |FROM dau JOIN mau ON day = target_day ORDER BY day""".stripMargin

  /** CUSUM change-point detection over event-rate series: hourly counts
    * per event type, deviation from the type's mean hourly rate, and
    * the cumulative sum of deviations in hour order — the hour where
    * |CUSUM| peaks is the distribution-shift point (the monitoring
    * primitive behind data-drift alerts). The CUSUM after k hours
    * telescopes to `running_cnt − k·mean = (running_cnt·N − k·S)/N`
    * (S, N = the type's total count and hour count), so it stays an
    * EXACT integer numerator over a constant denominator until one
    * final division — immune to windowed-sum float reassociation
    * (DuckDB's segment-tree window sum reorders double additions; a
    * naive running sum of `dev` doubles drifts ~1e-13 and
    * hash-fails). The argmax also compares the integer numerator, so
    * the picked hour is exact. Two
    * aggregate-sized shuffles (hourly rollup, then per-type window);
    * the series length is hours × types — metadata-sized at any data
    * scale. */
  def evCusum(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val wAvg = Window.partitionBy("event_type")
    val wCum = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy("event_type")
      .orderBy(abs(col("num")).desc, col("hour"))
    hourly
      .withColumn("s_tot", sum("cnt").over(wAvg))
      .withColumn("n_hours", count(lit(1)).over(wAvg))
      .withColumn("run_cnt", sum("cnt").over(wCum))
      .withColumn("k", row_number().over(
        Window.partitionBy("event_type").orderBy("hour")).cast("long"))
      .withColumn("num", col("run_cnt") * col("n_hours") - col("k") * col("s_tot"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hour").as("change_hour"),
        (col("num").cast("double") / col("n_hours")).as("cusum"))
      .orderBy("event_type")
  }

  private val evCusumSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS cnt
      |  FROM events GROUP BY 1, 2),
      |cs AS (
      |  SELECT *,
      |    sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS s_tot,
      |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n_hours,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run_cnt,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hour)::BIGINT AS k
      |  FROM hourly),
      |nm AS (SELECT *, run_cnt * n_hours - k * s_tot AS num FROM cs),
      |pick AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(num) DESC, hour) AS rn
      |  FROM nm)
      |SELECT event_type, hour AS change_hour, num::DOUBLE / n_hours AS cusum
      |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** INTERVAL-OVERLAP JOIN — both sides are true intervals (a 2-hour
    * attention window around each view, a 1-hour window around each
    * purchase), matched per user where the intervals INTERSECT — the
    * genomics/session-overlap operator that [[opRangeJoin]]'s
    * point-to-window form can't express. Bucketing: bin width = the
    * longer side's length, each interval enumerated into its (≤ 2)
    * touching bins — two overlapping intervals always share a bin, so
    * the θ-predicate becomes an equi-join on (user, bin) + exact
    * verify + pair-distinct (the candidate may appear in two shared
    * bins). Output is the pair count, id checksums and exact integer
    * overlap mass. The oracle runs the plain θ-join — identical result,
    * quadratic shape; the bucketed plan is the one that survives
    * 100 TB. */
  def opIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val H = 3600L * 1000000
    val B = 2 * H // bin width = the longer (view) interval
    val P = 9973L
    val ev = Tables.events(spark, sfDir)
    val a = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("a_id"), col("user_id"),
        unix_micros(col("ts")).as("a_lo"))
      .withColumn("a_hi", col("a_lo") + 2 * H)
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("b_id"), col("user_id"),
        unix_micros(col("ts")).as("b_lo"))
      .withColumn("b_hi", col("b_lo") + H)
    val aB = a.withColumn("bin",
      explode(array_distinct(array(expr(s"a_lo div $B"), expr(s"a_hi div $B")))))
    val bB = b.withColumn("bin",
      explode(array_distinct(array(expr(s"b_lo div $B"), expr(s"b_hi div $B")))))
    aB.join(bB, Seq("user_id", "bin"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("user_id", "a_id", "b_id", "a_lo", "a_hi", "b_lo", "b_hi")
      .distinct()
      .withColumn("ov",
        least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_id") % P).as("a_check"),
        sum(col("b_id") % P).as("b_check"),
        sum(col("ov")).as("overlap_us_sum"),
        max(col("ov")).as("max_overlap_us"))
  }

  private val opIntervalJoinSql: String = {
    val h = 3600L * 1000000
    s"""WITH a AS (SELECT event_id AS a_id, user_id, epoch_us(ts) AS a_lo,
       |    epoch_us(ts) + ${2 * h} AS a_hi FROM events WHERE event_type = 'view'),
       |b AS (SELECT event_id AS b_id, user_id, epoch_us(ts) AS b_lo,
       |    epoch_us(ts) + $h AS b_hi FROM events WHERE event_type = 'purchase')
       |SELECT count(*)::BIGINT AS n_pairs,
       |  sum(a_id % 9973)::BIGINT AS a_check,
       |  sum(b_id % 9973)::BIGINT AS b_check,
       |  sum(least(a_hi, b_hi) - greatest(a_lo, b_lo))::BIGINT AS overlap_us_sum,
       |  max(least(a_hi, b_hi) - greatest(a_lo, b_lo))::BIGINT AS max_overlap_us
       |FROM a JOIN b ON b.user_id = a.user_id
       |  AND a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi""".stripMargin
  }

  /** PIVOT: per-user event-type counts as columns (the long→wide
    * feature-izing step; Spark pivots with explicit values so the
    * output schema is static — required at scale and for the oracle). */
  def opPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")

  private val opPivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** UNPIVOT (melt): the wide table back to long (metric, value) rows —
    * Spark's native unpivot operator. */
  def opUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    opPivot(spark, sfDir)
      .unpivot(Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
        "metric", "n")
      .orderBy("user_id", "metric")

  private val opUnpivotSql: String =
    """SELECT user_id, metric, n FROM (
      |  SELECT user_id, 'click' AS metric, count(*) FILTER (event_type = 'click') AS n FROM events GROUP BY user_id
      |  UNION ALL SELECT user_id, 'error', count(*) FILTER (event_type = 'error') FROM events GROUP BY user_id
      |  UNION ALL SELECT user_id, 'purchase', count(*) FILTER (event_type = 'purchase') FROM events GROUP BY user_id
      |  UNION ALL SELECT user_id, 'signup', count(*) FILTER (event_type = 'signup') FROM events GROUP BY user_id
      |  UNION ALL SELECT user_id, 'view', count(*) FILTER (event_type = 'view') FROM events GROUP BY user_id) t
      |ORDER BY user_id, metric""".stripMargin

  /** Resample + gap-fill (the time-series regularization step Spark has
    * no native operator for — builder preference (a): compose existing
    * ops): hourly (event_type, bucket) aggregates re-gridded onto the
    * COMPLETE hour range of the table, empty buckets emitted with
    * n_events = 0 and the last observed aggregate carried forward
    * (null before a type's first observation).
    *
    * Scale: the aggregation is one shuffle on (hour, type); the grid is
    * O(span × types) rows built by exploding a 1-row bounds aggregate —
    * no cross join, no driver loop — and the gap-fill is one window
    * pass partitioned by type. At 100 TB the grid stays tiny (it scales
    * with time span, not data volume) and everything corpus-sized moves
    * exactly once. */
  def opResampleFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val agg = ev
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
    // the type dimension is DERIVED from the data (a hard-coded list
    // would silently drop aggregates of any unlisted type at the grid
    // join); carrying the collect_set through the hour explode keeps
    // the grid construction join-free
    val grid = ev
      .agg(date_trunc("hour", min(col("ts"))).as("h0"), date_trunc("hour", max(col("ts"))).as("h1"),
        collect_set(col("event_type")).as("tys"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("window_start"), col("tys"))
      .select(col("window_start"), explode(col("tys")).as("event_type"))
    val w = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("window_start", "event_type"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("value_ffill", last(col("total_value"), ignoreNulls = true).over(w))
      .select("window_start", "event_type", "n_events", "value_ffill")
      .orderBy("window_start", "event_type")
  }

  private val opResampleFfillSql: String =
    s"""WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
       |  FROM events),
       |grid AS (SELECT g.ws AS window_start, t.event_type
       |  FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b),
       |                                      INTERVAL 1 HOUR)) AS ws) g
       |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
       |agg AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
       |    count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |  FROM events GROUP BY 1, 2)
       |SELECT g.window_start, g.event_type,
       |  coalesce(a.n_events, 0)::BIGINT AS n_events,
       |  last_value(a.total_value IGNORE NULLS) OVER (PARTITION BY g.event_type
       |    ORDER BY g.window_start
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
       |FROM grid g LEFT JOIN agg a
       |  ON a.window_start = g.window_start AND a.event_type = g.event_type
       |ORDER BY g.window_start, g.event_type""".stripMargin

  /** Resample + LINEAR INTERPOLATION — [[opResampleFfill]]'s grid with
    * interior gaps filled by interpolating between the surrounding
    * observations instead of carrying the last one: two window passes
    * (previous/next observed value and hour index), then
    * `pv + (nv - pv) * frac`. Null outside the observed range (no
    * extrapolation). The arithmetic is the SAME expression tree in both
    * engines — integer hour indexes, one double division — so results
    * are bit-identical. Same scale shape as ffill: one shuffle for the
    * aggregate, window passes partitioned by type. */
  def opResampleInterp(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val agg = ev
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
    // type list derived from the data, join-free — see opResampleFfill
    val grid = ev
      .agg(date_trunc("hour", min(col("ts"))).as("h0"), date_trunc("hour", max(col("ts"))).as("h1"),
        collect_set(col("event_type")).as("tys"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("window_start"), col("tys"))
      .select(col("window_start"), explode(col("tys")).as("event_type"))
    val back = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(agg, Seq("window_start", "event_type"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      // floor, not truncate-toward-zero: matches the oracle for
      // pre-1970 timestamps too (grid hours are exact multiples of
      // 3600s, so the division itself is exact)
      .withColumn("t", floor(unix_seconds(col("window_start")) / lit(3600)).cast("long"))
      .withColumn("obs_t", when(col("total_value").isNotNull, col("t")))
      .withColumn("pv", last(col("total_value"), ignoreNulls = true).over(back))
      .withColumn("pt", last(col("obs_t"), ignoreNulls = true).over(back))
      .withColumn("nv", first(col("total_value"), ignoreNulls = true).over(fwd))
      .withColumn("nt", first(col("obs_t"), ignoreNulls = true).over(fwd))
      .withColumn("value_interp",
        when(col("total_value").isNotNull, col("total_value"))
          .when(col("pv").isNull || col("nv").isNull, lit(null).cast("double"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("t") - col("pt")).cast("double") / (col("nt") - col("pt")).cast("double"))))
      .select("window_start", "event_type", "n_events", "value_interp")
      .orderBy("window_start", "event_type")
  }

  private val opResampleInterpSql: String =
    s"""WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
       |  FROM events),
       |grid AS (SELECT g.ws AS window_start, t.event_type
       |  FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b),
       |                                      INTERVAL 1 HOUR)) AS ws) g
       |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
       |agg AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
       |    count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |  FROM events GROUP BY 1, 2),
       |j AS (SELECT g.window_start, g.event_type,
       |    coalesce(a.n_events, 0)::BIGINT AS n_events, a.total_value,
       |    floor(epoch(g.window_start) / 3600)::BIGINT AS t,
       |    CASE WHEN a.total_value IS NOT NULL
       |         THEN floor(epoch(g.window_start) / 3600)::BIGINT END AS obs_t
       |  FROM grid g LEFT JOIN agg a
       |    ON a.window_start = g.window_start AND a.event_type = g.event_type),
       |w AS (SELECT window_start, event_type, n_events, total_value, t,
       |    last_value(total_value IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY window_start
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    last_value(obs_t IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY window_start
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
       |    first_value(total_value IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY window_start
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |    first_value(obs_t IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY window_start
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
       |  FROM j)
       |SELECT window_start, event_type, n_events,
       |  CASE WHEN total_value IS NOT NULL THEN total_value
       |       WHEN pv IS NULL OR nv IS NULL THEN NULL
       |       ELSE pv + (nv - pv) * ((t - pt)::DOUBLE / (nt - pt)::DOUBLE) END AS value_interp
       |FROM w ORDER BY window_start, event_type""".stripMargin

  /** Z-SCORE OUTLIER DETECTION per event type — the standard
    * statistical anomaly gate. Exactness: per-type moments are exact
    * integer sums over 100-scaled values (sx, sxx — BIGINT, shuffle-
    * order-proof); mean, variance, and z then evaluate through a FIXED
    * operation sequence ((v−sx/n)/sqrt(sxx/n − (sx/n)·(sx/n))) of IEEE
    * ops — and IEEE-754 sqrt is correctly rounded, so it is as
    * bit-portable as +,−,×,÷. Emits the global top-20 by |z| — no
    * distributional threshold assumption. One 5-row stats aggregate
    * broadcast back onto one scan, then TakeOrderedAndProject.
    * Zero-variance guard: a constant-valued event_type would divide by
    * sqrt(0) — Spark (non-ANSI) yields NULL where DuckDB's IEEE ops
    * yield ±Infinity, a latent oracle divergence — so groups with
    * non-positive variance are filtered out IDENTICALLY on both sides
    * (same expression, same op order) before z is computed. */
  def evAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val vc = round(col("value") * 100).cast("long")
    val stats = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(vc).as("sx"), sum(vc * vc).as("sxx"))
      .filter(col("sxx").cast("double") / col("n") -
        (col("sx").cast("double") / col("n")) * (col("sx").cast("double") / col("n")) > 0)
    val mean = col("sx").cast("double") / col("n")
    val z = (vc.cast("double") - mean) /
      sqrt(col("sxx").cast("double") / col("n") - mean * mean)
    Tables.events(spark, sfDir)
      .join(broadcast(stats), "event_type")
      .withColumn("z", z)
      .select("event_id", "event_type", "value", "z")
      .orderBy(abs(col("z")).desc, col("event_id"))
      .limit(20)
  }

  private val evAnomalySql: String =
    """WITH s AS (
      |  SELECT event_type, count(*)::BIGINT AS n,
      |    sum(round(value * 100)::BIGINT)::BIGINT AS sx,
      |    sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)::BIGINT AS sxx
      |  FROM events GROUP BY 1
      |  HAVING sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)::BIGINT::DOUBLE / count(*)
      |    - (sum(round(value * 100)::BIGINT)::DOUBLE / count(*))
      |      * (sum(round(value * 100)::BIGINT)::DOUBLE / count(*)) > 0)
      |SELECT event_id, e.event_type, value,
      |  (round(value * 100)::BIGINT::DOUBLE - sx::DOUBLE / n)
      |    / sqrt(sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n)) AS z
      |FROM events e JOIN s ON s.event_type = e.event_type
      |ORDER BY abs(z) DESC, event_id LIMIT 20""".stripMargin

  /** Exponentially-weighted moving average (decay 1/2, depth 10) of each
    * user's event values — the online-feature smoothing a training
    * pipeline computes per entity. Cross-engine exactness by
    * construction: values become integer cents, the weights are DYADIC
    * (2^-i, exact in binary), so every term and the two partial sums are
    * exact doubles in ANY summation order, and the closing num/den
    * division is the single rounding both engines perform identically —
    * no libm, no order sensitivity. The lag-chain form is one window
    * pass per partition (user), shuffle on user_id only. */
  def opEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val weights = (0 until 10).map(i => math.pow(0.5, i)) // dyadic: exact
    val cents = round(col("value") * 100).cast("long")
    val num = weights.zipWithIndex.map { case (wt, i) =>
      coalesce(lag(cents, i).over(w) * lit(wt), lit(0.0))
    }.reduce(_ + _)
    val den = weights.zipWithIndex.map { case (wt, i) =>
      when(lag(cents, i).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
    }.reduce(_ + _)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        // a null value occupies its lag slot but contributes no weight;
        // an all-missing window (den = 0) yields NULL, not an ANSI
        // divide-by-zero (r10 null-jitter gate)
        when(den > lit(0.0), num / den).as("ewma_cents"))
      .withColumn("ewma", col("ewma_cents") / 100.0)
      .drop("ewma_cents")
      .orderBy("user_id", "ts", "event_id")
  }

  private val opEwmaSql: String = {
    val weights = (0 until 10).map(i => math.pow(0.5, i))
    def lagc(i: Int) =
      if (i == 0) "c" else s"lag(c, $i) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    val num = weights.zipWithIndex.map { case (wt, i) =>
      s"coalesce(${lagc(i)} * $wt, 0.0)"
    }.mkString(" + ")
    val den = weights.zipWithIndex.map { case (wt, i) =>
      s"CASE WHEN ${lagc(i)} IS NOT NULL THEN $wt ELSE 0.0 END"
    }.mkString(" + ")
    s"""SELECT event_id, user_id, ts, value,
       |  CASE WHEN ($den) > 0.0 THEN (($num) / ($den)) / 100.0 END AS ewma
       |FROM (SELECT event_id, user_id, ts, value,
       |        round(value * 100)::BIGINT AS c FROM events) t
       |ORDER BY user_id, ts, event_id""".stripMargin
  }

  /** Sessionization with BOTH a 30-min inactivity gap and a
    * maximum-duration cap — the Google-Analytics-style split: a long
    * continuously-active visit is cut at fixed offsets from the
    * gap-session's start (floor(elapsed / cap)), so no session row ever
    * spans more than the cap. (The cap is 15 min here — BELOW the
    * fixture's 56-min longest session so the split path is genuinely
    * exercised (224 sessions split); production caps like GA's 4 h are
    * the same constant.) The offset form (rather than "cap since
    * the previous split") keeps the semantics a pure per-row function
    * of (ts − session_start), which is one extra window `min` over the
    * SAME (user_id, ts) exchange+sort the gap pass already planned —
    * identical single-shuffle shape as [[opEventsSession]], and exactly
    * expressible in both engines (an iterative "reset at each split"
    * rule would be neither). */
  def evSessionCap(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    val capUs = 15L * 60 * 1000000
    Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sess_start_us", min(unix_micros(col("ts"))).over(
        Window.partitionBy("user_id", "session_id")))
      .withColumn("sub_id", expr(s"(unix_micros(ts) - sess_start_us) div $capUs"))
      .groupBy(col("user_id"), col("session_id"), col("sub_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
      .orderBy("user_id", "session_id", "sub_id")
  }

  private val evSessionCapSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, ts, value, event_id,
       |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > ${30L * 60 * 1000000}
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM (SELECT user_id, ts, value, event_id,
       |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |        FROM events) t),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
       |  FROM marked),
       |capped AS (
       |  SELECT user_id, ts, value, session_id,
       |    ((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id, session_id))
       |      // ${15L * 60 * 1000000})::BIGINT AS sub_id
       |  FROM sess)
       |SELECT user_id, session_id, sub_id,
       |  min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |FROM capped GROUP BY user_id, session_id, sub_id
       |ORDER BY user_id, session_id, sub_id""".stripMargin

  /** ROBUST anomaly detection by MEDIAN / MAD — the heavy-tail-safe twin
    * of [[evAnomaly]]'s z-score: a single extreme value inflates the
    * mean AND the stddev (masking itself and flagging normal points);
    * the median and the median-absolute-deviation have 50% breakdown, so
    * the robust z `0.6745·(x − med)/MAD` keeps scoring correctly under
    * contamination. Exactness: values are integer cents; both medians
    * use the same linear-interpolation percentile as [[Relational]]'s
    * quantile idiom (DuckDB quantile_cont ≡ Spark percentile), whose
    * half-step interpolants are exact binary fractions; the final score
    * applies the identical constant multiply + divide in both engines.
    *
    * Scale: two per-type aggregations (exact percentile over each
    * type's cents — at 100 TB swap for approx_percentile or a
    * two-pass count-bucket exact median) + two broadcast joins of the
    * 5-row stats relations; the scan stays the only data-sized pass. */
  def evAnomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    val vc = round(col("value") * 100).cast("long")
    val ev = Tables.events(spark, sfDir)
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(cast(round(value * 100) as bigint), 0.5)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy("event_type", "med")
      .agg(expr("percentile(abs(cast(round(value * 100) as bigint) - med), 0.5)").as("mad"))
      .filter(col("mad") > 0)
    ev.join(broadcast(mad), "event_type")
      .withColumn("rz", lit(0.6745) * (vc.cast("double") - col("med")) / col("mad"))
      .select("event_id", "event_type", "value", "rz")
      .orderBy(abs(col("rz")).desc, col("event_id"))
      .limit(20)
  }

  private val evAnomalyMadSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(round(value * 100)::BIGINT, 0.5) AS med
      |  FROM events GROUP BY 1),
      |mad AS (
      |  SELECT e.event_type, med,
      |    quantile_cont(abs(round(value * 100)::BIGINT - med), 0.5) AS mad
      |  FROM events e JOIN med ON med.event_type = e.event_type
      |  GROUP BY 1, 2 HAVING quantile_cont(abs(round(value * 100)::BIGINT - med), 0.5) > 0)
      |SELECT event_id, e.event_type, value,
      |  0.6745 * (round(value * 100)::BIGINT::DOUBLE - med) / mad AS rz
      |FROM events e JOIN mad ON mad.event_type = e.event_type
      |ORDER BY abs(rz) DESC, event_id LIMIT 20""".stripMargin

  /** GINI CONCENTRATION of activity — per event type, how unequally
    * the event volume is distributed across users (the power-user /
    * long-tail diagnostic behind sampling and rate-limit policy: a
    * Gini near 0 means uniform usage, near 1 means a few users
    * dominate — which also predicts shuffle-key skew for any
    * user-keyed operator downstream, making this the skew PROBE you
    * run before choosing a salting factor).
    *
    * Computed by the rank formula on ascending-sorted per-user counts
    * x₁≤…≤xₙ: `G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)`. Ranks carry a
    * user_id tie-break so `Σ i·xᵢ` is deterministic under equal
    * counts (ties permute ranks WITHIN an equal-x run, and i·x sums
    * are invariant under permutations within a run, but the explicit
    * tie-break keeps the row_number itself reproducible too). All
    * sums are exact BIGINTs; the Gini is ONE double division.
    *
    * Shape at scale: one user-keyed aggregation (map-side partials),
    * one in-partition sort per event type for the rank, one
    * type-keyed re-aggregation — the per-type relation is
    * users-sized, never events-sized, and nothing is collected. */
  def evGini(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("x"), col("user_id"))
    Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n_users"),
        sum("x").as("n_events"),
        sum(col("i") * col("x")).as("ix_sum"))
      .withColumn("gini",
        (lit(2L) * col("ix_sum") - (col("n_users") + lit(1L)) * col("n_events"))
          .cast("double") /
          (col("n_users") * col("n_events")).cast("double"))
      .select("event_type", "n_users", "n_events", "gini")
      .orderBy("event_type")
  }

  private val evGiniSql: String =
    """WITH per AS (
      |  SELECT event_type, user_id, count(*)::BIGINT AS x
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY x, user_id)::BIGINT AS i
      |  FROM per),
      |agg AS (
      |  SELECT event_type, count(*)::BIGINT AS n_users,
      |    sum(x)::BIGINT AS n_events, sum(i * x)::BIGINT AS ix_sum
      |  FROM ranked GROUP BY 1)
      |SELECT event_type, n_users, n_events,
      |  (2 * ix_sum - (n_users + 1) * n_events)::DOUBLE
      |    / (n_users * n_events)::DOUBLE AS gini
      |FROM agg ORDER BY event_type""".stripMargin

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator for
    * a rollout without random assignment: compare the treated group's
    * pre→post outcome change against the control group's over the same
    * boundary, cancelling time trends common to both. Assignment is
    * the deterministic keyed-hash split [[opAbTest]] uses (variant =
    * hash60 of user % 2); the period boundary is the event window's
    * exact midpoint in epoch MICROSECONDS (integer min/max midpoint —
    * a one-row aggregate broadcast back, the allowlisted scalar-
    * subquery shape). Outcome = per-cell purchase cents (exact integer
    * sums) per distinct active user; the four cell means are each ONE
    * double division and the DiD is the identical two-subtraction
    * expression on both engines. Shape at scale: one events scan, one
    * (variant, period) aggregation with map-side partials over 4 keys
    * (countDistinct(user) shuffles user-sized partials, the standard
    * distinct-agg plan) — no window, no join against anything
    * data-sized. */
  def evDid(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cut = ev.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("cut_us"))
    val cells = ev.crossJoin(broadcast(cut))
      .withColumn("variant",
        expr(s"${graft.functions.Text.hash60SparkSql("concat('did:', cast(user_id as string))")} % 2"))
      .withColumn("post",
        when(unix_micros(col("ts")) >= col("cut_us"), 1L).otherwise(0L))
      .withColumn("cents",
        when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(lit(0L)))
      .groupBy("variant", "post")
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("cents"))
    val one = cells.agg(
      sum(when(col("variant") === 1 && col("post") === 0, col("n_users"))).as("n_t_pre"),
      sum(when(col("variant") === 1 && col("post") === 1, col("n_users"))).as("n_t_post"),
      sum(when(col("variant") === 0 && col("post") === 0, col("n_users"))).as("n_c_pre"),
      sum(when(col("variant") === 0 && col("post") === 1, col("n_users"))).as("n_c_post"),
      sum(when(col("variant") === 1 && col("post") === 0, col("cents"))).as("cents_t_pre"),
      sum(when(col("variant") === 1 && col("post") === 1, col("cents"))).as("cents_t_post"),
      sum(when(col("variant") === 0 && col("post") === 0, col("cents"))).as("cents_c_pre"),
      sum(when(col("variant") === 0 && col("post") === 1, col("cents"))).as("cents_c_post"))
    one
      .withColumn("m_t_pre", expr("cast(cents_t_pre as double) / cast(n_t_pre as double)"))
      .withColumn("m_t_post", expr("cast(cents_t_post as double) / cast(n_t_post as double)"))
      .withColumn("m_c_pre", expr("cast(cents_c_pre as double) / cast(n_c_pre as double)"))
      .withColumn("m_c_post", expr("cast(cents_c_post as double) / cast(n_c_post as double)"))
      .withColumn("did", expr("(m_t_post - m_t_pre) - (m_c_post - m_c_pre)"))
      .select("n_t_pre", "n_t_post", "n_c_pre", "n_c_post",
        "m_t_pre", "m_t_post", "m_c_pre", "m_c_post", "did")
  }

  private val evDidSql: String =
    s"""WITH cut AS (
       |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cut_us FROM events),
       |per AS (
       |  SELECT
       |    ${graft.functions.Text.hash60DuckSql("'did:' || user_id::VARCHAR")} % 2 AS variant,
       |    CASE WHEN epoch_us(ts) >= cut_us THEN 1 ELSE 0 END AS post,
       |    user_id,
       |    CASE WHEN event_type = 'purchase'
       |      THEN round(value * 100)::BIGINT ELSE 0 END AS cents
       |  FROM events, cut),
       |cell AS (
       |  SELECT variant, post, count(DISTINCT user_id)::BIGINT AS n_users,
       |    sum(cents)::BIGINT AS cents
       |  FROM per GROUP BY 1, 2),
       |one AS (
       |  SELECT
       |    sum(CASE WHEN variant = 1 AND post = 0 THEN n_users END)::BIGINT AS n_t_pre,
       |    sum(CASE WHEN variant = 1 AND post = 1 THEN n_users END)::BIGINT AS n_t_post,
       |    sum(CASE WHEN variant = 0 AND post = 0 THEN n_users END)::BIGINT AS n_c_pre,
       |    sum(CASE WHEN variant = 0 AND post = 1 THEN n_users END)::BIGINT AS n_c_post,
       |    sum(CASE WHEN variant = 1 AND post = 0 THEN cents END)::BIGINT AS cents_t_pre,
       |    sum(CASE WHEN variant = 1 AND post = 1 THEN cents END)::BIGINT AS cents_t_post,
       |    sum(CASE WHEN variant = 0 AND post = 0 THEN cents END)::BIGINT AS cents_c_pre,
       |    sum(CASE WHEN variant = 0 AND post = 1 THEN cents END)::BIGINT AS cents_c_post
       |  FROM cell),
       |m AS (
       |  SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       |    cents_t_pre::DOUBLE / n_t_pre::DOUBLE AS m_t_pre,
       |    cents_t_post::DOUBLE / n_t_post::DOUBLE AS m_t_post,
       |    cents_c_pre::DOUBLE / n_c_pre::DOUBLE AS m_c_pre,
       |    cents_c_post::DOUBLE / n_c_post::DOUBLE AS m_c_post
       |  FROM one)
       |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       |  m_t_pre, m_t_post, m_c_pre, m_c_post,
       |  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
       |FROM m""".stripMargin

  /** SAMPLE-RATIO MISMATCH — the guardrail every experiment readout
    * must pass first: if a 50/50 hash split's realized user counts
    * deviate beyond chance, assignment or logging is broken and the
    * metric deltas are meaningless. The surface uses TWO assignments —
    * [[evDid]] hashes 'did:'-prefixed ids, while [[opAbTest]],
    * [[evPowerMde]] and [[evCuped]] hash the bare id — so this emits
    * rows for BOTH under a `split` column ('did' / 'plain'); r8 advice
    * caught the previous version monitoring only the 'did' split while
    * claiming to guard opAbTest. For an equal split the chi-square
    * statistic reduces to (n_a − n_b)² / (n_a + n_b) — exact integer
    * numerator/denominator, ONE double division — compared against the
    * 3.841 (χ²₁, α=0.05) and 10.828 (α=0.001) critical values as
    * published flags. Per event_type rows make the broken segment
    * visible, plus the '(all)' pooled row. One distinct-(type, user,
    * variant) reduction per split then a K-row aggregate — nothing
    * user-sized leaves the first groupBy. */
  def evSrm(spark: SparkSession, sfDir: String): DataFrame = {
    def oneSplit(label: String, hashArg: String): DataFrame = {
      val users = Tables.events(spark, sfDir)
        .select(col("event_type"), col("user_id"))
        .withColumn("variant",
          expr(s"${graft.functions.Text.hash60SparkSql(hashArg)} % 2"))
      val byType = users.distinct()
        .groupBy("event_type")
        .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
      val overall = users.select(col("user_id"), col("variant")).distinct()
        .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
        .withColumn("event_type", lit("(all)"))
        .select("event_type", "n_a", "n_b")
      byType.unionByName(overall).withColumn("split", lit(label))
    }
    oneSplit("did", "concat('did:', cast(user_id as string))")
      .unionByName(oneSplit("plain", "cast(user_id as string)"))
      .withColumn("chi2",
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))).cast("double")
          / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("srm_05", col("chi2") > lit(3.841))
      .withColumn("srm_001", col("chi2") > lit(10.828))
      .select("split", "event_type", "n_a", "n_b", "chi2", "srm_05", "srm_001")
      .orderBy("split", "event_type")
  }

  private val evSrmSql: String = {
    def oneSplit(label: String, hashArg: String): String =
      s"""  SELECT '$label' AS split, event_type, n_a, n_b FROM (
         |    SELECT event_type,
         |      sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |      sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
         |    FROM (SELECT DISTINCT event_type, user_id,
         |            ${graft.functions.Text.hash60DuckSql(hashArg)} % 2 AS variant
         |          FROM events) u GROUP BY event_type
         |    UNION ALL
         |    SELECT '(all)' AS event_type,
         |      sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT,
         |      sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT
         |    FROM (SELECT DISTINCT user_id,
         |            ${graft.functions.Text.hash60DuckSql(hashArg)} % 2 AS variant
         |          FROM events) p) s""".stripMargin
    s"""WITH t AS (
       |${oneSplit("did", "'did:' || user_id::VARCHAR")}
       |UNION ALL
       |${oneSplit("plain", "user_id::VARCHAR")})
       |SELECT split, event_type, n_a, n_b,
       |  ((n_a - n_b) * (n_a - n_b))::DOUBLE / (n_a + n_b)::DOUBLE AS chi2,
       |  ((n_a - n_b) * (n_a - n_b))::DOUBLE / (n_a + n_b)::DOUBLE > 3.841 AS srm_05,
       |  ((n_a - n_b) * (n_a - n_b))::DOUBLE / (n_a + n_b)::DOUBLE > 10.828 AS srm_001
       |FROM t ORDER BY split, event_type""".stripMargin
  }

  /** MINIMUM DETECTABLE EFFECT — the experiment-design companion to
    * [[opAbTest]]/[[evSrm]]: at the CURRENT arm sizes, how small a
    * conversion-rate lift could the test even see at α=0.05 two-sided
    * and 80% power? MDE = (z₀.₉₇₅ + z₀.₈)·√(2·p̄(1−p̄)/n̄) with the
    * z-constants as shared literals (1.959964, 0.841621), p̄ the exact
    * pooled-rate rational and n̄ the harmonic-style per-arm size
    * 2·nₐ·n_b/(nₐ+n_b). The only non-rational step is ONE IEEE sqrt of
    * an identically-built double on both engines ([[Events.evGini]]
    * convention). Published per outcome definition: above-mean error
    * activity (the guardrail) and above-mean purchase activity. Same
    * user-keyed reduction shape as [[opAbTest]] plus one one-row
    * totals broadcast — nothing user-sized leaves the first groupBy. */
  def evPowerMde(spark: SparkSession, sfDir: String): DataFrame = {
    // outcome = ABOVE-MEAN activity of the type (cnt·N > total, an exact
    // integer comparison): a plain incidence saturates at 100% on a
    // fixture where every user hits every type (the opAbTest caveat),
    // and a saturated metric has MDE 0 — the heavy-user rate stays
    // mid-range at every scale, keeping the design query non-vacuous.
    val counts = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("c_err"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c_buy"))
    val tot = counts.agg(count(lit(1)).as("n_users"),
      sum(col("c_err")).as("t_err"), sum(col("c_buy")).as("t_buy"))
    val u = counts.crossJoin(broadcast(tot))
      .withColumn("err",
        when(col("c_err") * col("n_users") > col("t_err"), 1L).otherwise(0L))
      .withColumn("buy",
        when(col("c_buy") * col("n_users") > col("t_buy"), 1L).otherwise(0L))
      .withColumn("variant",
        expr(s"${graft.functions.Text.hash60SparkSql("cast(user_id as string)")} % 2"))
    val arms = u.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(col("err")).as("conv_err"),
      sum(col("buy")).as("conv_buy"))
    val metrics = Seq("err", "buy").map { m =>
      arms.select(lit(m).as("outcome"), col("n_a"), col("n_b"),
        col(s"conv_$m").as("conv"))
    }.reduce(_ unionByName _)
    metrics
      .withColumn("pbar",
        col("conv").cast("double") / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("n_eff",
        (lit(2L) * col("n_a") * col("n_b")).cast("double")
          / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("mde_abs",
        lit(1.959964 + 0.841621) *
          sqrt(lit(2.0) * col("pbar") * (lit(1.0) - col("pbar")) / col("n_eff")))
      .withColumn("mde_rel", col("mde_abs") / col("pbar"))
      .select("outcome", "n_a", "n_b", "conv", "pbar", "mde_abs", "mde_rel")
      .orderBy("outcome")
  }

  private val evPowerMdeSql: String =
    s"""WITH c AS (
       |  SELECT user_id,
       |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS c_err,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c_buy
       |  FROM events GROUP BY user_id),
       |tot AS (
       |  SELECT count(*)::BIGINT AS n_users,
       |    sum(c_err)::BIGINT AS t_err, sum(c_buy)::BIGINT AS t_buy
       |  FROM c),
       |u AS (
       |  SELECT user_id,
       |    CASE WHEN c_err * n_users > t_err THEN 1 ELSE 0 END::BIGINT AS err,
       |    CASE WHEN c_buy * n_users > t_buy THEN 1 ELSE 0 END::BIGINT AS buy,
       |    ${graft.functions.Text.hash60DuckSql("user_id::VARCHAR")} % 2 AS variant
       |  FROM c, tot),
       |arms AS (
       |  SELECT
       |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
       |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
       |    sum(err)::BIGINT AS conv_err, sum(buy)::BIGINT AS conv_buy
       |  FROM u),
       |m AS (
       |  SELECT 'err' AS outcome, n_a, n_b, conv_err AS conv FROM arms
       |  UNION ALL
       |  SELECT 'buy' AS outcome, n_a, n_b, conv_buy AS conv FROM arms),
       |r AS (
       |  SELECT outcome, n_a, n_b, conv,
       |    conv::DOUBLE / (n_a + n_b)::DOUBLE AS pbar,
       |    (2 * n_a * n_b)::DOUBLE / (n_a + n_b)::DOUBLE AS n_eff
       |  FROM m)
       |SELECT outcome, n_a, n_b, conv, pbar,
       |  ${1.959964 + 0.841621} * sqrt(2.0 * pbar * (1.0 - pbar) / n_eff) AS mde_abs,
       |  ${1.959964 + 0.841621} * sqrt(2.0 * pbar * (1.0 - pbar) / n_eff) / pbar AS mde_rel
       |FROM r ORDER BY outcome""".stripMargin

  /** CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    * production trick for shipping experiments faster: regress the
    * post-period metric on the PRE-period covariate (θ = cov/var, the
    * OLS slope), publish variant means of Y − θ(X − X̄), and report
    * ρ² — the fraction of metric variance the covariate removes. The
    * split reuses [[evDid]]'s exact epoch-microsecond midpoint and
    * [[opAbTest]]'s hash variant. Exactness follows the
    * [[graft.operators.MlPrep]] OLS convention: per-user X/Y are
    * integer cents, ONE aggregation reduces the corpus to exact
    * associative int64 sums (so partial-merge order cannot matter),
    * and every published number is the same CAST-to-double scalar
    * expression evaluated on both engines. Int64 headroom: per-user
    * cents ≤ ~10⁶ ⇒ X² ≤ 10¹², fine through x100 of the shipped
    * fixtures; the 100 TB path is the hi/lo split `Ols.syyD` uses. */
  def evCuped(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cut = ev.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("cut_us"))
    val perUser = ev.crossJoin(broadcast(cut))
      .withColumn("cents",
        when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(lit(0L)))
      .groupBy("user_id")
      .agg(
        sum(when(unix_micros(col("ts")) < col("cut_us"), col("cents"))
          .otherwise(lit(0L))).as("x"),
        sum(when(unix_micros(col("ts")) >= col("cut_us"), col("cents"))
          .otherwise(lit(0L))).as("y"))
      .withColumn("variant",
        expr(s"${graft.functions.Text.hash60SparkSql("cast(user_id as string)")} % 2"))
    val sums = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === 0, col("x")).otherwise(lit(0L))).as("sx_a"),
      sum(when(col("variant") === 1, col("x")).otherwise(lit(0L))).as("sx_b"),
      sum(when(col("variant") === 0, col("y")).otherwise(lit(0L))).as("sy_a"),
      sum(when(col("variant") === 1, col("y")).otherwise(lit(0L))).as("sy_b"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    sums.selectExpr(
      "n_a", "n_b",
      s"${Cuped.meanYA} AS mean_y_a", s"${Cuped.meanYB} AS mean_y_b",
      s"${Cuped.liftRaw} AS lift_raw",
      s"${Cuped.theta} AS theta",
      s"${Cuped.adjA} AS adj_a", s"${Cuped.adjB} AS adj_b",
      s"${Cuped.liftAdj} AS lift_adj",
      s"${Cuped.rho2} AS rho2")
  }

  /** Shared final-algebra strings (valid in BOTH Spark SQL and DuckDB —
    * only CAST/arithmetic): exact int64 sums in, doubles out. */
  private object Cuped {
    private val nD = "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    private val sxD = "(CAST(sx_a AS DOUBLE) + CAST(sx_b AS DOUBLE))"
    private val syD = "(CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE))"
    private val cov = s"($nD * CAST(sxy AS DOUBLE) - $sxD * $syD)"
    private val varx = s"($nD * CAST(sxx AS DOUBLE) - $sxD * $sxD)"
    private val vary = s"($nD * CAST(syy AS DOUBLE) - $syD * $syD)"
    val theta = s"($cov / $varx)"
    val rho2 = s"(($cov * $cov) / ($varx * $vary))"
    val meanYA = "(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100 AS DOUBLE))"
    val meanYB = "(CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100 AS DOUBLE))"
    val liftRaw = s"($meanYB - $meanYA)"
    private val xbar = s"($sxD / $nD)"
    val adjA = s"((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - $theta * " +
      s"(CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - $xbar)) / CAST(100 AS DOUBLE))"
    val adjB = s"((CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) - $theta * " +
      s"(CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) - $xbar)) / CAST(100 AS DOUBLE))"
    val liftAdj = s"($adjB - $adjA)"
  }

  private val evCupedSql: String =
    s"""WITH cut AS (
       |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cut_us FROM events),
       |pu AS (
       |  SELECT user_id,
       |    sum(CASE WHEN epoch_us(ts) < cut_us AND event_type = 'purchase'
       |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS x,
       |    sum(CASE WHEN epoch_us(ts) >= cut_us AND event_type = 'purchase'
       |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS y,
       |    ${graft.functions.Text.hash60DuckSql("user_id::VARCHAR")} % 2 AS variant
       |  FROM events, cut GROUP BY user_id),
       |s AS (
       |  SELECT
       |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
       |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
       |    sum(CASE WHEN variant = 0 THEN x ELSE 0 END)::BIGINT AS sx_a,
       |    sum(CASE WHEN variant = 1 THEN x ELSE 0 END)::BIGINT AS sx_b,
       |    sum(CASE WHEN variant = 0 THEN y ELSE 0 END)::BIGINT AS sy_a,
       |    sum(CASE WHEN variant = 1 THEN y ELSE 0 END)::BIGINT AS sy_b,
       |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
       |    sum(y * y)::BIGINT AS syy
       |  FROM pu)
       |SELECT n_a, n_b,
       |  ${Cuped.meanYA} AS mean_y_a, ${Cuped.meanYB} AS mean_y_b,
       |  ${Cuped.liftRaw} AS lift_raw,
       |  ${Cuped.theta} AS theta,
       |  ${Cuped.adjA} AS adj_a, ${Cuped.adjB} AS adj_b,
       |  ${Cuped.liftAdj} AS lift_adj,
       |  ${Cuped.rho2} AS rho2
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_cuped" -> (evCuped _),
    "ev_power_mde" -> (evPowerMde _),
    "ev_srm" -> (evSrm _),
    "ev_did" -> (evDid _),
    "ev_gini" -> (evGini _),
    "ev_anomaly_mad" -> (evAnomalyMad _),
    "ev_session_cap" -> (evSessionCap _),
    "op_ewma" -> (opEwma _),
    "ev_anomaly" -> (evAnomaly _),
    "op_resample_interp" -> (opResampleInterp _),
    "op_resample_ffill" -> (opResampleFfill _),
    "op_pivot" -> (opPivot _),
    "op_unpivot" -> (opUnpivot _),
    "op_json_extract" -> (opJsonExtract _),
    "op_events_tumbling" -> (opEventsTumbling _),
    "op_events_sliding" -> (opEventsSliding _),
    "op_events_session" -> (opEventsSession _),
    "op_asof_join" -> (opAsofJoin _),
    "op_asof_tolerance" -> (opAsofTolerance _),
    "op_asof_native" -> (opAsofNative _),
    "op_asof_native_tol" -> (opAsofNativeTol _),
    "op_asof_fwd" -> (opAsofFwd _),
    "op_asof_nearest" -> (opAsofNearest _),
    "op_asof_strict" -> (opAsofStrict _),
    "op_range_join" -> (opRangeJoin _),
    "op_interval_join" -> (opIntervalJoin _),
    "ev_ab_test" -> (opAbTest _),
    "ev_pattern" -> (evPattern _),
    "ev_cusum" -> (evCusum _),
    "ev_time_to_convert" -> (evTimeToConvert _),
    "ev_stickiness" -> (evStickiness _),
    "ev_seasonality" -> (evSeasonality _))

  val oracles: Map[String, String] = Map(
    "ev_cuped" -> evCupedSql,
    "ev_power_mde" -> evPowerMdeSql,
    "ev_srm" -> evSrmSql,
    "ev_did" -> evDidSql,
    "ev_gini" -> evGiniSql,
    "ev_anomaly_mad" -> evAnomalyMadSql,
    "ev_session_cap" -> evSessionCapSql,
    "op_ewma" -> opEwmaSql,
    "ev_anomaly" -> evAnomalySql,
    "op_resample_interp" -> opResampleInterpSql,
    "op_resample_ffill" -> opResampleFfillSql,
    "op_pivot" -> opPivotSql,
    "op_unpivot" -> opUnpivotSql,
    "op_json_extract" -> opJsonExtractSql,
    "op_events_tumbling" -> opEventsTumblingSql,
    "op_events_sliding" -> opEventsSlidingSql,
    "op_events_session" -> opEventsSessionSql,
    "op_asof_join" -> opAsofJoinSql,
    "op_asof_tolerance" -> opAsofToleranceSql,
    "op_asof_native" -> opAsofNativeSql,
    "op_asof_native_tol" -> opAsofNativeTolSql,
    "op_asof_fwd" -> opAsofFwdSql,
    "op_asof_nearest" -> opAsofNearestSql,
    "op_asof_strict" -> opAsofStrictSql,
    "op_range_join" -> opRangeJoinSql,
    "op_interval_join" -> opIntervalJoinSql,
    "ev_ab_test" -> opAbTestSql,
    "ev_pattern" -> evPatternSql,
    "ev_cusum" -> evCusumSql,
    "ev_time_to_convert" -> evTimeToConvertSql,
    "ev_stickiness" -> evStickinessSql,
    "ev_seasonality" -> evSeasonalitySql)
}

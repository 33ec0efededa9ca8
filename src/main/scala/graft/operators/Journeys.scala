package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** User-journey analytics over the `events` fixture and slowly-changing
  * dimension maintenance over `orders` — the behavioral-warehouse surface
  * a pipeline serving product analytics needs next to plain window
  * aggregation (reference serves one dashboard aggregate,
  * `dashboard.py:30-47`; these are the standard generalizations).
  *
  * Scale design (all three ops):
  *  - [[evFunnel]] chains groupBy(user_id) → join(user_id) stages, so
  *    every stage shuffles on the SAME key and Catalyst reuses the
  *    hash partitioning across the chain instead of re-exchanging; the
  *    final output is one row per funnel step (3 rows), aggregated
  *    map-side. No window over the whole corpus, no driver data.
  *  - [[evRetention]] is two shuffles (first-touch per user on user_id,
  *    then the cohort-cell aggregate) over integer keys; the distinct
  *    inside the cell aggregate is a partial-agg-pushed
  *    count(distinct) on an already-shuffled key.
  *  - [[opScd2]] is the textbook two-window SCD2 build: change
  *    detection via lag() and range closing via lead() both partition
  *    by the dimension key, so the whole op is ONE exchange on
  *    c_custkey followed by two in-partition sorted passes.
  */
object Journeys {

  /** Ordered funnel steps: a user converts step k only with an event of
    * that type STRICTLY AFTER their step-(k−1) conversion time (the
    * standard strict-sequence funnel). Fixed 3-step funnel over the
    * fixture's event vocabulary. */
  private val FunnelSteps = Seq("view", "click", "purchase")

  /** Per-step converted-user counts for the view → click → purchase
    * funnel. Emits (step, step_name, users), one row per step. */
  def evFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    // stage k: earliest qualifying event per user, strictly after the
    // user's previous-stage conversion instant
    val stages = FunnelSteps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val base = ev.filter(col("event_type") === step)
        val qualified = prev match {
          case None => base
          case Some(p) => base.join(p, "user_id").filter(col("ts") > col(s"t$i"))
        }
        Some(qualified.groupBy("user_id").agg(min("ts").as(s"t${i + 1}")))
    }.flatten
    stages.zip(FunnelSteps).zipWithIndex.map { case ((s, name), i) =>
      s.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"), col("users"))
    }.reduce(_ unionAll _).orderBy("step")
  }

  private val evFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1::BIGINT AS step, 'view' AS step_name, count(*)::BIGINT AS users FROM s1
      |  UNION ALL
      |  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM s2
      |  UNION ALL
      |  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM s3) f
      |ORDER BY step""".stripMargin

  /** [[evFunnel]] with a CONVERSION WINDOW: step k counts only if it
    * happens within 72 hours of the step-(k−1) conversion — the form
    * product funnels actually use (an unbounded funnel overcounts
    * stragglers). Same chained shape, one extra residual bound per
    * stage; timestamp+interval arithmetic is exact integer microseconds
    * in both engines. */
  def evFunnelWindowed(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val stages = FunnelSteps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val base = ev.filter(col("event_type") === step)
        val qualified = prev match {
          case None => base
          case Some(p) => base.join(p, "user_id")
            .filter(col("ts") > col(s"t$i") &&
              col("ts") <= col(s"t$i") + expr("INTERVAL 72 HOURS"))
        }
        Some(qualified.groupBy("user_id").agg(min("ts").as(s"t${i + 1}")))
    }.flatten
    stages.zip(FunnelSteps).zipWithIndex.map { case ((s, name), i) =>
      s.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"), col("users"))
    }.reduce(_ unionAll _).orderBy("step")
  }

  private val evFunnelWindowedSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |    AND e.ts <= s1.t1 + INTERVAL '72 hours' GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |    AND e.ts <= s2.t2 + INTERVAL '72 hours' GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1::BIGINT AS step, 'view' AS step_name, count(*)::BIGINT AS users FROM s1
      |  UNION ALL
      |  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM s2
      |  UNION ALL
      |  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM s3) f
      |ORDER BY step""".stripMargin

  /** Weekly cohort retention: users cohorted by the ISO week of their
    * first event; each cell counts distinct cohort members active in
    * week cohort+offset. Week arithmetic is done on epoch seconds of
    * week-truncated timestamps (both engines truncate to Monday 00:00),
    * so the offset is exact integer math, not calendar-dependent. */
  def evRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    ev.join(first, "user_id")
      .withColumn("week_offset",
        ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort_week"))) / 604800L).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("active_users"))
      // output as DATE: DuckDB's date_trunc('week', ts) returns DATE
      // while Spark's returns midnight TIMESTAMP — same instant, but the
      // strict type gate (round 8) requires identical parquet types
      .withColumn("cohort_week", col("cohort_week").cast("date"))
      .orderBy("cohort_week", "week_offset")
  }

  private val evRetentionSql: String =
    """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      |first AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
      |SELECT cohort_week,
      |  ((epoch(wk)::BIGINT - epoch(cohort_week)::BIGINT) // 604800)::BIGINT AS week_offset,
      |  count(DISTINCT ev.user_id)::BIGINT AS active_users
      |FROM ev JOIN first ON ev.user_id = first.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Cohort LTV curve — [[evRetention]]'s revenue twin: per signup-week
    * cohort and week age, active purchasers, exact purchase cents, and
    * the RUNNING cumulative cents (lifetime value at that age — the
    * payback-period readout). The cumulative sum is over exact BIGINTs
    * ordered by age, so windowed-sum reassociation can't bite. Same
    * single user-keyed shuffle as retention + one grid-sized window
    * pass (cohorts × weeks — metadata-sized at any event volume). */
  def evCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cohort = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val cum = Window.partitionBy("cohort_week").orderBy("week_age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .join(cohort, "user_id")
      .withColumn("week_age",
        ((unix_timestamp(date_trunc("week", col("ts"))) -
          unix_timestamp(col("cohort_week"))) / 604800L).cast("long"))
      .groupBy("cohort_week", "week_age")
      .agg(countDistinct(col("user_id")).as("n_buyers"), sum("cents").as("cents"))
      .withColumn("cum_cents", sum("cents").over(cum))
      // DATE output to match DuckDB's date_trunc type (see evRetention)
      .withColumn("cohort_week", col("cohort_week").cast("date"))
      .orderBy("cohort_week", "week_age")
  }

  private val evCohortLtvSql: String =
    """WITH cohort AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, cohort_week,
      |    ((epoch(date_trunc('week', ts))::BIGINT - epoch(cohort_week)::BIGINT)
      |      // 604800)::BIGINT AS week_age,
      |    round(value * 100)::BIGINT AS cents
      |  FROM events e JOIN cohort ON e.user_id = cohort.user_id
      |  WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT cohort_week, week_age, count(DISTINCT user_id)::BIGINT AS n_buyers,
      |    sum(cents)::BIGINT AS cents
      |  FROM p GROUP BY 1, 2)
      |SELECT cohort_week, week_age, n_buyers, cents,
      |  sum(cents) OVER (PARTITION BY cohort_week ORDER BY week_age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_cents
      |FROM g ORDER BY cohort_week, week_age""".stripMargin

  /** RFM segmentation — the classic customer-value grid: per user,
    * Recency (last event), Frequency (event count), Monetary (exact
    * purchase cents), each cut into terciles by rank (`ntile(3)` with
    * user_id tie-breaks — total order, engine-identical), then the
    * segment census. The terciles window over the USER-level aggregate
    * (one row per user — already reduced by the single user-keyed
    * shuffle), not raw events; at extreme user counts the
    * rank-based cut swaps for sampled boundaries (`op_quantiles` is
    * the sketch for that), which changes the cut, not the shape.
    * Output: one row per (r, f, m) cell with its population and
    * aggregate money — the marketing activation table. */
  def evRfm(spark: SparkSession, sfDir: String): DataFrame = {
    val users = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)"))), lit(0L)).as("cents"))
    def cut(c: String, name: String) =
      ntile(3).over(Window.orderBy(col(c), col("user_id"))).cast("long").as(name)
    users
      .select(col("user_id"), col("n_events"), col("cents"),
        cut("last_us", "r"), cut("n_events", "f"), cut("cents", "m"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("cents"),
        sum("n_events").as("n_events"))
      .orderBy("r", "f", "m")
  }

  private val evRfmSql: String =
    """WITH u AS (
      |  SELECT user_id, max(epoch_us(ts)) AS last_us, count(*)::BIGINT AS n_events,
      |    coalesce(sum(CASE WHEN event_type = 'purchase'
      |      THEN round(value * 100)::BIGINT END), 0)::BIGINT AS cents
      |  FROM events GROUP BY 1),
      |cuts AS (
      |  SELECT user_id, n_events, cents,
      |    ntile(3) OVER (ORDER BY last_us, user_id)::BIGINT AS r,
      |    ntile(3) OVER (ORDER BY n_events, user_id)::BIGINT AS f,
      |    ntile(3) OVER (ORDER BY cents, user_id)::BIGINT AS m
      |  FROM u)
      |SELECT r, f, m, count(*)::BIGINT AS n_users, sum(cents)::BIGINT AS cents,
      |  sum(n_events)::BIGINT AS n_events
      |FROM cuts GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin

  /** SCD Type-2 dimension build: customer order-priority history derived
    * from the orders change stream. A history row opens at the first
    * order whose priority differs from the previous order's
    * (lag-detected change point) and closes at the next change point's
    * open time (lead), NULL effective_to marking the current row. Ties
    * on o_orderdate are broken by o_orderkey in BOTH windows, so the
    * history is deterministic. */
  def opScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val byTime = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev_priority", lag(col("o_orderpriority"), 1).over(byTime))
      .filter(col("prev_priority").isNull || col("prev_priority") =!= col("o_orderpriority"))
    val byOpen = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    changes
      .withColumn("effective_to", lead(col("o_orderdate"), 1).over(byOpen))
      .select(col("o_custkey").as("custkey"), col("o_orderpriority").as("priority"),
        col("o_orderdate").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.cast("long").as("is_current"))
      .orderBy(col("custkey"), col("effective_from"), col("priority"))
  }

  private val opScd2Sql: String =
    """WITH chg AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev_priority
      |  FROM orders),
      |hist AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS effective_to
      |  FROM chg WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority)
      |SELECT o_custkey AS custkey, o_orderpriority AS priority,
      |  o_orderdate AS effective_from, effective_to,
      |  (effective_to IS NULL)::BIGINT AS is_current
      |FROM hist ORDER BY custkey, effective_from, priority""".stripMargin

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent PRIOR non-purchase event (its type and time); NULLs
    * mean an unattributed/organic purchase. One window pass — the
    * ignore-nulls last_value over a (ts, event_id)-ordered frame ending
    * one row before current — so the whole op is one exchange on
    * user_id and one in-partition sort, identical in both engines. */
  def evAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nonPurchaseTs = when(col("event_type") =!= "purchase", col("ts"))
    val nonPurchaseType = when(col("event_type") =!= "purchase", col("event_type"))
    Tables.events(spark, sfDir)
      .withColumn("attributed_ts", last(nonPurchaseTs, ignoreNulls = true).over(w))
      .withColumn("attributed_type", last(nonPurchaseType, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "attributed_type", "attributed_ts")
      .orderBy("event_id")
  }

  private val evAttributionSql: String =
    """SELECT event_id, user_id, ts, attributed_type, attributed_ts FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
      |      OVER w AS attributed_ts,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER w AS attributed_type
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) t
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** First-order MARKOV TRANSITION MATRIX over per-user event
    * sequences: P(next = b | current = a) estimated from consecutive
    * event pairs (lead over the (ts, event_id)-ordered per-user
    * stream). Transition counts are exact integers; each probability
    * is ONE division by the exact per-source total. The behavioral
    * model funnel/retention queries summarize — emitted here as the
    * full 5×5-ish matrix, ordered. One window pass + one (a, b)
    * aggregation. */
  def evMarkov(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("cur").agg(sum(col("n")).as("n_cur"))
    pairs.join(totals, "cur")
      .withColumn("p", col("n").cast("double") / col("n_cur"))
      .select("cur", "nxt", "n", "n_cur", "p")
      .orderBy("cur", "nxt")
  }

  private val evMarkovSql: String =
    """WITH seq AS (
      |  SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |pairs AS (
      |  SELECT cur, nxt, count(*)::BIGINT AS n FROM seq
      |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT cur, sum(n)::BIGINT AS n_cur FROM pairs GROUP BY 1)
      |SELECT pairs.cur, nxt, n, n_cur, n::DOUBLE / n_cur AS p
      |FROM pairs JOIN tot ON tot.cur = pairs.cur
      |ORDER BY pairs.cur, nxt""".stripMargin

  /** POINT-IN-TIME (temporal) join: each event is enriched with the
    * customer attribute that was EFFECTIVE AT THE EVENT'S TIME,
    * joining the [[opScd2]] type-2 history on the key plus the
    * validity interval (effective_from ≤ ts < effective_to, open
    * range for the current row) — the as-of dimension lookup every
    * feature-store/backtest pipeline needs, and the join SCD2
    * histories exist to serve. `user_id` aligns with `c_custkey` in
    * the fixture (as in the stream-enrich op).
    *
    * Scale: an EQUI-join on the dimension key with the interval as a
    * residual filter — never a θ-join; history rows per key are few
    * (change points), so the per-key fan-out is bounded. */
  def opPitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = opScd2(spark, sfDir)
      .select(col("custkey"), col("priority"),
        col("effective_from"), col("effective_to"))
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(hist, col("user_id") === col("custkey") &&
        col("effective_from") <= col("ts") &&
        (col("effective_to").isNull || col("ts") < col("effective_to")))
      .select(col("event_id"), col("user_id"), col("ts"), col("priority").as("priority_at_ts"))
      .orderBy("event_id")
  }

  private val opPitJoinSql: String =
    """WITH chg AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev_priority
      |  FROM orders),
      |hist AS (
      |  SELECT o_custkey AS custkey, o_orderpriority AS priority,
      |    o_orderdate AS effective_from,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS effective_to
      |  FROM chg WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority)
      |SELECT event_id, user_id, ts, priority AS priority_at_ts
      |FROM events e JOIN hist h ON e.user_id = h.custkey
      |  AND h.effective_from <= e.ts
      |  AND (h.effective_to IS NULL OR e.ts < h.effective_to)
      |ORDER BY event_id""".stripMargin

  /** PATH MINING: the 20 most common 3-step event-type sequences
    * across user streams (two leads over the per-user (ts, event_id)
    * order, then one count) — the "what do users actually do"
    * companion to [[evMarkov]]'s one-step matrix. Exact counts,
    * deterministic tiebreaks, one window pass + one aggregation. */
  def evPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("s2").as("step2"), col("s3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  private val evPathsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS step1,
      |    lead(event_type, 1) OVER w AS step2,
      |    lead(event_type, 2) OVER w AS step3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT step1, step2, step3, count(*)::BIGINT AS n
      |FROM seq WHERE step3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin

  /** TIME-WEIGHTED AVERAGE value per user (TWAP): each observation
    * weighted by how long it was current (seconds to the next event;
    * the last observation carries no weight — standard left-closed
    * TWAP). All accumulation is exact BIGINT (cent-value × duration
    * seconds); the single final division happens on identical
    * integers in both engines. One window pass + one aggregation. */
  def opTwap(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      // whole seconds via exact µs difference + floor division — NOT
      // unix_timestamp (second-floor) vs DuckDB epoch()::BIGINT
      // (round-half-even): the two disagree by ±1 on sub-second stamps
      .withColumn("dt", expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000000"))
      .withColumn("vc", round(col("value") * 100).cast("long"))
      .groupBy("user_id")
      .agg(sum(col("vc") * col("dt")).as("wsum"), sum(col("dt")).as("tsum"),
        count(lit(1)).as("n_obs"))
      .withColumn("twap", col("wsum").cast("double") / (col("tsum") * lit(100L)))
      .select("user_id", "n_obs", "tsum", "twap")
      .orderBy("user_id")
  }

  private val opTwapSql: String =
    """WITH seq AS (
      |  SELECT user_id, value, ts,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      |  FROM events),
      |d AS (
      |  SELECT user_id,
      |    (epoch_us(next_ts) - epoch_us(ts)) // 1000000 AS dt,
      |    round(value * 100)::BIGINT AS vc
      |  FROM seq WHERE next_ts IS NOT NULL)
      |SELECT user_id, count(*)::BIGINT AS n_obs, sum(dt)::BIGINT AS tsum,
      |  sum(vc * dt)::BIGINT::DOUBLE / (sum(dt)::BIGINT * 100) AS twap
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin

  /** BITEMPORAL point-in-time lookup — the two-axis generalization of
    * [[opPitJoin]]: each dimension version carries VALID time
    * (effective_from, from the order date driving the change) AND
    * TRANSACTION time (recorded_at — when the warehouse learned of it;
    * here a deterministic per-version ingest lag of `o_orderkey % 7`
    * days, the late-arriving-data shape). The query answers "what
    * priority was VALID at V, AS KNOWN at T" per customer and sets
    * `revised` where later-arriving knowledge changed that answer —
    * the audit/backtest primitive (reproduce yesterday's report
    * exactly, even after restatements) that a valid-time-only SCD2
    * cannot express.
    *
    * Scale: the version relation is one exchange on custkey (the same
    * lag-window build as [[opScd2]]); each knowledge view is a
    * row_number pick over that SAME partitioning (no new shuffle), and
    * the final compare is a custkey equi-join of two per-customer
    * single-row relations. */
  def opBitemporal(spark: SparkSession, sfDir: String): DataFrame = {
    val validAt = "TIMESTAMP '1995-06-01 00:00:00'"
    val knownAt = "TIMESTAMP '1995-06-15 00:00:00'"
    val byTime = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val versions = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev_priority", lag(col("o_orderpriority"), 1).over(byTime))
      .filter(col("prev_priority").isNull || col("prev_priority") =!= col("o_orderpriority"))
      .select(col("o_custkey").as("custkey"), col("o_orderpriority").as("priority"),
        col("o_orderdate").as("effective_from"), col("o_orderkey").as("version_key"),
        expr("timestampadd(DAY, cast(o_orderkey % 7 as int), o_orderdate)").as("recorded_at"))
    def pick(df: DataFrame, tag: String): DataFrame = {
      val w = Window.partitionBy("custkey")
        .orderBy(col("effective_from").desc, col("version_key").desc)
      df.filter(expr(s"effective_from <= $validAt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("custkey"), col("priority").as(s"priority_$tag"),
          col("effective_from").as(s"from_$tag"))
    }
    val asKnown = pick(versions.filter(expr(s"recorded_at <= $knownAt")), "known")
    val latest = pick(versions, "latest")
    asKnown.join(latest, "custkey")
      .withColumn("revised", (col("priority_known") =!= col("priority_latest")).cast("long"))
      .orderBy("custkey")
  }

  private val opBitemporalSql: String =
    """WITH chg AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev_priority
      |  FROM orders),
      |v AS (
      |  SELECT o_custkey AS custkey, o_orderpriority AS priority,
      |    o_orderdate AS effective_from, o_orderkey AS version_key,
      |    o_orderdate + ((o_orderkey % 7)::INT * INTERVAL 1 DAY) AS recorded_at
      |  FROM chg WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority),
      |known AS (
      |  SELECT custkey, priority AS priority_known, effective_from AS from_known
      |  FROM (SELECT *, row_number() OVER (PARTITION BY custkey
      |          ORDER BY effective_from DESC, version_key DESC) AS rn
      |        FROM v WHERE effective_from <= TIMESTAMP '1995-06-01 00:00:00'
      |          AND recorded_at <= TIMESTAMP '1995-06-15 00:00:00') t
      |  WHERE rn = 1),
      |latest AS (
      |  SELECT custkey, priority AS priority_latest, effective_from AS from_latest
      |  FROM (SELECT *, row_number() OVER (PARTITION BY custkey
      |          ORDER BY effective_from DESC, version_key DESC) AS rn
      |        FROM v WHERE effective_from <= TIMESTAMP '1995-06-01 00:00:00') t
      |  WHERE rn = 1)
      |SELECT known.custkey, priority_known, from_known, priority_latest, from_latest,
      |  (priority_known <> priority_latest)::BIGINT AS revised
      |FROM known JOIN latest ON known.custkey = latest.custkey
      |ORDER BY known.custkey""".stripMargin

  /** INCREMENTAL SCD2 maintenance — the nightly dimension job: the
    * history BEFORE the cutoff is the already-built SCD2; only the
    * post-cutoff order batch (the delta) is processed against it, and
    * the result must equal [[opScd2]]'s full rebuild — which is exactly
    * what the oracle asserts (same SQL as op_scd2, so incremental ≡
    * rebuild is the verified property, not a claim).
    *
    * The incremental contract that matters at 100 TB: CLOSED history
    * rows pass through untouched (no window visits them), the delta's
    * change detection needs only the OPEN slice of the dimension (one
    * row per entity — the last old order's priority IS the open
    * version's priority, since any later differing order would have
    * opened a new version), and every stage keys on custkey, so
    * Catalyst reuses one hash partitioning across the join, the two
    * windows, and the chain-closing pass. Work is O(delta + entities),
    * not O(history). */
  /** SCD2 version rows (custkey, priority, effective_from, version_key)
    * from an order batch — the change-detection core shared by
    * [[opScd2Incr]] and [[graft.streaming.Pipeline]]'s Delta-backed
    * dimension maintenance. */
  private[graft] def scd2Versions(df: DataFrame): DataFrame = {
    val byTime = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    df.select(col("o_custkey"), col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev_priority", lag(col("o_orderpriority"), 1).over(byTime))
      .filter(col("prev_priority").isNull || col("prev_priority") =!= col("o_orderpriority"))
      .select(col("o_custkey").as("custkey"), col("o_orderpriority").as("priority"),
        col("o_orderdate").as("effective_from"), col("o_orderkey").as("version_key"))
  }

  /** New-version rows a delta order batch adds against the open slice
    * `prev0` (custkey → current priority) — shared with the Delta
    * pipeline twin. */
  private[graft] def scd2DeltaVersions(delta: DataFrame, prev0: DataFrame): DataFrame = {
    val byVer = Window.partitionBy("custkey").orderBy(col("effective_from"), col("version_key"))
    delta.join(prev0, Seq("custkey"), "left_outer")
      .withColumn("prev", coalesce(lag(col("priority"), 1).over(byVer), col("prev0")))
      .filter(col("prev").isNull || col("prev") =!= col("priority"))
      .select("custkey", "priority", "effective_from", "version_key")
  }

  def opScd2Incr(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = "TIMESTAMP '1996-01-01 00:00:00'"
    val orders = Tables.orders(spark, sfDir)
    val byVer = Window.partitionBy("custkey").orderBy(col("effective_from"), col("version_key"))
    val base = scd2Versions(orders.filter(expr(s"o_orderdate < $cutoff")))
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVer))
    val baseClosed = base.filter(col("effective_to").isNotNull)
    val baseOpen = base.filter(col("effective_to").isNull)
      .select("custkey", "priority", "effective_from", "version_key")
    // Delta change detection: previous priority = prior delta row's, or
    // (for the first delta row per entity) the open version's.
    val delta = orders.filter(expr(s"o_orderdate >= $cutoff"))
      .select(col("o_custkey").as("custkey"), col("o_orderpriority").as("priority"),
        col("o_orderdate").as("effective_from"), col("o_orderkey").as("version_key"))
    val prev0 = baseOpen.select(col("custkey"), col("priority").as("prev0"))
    val newVers = scd2DeltaVersions(delta, prev0)
    // Chain-close the open row against the new versions; closed rows
    // union through untouched.
    val chained = baseOpen.unionByName(newVers)
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVer))
    baseClosed.unionByName(chained)
      .select(col("custkey"), col("priority"), col("effective_from"), col("effective_to"),
        col("effective_to").isNull.cast("long").as("is_current"))
      .orderBy(col("custkey"), col("effective_from"), col("priority"))
  }

  /** KAPLAN–MEIER SURVIVAL CURVE for time-to-conversion — the censoring-
    * correct generalization of [[graft.operators.Events]]'
    * time-to-convert summary: entry = first view, event = first
    * subsequent purchase, administratively CENSORED at a 3-day horizon
    * (every fixture viewer eventually converts, so the horizon is what
    * makes censoring real — exactly how production analyses bound an
    * open-ended observation window). S(t) = Π_{u≤t} (1 − d_u/n_u) with
    * censored-at-t users still at risk at t (the right-continuous KM
    * convention); reported at 5 checkpoints with at-risk and
    * cumulative-event counts.
    *
    * Exactness: d/n are exact integers from one user-level pass; each
    * factor is ONE division; the product folds over a
    * DURATION-SORTED collected array (the order-pinned float-fold
    * device of ml_embed_drift — a plain product aggregate would be
    * shuffle-order-dependent). Scale: one shuffle on user_id, then
    * everything lives on the per-duration relation, bounded by horizon
    * MINUTES (≤ 4320 rows) — not by users; the checkpoint cross join
    * is a 5-row broadcast. */
  def evSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    val H = 4320L // censoring horizon, minutes
    val ev = Tables.events(spark, sfDir)
    val entry = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(entry, "user_id").filter(col("ts") > col("t0"))
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val users = entry.join(conv, Seq("user_id"), "left_outer")
      .withColumn("raw_min",
        expr("(unix_micros(t1) - unix_micros(t0)) div 60000000"))
      .withColumn("dur",
        when(col("raw_min").isNull || col("raw_min") >= H, lit(H)).otherwise(col("raw_min")))
      .withColumn("evt",
        when(col("raw_min").isNotNull && col("raw_min") < H, 1L).otherwise(0L))
    val perDur = users.groupBy("dur")
      .agg(sum(col("evt")).as("d"), count(lit(1)).as("n_all"))
    val below = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val grid = perDur
      .withColumn("n_total", sum(col("n_all")).over(all))
      .withColumn("n_risk", col("n_total") - coalesce(sum(col("n_all")).over(below), lit(0L)))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n_risk"))
    val cp = spark.range(0, 5).select(
      expr("element_at(array(60L, 360L, 1440L, 2880L, 4320L), cast(id as int) + 1)").as("t_min"))
    // CHECKPOINT-COMPLETE: a checkpoint before the first grid point must
    // still report (S=1.0, zero events, full risk set), so the grid
    // aggregation LEFT-joins back onto the checkpoint dim (a smaller
    // fixture would otherwise silently drop early checkpoints).
    val cpAgg = grid.crossJoin(broadcast(cp)).filter(col("dur") <= col("t_min"))
      .groupBy("t_min")
      .agg(
        sum(col("d")).as("ev_sum"),
        sum(col("n_all")).as("gone_sum"),
        expr("""aggregate(
          |  transform(sort_array(collect_list(struct(dur, factor))), s -> s.factor),
          |  cast(1.0 as double), (a, f) -> a * f)""".stripMargin).as("surv"))
    val total = users.agg(count(lit(1)).as("n_users"))
    cp.crossJoin(broadcast(total))
      .join(cpAgg, Seq("t_min"), "left_outer")
      .select(col("t_min"), col("n_users"),
        coalesce(col("ev_sum"), lit(0L)).as("cum_events"),
        (col("n_users") - coalesce(col("gone_sum"), lit(0L))).as("n_at_risk_after"),
        coalesce(col("surv"), lit(1.0)).as("survival"))
      .orderBy("t_min")
  }

  private val evSurvivalSql: String =
    """WITH entry AS (
      |  SELECT user_id, min(ts) AS t0 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |conv AS (
      |  SELECT e.user_id, min(e.ts) AS t1
      |  FROM events e JOIN entry ON entry.user_id = e.user_id AND e.ts > entry.t0
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |users AS (
      |  SELECT entry.user_id,
      |    (epoch_us(t1) - epoch_us(t0)) // 60000000 AS raw_min,
      |    CASE WHEN t1 IS NULL OR (epoch_us(t1) - epoch_us(t0)) // 60000000 >= 4320
      |         THEN 4320 ELSE (epoch_us(t1) - epoch_us(t0)) // 60000000 END AS dur,
      |    CASE WHEN t1 IS NOT NULL AND (epoch_us(t1) - epoch_us(t0)) // 60000000 < 4320
      |         THEN 1 ELSE 0 END AS evt
      |  FROM entry LEFT JOIN conv ON conv.user_id = entry.user_id),
      |per AS (
      |  SELECT dur, sum(evt)::BIGINT AS d, count(*)::BIGINT AS n_all FROM users GROUP BY 1),
      |grid AS (
      |  SELECT dur, d, n_all,
      |    sum(n_all) OVER ()::BIGINT AS n_total,
      |    (sum(n_all) OVER ()
      |      - coalesce(sum(n_all) OVER (ORDER BY dur
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
      |  FROM per),
      |f AS (SELECT dur, d, n_all, n_total,
      |        1.0::DOUBLE - d::DOUBLE / n_risk AS factor FROM grid),
      |cp AS (SELECT unnest([60, 360, 1440, 2880, 4320]) AS t_min),
      |agg AS (
      |  SELECT t_min, sum(d)::BIGINT AS ev_sum, sum(n_all)::BIGINT AS gone_sum,
      |    list_reduce(
      |      list_transform(list_sort(list({'dur': dur, 'factor': factor})),
      |        s -> s.factor),
      |      (a, x) -> a * x) AS surv
      |  FROM f CROSS JOIN cp WHERE dur <= t_min
      |  GROUP BY t_min),
      |tot AS (SELECT count(*)::BIGINT AS n_users FROM users)
      |SELECT t_min::BIGINT AS t_min, n_users,
      |  coalesce(ev_sum, 0)::BIGINT AS cum_events,
      |  (n_users - coalesce(gone_sum, 0))::BIGINT AS n_at_risk_after,
      |  coalesce(surv, 1.0::DOUBLE) AS survival
      |FROM cp CROSS JOIN tot LEFT JOIN agg USING (t_min)
      |ORDER BY t_min""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_survival" -> (evSurvival _),
    "op_scd2_incr" -> (opScd2Incr _),
    "op_bitemporal" -> (opBitemporal _),
    "ev_paths" -> (evPaths _),
    "op_twap" -> (opTwap _),
    "op_pit_join" -> (opPitJoin _),
    "ev_markov" -> (evMarkov _),
    "ev_funnel" -> (evFunnel _),
    "ev_funnel_windowed" -> (evFunnelWindowed _),
    "ev_retention" -> (evRetention _),
    "ev_cohort_ltv" -> (evCohortLtv _),
    "ev_rfm" -> (evRfm _),
    "ev_attribution" -> (evAttribution _),
    "op_scd2" -> (opScd2 _))

  val oracles: Map[String, String] = Map(
    // incremental maintenance must equal the full rebuild — same oracle
    // as op_scd2 by design
    "op_scd2_incr" -> opScd2Sql,
    "ev_survival" -> evSurvivalSql,
    "op_bitemporal" -> opBitemporalSql,
    "ev_paths" -> evPathsSql,
    "op_twap" -> opTwapSql,
    "op_pit_join" -> opPitJoinSql,
    "ev_markov" -> evMarkovSql,
    "ev_funnel" -> evFunnelSql,
    "ev_funnel_windowed" -> evFunnelWindowedSql,
    "ev_retention" -> evRetentionSql,
    "ev_cohort_ltv" -> evCohortLtvSql,
    "ev_rfm" -> evRfmSql,
    "ev_attribution" -> evAttributionSql,
    "op_scd2" -> opScd2Sql)
}

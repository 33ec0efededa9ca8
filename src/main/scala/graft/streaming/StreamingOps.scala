package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.functions.Exact
import graft.operators.Events
import graft.sources.Tables

/** Structured Streaming twins of the event-window operators (SURVEY §2.9
  * T6): the SAME aggregation transforms as the batch forms
  * ([[graft.operators.Events.tumblingAgg]] / `slidingAgg` — shared code,
  * not copies) executed as streaming queries over the file source, so
  * the batch DuckDB oracle verifies the streaming execution path too.
  *
  * The collection sink here is the in-memory table sink — a TEST sink:
  * it gives the driver a queryable result to hand back as a DataFrame,
  * which is what the Verify/Bench contract needs. A production deployment
  * replaces ONLY the sink (parquet/Kafka, as [[Ingest]] does for the
  * ingestion path); the source, transforms, trigger, and state handling
  * are exactly what would run on a cluster.
  *
  * Output mode: `complete` — these are pure aggregations whose full
  * result is re-emitted per micro-batch; with `Trigger.AvailableNow` the
  * final emission is the complete answer. Session windows use the same
  * mode: with no watermark, no state is ever dropped, so the final
  * result equals the batch computation (late data handling via
  * `withWatermark` + append is exercised in the ScalaTest suite, where
  * multi-batch arrival order is controlled).
  */
object StreamingOps {

  /** State-store partition count for the fixture drains. A stateful
    * streaming operator creates (and commits, per micro-batch) one
    * state-store instance PER shuffle partition — a stream-stream join
    * creates four. The fixture's state is a few MB, so 32 partitions
    * are pure fixed overhead: measured on op_stream_join at sf0.1,
    * 8 partitions cut the drain ~2× with byte-identical output. This
    * is the state-volume analog of every other corpus-derived knob —
    * a 100 TB deployment sizes partitions to state volume / ~100 MB
    * per store and sets the property (or leaves the cluster default);
    * the semantics never depend on it. */
  private val StreamPartitions =
    sys.props.get("graft.stream.partitions").map(_.toInt).getOrElse(8)

  /** Run `body` (which must START its streaming query inside — the
    * partition count is captured into the query's offset log at start)
    * with [[StreamPartitions]] shuffle partitions, restoring after.
    *
    * The conf key is session-global and Spark offers no per-query
    * override (state-store count is fixed from this key at query start),
    * so the save/set/restore is serialized under a lock: overlapping
    * drains would otherwise race the restore and leak the lowered count
    * into the caller's session. Batch work on the same session during a
    * drain still observes the lowered value — callers that interleave
    * batch jobs with drains should use a sibling session (`newSession`). */
  private val confLock = new Object
  private def withStreamPartitions[T](spark: SparkSession)(body: => T): T =
    confLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, StreamPartitions.toString)
      try body finally spark.conf.set(key, prev)
    }

  /** Run a streaming aggregation to the memory sink with AvailableNow,
    * block until drained, and return the collected table. */
  private def runToMemory(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    spark.catalog.dropTempView(name) // rerunnable: drop a previous run's sink table
    withStreamPartitions(spark) {
      val q = agg.writeStream
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }

  /** Streaming tumbling 1-h windows (same transform as
    * `op_events_tumbling`; same oracle). */
  def opStreamTumbling(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(spark, Events.tumblingAgg(Tables.eventsStream(spark, sfDir)),
      "graft_stream_tumbling")
      .orderBy("window_start", "event_type")

  /** Streaming sliding windows (same transform as `op_events_sliding`). */
  def opStreamSliding(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(spark, Events.slidingAgg(Tables.eventsStream(spark, sfDir)),
      "graft_stream_sliding")
      .orderBy("window_start")

  /** Streaming sessionization via the built-in `session_window` (gap
    * 30 min) — the stateful merging-window operator, run as a stream.
    * Session end = last event + gap, so the oracle is the lag/running-sum
    * batch construction with `session_end + 30 minutes`. */
  def opStreamSession(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(spark,
      Tables.eventsStream(spark, sfDir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end_gap"),
          col("n_events"), col("total_value")),
      "graft_stream_session")
      .orderBy("user_id", "session_start")

  /** STREAMING TOP-K — a continuously-maintained leaderboard: per-user
    * aggregation with the sort + limit INSIDE the streaming query
    * (complete output mode is the one mode Structured Streaming allows
    * sorting in, precisely because the full aggregate is re-emitted per
    * trigger). Each micro-batch re-ranks incrementally-maintained
    * per-user totals and the sink holds exactly the current top-20 —
    * the pattern a live dashboard consumes. State is the user-keyed
    * aggregation (bounded by distinct users); the sort touches the
    * AGGREGATED relation, never raw events. */
  def opStreamTopk(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(spark,
      Tables.eventsStream(spark, sfDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          Exact.exactSum(col("value"), 2).as("total_value"))
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(20),
      "graft_stream_topk")
      .orderBy(col("n_events").desc, col("user_id"))

  private val opStreamTopkSql: String =
    s"""SELECT user_id, count(*)::BIGINT AS n_events,
       |  ${Exact.sqlSum("value", 2)} AS total_value
       |FROM events GROUP BY user_id
       |ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin

  /** Stateful streaming exact dedup: `dropDuplicates` on the content
    * hash over the documents stream — first occurrence wins, state keyed
    * by md5. Append mode: each distinct content emits exactly once.
    * The emitted relation is the distinct CONTENT-KEY SET: WHICH doc_id
    * survives a duplicate group is arrival-order-dependent (inside a
    * micro-batch `dropDuplicates` is a `first()` aggregate over shuffle
    * partitions), so a duplicate-bearing corpus — e.g. the r11 nulls
    * fixture, where 48 NULL-text and 44 empty-text docs collapse to one
    * NULL key and one md5('') key — makes the winner nondeterministic;
    * the key set itself is exact. `md5(NULL)` is NULL in both engines
    * and dedup state treats NULL keys as equal; the ordering pins
    * NULLS LAST (Spark's ASC default is nulls-first, DuckDB's is
    * nulls-last). A long-running deployment bounds the state with
    * `dropDuplicatesWithinWatermark`. */
  def opStreamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val dedup = Tables.documentsStream(spark, sfDir)
      .select(md5(col("text")).as("content_key"))
      .dropDuplicates("content_key")
    spark.catalog.dropTempView("graft_stream_dedup")
    withStreamPartitions(spark) {
      val q = dedup.writeStream
        .format("memory").queryName("graft_stream_dedup")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_dedup").orderBy(asc_nulls_last("content_key"))
  }

  private val opStreamDedupSql: String =
    """SELECT DISTINCT md5(text) AS content_key FROM documents
      |ORDER BY content_key NULLS LAST""".stripMargin

  /** BOUNDED-STATE streaming dedup — `dropDuplicatesWithinWatermark`:
    * the form a 100 TB deployment actually runs. Plain `dropDuplicates`
    * ([[opStreamDedup]]) keys state forever (state grows with every key
    * ever seen — fine for a bounded fixture, fatal for an unbounded
    * stream); the watermarked form expires a key's state once the event
    * time watermark passes it, so state is bounded by keys-per-watermark-
    * window while still guaranteeing no duplicate emission for events
    * within the delay of each other. Emission is immediate (append mode,
    * first-seen wins), so one AvailableNow drain emits exactly the
    * distinct key set — the same relation the batch oracle computes. The
    * re-emission-after-expiry semantics (invisible at one batch) are
    * pinned by the MemoryStream spec. */
  def opStreamDedupWm(spark: SparkSession, sfDir: String): DataFrame = {
    val dedup = Tables.eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    spark.catalog.dropTempView("graft_stream_dedup_wm")
    withStreamPartitions(spark) {
      val q = dedup.writeStream
        .format("memory").queryName("graft_stream_dedup_wm")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_dedup_wm").orderBy("user_id", "event_type")
  }

  private val opStreamDedupWmSql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** NULL-cents sentinel for the primitive `cents` fields of
    * [[UserEvent]] and [[EwmaEvent]] (primitive case-class fields
    * can't hold SQL NULL; the encoder throws — r10 null-jitter gate).
    * CONTRACT: a genuine cents value equal to Long.MinValue
    * (−9.22e16 cents ≈ −9.2e13 dollars) would collide and be treated
    * as missing — unreachable for money columns derived from float64
    * prices (|v| < 2^53 cents), but the assumption lives HERE, once,
    * and every coalesce/comparison site references this name. */
  private val MissingCents = Long.MinValue

  /** Event row for the arbitrary-stateful path (fixed-point cents so the
    * per-group fold is order-insensitive and exact). A MISSING value is
    * carried as the [[MissingCents]] sentinel: it counts toward
    * n_events but adds no cents, the same semantics as SQL's
    * null-skipping sum next to count(*). */
  case class UserEvent(user_id: Long, cents: Long)
  case class UserState(n: Long, nn: Long, cents: Long)
  case class UserTotals(user_id: Long, n_events: Long, total_value: java.lang.Double)

  /** Custom stateful streaming via `flatMapGroupsWithState` — the
    * arbitrary-state API (the shape a custom sessionizer / online
    * feature builder uses; `session_window` above is the declarative
    * special case). State: per-user (count, cent-sum), updated per
    * micro-batch, emitted on every update (append + NoTimeout), so with
    * an AvailableNow drain the final emission per user is the complete
    * aggregate — which is exactly what the DuckDB oracle recomputes.
    * Scale: state is two longs per user in the state store, update is
    * one fold per group per batch — the 100 TB shape for keyed online
    * state. */
  def opStreamStateful(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val updateFn = (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) => {
      var s = state.getOption.getOrElse(UserState(0L, 0L, 0L))
      rows.foreach { r =>
        s = if (r.cents == MissingCents) UserState(s.n + 1, s.nn, s.cents)
        else UserState(s.n + 1, s.nn + 1, s.cents + r.cents)
      }
      state.update(s)
      // all-missing user -> NULL total, exactly SQL's sum() over no
      // non-null inputs (count(*) still counts every event)
      Iterator(UserTotals(userId, s.n,
        if (s.nn > 0) (s.cents / 100.0): java.lang.Double else null))
    }
    val totals = Tables.eventsStream(spark, sfDir)
      .select(col("user_id"),
        coalesce(round(col("value") * 100).cast("long"),
          lit(MissingCents)).as("cents"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateFn)
    spark.catalog.dropTempView("graft_stream_stateful")
    withStreamPartitions(spark) {
      val q = totals.toDF().writeStream
        .format("memory").queryName("graft_stream_stateful")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // one emission per (user, batch): keep each user's final state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    spark.table("graft_stream_stateful")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .orderBy("user_id")
  }

  private val opStreamStatefulSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  sum(round(value * 100)::BIGINT)::BIGINT / 100.0 AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** STREAM-STREAM inner join (StreamingSymmetricHashJoin — the one
    * windowed-join shape the batch ops can't exercise): error events
    * joined to the same user's non-error events in the 15 minutes
    * before the error — the "what led up to this failure" query. Both
    * sides carry event-time watermarks and the join predicate is
    * time-range-bounded, which is exactly what lets Spark expire join
    * state at scale: each side buffers only 15 minutes + watermark
    * delay of per-user events, regardless of stream length. The fixture
    * drains in one AvailableNow batch, so no row is ever beyond the
    * watermark and the batch oracle computes the identical join. */
  def opStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val errors = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
      .withWatermark("err_ts", "1 hour")
    val context = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") =!= "error")
      .select(col("user_id").as("ctx_user"), col("ts").as("ctx_ts"),
        col("event_id").as("ctx_id"), col("event_type").as("ctx_type"))
      .withWatermark("ctx_ts", "1 hour")
    val joined = errors.join(context,
      col("user_id") === col("ctx_user") &&
        col("ctx_ts") >= col("err_ts") - expr("INTERVAL 15 MINUTES") &&
        col("ctx_ts") < col("err_ts"))
      .select(col("user_id"), col("err_id"), col("err_ts"),
        col("ctx_id"), col("ctx_type"), col("ctx_ts"))
    spark.catalog.dropTempView("graft_stream_join")
    withStreamPartitions(spark) {
      val q = joined.writeStream
        .format("memory").queryName("graft_stream_join")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_join").orderBy("user_id", "err_id", "ctx_id")
  }

  private val opStreamJoinSql: String =
    """SELECT e.user_id, e.event_id AS err_id, e.ts AS err_ts,
      |  o.event_id AS ctx_id, o.event_type AS ctx_type, o.ts AS ctx_ts
      |FROM events e JOIN events o
      |  ON o.user_id = e.user_id AND e.event_type = 'error' AND o.event_type <> 'error'
      |  AND o.ts >= e.ts - INTERVAL '15 minutes' AND o.ts < e.ts
      |ORDER BY e.user_id, err_id, ctx_id""".stripMargin

  /** Stream-stream LEFT OUTER interval join — the shape that exercises
    * WATERMARK-DRIVEN NULL EMISSION: an unmatched error event can only
    * emit its null-padded row once the watermark passes the end of its
    * join interval and the engine knows no context event can still
    * arrive. Determinism contract: a streaming outer join can never
    * emit null rows for events inside the final (watermark delay +
    * interval) of a bounded input — that state dies unevicted when the
    * query stops — so results are restricted to a fixed cutoff
    * (2024-01-28; fixture events end 2024-01-30 at every SF, leaving
    * >2 days of margin over the 1 h delay + 15 min interval), below
    * which AvailableNow's closing no-data batch provably flushes every
    * unmatched row. The cutoff is applied AFTER the join, not to the
    * source: a pre-join ts filter would lower the LEFT stream's own
    * watermark to ~cutoff − delay, stranding exactly the last
    * delay + interval of pre-cutoff state (observed: 3 unmatched rows
    * short at sf0.01). The oracle mirrors the cutoff (equivalent on
    * either side of a left join for a left-side predicate). Null-side
    * are coalesced to sentinels so the transport schema stays
    * non-nullable (nullable-int dtype round-trips differ between the
    * two engines' parquet/pandas paths); `matched` carries the outer
    * semantics explicitly. */
  def opStreamOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("2024-01-28 00:00:00").cast("timestamp")
    val errors = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
      .withWatermark("err_ts", "1 hour")
    val context = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") =!= "error")
      .select(col("user_id").as("ctx_user"), col("ts").as("ctx_ts"),
        col("event_id").as("ctx_id"), col("event_type").as("ctx_type"))
      .withWatermark("ctx_ts", "1 hour")
    val joined = errors.join(context,
        col("user_id") === col("ctx_user") &&
          col("ctx_ts") >= col("err_ts") - expr("INTERVAL 15 MINUTES") &&
          col("ctx_ts") < col("err_ts"),
        "left_outer")
      .filter(col("err_ts") < cutoff)
      .select(col("user_id"), col("err_id"), col("err_ts"),
        coalesce(col("ctx_id"), lit(-1L)).as("ctx_id"),
        coalesce(col("ctx_type"), lit("none")).as("ctx_type"),
        col("ctx_ts").isNotNull.as("matched"))
    spark.catalog.dropTempView("graft_stream_outer")
    withStreamPartitions(spark) {
      val q = joined.writeStream
        .format("memory").queryName("graft_stream_outer")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_outer").orderBy("user_id", "err_id", "ctx_id")
  }

  private val opStreamOuterSql: String =
    """SELECT e.user_id, e.event_id AS err_id, e.ts AS err_ts,
      |  coalesce(o.event_id, -1) AS ctx_id,
      |  coalesce(o.event_type, 'none') AS ctx_type,
      |  o.ts IS NOT NULL AS matched
      |FROM (SELECT * FROM events
      |      WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-28 00:00:00') e
      |LEFT JOIN (SELECT * FROM events WHERE event_type <> 'error') o
      |  ON o.user_id = e.user_id
      |  AND o.ts >= e.ts - INTERVAL '15 minutes' AND o.ts < e.ts
      |ORDER BY e.user_id, err_id, ctx_id""".stripMargin

  /** Stream-static enrichment join — the canonical streaming-ETL shape
    * Spark runs by re-broadcasting the static dimension into each
    * micro-batch: streaming events enriched with the customer→nation
    * dimension (equi-join on user_id, explicitly broadcast — the dim is
    * dimension-table-sized by definition), then a per-nation windowless
    * aggregation in complete mode. At 100 TB the fact stream never
    * shuffles for the join; only the 25-row aggregate state lives in
    * the store. */
  def opStreamEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name").as("nation"))
    val agg = Tables.eventsStream(spark, sfDir)
      .join(broadcast(dim), Seq("user_id"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value"), 2).as("total_value"))
    runToMemory(spark, agg, "graft_stream_enrich").orderBy("nation")
  }

  private val opStreamEnrichSql: String =
    s"""SELECT n.n_name AS nation, count(*) AS n_events,
       |  ${Exact.sqlSum("value", 2)} AS total_value
       |FROM events e
       |JOIN customer c ON c.c_custkey = e.user_id
       |JOIN nation n ON n.n_nationkey = c.c_nationkey
       |GROUP BY 1 ORDER BY nation""".stripMargin

  /** Streaming as-of enrichment through the NATIVE as-of operator
    * ([[graft.plans.AsOfJoinExec]]): the purchases stream drains in
    * micro-batches; each batch as-of joins against the static views
    * relation via `foreachBatch` — the standard shape for enriching a
    * stream against a large static (or slowly-republished) table with
    * point-in-time semantics. Because the right side is static and ASOF
    * is per-left-row, the union of per-batch results is EXACTLY the
    * batch answer no matter how the stream is batched — so the same
    * DuckDB `ASOF LEFT JOIN` oracle verifies this entry and
    * `op_asof_native`. At scale each micro-batch pays one shuffle of
    * ITS rows plus the views-side shuffle (or none, if the views table
    * is bucket-laid-out on user_id). */
  def opStreamAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = "target/pipe/stream_asof"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val views = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    val purchases = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    withStreamPartitions(spark) {
      val q = purchases.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.plans.AsOfJoin.join(batch, views,
              Seq("user_id"), Seq("v_user_id"), "ts", "v_ts")
            .select(col("event_id"), col("user_id"), col("ts"), col("v_ts").as("asof_view_ts"))
            .write.mode("append").parquet(dir)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(dir).orderBy("event_id")
  }

  private val opStreamAsofSql: String =
    """SELECT p.event_id, p.user_id, p.ts, v.v_ts AS asof_view_ts
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS v_user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.v_user_id AND v.v_ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  case class AttrEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class AttrLast(ts: java.sql.Timestamp, typ: String)
  case class AttrOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                     attributed_type: Option[String], attributed_ts: Option[java.sql.Timestamp])

  /** Streaming last-touch attribution — the continuous twin of
    * [[graft.operators.Journeys.evAttribution]]: per-user state holds
    * the most recent non-purchase event; each purchase emits its
    * attribution the moment it is processed. Within a micro-batch the
    * group's rows are event-time-sorted (ts, event_id) before the walk
    * — the fixture drains in one AvailableNow batch, so the emission
    * set is EXACTLY the batch window query and the same oracle
    * verifies both. State is one (ts, type) pair per user — constant
    * per key, the cheapest possible stateful footprint at scale. */
  def opStreamAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fn = (userId: Long, rows: Iterator[AttrEvent], state: GroupState[AttrLast]) => {
      val sorted = rows.toSeq.sortWith((a, b) =>
        a.ts.compareTo(b.ts) < 0 || (a.ts.compareTo(b.ts) == 0 && a.event_id < b.event_id))
      var last = state.getOption
      val out = Seq.newBuilder[AttrOut]
      sorted.foreach { e =>
        if (e.event_type == "purchase")
          out += AttrOut(e.event_id, userId, e.ts, last.map(_.typ), last.map(_.ts))
        else last = Some(AttrLast(e.ts, e.event_type))
      }
      last.foreach(state.update)
      out.result().iterator
    }
    val res = Tables.eventsStream(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
    spark.catalog.dropTempView("graft_stream_attr")
    withStreamPartitions(spark) {
      val q = res.toDF().writeStream
        .format("memory").queryName("graft_stream_attr")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_attr").orderBy("event_id")
  }

  case class PatEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class PatState(armed: Boolean, nEvents: Long, nJourneys: Long)
  case class PatOut(user_id: Long, n_events: Long, n_journeys: Long)

  /** STREAMING SEQUENCE-PATTERN MATCHING — the continuous twin of
    * [[graft.operators.Events.evPattern]]: the regex `v[^p]*p` ("a
    * view eventually converts") compiled to its ONE-BIT automaton. A
    * non-overlapping regex scan admits exactly this incremental form:
    * `v` arms the match, the first `p` while armed completes it and
    * re-scans from scratch — so per-user state is (armed, 2 counters),
    * O(1) regardless of history length, where the batch form buffers
    * the whole sequence. That is the difference between a stateful
    * operator that runs forever at 100 TB/day and one whose state
    * store grows without bound. Each batch emits the user's updated
    * running totals; totals are monotonic, so the post-drain readout
    * takes the per-user max (robust to multi-batch drains) and the
    * batch query's oracle (minus the sequence digest, which O(1)
    * state deliberately cannot produce) verifies the counts. */
  def opStreamPattern(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fn = (userId: Long, rows: Iterator[PatEvent], state: GroupState[PatState]) => {
      val sorted = rows.toSeq.sortWith((a, b) =>
        a.ts.compareTo(b.ts) < 0 || (a.ts.compareTo(b.ts) == 0 && a.event_id < b.event_id))
      var st = state.getOption.getOrElse(PatState(armed = false, 0L, 0L))
      sorted.foreach { e =>
        val armed =
          if (e.event_type == "view") true
          else if (e.event_type == "purchase" && st.armed) false
          else st.armed
        val journeys = st.nJourneys +
          (if (e.event_type == "purchase" && st.armed) 1L else 0L)
        st = PatState(armed, st.nEvents + 1, journeys)
      }
      state.update(st)
      Iterator.single(PatOut(userId, st.nEvents, st.nJourneys))
    }
    val res = Tables.eventsStream(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[PatEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
    spark.catalog.dropTempView("graft_stream_pattern")
    withStreamPartitions(spark) {
      val q = res.toDF().writeStream
        .format("memory").queryName("graft_stream_pattern")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_pattern")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_journeys").as("n_journeys"))
      .orderBy(col("n_journeys").desc, col("n_events").desc, col("user_id"))
      .limit(20)
  }

  private val opStreamPatternSql: String =
    """SELECT user_id, count(*)::BIGINT AS n_events,
      |  len(regexp_extract_all(
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
      |    'v[^p]*p'))::BIGINT AS n_journeys
      |FROM events GROUP BY user_id
      |ORDER BY n_journeys DESC, n_events DESC, user_id LIMIT 20""".stripMargin

  /** One (bucket, doc) row of the streaming LSH index; bucket =
    * "band:signature", so a group IS one LSH bucket of one band. */
  case class BandRow(bucket: String, doc_id: Long)
  case class CandPair(doc_a: Long, doc_b: Long)
  case class BucketState(ids: List[Long])

  /** STREAMING NEAR-DUPLICATE DETECTION — an incremental MinHash-LSH
    * index via `flatMapGroupsWithState` keyed by LSH bucket. Each
    * arriving document computes its band signatures STATELESSLY (the
    * same full-range affine minhash family as batch
    * [[graft.operators.Dedup]] (a·h+b mod 2⁶¹−1 — NOT the weak-range
    * Kirsch-Mitzenmacher form the Dedup scaladoc documents as the
    * failed r9 attempt), as an
    * `array_min(transform(...))` projection instead of the batch
    * explode/groupBy — identical values, no shuffle), then probes and
    * extends its buckets' state: per bucket the state is the doc-id
    * list seen so far, and every (prior × new) ∪ (new × new) pair is a
    * candidate BY CONSTRUCTION (bucket-mates share the band signature —
    * the bucket key IS the collision proof). Pair emission is keyed by
    * doc-id order, not arrival order, so the drained candidate set is
    * micro-batch-split-INDEPENDENT; after the drain, the shared
    * [[graft.operators.Dedup.verifyCandidates]] join keeps exact
    * Jaccard ≥ 0.8. The final relation provably equals batch
    * `dd_minhash_lsh` — the query runs against THAT oracle.
    *
    * Scale: state totals one long per (doc, band) distributed across
    * state-store partitions by bucket — the same footprint as the
    * batch band table, arriving incrementally. Per-batch work is
    * new-docs × bucket occupancy, and occupancy is bounded by the
    * [[graft.operators.LshParams]] banding contract (corpus-derived
    * bands × rows), so the pair stream stays linear in arrivals — the
    * online form of the same guarantee the batch plan measures in
    * SCALE.md. A production pipeline verifies candidates per
    * micro-batch inside `foreachBatch` (join against the growing
    * corpus table) instead of once post-drain. */
  /** The incremental candidate pipeline over ANY streaming (doc_id,
    * text) frame — split out so the multi-batch spec can drive it with
    * a MemoryStream and controlled batch boundaries. */
  private[graft] def neardupCandidates(spark: SparkSession,
      docs: DataFrame): org.apache.spark.sql.Dataset[CandPair] = {
    import spark.implicits._
    val (bands, rowsPerBand) = graft.operators.Dedup.banding
    // the SAME full-range affine minhash family as batch
    // Dedup.minhashLshPlan (one md5 per shingle, h_i = (a_i*h + b_i)
    // mod P via exact limb mod-mul) — the streaming twin must bucket
    // identically or the shared oracle diverges. The md5-conv list is
    // projected ONCE per row (`hh`) and every function derives from it
    // by integer arithmetic: the first r9 form re-evaluated the digest
    // inside each function's lambda (3 occurrences × 16 functions = 48
    // digests per shingle) and the close bench caught it as the round's
    // one real regression (op_stream_neardup 3.5 → 12.4 s).
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until rowsPerBand).map { r =>
          expr(s"array_min(transform(hh, h -> " +
            graft.operators.Dedup.mhSparkExpr("h", b * rowsPerBand + r) + "))")
            .cast("string")
        }: _*).as("sig"))
    }
    val bandRows = docs
      .select(col("doc_id"),
        graft.plans.WordShingles.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hh",
        expr(s"transform(sh, x -> ${graft.functions.Text.hash60SparkSql("x")})"))
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(concat(col("bs.band"), lit(":"), col("bs.sig")).as("bucket"),
        col("doc_id"))
      .as[BandRow]
    val fn = (bucket: String, rows: Iterator[BandRow], state: GroupState[BucketState]) => {
      val prior = state.getOption.map(_.ids).getOrElse(Nil)
      val fresh = rows.map(_.doc_id).toArray.distinct.sorted
        .filterNot(prior.contains) // at-least-once redelivery guard
      val out = Seq.newBuilder[CandPair]
      for (n <- fresh; p <- prior)
        out += (if (p < n) CandPair(p, n) else CandPair(n, p))
      for (i <- fresh.indices; j <- (i + 1) until fresh.length)
        out += CandPair(fresh(i), fresh(j))
      if (fresh.nonEmpty) state.update(BucketState(prior ++ fresh))
      out.result().iterator
    }
    bandRows.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }

  def opStreamNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val cand = neardupCandidates(spark, Tables.documentsStream(spark, sfDir))
    spark.catalog.dropTempView("graft_stream_neardup")
    withStreamPartitions(spark) {
      val q = cand.toDF().writeStream
        .format("memory").queryName("graft_stream_neardup")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    graft.operators.Dedup.verifyCandidates(
      spark.table("graft_stream_neardup").distinct(),
      graft.functions.Text.shingled(spark, sfDir))
  }

  case class CusumEvent(event_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class CusumState(curHourUs: Long, cnt: Long, run: Long, minr: Long,
      maxS: Long, peakUs: Long)
  case class CusumOut(event_type: String, max_cusum: Long,
      peak_hour: java.sql.Timestamp)

  /** STREAMING CUSUM DRIFT DETECTION — the continuous twin of
    * [[graft.operators.Events.evCusum]], as the classic ONLINE form
    * S_t = max(0, S_{t-1} + x_t − μ₀) over the per-type hourly counts
    * (μ₀ = 3, the fixture's nominal hourly rate). O(1) state per key:
    * the identity S_t = run_t − min_{j≤t}(run_j, 0) means the state is
    * just (open hour, its count, running sum, running min, running max
    * S, its argmax hour) — six longs, forever, at any event volume;
    * the batch twin needs the whole hourly series. Hours close when a
    * later event's hour arrives (event-time-sorted within the batch);
    * the still-open hour is folded in PROVISIONALLY at emission so a
    * single-drain readout matches the batch oracle exactly, while the
    * durable state stays cross-batch correct. max S is monotone under
    * suffix extension and the earliest-argmax can't be displaced by
    * later data, so the multi-batch readout is the per-key struct max. */
  /** The CUSUM state transition, extracted so the cross-batch contract
    * (splitting the stream at any boundary yields the same final
    * emission) is directly testable with `TestGroupState`. */
  private[graft] val cusumFn:
      (String, Iterator[CusumEvent], GroupState[CusumState]) => Iterator[CusumOut] = {
    val Mu = 3L
    val HourUs = 3600L * 1000000L
    def hourUs(ts: java.sql.Timestamp): Long = {
      val us = math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
      us - math.floorMod(us, HourUs)
    }
    (typ, rows, state) => {
      val sorted = rows.toSeq.sortWith((a, b) =>
        a.ts.compareTo(b.ts) < 0 || (a.ts.compareTo(b.ts) == 0 && a.event_id < b.event_id))
      var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L, 0L, 0L, -1L, Long.MinValue))
      def close(s: CusumState): CusumState = {
        val run = s.run + s.cnt - Mu
        val minr = math.min(s.minr, run)
        val sv = run - minr
        if (sv > s.maxS) CusumState(s.curHourUs, 0L, run, minr, sv, s.curHourUs)
        else CusumState(s.curHourUs, 0L, run, minr, s.maxS, s.peakUs)
      }
      sorted.foreach { e =>
        val h = hourUs(e.ts)
        if (st.curHourUs != Long.MinValue && h != st.curHourUs)
          st = close(st)
        st = st.copy(curHourUs = h, cnt = st.cnt + 1)
      }
      state.update(st)
      // provisional: fold the open hour in for this batch's emission
      val p = if (st.curHourUs == Long.MinValue) st else close(st)
      Iterator.single(CusumOut(typ, p.maxS,
        new java.sql.Timestamp(p.peakUs / 1000L)))
    }
  }

  def opStreamCusum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fn = cusumFn
    val res = Tables.eventsStream(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"))
      .as[CusumEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
    spark.catalog.dropTempView("graft_stream_cusum")
    withStreamPartitions(spark) {
      val q = res.toDF().writeStream
        .format("memory").queryName("graft_stream_cusum")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_cusum")
      .groupBy("event_type")
      .agg(max(struct(col("max_cusum"), col("peak_hour"))).as("m"))
      .select(col("event_type"), col("m.max_cusum").as("max_cusum"),
        col("m.peak_hour").as("peak_hour"))
      .orderBy("event_type")
  }

  private val opStreamCusumSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS x
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, sum(x - 3) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run
      |  FROM hourly),
      |m AS (
      |  SELECT *, least(min(run) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)::BIGINT AS minr
      |  FROM r),
      |s AS (SELECT event_type, h, run - minr AS cusum FROM m),
      |p AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY cusum DESC, h) AS rn
      |  FROM s)
      |SELECT event_type, cusum::BIGINT AS max_cusum, h AS peak_hour
      |FROM p WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** MISSING values ride as the [[MissingCents]] sentinel in `cents` (and
    * nullable boxed `value` for pass-through): a missing event OCCUPIES
    * its lag slot in the ring but contributes neither weight nor value
    * — the exact batch-window semantics (coalesce(lag·w, 0) over a
    * window that still counts the row as a position), so the shared
    * oracle keeps verifying both forms (r10 null-jitter gate). */
  case class EwmaEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      value: java.lang.Double, cents: Long)
  case class EwmaBuf(recent: List[Long])
  case class EwmaOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      value: java.lang.Double, ewma: java.lang.Double)

  /** STREAMING EWMA — the continuous twin of
    * [[graft.operators.Events.opEwma]]'s 10-term dyadic-weight moving
    * average: per-user state is the last 9 cent values (a bounded
    * ring, O(1) per key forever), each arriving event emits its
    * smoothed value immediately. Bit-exactness discipline: the cents
    * are computed by the SAME codegen'd `round(value*100)` expression
    * as the batch form BEFORE entering the typed function (JVM-side
    * re-rounding of doubles is where cross-engine drift creeps in),
    * and the weighted sum folds in the same ascending-lag order with
    * dyadic weights (0.5ⁱ — exact binary), so every emitted double is
    * bit-identical to the batch window query and the SAME oracle
    * verifies both. */
  def opStreamEwma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val weights = (0 until 10).map(i => math.pow(0.5, i))
    val fn = (userId: Long, rows: Iterator[EwmaEvent], state: GroupState[EwmaBuf]) => {
      val sorted = rows.toSeq.sortWith((a, b) =>
        a.ts.compareTo(b.ts) < 0 || (a.ts.compareTo(b.ts) == 0 && a.event_id < b.event_id))
      var recent = state.getOption.map(_.recent).getOrElse(Nil)
      val out = Seq.newBuilder[EwmaOut]
      sorted.foreach { e =>
        val vals = (e.cents :: recent).toIndexedSeq
        var num = 0.0
        var den = 0.0
        weights.zipWithIndex.foreach { case (wt, i) =>
          // mirrors the batch form's coalesce(lag*w, 0.0) ascending
          // fold; sentinel slots (missing values) add nothing
          if (i < vals.length && vals(i) != MissingCents) {
            num += vals(i) * wt
            den += wt
          }
        }
        out += EwmaOut(e.event_id, userId, e.ts, e.value,
          if (den > 0.0) ((num / den) / 100.0): java.lang.Double else null)
        recent = (e.cents :: recent).take(9)
      }
      state.update(EwmaBuf(recent))
      out.result().iterator
    }
    val res = Tables.eventsStream(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        coalesce(round(col("value") * 100).cast("long"),
          lit(MissingCents)).as("cents"))
      .as[EwmaEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
    spark.catalog.dropTempView("graft_stream_ewma")
    withStreamPartitions(spark) {
      val q = res.toDF().writeStream
        .format("memory").queryName("graft_stream_ewma")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("graft_stream_ewma").orderBy("user_id", "ts", "event_id")
  }

  /** STREAMING WINDOWED DISTINCT COUNT — hourly unique users per event
    * type, continuously. Distinct aggregates aren't available inside a
    * streaming aggregation, so this is the canonical two-operator
    * decomposition: a stateful `dropDuplicates` on (type, hour, user)
    * reduces the stream to first-seen rows, then a plain windowed count
    * — the same reduce-to-distinct-first shape as the batch
    * ev_stickiness. Dedup state is bounded by distinct keys per window
    * (the watermarked twin `op_stream_dedup_wm` shows the expiring
    * form); the count aggregate's state is one long per (hour, type). */
  def opStreamDistinctW(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(spark,
      Tables.eventsStream(spark, sfDir)
        .withColumn("hour", date_trunc("hour", col("ts")))
        .select("event_type", "hour", "user_id")
        .dropDuplicates("event_type", "hour", "user_id")
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n_users")),
      "graft_stream_distinct")
      .orderBy("hour", "event_type")

  private val opStreamDistinctWSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(DISTINCT user_id)::BIGINT AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_stream_distinct" -> (opStreamDistinctW _),
    "op_stream_ewma" -> (opStreamEwma _),
    "op_stream_cusum" -> (opStreamCusum _),
    "op_stream_neardup" -> (opStreamNeardup _),
    "op_stream_attribution" -> (opStreamAttribution _),
    "op_stream_pattern" -> (opStreamPattern _),
    "op_stream_topk" -> (opStreamTopk _),
    "op_stream_enrich" -> (opStreamEnrich _),
    "op_stream_asof" -> (opStreamAsof _),
    "op_stream_join" -> (opStreamJoin _),
    "op_stream_outer" -> (opStreamOuter _),
    "op_stream_stateful" -> (opStreamStateful _),
    "op_stream_tumbling" -> (opStreamTumbling _),
    "op_stream_sliding" -> (opStreamSliding _),
    "op_stream_session" -> (opStreamSession _),
    "op_stream_dedup" -> (opStreamDedup _),
    "op_stream_dedup_wm" -> (opStreamDedupWm _))

  val oracles: Map[String, String] = Map(
    "op_stream_distinct" -> opStreamDistinctWSql,
    "op_stream_ewma" -> Events.oracles("op_ewma"),
    "op_stream_cusum" -> opStreamCusumSql,
    "op_stream_neardup" -> graft.operators.Dedup.minhashLshOracle,
    "op_stream_attribution" -> graft.operators.Journeys.oracles("ev_attribution"),
    "op_stream_pattern" -> opStreamPatternSql,
    "op_stream_topk" -> opStreamTopkSql,
    "op_stream_enrich" -> opStreamEnrichSql,
    "op_stream_asof" -> opStreamAsofSql,
    "op_stream_join" -> opStreamJoinSql,
    "op_stream_outer" -> opStreamOuterSql,
    "op_stream_stateful" -> opStreamStatefulSql,
    "op_stream_tumbling" -> Events.oracles("op_events_tumbling"),
    "op_stream_sliding" -> Events.oracles("op_events_sliding"),
    "op_stream_session" -> opStreamSessionSql,
    "op_stream_dedup" -> opStreamDedupSql,
    "op_stream_dedup_wm" -> opStreamDedupWmSql)

  private lazy val opStreamSessionSql: String =
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
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL '30 minutes' AS session_end_gap,
       |  count(*) AS n_events, ${Exact.sqlSum("value", 2)} AS total_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_start""".stripMargin
}

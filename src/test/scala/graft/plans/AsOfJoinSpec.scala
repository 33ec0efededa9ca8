package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Events

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  * exactness against a driver-side brute force, plan shape (the exec is
  * planned, exactly two exchanges, sorts satisfied), tolerance and NULL
  * semantics, and AQE compatibility (the suite session runs with
  * defaults, AQE on).
  */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  /** Brute-force ASOF backward reference: for each left row the max
    * right time <= left time (within tol), null otherwise. */
  private def brute(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long)],
                    tolUs: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (id, k, t) =>
      val cands = right.filter { case (rk, rt) => rk == k && rt <= t &&
        tolUs.forall(tol => t - rt <= tol) }
      id -> (if (cands.isEmpty) None else Some(cands.map(_._2).max))
    }.toMap

  private def eventsBrute(tolUs: Option[Long]): Map[Long, Option[Long]] = {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    brute(
      ev.filter(_._4 == "purchase").map(r => (r._1, r._2, r._3)).toSeq,
      ev.filter(_._4 == "view").map(r => (r._2, r._3)).toSeq,
      tolUs)
  }

  private def resultMap(df: DataFrame): Map[Long, Option[Long]] =
    df.select($"event_id", unix_micros($"asof_view_ts").as("us"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("native as-of join matches driver-side brute force (sf0.001)") {
    assert(resultMap(Events.opAsofNative(spark, sf)) === eventsBrute(None))
  }

  test("tolerance nulls out matches older than the lookback") {
    val tol = 60L * 60 * 1000000
    val got = resultMap(Events.opAsofNativeTol(spark, sf))
    assert(got === eventsBrute(Some(tol)))
    // the bound must actually bite, or the test is vacuous. The fixture
    // is regenerated per round, so the 1h production tolerance may stop
    // excluding anything; derive a tolerance from the fixture's own gap
    // distribution (half the widest matched gap) and re-check with it.
    val unbounded = eventsBrute(None)
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user_id"), $"ts".as("v_ts"))
    val purchaseUs = purchases.select($"event_id", unix_micros($"ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gaps = unbounded.collect { case (id, Some(vUs)) => purchaseUs(id) - vUs }
    assert(gaps.nonEmpty, "fixture has no purchase with an unbounded as-of match")
    val maxGap = gaps.max
    assert(maxGap > 0)
    val bitingTol = maxGap / 2
    val gotBiting = resultMap(
      AsOfJoin.join(purchases, views, Seq("user_id"), Seq("v_user_id"),
          "ts", "v_ts", toleranceUs = Some(bitingTol))
        .select($"event_id", $"user_id", $"ts", $"v_ts".as("asof_view_ts")))
    val wantBiting = eventsBrute(Some(bitingTol))
    assert(gotBiting === wantBiting)
    assert(wantBiting.count { case (k, v) => v.isEmpty && unbounded(k).nonEmpty } > 0)
  }

  test("plan: AsOfJoinExec with exactly two shuffles, left ordering preserved") {
    val df = Events.opAsofNative(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case e: AsOfJoinExec => e }
    assert(execs.size === 1)
    val shufflesBelow = collect(execs.head.asInstanceOf[SparkPlan]) {
      case s: ShuffleExchangeExec => s }
    assert(shufflesBelow.size === 2)
    assert(execs.head.outputOrdering.nonEmpty)
  }

  test("NULL keys and NULL times never match") {
    val left = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 100L), (2L, null, 100L), (3L, 10L, null), (4L, 11L, 100L))
      .toDF("id", "k", "t")
    val right = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (10L, 50L, 7L), (null, 60L, 8L), (10L, null, 9L), (11L, 90L, 6L))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select($"id", $"payload").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // id=1 (k=10,t=100): the null-keyed and null-timed right rows are
    // invisible, so the rt=50 row wins; null left key (id=2) and null
    // left time (id=3) never match; id=4 (k=11) matches rt=90.
    assert(out === Map(1L -> Some(7L), 2L -> None, 3L -> None, 4L -> Some(6L)))
  }

  test("right-side ties and multi-row keys: greatest time wins, every left row emitted once") {
    val left = Seq((1L, 5L, 30L), (2L, 5L, 10L), (3L, 5L, 30L)).toDF("id", "k", "t")
    val right = Seq((5L, 10L, 1L), (5L, 20L, 2L), (5L, 30L, 3L), (5L, 40L, 4L))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select($"id", $"payload").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 3L))
  }

  test("self-join with shared attribute ids: right side re-aliased, greatest t<=t wins") {
    val df = Seq((1L, 5L, 10L), (2L, 5L, 20L)).toDF("id", "k", "t")
    // identical plan on both sides -> outputSet overlap -> the builder
    // must re-alias the right side or the join's output attrs collide
    val rows = AsOfJoin.join(df, df, Seq("k"), Seq("k"), "t", "t")
      .collect().map(r => (0 until 6).map(i => r.getLong(i))).sortBy(_.head)
    assert(rows === Seq(
      Seq(1L, 5L, 10L, 1L, 5L, 10L),  // t=10: greatest right t<=10 is itself
      Seq(2L, 5L, 20L, 2L, 5L, 20L)))
  }

  test("forward and nearest directions match driver-side brute force, incl. exact-time ties") {
    // deliberately includes rt == lt rows (exact matches), duplicate left
    // times, and equidistant back/forward pairs (tie → backward)
    val left = Seq((1L, 5L, 30L), (2L, 5L, 10L), (3L, 5L, 30L), (4L, 6L, 50L),
      (5L, 7L, 40L), (6L, 5L, 100L)).toDF("id", "k", "t")
    val rightRows = Seq((5L, 10L, 1L), (5L, 20L, 2L), (5L, 30L, 3L), (5L, 40L, 4L),
      (6L, 45L, 5L), (6L, 55L, 6L), (7L, 35L, 7L), (7L, 45L, 8L))
    val right = rightRows.toDF("rk", "rt", "payload")
    def brute(dir: String): Map[Long, Option[Long]] =
      Seq((1L, 5L, 30L), (2L, 5L, 10L), (3L, 5L, 30L), (4L, 6L, 50L), (5L, 7L, 40L), (6L, 5L, 100L))
        .map { case (id, k, t) =>
          val back = rightRows.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
          val fwd = rightRows.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
          id -> (dir match {
            case "forward" => fwd.map(_._3)
            case "nearest" =>
              // engine contract: backward consumes rt <= t, forward cursor
              // holds rt > t; ties (equal distance) go backward
              val fwdStrict = rightRows.filter(r => r._1 == k && r._2 > t).sortBy(_._2).headOption
              (back, fwdStrict) match {
                case (Some(b), Some(f)) =>
                  Some(if (t - b._2 <= f._2 - t) b._3 else f._3)
                case (Some(b), None) => Some(b._3)
                case (None, Some(f)) => Some(f._3)
                case _ => None
              }
          })
        }.toMap
    for (dir <- Seq("forward", "nearest")) {
      val got = AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt", direction = dir)
        .select($"id", $"payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got === brute(dir), s"direction=$dir")
    }
    // forward + tolerance: a match farther ahead than tol nulls out
    val gotTol = AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt",
        toleranceUs = Some(5L), direction = "forward")
      .select($"id", $"payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(gotTol === Map(1L -> Some(3L), 2L -> Some(1L), 3L -> Some(3L),
      4L -> Some(6L), 5L -> Some(8L), 6L -> None))
    intercept[IllegalArgumentException](
      AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt", direction = "sideways"))
  }

  test("allowExactMatches=false: strict inequality for backward and forward; nearest refuses") {
    // rows engineered so exact-time matches exist at every left time
    val left = Seq((1L, 5L, 20L), (2L, 5L, 30L), (3L, 5L, 5L)).toDF("id", "k", "t")
    val right = Seq((5L, 10L, 1L), (5L, 20L, 2L), (5L, 30L, 3L), (5L, 40L, 4L))
      .toDF("rk", "rt", "payload")
    def run(dir: String, exact: Boolean): Map[Long, Option[Long]] =
      AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt",
          direction = dir, allowExactMatches = exact)
        .select($"id", $"payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // backward strict: greatest rt < t (the exact-time row is skipped)
    assert(run("backward", exact = false) ===
      Map(1L -> Some(1L), 2L -> Some(2L), 3L -> None))
    // and the exact-time rows still serve LATER lefts as backward cands
    assert(run("backward", exact = true) ===
      Map(1L -> Some(2L), 2L -> Some(3L), 3L -> None))
    // forward strict: smallest rt > t
    assert(run("forward", exact = false) ===
      Map(1L -> Some(3L), 2L -> Some(4L), 3L -> Some(1L)))
    assert(run("forward", exact = true) ===
      Map(1L -> Some(2L), 2L -> Some(3L), 3L -> Some(1L)))
    intercept[IllegalArgumentException](
      AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt",
        direction = "nearest", allowExactMatches = false))
  }

  test("pre-partitioned inputs (subset key / other key / other counts) re-exchange to the exact hash layout") {
    // zipPartitions pairing is only sound under identical hash layouts.
    // ClusteredDistribution would let a child already partitioned on a key
    // SUBSET (or another column, or another count) pass through unshuffled
    // and silently pair rows from different key spaces; the exec's
    // StatefulOpClusteredDistribution must instead force a re-exchange.
    // rt is globally unique so the expected payload is deterministic.
    val leftRows = (1 to 200).map(i => (i.toLong, (i % 7).toLong, (i % 3).toLong, (i * 10).toLong))
    val rightRows = (1 to 300).map(j => ((j % 7).toLong, (j % 3).toLong, j * 10L - 5L, j.toLong))
    val expected = leftRows.map { case (id, k1, k2, t) =>
      val cands = rightRows.filter { case (rk1, rk2, rt, _) => rk1 == k1 && rk2 == k2 && rt <= t }
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._3)._4))
    }.toMap
    val left = leftRows.toDF("id", "k1", "k2", "t")
    val right = rightRows.toDF("rk1", "rk2", "rt", "payload")
    def run(l: DataFrame, r: DataFrame): Map[Long, Option[Long]] =
      AsOfJoin.join(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
        .select($"id", $"payload").collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(run(left, right) === expected, "cold inputs")
    assert(run(left.repartition(3, $"k1"), right) === expected,
      "left pre-partitioned on a key subset")
    assert(run(left.repartition(5, $"t"), right.repartition(7, $"rk1", $"rk2")) === expected,
      "left on a non-key column, right on full keys with another count")
    assert(run(left.repartition(2, $"k1", $"k2"), right.repartition(9, $"rk2", $"rk1")) === expected,
      "both on full keys but mismatched order/counts")
  }

  test("timestamp time columns work; strategy registration is idempotent") {
    val left = Seq((1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val right = Seq((1L, Timestamp.valueOf("2024-01-01 09:00:00"), 42L))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select($"payload").as[Long].collect()
    assert(out.toSeq === Seq(42L))
    // join() calls ensureStrategy each time — the caller-owned-session
    // path must not stack duplicate strategies
    import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
    val n = spark.asInstanceOf[ClassicSession].experimental.extraStrategies
      .count(_ eq AsOfJoinStrategy)
    assert(n <= 1)
  }
}

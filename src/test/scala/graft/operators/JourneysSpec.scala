package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the journey/SCD2/hybrid-retrieval operators —
  * properties the value-equality oracle doesn't state. */
class JourneysSpec extends SparkSpec {

  test("ev_funnel: strict-sequence conversion is monotonically non-increasing") {
    val steps = Journeys.evFunnel(spark, sf).collect().sortBy(_.getAs[Long]("step"))
    assert(steps.length == 3)
    val users = steps.map(_.getAs[Long]("users"))
    assert(users.head > 0, "first funnel step converted nobody — fixture mismatch")
    assert(users.sliding(2).forall { case Array(a, b) => a >= b },
      s"funnel widened downstream: ${users.mkString(" -> ")}")
  }

  test("ev_retention: offset-0 cell equals cohort size; offsets are non-negative") {
    val cells = Journeys.evRetention(spark, sf)
    assert(cells.filter(col("week_offset") < 0).count() == 0)
    // every user is active in their own cohort week by definition of
    // first touch, so the offset-0 diagonal counts the whole cohort
    val diag = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("active_users"))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohortSizes = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    val joined = diag.join(cohortSizes, "cohort_week")
    assert(joined.count() == diag.count())
    assert(joined.filter(col("active_users") =!= col("cohort_size")).count() == 0,
      "offset-0 retention cell must count the full cohort")
  }

  test("ev_survival: S is a proper survival function — in (0,1], nonincreasing, consistent with counts") {
    val rows = Journeys.evSurvival(spark, sf).collect()
    assert(rows.length == 5)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.forall(s => s > 0.0 && s <= 1.0))
    surv.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-15, s"S increased: $a -> $b") }
    // cumulative events never exceed users, at-risk shrinks with t
    val nUsers = rows.map(_.getAs[Long]("n_users")).distinct
    assert(nUsers.length == 1)
    val cum = rows.map(_.getAs[Long]("cum_events"))
    cum.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    assert(cum.last <= nUsers.head)
    val risk = rows.map(_.getAs[Long]("n_at_risk_after"))
    risk.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
  }

  test("op_scd2: one current row per key, ranges chain without gaps or overlaps") {
    val hist = Journeys.opScd2(spark, sf).collect()
      .groupBy(_.getAs[Long]("custkey"))
    hist.foreach { case (ck, rows) =>
      val sorted = rows.sortBy(_.getAs[java.sql.Timestamp]("effective_from").getTime)
      // exactly one open-ended (current) row, and it is the last one
      assert(sorted.count(_.getAs[Long]("is_current") == 1L) == 1, s"custkey=$ck")
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("effective_to")), s"custkey=$ck")
      // each closed row's effective_to is exactly the next row's open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("effective_to") ==
            b.getAs[java.sql.Timestamp]("effective_from"), s"custkey=$ck range gap")
          // consecutive history rows must represent an actual change
          assert(a.getAs[String]("priority") != b.getAs[String]("priority"),
            s"custkey=$ck no-op history row")
        case _ => ()
      }
    }
  }

  test("ann_rrf_hybrid: fused list is bounded, scores decay with rank, both sides contribute") {
    val out = Similarity.annRrfHybrid(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    val rrfs = out.map(_.getAs[Double]("rrf"))
    assert(rrfs.sliding(2).forall { case Array(a, b) => a >= b },
      "output not ordered by fused score")
    // max possible fused score is 2/(60+1); presence on both lists beats
    // a rank-1 single-list doc iff 2/61 > 1/61 — sanity-check the bound
    assert(rrfs.head <= 2.0 / 61.0 + 1e-15)
    // the fixture's fused top-20 should mix signals: at least one doc
    // carries both ranks (doc 0's own embedding guarantees a vec side)
    assert(out.exists(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("vec_rank"))),
      "no document appears in both ranked lists — fusion degenerated")
  }
}

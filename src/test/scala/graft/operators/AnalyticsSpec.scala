package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Invariants of the round-7 Analytics tier that the DuckDB oracle
  * can't express: the bloom pre-filter's containment properties, the
  * bitmap sketch's exactness under repartitioning, and the iterative
  * k-means chain's internal consistency. */
class AnalyticsSpec extends SparkSpec {

  test("op_bloom_join: bloom pre-filter is a superset of the exact semi join (no false negatives)") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloomAgg = ColumnBridge.toColumn(
      new BloomFilterAggregate(ColumnBridge.toExpr(col("o_orderkey")), 100000L)
        .toAggregateExpression())
    val blob = dim.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mc = ColumnBridge.toColumn(BloomFilterMightContain(
      ColumnBridge.toExpr(lit(blob)), ColumnBridge.toExpr(col("l_orderkey"))))
    val li = Tables.lineitem(spark, sf)
    val nAll = li.count()
    val nPre = li.filter(mc).count()
    val nExact = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    // bloom admits every true match (no false negatives) and never
    // exceeds the full table
    assert(nExact <= nPre, s"bloom dropped true matches: exact=$nExact > pre=$nPre")
    assert(nPre <= nAll)
    // and the composed operator equals the exact semi join regardless of
    // the bloom's false-positive rate
    val composed = li.filter(mc)
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(composed === nExact)
  }

  test("op_bitmap_distinct: bitmap counts equal exact distinct under adversarial repartitioning") {
    val base = Tables.events(spark, sf).repartition(7, col("value"))
    val perBucket = base
      .groupBy(col("event_type"), expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
    val viaBitmap = perBucket.groupBy("event_type")
      .agg(sum(expr("bitmap_count(bm)")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBitmap === exact)
  }

  test("op_approx_quantiles: every sketch quantile within 2% relative error of the exact") {
    val approx = Relational.opApproxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (a50, a95, a99)) <- approx) {
      val (e50, e95, e99) = exact(k)
      for (((a, e), tag) <- Seq((a50, e50) -> "p50", (a95, e95) -> "p95", (a99, e99) -> "p99"))
        assert(math.abs(a - e) / e <= 0.02,
          s"$k $tag: approx $a vs exact $e drifts ${math.abs(a - e) / e}")
    }
  }

  test("ml_kmeans_iter: assignments are stable cluster ids and counts cover every vector") {
    val out = Analytics.mlKmeansIter(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === nVecs, "every vector assigned exactly once")
    val cids = out.map(_.getLong(0))
    assert(cids.distinct.length === cids.length)
    assert(cids.forall(c => c >= 0 && c < 8))
  }

  test("ev_growth_accounting: state counts partition the distinct user-days") {
    val userDays = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    val total = Analytics.evGrowthAccounting(spark, sf)
      .agg(sum("n_users")).head().getLong(0)
    assert(total === userDays, "every active user-day classified exactly once")
  }

  test("ml_avg_precision: AP in (0,1], counts partition the corpus, AP above random baseline bound") {
    val r = Analytics.mlAvgPrecision(spark, sf).head()
    val nPos = r.getAs[Long]("n_pos")
    val nNeg = r.getAs[Long]("n_neg")
    val ap = r.getAs[Double]("avg_precision")
    assert(nPos > 0L && nNeg > 0L)
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(nPos + nNeg === total, "every vector scored exactly once")
    assert(ap > 0.0 && ap <= 1.0, s"avg_precision $ap out of (0,1]")
    // the final PR point has precision = prevalence, so the step AP can
    // never fall below prevalence/n_pos (the last positive's term alone)
    val prevalence = nPos.toDouble / total
    assert(ap >= prevalence / nPos - 1e-12, s"AP $ap below the structural floor")
  }

  test("ml_brier: decomposition identity matches the direct per-row Brier mean") {
    import org.apache.spark.sql.functions._
    val r = Analytics.mlBrier(spark, sf).head()
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    val brier = r.getAs[Double]("brier")
    assert(rel >= -1e-12 && res >= -1e-12, s"rel $rel / res $res must be non-negative")
    assert(unc >= 0.0 && unc <= 0.25 + 1e-12, s"uncertainty $unc outside [0, 1/4]")
    assert(math.abs(brier - (rel - res + unc)) < 1e-15)
    // direct computation: mean over rows of (midpoint(bin) - y)^2
    val scored = graft.sources.Tables.embeddings(spark, sf)
      .select((col("label") >= 5).cast("long").as("y"),
        expr("aggregate(transform(embedding, x -> cast(round(cast(x as double) * 1048576) as bigint)), 0L, (a, v) -> a + v)")
          .as("s"))
    val rows = scored.collect().map(x => (x.getLong(0), x.getLong(1)))
    val sMin = rows.map(_._2).min
    val sMax = rows.map(_._2).max
    val direct = rows.map { case (y, s) =>
      val bin = (s - sMin) * 10L / (sMax - sMin + 1L)
      val p = (2.0 * bin + 1.0) / 20.0
      (p - y) * (p - y)
    }.sum / rows.length
    assert(math.abs(brier - direct) < 1e-9,
      s"decomposed Brier $brier != direct binned Brier $direct")
  }

  test("ml_operating_point: cap row respects the FPR budget, youden row maximizes J") {
    val out = Analytics.mlOperatingPoint(spark, sf).collect()
      .map(r => r.getAs[String]("criterion") -> r).toMap
    assert(out.keySet === Set("fpr_cap", "youden"))
    val cap = out("fpr_cap")
    assert(cap.getAs[Double]("fpr") <= 0.05 + 1e-12,
      s"fpr_cap row violates the 5% budget: ${cap.getAs[Double]("fpr")}")
    out.values.foreach { r =>
      assert(r.getAs[Double]("tpr") >= 0.0 && r.getAs[Double]("tpr") <= 1.0)
      assert(r.getAs[Double]("fpr") >= 0.0 && r.getAs[Double]("fpr") <= 1.0)
    }
    val jOf = (r: org.apache.spark.sql.Row) =>
      r.getAs[Double]("tpr") - r.getAs[Double]("fpr")
    assert(jOf(out("youden")) >= jOf(cap) - 1e-12,
      "the Youden point must dominate the capped point on J")
  }
}

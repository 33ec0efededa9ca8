package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Late-data / watermark semantics of session windows under APPEND mode
  * with controlled multi-batch arrival — the part of T6 that AvailableNow
  * over a static fixture cannot exercise (the complete-mode queries in
  * [[StreamingOps]] cover the full-result path). */
class WatermarkSpec extends SparkSpec {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)

  private def t(min: Long): Timestamp = new Timestamp(60L * 1000 * min)

  test("append-mode session_window emits a session only once the watermark passes it") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val sessions = input.toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))
    val name = "wm_sessions"
    spark.catalog.dropTempView(name)
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: two events 5 minutes apart -> one open session
      input.addData(Ev(1L, t(0), 1.0), Ev(1L, t(5), 1.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "session emitted before watermark passed its end")
      // batch 2: an event 2 hours later moves the watermark far past the
      // first session's end (t5 + 30min) -> exactly that session emits
      input.addData(Ev(1L, t(120), 1.0))
      q.processAllAvailable()
      // the no-data batch that finalizes state can trail processAllAvailable
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table(name).count() < 1 && System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      val rows = spark.table(name).collect()
      assert(rows.length == 1, s"expected exactly the closed session, got ${rows.length}")
      assert(rows(0).getLong(0) == 1L)
      assert(rows(0).getTimestamp(1) == t(0))
      assert(rows(0).getLong(2) == 2L, "closed session should contain both early events")
    } finally q.stop()
  }

  case class Doc(content_key: String, ts: Timestamp, doc_id: Long)

  test("dropDuplicatesWithinWatermark: duplicate inside the watermark window is dropped, state expires") {
    import spark.implicits._
    val input = MemoryStream[Doc](spark)
    val dedup = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_key")
    val name = "wm_dedup"
    spark.catalog.dropTempView(name)
    val q = dedup.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: original + an in-window duplicate -> one survivor
      input.addData(Doc("k1", t(0), 1L), Doc("k1", t(5), 2L), Doc("k2", t(5), 3L))
      q.processAllAvailable()
      assert(spark.table(name).select("content_key").distinct().count() == 2)
      assert(spark.table(name).filter(col("content_key") === "k1").count() == 1,
        "in-window duplicate content was not dropped")
      // batch 2 advances the watermark past k1's state expiry (t5+10min)
      // — the watermark moves AFTER a batch, so eviction needs this
      // intermediate batch before re-admittance is observable
      input.addData(Doc("k3", t(60), 4L))
      q.processAllAvailable()
      // batch 3: the same content key far beyond the horizon is
      // legitimately NEW (state expired) — this bounded re-admittance is
      // exactly the contract that keeps dedup state finite at 100 TB,
      // vs op_stream_dedup's unbounded exact variant
      input.addData(Doc("k1", t(120), 5L))
      q.processAllAvailable()
      assert(spark.table(name).filter(col("content_key") === "k1").count() == 2,
        "expired-state re-admittance did not happen — state may be unbounded")
    } finally q.stop()
  }

  case class NdDoc(doc_id: Long, text: String)

  test("streaming near-dup: cross-batch candidates surface via bucket state, pairs are batch-split independent") {
    import spark.implicits._
    // 30-word base text; identical copies are near-dups (Jaccard 1.0)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val input = MemoryStream[NdDoc](spark)
    val cand = StreamingOps.neardupCandidates(spark, input.toDF())
    val name = "nd_cand"
    spark.catalog.dropTempView(name)
    val q = cand.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      def pairs: Set[(Long, Long)] = spark.table(name).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1: two unrelated docs -> no candidates
      input.addData(NdDoc(1L, base), NdDoc(2L, other))
      q.processAllAvailable()
      assert(pairs.isEmpty, "unrelated docs must not collide")
      // batch 2: a near-dup of doc 1 arrives LATER -> the pair must
      // come from bucket STATE (doc 1 is not in this micro-batch)
      input.addData(NdDoc(3L, base))
      q.processAllAvailable()
      assert(pairs == Set((1L, 3L)), s"cross-batch candidate missing: $pairs")
      // batch 3: another copy pairs with BOTH accumulated priors
      input.addData(NdDoc(4L, base))
      q.processAllAvailable()
      assert(pairs == Set((1L, 3L), (1L, 4L), (3L, 4L)))
      // within-batch pairing: two fresh near-dups in ONE batch
      input.addData(NdDoc(10L, other + " tail"), NdDoc(11L, other + " tail"))
      q.processAllAvailable()
      assert(pairs.contains((10L, 11L)), "within-batch candidate missing")
      // redelivery of an already-indexed doc adds nothing new
      input.addData(NdDoc(3L, base))
      q.processAllAvailable()
      assert(pairs.count(p => p._1 == 3L || p._2 == 3L) == 2,
        "redelivered doc re-paired — state guard failed")
    } finally q.stop()
  }

  case class L(k: Long, lts: Timestamp)
  case class R(rk: Long, rts: Timestamp)

  test("stream-stream left outer join: null row emits only after the watermark closes the interval") {
    // The timing contract behind op_stream_outer's cutoff: an unmatched
    // left row CANNOT emit while its join interval is still open — only
    // after a later batch moves the watermark past it. Controlled
    // batches make the two phases observable (the bounded AvailableNow
    // run in StreamingOps only shows the final state).
    import spark.implicits._
    val left = MemoryStream[L](spark)
    val right = MemoryStream[R](spark)
    val joined = left.toDF().withWatermark("lts", "0 seconds")
      .join(right.toDF().withWatermark("rts", "0 seconds"),
        col("k") === col("rk") &&
          col("rts") >= col("lts") - expr("INTERVAL 10 MINUTES") &&
          col("rts") <= col("lts"),
        "left_outer")
    val name = "wm_outer"
    spark.catalog.dropTempView(name)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: a matched pair and an unmatched left row. The match
      // emits immediately; the unmatched row must NOT emit yet — a
      // context event for it could still arrive.
      left.addData(L(1L, t(5)), L(2L, t(6)))
      right.addData(R(1L, t(4)))
      q.processAllAvailable()
      val phase1 = spark.table(name).collect()
      assert(phase1.length == 1 && phase1(0).getLong(0) == 1L,
        s"expected only the matched row in phase 1, got ${phase1.length}")
      // batch 2: watermark jumps far past k=2's interval end -> the
      // engine now KNOWS no match can arrive and emits the null row
      left.addData(L(9L, t(120)))
      right.addData(R(9L, t(119)))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table(name).filter(col("rk").isNull).count() < 1 &&
        System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      val nullRows = spark.table(name).filter(col("rk").isNull).collect()
      assert(nullRows.length == 1 && nullRows(0).getLong(0) == 2L,
        s"unmatched left row did not emit null-padded after watermark passage")
    } finally q.stop()
  }
}

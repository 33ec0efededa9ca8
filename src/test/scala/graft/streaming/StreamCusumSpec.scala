package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

import graft.SparkSpec
import graft.sources.Tables

/** Cross-batch contract of the streaming CUSUM state machine: feeding
  * the same time-ordered events through ANY batch split must land on
  * the same final emission as one batch (the property the single-drain
  * oracle can't see). Driven directly through `TestGroupState` — the
  * public harness Spark ships for exactly this. */
class StreamCusumSpec extends SparkSpec {

  private def events(): Seq[StreamingOps.CusumEvent] = {
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => StreamingOps.CusumEvent(r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .sortBy(e => (e.ts.getTime, e.event_id))
  }

  private def drive(typ: String, batches: Seq[Seq[StreamingOps.CusumEvent]])
      : (Long, Timestamp) = {
    var state = TestGroupState.create[StreamingOps.CusumState](
      org.apache.spark.api.java.Optional.empty[StreamingOps.CusumState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), false)
    var last: StreamingOps.CusumOut = null
    batches.foreach { b =>
      last = StreamingOps.cusumFn(typ, b.iterator, state).next()
      // carry the committed state into the next batch, as the engine does
      state = TestGroupState.create[StreamingOps.CusumState](
        org.apache.spark.api.java.Optional.of(state.get),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, org.apache.spark.api.java.Optional.empty[Long](), false)
    }
    (last.max_cusum, last.peak_hour)
  }

  test("streaming CUSUM: any time-ordered batch split matches the single-batch result") {
    val byType = events().groupBy(_.event_type)
    byType.foreach { case (typ, evs) =>
      val whole = drive(typ, Seq(evs))
      // split at several boundaries, including mid-hour cuts
      Seq(2, 3, 7).foreach { k =>
        val size = math.max(1, evs.length / k)
        val split = evs.grouped(size).toSeq
        assert(drive(typ, split) === whole,
          s"split into ${split.length} batches diverged for $typ")
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PQ index-quality invariants the oracle can't express as exact values
  * to pin forever: the re-rank stage must never make the index WORSE
  * than raw ADC (it re-scores a superset of ADC's top-5 with the true
  * metric), and encodings must be a proper partition of the corpus. */
class PqSpec extends SparkSpec {

  test("exact re-rank recall@5 >= raw ADC recall@5, per probe and in mean") {
    val r = Pq.annPqRecall(spark, sf).select("probe_id", "recall_adc", "recall_rerank").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (adc, rr) = (row.getDouble(1), row.getDouble(2))
      assert(rr >= adc, s"probe ${row.getLong(0)}: rerank $rr < adc $adc")
      assert(adc >= 0.0 && rr <= 1.0)
    }
    val meanRr = r.map(_.getDouble(2)).sum / r.length
    assert(meanRr > 0.0, "re-ranked PQ found no true neighbors at all")
  }

  test("ADC emits exactly top-5 distinct neighbors per probe, self excluded") {
    val adc = Pq.annPqAdc(spark, sf)
    val perProbe = adc.groupBy("probe_id").agg(
      count(lit(1)).as("n"), countDistinct(col("neighbor_id")).as("d"))
    assert(perProbe.filter(col("n") =!= 5 || col("d") =!= 5).count() == 0)
    assert(adc.filter(col("probe_id") === col("neighbor_id")).count() == 0)
  }
}

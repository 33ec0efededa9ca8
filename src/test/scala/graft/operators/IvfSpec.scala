package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** IVF index-quality invariants the oracle can't express: the Lloyd fit
  * must be at least as good an index as the per-label init it replaced
  * (round-2 verdict item 3). */
class IvfSpec extends SparkSpec {

  private def meanRecall(iters: Int): Double = {
    val exact5 = Similarity.annTopkExact(spark, sf).filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id"))
    val ivf5 = Similarity.annIvfAt(spark, sf, iters)
      .select(col("probe_id"), col("neighbor_id"))
    val probes = exact5.select("probe_id").distinct().count().toDouble
    val hits = exact5.join(ivf5, Seq("probe_id", "neighbor_id"), "left_semi").count().toDouble
    hits / (probes * 5.0)
  }

  test("Lloyd-fit IVF recall@5 >= per-label-init IVF recall@5 (both nprobe=2)") {
    val lloyd = meanRecall(3)
    val init = meanRecall(0)
    assert(lloyd >= init, s"Lloyd fit recall $lloyd regressed below per-label init $init")
    assert(lloyd > 0.0, "IVF search returned no true neighbors at all")
  }

  test("IVF assignment is a partition: every vector lands in exactly one cell") {
    val k = 10 // fixture has 10 labels; the fit keeps k cells
    val n = Tables.embeddings(spark, sf).count()
    val asg = Similarity.ivfAssignment(spark, sf, 2)
    // exactly one assignment row per corpus vector, every cell defined
    // and within the trained centroid set — the partition property
    assert(asg.count() == n, "assignment must cover every vector once")
    assert(asg.select("vec_id").distinct().count() == n,
      "a vector appeared in more than one cell")
    assert(asg.filter(col("cell").isNull || col("cell") < 0 || col("cell") >= k)
      .count() == 0, s"cell ids must be non-null and in [0, $k)")
    // and the search output built on it stays well-formed: at most 5
    // ranked rows per probe, neighbors distinct
    val ivf = Similarity.annIvfAt(spark, sf, 2)
    val perProbe = ivf.groupBy("probe_id").agg(
      count(lit(1)).as("n"), countDistinct(col("neighbor_id")).as("d"))
    assert(perProbe.filter(col("n") > 5 || col("n") =!= col("d")).count() == 0)
    assert(ivf.select("probe_id").distinct().count() <= 10)
  }
}

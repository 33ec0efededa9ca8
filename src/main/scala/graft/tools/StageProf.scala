package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage task-distribution profiler for ONE query: runs warm-up +
  * one timed execution and prints every stage of the timed run with
  * its task count, total/max/median task wall, and shuffle-read rows —
  * the facts that separate "the data is skewed onto one key" from
  * "AQE coalesced a CPU-dense exchange onto too few reducers" from
  * "host noise", which plain wall-clock A/Bs (TimeOne) cannot tell
  * apart (SCALE.md round-13: dd_containment's non-monotonic partition
  * response needed exactly this attribution).
  * Usage: StageProf <sfDir> <queryName> */
object StageProf {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Sort-based shuffle writer for EVERY exchange (r14, SCALE.md
      // round-14): the default bypassMergeThreshold=200 routes <=200-
      // partition shuffles through the per-reducer-file writer — one
      // file create per (map task x reducer), which on this host's
      // filesystem dominated the dd_* map stages (dd_containment x100n:
      // 11-30 s bypass vs 2.8-4.7 s sort writer, non-monotonic in the
      // partition count because 183 vs 276 straddled the threshold).
      // The single-spill-file sort writer is also the only writer that
      // exists at real cluster reducer counts.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Corpus.prime(spark, sfDir)
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.operators.Corpus.shufflePartitions(spark, sfDir).toString)
    val fn = graft.SparkEntry.queries(name)
    def run(): Unit = {
      val df = fn(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      // GRAFT_STAGEPROF_PLAN=1: dump the AQE-final executed plan so the
      // stage rows below can be matched to plan operators
      if (sys.env.get("GRAFT_STAGEPROF_PLAN").contains("1"))
        println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
      graft.operators.Scratch.release()
    }
    run() // warm-up: codegen + caches, not profiled
    val tasks = scala.collection.concurrent.TrieMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    val stageNames = scala.collection.concurrent.TrieMap.empty[Int, String]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val rows = Option(t.taskMetrics)
          .map(m => m.shuffleReadMetrics.recordsRead).getOrElse(0L)
        tasks.getOrElseUpdate(t.stageId,
          scala.collection.mutable.ArrayBuffer.empty).synchronized {
          tasks(t.stageId) += ((t.taskInfo.duration, rows))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageNames += s.stageInfo.stageId ->
          s.stageInfo.name.split(" at ").headOption.getOrElse(s.stageInfo.name)
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    println(f"$name wall=$wall%.3f s — stages of the timed run, by total task time:")
    val rows = tasks.toSeq.map { case (sid, ts) =>
      val durs = ts.map(_._1).sorted
      (sid, ts.size, durs.sum, durs.last, durs(durs.size / 2), ts.map(_._2).sum)
    }.sortBy(-_._3)
    println(f"${"stage"}%7s ${"tasks"}%6s ${"sumMs"}%9s ${"maxMs"}%7s ${"p50Ms"}%7s ${"shufRows"}%10s  name")
    rows.foreach { case (sid, n, sum, mx, p50, rr) =>
      println(f"$sid%7d $n%6d $sum%9d $mx%7d $p50%7d $rr%10d  ${stageNames.getOrElse(sid, "?")}")
    }
    spark.stop()
  }
}

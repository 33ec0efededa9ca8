package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print one SparkEntry query's `explain("formatted")` plan — the plan
  * artifact the optimization rounds commit under `plans/rNN/` (the
  * judge reads these instead of running Spark). Session config mirrors
  * Bench/TimeOne so the printed plan is the plan the bench times.
  * Usage: ExplainOne <sfDir> <queryName> [executed]
  *  - default: the pre-execution formatted plan (AdaptiveSparkPlan
  *    isFinalPlan=false) — shows scan pushdowns, join picks, exchanges;
  *  - `executed`: additionally runs the query under the noop sink and
  *    appends the AQE-finalized executed plan. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Corpus.prime(spark, sfDir)
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.operators.Corpus.shufflePartitions(spark, sfDir).toString)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"== $name @ $sfDir — explain(formatted) ==")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    if (args.contains("executed")) {
      df.write.mode("overwrite").format("noop").save()
      println(s"== $name — AQE-finalized executed plan ==")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    graft.operators.Scratch.release()
    spark.stop()
  }
}

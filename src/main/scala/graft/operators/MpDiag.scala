package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the multi-probe LSH candidate volume: prints,
  * per fixture dir, the derived plane count, the single-probe and
  * multi-probe candidate-pair counts over the SAME (first MpTables)
  * tables, and the largest bucket's size — the numbers that separate
  * "algorithmic superlinearity" from "the fixture's true near-dup
  * density grew" when a scale exponent looks hot. */
object MpDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      Corpus.prime(spark, dir)
      val e = Similarity.embWithNorm(spark, dir)
      val multi = Similarity.mpCandidates(e).count()
      val single = (0 until Similarity.MpTables).map { t =>
        val bk = e.select(col("vec_id"),
          expr(Similarity.dedupBucketS(t)).as("bucket"))
        bk.as("a").join(bk.as("b"), Seq("bucket"))
          .filter(col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      }.reduce(_ unionAll _).distinct().count()
      val maxBucket = e.select(col("vec_id"),
        expr(Similarity.dedupBucketS(0)).as("bucket"))
        .groupBy("bucket").count().agg(max("count")).head().getLong(0)
      val n = e.count()
      println(s"""{"dir":"$dir","n":$n,"single":$single,"multi":$multi,"max_bucket":$maxBucket}""")
    }
    spark.stop()
  }
}

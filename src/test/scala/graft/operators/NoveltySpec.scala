package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** Invariants of the first-occurrence n-gram novelty signal that the
  * oracle hash can't state: conservation (every distinct shingle is
  * novel in exactly one document) and the first-document anchor. */
class NoveltySpec extends SparkSpec {

  test("ta_ngram_novelty: first doc fully novel, counts bounded, novelty conserves the vocabulary") {
    val out = TextAnalysis.taNgramNovelty(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nd = r.getAs[Long]("n_distinct")
      val nn = r.getAs[Long]("n_novel")
      val nov = r.getAs[Double]("novelty")
      assert(nn >= 0L && nn <= nd, s"doc ${r.getAs[Long]("doc_id")}: $nn novel of $nd")
      assert(nov >= 0.0 && nov <= 1.0)
    }
    // the earliest doc_id in the shingled relation sees everything first
    val firstDoc = out.map(_.getAs[Long]("doc_id")).min
    val fr = out.find(_.getAs[Long]("doc_id") == firstDoc).get
    assert(fr.getAs[Double]("novelty") === 1.0, "the first document must be fully novel")
    // conservation: each distinct corpus shingle is novel in exactly one doc
    val vocab = Text.shingled(spark, sf)
      .select(explode(col("sh")).as("g")).distinct().count()
    val totalNovel = out.map(_.getAs[Long]("n_novel")).sum
    assert(totalNovel === vocab,
      s"novel counts $totalNovel must sum to the distinct-shingle vocabulary $vocab")
  }
}

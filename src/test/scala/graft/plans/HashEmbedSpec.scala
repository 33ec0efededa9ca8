package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** [[HashEmbed]] bit-exactness vs the composed built-in form it
  * replaced — the contract that keeps the DuckDB oracles (which verify
  * the composed md5 arithmetic) green against the kernel's output. */
class HashEmbedSpec extends SparkSpec {

  import spark.implicits._

  private val B = 16

  test("HashEmbed == the transform/aggregate md5 composition, token for token") {
    val h = graft.functions.Text.hash60SparkSql("concat('rag:', t)")
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
    val mine = docs.select(col("doc_id"),
      HashEmbed.hashEmbed(col("toks"), B, "rag:").as("v"))
    val ref = docs.select(col("doc_id"), expr(
      s"""transform(sequence(0, ${B - 1}), b -> aggregate(
         |  transform(toks, t -> struct(pmod(($h), $B) as b,
         |    if(pmod(($h) div $B, 2) = 0, 1L, -1L) as s)),
         |  0L, (acc, x) -> acc + if(x.b = b, x.s, 0L)))""".stripMargin).as("v"))
    val diff = mine.as("a").join(ref.as("b"), "doc_id")
      .filter(col("a.v") =!= col("b.v"))
    assert(diff.count() == 0, "HashEmbed diverges from the composed md5 form")
    assert(mine.count() > 0)
  }

  test("HashEmbed edge cases: empty array, duplicate tokens accumulate, null array") {
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, Some(Seq("x", "x", "x"))), // bag semantics: same bucket 3x
      (3L, Option.empty[Seq[String]])
    ).toDF("id", "toks")
    val got = df.select(col("id"), HashEmbed.hashEmbed(col("toks"), B, "rag:").as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got(1L).get.forall(_ == 0L))
    // three identical tokens land in one bucket with magnitude 3
    assert(got(2L).get.map(math.abs).sum == 3L)
    assert(got(2L).get.count(_ != 0L) == 1)
    assert(got(3L).isEmpty)
  }

  test("SQL registration: hash_embed callable from spark.sql, equal to Column API") {
    Tables.documents(spark, sf).createOrReplaceTempView("hashembed_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, hash_embed(split(text, ' '), 16, 'rag:') AS v FROM hashembed_docs")
    val viaApi = Tables.documents(spark, sf)
      .select(col("doc_id"),
        HashEmbed.hashEmbed(split(col("text"), " "), B, "rag:").as("v"))
    assert(viaSql.as("a").join(viaApi.as("b"), "doc_id")
      .filter(col("a.v") =!= col("b.v")).count() == 0)
  }
}

package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Custom Catalyst expression/aggregate correctness vs built-in
  * compositions: the codegen'd [[WordShingles]] against the equivalent
  * higher-order-function pipeline, and [[SimhashAgg]] against the 60
  * parallel bit-vote aggregates it replaced. */
class ExprSpec extends SparkSpec {

  test("WordShingles == split/transform/slice composition on the documents fixture") {
    val docs = Tables.documents(spark, sf)
    val mine = docs.select(col("doc_id"),
      WordShingles.wordShingles(col("text"), 3).as("sh"))
    // (sequence(0, n) with n < 0 counts DOWN, so short texts need the
    // explicit empty-array branch)
    val ref = docs.select(col("doc_id"), expr(
      """CASE WHEN size(split(text, ' ')) < 3 THEN slice(split(text, ' '), 1, 0)
        |ELSE array_distinct(transform(
        |  sequence(0, size(split(text, ' ')) - 3),
        |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))) END""".stripMargin).as("sh"))
    val diff = mine.as("a").join(ref.as("b"), "doc_id")
      .filter(col("a.sh") =!= col("b.sh"))
    assert(diff.count() == 0, "WordShingles diverges from built-in composition")
    assert(mine.count() > 0)
  }

  test("WordShingles edge cases: short text, repeated shingles, empty string") {
    import spark.implicits._
    val df = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three"),
      (5L, "a b c a b c a b c"), // repeats collapse via distinct
      (6L, "x y z w")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), WordShingles.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == Nil && got(2L) == Nil && got(3L) == Nil)
    assert(got(4L) == List("one two three"))
    assert(got(5L) == List("a b c", "b c a", "c a b"))
    assert(got(6L) == List("x y z", "y z w"))
  }

  test("SQL surface (spark.sql.extensions): word_shingles + simhash_agg callable from SQL, equal to Column API") {
    // the shared session is built with spark.sql.extensions=GraftExtensions,
    // so both functions resolve in pure SQL with no imperative registration
    Tables.documents(spark, sf).createOrReplaceTempView("exprspec_docs")
    val viaSql = spark.sql(
      s"""SELECT simhash_agg(${graft.functions.Text.hash60SparkSql("s")}) AS sig FROM (
         |  SELECT explode(word_shingles(text, 3)) AS s FROM exprspec_docs WHERE doc_id = 1
         |) t""".stripMargin).first().getLong(0)
    val viaApi = Tables.documents(spark, sf).filter(col("doc_id") === 1)
      .select(explode(WordShingles.wordShingles(col("text"), 3)).as("s"))
      .select(expr(graft.functions.Text.hash60SparkSql("s")).as("h"))
      .agg(SimhashAgg.simhash(col("h")).as("sig"))
      .first().getLong(0)
    assert(viaSql == viaApi, "SQL-registered functions diverge from Column API")
  }

  test("SimhashAgg == 60 parallel sum(when(bit)) aggregates") {
    val ex = graft.functions.Text.shingled(spark, sf)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), expr(graft.functions.Text.hash60SparkSql("s")).as("h"))
    val fast = ex.groupBy("doc_id").agg(SimhashAgg.simhash(col("h")).as("simhash"))
    val bitSums = (0 until 60).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j"))
    val packed = (0 until 60).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val slow = ex.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
    val diff = fast.as("a").join(slow.as("b"), "doc_id")
      .filter(col("a.simhash") =!= col("b.simhash"))
    assert(diff.count() == 0, "SimhashAgg diverges from the 60-column form")
    assert(fast.count() > 0)
  }

  test("CmsAgg: estimates dominate exact counts, partition-layout-invariant, SQL-callable") {
    val tok = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .select(col("term"), expr(graft.functions.Text.hash60SparkSql("term")).as("h"))
    val sk1 = tok.agg(CmsAgg.cms(col("h"))).first().getSeq[Long](0)
    // CMS merge is elementwise add (commutative/associative): a different
    // partial-aggregation tree MUST produce the identical sketch
    val sk2 = tok.repartition(7).agg(CmsAgg.cms(col("h"))).first().getSeq[Long](0)
    assert(sk1 == sk2, "sketch differs across partition layouts — merge is broken")
    assert(sk1.length == CmsAgg.Depth * CmsAgg.Width)
    // per-depth counter mass must equal the token count exactly
    val n = tok.count()
    (0 until CmsAgg.Depth).foreach { d =>
      assert(sk1.slice(d * CmsAgg.Width, (d + 1) * CmsAgg.Width).sum == n,
        s"depth $d counters do not sum to the input count")
    }
    // estimate >= exact for EVERY term (the CMS one-sided guarantee)
    val exact = tok.groupBy("term", "h").agg(count(lit(1)).as("c")).collect()
    exact.foreach { r =>
      val h = r.getLong(1)
      val est = (0 until CmsAgg.Depth).map { d =>
        sk1((d * CmsAgg.Width + ((h >>> (10 * d)) & (CmsAgg.Width - 1))).toInt)
      }.min
      assert(est >= r.getLong(2), s"CMS underestimated '${r.getString(0)}'")
    }
    // SQL surface via the session extension
    tok.createOrReplaceTempView("exprspec_tok")
    val viaSql = spark.sql("SELECT cms_agg(h) FROM exprspec_tok").first().getSeq[Long](0)
    assert(viaSql == sk1, "SQL-registered cms_agg diverges from Column API")
  }
}

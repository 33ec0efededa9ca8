package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Copy-on-write DML over the Delta log ([[DeltaLog.deleteWhere]] /
  * [[DeltaLog.deletePartitions]] / [[DeltaLog.merge]]): the invariants
  * the oracled entries can't see — UNTOUCHED files must survive a
  * delete/merge byte-identically (the 100 TB property: a selective DML
  * rewrites only the files it must), partition deletes must be
  * metadata-only, and the refusal matrix must hold.
  */
class DeltaDmlSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"/root/repo/target/test-dml/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
    Fs.deleteRec(spark, d)
    d
  }

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("k", "v")

  private def livePaths(tbl: String): Set[String] =
    DeltaLog.snapshot(spark, tbl)._2.toSet

  test("deleteWhere rewrites ONLY touched files; untouched files survive as-is") {
    val tbl = s"${freshDir("del")}/t"
    DeltaLog.append(spark, tbl, df(1L -> "a", 2L -> "b").repartition(1)) // file A
    DeltaLog.append(spark, tbl, df(3L -> "c", 4L -> "d").repartition(1)) // file B
    val before = livePaths(tbl)
    assert(before.size == 2)
    val (v, touched, rewritten) = DeltaLog.deleteWhere(spark, tbl, col("k") === 3L)
    assert(touched == 1 && rewritten == 1)
    val after = livePaths(tbl)
    // file A (rows 1,2) must still be live under its ORIGINAL path
    assert(before.intersect(after).size == 1, "the untouched file must not be rewritten")
    assert(DeltaLog.read(spark, tbl).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 4L))
    // no-match delete: no commit at all
    val latestBefore = DeltaLog.latestVersion(spark, tbl)
    val (v2, t2, r2) = DeltaLog.deleteWhere(spark, tbl, col("k") === 99L)
    assert(t2 == 0 && r2 == 0 && DeltaLog.latestVersion(spark, tbl) == latestBefore)
    assert(v == latestBefore && v2 == latestBefore)
  }

  test("deletePartitions is metadata-only: remove actions, no reads, no new files") {
    val tbl = s"${freshDir("delp")}/t"
    val d = Seq((1L, "red"), (2L, "blue"), (3L, "red")).toDF("k", "color")
    DeltaLog.append(spark, tbl, d.repartition(1), partitionBy = Seq("color"))
    val (v, removed) = DeltaLog.deletePartitions(spark, tbl, Map("color" -> "red"))
    assert(removed == 1, "one red partition file retired")
    val lines = DeltaLog.readCommit(spark, tbl, v)
    assert(lines.forall(!_.contains("\"add\"")), "partition delete must add nothing")
    assert(DeltaLog.read(spark, tbl).select("k").as[Long].collect().toSeq == Seq(2L))
    // refusal matrix: row-level on partitioned, partition-drop on flat
    intercept[IllegalArgumentException](
      DeltaLog.deleteWhere(spark, tbl, col("k") === 2L))
    val flat = s"${freshDir("delf")}/t"
    DeltaLog.append(spark, flat, df(1L -> "a").repartition(1))
    intercept[IllegalArgumentException](
      DeltaLog.deletePartitions(spark, flat, Map("color" -> "red")))
  }

  test("merge upserts by key, rewrites only files containing matched keys, inserts new keys") {
    val tbl = s"${freshDir("mrg")}/t"
    DeltaLog.append(spark, tbl, df(1L -> "a", 2L -> "b").repartition(1)) // file A
    DeltaLog.append(spark, tbl, df(3L -> "c", 4L -> "d").repartition(1)) // file B
    val before = livePaths(tbl)
    val (_, touched) = DeltaLog.merge(spark, tbl,
      df(2L -> "B2", 9L -> "NEW"), keyCols = Seq("k"))
    assert(touched == 1, "only the file containing key 2 is rewritten")
    assert(before.intersect(livePaths(tbl)).size == 1, "file B untouched")
    val got = DeltaLog.read(spark, tbl).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d", 9L -> "NEW"))
  }

  test("merge with only-new keys rewrites nothing; merge creates a missing table") {
    val tbl = s"${freshDir("mrgi")}/t"
    DeltaLog.append(spark, tbl, df(1L -> "a").repartition(1))
    val before = livePaths(tbl)
    val (_, touched) = DeltaLog.merge(spark, tbl, df(7L -> "g"), keyCols = Seq("k"))
    assert(touched == 0 && before.subsetOf(livePaths(tbl)),
      "insert-only merge must be pure append")
    val fresh = s"${freshDir("mrgc")}/t"
    DeltaLog.merge(spark, fresh, df(1L -> "a"), keyCols = Seq("k"))
    assert(DeltaLog.read(spark, fresh).count() == 1)
    // whole-row contract: source schema must match
    intercept[IllegalArgumentException](
      DeltaLog.merge(spark, tbl, Seq((1L, "x", 1.0)).toDF("k", "v", "extra"), Seq("k")))
  }

  test("the streaming tail and change feed refuse across a row-level delete") {
    val tbl = s"${freshDir("tailref")}/t"
    DeltaLog.append(spark, tbl, df(1L -> "a", 2L -> "b").repartition(1))
    DeltaLog.deleteWhere(spark, tbl, col("k") === 1L)
    val e = intercept[IllegalStateException](
      DeltaLog.changesSince(spark, tbl, since = -1L).collect())
    assert(e.getMessage.contains("change feed"))
  }
}

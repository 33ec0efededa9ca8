package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** The windowed skyline must equal the O(n²) definition — checked by
  * brute force over the collected fixture (500 parts). */
class SkylineSpec extends SparkSpec {

  test("op_skyline equals the brute-force pareto frontier") {
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val naive = parts.filter { case (_, price, size) =>
      !parts.exists { case (_, qp, qs) =>
        qp <= price && qs >= size && (qp < price || qs > size)
      }
    }.map(_._1).toSet
    val windowed = Relational.opSkyline(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(windowed == naive,
      s"missing=${naive -- windowed} extra=${windowed -- naive}")
  }
}

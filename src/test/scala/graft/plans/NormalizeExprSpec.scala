package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NfcNormalize]] invariants the oracle comparison can't isolate:
  * composition of decomposed sequences, idempotence, the already-NFC
  * fast path returning the input unchanged, null propagation, and the
  * SQL registration (both the extensions and the imperative bridge). */
class NormalizeExprSpec extends SparkSpec {

  import spark.implicits._

  private val combiningAcute = "́"

  test("NfcNormalize composes decomposed sequences and is idempotent") {
    val df = Seq(
      (1L, "e" + combiningAcute),            // e + U+0301 -> é (U+00E9)
      (2L, "café"),                     // already composed: unchanged
      (3L, "A" + combiningAcute + "bc"),     // Á bc
      (4L, ""),                              // empty
      (5L, "plain ascii text")
    ).toDF("id", "s")
    val byId = df.select(col("id"), expr("nfc_normalize(s)").as("n"),
        expr("nfc_normalize(nfc_normalize(s))").as("nn"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(byId(1L)._1 == "é")
    assert(byId(2L)._1 == "café")
    assert(byId(3L)._1 == "Ábc")
    assert(byId(4L)._1 == "")
    assert(byId(5L)._1 == "plain ascii text")
    // idempotence: NFC(NFC(x)) == NFC(x)
    byId.values.foreach { case (n, nn) => assert(n == nn) }
    assert(byId.size == 5)
  }

  test("NfcNormalize null propagation and length accounting") {
    val df = Seq((1L, Option("e" + combiningAcute)), (2L, Option.empty[String]))
      .toDF("id", "s")
    val rows = df.select(col("id"), expr("nfc_normalize(s)").as("n"),
        length(expr("nfc_normalize(s)")).as("len"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == "é" && rows(1L).getInt(2) == 1)
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2))
  }

  test("imperative registration bridge exposes nfc_normalize on caller-owned sessions") {
    GraftExtensions.register(spark) // idempotent createOrReplace
    val out = spark.sql(s"SELECT nfc_normalize('e' || '$combiningAcute') AS n")
      .first().getString(0)
    assert(out == "é")
  }
}

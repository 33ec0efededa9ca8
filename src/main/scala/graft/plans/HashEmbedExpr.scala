package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Signed hashed bag-of-words embedding of a token array as ONE native
  * pass — `hash_embed(tokens, buckets, prefix)` → `array<bigint>` where
  * each token adds ±1 to bucket `h % buckets` with sign from bit
  * `(h div buckets) % 2`, h = the engine's 60-bit md5 hash of
  * `prefix || token` ([[graft.functions.Text.hash60SparkSql]]).
  *
  * Why custom (builder preference order (b)): the composed form —
  * `transform(toks, t -> struct(pmod(hash, B), sign))` followed by
  * `transform(sequence(0, B-1), b -> aggregate(...))` — walks the token
  * list B+1 times through interpreted higher-order lambdas and computes
  * the md5 TWICE per token (once for the bucket, once for the sign).
  * This expression makes one flat pass: one md5 per token, primitive
  * long accumulation, zero intermediate arrays, emitted as an
  * `UnsafeArrayData` primitive array — and it participates in
  * whole-stage codegen via a static call, so the RAG chunk-embedding
  * scans ([[graft.operators.Similarity.ragChunkEmbed]], the streaming
  * index maintenance) stay inside the generated loop.
  *
  * Bit-exactness contract: md5 over the UTF-8 bytes of
  * `prefix || token`, value = first 15 hex chars parsed base-16 —
  * IDENTICAL to Spark `conv(substr(md5(concat(prefix, t)), 1, 15), 16,
  * 10)` and DuckDB `('0x' || substr(md5(prefix || t), 1, 15))::BIGINT`,
  * so the DuckDB oracles keep verifying the composed form against this
  * kernel's output hash-exactly (proven by the parity spec and the
  * unchanged `ann_rag_chunks` / `pipe_stream_rag_index` oracle rows).
  */
case class HashEmbed(child: Expression, buckets: Int, prefix: String)
  extends UnaryExpression {

  require(buckets > 0, "hash_embed buckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hash_embed"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash_embed expects array<string>, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashEmbed.embed(input.asInstanceOf[ArrayData], buckets,
      UTF8String.fromString(prefix))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("hashEmbedPrefix",
      UTF8String.fromString(prefix), classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.HashEmbed.embed($c, $buckets, $pref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {

  /** Column-API entry point (mirrors [[WordShingles.wordShingles]]). */
  def hashEmbed(c: org.apache.spark.sql.Column, buckets: Int,
                prefix: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(HashEmbed(ColumnBridge.toExpr(c), buckets, prefix))
  }

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit hash: md5(prefix bytes ++ token bytes), first 15 hex chars
    * base-16 = the digest's first 8 bytes as a big-endian long shifted
    * right 4 (drops the 16th hex char = the low nibble of byte 7).
    * Always non-negative. */
  def hash60(prefix: UTF8String, t: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(prefix.getBytes)
    md.update(t.getBytes)
    val d = md.digest()
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  /** One flat pass: per token one md5, bucket = h % b, sign from
    * (h div b) % 2, primitive accumulation. */
  def embed(toks: ArrayData, b: Int, prefix: UTF8String): ArrayData = {
    val acc = new Array[Long](b)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = hash60(prefix, toks.getUTF8String(i))
      val bkt = (h % b).toInt
      val s = if (((h / b) & 1L) == 0L) 1L else -1L
      acc(bkt) += s
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }
}

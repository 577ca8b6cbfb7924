package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's cross-engine 60-bit hash
  * ([[ColumnFns.md5Long]]): the value of the first 15 hex chars of
  * `md5(input)` — i.e. the top 60 bits of the digest — as a non-negative
  * long.
  *
  * Semantically identical to the composable chain
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")`, but that chain
  * allocates a 32-char hex string, a 15-char substring, and a decimal
  * string per evaluation — and it runs INTERPRETED inside the higher-order
  * lambdas where the engine hashes hardest (one hash per shingle in
  * MinHash, per token in SimHash/fingerprints). This expression goes
  * digest-bytes -> long with zero intermediate strings, in codegen where
  * the plan allows and with the same cheap kernel when interpreted.
  *
  * Cross-engine contract unchanged: equals DuckDB's
  * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`, which is what keeps
  * every MinHash/SimHash/fingerprint/sampling oracle verifiable. Always in
  * `[0, 2^60)`. SQL name `graft_md5_long` (via [[GraftFunctions.register]]
  * or `GraftExtensions`).
  */
case class Md5LongExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_long requires a string or binary input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5LongExpr.hash(s)
    case b: Array[Byte] => Md5LongExpr.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5LongExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5LongExpr =
    copy(child = newChild)
}

object Md5LongExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5LongExpr].getName, "graft_md5_long")

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes): 7 full bytes (14 hex chars) plus the high
    * nibble of byte 7 (the 15th hex char) — bit-identical to parsing the
    * first 15 hex chars of the digest. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** UTF8String form used from codegen: hashes the string's UTF-8 bytes,
    * exactly what Spark's `md5(string)` digests. */
  def hash(s: UTF8String): Long = hash(s.getBytes)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-shingles of a token array.
  *
  * Semantically identical to the composable chain
  * `when(size(toks) >= k, transform(sequence(0, size-k), i ->
  * concat_ws(" ", slice(toks, i+1, k)))).otherwise(array(concat_ws(" ",
  * toks)))` — documents shorter than k tokens collapse to one
  * whole-document shingle, null tokens are skipped inside a gram
  * (concat_ws semantics), and a NULL token array yields `[""]` (the
  * chain's `when(null >= k)` falls to the otherwise branch and concat_ws
  * skips the null array), so null-text documents cluster with empty-text
  * documents in dedup banding instead of silently dropping out — but that
  * chain allocates a sliced array PER GRAM and runs interpreted inside the
  * higher-order functions. Shingling feeds every dedup operator (MinHash
  * bands, Jaccard, repetition, decontamination), so this is the engine's
  * hottest string-producing loop: one pass, one UTF8String per gram, no
  * intermediate arrays.
  */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle length must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // NULL input maps to [""], never to null (legacy-chain parity, see above)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string> tokens, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => ShinglesExpr.emptyGram()
    case toks => ShinglesExpr.compute(toks.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.ShinglesExpr.emptyGram()
            : graft.functions.ShinglesExpr.compute(${childGen.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  private val Space = UTF8String.fromString(" ")

  private val EmptyGramArr: ArrayData =
    new GenericArrayData(Array[Any](UTF8String.fromString("")))

  /** `[""]` — the legacy chain's value for a NULL token array (and for an
    * empty one: [[compute]] on zero tokens yields the same single empty
    * gram). Shared instance; callers never mutate ArrayData. */
  def emptyGram(): ArrayData = EmptyGramArr

  /** `concat_ws(" ", toks[start .. start+len-1])` — null tokens skipped,
    * exactly UTF8String.concatWs semantics. */
  private def gram(toks: ArrayData, start: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      parts(i) = if (toks.isNullAt(start + i)) null
                 else toks.getUTF8String(start + i)
      i += 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n >= k) {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) { out(i) = gram(toks, i, k); i += 1 }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[Any](gram(toks, 0, n)))
    }
  }
}

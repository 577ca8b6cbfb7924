package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * (concat_ws semantics), a null array is null — but that chain allocates
  * a sliced array PER GRAM and runs interpreted inside the higher-order
  * functions. Shingling feeds every dedup operator (MinHash bands, Jaccard,
  * repetition, decontamination), so this is the engine's hottest
  * string-producing loop: one pass, one UTF8String per gram, no
  * intermediate arrays.
  */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle length must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string> tokens, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  private val Space = UTF8String.fromString(" ")

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

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native one-pass SimHash (Charikar 2002) from per-token base hashes.
  *
  * Semantically identical to the composable form: signature bit j is the
  * sign of `sum over tokens of (bit j of base ? +1 : -1)` — but that form
  * runs `bits` interpreted `aggregate` passes over the token array per
  * row. This expression scans the array once, updating all `bits` vote
  * counters per element. A null element votes -1 on every bit — exactly
  * what the aggregate form's `when(bit-test, 1).otherwise(-1)` does with
  * a null bit-test (the engine's bases come from non-null tokens, so
  * this is a corner-case-parity detail, not a live path). Ties
  * (vote == 0, including the empty array) give bit 0, matching
  * `when(vote > 0, ...)`.
  */
case class SimhashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60,
    s"bits must be in [1, 60] (bases carry 60 bits), got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint> base hashes, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExpr.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  def compute(bases: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = bases.numElements()
    var i = 0
    while (i < n) {
      if (bases.isNullAt(i)) {
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 }
      } else {
        val b = bases.getLong(i)
        var j = 0
        while (j < bits) {
          if (((b >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

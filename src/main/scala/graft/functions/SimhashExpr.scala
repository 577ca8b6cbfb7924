package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  * `when(vote > 0, ...)`. A NULL base array yields 0L, matching the
  * aggregate form's zero accumulator over nothing — so null-text
  * documents land in the all-zero-signature cluster with empty-text
  * documents rather than dropping out of dedup.
  */
case class SimhashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60,
    s"bits must be in [1, 60] (bases carry 60 bits), got $bits")

  override def dataType: DataType = LongType

  // NULL input maps to 0L, never to null (legacy-chain parity, see above)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint> base hashes, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => 0L
    case bases => SimhashExpr.compute(bases.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} =
          ${childGen.isNull}
            ? 0L
            : graft.functions.SimhashExpr.compute(${childGen.value}, $bits);""",
      isNull = FalseLiteral)
  }

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

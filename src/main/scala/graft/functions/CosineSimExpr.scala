package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused cosine similarity over two numeric arrays — ONE pass accumulating
  * `dot(a,b)`, `|a|²`, `|b|²` together, where the composed form
  * `graft_dot(a,b) / (sqrt(graft_dot(a,a)) * sqrt(graft_dot(b,b)))`
  * traverses both arrays three times (and, interpreted under a
  * higher-order-function context, pays three closure chains). Cosine is
  * the inner loop of the embedding-dedup family (within-bucket pair
  * scoring in [[graft.llm.Dedup.embeddingNearDupPairs]] /
  * [[graft.llm.Dedup.semanticDedup]]), so the 3×→1× traversal shows up
  * directly in those operators' scan time.
  *
  * Bit-compatible with the composed form by construction: all three sums
  * accumulate left-to-right in double precision exactly as three
  * [[DotProductExpr]] calls would (same adds, same order), and the final
  * combine is the same `dot / (sqrt(na) * sqrt(nb))` — so every DuckDB
  * oracle written against the composed formula holds unchanged
  * (equivalence locked by DotProductSpec). Null if the arrays differ in
  * length or any element is null. Zero-norm inputs keep raw IEEE
  * semantics (0/0 → NaN) where the composed form would die under ANSI's
  * DIVIDE_BY_ZERO — strictly more tolerant. NOTE: Spark ORDERS NaN as
  * greater than any numeric, so a raw `NaN >= threshold` comparison is
  * TRUE — which is why every consumer normalizes through
  * [[graft.llm.Similarity.microScore]] (NaN → 0 micro-units via nanvl)
  * before thresholding or ranking; degenerate vectors then score 0 and
  * drop out deterministically on both engines.
  *
  * SQL name `graft_cosine` (register via [[GraftFunctions.register]] or
  * the `GraftExtensions` session extension).
  */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType | ShortType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires two arrays of float/double/int/long, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"$arr.getInt($i)"
    case LongType => s"$arr.getLong($i)"
    case ShortType => s"$arr.getShort($i)"
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  private def getValue(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, ta) = (a.asInstanceOf[ArrayData], elemType(left).get)
    val (lb, tb) = (b.asInstanceOf[ArrayData], elemType(right).get)
    if (la.numElements() != lb.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = la.numElements()
    while (i < n) {
      if (la.isNullAt(i) || lb.isNullAt(i)) return null
      val x = getValue(ta, la, i)
      val y = getValue(tb, lb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      val (ta, tb) = (elemType(left).get, elemType(right).get)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $x = (double)(${getter(ta, a, i)});
         |    double $y = (double)(${getter(tb, b, i)});
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimExpr].getName, "graft_cosine")
}

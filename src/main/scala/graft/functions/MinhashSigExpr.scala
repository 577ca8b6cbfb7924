package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature from per-shingle base hashes.
  *
  * Semantically identical to the composable form
  * `array((0 until k).map(h => array_min(transform(bases, b =>
  * (a_h * b + b_h) % p))))` — signature element h is the min over shingles
  * of the h-th affine permutation (Broder 1997), null elements ignored,
  * all-null/empty input giving an all-null signature — but that chain runs
  * k interpreted `transform` passes and allocates k temporary arrays per
  * row. This expression scans the base array ONCE, updating all k minima
  * per element, no temporaries (the MinHash band stage is the single
  * hottest loop of the dedup family).
  *
  * Coefficients are the same md5-derived plan-time constants
  * ([[MinhashSigExpr.coeffA]]/[[coeffB]] — pairwise-unrelated permutations;
  * a linear schedule correlates orderings and inflates false band
  * collisions), so DuckDB oracles that inline those literals hold
  * unchanged. Products stay below 2^61 (a < 2^31, base < 2^30): exact on
  * LongType in every engine.
  */
case class MinhashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash signature requires array<bigint> base hashes, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {

  /** Mersenne prime 2^31-1: modulus of the affine permutations. */
  val MinhashP = 2147483647L

  /** Plan-time 60-bit constant, derived exactly like
    * [[ColumnFns.md5Long]] but evaluated on the driver. */
  private def planConst(tag: String): Long =
    Md5LongExpr.hash(tag.getBytes("UTF-8"))

  /** Affine coefficients for permutation h — md5-derived, so permutations
    * are pairwise unrelated. Public: oracle SQL inlines these literals. */
  def coeffA(h: Int): Long = planConst(s"mh-a-$h") % (MinhashP - 1) + 1
  def coeffB(h: Int): Long = planConst(s"mh-b-$h") % MinhashP

  // Per-width coefficient cache, grown on demand: any signature width is
  // supported (coeffA/coeffB are pure), the md5 derivation just runs once
  // per width per JVM instead of once per row. TrieMap getOrElseUpdate may
  // race to compute a width twice; the value is deterministic, so either
  // winner is correct.
  private val coeffCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]
  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.getOrElseUpdate(numHashes,
      (Array.tabulate(numHashes)(coeffA), Array.tabulate(numHashes)(coeffB)))

  /** One pass over the base array, updating all `numHashes` minima per
    * element. Null elements are skipped (array_min semantics); if no
    * non-null element exists, every signature slot is null. */
  def compute(bases: ArrayData, numHashes: Int): ArrayData = {
    val (ca, cb) = coeffs(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var found = false
    val n = bases.numElements()
    var i = 0
    while (i < n) {
      if (!bases.isNullAt(i)) {
        found = true
        val b = bases.getLong(i)
        var h = 0
        while (h < numHashes) {
          val v = (ca(h) * b + cb(h)) % MinhashP
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    if (!found) new GenericArrayData(new Array[Any](numHashes)) // all null
    else new GenericArrayData(mins)
  }
}

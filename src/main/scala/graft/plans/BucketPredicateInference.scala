package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: infer the bucket (partition-directory) predicate
  * from a block-id range predicate.
  *
  * The engine's sink contract pins `block_id_group = floor(block_id /
  * bucketSize)` ([[graft.functions.ColumnFns.blockIdGroup]], mirroring the
  * reference's `BLOCK_BUCKET_SIZE` partitioning —
  * ref: scripts/eth_cassandra_streaming.py:34,344). Users naturally filter on
  * `block_id` alone; without the derived `block_id_group` predicate such a
  * query scans EVERY partition directory (the id filter only prunes row
  * groups). The reference forces callers to address partitions explicitly
  * (`block_id_group = ? AND block_id = ?` in its CQL); this rule lets the
  * engine accept the natural predicate and still prune directories:
  *
  *   Filter(block_id >= lo AND block_id <= hi, scan)
  *     ==>  Filter(... AND block_id_group >= lo/size AND
  *                         block_id_group <= hi/size, scan)
  *
  * Fires only when BOTH columns are present in the child's output and the
  * condition does not already constrain the bucket column (idempotent under
  * the optimizer's fixed-point batches). Bounds are derived conservatively
  * (`>` treated as `>=`, `<` as `<=`) — the added conjunct may be loose by
  * one bucket but never wrong. The correctness contract is the engine's
  * invariant above; the rule is therefore opt-in via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `spark.experimental.extraOptimizations`), not a default rewrite.
  */
case class BucketPredicateInference(
    idCol: String = "block_id",
    bucketCol: String = "block_id_group",
    bucketSize: Long = 1000L) extends Rule[LogicalPlan] {

  /** The invariant only holds for the PHYSICAL columns of a sink scan —
    * a name-equal alias (e.g. `sum(block_id) AS block_id` above an
    * Aggregate) must never trigger the rewrite. Accept only children that
    * are a leaf relation, or pass-through nodes (Filter / alias-free
    * Project / SubqueryAlias) above one, so both attributes are guaranteed
    * to be the scan's own columns. */
  private def scanAdjacent(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case f: Filter => scanAdjacent(f.child)
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanAdjacent(pr.child)
    case s: SubqueryAlias => scanAdjacent(s.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if scanAdjacent(child)
          && child.output.exists(_.name == bucketCol)
          && child.output.exists(_.name == idCol)
          && !cond.references.exists(_.name == bucketCol) =>
      val bucketAttr = child.output.find(_.name == bucketCol).get
      val bounds = conjuncts(cond).flatMap(boundOf)
      val lo = bounds.collect { case (Some(v), _) => v } match {
        case Nil => None; case vs => Some(vs.max)
      }
      val hi = bounds.collect { case (_, Some(v)) => v } match {
        case Nil => None; case vs => Some(vs.min)
      }
      val derived =
        lo.flatMap(v => bucketLit(bucketAttr, v).map(GreaterThanOrEqual(bucketAttr, _))).toSeq ++
        hi.flatMap(v => bucketLit(bucketAttr, v).map(LessThanOrEqual(bucketAttr, _)))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And(_, _)), child)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def isId(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == idCol
    case _ => false
  }

  private def longOf(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** (lower, upper) bound on the id column carried by one conjunct. */
  private def boundOf(e: Expression): Option[(Option[Long], Option[Long])] = e match {
    case GreaterThanOrEqual(a, Literal(v, _)) if isId(a) => longOf(v).map(x => (Some(x), None))
    case GreaterThan(a, Literal(v, _)) if isId(a) => longOf(v).map(x => (Some(x), None))
    case LessThanOrEqual(a, Literal(v, _)) if isId(a) => longOf(v).map(x => (None, Some(x)))
    case LessThan(a, Literal(v, _)) if isId(a) => longOf(v).map(x => (None, Some(x)))
    case EqualTo(a, Literal(v, _)) if isId(a) => longOf(v).map(x => (Some(x), Some(x)))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(v, _), a) if isId(a) => longOf(v).map(x => (None, Some(x)))
    case GreaterThan(Literal(v, _), a) if isId(a) => longOf(v).map(x => (None, Some(x)))
    case LessThanOrEqual(Literal(v, _), a) if isId(a) => longOf(v).map(x => (Some(x), None))
    case LessThan(Literal(v, _), a) if isId(a) => longOf(v).map(x => (Some(x), None))
    case EqualTo(Literal(v, _), a) if isId(a) => longOf(v).map(x => (Some(x), Some(x)))
    // IN lists (and their optimized InSet form): bounded by the extreme
    // members — conservative (buckets between min and max may not contain a
    // member, but none outside can), which is all this rule ever promises
    case In(a, values) if isId(a) && values.nonEmpty
        && values.forall(_.isInstanceOf[Literal]) =>
      val longs = values.map { case Literal(v, _) => longOf(v) }
      if (longs.exists(_.isEmpty)) None
      else Some((Some(longs.flatten.min), Some(longs.flatten.max)))
    case InSet(a, hset) if isId(a) && hset.nonEmpty =>
      val longs = hset.toSeq.map(longOf)
      if (longs.exists(_.isEmpty)) None
      else Some((Some(longs.flatten.min), Some(longs.flatten.max)))
    case _ => None
  }

  /** Bucket literal in the bucket column's own type (partition columns read
    * back as int; long sinks keep long). Ids are non-negative in this domain,
    * but use floorDiv anyway so a negative id can't round the wrong way.
    *
    * The bucket value is SATURATED to the column type's range, never wrapped:
    * an id literal ≥ `bucketSize · 2³¹` over an Int bucket column would
    * otherwise produce a wrapped (negative/small) literal whose injected
    * conjunct silently prunes partitions that hold matching rows. A
    * saturated bound is merely loose (`bucket >= Int.MaxValue` admits the
    * last representable bucket and nothing the original predicate excludes),
    * preserving the "loose but never wrong" contract. Bucket columns of any
    * non-integral type are left alone entirely. */
  private def bucketLit(bucketAttr: Attribute, idValue: Long): Option[Literal] = {
    val b = Math.floorDiv(idValue, bucketSize)
    def sat(min: Long, max: Long): Long = Math.max(min, Math.min(max, b))
    bucketAttr.dataType match {
      case IntegerType => Some(Literal(sat(Int.MinValue, Int.MaxValue).toInt))
      case LongType => Some(Literal(b))
      case ShortType => Some(Literal(sat(Short.MinValue, Short.MaxValue).toShort))
      case ByteType => Some(Literal(sat(Byte.MinValue, Byte.MaxValue).toByte))
      case _ => None
    }
  }
}

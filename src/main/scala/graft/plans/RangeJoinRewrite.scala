package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrites a naive interval-containment join into the
  * bucket-expansion equi-join ([[graft.operators.JoinOps.rangeJoin]]'s
  * shape) at the logical-plan level, so plain SQL like
  *
  *   SELECT … FROM points p JOIN ranges r
  *   ON r.start_ms <= p.ms AND p.ms < r.end_ms
  *
  * stops planning as an O(points × ranges) BroadcastNestedLoopJoin and
  * becomes: ranges exploded to the `bucketWidth`-sized time buckets they
  * span, points projected to their bucket, an Inner equi-join on the
  * bucket, and the original predicates kept as the residual filter. A
  * point matches a range in exactly one bucket (the point's own), so no
  * dedup is needed.
  *
  * Scope guards (conservative by design):
  *   - enabled only when `spark.graft.rangeJoin.bucketWidth` is set (>0);
  *   - Inner joins whose condition contains `p >= s`/`s <= p` AND
  *     `p < e`/`e > p` conjuncts over LongType expressions, with `p`
  *     referencing one side only and `s`,`e` the other side only;
  *   - skipped when any equi conjunct already exists (Spark already has a
  *     shuffled hash/sort-merge plan — and this also makes the rewrite
  *     idempotent: its own output contains the bucket equality).
  *
  * Malformed ranges (`e <= s`) explode to zero buckets via the guard in
  * the sequence expression, so they cost nothing and match nothing —
  * same as the residual filter's verdict.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] {

  private val widthKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed width must disable the rewrite, not fail every query in
    // the session (this rule runs on every plan)
    val width = scala.util.Try(conf.getConfString(widthKey, "0").trim.toLong)
      .getOrElse {
        logWarning(s"$widthKey is not a long; range-join rewrite disabled")
        0L
      }
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Normalize a conjunct to (point, bound, isLower): `p >= s` / `s <= p`
    * → (p, s, lower); `p < e` / `e > p` → (p, e, upper). */
  private def asBound(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
    case GreaterThanOrEqual(p, s) => Some((p, s, true))
    case LessThanOrEqual(s, p) => Some((p, s, true))
    case LessThan(p, e) => Some((p, e, false))
    case GreaterThan(e, p) => Some((p, e, false))
    case _ => None
  }

  private def rewrite(j: Join, cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    if (conjuncts.exists(_.isInstanceOf[EqualTo])) return None

    val bounds = conjuncts.flatMap(c => asBound(c).map(c -> _))
    val lowers = bounds.collect { case (c, (p, b, true)) => (c, p, b) }
    val uppers = bounds.collect { case (c, (p, b, false)) => (c, p, b) }

    val candidates = for {
      (_, pL, s) <- lowers
      (_, pU, e) <- uppers
      if pL.semanticEquals(pU)
      if pL.dataType == LongType && s.dataType == LongType && e.dataType == LongType
    } yield (pL, s, e)

    candidates.collectFirst(Function.unlift { case (p, s, e) =>
      sides(j, p, s, e, width)
    })
  }

  /** Orient point/range sides and build the rewritten plan. */
  private def sides(j: Join, p: Expression, s: Expression, e: Expression,
      width: Long): Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    val pRefs = p.references
    val seRefs = s.references ++ e.references
    val oriented =
      if (pRefs.subsetOf(left.outputSet) && seRefs.subsetOf(right.outputSet))
        Some((left, right, true))
      else if (pRefs.subsetOf(right.outputSet) && seRefs.subsetOf(left.outputSet))
        Some((right, left, false))
      else None

    oriented.map { case (pointPlan, rangePlan, pointIsLeft) =>
      val w = Literal(width, LongType)
      // point side: project bucket = p div w
      val pBucket = Alias(IntegralDivide(p, w), "_graft_bucket_p")()
      val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)
      // range side: explode the buckets [s div w, (e-1) div w] the range
      // spans; empty when e <= s
      // Sequence is TimeZoneAwareExpression; the analyzer's ResolveTimeZone
      // already ran, so the rule must supply the zone itself to stay resolved
      val seqExpr = If(GreaterThan(e, s),
        Sequence(IntegralDivide(s, w), IntegralDivide(Subtract(e, Literal(1L)), w),
          None, Some(conf.sessionLocalTimeZone)),
        Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
      val rBucketAttr = AttributeReference("_graft_bucket_r", LongType, nullable = false)()
      val rangeGen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(rBucketAttr),
        child = rangePlan)
      // equi-join on the bucket; every original conjunct stays as residual
      val newCond = And(EqualTo(pBucket.toAttribute, rBucketAttr), j.condition.get)
      val (nl, nr) =
        if (pointIsLeft) (pointProj, rangeGen) else (rangeGen, pointProj)
      val joined = Join(nl, nr, Inner, Some(newCond), j.hint)
      // restore the original output (drop the bucket columns)
      Project(j.output, joined)
    }
  }
}

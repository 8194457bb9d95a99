package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** SQL-frontend surface for the native join operators (VERDICT r5/r6
  * rolled item: `asof_join` / `range_join` reachable from `spark.sql`,
  * not only the DataFrame API): an analyzer rule that rewrites a
  * HINTED join whose condition matches the operator's declared shape
  * into the corresponding native logical node, which the injected
  * strategies then plan as [[AsofJoinExec]] / [[RangeJoinExec]].
  *
  * Spark has no user-facing Scala TVF registration, so the hint is
  * the planning function:
  *
  * {{{
  * SELECT /*+ ASOF_JOIN */ e.event_id, rt.price
  * FROM events e LEFT JOIN rt ON e.user_id = rt.k AND rt.t <= e.ts
  *
  * SELECT /*+ RANGE_JOIN */ count(*)
  * FROM x JOIN y ON x.k = y.k
  *   AND y.t >= x.t - 120000000 AND y.t <= x.t + 120000000
  * }}}
  *
  * Contract (enforced, not assumed):
  *  - ASOF_JOIN requires a LEFT join with exactly one left↔right
  *    equality and one `rightTime <= leftTime` conjunct. The hint is
  *    SEMANTIC — a plain left join with that condition returns every
  *    past row, the asof join only the latest — so a hinted join the
  *    rule cannot parse is an analysis-time ERROR, never a silent
  *    fall-through to different semantics.
  *  - RANGE_JOIN requires an INNER join with one equality and a
  *    closed band `rightTime ∈ [leftTime+lo, leftTime+hi]` (literal
  *    long offsets; `BETWEEN` desugars to exactly this pair). The
  *    rewrite is row-equivalent to the plain join, but it is still
  *    error-on-mismatch: a hint that silently degrades to the per-key
  *    cartesian it exists to avoid would hide the 100×-scale bug.
  *  - Keys and times must be long-backed (bigint / timestamp) —
  *    the execs eval them as raw longs (the graft key domain).
  *
  * Pin equal explicit widths on both sides from SQL with
  * `/*+ REPARTITION(n, key) */` in each input subquery — the same
  * zipPartitions-width discipline the DSL callers follow with
  * `repartition(n, key)`.
  */
object NativeJoinHints extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    // SQL BETWEEN analyzes to the RuntimeReplaceable Between node —
    // desugar to its two closed bounds so the band parser sees them
    case Between(v, lo, hi, _) =>
      Seq(GreaterThanOrEqual(v, lo), LessThanOrEqual(v, hi))
    case x => Seq(x)
  }

  private def longBacked(e: Expression): Boolean = e.dataType match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def fromLeft(e: Expression, l: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(l.outputSet)
  private def fromRight(e: Expression, r: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(r.outputSet)

  /** literal long, possibly under the coercion cast SQL int literals get */
  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case c: Cast if c.dataType == LongType => litLong(c.child)
    case _ => None
  }

  /** interpret `e` as (left-side base expression, literal offset) */
  private def baseOffset(e: Expression, l: LogicalPlan): Option[(Expression, Long)] =
    e match {
      case Add(a, b, _) if fromLeft(a, l) && litLong(b).isDefined =>
        Some((a, litLong(b).get))
      case Add(a, b, _) if fromLeft(b, l) && litLong(a).isDefined =>
        Some((b, litLong(a).get))
      case Subtract(a, b, _) if fromLeft(a, l) && litLong(b).isDefined =>
        Some((a, -litLong(b).get))
      case a if fromLeft(a, l) => Some((a, 0L))
      case _ => None
    }

  private case class Equi(lk: Expression, rk: Expression)

  private def parseEqui(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Equi] =
    e match {
      case EqualTo(a, b) if fromLeft(a, l) && fromRight(b, r) => Some(Equi(a, b))
      case EqualTo(a, b) if fromRight(a, r) && fromLeft(b, l) => Some(Equi(b, a))
      case _ => None
    }

  private def parseAsof(l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[AsofJoinNode] = {
    var equi: Option[Equi] = None
    var times: Option[(Expression, Expression)] = None // (lt, rt)
    val ok = conjuncts(cond).forall { c =>
      parseEqui(c, l, r) match {
        case Some(eq) if equi.isEmpty => equi = Some(eq); true
        case _ => c match {
          case LessThanOrEqual(a, b)
              if times.isEmpty && fromRight(a, r) && fromLeft(b, l) =>
            times = Some((b, a)); true
          case GreaterThanOrEqual(a, b)
              if times.isEmpty && fromLeft(a, l) && fromRight(b, r) =>
            times = Some((a, b)); true
          case _ => false
        }
      }
    }
    for {
      _ <- if (ok) Some(()) else None
      eq <- equi
      (lt, rt) <- times
      if eq.lk.dataType == LongType && eq.rk.dataType == LongType &&
        longBacked(lt) && longBacked(rt)
    } yield AsofJoinNode(l, r, eq.lk, eq.rk, lt, rt)
  }

  private def parseRange(l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[RangeJoinNode] = {
    var equi: Option[Equi] = None
    // bounds keyed by direction: rt >= base+lo (lower), rt <= base+hi
    var lower: Option[(Expression, Expression, Long)] = None // (rt, base, lo)
    var upper: Option[(Expression, Expression, Long)] = None
    val ok = conjuncts(cond).forall { c =>
      parseEqui(c, l, r) match {
        case Some(eq) if equi.isEmpty => equi = Some(eq); true
        case _ =>
          val bound = c match {
            case GreaterThanOrEqual(a, b) if fromRight(a, r) =>
              baseOffset(b, l).map(x => (true, a, x))  // rt >= base+lo
            case LessThanOrEqual(a, b) if fromRight(a, r) =>
              baseOffset(b, l).map(x => (false, a, x)) // rt <= base+hi
            case LessThanOrEqual(a, b) if fromRight(b, r) =>
              baseOffset(a, l).map(x => (true, b, x))  // base+lo <= rt
            case GreaterThanOrEqual(a, b) if fromRight(b, r) =>
              baseOffset(a, l).map(x => (false, b, x)) // base+hi >= rt
            case _ => None
          }
          bound match {
            case Some((true, rt, (base, off))) if lower.isEmpty =>
              lower = Some((rt, base, off)); true
            case Some((false, rt, (base, off))) if upper.isEmpty =>
              upper = Some((rt, base, off)); true
            case _ => false
          }
      }
    }
    for {
      _ <- if (ok) Some(()) else None
      eq <- equi
      (rtL, baseL, lo) <- lower
      (rtU, baseU, hi) <- upper
      if rtL.semanticEquals(rtU) && baseL.semanticEquals(baseU) && lo <= hi &&
        eq.lk.dataType == LongType && eq.rk.dataType == LongType &&
        longBacked(baseL) && longBacked(rtL)
    } yield RangeJoinNode(l, r, eq.lk, eq.rk, baseL, rtL, lo, hi)
  }

  private def fail(hint: String, detail: String): Nothing =
    throw new IllegalArgumentException(
      s"/*+ $hint */ could not be applied: $detail. The hint is a " +
        "semantic contract — refusing to run the plain join instead. " +
        "See graft.plans.NativeJoinHints for the required ON shape.")

  /** the top-most conditioned joins under `p` — the first Join with an
    * ON condition along each root-to-leaf path (what [[rewrite]]'s
    * pre-order traversal can reach). More than one means a multi-child
    * operator (a UNION of joins) sits between the hint and the joins,
    * and "the join the user hinted" is ambiguous. */
  private def hintableJoins(p: LogicalPlan): Seq[Join] = p match {
    case j @ Join(_, _, _, Some(_), _) => Seq(j)
    case other => other.children.flatMap(hintableJoins)
  }

  /** rewrite the TOP-most join under the hint (ADVICE r7: transformUp
    * rewrote the BOTTOM-most, so a nested inner join whose ON happened
    * to match the asof shape could be converted instead of the join
    * the user hinted — the outer join is what a query-level hint
    * names). Pre-order recursion that stops descending once a join is
    * rewritten. ADVICE r8: when several top-most joins exist on
    * sibling branches (a UNION of joins), rewriting only the leftmost
    * would silently leave the others plain — the hint REFUSES instead;
    * apply it inside each branch. */
  private def rewrite(child: LogicalPlan, hint: String): LogicalPlan = {
    val cands = hintableJoins(child)
    if (cands.size > 1)
      fail(hint, s"${cands.size} top-most joins found under the hint " +
        "(e.g. a UNION of joins) — the query-level hint names ONE join; " +
        "apply the hint inside each branch instead")
    var applied = false
    def go(p: LogicalPlan): LogicalPlan = p match {
      case Join(l, r, jt, Some(cond), _) if !applied =>
        applied = true
        hint match {
          case "ASOF_JOIN" =>
            if (jt != LeftOuter)
              fail(hint, s"join type is $jt, the asof contract is LEFT OUTER")
            parseAsof(l, r, cond)
              .getOrElse(fail(hint, s"condition `$cond` is not " +
                "`leftKey = rightKey AND rightTime <= leftTime` over " +
                "long-backed columns"))
          case _ =>
            if (jt != Inner)
              fail(hint, s"join type is $jt, the band contract is INNER")
            parseRange(l, r, cond)
              .getOrElse(fail(hint, s"condition `$cond` is not " +
                "`leftKey = rightKey AND rightTime BETWEEN leftTime+lo " +
                "AND leftTime+hi` with literal long offsets"))
        }
      case other => other.mapChildren(go)
    }
    val out = go(child)
    if (!applied) fail(hint, "no join with an ON condition found under the hint")
    out
  }

  private def isNativeHint(name: String): Boolean = {
    val n = name.toUpperCase
    n == "ASOF_JOIN" || n == "RANGE_JOIN"
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, Nil, child)
        if isNativeHint(name) && child.resolved =>
      rewrite(child, name.toUpperCase)
    // ADVICE r7: a parameterized form like /*+ ASOF_JOIN(x) */ used to
    // fall through this rule, get dropped by Spark's RemoveAllHints
    // with only a log warning, and run the PLAIN left join — every
    // past row instead of the latest, the exact silent fall-through
    // the contract forbids. The hints take no parameters; say so.
    case UnresolvedHint(name, params, _) if isNativeHint(name) && params.nonEmpty =>
      fail(name.toUpperCase,
        s"the hint takes no parameters, got (${params.mkString(", ")})")
  }
}

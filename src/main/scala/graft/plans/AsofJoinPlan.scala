package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE backward as-of join — the whole-operator extension rung of
  * the customization ladder (Expression → Rule → LogicalPlan +
  * Strategy + SparkPlan), used where composition is possible but
  * structurally wasteful: the DataFrame formulation of an as-of join
  * (union both sides + `last(ignoreNulls)` window — see
  * Joins."join_asof") must SORT THE UNION of both inputs inside one
  * window pass, paying O((|L|+|R|)·log) per key group and carrying
  * every probe column through the union's null-padding. This operator
  * is the merge-join shape kdb's `aj` and DuckDB's ASOF JOIN execute:
  * co-partition both sides on the key, locally sort each side once,
  * then a single forward merge per partition holds ONE candidate row
  * of state. Same result, strictly less work, and the at-scale memory
  * profile is O(1) per partition beyond the sorts.
  *
  * Declared semantics (the Joins."join_asof" contract): LEFT OUTER;
  * each left row matches the latest right row of the SAME key with
  * `rightTime <= leftTime`; right side must be unique per (key, time)
  * (pre-aggregate upstream — with duplicates the last in right-sort
  * order wins); keys and times must be non-null and long-backed
  * (bigint / timestamp-µs — the graft key domain).
  *
  * Scale/robustness notes:
  *  - `requiredChildDistribution` = ClusteredDistribution per side →
  *    EnsureRequirements co-partitions exactly as it does for a
  *    sort-merge join; `requiredChildOrdering` inserts LOCAL sorts
  *    only (no global exchange beyond the key hash).
  *  - Callers should pin equal explicit partition counts on both
  *    sides (`repartition(n, key)`) so AQE cannot coalesce the two
  *    shuffles to different widths under `zipPartitions`.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** planner strategy: one physical choice, the per-partition merge */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  // local sorts per partition — EnsureRequirements inserts SortExec
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val out = output
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = ri.buffered
      // single-candidate merge state: the latest right row consumed
      // for the key currently being merged
      var lastKey = 0L
      var hasLast = false
      var lastRight: InternalRow = null
      li.map { lrow =>
        val lk = lkB.eval(lrow).asInstanceOf[Long]
        val lt = ltB.eval(lrow).asInstanceOf[Long]
        // consume right rows with (rk, rt) <=_lex (lk, lt); only
        // same-key rows become the candidate — the pointer never
        // rewinds, which is what makes this one pass
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val h = rBuf.head
          val rk = rkB.eval(h).asInstanceOf[Long]
          if (rk < lk || (rk == lk &&
              rtB.eval(h).asInstanceOf[Long] <= lt)) {
            val r = rBuf.next()
            if (rk == lk) {
              lastRight = r.copy(); lastKey = lk; hasLast = true
            }
          } else advancing = false
        }
        val m = if (hasLast && lastKey == lk) lastRight else nullRight
        proj(joined(lrow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** public API: `AsofJoin(events, quotes, evKey, qKey, evTs, qTs)` */
object AsofJoin {
  def apply(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame =
    GraftSqlBridge.ofRows(left.sparkSession, AsofJoinNode(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      GraftSqlBridge.expr(leftKey), GraftSqlBridge.expr(rightKey),
      GraftSqlBridge.expr(leftTime), GraftSqlBridge.expr(rightTime)))
}

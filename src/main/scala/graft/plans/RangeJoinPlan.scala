package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE band (range) join — the second whole-operator rung next to
  * [[AsofJoinExec]] (VERDICT r4 #9): INNER join on an equi-key where
  * the right time lies in the closed band [leftTime + lo, leftTime +
  * hi]. The composed formulations (Joins."join_range_bucketed"'s two
  * bucket equi-joins + union, "join_interval_overlap"'s theta join)
  * either re-shuffle twice and union, or degrade to a per-key
  * cartesian with a post-filter. This operator is the sliding-window
  * merge a native engine runs: co-partition both sides on the key,
  * locally sort each side by (key, time), then one forward merge per
  * partition whose only state is the deque of right rows currently
  * inside the band — O(inputs + outputs) work, band-width memory.
  *
  * Declared semantics: INNER; keys and times non-null and long-backed
  * (bigint / unix_micros — the graft key domain); lo ≤ hi are Long
  * literals fixed at plan time. Each (left, right) pair with equal
  * keys and rightTime ∈ [leftTime+lo, leftTime+hi] is emitted exactly
  * once. Pair-dedup / outer-count compositions stay OUTSIDE the
  * operator (post-filters and joins compose; the band scan does not).
  *
  * Scale/robustness notes (the AsofJoinExec contract):
  *  - ClusteredDistribution per side → EnsureRequirements
  *    co-partitions like a sort-merge join; requiredChildOrdering
  *    inserts LOCAL sorts only.
  *  - Callers pin equal explicit partition counts on both sides
  *    (`repartition(n, key)`) so AQE cannot coalesce the two shuffles
  *    to different widths under `zipPartitions`.
  *  - Per-partition state is the band's right-row deque: bounded by
  *    band density (rows per key per (hi−lo) window), not by input
  *    size — a hot key degrades toward its own band width, never the
  *    partition.
  */
case class RangeJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    lo: Long, hi: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

/** planner strategy: one physical choice, the per-partition band merge */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(l, r, lk, rk, lt, rt, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, hi) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    lo: Long, hi: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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
    val (loB, hiB) = (lo, hi)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val rBuf = ri.buffered
      // merge state: right rows of the CURRENT left key whose time is
      // ≤ the band's upper edge so far; sorted by time (insertion
      // order — the right side arrives time-sorted), evicted from the
      // head as the lower edge advances. Rows are copied in: the
      // underlying iterator reuses its UnsafeRow buffer.
      val band = scala.collection.mutable.ArrayDeque.empty[(Long, InternalRow)]
      var bandKey = 0L
      var bandKeyValid = false
      li.flatMap { lrow =>
        val lk = lkB.eval(lrow).asInstanceOf[Long]
        val lt = ltB.eval(lrow).asInstanceOf[Long]
        if (!bandKeyValid || bandKey != lk) {
          band.clear(); bandKey = lk; bandKeyValid = true
        }
        // advance the right pointer: discard smaller keys, admit
        // same-key rows up to the upper edge; never rewind
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val h = rBuf.head
          val rk = rkB.eval(h).asInstanceOf[Long]
          if (rk < lk) { rBuf.next(); () }
          else if (rk == lk) {
            val rt = rtB.eval(h).asInstanceOf[Long]
            if (rt <= lt + hiB) band.append((rt, rBuf.next().copy()))
            else advancing = false
          } else advancing = false
        }
        // evict below the lower edge (left times ascend, so the edge
        // only moves forward)
        while (band.nonEmpty && band.head._1 < lt + loB) band.removeHead()
        band.iterator.map { case (_, r) => proj(joined(lrow, r)) }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** public API: `RangeJoin(l, r, lKey, rKey, lTime, rTime, lo, hi)` —
  * emits l ⋈ r on equal keys with rTime ∈ [lTime+lo, lTime+hi]. */
object RangeJoin {
  def apply(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      lo: Long, hi: Long): DataFrame =
    GraftSqlBridge.ofRows(left.sparkSession, RangeJoinNode(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      GraftSqlBridge.expr(leftKey), GraftSqlBridge.expr(rightKey),
      GraftSqlBridge.expr(leftTime), GraftSqlBridge.expr(rightTime),
      lo, hi))
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise max-merge of pre-built HLL register arrays — the
  * HyperBall inner loop (graph_effective_diameter): each frontier
  * round unions a vertex's own registers with every in-neighbor's and
  * max-merges per vertex, so the group state is m longs regardless of
  * how many neighbor rows feed it. Merging registers is the SAME
  * associative/commutative/idempotent max [[HllAgg]] uses internally,
  * exposed over already-aggregated arrays instead of raw values —
  * exactly the mergeable-sketch property (Boldi–Vigna HyperBall,
  * Flajolet HLL) that turns an O(V²) exact ball census into O(V·m)
  * state per round.
  *
  * The 100 TB shape: the round's shuffle carries PARTIALLY-MERGED
  * registers (map-side combine over the edge partition), so traffic
  * is ∝ vertices × m, never ∝ edges × m.
  */
class HllMergeAgg(m: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(m > 0, s"m must be positive, got $m")

  override def zero: Array[Long] = Array.fill(m)(0L)

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] = {
    if (v == null) return buf
    merge(buf, v)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bottom-k-by-hash sampling aggregator — a MERGEABLE uniform
  * sample: keep the k (hash, id) pairs with the smallest hashes; the
  * union of two groups' samples is the sample of the union, so
  * partial aggregation composes exactly (the property a
  * collect-everything sample lacks) and the shuffle carries ≤ 2k
  * longs per group regardless of group size. With hashes from the
  * [[Md5Hash]] basis the sample is deterministic across JVMs,
  * executors, AND recomputable in DuckDB (a row_number-over-hash
  * oracle) — a bounded, hash-checked stand-in for reservoir sampling.
  *
  * Buffer layout: interleaved [h0,id0,h1,id1,...], sorted ascending by
  * (h, id), length ≤ 2k. Output: the ids alone, in (h, id) order.
  */
class BottomKAgg(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def less(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 < h2 || (h1 == h2 && i1 < i2)

  override def reduce(buf: Array[Long], x: (Long, Long)): Array[Long] = {
    val h = x._1; val id = x._2
    val n = buf.length / 2
    if (n == k && !less(h, id, buf(2 * k - 2), buf(2 * k - 1))) return buf
    var p = 0
    while (p < n && less(buf(2 * p), buf(2 * p + 1), h, id)) p += 1
    val m = math.min(n + 1, k)
    val out = new Array[Long](2 * m)
    System.arraycopy(buf, 0, out, 0, 2 * p)
    out(2 * p) = h; out(2 * p + 1) = id
    val tail = math.min(n - p, m - p - 1)
    if (tail > 0) System.arraycopy(buf, 2 * p, out, 2 * p + 2, 2 * tail)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val total = math.min((a.length + b.length) / 2, k)
    val out = new Array[Long](2 * total)
    var ia = 0; var ib = 0; var o = 0
    while (o < total) {
      val takeA = ib >= b.length / 2 || (ia < a.length / 2 &&
        less(a(2 * ia), a(2 * ia + 1), b(2 * ib), b(2 * ib + 1)))
      if (takeA) { out(2 * o) = a(2 * ia); out(2 * o + 1) = a(2 * ia + 1); ia += 1 }
      else { out(2 * o) = b(2 * ib); out(2 * o + 1) = b(2 * ib + 1); ib += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Array[Long] =
    Array.tabulate(buf.length / 2)(i => buf(2 * i + 1))

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
}

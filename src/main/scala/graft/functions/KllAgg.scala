package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed KLL-style mergeable quantile sketch — the fifth typed
  * aggregator (with [[MinHashAgg]], [[CountMinAgg]], [[HllAgg]],
  * [[BottomKAgg]]), and like them ENGINE-IDENTICAL on the
  * [[Md5Hash]] basis so the whole sketch is DuckDB-oracle-checkable
  * (`agg_quantile_kll`).
  *
  * Shape: a single adaptive level L and the survivor set
  * {(h, v) : tz(h) ≥ L}, where tz = trailing-zero count of the row's
  * 60-bit md5 hash. Level-L survival has probability 2^−L, so the
  * survivors are a uniform row sample of known rate and the sample
  * quantile estimates the population quantile. When the survivor
  * count exceeds the capacity k, COMPACTION = increment L and drop
  * the rows whose hash lacks the next zero bit — each compaction
  * halves the sample in expectation, exactly the level-doubling of a
  * KLL compactor hierarchy, but decided by CONTENT (the row's own
  * hash bits), not by a random even/odd coin.
  *
  * Why deviate from textbook KLL: the coin-flip compactor is
  * order-dependent (which rows share a buffer at compaction time
  * depends on partition order), so two runs of the same query can
  * produce different sketches and no external oracle can rebuild the
  * result. Hash-bit compaction makes the final state a PURE FUNCTION
  * of the input multiset: reduce/merge are associative and
  * commutative (final L = min{L : |{tz ≥ L}| ≤ k}, a data property),
  * so the sketch is identical across partitionings, JVMs, AND
  * rebuildable row-by-row in DuckDB. The price is estimator error
  * O(1/√k) (uniform-sample quantiles) instead of KLL's O(1/k) —
  * the documented tradeoff for determinism + oracle-checkability,
  * with the exact twin riding alongside in the query to show it.
  *
  * Buffer layout: [L, h0, v0, h1, v1, ...], items unsorted (the
  * survivor SET is what is deterministic; `finish` sorts). Bounded by
  * 1 + 2k longs regardless of group size — the 100 TB shape: shuffle
  * state per group is ~16 KB at k = 1024 while the exact twin sorts
  * every row.
  */
class KllAgg(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(k > 0, s"capacity must be positive, got $k")

  override def zero: Array[Long] = Array(0L) // level 0, no survivors

  private def items(buf: Array[Long]): Int = (buf.length - 1) / 2

  /** smallest level ≥ buf's with ≤ k survivors — drops items in place
    * conceptually (returns a fresh compacted array when anything drops) */
  private def adapt(buf: Array[Long]): Array[Long] = {
    var cur = buf
    while (items(cur) > k) {
      val lvl = cur(0) + 1
      var keep = 0
      var i = 1
      while (i < cur.length) {
        if (java.lang.Long.numberOfTrailingZeros(cur(i)) >= lvl) keep += 1
        i += 2
      }
      val out = new Array[Long](1 + 2 * keep)
      out(0) = lvl
      var o = 1; i = 1
      while (i < cur.length) {
        if (java.lang.Long.numberOfTrailingZeros(cur(i)) >= lvl) {
          out(o) = cur(i); out(o + 1) = cur(i + 1); o += 2
        }
        i += 2
      }
      cur = out
    }
    cur
  }

  override def reduce(buf: Array[Long], x: (Long, Long)): Array[Long] = {
    val (h, v) = x
    if (java.lang.Long.numberOfTrailingZeros(h) < buf(0)) return buf
    val out = java.util.Arrays.copyOf(buf, buf.length + 2)
    out(buf.length) = h; out(buf.length + 1) = v
    adapt(out)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val lvl = math.max(a(0), b(0))
    var keep = 0
    def count(src: Array[Long]): Unit = {
      var i = 1
      while (i < src.length) {
        if (java.lang.Long.numberOfTrailingZeros(src(i)) >= lvl) keep += 1
        i += 2
      }
    }
    count(a); count(b)
    val out = new Array[Long](1 + 2 * keep)
    out(0) = lvl
    var o = 1
    def copy(src: Array[Long]): Unit = {
      var i = 1
      while (i < src.length) {
        if (java.lang.Long.numberOfTrailingZeros(src(i)) >= lvl) {
          out(o) = src(i); out(o + 1) = src(i + 1); o += 2
        }
        i += 2
      }
    }
    copy(a); copy(b)
    adapt(out)
  }

  /** survivor VALUES sorted ascending — quantile extraction happens in
    * the query (shared lower-rank convention with the oracle SQL) */
  override def finish(buf: Array[Long]): Array[Long] = {
    val vs = Array.tabulate(items(buf))(i => buf(2 + 2 * i))
    java.util.Arrays.sort(vs)
    vs
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed HyperLogLog aggregator on the [[Md5Hash]] basis — the
  * third mergeable sketch (with [[MinHashAgg]] and [[CountMinAgg]]),
  * and like them ENGINE-IDENTICAL: the register array a group builds
  * here is bit-for-bit what the DuckDB oracle rebuilds from the raw
  * rows, so the estimate itself is hash-checked (`agg_hll_md5`,
  * `agg_hll_md5_union`) — unlike Spark's native `hll_sketch_agg`
  * whose Datasketches byte layout is engine-internal (that pair
  * stays, as the interop surface, with the exact twin as anchor).
  *
  * Shape: m registers (m a power of two); a value hashes to 63
  * uniform bits via md5-60 + affine permutation [[SeedIdx]]; the low
  * log2(m) bits pick a register, the remaining 54 the rank
  * (leading-zero count + 1, i.e. 55 − bitlength); registers keep the
  * max rank seen. Merging = element-wise max — associative,
  * commutative, idempotent, so partial aggregation and re-rollup
  * (nation → region) are exact-as-sketched. Buffer = m longs,
  * constant regardless of cardinality — the 100 TB story.
  *
  * Estimation happens OUTSIDE the aggregator, in the query, from the
  * registers (standard HLL: α·m²/Σ2^−M with the small-range
  * linear-counting correction) — deliberately, so the oracle can
  * apply the identical formula to its recomputed registers.
  */
class HllAgg(m: Int, seedIdx: Int = HllAgg.SeedIdx)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
  private val idxBits = java.lang.Integer.numberOfTrailingZeros(m)

  override def zero: Array[Long] = Array.fill(m)(0L)

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    if (v == null) return buf
    val h = Md5Hash.perm(Md5Hash.hash60(v), seedIdx) // 63 bits
    val b = (h & (m - 1)).toInt
    val w = h >>> idxBits
    // rank within the (63 − idxBits)-bit window: 1 for a leading one,
    // up to window+1 when w == 0
    val window = 63 - idxBits
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
    val rank = (window + 1 - bitlen).toLong
    if (rank > buf(b)) buf(b) = rank
    buf
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

object HllAgg {
  /** permutation index for the HLL hash — disjoint from MinHash (0+),
    * Count-Min ([[Md5Hash.CmSeedBase]]+) and the LSH planes (200+) */
  val SeedIdx = 300
}

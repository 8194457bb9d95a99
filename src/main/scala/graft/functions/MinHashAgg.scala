package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §2.12's planned custom
  * UDAF): folds a document's token stream into a k-wide signature of
  * per-permutation minimum hashes.
  *
  * The buffer is a mutable Array[Long] of k running minima — constant
  * size regardless of document length, so the shuffle for the
  * aggregation carries k longs per document, not the token sets.
  * That is what makes MinHash dedup feasible at 100 TB: the full
  * token explosion never crosses the wire.
  *
  * Hashing: the [[Md5Hash]] basis — ONE md5 per term to a 60-bit
  * integer, then k fixed affine permutations mod 2^63. Pure data, so
  * signatures are deterministic across JVMs/executors AND
  * recomputable in DuckDB SQL: the md5 basis is what flipped
  * dedup_near_minhash / dedup_cluster_lsh from property-tested to
  * hash-oracled. (Also cheaper than the former per-seed murmur: one
  * digest + k multiply-adds versus k string hashes.)
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  // constants materialized once per aggregator instance, not per row
  private val as = Array.tabulate(k)(Md5Hash.permA)
  private val bs = Array.tabulate(k)(Md5Hash.permB)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    val h = Md5Hash.hash60(term)
    var i = 0
    while (i < k) {
      val p = (as(i) * h + bs(i)) & Long.MaxValue
      if (p < buf(i)) buf(i) = p
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
}

object MinHashAgg {
  /** deterministic per-permutation hash — the exact per-term value the
    * aggregator minimizes (exposed for tests and sketch re-readers) */
  def hash(term: String, i: Int): Long = Md5Hash.perm(Md5Hash.hash60(term), i)

  /** estimated Jaccard similarity of two signatures */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }
}

private[functions] object ExpressionEncoderHelp {
  val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

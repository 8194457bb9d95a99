package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** Typed MinHash-signature aggregator (SURVEY §2.12's planned custom
  * UDAF): folds a document's token stream into a k-wide signature of
  * per-seed minimum hashes.
  *
  * The buffer is a mutable Array[Long] of k running minima — constant
  * size regardless of document length, so the shuffle for the
  * aggregation carries k longs per document, not the token sets.
  * That is what makes MinHash dedup feasible at 100 TB: the full
  * token explosion never crosses the wire.
  *
  * Hashing: MurmurHash3.stringHash with seed = band index — a pure
  * function of (term, i), identical on every JVM/executor, so
  * signatures are deterministic across runs and cluster layouts.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = MinHashAgg.hash(term, i)
      if (h < buf(i)) buf(i) = h
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
  /** deterministic per-seed 64-bit-ish hash (two murmur32 halves) */
  def hash(term: String, seed: Int): Long = {
    val lo = MurmurHash3.stringHash(term, seed)
    val hi = MurmurHash3.stringHash(term, seed ^ 0x5bd1e995)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

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

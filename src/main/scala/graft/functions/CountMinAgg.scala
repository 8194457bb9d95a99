package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Count-Min sketch aggregator — the mergeable frequency sketch
  * (SURVEY §2.12's Aggregator tier, alongside [[MinHashAgg]]): folds a
  * term stream into a d×w counter grid whose estimate for any term is
  * min over its d cells — never an underestimate, overestimate bounded
  * by ~(e/w)·N with probability 1−e^−d.
  *
  * Why this matters at 100 TB: exact frequent-term counting shuffles
  * one (term, count) pair per DISTINCT term — unbounded for web-scale
  * vocabularies — while the sketch's partial-aggregation state is a
  * CONSTANT d·w longs per partition regardless of vocabulary, and two
  * sketches merge by cell-wise addition (associative + commutative, so
  * Spark's partial/final split and any re-aggregation rollup are
  * exact-as-sketched). The same state can roll up source → corpus the
  * way `agg_hll_union` rolls up distinct sketches.
  *
  * Hashing: the [[Md5Hash]] basis — one md5 per term to a 60-bit
  * integer, then d affine permutations (indices [[Md5Hash.CmSeedBase]]
  * onward, disjoint from MinHash's) taken mod w. Pure data, identical
  * on every JVM/executor AND in DuckDB SQL — the basis that flipped
  * text_cm_frequent_terms from property-tested to hash-oracled. The
  * exact constants matter to anyone re-reading a persisted sketch.
  *
  * Null terms are ignored (SQL-aggregate convention: nulls don't
  * count), so a nullable upstream column cannot fail the aggregation.
  */
class CountMinAgg(d: Int, w: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(d * w)(0L)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    if (term == null) return buf
    val h = Md5Hash.hash60(term)
    var r = 0
    while (r < d) {
      buf(r * w + (Md5Hash.perm(h, Md5Hash.CmSeedBase + r) % w).toInt) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = CountMinAgg.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = CountMinAgg.arrayLong
}

object CountMinAgg {
  /** deterministic row-r bucket for a term */
  def bucket(term: String, r: Int, w: Int): Int =
    (Md5Hash.perm(Md5Hash.hash60(term), Md5Hash.CmSeedBase + r) % w).toInt

  /** point estimate = min over the term's d cells (≥ true count) */
  def estimate(sketch: Array[Long], term: String, d: Int, w: Int): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = sketch(r * w + bucket(term, r, w))
      if (c < est) est = c
      r += 1
    }
    est
  }

  private[functions] val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

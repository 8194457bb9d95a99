package graft

import org.apache.spark.sql.functions._

/** Round-8 pins: the KllAgg sketch contract (VERDICT r7 #1 — the one
  * operator of 347 that shipped without oracle or test).
  *
  * The aggregator's whole design claim is that the final state is a
  * PURE FUNCTION of the input multiset: final level
  * L* = min{L : |{tz(h) ≥ L}| ≤ k} and survivors = {(h,v) : tz(h) ≥
  * L*}, independent of arrival order, partitioning, or merge tree.
  * These tests pin exactly that law plus the O(1/√k) estimator bound
  * the scaladoc documents.
  */
class Round8Spec extends SparkTestBase {

  private def tz(h: Long): Int = java.lang.Long.numberOfTrailingZeros(h)

  /** brute-force replica of the sketch law over a raw multiset */
  private def replica(k: Int, xs: Seq[(Long, Long)]): (Long, Seq[Long]) = {
    val lvl = (0 to 64).find(l => xs.count(x => tz(x._1) >= l) <= k).get
    (lvl.toLong, xs.filter(x => tz(x._1) >= lvl).map(_._2).sorted)
  }

  /** fixture: deterministic 60-bit hashes via the engine's own md5
    * basis, values = index (so survivor identity is checkable) */
  private def fixture(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (functions.Md5Hash.hash60(s"kll-$i"), i.toLong))

  test("KllAgg finish == min-level law replica (the oracle's formula)") {
    val k = 16
    val agg = new functions.KllAgg(k)
    for (n <- Seq(0, 1, 15, 16, 17, 100, 1000)) {
      val xs = fixture(n)
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      val (lvl, surv) = replica(k, xs)
      assert(buf(0) == lvl, s"level mismatch at n=$n")
      assert(agg.finish(buf).toSeq == surv, s"survivors mismatch at n=$n")
    }
  }

  test("KllAgg is order-independent and merge-associative") {
    val k = 16
    val agg = new functions.KllAgg(k)
    val xs = fixture(500)
    def sketch(part: Seq[(Long, Long)]): Array[Long] =
      part.foldLeft(agg.zero)(agg.reduce)
    val whole = sketch(xs)
    // reversed arrival order
    assert(agg.finish(sketch(xs.reverse)).toSeq == agg.finish(whole).toSeq)
    // 7-way partitioning merged left-fold vs right-fold vs pairwise
    val parts = xs.grouped(72).map(sketch).toSeq
    val leftFold = parts.reduceLeft(agg.merge)
    val rightFold = parts.reduceRight(agg.merge)
    def pairwise(ps: Seq[Array[Long]]): Array[Long] =
      if (ps.size == 1) ps.head
      else pairwise(ps.grouped(2).map(g =>
        if (g.size == 2) agg.merge(g(0), g(1)) else g(0)).toSeq)
    for (m <- Seq(leftFold, rightFold, pairwise(parts))) {
      assert(m(0) == whole(0))
      assert(agg.finish(m).toSeq == agg.finish(whole).toSeq)
    }
    // merging in a partition of all-dropped rows (level below final)
    // is a no-op
    assert(agg.finish(agg.merge(whole, agg.zero)).toSeq
      == agg.finish(whole).toSeq)
  }

  test("agg_quantile_kll: sample quantiles within O(1/√k) of exact") {
    val rows = operators.Aggregates.queries("agg_quantile_kll")(spark, sf001)
      .collect()
    assert(rows.length == 3) // A, N, R
    // k = 1024 → uniform-sample quantile error ~ 1/√k ≈ 3% of the
    // group's rank range; 15% relative tolerance is ~5 sigma
    for (r <- rows; (ki, ei) <- Seq((2, 5), (3, 6), (4, 7))) {
      val kll = r.getDouble(ki)
      val exact = r.getDouble(ei)
      assert(math.abs(kll - exact) / exact < 0.15,
        s"${r.getString(0)}: kll=$kll exact=$exact")
      // n_sample never exceeds capacity k
      assert(r.getLong(1) <= operators.Aggregates.KllK)
    }
  }
}

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

  // ---- round-8 graph additions (VERDICT r7 #4/#5/#6) ----

  /** orders/lineitem fixture rows in the GraphSpec shape */
  private def writeGraph(dir: String, pairs: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    writeFixture(dir, "orders", pairs.zipWithIndex.map { case ((c, _), i) =>
      ((i + 1).toLong, c, "O", 10.0, ts, "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", pairs.zipWithIndex.map { case ((_, sp), i) =>
      ((i + 1).toLong, 100L + i, sp, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"))
  }

  /** like writeGraph but with explicit order keys (so the %10 delta
    * convention can be planted) */
  private def writeGraphKeyed(dir: String, rows: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    writeFixture(dir, "orders", rows.map { case (ok, c, _) =>
      (ok, c, "O", 10.0, ts, "1-URGENT")
    }.distinct.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", rows.zipWithIndex.map {
      case ((ok, _, sp), i) =>
        (ok, 100L + i, sp, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"))
  }

  test("HllMergeAgg max-merge of register arrays == HllAgg over the union") {
    val m = operators.GraphOps.HbM
    val hll = new functions.HllAgg(m, operators.GraphOps.HbSeedIdx)
    val mrg = new functions.HllMergeAgg(m)
    def regsOf(xs: Seq[String]) = xs.foldLeft(hll.zero)(hll.reduce)
    val a = (0 until 300).map(i => s"a-$i")
    val b = (150 until 500).map(i => s"a-$i") // overlaps a
    val merged = mrg.merge(regsOf(a).clone(), regsOf(b))
    assert(merged.toSeq == regsOf(a ++ b).toSeq,
      "register max-merge must equal the sketch of the union " +
        "(the HyperBall propagation law)")
    // idempotent: merging a sketch with itself changes nothing
    assert(mrg.merge(regsOf(a).clone(), regsOf(a)).toSeq == regsOf(a).toSeq)
  }

  test("graph_effective_diameter: deep planted path saturates the cap VISIBLY") {
    // customers chosen so EVERY one passes the hb| seed-sampling mod
    // (tiny fixtures would otherwise sample zero seeds); suppliers
    // chosen to fail it, so the readout is exactly the 8 path
    // customers. Path c1-s1-c2-s2-...-c8 has diameter 14 — ball sizes
    // keep growing ≥ ~9%/round through the HbMaxRounds cap, so the
    // convergence loop never fires and the query must SAY so
    // (saturated=1; r8's fixed horizon reported 3 silently here).
    def isSeed(vstr: String): Boolean =
      functions.Md5Hash.hash60(s"hb|$vstr") % operators.GraphOps.HbSeedMod == 0
    val custs = Iterator.from(1).map(_.toLong)
      .filter(c => isSeed(c.toString)).take(8).toSeq
    val supps = Iterator.from(1).map(_.toLong)
      .filter(sp => !isSeed((sp + operators.GraphOps.SupplierVertexOffset).toString))
      .take(7).toSeq
    val pairs = (0 until 7).flatMap(i =>
      Seq((custs(i), supps(i)), (custs(i + 1), supps(i))))
    val dir = tempDir()
    writeGraph(dir, pairs)
    val rows = operators.GraphOps.queries("graph_effective_diameter")(spark, dir)
      .collect()
    assert(rows.length == operators.GraphOps.HbMaxRounds + 1,
      s"one row per h = 0..cap, got ${rows.length}")
    val byH = rows.map(r => r.getLong(0) -> r).toMap
    assert(byH.values.forall(_.getLong(1) == 8L), "readout = the 8 seed customers")
    // N(0) estimates 8 singleton balls — linear counting is near-exact
    assert(math.abs(byH(0L).getDouble(2) - 8.0) < 0.5,
      s"nf(0) should be ~8, got ${byH(0L).getDouble(2)}")
    assert(rows.forall(_.getLong(5) == 1L),
      s"cap hit while still growing must flag saturated: ${rows.mkString(";")}")
    assert(rows.forall(_.getLong(4) > 3L),
      s"eff_diameter must track the extended horizon, not r8's fixed 3: " +
        rows.mkString(";"))
    // shares end at 1.0 at the horizon row
    assert(byH(operators.GraphOps.HbMaxRounds.toLong).getDouble(3) == 1.0)
  }

  test("graph_cc_incremental: delta bridge merges two base components ≡ full recompute") {
    // base: {c1,c2,s1} and {c3,c4,s2}; delta order 10 bridges c1→s2
    val off = operators.GraphOps.SupplierVertexOffset
    val dir = tempDir()
    writeGraphKeyed(dir, Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 2L), (4L, 4L, 2L),
      (10L, 1L, 2L)))
    val got = operators.GraphOps.queries("graph_cc_incremental")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val expected = Map(
      1L -> ((1L, 1L, false)), 2L -> ((1L, 1L, false)),
      (off + 1L) -> ((1L, 1L, false)),
      3L -> ((1L, 3L, true)), 4L -> ((1L, 3L, true)),
      (off + 2L) -> ((1L, 3L, true)))
    assert(got == expected, s"got $got")
    // ≡ full recompute: the merged labels equal CC over ALL edges
    import org.apache.spark.sql.functions._
    val allEdges = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + off).as("dst")).distinct()
    val full = operators.GraphOps.connectedComponents(allEdges, numParts = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map { case (v, (l, _, _)) => v -> l } == full,
      "incremental merge must equal the from-scratch fixpoint")
  }

  test("graph_betweenness_sampled: planted star scores the hub with all pairs") {
    // 4 customers on one supplier: every customer is sampled (≤ 32
    // seeds exist), every pair (6 ≤ 64) is sampled, each pair's unique
    // shortest path brokers through the hub → betweenness(hub) = 6
    val off = operators.GraphOps.SupplierVertexOffset
    val dir = tempDir()
    writeGraph(dir, Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
    val rows = operators.GraphOps.queries("graph_betweenness_sampled")(spark, dir)
      .collect()
    assert(rows.length == 1, s"only the hub brokers: ${rows.mkString(";")}")
    assert(rows(0).getLong(0) == off + 1L)
    assert(rows(0).getDouble(1) == 6.0, s"got ${rows(0).getDouble(1)}")
  }

  test("dedup_embedding_cluster: union-find replica over LSH-bucketed cosine pairs") {
    // independent driver-side replica of the whole semantic-dedup
    // composition at sf0.001: quantize components exactly like the
    // engine (double → DECIMAL(20,8) → 1e-8-unit long), bucket on the
    // 16 plane-sign bits, verify same-bucket pairs at the 4dp-rounded
    // cosine ≥ 0.9, union-find with min-label roots — must reproduce
    // every (cluster, cluster_size, is_canonical) row
    val got = operators.DedupOps.queries("dedup_embedding_cluster")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val emb = Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def q(x: Double): Long =
      (BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(100000000L)).toLongExact
    val planes = operators.VectorOps.clusterPlanes
    def signature(v: Array[Double]): Long =
      planes.indices.map { i =>
        val s = v.indices.map(j => q(v(j)) * planes(i)(j)).sum
        if (s > 0) 1L << i else 0L
      }.sum
    def bandsOf(sig: Long): Seq[(Int, Long)] =
      (0 until operators.DedupOps.EmbClusterBands).map(j => j ->
        ((sig >> (j * operators.DedupOps.EmbClusterBandBits)) &
          ((1L << operators.DedupOps.EmbClusterBandBits) - 1)))
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (j <- a.indices) { dot += a(j) * b(j); nx += a(j) * a(j); ny += b(j) * b(j) }
      BigDecimal(dot / math.sqrt(nx * ny))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = emb.toMap
    val cand = (for {
      (id, v) <- emb.iterator
      bd <- bandsOf(signature(v))
    } yield bd -> id).toSeq.groupBy(_._1).values
      .flatMap(g => g.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val parent = scala.collection.mutable.Map(emb.map(e => e._1 -> e._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- cand if cos4(byId(a), byId(b)) >= operators.DedupOps.EmbClusterTau) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = emb.map { case (id, _) => id -> find(id) }.toMap
    val size = label.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val expected = emb.map { case (id, _) =>
      id -> ((label(id), size(label(id)), id == label(id)))
    }.toMap
    assert(got.size == emb.length, "one row per vector")
    assert(got == expected,
      s"diff: ${(got.toSet -- expected.toSet).take(5)} vs ${(expected.toSet -- got.toSet).take(5)}")
    // the corpus actually exercises the path: non-singleton clusters
    // exist, including a transitive (size ≥ 3) chain — the CC step is
    // doing real work, not labeling singletons
    assert(size.values.exists(_ >= 3L),
      "sf0.001 must produce at least one transitive semantic cluster")
  }

  test("vec_ann_lsh_multiprobe dominates single-probe LSH") {
    // the recall-knob contract: multiprobe searches a SUPERSET of the
    // single-probe candidates (own bucket ⊂ probe set), so per vector
    // the best-found cosine can only improve — and on this corpus at
    // least one vector must strictly improve (the probes do work) and
    // at least one winner must arrive via a flipped bucket
    val single = operators.VectorOps.queries("vec_ann_lsh")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val multi = operators.VectorOps.queries("vec_ann_lsh_multiprobe")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getInt(3)))).toMap
    assert(single.keySet.subsetOf(multi.keySet),
      "every single-probe vector must still find a neighbor")
    for ((v, cs) <- single) {
      assert(multi(v)._1 >= cs, s"vec $v: multiprobe ${multi(v)._1} < single $cs")
    }
    // at sf0.001 the recall gain is COVERAGE: the corpus occupies
    // ~500 of 2^16 buckets, so most vectors are alone in theirs and
    // single-probe finds nothing — probing the two nearest flipped
    // buckets must recover some of them (measured: 4 → 16 covered)
    assert(multi.size > single.size,
      s"multiprobe must cover more vectors (single ${single.size}, " +
        s"multi ${multi.size})")
    assert(multi.exists { case (v, (_, p)) => !single.contains(v) && p > 0 },
      "newly covered vectors must arrive via a flipped bucket")
  }

  test("dedup_embedding_cluster: planted near-dups cluster, orthogonal vectors stay singleton") {
    // the production-threshold story on a controlled corpus: two
    // near-identical vectors (cos ≈ 1 ≫ τ — identical sign bits, so
    // EVERY band collides and banding recall is exact), one shifted
    // copy still above τ (transitive chain), and one orthogonal
    // vector (cos ≈ 0 < τ — must stay singleton even when a band
    // happens to collide, pinning that the cosine VERIFY gate, not
    // the banding, decides membership)
    import spark.implicits._
    val dir = tempDir()
    val base = Array.tabulate(64)(j => math.sin(j * 1.7).toFloat)
    val nudge = base.zipWithIndex.map { case (x, j) =>
      x + (if (j % 7 == 0) 0.01f else -0.005f) }
    val nudge2 = base.zipWithIndex.map { case (x, j) =>
      x + (if (j % 5 == 0) -0.012f else 0.004f) }
    val ortho = Array.tabulate(64)(j => math.cos(j * 1.7).toFloat)
    writeFixture(dir, "embeddings", Seq(
      (1L, base.toSeq, "A"), (2L, nudge.toSeq, "A"),
      (3L, nudge2.toSeq, "A"), (4L, ortho.toSeq, "B"))
      .toDF("vec_id", "embedding", "label"))
    val got = operators.DedupOps.queries("dedup_embedding_cluster")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 3L, true)), 2L -> ((1L, 3L, false)), 3L -> ((1L, 3L, false)),
      4L -> ((4L, 1L, true))), s"got $got")
  }

  test("vec_ann_multiprobe_recall_curve: monotone in the probe budget") {
    // the curve's contract: raising nprobe only ADDS candidates (rk ≤
    // nprobe is a widening filter), so candidate volume and recall@1
    // are nondecreasing, and every present level is internally sane
    val rows = operators.VectorOps
      .queries("vec_ann_multiprobe_recall_curve")(spark, sf001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty, "some probe level must produce candidates")
    for (w <- rows.sliding(2) if w.length == 2) {
      val (a, b) = (w(0), w(1))
      assert(b._3 >= a._3, s"candidates must be nondecreasing: $a -> $b")
      assert(b._4 >= a._4, s"recall@1 must be nondecreasing: $a -> $b")
    }
    rows.foreach { r =>
      assert(r._2 == 100L, s"probe set is vec_id < 100: $r")
      assert(r._4 >= 0.0 && r._4 <= 1.0, s"recall out of range: $r")
    }
  }

  test("graph_hyperball_error_audit: sketch error within the m=64 operating point") {
    // the audit's own sanity at sf0.001: radius-0 balls are the seeds
    // themselves (nf_exact(0) = n_seeds), exact mass is monotone in h,
    // and every round's relative error stays far inside the ~13%
    // m=64 design point (≤ 30% leaves ~2σ of slack on 3 seeds)
    val rows = operators.GraphOps.queries("graph_hyperball_error_audit")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    // r9: the horizon is convergence-detected — one row per round up
    // to wherever the readout stopped growing (≥ h=0..1, ≤ the cap)
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq &&
      rows.length >= 2 &&
      rows.length <= operators.GraphOps.HbMaxRounds + 1,
      s"contiguous rounds up to the detected horizon: ${rows.mkString(";")}")
    assert(rows.head._3 == rows.head._2, "radius-0 ball mass = seed count")
    for (w <- rows.sliding(2) if w.length == 2)
      assert(w(1)._3 >= w(0)._3, s"exact mass must be monotone: ${w.toSeq}")
    rows.foreach { r =>
      assert(r._4 <= 0.30, s"relative error beyond the design point: $r")
    }
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

package graft

import org.apache.spark.sql.functions._

/** Round-4c additions: bigram-LM perplexity scoring, sub-document
  * block dedup, quantized HITS, MAD outliers, Theil–Sen trend. */
class Round4cSpec extends SparkTestBase {

  private def r4d(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eventsDf(rows: (Long, Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def ns(hours: Long): Long = 1577836800L * 1000000000L +
    hours * 3600L * 1000000000L

  test("pipeline_lm_perplexity: hand corpus matches the add-one bigram model") {
    val dir = tempDir()
    import spark.implicits._
    // corpus bigrams: doc1 = (a b)(b a)(a b), doc2 = (a b)
    // c2("a b") = 3, c2("b a") = 1; c1(a) = 3, c1(b) = 1; V = 2
    writeFixture(dir, "documents", Seq(
      (1L, "a b a b", "en", "src0", 7L),
      (2L, "a b", "en", "src1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("pipeline_lm_perplexity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val lpAB = r4d(math.log(4.0 / 5.0)) // (3+1)/(3+2)
    val lpBA = r4d(math.log(2.0 / 3.0)) // (1+1)/(1+2)
    // decimal-exact weighted sums, then the engine's final divisions
    val slp1 = (BigDecimal(lpAB) * 2 + BigDecimal(lpBA)).toDouble
    val exp1 = (1L, 3L, r4d(-slp1 / 3), r4d(math.exp(-slp1 / 3)))
    val exp2 = (2L, 1L, r4d(-lpAB), r4d(math.exp(-lpAB)))
    assert(got == Seq(exp1, exp2), s"got $got")
  }

  test("pipeline_lm_perplexity: single-token docs are absent; rows = scorable docs") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "only", "en", "src0", 4L),
      (2L, "two tokens", "en", "src1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("pipeline_lm_perplexity")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("dedup_shared_blocks: planted shared passage scores exactly") {
    val dir = tempDir()
    import spark.implicits._
    val w = operators.DedupOps.BlockW
    def blk(p: String) = (1 to w).map(i => s"$p$i").mkString(" ")
    writeFixture(dir, "documents", Seq(
      (1L, blk("a") + " " + blk("b"), "en", "s0", 0L), // A|B
      (2L, blk("a") + " " + blk("c"), "en", "s1", 0L), // A|C — shares A
      (3L, blk("d") + " " + blk("d"), "en", "s2", 0L), // D|D intra-repeat
      (4L, (1 until w).map(i => s"e$i").mkString(" "), "en", "s3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.DedupOps.queries("dedup_shared_blocks")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // doc 4 has no full block → absent; doc 3's repeat dedups to one
    // distinct block shared with nobody
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0)), s"got $got")
  }

  test("graph_hits_bounded equals a driver-side exact BigInt recompute at sf0.001") {
    val got = operators.GraphOps.queries("graph_hits_bounded")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val e = operators.GraphOps.edges(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct
    def step(state: Map[Long, BigInt], byDst: Boolean): Map[Long, BigInt] = {
      val raw =
        if (byDst) e.groupBy(_._2).map { case (v, es) =>
          v -> es.map(ed => state(ed._1)).sum }
        else e.groupBy(_._1).map { case (v, es) =>
          v -> es.map(ed => state(ed._2)).sum }
      val framed = verts.map(v => v -> raw.getOrElse(v, BigInt(0)))
      val tot = framed.map(_._2).sum
      framed.map { case (v, r) => v -> r * 1000000 / tot }.toMap
    }
    var h = verts.map(_ -> BigInt(1000000)).toMap
    var a: Map[Long, BigInt] = null
    for (_ <- 1 to operators.GraphOps.HitsRounds) {
      a = step(h, byDst = true)
      h = step(a, byDst = false)
    }
    def out(x: BigInt): Double = ((x + 50) / 100).toDouble / 10000.0
    assert(got.keySet == verts.toSet)
    got.foreach { case (v, (hub, auth)) =>
      assert(hub == out(h(v)) && auth == out(a(v)),
        s"vertex $v: ($hub,$auth) vs (${out(h(v))},${out(a(v))})")
    }
    // the bipartite structure must show: customers are pure hubs,
    // suppliers pure authorities
    val off = operators.GraphOps.SupplierVertexOffset
    got.foreach { case (v, (hub, auth)) =>
      if (v >= off) assert(hub == 0.0, s"supplier $v has hub $hub")
      else assert(auth == 0.0, s"customer $v has auth $auth")
    }
  }

  test("vec_pq_adc: a code-identical twin of a probe is its rank-1 neighbor") {
    val dir = tempDir()
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextFloat())
    val base = (0 until 16).map(i => (i.toLong, vec(), i % 10))
    val v16 = (16L, base(3)._2, 3)  // exact copy of vector 3
    val v17 = (17L, base(7)._2, 7)  // exact copy of vector 7
    val v18 = (18L, vec(), 8)
    writeFixture(dir, "embeddings", (base :+ v16 :+ v17 :+ v18)
      .toDF("vec_id", "embedding", "label"))
    val got = operators.VectorOps.queries("vec_pq_adc")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    // 10 probes × top-3, ranks 1..3, ADC non-decreasing within a probe
    assert(got.length == 30)
    got.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._4).sorted.toSeq == Seq(1, 2, 3))
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"probe $p distances not sorted: ${byRank.toSeq}")
    }
    // the copy shares its original's codes exactly, so its ADC to that
    // probe is Σ min-per-subspace — the smallest achievable → rank 1
    val r1 = got.filter(_._4 == 1).map(t => t._1 -> t._2).toMap
    assert(r1(3L) == 16L, s"probe 3 rank-1 is ${r1(3L)}")
    assert(r1(7L) == 17L, s"probe 7 rank-1 is ${r1(7L)}")
  }

  test("join_asof_forward: same-ts purchase matches, trailing view gets nulls") {
    val dir = tempDir()
    writeFixture(dir, "events", eventsDf(
      (1L, ns(0), 1L, "view", 1.0),
      (2L, ns(0), 1L, "purchase", 1.0),   // tie: at-or-after includes it
      (3L, ns(10), 1L, "view", 1.0),      // no later purchase → nulls
      (4L, ns(2), 2L, "view", 1.0),
      (5L, ns(7), 2L, "purchase", 1.0)))  // 5 hours later
    val got = operators.Joins.queries("join_asof_forward")(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == Seq(
      (1L, Some(0L)),
      (3L, None),
      (4L, Some(5L * 3600L * 1000000L))), s"got $got")
  }

  test("win_running_distinct: returning users are not recounted") {
    val dir = tempDir()
    // u1 appears on day 0 and day 1 (second appearance is not new),
    // u2 first appears on day 1
    writeFixture(dir, "events", eventsDf(
      (1L, ns(1), 1L, "a", 1.0),
      (2L, ns(25), 1L, "a", 1.0),
      (3L, ns(26), 2L, "a", 1.0)))
    val got = operators.Windows.queries("win_running_distinct")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", 1L, 1L), ("a", 1L, 2L)), s"got $got")
  }

  test("pipeline_source_mix: sqrt quotas floor at 1 and cap at source size") {
    val dir = tempDir()
    import spark.implicits._
    // s0: 4 docs (w=2), s1: 1 doc (w=1) → quotas cap at source size
    writeFixture(dir, "documents", Seq(
      (1L, "alpha words one", "en", "s0", 15L),
      (2L, "beta words two", "en", "s0", 14L),
      (3L, "gamma words three", "en", "s0", 17L),
      (4L, "delta words four", "en", "s0", 16L),
      (5L, "epsilon words five", "en", "s1", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("pipeline_source_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("s0", 4L, 4L, 4L, "1,2,3,4"),
      ("s1", 1L, 1L, 1L, "5")), s"got $got")
  }

  test("agg_corr_pairs: perfectly (anti)correlated hand columns hit ±1") {
    val dir = tempDir()
    import spark.implicits._
    // q ∝ p (corr 1), dd anti-monotone to both (corr −1)
    writeFixture(dir, "lineitem", Seq(
      (1L, 1L, 1L, 1, 1.0, 2.0, 0.03, 0.0, "A", "O",
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
      (2L, 2L, 2L, 1, 2.0, 4.0, 0.02, 0.0, "A", "O",
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
      (3L, 3L, 3L, 1, 3.0, 6.0, 0.01, 0.0, "A", "O",
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    val got = operators.Aggregates.queries("agg_corr_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq(
      ("discount_extendedprice", 3L, -1.0),
      ("quantity_discount", 3L, -1.0),
      ("quantity_extendedprice", 3L, 1.0)), s"got $got")
  }

  test("join_null_safe_eq: NULL keys match each other once, pre-aggregated") {
    val dir = tempDir()
    import spark.implicits._
    // nation 3 nulls on both sides: 2 customers × 1 supplier → one row
    writeFixture(dir, "customer", Seq(
      (1L, "c1", 3, 0.0, "BUILDING"), (2L, "c2", 3, 0.0, "BUILDING"),
      (3L, "c3", 5, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    writeFixture(dir, "supplier", Seq(
      (1L, "s1", 3, 0.0), (2L, "s2", 5, 0.0), (3L, "s3", 7, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    val got = operators.Joins.queries("join_null_safe_eq")(spark, dir)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0),
        r.getLong(1), r.getLong(2))).toSeq
    // NULLS FIRST ordering; nation 7 has no customers → inner-dropped
    assert(got == Seq((-1, 2L, 1L), (5, 1L, 1L)), s"got $got")
  }

  test("text_hapax_stats: type/token and hapax ratios on a hand doc") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "a a b", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("text_hapax_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq((1L, 3L, 2L, 1L, 0.6667, 0.5)), s"got $got")
  }

  test("graph_pagerank_personalized equals a driver-side quantized recompute at sf0.001") {
    val got = operators.GraphOps.queries("graph_pagerank_personalized")(
      spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e = operators.GraphOps.edges(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (e ++ e.map(_.swap)).distinct
    val verts = sym.map(_._1).distinct
    val odeg = sym.groupBy(_._1).map { case (v, es) => v -> es.size }
    val seeds = verts.sorted.take(10).toSet
    def r0(v: Long) = if (seeds(v)) 1.0 else 0.0
    var pr = verts.map(v => v -> r0(v)).toMap
    for (_ <- 1 to operators.GraphOps.PrRounds) {
      // mirror the engine arithmetic: pr/odeg in double, quantized to
      // DECIMAL(28,12) HALF_UP, summed exactly, cast back to double
      val sc = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { ed =>
          BigDecimal(pr(ed._1) / odeg(ed._1))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }
      pr = verts.map(v => v -> (0.15 * r0(v) + 0.85 * sc.getOrElse(v, 0.0)))
        .toMap
    }
    val exp = pr.map { case (v, p) => v -> r4d(p) }.filter(_._2 > 0.0)
    assert(got.keySet == exp.keySet,
      s"vertex sets differ: ${(got.keySet diff exp.keySet).take(5)} / " +
        s"${(exp.keySet diff got.keySet).take(5)}")
    got.foreach { case (v, p) =>
      assert(p == exp(v), s"vertex $v: $p vs ${exp(v)}") }
    // restart mass: seeds (which are connected here) must carry rank
    seeds.foreach(sv => assert(got.getOrElse(sv, 0.0) > 0.0,
      s"seed $sv lost its restart mass"))
  }

  test("diag_outlier_mad: planted wild hour is the only outlier") {
    val dir = tempDir()
    // hourly sums 1..9 and 100: median 5.5, deviations median 2.5,
    // cutoff 4.4478·2.5 = 11.1195 → only the 94.5 deviation flags
    val vals = (1 to 9).map(_.toDouble) :+ 100.0
    writeFixture(dir, "events", eventsDf(
      vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, ns(i.toLong), 1L, "a", v) }: _*))
    val got = operators.MiningOps.queries("diag_outlier_mad")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == Seq(("a", 10L, 5.5, 2.5, 1L)), s"got $got")
  }

  test("ts_burstiness: hand hourly counts give the exact Fano factor") {
    val dir = tempDir()
    // hour 0: 1 event, hour 1: 3 events → mean 2, var (10/2 − 4) = 1,
    // fano 0.5
    writeFixture(dir, "events", eventsDf(
      (1L, ns(0), 1L, "a", 1.0),
      (2L, ns(1), 1L, "a", 1.0), (3L, ns(1), 2L, "a", 1.0),
      (4L, ns(1), 3L, "a", 1.0)))
    val got = operators.TimeSeriesOps.queries("ts_burstiness")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("a", 2L, 2.0, 0.5)), s"got $got")
  }

  test("mine_path_trigrams: per-user ordered trigrams, ties break on path") {
    val dir = tempDir()
    writeFixture(dir, "events", eventsDf(
      (1L, ns(0), 1L, "a", 1.0), (2L, ns(1), 1L, "b", 1.0),
      (3L, ns(2), 1L, "a", 1.0), (4L, ns(3), 1L, "b", 1.0)))
    val got = operators.MiningOps.queries("mine_path_trigrams")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>a", 1L), ("b>a>b", 1L)), s"got $got")
  }

  test("mine_user_entropy: hand history matches the entropy identity") {
    val dir = tempDir()
    // user 1: types a,a,b → H = ln 3 − round(2·ln 2, 4)/3
    writeFixture(dir, "events", eventsDf(
      (1L, ns(0), 1L, "a", 1.0), (2L, ns(1), 1L, "a", 1.0),
      (3L, ns(2), 1L, "b", 1.0)))
    val got = operators.MiningOps.queries("mine_user_entropy")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val expH = r4d(math.log(3.0) - r4d(2.0 * math.log(2.0)) / 3)
    assert(got == Seq((1L, 3L, 2L, expH)), s"got $got vs $expH")
  }

  test("ts_theil_sen: linear series recovers its slope with all pairs") {
    val dir = tempDir()
    // hours 0,1,2 with sums 1,3,5 → three pairwise slopes, all 2.0
    writeFixture(dir, "events", eventsDf(
      (1L, ns(0), 1L, "a", 1.0), (2L, ns(1), 1L, "a", 3.0),
      (3L, ns(2), 1L, "a", 5.0)))
    val got = operators.TimeSeriesOps.queries("ts_theil_sen")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq(("a", 3L, 2.0)), s"got $got")
  }
}

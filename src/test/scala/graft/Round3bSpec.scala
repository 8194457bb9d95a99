package graft

import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the round-3 widening batch: bag set
  * ops, full outer join, deterministic mode / weighted average /
  * multi-distinct, bigram top-k, the capped inverted index,
  * neighborhood Jaccard, and the codebook balance audit. */
class Round3bSpec extends SparkTestBase {

  private def custRow(k: Long, nat: Int, bal: Double, seg: String) =
    (k, s"Customer#$k", nat, bal, seg)

  test("set_intersect_all / set_except_all keep bag multiplicities") {
    val dir = tempDir()
    import spark.implicits._
    // nation 1: 3 BUILDING rows, 2 of any segment with bal > 5000
    // nation 2: 1 BUILDING row, 0 rows with bal > 5000
    writeFixture(dir, "customer", Seq(
      custRow(1L, 1, 6000.0, "BUILDING"),
      custRow(2L, 1, 7000.0, "MACHINERY"),
      custRow(3L, 1, 100.0, "BUILDING"),
      custRow(4L, 1, 200.0, "BUILDING"),
      custRow(5L, 2, 300.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    val inter = operators.SortsAndSets.queries("set_intersect_all")(spark, dir)
      .collect().map(_.getInt(0)).toSeq
    // min(3 BUILDING, 2 high-bal) = 2 copies of nation 1; nation 2 drops
    assert(inter == Seq(1, 1), s"got $inter")
    val exc = operators.SortsAndSets.queries("set_except_all")(spark, dir)
      .collect().map(_.getInt(0)).toSeq
    // max(3 - 2, 0) = 1 copy of nation 1; nation 2 keeps its 1 - 0 = 1
    assert(exc == Seq(1, 2), s"got $exc")
  }

  test("join_full_outer surfaces both unmatched sides with zeroed counts") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "orders", Seq(
      (1L, 10L, "O", 10.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"),
      (2L, 10L, "O", 20.0, java.sql.Timestamp.valueOf("2020-01-02 00:00:00"), "5-LOW"),
      (3L, 11L, "O", 30.0, java.sql.Timestamp.valueOf("2020-01-03 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "events", Seq(
      (1L, 1700000000000000000L, 10L, "view", 1.0, "{}"),
      (2L, 1700000001000000000L, 12L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = operators.Joins.queries("join_full_outer")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 10: both sides; 11: orders only; 12: events only
    assert(out == Seq((10L, 2L, 1L), (11L, 1L, 0L), (12L, 0L, 1L)), s"got $out")
  }

  private def liRow(ok: Long, pk: Long, sk: Long, ln: Int, qty: Double,
      price: Double, flag: String) =
    (ok, pk, sk, ln, qty, price, 0.0, 0.0, flag, "O",
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  test("agg_mode_deterministic ties break to the smallest value; weighted avg and multi-distinct hand-check") {
    val dir = tempDir()
    import spark.implicits._
    // flag A: qty 5.0 ×2, qty 3.0 ×2 (tie → 3.0), qty 9.0 ×1
    writeFixture(dir, "lineitem", Seq(
      liRow(1L, 100L, 7L, 1, 5.0, 10.0, "A"),
      liRow(1L, 101L, 7L, 2, 5.0, 20.0, "A"),
      liRow(2L, 100L, 8L, 1, 3.0, 30.0, "A"),
      liRow(2L, 102L, 8L, 2, 3.0, 40.0, "A"),
      liRow(3L, 103L, 9L, 1, 9.0, 50.0, "A"))
      .toDF(liCols: _*))
    val mode = operators.Aggregates.queries("agg_mode_deterministic")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(mode == Seq(("A", 3.0, 2L)), s"got $mode")
    val wavg = operators.Aggregates.queries("agg_weighted_avg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // Σ(price·qty) = 50+100+90+120+450 = 810; Σqty = 25 → 32.4
    assert(wavg == Seq(("A", 32.4)), s"got $wavg")
    val nd = operators.Aggregates.queries("agg_count_distinct_multi")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(nd == Seq(("A", 4L, 3L, 5L)), s"got $nd")
  }

  private def doc(id: Long, text: String, lang: String = "en") =
    (id, text, lang, "s0", text.length.toLong)

  test("text_ngram_topk counts bigrams per language with lexicographic tie-break") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      doc(1L, "a b a b c"),     // bigrams: "a b"×2, "b a", "b c"
      doc(2L, "a b x"),         // "a b", "b x"
      doc(3L, "uno dos", "es")) // single bigram, and a one-bigram lang
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = operators.TextOps.queries("text_ngram_topk")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    // en: "a b"×3 first; then ties at n=1 resolve alphabetically
    assert(out == Seq(
      ("en", 1, "a b", 3L), ("en", 2, "b a", 1L), ("en", 3, "b c", 1L),
      ("es", 1, "uno dos", 1L)), s"got $out")
  }

  test("pipeline_inverted_index caps postings at the 10 lowest doc_ids and floors df at 5") {
    val dir = tempDir()
    import spark.implicits._
    // "hot" in 12 docs (df=12, postings capped to the 10 lowest ids);
    // "warm" in docs 1-5 (df=5, full list); "rare" in docs 6-12 (df=7)
    val rows = (1L to 12L).map(i =>
      doc(i, if (i <= 5) "hot warm" else "hot rare"))
    writeFixture(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = operators.TextOps.queries("pipeline_inverted_index")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet == Set("hot", "warm", "rare"), s"got ${out.keySet}")
    assert(out("hot") == ((12L, (1L to 10L).mkString(","))))
    assert(out("warm") == ((5L, "1,2,3,4,5")))
    assert(out("rare") == ((7L, (6L to 12L).mkString(","))))
  }

  test("graph_neighbor_jaccard on a planted bipartite graph") {
    val dir = tempDir()
    import spark.implicits._
    // customers 1,2 cite suppliers {1,2}; customer 3 cites supplier 1
    // → N(s1)={1,2,3}, N(s2)={1,2}: i=2, jaccard 2/(3+2-2)=0.6667
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"),
      (2L, 2L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"),
      (3L, 3L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      liRow(1L, 100L, 1L, 1, 1.0, 1.0, "N"), liRow(1L, 101L, 2L, 2, 1.0, 1.0, "N"),
      liRow(2L, 100L, 1L, 1, 1.0, 1.0, "N"), liRow(2L, 101L, 2L, 2, 1.0, 1.0, "N"),
      liRow(3L, 100L, 1L, 1, 1.0, 1.0, "N"))
      .toDF(liCols: _*))
    val off = operators.GraphOps.SupplierVertexOffset
    val out = operators.GraphOps.queries("graph_neighbor_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((off + 1L, off + 2L, 0.6667)), s"got $out")
  }

  test("join_asof_tolerance: attribution expires after one hour") {
    val dir = tempDir()
    import spark.implicits._
    val base = 1700000000000000000L // ns
    def ns(min: Long) = base + min * 60L * 1000000000L
    writeFixture(dir, "events", Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),      // before any purchase → -1
      (2L, ns(10), 1L, "purchase", 9.0, "{}"),
      (3L, ns(40), 1L, "view", 1.0, "{}"),     // 30 min after → attributed
      (4L, ns(130), 1L, "view", 1.0, "{}"),    // 120 min after → expired
      (5L, ns(5), 2L, "view", 1.0, "{}"))      // other user, no purchase
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = operators.Joins.queries("join_asof_tolerance")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((-1L, -1L)),
      3L -> ((2L, 1800L)),
      4L -> ((-1L, -1L)),
      5L -> ((-1L, -1L))), s"got $out")
  }

  test("pipeline_dataset_card: per-source volumes, split share, and dup count") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "a b c", "en", "s0", 5L),
      (2L, "a b c", "fr", "s0", 5L),   // exact dup of doc 1 (same source)
      (3L, "x y", "en", "s0", 3L),
      (4L, "a b c", "en", "s1", 5L))   // same text, different source → no dup
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = operators.TextOps.queries("pipeline_dataset_card")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    // s0: 3 docs, 3+3+2=8 tokens, 2 langs, dup pair (docs 1,2) → 2
    assert(out("s0") == ((3L, 8L, 2L, 2L)), s"got ${out("s0")}")
    assert(out("s1") == ((1L, 3L, 1L, 0L)), s"got ${out("s1")}")
  }

  test("text_cm_frequent_terms: count-min estimates never undercount; exact on a tiny vocab") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      doc(1L, "apple apple apple pear"),
      doc(2L, "apple pear plum"),
      doc(3L, "plum plum quince"))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = operators.TextOps.queries("text_cm_frequent_terms")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // count-min guarantee: min-of-cells can never undercount
    assert(out.forall { case (_, n, est) => est >= n }, s"got ${out.toSeq}")
    // 4 terms in a 1024-wide sketch: collision-free, so est == exact
    val m = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("apple") == ((4L, 4L)) && m("plum") == ((3L, 3L)) &&
      m("pear") == ((2L, 2L)) && m("quince") == ((1L, 1L)), s"got $m")
    // merge soundness: the distributed sketch (many partitions) must
    // equal a single-pass local sketch
    val local = new graft.functions.CountMinAgg(4, 1024)
    val terms = Seq("apple", "apple", "apple", "pear", "apple", "pear",
      "plum", "plum", "plum", "quince")
    val s1 = terms.take(5).foldLeft(local.zero)(local.reduce)
    val s2 = terms.drop(5).foldLeft(local.zero)(local.reduce)
    val merged = local.merge(s1, s2)
    assert(graft.functions.CountMinAgg.estimate(merged, "apple", 4, 1024) == 4L)
  }

  test("dedup_cluster_stats: size histogram over planted near-dup clusters") {
    val dir = tempDir()
    import spark.implicits._
    // docs 1+2 share all bigrams (one cluster of 2); 3 and 4 are
    // disjoint singletons → histogram: size 1 × 2 clusters, size 2 × 1
    writeFixture(dir, "documents", Seq(
      doc(1L, "alpha beta gamma delta"),
      doc(2L, "alpha beta gamma delta"),
      doc(3L, "epsilon zeta eta theta"),
      doc(4L, "iota kappa lambda mu"))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = operators.DedupOps.queries("dedup_cluster_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 2L), (2L, 1L, 2L)), s"got $out")
  }

  test("labelPropagation: two bridged cliques settle into two communities") {
    import spark.implicits._
    // 4-cliques {1,2,3,4} and {5,6,7,8} bridged by 4–5. Hand-simulated
    // deterministic LPA (most frequent neighbor label, ties → min):
    // by round 3 clique A is all label 1 and clique B all label 5,
    // and rounds 4–5 are stable.
    def clique(vs: Seq[Long]) =
      for (a <- vs; b <- vs if a != b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) ++
      Seq((4L, 5L), (5L, 4L))).toDF("src", "dst")
    val out = operators.GraphOps.labelPropagation(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L), s"got $out")
    // determinism: a second run produces the identical labeling
    val out2 = operators.GraphOps.labelPropagation(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out)
  }

  test("win_conditional_streak: islands split on type change; ties go to the first run") {
    val dir = tempDir()
    import spark.implicits._
    val base = 1700000000000000000L
    def ns(min: Long) = base + min * 60L * 1000000000L
    writeFixture(dir, "events", Seq(
      // user 1: V V C V V V → longest streak 3 views
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(1), 1L, "view", 1.0, "{}"),
      (3L, ns(2), 1L, "click", 1.0, "{}"),
      (4L, ns(3), 1L, "view", 1.0, "{}"),
      (5L, ns(4), 1L, "view", 1.0, "{}"),
      (6L, ns(5), 1L, "view", 1.0, "{}"),
      // user 2: V V C C → length tie, the earlier (view) run wins
      (7L, ns(0), 2L, "view", 1.0, "{}"),
      (8L, ns(1), 2L, "view", 1.0, "{}"),
      (9L, ns(2), 2L, "click", 1.0, "{}"),
      (10L, ns(3), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = operators.Windows.queries("win_conditional_streak")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> (("view", 3L)), 2L -> (("view", 2L))), s"got $out")
  }

  test("graph_bfs_distance: hop distances from the seed set, depth-capped at 3") {
    val dir = tempDir()
    import spark.implicits._
    // chain: c1 –s7– c20 –s8– c30; seed = c1 (≤ 10)
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"),
      (2L, 20L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"),
      (3L, 30L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      liRow(1L, 100L, 7L, 1, 1.0, 1.0, "N"),
      liRow(2L, 100L, 7L, 1, 1.0, 1.0, "N"), liRow(2L, 101L, 8L, 2, 1.0, 1.0, "N"),
      liRow(3L, 101L, 8L, 1, 1.0, 1.0, "N"))
      .toDF(liCols: _*))
    val off = operators.GraphOps.SupplierVertexOffset
    val out = operators.GraphOps.queries("graph_bfs_distance")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c30 is 4 hops out — beyond the depth cap, absent from the result
    assert(out == Map(1L -> 0L, (off + 7L) -> 1L, 20L -> 2L, (off + 8L) -> 3L),
      s"got $out")
  }

  test("ts_interval_union merges overlapping spans and sums exact coverage") {
    val dir = tempDir()
    import spark.implicits._
    val base = 1700000000000000000L
    def ns(min: Long) = base + min * 60L * 1000000000L
    writeFixture(dir, "events", Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),    // [0, 30)
      (2L, ns(10), 1L, "view", 1.0, "{}"),   // [10, 40) — overlaps → merge
      (3L, ns(100), 1L, "view", 1.0, "{}"),  // [100, 130) — new island
      (4L, ns(0), 2L, "view", 1.0, "{}"))    // user 2: one interval
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = operators.TimeSeriesOps.queries("ts_interval_union")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // user 1: [0,40) ∪ [100,130) = 2400 s + 1800 s
    assert(out == Map(1L -> ((2L, 4200L)), 2L -> ((1L, 1800L))), s"got $out")
  }

  test("graph_clustering_coefficient: a closed triangle has cc = 1") {
    val dir = tempDir()
    import spark.implicits._
    // one order with parts {100, 101, 102} → co-part graph = K3:
    // 3 wedges, 1 triangle, global cc = 3·1/3 = 1.0
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      liRow(1L, 100L, 7L, 1, 1.0, 1.0, "N"),
      liRow(1L, 101L, 7L, 2, 1.0, 1.0, "N"),
      liRow(1L, 102L, 7L, 3, 1.0, 1.0, "N"))
      .toDF(liCols: _*))
    val out = operators.GraphOps.queries("graph_clustering_coefficient")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((3L, 1L, 1.0)), s"got $out")
  }

  test("agg_moments_mergeable: two-level state merge equals the direct computation") {
    val dir = sf001
    import org.apache.spark.sql.functions._
    val merged = operators.Aggregates.queries("agg_moments_mergeable")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // direct: one flat aggregate over the joined rows, no intermediate
    // per-nation state — mergeability means both paths agree exactly
    val direct = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"),
        Stable.r4(Stable.dsum(col("c_acctbal")) / count(lit(1))).as("mean"))
      .orderBy(col("r_name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(merged.map(t => (t._1, t._2, t._3)) == direct, s"$merged vs $direct")
    // variance is non-negative and finite for every region
    assert(merged.forall(t => t._4 >= 0.0 && !t._4.isNaN))
  }

  test("graph_degree_assortativity: a star graph is perfectly disassortative") {
    val dir = tempDir()
    import spark.implicits._
    // one order per leaf customer 1..3, all citing supplier 7 → star:
    // hub degree 3, leaves degree 1, assortativity exactly -1
    writeFixture(dir, "orders", (1L to 3L).map(i =>
      (i, i, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", (1L to 3L).map(i =>
      liRow(i, 100L, 7L, 1, 1.0, 1.0, "N")).toDF(liCols: _*))
    val out = operators.GraphOps.queries("graph_degree_assortativity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((6L, -1.0)), s"got $out")
  }

  test("win_pct_change: first period is 0 by convention, deltas are exact") {
    val dir = tempDir()
    import spark.implicits._
    val base = 1700000000000000000L
    def ns(h: Long) = base + h * 3600L * 1000000000L
    writeFixture(dir, "events", Seq(
      (1L, ns(0), 1L, "view", 10.0, "{}"),
      (2L, ns(1), 1L, "view", 15.0, "{}"),
      (3L, ns(2), 1L, "view", 12.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = operators.Windows.queries("win_pct_change")(spark, dir)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq((10.0, 0.0, 0.0), (15.0, 5.0, 50.0), (12.0, -3.0, -20.0)),
      s"got $out")
  }

  test("graph_modularity: zero for one community, high for two planted cliques") {
    import spark.implicits._
    // single triangle = one community → Q = 1 − 1 = 0 exactly
    def mod(edges: Seq[(Long, Long)]): (Long, Double) = {
      val sym = (edges ++ edges.map(_.swap)).distinct.toDF("src", "dst")
      val labels = operators.GraphOps.labelPropagation(sym, iters = 5)
      val el = sym
        .join(labels.select(col("v").as("src"), col("lbl").as("ls")), Seq("src"))
        .join(labels.select(col("v").as("dst"), col("lbl").as("ld")), Seq("dst"))
      val per = el.groupBy(col("ls"))
        .agg(count_if(col("ls") === col("ld")).as("e_in"), count(lit(1)).as("dc"))
      val st = per.agg(sum(col("e_in")), sum(col("dc")),
        sum(col("dc") * col("dc")), count(lit(1))).first()
      val q = st.getLong(0).toDouble / st.getLong(1) -
        st.getLong(2).toDouble / st.getLong(1) / st.getLong(1)
      (st.getLong(3), q)
    }
    val (n1, q1) = mod(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(n1 == 1L && math.abs(q1) < 1e-12, s"got $n1, $q1")
    def clique(vs: Seq[Long]) = for (a <- vs; b <- vs if a < b) yield (a, b)
    val (n2, q2) = mod(clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(5L, 6L, 7L, 8L)) :+ (4L, 5L))
    assert(n2 == 2L && q2 > 0.3, s"two cliques should score high, got $n2, $q2")
  }

  test("vec_cell_stats assigns every vector to its max-cosine cell") {
    val dir = tempDir()
    import spark.implicits._
    def oneHot(i: Int, scale: Float): Array[Float] =
      Array.tabulate(8)(j => if (j == i) scale else 0.0f)
    // centroids 0..7 are one-hot; vector 10 is centroid 3's direction
    // scaled ×2 (cos 1.0 with cell 3), vector 11 sits between cells 0
    // and 1 (cos equal → tie breaks to cell 0)
    val rows = (0 until 8).map(i => (i.toLong, oneHot(i, 1.0f), 0)) ++ Seq(
      (10L, oneHot(3, 2.0f), 0),
      (11L, Array.tabulate(8)(j => if (j <= 1) 1.0f else 0.0f), 0))
    writeFixture(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val out = operators.VectorOps.queries("vec_cell_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every centroid self-assigns; cell 3 additionally gets vector 10,
    // cell 0 gets vector 11 on the tie
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 2L,
      4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L), s"got $out")
    val avg = operators.VectorOps.queries("vec_cell_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(avg(3L) == 1.0) // centroid 3 and its scaled copy both cos 1
  }
}

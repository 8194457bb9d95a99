package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: the sf0.01 Borůvka replica (VERDICT r4 #4 — the
  * only sub-sf0.01 verification left on the board), plus specs for the
  * operators and rewrites this round introduces. */
class Round5Spec extends SparkTestBase {

  def sf01 = "/root/testdata/sf0.01"

  /** driver-side Kruskal under the (w, a, b) total order — the forest
    * is unique given the total order, so set equality against the
    * engine's parallel Borůvka is the full check. */
  private def kruskalReplica(dir: String): Seq[(Long, Long, Long)] = {
    val off = operators.GraphOps.SupplierVertexOffset
    val wedges = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("a"), (col("l_suppkey") + off).as("b"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1000000L / r.getLong(2)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val px = parent.getOrElseUpdate(x, x)
      if (px == x) x else { val r = find(px); parent(x) = r; r }
    }
    wedges.sortBy(e => (e._3, e._1, e._2)).flatMap { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSeq
  }

  test("kTruss: planted clique survives, tails and bridges peel") {
    import spark.implicits._
    // 5-clique {1..5} (each edge in 3 triangles) + a triangle {6,7,8}
    // hanging off vertex 5 via bridge 5-6, + pendant path 8-9-10.
    // k=5 keeps ONLY the clique (support ≥ 3): the bridge closes no
    // triangle, the small triangle's edges have support 1, and
    // peeling cascades through the path.
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val extra = Seq((5L, 6L), (6L, 7L), (6L, 8L), (7L, 8L), (8L, 9L), (9L, 10L))
    val und = (clique ++ extra).toDF("a", "b")
    val got = operators.GraphOps.kTruss(und, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == clique.map { case (a, b) => (a, b, 3L) }.toSet)
    // k=3 keeps every triangle edge (support ≥ 1) and drops only the
    // triangle-free bridge and path
    val got3 = operators.GraphOps.kTruss(und, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == (clique ++ Seq((6L, 7L), (6L, 8L), (7L, 8L))).toSet)
  }

  test("ts_mann_kendall: bucketed S equals the brute-force pair join at sf0.001") {
    // the r5 week×value-bucket decomposition (A same-week + B
    // cross-week-same-bucket + C grid counting) must reproduce the
    // hours² definition EXACTLY — S is an integer, so equality is
    // bit-for-bit, not tolerance-based
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val hourly = Tables.events(spark, sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
    val a = hourly.select(col("event_type"), col("hour").as("ha"), col("hu").as("xa"))
    val b = hourly.select(col("event_type"), col("hour").as("hb"), col("hu").as("xb"))
    val brute = a.join(b, Seq("event_type")).filter(col("ha") < col("hb"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = operators.TimeSeriesOps.queries("ts_mann_kendall")(spark, sf001)
      .select(col("event_type"), col("s_stat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute)
  }

  test("multimodal_payload_entropy: empty documents excluded by declaration") {
    // ADVICE r4: on '' Spark's split yields [""] but DuckDB's
    // string_split yields [] — the declared convention (empty docs
    // absent) now has an explicit filter in BOTH engines and this
    // fixture exercises it
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "", "en", "web", 0L),
      (2L, "aabb", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.MultimodalOps.queries("multimodal_payload_entropy")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1 absent; doc 2: n=4, two symbols ×2 → entropy 1.0 bit
    assert(got.toSeq == Seq((2L, 4L, 2L, 1.0)), s"got ${got.toSeq}")
  }

  test("pipeline_mixture_schedule: bucket-composed rank equals the naive window") {
    // VERDICT r4 #7: the rewritten shape (within-bucket row_number +
    // per-source boundary offsets) must produce IDENTICAL rows to the
    // low-cardinality per-source window it replaced
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val naive = Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n_s",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("doc_id"),
        expr("(2 * r - 1) * 1000000000000 DIV (2 * n_s)").as("pos"))
      .orderBy(col("pos"), col("source"), col("doc_id"))
      .limit(200)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = operators.TextOps.queries("pipeline_mixture_schedule")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naive)
  }

  private def evRow(id: Long, hour: Int, v: Double) =
    (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, "view", v, "{}")

  test("ts_runs_test: split halves cluster, zigzag alternates") {
    val dir = tempDir()
    import spark.implicits._
    // values 1..12 hour-ordered ascending: median drops value 6, the
    // remaining signs are −−−−− ++++++ → 2 runs, far too few
    writeFixture(dir, "events",
      (1 to 12).map(h => evRow(h.toLong, h, h.toDouble))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val a = operators.TimeSeriesOps.queries("ts_runs_test")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))).head
    assert(a._1 == 6L && a._2 == 5L && a._3 == 2L, s"got $a")
    assert(a._4 < -1.96 && a._5 == "clustered", s"got $a")
    // zigzag 1,12,2,11,… : signs alternate −+−+… (value 6 drops, its
    // + neighbor merges) → 10 runs, far too many
    val zig = Seq(1, 12, 2, 11, 3, 10, 4, 9, 5, 8, 6, 7)
    writeFixture(dir, "events",
      zig.zipWithIndex.map { case (v, h) => evRow(h + 1L, h, v.toDouble) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val b = operators.TimeSeriesOps.queries("ts_runs_test")(spark, dir)
      .collect().map(r => (r.getLong(3), r.getDouble(4), r.getString(5))).head
    assert(b._1 == 10L && b._2 > 1.96 && b._3 == "alternating", s"got $b")
  }

  test("ts_turning_points: monotone ramp is smooth, zigzag oscillates") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "events",
      (1 to 12).map(h => evRow(h.toLong, h, h.toDouble))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val a = operators.TimeSeriesOps.queries("ts_turning_points")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getString(4))).head
    assert(a._1 == 0L && a._2 < -1.96 && a._3 == "smooth", s"got $a")
    val zig = Seq(1, 12, 2, 11, 3, 10, 4, 9, 5, 8, 6, 7)
    writeFixture(dir, "events",
      zig.zipWithIndex.map { case (v, h) => evRow(h + 1L, h, v.toDouble) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val b = operators.TimeSeriesOps.queries("ts_turning_points")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getString(4))).head
    // every interior hour of the zigzag is a strict extremum → 10
    assert(b._1 == 10L && b._2 > 1.96 && b._3 == "oscillating", s"got $b")
  }

  test("mine_spearman_corr: concordant ranks read 1, reversed read -1") {
    val dir = tempDir()
    import spark.implicits._
    // s1 < s2 < s3 in BOTH revenue and breadth → Σd² = 0 → ρ = 1
    writeFixture(dir, "orders", Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L),
      (5L, 2L), (6L, 3L)).toDF("o_orderkey", "o_custkey"))
    def li(ok: Long, sk: Long) = (ok, sk, 100.0, 0.0)
    writeFixture(dir, "lineitem",
      Seq(li(1, 1), li(2, 2), li(3, 2), li(4, 3), li(5, 3), li(6, 3))
        .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
    val a = operators.MiningOps.queries("mine_spearman_corr")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    assert(a == ((3L, 0L, 1.0)), s"got $a")
    // s1 earns most but sells narrowest → ranks exactly reversed → −1
    writeFixture(dir, "lineitem",
      Seq(li(1, 1), (1L, 1L, 200.0, 0.0), // s1: rev 300, breadth 1
        li(2, 2), li(3, 2),               // s2: rev 200, breadth 2
        (4L, 3L, 40.0, 0.0), (5L, 3L, 30.0, 0.0), (6L, 3L, 30.0, 0.0))
        .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
    val b = operators.MiningOps.queries("mine_spearman_corr")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(b == ((8L, -1.0)), s"got $b")
  }

  test("mine_theil_index: equal revenues read 0, within-equal shifts to between") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "customer",
      Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2))
        .toDF("c_custkey", "c_nationkey")) // nationkey INT32, per schema
    // all four customers equal → theil = between = within = 0
    writeFixture(dir, "orders",
      (1 to 4).map(i => (i.toLong, i.toLong, 100.0))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"))
    val a = operators.MiningOps.queries("mine_theil_index")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).head
    assert(a == ((4L, 0.0, 0.0, 0.0)), s"got $a")
    // nations internally equal (100,100 vs 300,300): ALL inequality is
    // between-nation — theil == theil_between, within = 0
    writeFixture(dir, "orders",
      Seq((1L, 1L, 100.0), (2L, 2L, 100.0), (3L, 3L, 300.0), (4L, 4L, 300.0))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"))
    val b = operators.MiningOps.queries("mine_theil_index")(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    assert(b._1 > 0.0 && b._1 == b._2 && b._3 == 0.0, s"got $b")
  }

  test("text_bigram_entropy: deterministic template reads 0, branching context > 0") {
    val dir = tempDir()
    import spark.implicits._
    // "a b a b a b": every context has exactly one successor → H = 0
    writeFixture(dir, "documents", Seq((1L, "a b a b a b", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val a = operators.TextOps.queries("text_bigram_entropy")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
    assert(a == ((5L, 2L, 0.0)), s"got $a")
    // "a x a y": context a branches 50/50 (1 bit), x is forced →
    // N·H = cu·lg2(cu) terms: 2·1 + 1·0 = 2 over N = 3 → 0.6667
    writeFixture(dir, "documents", Seq((1L, "a x a y", "en", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val b = operators.TextOps.queries("text_bigram_entropy")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
    assert(b == ((3L, 2L, 0.6667)), s"got $b")
  }

  test("pipeline_len_quantiles: exact rank arithmetic on lengths 1..10") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents",
      (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" "), "en",
        "web", i.toLong)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("pipeline_len_quantiles")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head
    // p50: cum ≥ 5 → 5; p90: cum ≥ 9 → 9; p99: cum·100 ≥ 990 → 10
    assert(got == ((10L, 5L, 9L, 10L, 10L)), s"got $got")
  }

  test("ts_pacf: a perfect ramp hits the |r1| = 1 degenerate guard") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "events",
      (1 to 12).map(h => evRow(h.toLong, h, h.toDouble))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_pacf")(spark, dir)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4))).head
    // shifted ramps correlate exactly: acf1 = acf2 = 1 → pacf2 = 0 by
    // the declared degenerate convention
    assert(got == ((1.0, 1.0, 0.0)), s"got $got")
  }

  test("pipeline_tokenizer_fertility: ceil(len/4) proxy on hand words") {
    val dir = tempDir()
    import spark.implicits._
    // "ab cdef ghijk": sub-tokens ⌈2/4⌉+⌈4/4⌉+⌈5/4⌉ = 1+1+2 = 4 over
    // 3 words → fertility 1.3333; chars 11/4 → 2.75
    writeFixture(dir, "documents", Seq((1L, "ab cdef ghijk", "en", "web", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("pipeline_tokenizer_fertility")(
      spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .head
    assert(got == ((3L, 4L, 1.3333, 2.75)), s"got $got")
  }

  test("graph_core_ladder: monotone non-increasing rungs at sf0.001") {
    val rows = operators.GraphOps.queries("graph_core_ladder")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8, 16))
    // a (k+1)-core is a subgraph of the k-core: both counts shrink
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"ladder not monotone: $a -> $b")
    }
    // and the k=2 rung must be inside the full graph
    val full = operators.GraphOps.edges(spark, sf001).count()
    assert(rows.head._3 <= full)
  }

  test("vec_ann_recall_vs_probes: recall and volume grow with nprobe") {
    val rows = operators.VectorOps.queries("vec_ann_recall_vs_probes")(
      spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2))
    val Array(n1, n2) = rows
    // probing a second cell can only ADD candidates, and the top-1
    // over a superset can only match the truth at least as often
    assert(n2._2 >= n1._2 && n2._3 >= n1._3 && n2._4 >= n1._4,
      s"curve not monotone: $n1 -> $n2")
  }

  test("dedup_band_sweep: finer bandings are candidate supersets") {
    // a (4,8) band collision forces both constituent (8,4) halves to
    // collide, and each of those forces its (16,2) halves — so both
    // candidate and verified counts are monotone in the band count
    val rows = operators.DedupOps.queries("dedup_band_sweep")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(4, 8, 16))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3,
        s"finer banding lost candidates: $a -> $b")
    }
  }

  test("win_ntile_deciles: bucket-composed deciles equal the native ntile") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val naive = Tables.orders(spark, sf001)
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("o_orderpriority"), col("decile"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val got = operators.Windows.queries("win_ntile_deciles")(spark, sf001)
      .select(col("o_orderpriority"), col("decile"), col("n"),
        col("lo"), col("hi"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == naive)
  }

  test("win_percent_dist: bucket-composed positions equal the native functions") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val naive = Tables.orders(spark, sf001)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"),
        ntile(10).over(w).as("de"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).toSeq
    val got = operators.Windows.queries("win_percent_dist")(spark, sf001)
      .select(col("o_orderpriority"), col("o_orderkey"), col("pct_rank"),
        col("cum_dist"), col("decile"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(got == naive)
  }

  test("pipeline_source_mix: hash-prefix bucket rank equals the naive window") {
    import org.apache.spark.sql.expressions.Window
    // the rank machinery is the changed part — pin the per-source
    // (rank, doc) assignment itself against the naive formulation
    val docs = Tables.documents(spark, sf001)
    val naive = docs.select(col("source"), col("doc_id"),
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(md5(col("text")), col("doc_id"))).cast("long").as("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val h = docs.select(col("source"), col("doc_id"), md5(col("text")).as("h"))
      .withColumn("bk", substring(col("h"), 1, 2))
    val offs = h.groupBy(col("source"), col("bk")).agg(count(lit(1)).as("bc"))
      .withColumn("boff", coalesce(sum(col("bc")).over(
        Window.partitionBy(col("source")).orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("bk"), col("boff"))
    val got = h.join(broadcast(offs), Seq("source", "bk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"), col("bk"))
          .orderBy(col("h"), col("doc_id"))).cast("long") + col("boff"))
      .select(col("source"), col("doc_id"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
  }

  test("win_rank_variants: composed ranks equal the native window functions") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(desc("l_quantity"), asc("l_orderkey"), asc("l_linenumber"))
    // quartile is tie-arbitrary at ntile boundaries (declared), so the
    // pin compares the deterministic (rnk, drnk) assignment per row
    // plus the per-flag quartile-count multiset
    val naive = Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"), ntile(4).over(w).as("q"))
    val got = operators.Windows.queries("win_rank_variants")(spark, sf001)
    def rankSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col(df.columns.find(_ == "rnk").get),
        col("drnk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4), r.getInt(5))).sorted.toSeq
    assert(rankSet(got) == rankSet(naive))
    def qHist(df: org.apache.spark.sql.DataFrame, qc: String) = df
      .groupBy(col("l_returnflag"), col(qc)).count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(qHist(got, "quartile") == qHist(naive, "q"))
  }

  test("graph_betweenness_seeds: diamond splits the pair's unit flow") {
    val dir = tempDir()
    import spark.implicits._
    // customers 1 and 2 each buy from suppliers 7 and 8 → the trade
    // graph is the diamond c1—S7—c2, c1—S8—c2: the (1,2) seed pair has
    // two shortest paths, so each supplier brokers 1·1/2 = 0.5
    writeFixture(dir, "orders",
      Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L))
        .toDF("o_orderkey", "o_custkey"))
    writeFixture(dir, "lineitem",
      Seq((1L, 7L), (2L, 7L), (3L, 8L), (4L, 8L))
        .toDF("l_orderkey", "l_suppkey"))
    val off = operators.GraphOps.SupplierVertexOffset
    val got = operators.GraphOps.queries("graph_betweenness_seeds")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((7L + off, 0.5), (8L + off, 0.5)), s"got $got")
  }

  test("kTruss: the truss is a fixed point of its own peel at sf0.001") {
    // maximality half of the k-truss definition: peeling the surviving
    // subgraph again must change nothing — every edge already has
    // in-truss support ≥ k−2
    val k = operators.GraphOps.KtrussK
    val truss = operators.GraphOps.queries("graph_ktruss")(spark, sf001)
      .select(col("a"), col("b"), col("support"))
    val again = operators.GraphOps.kTruss(truss.select(col("a"), col("b")), k)
    val t1 = truss.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet
    val t2 = again.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet
    assert(t1 == t2, s"peel not idempotent: ${t1.size} vs ${t2.size} edges")
  }

  test("graph_mst_boruvka: equals the driver-side Kruskal replica at sf0.01") {
    // 10× the Round4eSpec replica (VERDICT r4 #4): same check, the
    // sf the driver's correctness gate runs at — closing the one
    // verification that only existed at sf0.001. r6: the engine runs
    // with the Kruskal-endgame cutover DISABLED (cap 0) so the
    // DISTRIBUTED Borůvka loop — not the endgame's own Kruskal — is
    // what the replica verifies; Round6Spec separately pins endgame ≡
    // distributed.
    val capKey = operators.GraphOps.MstCollectMaxEdgesKey
    spark.conf.set(capKey, "0")
    try {
      val got = operators.GraphOps.queries("graph_mst_boruvka")(spark, sf01)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val kruskal = kruskalReplica(sf01).toSet
      assert(got == kruskal,
        s"forest sizes: got ${got.size}, kruskal ${kruskal.size}")
    } finally spark.conf.unset(capKey)
  }
}

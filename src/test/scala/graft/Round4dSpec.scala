package graft

import org.apache.spark.sql.functions._

/** Round-4d additions: item-item collaborative filtering,
  * deterministic priority sampling, shard-balance audit. */
class Round4dSpec extends SparkTestBase {

  test("mine_item_cf_topk: cosine and ranks on a hand-checked basket set") {
    val dir = tempDir()
    import spark.implicits._
    // baskets: o1{A,B} o2{A,B} o3{A}  → co(A,B)=2, nA=3, nB=2
    writeFixture(dir, "part", Seq(
      (1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand"))
    writeFixture(dir, "lineitem", Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey"))
    val got = operators.MiningOps.queries("mine_item_cf_topk")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val cos = BigDecimal(2.0 / math.sqrt(3.0 * 2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("A", 1, "B", 2L, cos), ("B", 1, "A", 2L, cos)),
      s"got $got")
  }

  test("mine_item_cf_topk: neighbor lists cap at CfTopN with dense ranks") {
    val got = operators.MiningOps.queries("mine_item_cf_topk")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (b, rows) =>
      val ranks = rows.map(_._2).sorted
      assert(ranks == (1 to ranks.size).toList, s"ranks not dense for $b")
      assert(ranks.size <= operators.MiningOps.CfTopN)
    }
  }

  test("sample_weighted_priority: priorities equal an exact BigInt recompute") {
    val dir = tempDir()
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val orders = Seq(
      (1L, 1L, "O", 100.25, ts, "1-URGENT"),
      (2L, 1L, "O", 5000.00, ts, "5-LOW"),
      (3L, 1L, "O", 0.01, ts, "5-LOW"),
      (4L, 1L, "O", 250000.99, ts, "2-HIGH"))
    writeFixture(dir, "orders", orders
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    val got = operators.MiningOps.queries("sample_weighted_priority")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    // driver-side exact recompute: q = floor(w_cents * 2^60 / (h+1))
    val exp = orders.map { case (ok, _, _, price, _, _) =>
      val w = BigDecimal(price).setScale(2).*(100).toLongExact
      val h = functions.Md5Hash.hash60(s"o|$ok")
      val q = (BigInt(w) * BigInt(2).pow(60)) / (BigInt(h) + 1)
      (ok, w, q)
    }.sortBy { case (ok, _, q) => (-q, ok) }
      .zipWithIndex.map { case ((ok, w, q), i) => (i + 1, ok, w, q.toString) }
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("sample_weighted_priority: double run is byte-identical and k-bounded") {
    val q = operators.MiningOps.queries("sample_weighted_priority")
    val a = q(spark, sf001).collect().toSeq
    val b = q(spark, sf001).collect().toSeq
    assert(a == b)
    assert(a.size == operators.MiningOps.PrioritySampleK)
  }

  test("graph_closeness_bounded: hand-checked harmonic sums on a path graph") {
    val dir = tempDir()
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    // cust 1 → suppliers 7,8 (order 1); cust 2 → supplier 7 (order 2)
    // sym graph: 1:{S7,S8} 2:{S7} S7:{1,2} S8:{1}
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 10.0, ts, "1-URGENT"), (2L, 2L, "O", 20.0, ts, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      (1L, 7L), (1L, 8L), (2L, 7L)).toDF("l_orderkey", "l_suppkey"))
    val got = operators.GraphOps.queries("graph_closeness_bounded")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // seed 1: d(S7)=1, d(S8)=1, d(2)=2 → 1+1+0.5;  seed 2: d(S7)=1,
    // d(1)=2, d(S8)=3 → 1+0.5+0.333333333 (nano-quantized)
    assert(got == Seq((1L, 3L, 2.5), (2L, 3L, 1.8333)), s"got $got")
  }

  test("graph_walk_skipgrams: pairs equal the window-2 explosion of the walks") {
    val walks = operators.GraphOps.queries("graph_walk_sample")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val exp = walks.groupBy(_._1).values.flatMap { w =>
      for {
        (_, sa, va) <- w
        (_, sb, vb) <- w
        if sa != sb && math.abs(sa - sb) <= 2
      } yield (va, vb)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case ((c, x), n) => (c, x, n) }.sortBy(t => (t._1, t._2))
    val got = operators.GraphOps.queries("graph_walk_skipgrams")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp, s"got ${got.take(5)}... exp ${exp.take(5)}...")
    // each 5-step walk contributes exactly 14 ordered window-2 pairs
    assert(got.map(_._3).sum == 14L * walks.map(_._1).distinct.size)
  }

  test("diag_missing_days: planted holes are counted and the longest is found") {
    val dir = tempDir()
    import spark.implicits._
    def o(id: Long, day: Int) = (id, 1L, "O", 10.0,
      java.sql.Timestamp.valueOf(f"2020-01-$day%02d 12:00:00"), "1-URGENT")
    // present: 1, 2, 5, 6, 10 → span 10, missing 5, longest hole 7..9
    writeFixture(dir, "orders", Seq(o(1, 1), o(2, 2), o(3, 5), o(4, 6), o(5, 10))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    val got = operators.MiningOps.queries("diag_missing_days")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((10L, 5L, 5L, 3L)), s"got $got")
  }

  test("mine_rank_movers: ranks are permutations and movement is zero-sum") {
    val rows = operators.MiningOps.queries("mine_rank_movers")(spark, sf001)
      .collect().map(r => (r.getInt(3), r.getInt(4), r.getInt(5))).toSeq
    val n = rows.size
    assert(rows.map(_._1).sorted == (1 to n).toList)
    assert(rows.map(_._2).sorted == (1 to n).toList)
    assert(rows.map(_._3).sum == 0)
  }

  test("graph_walk_sample: walks equal an exact driver-side recompute at sf0.001") {
    val res = operators.GraphOps.queries("graph_walk_sample")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // independent adjacency recompute from the raw tables
    val off = operators.GraphOps.SupplierVertexOffset
    val ed = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey") + off).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (ed ++ ed.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.keySet.filter(_ <= 10L).toSeq.sorted
    val exp = seeds.flatMap { s =>
      var cur = s
      (0, s) +: (1 to 4).map { t =>
        cur = adj(cur).minBy(n => (functions.Md5Hash.hash60(s"$cur|$t|$n"), n))
        (t, cur)
      }
    }.zip(seeds.flatMap(s => Seq.fill(5)(s)))
      .map { case ((t, v), s) => (s, t, v) }
    assert(res == exp, s"got ${res.take(6)}... exp ${exp.take(6)}...")
  }

  test("pipeline_shard_balance: shards partition the corpus; loads recompute") {
    val res = operators.MiningOps.queries("pipeline_shard_balance")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(4))).toSeq
    val docs = Tables.documents(spark, sf001)
      .agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
    assert(res.map(_._2).sum == docs.getLong(0), "shard doc counts must partition")
    assert(res.map(_._3).sum == docs.getLong(1), "shard byte sums must partition")
    assert(res.forall(r => r._1 >= 0 && r._1 < operators.MiningOps.ShardCount))
    // md5-uniform shards on a uniform corpus: every load factor near 1
    assert(res.forall(r => r._4 > 0.5 && r._4 < 2.0),
      s"implausible imbalance: $res")
  }

  test("text_collocations_pmi: hand-checked PMI with the support floor applied") {
    val dir = tempDir()
    import spark.implicits._
    // "a b" × 5 → co(a,b)=5 survives, co(b,a)=4 drops at support 5
    writeFixture(dir, "documents", Seq(
      (1L, "a b a b a b a b a b", "en", "s0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("text_collocations_pmi")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // c(a)=c(b)=5, n1=10, n2=9 → pmi = ln(5·10·10/(9·5·5))
    val pmi = BigDecimal(math.log(5.0 * 10 * 10 / (9.0 * 5 * 5)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("a", "b", 5L, pmi)), s"got $got")
  }

  test("text_hash_features: buckets and counts equal a driver-side recompute") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "x y z x", "en", "s0", 7L), (2L, "y q", "de", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.TextOps.queries("text_hash_features")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val toks = Seq("x", "y", "z", "x", "y", "q")
    val exp = toks.groupBy(t => (functions.Md5Hash.hash60(t)
        % operators.TextOps.HashFeatureBuckets).toInt)
      .map { case (b, ts) => (b, ts.size.toLong, ts.distinct.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(got == exp, s"got $got exp $exp")
  }

  test("ts_holt_linear: hand-simulated integer recurrence on a 3-hour series") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, hour: Int, v: Double) =
      (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, "view", v, "{}")
    // events.ts micros; hourly sums 10.0, 20.0, 12.0
    writeFixture(dir, "events", Seq(
      ev(1, 0, 4.0), ev(2, 0, 6.0), ev(3, 1, 20.0), ev(4, 2, 12.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_holt_linear")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // y = (100000, 200000, 120000); init l=100000, b=100000;
    // t=2 (y=200000): l=400000/2=200000, b=(100000+300000)/4=100000
    // t=3 (y=120000): l=420000/2=210000, b=(10000+300000)/4=77500
    assert(got == Seq(("view", 3L, 21.0, 7.75, 21.0 + 24 * 7.75)), s"got $got")
  }

  test("ts_holt_linear: fold equals a driver-side floorMod replay at sf0.001") {
    val got = operators.TimeSeriesOps.queries("ts_holt_linear")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val hourly = Tables.events(spark, sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        * 10000).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    def fd(a: Long, k: Long) = (a - java.lang.Math.floorMod(a, k)) / k
    val exp = hourly.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList)
      .toSeq.filter(_._2.size >= 2).map { case (t, ys) =>
        var l = ys(0); var b = ys(1) - ys(0)
        ys.drop(1).foreach { y =>
          val ln = fd(y + l + b, 2); b = fd(ln - l + 3 * b, 4); l = ln
        }
        def r4d(x: Double) = BigDecimal(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, ys.size.toLong, r4d(l / 10000.0), r4d(b / 10000.0))
      }.sortBy(_._1)
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("win_sessionize_ids: a 40-minute gap opens session 2") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Int) =
      (id, (1577836800L + minute * 60L) * 1000000000L, user, "view", 1.0, "{}")
    writeFixture(dir, "events", Seq(
      ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 50), ev(4, 1, 70), ev(5, 2, 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.Windows.queries("win_sessionize_ids")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L)),
      s"got $got")
  }

  test("diag_revenue_concentration: the Lorenz curve ends at 1 and partitions") {
    val rows = operators.MiningOps.queries("diag_revenue_concentration")(
      spark, sf001).collect()
    val nCust = Tables.orders(spark, sf001)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(rows.last.getDouble(3) == 1.0, "cumulative share must end at 1")
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 10))
    val cums = rows.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
  }

  test("dedup_lsh_quality_audit: planted near-dups are found; counts cohere") {
    val dir = tempDir()
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    writeFixture(dir, "documents", Seq(
      (1L, base, "en", "s0", 100L),
      (2L, base + " extra", "en", "s0", 106L),     // near-dup of 1
      (3L, (1 to 30).map(i => s"other$i").mkString(" "), "en", "s0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.DedupOps.queries("dedup_lsh_quality_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).head
    assert(got == ((1L, 1L, 1L, 1.0, 1.0)), s"got $got")
    // corpus-level coherence at sf0.001
    val c = operators.DedupOps.queries("dedup_lsh_quality_audit")(spark, sf001)
      .collect().head
    assert(c.getLong(2) <= math.min(c.getLong(0), c.getLong(1)))
  }

  test("win_time_range_sum: the frame is time, not rows") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, minute: Int, v: Double) =
      (id, (1577836800L + minute * 60L) * 1000000000L, 1L, "view", v, "{}")
    writeFixture(dir, "events", Seq(
      ev(1, 0, 1.0), ev(2, 30, 2.0), ev(3, 61, 4.0), ev(4, 200, 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.Windows.queries("win_time_range_sum")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    // event 3 at minute 61: the 1 h frame starts at minute 1, so the
    // minute-0 event falls OUT and the minute-30 event stays IN
    assert(got == Seq((1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 2L, 6.0),
      (4L, 1L, 8.0)), s"got $got")
  }

  test("join_lateral_topk: lateral SQL equals the window-rank recompute") {
    val got = operators.Joins.queries("join_lateral_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val exp = Tables.orders(spark, sf001)
      .filter(col("o_custkey") <= 20L)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("price"))
      .orderBy(col("o_custkey"), desc("price"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exp, s"got ${got.take(4)} exp ${exp.take(4)}")
  }

  test("mine_attribution_last_touch: lookback window and direct fallback") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Int, tpe: String) =
      (id, (1577836800L + minute * 60L) * 1000000000L, user, tpe, 1.0, "{}")
    writeFixture(dir, "events", Seq(
      ev(1, 1, 0, "view"), ev(2, 1, 30, "purchase"),     // → view (30m)
      ev(3, 1, 100, "click"), ev(4, 1, 195, "purchase"), // → direct (95m)
      ev(5, 2, 10, "purchase"))                          // → direct (no touch)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.MiningOps.queries("mine_attribution_last_touch")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("direct", 2L), ("view", 1L)), s"got $got")
  }

  test("graph_nation_mixing: matrix partitions the distinct edge set") {
    val rows = operators.MiningOps.queries("graph_nation_mixing")(spark, sf001)
      .collect()
    val edges = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == edges)
    assert(rows.forall(r => r.getBoolean(4) ==
      (r.getInt(0) == r.getInt(1))))
  }

  test("graph_degree_powerlaw: flat two-point histogram fits slope 0") {
    val dir = tempDir()
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    // sym graph 1:{S7,S8} 2:{S7} → degrees 2,1,2,1 → hist {1:2, 2:2}
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 10.0, ts, "1-URGENT"), (2L, 2L, "O", 20.0, ts, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      (1L, 7L), (1L, 8L), (2L, 7L)).toDF("l_orderkey", "l_suppkey"))
    val got = operators.GraphOps.queries("graph_degree_powerlaw")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((2L, 0.0, ln2)), s"got $got")
  }

  test("ts_winsorized_mean: planted outliers clip to the exact percentiles") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, hour: Int, v: Double) =
      (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, "view", v, "{}")
    // 21 hourly points: 0, 10×19, 1000 → p05 = p95 = 10 (exact
    // interpolation positions 1.0 and 19.0), one clip each side
    val vals = 0.0 +: Seq.fill(19)(10.0) :+ 1000.0
    writeFixture(dir, "events",
      vals.zipWithIndex.map { case (v, i) => ev(i + 1, i, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_winsorized_mean")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(("view", 21L, 1L, 1L, 10.0, 10.0, 10.0)), s"got $got")
  }

  test("ts_crosscorr_lagged: a planted 1-hour lead correlates perfectly at lag 1") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, hour: Int, tpe: String, v: Double) =
      (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, tpe, v, "{}")
    val vs = Seq(1.0, 4.0, 2.0, 8.0, 3.0, 9.0)
    val evs = vs.zipWithIndex.map { case (v, h) => ev(h + 1, h, "view", v) } ++
      vs.zipWithIndex.map { case (v, h) => ev(h + 10, h + 1, "purchase", 2 * v) }
    writeFixture(dir, "events",
      evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_crosscorr_lagged")(spark, dir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // purchase_{t+1} = 2·view_t exactly → lag-1 Pearson is 1
    assert(got(1)._2 == 1.0, s"got $got")
    assert(got(0)._2 < 1.0)
  }

  test("mine_brand_seasonality: a single brand indexes 1.0 in every month") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "part", Seq((1L, "A")).toDF("p_partkey", "p_brand"))
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2020-01-15 00:00:00"), "x"),
      (2L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2020-02-15 00:00:00"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq((1L, 1L, 10.0), (2L, 1L, 30.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice"))
    val got = operators.MiningOps.queries("mine_brand_seasonality")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("A", 1, 10.0, 1.0), ("A", 2, 30.0, 1.0)), s"got $got")
  }

  test("ts_anomaly_ewma_band: hand-simulated spike flags once") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, hour: Int, v: Double) =
      (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, "view", v, "{}")
    val vals = Seq(10.0, 10, 10, 10, 1000, 10)
    writeFixture(dir, "events",
      vals.zipWithIndex.map { case (v, i) => ev(i + 1, i, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_anomaly_ewma_band")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // cents fold: spike hour dev=49500 flags (v was 0); recovery hour
    // dev²=612562500 < 9·1225125000 does not; final v = 918843750
    def r4d(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sigma = r4d(math.sqrt(918843750.0) / 100.0)
    assert(got == Seq(("view", 6L, 257.5, sigma, 1L)), s"got $got")
  }

  test("scalar_date_arith: month addition clamps to month end") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 10.0,
        java.sql.Timestamp.valueOf("2020-01-31 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    val r = operators.Scalars.queries("scalar_date_arith")(spark, dir)
      .collect().head
    assert(r.getDate(1).toString == "2020-04-30", "Jan 31 + 3 months clamps")
    assert(r.getDate(2).toString == "2020-01-31")
    assert(r.getInt(3) == 1 && r.getInt(4) == 5)
  }

  test("ts_downsample_ltob: endpoints survive and the spike wins its bucket") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, hour: Int, v: Double) =
      (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, "view", v, "{}")
    // 12 hourly points, spike at idx 5 → keep 1 (first), 5 (bucket-0
    // argmax: |10−200+10| = 180 beats its neighbors), 11 (bucket-1
    // argmax), 12 (last)
    val ys = Seq(10.0, 10, 10, 10, 100, 10, 10, 10, 10, 10, 10, 10)
    writeFixture(dir, "events",
      ys.zipWithIndex.map { case (v, i) => ev(i + 1, i, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_downsample_ltob")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 10.0), (5L, 100.0), (11L, 10.0), (12L, 10.0)),
      s"got $got")
  }

  test("vec_truncation_audit: planted head/tail energy split scores exactly") {
    val dir = tempDir()
    import spark.implicits._
    val headV = (Seq.fill(32)(1.0f) ++ Seq.fill(8)(1.0f)) // 32/40 energy
    val tailV = (Seq.fill(32)(0.0f) ++ Seq.fill(8)(1.0f)) // 0 head energy
    writeFixture(dir, "embeddings", Seq(
      (0L, headV, 7), (1L, tailV, 7)).toDF("vec_id", "embedding", "label"))
    val got = operators.VectorOps.queries("vec_truncation_audit")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    def r4d(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cHead = r4d(math.sqrt(32.0 / 40.0))
    val avg = r4d((BigDecimal(cHead) + BigDecimal(0.0)).toDouble / 2)
    assert(got == Seq((7, 2L, avg, 0.0)), s"got $got")
  }

  test("graph_component_size_dist: the path-graph fixture is one 4-vertex component") {
    val dir = tempDir()
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 10.0, ts, "1-URGENT"), (2L, 2L, "O", 20.0, ts, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      (1L, 7L), (1L, 8L), (2L, 7L)).toDF("l_orderkey", "l_suppkey"))
    val got = operators.GraphOps.queries("graph_component_size_dist")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((4L, 1L)), s"got $got")
  }

  test("text_langid_confusion: cells partition each true language's docs") {
    val rows = operators.TextOps.queries("text_langid_confusion")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val rec = cells.map(_._4).sum
      assert(rec > 0.99 && rec < 1.01, s"recalls must sum to ~1, got $rec")
    }
  }

  test("mine_reorder_gap_profile: hand gaps give exact histogram quantiles") {
    val dir = tempDir()
    import spark.implicits._
    def o(id: Long, day: Int) = (id, 1L, "O", 10.0,
      java.sql.Timestamp.valueOf(f"2020-01-$day%02d 00:00:00"), "x")
    writeFixture(dir, "orders", Seq(o(1, 1), o(2, 3), o(3, 11))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    val got = operators.MiningOps.queries("mine_reorder_gap_profile")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).toSeq
    // gaps 2 and 8: mean 5, p50 = 2 (cum 1 of 2 → 100 ≥ 100), p90 = 8
    assert(got == Seq((2L, 5.0, 2L, 8L)), s"got $got")
  }

  test("diag_join_fanout: multiplicities partition keys and rows") {
    val rows = operators.MiningOps.queries("diag_join_fanout")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val li = Tables.lineitem(spark, sf001)
    val keys = li.select(col("l_orderkey")).distinct().count()
    val total = li.count()
    assert(rows.map(_._2).sum == keys)
    assert(rows.map(t => t._1 * t._2).sum == total)
    val exp = BigDecimal(total.toDouble / keys)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall(_._3 == exp))
  }

  test("set_symmetric_diff: each key lands on exactly one side") {
    val rows = operators.SortsAndSets.queries("set_symmetric_diff")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.map(_._1).distinct.size == rows.size, "keys must be unique")
    val c = Tables.customer(spark, sf001)
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val b = c.filter(col("c_acctbal") > 9000.0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val exp = (a -- b).map(_ -> "building_only") ++ (b -- a).map(_ -> "rich_only")
    assert(rows.toSet == exp, s"got ${rows.size} exp ${exp.size}")
  }

  test("vec_label_separation: orthogonal and aligned planted centroids") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "embeddings", Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 1),
      (2L, Seq(2.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label"))
    val got = operators.VectorOps.queries("vec_label_separation")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got == Seq((0, 1, 0.0), (0, 2, 1.0), (1, 2, 0.0)), s"got $got")
  }

  test("text_vocab_coverage: a known tiny vocabulary covers fully by rank 100") {
    val got = operators.TextOps.queries("text_vocab_coverage")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    // sf0.001's vocabulary is below the first checkpoint — the curve
    // must still report its final rank, with full coverage
    val vocab = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count().toInt
    assert(got.map(_._1) ==
      (Seq(100, 250, 500).filter(_ < vocab) :+ math.min(vocab, 500)))
    assert(got.last._3 == (if (vocab <= 500) 1.0 else got.last._3))
    val covs = got.map(_._3)
    assert(covs.zip(covs.tail).forall { case (a, b) => b >= a })
  }

  test("vec_centroid_drift: orthogonal and identical planted halves") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "embeddings", Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 0),
      (2L, Seq(0.5f, 0.5f), 1), (3L, Seq(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label"))
    val got = operators.VectorOps.queries("vec_centroid_drift")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((0, 1L, 1L, 0.0), (1, 1L, 1L, 1.0)), s"got $got")
  }

  test("mine_rfm_segments: five single-order customers land on the diagonal") {
    val dir = tempDir()
    import spark.implicits._
    // customer k: order on Jan k, $1000·k → r_score=k (fresher=higher),
    // f_score=1 (all freq 1), m_score=k
    writeFixture(dir, "orders", (1 to 5).map { k =>
      (k.toLong, k.toLong, "O", 1000.0 * k,
        java.sql.Timestamp.valueOf(s"2020-01-0$k 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    val got = operators.MiningOps.queries("mine_rfm_segments")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val exp = (1 to 5).map(k => (k, 1, k, 1L, 1000.0 * k))
    assert(got == exp, s"got $got")
  }

  test("mine_rfm_segments: segment counts partition the customer base") {
    val rows = operators.MiningOps.queries("mine_rfm_segments")(spark, sf001)
      .collect()
    val nCust = Tables.orders(spark, sf001)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    assert(rows.forall { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).forall(s => s >= 1 && s <= 5) })
  }

  test("diag_dup_rate_by_source: first-wins is global, dups charge the copier") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "x", "en", "s0", 1L), (2L, "x", "en", "s0", 1L),
      (3L, "x", "en", "s1", 1L), (4L, "y", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.MiningOps.queries("diag_dup_rate_by_source")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // doc 1 is the global first of "x": docs 2 (s0) and 3 (s1) are dups
    assert(got == Seq(("s0", 2L, 1L, 0.5), ("s1", 2L, 1L, 0.5)), s"got $got")
  }

  test("BottomKAgg: merge of split samples equals the sample of the union") {
    val agg = new functions.BottomKAgg(5)
    val xs = (1L to 40L).map(i => (functions.Md5Hash.hash60(s"k$i"), i))
    val whole = xs.foldLeft(agg.zero) { (b, x) => agg.reduce(b, x) }
    val (l, r) = xs.splitAt(13)
    val merged = agg.merge(
      l.foldLeft(agg.zero) { (b, x) => agg.reduce(b, x) },
      r.foldLeft(agg.zero) { (b, x) => agg.reduce(b, x) })
    assert(whole.toSeq == merged.toSeq)
    assert(agg.finish(whole).toSeq == xs.sorted.take(5).map(_._2))
  }

  test("sample_bottomk_per_group: samples equal a driver recompute at sf0.001") {
    val got = operators.TextOps.queries("sample_bottomk_per_group")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val docs = Tables.documents(spark, sf001)
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = docs.groupBy(_._1).map { case (lang, ds) =>
      val ids = ds.map(_._2)
        .sortBy(id => (functions.Md5Hash.hash60(s"b|$id"), id))
        .take(operators.TextOps.BottomKSample)
      (lang, ds.size.toLong, ids.mkString(","))
    }.toSeq.sortBy(_._1)
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("pipeline_incremental_dedup: planted delta hits all three statuses") {
    val dir = tempDir()
    import spark.implicits._
    // delta = doc_id % 5 == 4: docs 4, 9, 14, 19; base = the rest
    writeFixture(dir, "documents", Seq(
      (1L, "base-text", "en", "s0", 9L),   // base fingerprint
      (4L, "base-text", "en", "s0", 9L),   // delta: dup_of_base
      (9L, "fresh", "en", "s0", 5L),       // delta: new (first in delta)
      (14L, "fresh", "en", "s0", 5L),      // delta: dup_within_delta
      (19L, "alone", "en", "s0", 5L))      // delta: new
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.DedupOps.queries("pipeline_incremental_dedup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("dup_of_base", 1L), ("dup_within_delta", 1L), ("new", 2L)),
      s"got $got")
  }

  test("pipeline_shard_balance: assignment matches the md5 basis per doc") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (10L, "a", "en", "s0", 5L), (11L, "b", "en", "s0", 7L),
      (12L, "c", "de", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.MiningOps.queries("pipeline_shard_balance")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = Seq(10L -> 5L, 11L -> 7L, 12L -> 11L)
      .groupBy { case (id, _) =>
        (functions.Md5Hash.hash60(s"s|$id") % operators.MiningOps.ShardCount).toInt }
      .map { case (sh, ds) => (sh, ds.size.toLong, ds.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    assert(got == exp, s"got $got exp $exp")
  }
}

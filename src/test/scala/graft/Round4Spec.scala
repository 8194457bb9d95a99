package graft

import org.apache.spark.sql.functions._

/** Round-4 additions: the keyed-upsert merge and the distributed
  * prefix-max rewrite of the batch-watermark query. */
class Round4Spec extends SparkTestBase {

  private def ordersDf(rows: (Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.map { case (k, c, d, p) => (k, c, "O", p,
      java.sql.Timestamp.valueOf(d), "5-LOW") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
  }

  test("pipeline_upsert_snapshot: updates win over base, inserts appear, others pass through") {
    val dir = tempDir()
    // keys: 7 → repriced update; 11 → source of an insert; 5 → untouched
    writeFixture(dir, "orders", ordersDf(
      (5L, 100L, "1995-01-01 00:00:00", 10.0),
      (7L, 101L, "1995-01-02 00:00:00", 20.0),
      (11L, 102L, "1995-01-03 00:00:00", 30.0)))
    val out = operators.Scans.queries("pipeline_upsert_snapshot")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (5L, 10.0, "base"),                                   // untouched
      (7L, 21.0, "delta"),                                  // repriced 5%
      (11L, 30.0, "base"),                                  // update source, key kept
      (11L + operators.Scans.UpsertNewKeyOffset, 30.0, "delta"))) // insert
  }

  test("pipeline_upsert_snapshot: merge output is keyed — one row per key") {
    val out = operators.Scans.queries("pipeline_upsert_snapshot")(spark, sf001)
    val n = out.count()
    val keys = out.select(countDistinct(col("o_orderkey"))).head.getLong(0)
    assert(n == keys, s"merge must emit exactly one row per key ($n rows, $keys keys)")
    // all three merge outcomes occur on real data
    val srcs = out.select(col("src")).distinct().collect().map(_.getString(0)).toSet
    assert(srcs == Set("base", "delta"))
  }

  test("agg_quantile_hist: estimate is the bin upper edge of the discrete quantile") {
    val w = operators.Aggregates.QuantileHistWidth
    val est = operators.Aggregates.queries("agg_quantile_hist")(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> Seq(50 -> r.getLong(2), 90 -> r.getLong(3),
        99 -> r.getLong(4))).toMap
    // discrete q-quantile per flag: the smallest value whose rank
    // reaches ceil(q·n) — exactly what the histogram's cumulative-count
    // threshold selects, so disc < est <= disc + binWidth always
    val byFlag = Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    for ((flag, qs) <- est; (q, e) <- qs) {
      val vals = byFlag(flag)
      val n = vals.length.toLong
      val disc = vals(((n * q + 99) / 100 - 1).toInt)
      assert(e > disc - 1e-9 && e <= disc + w + 1e-9,
        s"$flag p$q: est $e must be the bin upper edge of discrete quantile $disc (width $w)")
    }
  }

  test("text_winnow_fingerprint: shared substring >= k+w-1 chars -> shared fingerprint") {
    val dir = tempDir()
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog"
    writeFixture(dir, "documents", Seq(
      (1L, "en", "web", shared + " and then some trailing words here"),
      (2L, "en", "web", "a totally different prefix before " + shared),
      (3L, "en", "web", "nothing in common with either of the others at all"),
      (4L, "en", "web", "tiny")) // < 11 chars: no full window, dropped
      .toDF("doc_id", "lang", "source", "text"))
    val rows = operators.TextOps.queries("text_winnow_fingerprint")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "doc 4 must drop")
    // recompute full fingerprint sets independently to check overlap
    // (the query's fp_sample only carries the first 8)
    def fps(text: String): Set[Long] = {
      val t = text.toLowerCase
      val k = operators.TextOps.WinnowK; val w = operators.TextOps.WinnowW
      val hs = (0 to t.length - k).map { i =>
        java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            t.substring(i, i + k)).substring(0, 15), 16)
      }
      (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
    }
    val s1 = fps("the quick brown fox jumps over the lazy dog and then some trailing words here")
    val s2 = fps("a totally different prefix before the quick brown fox jumps over the lazy dog")
    val s3 = fps("nothing in common with either of the others at all")
    assert((s1 & s2).nonEmpty, "docs sharing a 43-char substring must share fingerprints")
    assert((s1 & s3).isEmpty && (s2 & s3).isEmpty,
      "the unrelated doc shares no 11-char run, so no fingerprints")
    // and the query's n_fp matches the independent computation
    assert(rows(0).getInt(1) == s1.size && rows(2).getInt(1) == s3.size)
  }

  test("ts_late_data_semantics: bucketed prefix max equals the single-window semantics") {
    val dir = tempDir()
    import spark.implicits._
    def ns(hms: Long) = (1577836800L + hms) * 1000000000L // 2020-01-01 UTC + s
    // arrival order (event_id) deliberately scrambles event time: the
    // running max must come from ARRIVAL order, crossing bucket
    // boundaries (PrefixMaxBuckets ≫ 6 rows → every row its own bucket)
    writeFixture(dir, "events", Seq(
      (1L, ns(36000), 1L, "a", 1.0, "{}"),  // 10:00
      (2L, ns(46800), 1L, "a", 1.0, "{}"),  // 13:00 — max jumps
      (3L, ns(37800), 1L, "a", 1.0, "{}"),  // 10:30 — >1h late → dropped
      (4L, ns(45000), 1L, "a", 1.0, "{}"),  // 12:30 — within 1h of 13:00
      (5L, ns(50400), 1L, "a", 1.0, "{}"),  // 14:00
      (6L, ns(47100), 1L, "a", 1.0, "{}"))  // 13:05 — within 1h of 14:00
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_late_data_semantics")(spark, dir)
      .select(col("ws").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // survivors: 10:00 (first), 13:00, 12:30, 14:00, 13:05 — hour buckets
    assert(got == Seq(
      ("2020-01-01 10:00:00", 1L),
      ("2020-01-01 12:00:00", 1L),
      ("2020-01-01 13:00:00", 2L),
      ("2020-01-01 14:00:00", 1L)), s"got $got")
  }

  test("mine_assoc_rules: support, confidence, and lift on a hand-checked basket set") {
    val dir = tempDir()
    import spark.implicits._
    // baskets: o1{A,B} o2{A,B} o3{A,C} o4{B}  (brand per part)
    writeFixture(dir, "part", Seq(
      (1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("p_partkey", "p_brand"))
    writeFixture(dir, "lineitem", Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L), (4L, 2L),
      (2L, 1L)) // duplicate (order, part) row — must not inflate support
      .toDF("l_orderkey", "l_partkey"))
    val rows = operators.MiningOps.assocRules(spark, dir, 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // supp(A,B)=2 of n=4; A in 3, B in 3 → confs 2/3, lift 2*4/9
    // supp(A,C)=1; C in 1 → conf_a_b 1/3, conf_b_a 1, lift 4/3
    assert(rows.toSeq == Seq(
      ("A", "B", 2L, 0.6667, 0.6667, 0.8889),
      ("A", "C", 1L, 0.3333, 1.0, 1.3333)), s"got ${rows.toSeq}")
  }

  test("diag_key_skew: shares and cumulative shares on a skewed key column") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "lineitem",
      (Seq.fill(5)(10L) ++ Seq.fill(3)(20L) ++ Seq.fill(2)(30L))
        .map(k => (k, k)).toDF("l_orderkey", "l_partkey"))
    val rows = operators.MiningOps.queries("diag_key_skew")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1, 10L, 5L, 0.5, 0.5),
      (2, 20L, 3L, 0.3, 0.8),
      (3, 30L, 2L, 0.2, 1.0)), s"got ${rows.toSeq}")
  }

  test("diag_column_profile: null, distinct, and extrema per column in one pass") {
    val dir = tempDir()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    writeFixture(dir, "orders", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 100L, "O", 10.5, ts("1995-01-01 00:00:00"), "1-URGENT"),
        Row(2L, null, "F", 20.5, ts("1996-06-15 00:00:00"), "1-URGENT"),
        Row(3L, 100L, "O", 30.5, ts("1997-12-31 00:00:00"), null))), schema))
    val got = operators.MiningOps.queries("diag_column_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("o_custkey", 3L, 1L, 1L, "100", "100"),
      ("o_orderdate", 3L, 0L, 3L, "1995-01-01 00:00:00", "1997-12-31 00:00:00"),
      ("o_orderkey", 3L, 0L, 3L, "1", "3"),
      ("o_orderpriority", 3L, 1L, 1L, "1-URGENT", "1-URGENT"),
      ("o_orderstatus", 3L, 0L, 2L, "F", "O"),
      ("o_totalprice", 3L, 0L, 3L, "10.5", "30.5")), s"got $got")
  }

  test("agg_incremental_merge: merged base+delta partials equal the direct aggregate") {
    val dir = tempDir()
    // keys straddle the 1997-01-01 split in both priority groups
    writeFixture(dir, "orders", ordersDf(
      (1L, 100L, "1995-01-01 00:00:00", 10.0),
      (2L, 101L, "1996-06-01 00:00:00", 30.0),
      (3L, 102L, "1997-02-01 00:00:00", 20.0),
      (4L, 103L, "1998-03-01 00:00:00", 40.0)))
    val got = operators.MiningOps.queries("agg_incremental_merge")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(("5-LOW", 4L, 100.0, 10.0, 40.0)), s"got $got")
  }

  test("pipeline_range_bucket: histogram deciles spread one-order-per-bin evenly") {
    val dir = tempDir()
    // one order per 1000-wide bin: decile edges land at d*1000 and
    // every bucket holds exactly its one order
    writeFixture(dir, "orders", ordersDf(
      (1L to 10L).map(i => (i, 100L + i, s"1995-01-0${(i % 9) + 1} 00:00:00",
        i * 1000.0 - 500.0)): _*))
    val got = operators.MiningOps.queries("pipeline_range_bucket")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == (1 to 10).map(i => (i, 1L, i * 1000.0 - 500.0, i * 1000.0 - 500.0)),
      s"got $got")
  }

  test("join_bloom_prefilter: equals the plain semi join on a fixture straddling the threshold") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "orders", ordersDf(
      (1L, 100L, "1995-01-01 00:00:00", 480000.0),  // qualifies
      (2L, 101L, "1995-01-02 00:00:00", 475000.0),  // at threshold: excluded (strict >)
      (3L, 102L, "1995-01-03 00:00:00", 499000.0))) // qualifies
    writeFixture(dir, "lineitem", Seq(
      (1L, "A", 5.0), (1L, "R", 7.0), (2L, "A", 11.0), (3L, "A", 13.0), (9L, "A", 17.0))
      .toDF("l_orderkey", "l_returnflag", "l_quantity"))
    val got = operators.Joins.queries("join_bloom_prefilter")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // orders 1 and 3 qualify → lineitems (1,A,5), (1,R,7), (3,A,13)
    assert(got == Seq(("A", 2L, 18.0), ("R", 1L, 7.0)), s"got $got")
  }

  test("dedup_winnow_pairs: shared-substring docs pair; boilerplate postings over the cap do not") {
    val dir = tempDir()
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    // every fingerprint of `boiler` lands in 10 docs > WinnowPostingCap=8,
    // so the boilerplate family must produce NO pairs; each doc's unique
    // head keeps its boundary k-grams distinct
    val boiler = " standard disclaimer text appended to every record in this corpus"
    val docs = Seq(
      (1L, "en", "web", shared + " with a unique tail here"),
      (2L, "en", "web", "another unique head before " + shared)) ++
      (3L to 12L).map(i => (i, "en", "web", s"doc number $i головная part" + boiler))
    writeFixture(dir, "documents", docs.toDF("doc_id", "lang", "source", "text"))
    val rows = operators.DedupOps.queries("dedup_winnow_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"only the planted pair may survive, got ${rows.toSeq}")
    val (_, _, nShared, overlap) = rows.head
    assert(nShared >= operators.DedupOps.WinnowMinShared)
    assert(overlap > 0.0 && overlap <= 1.0)
  }

  test("diag_fk_violations: planted orphans are counted per edge") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "customer", Seq(
      (1L, 100.0), (2L, -50.0), (3L, 10.0))
      .toDF("c_custkey", "c_acctbal"))
    // custkey 9 has no parent at all; custkey 2 exists but is inactive
    writeFixture(dir, "orders", ordersDf(
      (10L, 1L, "1995-01-01 00:00:00", 1.0),
      (11L, 2L, "1995-01-02 00:00:00", 1.0),
      (12L, 9L, "1995-01-03 00:00:00", 1.0),
      (13L, 9L, "1995-01-04 00:00:00", 1.0)))
    // lineitem order 99 is an orphan of orders
    writeFixture(dir, "lineitem", Seq((10L, 1L), (99L, 2L))
      .toDF("l_orderkey", "l_partkey"))
    val got = operators.MiningOps.queries("diag_fk_violations")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("lineitem->orders", 2L, 1L, 1L),
      ("orders->customer", 4L, 2L, 1L),
      ("orders->customer_active", 4L, 3L, 2L)), s"got ${got.toSeq}")
    // real corpus: TPC-H referential integrity holds on the raw edges
    val clean = operators.MiningOps.queries("diag_fk_violations")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(clean("orders->customer") == 0L && clean("lineitem->orders") == 0L)
  }

  test("mine_seq_transitions: lag pairs per user, counted globally") {
    val dir = tempDir()
    import spark.implicits._
    def ns(s: Long) = (1577836800L + s) * 1000000000L
    // user 1: a→b→a ; user 2: b→a — transitions a→b, b→a, b→a
    writeFixture(dir, "events", Seq(
      (1L, ns(10), 1L, "a", 1.0, "{}"),
      (2L, ns(20), 1L, "b", 1.0, "{}"),
      (3L, ns(30), 1L, "a", 1.0, "{}"),
      (4L, ns(10), 2L, "b", 1.0, "{}"),
      (5L, ns(20), 2L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.MiningOps.queries("mine_seq_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(("b", "a", 2L, 0.6667), ("a", "b", 1L, 0.3333)),
      s"got ${got.toSeq}")
  }

  test("ts_ewma: exact powers-of-two weighting on a hand series") {
    val dir = tempDir()
    import spark.implicits._
    def ns(s: Long) = (1577836800L + s) * 1000000000L
    writeFixture(dir, "events", Seq(
      (1L, ns(10), 1L, "a", 1.0, "{}"),
      (2L, ns(20), 1L, "a", 2.0, "{}"),
      (3L, ns(30), 1L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_ewma")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // m=1: 1.0 ; m=2: (1·1+2·2)/3 ; m=3: (1·1+2·2+4·4)/7
    assert(got(1L) == 1.0)
    assert(got(2L) == 1.6667, s"got ${got(2L)}")
    assert(got(3L) == 3.0, s"got ${got(3L)}")
  }

  test("diag_benford: planted one-per-digit prices give uniform shares") {
    val dir = tempDir()
    writeFixture(dir, "orders", ordersDf(
      (1 to 9).map(dg => (dg.toLong, 1L, "1995-01-01 00:00:00",
        dg * 111.11)): _*))
    val got = operators.MiningOps.queries("diag_benford")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1 to 9))
    assert(got.forall(_._2 == 1L))
    assert(got.forall(t => t._3 == 0.1111), s"got ${got.toSeq}")
    // Benford expectation of digit 1 ≈ 0.3010
    assert(got.head._4 == 0.301, s"got ${got.head}")
  }

  test("mine_cooccur_pmi: hand baskets give ln of the exact ratio") {
    val dir = tempDir()
    import spark.implicits._
    def ns(s: Long) = (1577836800L + s) * 1000000000L
    // u1 {click,view}, u2 {click,view}, u3 {view}:
    // pair (click,view) support 2, s_click=2, s_view=3, n=3 →
    // pmi = ln(2·3/(2·3)) = 0
    val rows = Seq(
      (1L, ns(1), 1L, "click", 1.0, "{}"), (2L, ns(2), 1L, "view", 1.0, "{}"),
      (3L, ns(3), 2L, "click", 1.0, "{}"), (4L, ns(4), 2L, "view", 1.0, "{}"),
      (5L, ns(5), 3L, "view", 1.0, "{}"))
    writeFixture(dir, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.MiningOps.queries("mine_cooccur_pmi")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("click", "view", 2L, 0.0)), s"got $got")
  }

  test("win_ntile_deciles: 20 uniform rows band into 10 deciles of 2") {
    val dir = tempDir()
    writeFixture(dir, "orders", ordersDf(
      (1 to 20).map(i => (i.toLong, 1L, "1995-01-01 00:00:00",
        i * 10.0)): _*))
    val got = operators.Windows.queries("win_ntile_deciles")(spark, dir)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq == (1 to 10))
    assert(got.forall(_._2 == 2L))
    // decile d covers prices (2d−1)·10 and 2d·10
    got.foreach { case (dg, _, lo, hi, sp) =>
      assert(lo == (2 * dg - 1) * 10.0 && hi == 2 * dg * 10.0 &&
        sp == lo + hi, s"decile $dg: $lo..$hi sum $sp") }
  }

  test("diag_drift_psi: identical half-distributions score exactly 0") {
    val dir = tempDir()
    import spark.implicits._
    // same {10, 60} value mix on both sides of the 2024-01-16 split
    def ev(id: Long, day: Int, v: Double) =
      (id, (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00").getTime)
        * 1000000L, 1L, "a", v, "{}")
    writeFixture(dir, "events", Seq(
      ev(1, 5, 10.0), ev(2, 6, 60.0), ev(3, 20, 10.0), ev(4, 21, 60.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = operators.MiningOps.queries("diag_drift_psi")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((2L, 2L, 2L, 0.0)), s"got $r")
  }

  test("ts_seasonal_profile: hand hours give exact shares and means") {
    val dir = tempDir()
    import spark.implicits._
    def ns(s: Long) = (1577836800L + s) * 1000000000L
    writeFixture(dir, "events", Seq(
      (1L, ns(60), 1L, "a", 2.0, "{}"),      // hod 0
      (2L, ns(120), 1L, "a", 4.0, "{}"),     // hod 0
      (3L, ns(3660), 1L, "a", 9.0, "{}"))    // hod 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_seasonal_profile")(spark, dir)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == Seq((0, 2L, 3.0, 0.6667), (1, 1L, 9.0, 0.3333)), s"got $got")
  }

  test("ts_autocorr: hand series hit the r = ±1 poles exactly") {
    val dir = tempDir()
    import spark.implicits._
    def ns(s: Long) = (1577836800L + s) * 1000000000L
    // type a: 1,2,3,4 hourly (perfect linear trend → acf1 = 1);
    // type b: 1,5,1,5 alternating (perfect mean reversion → acf1 = −1)
    val rows = Seq.tabulate(4) { h =>
      (h.toLong * 2 + 1, ns(3600L * h), 1L, "a", (h + 1).toDouble, "{}")
    } ++ Seq.tabulate(4) { h =>
      (h.toLong * 2 + 2, ns(3600L * h), 2L, "b",
        if (h % 2 == 0) 1.0 else 5.0, "{}")
    }
    writeFixture(dir, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_autocorr")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a") == ((3L, 1.0)), s"got ${got("a")}")
    assert(got("b") == ((3L, -1.0)), s"got ${got("b")}")
  }

  test("ts_changepoint_meanshift finds a planted level shift at its boundary") {
    val dir = tempDir()
    import spark.implicits._
    def ns(s: Long) = (1577836800L + s) * 1000000000L
    // 0,0,0,10,10,10 hourly → best split after hour index 2 (t=3):
    // |0−10|·sqrt(3·3/6) = 12.2474
    val rows = Seq.tabulate(6) { h =>
      (h.toLong + 1, ns(3600L * h), 1L, "a",
        if (h < 3) 0.0 else 10.0, "{}")
    }
    writeFixture(dir, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_changepoint_meanshift")(spark, dir)
      .collect().map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime](1).toEpochSecond(java.time.ZoneOffset.UTC),
        r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == 1)
    val (tp, cpS, t, n, stat) = got.head
    assert(tp == "a" && t == 3 && n == 6L, s"got ${got.head}")
    assert(cpS == 1577836800L + 2 * 3600L, s"cp at wrong hour: ${got.head}")
    assert(stat == 12.2474, s"got $stat")
  }

  test("HllAgg: estimate within HLL error bounds; merge equals direct") {
    import graft.functions.HllAgg
    val agg = new HllAgg(512)
    def regs(vs: Seq[String]) = vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    // register-level merge soundness: union == element-wise max
    val a = regs((1 to 5000).map(i => s"a$i"))
    val b = regs((2500 to 7500).map(i => s"a$i"))
    val direct = regs(((1 to 5000) ++ (2500 to 7500)).map(i => s"a$i"))
    assert(agg.merge(a.clone(), b).toSeq == direct.toSeq)
    // estimate accuracy: σ ≈ 1.04/√512 ≈ 4.6%; 3σ bound on one draw
    val n = 10000
    val r = regs((1 to n).map(i => s"v$i"))
    val s = r.map(m => math.pow(2.0, -m)).sum
    val est = 0.7213 / (1.0 + 1.079 / 512) * 512.0 * 512.0 / s
    assert(math.abs(est - n) < 0.15 * n, s"estimate $est for true $n")
    // the query agrees with its own exact twin within the same bound
    val rows = operators.Aggregates.queries("agg_hll_md5")(spark, sf001)
      .collect().map(r2 => (r2.getLong(1), r2.getDouble(2)))
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) < 0.15 * exact + 10,
        s"approx $approx vs exact $exact") }
  }

  test("text_zipf_slope: uniform frequencies fit slope 0 at the constant intercept") {
    val dir = tempDir()
    import spark.implicits._
    // every term appears exactly twice → y constant → slope exactly 0,
    // intercept = ln(2) rounded
    writeFixture(dir, "documents", Seq(
      (1L, "en", "web", "alpha beta gamma delta"),
      (2L, "en", "web", "alpha beta gamma delta"))
      .toDF("doc_id", "lang", "source", "text"))
    val r = operators.TextOps.queries("text_zipf_slope")(spark, dir).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.0, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.6931, s"intercept ${r.getDouble(2)}")
    // real corpus: a Zipf-ish curve must slope downward
    val real = operators.TextOps.queries("text_zipf_slope")(spark, sf001).head()
    assert(real.getDouble(1) < 0.0)
  }

  test("pipeline_quality_funnel: each planted reject falls at its own gate") {
    val dir = tempDir()
    import spark.implicits._
    val good = (1 to 40).map(i => s"w$i").mkString(" ") // 40 distinct tokens
    writeFixture(dir, "documents", Seq(
      (1L, good, "en", "web", 200L),                   // survives every gate
      (2L, good, "en", "web", 100L),                   // < FunnelMinChars
      (3L, good, "zh", "web", 200L),                   // blocked language
      (4L, "a b c", "en", "web", 200L),                // < FunnelMinTokens
      (5L, Seq.fill(50)("x").mkString(" "), "en", "web", 200L), // top share 1.0
      (6L, good, "en", "web", 200L))                   // exact dup of doc 1
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = operators.TextOps.queries("pipeline_quality_funnel")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0, "ingest", 6L, 0L),
      (1, "min_chars", 5L, 1L),
      (2, "lang_allow", 4L, 1L),
      (3, "min_tokens", 3L, 1L),
      (4, "repetition_cap", 2L, 1L),
      (5, "exact_dedup", 1L, 1L)), rows.toSeq.toString)
  }

  test("diag_chi2_independence: independent table -> 0, deterministic association -> max V") {
    import spark.implicits._
    def docs(rows: Seq[(String, String)]): String = {
      val dir = tempDir()
      writeFixture(dir, "documents", rows.zipWithIndex.map { case ((l, s), i) =>
        (i.toLong, s"text $i", l, s, 10L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      dir
    }
    // perfectly independent 2×2 (every cell = product of marginals/N)
    val ind = docs(for { l <- Seq("en", "de"); s <- Seq("web", "book") }
      yield (l, s))
    val r1 = operators.MiningOps.queries("diag_chi2_independence")(spark, ind).head()
    assert(r1.getLong(1) == 1L) // dof (2-1)(2-1)
    assert(r1.getDouble(2) == 0.0 && r1.getDouble(3) == 0.0, r1.toString)
    // deterministic association: lang fixes source → chi2 = N, V = 1
    val dep = docs(Seq.fill(3)(("en", "web")) ++ Seq.fill(3)(("de", "book")))
    val r2 = operators.MiningOps.queries("diag_chi2_independence")(spark, dep).head()
    assert(r2.getDouble(2) == 6.0, s"chi2 must equal N: $r2")
    assert(r2.getDouble(3) == 1.0, s"V must be 1: $r2")
  }
}

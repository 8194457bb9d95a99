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
}

package graft

/** Round-4f additions: market-concentration (HHI) and the
  * sweep-line peak-concurrency operator. */
class Round4fSpec extends SparkTestBase {

  /** events fixture row: ts carried as NANOS (the driver parquet's
    * TIMESTAMP(NANOS) convention Tables normalizes) */
  private def evm(id: Long, user: Long, minute: Int) =
    (id, (1577836800L + minute * 60L) * 1000000000L, user, "view", 1.0, "{}")

  test("mine_hhi_concentration: monopoly scores 10000, duopoly 5000") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "nation", Seq((1, "MONO"), (2, "DUO"))
      .toDF("n_nationkey", "n_name"))
    writeFixture(dir, "supplier", Seq((10L, 1), (20L, 2), (21L, 2))
      .toDF("s_suppkey", "s_nationkey"))
    // nation 1: one firm; nation 2: two equal firms (discount halves
    // supplier 21's 200.0 gross to 100.0 net — net shares are equal)
    writeFixture(dir, "lineitem", Seq(
      (10L, 40.0, 0.0), (20L, 100.0, 0.0), (21L, 200.0, 0.5))
      .toDF("l_suppkey", "l_extendedprice", "l_discount"))
    val got = operators.MiningOps.queries("mine_hhi_concentration")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("DUO", 2L, 5000.0, 0.5), ("MONO", 1L, 10000.0, 1.0)),
      s"got $got")
  }

  test("ts_peak_concurrency: overlap counts 2, merged islands once") {
    val dir = tempDir()
    import spark.implicits._
    // user 1 at :00 and :20 → ONE merged interval [0, 50m]; user 2 at
    // :10 → [10m, 40m]. Transitions (all hour 0): +1@0, +1@10, −1@40,
    // −1@50 → peak 2, n_transitions 4.
    writeFixture(dir, "events", Seq(
      evm(1, 1L, 0), evm(2, 1L, 20), evm(3, 2L, 10))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_peak_concurrency")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((4L, 2L)), s"got $got")
  }

  test("ts_peak_concurrency: an exact handoff never counts double") {
    val dir = tempDir()
    import spark.implicits._
    // user 1's interval ends at :30 exactly when user 2's starts: the
    // −1 sorts before the +1 at the same instant, so the running sum
    // touches 0 between them and the hour-0 peak stays 1
    writeFixture(dir, "events", Seq(evm(1, 1L, 0), evm(2, 2L, 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.TimeSeriesOps.queries("ts_peak_concurrency")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // hour 0: +1@0, (−1,+1)@30m → 3 transitions, peak 1;
    // hour 1: −1@60m → run 0
    assert(got == Seq((3L, 1L), (1L, 0L)), s"got $got")
  }

  test("win_rolling_median: lower median over the trailing frame") {
    val dir = tempDir()
    import spark.implicits._
    def ev(id: Long, hour: Int, v: Double) =
      (id, (1577836800L + hour * 3600L) * 1000000000L, 1L, "view", v, "{}")
    // hourly sums 10, 5, 12, 3 → sorted frames [10] [5,10] [5,10,12]
    // [3,5,10,12] → lower medians 10, 5, 10, 5
    writeFixture(dir, "events", Seq(
      ev(1, 0, 10.0), ev(2, 1, 5.0), ev(3, 2, 12.0), ev(4, 3, 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = operators.Windows.queries("win_rolling_median")(spark, dir)
      .collect().map(r => (r.getInt(2), r.getDouble(3))).toSeq
    assert(got == Seq((1, 10.0), (2, 5.0), (3, 10.0), (4, 5.0)), s"got $got")
  }

  test("graph_eccentricity_bounded: radius and witness on a path graph") {
    val dir = tempDir()
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    // sym graph: 1:{S7,S8} 2:{S7} S7:{1,2} S8:{1} (the closeness fixture)
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 10.0, ts, "1-URGENT"), (2L, 2L, "O", 20.0, ts, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    writeFixture(dir, "lineitem", Seq(
      (1L, 7L), (1L, 8L), (2L, 7L)).toDF("l_orderkey", "l_suppkey"))
    val S = 1000000000000L
    val got = operators.GraphOps.queries("graph_eccentricity_bounded")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // seed 1: dists S7=1,S8=1,2=2 → ecc 2, witness 2;
    // seed 2: S7=1, 1=2, S8=3 → ecc 3, witness S8
    assert(got == Seq((1L, 2L, 3L, 2L), (2L, 3L, 3L, S + 8L)), s"got $got")
  }
}

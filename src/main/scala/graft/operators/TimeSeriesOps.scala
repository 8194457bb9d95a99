package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType

/** §2.9 — time-series / streaming-shaped operators, batch-first.
  *
  * The same `window()` / `session_window()` calls run unchanged under
  * `readStream` with a watermark — see graft.streaming.StreamPort for
  * the Structured Streaming port (semantics identical by design;
  * exercised by MemoryStream tests, no oracle possible for streams).
  *
  * Batch versions are verifiable against DuckDB: tumbling/sliding
  * windows map to time_bucket arithmetic, session windows to the
  * gaps-and-islands pattern, watermark late-drop to a running-max
  * window.
  */
object TimeSeriesOps {

  /** bucket count for the ts_late_data_semantics distributed prefix
    * max — bounds the rows through the one remaining unpartitioned
    * window (the per-bucket boundary aggregate) while giving the
    * within-bucket windows cluster-width parallelism */
  val PrefixMaxBuckets = 128

  /** forecast horizon (hours) for ts_holt_linear. */
  val HoltForecastH = 24

  /** value-bucket count for ts_mann_kendall's pair decomposition —
    * fixed-width integer buckets over each series' [min, max]; the
    * cross-week same-bucket pair join is ∝ n²/MkValueBuckets on an
    * even spread (a pathologically point-massed series degrades
    * toward the pair join, bounded by that mass's size — declared).
    * Shared with the oracle SQL so the two cannot drift. */
  val MkValueBuckets = 128

  /** bucket size (points) for ts_downsample_ltob. */
  val LtobBucket = 10

  /** candidate periods (hours) for ts_dominant_period. */
  val FourierPeriods = Seq(6, 12, 24, 168)

  /** order-statistic count for ts_hill_tail_index (top-k hourly
    * volumes per series), shared with the oracle SQL. */
  val HillK = 50

  /** 8dp string-literal trig table for period `p` — generated ONCE
    * here and embedded verbatim in BOTH the Spark expression and the
    * oracle SQL, so neither engine evaluates a transcendental. 8dp
    * (not more) keeps every z·factor product inside exact decimal
    * bounds in BOTH engines (Spark caps products at precision 38 and
    * would silently round a wider scale). */
  private def fourierTable(fn: String, p: Int): Seq[String] =
    (0 until p).map { k =>
      val v = if (fn == "cos") math.cos(2 * math.Pi * k / p)
              else math.sin(2 * math.Pi * k / p)
      BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toString
    }

  private def fourierFactorExpr(fn: String): String =
    FourierPeriods.map { p =>
      val arr = fourierTable(fn, p)
        .map(v => s"CAST('$v' AS DECIMAL(10,8))").mkString(", ")
      s"WHEN p = $p THEN element_at(array($arr), CAST(t % $p AS INT) + 1)"
    }.mkString("CASE ", " ", " END")

  private def fourierFactorSql(fn: String): String =
    FourierPeriods.map { p =>
      val arr = fourierTable(fn, p)
        .map(v => s"CAST('$v' AS DECIMAL(10,8))").mkString(", ")
      s"WHEN p = $p THEN ([$arr])[CAST(t % $p AS INT) + 1]"
    }.mkString("CASE ", " ", " END")

  val queries: Map[String, QFn] = Map(

    // winsorized robust mean per series: hourly sums clipped to the
    // series' own [p05, p95] before averaging, with the clip census —
    // the monitoring mean that one outage hour cannot drag (the
    // trimmed-estimator sibling of diag_outlier_mad's median/MAD).
    // Percentiles run per series over the BOUNDED hourly aggregate
    // (state ∝ hours, never events); hourly values and both bounds
    // are 4dp (the diag_outlier_mad discipline), the clip is
    // least/greatest on identical doubles, and the clipped mean is a
    // decimal-exact sum ÷ count.
    "ts_winsorized_mean" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
      val bounds = hourly.groupBy(col("event_type"))
        .agg(r4(expr("percentile(hsum, 0.05)")).as("p05"),
          r4(expr("percentile(hsum, 0.95)")).as("p95"))
      hourly.join(bounds, Seq("event_type"))
        .select(col("event_type"), col("p05"), col("p95"), col("hsum"),
          least(greatest(col("hsum"), col("p05")), col("p95")).as("cv"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          count_if(col("hsum") < col("p05")).as("n_clip_low"),
          count_if(col("hsum") > col("p95")).as("n_clip_high"),
          max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          r4(davg(col("cv"))).as("winsorized_mean"))
        .orderBy(col("event_type"))
    }),

    // visual downsampling by largest-triangle-one-bucket (LTOB,
    // Steinarsson): per series, keep one point per 10-point bucket —
    // the one whose triangle with its immediate neighbors has the
    // largest area — plus the series endpoints; the downsample that
    // preserves spikes a per-bucket average would flatten. Fully
    // parallel (unlike LTTB's chained variant): areas come from ONE
    // lag/lead window over the bounded hourly aggregate, the
    // per-bucket argmax from one rank window, both partitioned by the
    // series key. EXACT: x = row index, y = 1e-4-unit BIGINT, area =
    // |integer cross product| — no floats until the output rendering.
    "ts_downsample_ltob" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          * 10000).cast("long").as("y"))
      val ws = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val pts = hourly
        .withColumn("idx", row_number().over(ws).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .withColumn("yp", lag(col("y"), 1).over(ws))
        .withColumn("yn", lead(col("y"), 1).over(ws))
        // uniform hourly x-spacing → cross product reduces to
        // |(y_prev − y) + (y_next − y)| with unit x-steps
        .withColumn("area", abs(col("yp") - col("y") * 2 + col("yn")))
        .withColumn("bucket", expr(s"(idx - 1) div $LtobBucket"))
      val wr = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(desc_nulls_last("area"), col("idx"))
      pts.withColumn("rn", row_number().over(wr))
        .filter(col("idx") === 1L || col("idx") === col("n") ||
          (col("rn") === 1 && col("area").isNotNull))
        .select(col("event_type"), col("idx"), ntz(col("hour")).as("hour"),
          r4(col("y").cast("double") / 10000.0).as("v"))
        .orderBy(col("event_type"), col("idx"))
    }),

    // EWMA control band per series — the online anomaly detector:
    // exponentially-weighted mean AND variance maintained by one
    // integer recurrence (α=1/2 dyadic), each hour flagged when its
    // squared deviation exceeds 9× the running variance (|dev| > 3σ
    // WITHOUT any sqrt inside the fold — dev² > 9v compares exact
    // integers). CENT units keep squares inside int64. State and
    // flags fold per series over the bounded hourly array (the
    // ts_holt_linear shape); only the final rendering divides. The
    // oracle replays the identical coupled recurrence as a recursive
    // CTE — the sixth hash-oracled iterative computation.
    "ts_anomaly_ewma_band" -> ((s, d) => {
      val m1 = "(y + st.m) - pmod(y + st.m, 2)"          // 2·m' (exact)
      val mn = s"(($m1) div 2)"
      val dv = s"(y - $mn)"
      val v1 = s"(st.v + $dv * $dv) - pmod(st.v + $dv * $dv, 2)"
      val vn = s"(($v1) div 2)"
      val fl = s"IF($dv * $dv > 9 * st.v AND st.n >= 2, st.f + 1, st.f)"
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          * 100).cast("long").as("y"))
      hourly.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("hour"), col("y")))).as("hy"))
        .filter(size(col("hy")) >= 2)
        .withColumn("ys", expr("transform(hy, p -> p.y)"))
        .withColumn("st", expr(
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |  named_struct('m', ys[0], 'v', CAST(0 AS BIGINT),
             |    'n', CAST(1 AS BIGINT), 'f', CAST(0 AS BIGINT)),
             |  (st, y) -> named_struct('m', $mn, 'v', $vn,
             |    'n', st.n + 1, 'f', $fl))""".stripMargin))
        .select(col("event_type"), size(col("ys")).cast("long").as("n_hours"),
          r4(col("st.m").cast("double") / 100.0).as("ewma"),
          r4(sqrt(col("st.v").cast("double")) / 100.0).as("ew_sigma"),
          col("st.f").as("n_flagged"))
        .orderBy(col("event_type"))
    }),

    // Holt double-exponential smoothing per series — level + trend
    // with DYADIC gains (α=1/2, β=1/4) in EXACT integer arithmetic:
    // hourly sums become 1e-4-unit BIGINTs (the ts_ewma basis), the
    // recurrence l_t = (y_t + l_{t-1} + b_{t-1})/2,
    // b_t = (l_t − l_{t-1} + 3·b_{t-1})/4 runs with mathematical-mod
    // floor division (subtract pmod, then divide — the dividend is
    // made exactly divisible, so trunc-vs-floor conventions cannot
    // diverge between engines), and ONE final double division renders
    // the outputs. Shape: the raw stream feeds a hash agg; the fold
    // runs per series over the BOUNDED hourly array (a sequential
    // recurrence is inherently per-key — the array fold is the
    // distributed-safe shape, state ∝ series keys × hours). The
    // oracle replays the identical recurrence as a DuckDB recursive
    // CTE — the fifth hash-oracled iterative computation, on a
    // COUPLED two-state recurrence.
    "ts_holt_linear" -> ((s, d) => {
      val a0 = "y + st.l + st.b"
      val lnew = s"(($a0) - pmod($a0, 2)) div 2"
      val bArg = s"(($lnew) - st.l + 3 * st.b)"
      val bnew = s"(($bArg) - pmod($bArg, 4)) div 4"
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          * 10000).cast("long").as("y"))
      hourly.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("hour"), col("y")))).as("hy"))
        .filter(size(col("hy")) >= 2)
        .withColumn("ys", expr("transform(hy, p -> p.y)"))
        .withColumn("st", expr(
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |  named_struct('l', ys[0], 'b', ys[1] - ys[0]),
             |  (st, y) -> named_struct('l', $lnew, 'b', $bnew))""".stripMargin))
        .select(col("event_type"), size(col("ys")).cast("long").as("n_hours"),
          r4(col("st.l").cast("double") / 10000.0).as("level"),
          r4(col("st.b").cast("double") / 10000.0).as("trend"),
          r4((col("st.l") + col("st.b") * HoltForecastH).cast("double") / 10000.0)
            .as("forecast_24h"))
        .orderBy(col("event_type"))
    }),
    "ts_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("sum_value"))
        .select(ntz(col("window.start")).as("ws"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // 1h windows sliding every 15min: each event lands in exactly 4
    // windows; Spark's WindowExec expands them at scan time (no join)
    "ts_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(ntz(col("window.start")).as("ws"), col("event_type"), col("n"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // per-user sessions, 30-min inactivity gap; session end = last
    // event + gap (Spark session_window semantics — the oracle's
    // gaps-and-islands SQL reproduces exactly that: a new session
    // starts when ts - prev_ts >= gap)
    "ts_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          ntz(col("session_window.start")).as("session_start"),
          ntz(col("session_window.end")).as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // watermark semantics in batch: drop events more than 1h behind
    // the running max event-time in arrival (event_id) order, then
    // tumbling-window count of the survivors.
    //
    // The running max is a DISTRIBUTED two-pass prefix max (VERDICT
    // r3 fix), not a single unpartitioned window over the raw stream
    // (which funnels ALL events through one task at scale):
    //   pass 1 — range-bucket by event_id (PrefixMaxBuckets buckets)
    //            and take each bucket's max ts;
    //   pass 2 — cumulative max over the TINY per-bucket aggregate
    //            (one row per bucket; the only unpartitioned window,
    //            over ≤PrefixMaxBuckets rows) gives every bucket the
    //            max of all PRIOR buckets, broadcast back;
    //   combine — greatest(prior-bucket max, running max WITHIN the
    //            bucket, a partitioned window) == the global prefix
    //            max, identically to the one-pass formulation (the
    //            oracle SQL is unchanged).
    "ts_late_data_semantics" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"))
      // bucket id from the event_id range — declarative (one-row
      // bounds aggregate, cross-joined broadcast), no driver action;
      // width arithmetic in integer DIV so no magnitude overflows
      val bounds = ev.agg(min(col("event_id")).as("lo"),
        max(col("event_id")).as("hi"))
      val bucketed = ev.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((event_id - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${PrefixMaxBuckets - 1}) DIV $PrefixMaxBuckets) AS INT)"))
        .drop("lo", "hi")
      val perBucket = bucketed.groupBy(col("bk")).agg(max(col("ts")).as("bmax"))
      val wPrior = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prior = perBucket
        .withColumn("prior_mx", max(col("bmax")).over(wPrior))
        .select(col("bk"), col("prior_mx"))
      val wIn = Window.partitionBy(col("bk")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(prior), Seq("bk"))
        // greatest skips NULLs, so bucket 0 (no prior) uses the
        // within-bucket running max alone
        .withColumn("mx", greatest(col("prior_mx"), max(col("ts")).over(wIn)))
        .filter(col("ts") >= col("mx") - expr("INTERVAL 1 HOUR"))
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(ntz(col("window.start")).as("ws"), col("n"))
        .orderBy(col("ws"))
    }),

    // metric downsampling: raw events → per-(type, minute) summary
    // rows (count / min / max / exact sum) — the standard
    // high-frequency → storage-resolution reduction. One hash agg;
    // shuffle ∝ #series × #minutes, not #events.
    "ts_downsample_1m" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          r4(dsum(col("value"))).as("sum_value"))
        .select(col("event_type"), ntz(col("minute")).as("minute"),
          col("n"), col("min_value"), col("max_value"), col("sum_value"))
        .orderBy(col("event_type"), col("minute"))
    }),

    // interval union — merge each user's overlapping 30-minute
    // activity intervals into maximal covered spans (the coverage /
    // uptime primitive). Gaps-and-islands on intervals: a new island
    // starts where the event time exceeds the running max of all
    // previous interval ends; island id = running count of starts.
    // All arithmetic on epoch µs integers — exact in both engines —
    // and the event order is the total (t0, event_id).
    "ts_interval_union" -> ((s, d) => {
      val SpanUs = 1800000000L // 30 min
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t0"))
        .withColumn("t1", col("t0") + SpanUs)
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("t0"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("t0"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isl = ev
        .withColumn("starts", when(
          col("t0") > coalesce(max(col("t1")).over(wPrev), lit(Long.MinValue)),
          1L).otherwise(0L))
        .withColumn("isl", sum(col("starts")).over(wRun))
      isl.groupBy(col("user_id"), col("isl"))
        .agg(min(col("t0")).as("s"), max(col("t1")).as("e"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(expr("(e - s) div 1000000")).as("covered_s"))
        .orderBy(col("user_id"))
    }),

    // OHLC bars — the financial downsampling shape: per (series,
    // hour), the opening value (first by event time), high, low, and
    // closing value (last by event time). Open/close are argmin/argmax
    // by a (ts, event_id) struct — a total order, so ties at the same
    // timestamp cannot make the bar engine-dependent. One hash
    // aggregate with partial min_by/max_by state: shuffle ∝ #bars,
    // never #events.
    "ts_ohlc_bars" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          r4(max(col("value"))).as("high"),
          r4(min(col("value"))).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          count(lit(1)).as("n"))
        .select(col("event_type"), ntz(col("hour")).as("hour"),
          r4(col("open")).as("open"), col("high"), col("low"),
          r4(col("close")).as("close"), col("n"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // anomaly scoring: per-series (event_type) hourly sums z-scored
    // against the series' own mean/stddev; hours with |z| ≥ 2 flagged.
    // The filter applies to the ROUNDED score (SURVEY §2.0: never
    // branch on an unrounded float — a last-ulp cross-engine
    // difference at the threshold would flip row membership).
    "ts_anomaly_zscore" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
      val w = Window.partitionBy(col("event_type"))
      hourly
        .select(col("event_type"), col("hour"), col("hsum"),
          r4((col("hsum") - avg(col("hsum")).over(w)) /
            stddev_samp(col("hsum")).over(w)).as("z"))
        .filter(abs(col("z")) >= 2.0)
        .select(col("event_type"), ntz(col("hour")).as("hour"),
          col("hsum"), col("z"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // GAP FILL + carry-forward — the time-series densification every
    // metrics store provides: materialize the full (event_type, hour)
    // grid over the observed span, fill missing hours with n=0 and the
    // last known hourly sum (leading gaps → 0). Grid = one sequence()
    // generator crossed with the (tiny, broadcast) type dim; the fill
    // is one window pass per type — no per-gap joins. Grid rows ∝
    // span × #series, independent of event volume.
    "ts_gap_fill" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("sum_value"))
      val span = Tables.events(s, d)
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
      val hours = span
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      val types = Tables.events(s, d).select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      types.crossJoin(hours)
        .join(hourly, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(last(col("sum_value"), ignoreNulls = true).over(w), lit(0.0))
            .as("filled_sum"))
        .select(col("event_type"), ntz(col("hour")).as("hour"),
          col("n"), col("filled_sum"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // conversion funnel: per user, how many views convert (a purchase
    // by the same user within 1 h after the view). Directional range
    // join blocked on the user equi-key — same scale shape as
    // join_interval_overlap but with funnel semantics (view → purchase
    // order matters) and a per-user conversion-rate rollup.
    "ts_funnel_conversion" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"), col("ts").as("v_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      v.join(p, col("user_id") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy(col("user_id"))
        .agg(countDistinct(col("v_id")).as("n_views"),
          countDistinct(when(col("p_ts").isNotNull, col("v_id"))).as("n_converted"))
        .select(col("user_id"), col("n_views"), col("n_converted"),
          r4(col("n_converted").cast("double") / col("n_views")).as("conv_rate"))
        .orderBy(col("user_id"))
    }),

    // cohort retention: users grouped by first-activity day, distinct
    // active users per (cohort, day offset) — the standard retention
    // triangle. Two hash aggs + one co-keyed join; shuffle ∝ distinct
    // (user, day) pairs, never raw events.
    "ts_cohort_retention" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val first = act.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      act.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(ntz(col("cohort_day")).as("cohort_day"), col("day_offset"),
          col("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // deterministic form of dropDuplicatesWithinWatermark: keep the
    // earliest event per (user_id, event_type), ties broken by event_id
    "ts_dedup_within_watermark" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), ntz(col("ts")).as("first_ts"),
          col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // trailing-K exponential moving average (α=1/2) per user — the
    // decay metric a monitoring pipeline keeps per entity, in EXACT
    // integer arithmetic: values quantize to cents via the decimal
    // cast (half-up, engine-identical), weights are powers of two
    // (2^(K-m+i) for element i of the m collected values, K=20), and
    // the weighted sum stays a BIGINT until ONE final division — so
    // the result is bit-identical across engines and run orders,
    // where a naive pow(0.5, j) double fold would drift by
    // association order. Window partitions by user_id
    // (high-cardinality); the frame materializes ≤K values per row.
    "ts_ewma" -> ((s, d) => {
      val K = 20
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-(K - 1), Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("cents",
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
            .cast("long"))
        .withColumn("arr", collect_list(col("cents")).over(w))
        .withColumn("m", size(col("arr")))
        .withColumn("raw", expr(
          s"""aggregate(
             |  transform(arr, (x, i) -> x * shiftleft(CAST(1 AS BIGINT), $K - m + i)),
             |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
        .withColumn("denom",
          expr(s"shiftleft(CAST(1 AS BIGINT), $K) - shiftleft(CAST(1 AS BIGINT), $K - m)"))
        .select(col("event_id"), col("user_id"),
          r4(col("raw") / (col("denom") * 10000.0)).as("ewma"))
        .orderBy(col("event_id"))
    }),

    // burstiness (Fano factor / index of dispersion) per series:
    // variance-to-mean ratio of the hourly event COUNTS — ~1 for a
    // Poisson arrival stream, ≫1 for bursty traffic, <1 for
    // regular/throttled. The capacity-planning twin of the seasonal
    // profile. Pure integer sufficient statistics (counts and squared
    // counts over the bounded hourly aggregate), one final IEEE
    // formula written identically in both engines.
    "ts_burstiness" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("c"))
      hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("scc"))
        .select(col("event_type"), col("n_hours"),
          r4(col("sc").cast("double") / col("n_hours")).as("mean_per_hour"),
          r4((col("scc").cast("double") / col("n_hours") -
            (col("sc").cast("double") / col("n_hours")) *
            (col("sc").cast("double") / col("n_hours"))) /
            (col("sc").cast("double") / col("n_hours"))).as("fano"))
        .orderBy(col("event_type"))
    }),

    // Theil–Sen robust trend per series: the MEDIAN of all pairwise
    // slopes between hourly points — one wild hour corrupts a
    // least-squares slope (it enters the sums squared) but shifts a
    // median of ~H²/2 pairwise slopes by almost nothing. Scale shape:
    // the O(H²) pair join runs over the HOURLY AGGREGATE (H ≤ span
    // hours per series — bounded by the retention window, never by
    // event volume; the raw stream only feeds a hash aggregate), and
    // the pair space is partitioned by the series key. Determinism:
    // hourly sums are decimal-exact 4 dp doubles, Δt is an exact
    // integer hour count (truncated-hour timestamps subtract to
    // multiples of 3600), each slope is re-rounded to 4 dp before the
    // exact-percentile median.
    "ts_theil_sen" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
      val a = hourly.select(col("event_type"), col("hour").as("ah"),
        col("hsum").as("as_"))
      val b = hourly.select(col("event_type"), col("hour").as("bh"),
        col("hsum").as("bs"))
      a.join(b, Seq("event_type"))
        .filter(col("ah") < col("bh"))
        .select(col("event_type"),
          round((col("bs") - col("as_")) /
            expr("CAST((CAST(bh AS LONG) - CAST(ah AS LONG)) DIV 3600" +
              " AS DOUBLE)"), 4).as("slope"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          r4(expr("percentile(slope, 0.5)")).as("slope_per_hour"))
        .orderBy(col("event_type"))
    }),

    // lag-1 autocorrelation per series — "is this metric trending or
    // mean-reverting?": Pearson r between the hourly series and its
    // one-hour shift. The hourly sums stay EXACT DECIMAL(18,4) (never
    // rounded to double), so the five sufficient statistics (Σx, Σy,
    // Σxy, Σx², Σy²) are exact decimal sums — order/engine-independent
    // (the degree_assortativity discipline) — and the one final
    // IEEE-double formula is identical in both engines. The lag window
    // partitions by event_type over the HOURLY AGGREGATE (≤ span×5
    // rows), not raw events — the bounded-window discipline.
    // lead-lag cross-correlation between two behavioral series: does
    // view volume PREDICT purchase volume k hours later? Pearson of
    // (view_t, purchase_{t+k}) for k = 0..3 over the common hour
    // grid — the ts_autocorr exact-decimal discipline on a PAIR of
    // series. The lag join runs on integer epoch-second hour keys
    // (exact in both engines); each lag's sufficient statistics are
    // decimal sums over the joined rows; one IEEE formula per lag.
    "ts_crosscorr_lagged" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 8)
      val hourly = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(col("value").cast(dec)).as("h"))
      val v = hourly.filter(col("event_type") === "view")
        .select(col("hour").cast("long").as("sec"), col("h").as("x"))
      val p = hourly.filter(col("event_type") === "purchase")
        .select(col("hour").cast("long").as("psec"), col("h").as("y"))
      def dbl(c: String) = col(c).cast("double")
      v.select(explode(expr("sequence(0, 3)")).as("lag"), col("sec"), col("x"))
        .join(p, col("psec") === col("sec") + col("lag") * 3600L)
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("y")).cast(dec38)).as("sxy"),
          sum((col("x") * col("x")).cast(dec38)).as("sxx"),
          sum((col("y") * col("y")).cast(dec38)).as("syy"))
        .select(col("lag"), col("n"),
          r4((col("n") * dbl("sxy") - dbl("sx") * dbl("sy")) /
            (sqrt(col("n") * dbl("sxx") - dbl("sx") * dbl("sx")) *
             sqrt(col("n") * dbl("syy") - dbl("sy") * dbl("sy"))))
            .as("xcorr"))
        .orderBy(col("lag"))
    }),

    "ts_autocorr" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 8)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(col("value").cast(dec)).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      def dbl(c: String) = col(c).cast("double")
      hourly
        .withColumn("p", lag(col("h"), 1).over(w))
        .filter(col("p").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("p")).as("sx"), sum(col("h")).as("sy"),
          sum((col("p") * col("h")).cast(dec38)).as("sxy"),
          sum((col("p") * col("p")).cast(dec38)).as("sxx"),
          sum((col("h") * col("h")).cast(dec38)).as("syy"))
        .select(col("event_type"), col("n"),
          r4((col("n") * dbl("sxy") - dbl("sx") * dbl("sy")) /
            (sqrt(col("n") * dbl("sxx") - dbl("sx") * dbl("sx")) *
             sqrt(col("n") * dbl("syy") - dbl("sy") * dbl("sy"))))
            .as("acf1"))
        .orderBy(col("event_type"))
    }),

    // partial autocorrelation at lags 1–2 per series (Durbin–Levinson
    // order 2): φ₁₁ = r₁, φ₂₂ = (r₂ − r₁²)/(1 − r₁²) — the AR-order
    // detector ts_autocorr alone cannot give (an AR(1) has r₂ ≈ r₁²
    // so φ₂₂ ≈ 0; a genuine second-order dependence survives the
    // partialling). Both lag Pearsons use ts_autocorr's exact-decimal
    // sufficient sums over the bounded hourly aggregate, computed in
    // ONE pass (conditional aggregates per lag); r's 4dp-quantize
    // BEFORE the φ₂₂ close so the division sees identical inputs in
    // both engines; |r₁| = 1 (degenerate denominator) reads 0, and a
    // ZERO-VARIANCE series (n·sxx = sx² or n·syy = sy²) reads r = 0
    // by declared convention (ADVICE r5 #3: Spark's 0/0 is NaN while
    // DuckDB's double division may differ — the guard is explicit in
    // BOTH engines so degenerate data cannot diverge the row set).
    "ts_pacf" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 8)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(col("value").cast(dec)).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      def dbl(c: Column) = c.cast(DoubleType)
      def rk(p: String): Column = {
        val n = sum(when(col(p).isNotNull, 1L).otherwise(0L))
        val sx = sum(when(col(p).isNotNull, col(p)))
        val sy = sum(when(col(p).isNotNull, col("h")))
        val sxy = sum(when(col(p).isNotNull, (col(p) * col("h")).cast(dec38)))
        val sxx = sum(when(col(p).isNotNull, (col(p) * col(p)).cast(dec38)))
        val syy = sum(when(col(p).isNotNull, (col("h") * col("h")).cast(dec38)))
        // zero-variance guard as EXACT decimal min = max (not a
        // sufficient-sum identity in double, whose 2^-53 resolution at
        // ~1e18 magnitudes could spuriously collide two distinct
        // variances): engine-independent by construction
        val zeroVar =
          (min(when(col(p).isNotNull, col(p))) ===
            max(when(col(p).isNotNull, col(p)))) ||
          (min(when(col(p).isNotNull, col("h"))) ===
            max(when(col(p).isNotNull, col("h"))))
        round(when(zeroVar, lit(0.0)).otherwise(
          (n * dbl(sxy) - dbl(sx) * dbl(sy)) /
          (sqrt(n * dbl(sxx) - dbl(sx) * dbl(sx)) *
           sqrt(n * dbl(syy) - dbl(sy) * dbl(sy)))), 4)
      }
      hourly
        .withColumn("p1", lag(col("h"), 1).over(w))
        .withColumn("p2", lag(col("h"), 2).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          rk("p1").as("acf1"), rk("p2").as("acf2"))
        .select(col("event_type"), col("n_hours"), col("acf1"), col("acf2"),
          r4(when(abs(col("acf1")) === 1.0, lit(0.0)).otherwise(
            (col("acf2") - col("acf1") * col("acf1")) /
              (lit(1.0) - col("acf1") * col("acf1")))).as("pacf2"))
        .orderBy(col("event_type"))
    }),

    // single change-point detection per series (binary segmentation's
    // first split): over the hourly sums, the boundary t maximizing
    // the scaled mean-shift statistic |mean(1..t) − mean(t+1..n)| ·
    // sqrt(t·(n−t)/n). Prefix sums are exact decimal running windows
    // over the bounded hourly aggregate; the statistic is IEEE double
    // in one fixed op order; ranking is on the ROUNDED statistic with
    // the earliest boundary winning ties.
    "ts_changepoint_meanshift" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(col("value").cast(dec)).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val tot = hourly.groupBy(col("event_type"))
        .agg(sum(col("h")).as("tot"), count(lit(1)).as("n"))
      def dbl(c: String) = col(c).cast("double")
      val cand = hourly
        .withColumn("pre",
          sum(col("h")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .withColumn("t", row_number().over(w))
        .join(broadcast(tot), Seq("event_type"))
        .filter(col("t") < col("n"))
        .select(col("event_type"), col("hour"), col("t"), col("n"),
          r4(abs(dbl("pre") / col("t") -
              (dbl("tot") - dbl("pre")) / (col("n") - col("t"))) *
            sqrt(col("t").cast("double") * (col("n") - col("t")) / col("n")))
            .as("stat"))
      val pick = Window.partitionBy(col("event_type"))
        .orderBy(desc("stat"), col("hour"))
      cand.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
        .select(col("event_type"), ntz(col("hour")).as("cp_hour"),
          col("t").as("t_left"), col("n"), col("stat"))
        .orderBy(col("event_type"))
    }),

    // hour-of-day seasonal fingerprint per series: count, exact-
    // decimal mean, and the hour's share of the series' volume — the
    // profile a capacity planner or anomaly baseline reads. One
    // bounded (type × 24) hash agg; per-type totals broadcast back.
    "ts_seasonal_profile" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val byHod = Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("sv"))
      val tot = byHod.groupBy(col("event_type")).agg(sum(col("n")).as("tn"))
      byHod.join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("hod"), col("n"),
          r4(col("sv").cast("double") / col("n")).as("avg_value"),
          r4(col("n").cast("double") / col("tn")).as("share"))
        .orderBy(col("event_type"), col("hod"))
    }),

    // one-sided CUSUM alarm per series — the online changepoint
    // DETECTOR (ts_changepoint_meanshift is the offline locator): the
    // clamped recurrence s_t = max(0, s_{t-1} + (h_t − mean)) alarms
    // when the accumulated positive drift exceeds 5 hourly means.
    // NO recursion anywhere: the clamp has the closed form
    // s_t = c_t − least(0, min_{j≤t} c_j) with c the plain prefix sum
    // of deviations, so two windows over the BOUNDED hourly aggregate
    // replace the sequential fold. EXACT integers end-to-end: hours in
    // 1e-4-unit BIGINTs (the ts_downsample_ltob basis), deviations
    // scaled by n (d_t = n·h_t − tot) so the mean never divides;
    // the alarm compares s_t > 5·tot in the same scaled units.
    // (Magnitude: |c| ≤ n·tot_units — int64-safe to ~1e14 hourly
    // units·hours; beyond that widen the units to DECIMAL(38,0).)
    // daily VWAP — the volume-weighted average unit price per ship
    // day: Σ extendedprice / Σ quantity (extendedprice IS unit
    // price × quantity, so the ratio of the two EXACT decimal sums is
    // the volume-weighted mean with no per-row division anywhere).
    // One scan, one bounded per-day aggregate.
    "ts_vwap" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      Tables.lineitem(s, d)
        .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("n_trades"),
          sum(col("l_quantity").cast(dec)).as("vol"),
          sum(col("l_extendedprice").cast(dec)).as("notional"))
        .select(ntz(col("day")).as("day"), col("n_trades"),
          r4(col("vol").cast("double")).as("volume"),
          r4(col("notional").cast("double") / col("vol").cast("double"))
            .as("vwap"))
        .orderBy(col("day"))
    }),

    // dominant-period detection per series — a tiny deterministic DFT:
    // spectral amplitude at the candidate periods (6/12/24/168 h) from
    // Σy·cos + Σy·sin, ranked per series. The trig factors are NOT
    // computed by either engine: both read the same 12dp string-
    // literal tables generated once in Scala ([[fourierCosSql]]), so
    // there is no transcendental to disagree on; y is decimal-exact
    // and every product/sum stays exact until the closing
    // amplitude = 2·√(a²+b²)/n. Shape: one bounded hourly aggregate,
    // factors join by (t mod P) pipeline-side, one (series, period)
    // agg — shuffle ∝ series×periods.
    "ts_dominant_period" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("yu"))
      val tot = hourly.groupBy(col("event_type"))
        .agg(sum(col("yu")).as("tu"), count(lit(1)).as("n"))
      val ord = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      // mean-center EXACTLY in scaled units (z = n·y − tot, the
      // ts_cusum_alarm trick) — without it the series mean aliases
      // into every period whose cycle the window doesn't complete
      // (the 168 h bin dominated on a 24 h fixture by DC leakage)
      val t = hourly.join(broadcast(tot), Seq("event_type"))
        .withColumn("t", (row_number().over(ord) - 1).cast("long"))
        .withColumn("z", col("yu") * col("n") - col("tu"))
      val withP = t.select(col("event_type"), col("z"), col("t"), col("n"),
        explode(expr(s"array(${FourierPeriods.mkString(",")})")).as("p"))
      val zdec = org.apache.spark.sql.types.DecimalType(20, 0)
      val scored = withP
        .withColumn("cf", expr(fourierFactorExpr("cos")))
        .withColumn("sf", expr(fourierFactorExpr("sin")))
        .groupBy(col("event_type"), col("p"))
        .agg(max(col("n")).as("n"),
          sum(col("z").cast(zdec) * col("cf")).as("a"),
          sum(col("z").cast(zdec) * col("sf")).as("b"))
        .select(col("event_type"), col("p"), col("n"),
          r4(lit(2.0) * sqrt(
            col("a").cast("double") * col("a").cast("double") +
              col("b").cast("double") * col("b").cast("double")) /
            col("n") / col("n") / 10000.0).as("amplitude"))
      val rk = Window.partitionBy(col("event_type"))
        .orderBy(desc("amplitude"), col("p"))
      scored.withColumn("rank", row_number().over(rk))
        .orderBy(col("event_type"), col("rank"))
    }),

    // rolling 24-hour OLS slope per series — the windowed trend the
    // dashboards draw next to the raw line (Theil–Sen is the robust
    // whole-series fit; this is its LOCAL least-squares sibling).
    // x = the series' hour index (slope is shift-invariant), y = the
    // 4dp hourly sum as DECIMAL; all five sufficient sums accumulate
    // EXACTLY inside the 24-row frame (integer x, x², decimal y, xy),
    // so the closing IEEE formula sees bit-identical inputs in both
    // engines. Windows partition by series over the bounded hourly
    // aggregate.
    "ts_rolling_slope" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
      val ord = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val frame = ord.rowsBetween(-23, Window.currentRow)
      val xy = hourly
        .withColumn("t", row_number().over(ord).cast("long"))
        .withColumn("y", col("hsum").cast(dec))
      def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
      xy.select(col("event_type"), ntz(col("hour")).as("hour"),
          count(lit(1)).over(frame).as("n"),
          sum(col("t")).over(frame).as("sx"),
          sum(col("t") * col("t")).over(frame).as("sxx"),
          sum(col("y")).over(frame).as("sy"),
          sum(col("y") * col("t")).over(frame).as("sxy"))
        .select(col("event_type"), col("hour"), col("n"),
          r4(when(col("n") * col("sxx") - col("sx") * col("sx") === 0, 0.0)
            .otherwise((dbl(col("sxy")) * col("n") - dbl(col("sx")) * dbl(col("sy"))) /
              dbl(col("n") * col("sxx") - col("sx") * col("sx"))))
            .as("slope24"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // seasonality-adjusted anomaly census per series: residual = hour
    // sum − the series' hour-of-day profile mean (what zscore calls an
    // anomaly may just be "3 pm" — this detector first removes the
    // daily shape). Residuals are 4dp-quantized; their sums and
    // squared sums accumulate as exact decimals, σ and the 3σ flags
    // close in identical IEEE doubles; the flagged argmax hour orders
    // on the quantized |residual|.
    "ts_seasonal_residual_anomaly" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
        .withColumn("hod", hour(col("hour")))
      val prof = hourly.groupBy(col("event_type"), col("hod"))
        .agg(r4(sum(col("hsum").cast(dec)).cast("double") / count(lit(1)))
          .as("pmean"))
      val res = hourly.join(prof, Seq("event_type", "hod"))
        .withColumn("r", round(col("hsum") - col("pmean"), 4).cast(dec))
      val st = res.groupBy(col("event_type"))
        // r is DECIMAL(18,4): the square lands exactly in (37,8) and
        // the sum in (38,8) — no precision cap, no rounding
        .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
          sum(col("r") * col("r")).as("srr"))
        .withColumn("sigma", sqrt(
          (col("srr").cast("double") -
            col("sr").cast("double") * col("sr").cast("double") / col("n")) /
          col("n")))
      res.join(broadcast(st), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_hours"),
          r4(max(col("sigma"))).as("sigma"),
          count_if(abs(col("r")).cast("double") > lit(3.0) * col("sigma"))
            .as("n_flagged"),
          ntz(min(when(abs(col("r")).cast("double") > lit(3.0) * col("sigma"),
            col("hour")))).as("first_flag_hour"))
        .orderBy(col("event_type"))
    }),

    "ts_cusum_alarm" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val tot = hourly.groupBy(col("event_type"))
        .agg(sum(col("hu")).as("tu"), count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourly.join(broadcast(tot), Seq("event_type"))
        .withColumn("du", col("hu") * col("n") - col("tu"))
        .withColumn("c", sum(col("du")).over(w))
        .withColumn("cusum", col("c") - least(lit(0L), min(col("c")).over(w)))
        .withColumn("alarm", col("cusum") > lit(5L) * col("tu"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_hours"),
          count_if(col("alarm")).as("n_alarms"),
          r4(max(col("cusum")).cast("double") /
            (max(col("n")) * lit(10000.0))).as("max_cusum"),
          ntz(min(when(col("alarm"), col("hour")))).as("first_alarm_hour"))
        .orderBy(col("event_type"))
    }),

    // peak concurrency per hour — the sweep-line over the merged
    // per-user activity intervals (ts_interval_union's islands): every
    // interval start is +1, every end −1, and the running sum over the
    // GLOBAL (t, delta, user) total order is the number of
    // simultaneously-active users after each transition; per hour the
    // max is the capacity-planning number ("how many concurrent
    // sessions must we serve at 3pm?"). Ends sort before starts at the
    // same instant (delta asc), so a back-to-back handoff never counts
    // double. The global running sum is NOT one window: the
    // ts_late_data bucket discipline splits it into per-bucket sums,
    // a ≤128-row boundary cumulative, and per-bucket running sums +
    // offset — every unbounded stage parallel, the one serial window
    // over a bounded aggregate. Hours with no transition carry the
    // previous value by construction and are omitted (declared).
    "ts_peak_concurrency" -> ((s, d) => {
      val SpanUs = 1800000000L // 30 min, the ts_interval_union span
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t0"))
        .withColumn("t1", col("t0") + SpanUs)
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("t0"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("t0"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val iv = ev
        .withColumn("starts", when(
          col("t0") > coalesce(max(col("t1")).over(wPrev), lit(Long.MinValue)),
          1L).otherwise(0L))
        .withColumn("isl", sum(col("starts")).over(wRun))
        .groupBy(col("user_id"), col("isl"))
        .agg(min(col("t0")).as("s"), max(col("t1")).as("e"))
      val bd = iv.select(col("user_id"), col("s").as("t"), lit(1L).as("delta"))
        .unionByName(
          iv.select(col("user_id"), col("e").as("t"), lit(-1L).as("delta")))
      // bucket the timeline from the one-row bounds aggregate —
      // width arithmetic in integer DIV, no driver action
      val bounds = bd.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      val bk = bd.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((t - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${PrefixMaxBuckets - 1}) DIV $PrefixMaxBuckets) AS INT)"))
        .drop("lo", "hi")
      val per = bk.groupBy(col("bk")).agg(sum(col("delta")).as("bsum"))
      val wB = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = per.withColumn("boff", coalesce(sum(col("bsum")).over(wB),
        lit(0L))).select(col("bk"), col("boff"))
      val wIn = Window.partitionBy(col("bk"))
        .orderBy(col("t"), col("delta"), col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bk.join(off, Seq("bk"))
        .withColumn("run", col("boff") + sum(col("delta")).over(wIn))
        .groupBy(timestamp_micros(col("t") - pmod(col("t"), lit(3600000000L)))
          .as("hour"))
        .agg(count(lit(1)).as("n_transitions"),
          max(col("run")).as("peak_concurrent"))
        .select(ntz(col("hour")).as("hour"), col("n_transitions"),
          col("peak_concurrent"))
        .orderBy(col("hour"))
    }),

    // SAX-lite motif discovery: each hour discretizes to {a,b,c} by
    // the series' own EXACT tertiles, consecutive 4-symbol words count
    // as motifs, top 5 per series — "which local shapes recur?" (the
    // symbolic complement of ts_dominant_period's global-cycle view).
    // Zero floats anywhere: tertile edges come from integer rank
    // arithmetic over the hourly-unit histogram (cum·3 ≥ dq·n — the
    // quantileEdges discipline), symbols compare exact BIGINTs, words
    // are strings, ranks break ties on the word. Windows partition by
    // the series key over the bounded hourly aggregate — per-partition
    // rows ∝ calendar hours, not data volume; the
    // histogram/edge relations are bounded by distinct hourly values.
    "ts_sax_motifs" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val tot = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val hist = hourly.groupBy(col("event_type"), col("hu"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("hu"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val edges = hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("hu"), col("cum"), col("n"),
          explode(expr("sequence(1, 2)")).as("dq"))
        .filter(col("cum") * 3 >= col("dq") * col("n"))
        .groupBy(col("event_type"), col("dq")).agg(min(col("hu")).as("e"))
        .groupBy(col("event_type"))
        .agg(min(when(col("dq") === 1, col("e"))).as("e1"),
          min(when(col("dq") === 2, col("e"))).as("e2"))
      val wSeq = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val sym = hourly.join(broadcast(edges), Seq("event_type"))
        .withColumn("sy", expr("element_at(array('a', 'b', 'c'), " +
          "CAST(1 + IF(hu > e1, 1, 0) + IF(hu > e2, 1, 0) AS INT))"))
      val words = sym
        .withColumn("l3", lead(col("sy"), 3).over(wSeq))
        .withColumn("word", concat(col("sy"), lead(col("sy"), 1).over(wSeq),
          lead(col("sy"), 2).over(wSeq), col("l3")))
        .filter(col("l3").isNotNull)
        .groupBy(col("event_type"), col("word")).agg(count(lit(1)).as("n"))
      val wTop = Window.partitionBy(col("event_type"))
        .orderBy(desc("n"), col("word"))
      words.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 5)
        .select(col("event_type"), col("word").as("motif"), col("n"))
        .orderBy(col("event_type"), col("motif"))
    }),

    // Hill tail-index estimator per series over the top-50 hourly
    // volumes: 1/α̂ = mean ln(xᵢ/x_k) over the k−1 largest order
    // statistics — heavy-tail (α ≤ 2) vs light-tail capacity risk,
    // the extreme-value sibling of ts_winsorized_mean (which REMOVES
    // the tail this measures). Determinism: the top-k MULTISET of
    // values is order-independent even when ranks tie at the
    // boundary, so only values enter the math; per-term lns are
    // identical IEEE expressions 4dp-quantized then decimal-summed
    // (zipf discipline), x_k compares exact BIGINT units. Window
    // state ∝ hours per series (bounded hourly aggregate — calendar-
    // bounded per-partition rows, not data-volume-bounded).
    "ts_hill_tail_index" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
        .filter(col("hu") > 0)
      val wR = Window.partitionBy(col("event_type"))
        .orderBy(desc("hu"), col("hour"))
      val sel = hourly
        .withColumn("rn", row_number().over(wR)).filter(col("rn") <= HillK)
      val xk = sel.groupBy(col("event_type"))
        .agg(min(col("hu")).as("xk"), count(lit(1)).as("keff"))
        .filter(col("keff") >= 2)
      sel.join(broadcast(xk), Seq("event_type"))
        .withColumn("lr", expr(
          "CAST(round(ln(CAST(hu AS DOUBLE) / xk), 4) AS DECIMAL(18,4))"))
        .groupBy(col("event_type"))
        .agg(max(col("keff")).as("k"),
          r4(max(col("xk")).cast(DoubleType) / 10000.0).as("x_k"),
          sum(col("lr")).as("sl"))
        .select(col("event_type"), col("k"), col("x_k"),
          r4(when(col("sl") === 0, lit(0.0)).otherwise(
            (col("k") - 1).cast(DoubleType) / col("sl").cast(DoubleType)))
            .as("hill_alpha"))
        .orderBy(col("event_type"))
    }),

    // Mann–Kendall trend test per series — the RANK-based monotone-
    // trend detector (ts_rolling_slope fits a local line, Theil–Sen a
    // robust global one; MK asks only "is it going up?", immune to
    // outlier magnitude): S = Σ_{i<j} sign(x_j − x_i), tie-corrected
    // variance, z with the ±1 continuity correction, verdict at
    // |z| > 1.96 on the ROUNDED z. Everything integer until one sqrt
    // + one division. Shape (r5): NO hours² pair join — S decomposes
    // over calendar-week × value buckets (see the in-query comment);
    // the residual pair joins are bounded by the bucket widths, and
    // everything runs over the BOUNDED hourly aggregate (100× more
    // events is the same H).
    "ts_mann_kendall" -> ((s, d) => {
      // r5 (VERDICT r4 #5): S without the hours² pair join. Each hour
      // gets a calendar TIME bucket (ISO week — deterministic in both
      // engines) and an integer-arithmetic VALUE bucket over the
      // series' own [min, max] (numerator shifted non-negative so
      // Spark DIV ≡ DuckDB // ≡ floor). Pairs decompose exactly:
      //  A same-week pairs        → pair join bounded by 168 h/bucket
      //  B cross-week, same vb    → pair join ∝ n²/VB on even spread
      //  C cross-week, cross-vb   → sign is KNOWN from the vb order
      //    (fixed-width buckets are value-disjoint ranges), so C
      //    counts from the dense (week × vb) GRID: ct = items in
      //    earlier weeks per vb (cumulative over ≤weeks rows), lo/hi
      //    = lower/higher-vb prefix/suffix sums (over ≤VB rows),
      //    contribution c·(lo−hi). Work ∝ n·168 + n²/VB + weeks·VB —
      //    linear-log-class in hours where the old join was hours²
      //    (3 y of hourly data: ~8 M rows vs ~340 M pairs/series).
      // All three terms are exact BIGINT sign counts → S unchanged.
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
        .withColumn("tb", date_trunc("week", col("hour")))
      val rng = hourly.groupBy(col("event_type"))
        .agg(min(col("hu")).as("mn"), max(col("hu")).as("mx"))
      val hb = hourly.join(broadcast(rng), Seq("event_type"))
        // vb in DECIMAL(38,0) (ADVICE r5 #4): (hu − mn)·128 wraps
        // int64 once the per-series range exceeds ~7.2e16 — and wraps
        // IDENTICALLY in both engines, so the broken bucket
        // monotonicity (which the C term's known-sign inference rests
        // on) would pass the hash while S is silently wrong. Decimal
        // width makes the precondition unbreakable; vb itself is < 128
        // and casts back to BIGINT losslessly.
        .withColumn("vb", expr(
          s"""CAST(((CAST(hu AS DECIMAL(38,0)) - mn) * $MkValueBuckets)
             |  DIV (CAST(mx AS DECIMAL(38,0)) - mn + 1) AS BIGINT)"""
            .stripMargin))
        .select(col("event_type"), col("hour"), col("tb"), col("hu"), col("vb"))
      def sgn(later: Column, earlier: Column): Column =
        when(later > earlier, 1L).when(later < earlier, -1L).otherwise(0L)
      val sA = hb.select(col("event_type"), col("tb"),
          col("hour").as("ha"), col("hu").as("xa"))
        .join(hb.select(col("event_type"), col("tb"),
          col("hour").as("hb2"), col("hu").as("xb")), Seq("event_type", "tb"))
        .filter(col("ha") < col("hb2"))
        .groupBy(col("event_type"))
        .agg(sum(sgn(col("xb"), col("xa"))).as("sp"))
      val sB = hb.select(col("event_type"), col("vb"),
          col("tb").as("ta"), col("hu").as("xa"))
        .join(hb.select(col("event_type"), col("vb"),
          col("tb").as("tbb"), col("hu").as("xb")), Seq("event_type", "vb"))
        .filter(col("ta") < col("tbb"))
        .groupBy(col("event_type"))
        .agg(sum(sgn(col("xb"), col("xa"))).as("sp"))
      val grid = hb.groupBy(col("event_type"), col("tb"), col("vb"))
        .agg(count(lit(1)).as("c"))
      val dense = hb.select(col("event_type"), col("tb")).distinct()
        .join(hb.select(col("event_type"), col("vb")).distinct(),
          Seq("event_type"))
        .join(grid, Seq("event_type", "tb", "vb"), "left")
        .select(col("event_type"), col("tb"), col("vb"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wCum = Window.partitionBy(col("event_type"), col("vb"))
        .orderBy(col("tb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wLo = Window.partitionBy(col("event_type"), col("tb"))
        .orderBy(col("vb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wHi = Window.partitionBy(col("event_type"), col("tb"))
        .orderBy(col("vb"))
        .rowsBetween(1, Window.unboundedFollowing)
      val sC = dense
        .withColumn("ct", coalesce(sum(col("c")).over(wCum), lit(0L)))
        .withColumn("lo", coalesce(sum(col("ct")).over(wLo), lit(0L)))
        .withColumn("hi", coalesce(sum(col("ct")).over(wHi), lit(0L)))
        .groupBy(col("event_type"))
        .agg(sum(col("c") * (col("lo") - col("hi"))).as("sp"))
      val sStat = sA.unionByName(sB).unionByName(sC)
        .groupBy(col("event_type")).agg(sum(col("sp")).as("s_stat"))
      val n = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ties = hourly.groupBy(col("event_type"), col("hu"))
        .agg(count(lit(1)).as("t")).filter(col("t") > 1)
        .groupBy(col("event_type"))
        .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tsum"))
      sStat.join(n, Seq("event_type"))
        .join(ties, Seq("event_type"), "left")
        .withColumn("var18",
          col("n") * (col("n") - 1) * (col("n") * 2 + 5) -
            coalesce(col("tsum"), lit(0L)))
        .withColumn("z", when(col("var18") === 0, lit(0.0))
          .when(col("s_stat") > 0,
            (col("s_stat") - 1).cast(DoubleType) /
              sqrt(col("var18").cast(DoubleType) / 18.0))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast(DoubleType) /
              sqrt(col("var18").cast(DoubleType) / 18.0))
          .otherwise(lit(0.0)))
        .select(col("event_type"), col("n").as("n_hours"), col("s_stat"),
          r4(col("z")).as("z"),
          when(r4(col("z")) > 1.96, "increasing")
            .when(r4(col("z")) < -1.96, "decreasing")
            .otherwise("no_trend").as("trend"))
        .orderBy(col("event_type"))
    }),

    // Wald–Wolfowitz runs test per series — the RANDOMNESS screen the
    // trend family assumes away: hours classify above/below the
    // series' exact lower median (median-equal hours drop, the
    // standard convention, declared), R = runs of the +/− sequence,
    // z = (R − R̄)/σ_R with R̄ = 1 + 2·n₁n₂/n. Too FEW runs =
    // clustered (regimes/level shifts), too many = alternating
    // (negative autocorrelation) — a series can pass Mann–Kendall
    // (no monotone trend) while badly failing runs. Median from
    // integer rank arithmetic over the unit histogram (the sax-edge
    // discipline: min hu with cum·2 ≥ n); R, n₁, n₂ exact integers
    // via one lag window over the bounded hourly aggregate; z is one
    // IEEE expression of integers, 4dp-rounded; degenerate n₁ = 0 or
    // n₂ = 0 reads z = 0 by convention.
    "ts_runs_test" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val tot = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("hu"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = hourly.groupBy(col("event_type"), col("hu"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(tot), Seq("event_type"))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy(col("event_type")).agg(min(col("hu")).as("med"))
      val wSeq = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val signs = hourly.join(broadcast(med), Seq("event_type"))
        .filter(col("hu") =!= col("med"))
        .withColumn("sg", when(col("hu") > col("med"), 1).otherwise(-1))
        .withColumn("prev", lag(col("sg"), 1).over(wSeq))
      signs.groupBy(col("event_type"))
        .agg(sum(when(col("sg") === 1, 1L).otherwise(0L)).as("n_above"),
          sum(when(col("sg") === -1, 1L).otherwise(0L)).as("n_below"),
          (sum(when(col("prev").isNull || col("prev") =!= col("sg"), 1L)
            .otherwise(0L))).as("n_runs"))
        .withColumn("nn", col("n_above") + col("n_below"))
        .withColumn("z",
          when(col("n_above") === 0 || col("n_below") === 0, lit(0.0))
            .otherwise {
              val p2 = (col("n_above") * col("n_below") * 2).cast(DoubleType)
              val nn = col("nn").cast(DoubleType)
              val rbar = lit(1.0) + p2 / nn
              val vr = p2 * (p2 - nn) / (nn * nn * (nn - 1))
              when(vr <= 0.0, lit(0.0))
                .otherwise((col("n_runs") - rbar) / sqrt(vr))
            })
        .select(col("event_type"), col("n_above"), col("n_below"),
          col("n_runs"), r4(col("z")).as("z"),
          when(r4(col("z")) > 1.96, "alternating")
            .when(r4(col("z")) < -1.96, "clustered")
            .otherwise("random").as("verdict"))
        .orderBy(col("event_type"))
    }),

    // turning-point test per series — the second randomness screen,
    // orthogonal to runs (runs sees level clustering, turning points
    // see local SHAPE): T = strict local extrema count over the
    // hourly sequence, E[T] = 2(n−2)/3, Var[T] = (16n−29)/90,
    // z = (T − E)/σ. A smooth trending series turns rarely (z ≪ 0),
    // white noise hits the expectation, an oscillating load pattern
    // overshoots. lag/lead over the bounded hourly aggregate; strict
    // inequalities so plateaus never count; T exact; E/Var/z are
    // identical IEEE expressions of the integer n in both engines.
    "ts_turning_points" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val wSeq = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      hourly
        .withColumn("pv", lag(col("hu"), 1).over(wSeq))
        .withColumn("nx", lead(col("hu"), 1).over(wSeq))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pv").isNotNull && col("nx").isNotNull &&
            ((col("hu") > col("pv") && col("hu") > col("nx")) ||
             (col("hu") < col("pv") && col("hu") < col("nx"))), 1L)
            .otherwise(0L)).as("n_turns"))
        .withColumn("z", when(col("n") < 4, lit(0.0)).otherwise(
          (col("n_turns").cast(DoubleType) -
            lit(2.0) * (col("n") - 2).cast(DoubleType) / 3.0) /
            sqrt((lit(16.0) * col("n").cast(DoubleType) - 29.0) / 90.0)))
        .select(col("event_type"), col("n").as("n_hours"), col("n_turns"),
          r4(col("z")).as("z"),
          when(r4(col("z")) < -1.96, "smooth")
            .when(r4(col("z")) > 1.96, "oscillating")
            .otherwise("noise_like").as("verdict"))
        .orderBy(col("event_type"))
    }),

    // forecaster backtest per series: MAE and RMSE of the naive
    // (x̂ₜ = xₜ₋₁) and seasonal-naive (x̂ₜ = xₜ₋₂₄) one-step
    // forecasters over the hourly history — the evaluation harness
    // every "should we bother with a model?" conversation starts from
    // (seasonal-naive beating naive is the detector for daily shape;
    // neither beating a constant flags a random walk). Lags are ROW
    // lags over the bounded hourly aggregate (gaps advance the row
    // clock, declared); errors are exact integer units — |e| sums as
    // BIGINT, e² in DECIMAL(38,0)/HUGEINT — and each metric closes in
    // one IEEE expression.
    "ts_forecast_backtest" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val er = hourly
        .withColumn("e1", col("hu") - lag(col("hu"), 1).over(w))
        .withColumn("e24", col("hu") - lag(col("hu"), 24).over(w))
        .select(col("event_type"), explode(expr(
          """filter(array(struct('naive' AS model, e1 AS e),
            |  struct('seasonal_naive' AS model, e24 AS e)),
            |  x -> x.e IS NOT NULL)""".stripMargin)).as("m"))
        .select(col("event_type"), col("m.model").as("model"),
          abs(col("m.e")).as("ae"))
      er.groupBy(col("event_type"), col("model"))
        .agg(count(lit(1)).as("n_evals"), sum(col("ae")).as("sae"),
          sum(col("ae").cast(dec38) * col("ae").cast(dec38)).as("sse"))
        .select(col("event_type"), col("model"), col("n_evals"),
          r4(col("sae").cast(DoubleType) / col("n_evals") / 10000.0)
            .as("mae"),
          r4(sqrt(col("sse").cast(DoubleType) / col("n_evals")) / 10000.0)
            .as("rmse"))
        .orderBy(col("event_type"), col("model"))
    }),

    // seasonality strength per series: 1 − SS_residual/SS_total with
    // residuals against the hour-of-day profile — how much of the
    // hourly variance the daily shape explains (≈1: schedule the
    // capacity by clock; ≈0: the profile is noise and
    // ts_seasonal_residual_anomaly's flags mean little). The
    // ts_seasonal_residual_anomaly determinism discipline end-to-end:
    // profile and grand means close as identical IEEE divisions of
    // exact decimal sums, BOTH residual kinds 4dp-quantize, squares
    // sum exactly in DECIMAL(38,8); one final ratio; an SS_total = 0
    // series reads 0 by convention (exact decimal compare). Two
    // bounded aggs + one profile join.
    "ts_seasonal_strength" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
        .withColumn("hod", hour(col("hour")))
      val prof = hourly.groupBy(col("event_type"), col("hod"))
        .agg(r4(sum(col("hsum").cast(dec)).cast("double") / count(lit(1)))
          .as("pmean"))
      val grand = hourly.groupBy(col("event_type"))
        .agg(r4(sum(col("hsum").cast(dec)).cast("double") / count(lit(1)))
          .as("gmean"))
      hourly
        .join(broadcast(prof), Seq("event_type", "hod"))
        .join(broadcast(grand), Seq("event_type"))
        .withColumn("r", round(col("hsum") - col("pmean"), 4).cast(dec))
        .withColumn("rt", round(col("hsum") - col("gmean"), 4).cast(dec))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("r") * col("r")).as("ssr"),
          sum(col("rt") * col("rt")).as("sst"))
        .select(col("event_type"), col("n_hours"),
          r4(when(col("sst") === 0, lit(0.0)).otherwise(
            lit(1.0) - col("ssr").cast(DoubleType) /
              col("sst").cast(DoubleType))).as("seasonal_strength"))
        .orderBy(col("event_type"))
    }),

    // on-balance volume over the daily VWAP series: OBV_t = Σ
    // sign(Δvwap)·volume — does volume flow WITH the price moves?
    // (diverging OBV vs price is the classic accumulation signal;
    // ts_vwap publishes the series, this its volume-confirmation
    // companion). The price-move sign NEVER touches a float: vwap_d >
    // vwap_{d−1} ⟺ notional_d·vol_{d−1} > notional_{d−1}·vol_d —
    // exact DECIMAL(38,·) cross-products; volumes sum as exact
    // decimals. The cumulative window is unpartitioned but runs over
    // the bounded daily aggregate (calendar-bounded, the declared
    // ts_late_data class).
    "ts_obv" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val daily = Tables.lineitem(s, d)
        .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast(dec)).as("vol"),
          sum(col("l_extendedprice").cast(dec)).as("notional"))
      val w = Window.orderBy(col("day"))
      val wRun = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("pv", lag(col("vol"), 1).over(w))
        .withColumn("pn", lag(col("notional"), 1).over(w))
        .withColumn("sgn", when(col("pv").isNull, lit(0L))
          .when(col("notional") * col("pv") > col("pn") * col("vol"), lit(1L))
          .when(col("notional") * col("pv") < col("pn") * col("vol"),
            lit(-1L))
          .otherwise(lit(0L)))
        .withColumn("obv", sum(col("sgn") * col("vol")).over(wRun))
        .select(ntz(col("day")).as("day"), col("sgn"),
          r4(col("vol").cast(DoubleType)).as("volume"),
          r4(col("obv").cast(DoubleType)).as("obv"))
        .orderBy(col("day"))
    }),

    // Lo–MacKinlay variance-ratio test per series (q = 4): VR =
    // Var(4-hour deltas)/(4·Var(1-hour deltas)) — a random walk reads
    // 1; VR > 1 means momentum (shocks compound), VR < 1 mean
    // reversion (shocks fade) — the "is this series trending or
    // snapping back?" diagnostic the trend family (MK test, slopes)
    // presumes an answer to. ROW-lag deltas over the bounded hourly
    // aggregate; both delta populations' moments exact (units BIGINT,
    // squares DECIMAL(38,0)); two variance closes and one ratio in
    // identical IEEE expressions; degenerate Var₁ = 0 reads 0.
    "ts_variance_ratio" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val dl = hourly
        .withColumn("d1", col("hu") - lag(col("hu"), 1).over(w))
        .withColumn("d4", col("hu") - lag(col("hu"), 4).over(w))
      def varOf(c: String, nc: String, sc: String, qc: String) = Seq(
        count(col(c)).as(nc), sum(col(c).cast(dec38)).as(sc),
        sum(col(c).cast(dec38) * col(c).cast(dec38)).as(qc))
      val aggs = varOf("d1", "n1", "s1", "q1") ++ varOf("d4", "n4", "s4", "q4")
      dl.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
        .filter(col("n1") > 0 && col("n4") > 0)
        .withColumn("v1", (col("n1") * col("q1") - col("s1") * col("s1"))
          .cast(DoubleType) / (col("n1").cast(DoubleType) * col("n1")))
        .withColumn("v4", (col("n4") * col("q4") - col("s4") * col("s4"))
          .cast(DoubleType) / (col("n4").cast(DoubleType) * col("n4")))
        .select(col("event_type"), col("n1").as("n_deltas"),
          r4(when(col("v1") === 0.0, lit(0.0))
            .otherwise(col("v4") / (lit(4.0) * col("v1")))).as("vr4"),
          when(r4(when(col("v1") === 0.0, lit(0.0))
              .otherwise(col("v4") / (lit(4.0) * col("v1")))) > 1.2,
            "momentum")
            .when(r4(when(col("v1") === 0.0, lit(0.0))
              .otherwise(col("v4") / (lit(4.0) * col("v1")))) < 0.8,
              "mean_reverting")
            .otherwise("random_walk").as("verdict"))
        .orderBy(col("event_type"))
    }),

    // Little's-law quantities over the merged activity intervals:
    // arrival rate λ (sessions/hour), mean session duration W, and
    // the TIME-AVERAGE concurrency L = Σdurations/horizon — the
    // capacity-planning companion of ts_peak_concurrency (peak sizes
    // the ceiling, L sizes the steady-state bill; λ·W = L is the
    // sanity identity relating them). Intervals are
    // ts_interval_union's islands; horizon = [min start, max end]
    // from a one-row bounds aggregate; duration sums exact BIGINT
    // microseconds; three IEEE closes.
    "ts_littles_law" -> ((s, d) => {
      val SpanUs = 1800000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t0"))
        .withColumn("t1", col("t0") + SpanUs)
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("t0"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("t0"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val iv = ev
        .withColumn("starts", when(
          col("t0") > coalesce(max(col("t1")).over(wPrev), lit(Long.MinValue)),
          1L).otherwise(0L))
        .withColumn("isl", sum(col("starts")).over(wRun))
        .groupBy(col("user_id"), col("isl"))
        .agg(min(col("t0")).as("s"), max(col("t1")).as("e"))
      iv.agg(count(lit(1)).as("n_sessions"),
          min(col("s")).as("lo"), max(col("e")).as("hi"),
          sum(col("e") - col("s")).as("durus"))
        .withColumn("horizon_h",
          (col("hi") - col("lo")).cast(DoubleType) / 3600000000.0)
        .select(col("n_sessions"), r4(col("horizon_h")).as("horizon_hours"),
          r4(col("n_sessions").cast(DoubleType) / col("horizon_h"))
            .as("lambda_per_hour"),
          r4(col("durus").cast(DoubleType) / col("n_sessions") / 60000000.0)
            .as("mean_duration_min"),
          r4(col("durus").cast(DoubleType) /
            (col("hi") - col("lo")).cast(DoubleType))
            .as("time_avg_concurrency"))
    }),

    // Ljung–Box whiteness test on the seasonality-adjusted residuals:
    // Q = n(n+2)·Σ_{k≤5} ρ̂_k²/(n−k) against the χ²₅ 95% line
    // (11.0705) — "after removing the daily shape, is anything LEFT
    // to model?" (the residual-diagnostic that closes the
    // decomposition loop: seasonal_strength says how much the profile
    // explains, this says whether the remainder is just noise).
    // Residuals are the seasonal_residual_anomaly 4dp-quantized
    // values; each lag-k autocovariance sums exact decimal products
    // over ROW-lag windows; ρ̂ₖ quantizes at 4dp before squaring; the
    // verdict compares the ROUNDED Q to the literal threshold.
    "ts_ljung_box" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
        .withColumn("hod", hour(col("hour")))
      val prof = hourly.groupBy(col("event_type"), col("hod"))
        .agg(r4(sum(col("hsum").cast(dec)).cast("double") / count(lit(1)))
          .as("pmean"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      val res = hourly.join(broadcast(prof), Seq("event_type", "hod"))
        .withColumn("r", round(col("hsum") - col("pmean"), 4).cast(dec))
      val lagged = res.select((col("event_type") +: col("r") +:
        (1 to 5).map(k => lag(col("r"), k).over(w).as(s"l$k"))): _*)
      val aggCols = count(lit(1)).as("n") +:
        sum(col("r") * col("r")).as("s0") +:
        (1 to 5).map(k => sum(col("r") * col(s"l$k")).as(s"s$k"))
      val g = lagged.groupBy(col("event_type"))
        .agg(aggCols.head, aggCols.tail: _*)
      val rhoSq = (1 to 5).map { k =>
        val rho = round(col(s"s$k").cast(DoubleType) /
          col("s0").cast(DoubleType), 4)
        rho * rho / (col("n") - k)
      }.reduce(_ + _)
      g.filter(col("n") > 5 && col("s0") =!= 0)
        .withColumn("q", col("n").cast(DoubleType) * (col("n") + 2) * rhoSq)
        .select(col("event_type"), col("n").as("n_hours"),
          r4(col("q")).as("q_stat"),
          (r4(col("q")) < 11.0705).as("white_noise"))
        .orderBy(col("event_type"))
    }),

    // pairwise hour-of-day profile distance between series: L1
    // distance between the event-share-by-hour distributions — which
    // metrics breathe alike? (ts_seasonal_profile prints each shape;
    // this compares them — alerts that can share a baseline, series
    // that can share a forecast). The absent-hod mass closes
    // analytically like the JS decomposition, so ONLY shared hods
    // join; the distance numerator is exact INTEGERS throughout
    // (|c_a·n_b − c_b·n_a| in DECIMAL(38,0)/HUGEINT), one division
    // per pair; similarity = 1 − d/2 ∈ [0,1]. Aggregates bounded by
    // series² × 24.
    "ts_profile_similarity" -> ((s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val prof = Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("c"))
      val tot = prof.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      val a = prof.select(col("event_type").as("sa"), col("hod"),
        col("c").as("ca"))
      val b = prof.select(col("event_type").as("sb"), col("hod"),
        col("c").as("cb"))
      a.join(b, Seq("hod")).filter(col("sa") < col("sb"))
        .join(broadcast(tot.select(col("event_type").as("sa"),
          col("n").as("na"))), Seq("sa"))
        .join(broadcast(tot.select(col("event_type").as("sb"),
          col("n").as("nb"))), Seq("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_shared_hods"),
          sum(abs(col("ca").cast(dec38) * col("nb") -
            col("cb").cast(dec38) * col("na"))).as("dnum"),
          sum(col("ca")).as("sca"), sum(col("cb")).as("scb"),
          max(col("na")).as("na"), max(col("nb")).as("nb"))
        .withColumn("dist",
          (col("dnum") +
            (col("na") - col("sca")).cast(dec38) * col("nb") +
            (col("nb") - col("scb")).cast(dec38) * col("na"))
            .cast(DoubleType) /
          (col("na").cast(DoubleType) * col("nb")))
        .select(col("sa"), col("sb"), col("n_shared_hods"),
          r4(col("dist")).as("l1_distance"),
          r4(lit(1.0) - col("dist") / 2.0).as("similarity"))
        .orderBy(col("sa"), col("sb"))
    }),

    // exceedance-run census per series: episodes of CONSECUTIVE hours
    // strictly above the series' own exact p90 — duration-above-
    // threshold is the hydrology/SLO question the point detectors
    // (zscore, EWMA, CUSUM) don't answer: one 10-hour violation is an
    // incident, ten 1-hour blips are noise. Threshold = integer-rank
    // p90 (min value whose cum clears 90% of n — the quantileEdges
    // discipline, no float quantile); runs = the win_gaps_islands
    // identity on the hour number (hourno − row_number constant
    // within a consecutive run); longest-run ties break to the
    // earliest start. All integers until one share division.
    "ts_exceedance_runs" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val hist = hourly.groupBy(col("event_type"), col("hu"))
        .agg(count(lit(1)).as("c"))
      val tot = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("hu"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p90 = hist.withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(tot), Seq("event_type"))
        .filter(col("cum") * 100 >= col("n") * 90)
        .groupBy(col("event_type")).agg(min(col("hu")).as("p90u"))
      val exceed = hourly.join(broadcast(p90), Seq("event_type"))
        .filter(col("hu") > col("p90u"))
        .withColumn("hourno", (col("hour").cast("long") / 3600L).cast("long"))
      val wRn = Window.partitionBy(col("event_type")).orderBy(col("hourno"))
      val runs = exceed
        .withColumn("grp", col("hourno") - row_number().over(wRn))
        .groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("hour")).as("start"))
      val best = Window.partitionBy(col("event_type"))
        .orderBy(desc("len"), col("start"))
      runs
        .withColumn("n_episodes",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .withColumn("n_exceed",
          sum(col("len")).over(Window.partitionBy(col("event_type"))))
        .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
        .join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("n_exceed"), col("n_episodes"),
          col("len").as("longest_run"), ntz(col("start")).as("longest_start"),
          r4(col("n_exceed").cast(DoubleType) / col("n")).as("exceed_share"))
        .orderBy(col("event_type"))
    }),

    // one-way ANOVA for a day-of-week effect on daily volume per
    // series: F = (SSB/(k−1))/(SSW/(n−k)) and η² = SSB/SST — is
    // "weekends differ" statistically real, and how much variance
    // does the weekday label explain? (ts_seasonal_strength asks the
    // hour-of-day version with an R²; this is the grouped-variance
    // TEST with its effect size.) The seasonal_strength determinism
    // discipline: identical IEEE mean closes, 4dp residual quantize,
    // exact DECIMAL(38,8) square sums, SSB = SST − SSW in exact
    // decimals; degenerate SSW = 0 or n ≤ k reads F = 0 by declared
    // convention (exact compares). Bounded aggregates throughout.
    "ts_dow_anova" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(r4(dsum(col("value"))).as("ds"))
        .withColumn("dow", dayofweek(col("day")))
      val prof = daily.groupBy(col("event_type"), col("dow"))
        .agg(r4(sum(col("ds").cast(dec)).cast("double") / count(lit(1)))
          .as("pmean"))
      val grand = daily.groupBy(col("event_type"))
        .agg(r4(sum(col("ds").cast(dec)).cast("double") / count(lit(1)))
          .as("gmean"))
      daily
        .join(broadcast(prof), Seq("event_type", "dow"))
        .join(broadcast(grand), Seq("event_type"))
        .withColumn("r", round(col("ds") - col("pmean"), 4).cast(dec))
        .withColumn("rt", round(col("ds") - col("gmean"), 4).cast(dec))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          countDistinct(col("dow")).as("k_groups"),
          sum(col("r") * col("r")).as("ssw"),
          sum(col("rt") * col("rt")).as("sst"))
        .withColumn("ssb", col("sst") - col("ssw"))
        .select(col("event_type"), col("n_days"), col("k_groups"),
          r4(when(col("ssw") === 0 || col("n_days") <= col("k_groups") ||
              col("k_groups") <= 1, lit(0.0))
            .otherwise(
              (col("ssb").cast(DoubleType) / (col("k_groups") - 1)) /
              (col("ssw").cast(DoubleType) /
                (col("n_days") - col("k_groups"))))).as("f_stat"),
          r4(when(col("sst") === 0, lit(0.0)).otherwise(
            col("ssb").cast(DoubleType) / col("sst").cast(DoubleType)))
            .as("eta_sq"))
        .orderBy(col("event_type"))
    }))

  val oracle: Map[String, String] = Map(
    "ts_vwap" ->
      """SELECT date_trunc('day', l_shipdate) AS day, count(*) AS n_trades,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS volume,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS vwap
        |FROM lineitem GROUP BY 1 ORDER BY day""".stripMargin,

    "ts_dominant_period" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS yu
         |  FROM events GROUP BY 1, 2),
         |tot AS (SELECT event_type, CAST(sum(yu) AS BIGINT) AS tu,
         |          count(*) AS n
         |        FROM hourly GROUP BY 1),
         |tt AS (
         |  SELECT h.event_type, h.yu * t.n - t.tu AS z, t.n,
         |    row_number() OVER (PARTITION BY h.event_type ORDER BY h.hour) - 1
         |      AS t
         |  FROM hourly h JOIN tot t USING (event_type)),
         |wp AS (
         |  SELECT event_type, z, t, n,
         |    unnest([${FourierPeriods.mkString(", ")}]) AS p
         |  FROM tt),
         |f AS (
         |  SELECT event_type, p, n, z,
         |    ${fourierFactorSql("cos")} AS cf,
         |    ${fourierFactorSql("sin")} AS sf
         |  FROM wp),
         |sc AS (
         |  SELECT event_type, p, max(n) AS n,
         |    sum(CAST(z AS DECIMAL(20,0)) * cf) AS a,
         |    sum(CAST(z AS DECIMAL(20,0)) * sf) AS b
         |  FROM f GROUP BY 1, 2),
         |amp AS (
         |  SELECT event_type, p, n,
         |    round(2.0 * sqrt(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
         |      + CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) / n / n / 10000.0, 4)
         |      AS amplitude
         |  FROM sc)
         |SELECT event_type, p, n, amplitude,
         |  CAST(row_number() OVER (PARTITION BY event_type
         |    ORDER BY amplitude DESC, p) AS INT) AS rank
         |FROM amp ORDER BY event_type, rank""".stripMargin,

    "ts_rolling_slope" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS hsum
        |  FROM events GROUP BY 1, 2),
        |xy AS (
        |  SELECT event_type, hour,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS t,
        |    CAST(hsum AS DECIMAL(18,4)) AS y
        |  FROM hourly),
        |s AS (
        |  SELECT event_type, hour,
        |    count(*) OVER w AS n,
        |    CAST(sum(t) OVER w AS BIGINT) AS sx,
        |    CAST(sum(t * t) OVER w AS BIGINT) AS sxx,
        |    sum(y) OVER w AS sy,
        |    sum(y * t) OVER w AS sxy
        |  FROM xy
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hour, n,
        |  round(CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
        |    ELSE (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END, 4) AS slope24
        |FROM s ORDER BY event_type, hour""".stripMargin,

    "ts_seasonal_residual_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS hsum,
        |    hour(date_trunc('hour', ts)) AS hod
        |  FROM events GROUP BY 1, 2),
        |prof AS (
        |  SELECT event_type, hod,
        |    round(CAST(SUM(CAST(hsum AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*), 4) AS pmean
        |  FROM hourly GROUP BY 1, 2),
        |res AS (
        |  SELECT h.event_type, h.hour,
        |    CAST(round(h.hsum - p.pmean, 4) AS DECIMAL(18,4)) AS r
        |  FROM hourly h JOIN prof p
        |    ON h.event_type = p.event_type AND h.hod = p.hod),
        |st AS (
        |  SELECT event_type, count(*) AS n, sum(r) AS sr,
        |    sum(r * r) AS srr
        |  FROM res GROUP BY 1),
        |sg AS (
        |  SELECT event_type, n,
        |    sqrt((CAST(srr AS DOUBLE)
        |      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n) / n) AS sigma
        |  FROM st)
        |SELECT r.event_type, max(sg.n) AS n_hours,
        |  round(max(sg.sigma), 4) AS sigma,
        |  count(*) FILTER (WHERE CAST(abs(r.r) AS DOUBLE) > 3.0 * sg.sigma)
        |    AS n_flagged,
        |  min(CASE WHEN CAST(abs(r.r) AS DOUBLE) > 3.0 * sg.sigma
        |    THEN r.hour END) AS first_flag_hour
        |FROM res r JOIN sg ON r.event_type = sg.event_type
        |GROUP BY 1 ORDER BY r.event_type""".stripMargin,

    "ts_cusum_alarm" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(hu) AS BIGINT) AS tu,
        |          count(*) AS n
        |        FROM hourly GROUP BY 1),
        |c AS (
        |  SELECT h.event_type, h.hour, t.n, t.tu,
        |    CAST(sum(h.hu * t.n - t.tu) OVER w AS BIGINT) AS c
        |  FROM hourly h JOIN tot t USING (event_type)
        |  WINDOW w AS (PARTITION BY h.event_type ORDER BY h.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (
        |  SELECT *,
        |    c - least(CAST(0 AS BIGINT), CAST(min(c) OVER w2 AS BIGINT))
        |      AS cusum
        |  FROM c
        |  WINDOW w2 AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, max(n) AS n_hours,
        |  count(*) FILTER (WHERE cusum > 5 * tu) AS n_alarms,
        |  round(CAST(max(cusum) AS DOUBLE) / (max(n) * 10000.0), 4)
        |    AS max_cusum,
        |  min(CASE WHEN cusum > 5 * tu THEN hour END) AS first_alarm_hour
        |FROM s GROUP BY 1 ORDER BY event_type""".stripMargin,

    "ts_winsorized_mean" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    round(${dsumSql("value")}, 4) AS hsum
         |  FROM events GROUP BY 1, 2),
         |b AS (
         |  SELECT event_type,
         |    round(percentile_cont(0.05) WITHIN GROUP (ORDER BY hsum), 4) AS p05,
         |    round(percentile_cont(0.95) WITHIN GROUP (ORDER BY hsum), 4) AS p95
         |  FROM hourly GROUP BY event_type),
         |cv AS (
         |  SELECT h.event_type, b.p05, b.p95, h.hsum,
         |    least(greatest(h.hsum, b.p05), b.p95) AS cv
         |  FROM hourly h JOIN b USING (event_type))
         |SELECT event_type, count(*) AS n_hours,
         |  count(*) FILTER (hsum < p05) AS n_clip_low,
         |  count(*) FILTER (hsum > p95) AS n_clip_high,
         |  max(p05) AS p05, max(p95) AS p95,
         |  round(${dsumSql("cv")} / count(*), 4) AS winsorized_mean
         |FROM cv GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_downsample_ltob" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |pts AS (
         |  SELECT event_type, hour, y,
         |    CAST(row_number() OVER w AS BIGINT) AS idx,
         |    count(*) OVER (PARTITION BY event_type) AS n,
         |    lag(y) OVER w AS yp, lead(y) OVER w AS yn
         |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
         |ar AS (
         |  SELECT *, abs(yp - y * 2 + yn) AS area,
         |    (idx - 1) // $LtobBucket AS bucket
         |  FROM pts),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type, bucket
         |    ORDER BY area DESC NULLS LAST, idx) AS rn
         |  FROM ar)
         |SELECT event_type, idx, hour,
         |  round(CAST(y AS DOUBLE) / 10000.0, 4) AS v
         |FROM rk
         |WHERE idx = 1 OR idx = n OR (rn = 1 AND area IS NOT NULL)
         |ORDER BY event_type, idx""".stripMargin,

    "ts_anomaly_ewma_band" -> {
      def mmod(e: String, k: Int) = s"((($e) % $k) + $k) % $k"
      val a0 = "y.y + r.m"
      val mn = s"(($a0) - ${mmod(a0, 2)}) // 2"
      val dv = "(yv - mn)"
      val v0 = s"v_prev + $dv * $dv"
      val vn = s"(($v0) - ${mmod(v0, 2)}) // 2"
      val fl = s"f_prev + CASE WHEN $dv * $dv > 9 * v_prev AND ri >= 2 " +
        "THEN 1 ELSE 0 END"
      s"""WITH RECURSIVE hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |idx AS (
         |  SELECT event_type, y, row_number() OVER (
         |    PARTITION BY event_type ORDER BY hour) AS i
         |  FROM hourly),
         |n AS (SELECT event_type, max(i) AS h FROM idx GROUP BY 1),
         |rec AS (
         |  SELECT event_type, CAST(1 AS BIGINT) AS i, y AS m,
         |    CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS f
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT event_type, i, mn AS m, $vn AS v, $fl AS f
         |  FROM (
         |    SELECT r.event_type AS event_type, r.i + 1 AS i, r.v AS v_prev,
         |      r.f AS f_prev, r.i AS ri, y.y AS yv, $mn AS mn
         |    FROM rec r JOIN idx y
         |      ON y.event_type = r.event_type AND y.i = r.i + 1) s)
         |SELECT r.event_type, CAST(n.h AS BIGINT) AS n_hours,
         |  round(CAST(r.m AS DOUBLE) / 100.0, 4) AS ewma,
         |  round(sqrt(CAST(r.v AS DOUBLE)) / 100.0, 4) AS ew_sigma,
         |  r.f AS n_flagged
         |FROM rec r JOIN n ON r.event_type = n.event_type AND r.i = n.h
         |WHERE n.h >= 2
         |ORDER BY r.event_type""".stripMargin
    },

    "ts_holt_linear" -> {
      def mmod(e: String, k: Int) = s"((($e) % $k) + $k) % $k"
      val a0 = "y.y + r.l + r.b"
      val lnew = s"(($a0) - ${mmod(a0, 2)}) // 2"
      val bArg = "lnew - lprev + 3 * bprev"
      val bnew = s"(($bArg) - ${mmod(bArg, 4)}) // 4"
      s"""WITH RECURSIVE hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |idx AS (
         |  SELECT event_type, y, row_number() OVER (
         |    PARTITION BY event_type ORDER BY hour) AS i
         |  FROM hourly),
         |n AS (SELECT event_type, max(i) AS h FROM idx GROUP BY 1),
         |rec AS (
         |  SELECT a.event_type, CAST(1 AS BIGINT) AS i, a.y AS l, b.y - a.y AS b
         |  FROM idx a JOIN idx b
         |    ON a.event_type = b.event_type AND a.i = 1 AND b.i = 2
         |  UNION ALL
         |  SELECT event_type, i, lnew AS l, $bnew AS b
         |  FROM (
         |    SELECT r.event_type, r.i + 1 AS i, r.l AS lprev, r.b AS bprev,
         |      $lnew AS lnew
         |    FROM rec r JOIN idx y
         |      ON y.event_type = r.event_type AND y.i = r.i + 1) s)
         |SELECT r.event_type, CAST(n.h AS BIGINT) AS n_hours,
         |  round(CAST(r.l AS DOUBLE) / 10000.0, 4) AS level,
         |  round(CAST(r.b AS DOUBLE) / 10000.0, 4) AS trend,
         |  round(CAST(r.l + $HoltForecastH * r.b AS DOUBLE) / 10000.0, 4)
         |    AS forecast_24h
         |FROM rec r JOIN n ON r.event_type = n.event_type AND r.i = n.h
         |WHERE n.h >= 2
         |ORDER BY r.event_type""".stripMargin
    },
    "ts_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |  count(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "ts_sliding_window" ->
      """SELECT time_bucket(INTERVAL '15 minutes', e.ts) - t.k * INTERVAL '15 minutes' AS ws,
        |  e.event_type, count(*) AS n
        |FROM events e CROSS JOIN range(4) t(k)
        |WHERE e.ts < time_bucket(INTERVAL '15 minutes', e.ts) - t.k * INTERVAL '15 minutes' + INTERVAL '1 hour'
        |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "ts_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "ts_late_data_semantics" ->
      """WITH m AS (
        |  SELECT ts, max(ts) OVER (ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
        |  FROM events)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, count(*) AS n
        |FROM m WHERE ts >= mx - INTERVAL '1 hour'
        |GROUP BY 1 ORDER BY ws""".stripMargin,

    "ts_downsample_1m" ->
      """SELECT event_type, date_trunc('minute', ts) AS minute,
        |  count(*) AS n, min(value) AS min_value, max(value) AS max_value,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, minute""".stripMargin,

    "ts_interval_union" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t0,
        |    epoch_us(ts) + 1800000000 AS t1
        |  FROM events),
        |isl AS (
        |  SELECT user_id, t0, t1,
        |    SUM(starts) OVER (PARTITION BY user_id ORDER BY t0, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM (
        |    SELECT *, CASE WHEN t0 > coalesce(max(t1) OVER (
        |        PARTITION BY user_id ORDER BY t0, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        -9223372036854775808) THEN 1 ELSE 0 END AS starts
        |    FROM ev) t),
        |runs AS (
        |  SELECT user_id, isl, min(t0) AS s, max(t1) AS e
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(SUM((e - s) // 1000000) AS BIGINT) AS covered_s
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id, value
        |  FROM events),
        |w AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, hour
        |      ORDER BY ts, event_id) AS rf,
        |    row_number() OVER (PARTITION BY event_type, hour
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM e)
        |SELECT event_type, hour,
        |  round(max(CASE WHEN rf = 1 THEN value END), 4) AS open,
        |  round(max(value), 4) AS high,
        |  round(min(value), 4) AS low,
        |  round(max(CASE WHEN rl = 1 THEN value END), 4) AS close,
        |  count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY event_type, hour""".stripMargin,

    "ts_anomaly_zscore" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS hsum
        |  FROM events GROUP BY 1, 2),
        |z AS (
        |  SELECT event_type, hour, hsum,
        |    round((hsum - avg(hsum) OVER w) / stddev_samp(hsum) OVER w, 4) AS z
        |  FROM hourly WINDOW w AS (PARTITION BY event_type))
        |SELECT event_type, hour, hsum, z FROM z
        |WHERE abs(z) >= 2.0 ORDER BY event_type, hour""".stripMargin,

    "ts_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |                date_trunc('hour', max(ts)) AS hi FROM events),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM span),
        |grid AS (SELECT t.event_type, h.hour
        |  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN hours h)
        |SELECT g.event_type, g.hour, coalesce(hourly.n, 0) AS n,
        |  coalesce(last_value(hourly.sum_value IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled_sum
        |FROM grid g LEFT JOIN hourly
        |  ON hourly.event_type = g.event_type AND hourly.hour = g.hour
        |ORDER BY g.event_type, g.hour""".stripMargin,

    "ts_funnel_conversion" ->
      """WITH v AS (SELECT user_id, event_id AS v_id, ts AS v_ts
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, count(DISTINCT v.v_id) AS n_views,
        |  count(DISTINCT CASE WHEN p.p_ts IS NOT NULL THEN v.v_id END) AS n_converted,
        |  round(CAST(count(DISTINCT CASE WHEN p.p_ts IS NOT NULL THEN v.v_id END)
        |    AS DOUBLE) / count(DISTINCT v.v_id), 4) AS conv_rate
        |FROM v LEFT JOIN p ON p.user_id = v.user_id
        |  AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    "ts_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
        |SELECT f.cohort_day,
        |  CAST(date_diff('day', CAST(f.cohort_day AS DATE), CAST(act.day AS DATE)) AS INT)
        |    AS day_offset,
        |  count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN f ON act.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "ts_dedup_within_watermark" ->
      """SELECT user_id, event_type, ts AS first_ts, event_id FROM (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    // lag j = a.rn - b.rn carries weight 2^(19-j) — the same
    // 2^(K-m+i) the Spark array formulation applies (i = m-1-j);
    // integer sums, one double division, identical op order
    "ts_ewma" ->
      """WITH rnk AS (
        |  SELECT event_id, user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS cents
        |  FROM events)
        |SELECT a.event_id, a.user_id,
        |  round(CAST(sum(b.cents * (CAST(1 AS BIGINT) << (19 - (a.rn - b.rn))))
        |      AS DOUBLE)
        |    / (((CAST(1 AS BIGINT) << 20)
        |        - (CAST(1 AS BIGINT) << (20 - least(a.rn, 20)))) * 10000.0),
        |    4) AS ewma
        |FROM rnk a JOIN rnk b
        |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
        |GROUP BY a.event_id, a.user_id, a.rn
        |ORDER BY a.event_id""".stripMargin,

    "ts_burstiness" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS scc
        |  FROM hourly GROUP BY event_type)
        |SELECT event_type, n_hours,
        |  round(CAST(sc AS DOUBLE) / n_hours, 4) AS mean_per_hour,
        |  round((CAST(scc AS DOUBLE) / n_hours
        |      - (CAST(sc AS DOUBLE) / n_hours) * (CAST(sc AS DOUBLE) / n_hours))
        |    / (CAST(sc AS DOUBLE) / n_hours), 4) AS fano
        |FROM st ORDER BY event_type""".stripMargin,

    "ts_theil_sen" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    round(${dsumSql("value")}, 4) AS hsum
         |  FROM events GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a.event_type,
         |    round((b.hsum - a.hsum)
         |      / CAST(date_diff('hour', a.hour, b.hour) AS DOUBLE), 4) AS slope
         |  FROM hourly a JOIN hourly b
         |    ON a.event_type = b.event_type AND a.hour < b.hour)
         |SELECT event_type, count(*) AS n_pairs,
         |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY slope), 4)
         |    AS slope_per_hour
         |FROM pairs GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_crosscorr_lagged" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS h
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1, 2),
        |v AS (SELECT epoch_us(hour) // 1000000 AS sec, h AS x
        |      FROM hourly WHERE event_type = 'view'),
        |p AS (SELECT epoch_us(hour) // 1000000 AS psec, h AS y
        |      FROM hourly WHERE event_type = 'purchase'),
        |lg AS (SELECT range AS lag FROM range(0, 4)),
        |j AS (
        |  SELECT lg.lag, v.x, p.y
        |  FROM v CROSS JOIN lg JOIN p ON p.psec = v.sec + lg.lag * 3600),
        |st AS (
        |  SELECT lag, count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(38,8))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,8))) AS sxx,
        |    SUM(CAST(y * y AS DECIMAL(38,8))) AS syy
        |  FROM j GROUP BY lag)
        |SELECT CAST(lag AS INT) AS lag, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
        |    AS xcorr
        |FROM st ORDER BY lag""".stripMargin,

    "ts_autocorr" ->
      """WITH hourly AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS h
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, h,
        |    lag(h, 1) OVER (PARTITION BY event_type ORDER BY hour) AS p
        |  FROM hourly),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |    SUM(p) AS sx, SUM(h) AS sy,
        |    SUM(CAST(p * h AS DECIMAL(38,8))) AS sxy,
        |    SUM(CAST(p * p AS DECIMAL(38,8))) AS sxx,
        |    SUM(CAST(h * h AS DECIMAL(38,8))) AS syy
        |  FROM lagged WHERE p IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        |    4) AS acf1
        |FROM st ORDER BY event_type""".stripMargin,

    "ts_pacf" ->
      """WITH hourly AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS h
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT event_type, h,
        |    lag(h, 1) OVER (PARTITION BY event_type ORDER BY hour) AS p1,
        |    lag(h, 2) OVER (PARTITION BY event_type ORDER BY hour) AS p2
        |  FROM hourly),
        |st AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    SUM(CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN p1 IS NOT NULL THEN p1 END) AS sx1,
        |    SUM(CASE WHEN p1 IS NOT NULL THEN h END) AS sy1,
        |    SUM(CASE WHEN p1 IS NOT NULL
        |      THEN CAST(p1 * h AS DECIMAL(38,8)) END) AS sxy1,
        |    SUM(CASE WHEN p1 IS NOT NULL
        |      THEN CAST(p1 * p1 AS DECIMAL(38,8)) END) AS sxx1,
        |    SUM(CASE WHEN p1 IS NOT NULL
        |      THEN CAST(h * h AS DECIMAL(38,8)) END) AS syy1,
        |    SUM(CASE WHEN p2 IS NOT NULL THEN 1 ELSE 0 END) AS n2,
        |    SUM(CASE WHEN p2 IS NOT NULL THEN p2 END) AS sx2,
        |    SUM(CASE WHEN p2 IS NOT NULL THEN h END) AS sy2,
        |    SUM(CASE WHEN p2 IS NOT NULL
        |      THEN CAST(p2 * h AS DECIMAL(38,8)) END) AS sxy2,
        |    SUM(CASE WHEN p2 IS NOT NULL
        |      THEN CAST(p2 * p2 AS DECIMAL(38,8)) END) AS sxx2,
        |    SUM(CASE WHEN p2 IS NOT NULL
        |      THEN CAST(h * h AS DECIMAL(38,8)) END) AS syy2,
        |    MIN(CASE WHEN p1 IS NOT NULL THEN p1 END) AS mnx1,
        |    MAX(CASE WHEN p1 IS NOT NULL THEN p1 END) AS mxx1,
        |    MIN(CASE WHEN p1 IS NOT NULL THEN h END) AS mny1,
        |    MAX(CASE WHEN p1 IS NOT NULL THEN h END) AS mxy1,
        |    MIN(CASE WHEN p2 IS NOT NULL THEN p2 END) AS mnx2,
        |    MAX(CASE WHEN p2 IS NOT NULL THEN p2 END) AS mxx2,
        |    MIN(CASE WHEN p2 IS NOT NULL THEN h END) AS mny2,
        |    MAX(CASE WHEN p2 IS NOT NULL THEN h END) AS mxy2
        |  FROM lg GROUP BY 1),
        |rr AS (
        |  SELECT event_type, n_hours,
        |    round(CASE WHEN mnx1 = mxx1 OR mny1 = mxy1 THEN 0.0
        |      ELSE (n1 * CAST(sxy1 AS DOUBLE)
        |        - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
        |      / (sqrt(n1 * CAST(sxx1 AS DOUBLE)
        |          - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
        |       * sqrt(n1 * CAST(syy1 AS DOUBLE)
        |          - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))) END, 4) AS acf1,
        |    round(CASE WHEN mnx2 = mxx2 OR mny2 = mxy2 THEN 0.0
        |      ELSE (n2 * CAST(sxy2 AS DOUBLE)
        |        - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE))
        |      / (sqrt(n2 * CAST(sxx2 AS DOUBLE)
        |          - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
        |       * sqrt(n2 * CAST(syy2 AS DOUBLE)
        |          - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))) END, 4) AS acf2
        |  FROM st)
        |SELECT event_type, n_hours, acf1, acf2,
        |  round(CASE WHEN abs(acf1) = 1.0 THEN 0.0
        |    ELSE (acf2 - acf1 * acf1) / (1.0 - acf1 * acf1) END, 4) AS pacf2
        |FROM rr ORDER BY event_type""".stripMargin,

    "ts_changepoint_meanshift" ->
      """WITH hourly AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS h
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, SUM(h) AS tot, count(*) AS n
        |        FROM hourly GROUP BY 1),
        |pre AS (
        |  SELECT event_type, hour,
        |    SUM(h) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS t
        |  FROM hourly),
        |cand AS (
        |  SELECT p.event_type, p.hour, p.t, tt.n,
        |    round(abs(CAST(pre AS DOUBLE) / p.t
        |        - (CAST(tot AS DOUBLE) - CAST(pre AS DOUBLE)) / (tt.n - p.t))
        |      * sqrt(CAST(p.t AS DOUBLE) * (tt.n - p.t) / tt.n), 4) AS stat
        |  FROM pre p JOIN tot tt USING (event_type)
        |  WHERE p.t < tt.n)
        |SELECT event_type, hour AS cp_hour, CAST(t AS INT) AS t_left, n, stat
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY stat DESC, hour) AS rn
        |  FROM cand) q
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "ts_seasonal_profile" ->
      """WITH byhod AS (
        |  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hod,
        |    count(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tn
        |        FROM byhod GROUP BY 1)
        |SELECT b.event_type, b.hod, b.n,
        |  round(CAST(sv AS DOUBLE) / b.n, 4) AS avg_value,
        |  round(CAST(b.n AS DOUBLE) / t.tn, 4) AS share
        |FROM byhod b JOIN tot t USING (event_type)
        |ORDER BY event_type, hod""".stripMargin,

    "ts_peak_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t0,
        |    epoch_us(ts) + 1800000000 AS t1
        |  FROM events),
        |isl AS (
        |  SELECT user_id, t0, t1,
        |    SUM(starts) OVER (PARTITION BY user_id ORDER BY t0, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM (
        |    SELECT *, CASE WHEN t0 > coalesce(max(t1) OVER (
        |        PARTITION BY user_id ORDER BY t0, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        -9223372036854775808) THEN 1 ELSE 0 END AS starts
        |    FROM ev) q),
        |iv AS (
        |  SELECT user_id, min(t0) AS s, max(t1) AS e
        |  FROM isl GROUP BY user_id, isl),
        |bd AS (
        |  SELECT user_id, s AS t, CAST(1 AS BIGINT) AS delta FROM iv
        |  UNION ALL
        |  SELECT user_id, e AS t, CAST(-1 AS BIGINT) AS delta FROM iv),
        |run AS (
        |  SELECT t, SUM(delta) OVER (ORDER BY t, delta, user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM bd)
        |SELECT make_timestamp(t - t % 3600000000) AS hour,
        |  count(*) AS n_transitions,
        |  CAST(max(run) AS BIGINT) AS peak_concurrent
        |FROM run GROUP BY 1 ORDER BY hour""".stripMargin,

    "ts_sax_motifs" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
        |hist AS (SELECT event_type, hu, count(*) AS c
        |         FROM hourly GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, hu,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY hu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |ed AS (
        |  SELECT c.event_type, q.dq, min(c.hu) AS e
        |  FROM cum c JOIN tot t USING (event_type)
        |  CROSS JOIN (SELECT unnest([1, 2]) AS dq) q
        |  WHERE c.cum * 3 >= q.dq * t.n GROUP BY 1, 2),
        |e2 AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN dq = 1 THEN e END) AS e1,
        |    MIN(CASE WHEN dq = 2 THEN e END) AS e2
        |  FROM ed GROUP BY 1),
        |sym AS (
        |  SELECT h.event_type, h.hour,
        |    (['a', 'b', 'c'])[1 + CASE WHEN hu > e1 THEN 1 ELSE 0 END
        |      + CASE WHEN hu > e2 THEN 1 ELSE 0 END] AS sy
        |  FROM hourly h JOIN e2 USING (event_type)),
        |wd AS (
        |  SELECT event_type,
        |    sy || lead(sy, 1) OVER w || lead(sy, 2) OVER w
        |      || lead(sy, 3) OVER w AS word,
        |    lead(sy, 3) OVER w AS l3
        |  FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
        |ct AS (SELECT event_type, word, count(*) AS n FROM wd
        |       WHERE l3 IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, word AS motif, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, word) AS rn
        |  FROM ct) q
        |WHERE rn <= 5 ORDER BY event_type, motif""".stripMargin,

    "ts_hill_tail_index" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
         |  FROM events GROUP BY 1, 2 HAVING hu > 0),
         |sel AS (
         |  SELECT event_type, hu FROM (
         |    SELECT event_type, hu, row_number() OVER (
         |      PARTITION BY event_type ORDER BY hu DESC, hour) AS rn
         |    FROM hourly) q
         |  WHERE rn <= $HillK),
         |xk AS (
         |  SELECT event_type, min(hu) AS xk, count(*) AS keff
         |  FROM sel GROUP BY 1 HAVING count(*) >= 2),
         |lr AS (
         |  SELECT s.event_type, x.xk, x.keff,
         |    CAST(round(ln(CAST(hu AS DOUBLE) / xk), 4) AS DECIMAL(18,4))
         |      AS lr
         |  FROM sel s JOIN xk x USING (event_type)),
         |g AS (
         |  SELECT event_type, max(keff) AS k,
         |    round(CAST(max(xk) AS DOUBLE) / 10000.0, 4) AS x_k,
         |    SUM(lr) AS sl
         |  FROM lr GROUP BY 1)
         |SELECT event_type, k, x_k,
         |  round(CASE WHEN sl = 0 THEN 0.0
         |    ELSE CAST(k - 1 AS DOUBLE) / CAST(sl AS DOUBLE) END, 4)
         |    AS hill_alpha
         |FROM g ORDER BY event_type""".stripMargin,

    "ts_mann_kendall" ->
      s"""WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu,
        |    date_trunc('week', date_trunc('hour', ts)) AS tb
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(hu) AS mn, max(hu) AS mx
        |        FROM hourly GROUP BY 1),
        |hb AS (
        |  SELECT h.event_type, h.hour, h.tb, h.hu,
        |    CAST(((CAST(h.hu AS HUGEINT) - r.mn) * $MkValueBuckets)
        |      // (CAST(r.mx AS HUGEINT) - r.mn + 1) AS BIGINT) AS vb
        |  FROM hourly h JOIN rng r USING (event_type)),
        |sa AS (
        |  SELECT a.event_type,
        |    SUM(CASE WHEN b.hu > a.hu THEN 1
        |      WHEN b.hu < a.hu THEN -1 ELSE 0 END) AS sp
        |  FROM hb a JOIN hb b ON a.event_type = b.event_type
        |    AND a.tb = b.tb AND a.hour < b.hour
        |  GROUP BY 1),
        |sb AS (
        |  SELECT a.event_type,
        |    SUM(CASE WHEN b.hu > a.hu THEN 1
        |      WHEN b.hu < a.hu THEN -1 ELSE 0 END) AS sp
        |  FROM hb a JOIN hb b ON a.event_type = b.event_type
        |    AND a.vb = b.vb AND a.tb < b.tb
        |  GROUP BY 1),
        |grid AS (SELECT event_type, tb, vb, count(*) AS c
        |         FROM hb GROUP BY 1, 2, 3),
        |dense AS (
        |  SELECT t.event_type, t.tb, v.vb, coalesce(g.c, 0) AS c
        |  FROM (SELECT DISTINCT event_type, tb FROM hb) t
        |  JOIN (SELECT DISTINCT event_type, vb FROM hb) v USING (event_type)
        |  LEFT JOIN grid g ON g.event_type = t.event_type
        |    AND g.tb = t.tb AND g.vb = v.vb),
        |cum AS (
        |  SELECT *, coalesce(SUM(c) OVER (PARTITION BY event_type, vb
        |    ORDER BY tb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS ct
        |  FROM dense),
        |lg AS (
        |  SELECT *,
        |    coalesce(SUM(ct) OVER (PARTITION BY event_type, tb ORDER BY vb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
        |    coalesce(SUM(ct) OVER (PARTITION BY event_type, tb ORDER BY vb
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS hi
        |  FROM cum),
        |scc AS (SELECT event_type, SUM(c * (lo - hi)) AS sp
        |        FROM lg GROUP BY 1),
        |s AS (
        |  SELECT event_type, CAST(SUM(sp) AS BIGINT) AS s_stat FROM (
        |    SELECT * FROM sa UNION ALL SELECT * FROM sb
        |    UNION ALL SELECT * FROM scc) q
        |  GROUP BY 1),
        |n AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
        |ties AS (
        |  SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |  FROM (SELECT event_type, hu, count(*) AS t FROM hourly
        |        GROUP BY 1, 2) q
        |  WHERE t > 1 GROUP BY 1),
        |v AS (
        |  SELECT s.event_type, n.n, s.s_stat,
        |    n.n * (n.n - 1) * (2 * n.n + 5) - coalesce(ties.tsum, 0)
        |      AS var18
        |  FROM s JOIN n USING (event_type)
        |  LEFT JOIN ties USING (event_type)),
        |z AS (
        |  SELECT event_type, n, s_stat,
        |    CASE WHEN var18 = 0 THEN 0.0
        |      WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |      WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |      ELSE 0.0 END AS z
        |  FROM v)
        |SELECT event_type, n AS n_hours, s_stat, round(z, 4) AS z,
        |  CASE WHEN round(z, 4) > 1.96 THEN 'increasing'
        |       WHEN round(z, 4) < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z ORDER BY event_type""".stripMargin,

    "ts_runs_test" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
        |hist AS (SELECT event_type, hu, count(*) AS c
        |         FROM hourly GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, hu,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY hu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |med AS (
        |  SELECT c.event_type, min(c.hu) AS med
        |  FROM cum c JOIN tot t USING (event_type)
        |  WHERE c.cum * 2 >= t.n GROUP BY 1),
        |sg AS (
        |  SELECT h.event_type, h.hour,
        |    CASE WHEN h.hu > m.med THEN 1 ELSE -1 END AS sg
        |  FROM hourly h JOIN med m USING (event_type)
        |  WHERE h.hu <> m.med),
        |lg AS (
        |  SELECT *, lag(sg) OVER (PARTITION BY event_type ORDER BY hour)
        |    AS prev
        |  FROM sg),
        |st AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_above,
        |    CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_below,
        |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> sg THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_runs
        |  FROM lg GROUP BY 1),
        |zz AS (
        |  SELECT event_type, n_above, n_below, n_runs,
        |    CASE WHEN n_above = 0 OR n_below = 0 THEN 0.0 ELSE
        |      CASE WHEN CAST(n_above * n_below * 2 AS DOUBLE)
        |          * (CAST(n_above * n_below * 2 AS DOUBLE)
        |             - CAST(n_above + n_below AS DOUBLE))
        |          / (CAST(n_above + n_below AS DOUBLE)
        |             * CAST(n_above + n_below AS DOUBLE)
        |             * (CAST(n_above + n_below AS DOUBLE) - 1)) <= 0.0
        |        THEN 0.0
        |        ELSE (CAST(n_runs AS DOUBLE)
        |          - (1.0 + CAST(n_above * n_below * 2 AS DOUBLE)
        |                 / CAST(n_above + n_below AS DOUBLE)))
        |          / sqrt(CAST(n_above * n_below * 2 AS DOUBLE)
        |            * (CAST(n_above * n_below * 2 AS DOUBLE)
        |               - CAST(n_above + n_below AS DOUBLE))
        |            / (CAST(n_above + n_below AS DOUBLE)
        |               * CAST(n_above + n_below AS DOUBLE)
        |               * (CAST(n_above + n_below AS DOUBLE) - 1)))
        |      END END AS z
        |  FROM st)
        |SELECT event_type, n_above, n_below, n_runs, round(z, 4) AS z,
        |  CASE WHEN round(z, 4) > 1.96 THEN 'alternating'
        |       WHEN round(z, 4) < -1.96 THEN 'clustered'
        |       ELSE 'random' END AS verdict
        |FROM zz ORDER BY event_type""".stripMargin,

    "ts_turning_points" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT event_type, hu,
        |    lag(hu) OVER (PARTITION BY event_type ORDER BY hour) AS pv,
        |    lead(hu) OVER (PARTITION BY event_type ORDER BY hour) AS nx
        |  FROM hourly),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(SUM(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
        |      AND ((hu > pv AND hu > nx) OR (hu < pv AND hu < nx))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_turns
        |  FROM lg GROUP BY 1),
        |zz AS (
        |  SELECT event_type, n, n_turns,
        |    CASE WHEN n < 4 THEN 0.0 ELSE
        |      (CAST(n_turns AS DOUBLE)
        |        - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0)
        |      / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)
        |    END AS z
        |  FROM st)
        |SELECT event_type, n AS n_hours, n_turns, round(z, 4) AS z,
        |  CASE WHEN round(z, 4) < -1.96 THEN 'smooth'
        |       WHEN round(z, 4) > 1.96 THEN 'oscillating'
        |       ELSE 'noise_like' END AS verdict
        |FROM zz ORDER BY event_type""".stripMargin,

    "ts_forecast_backtest" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT event_type,
        |    hu - lag(hu, 1) OVER w AS e1, hu - lag(hu, 24) OVER w AS e24
        |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
        |er AS (
        |  SELECT event_type, 'naive' AS model, abs(e1) AS ae
        |  FROM lg WHERE e1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 'seasonal_naive', abs(e24)
        |  FROM lg WHERE e24 IS NOT NULL),
        |g AS (
        |  SELECT event_type, model, count(*) AS n_evals,
        |    CAST(sum(ae) AS BIGINT) AS sae,
        |    SUM(CAST(ae AS HUGEINT) * ae) AS sse
        |  FROM er GROUP BY 1, 2)
        |SELECT event_type, model, n_evals,
        |  round(CAST(sae AS DOUBLE) / n_evals / 10000.0, 4) AS mae,
        |  round(sqrt(CAST(sse AS DOUBLE) / n_evals) / 10000.0, 4) AS rmse
        |FROM g ORDER BY event_type, model""".stripMargin,

    "ts_seasonal_strength" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS hsum,
        |    hour(date_trunc('hour', ts)) AS hod
        |  FROM events GROUP BY 1, 2),
        |prof AS (
        |  SELECT event_type, hod,
        |    round(CAST(SUM(CAST(hsum AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*), 4) AS pmean
        |  FROM hourly GROUP BY 1, 2),
        |grand AS (
        |  SELECT event_type,
        |    round(CAST(SUM(CAST(hsum AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*), 4) AS gmean
        |  FROM hourly GROUP BY 1),
        |res AS (
        |  SELECT h.event_type,
        |    CAST(round(h.hsum - p.pmean, 4) AS DECIMAL(18,4)) AS r,
        |    CAST(round(h.hsum - g.gmean, 4) AS DECIMAL(18,4)) AS rt
        |  FROM hourly h
        |  JOIN prof p ON h.event_type = p.event_type AND h.hod = p.hod
        |  JOIN grand g ON h.event_type = g.event_type),
        |st AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    sum(r * r) AS ssr, sum(rt * rt) AS sst
        |  FROM res GROUP BY 1)
        |SELECT event_type, n_hours,
        |  round(CASE WHEN sst = 0 THEN 0.0
        |    ELSE 1.0 - CAST(ssr AS DOUBLE) / CAST(sst AS DOUBLE) END, 4)
        |    AS seasonal_strength
        |FROM st ORDER BY event_type""".stripMargin,

    "ts_obv" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', l_shipdate) AS day,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS vol,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS notional
        |  FROM lineitem GROUP BY 1),
        |lg AS (
        |  SELECT day, vol, notional,
        |    lag(vol) OVER (ORDER BY day) AS pv,
        |    lag(notional) OVER (ORDER BY day) AS pn
        |  FROM daily),
        |sg AS (
        |  SELECT day, vol,
        |    CASE WHEN pv IS NULL THEN 0
        |      WHEN notional * pv > pn * vol THEN 1
        |      WHEN notional * pv < pn * vol THEN -1
        |      ELSE 0 END AS sgn
        |  FROM lg)
        |SELECT day, CAST(sgn AS BIGINT) AS sgn,
        |  round(CAST(vol AS DOUBLE), 4) AS volume,
        |  round(CAST(SUM(sgn * vol) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
        |    AS obv
        |FROM sg ORDER BY day""".stripMargin,

    "ts_variance_ratio" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |dl AS (
        |  SELECT event_type,
        |    hu - lag(hu, 1) OVER w AS d1, hu - lag(hu, 4) OVER w AS d4
        |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
        |g AS (
        |  SELECT event_type,
        |    count(d1) AS n1, SUM(CAST(d1 AS HUGEINT)) AS s1,
        |    SUM(CAST(d1 AS HUGEINT) * d1) AS q1,
        |    count(d4) AS n4, SUM(CAST(d4 AS HUGEINT)) AS s4,
        |    SUM(CAST(d4 AS HUGEINT) * d4) AS q4
        |  FROM dl GROUP BY 1),
        |v AS (
        |  SELECT event_type, n1,
        |    CAST(n1 * q1 - s1 * s1 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * n1) AS v1,
        |    CAST(n4 * q4 - s4 * s4 AS DOUBLE)
        |      / (CAST(n4 AS DOUBLE) * n4) AS v4
        |  FROM g WHERE n1 > 0 AND n4 > 0),
        |r AS (
        |  SELECT event_type, n1,
        |    round(CASE WHEN v1 = 0.0 THEN 0.0
        |      ELSE v4 / (4.0 * v1) END, 4) AS vr4
        |  FROM v)
        |SELECT event_type, n1 AS n_deltas, vr4,
        |  CASE WHEN vr4 > 1.2 THEN 'momentum'
        |       WHEN vr4 < 0.8 THEN 'mean_reverting'
        |       ELSE 'random_walk' END AS verdict
        |FROM r ORDER BY event_type""".stripMargin,

    "ts_littles_law" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t0,
        |    epoch_us(ts) + 1800000000 AS t1
        |  FROM events),
        |isl AS (
        |  SELECT user_id, t0, t1,
        |    SUM(starts) OVER (PARTITION BY user_id ORDER BY t0, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM (
        |    SELECT *, CASE WHEN t0 > coalesce(max(t1) OVER (
        |        PARTITION BY user_id ORDER BY t0, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        -9223372036854775808) THEN 1 ELSE 0 END AS starts
        |    FROM ev) q),
        |iv AS (
        |  SELECT user_id, min(t0) AS s, max(t1) AS e
        |  FROM isl GROUP BY user_id, isl),
        |g AS (
        |  SELECT count(*) AS n_sessions, min(s) AS lo, max(e) AS hi,
        |    CAST(SUM(e - s) AS BIGINT) AS durus
        |  FROM iv),
        |h AS (SELECT *, CAST(hi - lo AS DOUBLE) / 3600000000.0
        |        AS horizon_h FROM g)
        |SELECT n_sessions, round(horizon_h, 4) AS horizon_hours,
        |  round(CAST(n_sessions AS DOUBLE) / horizon_h, 4)
        |    AS lambda_per_hour,
        |  round(CAST(durus AS DOUBLE) / n_sessions / 60000000.0, 4)
        |    AS mean_duration_min,
        |  round(CAST(durus AS DOUBLE) / CAST(hi - lo AS DOUBLE), 4)
        |    AS time_avg_concurrency
        |FROM h""".stripMargin,

    "ts_ljung_box" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS hsum,
        |    hour(date_trunc('hour', ts)) AS hod
        |  FROM events GROUP BY 1, 2),
        |prof AS (
        |  SELECT event_type, hod,
        |    round(CAST(SUM(CAST(hsum AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*), 4) AS pmean
        |  FROM hourly GROUP BY 1, 2),
        |res AS (
        |  SELECT h.event_type, h.hour,
        |    CAST(round(h.hsum - p.pmean, 4) AS DECIMAL(18,4)) AS r
        |  FROM hourly h JOIN prof p
        |    ON h.event_type = p.event_type AND h.hod = p.hod),
        |lagged AS (
        |  SELECT event_type, r,
        |    lag(r, 1) OVER w AS l1, lag(r, 2) OVER w AS l2,
        |    lag(r, 3) OVER w AS l3, lag(r, 4) OVER w AS l4,
        |    lag(r, 5) OVER w AS l5
        |  FROM res WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
        |g AS (
        |  SELECT event_type, count(*) AS n, sum(r * r) AS s0,
        |    sum(r * l1) AS s1, sum(r * l2) AS s2, sum(r * l3) AS s3,
        |    sum(r * l4) AS s4, sum(r * l5) AS s5
        |  FROM lagged GROUP BY 1),
        |q AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * (n + 2) * (
        |      round(CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        * round(CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        / (n - 1)
        |      + round(CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        * round(CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        / (n - 2)
        |      + round(CAST(s3 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        * round(CAST(s3 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        / (n - 3)
        |      + round(CAST(s4 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        * round(CAST(s4 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        / (n - 4)
        |      + round(CAST(s5 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        * round(CAST(s5 AS DOUBLE) / CAST(s0 AS DOUBLE), 4)
        |        / (n - 5)) AS q
        |  FROM g WHERE n > 5 AND s0 <> 0)
        |SELECT event_type, n AS n_hours, round(q, 4) AS q_stat,
        |  round(q, 4) < 11.0705 AS white_noise
        |FROM q ORDER BY event_type""".stripMargin,

    "ts_profile_similarity" ->
      """WITH prof AS (
        |  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hod,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |        FROM prof GROUP BY 1),
        |sh AS (
        |  SELECT a.event_type AS sa, b.event_type AS sb,
        |    a.c AS ca, b.c AS cb, ta.n AS na, tb.n AS nb
        |  FROM prof a JOIN prof b
        |    ON a.hod = b.hod AND a.event_type < b.event_type
        |  JOIN tot ta ON ta.event_type = a.event_type
        |  JOIN tot tb ON tb.event_type = b.event_type),
        |g AS (
        |  SELECT sa, sb, count(*) AS n_shared_hods,
        |    SUM(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na))
        |      AS dnum,
        |    CAST(SUM(ca) AS BIGINT) AS sca, CAST(SUM(cb) AS BIGINT) AS scb,
        |    MAX(na) AS na, MAX(nb) AS nb
        |  FROM sh GROUP BY 1, 2),
        |dd AS (
        |  SELECT sa, sb, n_shared_hods,
        |    CAST(dnum + CAST(na - sca AS HUGEINT) * nb
        |      + CAST(nb - scb AS HUGEINT) * na AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * nb) AS dist
        |  FROM g)
        |SELECT sa, sb, n_shared_hods, round(dist, 4) AS l1_distance,
        |  round(1.0 - dist / 2.0, 4) AS similarity
        |FROM dd ORDER BY sa, sb""".stripMargin,

    "ts_exceedance_runs" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
        |cum AS (
        |  SELECT event_type, hu,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY hu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT event_type, hu, count(*) AS c FROM hourly
        |        GROUP BY 1, 2) h),
        |p90 AS (
        |  SELECT c.event_type, min(c.hu) AS p90u
        |  FROM cum c JOIN tot t USING (event_type)
        |  WHERE c.cum * 100 >= t.n * 90 GROUP BY 1),
        |ex AS (
        |  SELECT h.event_type, h.hour, epoch(h.hour) // 3600 AS hourno
        |  FROM hourly h JOIN p90 p USING (event_type)
        |  WHERE h.hu > p.p90u),
        |runs AS (
        |  SELECT event_type, grp, count(*) AS len, min(hour) AS start
        |  FROM (
        |    SELECT event_type, hour, hourno - row_number() OVER (
        |      PARTITION BY event_type ORDER BY hourno) AS grp
        |    FROM ex) q
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, grp, len, start,
        |    count(*) OVER (PARTITION BY event_type) AS n_episodes,
        |    CAST(SUM(len) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_exceed,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY len DESC, start) AS rn
        |  FROM runs)
        |SELECT a.event_type, a.n_exceed, a.n_episodes,
        |  a.len AS longest_run, a.start AS longest_start,
        |  round(CAST(a.n_exceed AS DOUBLE) / t.n, 4) AS exceed_share
        |FROM agg a JOIN tot t USING (event_type)
        |WHERE a.rn = 1 ORDER BY a.event_type""".stripMargin,

    "ts_dow_anova" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS ds,
        |    dayofweek(date_trunc('day', ts)) + 1 AS dow
        |  FROM events GROUP BY 1, 2),
        |prof AS (
        |  SELECT event_type, dow,
        |    round(CAST(SUM(CAST(ds AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*), 4) AS pmean
        |  FROM daily GROUP BY 1, 2),
        |grand AS (
        |  SELECT event_type,
        |    round(CAST(SUM(CAST(ds AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*), 4) AS gmean
        |  FROM daily GROUP BY 1),
        |res AS (
        |  SELECT d.event_type,
        |    CAST(round(d.ds - p.pmean, 4) AS DECIMAL(18,4)) AS r,
        |    CAST(round(d.ds - g.gmean, 4) AS DECIMAL(18,4)) AS rt,
        |    d.dow
        |  FROM daily d
        |  JOIN prof p ON d.event_type = p.event_type AND d.dow = p.dow
        |  JOIN grand g ON d.event_type = g.event_type),
        |st AS (
        |  SELECT event_type, count(*) AS n_days,
        |    count(DISTINCT dow) AS k_groups,
        |    sum(r * r) AS ssw, sum(rt * rt) AS sst
        |  FROM res GROUP BY 1)
        |SELECT event_type, n_days, k_groups,
        |  round(CASE WHEN ssw = 0 OR n_days <= k_groups OR k_groups <= 1
        |    THEN 0.0
        |    ELSE (CAST(sst - ssw AS DOUBLE) / (k_groups - 1))
        |      / (CAST(ssw AS DOUBLE) / (n_days - k_groups)) END, 4)
        |    AS f_stat,
        |  round(CASE WHEN sst = 0 THEN 0.0
        |    ELSE CAST(sst - ssw AS DOUBLE) / CAST(sst AS DOUBLE) END, 4)
        |    AS eta_sq
        |FROM st ORDER BY event_type""".stripMargin)
}

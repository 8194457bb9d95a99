package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** §2.5 — window functions.
  *
  * Each window spec = one shuffle on the partition key, then a sorted
  * per-partition pass. Window ORDER BYs always include a unique
  * tie-break key so rank/ntile/frames are deterministic (SURVEY §2.0
  * rule 7). Running/moving sums accumulate DECIMAL, not double — a
  * windowed double sum is evaluation-order-dependent (DuckDB uses
  * segment trees, Spark a running accumulator) and would not
  * hash-match.
  */
object Windows {

  val queries: Map[String, QFn] = Map(
    "win_rank_topn_pergroup" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // rank / dense_rank / ntile over (quantity DESC, orderkey,
    // linenumber) per returnflag. r5: the low-cardinality caveat this
    // query carried since round 1 is RETIRED — the leading sort key
    // (l_quantity, ~50 integer values) IS the bucket: ties share a
    // quantity, so they can never span buckets, which makes every
    // rank flavor composable: rnk = within-(flag, qty) rank + the
    // per-flag cumulative ROW count of higher-qty buckets; drnk =
    // within-bucket dense_rank + cumulative DISTINCT-tuple count;
    // quartile = ntile's integer arithmetic over the composed
    // row_number. The boundary windows see ≤ |distinct qty| rows per
    // flag; no window partitions on the 3-value flag alone. Rows
    // identical to the native functions (Round5Spec pins it).
    "win_rank_variants" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
      val perB = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("bc"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("dc"))
      val wPrev = Window.partitionBy(col("l_returnflag"))
        .orderBy(desc("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = perB
        .withColumn("boff", coalesce(sum(col("bc")).over(wPrev), lit(0L)))
        .withColumn("doff", coalesce(sum(col("dc")).over(wPrev), lit(0L)))
        .select(col("l_returnflag"), col("l_quantity"), col("boff"),
          col("doff"))
      val ns = perB.groupBy(col("l_returnflag")).agg(sum(col("bc")).as("n"))
      val wIn = Window.partitionBy(col("l_returnflag"), col("l_quantity"))
        .orderBy(asc("l_orderkey"), asc("l_linenumber"))
      li.join(broadcast(offs), Seq("l_returnflag", "l_quantity"))
        .join(broadcast(ns), Seq("l_returnflag"))
        .withColumn("rnk", (rank().over(wIn).cast("long") + col("boff"))
          .cast("int"))
        .withColumn("drnk", (dense_rank().over(wIn).cast("long") + col("doff"))
          .cast("int"))
        .withColumn("i", row_number().over(wIn).cast("long") + col("boff"))
        .withColumn("quartile", expr(
          """CAST(IF(i <= (n % 4) * (n DIV 4 + 1),
            |  (i - 1) DIV (n DIV 4 + 1),
            |  n % 4 + (i - (n % 4) * (n DIV 4 + 1) - 1)
            |    DIV greatest(n DIV 4, CAST(1 AS BIGINT))) + 1
            |  AS INT)""".stripMargin))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("rnk"), col("drnk"), col("quartile"))
        // rows fully tied in the window order (the synthetic data has
        // duplicate (l_orderkey, l_linenumber) keys) may receive either
        // quartile at an ntile boundary — including quartile in the
        // output ordering makes the tied (identical) rows' order total
        .orderBy(col("l_returnflag"), col("rnk"), col("l_orderkey"),
          col("l_linenumber"), col("quartile"))
    }),

    "win_lag_lead_delta" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"),
          r4(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_price"),
          ntz(lead(col("o_orderdate"), 1).over(w)).as("next_orderdate"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"),
          r4(sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
            .cast(DoubleType)).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // running DISTINCT-user count per series — growth dashboards'
    // "cumulative uniques" curve. A naive count(DISTINCT) window is
    // unbounded state; the scalable identity: a user is NEW exactly
    // once (at their min-ts day), so cumulative uniques = running sum
    // of per-day first-appearance counts. Two hash aggregates reduce
    // the stream to (series, day) rows; the running-sum window runs
    // over that BOUNDED daily aggregate, never raw events.
    "win_running_distinct" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
        .select(col("event_type"), date_trunc("day", col("first_ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("event_type"), ntz(col("day")).as("day"),
          col("new_users"), sum(col("new_users")).over(w).as("cum_users"))
        .orderBy(col("event_type"), col("day"))
    }),

    // 7-day moving average over the dense daily series (days are dense
    // in the events table, so a ROWS frame == the RANGE semantics)
    // per-event session IDs — the windowed sessionization spelling
    // (ts_session_window aggregates per session; this assigns each
    // EVENT its session number, the granularity downstream
    // attribution and funnel joins need): a session break is a gap
    // > 30 min from the previous event, and the session id is 1 +
    // the running count of breaks. Two window passes over the same
    // high-cardinality (user_id) partitioning — Catalyst plans them
    // in ONE WindowExec sort.
    "win_sessionize_ids" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("brk",
          when(col("ts").cast("long") - lag(col("ts"), 1).over(ord).cast("long")
            > 1800L, 1L).otherwise(0L))
        .select(col("event_id"), col("user_id"),
          (lit(1L) + sum(col("brk")).over(cum)).as("session_id"))
        .orderBy(col("event_id"))
    }),

    // a TRUE range frame on event time: per user, the rolling sum and
    // count of everything in [t − 1 h, t] at each event — the
    // rate-limit/fraud-velocity primitive a rows-frame cannot express
    // (rows count events, range counts TIME; bursts make them
    // disagree). Ordering key = epoch SECONDS (floor — Spark's
    // timestamp→long cast and DuckDB's epoch_us // 1e6 truncate
    // identically), so equal-second ties enter the frame together in
    // both engines. Partitioned by user_id — high-cardinality. Sum is
    // decimal-exact inside the frame.
    "win_time_range_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          col("ts").cast("long").as("sec"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          r4(sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast(DoubleType)).as("sum_1h"))
        .orderBy(col("event_id"))
    }),

    "win_moving_avg_range" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("day_sum"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily
        .select(col("event_type"), ntz(col("day")).as("day"),
          r4(sum(col("day_sum")).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("ma7"))
        .orderBy(col("event_type"), col("day"))
    }),

    // distribution-position functions: percent_rank / cume_dist /
    // decile over a TOTAL window order ((price, orderkey) is unique, so
    // ranks — and therefore the quotients — are engine-independent).
    // r5: the low-cardinality caveat is RETIRED — under the UNIQUE
    // order, percent_rank = (i−1)/(n−1), cume_dist = i/n and the
    // decile is ntile's integer arithmetic, all pure functions of the
    // bucket-composed rank i (win_ntile_deciles' machinery); no
    // window partitions on the 5-value priority alone. Rows identical
    // to the native functions (Round5Spec pins it), oracle unchanged.
    "win_percent_dist" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("cents"))
      val bounds = o.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      val bk = o.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          "CAST((cents - lo) DIV greatest(CAST(1 AS BIGINT), " +
            "(hi - lo + 127) DIV 128) AS INT)"))
        .drop("lo", "hi")
      val perB = bk.groupBy(col("o_orderpriority"), col("bk"))
        .agg(count(lit(1)).as("bc"))
      val wPrev = Window.partitionBy(col("o_orderpriority")).orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = perB
        .withColumn("boff", coalesce(sum(col("bc")).over(wPrev), lit(0L)))
        .select(col("o_orderpriority"), col("bk"), col("boff"))
      val ns = perB.groupBy(col("o_orderpriority")).agg(sum(col("bc")).as("n"))
      val wIn = Window.partitionBy(col("o_orderpriority"), col("bk"))
        .orderBy(col("cents"), col("o_orderkey"))
      bk.join(broadcast(offs), Seq("o_orderpriority", "bk"))
        .join(broadcast(ns), Seq("o_orderpriority"))
        .withColumn("i", row_number().over(wIn).cast("long") + col("boff"))
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          // n = 1 degenerate: percent_rank is 0 by definition
          r4(when(col("n") === 1L, lit(0.0)).otherwise(
            (col("i") - 1).cast(DoubleType) / (col("n") - 1).cast(DoubleType)))
            .as("pct_rank"),
          r4(col("i").cast(DoubleType) / col("n").cast(DoubleType))
            .as("cum_dist"),
          expr(
            """CAST(IF(i <= (n % 10) * (n DIV 10 + 1),
              |  (i - 1) DIV (n DIV 10 + 1),
              |  n % 10 + (i - (n % 10) * (n DIV 10 + 1) - 1)
              |    DIV greatest(n DIV 10, CAST(1 AS BIGINT))) + 1
              |  AS INT)""".stripMargin).as("decile"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // frame-navigation functions: first/last/nth value over an
    // explicit full-partition frame (the default frame stops at
    // CURRENT ROW, where last_value is just the current row — the
    // classic window-frame trap, made explicit here)
    "win_first_last_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // longest same-type streak per user — the gaps-and-islands
    // pattern: island id = rn(user) − rn(user, type) is constant
    // exactly within a run of consecutive equal types. Event order is
    // the total (ts, event_id), so ties cannot reshape islands; the
    // per-user argmax breaks length ties toward the first run IN EVENT
    // ORDER — keyed by the run's (min ts, min event_id), NOT by
    // event_id alone, whose numbering need not follow time. Runs of
    // one user occupy disjoint consecutive spans, so min-ts ordering
    // is exactly first-in-event-order; min event_id (globally unique)
    // settles equal-boundary-timestamp runs. Two window passes + two
    // hash aggregates, all partitioned by user — one shuffle.
    "win_conditional_streak" -> ((s, d) => {
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wTyp = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val islands = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("grp",
          row_number().over(wAll) - row_number().over(wTyp))
      val runs = islands.groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("ts")).as("first_ts"),
          min(col("event_id")).as("first_ev"))
      val wBest = Window.partitionBy(col("user_id"))
        .orderBy(desc("len"), col("first_ts"), col("first_ev"))
      runs.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("streak_type"),
          col("len").as("streak_len"))
        .orderBy(col("user_id"))
    }),

    // period-over-period change per series — the dashboard primitive:
    // hourly event-type sums with absolute and percentage deltas vs
    // the previous hour (first hour → 0 by convention, not null; a
    // ZERO previous hour → 0 too, explicitly — x/0 in Spark is
    // Infinity/NaN and oracle agreement would otherwise hang on the
    // engines' IEEE division conventions instead of the query's own).
    // The hourly sums are decimal-exact, so the deltas divide two
    // identical doubles in every engine.
    "win_pct_change" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      hourly
        .withColumn("prev", lag(col("hsum"), 1).over(w))
        .select(col("event_type"), ntz(col("hour")).as("hour"), col("hsum"),
          r4(coalesce(col("hsum") - col("prev"), lit(0.0))).as("delta"),
          r4(when(col("prev") === 0.0, lit(0.0)).otherwise(
            coalesce((col("hsum") - col("prev")) / col("prev") * 100.0,
              lit(0.0)))).as("pct_change"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // per-supplier share of global revenue. The global total is a
    // BROADCAST SCALAR (one-row decimal sum, cross-joined back), not
    // an empty-partition window (VERDICT r3 fix): `sum over ()`
    // funnels the whole per-supplier aggregate through a single
    // WindowExec task, while the scalar cross join keeps every stage
    // fully parallel — same exact-decimal total, same oracle.
    "win_global_share" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("rev_dec"))
      val total = rev.agg(sum(col("rev_dec")).as("tot"))
      rev.crossJoin(broadcast(total))
        .select(col("l_suppkey"),
          r4(col("rev_dec").cast(DoubleType) /
            col("tot").cast(DoubleType)).as("rev_share"))
        .orderBy(col("l_suppkey"))
    }),

    // decile banding per priority class — the quantile-bucket summary
    // a pricing dashboard shows: ntile(10) over (price, orderkey) —
    // the unique tie-break makes the banding deterministic (§2.0
    // rule 7) — then per-(priority, decile) count/min/max/exact-sum.
    // r5: the low-cardinality caveat is RETIRED — the per-priority
    // rank composes from price-range buckets (the mixture_schedule
    // discipline: within-(priority, bucket) row_number + ≤128-row
    // boundary offsets), and the decile comes from ntile's own
    // integer arithmetic (base = n DIV 10, the first n % 10 tiles
    // one row larger — Spark's NTile definition, evaluated lazily so
    // the base = 0 branch never divides by zero). No window ever
    // partitions on the 5-value priority alone; rows identical to
    // the native ntile (Round5Spec pins it), oracle unchanged.
    "win_ntile_deciles" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("cents"))
      val bounds = o.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      val bk = o.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          "CAST((cents - lo) DIV greatest(CAST(1 AS BIGINT), " +
            "(hi - lo + 127) DIV 128) AS INT)"))
        .drop("lo", "hi")
      val perB = bk.groupBy(col("o_orderpriority"), col("bk"))
        .agg(count(lit(1)).as("bc"))
      val wPrev = Window.partitionBy(col("o_orderpriority")).orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = perB
        .withColumn("boff", coalesce(sum(col("bc")).over(wPrev), lit(0L)))
        .select(col("o_orderpriority"), col("bk"), col("boff"))
      val ns = perB.groupBy(col("o_orderpriority")).agg(sum(col("bc")).as("n"))
      val wIn = Window.partitionBy(col("o_orderpriority"), col("bk"))
        .orderBy(col("cents"), col("o_orderkey"))
      bk.join(broadcast(offs), Seq("o_orderpriority", "bk"))
        .join(broadcast(ns), Seq("o_orderpriority"))
        .withColumn("i", row_number().over(wIn).cast("long") + col("boff"))
        .withColumn("decile", expr(
          """CAST(IF(i <= (n % 10) * (n DIV 10 + 1),
            |  (i - 1) DIV (n DIV 10 + 1),
            |  n % 10 + (i - (n % 10) * (n DIV 10 + 1) - 1)
            |    DIV greatest(n DIV 10, CAST(1 AS BIGINT))) + 1
            |  AS INT)""".stripMargin))
        .groupBy(col("o_orderpriority"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"),
          r4(dsum(col("o_totalprice"))).as("sum_price"))
        .orderBy(col("o_orderpriority"), col("decile"))
    }),

    // maximum drawdown per series — the risk/SLO primitive: how far
    // below its running peak did the hourly volume fall, and when.
    // Runs over the BOUNDED hourly aggregate (≤ ~720 rows per series
    // at any event volume — the win_pct_change discipline), never raw
    // events; peak and drawdown compare EXACT decimals, so the argmax
    // hour cannot flip on a last-ulp difference. The drawdown row is
    // the FIRST hour attaining the series maximum (ties → earliest).
    "win_drawdown" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("h"))
      val run = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = hourly
        .withColumn("peak", max(col("h")).over(run))
        .withColumn("dd", col("peak") - col("h"))
      val pick = Window.partitionBy(col("event_type"))
        .orderBy(desc("dd"), col("hour"))
      dd.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
        .select(col("event_type"), ntz(col("hour")).as("dd_hour"),
          r4(col("peak").cast(DoubleType)).as("peak"),
          r4(col("h").cast(DoubleType)).as("trough"),
          r4(col("dd").cast(DoubleType)).as("max_drawdown"))
        .orderBy(col("event_type"))
    }),

    // gaps-and-islands over calendar DAYS: per supplier, runs of
    // consecutive shipping days (the win_conditional_streak identity
    // on the date domain — island id = epoch-day − row_number is
    // constant exactly within a consecutive-day run). Everything
    // integer-exact; windows partition by the high-cardinality
    // supplier key over the per-day DISTINCT aggregate (state ∝
    // supplier-days, never lineitems). Longest-island ties break
    // toward the earliest start.
    "win_gaps_islands" -> ((s, d) => {
      val days = Tables.lineitem(s, d)
        .select(col("l_suppkey"), date_trunc("day", col("l_shipdate")).as("day"))
        .distinct()
        // day-truncated epochs are exact multiples of 86400 < 2^53, so
        // the double division is EXACT and the cast cannot truncate off
        .withColumn("dayno", (col("day").cast("long") / 86400L).cast("long"))
      val rn = Window.partitionBy(col("l_suppkey")).orderBy(col("dayno"))
      val islands = days
        .withColumn("grp", col("dayno") - row_number().over(rn))
        .groupBy(col("l_suppkey"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
      val best = Window.partitionBy(col("l_suppkey"))
        .orderBy(desc("len"), col("start"))
      islands
        .withColumn("n_islands",
          count(lit(1)).over(Window.partitionBy(col("l_suppkey"))))
        .withColumn("active_days",
          sum(col("len")).over(Window.partitionBy(col("l_suppkey"))))
        .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
        .select(col("l_suppkey"), col("active_days"), col("n_islands"),
          col("len").as("longest_run"), ntz(col("start")).as("longest_start"))
        .orderBy(col("l_suppkey"))
    }),

    // record-high census per series: hours whose volume STRICTLY
    // exceeds every earlier hour — the all-time-high tracker
    // (win_drawdown measures how far BELOW the peak the series falls;
    // this counts how often the peak itself moves, and when it last
    // did — a stale last-record date on a growth metric is the
    // plateau signal). The first hour is a record by convention (no
    // prior peak to beat, declared). Exact BIGINT units; one
    // running-max window over the bounded hourly aggregate per
    // series; first/last records via min/max on the filtered rows.
    "win_record_highs" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(18, 4))) * 10000)
          .cast("long").as("hu"))
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val rec = hourly
        .withColumn("pmax", max(col("hu")).over(wPrev))
        .withColumn("isRec", col("pmax").isNull || col("hu") > col("pmax"))
      rec.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          count_if(col("isRec")).as("n_records"),
          ntz(min(when(col("isRec"), col("hour")))).as("first_record"),
          ntz(max(when(col("isRec"), col("hour")))).as("last_record"))
        .select(col("event_type"), col("n_hours"), col("n_records"),
          col("first_record"), col("last_record"),
          r4(col("n_records").cast(DoubleType) / col("n_hours"))
            .as("record_rate"))
        .orderBy(col("event_type"))
    }),

    // rolling EXACT median of the hourly volume per series — the
    // robust trailing smoother next to win_moving_avg_range's mean
    // (one spiked hour drags a 25h mean for a day; the median
    // shrugs). No engine's approximate percentile appears anywhere:
    // the frame holds ≤25 exact 1e-4-unit BIGINTs, the frame array
    // sorts in codegen, and the LOWER median (element ⌈n/2⌉ of the
    // sorted frame, declared) indexes out — both engines pick the
    // identical integer. State ∝ frame × hours, never raw events; the
    // window partitions by the series key over the BOUNDED hourly
    // aggregate — per-partition rows ∝ calendar hours, not data
    // volume (the ts_late_data boundedness argument; the raw-corpus
    // low-cardinality hazard was retired with win_rank_variants r5).
    "win_rolling_median" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(18, 4))) * 10000)
          .cast("long").as("hu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-24, Window.currentRow)
      hourly
        .withColumn("arr", sort_array(collect_list(col("hu")).over(w)))
        .select(col("event_type"), ntz(col("hour")).as("hour"),
          size(col("arr")).as("n_in_frame"),
          r4(expr("element_at(arr, CAST((size(arr) + 1) div 2 AS INT))")
            .cast(DoubleType) / 10000.0).as("rolling_median"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // rolling 24-hour Pearson correlation between the view and click
    // hourly volumes — the lead-indicator monitor ("does engagement
    // still translate?"; ts_crosscorr_lagged scores the WHOLE series
    // per lag, this tracks coupling OVER TIME at lag 0). All six
    // sufficient sums are exact inside the frame (units BIGINT,
    // products DECIMAL(38,0)/HUGEINT — hourly sums can reach 1e16
    // units at the documented scale, squares 1e32, frame sums 1e35:
    // inside both engines' exact range), the close is one IEEE
    // expression, zero-variance frames read 0 by convention. The
    // window is unpartitioned but runs over the JOINED HOURLY
    // aggregate — calendar-bounded, the declared ts_late_data class.
    "win_rolling_corr" -> ((s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      def hourlyOf(t: String, cn: String) = Tables.events(s, d)
        .filter(col("event_type") === t)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(18, 4))) * 10000)
          .cast("long").as(cn))
      val j = hourlyOf("view", "x").join(hourlyOf("click", "y"), Seq("hour"))
      val w = Window.orderBy(col("hour")).rowsBetween(-23, Window.currentRow)
      j.withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x").cast(dec38)).over(w))
        .withColumn("sy", sum(col("y").cast(dec38)).over(w))
        .withColumn("sxy",
          sum(col("x").cast(dec38) * col("y").cast(dec38)).over(w))
        .withColumn("sxx",
          sum(col("x").cast(dec38) * col("x").cast(dec38)).over(w))
        .withColumn("syy",
          sum(col("y").cast(dec38) * col("y").cast(dec38)).over(w))
        .withColumn("num",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType))
        .withColumn("vx",
          (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
        .withColumn("vy",
          (col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType))
        .select(ntz(col("hour")).as("hour"), col("n").as("n_in_frame"),
          r4(when(col("vx") <= 0.0 || col("vy") <= 0.0, lit(0.0))
            .otherwise(col("num") / (sqrt(col("vx")) * sqrt(col("vy")))))
            .as("corr"))
        .orderBy(col("hour"))
    }),

    // Bollinger-band breach census per series: trailing 24-hour mean
    // ± 2σ, count of STRICT breaches each side — the volatility-
    // normalized "unusually high/low hour" monitor (the windowed
    // sibling of ts_anomaly_zscore's whole-series bands; the EWMA
    // band weights recent hours, this weights the frame uniformly).
    // Sufficient sums exact in the frame (units BIGINT, squares
    // DECIMAL(38,0)); mean/σ close in identical IEEE expressions;
    // breaches compare strict on those identical doubles (declared);
    // warmup frames (n < 24) included by declared semantics. Windows
    // partition by the series key over the bounded hourly aggregate.
    "win_bollinger_breach" -> ((s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(18, 4))) * 10000)
          .cast("long").as("hu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-24, -1)
      hourly
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("hu").cast(dec38)).over(w))
        .withColumn("sxx",
          sum(col("hu").cast(dec38) * col("hu").cast(dec38)).over(w))
        .filter(col("n") >= 2)
        .withColumn("m", col("sx").cast(DoubleType) / col("n"))
        .withColumn("sg", sqrt(
          (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType) /
            (col("n").cast(DoubleType) * col("n"))))
        .withColumn("up",
          col("hu").cast(DoubleType) > col("m") + lit(2.0) * col("sg"))
        .withColumn("dn",
          col("hu").cast(DoubleType) < col("m") - lit(2.0) * col("sg"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          count_if(col("up")).as("n_upper_breach"),
          count_if(col("dn")).as("n_lower_breach"))
        .select(col("event_type"), col("n_hours"), col("n_upper_breach"),
          col("n_lower_breach"),
          r4((col("n_upper_breach") + col("n_lower_breach"))
            .cast(DoubleType) / col("n_hours")).as("breach_rate"))
        .orderBy(col("event_type"))
    }))

  val oracle: Map[String, String] = Map(
    "win_sessionize_ids" ->
      """WITH brk AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_us(ts) // 1000000
        |        - epoch_us(lag(ts) OVER w) // 1000000 > 1800
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |  CAST(1 + sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |FROM brk ORDER BY event_id""".stripMargin,

    "win_time_range_sum" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 4)
        |    AS sum_1h
        |FROM (SELECT event_id, user_id, value,
        |        epoch_us(ts) // 1000000 AS sec FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "win_rank_topn_pergroup" ->
      """SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_rank_variants" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber, quartile""".stripMargin,

    "win_lag_lead_delta" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER w, 4) AS delta_price,
        |  lead(o_orderdate, 1) OVER w AS next_orderdate
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE), 4) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "win_running_distinct" ->
      """WITH f AS (
        |  SELECT event_type, user_id, min(ts) AS first_ts
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT event_type, date_trunc('day', first_ts) AS day,
        |    count(*) AS new_users
        |  FROM f GROUP BY 1, 2)
        |SELECT event_type, day, new_users,
        |  CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM daily ORDER BY event_type, day""".stripMargin,

    "win_moving_avg_range" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS day_sum
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day,
        |  round(CAST(SUM(day_sum) OVER w AS DOUBLE) / COUNT(*) OVER w, 4) AS ma7
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    "win_percent_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cum_dist,
        |  CAST(ntile(10) OVER w AS INT) AS decile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "win_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_global_share" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev_dec
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey,
        |  round(CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE), 4) AS rev_share
        |FROM rev ORDER BY l_suppkey""".stripMargin,

    "win_pct_change" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS hsum
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hour, hsum,
        |  round(coalesce(hsum - lag(hsum) OVER w, 0.0), 4) AS delta,
        |  round(CASE WHEN lag(hsum) OVER w = 0.0 THEN 0.0
        |    ELSE coalesce((hsum - lag(hsum) OVER w) / lag(hsum) OVER w * 100.0,
        |      0.0) END, 4) AS pct_change
        |FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour)
        |ORDER BY event_type, hour""".stripMargin,

    "win_conditional_streak" ->
      """WITH islands AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS grp
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type, grp, count(*) AS len,
        |    min(ts) AS first_ts, min(event_id) AS first_ev
        |  FROM islands GROUP BY 1, 2, 3)
        |SELECT user_id, event_type AS streak_type, len AS streak_len FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, first_ts, first_ev) AS rn FROM runs) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "win_drawdown" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS h
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, hour, h,
        |    max(h) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM hourly)
        |SELECT event_type, hour AS dd_hour,
        |  round(CAST(peak AS DOUBLE), 4) AS peak,
        |  round(CAST(h AS DOUBLE), 4) AS trough,
        |  round(CAST(peak - h AS DOUBLE), 4) AS max_drawdown
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY peak - h DESC, hour) AS rn FROM dd) t
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "win_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT l_suppkey, date_trunc('day', l_shipdate) AS day
        |  FROM lineitem),
        |numbered AS (
        |  SELECT l_suppkey, day,
        |    epoch_us(day) // 1000000 // 86400 AS dayno,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY day) AS rn
        |  FROM days),
        |islands AS (
        |  SELECT l_suppkey, dayno - rn AS grp, count(*) AS len,
        |    min(day) AS start
        |  FROM numbered GROUP BY 1, 2),
        |tot AS (
        |  SELECT l_suppkey, grp, len, start,
        |    count(*) OVER (PARTITION BY l_suppkey) AS n_islands,
        |    CAST(sum(len) OVER (PARTITION BY l_suppkey) AS BIGINT)
        |      AS active_days,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY len DESC, start) AS rn
        |  FROM islands)
        |SELECT l_suppkey, active_days, n_islands, len AS longest_run,
        |  start AS longest_start
        |FROM tot WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,

    "win_ntile_deciles" ->
      """SELECT o_orderpriority, CAST(decile AS INT) AS decile,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS sum_price
        |FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders) t
        |GROUP BY 1, 2 ORDER BY o_orderpriority, decile""".stripMargin,

    "win_rolling_corr" ->
      """WITH hv AS (
        |  SELECT date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS x
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |hc AS (
        |  SELECT date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |j AS (SELECT hour, x, y FROM hv JOIN hc USING (hour)),
        |w AS (
        |  SELECT hour, count(*) OVER fr AS n,
        |    SUM(CAST(x AS HUGEINT)) OVER fr AS sx,
        |    SUM(CAST(y AS HUGEINT)) OVER fr AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) OVER fr AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) OVER fr AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) OVER fr AS syy
        |  FROM j WINDOW fr AS (ORDER BY hour
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT hour, n, CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS vy
        |  FROM w)
        |SELECT hour, CAST(n AS BIGINT) AS n_in_frame,
        |  round(CASE WHEN vx <= 0.0 OR vy <= 0.0 THEN 0.0
        |    ELSE num / (sqrt(vx) * sqrt(vy)) END, 4) AS corr
        |FROM c ORDER BY hour""".stripMargin,

    "win_record_highs" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |rec AS (
        |  SELECT event_type, hour, hu,
        |    max(hu) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM hourly),
        |f AS (
        |  SELECT event_type, hour,
        |    (pmax IS NULL OR hu > pmax) AS isrec
        |  FROM rec)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(SUM(CASE WHEN isrec THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_records,
        |  min(CASE WHEN isrec THEN hour END) AS first_record,
        |  max(CASE WHEN isrec THEN hour END) AS last_record,
        |  round(CAST(SUM(CASE WHEN isrec THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS record_rate
        |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin,

    "win_bollinger_breach" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |fr AS (
        |  SELECT event_type, hu,
        |    count(*) OVER w AS n,
        |    SUM(CAST(hu AS HUGEINT)) OVER w AS sx,
        |    SUM(CAST(hu AS HUGEINT) * hu) OVER w AS sxx
        |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |bands AS (
        |  SELECT event_type, hu, n,
        |    CAST(sx AS DOUBLE) / n AS m,
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n)) AS sg
        |  FROM fr WHERE n >= 2),
        |fl AS (
        |  SELECT event_type,
        |    CAST(hu AS DOUBLE) > m + 2.0 * sg AS up,
        |    CAST(hu AS DOUBLE) < m - 2.0 * sg AS dn
        |  FROM bands)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_upper_breach,
        |  CAST(SUM(CASE WHEN dn THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lower_breach,
        |  round(CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END)
        |    + SUM(CASE WHEN dn THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS breach_rate
        |FROM fl GROUP BY 1 ORDER BY event_type""".stripMargin,

    "win_rolling_median" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |fr AS (
        |  SELECT event_type, hour,
        |    list_sort(list(hu) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM hourly)
        |SELECT event_type, hour, CAST(len(arr) AS INT) AS n_in_frame,
        |  round(CAST(arr[(len(arr) + 1) // 2] AS DOUBLE) / 10000.0, 4)
        |    AS rolling_median
        |FROM fr ORDER BY event_type, hour""".stripMargin)
}

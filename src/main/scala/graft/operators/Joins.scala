package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.3 — joins.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - Dimension joins (`join_broadcast`, the star) broadcast the small
  *    side explicitly — no shuffle of the fact table.
  *  - Large⋈large equi-joins shuffle both sides on the key once;
  *    AQE handles skew-splitting at runtime.
  *  - Every non-equi join here carries an equi-blocking key
  *    (brand / user_id) so Spark plans a hash/merge join with a
  *    residual range filter instead of a cartesian BNLJ — the
  *    difference between O(n²/buckets) and O(n²).
  *  - The as-of join is the union+window composition: one shuffle on
  *    the entity key, linear scan per partition — the standard
  *    Spark-native as-of shape (no native operator exists).
  */
object Joins {

  val queries: Map[String, QFn] = Map(
    "join_inner_hash" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), r4(dsum(col("o_totalprice"))).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    "join_broadcast" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // TPC-H Q5 shape: fact ⋈ three dims; dims broadcast, single
    // shuffle for the final aggregation. nation/region carry NO manual
    // hint (VERDICT r9 #7): their broadcast decision comes from
    // Spark's own leaf-relation size statistics (parquet file bytes vs
    // spark.sql.autoBroadcastJoinThreshold) — the stats-informed
    // planning path a catalog-managed warehouse runs, pinned in
    // PlanAuditSpec ("nation/region broadcast from statistics"). The
    // customer hint stays deliberately: a dimension that could
    // plausibly outgrow the threshold at some SF is the case where an
    // operator pins intent rather than trusting an estimate.
    "join_multiway_star" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("n_name"))
    }),

    "join_left_outer" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    "join_semi" -> ((s, d) => {
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // the reference's motivating anti-join: citations pointing outside
    // the corpus (SURVEY §0.5) — here: customers with no orders
    "join_anti" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // banded self-join: equi-key p_brand blocks the O(n²); the range
    // predicate is a residual filter on the hash join
    "join_theta_range" -> ((s, d) => {
      val p = Tables.part(s, d)
      val a = p.select(col("p_brand").as("brand"), col("p_partkey").as("k1"),
        col("p_retailprice").as("pr1"))
      val b = p.select(col("p_brand").as("brand"), col("p_partkey").as("k2"),
        col("p_retailprice").as("pr2"))
      a.join(b, Seq("brand"))
        .filter(col("pr1") < col("pr2") && col("pr2") - col("pr1") <= 5.0)
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("brand"))
    }),

    // null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    // MATCH each other — the semantics a plain equi-join silently
    // drops (its NULL = NULL is unknown → row lost), hit by any join
    // on a nullable business key. Synthesized nullable keys (the
    // corpus has no physical NULLs — the scalar_null_semantics
    // convention): nation 3 nulled on both sides. Both sides are
    // PRE-AGGREGATED to one row per key before the join, so the
    // NULL-key group joins as one row × one row — never the NULL×NULL
    // row explosion a raw null-safe join invites at scale (the skew
    // bomb: every null row on both sides lands in one task).
    // Plan-wise Spark keeps `<=>` a HASH-joinable equi-key.
    "join_null_safe_eq" -> ((s, d) => {
      val cg = Tables.customer(s, d)
        .groupBy(expr("nullif(c_nationkey, 3)").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      val sg = Tables.supplier(s, d)
        .groupBy(expr("nullif(s_nationkey, 3)").as("k"))
        .agg(count(lit(1)).as("n_supp"))
      cg.join(sg, cg("k") <=> sg("k"))
        .select(cg("k"), col("n_cust"), col("n_supp"))
        .orderBy(asc_nulls_first("k"))
    }),

    // as-of (backward) join: each event gets the latest order of the
    // same entity at-or-before its timestamp. Spark has no native
    // as-of operator → union both sides tagged, one window pass:
    // last(price, ignoreNulls) over (entity ORDER BY t, tag).
    // Right side pre-aggregated to unique (entity, t) so ties cannot
    // make the match ambiguous. Oracle: DuckDB native ASOF JOIN.
    "join_asof" -> ((s, d) => {
      val rt = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("price"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
          lit(null).cast("long").as("event_id"), lit(0).as("is_ev"), col("price"))
      val ev = Tables.events(s, d)
        .select(col("user_id").as("k"), col("ts").as("t"),
          col("event_id"), lit(1).as("is_ev"), lit(null).cast("double").as("price"))
      val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_ev"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rt.unionByName(ev)
        .withColumn("asof_price", last(col("price"), ignoreNulls = true).over(w))
        .filter(col("is_ev") === 1)
        .select(col("event_id"), col("k").as("user_id"), ntz(col("t")).as("ts"),
          col("asof_price"))
        .orderBy(col("event_id"))
    }),

    // the SAME backward as-of semantics, executed by the NATIVE
    // merge-join operator (plans.AsofJoinExec — custom LogicalPlan +
    // Strategy + SparkPlan via SparkSessionExtensions) instead of the
    // union-window composition above: co-partition both sides on the
    // key, local sorts, one forward merge holding a single candidate
    // row of state — no union, no window over the merged stream.
    // Explicit equal-width repartitions on both sides pin the
    // zipPartitions widths under AQE. Oracle: identical to join_asof
    // (same declared semantics, different execution) — the driver
    // hash-check proves operator equivalence end-to-end.
    "join_asof_native" -> ((s, d) => {
      val parts = s.sparkContext.defaultParallelism
      val rt = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("price"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
          col("price"))
        .repartition(parts, col("k"))
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .repartition(parts, col("user_id"))
      graft.plans.AsofJoin(ev, rt, ev("user_id"), rt("k"), ev("ts"), rt("t"))
        .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
          col("price").as("asof_price"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of variant: each view event matched to the same
    // user's NEXT purchase at-or-after its timestamp — time-to-
    // conversion, the question ts_funnel_conversion's bounded 1-hour
    // window cannot answer. Same union-tag-window shape as the
    // backward join, mirrored: at a timestamp tie the purchase sorts
    // AFTER the view (is_ev DESC) so the frame starting at the
    // current row still sees it — "at-or-after" inclusive. Purchases
    // pre-distincted per (user, ts) so ties cannot make the match
    // ambiguous. The gap is exact integer microseconds (a seconds
    // cast would truncate sub-second components engine-differently).
    // Oracle: DuckDB native forward ASOF (ts <= t).
    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("k"), col("ts").as("t")).distinct()
        .select(col("k"), col("t"),
          lit(null).cast("long").as("event_id"), lit(0).as("is_ev"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("k"), col("ts").as("t"),
          col("event_id"), lit(1).as("is_ev"))
      val w = Window.partitionBy(col("k")).orderBy(col("t"), desc("is_ev"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      pur.unionByName(views)
        .withColumn("pt", when(col("is_ev") === 0, col("t")))
        .withColumn("next_t", first(col("pt"), ignoreNulls = true).over(w))
        .filter(col("is_ev") === 1)
        .select(col("event_id"), col("k").as("user_id"), ntz(col("t")).as("ts"),
          ntz(col("next_t")).as("next_purchase_ts"),
          (unix_micros(col("next_t")) - unix_micros(col("t"))).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // NEAREST-neighbor as-of variant: each event matches the same
    // customer's temporally CLOSEST order (either direction), ties on
    // |Δ| broken toward the earlier order, then lower price. Equi-join
    // on the entity key + one window pass picks the argmin — the
    // kdb-style `aj` nearest flavor the backward join above cannot
    // express. Per-entity fan-out = orders per customer (bounded), so
    // the join stays a plain hash join at any scale.
    "join_asof_nearest" -> ((s, d) => {
      val rt = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("price"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"), col("price"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(abs(unix_micros(col("ts")) - unix_micros(col("t"))),
          col("t"), col("price"))
      ev.join(rt, col("user_id") === col("k"), "inner")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
          ntz(col("t")).as("nearest_t"), col("price").as("nearest_price"))
        .orderBy(col("event_id"))
    }),

    // interval containment, blocked by the user_id equi-key: views
    // within ±1h of each purchase by the same user
    "join_interval_overlap" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
      p.join(v, col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy(col("p_id"))
        .agg(count(col("v_id")).as("n_views"))
        .orderBy(col("p_id"))
    }),

    "join_cross_small" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // BUCKETIZED range self-join — the scale path for |Δt| ≤ W
    // proximity joins: bucket both sides by floor(t / W), equi-join on
    // (user, bucket) and (user, bucket+1), and range-filter the
    // residual. A pair within W spans at most one bucket boundary, so
    // two equi-joins cover exactly the inequality-join result while
    // the shuffle stays hash-partitioned — no BNLJ, no per-user
    // cartesian beyond adjacent buckets. Semantics: unordered event
    // pairs of the same user within 120 s, counted per user.
    "join_range_bucketed" -> ((s, d) => {
      val W = 120000000L // 120 s in µs
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("bk", expr(s"us div $W"))
      val x = ev.select(col("user_id"), col("event_id").as("x_id"),
        col("us").as("x_us"), col("bk").as("x_bk"))
      val y = ev.select(col("user_id"), col("event_id").as("y_id"),
        col("us").as("y_us"), col("bk").as("y_bk"))
      // same bucket ⇒ |Δ| < W by construction; id order dedupes the pair
      val same = x.join(y, Seq("user_id"))
        .filter(col("x_bk") === col("y_bk") && col("x_id") < col("y_id"))
      // adjacent buckets: y is strictly later; residual range filter
      val adj = x.join(y, Seq("user_id"))
        .filter(col("x_bk") + 1 === col("y_bk") &&
          col("y_us") - col("x_us") <= W)
      same.select(col("user_id"))
        .unionByName(adj.select(col("user_id")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // the SAME |Δt| ≤ 120 s pair semantics, executed by the NATIVE
    // band-merge operator (plans.RangeJoinExec — the second
    // whole-operator rung, VERDICT r4 #9) instead of the two bucket
    // equi-joins + union above: co-partition on the user key, local
    // (key, time) sorts, one forward merge whose only state is the
    // deque of right rows inside the ±W band. The id-dedup post-filter
    // composes OUTSIDE the operator. Oracle: identical to
    // join_range_bucketed — the driver hash-check proves operator
    // equivalence end-to-end, the AsofJoinExec precedent.
    "join_range_native" -> ((s, d) => {
      val W = 120000000L // 120 s in µs
      val parts = s.sparkContext.defaultParallelism
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val x = ev.select(col("user_id").as("xu"), col("event_id").as("x_id"),
        col("us").as("x_us")).repartition(parts, col("xu"))
      val y = ev.select(col("user_id").as("yu"), col("event_id").as("y_id"),
        col("us").as("y_us")).repartition(parts, col("yu"))
      graft.plans.RangeJoin(x, y, x("xu"), y("yu"), x("x_us"), y("y_us"), -W, W)
        .filter(col("x_id") < col("y_id"))
        .groupBy(col("xu").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // the SAME ±1 h containment-count semantics as
    // join_interval_overlap, via the native band merge: inner band
    // join (purchases × views of the same user within the window) →
    // per-purchase count → left join back so zero-view purchases
    // keep their 0 row. Oracle: identical to join_interval_overlap.
    "join_interval_native" -> ((s, d) => {
      val TolUs = 3600000000L // 1 h in µs
      val parts = s.sparkContext.defaultParallelism
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("pu"),
          unix_micros(col("ts")).as("p_us")).repartition(parts, col("pu"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("vu"),
          unix_micros(col("ts")).as("v_us")).repartition(parts, col("vu"))
      val cnt = graft.plans.RangeJoin(p, v, p("pu"), v("vu"),
          p("p_us"), v("v_us"), -TolUs, TolUs)
        .groupBy(col("p_id")).agg(count(lit(1)).as("n"))
      p.select(col("p_id"))
        .join(cnt, Seq("p_id"), "left")
        .select(col("p_id"), coalesce(col("n"), lit(0L)).as("n_views"))
        .orderBy(col("p_id"))
    }),

    // the native backward as-of join REACHED FROM SQL (r7, rolled
    // VERDICT item: the custom operators must be available to a SQL
    // user, not only the DataFrame DSL): /*+ ASOF_JOIN */ on a LEFT
    // join whose ON is `key = key AND rightTime <= leftTime` rewrites
    // to plans.AsofJoinNode at analysis time
    // (plans.NativeJoinHints via GraftExtensions) and plans as the
    // same AsofJoinExec merge the DSL twin uses — SqlFrontendSpec
    // pins both the plan shape and row parity vs join_asof_native.
    // The REPARTITION hints pin equal explicit widths on both sides
    // (the DSL's repartition(parts, key) zipPartitions discipline,
    // expressed in SQL). Same declared semantics as join_asof →
    // same oracle family.
    "sql_asof_join_native" -> ((s, d) => {
      val parts = s.sparkContext.defaultParallelism
      graft.SqlFrontend.sql(s, d,
        s"""SELECT /*+ ASOF_JOIN */ e.event_id, e.user_id,
           |  unix_micros(e.ts) AS ts_us, rt.price AS asof_price
           |FROM (SELECT /*+ REPARTITION($parts, user_id) */
           |        event_id, user_id, ts FROM events) e
           |LEFT JOIN (SELECT /*+ REPARTITION($parts, k) */
           |             o_custkey AS k, o_orderdate AS t,
           |             max(o_totalprice) AS price
           |           FROM orders GROUP BY o_custkey, o_orderdate) rt
           |  ON e.user_id = rt.k AND rt.t <= e.ts
           |ORDER BY e.event_id""".stripMargin)
    }),

    // the native band join REACHED FROM SQL — /*+ RANGE_JOIN */ on an
    // INNER join with `key = key AND rightTime BETWEEN leftTime+lo AND
    // leftTime+hi` rewrites to plans.RangeJoinNode → RangeJoinExec.
    // Same ±120 s same-user pair-count semantics as join_range_native
    // (whose oracle it carries verbatim).
    "sql_range_join_native" -> ((s, d) => {
      val parts = s.sparkContext.defaultParallelism
      graft.SqlFrontend.sql(s, d,
        s"""SELECT /*+ RANGE_JOIN */ x.xu AS user_id,
           |  count(*) AS n_pairs
           |FROM (SELECT /*+ REPARTITION($parts, xu) */ user_id AS xu,
           |        event_id AS x_id, unix_micros(ts) AS x_us
           |      FROM events) x
           |JOIN (SELECT /*+ REPARTITION($parts, yu) */ user_id AS yu,
           |        event_id AS y_id, unix_micros(ts) AS y_us
           |      FROM events) y
           |  ON x.xu = y.yu
           | AND y.y_us BETWEEN x.x_us - 120000000 AND x.x_us + 120000000
           |WHERE x.x_id < y.y_id
           |GROUP BY x.xu
           |ORDER BY user_id""".stripMargin)
    }),

    // as-of join WITH TOLERANCE — last-touch attribution with expiry:
    // each view event matches the same user's latest purchase at or
    // before it, but only if that purchase is ≤ 1 hour old; older
    // matches expire to -1 (kdb's `aj` tolerance flavor; the backward
    // join above never expires). Same union+window composition: one
    // shuffle on the user key, the matched purchase's OWN timestamp
    // carried through the window so staleness is computable per row.
    // Sentinels (-1) instead of nullable outputs keep the result frame
    // free of null timestamps.
    "join_asof_tolerance" -> ((s, d) => {
      val TolUs = 3600000000L // 1 h
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("pid"))
        .select(col("user_id").as("k"), col("ts").as("t"),
          lit(null).cast("long").as("event_id"), lit(0).as("is_v"),
          col("pid"), col("ts").as("pt"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("k"), col("ts").as("t"),
          col("event_id"), lit(1).as("is_v"),
          lit(null).cast("long").as("pid"),
          lit(null).cast("timestamp").as("pt"))
      val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val age = unix_micros(col("t")) - unix_micros(col("last_pt"))
      p.unionByName(v)
        .withColumn("last_pid", last(col("pid"), ignoreNulls = true).over(w))
        .withColumn("last_pt", last(col("pt"), ignoreNulls = true).over(w))
        .filter(col("is_v") === 1)
        .select(col("event_id"), col("k").as("user_id"), ntz(col("t")).as("ts"),
          when(col("last_pt").isNotNull && age <= TolUs, col("last_pid"))
            .otherwise(lit(-1L)).as("attr_id"),
          when(col("last_pt").isNotNull && age <= TolUs,
            expr("(unix_micros(t) - unix_micros(last_pt)) div 1000000"))
            .otherwise(lit(-1L)).as("age_s"))
        .orderBy(col("event_id"))
    }),

    // FULL OUTER join of two independently-aggregated activity views:
    // per-customer order counts vs per-user event counts. The key
    // spaces overlap but neither contains the other, so both unmatched
    // sides of the full outer result are exercised. Large⋈large shape:
    // each side partial-aggregates before one shuffle on the key; no
    // broadcast (a full outer can't broadcast anyway — both sides must
    // see every key). Counts are coalesced to 0 so the output carries
    // no nullable measure columns.
    "join_full_outer" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val e = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      o.join(e, col("o_custkey") === col("user_id"), "full_outer")
        .select(coalesce(col("o_custkey"), col("user_id")).as("k"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy(col("k"))
    }),

    // correlated LATERAL top-N: each probe customer pulls its own
    // top-2 orders by price — the "N best per entity" join written
    // the way a SQL user writes it (Catalyst plans the correlated
    // LIMIT as a per-key rank under a LateralJoin; the DataFrame
    // twin is win_rank_topn_pergroup, and this entry pins that the
    // SQL-frontend spelling works end-to-end). Probe set bounded
    // (c_custkey ≤ 20); ties broken by o_orderkey; the final order
    // uses the ROUNDED price alias on both engines.
    "join_lateral_topk" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("jlt_customer")
      Tables.orders(s, d).createOrReplaceTempView("jlt_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 4) AS price
        FROM jlt_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM jlt_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey <= 20
        ORDER BY c.c_custkey, price DESC, t.o_orderkey""")
    }),

    // skew-mitigation pattern: the fact side carries a deterministic
    // salt (derived from data, not rand() — SURVEY §2.0 rule 6), the
    // dim side is replicated across all salts, and the join key
    // becomes (key, salt) — a hot key's rows now spread over N
    // partitions instead of one straggler. Result ≡ the unsalted
    // join, which is exactly what the oracle checks.
    "join_skew_salted" -> ((s, d) => {
      val nSalts = 8
      // salt from a hash spanning the full 0..N-1 range (l_linenumber
      // alone is 1..7 in TPC-H — salt 0 would never occur and 1/N of
      // the replicated dim side would be dead weight)
      val li = Tables.lineitem(s, d)
        .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(nSalts)))
      val o = Tables.orders(s, d)
        .withColumn("salt", explode(array((0 until nSalts).map(lit(_)): _*)))
      li.join(o, li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // explicit Bloom-filter semi-join pre-filtering (r4): lineitems of
    // high-value orders (o_totalprice > BloomPriceMin, ~5% of orders).
    // The qualifying order keys build ONE bloom binary
    // (functions.BloomPrefilter — Spark's own BloomFilterAggregate /
    // BloomFilterMightContain Catalyst expressions); the probe side
    // drops ~95% of lineitem BEFORE the join shuffle via the foldable
    // might_contain literal; the trailing exact LeftSemi join removes
    // the false positives, so the result is byte-identical to the
    // plain semi join the oracle runs. The driver-side head() is one
    // 128 KiB sketch — the same materialization Spark's
    // InjectRuntimeFilter performs, made deterministic and testable.
    "join_bloom_prefilter" -> ((s, d) => {
      val hi = Tables.orders(s, d)
        .filter(col("o_totalprice") > BloomPriceMin)
        .select(col("o_orderkey"))
      val bloom = graft.functions.BloomPrefilter.bloomOf(
        hi, col("o_orderkey"), BloomEstItems, BloomNumBits)
      Tables.lineitem(s, d)
        .filter(graft.functions.BloomPrefilter.mightContain(bloom, col("l_orderkey")))
        .join(hi.withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }))

  /** join_bloom_prefilter sizing — shared with the oracle threshold.
    * Price min keeps ~5% of orders (p95 ≈ 475k at every SF); 100k
    * estimated items covers sf0.1's ~7.5k qualifying keys with a
    * comfortable margin; 2^20 bits = 128 KiB sketch. */
  val BloomPriceMin = 475000.0
  val BloomEstItems = 100000L
  val BloomNumBits  = 1048576L

  val oracle: Map[String, String] = Map(
    "join_lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 4) AS price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_custkey <= 20
        |ORDER BY c.c_custkey, price DESC, t.o_orderkey""".stripMargin,

    "join_inner_hash" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
        |  round(${dsumSql("o_totalprice")}, 4) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_broadcast" ->
      s"""SELECT p_brand, count(*) AS n,
        |  round(${dsumSql("l_extendedprice")}, 4) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_multiway_star" ->
      s"""SELECT n_name,
        |  round(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_theta_range" ->
      """SELECT a.p_brand AS brand, count(*) AS n_pairs
        |FROM part a JOIN part b ON a.p_brand = b.p_brand
        |WHERE a.p_retailprice < b.p_retailprice
        |  AND b.p_retailprice - a.p_retailprice <= 5.0
        |GROUP BY a.p_brand ORDER BY brand""".stripMargin,

    "join_null_safe_eq" ->
      """WITH cg AS (
        |  SELECT nullif(c_nationkey, 3) AS k, count(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |sg AS (
        |  SELECT nullif(s_nationkey, 3) AS k, count(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT cg.k, cg.n_cust, sg.n_supp
        |FROM cg JOIN sg ON cg.k IS NOT DISTINCT FROM sg.k
        |ORDER BY cg.k NULLS FIRST""".stripMargin,

    "join_asof" ->
      """WITH rt AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, max(o_totalprice) AS price
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, rt.price AS asof_price
        |FROM events e ASOF LEFT JOIN rt ON e.user_id = rt.k AND e.ts >= rt.t
        |ORDER BY e.event_id""".stripMargin,

    "join_asof_native" ->
      """WITH rt AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, max(o_totalprice) AS price
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, rt.price AS asof_price
        |FROM events e ASOF LEFT JOIN rt ON e.user_id = rt.k AND e.ts >= rt.t
        |ORDER BY e.event_id""".stripMargin,

    // SQL-authored native asof — join_asof semantics with epoch-µs ts
    "sql_asof_join_native" ->
      """WITH rt AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, max(o_totalprice) AS price
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  rt.price AS asof_price
        |FROM events e ASOF LEFT JOIN rt ON e.user_id = rt.k AND e.ts >= rt.t
        |ORDER BY e.event_id""".stripMargin,

    // SQL-authored native band join — join_range_native's oracle verbatim
    "sql_range_join_native" ->
      """SELECT e1.user_id, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
        | AND abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 120000000
        |GROUP BY 1 ORDER BY e1.user_id""".stripMargin,

    "join_asof_forward" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id AS k, ts AS t FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
        |SELECT v.event_id, v.user_id, v.ts, p.t AS next_purchase_ts,
        |  epoch_us(p.t) - epoch_us(v.ts) AS gap_us
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.k AND v.ts <= p.t
        |ORDER BY v.event_id""".stripMargin,

    "join_asof_nearest" ->
      """WITH rt AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, max(o_totalprice) AS price
        |  FROM orders GROUP BY 1, 2)
        |SELECT event_id, user_id, ts, nearest_t, nearest_price FROM (
        |  SELECT e.event_id, e.user_id, e.ts, rt.t AS nearest_t,
        |    rt.price AS nearest_price,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY abs(epoch_us(e.ts) - epoch_us(rt.t)), rt.t, rt.price) AS rn
        |  FROM events e JOIN rt ON e.user_id = rt.k) x
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "join_interval_overlap" ->
      """SELECT p.event_id AS p_id, count(v.event_id) AS n_views
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = p.user_id
        | AND v.ts >= p.ts - INTERVAL 1 HOUR
        | AND v.ts <= p.ts + INTERVAL 1 HOUR
        |GROUP BY p.event_id ORDER BY p_id""".stripMargin,

    "join_cross_small" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_range_bucketed" ->
      """SELECT e1.user_id, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
        | AND abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 120000000
        |GROUP BY 1 ORDER BY e1.user_id""".stripMargin,

    // native band merge, same declared semantics — identical oracle
    "join_range_native" ->
      """SELECT e1.user_id, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
        | AND abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 120000000
        |GROUP BY 1 ORDER BY e1.user_id""".stripMargin,

    // native band merge, same declared semantics — identical oracle
    "join_interval_native" ->
      """SELECT p.event_id AS p_id, count(v.event_id) AS n_views
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = p.user_id
        | AND v.ts >= p.ts - INTERVAL 1 HOUR
        | AND v.ts <= p.ts + INTERVAL 1 HOUR
        |GROUP BY p.event_id ORDER BY p_id""".stripMargin,

    "join_asof_tolerance" ->
      """WITH p AS (
        |  SELECT user_id AS k, ts AS t, max(event_id) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |v AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'view')
        |SELECT v.event_id, v.user_id, v.ts,
        |  CASE WHEN p.t IS NOT NULL
        |        AND epoch_us(v.ts) - epoch_us(p.t) <= 3600000000
        |       THEN p.pid ELSE -1 END AS attr_id,
        |  CASE WHEN p.t IS NOT NULL
        |        AND epoch_us(v.ts) - epoch_us(p.t) <= 3600000000
        |       THEN (epoch_us(v.ts) - epoch_us(p.t)) // 1000000
        |       ELSE -1 END AS age_s
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.k AND v.ts >= p.t
        |ORDER BY v.event_id""".stripMargin,

    "join_full_outer" ->
      """WITH o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
        |e AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT coalesce(o_custkey, user_id) AS k,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(n_events, 0) AS n_events
        |FROM o FULL JOIN e ON o_custkey = user_id
        |ORDER BY k""".stripMargin,

    "join_skew_salted" ->
      s"""SELECT o_orderpriority, count(*) AS n,
        |  round(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the bloom pre-filter is semantically transparent: the oracle is
    // the plain semi join it accelerates
    "join_bloom_prefilter" ->
      s"""SELECT l_returnflag, count(*) AS n,
        |  round(${dsumSql("l_quantity")}, 4) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 475000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}

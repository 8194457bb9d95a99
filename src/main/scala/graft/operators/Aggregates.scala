package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** §2.4 — aggregations.
  *
  * All hash aggregations: Spark plans partial (map-side) + final
  * aggregation automatically, so the shuffle carries pre-combined
  * state, not raw rows — the property that makes these scale to 100 TB
  * (shuffle volume ∝ #groups, not #rows).
  *
  * Float discipline: money-scale double sums go through
  * `Stable.dsum` (exact DECIMAL(18,4) accumulation → double) so the
  * result is independent of partial-aggregation order and matches
  * DuckDB bit-for-bit. See Stable.scala.
  */
object Aggregates {

  /** fixed bin width for agg_quantile_hist (price units) — shared with
    * the oracle SQL so engine and oracle bin identically */
  val QuantileHistWidth = 100L

  val queries: Map[String, QFn] = Map(
    // FLAGSHIP (TPC-H Q1 shape) — also wired into SparkEntry.entry
    "agg_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r4(dsum(col("l_quantity"))).as("sum_qty"),
          r4(dsum(col("l_extendedprice"))).as("sum_base_price"),
          r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r4(davg(col("l_quantity"))).as("avg_qty"),
          r4(davg(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // PIVOT — wide-form cross-tab: revenue by returnflag × linestatus.
    // The value list is EXPLICIT (Seq("F","O","P")): with it, Spark
    // plans a single pass of conditional aggregates; without it, a
    // separate distinct-values job must run first — at 100 TB the
    // explicit list is the difference between one scan and two.
    "agg_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O", "P"))
        .agg(r4(dsum(col("l_extendedprice"))))
        .orderBy(col("l_returnflag"))
    }),

    // UNPIVOT — long-form melt of per-part metrics into (metric, value)
    // rows: the inverse reshape, one narrow scan, no shuffle at all
    // (the explode is a per-row generator)
    "agg_unpivot" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 1000L)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // conditional + boolean aggregate breadth: count_if / bool_and /
    // bool_or / any predicate rollups per group — same partial-agg
    // shuffle shape as every hash aggregate here
    "agg_boolean_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") > 0).as("all_positive_qty"),
          bool_or(col("l_tax") > 0.07).as("any_high_tax"),
          count_if(col("l_quantity") >= 30).as("n_bulk"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_distinct_count" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
          count(lit(1)).as("n"))
        .orderBy(col("l_suppkey"))
    }),

    // HLL sketches are engine-specific → declared without oracle
    // (driver records a rows-only check); the exact twin above is the
    // correctness anchor.
    "agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_returnflag"), col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("l_quantity"))).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "agg_rollup" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    "agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "agg_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy(col("l_returnflag"))
    }),

    // exact percentile (NOT approx_percentile — sketches never
    // hash-match across engines)
    "agg_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          r4(expr("percentile(l_quantity, 0.5)")).as("p50_qty"),
          r4(expr("percentile(l_quantity, 0.9)")).as("p90_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // MERGEABLE histogram quantiles — the at-scale counterpart to
    // agg_percentile, paired exactly like text_cm_frequent_terms pairs
    // with exact term counting: exact percentile sorts every value per
    // group (state ∝ rows — the thing that breaks at 100 TB), while a
    // fixed-bin histogram carries ≤ QuantileHistBins counting cells of
    // sum-mergeable state per group regardless of row count. Estimate =
    // upper edge of the first bin whose cumulative count reaches q·n
    // (deterministic: pure integer counts until the final multiply).
    // The cumulative window runs over the per-group HISTOGRAM (≤ bins
    // rows/group), not the data — bounded input by construction.
    "agg_quantile_hist" -> ((s, d) => {
      val w = QuantileHistWidth
      // floor-then-cast, not cast-then-divide: Spark's double→bigint
      // cast truncates while DuckDB's ROUNDS — floor() is the one
      // binning both engines agree on (prices are positive)
      val hist = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") / w).cast("bigint").as("bin"))
        .groupBy(col("l_returnflag"), col("bin")).agg(count(lit(1)).as("c"))
      val win = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("l_returnflag"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(win))
        .withColumn("n", sum(col("c")).over(tot))
      def est(q: Double, name: String) =
        min(when(col("cum") * lit(100L) >= col("n") * lit((q * 100).toLong),
          (col("bin") + 1) * w)).as(name)
      cum.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          est(0.50, "p50_est"), est(0.90, "p90_est"), est(0.99, "p99_est"))
        .orderBy(col("l_returnflag"))
    }),

    // arrays hash-compare only if explicitly sorted (SURVEY §2.4) —
    // AND serialized: a raw array<bigint> column is unhashable in the
    // driver's pandas compare (round-1 post-mortem), so the verified
    // output joins the sorted list to a string. The array-typed
    // variant stays covered by RelationalSpec.
    "agg_collect_sorted" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(array_join(sort_array(collect_list(col("l_partkey"))), ",").as("parts"))
        .orderBy(col("l_orderkey"))
    }),

    // bitwise aggregates: OR/AND/XOR-fold of line numbers per order —
    // the bitmap-accumulation shape (per-group bit-set union is how
    // bitmap indexes and feature-flag rollups aggregate). Pure integer
    // partial aggregation, identical in every engine.
    "agg_bitwise" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 5000L)
        .groupBy(col("l_orderkey"))
        .agg(expr("bit_or(l_linenumber)").as("ln_or"),
          expr("bit_and(l_linenumber)").as("ln_and"),
          expr("bit_xor(l_linenumber)").as("ln_xor"),
          count(lit(1)).as("n"))
        .orderBy(col("l_orderkey"))
    }),

    // fixed-width histogram: bin = floor(price / width). Explicit
    // integer binning, NOT histogram_numeric (whose adaptive bin
    // boundaries are engine-specific and unverifiable); floor of an
    // IEEE division is bit-deterministic cross-engine. One hash agg,
    // shuffle ∝ #bins.
    "agg_histogram_fixed" -> ((s, d) => {
      Tables.orders(s, d)
        .select(floor(col("o_totalprice") / 25000).cast("long").as("bin"),
          col("o_totalprice"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("o_totalprice"))).as("sum_price"))
        .orderBy(col("bin"))
    }),

    // MERGEABLE distinct-count sketches — the property that matters at
    // 100 TB: per-nation HLL sketches are built in one pass, then
    // UNIONED up the region hierarchy without touching the raw data
    // again (re-aggregation from the sketch state, the standard
    // datasketches rollup). No oracle (sketch bytes are
    // engine-specific); the estimate-vs-exact property is pinned in
    // RelationalSpec.
    "agg_hll_union" -> ((s, d) => {
      val perNation = Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"),
          count(lit(1)).as("n_rows"))
      perNation
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_customers"),
          sum(col("n_rows")).as("exact_rows"))
        .orderBy(col("n_regionkey"))
    }),

    // o_totalprice is a continuous double → no ties per customer
    // (verified against testdata); o_orderkey is the unique payload
    "agg_first_last_by" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
          max(col("o_totalprice")).as("best_price"))
        .orderBy(col("o_custkey"))
    }),

    // several DISTINCT aggregates over DIFFERENT columns in one pass —
    // Spark plans this with an Expand (one replicated stream per
    // distinct set) feeding a single shuffle; the at-scale alternative
    // to N self-joined single-distinct queries.
    "agg_count_distinct_multi" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // weighted average: both the numerator (price·qty) and the weight
    // sum accumulate as exact DECIMAL(18,4) (order-independent), and
    // only the final quotient is floating — deterministic at any
    // partitioning. Headroom: |price·qty| ≤ ~5.5e6/row caps the sum at
    // ~1.7e13 for sf1's 6M rows, inside DECIMAL(18,4)'s 1e14 range;
    // beyond that, widen the accumulator precision.
    "agg_weighted_avg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(r4(dsum(col("l_extendedprice") * col("l_quantity")) /
            dsum(col("l_quantity"))).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // MERGEABLE MOMENTS — the re-aggregation pattern for mean/variance
    // at scale (the numeric cousin of agg_hll_union): per-nation
    // partial state (n, Σx, Σx²) accumulates as exact decimals, then
    // ROLLS UP to region by summing the state — no rescan of raw rows,
    // and the merge is exact because decimal addition is associative.
    // Mean/variance derive from the merged state in double only at the
    // very end (two exact-decimal-derived doubles → identical IEEE
    // arithmetic in every engine).
    "agg_moments_mergeable" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val st1 = Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(dec)).as("s1"),
          sum((col("c_acctbal") * col("c_acctbal")).cast(dec)).as("s2"))
      val st2 = st1
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"))
        .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
          sum(col("s2")).as("s2"))
      val mean = col("s1").cast(DoubleType) / col("n")
      st2.join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n"),
          r4(mean).as("mean_bal"),
          r4(col("s2").cast(DoubleType) / col("n") - mean * mean).as("var_bal"))
        .orderBy(col("r_name"))
    }),

    // deterministic mode: the most frequent l_quantity per group, ties
    // broken toward the SMALLEST value — built-in mode() leaves ties
    // engine-defined, so the portable form is count + argmax window.
    // Shuffle ∝ (group, value) pairs; the window partitions are
    // #distinct-values wide, never #rows.
    "agg_mode_deterministic" -> ((s, d) => {
      val cnt = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(desc("n"), asc("l_quantity"))
      cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
        .orderBy(col("l_returnflag"))
    }))

  private val dsumQty = dsumSql("l_quantity")
  private val dsumPrice = dsumSql("l_extendedprice")

  val oracle: Map[String, String] = Map(
    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round($dsumQty, 4) AS sum_qty,
         |  round($dsumPrice, 4) AS sum_base_price,
         |  round(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS sum_disc_price,
         |  round($dsumQty / count(*), 4) AS avg_qty,
         |  round($dsumPrice / count(*), 4) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct_count" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS distinct_parts, count(*) AS n
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, round($dsumQty, 4) AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, round($dsumPrice, 4) AS sum_price
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_percentile" ->
      """SELECT l_returnflag,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50_qty,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_quantile_hist" ->
      s"""WITH hist AS (
         |  SELECT l_returnflag,
         |    CAST(floor(l_extendedprice / $QuantileHistWidth) AS BIGINT) AS bin,
         |    count(*) AS c
         |  FROM lineitem GROUP BY 1, 2),
         |cum AS (
         |  SELECT l_returnflag, bin, c,
         |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
         |  FROM hist)
         |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
         |  CAST(min(CASE WHEN cum * 100 >= n * 50
         |    THEN (bin + 1) * $QuantileHistWidth END) AS BIGINT) AS p50_est,
         |  CAST(min(CASE WHEN cum * 100 >= n * 90
         |    THEN (bin + 1) * $QuantileHistWidth END) AS BIGINT) AS p90_est,
         |  CAST(min(CASE WHEN cum * 100 >= n * 99
         |    THEN (bin + 1) * $QuantileHistWidth END) AS BIGINT) AS p99_est
         |FROM cum GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT l_orderkey, array_to_string(list_sort(list(l_partkey)), ',') AS parts
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "agg_boolean_stats" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  bool_and(l_quantity > 0) AS all_positive_qty,
        |  bool_or(l_tax > 0.07) AS any_high_tax,
        |  count(*) FILTER (WHERE l_quantity >= 30) AS n_bulk
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_pivot" ->
      """SELECT l_returnflag,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE), 4) AS F,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    FILTER (WHERE l_linestatus = 'O') AS DOUBLE), 4) AS O,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    FILTER (WHERE l_linestatus = 'P') AS DOUBLE), 4) AS P
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_unpivot" ->
      """WITH p AS (SELECT p_partkey, p_retailprice,
        |    CAST(p_size AS DOUBLE) AS p_size
        |  FROM part WHERE p_partkey < 1000)
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM p
        |UNION ALL
        |SELECT p_partkey, 'p_size', p_size FROM p
        |ORDER BY p_partkey, metric""".stripMargin,

    "agg_bitwise" ->
      """SELECT l_orderkey,
        |  bit_or(l_linenumber) AS ln_or,
        |  bit_and(l_linenumber) AS ln_and,
        |  bit_xor(l_linenumber) AS ln_xor,
        |  count(*) AS n
        |FROM lineitem WHERE l_orderkey < 5000
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "agg_histogram_fixed" ->
      s"""SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
         |  count(*) AS n,
         |  round(${dsumSql("o_totalprice")}, 4) AS sum_price
         |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,

    "agg_first_last_by" ->
      """SELECT o_custkey,
        |  arg_max(o_orderkey, o_totalprice) AS best_order,
        |  arg_min(o_orderkey, o_totalprice) AS worst_order,
        |  max(o_totalprice) AS best_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "agg_count_distinct_multi" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_weighted_avg" ->
      s"""SELECT l_returnflag,
         |  round(${dsumSql("l_extendedprice * l_quantity")} /
         |    ${dsumSql("l_quantity")}, 4) AS wavg_price,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_moments_mergeable" ->
      """WITH st1 AS (
        |  SELECT c_nationkey, count(*) AS n,
        |    SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s1,
        |    SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(18,4))) AS s2
        |  FROM customer GROUP BY c_nationkey),
        |st2 AS (
        |  SELECT n_regionkey, CAST(SUM(n) AS BIGINT) AS n,
        |    SUM(s1) AS s1, SUM(s2) AS s2
        |  FROM st1 JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_regionkey)
        |SELECT r_name, n,
        |  round(CAST(s1 AS DOUBLE) / n, 4) AS mean_bal,
        |  round(CAST(s2 AS DOUBLE) / n
        |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 4) AS var_bal
        |FROM st2 JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name""".stripMargin,

    "agg_mode_deterministic" ->
      """WITH cnt AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY n DESC, l_quantity ASC) AS rn FROM cnt) t
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)
}

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

  /** register count for the own-HLL pair (agg_hll_md5*) */
  val HllM = 512

  /** survivor capacity for the KLL-style quantile sketch
    * (agg_quantile_kll) — shared with the oracle SQL's min-level
    * derivation so engine and oracle compact identically */
  val KllK = 1024

  /** max register rank for m=512: 63-bit hash − 9 index bits → 54-bit
    * rank window, rank ∈ 0 (empty) .. 55 */
  private val HllMaxRank = 55

  /** α·m²·2^55 — the numerator of the raw HLL estimate over the
    * 2^55-scaled register sum, inlined as ONE double literal into the
    * Spark expression AND the DuckDB oracle so both divide the exact
    * same constant (Double.toString round-trips) */
  private val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * math.pow(2.0, HllMaxRank)

  /** HLL estimate from a register array column: exact integer register
    * sum (Σ2^(55−M) as DECIMAL(38,0) — scale-0 decimal addition never
    * loses digits), then ONE double division; small range (raw ≤ 2.5m,
    * zeros present) switches to linear counting m·ln(m/V). The DuckDB
    * oracles apply the identical formula to their recomputed
    * registers ([[hllEstimateSql]]). */
  private def hllEstimate(reg: String): org.apache.spark.sql.Column = {
    val s = s"""aggregate($reg, CAST(0 AS DECIMAL(38,0)),
       |  (a, r) -> a + CAST(shiftleft(CAST(1 AS BIGINT),
       |    $HllMaxRank - CAST(r AS INT)) AS DECIMAL(38,0)))""".stripMargin
    val zeros = s"size(filter($reg, r -> r = 0))"
    val raw = s"$HllNumerator / CAST(($s) AS DOUBLE)"
    expr(s"""round(CASE WHEN $raw <= ${2.5 * HllM} AND $zeros > 0
       |  THEN ${HllM.toDouble} * ln(${HllM.toDouble} / ($zeros))
       |  ELSE $raw END, 4)""".stripMargin)
  }

  /** DuckDB side of [[hllEstimate]] given SQL exprs for the 2^55-scaled
    * register sum and the zero-register count */
  private[operators] def hllEstimateSql(sumExpr: String, zerosExpr: String): String =
    s"""round(CASE WHEN $HllNumerator / CAST(($sumExpr) AS DOUBLE) <= ${2.5 * HllM}
       |    AND ($zerosExpr) > 0
       |  THEN ${HllM.toDouble} * ln(${HllM.toDouble} / ($zerosExpr))
       |  ELSE $HllNumerator / CAST(($sumExpr) AS DOUBLE) END, 4)""".stripMargin

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

    // KLL-style mergeable quantile sketch (functions.KllAgg, r7 —
    // rolled VERDICT item): bounded-state quantiles whose sketch is a
    // PURE FUNCTION of the input multiset — compaction drops rows by
    // their own md5 hash bits (level L keeps tz(h) ≥ L, halving the
    // sample per level) instead of KLL's random even/odd coin, so the
    // final survivor set is order-independent, merge-associative, and
    // rebuildable row-by-row in DuckDB: the p50/p90/p99 estimates
    // themselves are hash-ORACLED. The exact percentile twin rides
    // alongside to show the O(1/√k) sample error. State ≤ 1+2k longs
    // per group at ANY scale; the exact twin's sort state grows with
    // rows — the 100 TB contrast, same pairing discipline as
    // agg_quantile_hist / text_cm_frequent_terms.
    "agg_quantile_kll" -> ((s, d) => {
      val kll = udaf(new graft.functions.KllAgg(KllK))
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          expr(graft.functions.Md5Hash.sparkHash60(
            """concat(cast(l_orderkey as string), '|',
              |cast(l_linenumber as string))""".stripMargin)).as("h"))
      // cast BEFORE the division so both engines do the same IEEE
      // double divide (DuckDB's `/` is float division; Spark's
      // bigint/decimal would be decimal) — cents/100 has 2 decimals,
      // so round(_, 4) is far from any representability edge
      def kq(q: Double, name: String) = expr(
        s"round(cast(element_at(vs, greatest(1, cast(ceil($q * size(vs)) " +
          s"as int))) as double) / 100.0, 4)").as(name)
      base.groupBy(col("l_returnflag"))
        .agg(kll(col("h"), col("cents")).as("vs"),
          r4(expr("percentile(l_extendedprice, 0.5)")).as("exact_p50"),
          r4(expr("percentile(l_extendedprice, 0.9)")).as("exact_p90"),
          r4(expr("percentile(l_extendedprice, 0.99)")).as("exact_p99"))
        .select(col("l_returnflag"),
          size(col("vs")).cast("long").as("n_sample"),
          kq(0.50, "kll_p50"), kq(0.90, "kll_p90"), kq(0.99, "kll_p99"),
          col("exact_p50"), col("exact_p90"), col("exact_p99"))
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

    // pairwise Pearson correlation matrix over the lineitem measures
    // — the feature-correlation audit run before modeling. ONE pass
    // computes every sufficient statistic (exact DECIMAL sums, the
    // ts_autocorr/assortativity discipline: 4dp-exact inputs, scale-8
    // exact cross-products, order/engine-independent), then stack()
    // unpivots the single stats row into one row per pair and the
    // final Pearson formula runs in IEEE double on identical inputs.
    // Built-in corr() would sum doubles in partition order — never
    // hash-stable; the decimal path is, at one extra column per
    // statistic. Shuffle: one combined stats row, regardless of rows.
    "agg_corr_pairs" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val dec38 = DecimalType(38, 8)
      val li = Tables.lineitem(s, d).select(
        col("l_quantity").cast(dec).as("q"),
        col("l_extendedprice").cast(dec).as("p"),
        col("l_discount").cast(dec).as("dd"))
      val st = li.agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("p")).as("sp"),
        sum(col("dd")).as("sd"),
        sum((col("q") * col("q")).cast(dec38)).as("sqq"),
        sum((col("p") * col("p")).cast(dec38)).as("spp"),
        sum((col("dd") * col("dd")).cast(dec38)).as("sdd"),
        sum((col("q") * col("p")).cast(dec38)).as("sqp"),
        sum((col("q") * col("dd")).cast(dec38)).as("sqd"),
        sum((col("p") * col("dd")).cast(dec38)).as("spd"))
      def dbl(c: String) = col(c).cast(DoubleType)
      st.select(col("n"), expr(
        """stack(3,
          |  'discount_extendedprice', sd, sp, sdd, spp, spd,
          |  'quantity_discount', sq, sd, sqq, sdd, sqd,
          |  'quantity_extendedprice', sq, sp, sqq, spp, sqp)
          |AS (pair, sx, sy, sxx, syy, sxy)""".stripMargin))
        .select(col("pair"), col("n"),
          r4((col("n") * dbl("sxy") - dbl("sx") * dbl("sy")) /
            (sqrt(col("n") * dbl("sxx") - dbl("sx") * dbl("sx")) *
             sqrt(col("n") * dbl("syy") - dbl("sy") * dbl("sy"))))
            .as("corr"))
        .orderBy(col("pair"))
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
    }),

    // own-HLL distinct estimate, HASH-ORACLED (functions.HllAgg on the
    // Md5Hash basis): the register array each group builds is
    // bit-for-bit what DuckDB rebuilds from the raw rows, and the
    // estimation formula (α·m²/Σ2⁻ᴹ with linear-counting small-range
    // correction) runs identically on both — exact integer register
    // sums (DECIMAL(38,0) / HUGEINT), one double division at the end.
    // Complements agg_approx_distinct (Spark's native Datasketches
    // surface, engine-internal layout → no oracle possible there).
    "agg_hll_md5" -> ((s, d) => {
      val hll = udaf(new graft.functions.HllAgg(HllM))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(hll(col("l_partkey").cast("string")).as("reg"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          hllEstimate("reg").as("approx_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // sketch ROLLUP on the own HLL: per-nation registers merge to
    // region by element-wise max — associative/commutative/idempotent,
    // so union-then-estimate is exact-as-sketched and equals the
    // oracle's direct region-level registers. The 100 TB shape: the
    // raw rows aggregate ONCE (per nation); the rollup re-aggregates
    // m longs per nation, never rescanning customers.
    "agg_hll_md5_union" -> ((s, d) => {
      val hll = udaf(new graft.functions.HllAgg(HllM))
      val perNation = Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(hll(col("c_custkey").cast("string")).as("reg"),
          count(lit(1)).as("n_rows"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      val rows = perNation
        .groupBy(col("n_regionkey")).agg(sum(col("n_rows")).as("exact_rows"))
      // element-wise max then back to an array in pos order
      val reg = perNation
        .select(col("n_regionkey"), posexplode(col("reg")))
        .groupBy(col("n_regionkey"), col("pos"))
        .agg(max(col("col")).as("m"))
        .groupBy(col("n_regionkey"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("n_regionkey"),
          expr("transform(pm, x -> x.m)").as("reg"))
      reg.join(rows, Seq("n_regionkey"))
        .select(col("n_regionkey"), col("exact_rows"),
          hllEstimate("reg").as("approx_customers"))
        .orderBy(col("n_regionkey"))
    }),

    // sketch set-algebra: HLL intersection by inclusion–exclusion —
    // |A∩B| ≈ est(A) + est(B) − est(A∪B), the distinct-overlap
    // estimate ("how many parts do returned and accepted flows
    // share?") computable from two ALREADY-BUILT sketches without
    // rescanning either side. The union register is the element-wise
    // max (the mergeable-HLL property); all three estimates apply the
    // shared hllEstimate formula on the engine-identical md5 basis,
    // so even this composed estimate is hash-ORACLED; the exact twin
    // rides along to show the sketch error.
    "agg_hll_intersect" -> ((s, d) => {
      val hll = udaf(new graft.functions.HllAgg(HllM))
      val li = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"),
          col("l_partkey").cast("string").as("v"))
      val byG = li.groupBy(col("g")).agg(hll(col("v")).as("reg"))
      val unionReg = byG
        .select(posexplode(col("reg")))
        .groupBy(col("pos")).agg(max(col("col")).as("m"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(expr("transform(pm, x -> x.m)").as("reg"))
      val estA = byG.filter(col("g") === "A")
        .select(hllEstimate("reg").as("est_a"))
      val estB = byG.filter(col("g") === "R")
        .select(hllEstimate("reg").as("est_b"))
      val estU = unionReg.select(hllEstimate("reg").as("est_union"))
      val exact = li.filter(col("g") === "A").select(col("v")).distinct()
        .intersect(li.filter(col("g") === "R").select(col("v")).distinct())
        .agg(count(lit(1)).as("exact_common"))
      estA.crossJoin(estB).crossJoin(estU).crossJoin(exact)
        .select(col("exact_common"), col("est_a"), col("est_b"),
          col("est_union"),
          r4(col("est_a") + col("est_b") - col("est_union"))
            .as("est_intersect"))
    }),

    // weighted percentiles — quantity-weighted p50/p90 of the
    // extended price per return flag: "half the UNITS shipped cost at
    // most X", which unweighted percentiles (agg_percentile) cannot
    // say. The sort-free histogram discipline (pipeline_range_bucket
    // family): exact integer cents × integer quantity weights, one
    // cumulative window over the per-flag DISTINCT-cents aggregate,
    // lower-bucket convention (smallest value with cum·100 ≥ q·total).
    "agg_percentile_weighted" -> ((s, d) => {
      val hist = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("l_returnflag"), col("cents"))
        .agg(sum(col("w")).as("wc"))
      val tot = hist.groupBy(col("l_returnflag")).agg(sum(col("wc")).as("tw"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.join(broadcast(tot), Seq("l_returnflag"))
        .withColumn("cum", sum(col("wc")).over(w))
        .groupBy(col("l_returnflag"))
        .agg(max(col("tw")).as("total_weight"),
          (min(when(col("cum") * 100 >= lit(50) * col("tw"), col("cents")))
            / 100.0).as("wp50"),
          (min(when(col("cum") * 100 >= lit(90) * col("tw"), col("cents")))
            / 100.0).as("wp90"))
        .orderBy(col("l_returnflag"))
    }),

    // power-of-2 (log2-spaced) histogram of order totals — the
    // latency-histogram binning discipline applied to money: bin =
    // ⌊log2(cents)⌋ computed EXACTLY as length(bin(cents)) − 1 (the
    // binary-representation length — no floating log anywhere), lo =
    // 1 << bin. One codegen'd scan + a bounded (≤64-bin) hash agg
    // with exact decimal sums.
    "agg_histogram_log2" -> ((s, d) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      Tables.orders(s, d)
        .select(cents.as("cents"), col("o_totalprice"))
        .withColumn("bin", (length(bin(col("cents"))) - 1).cast("int"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          r4(dsum(col("o_totalprice"))).as("sum_price"))
        .select(col("bin"),
          expr("shiftleft(CAST(1 AS BIGINT), bin)").as("lo_cents"),
          col("n"), col("sum_price"))
        .orderBy(col("bin"))
    }),

    // Pythagorean-mean family per group: arithmetic, geometric, and
    // harmonic means of the (strictly positive) extended price. The
    // geometric mean sums 4dp-ROUNDED logs as exact decimals (the
    // text_zipf_slope input-quantization discipline — an IEEE double
    // sum of logs is partial-aggregation-order-dependent); harmonic
    // sums 12dp-rounded reciprocals (1/x ∈ ~[1e-5, 1e-3], so 12dp
    // keeps 7+ significant digits) the same way. One codegen'd scan +
    // one bounded hash aggregate; the final exp/divisions evaluate on
    // bit-identical doubles in both engines.
    "agg_gmean_hmean" -> ((s, d) => {
      val dec4 = DecimalType(18, 4)
      val dec12 = DecimalType(18, 12)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(log(col("l_extendedprice")), 4).cast(dec4).as("lx"),
          round(lit(1.0) / col("l_extendedprice"), 12).cast(dec12).as("rx"),
          col("l_extendedprice"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          r4(davg(col("l_extendedprice"))).as("amean"),
          r4(exp(sum(col("lx")).cast(DoubleType) / count(lit(1))))
            .as("gmean"),
          r4(count(lit(1)) / sum(col("rx")).cast(DoubleType)).as("hmean"))
        .orderBy(col("l_returnflag"))
    }),

    // top-5 brands by revenue + ONE rolled-up OTHER row — the
    // dashboard contract ("never more than six wedges in the pie"):
    // every revenue dollar lands in exactly one output row, so the
    // shares sum to 1 by construction — the invariant a top-N WITHOUT
    // the remainder silently breaks. Exact integer cents; the rank
    // window runs over the bounded per-brand aggregate; scalar total
    // broadcast; ties (cents, brand) total.
    "agg_top5_other" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("cents"), col("p_brand"))
      val tot = rev.agg(sum(col("cents")).as("t"))
      rev.withColumn("rn", row_number().over(w))
        .withColumn("grp",
          when(col("rn") <= 5, col("p_brand")).otherwise("OTHER"))
        .groupBy(col("grp"))
        .agg(min(least(col("rn"), lit(6))).as("rank"),
          count(lit(1)).as("n_brands"), sum(col("cents")).as("c"))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("grp").as("brand"), col("n_brands"),
          r4(col("c").cast(DoubleType) / 100.0).as("revenue"),
          r4(col("c").cast(DoubleType) / col("t").cast(DoubleType))
            .as("share"))
        .orderBy(col("rank"))
    }),

    // tail-latency-style quantile ratio per series: EXACT p50/p95/p99
    // of the hourly volumes by integer rank arithmetic (min value
    // whose cumulative count clears q% of n — the quantileEdges
    // discipline; agg_percentile's percentile() sorts every value per
    // group, this walks the bounded value histogram) and the
    // SLO-review number p99/p50 — "how much worse is the worst hour?"
    // Zero floats before the two output divisions; histogram/cum
    // windows bounded by distinct hourly values per series.
    "agg_tail_ratio" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
      val hist = hourly.groupBy(col("event_type"), col("hu"))
        .agg(count(lit(1)).as("c"))
      val tot = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hu"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      hist.withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("hu"), col("cum"), col("n"),
          explode(expr("array(50, 95, 99)")).as("q"))
        .filter(col("cum") * 100 >= col("q") * col("n"))
        .groupBy(col("event_type"), col("q")).agg(min(col("hu")).as("e"))
        .groupBy(col("event_type"))
        .agg(min(when(col("q") === 50, col("e"))).as("p50u"),
          min(when(col("q") === 95, col("e"))).as("p95u"),
          min(when(col("q") === 99, col("e"))).as("p99u"))
        .join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("n").as("n_hours"),
          r4(col("p50u").cast(DoubleType) / 10000.0).as("p50"),
          r4(col("p95u").cast(DoubleType) / 10000.0).as("p95"),
          r4(col("p99u").cast(DoubleType) / 10000.0).as("p99"),
          r4(when(col("p50u") === 0, lit(0.0)).otherwise(
            col("p99u").cast(DoubleType) / col("p50u").cast(DoubleType)))
            .as("tail_ratio"))
        .orderBy(col("event_type"))
    }))

  private val dsumQty = dsumSql("l_quantity")
  private val dsumPrice = dsumSql("l_extendedprice")

  val oracle: Map[String, String] = Map(
    "agg_top5_other" ->
      """WITH rev AS (
        |  SELECT p_brand,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
        |rk AS (
        |  SELECT p_brand, cents,
        |    row_number() OVER (ORDER BY cents DESC, p_brand) AS rn
        |  FROM rev),
        |g AS (
        |  SELECT CASE WHEN rn <= 5 THEN p_brand ELSE 'OTHER' END AS brand,
        |    CAST(MIN(least(rn, 6)) AS INT) AS rank,
        |    count(*) AS n_brands, CAST(sum(cents) AS BIGINT) AS c
        |  FROM rk GROUP BY 1)
        |SELECT rank, brand, n_brands,
        |  round(CAST(c AS DOUBLE) / 100.0, 4) AS revenue,
        |  round(CAST(c AS DOUBLE) / CAST(t AS DOUBLE), 4) AS share
        |FROM g CROSS JOIN tot ORDER BY rank""".stripMargin,

    "agg_tail_ratio" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS hu
        |  FROM events GROUP BY 1, 2),
        |hist AS (SELECT event_type, hu, count(*) AS c
        |         FROM hourly GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
        |cum AS (
        |  SELECT event_type, hu,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY hu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |ed AS (
        |  SELECT c.event_type, q.q, min(c.hu) AS e
        |  FROM cum c JOIN tot t USING (event_type)
        |  CROSS JOIN (SELECT unnest([50, 95, 99]) AS q) q
        |  WHERE c.cum * 100 >= q.q * t.n GROUP BY 1, 2),
        |pv AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN q = 50 THEN e END) AS p50u,
        |    MIN(CASE WHEN q = 95 THEN e END) AS p95u,
        |    MIN(CASE WHEN q = 99 THEN e END) AS p99u
        |  FROM ed GROUP BY 1)
        |SELECT p.event_type, t.n AS n_hours,
        |  round(CAST(p50u AS DOUBLE) / 10000.0, 4) AS p50,
        |  round(CAST(p95u AS DOUBLE) / 10000.0, 4) AS p95,
        |  round(CAST(p99u AS DOUBLE) / 10000.0, 4) AS p99,
        |  round(CASE WHEN p50u = 0 THEN 0.0
        |    ELSE CAST(p99u AS DOUBLE) / CAST(p50u AS DOUBLE) END, 4)
        |    AS tail_ratio
        |FROM pv p JOIN tot t USING (event_type)
        |ORDER BY p.event_type""".stripMargin,

    "agg_percentile_weighted" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wc
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT l_returnflag, CAST(sum(wc) AS BIGINT) AS tw
        |        FROM h GROUP BY 1),
        |c AS (
        |  SELECT h.l_returnflag, h.cents, t.tw,
        |    CAST(sum(h.wc) OVER (PARTITION BY h.l_returnflag
        |      ORDER BY h.cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM h JOIN tot t USING (l_returnflag))
        |SELECT l_returnflag, max(tw) AS total_weight,
        |  min(CASE WHEN cum * 100 >= 50 * tw THEN cents END) / 100.0 AS wp50,
        |  min(CASE WHEN cum * 100 >= 90 * tw THEN cents END) / 100.0 AS wp90
        |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "agg_histogram_log2" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_totalprice
        |  FROM orders),
        |b AS (SELECT CAST(len(bin(cents)) - 1 AS INT) AS bin, o_totalprice
        |      FROM c)
        |SELECT bin, CAST(1 AS BIGINT) << bin AS lo_cents, count(*) AS n,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS sum_price
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "agg_gmean_hmean" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(round(ln(l_extendedprice), 4) AS DECIMAL(18,4)) AS lx,
        |    CAST(round(1.0 / l_extendedprice, 12) AS DECIMAL(18,12)) AS rx,
        |    l_extendedprice
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 4) AS amean,
        |  round(exp(CAST(sum(lx) AS DOUBLE) / count(*)), 4) AS gmean,
        |  round(count(*) / CAST(sum(rx) AS DOUBLE), 4) AS hmean
        |FROM v GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "agg_corr_pairs" ->
      """WITH li AS (
        |  -- DECIMAL(28,4): a width-18 decimal multiply runs in int64
        |  -- in DuckDB and overflows at price scale; width > 18 forces
        |  -- the int128 path (values identical — the widening is exact)
        |  SELECT CAST(l_quantity AS DECIMAL(28,4)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(28,4)) AS p,
        |    CAST(l_discount AS DECIMAL(28,4)) AS dd
        |  FROM lineitem),
        |st AS (
        |  SELECT count(*) AS n,
        |    SUM(q) AS sq, SUM(p) AS sp, SUM(dd) AS sd,
        |    SUM(CAST(q * q AS DECIMAL(38,8))) AS sqq,
        |    SUM(CAST(p * p AS DECIMAL(38,8))) AS spp,
        |    SUM(CAST(dd * dd AS DECIMAL(38,8))) AS sdd,
        |    SUM(CAST(q * p AS DECIMAL(38,8))) AS sqp,
        |    SUM(CAST(q * dd AS DECIMAL(38,8))) AS sqd,
        |    SUM(CAST(p * dd AS DECIMAL(38,8))) AS spd
        |  FROM li),
        |pairs AS (
        |  SELECT n, 'discount_extendedprice' AS pair, sd AS sx, sp AS sy,
        |    sdd AS sxx, spp AS syy, spd AS sxy FROM st
        |  UNION ALL
        |  SELECT n, 'quantity_discount', sq, sd, sqq, sdd, sqd FROM st
        |  UNION ALL
        |  SELECT n, 'quantity_extendedprice', sq, sp, sqq, spp, sqp FROM st)
        |SELECT pair, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        |    4) AS corr
        |FROM pairs ORDER BY pair""".stripMargin,
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

    // Rebuilds the ENTIRE KllAgg sketch row-by-row (the reason the
    // sketch compacts by hash bits, not coin flips): tz via the
    // bit_count((h & -h) - 1) identity (h=0 → -1 → 64, matching
    // Long.numberOfTrailingZeros), final level = min{L : |{tz≥L}| ≤ k}
    // — a pure data property equal to the aggregator's adaptive-
    // compaction fixpoint — survivors = filter at that level, then the
    // same lower-rank quantile extraction over the value-sorted set.
    "agg_quantile_kll" -> {
      import graft.functions.Md5Hash
      def okq(q: String, name: String) =
        s"""round(CAST(max(cents) FILTER (rn = greatest(1,
           |      CAST(ceil($q * n) AS INT))) AS DOUBLE) / 100.0, 4) AS $name"""
          .stripMargin
      s"""WITH src AS (
         |  SELECT l_returnflag AS g,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents,
         |    ${Md5Hash.duckHash60(
               "concat(CAST(l_orderkey AS VARCHAR), '|', " +
                 "CAST(l_linenumber AS VARCHAR))")} AS h
         |  FROM lineitem),
         |tzs AS (SELECT g, cents, bit_count((h & -h) - 1) AS tz FROM src),
         |lvl AS (
         |  SELECT g, min(L) AS level FROM (
         |    SELECT t.g, ls.L, count(*) FILTER (t.tz >= ls.L) AS c
         |    FROM tzs t CROSS JOIN
         |      (SELECT unnest(generate_series(0, 64)) AS L) ls
         |    GROUP BY 1, 2) cnt
         |  WHERE c <= $KllK GROUP BY g),
         |surv AS (
         |  SELECT t.g, t.cents,
         |    row_number() OVER (PARTITION BY t.g ORDER BY t.cents) AS rn,
         |    count(*) OVER (PARTITION BY t.g) AS n
         |  FROM tzs t JOIN lvl ON lvl.g = t.g AND t.tz >= lvl.level),
         |kq AS (
         |  SELECT g, CAST(max(n) AS BIGINT) AS n_sample,
         |    ${okq("0.5", "kll_p50")},
         |    ${okq("0.9", "kll_p90")},
         |    ${okq("0.99", "kll_p99")}
         |  FROM surv GROUP BY g),
         |ex AS (
         |  SELECT l_returnflag AS g,
         |    round(percentile_cont(0.5) WITHIN GROUP
         |      (ORDER BY l_extendedprice), 4) AS exact_p50,
         |    round(percentile_cont(0.9) WITHIN GROUP
         |      (ORDER BY l_extendedprice), 4) AS exact_p90,
         |    round(percentile_cont(0.99) WITHIN GROUP
         |      (ORDER BY l_extendedprice), 4) AS exact_p99
         |  FROM lineitem GROUP BY 1)
         |SELECT kq.g AS l_returnflag, kq.n_sample, kq.kll_p50, kq.kll_p90,
         |  kq.kll_p99, ex.exact_p50, ex.exact_p90, ex.exact_p99
         |FROM kq JOIN ex ON ex.g = kq.g
         |ORDER BY l_returnflag""".stripMargin
    },

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
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "agg_hll_md5" -> {
      s"""WITH src AS (
         |  SELECT l_returnflag AS g, CAST(l_partkey AS VARCHAR) AS v
         |  FROM lineitem),
         |${hllRegisterCtesSql}
         |SELECT e.g AS l_returnflag, e.exact_n AS exact_parts,
         |  ${hllEstimateSql("st.s", "st.zeros")} AS approx_parts
         |FROM ex e JOIN st ON st.g = e.g
         |ORDER BY l_returnflag""".stripMargin
    },

    "agg_hll_md5_union" -> {
      s"""WITH src AS (
         |  SELECT n.n_regionkey AS g, CAST(c.c_custkey AS VARCHAR) AS v
         |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
         |${hllRegisterCtesSql}
         |SELECT e.g AS n_regionkey, e.exact_n AS exact_rows,
         |  ${hllEstimateSql("st.s", "st.zeros")} AS approx_customers
         |FROM ex e JOIN st ON st.g = e.g
         |ORDER BY n_regionkey""".stripMargin
    },

    "agg_hll_intersect" -> {
      s"""WITH src AS (
         |  SELECT l_returnflag AS g, CAST(l_partkey AS VARCHAR) AS v
         |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
         |${hllRegisterCtesSql},
         |uregs AS (SELECT b, max(m) AS m FROM regs GROUP BY b),
         |ust AS (
         |  SELECT sum(CAST(1 AS BIGINT) << ($HllMaxRank - CAST(m AS INT)))
         |      AS s,
         |    count(*) FILTER (m = 0) AS zeros
         |  FROM uregs),
         |es AS (
         |  SELECT
         |    (SELECT ${hllEstimateSql("st.s", "st.zeros")} FROM st
         |     WHERE g = 'A') AS est_a,
         |    (SELECT ${hllEstimateSql("st.s", "st.zeros")} FROM st
         |     WHERE g = 'R') AS est_b,
         |    (SELECT ${hllEstimateSql("ust.s", "ust.zeros")} FROM ust)
         |      AS est_union,
         |    (SELECT count(*) FROM (
         |       SELECT v FROM src WHERE g = 'A'
         |       INTERSECT SELECT v FROM src WHERE g = 'R') t)
         |      AS exact_common)
         |SELECT exact_common, est_a, est_b, est_union,
         |  round(est_a + est_b - est_union, 4) AS est_intersect
         |FROM es""".stripMargin
    })

  /** DuckDB CTE chain rebuilding the [[graft.functions.HllAgg]]
    * registers over a `src(g, v)` relation — identical hash (md5-60 +
    * affine permutation [[graft.functions.HllAgg.SeedIdx]]), identical
    * bucket/rank split, max per register, zero-filled grid. Ends at
    * `st(g, s, zeros)` (2^55-scaled register sum + empty-register
    * count) and `ex(g, exact_n)` (the exact distinct twin). */
  private def hllRegisterCtesSql: String = {
    import graft.functions.{Md5Hash, HllAgg}
    val a = Md5Hash.permA(HllAgg.SeedIdx)
    val b = Md5Hash.permB(HllAgg.SeedIdx)
    val idxBits = java.lang.Integer.numberOfTrailingZeros(HllM)
    val window = 63 - idxBits
    val rankCase = (0 until window)
      .map(i => s"WHEN w >= ${1L << (window - 1 - i)} THEN ${i + 1}")
      .mkString("CASE ", " ", s" ELSE ${window + 1} END")
    s"""hv AS (SELECT g, ${Md5Hash.duckPerm(a.toString, b.toString,
          Md5Hash.duckHash60("v"))} AS h FROM src),
       |rk AS (
       |  SELECT g, CAST(h & ${HllM - 1} AS INT) AS b, $rankCase AS r
       |  FROM (SELECT g, h, h >> $idxBits AS w FROM hv) t),
       |mx AS (SELECT g, b, max(r) AS m FROM rk GROUP BY 1, 2),
       |grid AS (SELECT DISTINCT g FROM src),
       |regs AS (
       |  SELECT grid.g, gs.b, coalesce(mx.m, 0) AS m
       |  FROM grid CROSS JOIN (SELECT range AS b FROM range($HllM)) gs
       |  LEFT JOIN mx ON mx.g = grid.g AND mx.b = gs.b),
       |st AS (
       |  SELECT g, sum(CAST(1 AS BIGINT) << ($HllMaxRank - CAST(m AS INT))) AS s,
       |    count(*) FILTER (m = 0) AS zeros
       |  FROM regs GROUP BY g),
       |ex AS (SELECT g, count(DISTINCT v) AS exact_n FROM src GROUP BY g)"""
      .stripMargin
  }
}

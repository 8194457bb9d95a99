package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** §2.11e — mining and operations diagnostics: the queries a team
  * actually runs AROUND a 100 TB pipeline — association rules over
  * co-occurrence, key-skew profiling before picking a partitioning,
  * per-column data profiling at ingest, and incremental aggregate
  * maintenance (merge yesterday's partial states with today's delta
  * instead of recomputing the world).
  *
  * All four are oracle-expressible end-to-end: integer counts,
  * decimal-exact sums, and ratios that divide the same integers in
  * both engines.
  */
object MiningOps {

  /** minimum pair support for mine_assoc_rules — shared with the
    * oracle SQL. At sf0.01 the 25-brand universe yields 300 pairs with
    * support 196..465, so 50 keeps the full rule table while still
    * demonstrating the pushed-down support filter. */
  val MinSupport = 50

  /** top-N keys reported by diag_key_skew. */
  val SkewTopN = 20

  /** pipeline_range_bucket sizing: histogram bin width over
    * o_totalprice (≤ ~500 bins at every SF) and the bucket count. */
  val RangeBucketBinWidth = 1000
  val RangeBuckets = 10

  /** top-N neighbor count for mine_item_cf_topk. */
  val CfTopN = 5

  /** shard count for pipeline_shard_balance. */
  val ShardCount = 16

  /** price-range bucket count for mine_pareto_frontier's distributed
    * prefix max (the ts_late_data_semantics discipline: bounds the
    * rows through the one unpartitioned boundary window). */
  val ParetoBuckets = 128

  /** output-file count for pipeline_compaction_bins. */
  val CompactionBins = 8

  /** value-range bucket count for mine_gini_revenue's distributed
    * global rank (the ts_late_data discipline: only the ≤128-row
    * per-bucket boundary aggregate crosses an unpartitioned window). */
  val GiniBuckets = 128

  /** minimum 3-itemset support for mine_itemsets_3 (pairs clear 50
    * easily at sf0.01; triples sit lower) — shared with the oracle. */
  val Itemset3MinSupport = 20

  /** value-range bucket count for diag_drift_ks's distributed
    * cumulative CDFs (same discipline as GiniBuckets). */
  val KsBuckets = 128

  /** mine_ab_ztest conversion threshold (purchases per user) — near
    * the per-user purchase median at every SF (~13), so both arms'
    * rates sit strictly inside (0, 1). Shared with the oracle. */
  val AbConvThreshold = 14

  /** mine_markov_stationary quantization unit (probabilities in 1e-6
    * units — scale-free: q ≤ 1e6 at any corpus size) and the fixed
    * power-iteration round count, shared with the unrolled oracle. */
  val MarkovUnit = 1000000L
  val MarkovRounds = 10

  /** the unrolled p1..p[[MarkovRounds]] CTE chain replaying the
    * driver-side integer power iteration in DuckDB */
  private def markovUnrolledSql: String =
    (1 to MarkovRounds).map { i =>
      s"""p$i AS (
         |  SELECT st.s,
         |    CAST(coalesce(sum(p.x * q.q // $MarkovUnit), 0) AS BIGINT) AS x
         |  FROM states st
         |  LEFT JOIN q ON q.nx = st.s
         |  LEFT JOIN p${i - 1} p ON p.s = q.p
         |  GROUP BY st.s)""".stripMargin
    }.mkString(",\n")

  /** sample size for sample_weighted_priority. */
  val PrioritySampleK = 20

  /** 2^60 as a decimal-literal string — the priority-sampling scale
    * factor (u = (h+1)/2^60 with h the 60-bit md5 basis hash). */
  private val Pow60 = "1152921504606846976"

  /** the distinct (order, brand) co-purchase relation — shared root of
    * mine_assoc_rules and mine_item_cf_topk (one derivation, two
    * consumers; NOT memoized: each query is constructed fresh and the
    * relation is one scan + one distinct either way). */
  private def brandBaskets(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()

  /** q-quantile edges of an integer measure from its bounded
    * histogram (the pipeline_range_bucket discipline): d = 1..q−1,
    * edge_d = min bin with cum·q ≥ d·n; a value's bucket is 1 +
    * #edges strictly below it (same bin → lower bucket). Returns a
    * one-row DataFrame holding the sorted edge array under `name` —
    * broadcast it. Shared by mine_rfm_segments (q=5, three measures)
    * and diag_revenue_concentration (q=10). */
  private def quantileEdges(vals: org.apache.spark.sql.DataFrame,
      binExpr: org.apache.spark.sql.Column, name: String,
      q: Int): org.apache.spark.sql.DataFrame = {
    val hist = vals.groupBy(binExpr.as("bin")).agg(count(lit(1)).as("c"))
    val win = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("c")).over(win))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
      .select(col("bin"), col("cum"), col("n"),
        explode(expr(s"sequence(1, ${q - 1})")).as("dq"))
      .filter(col("cum") * q >= col("dq") * col("n"))
      .groupBy(col("dq")).agg(min(col("bin")).as("b"))
      .agg(sort_array(collect_list(col("b"))).as(name))
  }

  /** brand-level association rules (support / confidence / lift) over
    * the co-purchase relation — market-basket mining, the classic
    * batch-analytics op. Shape discipline: the (order, brand) relation
    * aggregates to per-order SORTED brand sets in ONE map-side-
    * combined shuffle, a<b pairs explode from each set pipeline-side
    * (bounded: ≤ C(25,2) per order by the brand universe), and only
    * the pair aggregation shuffles — the coParts group-and-explode
    * rewrite, not a self-join. Brand totals and the order count are
    * small aggregates broadcast back; lift divides exact longs in
    * both engines. */
  def assocRules(s: org.apache.spark.sql.SparkSession, d: String,
      minSupport: Int): org.apache.spark.sql.DataFrame = {
    graft.functions.SortedCombinations.register(s)
    val ob = brandBaskets(s, d)
    val pairs = ob.groupBy(col("ok"))
      .agg(array_sort(collect_set(col("b"))).as("bs"))
      // r15: native sorted_pairs generator (see GraphOps.coCitePairs)
      // — same a<b pair stream as the flatten/transform/slice
      // composition, produced codegen-side with no slice copies
      .select(expr("sorted_pairs(bs)").as(Seq("brand_a", "brand_b")))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val totals = ob.groupBy(col("b")).agg(count(lit(1)).as("sb"))
    val n = ob.agg(countDistinct(col("ok")).as("n_orders"))
    pairs
      .join(broadcast(totals.select(col("b").as("brand_a"), col("sb").as("sa"))),
        Seq("brand_a"))
      .join(broadcast(totals.select(col("b").as("brand_b"), col("sb").as("sb"))),
        Seq("brand_b"))
      .crossJoin(broadcast(n))
      .select(col("brand_a"), col("brand_b"), col("support"),
        r4(col("support").cast(DoubleType) / col("sa")).as("conf_a_b"),
        r4(col("support").cast(DoubleType) / col("sb")).as("conf_b_a"),
        r4(col("support").cast(DoubleType) * col("n_orders") /
          (col("sa") * col("sb"))).as("lift"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  /** mine_linreg_normal's shared SQL texts — engine (selectExpr) and
    * oracle evaluate the IDENTICAL expression trees: the sufficient
    * statistics are EXACT decimal sums (engine-independent), and the
    * closed-form solve below is double arithmetic whose every
    * multiply/add/divide is IEEE correctly-rounded, so identical
    * inputs + identical expression order ⇒ identical doubles. */
  // inputs quantize to 1e-4 INTEGER units as DECIMAL(20,0) (the
  // sample_weighted_priority wide-decimal discipline — width 20 keeps
  // DuckDB on the int128 path where DECIMAL(18,·) products overflow
  // int64); the cast stage divides the unit scale back out in DOUBLE
  private val LinregUnit = "10000"
  private val LinregCast = Seq(
    "CAST(n AS BIGINT) AS n", "CAST(n AS DOUBLE) AS dn",
    "CAST(ds1 AS DOUBLE) / 1e4 AS s1", "CAST(ds2 AS DOUBLE) / 1e4 AS s2",
    "CAST(dsy AS DOUBLE) / 1e4 AS sy", "CAST(ds11 AS DOUBLE) / 1e8 AS s11",
    "CAST(ds12 AS DOUBLE) / 1e8 AS s12", "CAST(ds22 AS DOUBLE) / 1e8 AS s22",
    "CAST(ds1y AS DOUBLE) / 1e8 AS s1y", "CAST(ds2y AS DOUBLE) / 1e8 AS s2y",
    "CAST(dsyy AS DOUBLE) / 1e8 AS syy")
  // Cramer's rule on M = [[dn,s1,s2],[s1,s11,s12],[s2,s12,s22]],
  // v = [sy,s1y,s2y]: det_i replaces column i of M with v
  private val LinregDets = Seq("n", "dn", "sy", "s1y", "s2y", "syy",
    "dn*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det",
    "sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0",
    "dn*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1",
    "dn*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS det2")
  private val LinregOut = Seq(
    "n",
    "round(det0/det, 4) AS b0",
    "round(det1/det, 4) AS b1",
    "round(det2/det, 4) AS b2",
    "round(((det0/det)*sy + (det1/det)*s1y + (det2/det)*s2y - sy*sy/dn)" +
      " / (syy - sy*sy/dn), 6) AS r2")

  /** the whole mine_linreg_normal pipeline over ANY lineitem-shaped
    * frame — batch or STREAMING: the 10 sufficient statistics are
    * plain sums, i.e. mergeable aggregate state (micro-batch partials
    * add cell-wise), so under complete-mode streaming the drained
    * stream's fit equals the batch fit EXACTLY at constant state
    * (O(features²) numbers regardless of stream length — the
    * model-quality monitor a training-data stream runs; parity
    * pinned in Round10Spec). */
  def linregFit(li: DataFrame): DataFrame =
    li.select(
        expr(s"CAST(CAST(l_quantity AS DECIMAL(18,4)) * $LinregUnit" +
          " AS DECIMAL(20,0))").as("x1"),
        expr(s"CAST(CAST(l_discount AS DECIMAL(18,4)) * $LinregUnit" +
          " AS DECIMAL(20,0))").as("x2"),
        expr(s"CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * $LinregUnit" +
          " AS DECIMAL(20,0))").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("ds1"), sum(col("x2")).as("ds2"),
        sum(col("y")).as("dsy"),
        sum(col("x1") * col("x1")).as("ds11"),
        sum(col("x1") * col("x2")).as("ds12"),
        sum(col("x2") * col("x2")).as("ds22"),
        sum(col("x1") * col("y")).as("ds1y"),
        sum(col("x2") * col("y")).as("ds2y"),
        sum(col("y") * col("y")).as("dsyy"))
      .selectExpr(LinregCast: _*)
      .selectExpr(LinregDets: _*)
      .selectExpr(LinregOut: _*)

  /** mine_logreg_gd shared texts — the linreg discipline extended to
    * an ITERATIVE training loop: per-row gradient contributions
    * quantize to DECIMAL(28,12) (order-independent exact sums, the
    * pageRank contribution discipline), the weight update is scalar
    * double arithmetic in identical expression text, and the
    * squashing function is the RATIONAL sigmoid
    * σ̃(z) = 0.5 + z/(2(1+|z|)) — +,×,÷,abs only, all IEEE
    * correctly-rounded, so both engines compute bit-equal doubles
    * where exp()-based logistic could differ in the last ulp
    * (declared semantics: production swaps in exp, same shapes). */
  val LogregRounds = 3
  private val LogregFeat = Seq(
    "CAST(l_quantity AS DOUBLE)/10 AS f1",
    "CAST(l_discount AS DOUBLE)*10 AS f2",
    "CASE WHEN l_tax > 0.04 THEN CAST(1.0 AS DOUBLE)" +
      " ELSE CAST(0.0 AS DOUBLE) END AS y")
  private val LogregSig =
    "(0.5 + (w0 + w1*f1 + w2*f2)/(2*(1+abs(w0 + w1*f1 + w2*f2))))"
  private val LogregGrad = Seq(
    s"CAST(($LogregSig - y) * 1.0 AS DECIMAL(28,12)) AS g0r",
    s"CAST(($LogregSig - y) * f1 AS DECIMAL(28,12)) AS g1r",
    s"CAST(($LogregSig - y) * f2 AS DECIMAL(28,12)) AS g2r")
  private val LogregUpdate = Seq(
    "pw0 - 0.5 * CAST(sg0 AS DOUBLE) / CAST(gn AS DOUBLE) AS w0",
    "pw1 - 0.5 * CAST(sg1 AS DOUBLE) / CAST(gn AS DOUBLE) AS w1",
    "pw2 - 0.5 * CAST(sg2 AS DOUBLE) / CAST(gn AS DOUBLE) AS w2")

  /** mine_naive_bayes score text — Laplace-smoothed class score
    * P(c)·P(f1|c)·P(f2|c) over the bounded count grid, double
    * arithmetic in ONE shared expression (IEEE correctly-rounded ops
    * + identical order ⇒ identical doubles in both engines, the
    * logreg discipline). `cN` = class count, `nf1`/`nf2` = per-class
    * feature counts, `tot` = corpus rows, `v1`/`v2` = feature
    * vocabulary sizes. */
  private def nbScore(cN: String, nf1: String, nf2: String): String =
    s"(CAST($cN AS DOUBLE)/CAST(tot AS DOUBLE))" +
      s" * ((CAST($nf1 AS DOUBLE)+1)/(CAST($cN AS DOUBLE)+CAST(v1 AS DOUBLE)))" +
      s" * ((CAST($nf2 AS DOUBLE)+1)/(CAST($cN AS DOUBLE)+CAST(v2 AS DOUBLE)))"

  val queries: Map[String, QFn] = Map(

    "mine_assoc_rules" -> ((s, d) => assocRules(s, d, MinSupport)),

    // categorical NAIVE BAYES classifier — train AND score in one
    // query, the third ML-training operator next to the OLS and GD
    // pair: predict the derived label (l_tax > 0.04) from two
    // categorical features (l_returnflag, l_linestatus). The 100 TB
    // shape: ONE map-side-combined count aggregate over the corpus
    // (state = |f1|×|f2|×2 cells — bounded by the vocabularies, not
    // the rows); every subsequent step (marginals via window sums,
    // the full feature grid, Laplace-smoothed scores, the per-cell
    // argmax, training accuracy) runs on that ≤ dozen-row aggregate.
    // Scores are double arithmetic in the ONE shared expression text
    // (nbScore) so both engines agree bit-for-bit; the argmax ties
    // toward class 1 (>=, declared). Output: one row per feature
    // cell with counts, both scores (8 dp), the prediction, and the
    // corpus-wide accuracy.
    "mine_naive_bayes" -> ((s, d) => {
      val cell = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("f1"), col("l_linestatus").as("f2"),
          when(col("l_tax") > 0.04, 1L).otherwise(0L).as("y"))
        .agg(count(lit(1)).as("cnt"))
      // everything below runs on the ≤ |f1|·|f2|·2-row aggregate
      val tots = cell.agg(sum(col("cnt")).as("tot"),
        countDistinct(col("f1")).as("v1"), countDistinct(col("f2")).as("v2"))
      val cls = cell.groupBy(col("y")).agg(sum(col("cnt")).as("cn"))
      val m1 = cell.groupBy(col("f1"), col("y")).agg(sum(col("cnt")).as("nf1"))
      val m2 = cell.groupBy(col("f2"), col("y")).agg(sum(col("cnt")).as("nf2"))
      // full (f1, f2, y) grid so a class absent from a cell still
      // scores (its feature counts come from the marginals; 0 if the
      // feature value never co-occurs with the class)
      val grid = cell.select(col("f1")).distinct()
        .crossJoin(cell.select(col("f2")).distinct())
        .crossJoin(cls)
        .crossJoin(broadcast(tots))
        .join(m1, Seq("f1", "y"), "left")
        .join(m2, Seq("f2", "y"), "left")
        .na.fill(0L, Seq("nf1", "nf2"))
        .join(cell, Seq("f1", "f2", "y"), "left")
        .na.fill(0L, Seq("cnt"))
      val scored = grid.selectExpr("f1", "f2", "y", "cnt", "tot",
        nbScore("cn", "nf1", "nf2") + " AS score")
      val byCell = scored.groupBy(col("f1"), col("f2"))
        .agg(max(col("tot")).as("tot"), sum(col("cnt")).as("n_cell"),
          max(when(col("y") === 0L, col("score"))).as("s0"),
          max(when(col("y") === 1L, col("score"))).as("s1"),
          sum(when(col("y") === 1L, col("cnt")).otherwise(0L)).as("n1"))
        .withColumn("predicted",
          when(col("s1") >= col("s0"), 1L).otherwise(0L))
      val acc = byCell
        .agg((sum(when(col("predicted") === 1L, col("n1"))
            .otherwise(col("n_cell") - col("n1"))).cast("double") /
          max(col("tot")).cast("double")).as("a"))
      byCell.crossJoin(broadcast(acc))
        .select(col("f1"), col("f2"), col("n_cell"), col("n1"),
          round(col("s0"), 8).as("score0"), round(col("s1"), 8).as("score1"),
          col("predicted"), round(col("a"), 6).as("accuracy"))
        .orderBy(col("f1"), col("f2"))
    }),

    // logistic-style classifier trained by BATCH GRADIENT DESCENT —
    // the distributed training loop itself, hash-oracled: LogregRounds
    // full-batch rounds of w ← w − η·∇L/n predicting the derived
    // label (l_tax > 0.04) from normalized quantity/discount. Each
    // round is ONE map-side-combined aggregate over the feature scan
    // (gradient state = 3 decimal sums — O(features) at any row
    // count); weights stay a 1-row RELATION broadcast into the next
    // round (no driver collect, construction stays action-free for
    // the plan audits). The oracle unrolls the rounds as CTE stages
    // over the IDENTICAL shared expression texts, so engine and
    // DuckDB agree bit-for-bit. Output: n, final weights (4 dp),
    // training accuracy at the 0.5 threshold (6 dp).
    "mine_logreg_gd" -> ((s, d) => {
      val feat = Tables.lineitem(s, d).selectExpr(LogregFeat: _*)
      var w = feat.sparkSession.range(1).selectExpr(
        "CAST(0.0 AS DOUBLE) AS w0", "CAST(0.0 AS DOUBLE) AS w1",
        "CAST(0.0 AS DOUBLE) AS w2")
      for (_ <- 1 to LogregRounds) {
        val g = feat.crossJoin(broadcast(w))
          .selectExpr((Seq("w0", "w1", "w2") ++ LogregGrad): _*)
          .agg(sum(col("g0r")).as("sg0"), sum(col("g1r")).as("sg1"),
            sum(col("g2r")).as("sg2"), count(lit(1)).as("gn"),
            max(col("w0")).as("pw0"), max(col("w1")).as("pw1"),
            max(col("w2")).as("pw2"))
        w = g.selectExpr(LogregUpdate: _*)
      }
      feat.crossJoin(broadcast(w))
        .selectExpr("w0", "w1", "w2",
          s"CASE WHEN $LogregSig >= 0.5 THEN CAST(1.0 AS DOUBLE)" +
            " ELSE CAST(0.0 AS DOUBLE) END = y AS correct")
        .agg(count(lit(1)).as("n"),
          sum(when(col("correct"), 1L).otherwise(0L)).as("ncorr"),
          max(col("w0")).as("fw0"), max(col("w1")).as("fw1"),
          max(col("w2")).as("fw2"))
        .selectExpr("CAST(n AS BIGINT) AS n",
          "round(fw0, 4) AS w0", "round(fw1, 4) AS w1",
          "round(fw2, 4) AS w2",
          "round(CAST(ncorr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy")
    }),

    // multivariate OLS via NORMAL EQUATIONS — the regression a 100 TB
    // pipeline actually runs: ONE map-side-combined aggregate collects
    // the 10 sufficient statistics (n, Σx, ΣxxT, Σxy, Σy²) as EXACT
    // decimal sums, and the 3×3 solve is closed-form Cramer driver-
    // free scalar arithmetic — no per-row second pass, no gradient
    // loop, no shuffle beyond the single partial-agg exchange, state
    // O(features²) at ANY row count (the vec_pca_power bounded-scalar
    // discipline without even the driver matrix). Model:
    // l_extendedprice ~ b0 + b1·l_quantity + b2·l_discount, plus R²
    // from the same sums. Hash-oracled: exact decimal sums + the
    // shared IEEE expression text (LinregCast/Dets/Out) in both
    // engines.
    "mine_linreg_normal" -> ((s, d) => linregFit(Tables.lineitem(s, d))),

    // key-distribution skew profile — what you run BEFORE choosing a
    // shuffle key at 100 TB. Top-N hot keys by row count with absolute
    // and cumulative corpus share. The per-key counts are one hash
    // agg; the top-N is TakeOrderedAndProject (no global sort); the
    // cumulative window runs over the N-row result only (bounded, not
    // a corpus-wide single-partition window); the total is a broadcast
    // scalar cross join, the win_global_share discipline.
    "diag_key_skew" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("tot"))
      val top = counts.orderBy(desc("n"), col("l_partkey")).limit(SkewTopN)
      val w = Window.orderBy(desc("n"), col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(Window.orderBy(desc("n"), col("l_partkey"))))
        .select(col("rank"), col("l_partkey"), col("n"),
          r4(col("n").cast(DoubleType) / col("tot")).as("share"),
          r4(sum(col("n")).over(w).cast(DoubleType) / col("tot")).as("cum_share"))
        .orderBy(col("rank"))
    }),

    // per-column ingest profile of the orders table: null count,
    // distinct count, min/max (VALUE extrema in each column's own
    // type, rendered as strings only at the end — two result values
    // cast per column instead of every input row; timestamps format
    // order-preservingly as yyyy-MM-dd HH:mm:ss). TWO aggregates, one
    // row each, cross-joined: the distinct counts ride Catalyst's
    // multi-count-distinct Expand (hash-aggregatable — fixed-size
    // buffers), while count/min/max run keyless in a plain partial
    // agg. Fusing them into ONE aggregate put min/max(string)'s
    // var-length buffers into the expanded 7×-row aggregate, forcing
    // SortAggregate with a 7-key sort of every expanded row — measured
    // 3× slower (DevColProfile: 3.2 s fused vs 1.1 s split at sf0.1).
    // Cost = two column-pruned scans + constant-size expansion, never
    // a per-column rescan.
    "diag_column_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      def str(c: String, agged: org.apache.spark.sql.Column) =
        if (c == "o_orderdate") date_format(agged, "yyyy-MM-dd HH:mm:ss")
        else agged.cast("string")
      val ndAggs = cols.map(c => countDistinct(col(c)).as(s"${c}_nd"))
      val simpleAggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_nn"),
          str(c, min(col(c))).as(s"${c}_mn"),
          str(c, max(col(c))).as(s"${c}_mx"))
      }
      val one = o.agg(simpleAggs.head, simpleAggs.tail: _*)
        .crossJoin(o.agg(ndAggs.head, ndAggs.tail: _*))
      val stacked = cols.map { c =>
        s"'$c', ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx"
      }.mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stacked) AS (column_name, n_nonnull, n_distinct, min_s, max_s)"),
        col("n_rows"))
        .select(col("column_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).as("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy(col("column_name"))
    }),

    // range-partitioner construction without a global sort — the
    // histogram-driven binning every 100 TB repartition/sort actually
    // uses. Phase 1: a (bin, count) hash aggregate (bounded state, same
    // mergeable-histogram discipline as agg_quantile_hist) plus a
    // cumulative window over the ≤500-row aggregate yields the 9
    // decile boundaries. Phase 2: the boundaries collect into ONE
    // 9-element array, broadcast back, and every row computes its
    // bucket with a per-row array scan (`filter(edges, ...)`) — no
    // join, no sort, no shuffle beyond the bounded histogram. Ties sit
    // in the lower bucket (strict >); a bin spanning several deciles
    // duplicates its edge and legitimately empties a bucket — both
    // conventions integer-exact and mirrored in the oracle.
    "pipeline_range_bucket" -> ((s, d) => {
      val w = RangeBucketBinWidth
      val nb = RangeBuckets
      val hist = Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / w).cast("long").as("bin"))
        .agg(count(lit(1)).as("c"))
      val win = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(win))
        .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
      val edges = cum
        .select(col("bin"), col("cum"), col("n"),
          explode(expr(s"sequence(1, ${nb - 1})")).as("d"))
        .filter(col("cum") * nb >= col("d") * col("n"))
        .groupBy(col("d")).agg(min(col("bin")).as("b"))
        .agg(sort_array(collect_list(((col("b") + 1) * w).cast("double")))
          .as("edges"))
      Tables.orders(s, d).crossJoin(broadcast(edges))
        .select(col("o_totalprice"),
          (lit(1) + size(expr("filter(edges, e -> o_totalprice > e)")))
            .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          r4(min(col("o_totalprice"))).as("min_price"),
          r4(max(col("o_totalprice"))).as("max_price"))
        .orderBy(col("bucket"))
    }),

    // incremental aggregate maintenance: the nightly-refresh shape.
    // Partial states (count / decimal sum / min / max per priority)
    // are computed INDEPENDENTLY for the base period and the delta
    // period, then merged by a second-level aggregate — sum of counts,
    // sum of decimal sums, min of mins, max of maxes — never touching
    // the base rows again. At 100 TB the base partials are a few rows
    // persisted from yesterday; only the delta scans. The oracle
    // recomputes from scratch: merge ≡ recompute is the whole point,
    // and every merged state is exactly mergeable (longs, decimals,
    // extrema — no averages carried as averages).
    "agg_incremental_merge" -> ((s, d) => {
      val split = lit("1997-01-01 00:00:00").cast("timestamp")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).as("psum"),
            min(col("o_totalprice")).as("pmin"),
            max(col("o_totalprice")).as("pmax"))
      val orders = Tables.orders(s, d)
      val base = partial(orders.filter(col("o_orderdate") < split))
      val delta = partial(orders.filter(col("o_orderdate") >= split))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("cnt")).as("n_orders"),
          r4(sum(col("psum")).cast(DoubleType)).as("sum_price"),
          min(col("pmin")).as("min_price"),
          max(col("pmax")).as("max_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // join-fanout audit: the multiplicity distribution of the
    // lineitem→orders join key — what you check BEFORE a join to
    // predict its output size and skew (a long multiplicity tail is
    // tomorrow's exploded join). Histogram of per-key child counts
    // (bounded by the max multiplicity) + the exact expected fanout
    // as a ratio of integer totals.
    "diag_join_fanout" -> ((s, d) => {
      val mult = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("m"))
        .groupBy(col("m")).agg(count(lit(1)).as("n_keys"))
      mult.crossJoin(broadcast(mult.agg(
          sum(col("n_keys")).as("tk"),
          sum(col("m") * col("n_keys")).as("tr"))))
        .select(col("m").as("multiplicity"), col("n_keys"),
          r4(col("n_keys").cast(DoubleType) / col("tk")).as("key_share"),
          r4(col("tr").cast(DoubleType) / col("tk")).as("avg_fanout"))
        .orderBy(col("multiplicity"))
    }),

    // referential-integrity audit — the ingest gate a pipeline runs
    // before trusting a drop: per FK edge, child row count, orphan
    // rows (no parent), distinct orphan keys. ONE left join per edge
    // (count_if(parent IS NULL) rides the same pass — no separate
    // anti-join rescan); small parents broadcast, the fact-to-fact
    // edge (lineitem→orders) stays a shuffled hash join that AQE can
    // re-plan at scale. The third edge audits orders against the
    // POSITIVE-BALANCE customers only, so the query demonstrably
    // counts real orphans, not just zeros on clean data.
    "diag_fk_violations" -> ((s, d) => {
      def edge(name: String, child: org.apache.spark.sql.DataFrame, ck: String,
          parent: org.apache.spark.sql.DataFrame, pk: String) =
        child.select(col(ck))
          .join(parent.select(col(pk)), col(ck) === col(pk), "left")
          .agg(count(lit(1)).as("n_child"),
            count_if(col(pk).isNull).as("n_orphans"),
            countDistinct(when(col(pk).isNull, col(ck))).as("n_orphan_keys"))
          .select(lit(name).as("fk_edge"), col("n_child"),
            col("n_orphans"), col("n_orphan_keys"))
      val edges = Seq(
        edge("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        edge("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        edge("orders->customer_active", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d).filter(col("c_acctbal") > 0), "c_custkey"))
      edges.reduce(_ unionByName _).orderBy(col("fk_edge"))
    }),

    // event-type transition mining: per-user consecutive (prev, next)
    // event pairs via lag over the (user, time) order, counted
    // globally with each transition's share of all transitions. The
    // window partitions by user_id — high-cardinality, so no
    // single-partition hazard — and the only other shuffle is the
    // bounded (5×5 transition matrix) aggregate; the global total
    // broadcasts back as a scalar (win_global_share discipline).
    "mine_seq_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      trans
        .crossJoin(broadcast(trans.agg(sum(col("n")).as("total"))))
        .select(col("prev_type"), col("next_type"), col("n"),
          r4(col("n") / col("total")).as("share"))
        .orderBy(desc("n"), col("prev_type"), col("next_type"))
    }),

    // order-3 behavioral paths: the top event-type trigrams across
    // user histories — mine_seq_transitions' pair Markov view extended
    // one step ("view>view>purchase" vs "view>error>view" tells a
    // product story pairs cannot). Same lag-window shape (partitioned
    // by user over the per-user total order — bounded by one user's
    // activity, never the stream); trigram rows go straight into a
    // hash agg, and the global top-20 is TakeOrderedAndProject on
    // (count desc, path).
    "mine_path_trigrams" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("p1", lag(col("event_type"), 1).over(w))
        .withColumn("p2", lag(col("event_type"), 2).over(w))
        .filter(col("p2").isNotNull)
        .select(concat_ws(">", col("p2"), col("p1"), col("event_type"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path"))
        .limit(20)
    }),

    // behavioral entropy per user: Shannon entropy of the user's
    // event-type distribution — 0 = monomaniac (bot smell), ln(5) =
    // uniform across all five types. The text_entropy_stats identity
    // (H = ln n − Σ c·ln c / n) over exact integer counts, with the
    // same 4dp-quantized-term decimal sum, applied to the behavioral
    // domain. Two hash aggs; state ∝ (user, type) pairs.
    "mine_user_entropy" -> ((s, d) => {
      val tc = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      tc.groupBy(col("user_id"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          dsum(round(col("c").cast("double") * log(col("c")), 4)).as("sc"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          r4(log(col("n_events").cast("double")) - col("sc") / col("n_events"))
            .as("entropy"))
        .orderBy(col("user_id"))
    }),

    // χ² independence test of lang × source over the document corpus —
    // the balance audit a corpus curator runs ("is language mix the
    // same across sources, or does one crawl skew the distribution?").
    // ONE corpus shuffle (the (lang, source) hash agg, bounded by the
    // label-universe product); row/column marginals and N derive from
    // that bounded table and broadcast back, so scale cost is a single
    // aggregated scan. Determinism: expected counts multiply marginals
    // as DOUBLES in a fixed op order (a Long product of two marginals
    // would overflow at ~1e12-row corpora), each cell's (o−e)²/e term
    // quantizes to DECIMAL(18,6), and the χ² total is the exact sum of
    // those decimals — order-independent, so the statistic and the
    // derived Cramér's V hash-match DuckDB.
    "diag_chi2_independence" -> ((s, d) => {
      val obs = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      val rowT = obs.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
      val colT = obs.groupBy(col("source")).agg(sum(col("o")).as("ct"))
      val tot = obs.agg(sum(col("o")).as("n"),
        count_distinct(col("lang")).as("nr"),
        count_distinct(col("source")).as("nc"))
      val dec6 = DecimalType(18, 6)
      // full R×C grid from the marginals, zero-filling unobserved
      // cells — a groupBy-only table omits them, and each contributes
      // a nonzero (0−e)²/e = e term (caught by the planted
      // deterministic-association fixture: chi2 halved without this)
      val term = rowT.crossJoin(colT)
        .join(obs, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("e", col("rt").cast(DoubleType) * col("ct").cast(DoubleType)
          / col("n").cast(DoubleType))
        .withColumn("t", (col("o").cast(DoubleType) - col("e"))
          * (col("o").cast(DoubleType) - col("e")) / col("e"))
      term
        .groupBy(col("n"), col("nr"), col("nc"))
        .agg(sum(col("t").cast(dec6)).as("chi2d"))
        .select(col("n"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          r4(col("chi2d").cast(DoubleType)).as("chi2"),
          r4(sqrt(col("chi2d").cast(DoubleType) / col("n").cast(DoubleType)
            / least(col("nr") - 1, col("nc") - 1).cast(DoubleType)))
            .as("cramers_v"))
    }),

    // Benford first-digit audit of o_totalprice — the fraud/synthetic-
    // data smell test: observed share of each leading significant
    // digit vs the Benford expectation log10(1 + 1/d). The digit is
    // extracted from the DECIMAL(18,2) STRING rendering (regexp for
    // the first nonzero digit) — a log10-based extraction would hinge
    // on cross-engine libm agreement at exact powers of ten; the
    // string path is engine-identical by construction. One bounded
    // 9-row aggregate; the total broadcasts back as a scalar.
    "diag_benford" -> ((s, d) => {
      val digits = Tables.orders(s, d)
        .select(regexp_extract(
          col("o_totalprice").cast(DecimalType(18, 2)).cast("string"),
          "[1-9]", 0).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      digits
        .crossJoin(broadcast(digits.agg(sum(col("n")).as("total"))))
        .select(col("digit"), col("n"),
          r4(col("n").cast(DoubleType) / col("total")).as("obs_share"),
          r4(log(10.0, lit(1.0) + lit(1.0) / col("digit"))).as("benford_share"),
          r4(abs(col("n").cast(DoubleType) / col("total") -
            log(10.0, lit(1.0) + lit(1.0) / col("digit")))).as("abs_dev"))
        .orderBy(col("digit"))
    }),

    // pointwise mutual information of event-type co-occurrence within
    // a user's history — "which behaviors travel together?". Same
    // basket discipline as mine_assoc_rules: distinct (user, type) →
    // per-user sorted type sets in ONE map-side-combined shuffle →
    // a<b pairs explode pipeline-side (≤ C(5,2) per user) → bounded
    // pair agg; marginals + user count broadcast back. PMI's ln runs
    // on the same exact-integer ratio in both engines, rounded at 4dp.
    "mine_cooccur_pmi" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id").as("u"), col("event_type").as("t")).distinct()
      graft.functions.SortedCombinations.register(s)
      val pairs = ut.groupBy(col("u"))
        .agg(array_sort(collect_set(col("t"))).as("ts"))
        // r15: native sorted_pairs generator (see GraphOps.coCitePairs)
        .select(expr("sorted_pairs(ts)").as(Seq("type_a", "type_b")))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("support"))
      val totals = ut.groupBy(col("t")).agg(count(lit(1)).as("s"))
      val n = ut.agg(countDistinct(col("u")).as("n_users"))
      pairs
        .join(broadcast(totals.select(col("t").as("type_a"), col("s").as("sa"))),
          Seq("type_a"))
        .join(broadcast(totals.select(col("t").as("type_b"), col("s").as("sb"))),
          Seq("type_b"))
        .crossJoin(broadcast(n))
        .select(col("type_a"), col("type_b"), col("support"),
          r4(log(col("support").cast(DoubleType) * col("n_users") /
            (col("sa") * col("sb")))).as("pmi"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // population-stability index of the event-value distribution,
    // first half of the window (ref) vs the rest (cur) — THE model-
    // monitoring drift metric (PSI < 0.1 stable, > 0.25 drifted).
    // Fixed value bins (width 50) make the binning engine-identical;
    // shares floor at 1e-4 (the industry zero-cell convention, part
    // of the declared semantics); each (cs−rs)·ln(cs/rs) term
    // quantizes to DECIMAL(18,6) and the PSI total is their exact sum
    // (the chi2 discipline). One corpus scan, one bounded bin agg.
    "diag_drift_psi" -> ((s, d) => {
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val counts = Tables.events(s, d)
        .select(floor(col("value") / 50.0).cast("int").as("bin"),
          (col("ts") < split).as("is_ref"))
        .groupBy(col("bin"))
        .agg(count_if(col("is_ref")).as("n_ref"),
          count_if(!col("is_ref")).as("n_cur"))
      val tot = counts.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_cur")).as("t_cur"))
      counts.crossJoin(broadcast(tot))
        .withColumn("rs",
          greatest(col("n_ref").cast(DoubleType) / col("t_ref"), lit(1e-4)))
        .withColumn("cs",
          greatest(col("n_cur").cast(DoubleType) / col("t_cur"), lit(1e-4)))
        .withColumn("term", (col("cs") - col("rs")) * log(col("cs") / col("rs")))
        .groupBy(col("t_ref"), col("t_cur"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("term").cast(DecimalType(18, 6))).as("psi_d"))
        .select(col("t_ref").as("n_ref"), col("t_cur").as("n_cur"),
          col("n_bins"), r4(col("psi_d").cast(DoubleType)).as("psi"))
    }),

    // robust outlier census per metric series — median/MAD instead of
    // mean/stddev (ts_anomaly_zscore's moment pair), because one wild
    // hour inflates a stddev enough to hide its siblings; the median
    // absolute deviation doesn't move. Flags hours whose |deviation|
    // exceeds 3·1.4826·MAD (the Gaussian-consistent cutoff). All
    // medians run per-series over the HOURLY AGGREGATE (≤ span×5
    // rows, the bounded-window discipline) — the raw event stream
    // only ever feeds a hash aggregate. Exact-percentile state is
    // ∝ hours per series, not events (the agg_quantile_hist caveat
    // applies if the series key were high-cardinality). Determinism:
    // hourly sums are decimal-exact → 4 dp doubles; every derived
    // quantity (median, deviations, MAD) is re-rounded to 4 dp, and
    // the cutoff multiplier 4.4478 parses from the same decimal
    // literal in both engines, so the > compare sees identical
    // doubles.
    // last-touch attribution: every purchase credits the user's most
    // recent preceding view/click within the 60-minute lookback, else
    // 'direct' — the marketing-analytics join that is really a window
    // ("which channel gets the sale?"). ONE pass: a last-IGNORE-NULLS
    // window over (user, time) carries the latest touch's type and
    // time to each row (both taken from the SAME last matching row —
    // same condition, same frame), purchases filter out, the lookback
    // gate applies, and a bounded per-channel aggregate counts. The
    // window partitions by user_id — high-cardinality, no
    // single-partition hazard.
    "mine_attribution_last_touch" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type").isin("view", "click"), col("event_type"))
      val touchTs = when(col("event_type").isin("view", "click"), col("ts"))
      val attributed = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t_type", last(touch, ignoreNulls = true).over(w))
        .withColumn("t_ts", last(touchTs, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(when(col("t_ts").isNotNull &&
            col("t_ts") >= col("ts") - expr("INTERVAL 60 MINUTES"),
            col("t_type")).otherwise(lit("direct")).as("channel"))
      val counts = attributed.groupBy(col("channel")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .select(col("channel"), col("n"),
          r4(col("n").cast(DoubleType) / col("tot")).as("share"))
        .orderBy(col("channel"))
    }),

    // nation-level mixing matrix of the citation graph: distinct
    // customer→supplier edges labeled by both endpoints' nations —
    // the homophily audit ("does trade stay in-nation?"). Two
    // broadcast dimension joins on the distinct edge set; the matrix
    // aggregate is bounded by nations² (625); the diagonal share
    // rides the same bounded table via a broadcast scalar.
    "graph_nation_mixing" -> ((s, d) => {
      val e = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
      val cn = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val m = e.join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey"), col("s_nationkey"))
        .agg(count(lit(1)).as("n_edges"))
      m.crossJoin(broadcast(m.agg(sum(col("n_edges")).as("tot"))))
        .select(col("c_nationkey"), col("s_nationkey"), col("n_edges"),
          r4(col("n_edges").cast(DoubleType) / col("tot")).as("share"),
          (col("c_nationkey") === col("s_nationkey")).as("same_nation"))
        .orderBy(col("c_nationkey"), col("s_nationkey"))
    }),

    // calendar-completeness audit: the span of order days vs the days
    // actually present — "did the ingest drop a day?" asked of the
    // whole table before anyone trusts a daily rollup. One bounded
    // (per-day) hash agg; the calendar grid derives from the min/max
    // scalars (sequence explode — span rows, never order rows) and
    // left-joins the present days; missing-day islands collapse via
    // the date-minus-row_number trick over the BOUNDED missing set so
    // the audit also reports the longest contiguous hole.
    "diag_missing_days" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("c"))
      // a missing RUN is the gap between consecutive PRESENT days —
      // no calendar-grid explode needed; the lag window runs over the
      // bounded per-day aggregate (≤span rows, never order rows)
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("gap",
          (datediff(col("day"), lag(col("day"), 1).over(w)) - 1).cast("long"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
          count(lit(1)).as("n_present"),
          coalesce(max(when(col("gap") > 0L, col("gap"))), lit(0L))
            .as("max_gap_days"))
        .select((datediff(col("d1"), col("d0")) + 1).cast("long").as("n_days"),
          col("n_present"),
          ((datediff(col("d1"), col("d0")) + 1).cast("long") - col("n_present"))
            .as("n_missing"),
          col("max_gap_days"))
    }),

    // reorder-gap profile: the distribution of days between a
    // customer's consecutive orders — mean plus EXACT integer p50/p90
    // derived from the bounded gap-day HISTOGRAM (state ∝ distinct
    // gap lengths ≤ retention days, never order volume; an exact
    // percentile aggregate over raw gaps would carry every gap).
    // Quantile convention: smallest gap with cum·100 ≥ q·n (the
    // quantileEdges lower-bucket rule). The lag window partitions by
    // customer — high-cardinality.
    "mine_reorder_gap_profile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("dt"), col("o_orderkey"))
      val gaps = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("dt"))
        .withColumn("gap", datediff(col("dt"), lag(col("dt"), 1).over(w)))
        .filter(col("gap").isNotNull)
      val hist = gaps.groupBy(col("gap").cast("long").as("g"))
        .agg(count(lit(1)).as("c"))
      val cumW = Window.orderBy(col("g"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(cumW))
        .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"),
          sum(col("g") * col("c")).as("gsum"))))
      def q(p: Int) = min(when(col("cum") * 100 >= col("n") * p, col("g")))
      cum.agg(max(col("n")).as("n_gaps"),
          r4(max(col("gsum")).cast(DoubleType) / max(col("n"))).as("mean_gap"),
          q(50).as("p50_days"), q(90).as("p90_days"))
    }),

    // brand seasonality index: per (brand, calendar month), the
    // brand's within-month revenue share relative to the corpus-wide
    // month share — index > 1 = the brand over-indexes that month
    // (the retail planning primitive behind "when do we stock X?").
    // ONE decimal-exact (brand, month) aggregate bounded by
    // brands×12; every marginal re-aggregates that bounded table and
    // broadcasts back; the two share divisions run in one fixed
    // double op order.
    "mine_brand_seasonality" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val bm = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), month(col("o_orderdate")).as("mo"))
        .agg(sum(col("l_extendedprice").cast(dec)).as("rev"))
      val bt = bm.groupBy(col("p_brand")).agg(sum(col("rev")).as("brev"))
      val mt = bm.groupBy(col("mo")).agg(sum(col("rev")).as("mrev"))
      val gt = bm.agg(sum(col("rev")).as("grev"))
      bm.join(broadcast(bt), Seq("p_brand"))
        .join(broadcast(mt), Seq("mo"))
        .crossJoin(broadcast(gt))
        .select(col("p_brand"), col("mo"),
          r4(col("rev").cast(DoubleType)).as("revenue"),
          r4((col("rev").cast(DoubleType) / col("brev").cast(DoubleType)) /
            (col("mrev").cast(DoubleType) / col("grev").cast(DoubleType)))
            .as("season_idx"))
        .orderBy(col("p_brand"), col("mo"))
    }),

    // rank-mover report: brand revenue rank in the early period vs
    // the late period (split at the agg_incremental_merge boundary)
    // and the movement — the "what changed this period" dashboard
    // primitive. Revenue per (brand, period) is ONE decimal-exact
    // hash agg bounded by the brand universe; both rank windows run
    // over that ≤brands-row aggregate ordered by the ROUNDED revenue
    // (house rule) with the brand as total tiebreak.
    "mine_rank_movers" -> ((s, d) => {
      val split = lit("1997-01-01 00:00:00").cast("timestamp")
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(r4(coalesce(dsum(when(col("o_orderdate") < split,
          col("l_extendedprice"))), lit(0.0))).as("rev_early"),
          r4(coalesce(dsum(when(col("o_orderdate") >= split,
            col("l_extendedprice"))), lit(0.0))).as("rev_late"))
      val we = Window.orderBy(desc("rev_early"), col("p_brand"))
      val wl = Window.orderBy(desc("rev_late"), col("p_brand"))
      rev.withColumn("rank_early", row_number().over(we))
        .withColumn("rank_late", row_number().over(wl))
        .select(col("p_brand"), col("rev_early"), col("rev_late"),
          col("rank_early"), col("rank_late"),
          (col("rank_early") - col("rank_late")).as("moved_up"))
        .orderBy(col("p_brand"))
    }),

    // revenue-concentration report (the Lorenz curve at decile
    // granularity): customers bucketed into revenue deciles by the
    // sort-free histogram-edge discipline; per decile the customer
    // count, exact revenue share, and cumulative share — "do 10% of
    // customers carry 60% of revenue?" without ranking 150 M
    // customers through one sort. Shares divide exact cent sums;
    // the cumulative window runs over the ≤10-row decile aggregate.
    "diag_revenue_concentration" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(dec)) * 100).cast("long")
          .as("mon_cents"))
      val bin = (col("mon_cents") - pmod(col("mon_cents"), lit(100000L)))
        .divide(lit(100000L)).cast("long")
      val ed = quantileEdges(rev, bin, "ed", 10)
      val per = rev.crossJoin(broadcast(ed))
        .select(col("mon_cents"),
          (lit(1) + size(expr(
            "filter(ed, e -> ((mon_cents - pmod(mon_cents, 100000)) div 100000) > e)")))
            .as("decile"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"), sum(col("mon_cents")).as("cents"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per.crossJoin(broadcast(per.agg(sum(col("cents")).as("tot"))))
        .select(col("decile"), col("n_customers"),
          r4(col("cents").cast(DoubleType) / col("tot")).as("rev_share"),
          r4(sum(col("cents")).over(w).cast(DoubleType) / col("tot"))
            .as("cum_share"))
        .orderBy(col("decile"))
    }),

    // RFM customer segmentation — recency / frequency / monetary
    // quintile scores, the classic marketing-mining op, WITHOUT a
    // global sort: each dimension's quintile edges derive from a
    // bounded value histogram (the pipeline_range_bucket discipline —
    // recency in whole days, frequency in order counts, monetary in
    // $1000 bins), cumulative-window over the ≤few-hundred-row
    // aggregate, edges collect into ONE broadcast array, and every
    // customer scores with a per-row array scan. Ties sit in the
    // lower quintile (strict >). All binning is integer-exact
    // (days / counts / cents via DECIMAL(18,4)); output is the
    // bounded ≤5³ segment grid with decimal-exact average monetary.
    "mine_rfm_segments" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val o = Tables.orders(s, d)
      val ref = o.agg(max(to_date(col("o_orderdate"))).as("ref"))
      val rfm = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast(dec)).as("mond"))
        .crossJoin(broadcast(ref))
        .select(col("o_custkey"),
          datediff(col("ref"), col("last_d")).cast("long").as("rec"),
          col("freq"),
          (col("mond") * 100).cast("long").as("mon_cents"))
      val re = quantileEdges(rfm, col("rec"), "rede", 5)
      val fe = quantileEdges(rfm, col("freq"), "frede", 5)
      val me = quantileEdges(rfm,
        (col("mon_cents") - pmod(col("mon_cents"), lit(100000L)))
          .divide(lit(100000L)).cast("long"), "monde", 5)
      rfm.crossJoin(broadcast(re)).crossJoin(broadcast(fe))
        .crossJoin(broadcast(me))
        .select(col("o_custkey"), col("mon_cents"),
          // recency scores INVERT (most recent = smallest days = best = 5)
          (lit(5) - size(expr("filter(rede, e -> rec > e)"))).as("r_score"),
          (lit(1) + size(expr("filter(frede, e -> freq > e)"))).as("f_score"),
          (lit(1) + size(expr(
            "filter(monde, e -> ((mon_cents - pmod(mon_cents, 100000)) div 100000) > e)")))
            .as("m_score"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"),
          r4((sum(col("mon_cents")).cast(DoubleType) / 100.0) / count(lit(1)))
            .as("avg_monetary"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    }),

    // duplicate-rate audit per source — the ingest-quality scoreboard
    // ("which crawl is feeding me copies?"): a doc is a duplicate when
    // its exact text fingerprint (md5) appeared on a lower doc_id
    // (first-wins, the dedup_exact convention). The window partitions
    // by the fingerprint — high-cardinality, no single-partition
    // hazard — and the per-source rollup is a bounded hash agg.
    "diag_dup_rate_by_source" -> ((s, d) => {
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), md5(col("text")).as("h"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), count_if(col("rn") > 1).as("n_dups"))
        .select(col("source"), col("n_docs"), col("n_dups"),
          r4(col("n_dups").cast(DoubleType) / col("n_docs")).as("dup_rate"))
        .orderBy(col("source"))
    }),

    // item-item collaborative filtering: top-5 nearest brands per
    // brand by co-purchase cosine — sim(a,b) = co(a,b)/√(n_a·n_b),
    // the workhorse of "customers who bought X also bought Y". Same
    // group-and-explode pair discipline as mine_assoc_rules (a<b pairs
    // fan out pipeline-side from per-order sorted brand sets; only the
    // bounded pair aggregation shuffles), then the pair table
    // SYMMETRIZES pipeline-side (each undirected pair serves both
    // directions) and a per-brand window ranks neighbors. The window
    // partitions by brand over the ≤ brands² AGGREGATE — bounded by
    // the item universe, never by order volume. Rank orders by the
    // 4dp-ROUNDED cosine (house rule: last-ulp differences cannot
    // flip an argmax) with brand_b as the total tiebreak.
    "mine_item_cf_topk" -> ((s, d) => {
      graft.functions.SortedCombinations.register(s)
      val ob = brandBaskets(s, d)
      val pairs = ob.groupBy(col("ok"))
        .agg(array_sort(collect_set(col("b"))).as("bs"))
        // r15: native sorted_pairs generator (see GraphOps.coCitePairs)
        .select(expr("sorted_pairs(bs)").as(Seq("ba", "bb")))
        .groupBy(col("ba"), col("bb"))
        .agg(count(lit(1)).as("co"))
      // both directions explode pipeline-side from ONE pair-agg branch
      // (a union of two references to `pairs` re-runs the whole
      // basket→explode→agg derivation twice — seen in the plan audit)
      val sym = pairs.select(explode(array(
          struct(col("ba").as("brand_a"), col("bb").as("brand_b")),
          struct(col("bb").as("brand_a"), col("ba").as("brand_b")))).as("p"),
          col("co"))
        .select(col("p.brand_a"), col("p.brand_b"), col("co"))
      val totals = ob.groupBy(col("b")).agg(count(lit(1)).as("nb"))
      val scored = sym
        .join(broadcast(totals.select(col("b").as("brand_a"), col("nb").as("na"))),
          Seq("brand_a"))
        .join(broadcast(totals.select(col("b").as("brand_b"), col("nb").as("nbb"))),
          Seq("brand_b"))
        .select(col("brand_a"), col("brand_b"), col("co"),
          r4(col("co").cast(DoubleType) /
            sqrt(col("na").cast(DoubleType) * col("nbb").cast(DoubleType)))
            .as("cosine"))
      val w = Window.partitionBy(col("brand_a"))
        .orderBy(desc("cosine"), col("brand_b"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= CfTopN)
        .select(col("brand_a"), col("rn"), col("brand_b"), col("co"), col("cosine"))
        .orderBy(col("brand_a"), col("rn"))
    }),

    // deterministic weighted sample — priority sampling (Duffield,
    // Lund & Thorup): each order draws u = (h+1)/2^60 from the md5
    // hash basis (functions.Md5Hash — engine-identical by
    // construction) and gets priority q = w/u; the top-k by q is a
    // weighted-without-replacement sample whose subset-sum estimators
    // are unbiased. EXACT arithmetic end-to-end: w = price in cents
    // via DECIMAL(18,2), q = floor(w·2^60/(h+1)) computed as
    // (num − num % den)/den over DECIMAL(38,0) — the subtraction
    // makes the numerator exactly divisible, so Spark's scale-6
    // decimal division rounds an exact integer (identity) and matches
    // DuckDB's HUGEINT floor-division bit-for-bit. The priority
    // renders as a STRING (it exceeds int64 when u is tiny — exactly
    // the winners); ranking happens on the NUMERIC value. One scan,
    // one TakeOrderedAndProject — no global sort, no shuffle beyond
    // the top-k.
    "sample_weighted_priority" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val num = col("w_cents").cast(dec) * lit(Pow60).cast(dec)
      val den = (col("h") + 1L).cast(dec)
      val scored = Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("bigint").as("w_cents"),
          expr(graft.functions.Md5Hash.sparkHash60(
            "concat('o|', cast(o_orderkey as string))")).as("h"))
        .withColumn("q", ((num - num % den) / den).cast(dec))
      scored.orderBy(desc("q"), col("o_orderkey")).limit(PrioritySampleK)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("q"), col("o_orderkey"))))
        .select(col("rank"), col("o_orderkey"), col("w_cents"),
          col("q").cast("string").as("priority"))
        .orderBy(col("rank"))
    }),

    // shard-assignment balance audit: every document hashes to one of
    // 16 shards on the md5 basis (the writer-side partitioning a
    // 100 TB corpus export actually uses — content-stable, not
    // round-robin, so re-runs and increments land identically); per
    // shard the doc count, byte load (n_chars), share, and load
    // factor vs the uniform ideal. One bounded hash agg; the totals
    // broadcast back as a scalar (win_global_share discipline). The
    // audit answers "can I write this corpus as N equal files?"
    // BEFORE paying the export.
    "pipeline_shard_balance" -> ((s, d) => {
      val perShard = Tables.documents(s, d)
        .select((expr(graft.functions.Md5Hash.sparkHash60(
          "concat('s|', cast(doc_id as string))")) % ShardCount)
          .cast("int").as("shard"), col("n_chars"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_bytes"))
      val tot = perShard.agg(sum(col("n_docs")).as("td"), sum(col("n_bytes")).as("tb"))
      perShard.crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("n_bytes"),
          r4(col("n_bytes").cast(DoubleType) / col("tb")).as("byte_share"),
          r4(col("n_bytes").cast(DoubleType) * ShardCount / col("tb"))
            .as("load_factor"))
        .orderBy(col("shard"))
    }),

    "diag_outlier_mad" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(r4(dsum(col("value"))).as("hsum"))
      val med = hourly.groupBy(col("event_type"))
        .agg(r4(expr("percentile(hsum, 0.5)")).as("med"))
      val dev = hourly.join(med, Seq("event_type"))
        .select(col("event_type"), col("med"),
          r4(abs(col("hsum") - col("med"))).as("dev"))
      val mad = dev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"), max(col("med")).as("med"),
          r4(expr("percentile(dev, 0.5)")).as("mad"))
      dev.select(col("event_type"), col("dev"))
        .join(mad, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(col("n_hours")).as("n_hours"), max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // stationary distribution of the behavioral Markov chain — where
    // does a user's session settle in the long run? Transition
    // probabilities quantize to EXACT 1e-6-unit integers
    // (q = c·1e6 DIV r — floor, engine-identical, and SCALE-FREE:
    // q ≤ 1e6 whatever the corpus size, so every product fits int64);
    // the 10-round power iteration π' = π·Q runs DRIVER-SIDE over the
    // ≤types² matrix (the vec_pca_power bounded-scalar pattern — the
    // distributed work is the one transition aggregate), each term
    // π_i·q_ij DIV 1e6 in exact integer floor arithmetic. The oracle
    // REPLAYS the identical 10 rounds as unrolled CTEs — the seventh
    // hash-oracled iterative computation.
    "mine_markov_stationary" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("p", lag(col("event_type"), 1).over(w))
        .filter(col("p").isNotNull)
        .groupBy(col("p"), col("event_type").as("nx"))
        .agg(count(lit(1)).as("c"))
      val rows = trans
        .join(trans.groupBy(col("p")).agg(sum(col("c")).as("r")), Seq("p"))
        .select(col("p"), col("nx"),
          expr(s"c * $MarkovUnit DIV r").as("q"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val states = rows.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val idx = states.zipWithIndex.toMap
      val q = Array.fill(states.length, states.length)(0L)
      rows.foreach { case (p, nx, v) => q(idx(p))(idx(nx)) = v }
      var pi = Array.fill(states.length)(MarkovUnit * MarkovUnit /
        states.length)
      for (_ <- 1 to MarkovRounds) {
        val nx = Array.fill(states.length)(0L)
        for (i <- states.indices; j <- states.indices)
          nx(j) += pi(i) * q(i)(j) / MarkovUnit
        pi = nx
      }
      val s2 = s
      import s2.implicits._
      states.zipWithIndex
        .map { case (st, i) => (st, BigDecimal(pi(i)) /
          BigDecimal(MarkovUnit * MarkovUnit)) }
        .toSeq.toDF("event_type", "piraw")
        .select(col("event_type"),
          r4(col("piraw").cast(DoubleType)).as("stationary"))
        .orderBy(col("event_type"))
    }),

    // cohort lifetime value: customers grouped by first-order month,
    // cumulative revenue per active month offset, normalized per
    // cohort head — the money-weighted sequel to ts_cohort_retention
    // (retention counts who returns; LTV sums what they spend).
    // Month offsets are EXACT integer month indexes (year·12+month —
    // no float months_between); revenue decimal-exact; the cumulative
    // window runs over the bounded (cohort × offset) aggregate.
    "mine_cohort_ltv" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val mo = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("midx"))
      val first = mo.groupBy(col("o_custkey")).agg(min(col("midx")).as("m0"))
      val sized = first.groupBy(col("m0")).agg(count(lit(1)).as("cohort_n"))
      val rev = mo.join(first, Seq("o_custkey"))
        .groupBy(col("m0"), (col("midx") - col("m0")).as("moff"))
        .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
      val w = Window.partitionBy(col("m0")).orderBy(col("moff"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.join(broadcast(sized), Seq("m0"))
        // per-user LTV divides EXACT integer cents with floor division
        // (a rounded double quotient hit a half-way boundary at sf0.01
        // — .96625 rounded differently per engine; integers cannot)
        .withColumn("cumc", (sum(col("rev")).over(w) * 100).cast("long"))
        .select(col("m0").as("cohort_midx"), col("moff"), col("cohort_n"),
          r4(col("rev").cast(DoubleType)).as("revenue"),
          (expr("cumc DIV cohort_n") / 100.0).as("cum_ltv"))
        .orderBy(col("cohort_midx"), col("moff"))
    }),

    // log–log price elasticity per brand: the OLS slope of ln(qty) on
    // ln(extended price) — "how much does demand move when price
    // does". The zipf-slope regression discipline: both logs are
    // 4dp-quantized at input, all five sufficient sums accumulate as
    // exact decimals, the slope closes in one IEEE expression per
    // brand (≤25 rows out).
    "mine_price_elasticity" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val dec8 = DecimalType(38, 8)
      val xy = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          round(log(col("l_extendedprice")), 4).cast(dec).as("x"),
          round(log(col("l_quantity")), 4).cast(dec).as("y"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      xy.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("x")).cast(dec8)).as("sxx"),
          sum((col("x") * col("y")).cast(dec8)).as("sxy"))
        .select(col("p_brand"), col("n"),
          r4((dbl(col("sxy")) * col("n") - dbl(col("sx")) * dbl(col("sy"))) /
            (dbl(col("sxx")) * col("n") - dbl(col("sx")) * dbl(col("sx"))))
            .as("elasticity"))
        .orderBy(col("p_brand"))
    }),

    // two-proportion z-test between user cohorts — the A/B readout:
    // even user_ids are arm A, odd arm B; conversion = the user made
    // ≥ AbConvThreshold purchases ("heavy buyer" — every synthetic
    // user buys at least once, so presence alone is degenerate: the
    // pooled rate hits 1.0 and the z denominator is 0/ANSI-error).
    // A still-degenerate pool (p̂ ∈ {0, 1}) reads z = 0 / not
    // significant by declared convention, mirrored in the oracle.
    // All counts exact integers; the pooled-z formula closes in ONE
    // fixed IEEE expression; |z| > 1.96 is the 95% two-sided call.
    // Two bounded hash aggregates — shuffle ∝ users.
    "mine_ab_ztest" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg((count_if(col("event_type") === "purchase") >= AbConvThreshold)
          .cast("long").as("conv"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
      val a = arms.filter(col("arm") === "A")
        .select(col("n").as("na"), col("x").as("xa"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n").as("nb"), col("x").as("xb"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      a.crossJoin(b)
        .withColumn("pa", dbl(col("xa")) / col("na"))
        .withColumn("pb", dbl(col("xb")) / col("nb"))
        .withColumn("pp", dbl(col("xa") + col("xb")) / (col("na") + col("nb")))
        .withColumn("z",
          when(col("pp") === 0.0 || col("pp") === 1.0, lit(0.0))
            .otherwise((col("pa") - col("pb")) /
              sqrt(col("pp") * (lit(1.0) - col("pp")) *
                (lit(1.0) / col("na") + lit(1.0) / col("nb")))))
        .select(col("na"), col("xa"), col("nb"), col("xb"),
          r4(col("pa")).as("rate_a"), r4(col("pb")).as("rate_b"),
          r4(col("z")).as("z"),
          (abs(col("z")) > 1.96).as("significant"))
    }),

    // Welch's t-test on mean purchase VALUE between the user-id arms
    // — the continuous-outcome companion of mine_ab_ztest (proportions
    // answer "did more convert", means answer "did they spend more";
    // Welch, not pooled Student: arms need not share a variance).
    // Per-user totals in exact cents; per-arm Σ and Σ² exact (squares
    // DECIMAL(38,0)/HUGEINT); t and the Welch–Satterthwaite dof close
    // in one fixed IEEE chain; a zero-variance pool reads t = 0 by
    // the declared ztest convention.
    "mine_ab_welch_t" -> ((s, d) => {
      val dec0 = DecimalType(38, 0)
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))),
          lit(0L)).as("cents"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"),
          sum(col("cents").cast(dec0) * col("cents").cast(dec0)).as("scc"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      val a = arms.filter(col("arm") === "A")
        .select(col("n").as("na"), col("sc").as("sa"), col("scc").as("sca"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n").as("nb"), col("sc").as("sb"), col("scc").as("scb"))
      a.crossJoin(b)
        .withColumn("ma", dbl(col("sa")) / col("na"))
        .withColumn("mb", dbl(col("sb")) / col("nb"))
        .withColumn("va",
          (dbl(col("sca")) - dbl(col("sa")) * dbl(col("sa")) / col("na")) /
            (col("na") - 1))
        .withColumn("vb",
          (dbl(col("scb")) - dbl(col("sb")) * dbl(col("sb")) / col("nb")) /
            (col("nb") - 1))
        .withColumn("se2", col("va") / col("na") + col("vb") / col("nb"))
        .withColumn("t", when(col("se2") === 0.0, lit(0.0))
          .otherwise((col("ma") - col("mb")) / sqrt(col("se2"))))
        .withColumn("dof", when(col("se2") === 0.0, lit(0.0))
          .otherwise(col("se2") * col("se2") /
            ((col("va") / col("na")) * (col("va") / col("na")) / (col("na") - 1) +
             (col("vb") / col("nb")) * (col("vb") / col("nb")) / (col("nb") - 1))))
        .select(col("na"), col("nb"),
          r4(col("ma") / 100.0).as("mean_a"), r4(col("mb") / 100.0).as("mean_b"),
          r4(col("t")).as("t"), r4(col("dof")).as("dof"),
          (abs(col("t")) > 1.96).as("significant"))
    }),

    // Kaplan–Meier survival of customer tenure — the churn curve:
    // tenure = days from a customer's first to last order; customers
    // whose last order lands within 30 days of the corpus horizon are
    // CENSORED (still active — the estimator's whole point). Both
    // deaths and censorings leave the risk set after their day, so
    // n(t) = N − Σ_{t'<t}(d+c) is one cumulative window over the
    // BOUNDED distinct-tenure table. S(t) = Π(1 − d/n) evaluates as
    // exp of the cumulative 6dp-quantized ln(1 − d/n) (the
    // established log-quantization discipline — a windowed product
    // of doubles would be order-fragile); an exhausted risk set
    // (d = n) pins S to exactly 0 from that day on.
    "mine_survival_km" -> ((s, d) => {
      val life = Tables.orders(s, d)
        .select(col("o_custkey"),
          (date_trunc("day", col("o_orderdate")).cast("long") / 86400L)
            .cast("long").as("dayno"))
        .groupBy(col("o_custkey"))
        .agg(min(col("dayno")).as("fd"), max(col("dayno")).as("ld"))
      val horizon = life.agg(max(col("ld")).as("md"))
      val marked = life.crossJoin(broadcast(horizon))
        .select((col("ld") - col("fd")).as("t"),
          (col("md") - col("ld") < 30L).as("censored"))
      val byT = marked.groupBy(col("t"))
        .agg(count_if(!col("censored")).as("d"),
          count_if(col("censored")).as("c"))
      val n = marked.agg(count(lit(1)).as("total"))
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.crossJoin(broadcast(n))
        .withColumn("n_risk",
          col("total") - coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
        .withColumn("lf", when(col("d") < col("n_risk"),
          round(log((col("n_risk") - col("d")).cast(DoubleType) /
            col("n_risk")), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .otherwise(lit(null)))
        .withColumn("dead",
          max((col("d") === col("n_risk")).cast("int")).over(cum))
        .withColumn("survival",
          when(col("dead") === 1, lit(0.0))
            .otherwise(r4(exp(sum(col("lf")).over(cum).cast(DoubleType)))))
        .select(col("t"), col("n_risk"), col("d"), col("c"), col("survival"))
        .orderBy(col("t"))
    }),

    // recency-weighted engagement score per user — the time-decay
    // ranking every feed/churn model starts from: each event
    // contributes value·2^(−age_days) with age measured from the
    // corpus's last day. EXACT integers end-to-end: cents via
    // DECIMAL(18,2), the dyadic decay is a BIGINT right-shift
    // (floor — identical to DuckDB's >>), ages clamped to 62 so the
    // shift never wraps; one scalar broadcast (max day) + one hash
    // agg; top 50 via TakeOrderedAndProject.
    "mine_time_decay_score" -> ((s, d) => {
      val dec2 = DecimalType(18, 2)
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          (col("value").cast(dec2) * 100).cast("long").as("cents"),
          (date_trunc("day", col("ts")).cast("long") / 86400L)
            .cast("long").as("dayno"))
      val mx = ev.agg(max(col("dayno")).as("md"))
      ev.crossJoin(broadcast(mx))
        .withColumn("contrib", expr(
          "shiftright(cents, CAST(least(md - dayno, 62) AS INT))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("contrib")).as("cu"))
        .select(col("user_id"), col("n_events"),
          r4(col("cu").cast(DoubleType) / 100.0).as("decay_score"))
        .orderBy(desc("decay_score"), col("user_id")).limit(50)
    }),

    // 2-D Pareto frontier (skyline) of the parts catalog — parts
    // where no other part is both cheaper-or-equal AND larger-or-
    // equal with one strict: the multi-objective shortlist query.
    // NOT the O(n²) dominance join: a part is dominated iff
    // (a) some STRICTLY cheaper price group has max-size ≥ its size,
    // or (b) its own price group holds a strictly larger size. The
    // strictly-cheaper prefix max runs DISTRIBUTED via the
    // ts_late_data_semantics bucket discipline — per-bucket windows
    // partitioned by a price-range bucket, one ≤128-row boundary
    // aggregate through the only unpartitioned window — so no stage
    // ever funnels the (unbounded) distinct-price domain through one
    // task. Equal (price, size) duplicates are mutually undominated
    // and all surface, matching the NOT EXISTS oracle.
    "mine_pareto_frontier" -> ((s, d) => {
      val g = Tables.part(s, d)
        .groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("gmax"))
      val bounds = g.agg(min(col("p_retailprice")).as("lo"),
        max(col("p_retailprice")).as("hi"))
      // bucket id: any monotone-in-price map works (internal only —
      // the declared semantics never see it); ties at hi clamp down
      val bucketed = g.crossJoin(broadcast(bounds))
        .withColumn("bk", least(lit(ParetoBuckets - 1),
          floor((col("p_retailprice") - col("lo")) * ParetoBuckets /
            greatest(col("hi") - col("lo"), lit(1e-9))).cast("int")))
        .drop("lo", "hi")
      val perBucket = bucketed.groupBy(col("bk")).agg(max(col("gmax")).as("bmax"))
      val wPrev = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prevMax = perBucket
        .withColumn("prevb", max(col("bmax")).over(wPrev)).drop("bmax")
      val wIn = Window.partitionBy(col("bk")).orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val grpStat = bucketed
        .join(broadcast(prevMax), Seq("bk"))
        .withColumn("m1", greatest(coalesce(max(col("gmax")).over(wIn),
          lit(Int.MinValue)), coalesce(col("prevb"), lit(Int.MinValue))))
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .join(grpStat.select(col("p_retailprice"), col("gmax"), col("m1")),
          Seq("p_retailprice"))
        .filter(!(col("m1") >= col("p_size") || col("gmax") > col("p_size")))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    // small-file compaction planner: pack per-source byte loads into
    // ~total/8-byte output files, CONTIGUOUS in source order (hash
    // sharding — pipeline_shard_balance — balances but scatters; a
    // compaction wants locality). Deterministic first-fit is a
    // sequential fold, so the plan bins by cumulative-bytes DIV
    // target — the concat-then-cut discipline. All integer-exact; the
    // windows run over the bounded per-source aggregate (state ∝
    // sources, a metadata domain, never documents).
    "pipeline_compaction_bins" -> ((s, d) => {
      val perSrc = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
      val tot = perSrc.agg(sum(col("bytes")).as("tot"))
      val w = Window.orderBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perSrc.crossJoin(broadcast(tot))
        .withColumn("target", expr(s"(tot + ${CompactionBins - 1}) DIV $CompactionBins"))
        .withColumn("cumb", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin", expr("CAST(cumb DIV target AS INT)"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_sources"),
          array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          sum(col("bytes")).as("bytes"), sum(col("n_docs")).as("n_docs"),
          r4(sum(col("bytes")).cast("double") / max(col("target")))
            .as("fill_ratio"))
        .orderBy(col("bin"))
    }),

    // Herfindahl–Hirschman market-concentration index per supplier
    // nation: HHI = 10000·Σᵢ sᵢ² where sᵢ is supplier i's share of
    // the nation's lineitem revenue — the antitrust/marketplace-health
    // score (≈0 atomistic … 10000 monopoly), next to
    // diag_revenue_concentration's decile view. Exactness: revenue in
    // 1e-4 units as BIGINT (price·(1−disc) is exactly 4dp), Σc² in
    // DECIMAL(38,0) (HUGEINT oracle — a 1e18-unit national total
    // squares past int64 exactly at the scale this documents), ONE
    // IEEE close per nation. Shape: lineitem aggregates to per-
    // supplier revenue FIRST (shuffle ∝ suppliers, map-side combined),
    // the supplier→nation dimension joins hash-side (broadcastable at
    // test SF, still shuffle-safe when the dim outgrows the cap), and
    // the per-nation agg + 25-row name join are bounded.
    "mine_hhi_concentration" -> ((s, d) => {
      val dec4 = DecimalType(18, 4)
      val dec38 = DecimalType(38, 0)
      val perSupp = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)) * 10000).cast("long").as("c"))
      val byNation = perSupp
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_firms"),
          sum(col("c").cast(dec38)).as("t"),
          sum(col("c").cast(dec38) * col("c").cast(dec38)).as("c2"),
          max(col("c")).as("cmax"))
      byNation
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n_firms"),
          r4(col("c2").cast(DoubleType) * 10000.0 /
            (col("t").cast(DoubleType) * col("t").cast(DoubleType))).as("hhi"),
          r4(col("cmax").cast(DoubleType) / col("t").cast(DoubleType))
            .as("top_share"))
        .orderBy(col("n_name"))
    }),

    // Gini coefficient of per-customer revenue — the single-number
    // inequality readout next to diag_revenue_concentration's deciles
    // and mine_hhi_concentration's per-market view. Rank formula
    // G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over x ascending; the GLOBAL
    // rank is NOT one window: customers bucket by value range (bucket
    // id monotone in cents, so within-bucket ranks + the ≤128-row
    // boundary offsets compose to the exact global rank — the
    // ts_late_data discipline). Σ i·xᵢ accumulates in
    // DECIMAL(38,0)/HUGEINT (rank 1e10 × cents 1e9 at the documented
    // scale is far past int64); ONE IEEE close, (cents, custkey) is a
    // total order so ranks cannot flip.
    "mine_gini_revenue" -> ((s, d) => {
      val dec2 = DecimalType(18, 2)
      val dec38 = DecimalType(38, 0)
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(dec2)) * 100).cast("long")
          .as("cents"))
      val bounds = rev.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      val bk = rev.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((cents - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${GiniBuckets - 1}) DIV $GiniBuckets) AS INT)"))
        .drop("lo", "hi")
      val per = bk.groupBy(col("bk")).agg(count(lit(1)).as("bc"))
      val wB = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = per.withColumn("boff",
        coalesce(sum(col("bc")).over(wB), lit(0L)))
        .select(col("bk"), col("boff"))
      val wIn = Window.partitionBy(col("bk"))
        .orderBy(col("cents"), col("o_custkey"))
      bk.join(off, Seq("bk"))
        .withColumn("i", col("boff") + row_number().over(wIn))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents").cast(dec38)).as("t"),
          sum(col("i").cast(dec38) * col("cents").cast(dec38)).as("ixs"))
        .select(col("n_customers"),
          r4(col("t").cast(DoubleType) / 100.0).as("total_revenue"),
          r4(lit(2.0) * col("ixs").cast(DoubleType) /
            (col("n_customers").cast(DoubleType) * col("t").cast(DoubleType)) -
            (col("n_customers") + 1).cast(DoubleType) /
              col("n_customers").cast(DoubleType)).as("gini"))
    }),

    // Spearman rank correlation between a supplier's revenue and its
    // customer BREADTH (distinct buyers) — "do the big earners also
    // sell widely, or is revenue concentrated in narrow accounts?"
    // The monotone-association number next to agg_corr_pairs'
    // Pearson (which a single whale order can swamp). Declared tie
    // convention: ranks on the (value, supplier) TOTAL order — exact
    // integers, engine-identical (average-rank Spearman under ties
    // is a different, float-valued statistic). BOTH global ranks
    // compose from value-range buckets (the gini discipline:
    // within-bucket row_number + ≤GiniBuckets boundary offsets) — no
    // unpartitioned window sees raw suppliers; Σd² in
    // DECIMAL(38,0)/HUGEINT, reported as BIGINT (exact to ~3e6
    // suppliers, declared); ρ = 1 − 6Σd²/(n(n²−1)) is one IEEE close.
    "mine_spearman_corr" -> ((s, d) => {
      val dec4 = DecimalType(18, 4)
      val dec38 = DecimalType(38, 0)
      val m = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)) * 10000).cast("long").as("cents"),
          countDistinct(col("o_custkey")).as("breadth"))
      def bucketRank(v: String, out: String): org.apache.spark.sql.DataFrame = {
        val vals = m.select(col("l_suppkey"), col(v))
        val bounds = vals.agg(min(col(v)).as("lo"), max(col(v)).as("hi"))
        val bk = vals.crossJoin(broadcast(bounds))
          .withColumn("bk", expr(
            s"CAST(($v - lo) DIV greatest(CAST(1 AS BIGINT), " +
              s"(hi - lo + ${GiniBuckets - 1}) DIV $GiniBuckets) AS INT)"))
          .drop("lo", "hi")
        val off = bk.groupBy(col("bk")).agg(count(lit(1)).as("bc"))
          .withColumn("boff", coalesce(sum(col("bc")).over(
            Window.orderBy(col("bk"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bk"), col("boff"))
        val wIn = Window.partitionBy(col("bk"))
          .orderBy(col(v), col("l_suppkey"))
        bk.join(broadcast(off), Seq("bk"))
          .select(col("l_suppkey"),
            (col("boff") + row_number().over(wIn)).as(out))
      }
      bucketRank("cents", "ra").join(bucketRank("breadth", "rb"),
          Seq("l_suppkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(((col("ra") - col("rb")) * (col("ra") - col("rb")))
            .cast(dec38)).as("d2d"))
        .select(col("n_suppliers"), col("d2d").cast("long").as("sum_d2"),
          r4(when(col("n_suppliers") < 2, lit(0.0)).otherwise(
            lit(1.0) - lit(6.0) * col("d2d").cast(DoubleType) /
              (col("n_suppliers").cast(DoubleType) *
                (col("n_suppliers").cast(DoubleType) *
                  col("n_suppliers").cast(DoubleType) - 1.0)))).as("rho"))
    }),

    // Theil T inequality index of per-customer revenue with its
    // between/within-nation decomposition — the inequality number
    // that DECOMPOSES (gini cannot): how much of the concentration
    // is nations being rich vs spread WITHIN nations. Exact-integer
    // cents; each ln term is the identical IEEE expression in both
    // engines, 4dp-quantized, then weighted by INTEGER cents into
    // exact DECIMAL(38,4) sums (the zipf discipline); one double
    // division closes each component; theil_within = theil −
    // theil_between by declared identity. Zero-revenue customers
    // contribute 0·ln0 = 0 and are excluded (x ln x → 0, declared).
    // Shape: one per-customer agg, one ≤25-nation agg, both map-side
    // combined; no window anywhere.
    "mine_theil_index" -> ((s, d) => {
      val dec2 = DecimalType(18, 2)
      val dec38 = DecimalType(38, 0)
      val dec384 = DecimalType(38, 4)
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(dec2)) * 100).cast("long")
          .as("cents"))
        .filter(col("cents") > 0)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      val tot = rev.agg(count(lit(1)).as("n"),
        sum(col("cents").cast(dec38)).as("t"))
      val terms = rev.crossJoin(broadcast(tot))
        .withColumn("li", expr(
          "CAST(round(ln(CAST(cents AS DOUBLE) * n / CAST(t AS DOUBLE)), 4)" +
            " AS DECIMAL(18,4))"))
        .groupBy(col("c_nationkey"), col("n"), col("t"))
        .agg(count(lit(1)).as("ng"),
          sum(col("cents").cast(dec38)).as("tg"),
          sum(col("cents").cast(dec384) * col("li")).as("sw"))
      terms
        .withColumn("lg", expr(
          "CAST(round(ln(CAST(tg AS DOUBLE) * n / " +
            "(CAST(ng AS DOUBLE) * CAST(t AS DOUBLE))), 4) AS DECIMAL(18,4))"))
        .groupBy(col("n"), col("t"))
        .agg(sum(col("sw")).as("swt"),
          sum(col("tg").cast(dec384) * col("lg")).as("sb"))
        .select(col("n").as("n_customers"),
          r4(col("swt").cast(DoubleType) / col("t").cast(DoubleType))
            .as("theil"),
          r4(col("sb").cast(DoubleType) / col("t").cast(DoubleType))
            .as("theil_between"),
          r4(r4(col("swt").cast(DoubleType) / col("t").cast(DoubleType)) -
            r4(col("sb").cast(DoubleType) / col("t").cast(DoubleType)))
            .as("theil_within"))
    }),

    // rank-biased overlap (RBO, p = ½, depth 20) between the odd- and
    // even-month supplier revenue rankings — "did the leaderboard
    // actually change?" as ONE number (mine_rank_movers lists the
    // movers; RBO scores the whole top-list agreement, weighting the
    // head more). p = ½ makes every weight a DYADIC rational: the
    // depth-d term is 0.5·0.5^(d−1)·X_d/d with X_d = |A_d ∩ B_d| —
    // pow(0.5, d) is EXACT in IEEE for d ≤ 20 in both engines, the
    // division 8dp-quantizes per depth, and the ≤20 terms sum as
    // exact decimals. Shape: two bounded per-supplier aggs (one scan,
    // month-parity split in the same agg), top-20 via
    // TakeOrderedAndProject, a ≤20×20 join, depths explode
    // pipeline-side. Ranks tie-break on the supplier key.
    "mine_rank_rbo" -> ((s, d) => {
      val dec2 = DecimalType(18, 2)
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(
          (coalesce(sum(when(month(col("l_shipdate")) % 2 === 1,
            col("l_extendedprice")).cast(dec2)), lit(0).cast(dec2)) * 100)
            .cast("long").as("codd"),
          (coalesce(sum(when(month(col("l_shipdate")) % 2 === 0,
            col("l_extendedprice")).cast(dec2)), lit(0).cast(dec2)) * 100)
            .cast("long").as("cev"))
      def top20(c: String, rk: String) = rev
        .orderBy(desc(c), col("l_suppkey")).limit(20)
        .select(col("l_suppkey"),
          row_number().over(Window.orderBy(desc(c), col("l_suppkey")))
            .as(rk))
      val joined = top20("codd", "ra").join(top20("cev", "rb"), Seq("l_suppkey"))
        .select(greatest(col("ra"), col("rb")).as("m"))
      joined
        .select(col("m"), explode(expr("sequence(1, 20)")).as("dpt"))
        .filter(col("m") <= col("dpt"))
        .groupBy(col("dpt")).agg(count(lit(1)).as("xd"))
        .select(col("dpt"), col("xd"), expr(
          "CAST(round(0.5 * power(0.5, dpt - 1) * xd / dpt, 8)" +
            " AS DECIMAL(18,8))").as("term"))
        .agg(coalesce(max(when(col("dpt") === 20, col("xd"))), lit(0L))
          .as("n_common_20"),
          r4(coalesce(sum(col("term")), lit(0).cast(DecimalType(18, 8)))
            .cast(DoubleType)).as("rbo"))
    }),

    // difference-in-differences readout: mean order value by arm
    // (even/odd custkey — the established A/B split) × period
    // (calendar halves H1/H2), DiD = (T₂−T₁) − (C₂−C₁) — the causal
    // panel estimate that subtracts the shared seasonal drift the raw
    // before/after comparison confounds (completing the experiment
    // family: z-test on proportions, Welch on means, DiD on panels).
    // EXACT sufficient statistics: integer cents and counts per cell;
    // each mean is ONE double division, the DiD one fixed IEEE
    // expression. One scan, one 4-cell agg.
    "mine_diff_in_diff" -> ((s, d) => {
      val dec2 = DecimalType(18, 2)
      val cells = Tables.orders(s, d)
        .select((pmod(col("o_custkey"), lit(2L)) === 0).as("treated"),
          (month(col("o_orderdate")) >= 7).as("post"),
          col("o_totalprice"))
        .groupBy(col("treated"), col("post"))
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast(dec2)) * 100).cast("long").as("cents"))
      def cell(t: Boolean, p: Boolean, c: String) =
        max(when(col("treated") === t && col("post") === p, col(c)))
      cells.agg(
          cell(true, false, "n").as("n_t1"), cell(true, true, "n").as("n_t2"),
          cell(false, false, "n").as("n_c1"), cell(false, true, "n").as("n_c2"),
          cell(true, false, "cents").as("s_t1"),
          cell(true, true, "cents").as("s_t2"),
          cell(false, false, "cents").as("s_c1"),
          cell(false, true, "cents").as("s_c2"))
        .withColumn("m_t1", col("s_t1").cast(DoubleType) / 100.0 / col("n_t1"))
        .withColumn("m_t2", col("s_t2").cast(DoubleType) / 100.0 / col("n_t2"))
        .withColumn("m_c1", col("s_c1").cast(DoubleType) / 100.0 / col("n_c1"))
        .withColumn("m_c2", col("s_c2").cast(DoubleType) / 100.0 / col("n_c2"))
        .select(col("n_t1"), col("n_t2"), col("n_c1"), col("n_c2"),
          r4(col("m_t1")).as("mean_treat_pre"),
          r4(col("m_t2")).as("mean_treat_post"),
          r4(col("m_c1")).as("mean_ctrl_pre"),
          r4(col("m_c2")).as("mean_ctrl_post"),
          r4(col("m_t2") - col("m_t1") - (col("m_c2") - col("m_c1")))
            .as("did"))
    }),

    // majority-class next-event baseline: per previous type, predict
    // the most frequent next type (ties → lexicographic) and score
    // the whole transition table — the accuracy floor any sequence
    // model must beat before it earns its keep (mine_seq_transitions
    // publishes the matrix, mine_markov_stationary its long-run
    // state; this is the EVALUATION number on top). Exact integers:
    // per-row majority via max(struct(n, rev)) over the (count,
    // reversed-type) total order, accuracy = Σ majority / Σ all, one
    // close. Aggregates bounded by types².
    "mine_markov_accuracy" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val per = trans.groupBy(col("prev_type"))
        .agg(sum(col("n")).as("row_n"),
          // lexicographic tie-break DOWNWARD: flip the type through
          // an impossible-high sentinel is avoided by min_by shape —
          // max on (n, next_type) would prefer the LAST type; use
          // two-stage: max n, then min type attaining it
          max(col("n")).as("maxn"))
      val best = trans.join(per, Seq("prev_type"))
        .filter(col("n") === col("maxn"))
        .groupBy(col("prev_type"))
        .agg(max(col("row_n")).as("row_n"), max(col("maxn")).as("maxn"),
          min(col("next_type")).as("pred_next"))
      val tot = best.agg(sum(col("row_n")).as("t"), sum(col("maxn")).as("hit"))
      best.crossJoin(broadcast(tot))
        .select(col("prev_type"), col("pred_next"), col("row_n"),
          col("maxn").as("n_correct"),
          r4(col("maxn").cast(DoubleType) / col("row_n")).as("row_accuracy"),
          r4(col("hit").cast(DoubleType) / col("t")).as("overall_accuracy"))
        .orderBy(col("prev_type"))
    }),

    // frequent 3-itemsets over the brand baskets — mine_assoc_rules'
    // pair view extended one order (the pair says razor→blade, the
    // triple razor+blade→gel — the cross-sell bundle): support and
    // 3-way lift = support·n²/(s_a·s_b·s_c). Shape discipline
    // unchanged: per-order SORTED brand sets in ONE map-side-combined
    // shuffle, a<b<c triples explode pipeline-side (bounded ≤ C(7,3)
    // per order by lineitem count), only the triple agg shuffles;
    // brand totals broadcast; the lift denominator multiplies as
    // DOUBLE (three 1e9-order brand counts overflow int64 at the
    // documented scale).
    "mine_itemsets_3" -> ((s, d) => {
      graft.functions.SortedCombinations.register(s)
      val ob = brandBaskets(s, d)
      val tri = ob.groupBy(col("ok"))
        .agg(array_sort(collect_set(col("b"))).as("bs"))
        // r15: native sorted_triples generator — same a<b<c stream as
        // the doubly-flattened transform/slice composition (see
        // GraphOps.coCitePairs for the pair-case rationale)
        .select(expr("sorted_triples(bs)")
          .as(Seq("brand_a", "brand_b", "brand_c")))
        .groupBy(col("brand_a"), col("brand_b"), col("brand_c"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= Itemset3MinSupport)
      val totals = ob.groupBy(col("b")).agg(count(lit(1)).as("sb"))
      val n = ob.agg(countDistinct(col("ok")).as("n_orders"))
      tri
        .join(broadcast(totals.select(col("b").as("brand_a"),
          col("sb").as("sa"))), Seq("brand_a"))
        .join(broadcast(totals.select(col("b").as("brand_b"),
          col("sb").as("s2"))), Seq("brand_b"))
        .join(broadcast(totals.select(col("b").as("brand_c"),
          col("sb").as("s3"))), Seq("brand_c"))
        .crossJoin(broadcast(n))
        .select(col("brand_a"), col("brand_b"), col("brand_c"),
          col("support"),
          r4(col("support").cast(DoubleType) * col("n_orders") *
            col("n_orders") /
            (col("sa").cast(DoubleType) * col("s2") * col("s3")))
            .as("lift3"))
        .orderBy(col("brand_a"), col("brand_b"), col("brand_c"))
    }),

    // exact two-sample Kolmogorov–Smirnov drift statistic between the
    // odd- and even-month order-value distributions — the
    // nonparametric sibling of diag_drift_psi (PSI needs binning
    // choices; KS is the sup over EVERY cut point, exactly): D =
    // max |F₁ − F₂| computed as the INTEGER max of
    // |cum₁·n₂ − cum₂·n₁| over distinct values — no float ever enters
    // the argmax, so the witness price cannot flip. The global
    // cumulative composes from value-range buckets (the ts_late_data
    // discipline: per-bucket sums → ≤128-row boundary cumulative →
    // within-bucket windows + offsets); products in
    // DECIMAL(38,0)/HUGEINT.
    "diag_drift_ks" -> ((s, d) => {
      val dec38 = DecimalType(38, 0)
      val v = Tables.orders(s, d)
        .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("v"),
          (month(col("o_orderdate")) % 2 === 1).as("odd"))
        .groupBy(col("v"))
        .agg(count_if(col("odd")).as("c1"), count_if(!col("odd")).as("c2"))
      val bounds = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val bk = v.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((v - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${KsBuckets - 1}) DIV $KsBuckets) AS INT)"))
        .drop("lo", "hi")
      val per = bk.groupBy(col("bk"))
        .agg(sum(col("c1")).as("b1"), sum(col("c2")).as("b2"))
      val wB = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = per
        .withColumn("o1", coalesce(sum(col("b1")).over(wB), lit(0L)))
        .withColumn("o2", coalesce(sum(col("b2")).over(wB), lit(0L)))
        .select(col("bk"), col("o1"), col("o2"))
      val wIn = Window.partitionBy(col("bk")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = v.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      bk.join(off, Seq("bk")).crossJoin(broadcast(tot))
        .withColumn("cum1", col("o1") + sum(col("c1")).over(wIn))
        .withColumn("cum2", col("o2") + sum(col("c2")).over(wIn))
        .withColumn("dn", abs(col("cum1").cast(dec38) * col("n2") -
          col("cum2").cast(dec38) * col("n1")))
        .agg(max(col("n1")).as("n_a"), max(col("n2")).as("n_b"),
          max(struct(col("dn"), (-col("v")).as("nv"))).as("m"))
        .select(col("n_a"), col("n_b"),
          r4(col("m.dn").cast(DoubleType) /
            (col("n_a").cast(DoubleType) * col("n_b"))).as("ks"),
          r4((-col("m.nv")).cast(DoubleType) / 100.0).as("ks_at_price"))
    }),

    // Weight-of-Evidence / Information-Value scorecard: does account
    // balance predict heavy buying? c_acctbal bins into 10 equal-width
    // buckets (broadcast bounds, integer DIV — no quantile sort),
    // target = the mine_ab_ztest heavy-buyer definition (≥ 14 orders),
    // WoE_i = ln(good-share/bad-share) with +1 Laplace smoothing (no
    // zero-cell blowups, declared), IV = Σ (g% − b%)·WoE — the
    // feature-screening number every credit/propensity model starts
    // from (IV < 0.02: useless; > 0.3: strong). Exact integer cells;
    // lns 4dp-quantized (zipf discipline), IV terms 8dp-quantized
    // then decimal-summed; aggregates bounded by the bin count.
    "mine_woe_iv" -> ((s, d) => {
      val ords = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val lab = Tables.customer(s, d)
        .join(ords, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("bal"),
          (coalesce(col("n_orders"), lit(0L)) >= AbConvThreshold).as("good"))
      val bounds = lab.agg(min(col("bal")).as("lo"), max(col("bal")).as("hi"))
      val binned = lab.crossJoin(broadcast(bounds))
        .withColumn("bin", expr(
          "CAST(least(CAST(9 AS BIGINT), (bal - lo) DIV greatest(" +
            "CAST(1 AS BIGINT), (hi - lo + 9) DIV 10)) AS INT)"))
        .groupBy(col("bin"))
        .agg(count_if(col("good")).as("g"), count_if(!col("good")).as("b"))
      val tot = binned.agg(sum(col("g")).as("tg"), sum(col("b")).as("tb"),
        count(lit(1)).as("k"))
      val woed = binned.crossJoin(broadcast(tot))
        .withColumn("gd", (col("g") + 1).cast(DoubleType) /
          (col("tg") + col("k")).cast(DoubleType))
        .withColumn("bd", (col("b") + 1).cast(DoubleType) /
          (col("tb") + col("k")).cast(DoubleType))
        .withColumn("woe", round(log(col("gd") / col("bd")), 4))
        .withColumn("term", expr(
          "CAST(round((gd - bd) * woe, 8) AS DECIMAL(18,8))"))
      val iv = woed.agg(r4(sum(col("term")).cast(DoubleType)).as("iv"))
      woed.crossJoin(broadcast(iv))
        .select(col("bin"), (col("g") + col("b")).as("n"),
          col("g").as("n_good"), col("b").as("n_bad"), col("woe"),
          col("iv"))
        .orderBy(col("bin"))
    }),

    // charm-pricing census: the distribution of order-total CENT
    // endings (price mod 1 dollar) — the ".99 effect" every retail
    // catalog audit looks for (a synthetic generator shows up here
    // instantly: uniform endings = no human priced these). Exact
    // integer mod; top 10 endings by count (ties → lower ending) via
    // TakeOrderedAndProject; the total is a broadcast scalar.
    "mine_price_endings" -> ((s, d) => {
      val e = Tables.orders(s, d)
        .select(pmod((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long"), lit(100L)).as("ending"))
        .groupBy(col("ending")).agg(count(lit(1)).as("n"))
      val tot = e.agg(sum(col("n")).as("t"))
      e.orderBy(desc("n"), col("ending")).limit(10)
        .crossJoin(broadcast(tot))
        .select(col("ending"), col("n"),
          r4(col("n").cast(DoubleType) / col("t")).as("share"))
        .orderBy(desc("n"), col("ending"))
    }),

    // ABC inventory classification: parts rank by revenue DESC; class
    // A holds everything before the 80% cumulative-share line, B to
    // 95%, C the tail — the Pareto shelf-space/attention split every
    // ops team runs (diag_revenue_concentration profiles customers by
    // decile; ABC cuts PARTS at fixed revenue lines). The class test
    // never touches a float: part p is A ⟺ 20·cum_before(p) < 4·...
    // spelled as cum_before·100 < 80·T on DECIMAL(38,0)/HUGEINT, and
    // cum_before in DESC order = T − cum_asc_inclusive, so the SAME
    // ascending value-bucket cumulative the Gini/KS ops use serves
    // here (per-bucket sums → ≤128-row boundary window → within-
    // bucket windows + offsets; no global sort).
    "mine_abc_classes" -> ((s, d) => {
      val dec2 = DecimalType(18, 2)
      val dec38 = DecimalType(38, 0)
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))) * 10000).cast("long").as("cents"))
      val bounds = rev.agg(min(col("cents")).as("lo"),
        max(col("cents")).as("hi"))
      val bk = rev.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((cents - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${GiniBuckets - 1}) DIV $GiniBuckets) AS INT)"))
        .drop("lo", "hi")
      val per = bk.groupBy(col("bk"))
        .agg(sum(col("cents").cast(dec38)).as("bs"))
      val wB = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = per.withColumn("boff",
        coalesce(sum(col("bs")).over(wB), lit(0).cast(dec38)))
        .select(col("bk"), col("boff"))
      val wIn = Window.partitionBy(col("bk"))
        .orderBy(col("cents"), col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = rev.agg(sum(col("cents").cast(dec38)).as("t"))
      bk.join(off, Seq("bk")).crossJoin(broadcast(tot))
        .withColumn("cumAsc",
          col("boff") + sum(col("cents").cast(dec38)).over(wIn))
        .withColumn("cumBefore", col("t") - col("cumAsc"))
        .withColumn("cls",
          when(col("cumBefore") * 100 < col("t") * 80, "A")
            .when(col("cumBefore") * 100 < col("t") * 95, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("cents").cast(dec38)).as("crev"))
        .crossJoin(broadcast(tot))
        .select(col("cls"), col("n_parts"),
          r4(col("crev").cast(DoubleType) / 10000.0).as("revenue"),
          r4(col("crev").cast(DoubleType) / col("t").cast(DoubleType))
            .as("share"))
        .orderBy(col("cls"))
    }),

    // basket-size distribution: lineitems per order → order-count
    // histogram with shares and cumulative shares — the order-shape
    // profile behind every fulfillment/bundling decision (and the
    // declared-bound witness for the pair/triple mining ops, whose
    // per-order fan-out assumes exactly this histogram stays small).
    // Two exact hash aggregates (order sizes, then the ≤max-size
    // histogram); the cumulative window runs over the bounded
    // histogram; one ratio close per row.
    "mine_basket_size_dist" -> ((s, d) => {
      val sz = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_orders"))
      val tot = sz.agg(sum(col("n_orders")).as("t"))
      val w = Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sz.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("n_orders")).over(w))
        .select(col("k").as("basket_size"), col("n_orders"),
          r4(col("n_orders").cast(DoubleType) / col("t")).as("share"),
          r4(col("cum").cast(DoubleType) / col("t")).as("cum_share"))
        .orderBy(col("basket_size"))
    }),

    // intraclass correlation of line price by supplier: ICC =
    // SS_between/SS_total — how much of price variance the supplier
    // IDENTITY explains (≈0: prices are market-wide, supplier is not
    // a useful blocking/clustering key; high: per-supplier pricing —
    // and any experiment randomizing by supplier needs the
    // design-effect correction this number feeds). The high-
    // cardinality sibling of ts_dow_anova's 7-group ANOVA: with
    // thousands of groups only the decomposition ratio is reportable.
    // Per-group Σ²/n terms are rationals — each closes as one
    // identical IEEE division, 4dp-quantizes into DECIMAL(38,4), and
    // decimal-sums (the zipf discipline); global moments exact in
    // DECIMAL(38,0)/HUGEINT; two closing expressions.
    "mine_icc_price" -> ((s, d) => {
      val dec38 = DecimalType(38, 0)
      val x = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("c"))
      val per = x.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("ng"), sum(col("c").cast(dec38)).as("sg"))
        .agg(count(lit(1)).as("k"),
          sum(expr("CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)" +
            " / ng, 4) AS DECIMAL(38,4))")).as("tsum"))
      val tot = x.agg(count(lit(1)).as("n"), sum(col("c").cast(dec38)).as("s"),
        sum(col("c").cast(dec38) * col("c").cast(dec38)).as("sxx"))
      per.crossJoin(broadcast(tot))
        .withColumn("cm", col("s").cast(DoubleType) *
          col("s").cast(DoubleType) / col("n"))
        .withColumn("ssb", col("tsum").cast(DoubleType) - col("cm"))
        .withColumn("sst", col("sxx").cast(DoubleType) - col("cm"))
        .select(col("n").as("n_rows"), col("k").as("n_groups"),
          r4(when(col("sst") <= 0.0, lit(0.0))
            .otherwise(col("ssb") / col("sst"))).as("icc"))
    }),

    // sample-ratio-mismatch guardrail for the even/odd-custkey A/B
    // split: z = (n_A − n_B)/√(n_A + n_B) against the 50/50 design,
    // flagged at |z| > 3 — THE pre-readout check every experiment
    // platform runs (an SRM means assignment or logging is broken
    // and every downstream readout — z-test, Welch, DiD, ratio CI —
    // is invalid; this op gates that whole family). Exact integer
    // unit counts (distinct customers per arm); one IEEE close;
    // verdict on the ROUNDED z.
    "mine_ab_srm" -> ((s, d) => {
      val arms = Tables.orders(s, d)
        .select(col("o_custkey")).distinct()
        .agg(count_if(pmod(col("o_custkey"), lit(2L)) === 0).as("n_a"),
          count_if(pmod(col("o_custkey"), lit(2L)) === 1).as("n_b"))
      arms
        .withColumn("z", (col("n_a") - col("n_b")).cast(DoubleType) /
          sqrt((col("n_a") + col("n_b")).cast(DoubleType)))
        .select(col("n_a"), col("n_b"), r4(col("z")).as("z"),
          (abs(r4(col("z"))) > 3.0).as("srm_detected"))
    }),

    // encoding-anomaly audit per source: documents containing
    // non-printable-ASCII characters and how many such characters —
    // the mojibake/binary-contamination gate an ingest runs before
    // any tokenizer sees the text (a double-encoded UTF-8 source or
    // a binary file that slipped a text sniff lights up here; clean
    // sources read zero). The character class [^ -~] (everything
    // outside space..tilde) is valid in BOTH regex engines — the PII
    // discipline; counts are exact integers from per-row codegen
    // regexp extraction; one bounded per-source agg.
    "diag_non_ascii_audit" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          size(expr("regexp_extract_all(text, '[^ -~]', 0)")).as("bad"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("bad") > 0).as("n_docs_flagged"),
          sum(col("bad").cast("long")).as("n_bad_chars"))
        .select(col("source"), col("n_docs"), col("n_docs_flagged"),
          col("n_bad_chars"),
          r4(col("n_docs_flagged").cast(DoubleType) / col("n_docs"))
            .as("flag_rate"))
        .orderBy(col("source"))
    }),

    // semi-structured schema profile of the event props column: every
    // JSON key's row count and share — the drift detector for the
    // one column a fixed schema can't pin (a new client version
    // shipping a new key, or dropping one, shows up here first;
    // scalar_json extracts KNOWN keys, this enumerates what's
    // actually there). Key explosion is map-side; one bounded
    // (key-universe) agg; scalar total broadcast.
    "diag_json_key_profile" -> ((s, d) => {
      val keys = Tables.events(s, d)
        .select(explode(expr("json_object_keys(props)")).as("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n_rows"))
      val tot = Tables.events(s, d).agg(count(lit(1)).as("t"))
      keys.crossJoin(broadcast(tot))
        .select(col("key"), col("n_rows"),
          r4(col("n_rows").cast(DoubleType) / col("t")).as("presence"))
        .orderBy(col("key"))
    }),

    // delta-method confidence interval for the RATIO metric revenue-
    // per-order, by arm (even/odd custkey) — the experimentation
    // lesson every platform relearns: a ratio of sums is NOT a mean
    // of ratios, and its variance needs the delta method
    // Var(X̄/Ȳ) ≈ (σx² + R²σy² − 2Rσxy)/(n·ȳ²) (naive per-user
    // averaging over-weights one-order customers; naive variance
    // ignores the X–Y correlation entirely). All sufficient sums
    // exact (cents BIGINT, squares/products DECIMAL(38,0)/HUGEINT
    // over per-customer aggregates); one fixed IEEE closing
    // expression per arm; ±1.96·se bounds on the ROUNDED pieces.
    "mine_ratio_metric_ci" -> ((s, d) => {
      val dec38 = DecimalType(38, 0)
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("x"), count(lit(1)).as("y"))
        .withColumn("arm",
          when(pmod(col("o_custkey"), lit(2L)) === 0, "treatment")
            .otherwise("control"))
      per.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec38)).as("sx"), sum(col("y").cast(dec38)).as("sy"),
          sum(col("x").cast(dec38) * col("x").cast(dec38)).as("sxx"),
          sum(col("y").cast(dec38) * col("y").cast(dec38)).as("syy"),
          sum(col("x").cast(dec38) * col("y").cast(dec38)).as("sxy"))
        .withColumn("r", col("sx").cast(DoubleType) / col("sy").cast(DoubleType))
        .withColumn("vx", (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast(DoubleType) / (col("n").cast(DoubleType) * col("n")))
        .withColumn("vy", (col("n") * col("syy") - col("sy") * col("sy"))
          .cast(DoubleType) / (col("n").cast(DoubleType) * col("n")))
        .withColumn("cxy", (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast(DoubleType) / (col("n").cast(DoubleType) * col("n")))
        .withColumn("ybar", col("sy").cast(DoubleType) / col("n"))
        .withColumn("se", sqrt(
          (col("vx") + col("r") * col("r") * col("vy") -
            lit(2.0) * col("r") * col("cxy")) /
          (col("n") * col("ybar") * col("ybar"))))
        .select(col("arm"), col("n").as("n_units"),
          r4(col("r") / 100.0).as("revenue_per_order"),
          r4(col("se") / 100.0).as("se"),
          r4((col("r") - lit(1.96) * col("se")) / 100.0).as("ci_low"),
          r4((col("r") + lit(1.96) * col("se")) / 100.0).as("ci_high"))
        .orderBy(col("arm"))
    }),

    // experiment power analysis: the per-arm sample size needed to
    // detect a 1% lift in per-customer revenue at α = 0.05 / 80%
    // power — n = 2σ²(z_{0.975}+z_{0.8})²/δ² with the z-sum squared
    // carried as the 4dp literal 7.8490 (neither engine evaluates a
    // normal quantile; the ts_dominant_period literal discipline) —
    // the "can we even run this test?" number that comes BEFORE
    // mine_ab_welch_t/ratio_metric_ci ever read a result. σ² from
    // exact moments (cents BIGINT, squares DECIMAL(38,0)/HUGEINT);
    // one IEEE close; ceil on identical doubles.
    "mine_power_sample_size" -> ((s, d) => {
      val dec38 = DecimalType(38, 0)
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("x"))
      per.agg(count(lit(1)).as("n"), sum(col("x").cast(dec38)).as("sx"),
          sum(col("x").cast(dec38) * col("x").cast(dec38)).as("sxx"))
        .withColumn("mean", col("sx").cast(DoubleType) / col("n"))
        .withColumn("variance",
          (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType) /
            (col("n").cast(DoubleType) * col("n")))
        .withColumn("mde", col("mean") * 0.01)
        .select(col("n").as("n_units"), r4(col("mean") / 100.0).as("mean"),
          r4(sqrt(col("variance")) / 100.0).as("sd"),
          r4(col("mde") / 100.0).as("mde_abs"),
          ceil(lit(2.0) * col("variance") * 7.8490 /
            (col("mde") * col("mde"))).cast("long").as("n_per_arm"))
    }),

    // monthly growth accounting: every month's actives decompose into
    // NEW (first month ever), RETAINED (also active last month) and
    // RESURRECTED (returning after a gap), with CHURNED = last
    // month's actives who left — the four numbers whose identity
    // actives_t = actives_{t−1} + new + resurrected − churned IS the
    // growth report (ts_cohort_retention tracks one cohort forward;
    // this explains each month's total). Exact integers: activity
    // collapses to distinct (user, month) rows (integer month index
    // — no float months_between, the cohort_ltv discipline), lag
    // windows per user classify transitions, bounded monthly output.
    "mine_growth_accounting" -> ((s, d) => {
      val um = Tables.events(s, d)
        .select(col("user_id"),
          (year(col("ts")) * 12 + month(col("ts"))).cast("long").as("m"))
        .distinct()
      val wU = Window.partitionBy(col("user_id")).orderBy(col("m"))
      val cls = um
        .withColumn("pm", lag(col("m"), 1).over(wU))
        .withColumn("status", when(col("pm").isNull, "new")
          .when(col("pm") === col("m") - 1, "retained")
          .otherwise("resurrected"))
      val act = cls.groupBy(col("m"))
        .agg(count(lit(1)).as("actives"),
          count_if(col("status") === "new").as("new_users"),
          count_if(col("status") === "retained").as("retained"),
          count_if(col("status") === "resurrected").as("resurrected"))
      // churned(t) = actives(t−1) − retained(t): last month's actives
      // who did not return — derived, not re-scanned
      val wM = Window.orderBy(col("m"))
      act
        .withColumn("churned",
          coalesce(lag(col("actives"), 1).over(wM), lit(0L)) -
            col("retained"))
        .select(expr("CAST((m - 1) DIV 12 AS INT)").as("year"),
          expr("CAST(((m - 1) % 12) + 1 AS INT)").as("month"),
          col("actives"), col("new_users"), col("retained"),
          col("resurrected"), col("churned"))
        .orderBy(col("year"), col("month"))
    }),

    // DAU/MAU stickiness per calendar month — THE product-engagement
    // ratio ("what share of the monthly audience shows up on an
    // average day"; ≥ 0.2 is the classic consumer bar): avg daily
    // uniques ÷ monthly uniques. Exact integers: per-day and
    // per-month distinct users are hash aggregates (shuffle ∝
    // distinct (day, user)); the ratio divides exact counts in the
    // identical IEEE order. Bounded monthly output.
    "mine_dau_mau" -> ((s, d) => {
      val dau = Tables.events(s, d)
        .select(date_trunc("month", col("ts")).as("month"),
          date_trunc("day", col("ts")).as("day"), col("user_id"))
        .groupBy(col("month"), col("day"))
        .agg(countDistinct(col("user_id")).as("du"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_days"), sum(col("du")).as("du_sum"))
      val mau = Tables.events(s, d)
        .groupBy(date_trunc("month", col("ts")).as("month"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, Seq("month"))
        .select(ntz(col("month")).as("month"), col("n_days"), col("mau"),
          r4(col("du_sum").cast(DoubleType) / col("n_days")).as("avg_dau"),
          r4(col("du_sum").cast(DoubleType) / col("n_days") / col("mau"))
            .as("stickiness"))
        .orderBy(col("month"))
    }),

    // Good–Turing frequency-of-frequencies over part purchase counts:
    // N_k = #parts bought exactly k times (k ≤ 10), the smoothed
    // next-count estimate k* = (k+1)·N_{k+1}/N_k, and the unseen-mass
    // estimate p₀ = N₁/N — the "how much have we NOT seen" number
    // (the species-richness question a crawl/catalog coverage
    // discussion runs on; same math a language model's unseen-token
    // mass uses). Exact integers end-to-end, two IEEE ratios at the
    // close; both aggregates bounded (counts histogram ≤ max
    // multiplicity, output ≤ 10 rows).
    "mine_good_turing" -> ((s, d) => {
      val cnt = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val fof = cnt.groupBy(col("c").as("k")).agg(count(lit(1)).as("n_k"))
      val tot = cnt.agg(sum(col("c")).as("n_total"))
      val nxt = fof.select((col("k") - 1).as("k"), col("n_k").as("n_k1"))
      fof.filter(col("k") <= 10)
        .join(nxt, Seq("k"), "left")
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(fof.filter(col("k") === 1)
          .agg(coalesce(max(col("n_k")), lit(0L)).as("n_1"))))
        .select(col("k"), col("n_k"),
          r4(when(col("n_k1").isNull, lit(0.0)).otherwise(
            (col("k") + 1).cast(DoubleType) * col("n_k1") / col("n_k")))
            .as("k_star"),
          r4(col("n_1").cast(DoubleType) / col("n_total")).as("p_unseen"))
        .orderBy(col("k"))
    }))

  val oracle: Map[String, String] = Map(
    "mine_naive_bayes" ->
      s"""WITH cell AS (
         |  SELECT l_returnflag AS f1, l_linestatus AS f2,
         |    CASE WHEN l_tax > CAST(0.04 AS DOUBLE) THEN 1 ELSE 0 END AS y,
         |    count(*) AS cnt
         |  FROM lineitem GROUP BY 1, 2, 3),
         |tots AS (SELECT SUM(cnt) AS tot, count(DISTINCT f1) AS v1,
         |  count(DISTINCT f2) AS v2 FROM cell),
         |cls AS (SELECT y, SUM(cnt) AS cn FROM cell GROUP BY 1),
         |m1 AS (SELECT f1, y, SUM(cnt) AS nf1 FROM cell GROUP BY 1, 2),
         |m2 AS (SELECT f2, y, SUM(cnt) AS nf2 FROM cell GROUP BY 1, 2),
         |grid AS (
         |  SELECT a.f1, b.f2, c.y, c.cn, t.tot, t.v1, t.v2,
         |    coalesce(m1.nf1, 0) AS nf1, coalesce(m2.nf2, 0) AS nf2,
         |    coalesce(cell.cnt, 0) AS cnt
         |  FROM (SELECT DISTINCT f1 FROM cell) a
         |  CROSS JOIN (SELECT DISTINCT f2 FROM cell) b
         |  CROSS JOIN cls c CROSS JOIN tots t
         |  LEFT JOIN m1 ON m1.f1 = a.f1 AND m1.y = c.y
         |  LEFT JOIN m2 ON m2.f2 = b.f2 AND m2.y = c.y
         |  LEFT JOIN cell ON cell.f1 = a.f1 AND cell.f2 = b.f2
         |    AND cell.y = c.y),
         |scored AS (
         |  SELECT f1, f2, y, cnt, tot,
         |    ${nbScore("cn", "nf1", "nf2")} AS score
         |  FROM grid),
         |bycell AS (
         |  SELECT f1, f2, max(tot) AS tot, SUM(cnt) AS n_cell,
         |    max(CASE WHEN y = 0 THEN score END) AS s0,
         |    max(CASE WHEN y = 1 THEN score END) AS s1,
         |    SUM(CASE WHEN y = 1 THEN cnt ELSE 0 END) AS n1
         |  FROM scored GROUP BY 1, 2),
         |pred AS (SELECT *, CASE WHEN s1 >= s0 THEN 1 ELSE 0 END AS predicted
         |  FROM bycell),
         |acc AS (SELECT SUM(CASE WHEN predicted = 1 THEN n1
         |    ELSE n_cell - n1 END) AS corr, max(tot) AS tot FROM pred)
         |SELECT p.f1, p.f2, CAST(p.n_cell AS BIGINT) AS n_cell,
         |  CAST(p.n1 AS BIGINT) AS n1,
         |  round(p.s0, 8) AS score0, round(p.s1, 8) AS score1,
         |  CAST(p.predicted AS BIGINT) AS predicted,
         |  round(CAST(a.corr AS DOUBLE) / CAST(a.tot AS DOUBLE), 6) AS accuracy
         |FROM pred p CROSS JOIN acc a ORDER BY p.f1, p.f2""".stripMargin,

    "mine_logreg_gd" -> {
      val rounds = (1 to LogregRounds).map { r =>
        s"""g$r AS (
           |  SELECT sum(g0r) AS sg0, sum(g1r) AS sg1, sum(g2r) AS sg2,
           |    count(*) AS gn, max(w0) AS pw0, max(w1) AS pw1,
           |    max(w2) AS pw2
           |  FROM (SELECT w0, w1, w2, ${LogregGrad.mkString(", ")}
           |        FROM feat CROSS JOIN wc${r - 1}) t$r),
           |wc$r AS (SELECT ${LogregUpdate.mkString(", ")} FROM g$r)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH feat AS MATERIALIZED (
         |  SELECT ${LogregFeat.mkString(", ")} FROM lineitem),
         |wc0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0,
         |  CAST(0.0 AS DOUBLE) AS w1, CAST(0.0 AS DOUBLE) AS w2),
         |$rounds,
         |sc AS (
         |  SELECT w0, w1, w2,
         |    (CASE WHEN $LogregSig >= 0.5 THEN CAST(1.0 AS DOUBLE)
         |          ELSE CAST(0.0 AS DOUBLE) END = y) AS correct
         |  FROM feat CROSS JOIN wc$LogregRounds),
         |fin AS (
         |  SELECT count(*) AS n,
         |    sum(CASE WHEN correct THEN 1 ELSE 0 END) AS ncorr,
         |    max(w0) AS fw0, max(w1) AS fw1, max(w2) AS fw2 FROM sc)
         |SELECT CAST(n AS BIGINT) AS n, round(fw0, 4) AS w0,
         |  round(fw1, 4) AS w1, round(fw2, 4) AS w2,
         |  round(CAST(ncorr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy
         |FROM fin""".stripMargin
    },

    "mine_linreg_normal" ->
      s"""WITH q AS (
         |  SELECT
         |    CAST(CAST(l_quantity AS DECIMAL(18,4)) * $LinregUnit
         |      AS DECIMAL(20,0)) AS x1,
         |    CAST(CAST(l_discount AS DECIMAL(18,4)) * $LinregUnit
         |      AS DECIMAL(20,0)) AS x2,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * $LinregUnit
         |      AS DECIMAL(20,0)) AS y
         |  FROM lineitem),
         |sums AS (
         |  SELECT count(*) AS n,
         |    SUM(x1) AS ds1, SUM(x2) AS ds2, SUM(y) AS dsy,
         |    SUM(x1*x1) AS ds11, SUM(x1*x2) AS ds12, SUM(x2*x2) AS ds22,
         |    SUM(x1*y) AS ds1y, SUM(x2*y) AS ds2y, SUM(y*y) AS dsyy
         |  FROM q),
         |c AS (SELECT ${LinregCast.mkString(", ")} FROM sums),
         |dets AS (SELECT ${LinregDets.mkString(", ")} FROM c)
         |SELECT ${LinregOut.mkString(", ")} FROM dets""".stripMargin,

    "mine_markov_stationary" ->
      s"""WITH tr AS (
         |  SELECT p, nx, count(*) AS c FROM (
         |    SELECT event_type AS nx,
         |      lag(event_type) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id) AS p
         |    FROM events) t
         |  WHERE p IS NOT NULL GROUP BY 1, 2),
         |q AS (
         |  SELECT tr.p, tr.nx, tr.c * $MarkovUnit // r.r AS q
         |  FROM tr JOIN (SELECT p, CAST(sum(c) AS BIGINT) AS r
         |                FROM tr GROUP BY p) r USING (p)),
         |states AS (SELECT DISTINCT p AS s FROM tr
         |           UNION SELECT DISTINCT nx FROM tr),
         |ns AS (SELECT count(*) AS k FROM states),
         |p0 AS (SELECT s, ${MarkovUnit * MarkovUnit} // k AS x
         |       FROM states, ns),
         |$markovUnrolledSql
         |SELECT s AS event_type,
         |  round(CAST(x AS DOUBLE) / ${MarkovUnit * MarkovUnit}, 4)
         |    AS stationary
         |FROM p$MarkovRounds ORDER BY event_type""".stripMargin,

    "mine_cohort_ltv" ->
      """WITH mo AS (
        |  SELECT o_custkey, o_totalprice,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS midx
        |  FROM orders),
        |fo AS (SELECT o_custkey, min(midx) AS m0 FROM mo GROUP BY 1),
        |sized AS (SELECT m0, count(*) AS cohort_n FROM fo GROUP BY 1),
        |rev AS (
        |  SELECT m0, midx - m0 AS moff,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM mo JOIN fo USING (o_custkey) GROUP BY 1, 2)
        |SELECT m0 AS cohort_midx, moff, cohort_n,
        |  round(CAST(rev AS DOUBLE), 4) AS revenue,
        |  CAST(sum(rev) OVER (PARTITION BY m0 ORDER BY moff
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100
        |    AS BIGINT) // cohort_n / 100.0 AS cum_ltv
        |FROM rev JOIN sized USING (m0)
        |ORDER BY cohort_midx, moff""".stripMargin,

    "mine_price_elasticity" ->
      """WITH xy AS (
        |  SELECT p_brand,
        |    CAST(round(ln(l_extendedprice), 4) AS DECIMAL(18,4)) AS x,
        |    CAST(round(ln(l_quantity), 4) AS DECIMAL(18,4)) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |st AS (
        |  SELECT p_brand, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(CAST(x * x AS DECIMAL(38,8))) AS sxx,
        |    sum(CAST(x * y AS DECIMAL(38,8))) AS sxy
        |  FROM xy GROUP BY 1)
        |SELECT p_brand, n,
        |  round((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
        |    4) AS elasticity
        |FROM st ORDER BY p_brand""".stripMargin,

    "mine_ab_ztest" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    CASE WHEN count(*) FILTER (WHERE event_type = 'purchase')
         |      >= $AbConvThreshold THEN 1 ELSE 0 END AS conv,
         |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
         |  FROM events GROUP BY user_id),
         |arms AS (
         |  SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS x
         |  FROM pu GROUP BY arm),
         |ab AS (
         |  SELECT
         |    (SELECT n FROM arms WHERE arm = 'A') AS na,
         |    (SELECT x FROM arms WHERE arm = 'A') AS xa,
         |    (SELECT n FROM arms WHERE arm = 'B') AS nb,
         |    (SELECT x FROM arms WHERE arm = 'B') AS xb),
         |zz AS (
         |  SELECT *,
         |    CAST(xa AS DOUBLE) / na AS pa,
         |    CAST(xb AS DOUBLE) / nb AS pb,
         |    CAST(xa + xb AS DOUBLE) / (na + nb) AS pp
         |  FROM ab),
         |z AS (
         |  SELECT *,
         |    CASE WHEN pp = 0.0 OR pp = 1.0 THEN 0.0
         |      ELSE (pa - pb)
         |        / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)) END AS zv
         |  FROM zz)
         |SELECT na, xa, nb, xb,
         |  round(pa, 4) AS rate_a, round(pb, 4) AS rate_b,
         |  round(zv, 4) AS z, abs(zv) > 1.96 AS significant
         |FROM z""".stripMargin,

    "mine_ab_welch_t" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        |      AS BIGINT) AS cents,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |arms AS (
        |  SELECT arm, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sc,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS scc
        |  FROM pu GROUP BY arm),
        |ab AS (
        |  SELECT
        |    (SELECT n FROM arms WHERE arm = 'A') AS na,
        |    (SELECT sc FROM arms WHERE arm = 'A') AS sa,
        |    (SELECT scc FROM arms WHERE arm = 'A') AS sca,
        |    (SELECT n FROM arms WHERE arm = 'B') AS nb,
        |    (SELECT sc FROM arms WHERE arm = 'B') AS sb,
        |    (SELECT scc FROM arms WHERE arm = 'B') AS scb),
        |m AS (
        |  SELECT *,
        |    CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
        |    (CAST(sca AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
        |      / (na - 1) AS va,
        |    (CAST(scb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
        |      / (nb - 1) AS vb
        |  FROM ab),
        |se AS (SELECT *, va / na + vb / nb AS se2 FROM m),
        |tv AS (
        |  SELECT *,
        |    CASE WHEN se2 = 0.0 THEN 0.0
        |      ELSE (ma - mb) / sqrt(se2) END AS t,
        |    CASE WHEN se2 = 0.0 THEN 0.0
        |      ELSE se2 * se2 /
        |        ((va / na) * (va / na) / (na - 1)
        |          + (vb / nb) * (vb / nb) / (nb - 1)) END AS dof
        |  FROM se)
        |SELECT na, nb,
        |  round(ma / 100.0, 4) AS mean_a, round(mb / 100.0, 4) AS mean_b,
        |  round(t, 4) AS t, round(dof, 4) AS dof,
        |  abs(t) > 1.96 AS significant
        |FROM tv""".stripMargin,

    "mine_survival_km" ->
      """WITH life AS (
        |  SELECT o_custkey,
        |    min(epoch_us(date_trunc('day', o_orderdate)) // 1000000 // 86400)
        |      AS fd,
        |    max(epoch_us(date_trunc('day', o_orderdate)) // 1000000 // 86400)
        |      AS ld
        |  FROM orders GROUP BY 1),
        |hz AS (SELECT max(ld) AS md FROM life),
        |marked AS (
        |  SELECT ld - fd AS t, (md - ld < 30) AS censored FROM life, hz),
        |byt AS (
        |  SELECT t, count(*) FILTER (WHERE NOT censored) AS d,
        |    count(*) FILTER (WHERE censored) AS c
        |  FROM marked GROUP BY t),
        |n AS (SELECT count(*) AS total FROM marked),
        |r AS (
        |  SELECT t, d, c,
        |    total - coalesce(CAST(sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS n_risk
        |  FROM byt, n),
        |lf AS (
        |  SELECT t, d, c, n_risk,
        |    CASE WHEN d < n_risk THEN
        |      CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 6)
        |        AS DECIMAL(18,6)) END AS lf,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dd
        |  FROM r)
        |SELECT t, n_risk, d, c,
        |  CASE WHEN CAST(max(dd) OVER cum AS INT) = 1 THEN 0.0
        |    ELSE round(exp(CAST(sum(lf) OVER cum AS DOUBLE)), 4) END
        |    AS survival
        |FROM lf
        |WINDOW cum AS (ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY t""".stripMargin,

    "mine_time_decay_score" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(date_trunc('day', ts)) // 1000000 // 86400 AS dayno
        |  FROM events),
        |mx AS (SELECT max(dayno) AS md FROM ev)
        |SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(cents >> CAST(least(md - dayno, 62) AS INT))
        |    AS DOUBLE) / 100.0, 4) AS decay_score
        |FROM ev, mx GROUP BY user_id
        |ORDER BY decay_score DESC, user_id LIMIT 50""".stripMargin,

    "mine_pareto_frontier" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "pipeline_compaction_bins" ->
      s"""WITH per_src AS (
         |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS bytes,
         |    count(*) AS n_docs
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS tot FROM per_src),
         |planned AS (
         |  SELECT source, bytes, n_docs,
         |    (tot + ${CompactionBins - 1}) // $CompactionBins AS target,
         |    coalesce(CAST(sum(bytes) OVER (ORDER BY source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cumb
         |  FROM per_src, tot)
         |SELECT CAST(cumb // target AS INT) AS bin,
         |  count(*) AS n_sources,
         |  string_agg(source, ',' ORDER BY source) AS sources,
         |  CAST(sum(bytes) AS BIGINT) AS bytes,
         |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  round(CAST(sum(bytes) AS DOUBLE) / max(target), 4) AS fill_ratio
         |FROM planned GROUP BY 1 ORDER BY bin""".stripMargin,
    "mine_attribution_last_touch" ->
      """WITH att AS (
        |  SELECT event_type, ts,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |      THEN event_type END IGNORE NULLS) OVER w AS t_type,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |      THEN ts END IGNORE NULLS) OVER w AS t_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |ch AS (
        |  SELECT CASE WHEN t_ts IS NOT NULL
        |      AND t_ts >= ts - INTERVAL 60 MINUTE THEN t_type
        |    ELSE 'direct' END AS channel
        |  FROM att WHERE event_type = 'purchase'),
        |c AS (SELECT channel, count(*) AS n FROM ch GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT channel, n, round(CAST(n AS DOUBLE) / tot, 4) AS share
        |FROM c CROSS JOIN t ORDER BY channel""".stripMargin,

    "graph_nation_mixing" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |m AS (
        |  SELECT c_nationkey, s_nationkey, count(*) AS n_edges
        |  FROM e JOIN customer ON o_custkey = c_custkey
        |       JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_edges) AS BIGINT) AS tot FROM m)
        |SELECT c_nationkey, s_nationkey, n_edges,
        |  round(CAST(n_edges AS DOUBLE) / tot, 4) AS share,
        |  c_nationkey = s_nationkey AS same_nation
        |FROM m CROSS JOIN t
        |ORDER BY c_nationkey, s_nationkey""".stripMargin,

    "diag_join_fanout" ->
      """WITH mult AS (
        |  SELECT m, count(*) AS n_keys FROM (
        |    SELECT l_orderkey, count(*) AS m FROM lineitem GROUP BY 1) q
        |  GROUP BY m),
        |t AS (SELECT CAST(sum(n_keys) AS BIGINT) AS tk,
        |             CAST(sum(m * n_keys) AS BIGINT) AS tr FROM mult)
        |SELECT m AS multiplicity, n_keys,
        |  round(CAST(n_keys AS DOUBLE) / tk, 4) AS key_share,
        |  round(CAST(tr AS DOUBLE) / tk, 4) AS avg_fanout
        |FROM mult CROSS JOIN t ORDER BY multiplicity""".stripMargin,

    "diag_missing_days" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS c
        |  FROM orders GROUP BY 1),
        |gaps AS (
        |  SELECT day,
        |    CAST(date_diff('day', lag(day) OVER (ORDER BY day), day) - 1
        |      AS BIGINT) AS gap
        |  FROM daily),
        |st AS (
        |  SELECT min(day) AS d0, max(day) AS d1, count(*) AS n_present,
        |    CAST(coalesce(max(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
        |      AS max_gap_days
        |  FROM gaps)
        |SELECT CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n_days,
        |  n_present,
        |  CAST(date_diff('day', d0, d1) + 1 - n_present AS BIGINT) AS n_missing,
        |  max_gap_days
        |FROM st""".stripMargin,

    "mine_reorder_gap_profile" ->
      """WITH g AS (
        |  SELECT CAST(date_diff('day',
        |    lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
        |  FROM orders),
        |h AS (SELECT gap AS g, count(*) AS c FROM g
        |      WHERE gap IS NOT NULL GROUP BY 1),
        |cm AS (SELECT g, c, sum(c) OVER (ORDER BY g) AS cum FROM h),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |             CAST(sum(g * c) AS BIGINT) AS gsum FROM h)
        |SELECT n AS n_gaps,
        |  round(CAST(gsum AS DOUBLE) / n, 4) AS mean_gap,
        |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN g END) AS BIGINT)
        |    AS p50_days,
        |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN g END) AS BIGINT)
        |    AS p90_days
        |FROM cm CROSS JOIN t GROUP BY n, gsum""".stripMargin,

    "mine_brand_seasonality" ->
      """WITH bm AS (
        |  SELECT p_brand, CAST(month(o_orderdate) AS INT) AS mo,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |bt AS (SELECT p_brand, SUM(rev) AS brev FROM bm GROUP BY 1),
        |mt AS (SELECT mo, SUM(rev) AS mrev FROM bm GROUP BY 1),
        |gt AS (SELECT SUM(rev) AS grev FROM bm)
        |SELECT bm.p_brand, bm.mo,
        |  round(CAST(bm.rev AS DOUBLE), 4) AS revenue,
        |  round((CAST(bm.rev AS DOUBLE) / CAST(bt.brev AS DOUBLE))
        |    / (CAST(mt.mrev AS DOUBLE) / CAST(gt.grev AS DOUBLE)), 4)
        |    AS season_idx
        |FROM bm JOIN bt USING (p_brand) JOIN mt USING (mo) CROSS JOIN gt
        |ORDER BY p_brand, mo""".stripMargin,

    "mine_rank_movers" ->
      s"""WITH rev AS (
         |  SELECT p_brand,
         |    round(coalesce(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
         |      FILTER (o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
         |      AS DOUBLE), 0.0), 4) AS rev_early,
         |    round(coalesce(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
         |      FILTER (o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
         |      AS DOUBLE), 0.0), 4) AS rev_late
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |       JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1),
         |rk AS (
         |  SELECT p_brand, rev_early, rev_late,
         |    CAST(row_number() OVER (ORDER BY rev_early DESC, p_brand) AS INT)
         |      AS rank_early,
         |    CAST(row_number() OVER (ORDER BY rev_late DESC, p_brand) AS INT)
         |      AS rank_late
         |  FROM rev)
         |SELECT p_brand, rev_early, rev_late, rank_early, rank_late,
         |  rank_early - rank_late AS moved_up
         |FROM rk ORDER BY p_brand""".stripMargin,

    "diag_revenue_concentration" -> {
      val monBin = "(mon_cents - ((mon_cents % 100000) + 100000) % 100000) // 100000"
      s"""WITH rev AS (
         |  SELECT o_custkey,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
         |      AS mon_cents
         |  FROM orders GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM rev),
         |h AS (SELECT $monBin AS bin, count(*) AS c FROM rev GROUP BY 1),
         |cm AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h),
         |e AS (
         |  SELECT list_sort(list(b)) AS ed FROM (
         |    SELECT d, min(bin) AS b
         |    FROM cm CROSS JOIN nn
         |         CROSS JOIN (SELECT range AS d FROM range(1, 10)) ds
         |    WHERE cum * 10 >= d * n GROUP BY d) q),
         |per AS (
         |  SELECT CAST(1 + len(list_filter(ed, x -> $monBin > x)) AS INT)
         |      AS decile,
         |    count(*) AS n_customers,
         |    CAST(SUM(mon_cents) AS BIGINT) AS cents
         |  FROM rev CROSS JOIN e GROUP BY 1),
         |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM per)
         |SELECT decile, n_customers,
         |  round(CAST(cents AS DOUBLE) / tot, 4) AS rev_share,
         |  round(CAST(sum(cents) OVER (ORDER BY decile) AS DOUBLE) / tot, 4)
         |    AS cum_share
         |FROM per CROSS JOIN t ORDER BY decile""".stripMargin
    },

    "mine_rfm_segments" -> {
      // one histogram→cumulative→edges block per RFM dimension
      def edgeCtes(tag: String, bin: String) =
        s"""h$tag AS (SELECT $bin AS bin, count(*) AS c FROM rfm GROUP BY 1),
           |c$tag AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h$tag),
           |e$tag AS (
           |  SELECT list_sort(list(b)) AS edges FROM (
           |    SELECT d, min(bin) AS b
           |    FROM c$tag CROSS JOIN nn
           |         CROSS JOIN (SELECT range AS d FROM range(1, 5)) ds
           |    WHERE cum * 5 >= d * n GROUP BY d) q)""".stripMargin
      val monBin = "(mon_cents - ((mon_cents % 100000) + 100000) % 100000) // 100000"
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt, o_totalprice
         |  FROM orders),
         |ref AS (SELECT max(dt) AS ref FROM o),
         |rfm AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', max(dt), ref) AS BIGINT) AS rec,
         |    count(*) AS freq,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
         |      AS mon_cents
         |  FROM o CROSS JOIN ref GROUP BY o_custkey, ref),
         |nn AS (SELECT count(*) AS n FROM rfm),
         |${edgeCtes("r", "rec")},
         |${edgeCtes("f", "freq")},
         |${edgeCtes("m", monBin)},
         |sc AS (
         |  SELECT o_custkey, mon_cents,
         |    CAST(5 - len(list_filter(er.edges, e -> rec > e)) AS INT) AS r_score,
         |    CAST(1 + len(list_filter(ef.edges, e -> freq > e)) AS INT) AS f_score,
         |    CAST(1 + len(list_filter(em.edges, e -> $monBin > e)) AS INT) AS m_score
         |  FROM rfm CROSS JOIN er er CROSS JOIN ef ef CROSS JOIN em em)
         |SELECT r_score, f_score, m_score, count(*) AS n_customers,
         |  round(CAST(SUM(mon_cents) AS DOUBLE) / 100.0 / count(*), 4)
         |    AS avg_monetary
         |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },

    "diag_dup_rate_by_source" ->
      """WITH f AS (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  count(*) FILTER (rn > 1) AS n_dups,
        |  round(CAST(count(*) FILTER (rn > 1) AS DOUBLE) / count(*), 4)
        |    AS dup_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "mine_item_cf_topk" ->
      s"""WITH ob AS (
         |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |co AS (
         |  SELECT a.b AS brand_a, c.b AS brand_b, count(*) AS co
         |  FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
         |  GROUP BY 1, 2),
         |sym AS (SELECT brand_a, brand_b, co FROM co
         |        UNION ALL SELECT brand_b, brand_a, co FROM co),
         |bt AS (SELECT b, count(*) AS nb FROM ob GROUP BY 1),
         |sc AS (
         |  SELECT brand_a, brand_b, co,
         |    round(CAST(co AS DOUBLE)
         |      / sqrt(CAST(ta.nb AS DOUBLE) * CAST(tb.nb AS DOUBLE)), 4) AS cosine
         |  FROM sym JOIN bt ta ON ta.b = brand_a JOIN bt tb ON tb.b = brand_b),
         |rk AS (
         |  SELECT brand_a, brand_b, co, cosine, row_number() OVER (
         |    PARTITION BY brand_a ORDER BY cosine DESC, brand_b) AS rn
         |  FROM sc)
         |SELECT brand_a, CAST(rn AS INT) AS rn, brand_b, co, cosine
         |FROM rk WHERE rn <= $CfTopN ORDER BY brand_a, rn""".stripMargin,

    "sample_weighted_priority" ->
      s"""WITH sc AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w_cents,
         |    ${graft.functions.Md5Hash.duckHash60(
               "'o|' || CAST(o_orderkey AS VARCHAR)")} AS h
         |  FROM orders),
         |q AS (
         |  SELECT o_orderkey, w_cents,
         |    CAST(w_cents AS HUGEINT) * $Pow60 // (CAST(h AS HUGEINT) + 1) AS q
         |  FROM sc),
         |top AS (
         |  SELECT o_orderkey, w_cents, q, row_number() OVER (
         |    ORDER BY q DESC, o_orderkey) AS rank
         |  FROM q ORDER BY q DESC, o_orderkey LIMIT $PrioritySampleK)
         |SELECT CAST(rank AS INT) AS rank, o_orderkey, w_cents,
         |  CAST(q AS VARCHAR) AS priority
         |FROM top ORDER BY rank""".stripMargin,

    "pipeline_shard_balance" ->
      s"""WITH sh AS (
         |  SELECT CAST(${graft.functions.Md5Hash.duckHash60(
               "'s|' || CAST(doc_id AS VARCHAR)")} % $ShardCount AS INT) AS shard,
         |    n_chars
         |  FROM documents),
         |per AS (
         |  SELECT shard, count(*) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS n_bytes
         |  FROM sh GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_bytes) AS BIGINT) AS tb FROM per)
         |SELECT shard, n_docs, n_bytes,
         |  round(CAST(n_bytes AS DOUBLE) / tb, 4) AS byte_share,
         |  round(CAST(n_bytes AS DOUBLE) * $ShardCount / tb, 4) AS load_factor
         |FROM per CROSS JOIN tot ORDER BY shard""".stripMargin,

    "diag_chi2_independence" ->
      """WITH obs AS (
        |  SELECT lang, source, count(*) AS o FROM documents
        |  GROUP BY lang, source),
        |rt AS (SELECT lang, SUM(o) AS rt FROM obs GROUP BY lang),
        |ct AS (SELECT source, SUM(o) AS ct FROM obs GROUP BY source),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n, count(DISTINCT lang) AS nr,
        |               count(DISTINCT source) AS nc FROM obs),
        |term AS (
        |  SELECT n, nr, nc,
        |    (CAST(coalesce(obs.o, 0) AS DOUBLE)
        |      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(coalesce(obs.o, 0) AS DOUBLE)
        |      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS t
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN obs USING (lang, source), tot)
        |SELECT n, (nr - 1) * (nc - 1) AS dof,
        |  round(CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE), 4) AS chi2,
        |  round(sqrt(CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(n AS DOUBLE) / CAST(least(nr - 1, nc - 1) AS DOUBLE)), 4)
        |    AS cramers_v
        |FROM term GROUP BY n, nr, nc""".stripMargin,

    "mine_assoc_rules" ->
      s"""WITH ob AS (
         |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |supp AS (
         |  SELECT a.b AS brand_a, c.b AS brand_b, count(*) AS support
         |  FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
         |bt AS (SELECT b, count(*) AS sb FROM ob GROUP BY 1),
         |tot AS (SELECT count(DISTINCT ok) AS n_orders FROM ob)
         |SELECT brand_a, brand_b, support,
         |  round(CAST(support AS DOUBLE) / ta.sb, 4) AS conf_a_b,
         |  round(CAST(support AS DOUBLE) / tb.sb, 4) AS conf_b_a,
         |  round(CAST(support AS DOUBLE) * tot.n_orders / (ta.sb * tb.sb), 4) AS lift
         |FROM supp JOIN bt ta ON ta.b = brand_a
         |          JOIN bt tb ON tb.b = brand_b
         |          CROSS JOIN tot
         |ORDER BY brand_a, brand_b""".stripMargin,

    "diag_key_skew" ->
      s"""WITH counts AS (
         |  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1),
         |tot AS (SELECT sum(n) AS tot FROM counts),
         |top AS (
         |  SELECT l_partkey, n,
         |    row_number() OVER (ORDER BY n DESC, l_partkey) AS rank
         |  FROM counts ORDER BY n DESC, l_partkey LIMIT $SkewTopN)
         |SELECT CAST(rank AS INT) AS rank, l_partkey, n,
         |  round(CAST(n AS DOUBLE) / tot, 4) AS share,
         |  round(CAST(sum(n) OVER (ORDER BY rank) AS DOUBLE) / tot, 4) AS cum_share
         |FROM top CROSS JOIN tot
         |ORDER BY rank""".stripMargin,

    "diag_column_profile" ->
      """WITH one AS (SELECT
        |  count(*) AS n_rows,
        |  count(o_orderkey) AS k_nn, count(DISTINCT o_orderkey) AS k_nd,
        |    CAST(min(o_orderkey) AS VARCHAR) AS k_mn, CAST(max(o_orderkey) AS VARCHAR) AS k_mx,
        |  count(o_custkey) AS c_nn, count(DISTINCT o_custkey) AS c_nd,
        |    CAST(min(o_custkey) AS VARCHAR) AS c_mn, CAST(max(o_custkey) AS VARCHAR) AS c_mx,
        |  count(o_orderstatus) AS s_nn, count(DISTINCT o_orderstatus) AS s_nd,
        |    min(o_orderstatus) AS s_mn, max(o_orderstatus) AS s_mx,
        |  count(o_totalprice) AS p_nn, count(DISTINCT o_totalprice) AS p_nd,
        |    CAST(min(o_totalprice) AS VARCHAR) AS p_mn, CAST(max(o_totalprice) AS VARCHAR) AS p_mx,
        |  count(o_orderdate) AS d_nn, count(DISTINCT o_orderdate) AS d_nd,
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS d_mn,
        |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS d_mx,
        |  count(o_orderpriority) AS r_nn, count(DISTINCT o_orderpriority) AS r_nd,
        |    min(o_orderpriority) AS r_mn, max(o_orderpriority) AS r_mx
        |  FROM orders)
        |SELECT column_name, n_rows, n_rows - n_nonnull AS n_null,
        |  n_distinct, min_s, max_s
        |FROM (
        |  SELECT 'o_orderkey' AS column_name, n_rows, k_nn AS n_nonnull, k_nd AS n_distinct, k_mn AS min_s, k_mx AS max_s FROM one
        |  UNION ALL SELECT 'o_custkey', n_rows, c_nn, c_nd, c_mn, c_mx FROM one
        |  UNION ALL SELECT 'o_orderstatus', n_rows, s_nn, s_nd, s_mn, s_mx FROM one
        |  UNION ALL SELECT 'o_totalprice', n_rows, p_nn, p_nd, p_mn, p_mx FROM one
        |  UNION ALL SELECT 'o_orderdate', n_rows, d_nn, d_nd, d_mn, d_mx FROM one
        |  UNION ALL SELECT 'o_orderpriority', n_rows, r_nn, r_nd, r_mn, r_mx FROM one)
        |ORDER BY column_name""".stripMargin,

    "pipeline_range_bucket" ->
      s"""WITH hist AS (
         |  SELECT CAST(floor(o_totalprice / $RangeBucketBinWidth) AS BIGINT) AS bin,
         |         count(*) AS c
         |  FROM orders GROUP BY 1),
         |cum AS (SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM hist),
         |tot AS (SELECT count(*) AS n FROM orders),
         |ed AS (
         |  SELECT d, min(bin) AS b
         |  FROM cum CROSS JOIN tot
         |       CROSS JOIN (SELECT range AS d FROM range(1, $RangeBuckets)) ds
         |  WHERE cum * $RangeBuckets >= d * n
         |  GROUP BY d),
         |edges AS (
         |  SELECT list_sort(list(CAST((b + 1) * $RangeBucketBinWidth AS DOUBLE))) AS e
         |  FROM ed)
         |SELECT CAST(1 + len(list_filter(e, x -> o_totalprice > x)) AS INT) AS bucket,
         |  count(*) AS n_orders,
         |  round(min(o_totalprice), 4) AS min_price,
         |  round(max(o_totalprice), 4) AS max_price
         |FROM orders CROSS JOIN edges
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_incremental_merge" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "diag_fk_violations" ->
      """WITH e1 AS (
        |  SELECT 'orders->customer' AS fk_edge, count(*) AS n_child,
        |    count(*) FILTER (c_custkey IS NULL) AS n_orphans,
        |    count(DISTINCT CASE WHEN c_custkey IS NULL THEN o_custkey END)
        |      AS n_orphan_keys
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey),
        |e2 AS (
        |  SELECT 'lineitem->orders' AS fk_edge, count(*) AS n_child,
        |    count(*) FILTER (o_orderkey IS NULL) AS n_orphans,
        |    count(DISTINCT CASE WHEN o_orderkey IS NULL THEN l_orderkey END)
        |      AS n_orphan_keys
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
        |e3 AS (
        |  SELECT 'orders->customer_active' AS fk_edge, count(*) AS n_child,
        |    count(*) FILTER (c_custkey IS NULL) AS n_orphans,
        |    count(DISTINCT CASE WHEN c_custkey IS NULL THEN o_custkey END)
        |      AS n_orphan_keys
        |  FROM orders LEFT JOIN (SELECT c_custkey FROM customer
        |    WHERE c_acctbal > 0) c ON o_custkey = c_custkey)
        |SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
        |ORDER BY fk_edge""".stripMargin,

    "mine_seq_transitions" ->
      """WITH tr AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n FROM (
        |    SELECT event_type, lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |    FROM events) x
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tr)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / total, 4) AS share
        |FROM tr CROSS JOIN tot
        |ORDER BY n DESC, prev_type, next_type""".stripMargin,

    "diag_benford" ->
      """WITH dg AS (
        |  SELECT CAST(regexp_extract(
        |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |      '[1-9]', 0) AS INT) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM dg)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / total, 4) AS obs_share,
        |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_share,
        |  round(abs(CAST(n AS DOUBLE) / total
        |    - ln(1.0 + 1.0 / digit) / ln(10.0)), 4) AS abs_dev
        |FROM dg CROSS JOIN tot ORDER BY digit""".stripMargin,

    "mine_cooccur_pmi" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id AS u, event_type AS t FROM events),
        |supp AS (
        |  SELECT a.t AS type_a, c.t AS type_b, count(*) AS support
        |  FROM ut a JOIN ut c ON a.u = c.u AND a.t < c.t
        |  GROUP BY 1, 2),
        |tt AS (SELECT t, count(*) AS s FROM ut GROUP BY 1),
        |nu AS (SELECT count(DISTINCT u) AS n_users FROM ut)
        |SELECT type_a, type_b, support,
        |  round(ln(CAST(support AS DOUBLE) * n_users / (ta.s * tb.s)), 4) AS pmi
        |FROM supp JOIN tt ta ON ta.t = type_a
        |JOIN tt tb ON tb.t = type_b CROSS JOIN nu
        |ORDER BY type_a, type_b""".stripMargin,

    "diag_drift_psi" ->
      """WITH counts AS (
        |  SELECT CAST(floor(value / 50.0) AS INT) AS bin,
        |    count(*) FILTER (ts < TIMESTAMP '2024-01-16 00:00:00') AS n_ref,
        |    count(*) FILTER (ts >= TIMESTAMP '2024-01-16 00:00:00') AS n_cur
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |               CAST(sum(n_cur) AS BIGINT) AS t_cur FROM counts),
        |terms AS (
        |  SELECT t_ref, t_cur,
        |    greatest(CAST(n_ref AS DOUBLE) / t_ref, 0.0001) AS rs,
        |    greatest(CAST(n_cur AS DOUBLE) / t_cur, 0.0001) AS cs
        |  FROM counts CROSS JOIN tot)
        |SELECT t_ref AS n_ref, t_cur AS n_cur, count(*) AS n_bins,
        |  round(CAST(SUM(CAST((cs - rs) * ln(cs / rs) AS DECIMAL(18,6)))
        |    AS DOUBLE), 4) AS psi
        |FROM terms GROUP BY t_ref, t_cur""".stripMargin,

    "mine_path_trigrams" ->
      """WITH lagged AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS p1,
        |    lag(event_type, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT p2 || '>' || p1 || '>' || event_type AS path,
        |  count(*) AS n
        |FROM lagged WHERE p2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "mine_user_entropy" ->
      s"""WITH tc AS (
         |  SELECT user_id, event_type, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |st AS (
         |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
         |    count(*) AS n_types,
         |    ${dsumSql("round(CAST(c AS DOUBLE) * ln(c), 4)")} AS sc
         |  FROM tc GROUP BY user_id)
         |SELECT user_id, n_events, n_types,
         |  round(ln(CAST(n_events AS DOUBLE)) - sc / n_events, 4) AS entropy
         |FROM st ORDER BY user_id""".stripMargin,

    "diag_outlier_mad" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    round(${dsumSql("value")}, 4) AS hsum
         |  FROM events GROUP BY 1, 2),
         |med AS (
         |  SELECT event_type, round(percentile_cont(0.5)
         |    WITHIN GROUP (ORDER BY hsum), 4) AS med
         |  FROM hourly GROUP BY event_type),
         |dev AS (
         |  SELECT h.event_type, m.med, round(abs(h.hsum - m.med), 4) AS dev
         |  FROM hourly h JOIN med m USING (event_type)),
         |mad AS (
         |  SELECT event_type, count(*) AS n_hours, MAX(med) AS med,
         |    round(percentile_cont(0.5) WITHIN GROUP (ORDER BY dev), 4) AS mad
         |  FROM dev GROUP BY event_type)
         |SELECT d.event_type, MAX(m.n_hours) AS n_hours, MAX(m.med) AS med,
         |  MAX(m.mad) AS mad,
         |  CAST(SUM(CASE WHEN d.dev > 4.4478 * m.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers
         |FROM dev d JOIN mad m USING (event_type)
         |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "mine_hhi_concentration" ->
      """WITH ps AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |bn AS (
        |  SELECT s_nationkey, count(*) AS n_firms,
        |    SUM(CAST(c AS HUGEINT)) AS t,
        |    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS c2,
        |    MAX(c) AS cmax
        |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1)
        |SELECT n_name, n_firms,
        |  round(CAST(c2 AS DOUBLE) * 10000.0
        |    / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 4) AS hhi,
        |  round(CAST(cmax AS DOUBLE) / CAST(t AS DOUBLE), 4) AS top_share
        |FROM bn JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,

    "mine_gini_revenue" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS i
        |  FROM rev)
        |SELECT count(*) AS n_customers,
        |  round(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 4)
        |    AS total_revenue,
        |  round(2.0 * CAST(SUM(CAST(i AS HUGEINT) * cents) AS DOUBLE)
        |      / (count(*) * CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE))
        |    - (count(*) + 1.0) / count(*), 4) AS gini
        |FROM rk""".stripMargin,

    "mine_spearman_corr" ->
      """WITH m AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS cents,
        |    count(DISTINCT o_custkey) AS breadth
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |ra AS (SELECT l_suppkey,
        |         row_number() OVER (ORDER BY cents, l_suppkey) AS ra
        |       FROM m),
        |rb AS (SELECT l_suppkey,
        |         row_number() OVER (ORDER BY breadth, l_suppkey) AS rb
        |       FROM m),
        |st AS (
        |  SELECT count(*) AS n,
        |    CAST(SUM(CAST(ra.ra - rb.rb AS HUGEINT) * (ra.ra - rb.rb))
        |      AS BIGINT) AS d2
        |  FROM ra JOIN rb USING (l_suppkey))
        |SELECT n AS n_suppliers, d2 AS sum_d2,
        |  round(CASE WHEN n < 2 THEN 0.0 ELSE
        |    1.0 - 6.0 * CAST(d2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE)
        |         * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)) END, 4)
        |    AS rho
        |FROM st""".stripMargin,

    "mine_theil_index" ->
      """WITH rev AS (
        |  SELECT o.o_custkey, c.c_nationkey,
        |    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2
        |  HAVING CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
        |    AS BIGINT) > 0),
        |tot AS (SELECT count(*) AS n, SUM(CAST(cents AS HUGEINT)) AS t
        |        FROM rev),
        |terms AS (
        |  SELECT r.c_nationkey, t.n, t.t, count(*) AS ng,
        |    SUM(CAST(r.cents AS HUGEINT)) AS tg,
        |    SUM(CAST(r.cents AS DECIMAL(38,4))
        |      * CAST(round(ln(CAST(r.cents AS DOUBLE) * t.n
        |          / CAST(t.t AS DOUBLE)), 4) AS DECIMAL(18,4))) AS sw
        |  FROM rev r CROSS JOIN tot t
        |  GROUP BY 1, 2, 3),
        |gl AS (
        |  SELECT n, t, SUM(sw) AS swt,
        |    SUM(CAST(tg AS DECIMAL(38,4))
        |      * CAST(round(ln(CAST(tg AS DOUBLE) * n
        |          / (CAST(ng AS DOUBLE) * CAST(t AS DOUBLE))), 4)
        |        AS DECIMAL(18,4))) AS sb
        |  FROM terms GROUP BY 1, 2)
        |SELECT n AS n_customers,
        |  round(CAST(swt AS DOUBLE) / CAST(t AS DOUBLE), 4) AS theil,
        |  round(CAST(sb AS DOUBLE) / CAST(t AS DOUBLE), 4) AS theil_between,
        |  round(round(CAST(swt AS DOUBLE) / CAST(t AS DOUBLE), 4)
        |    - round(CAST(sb AS DOUBLE) / CAST(t AS DOUBLE), 4), 4)
        |    AS theil_within
        |FROM gl""".stripMargin,

    "mine_rank_rbo" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(coalesce(SUM(CASE WHEN month(l_shipdate) % 2 = 1
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) * 100
        |      AS BIGINT) AS codd,
        |    CAST(coalesce(SUM(CASE WHEN month(l_shipdate) % 2 = 0
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) * 100
        |      AS BIGINT) AS cev
        |  FROM lineitem GROUP BY 1),
        |ta AS (SELECT l_suppkey, row_number()
        |         OVER (ORDER BY codd DESC, l_suppkey) AS ra
        |       FROM rev ORDER BY codd DESC, l_suppkey LIMIT 20),
        |tb AS (SELECT l_suppkey, row_number()
        |         OVER (ORDER BY cev DESC, l_suppkey) AS rb
        |       FROM rev ORDER BY cev DESC, l_suppkey LIMIT 20),
        |j AS (SELECT greatest(ra, rb) AS m
        |      FROM ta JOIN tb USING (l_suppkey)),
        |xs AS (
        |  SELECT dpt, count(*) AS xd
        |  FROM j CROSS JOIN (SELECT unnest(range(1, 21)) AS dpt) q
        |  WHERE m <= dpt GROUP BY 1),
        |tm AS (
        |  SELECT dpt, xd,
        |    CAST(round(0.5 * power(0.5, dpt - 1) * xd / dpt, 8)
        |      AS DECIMAL(18,8)) AS term
        |  FROM xs)
        |SELECT CAST(coalesce(MAX(CASE WHEN dpt = 20 THEN xd END), 0)
        |    AS BIGINT) AS n_common_20,
        |  round(CAST(coalesce(SUM(term), 0) AS DOUBLE), 4) AS rbo
        |FROM tm""".stripMargin,

    "mine_diff_in_diff" ->
      """WITH cells AS (
        |  SELECT (o_custkey % 2 = 0) AS treated,
        |    (month(o_orderdate) >= 7) AS post, count(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT
        |    MAX(CASE WHEN treated AND NOT post THEN n END) AS n_t1,
        |    MAX(CASE WHEN treated AND post THEN n END) AS n_t2,
        |    MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_c1,
        |    MAX(CASE WHEN NOT treated AND post THEN n END) AS n_c2,
        |    MAX(CASE WHEN treated AND NOT post THEN cents END) AS s_t1,
        |    MAX(CASE WHEN treated AND post THEN cents END) AS s_t2,
        |    MAX(CASE WHEN NOT treated AND NOT post THEN cents END) AS s_c1,
        |    MAX(CASE WHEN NOT treated AND post THEN cents END) AS s_c2
        |  FROM cells),
        |m AS (
        |  SELECT *, CAST(s_t1 AS DOUBLE) / 100.0 / n_t1 AS m_t1,
        |    CAST(s_t2 AS DOUBLE) / 100.0 / n_t2 AS m_t2,
        |    CAST(s_c1 AS DOUBLE) / 100.0 / n_c1 AS m_c1,
        |    CAST(s_c2 AS DOUBLE) / 100.0 / n_c2 AS m_c2
        |  FROM w)
        |SELECT n_t1, n_t2, n_c1, n_c2,
        |  round(m_t1, 4) AS mean_treat_pre, round(m_t2, 4) AS mean_treat_post,
        |  round(m_c1, 4) AS mean_ctrl_pre, round(m_c2, 4) AS mean_ctrl_post,
        |  round(m_t2 - m_t1 - (m_c2 - m_c1), 4) AS did
        |FROM m""".stripMargin,

    "mine_markov_accuracy" ->
      """WITH tr AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_type
        |    FROM events) q
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |per AS (
        |  SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_n,
        |    CAST(max(n) AS BIGINT) AS maxn
        |  FROM tr GROUP BY 1),
        |best AS (
        |  SELECT t.prev_type, p.row_n, p.maxn,
        |    min(t.next_type) AS pred_next
        |  FROM tr t JOIN per p USING (prev_type)
        |  WHERE t.n = p.maxn GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(row_n) AS BIGINT) AS t,
        |          CAST(sum(maxn) AS BIGINT) AS hit
        |        FROM best)
        |SELECT prev_type, pred_next, row_n, maxn AS n_correct,
        |  round(CAST(maxn AS DOUBLE) / row_n, 4) AS row_accuracy,
        |  round(CAST(hit AS DOUBLE) / t, 4) AS overall_accuracy
        |FROM best CROSS JOIN tot ORDER BY prev_type""".stripMargin,

    "mine_itemsets_3" ->
      s"""WITH ob AS (
         |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |tri AS (
         |  SELECT x.b AS brand_a, y.b AS brand_b, z.b AS brand_c,
         |    count(*) AS support
         |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
         |  JOIN ob z ON x.ok = z.ok AND y.b < z.b
         |  GROUP BY 1, 2, 3 HAVING count(*) >= $Itemset3MinSupport),
         |tot AS (SELECT b, count(*) AS sb FROM ob GROUP BY 1),
         |n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob)
         |SELECT brand_a, brand_b, brand_c, support,
         |  round(CAST(support AS DOUBLE) * n_orders * n_orders
         |    / (CAST(ta.sb AS DOUBLE) * tb.sb * tc.sb), 4) AS lift3
         |FROM tri
         |JOIN tot ta ON ta.b = brand_a
         |JOIN tot tb ON tb.b = brand_b
         |JOIN tot tc ON tc.b = brand_c
         |CROSS JOIN n
         |ORDER BY brand_a, brand_b, brand_c""".stripMargin,

    "diag_drift_ks" ->
      """WITH v AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v,
        |    CAST(SUM(CASE WHEN month(o_orderdate) % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN month(o_orderdate) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    SUM(c1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    SUM(c2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM v),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |          CAST(sum(c2) AS BIGINT) AS n2 FROM v),
        |d AS (
        |  SELECT v, abs(CAST(cum1 AS HUGEINT) * n2
        |    - CAST(cum2 AS HUGEINT) * n1) AS dn, n1, n2
        |  FROM cum CROSS JOIN tot),
        |best AS (
        |  SELECT n1, n2, dn, v FROM d
        |  ORDER BY dn DESC, v ASC LIMIT 1)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 4) AS ks,
        |  round(CAST(v AS DOUBLE) / 100.0, 4) AS ks_at_price
        |FROM best""".stripMargin,

    "mine_woe_iv" ->
      s"""WITH ords AS (
         |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
         |lab AS (
         |  SELECT c_custkey,
         |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
         |    coalesce(n_orders, 0) >= $AbConvThreshold AS good
         |  FROM customer LEFT JOIN ords ON c_custkey = o_custkey),
         |bounds AS (SELECT min(bal) AS lo, max(bal) AS hi FROM lab),
         |binned AS (
         |  SELECT CAST(least(9, (bal - lo) // greatest(1, (hi - lo + 9) // 10))
         |      AS INT) AS bin,
         |    CAST(SUM(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS g,
         |    CAST(SUM(CASE WHEN good THEN 0 ELSE 1 END) AS BIGINT) AS b
         |  FROM lab CROSS JOIN bounds GROUP BY 1),
         |tot AS (SELECT CAST(sum(g) AS BIGINT) AS tg,
         |          CAST(sum(b) AS BIGINT) AS tb, count(*) AS k
         |        FROM binned),
         |woed AS (
         |  SELECT bin, g, b,
         |    CAST(g + 1 AS DOUBLE) / CAST(tg + k AS DOUBLE) AS gd,
         |    CAST(b + 1 AS DOUBLE) / CAST(tb + k AS DOUBLE) AS bd
         |  FROM binned CROSS JOIN tot),
         |w2 AS (
         |  SELECT *, round(ln(gd / bd), 4) AS woe FROM woed),
         |w3 AS (
         |  SELECT *, CAST(round((gd - bd) * woe, 8) AS DECIMAL(18,8))
         |    AS term FROM w2),
         |iv AS (SELECT round(CAST(SUM(term) AS DOUBLE), 4) AS iv FROM w3)
         |SELECT bin, g + b AS n, g AS n_good, b AS n_bad, woe, iv
         |FROM w3 CROSS JOIN iv ORDER BY bin""".stripMargin,

    "mine_price_endings" ->
      """WITH e AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    % 100 AS ending, count(*) AS n
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM e),
        |top AS (SELECT ending, n FROM e ORDER BY n DESC, ending LIMIT 10)
        |SELECT ending, n, round(CAST(n AS DOUBLE) / t, 4) AS share
        |FROM top CROSS JOIN tot ORDER BY n DESC, ending""".stripMargin,

    "mine_abc_classes" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(CAST(cents AS HUGEINT)) AS t FROM rev),
        |rk AS (
        |  SELECT cents,
        |    coalesce(SUM(CAST(cents AS HUGEINT)) OVER (
        |      ORDER BY cents DESC, l_partkey DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumBefore
        |  FROM rev),
        |cl AS (
        |  SELECT cents,
        |    CASE WHEN cumBefore * 100 < t * 80 THEN 'A'
        |         WHEN cumBefore * 100 < t * 95 THEN 'B'
        |         ELSE 'C' END AS cls
        |  FROM rk CROSS JOIN tot)
        |SELECT cls, count(*) AS n_parts,
        |  round(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 10000.0, 4)
        |    AS revenue,
        |  round(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
        |    / CAST(t AS DOUBLE), 4) AS share
        |FROM cl CROSS JOIN tot
        |GROUP BY cls, t ORDER BY cls""".stripMargin,

    "mine_basket_size_dist" ->
      """WITH sz AS (
        |  SELECT k, count(*) AS n_orders FROM (
        |    SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1) q
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM sz),
        |c AS (
        |  SELECT k, n_orders,
        |    SUM(n_orders) OVER (ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sz)
        |SELECT k AS basket_size, n_orders,
        |  round(CAST(n_orders AS DOUBLE) / t, 4) AS share,
        |  round(CAST(cum AS DOUBLE) / t, 4) AS cum_share
        |FROM c CROSS JOIN tot ORDER BY basket_size""".stripMargin,

    "mine_icc_price" ->
      """WITH x AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM lineitem),
        |per AS (
        |  SELECT count(*) AS k,
        |    SUM(CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng, 4)
        |      AS DECIMAL(38,4))) AS tsum
        |  FROM (SELECT l_suppkey, count(*) AS ng,
        |          SUM(CAST(c AS HUGEINT)) AS sg
        |        FROM x GROUP BY 1) g),
        |tot AS (
        |  SELECT count(*) AS n, SUM(CAST(c AS HUGEINT)) AS s,
        |    SUM(CAST(c AS HUGEINT) * c) AS sxx
        |  FROM x),
        |cl AS (
        |  SELECT n, k, tsum, sxx,
        |    CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS cm
        |  FROM per CROSS JOIN tot)
        |SELECT n AS n_rows, k AS n_groups,
        |  round(CASE WHEN CAST(sxx AS DOUBLE) - cm <= 0.0 THEN 0.0
        |    ELSE (CAST(tsum AS DOUBLE) - cm)
        |      / (CAST(sxx AS DOUBLE) - cm) END, 4) AS icc
        |FROM cl""".stripMargin,

    "mine_ab_srm" ->
      """WITH u AS (SELECT DISTINCT o_custkey FROM orders),
        |c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u),
        |z AS (
        |  SELECT n_a, n_b,
        |    CAST(n_a - n_b AS DOUBLE) / sqrt(CAST(n_a + n_b AS DOUBLE)) AS z
        |  FROM c)
        |SELECT n_a, n_b, round(z, 4) AS z,
        |  abs(round(z, 4)) > 3.0 AS srm_detected
        |FROM z""".stripMargin,

    "diag_non_ascii_audit" ->
      """WITH b AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '[^ -~]')) AS INT) AS bad
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(CASE WHEN bad > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_flagged,
        |  CAST(SUM(bad) AS BIGINT) AS n_bad_chars,
        |  round(CAST(SUM(CASE WHEN bad > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS flag_rate
        |FROM b GROUP BY 1 ORDER BY source""".stripMargin,

    "diag_json_key_profile" ->
      """WITH k AS (
        |  SELECT unnest(json_keys(props)) AS key FROM events),
        |c AS (SELECT key, count(*) AS n_rows FROM k GROUP BY 1),
        |tot AS (SELECT count(*) AS t FROM events)
        |SELECT key, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / t, 4) AS presence
        |FROM c CROSS JOIN tot ORDER BY key""".stripMargin,

    "mine_ratio_metric_ci" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS x,
        |    count(*) AS y,
        |    CASE WHEN o_custkey % 2 = 0 THEN 'treatment'
        |         ELSE 'control' END AS arm
        |  FROM orders GROUP BY o_custkey),
        |g AS (
        |  SELECT arm, count(*) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM per GROUP BY 1),
        |cl AS (
        |  SELECT arm, n,
        |    CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
        |    CAST(n * sxx - sx * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS vx,
        |    CAST(n * syy - sy * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS vy,
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS cxy,
        |    CAST(sy AS DOUBLE) / n AS ybar
        |  FROM g),
        |se AS (
        |  SELECT arm, n, r,
        |    sqrt((vx + r * r * vy - 2.0 * r * cxy) / (n * ybar * ybar))
        |      AS se
        |  FROM cl)
        |SELECT arm, n AS n_units,
        |  round(r / 100.0, 4) AS revenue_per_order,
        |  round(se / 100.0, 4) AS se,
        |  round((r - 1.96 * se) / 100.0, 4) AS ci_low,
        |  round((r + 1.96 * se) / 100.0, 4) AS ci_high
        |FROM se ORDER BY arm""".stripMargin,

    "mine_power_sample_size" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS x
        |  FROM orders GROUP BY 1),
        |g AS (
        |  SELECT count(*) AS n, SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM per),
        |cl AS (
        |  SELECT n, CAST(sx AS DOUBLE) / n AS mean,
        |    CAST(n * sxx - sx * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS variance
        |  FROM g),
        |m AS (SELECT *, mean * 0.01 AS mde FROM cl)
        |SELECT n AS n_units, round(mean / 100.0, 4) AS mean,
        |  round(sqrt(variance) / 100.0, 4) AS sd,
        |  round(mde / 100.0, 4) AS mde_abs,
        |  CAST(ceil(2.0 * variance * 7.8490 / (mde * mde)) AS BIGINT)
        |    AS n_per_arm
        |FROM m""".stripMargin,

    "mine_growth_accounting" ->
      """WITH um AS (
        |  SELECT DISTINCT user_id,
        |    CAST(year(ts) * 12 + month(ts) AS BIGINT) AS m
        |  FROM events),
        |cls AS (
        |  SELECT m,
        |    CASE WHEN pm IS NULL THEN 'new'
        |         WHEN pm = m - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS status
        |  FROM (
        |    SELECT user_id, m,
        |      lag(m) OVER (PARTITION BY user_id ORDER BY m) AS pm
        |    FROM um) q),
        |act AS (
        |  SELECT m, count(*) AS actives,
        |    CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS retained,
        |    CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS resurrected
        |  FROM cls GROUP BY 1)
        |SELECT CAST((m - 1) // 12 AS INT) AS year,
        |  CAST(((m - 1) % 12) + 1 AS INT) AS month,
        |  actives, new_users, retained, resurrected,
        |  coalesce(lag(actives) OVER (ORDER BY m), 0) - retained AS churned
        |FROM act ORDER BY year, month""".stripMargin,

    "mine_dau_mau" ->
      """WITH dd AS (
        |  SELECT date_trunc('month', ts) AS month,
        |    date_trunc('day', ts) AS day,
        |    count(DISTINCT user_id) AS du
        |  FROM events GROUP BY 1, 2),
        |dau AS (
        |  SELECT month, count(*) AS n_days, CAST(sum(du) AS BIGINT) AS du_sum
        |  FROM dd GROUP BY 1),
        |mau AS (
        |  SELECT date_trunc('month', ts) AS month,
        |    count(DISTINCT user_id) AS mau
        |  FROM events GROUP BY 1)
        |SELECT month, n_days, mau,
        |  round(CAST(du_sum AS DOUBLE) / n_days, 4) AS avg_dau,
        |  round(CAST(du_sum AS DOUBLE) / n_days / mau, 4) AS stickiness
        |FROM dau JOIN mau USING (month) ORDER BY month""".stripMargin,

    "mine_good_turing" ->
      """WITH cnt AS (
        |  SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
        |fof AS (SELECT c AS k, count(*) AS n_k FROM cnt GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cnt),
        |n1 AS (SELECT CAST(coalesce(MAX(n_k), 0) AS BIGINT) AS n_1
        |       FROM fof WHERE k = 1)
        |SELECT f.k, f.n_k,
        |  round(CASE WHEN nx.n_k IS NULL THEN 0.0
        |    ELSE CAST(f.k + 1 AS DOUBLE) * nx.n_k / f.n_k END, 4) AS k_star,
        |  round(CAST(n_1 AS DOUBLE) / n_total, 4) AS p_unseen
        |FROM fof f
        |LEFT JOIN fof nx ON nx.k = f.k + 1
        |CROSS JOIN tot CROSS JOIN n1
        |WHERE f.k <= 10 ORDER BY f.k""".stripMargin)
}

package graft

import org.apache.spark.sql.DataFrame

/** DSL ↔ SQL parity for the SqlFrontend catalog: the same §2 semantics
  * authored in ANSI Spark SQL must produce byte-identical rows to the
  * DataFrame operators — SQL and DSL compile to the same logical plan
  * language, so any divergence is a registration bug, not an engine
  * difference. Also pins that the custom functions (codegen cosine,
  * sketch aggregators) are reachable from SQL. */
class SqlFrontendSpec extends SparkTestBase {

  private lazy val registered: Unit = SqlFrontend.register(spark, sf001)

  private def rows(df: DataFrame) = df.collect().toSeq

  private def parity(dslKey: String, dsl: (org.apache.spark.sql.SparkSession, String) => DataFrame, sql: String): Unit = {
    registered
    val d = rows(dsl(spark, sf001))
    val s = rows(spark.sql(sql))
    assert(d == s, s"$dslKey: DSL and SQL disagree\nDSL : ${d.take(3)}\nSQL : ${s.take(3)}")
  }

  test("agg_pricing_summary (flagship TPC-H Q1 shape) matches its SQL form") {
    parity("agg_pricing_summary", operators.Aggregates.queries("agg_pricing_summary"),
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_price,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("join_inner_hash matches its SQL form") {
    parity("join_inner_hash", operators.Joins.queries("join_inner_hash"),
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  test("win_running_sum matches its SQL form") {
    parity("win_running_sum", operators.Windows.queries("win_running_sum"),
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 4) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  }

  test("ts_tumbling_window matches its SQL form (window() from SQL)") {
    parity("ts_tumbling_window", operators.TimeSeriesOps.queries("ts_tumbling_window"),
      """SELECT CAST(window.start AS TIMESTAMP_NTZ) AS ws, event_type,
        |  count(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM events
        |GROUP BY window(ts, '1 hour'), event_type
        |ORDER BY ws, event_type""".stripMargin)
  }

  test("cosine_sim is callable from SQL and is the codegen expression, not a UDF") {
    registered
    val df = spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, b.embedding), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5 ORDER BY a.vec_id""".stripMargin)
    assert(df.count() > 0)
    // self-similarity sanity through SQL: cos(x, x) = 1
    val self = spark.sql(
      "SELECT min(round(cosine_sim(embedding, embedding), 4)) FROM embeddings")
      .head.getDouble(0)
    assert(self == 1.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"cosine_sim must plan as the native expression:\n$plan")
  }

  test("sketch aggregators are callable from SQL: minhash_sig and cm_sketch") {
    registered
    // minhash: identical token multisets → identical signatures
    val sig = spark.sql(
      """SELECT doc_id % 2 AS g, minhash_sig(tok) AS sig
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok
        |      FROM documents WHERE doc_id < 20) t
        |GROUP BY doc_id % 2""".stripMargin).collect()
    assert(sig.length == 2 &&
      sig.forall(_.getSeq[Long](1).length == SqlFrontend.MinHashK))
    // count-min: sketch of one group is d*w longs and total mass = rows
    val cm = spark.sql(
      """SELECT cm_sketch(tok) AS sk FROM (
        |  SELECT explode(split(text, ' ')) AS tok FROM documents
        |  WHERE doc_id < 20) t""".stripMargin).head.getSeq[Long](0)
    assert(cm.length == SqlFrontend.CmDepth * SqlFrontend.CmWidth)
    val nTok = spark.sql(
      """SELECT count(*) FROM (SELECT explode(split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 20) t""".stripMargin).head.getLong(0)
    // each of the d rows of the sketch holds every insertion once
    val perRow = cm.grouped(SqlFrontend.CmWidth).map(_.sum).toSeq
    assert(perRow.forall(_ == nTok),
      s"each sketch row must carry the full mass $nTok, got $perRow")
  }

  test("GraftExtensions rules apply to SQL-authored plans too") {
    registered
    // the Levenshtein band rule operates on the logical plan — SQL or
    // DSL provenance is invisible to it; assert the rewrite fires on a
    // SQL-authored levenshtein filter like PlansSpec does for the DSL
    val df = spark.sql(
      """SELECT a.doc_id, b.doc_id AS b_id
        |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        |WHERE a.doc_id < 30 AND b.doc_id < 30
        |  AND levenshtein(a.text, b.text) <= 3""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("length") || optimized.contains("LENGTH"),
      s"band rule should inject a length pre-filter into the SQL plan:\n$optimized")
    df.collect() // and the rewritten plan must still execute
  }

  test("ASOF_JOIN hint plans AsofJoinExec from SQL and matches the DSL rows") {
    val df = SparkEntry.queries("sql_asof_join_native")(spark, sf001)
    val sp = df.queryExecution.executedPlan.toString
    assert(sp.contains("AsofJoin"),
      s"hinted SQL must plan the native AsofJoinExec:\n$sp")
    // row parity vs the DSL twin (same declared semantics; the SQL
    // variant reports epoch-µs instead of a timestamp column)
    val dsl = operators.Joins.queries("join_asof_native")(spark, sf001)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("asof_price")).collect().toSeq
    val viaSql = df.select(
      org.apache.spark.sql.functions.col("event_id"),
      org.apache.spark.sql.functions.col("asof_price")).collect().toSeq
    assert(dsl == viaSql, s"SQL asof rows diverge from DSL twin")
  }

  test("RANGE_JOIN hint plans RangeJoinExec from SQL and matches the DSL rows") {
    val df = SparkEntry.queries("sql_range_join_native")(spark, sf001)
    val sp = df.queryExecution.executedPlan.toString
    assert(sp.contains("RangeJoin"),
      s"hinted SQL must plan the native RangeJoinExec:\n$sp")
    val dsl = operators.Joins.queries("join_range_native")(spark, sf001)
      .collect().toSeq
    assert(df.collect().toSeq == dsl, "SQL band-join rows diverge from DSL twin")
  }

  test("a hinted join the rule cannot parse fails loudly, never silently") {
    registered
    // ASOF_JOIN on an inner join — semantic hint, wrong join type
    val e = intercept[Exception] {
      spark.sql(
        """SELECT /*+ ASOF_JOIN */ e.event_id
          |FROM events e JOIN events p
          |  ON e.user_id = p.user_id AND p.ts <= e.ts""".stripMargin).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("ASOF_JOIN"),
      s"expected the loud ASOF_JOIN contract error, got: $e")
    // RANGE_JOIN with only one band edge — must refuse, not degrade
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT /*+ RANGE_JOIN */ count(*)
          |FROM events x JOIN events y
          |  ON x.user_id = y.user_id
          | AND unix_micros(y.ts) >= unix_micros(x.ts) - 120000000""".stripMargin)
        .collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("RANGE_JOIN"),
      s"expected the loud RANGE_JOIN contract error, got: $e2")
  }

  test("a parameterized native hint errors instead of silently dropping") {
    registered
    // ADVICE r7: /*+ ASOF_JOIN(x) */ used to miss the Nil-params match,
    // get dropped by RemoveAllHints with a log warning, and run the
    // PLAIN left join — every past row instead of the latest
    val e = intercept[Exception] {
      spark.sql(
        """SELECT /*+ ASOF_JOIN(events) */ e.event_id
          |FROM events e LEFT JOIN events p
          |  ON e.user_id = p.user_id AND p.ts <= e.ts""".stripMargin).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("no parameters"),
      s"expected the no-parameters contract error, got: $e")
  }

  test("the hint rewrites the TOP-most join, not a nested matching one") {
    registered
    // ADVICE r7: the old transformUp rewrote the BOTTOM-most join, so
    // a nested left join whose ON coincidentally matched the asof
    // shape was silently converted to latest-only semantics. The
    // query-level hint names the OUTER join: after the rewrite the
    // result must keep one row per outer-left row — i.e. exactly the
    // nested plain-join's row count — and exactly one AsofJoin node
    // may appear in the plan.
    val nested =
      """SELECT a.user_id, a.ts, a.event_id
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts""".stripMargin
    val innerRows = spark.sql(nested).count()
    val df = spark.sql(
      s"""SELECT /*+ ASOF_JOIN */ e.event_id
         |FROM ($nested) e
         |LEFT JOIN events p ON e.user_id = p.user_id AND p.ts <= e.ts"""
        .stripMargin)
    val sp = df.queryExecution.executedPlan.toString
    assert("AsofJoin".r.findAllIn(sp).size == 1,
      s"exactly one native asof node expected:\n$sp")
    assert(df.count() == innerRows,
      "outer-join rewrite must preserve one row per outer-left row — " +
        "a diverging count means the NESTED join was converted")
  }
}

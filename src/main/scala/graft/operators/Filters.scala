package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._

/** §2.2 — projection / filter / predicates.
  *
  * Pure narrow transformations: no shuffle at all (verify in
  * `.explain` — a single WholeStageCodegen span over the scan), and
  * every predicate is pushdown-eligible.
  */
object Filters {

  val queries: Map[String, QFn] = Map(
    "filter_conj" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" &&
          col("l_extendedprice").between(1000.0, 5000.0) &&
          col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), ntz(col("l_shipdate")).as("l_shipdate"))
        // (l_orderkey, l_linenumber) is not unique (see Scans) —
        // order over all output columns
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_shipdate"))
    }),

    "filter_disj_null" -> ((s, d) => {
      // data has no physical NULLs — synthesize with nullif so the
      // IS NULL branch is actually exercised
      Tables.orders(s, d)
        .filter(expr("nullif(o_orderpriority, '5-LOW')").isNull ||
          col("o_orderstatus").isin("P"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "project_expr" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          when(col("l_discount") > 0.05, lit("H")).otherwise(lit("L")).as("disc_band"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("revenue"), col("disc_band"))
    }),

    "filter_like_regex" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").like("%small%") && col("p_brand").rlike("^Brand#1[0-9]$"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
        .orderBy(col("p_partkey"))
    }))

  val oracle: Map[String, String] = Map(
    "filter_conj" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate FROM lineitem
        |WHERE l_returnflag = 'R' AND l_extendedprice BETWEEN 1000.0 AND 5000.0
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_shipdate""".stripMargin,

    "filter_disj_null" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE nullif(o_orderpriority, '5-LOW') IS NULL OR o_orderstatus IN ('P')
        |ORDER BY o_orderkey""".stripMargin,

    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS revenue,
        |  CASE WHEN l_discount > 0.05 THEN 'H' ELSE 'L' END AS disc_band
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, disc_band""".stripMargin,

    "filter_like_regex" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE p_name LIKE '%small%' AND regexp_matches(p_brand, '^Brand#1[0-9]$')
        |ORDER BY p_partkey""".stripMargin)
}

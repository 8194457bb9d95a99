package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._

/** §2.1 — scans, sources, sinks.
  *
  * All four queries are plain declarative plans: Catalyst pushes the
  * predicates and projections into the vectorized parquet scan
  * (`PushedFilters` / `ReadSchema` visible in `.explain("formatted")`),
  * which is exactly the at-scale behavior we want — a 100 TB scan only
  * reads the referenced columns and skips row groups by min/max stats.
  */
object Scans {

  val queries: Map[String, QFn] = Map(
    "scan_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), ntz(col("l_shipdate")).as("l_shipdate"))
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic
        // data (verified: 118k dup groups at sf0.1) — the ORDER BY
        // must cover every output column to be total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .limit(100)
    }),

    "scan_count" -> ((s, d) => {
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))
    }),

    "scan_pruned_filter" -> ((s, d) => {
      // predicate reaches the parquet reader → row-group pruning on
      // l_shipdate min/max stats; only 3 columns are materialized
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1996-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 23:59:59").cast("timestamp")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "multi_source_union" -> ((s, d) => {
      // the reference ingests many weekly files and merges them
      // (SURVEY §2.1) — model: two differently-shaped sources aligned
      // to a common schema and unioned by name
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("id"), ntz(col("o_orderdate")).as("ts"),
        col("o_totalprice").as("val"), lit("orders").as("src"))
      val e = Tables.events(s, d).select(
        col("event_id").as("id"), ntz(col("ts")).as("ts"),
        col("value").as("val"), lit("events").as("src"))
      o.unionByName(e).orderBy(col("src"), col("id"))
    }))

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_shipdate LIMIT 100""".stripMargin,

    "scan_count" -> "SELECT count(*) AS n FROM lineitem",

    "scan_pruned_filter" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "multi_source_union" ->
      """SELECT o_orderkey AS id, o_orderdate AS ts, o_totalprice AS val, 'orders' AS src FROM orders
        |UNION ALL
        |SELECT event_id AS id, ts, value AS val, 'events' AS src FROM events
        |ORDER BY src, id""".stripMargin)
}

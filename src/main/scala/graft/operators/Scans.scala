package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.1 — scans, sources, sinks, and the keyed-ingest merge.
  *
  * The scan queries are plain declarative plans: Catalyst pushes the
  * predicates and projections into the vectorized parquet scan
  * (`PushedFilters` / `ReadSchema` visible in `.explain("formatted")`),
  * which is exactly the at-scale behavior we want — a 100 TB scan only
  * reads the referenced columns and skips row groups by min/max stats.
  */
object Scans {

  /** key offset for pipeline_upsert_snapshot's synthetic insert rows —
    * far above any testdata o_orderkey; a production refresh would
    * carry real new keys, the offset only exists to make the declared
    * delta derivable from the snapshot itself (and thus oracle-
    * expressible) */
  val UpsertNewKeyOffset = 100000000L

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
    }),

    // keyed upsert (MERGE INTO shape) — the weekly-increment refresh
    // the reference's ingest implies (SURVEY §0.5): latest-row-wins
    // merge of a base snapshot and a delta batch by primary key.
    // Delta = 5%-repriced rows for keys ≡ 0 (mod 7) plus NEW rows for
    // keys ≡ 0 (mod 11) at UpsertNewKeyOffset — derived from the
    // snapshot itself so the whole operation is oracle-expressible.
    // The merge is ONE shuffle on the key (union + per-key argmax by
    // source priority); at scale both sides would be bucketed on the
    // key (sources/Bucketed.scala) making the merge exchange-free.
    // o_orderkey is unique per side, so (pri DESC) is a total order
    // per key — at most one base and one delta row each.
    "pipeline_upsert_snapshot" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      val updates = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.05)
      val inserts = base.filter(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + UpsertNewKeyOffset)
      val delta = updates.unionByName(inserts)
        .withColumn("pri", lit(1)).withColumn("src", lit("delta"))
      val merged = base
        .withColumn("pri", lit(0)).withColumn("src", lit("base"))
        .unionByName(delta)
      val w = Window.partitionBy(col("o_orderkey")).orderBy(desc("pri"))
      merged.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          ntz(col("o_orderdate")).as("o_orderdate"),
          r4(col("o_totalprice")).as("o_totalprice"), col("src"))
        .orderBy(col("o_orderkey"))
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
        |ORDER BY src, id""".stripMargin,

    "pipeline_upsert_snapshot" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders),
         |delta AS (
         |  SELECT o_orderkey, o_custkey, o_orderdate,
         |    o_totalprice * CAST(1.05 AS DOUBLE) AS o_totalprice
         |  FROM base WHERE o_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT o_orderkey + $UpsertNewKeyOffset, o_custkey, o_orderdate,
         |    o_totalprice
         |  FROM base WHERE o_orderkey % 11 = 0),
         |u AS (
         |  SELECT *, 0 AS pri, 'base' AS src FROM base
         |  UNION ALL
         |  SELECT *, 1, 'delta' FROM delta)
         |SELECT o_orderkey, o_custkey, o_orderdate,
         |  round(o_totalprice, 4) AS o_totalprice, src
         |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
         |        ORDER BY pri DESC) AS rn FROM u) t
         |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin)
}

package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._

/** §2.6 sorts / limits / top-K  +  §2.7 set operations.
  *
  * `topk_global` is the scale-critical one: `orderBy(...).limit(k)`
  * plans as TakeOrderedAndProject — each partition keeps a k-row heap
  * and only k rows per partition cross the wire, never a global sort.
  */
object SortsAndSets {

  val queries: Map[String, QFn] = Map(
    "sort_multikey" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .orderBy(asc_nulls_first("l_returnflag"), desc("l_extendedprice"),
          asc("l_orderkey"), asc("l_linenumber"))
        .limit(100)
    }),

    "topk_global" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(desc("revenue"), asc("l_suppkey"))
        .limit(20)
    }),

    "set_union_distinct" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = c.filter(col("c_acctbal") > 9000.0).select(col("c_custkey"))
      a.union(b).distinct().orderBy(col("c_custkey"))
    }),

    "set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      a.intersect(b).orderBy(col("c_custkey"))
    }),

    "set_except" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      a.except(b).orderBy(col("c_custkey"))
    }),

    // multiset (bag) variants: INTERSECT ALL keeps min(multA, multB)
    // copies per value, EXCEPT ALL keeps max(multA - multB, 0). On a
    // low-cardinality projection (nation keys) both sides carry real
    // multiplicities, so the bag semantics differ from the distinct
    // variants above. Plans as a counted hash aggregate per side +
    // one join — shuffle ∝ distinct values, never raw rows.
    "set_intersect_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_nationkey"))
      a.intersectAll(b).orderBy(col("c_nationkey"))
    }),

    "set_except_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_nationkey"))
      a.exceptAll(b).orderBy(col("c_nationkey"))
    }),

    // symmetric difference — the set op SQL has no keyword for:
    // keys in exactly one of the two sides, composed as
    // (A∖B) ∪ (B∖A) of DISTINCT key sets; each leg is a hash
    // anti-semi on the key, the union is disjoint by construction
    "set_symmetric_diff" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")).distinct()
      val b = c.filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey")).distinct()
      a.except(b).withColumn("side", lit("building_only"))
        .unionByName(b.except(a).withColumn("side", lit("rich_only")))
        .orderBy(col("c_custkey"))
    }))

  val oracle: Map[String, String] = Map(
    "set_symmetric_diff" ->
      """WITH a AS (SELECT DISTINCT c_custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |b AS (SELECT DISTINCT c_custkey FROM customer
        |      WHERE c_acctbal > 9000.0)
        |SELECT c_custkey, 'building_only' AS side
        |FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b) x
        |UNION ALL
        |SELECT c_custkey, 'rich_only' AS side
        |FROM (SELECT c_custkey FROM b EXCEPT SELECT c_custkey FROM a) y
        |ORDER BY c_custkey""".stripMargin,

    "sort_multikey" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag ASC NULLS FIRST, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "topk_global" ->
      """SELECT l_suppkey,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY revenue DESC, l_suppkey ASC LIMIT 20""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
        |ORDER BY c_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY c_custkey""".stripMargin,

    "set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY c_custkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT ALL
        |SELECT c_nationkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY c_nationkey""".stripMargin,

    "set_except_all" ->
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT ALL
        |SELECT c_nationkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY c_nationkey""".stripMargin)
}

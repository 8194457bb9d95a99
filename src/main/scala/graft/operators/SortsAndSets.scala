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
    // Z-order (Morton) clustering key over (size, ⌊price⌋) — the
    // multi-dimensional LAYOUT sort behind file-skipping on two
    // predicates at once (what table formats run as OPTIMIZE ZORDER):
    // sorting by the bit-interleaved key places rows close in BOTH
    // dimensions into the same output ranges, so min/max footers
    // prune either predicate. The interleave is the native codegen'd
    // [[graft.functions.MortonInterleave]] expression (the same
    // 4-step mask-and-shift chain the oracle SQL spells out — as
    // Column ops it was a ~40-node tree per key); the global sort
    // plans as a range exchange; the 100 z-smallest parts surface so
    // the interleaving itself is oracle-checked bit-for-bit.
    "sort_zorder_layout" -> ((s, d) => {
      graft.functions.MortonInterleave.register(s)
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          expr("morton2(CAST(p_size AS BIGINT), " +
            "CAST(floor(p_retailprice) AS BIGINT))").as("zkey"))
        .orderBy(col("zkey"), col("p_partkey"))
        .limit(100)
    }),

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
    "sort_zorder_layout" ->
      """WITH base AS (
        |  SELECT p_partkey, p_size,
        |    CAST(p_size AS BIGINT) & 65535 AS xa,
        |    CAST(floor(p_retailprice) AS BIGINT) & 65535 AS xb,
        |    CAST(floor(p_retailprice) AS BIGINT) AS price_floor
        |  FROM part),
        |s1 AS (SELECT p_partkey, p_size, price_floor,
        |  (xa | (xa << 8)) & 16711935 AS xa,
        |  (xb | (xb << 8)) & 16711935 AS xb FROM base),
        |s2 AS (SELECT p_partkey, p_size, price_floor,
        |  (xa | (xa << 4)) & 252645135 AS xa,
        |  (xb | (xb << 4)) & 252645135 AS xb FROM s1),
        |s3 AS (SELECT p_partkey, p_size, price_floor,
        |  (xa | (xa << 2)) & 858993459 AS xa,
        |  (xb | (xb << 2)) & 858993459 AS xb FROM s2),
        |s4 AS (SELECT p_partkey, p_size, price_floor,
        |  (xa | (xa << 1)) & 1431655765 AS xa,
        |  (xb | (xb << 1)) & 1431655765 AS xb FROM s3)
        |SELECT p_partkey, p_size, price_floor, xa | (xb << 1) AS zkey
        |FROM s4 ORDER BY zkey, p_partkey LIMIT 100""".stripMargin,

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

package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Proves the co-located-join property: joining two tables bucketed on
  * the join key with equal bucket counts plans WITHOUT any Exchange —
  * the at-scale mechanism that turns repeated fact⋈fact joins into
  * local merges (see sources.Bucketed). */
class BucketingSpec extends SparkTestBase {

  test("bucketed join plans with zero Exchange (shuffle-free)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketing is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_extendedprice")
      val o = Tables.orders(spark, sf001).select("o_orderkey", "o_totalprice")
      Bucketed.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
      Bucketed.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
      val joined = Bucketed.bucketJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, plan was:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("bucketed upsert: zero Exchange AND equals the union+window merge") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val base = Tables.orders(spark, sf001)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // same delta derivation as pipeline_upsert_snapshot: reprices +
      // inserts, at most one row per key on each side
      val delta = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.05)
        .unionByName(base.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey",
            col("o_orderkey") + operators.Scans.UpsertNewKeyOffset))
      Bucketed.writeBucketed(base, "ub_base", "o_orderkey", 8)
      Bucketed.writeBucketed(delta, "ub_delta", "o_orderkey", 8)
      val merged = Bucketed.upsertBucketed(spark, "ub_base", "ub_delta",
        "o_orderkey")
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed upsert must be shuffle-free, plan was:\n$plan")
      // row-identical to the generic union + per-key argmax merge
      val got = merged.orderBy(col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey")).orderBy(desc("pri"))
      val ref = base.withColumn("pri", lit(0))
        .unionByName(delta.withColumn("pri", lit(1)))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == ref)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ub_base")
      spark.sql("DROP TABLE IF EXISTS ub_delta")
    }
  }

  test("salted skew join result equals unsalted join") {
    val salted = operators.Joins.queries("join_skew_salted")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = Tables.lineitem(spark, sf001)
    val o = Tables.orders(spark, sf001)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Stable.r4(Stable.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == plain)
  }
}

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

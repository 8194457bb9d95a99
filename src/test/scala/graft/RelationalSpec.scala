package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Edge-case + property tests for the relational core: empty inputs,
  * NULL keys, ties, algebraic laws. Properties run through scalacheck
  * directly (the scalatestplus bridge is not in the offline cache). */
class RelationalSpec extends SparkTestBase {

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  import org.apache.spark.sql.DataFrame

  private def df(rows: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("hash agg on empty input yields zero groups; null keys group together") {
    import spark.implicits._
    assert(df(Nil).groupBy("k").agg(sum("v")).count() == 0)
    val withNulls = Seq((null.asInstanceOf[String], 1.0), (null, 2.0), ("a", 3.0))
      .toDF("k", "v")
    val g = withNulls.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(g == Map(None -> 3.0, Some("a") -> 3.0))
  }

  test("Stable.dsum is partition-order independent") {
    import spark.implicits._
    val vals = (1 to 10000).map(i => i * 0.0101)
    val a = vals.toDF("v").repartition(1).agg(Stable.dsum(col("v"))).head.getDouble(0)
    val b = vals.reverse.toDF("v").repartition(13).agg(Stable.dsum(col("v"))).head.getDouble(0)
    assert(a == b, s"$a != $b") // exact equality, not tolerance
  }

  test("windowed running sum final row equals group total (property)") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0))) { vs =>
      import spark.implicits._
      val d = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
      val last = d.withColumn("rs",
          sum(col("v").cast(DecimalType(28, 10))).over(w).cast(DoubleType))
        .orderBy(desc("id")).limit(1).select("rs").head.getDouble(0)
      val total = d.agg(sum(col("v").cast(DecimalType(28, 10))).cast(DoubleType))
        .head.getDouble(0)
      last == total
    })
  }

  test("set algebra laws hold on DataFrames (property)") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 50)), Gen.listOf(Gen.choose(0, 50))) {
      (xs, ys) =>
        import spark.implicits._
        val a = xs.toDF("x")
        val b = ys.toDF("x")
        val union = a.union(b).distinct().collect().map(_.getInt(0)).toSet
        val inter = a.intersect(b).collect().map(_.getInt(0)).toSet
        val except = a.except(b).collect().map(_.getInt(0)).toSet
        inter.subsetOf(union) &&
          except.intersect(ys.toSet).isEmpty &&
          union == xs.toSet ++ ys.toSet &&
          inter == xs.toSet.intersect(ys.toSet)
    })
  }

  test("max_by breaks no ties on unique ordering values; asof picks latest prior") {
    import spark.implicits._
    // as-of fixture: entity 1 orders at t=1,5; events at t=0,3,7
    val dir = tempDir()
    writeFixture(dir, "orders", Seq(
      (10L, 1L, "O", 100.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "5-LOW"),
      (11L, 1L, "O", 200.0, java.sql.Timestamp.valueOf("2020-01-05 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    val ns = (s: String) => java.sql.Timestamp.valueOf(s).getTime * 1000000L
    writeFixture(dir, "events", Seq(
      (1L, ns("2019-12-31 00:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ns("2020-01-03 00:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ns("2020-01-07 00:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val res = operators.Joins.queries("join_asof")(spark, dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(res.toSeq == Seq(
      1L -> None,          // before any order
      2L -> Some(100.0),   // latest prior = t=1 order
      3L -> Some(200.0)))  // latest prior = t=5 order
  }
}

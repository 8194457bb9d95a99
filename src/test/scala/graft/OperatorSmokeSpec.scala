package graft

/** Every declared query must execute at sf0.001 — the cheap guard
  * that keeps `sbt test` red the moment any operator breaks, before a
  * driver round is spent. Also pins the driver's two contract points:
  * entry() returns rows, and every oracleSql key exists in queries. */
class OperatorSmokeSpec extends SparkTestBase {

  test("entry returns >0 rows at sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys, with aligned columns") {
    val qk = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet.diff(qk)
    assert(extra.isEmpty, s"oracleSql keys without a query: $extra")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}

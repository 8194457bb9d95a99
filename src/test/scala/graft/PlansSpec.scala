package graft

import org.apache.spark.sql.functions._

/** LevenshteinBandRule: the injected length-band guard must appear in
  * the optimized plan, short-circuit ahead of the DP, and change no
  * results. */
class PlansSpec extends SparkTestBase {

  import spark.implicits._

  private def names = Seq(
    (1L, "spark"), (2L, "spars"), (3L, "sparkly"),
    (4L, "a"), (5L, "completely-different-string"))
    .toDF("id", "name")

  test("filter levenshtein<=k gets a length-band guard in the optimized plan") {
    val a = names.select(col("id").as("ia"), col("name").as("na"))
    val b = names.select(col("id").as("ib"), col("name").as("nb"))
    val q = a.crossJoin(b).filter(col("ia") < col("ib") &&
      levenshtein(col("na"), col("nb")) <= 2)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length(na") ||
      optimized.toLowerCase.contains("abs((length(na"),
      s"no band guard in:\n$optimized")
    // guard precedes the DP in the conjunction (short-circuit order)
    val cond = optimized.linesIterator.find(_.contains("levenshtein")).get
    assert(cond.indexOf("abs(") >= 0 &&
      cond.indexOf("abs(") < cond.indexOf("levenshtein"), cond)
  }

  test("rule changes no results vs the hand-banded equivalent") {
    val a = names.select(col("id").as("ia"), col("name").as("na"))
    val b = names.select(col("id").as("ib"), col("name").as("nb"))
    val auto = a.crossJoin(b)
      .filter(col("ia") < col("ib") && levenshtein(col("na"), col("nb")) <= 2)
      .select(col("ia"), col("ib")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: (spark,spars)=1, (spark,sparkly)=2, (spars,sparkly)=3 → out
    assert(auto == Set((1L, 2L), (1L, 3L)), s"got $auto")
  }

  test("rule is idempotent: re-optimizing an optimized condition adds nothing") {
    val a = names.select(col("id").as("ia"), col("name").as("na"))
    val b = names.select(col("id").as("ib"), col("name").as("nb"))
    val q = a.crossJoin(b).filter(levenshtein(col("na"), col("nb")) <= 2)
    val once = q.queryExecution.optimizedPlan
    val twice = graft.plans.LevenshteinBandRule(once)
    assert(twice.fastEquals(once), s"rule not idempotent:\n$twice\nvs\n$once")
  }
}

package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._

/** JSONL/CSV round-trips must be byte-faithful against the parquet
  * ground truth — including CSV quoting of delimiters and quotes
  * embedded in values. */
class TextSourcesSpec extends SparkTestBase {

  test("documents round-trip through JSONL with an explicit schema") {
    val dir = tempDir() + "/docs_jsonl"
    val docs = Tables.documents(spark, sf001)
    TextSources.writeJsonl(docs, dir)
    val back = TextSources.readJsonl(spark, dir, Tables.documentsSchema)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("CSV round-trips values containing delimiters and quotes") {
    import spark.implicits._
    val dir = tempDir() + "/tricky_csv"
    val tricky = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "says \"quoted\" things"),
      (4L, "both, \"at once\""))
      .toDF("id", "text")
    TextSources.writeCsv(tricky, dir)
    val back = TextSources.readCsv(spark, dir, tricky.schema)
    assert(back.exceptAll(tricky).count() == 0 && tricky.exceptAll(back).count() == 0)
  }

  test("ORC round-trips lineitem and pushes predicates into the scan") {
    val dir = tempDir() + "/li_orc"
    val li = Tables.lineitem(spark, sf001)
    TextSources.writeOrc(li, dir)
    val back = TextSources.readOrc(spark, dir, Tables.lineitemSchema)
    assert(back.schema == li.schema)
    assert(back.exceptAll(li).count() == 0 && li.exceptAll(back).count() == 0)
    // the filter must reach the ORC scan as a pushed predicate, and
    // the projection must prune the read schema to the two columns
    val q = back.filter(col("l_quantity") > 30.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"expected pushed ORC filter, plan was:\n$plan")
    assert(!plan.contains("l_extendedprice"), "projection must prune unused columns")
  }

  test("CSV round-trip of a numeric/timestamp-free projection of orders") {
    val dir = tempDir() + "/orders_csv"
    val o = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    TextSources.writeCsv(o, dir)
    val back = TextSources.readCsv(spark, dir, o.schema)
    assert(back.exceptAll(o).count() == 0 && o.exceptAll(back).count() == 0)
  }
}

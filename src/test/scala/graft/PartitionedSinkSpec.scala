package graft

import graft.sources.PartitionedSink
import org.apache.spark.sql.functions._

/** Partition-pruning property for the partitioned parquet sink: a
  * partition-key predicate must prune at the DIRECTORY level (the scan
  * never reads the other partitions' files), not as a post-scan
  * filter. */
class PartitionedSinkSpec extends SparkTestBase {

  test("partitionBy(lang) write + lang predicate prunes to one partition") {
    val dir = tempDir() + "/docs_by_lang"
    PartitionedSink.write(
      Tables.documents(spark, sf001), dir, Seq("lang"))

    val back = PartitionedSink.read(spark, dir)
    // round-trip row count
    assert(back.count() == Tables.documents(spark, sf001).count())

    val pruned = back.filter(col("lang") === "en")
    // the partition filter must reach the file index: every file the
    // scan would read lives under lang=en/
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
        case _ => Nil
      }
    assert(files.nonEmpty)
    assert(files.forall(_.contains("lang=en")),
      s"scan reads outside lang=en: ${files.filterNot(_.contains("lang=en"))}")
    // and the pruned read returns exactly the en rows
    val exact = Tables.documents(spark, sf001)
      .filter(col("lang") === "en").count()
    assert(pruned.count() == exact)
  }
}

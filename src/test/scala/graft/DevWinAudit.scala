package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Dev scratch: sweep every declared query's physical plan for
  * unpartitioned WindowExec nodes and report whether each sits over an
  * aggregate (the bounded-boundary discipline) or raw rows. */
object DevWinAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val sp = fn(spark, d).queryExecution.sparkPlan
        val bad = sp.collect {
          case w: WindowExec if w.partitionSpec.isEmpty &&
            w.child.collect { case a: BaseAggregateExec => a }.isEmpty => w
        }
        if (bad.nonEmpty) println(s"RAW-GLOBAL-WINDOW $name (${bad.size})")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
    }
    println("done")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: plan shape of graph_betweenness_seeds' closing joins. */
object DevBetween2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = operators.GraphOps.queries("graph_betweenness_seeds")(
      spark, "/root/testdata/sf0.001")
    println(q.queryExecution.sparkPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Aggregate") || l.contains("InMemory"))
      .mkString("\n"))
    spark.stop()
  }
}

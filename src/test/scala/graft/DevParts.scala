package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: graph-loop partition-count sensitivity after the r4
  * testdata regeneration shrank the parquet files (different writer
  * compression), which in turn shrank the bytes-derived graphParts. */
object DevParts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = operators.GraphOps.edges(spark, sfDir)
    for (p <- Seq(5, 10, 16, 32)) {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().repartition(p, col("src")).cache()
      sym.count()
      time(s"pageRank(10) parts=$p") {
        operators.GraphOps.pageRank(sym, 10, symmetrized = true, numParts = p).count()
      }
      time(s"pageRank(10) parts=$p 2nd") {
        operators.GraphOps.pageRank(sym, 10, symmetrized = true, numParts = p).count()
      }
      sym.unpersist()
    }
    spark.stop()
  }
}

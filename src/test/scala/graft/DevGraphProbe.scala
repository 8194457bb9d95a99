package graft
import org.apache.spark.sql.SparkSession
object DevGraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val keys = SparkEntry.queries.keys.filter(_.startsWith("graph_")).toSeq.sorted
    // warm shapes at sf0.001
    keys.foreach(k => try SparkEntry.queries(k)(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () })
    for (pass <- 1 to 2; k <- keys) {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, d).count()
      println(f"[p$pass] $k%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object DevSweepOne {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.getOrElse("dedup_containment_pairs").split(",")
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SqlFrontend.register(spark, dir)
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "20000")
    spark.conf.set("spark.sql.cteRecursionRowLimit", "10000000")
    spark.conf.set("spark.sql.analyzer.maxIterations", "1000")
    for (k <- keys) {
      var t0 = System.nanoTime()
      val dsl = SparkEntry.queries(k)(spark, dir).collect().length
      println(f"$k DSL: ${(System.nanoTime()-t0)/1e9}%.1f s ($dsl rows)")
      t0 = System.nanoTime()
      val t1ok = try { spark.sql(SparkEntry.oracleSql(k)).collect().length; true }
        catch { case scala.util.control.NonFatal(_) => false }
      println(f"$k tier1: ${(System.nanoTime()-t0)/1e9}%.1f s (ok=$t1ok)")
      if (!t1ok) SparkDialect.sparkSqlFor(k, SparkEntry.oracleSql(k)).foreach { sql =>
        t0 = System.nanoTime()
        val n = spark.sql(sql).collect().length
        println(f"$k tier2: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
      }
    }
    spark.stop()
  }
}

object DevSweepDump {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.getOrElse("dedup_containment_pairs")
    println(SparkDialect.sparkSqlFor(k, SparkEntry.oracleSql(k)).getOrElse("NOT EXPRESSIBLE"))
  }
}

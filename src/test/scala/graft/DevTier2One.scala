package graft

/** throwaway dev check: tier-2 (Spark-dialect) parity for one key.
  * `Test/runMain graft.DevTier2One <key> [dir]` */
object DevTier2One {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SqlFrontend.register(spark, dir)
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "20000")
    spark.conf.set("spark.sql.cteRecursionRowLimit", "10000000")
    spark.conf.set("spark.sql.analyzer.maxIterations", "1000")
    val sql = SparkDialect.sparkSqlFor(key, SparkEntry.oracleSql(key)).get
    val viaSql = spark.sql(sql).collect().map(_.toString).sorted
    val viaDsl = SparkEntry.queries(key)(spark, dir)
      .collect().map(_.toString).sorted
    println(s"TIER2CHECK key=$key sql=${viaSql.length} dsl=${viaDsl.length}" +
      s" equal=${viaSql.sameElements(viaDsl)}")
    spark.stop()
  }
}

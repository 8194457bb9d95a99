package graft

/** Dev scratch (r11 #1): dump every oracle-SQL key that skips the
  * spark.sql sweep, with the error head, so Spark-dialect texts can be
  * authored key-by-key. Output: dev/sql_skips.txt.
  */
object DevSqlSkips {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SqlFrontend.register(spark, sfDir)
    val out = new java.io.PrintWriter("dev/sql_skips.txt")
    val keys = SparkEntry.oracleSql.keys.toSeq.sorted
    var nSkip = 0
    for (k <- keys) {
      try {
        spark.sql(SparkEntry.oracleSql(k)).collect()
      } catch {
        case e: Throwable =>
          nSkip += 1
          val kind = e match {
            case _: org.apache.spark.sql.catalyst.parser.ParseException => "parse"
            case _: org.apache.spark.sql.AnalysisException => "analysis"
            case _ => s"runtime:${e.getClass.getSimpleName}"
          }
          val head = Option(e.getMessage).getOrElse("").linesIterator
            .take(3).mkString(" | ").take(300)
          out.println(s"$k\t$kind\t$head")
      }
    }
    out.close()
    println(s"skipped $nSkip of ${keys.size} -> dev/sql_skips.txt")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame

/** Dev scratch (r11 #1): run every §2 key's Spark-dialect text
  * ([[SparkDialect.sparkSqlFor]]) through spark.sql and compare to the
  * DSL plan with the sweep's fingerprint. Reports ok / error / mismatch
  * per key to dev/dialect_report.txt. args: [sfDir] [keyFilter...]
  */
object DevDialect {
  private def norm(v: Any): String = v match {
    case null => "<null>"
    case d: java.math.BigDecimal =>
      d.setScale(6, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString
    case d: scala.math.BigDecimal => norm(d.bigDecimal)
    case d: Double => norm(new java.math.BigDecimal(d))
    case f: Float => norm(new java.math.BigDecimal(f.toDouble))
    case n: Number => new java.math.BigDecimal(n.toString)
      .stripTrailingZeros.toPlainString
    case b: Boolean => b.toString
    case s: String => s
    case t: java.sql.Timestamp =>
      java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
        .toString
    case t: java.time.LocalDateTime => t.toString
    case t: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC).toString
    case t: java.sql.Date => t.toString
    case t: java.time.LocalDate => t.toString
    case a: Array[Byte] => a.map("%02x".format(_)).mkString
    case a: Array[_] => a.map(norm).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(norm).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${norm(k)}->${norm(x)}" }.toSeq.sorted
        .mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(norm).mkString("(", ",", ")")
    case other => other.toString
  }

  private def fingerprint(df: DataFrame): Seq[String] = {
    val order = df.columns.zipWithIndex.sortBy(_._1).map(_._2)
    df.collect().map(r => order.map(i => norm(r.get(i))).mkString("|"))
      .sorted.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val filter = args.drop(1).toSet
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.cteRecursionLevelLimit", "20000")
      .config("spark.sql.cteRecursionRowLimit", "10000000")
      .config("spark.sql.analyzer.maxIterations", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SqlFrontend.register(spark, sfDir)
    val keys0 = SparkEntry.oracleSql.keys.toSeq.sorted
    val keys = if (filter.isEmpty) keys0 else keys0.filter(filter)
    val out = new java.io.PrintWriter("dev/dialect_report.txt")
    var ok, err, mm = 0
    for (k <- keys) {
      SparkDialect.sparkSqlFor(k, SparkEntry.oracleSql(k)) match {
        case None => out.println(s"$k\tnot-expressible")
        case Some(sql) =>
          val res =
            try {
              val viaSql = fingerprint(spark.sql(sql))
              val dsl = fingerprint(SparkEntry.queries(k)(spark, sfDir))
              if (viaSql == dsl) { ok += 1; "ok" }
              else {
                mm += 1
                s"MISMATCH sql=${viaSql.size} dsl=${dsl.size} " +
                  s"sqlHead=${viaSql.headOption.getOrElse("").take(80)} " +
                  s"dslHead=${dsl.headOption.getOrElse("").take(80)}"
              }
            } catch {
              case e: Throwable =>
                err += 1
                s"ERROR ${e.getClass.getSimpleName}: " +
                  Option(e.getMessage).getOrElse("").linesIterator
                    .take(2).mkString(" | ").take(400)
            }
          out.println(s"$k\t$res")
          if (res != "ok") {
            out.println("  ---- transpiled ----")
            sql.linesIterator.foreach(l => out.println(s"  $l"))
          }
      }
      out.flush()
    }
    out.close()
    println(s"ok=$ok err=$err mismatch=$mm of ${keys.size} -> dev/dialect_report.txt")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Driver contract: `Verify <sfDir> <outDir>`. An optional third arg
  * (dev-only, comma-separated query names) restricts the run while
  * iterating locally — the driver never passes it.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write µs timestamps (not INT96) so DuckDB/pyarrow read exactly
      // what Spark computed
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.ts is TIMESTAMP(NANOS) parquet — read as raw long, see Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Sink-side schema convention (round-1 post-mortem): every query
    // already casts its timestamp outputs via Stable.ntz, but a raw
    // TimestampType column slipping through would write tz-adjusted
    // parquet (isAdjustedToUTC=true) and fail the driver's schema-
    // strict compare vs the tz-naive DuckDB oracle. Belt: normalize
    // any remaining top-level TimestampType output to TIMESTAMP_NTZ
    // (session TZ is UTC — values unchanged).
    def ntzBelt(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.foldLeft(df) { (acc, f) =>
        if (f.dataType == org.apache.spark.sql.types.TimestampType)
          acc.withColumn(f.name,
            org.apache.spark.sql.functions.col(f.name).cast("timestamp_ntz"))
        else acc
      }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try ntzBelt(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines and CSV source/sink pair — the interchange formats a
  * pipeline meets at its edges (vendor drops, exports, logs).
  *
  * Reads take an EXPLICIT schema, never inference: schema inference
  * is a full extra pass over the data before the real scan (at 100 TB
  * that doubles the read), and inferred types drift with content.
  * With the schema supplied, both formats stream through the same
  * FileScan machinery as parquet — splittable (JSONL/CSV split on
  * line boundaries), predicate-filtered after parse, column-pruned at
  * parse time for JSON.
  *
  * TextSourcesSpec pins byte-faithful round-trips (including CSV
  * quoting of delimiters/quotes inside values) against the parquet
  * ground truth.
  */
object TextSources {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC — the columnar interchange peer to parquet (warehouse
    * migrations, Hive-era estates). Unlike the text formats, ORC
    * carries its own types, min/max stripe statistics, and predicate
    * pushdown, so reads prune columns AND skip stripes like the
    * parquet path; TextSourcesSpec asserts the pushed filter appears
    * in the scan. Schema still supplied explicitly on read: trusting
    * file-embedded schemas silently widens types across mixed-writer
    * estates. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}

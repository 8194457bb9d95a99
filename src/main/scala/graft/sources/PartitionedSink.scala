package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet sink + partition-pruned reads — the
  * layout side of the scale story.
  *
  * A corpus written `partitionBy(lang)` (or date, source, split…)
  * turns every partition-key predicate into DIRECTORY pruning: a query
  * for one language of a 100 TB corpus lists and reads only that
  * language's files — the scan never opens the rest. PartitionedSinkSpec
  * asserts the property on the physical plan (the scan's partition
  * filters are populated and the other partitions' files are absent
  * from the read).
  *
  * `maxRecordsPerFile` bounds output file size so downstream readers
  * get splittable, evenly-sized files instead of one giant file per
  * partition (the small-file/giant-file balance every 100 TB pipeline
  * has to manage).
  */
object PartitionedSink {

  /** write `df` as parquet partitioned by `keys` under `path` */
  def write(df: DataFrame, path: String, keys: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .partitionBy(keys: _*).parquet(path)
  }

  /** read a partitioned dataset back (partition columns are
    * reconstructed from the directory layout) */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

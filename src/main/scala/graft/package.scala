package object graft {
  /** A declared query: (session, sf-directory) => result DataFrame.
    * The driver's Verify/Bench mains iterate `SparkEntry.queries` with
    * this exact shape. */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 appears here as one key in
  * `queries`, with its DuckDB-equivalent SQL in `oracleSql` unless the
  * operator is not SQL-expressible (sketches, iterative fixpoints) —
  * those are property-tested in src/test instead.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  private val sets: Seq[(Map[String, QFn], Map[String, String])] = Seq(
    (operators.Scans.queries, operators.Scans.oracle),
    (operators.Filters.queries, operators.Filters.oracle),
    (operators.Aggregates.queries, operators.Aggregates.oracle),
    (operators.SortsAndSets.queries, operators.SortsAndSets.oracle),
    (operators.Joins.queries, operators.Joins.oracle),
    (operators.Windows.queries, operators.Windows.oracle),
    (operators.Scalars.queries, operators.Scalars.oracle),
    (operators.TimeSeriesOps.queries, operators.TimeSeriesOps.oracle),
    (operators.GraphOps.queries, operators.GraphOps.oracle),
    (operators.TextOps.queries, operators.TextOps.oracle),
    (operators.DedupOps.queries, operators.DedupOps.oracle),
    (operators.VectorOps.queries, operators.VectorOps.oracle),
    (operators.MultimodalOps.queries, operators.MultimodalOps.oracle),
    (operators.MiningOps.queries, operators.MiningOps.oracle),
    (operators.PatentPipeline.queries, operators.PatentPipeline.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, QFn] = sets.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = sets.map(_._2).reduce(_ ++ _)
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time the Borůvka MSF at a given SF with per-round
  * logging (`boruvkaMsf(verbose = true)`). Usage:
  * `runMain graft.DevMst [sfDir]`. */
object DevMst {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(sc.stageInfo.numTasks)
          taskMs.addAndGet(
            sc.stageInfo.taskMetrics.executorRunTime)
        }
      })
    new Thread(() => {
      while (true) {
        Thread.sleep(5000)
        System.err.println(s"[mstmon] stages=${stages.get} tasks=${tasks.get} " +
          s"taskMs=${taskMs.get}")
      }
    }) { setDaemon(true) }.start()
    val t0 = System.nanoTime()
    val pair = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("a"),
        (col("l_suppkey") + operators.GraphOps.SupplierVertexOffset).as("b"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .withColumn("w", expr("CAST(1000000 DIV n_orders AS BIGINT)"))
      .select(col("a"), col("b"), col("w"))
    val n = operators.GraphOps.boruvkaMsf(pair,
      numParts = 8, verbose = true).count()
    System.err.println(f"[boruvka] TOTAL $n forest edges in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}

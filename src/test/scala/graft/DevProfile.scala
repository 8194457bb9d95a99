package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler: times named sub-plans of the expensive
  * queries so optimization targets the measured stage, not a guess.
  * Usage: runMain graft.DevProfile [sfDir]. Not part of the driver
  * contract (like DevGraphBench).
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/nation.parquet").count()

    // per-job wall time + task counts while a profiled block runs
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobLog.put(js.jobId, (System.nanoTime(), js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobLog.get(je.jobId)).foreach { case (t0, ntasks) =>
          println(f"[job] id=${je.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%8.3f s  tasks=$ntasks")
        }
      }
    })

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }

    val jobs: Map[String, (SparkSession, String) => Long] = Map(
      "cluster_canonical_first" -> ((s, dir) =>
        SparkEntry.queries("dedup_cluster_canonical")(s, dir).count()),
      "pipeline_clean_corpus" -> ((s, dir) =>
        SparkEntry.queries("pipeline_clean_corpus")(s, dir).count()),
      "repetition_stats" -> ((s, dir) =>
        SparkEntry.queries("text_repetition_stats")(s, dir).count()),
      "pagerank" -> ((s, dir) =>
        SparkEntry.queries("graph_pagerank")(s, dir).count()),
      "connected_components" -> ((s, dir) =>
        SparkEntry.queries("graph_connected_components")(s, dir).count()),
      "triangles" -> ((s, dir) =>
        SparkEntry.queries("graph_triangles")(s, dir).count()),
      "common_neighbors" -> ((s, dir) =>
        SparkEntry.queries("graph_common_neighbors")(s, dir).count()),
      "pipeline_explain" -> ((s, dir) => {
        SparkEntry.queries("pipeline_clean_corpus")(s, dir).explain("formatted")
        0L
      }),
      "pagerank_shuffle" -> ((s, dir) => {
        s.conf.set(operators.GraphOps.BroadcastStateMaxRowsKey, "0")
        try SparkEntry.queries("graph_pagerank")(s, dir).count()
        finally s.conf.unset(operators.GraphOps.BroadcastStateMaxRowsKey)
      }),
      "cc_shuffle" -> ((s, dir) => {
        s.conf.set(operators.GraphOps.BroadcastStateMaxRowsKey, "0")
        try SparkEntry.queries("graph_connected_components")(s, dir).count()
        finally s.conf.unset(operators.GraphOps.BroadcastStateMaxRowsKey)
      }),
      // dedup_winnow_pairs stage breakdown
      "winnow_fps" -> ((s, dir) =>
        operators.TextOps.winnowFpArrays(s, dir).count()),
      "winnow_explode" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        operators.TextOps.winnowFpArrays(s, dir)
          .select(col("doc_id"), explode(col("fps")).as("fp")).count()
      }),
      "winnow_post_count" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        operators.TextOps.winnowFpArrays(s, dir)
          .select(col("doc_id"), explode(col("fps")).as("fp"))
          .groupBy(col("fp")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2).count()
      }),
      "winnow_post_collect" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        operators.TextOps.winnowFpArrays(s, dir)
          .select(col("doc_id"), size(col("fps")).as("n_fp"),
            explode(col("fps")).as("fp"))
          .groupBy(col("fp"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("n_fp"))))
            .as("ds"))
          .filter(size(col("ds")).between(2, operators.DedupOps.WinnowPostingCap))
          .count()
      }),
      "winnow_pairs_full" -> ((s, dir) =>
        SparkEntry.queries("dedup_winnow_pairs")(s, dir).count()))

    val order = args.drop(1) match {
      case more if more.nonEmpty => more.toSeq
      case _ => Seq("cluster_canonical_first", "pipeline_clean_corpus",
        "repetition_stats", "pagerank", "connected_components",
        "triangles", "common_neighbors")
    }
    order.foreach(name => t(name)(jobs(name)(spark, d)))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.graphx.{Edge, Graph}

/** Dev scratch: DataFrame-loop vs GraphX for PageRank/CC at sf0.1.
  *
  * Measured (sf0.1, local[32], 2026-08-12): DataFrame pageRank(10)
  * 13.3s vs GraphX staticPageRank(10) 64.0s; DataFrame CC 4.5s vs
  * GraphX connectedComponents 16.3s. The Catalyst/Tungsten loops beat
  * the RDD engine ~5× here — which is why GraphOps ships the
  * DataFrame implementations and GraphX serves only as a semantic
  * cross-check in GraphSpec. */
object DevGraphBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val edg = operators.GraphOps.edges(spark, sfDir).cache()
    edg.count()
    time("df pageRank(10)") {
      operators.GraphOps.pageRank(edg, 10).count()
    }
    time("df pageRank(10) 2nd run") {
      operators.GraphOps.pageRank(edg, 10).count()
    }
    // unrolled: all 10 iterations as ONE lazy plan, no per-iteration
    // checkpoint/action — measures whether the loop is job-overhead
    // bound rather than compute bound
    time("df pageRank(10) unrolled") {
      import org.apache.spark.sql.functions._
      val sym = edg.union(edg.select(col("dst").as("src"), col("src").as("dst"))).distinct().cache()
      val outDeg = sym.groupBy(col("src")).agg(count(lit(1)).as("odeg")).cache()
      val withDeg = sym.join(outDeg, Seq("src")).cache()
      withDeg.count()
      var pr = outDeg.select(col("src").as("v"), lit(1.0).as("pr"))
      for (_ <- 1 to 10) {
        val contrib = withDeg.join(broadcast(pr), withDeg("src") === pr("v"))
          .select(col("dst").as("v2"), (col("pr") / col("odeg")).as("c"))
          .groupBy(col("v2")).agg(sum(col("c")).as("sc"))
        pr = pr.join(contrib, pr("v") === col("v2"), "left")
          .select(col("v"), (lit(0.15) + lit(0.85) * coalesce(col("sc"), lit(0.0))).as("pr"))
      }
      pr.count()
    }
    time("df connectedComponents") {
      operators.GraphOps.connectedComponents(edg).count()
    }
    val rdd = edg.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val symRdd = rdd.union(rdd.map(x => Edge(x.dstId, x.srcId, 1))).distinct()
    val g = Graph.fromEdges(symRdd, 1).cache()
    g.numEdges
    time("graphx staticPageRank(10)") {
      g.staticPageRank(10).vertices.count()
    }
    time("graphx connectedComponents") {
      g.connectedComponents().vertices.count()
    }
    spark.stop()
  }
}

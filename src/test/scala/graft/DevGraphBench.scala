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
  * cross-check in GraphSpec. A fully-unrolled 10-iteration single
  * plan (no per-iteration action) was also measured and rejected:
  * 16.5s vs 11.4s — Catalyst planning of the 10-deep nested plan
  * costs more than the per-iteration actions it avoids. */
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: wedge-join vs adjacency-intersect triangle census at
  * sf0.1 — measurement to decide which formulation GraphOps ships.
  * Both are degree-oriented O(m^1.5); the difference is whether the
  * Σ outdeg² wedge work materializes as 42 M probe ROWS through a
  * broadcast semi join (current) or stays inside a codegen'd
  * array_intersect over pre-grouped adjacency arrays (candidate). */
object DevTriangleX {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // co-part derivation (shared by both variants) — time it once so
    // the variant numbers isolate the census itself
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("a"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("b"))
    val co = time("coParts derive+cache (self-join)") {
      val x = a.join(b, Seq("ok")).filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct().cache()
      x.count(); x
    }

    val co2 = time("coParts derive+cache (collect_set)") {
      val x = spark.read.parquet(s"$d/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .select(col("p.a"), col("p.b")).distinct().cache()
      x.count(); x
    }
    val nco = co.count(); val nco2 = co2.count()
    println(s"rows: self-join=$nco collect_set=$nco2 " +
      (if (nco == nco2) "EQUAL" else "MISMATCH!"))

    def orient(): DataFrame = {
      val sym = co.select(col("a").as("u"), col("b").as("v"))
        .union(co.select(col("b").as("u"), col("a").as("v")))
      val vk = sym.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        .select(col("u").as("vertex"), struct(col("dg"), col("u")).as("k"))
      sym
        .join(vk.select(col("vertex").as("u"), col("k").as("ku")), Seq("u"))
        .join(vk.select(col("vertex").as("v"), col("k").as("kv")), Seq("v"))
        .filter(col("ku") < col("kv"))
        .select(col("u"), col("v"), col("kv"))
    }

    for (round <- 1 to 2) {
      time(s"[A] wedge-join broadcast (r$round)") {
        val dir = orient().cache()
        val w1 = dir.select(col("u"), col("v").as("x"), col("kv").as("kx"))
        val w2 = dir.select(col("u"), col("v").as("y"), col("kv").as("ky"))
        val wedges = w1.join(w2, Seq("u")).filter(col("kx") < col("ky"))
          .select(col("x"), col("y"))
        val closing = dir.select(col("u").as("x"), col("v").as("y"))
        val n = wedges.join(broadcast(closing), Seq("x", "y"), "left_semi")
          .agg(count(lit(1))).first().getLong(0)
        dir.unpersist(); n
      }

      time(s"[B] adjacency array_intersect (r$round)") {
        val dir = orient().cache()
        val adj = dir.groupBy(col("u"))
          .agg(array_sort(collect_list(col("v"))).as("ns"))
        val n = dir
          .join(adj.select(col("u"), col("ns").as("nu")), Seq("u"))
          .join(adj.select(col("u").as("v"), col("ns").as("nv")), Seq("v"))
          .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
          .agg(coalesce(sum(col("t")), lit(0L))).first().getLong(0)
        dir.unpersist(); n
      }

      time(s"[C] adjacency bcast-join (r$round)") {
        // same intersect shape, but the adjacency table broadcast to
        // the directed-edge stream (adj rows = vertex count, arrays
        // bounded by sqrt-m orientation)
        val dir = orient().cache()
        val adj = dir.groupBy(col("u"))
          .agg(array_sort(collect_list(col("v"))).as("ns")).cache()
        adj.count()
        val n = dir
          .join(broadcast(adj.select(col("u"), col("ns").as("nu"))), Seq("u"))
          .join(broadcast(adj.select(col("u").as("v"), col("ns").as("nv"))), Seq("v"))
          .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
          .agg(coalesce(sum(col("t")), lit(0L))).first().getLong(0)
        dir.unpersist(); adj.unpersist(); n
      }
    }
    spark.stop()
  }
}

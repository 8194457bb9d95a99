package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: how many (u,v,w) oriented triangle ROWS does the
  * co-part graph hold at each SF? Decides whether the round-5 shared
  * triangle relation can be cached (memory ∝ 3 longs × triangles). */
object DevTriCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val co = spark.read.parquet(s"$d/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .select(col("p.a"), col("p.b")).distinct()
      val sym = co.select(col("a").as("u"), col("b").as("v"))
        .union(co.select(col("b").as("u"), col("a").as("v")))
      val vk = sym.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        .select(col("u").as("vertex"), struct(col("dg"), col("u")).as("k"))
      val dir = sym
        .join(vk.select(col("vertex").as("u"), col("k").as("ku")), Seq("u"))
        .join(vk.select(col("vertex").as("v"), col("k").as("kv")), Seq("v"))
        .filter(col("ku") < col("kv"))
        .select(col("u"), col("v"))
      val adj = dir.groupBy(col("u"))
        .agg(array_sort(collect_list(col("v"))).as("ns"))
      val tri = dir
        .join(adj.select(col("u"), col("ns").as("nu")), Seq("u"))
        .join(adj.select(col("u").as("v"), col("ns").as("nv")), Seq("v"))
        .select(col("u"), col("v"),
          explode(array_intersect(col("nu"), col("nv"))).as("w"))
      val n = tri.count()
      val ne = co.count()
      println(f"$d: edges=$ne triangles=$n  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}

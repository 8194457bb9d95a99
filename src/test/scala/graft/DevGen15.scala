package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (r15): A/B the native sorted_pairs/sorted_triples
  * generators against the flatten/transform/slice composition they
  * replaced, on the REAL capped neighbor sets at sf0.1, isolating the
  * explode from the downstream aggregate (noop sink per guide §1.4).
  *
  * Usage: Test/runMain graft.DevGen15 [sfDir]
  */
object DevGen15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SortedCombinations.register(spark)
    import spark.implicits._

    // the adamic input shape: capped sorted neighbor sets
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val or = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val e = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 100000000L).as("dst"))
      .distinct()
    val ok = e.groupBy(col("src")).agg(count(lit(1)).as("cdeg"))
      .filter(col("cdeg") <= 1000L).select(col("src"))
    val sets = e.join(ok, Seq("src"), "left_semi")
      .groupBy(col("src"))
      .agg(array_sort(collect_set(col("dst"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .localCheckpoint() // input materialized ONCE, off the clock

    val nSets = sets.count()
    println(s"input: $nSets capped neighbor sets")

    val oldPairs = sets.select(explode(expr(
      """flatten(transform(ds, (x, i) ->
        |  transform(slice(ds, i + 2, size(ds)), y ->
        |    struct(x AS s1, y AS s2))))""".stripMargin)).as("p"))
      .select(col("p.s1").as("s1"), col("p.s2").as("s2"))
    val newPairs = sets.select(expr("sorted_pairs(ds)").as(Seq("s1", "s2")))

    def time(label: String, reps: Int = 3)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-40s $best%7.2f s (min of $reps)")
    }

    // 1. pure explode cost (noop eats the pair stream)
    time("OLD explode only")(oldPairs)
    time("NEW explode only")(newPairs)
    // 2. explode + the real pair aggregate
    time("OLD explode+agg")(oldPairs.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("i")))
    time("NEW explode+agg")(newPairs.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("i")))

    // row-count equality + where the Generate landed in the final plan
    val oldN = oldPairs.count(); val newN = newPairs.count()
    println(s"pair rows: old=$oldN new=$newN equal=${oldN == newN}")
    val ep = newPairs.queryExecution.executedPlan.toString
    println("executed plan (new):")
    println(ep.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}

/** A/B: sorted_intersect vs explode(array_intersect) on the real
  * co-part adjacency at sf0.1. Usage: Test/runMain graft.DevGen15b */
object DevGen15b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SortedCombinations.register(spark)
    // co-part pairs -> degree-oriented adjacency (the triangleRel shape)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val co = li.groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(expr("sorted_pairs(ps)").as(Seq("a", "b")))
      .distinct()
    val sym = co.select(col("a").as("u"), col("b").as("v"))
      .union(co.select(col("b").as("u"), col("a").as("v")))
    val vk = sym.groupBy(col("u")).agg(count(lit(1)).as("dg"))
      .select(col("u").as("vertex"), struct(col("dg"), col("u")).as("k"))
    val adj = sym
      .join(vk.select(col("vertex").as("u"), col("k").as("ku")), Seq("u"))
      .join(vk.select(col("vertex").as("v"), col("k").as("kv")), Seq("v"))
      .filter(col("ku") < col("kv"))
      .groupBy(col("u"))
      .agg(array_sort(collect_list(col("v"))).as("ns"))
      .localCheckpoint() // off the clock
    val dir = adj.select(col("u"), explode(col("ns")).as("v"))
    val nu = adj.select(col("u"), col("ns").as("nu"))
    val nv = adj.select(col("u").as("v"), col("ns").as("nv"))
    val joined = dir.join(broadcast(nu), Seq("u")).join(broadcast(nv), Seq("v"))
    def time(label: String, reps: Int = 3)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-40s $best%7.2f s (min of $reps)")
    }
    val oldTri = joined.select(col("u"), col("v"),
      explode(array_intersect(col("nu"), col("nv"))).as("w"))
    val newTri = joined.select(col("u"), col("v"),
      expr("sorted_intersect(nu, nv)").as(Seq("w")))
      .select(col("u"), col("v"), col("w"))
    time("OLD array_intersect witnesses")(oldTri)
    time("NEW sorted_intersect witnesses")(newTri)
    val o = oldTri.count(); val n2 = newTri.count()
    println(s"witness rows: old=$o new=$n2 equal=${o == n2}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevBetween4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r"); r
    }
    val m1 = operators.GraphOps.getClass.getDeclaredMethods.find(_.getName == "seedPathCounts").get
    m1.setAccessible(true)
    val acc = m1.invoke(operators.GraphOps, spark, d).asInstanceOf[org.apache.spark.sql.DataFrame]
    acc.count()
    val m0 = operators.GraphOps.getClass.getDeclaredMethods.find(_.getName == "seedDistances").get
    m0.setAccessible(true)
    val sd = m0.invoke(operators.GraphOps, spark, d).asInstanceOf[org.apache.spark.sql.DataFrame]
    val seeds = sd.filter(col("dist") === 0L).select(col("v").as("t"))
    val st = acc.join(broadcast(seeds), acc("v") === col("t"))
      .filter(col("seed") < col("t"))
      .select(col("seed").as("s"), col("t"), col("np").as("sst"), col("dist").as("dst"))
    time("st rows")(st.count())
    val ss = acc.select(col("seed").as("s"), col("v"), col("np").as("nps"), col("dist").as("ds2"))
    val tt = acc.select(col("seed").as("t"), col("v"), col("np").as("npt"), col("dist").as("dt2"))
    val j1 = broadcast(st).join(ss, Seq("s"))
    time("st x ss rows")(j1.count())
    val j2 = j1.join(tt, Seq("t", "v"))
      .filter(col("v") =!= col("s") && col("v") =!= col("t") &&
        col("ds2") + col("dt2") === col("dst"))
    time("contrib rows")(j2.count())
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CosineSimilarity

/** dev sweep (r13, VERDICT r12 #4): which MULTI-TABLE (tables × bits ×
  * flips) LSH serving configuration reaches recall@1 ≥ 0.8 vs brute
  * force, and at what candidate cost? Single-table flip probing tops
  * out at 0.6 on this corpus (measured — its nearest neighbors are
  * weakly correlated, cos ceiling ~0.48, so one table's collisions
  * can't cover them); independent tables multiply coverage:
  * recall = 1 - Π (1 - p_table). */
object DevAnnServe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CosineSimilarity.register(spark)
    def cosine(a: String, b: String) = expr(s"cosine_sim($a, $b)")
    // plane pool: the 16-bit ANN family + the 32-bit cluster family =
    // 48 independent sign planes to slice into tables
    val pool: Array[Array[Int]] = VectorOps.planes ++ VectorOps.clusterPlanes
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.Tables.embeddings(spark, d)
      val probes0 = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("p"), col("embedding").as("pe"))
      val truth = probes0
        .join(e.select(col("vec_id").as("b"), col("embedding").as("be")),
          col("p") =!= col("b"))
        .select(col("p"), struct(round(cosine("pe", "be"), 4).as("cos"),
          (-col("b")).as("negb")).as("sc"))
        .groupBy(col("p")).agg(max(col("sc")).as("best"))
        .select(col("p"), (-col("best.negb")).as("t_nn"))
        .cache()
      val nProbes = truth.count()
      for ((nT, bits, flips) <- Seq((8, 6, 2), (8, 6, 4), (8, 6, 6),
          (6, 8, 4), (6, 8, 6))) {
        // per-table candidate sets, unioned then deduped per (p, b)
        val perTable = (0 until nT).map { t =>
          val ps = pool.slice(t * bits, t * bits + bits)
          val dotted = VectorOps.planeDotted(spark, d, ps, "dots")
            .withColumn("bucket", VectorOps.bucketOfDots(ps, "dots"))
          val sched = if (flips == 0) "array(bucket)" else
            s"""concat(array(bucket),
               |  transform(slice(transform(array_sort(
               |      transform(dots, (x, i) -> struct(abs(x) AS m, i AS i))),
               |    t -> t.i), 1, $flips),
               |  f -> bucket ^ shiftleft(CAST(1 AS BIGINT), f)))""".stripMargin
          val pb = dotted.filter(col("vec_id") < 100)
            .select(col("vec_id").as("p"), explode(expr(sched)).as("probe"))
          val corpus = dotted.select(col("bucket").as("probe"),
            col("vec_id").as("b"))
          pb.join(corpus, Seq("probe"))
            .filter(col("p") =!= col("b"))
            .select(col("p"), col("b"))
        }
        val cand = perTable.reduce(_ unionByName _).distinct()
        val scored = cand
          .join(e.select(col("vec_id").as("p"), col("embedding").as("pe")),
            Seq("p"))
          .join(e.select(col("vec_id").as("b"), col("embedding").as("be")),
            Seq("b"))
          .select(col("p"), col("b"), round(cosine("pe", "be"), 4).as("cos"))
        val w = Window.partitionBy(col("p")).orderBy(desc("cos"), asc("b"))
        val win = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val nHit = win.join(truth, Seq("p"))
          .filter(col("b") === col("t_nn")).count()
        val nCand = cand.count()
        println(f"$d%-24s T=$nT bits=$bits flips=$flips " +
          f"recall=${nHit.toDouble / nProbes}%6.3f " +
          f"mean_cand=${nCand.toDouble / nProbes}%8.1f")
      }
      truth.unpersist()
    }
    spark.stop()
  }
}

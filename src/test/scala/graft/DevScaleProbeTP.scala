package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r12, VERDICT r11 #3): the text/pipeline family at 10× —
  * the last unprobed family (graph was r10, dedup/vector r11). Reuses
  * [[DevScaleProbeDV.synth]]'s 50k-document corpus (sf0.1 has 5k) and
  * adds a 10× basket synth (6M lineitem rows over 200k parts, ~4 lines
  * per order, 25 brands — the TPC-H shape at 10× sf0.1) for the
  * basket-mining head.
  *
  * What it verifies at 10×, per head (wall-clock printed next to the
  * same code's sf0.1 numbers; shuffle-write bytes from the bench
  * telemetry listener so "shuffle ∝ bounded aggregates" is MEASURED,
  * not asserted):
  *  - text_novelty_curve: the winnow-gram census shuffle carries
  *    (gram, first-doc) partials — ∝ distinct grams, not doc bytes;
  *  - pipeline_pack_chunks: the global prefix sum runs the distributed
  *    bucket discipline — one bounded bucket-stats exchange;
  *  - pipeline_lm_perplexity: the bigram model is vocab-bounded; the
  *    scoring join carries (bigram, count) partials;
  *  - text_ngram_topk: (term, count) partials, vocab-bounded;
  *  - mine_itemsets_3: triples explode from per-basket brand SETS
  *    (bounded by basket size), never an item self-join.
  */
object DevScaleProbeTP {

  def synthBaskets(spark: SparkSession, dir: String): Unit = {
    val fs = new java.io.File(dir)
    if (new java.io.File(fs, "lineitem.parquet").exists()) return
    fs.mkdirs()
    // 6M lineitem rows, 4 per order, parts hash-assigned
    spark.range(0, 6000000).select(
        (col("id") / 4).cast("long").as("l_orderkey"),
        (pmod(xxhash64(col("id") * 37L), lit(200000L)) + 1).as("l_partkey"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    spark.range(1, 200001).select(
        col("id").as("p_partkey"),
        concat(lit("Brand#"),
          pmod(xxhash64(col("id") * 13L), lit(25L))).as("p_brand"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
  }

  val heads: Seq[(String, String)] = Seq(
    "text_novelty_curve" -> "documents",
    "pipeline_pack_chunks" -> "documents",
    "pipeline_lm_perplexity" -> "documents",
    "text_ngram_topk" -> "documents",
    "mine_itemsets_3" -> "baskets")

  def main(args: Array[String]): Unit = {
    val probeDir = args.headOption.getOrElse("/tmp/graft_tpprobe1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    DevScaleProbeDV.synth(spark, probeDir) // 50k docs / 20k embeddings
    synthBaskets(spark, probeDir)
    val telemetry = new Bench.ShuffleTelemetry
    spark.sparkContext.addSparkListener(telemetry)
    def drain(): Unit =
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    def run(d: String): Seq[(String, Double, Long)] = {
      operators.GraphOps.clearMemos(spark)
      operators.DedupOps.clearMemos(spark)
      operators.VectorOps.clearMemos(spark)
      spark.catalog.clearCache()
      heads.map { case (name, _) =>
        drain()
        val w0 = telemetry.snapshot._1
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        val t = (System.nanoTime() - t0) / 1e9
        drain()
        (name, t, telemetry.snapshot._1 - w0)
      }
    }
    // codegen warmup at sf0.01, then the two measured dirs
    heads.foreach { case (name, _) =>
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").count() }
    val sf01 = run("/root/testdata/sf0.1")
    val probe = run(probeDir)
    println(f"${"query"}%-24s ${"sf0.1 s"}%8s ${"10x s"}%8s ${"t-ratio"}%7s " +
      f"${"shufW 1x"}%10s ${"shufW 10x"}%10s ${"w-ratio"}%7s")
    sf01.zip(probe).foreach { case ((n, a, wa), (_, b, wb)) =>
      println(f"$n%-24s $a%8.2f $b%8.2f ${b / a}%7.2f " +
        f"$wa%10d $wb%10d ${if (wa > 0) wb.toDouble / wa else -1.0}%7.2f")
    }
    spark.stop()
  }
}

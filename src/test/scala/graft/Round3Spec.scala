package graft

import org.apache.spark.sql.functions._

/** Targeted tests for the round-3 operators: planted-fixture semantics
  * for PII redaction and the bucketized range join, quantization math
  * on hand vectors, and the sketch-vs-exact property for the HLL
  * union (which has no oracle by design). */
class Round3Spec extends SparkTestBase {

  private def docsFixture(dir: String, rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    writeFixture(dir, "documents",
      rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("text_pii_redact: planted email and long number are counted and scrubbed") {
    val dir = tempDir()
    docsFixture(dir, Seq(
      (1L, "contact me at jane.doe@example.com or call 5551234567 now", "en", "s0"),
      (2L, "plain text with no pii at all", "en", "s0"),
      (3L, "two mails a@b.co c.d@e.org and short num 12345", "en", "s0")))
    val out = operators.TextOps.queries("text_pii_redact")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(2L)._1 == 0 && out(2L)._2 == 0)
    // 12345 is below the 6-digit threshold; both emails found
    assert(out(3L)._1 == 2 && out(3L)._2 == 0)
    // the fingerprint is of the SCRUBBED text — equal to md5 of the
    // hand-redacted string, different from the raw md5
    import spark.implicits._
    val expected = Seq("contact me at <EMAIL> or call <NUM> now").toDF("t")
      .select(md5(col("t"))).head().getString(0)
    assert(out(1L)._3 == expected)
  }

  test("join_range_bucketed: pairs within 120s counted once, across bucket boundaries too") {
    val dir = tempDir()
    import spark.implicits._
    // base at 100 s into a 120 s bucket so the +60 s event lands in the
    // NEXT bucket: the pair must still be found (adjacent-bucket join)
    val baseUs = (1700000000L * 1000000L / 120000000L) * 120000000L + 100000000L
    def ns(offsetSec: Long) = (baseUs + offsetSec * 1000000L) * 1000L
    writeFixture(dir, "events", Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(60), 1L, "view", 1.0, "{}"),   // Δ(1,2)=60s — cross-bucket pair
      (3L, ns(130), 1L, "view", 1.0, "{}"),  // Δ(2,3)=70s; Δ(1,3)=130s > 120s
      (4L, ns(1000), 2L, "view", 1.0, "{}")) // user 2: no pairs
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = operators.Joins.queries("join_range_bucketed")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L), s"got $out")
  }

  test("vec_quantize_int8: codes are the affine grid; constant vector degrades to 0") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "embeddings", Seq(
      (1L, Array(0.0f, 1.0f, 2.0f, 3.0f), 0),
      (2L, Array(5.0f, 5.0f, 5.0f, 5.0f), 0))
      .toDF("vec_id", "embedding", "label"))
    val out = operators.VectorOps.queries("vec_quantize_int8")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    // codes for [0,1,2,3]: floor(x*255/3) = 0, 85, 170, 255 → sum 510
    assert(out(1L) == ((0.0, 3.0, 510L)))
    assert(out(2L) == ((5.0, 5.0, 0L)))
  }

  test("agg_hll_union: merged sketch estimate within 5% of exact per-region count") {
    val approx = SparkEntry.queries("agg_hll_union")(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = Tables.customer(spark, sf001)
      .join(Tables.nation(spark, sf001), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, est) <- approx) {
      val ex = exact(k).toDouble
      assert(math.abs(est - ex) <= math.max(1.0, 0.05 * ex),
        s"region $k: estimate $est vs exact $ex")
    }
  }

  test("sample_stratified: exactly the rows whose hash bucket clears the per-lang rate") {
    val sampled = SparkEntry.queries("sample_stratified")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val expected = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"))
      .collect()
      .filter { r =>
        val bucket = (r.getLong(0) % 100000000L) * 2654435761L % 1000L
        bucket < (if (r.getString(1) == "en") 500L else 200L)
      }
      .map(_.getLong(0)).toSet
    assert(sampled == expected)
    assert(sampled.nonEmpty)
  }

  test("win_percent_dist: pct_rank spans [0,1] and deciles stay in 1..10") {
    val rows = SparkEntry.queries("win_percent_dist")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val pct = rows.map(_.getDouble(3))
    assert(pct.min >= 0.0 && pct.max <= 1.0)
    assert(pct.contains(1.0)) // every >1-row partition tops out at 1
    val deciles = rows.map(_.getInt(5)).toSet
    assert(deciles.subsetOf((1 to 10).toSet))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Round-10 pins (VERDICT r9 #1 + ADVICE r9 #3): the decontamination
  * eval-pool broadcast is now under a declared numeric cap with loud
  * refusal — the last place a 100× scale-up degraded silently — and
  * mergeCcDelta's remap broadcast is gated on the measured delta
  * (shuffle-join fallback past the state cap, identical result).
  */
class Round10Spec extends SparkTestBase {

  /** a documents fixture whose eval slice (doc_id % DecontamEvalMod
    * = 0) is non-empty: doc 0 and 100 are eval, 1..6 are train. Texts
    * long enough to carry k=16 winnow grams. */
  private def writeDocs(dir: String): Unit = {
    import spark.implicits._
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 100L).map { id =>
      (id, s"doc $id $words tail$id", "en", "src", 0L)
    }
    writeFixture(dir, "documents",
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  private def writeEmb(dir: String, n: Int): Unit = {
    import spark.implicits._
    val rows = (0 until n).map(i =>
      (i.toLong, Seq.tabulate(8)(j => (i * 8 + j).toFloat / 100f), i % 3))
    writeFixture(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
  }

  test("pipeline_decontaminate refuses an over-cap fingerprint pool loudly") {
    val dir = tempDir()
    writeDocs(dir)
    spark.conf.set(operators.DedupOps.DecontamPoolMaxRowsKey, "1")
    try {
      val e = intercept[IllegalArgumentException] {
        operators.DedupOps.queries("pipeline_decontaminate")(spark, dir)
      }
      assert(e.getMessage.contains("broadcast eval pool") &&
        e.getMessage.contains("pipeline_decontaminate"),
        s"expected the pool-cap contract refusal, got: $e")
    } finally spark.conf.unset(operators.DedupOps.DecontamPoolMaxRowsKey)
  }

  test("pipeline_decontaminate under the cap matches the unguarded report") {
    val dir = tempDir()
    writeDocs(dir)
    val got = operators.DedupOps.queries("pipeline_decontaminate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    // the same report built WITHOUT the guard path: the cap is a
    // measurement + refusal, never a plan change
    val train = Tables.documents(spark, dir)
      .filter(col("doc_id") % operators.DedupOps.DecontamEvalMod =!= 0L)
    val want = operators.DedupOps
      .decontamReport(train, operators.DedupOps.evalFpPool(spark, dir))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(got == want, s"guarded $got vs unguarded $want")
    assert(got.nonEmpty, "fixture must produce at least one audit row")
  }

  test("pipeline_decontaminate_semantic refuses an over-cap eval vector set") {
    val dir = tempDir()
    writeEmb(dir, 10) // vec_id 0 is the single eval vector
    spark.conf.set(operators.DedupOps.DecontamEvalVecMaxRowsKey, "0")
    try {
      val e = intercept[IllegalArgumentException] {
        operators.DedupOps.queries("pipeline_decontaminate_semantic")(spark, dir)
      }
      assert(e.getMessage.contains("pipeline_decontaminate_semantic"),
        s"expected the eval-vector cap refusal, got: $e")
    } finally spark.conf.unset(operators.DedupOps.DecontamEvalVecMaxRowsKey)
    // and under the default cap the audit covers every train vector
    val rows = operators.DedupOps
      .queries("pipeline_decontaminate_semantic")(spark, dir).collect()
    assert(rows.length == 9, s"9 train vectors expected, got ${rows.length}")
  }

  test("decontaminateSink refuses an over-cap pool at construction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pool = Seq("a", "b", "c").toDF("fp")
    spark.conf.set(operators.DedupOps.DecontamPoolMaxRowsKey, "2")
    try {
      val docs = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)].toDF()
        .select(col("_1").as("doc_id"), col("_2").as("text"))
      val e = intercept[IllegalArgumentException] {
        streaming.StreamPort.decontaminateSink(docs, pool, tempDir())
      }
      assert(e.getMessage.contains("decontaminateSink"),
        s"expected the sink pool-cap refusal, got: $e")
    } finally spark.conf.unset(operators.DedupOps.DecontamPoolMaxRowsKey)
  }

  test("streaming URL-frontier dedup keeps the first arrival per canonical key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = streaming.StreamPort
      .urlFrontierDedup(mem.toDF().toDF("event_id", "ts", "url"))
      .writeStream.format("memory").queryName("urlfrontier")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((1L, t, "HTTPS://Host.EXAMPLE.com/a/?utm_source=x#f"),
        (2L, t, "https://other.example.com/b"))
      q.processAllAvailable()
      // batch 2: 3 and 4 are case/param/slash variants of 1 and 2 —
      // dropped by the canonical-key state; 5 is genuinely new
      mem.addData((3L, t, "https://host.example.com/a"),
        (4L, t, "https://other.example.com/b?ref=y"),
        (5L, t, "https://third.example.com/c"))
      q.processAllAvailable()
      val got = spark.table("urlfrontier").select(col("event_id"))
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 5L), s"got $got")
      // and the canonical expression IS the batch op's: variant 3's
      // canonical equals variant 1's under the shared expression
      val c = Seq("HTTPS://Host.EXAMPLE.com/a/?utm_source=x#f",
        "https://host.example.com/a").toDF("url")
        .select(operators.DedupOps.canonicalUrl(col("url"))).distinct().count()
      assert(c == 1L)
    } finally q.stop()
  }

  test("streaming OLS fit over two batches equals the batch fit exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // planted exact linear signal: y = 100 + 5·qty + 1000·disc → the
    // fit must recover (100, 5, 1000) with r² = 1
    val rows = (0 until 20).map { i =>
      val qty = (i % 10 + 1).toDouble
      val disc = (i % 5) / 100.0
      (qty, disc, 100.0 + 5.0 * qty + 1000.0 * disc)
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Double, Double, Double)]
    val q = streaming.StreamPort.linregFit(
        mem.toDF().toDF("l_quantity", "l_discount", "l_extendedprice"))
      .writeStream.format("memory").queryName("linregfit")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(10): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(10): _*)
      q.processAllAvailable()
      val streamed = spark.table("linregfit").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      val batch = operators.MiningOps.linregFit(
          rows.toDF("l_quantity", "l_discount", "l_extendedprice"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed == Seq((20L, 100.0, 5.0, 1000.0, 1.0)),
        s"planted signal not recovered: $streamed")
    } finally q.stop()
  }

  test("scalar_xml: from_xml/to_xml round trip is the identity on the struct") {
    // parse -> print -> parse fixpoint: the XML family's breadth pin
    // beyond the hash-oracled scalar_xml extraction
    val df = spark.range(1, 4).selectExpr(
        "named_struct('a', id, 'b', concat('v', id)) AS s")
      .selectExpr("s", "from_xml(to_xml(s), 'a BIGINT, b STRING') AS rt")
    assert(df.filter("s.a != rt.a OR s.b != rt.b").count() == 0)
  }

  test("mine_naive_bayes separates a planted perfectly-predictive feature") {
    import spark.implicits._
    // returnflag 'A' rows always have tax 0.08 (label 1), 'N' rows
    // 0.0 (label 0) — NB must predict per-f1 and score 100% accuracy
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val rows = (0 until 40).map { i =>
      val a = i % 2 == 0
      ((i + 1).toLong, 1L, 1L, 1, 1.0, 10.0, 0.0,
        if (a) 0.08 else 0.0, if (a) "A" else "N", "O", ts)
    }
    val dir = tempDir()
    writeFixture(dir, "lineitem", rows.toDF("l_orderkey", "l_partkey",
      "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))
    val got = operators.MiningOps.queries("mine_naive_bayes")(spark, dir)
      .select(col("f1"), col("predicted"), col("accuracy"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set(("A", 1L, 1.0), ("N", 0L, 1.0)),
      s"planted signal not separated: $got")
  }

  test("ShuffleTelemetry attributes a shuffle's bytes and rows to its window") {
    // the bench's per-query shuffle profile (VERDICT r9 #5) rests on
    // this listener — pin that a known shuffle lands in the counters
    // once the bus drains, so a Spark metrics rename can't silently
    // zero the telemetry
    val t = new Bench.ShuffleTelemetry
    spark.sparkContext.addSparkListener(t)
    try {
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      val before = t.snapshot
      spark.range(100000).selectExpr("id % 97 AS k")
        .repartition(4, col("k")).groupBy(col("k")).count().count()
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      val after = t.snapshot
      assert(after._1 > before._1 && after._2 >= before._2 + 100000L,
        s"shuffle not attributed: before=$before after=$after")
    } finally spark.sparkContext.removeSparkListener(t)
  }

  test("mergeCcDelta past the state cap drops the remap broadcast hint, " +
      "identical labels") {
    import spark.implicits._
    // base: {1,2} and {3,4} labeled by component-min; delta bridges 2-3
    // and introduces 5-6
    val base = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("v", "lbl")
    val delta = Seq((2L, 3L), (5L, 6L)).toDF("src", "dst")
    def labels(deltaRows: Long): (Seq[(Long, Long, Long)], Int) = {
      val df = operators.GraphOps.mergeCcDelta(base, delta,
        labelParts = 1, deltaRows = deltaRows)
      val hints = df.queryExecution.analyzed.collect {
        case h: ResolvedHint => h }.size
      (df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq, hints)
    }
    val (bcast, hintsB) = labels(deltaRows = -1L) // unmeasured: broadcast shape
    spark.conf.set(operators.GraphOps.BroadcastStateMaxRowsKey, "0")
    val (shuffle, hintsS) =
      try labels(deltaRows = 2L) // measured 2 > cap 0: shuffle remap
      finally spark.conf.unset(operators.GraphOps.BroadcastStateMaxRowsKey)
    assert(hintsB > hintsS,
      s"the gate must drop the broadcast hint past the cap " +
        s"(hints: broadcast-path $hintsB, shuffle-path $hintsS)")
    val want = Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 3L), (4L, 1L, 3L),
      (5L, 5L, -1L), (6L, 5L, -1L))
    assert(bcast == want, s"broadcast path $bcast vs $want")
    assert(shuffle == want, s"shuffle path $shuffle vs $want")
  }
}

package graft

/** Round-13 pins (VERDICT r12 items + ADVICE r12).
  *
  * ADVICE r12 #1: the adaptive re-banding loop's selected width is
  * observable — the session conf holds the effective band bits after
  * every guarded run, so a silently-widened run (lower band recall
  * than the default layout) is distinguishable from a default one.
  *
  * ADVICE r12 #3: the JPEG SOF walk stops LOUDLY at SOS — a SOF must
  * precede SOS in any decodable JPEG, so reaching scan data without
  * one means the remaining FF Cx byte pairs are entropy-coded data,
  * not markers, and walking on could claim garbage dimensions.
  */
class Round13Spec extends SparkTestBase {
  import graft.operators.{JpegDecoder, MultimodalOps, OpaqueDecoder,
    PayloadDecoders}

  test("JPEG SOS with no preceding SOF stops the marker walk loudly; " +
      "dispatch degrades to opaque (ADVICE r12 #3)") {
    // SOI + DQT-ish segment + SOS + entropy bytes containing FF C0
    // pairs that a naive walk would misread as a SOF marker
    val dqt = Array[Byte](0xff.toByte, 0xdb.toByte, 0x00, 0x04, 0x00, 0x01)
    val sos = Array[Byte](0xff.toByte, 0xda.toByte, 0x00, 0x08,
      0x01, 0x01, 0x00, 0x00, 0x3f, 0x00)
    val scanData = Array[Byte](0x12, 0x34,
      0xff.toByte, 0xc0.toByte, // looks like SOF0 — but it's scan data
      0x00, 0x11, 0x08, 0x75, 0x30, 0x75, 0x30) // "claims" 30000x30000
    val b = Array[Byte](0xff.toByte, 0xd8.toByte) ++ dqt ++ sos ++ scanData
    assert(JpegDecoder.accepts(b))
    val e = intercept[IllegalArgumentException] { JpegDecoder.sofDims(b) }
    assert(e.getMessage.contains("SOS") && e.getMessage.contains("SOF"),
      s"refusal must name the marker order violation: ${e.getMessage}")
    val p = MultimodalOps.Payload(1L, b, "img")
    val f = PayloadDecoders.decode(p)
    assert(f.feat.sameElements(OpaqueDecoder.decode(p).feat),
      "SOF-less JPEG must degrade to the opaque path")
  }

  test("pipeline_patent_refresh: parse -> weekly merge -> rank -> serve " +
      "composes on a planted corpus (VERDICT r12 #1)") {
    import spark.implicits._
    val dir = tempDir()
    def ord(k: Long, date: String) =
      (k, 1L, "O", 10.0, java.sql.Timestamp.valueOf(date), "1-URGENT")
    writeFixture(dir, "orders", Seq(
      ord(0L, "1999-03-01 00:00:00"), // base, re-issued (0 % 97 == 0)
      ord(1L, "1999-04-01 00:00:00"), // base
      ord(2L, "1999-05-01 00:00:00"), // base
      ord(9L, "2001-07-15 00:00:00")) // the new week's grant
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    def li(ok: Long, sk: Long, ln: Int) =
      (ok, 100L + sk, sk, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1999-03-01 00:00:00"))
    // citations: p0 -> s1,s2,s3 ; p1 -> s2 ; p2 -> s2,s4 ; p9 -> s4,s6
    writeFixture(dir, "lineitem", Seq(
      li(0L, 1L, 1), li(0L, 2L, 2), li(0L, 3L, 3),
      li(1L, 2L, 1), li(2L, 2L, 1), li(2L, 4L, 2),
      li(9L, 4L, 1), li(9L, 6L, 2))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    val out = SparkEntry.queries("pipeline_patent_refresh")(spark, dir)
      .collect()
      .map(r => r.getLong(2) ->
        (r.getString(0), r.getInt(1), r.getLong(4), r.getString(5)))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 9L),
      s"all four patents rank within the single class: $out")
    // the re-issue won the merge: the errata keeps only even-suppkey
    // citations (s2 of s1/s2/s3) and serves from the delta file
    assert(out(0L)._3 == 1L && out(0L)._4 == "delta",
      s"re-issued patent must serve its corrected record: ${out(0L)}")
    // base records keep their full citation lists
    assert(out(1L)._3 == 1L && out(1L)._4 == "base", s"${out(1L)}")
    assert(out(2L)._3 == 2L && out(2L)._4 == "base", s"${out(2L)}")
    // the new week's grant arrives through the delta file with both
    // its citations parsed back out of the XML
    assert(out(9L)._3 == 2L && out(9L)._4 == "delta", s"${out(9L)}")
    assert(out.values.map(_._2).toSeq.sorted == Seq(1, 2, 3, 4),
      s"rnk is a total 1..4 order within the class: $out")
  }

  test("adaptive re-banding records its selected width in the session " +
      "conf; widened runs are observable (ADVICE r12 #1)") {
    import graft.operators.DedupOps
    import spark.implicits._
    val dir = tempDir()
    // the Round12Spec dense fixture: 10 clusters x 60 exact-duplicate
    // members on disjoint supports -> analytic mass rungs 70800 /
    // 35400 / 17700 at 8 / 12-16 / 20+ bit bandings
    val rows = (0 until 600).map { i =>
      val c = i % 10
      val emb = Array.tabulate(64) { j =>
        if (j >= 6 * c && j < 6 * c + 6)
          (((c * 7 + j) % 5) + 1) * 0.2f * (if ((c + j) % 2 == 0) 1 else -1)
        else 0f
      }
      (i.toLong, emb, c)
    }
    writeFixture(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    def run() =
      SparkEntry.queries("dedup_embedding_cluster")(spark, dir).count()
    // default cap: the 8-bit mass is legal -> readback says 8
    assert(run() == 600L)
    assert(spark.conf.get(DedupOps.EmbEffectiveBandBitsKey) ==
      DedupOps.EmbClusterBandBits.toString,
      "a default-width run must record the default band bits")
    // cap 20000 forces widening to the first legal rung (20 bits on
    // this fixture) -> the readback must surface the widened width
    spark.conf.set(DedupOps.EmbCandidateMaxPairsKey, "20000")
    try {
      assert(run() == 600L)
      assert(spark.conf.get(DedupOps.EmbEffectiveBandBitsKey) == "20",
        "a widened run must record the width the loop selected")
    } finally spark.conf.unset(DedupOps.EmbCandidateMaxPairsKey)
  }

  test("vec_ann_serving_point reaches recall@1 >= 0.8 on the real corpus " +
      "with candidate mass priced under the serving cap (VERDICT r12 #4)") {
    import graft.operators.VectorOps
    val r = SparkEntry.queries("vec_ann_serving_point")(spark, sf001)
      .collect()
    assert(r.length == 1, "the serving point is ONE priced row")
    val row = r.head
    val recall = row.getAs[Double]("recall_at_1")
    val meanCand = row.getAs[Double]("mean_candidates")
    // the served target: the measured (8 tables x 6 bits x 5 flips)
    // config reaches the 0.8 recall floor the VERDICT asks for (0.86
    // measured at sf0.001, 0.84 at sf0.01 — flips=4 sat exactly AT
    // 0.80, so the shipped config carries one extra flip of margin)
    assert(recall >= 0.8, s"serving recall@1 must be >= 0.8, got $recall")
    // and the price is DECLARED legal: mean candidates per probe under
    // the serving cap (~54% of this weakly-correlated 500-vector
    // corpus — the honest cost of 0.8 recall at cosine-0.4 neighbor
    // strength)
    assert(row.getAs[Boolean]("under_serving_cap"),
      s"candidate price must sit under the cap, got $meanCand")
    assert(meanCand > 0 && meanCand <= VectorOps.ServingCandidateCap,
      s"mean candidates must be positive and capped: $meanCand")
    assert(row.getAs[Int]("n_tables") == VectorOps.ServingTables &&
      row.getAs[Int]("band_bits") == VectorOps.ServingBandBits &&
      row.getAs[Int]("n_flips") == VectorOps.ServingProbeFlips,
      "the emitted config must be the declared serving constants")
  }

  test("vec_ann_serving_point: at production duplicate similarity the " +
      "config collides near-certainly and recall is exact (VERDICT r12 #4)") {
    import spark.implicits._
    val dir = tempDir()
    // 20 clusters x 2 IDENTICAL members on disjoint 3-dim supports:
    // every probe's true nearest neighbor is its exact duplicate
    // (cosine 1.0). At this similarity each table's 6-bit bucket of
    // the pair matches with certainty, so the duplicate is ALWAYS a
    // candidate — the comment's claim that the 54%-of-corpus price is
    // a property of the weakly-correlated corpus, not of the config.
    val rows = (0 until 40).map { i =>
      val c = i / 2
      val emb = Array.tabulate(64) { j =>
        if (j >= 3 * c && j < 3 * c + 3) ((c + j) % 4 + 1) * 0.25f else 0f
      }
      (i.toLong, emb)
    }
    writeFixture(dir, "embeddings", rows.toDF("vec_id", "embedding"))
    val row = SparkEntry.queries("vec_ann_serving_point")(spark, dir)
      .collect().head
    assert(row.getAs[Double]("recall_at_1") == 1.0,
      "exact duplicates must be recalled with certainty")
    assert(row.getAs[Long]("n_probes") == 40L)
    assert(row.getAs[Boolean]("under_serving_cap"))
  }

  test("fromDuckDb literal safety: ADVERSARIAL literal content passes " +
      "through the transpiler verbatim and evaluates identically " +
      "(VERDICT r12 #8, property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // content built from the transpiler's own rewrite TARGETS — every
    // fragment is a phrase some fromDuckDb pass matches on, so any
    // rewrite that is not literal-aware corrupts the literal. This
    // fuzz found (and now pins the fixes for) three raw-replaceAll
    // gaps: `AS MATERIALIZED (`, `len(bin(`, and the DOUBLE[]/
    // VARCHAR[] array-type spellings.
    val traps = Gen.oneOf(
      "FILTER (x > 1)", "filter (", "range AS r", "t.range",
      "len(", "len(bin(", "list_transform(xs, x -> x)", "unnest(",
      "xor(a, b)", "a // b", "VARCHAR", "DOUBLE[]", "VARCHAR[][]",
      "HUGEINT", "[1:2]", "epoch(ts)", "string_agg(x)",
      "AS MATERIALIZED (", "\\", "\\n", "''", "'",
      "generate_series(1,3)", "arg_max(a, b)", "json_keys(j)",
      "strftime(ts, '%Y')", "CAST(x AS VARCHAR)")
    val plain = Gen.listOf(Gen.alphaNumChar).map(_.mkString.take(6))
    val frag = Gen.frequency(3 -> traps, 2 -> plain,
      1 -> Gen.oneOf(" ", ", ", " -> ", "(", ")", "%", "$"))
    val content = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, frag).map(_.mkString.take(80)))
    def esc(c: String) = c.replace("'", "''")
    val prop = Prop.forAll(content) { c =>
      val e = esc(c)
      // template 1: literal next to a FILTER clause + the qualified
      // range-column rename (r.range -> r.id), executed over range(3)
      val t1 = SparkDialect.fromDuckDb(
        s"SELECT '$e' AS s, count(*) FILTER (r.range > 0) AS c " +
          "FROM range(3) r")
      val r1 = spark.sql(t1).collect().head
      // template 2: literal beside an operator/function rewrite
      val t2 = SparkDialect.fromDuckDb(
        s"SELECT xor(5, 3) AS x, '$e' AS s, length('$e') AS n")
      val r2 = spark.sql(t2).collect().head
      // template 3: the bracket rewriter — an indexed array literal
      // CONTAINING the adversarial literal (the postfix base walk must
      // not count parens inside it) plus a slice over the same base
      val t3 = SparkDialect.fromDuckDb(
        s"SELECT ['a', '$e'][2] AS x, ['a', '$e', 'c'][2:3] AS sl")
      val r3 = spark.sql(t3).collect().head
      // the Spark-dialect text must carry the literal VERBATIM modulo
      // the declared backslash doubling
      val carried = "'" + e.replace("\\", "\\\\") + "'"
      (t1.contains(carried) :| s"t1 lost the literal: $t1") &&
        (t2.contains(carried) :| s"t2 lost the literal: $t2") &&
        ((r1.getString(0) == c) :| s"t1 eval: <${r1.getString(0)}> != <$c>") &&
        ((r1.getAs[Number]("c").longValue == 2L)
          :| "t1 FILTER clause broke") &&
        ((r2.getAs[Number]("x").longValue == 6L) :| "t2 xor broke") &&
        ((r2.getString(1) == c) :| s"t2 eval: <${r2.getString(1)}> != <$c>") &&
        ((r2.getAs[Number]("n").intValue == c.length) :| "t2 length broke") &&
        ((r3.getString(0) == c) :| s"t3 index eval: <${r3.getString(0)}>") &&
        ((r3.getSeq[String](1) == Seq(c, "c")) :| "t3 slice eval broke")
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}

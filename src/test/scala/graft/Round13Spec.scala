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
}

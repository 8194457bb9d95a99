package graft

/** Round-12 pins (VERDICT r11 items + ADVICE r11).
  *
  * #1 real JPEG decode: the JDK in this container DOES ship a JPEG
  * ImageIO reader (r11's stub comment claiming otherwise was wrong) —
  * JPEG payloads decode through the same javax.imageio path as PNG,
  * pinned against the PPM encoding of the same pixels within a
  * declared lossy tolerance (JPEG is DCT-lossy, so bit-identity is
  * the wrong pin).
  *
  * ADVICE r11 #1 decompression-bomb guard: claimed dimensions are read
  * from the container header bytes (PNG IHDR offsets 16/20; JPEG SOF
  * height/width) and checked against the pixel cap BEFORE ImageIO.read
  * allocates width×height pixels — a crafted bomb header degrades to
  * the opaque path instead of OOMing the executor.
  *
  * #2 adaptive re-banding: dedup_embedding_cluster no longer refuses a
  * dense corpus outright — it re-prices the candidate mass at +4 band
  * bits per step from the same memoized signature table and runs at
  * the first legal banding; refusal only past the widest (full
  * 32-bit signature) step. Pinned on a planted dense fixture with
  * cluster-parity to the exact recompute.
  */
class Round12Spec extends SparkTestBase {
  import graft.operators.{MultimodalOps, PayloadDecoders, JpegDecoder,
    PngDecoder, OpaqueDecoder, ImageIoDecode}

  // ---------------------------------------------------------------
  // image fixtures (the Round11Spec test card, reused)
  // ---------------------------------------------------------------

  private def testPixels(w: Int, h: Int): Array[Array[(Int, Int, Int)]] =
    Array.tabulate(h, w) { (y, x) =>
      (y * w + x) % 5 match {
        case 0 => (x * 255 / math.max(w - 1, 1), 0, 0)
        case 1 => (0, y * 255 / math.max(h - 1, 1), 0)
        case 2 => (0, 0, (x + y) * 255 / math.max(w + h - 2, 1))
        case 3 => (255, 255, 255)
        case _ => (x * 31 % 256, y * 67 % 256, (x * y) % 256)
      }
    }

  private def bufferedImage(px: Array[Array[(Int, Int, Int)]])
      : java.awt.image.BufferedImage = {
    val h = px.length; val w = px(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** encode via the JDK's own JPEG writer at an explicit quality */
  private def jpegBytes(px: Array[Array[(Int, Int, Int)]],
      quality: Float): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null,
      new javax.imageio.IIOImage(bufferedImage(px), null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def ppmBytes(px: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      px.flatten.flatMap { case (r, g, b) =>
        Array(r.toByte, g.toByte, b.toByte) }
  }

  // ---------------------------------------------------------------
  // #1 JPEG decode
  // ---------------------------------------------------------------

  test("JPEG decodes for real: exact SOF dims; luma histogram within the " +
      "declared lossy tolerance of the PPM encoding (VERDICT r11 #1)") {
    val px = testPixels(32, 16)
    val jpg = MultimodalOps.Payload(1L, jpegBytes(px, 1.0f), "img")
    val ppm = MultimodalOps.Payload(2L, ppmBytes(px), "img")
    assert(JpegDecoder.accepts(jpg.payload), "JPEG magic must sniff")
    assert(!JpegDecoder.accepts(ppm.payload))
    assert(!PngDecoder.accepts(jpg.payload))
    val fJpg = PayloadDecoders.decode(jpg)
    val fPpm = PayloadDecoders.decode(ppm)
    assert(fJpg.width == 32 && fJpg.height == 16,
      s"real dims from the SOF header, got ${fJpg.width}x${fJpg.height}")
    // DCT loss moves a few pixels across bin boundaries; at quality
    // 1.0 the L1 histogram distance stays well under 0.15 (each unit
    // is a whole payload's worth of probability mass)
    val l1 = fJpg.feat.zip(fPpm.feat).map { case (a, b) => math.abs(a - b) }.sum
    assert(l1 <= 0.15,
      s"lossy tolerance: L1($l1) jpeg=${fJpg.feat.toSeq} ppm=${fPpm.feat.toSeq}")
    assert(math.abs(fJpg.feat.sum - 1.0) < 1e-3)
    // deterministic: same payload, same decoder, same histogram
    val again = PayloadDecoders.decode(jpg)
    assert(again.feat.sameElements(fJpg.feat) && again.width == fJpg.width)
  }

  test("truncated JPEG behind a valid magic never throws: header cut " +
      "degrades to opaque, scan cut still yields a sane row") {
    val whole = jpegBytes(testPixels(32, 16), 1.0f)
    // cut INSIDE the header (before any SOF): no dims claimable ->
    // the SOF walk throws and the dispatch degrades to opaque
    val headCut = MultimodalOps.Payload(3L, whole.take(10), "img")
    assert(JpegDecoder.accepts(headCut.payload))
    val f = PayloadDecoders.decode(headCut)
    val o = OpaqueDecoder.decode(headCut)
    assert(f.width == o.width && f.height == o.height &&
      f.feat.sameElements(o.feat), "header-cut JPEG must fall back to opaque")
    // cut mid-scan: the JDK reader legitimately PARTIAL-decodes (the
    // missing blocks render gray) — the dispatch must simply complete
    // with a sane fixed-width row either way, never throw
    val scanCut =
      MultimodalOps.Payload(4L, whole.take(whole.length / 2), "img")
    val g = PayloadDecoders.decode(scanCut)
    assert(g.width > 0 && g.height > 0 && g.feat.length == 16 &&
      math.abs(g.feat.sum - 1.0) < 1e-3)
  }

  test("JPEG payloads flow through the partition-batched decode operator") {
    import spark.implicits._
    val px = testPixels(32, 16)
    val rows = Seq(
      MultimodalOps.Payload(1L, jpegBytes(px, 1.0f), "jpg_src"),
      MultimodalOps.Payload(2L, ppmBytes(px), "ppm_src"),
      MultimodalOps.Payload(3L, "not an image".getBytes, "txt_src"))
    val out = MultimodalOps.decodePayloads(rows.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 32 && out(1L).height == 16)
    val l1 = out(1L).feat.zip(out(2L).feat)
      .map { case (a, b) => math.abs(a - b) }.sum
    assert(l1 <= 0.15, s"JPEG and PPM must agree through the operator (L1=$l1)")
    assert(out(3L).width >= 64, "non-image still routes to the stub")
  }

  // ---------------------------------------------------------------
  // ADVICE r11 #1: decompression-bomb guards
  // ---------------------------------------------------------------

  test("PNG bomb header (IHDR declares 50000x50000) degrades to opaque " +
      "without allocating the pixel buffer (ADVICE r11 #1)") {
    // a syntactically-valid PNG prefix whose IHDR claims 2.5G pixels;
    // the guard must reject on the HEADER BYTES, before ImageIO.read
    val b = new java.io.ByteArrayOutputStream()
    b.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    b.write(Array[Byte](0, 0, 0, 13)) // IHDR length
    b.write("IHDR".getBytes("US-ASCII"))
    for (v <- Seq(50000, 50000)) // width, height (big-endian)
      b.write(Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte))
    b.write(Array[Byte](8, 2, 0, 0, 0)) // depth, color, rest of IHDR
    val p = MultimodalOps.Payload(4L, b.toByteArray, "img")
    assert(PngDecoder.accepts(p.payload))
    val e = intercept[IllegalArgumentException] { PngDecoder.decode(p) }
    assert(e.getMessage.contains("decompression-bomb"),
      s"guard must name itself: ${e.getMessage}")
    val f = PayloadDecoders.decode(p) // dispatch degrades, never OOMs
    assert(f.feat.sameElements(OpaqueDecoder.decode(p).feat))
  }

  test("JPEG bomb header (SOF declares 60000x60000) degrades to opaque " +
      "before any decode") {
    val b = Array[Byte](0xff.toByte, 0xd8.toByte, // SOI
      0xff.toByte, 0xc0.toByte, 0x00, 0x11, // SOF0, len 17
      0x08, // precision
      0xea.toByte, 0x60, // height 60000
      0xea.toByte, 0x60, // width 60000
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val p = MultimodalOps.Payload(5L, b, "img")
    assert(JpegDecoder.accepts(p.payload))
    assert(JpegDecoder.sofDims(p.payload) == (60000L, 60000L),
      "SOF walk must surface the claimed dims")
    val e = intercept[IllegalArgumentException] { JpegDecoder.decode(p) }
    assert(e.getMessage.contains("decompression-bomb"))
    val f = PayloadDecoders.decode(p)
    assert(f.feat.sameElements(OpaqueDecoder.decode(p).feat))
  }

  test("SOF walk skips arbitrary APPn segments (EXIF-style wrappers)") {
    // SOI + a 100-byte APP1 segment + SOF0 with real dims
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte, 0x00, 0x66) ++
      Array.fill[Byte](0x64)(0x41)
    val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11,
      0x08, 0x00, 0x10, 0x00, 0x20, // 16 high, 32 wide
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val b = Array[Byte](0xff.toByte, 0xd8.toByte) ++ app1 ++ sof
    assert(JpegDecoder.sofDims(b) == (32L, 16L))
  }

  test("real JPEG payloads sit under the pixel cap by construction") {
    val whole = jpegBytes(testPixels(32, 16), 1.0f)
    val (w, h) = JpegDecoder.sofDims(whole)
    assert(w == 32 && h == 16, "SOF dims must match the encoded image")
    assert(w * h <= ImageIoDecode.MaxDecodePixels)
  }

  // ---------------------------------------------------------------
  // #2 adaptive re-banding (dedup_embedding_cluster)
  // ---------------------------------------------------------------

  /** 10 dense clusters × 60 EXACT-duplicate members on disjoint
    * 6-dim supports: within-cluster cosine exactly 1, cross-cluster
    * exactly 0, and every member of a cluster shares one 32-bit
    * signature — so the candidate mass at band width w is
    * nBands(w) × 10 × C(60,2): 70 800 at 8-bit (4 bands), 35 400 at
    * 12/16-bit (2 bands), 17 700 from 20-bit up (1 band). A cap
    * between those rungs forces the widening loop to engage and stop
    * at a predictable width, and identical signatures collide at
    * EVERY width, so cluster recall — and the CC labels — are exact
    * at whichever width the loop selects. */
  private def synthDense(dir: String): Unit = {
    import spark.implicits._
    val rows = (0 until 600).map { i =>
      val c = i % 10
      val emb = Array.tabulate(64) { j =>
        if (j >= 6 * c && j < 6 * c + 6)
          (((c * 7 + j) % 5) + 1) * 0.2f * (if ((c + j) % 2 == 0) 1 else -1)
        else 0f
      }
      (i.toLong, emb, c)
    }
    writeFixture(dir, "embeddings",
      rows.toDF("vec_id", "embedding", "label"))
  }

  test("adaptive re-banding: a dense corpus COMPLETES under a widened " +
      "banding with exact cluster parity (VERDICT r11 #2)") {
    import graft.operators.DedupOps
    val dir = tempDir()
    synthDense(dir)
    def run() = SparkEntry.queries("dedup_embedding_cluster")(spark, dir)
      .select("vec_id", "cluster", "cluster_size", "is_canonical")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val expected = (0 until 600)
      .map(i => (i.toLong, (i % 10).toLong, 60L, i < 10)).toSeq
    // default cap: 8-bit mass 70 800 is legal, no widening
    val base = run()
    assert(base == expected, "8-bit banding must recover the planted clusters")
    // cap 20 000: 8-bit (70 800), 12/16-bit (35 400) all refuse; the
    // loop lands at 20-bit (17 700) and must produce the SAME clusters
    spark.conf.set(DedupOps.EmbCandidateMaxPairsKey, "20000")
    val widened =
      try run()
      finally spark.conf.unset(DedupOps.EmbCandidateMaxPairsKey)
    assert(widened == expected,
      "widened banding must keep exact cluster parity (identical " +
        "signatures collide at every width)")
    // cap 10 000 < the 17 700 full-signature floor: even the widest
    // banding is illegal -> refusal naming the widest step
    spark.conf.set(DedupOps.EmbCandidateMaxPairsKey, "10000")
    val e = intercept[IllegalArgumentException] {
      try run()
      finally spark.conf.unset(DedupOps.EmbCandidateMaxPairsKey)
    }
    assert(e.getMessage.contains("widest banding") &&
      e.getMessage.contains(DedupOps.EmbCandidateMaxPairsKey),
      s"refusal must name the widest step and the knob: ${e.getMessage}")
  }

  test("dedup_band_plan prices the dense fixture's analytic rungs and " +
      "agrees with the adaptive guard's choice (r12)") {
    import graft.operators.DedupOps
    val dir = tempDir()
    synthDense(dir)
    val plan = SparkEntry.queries("dedup_band_plan")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(plan.map(_._1).toSeq == Seq(8, 12, 16, 20, 24, 28, 32),
      s"one row per schedule rung: ${plan.toSeq}")
    val byBits = plan.map(p => p._1 -> p).toMap
    assert(byBits(8)._2 == 4 && byBits(12)._2 == 2 && byBits(16)._2 == 2 &&
      byBits(20)._2 == 1 && byBits(32)._2 == 1, "bands per width = 32 DIV bits")
    // 10 clusters × 60 identical signatures → mass floor per band =
    // 10 × C(60,2) = 17 700; accidental cross-cluster bucket
    // collisions can only ADD (bounded by a few 60×60 blocks)
    def within(bits: Int, floor: Long): Unit = {
      val m = byBits(bits)._3
      assert(m >= floor && m <= floor + 15 * 3600L,
        s"$bits-bit mass $m outside [$floor, ${floor + 15 * 3600L}]")
    }
    within(8, 4 * 17700L); within(12, 2 * 17700L); within(32, 17700L)
    // the default cap is far above every rung on this corpus
    assert(plan.forall(_._4), s"all rungs sit under the 50M default: ${plan.toSeq}")
    // coherence with the guard: at cap 20 000 the adaptive loop must
    // stop exactly at the first rung the plan prices as legal
    val firstLegal = plan.filter(_._3 <= 20000L).map(_._1).min
    assert(firstLegal >= 20,
      s"the 4/2/2-band rungs all exceed 20 000 by construction: ${plan.toSeq}")
    spark.conf.set(DedupOps.EmbCandidateMaxPairsKey, "20000")
    try {
      val n = SparkEntry.queries("dedup_embedding_cluster")(spark, dir).count()
      assert(n == 600L, "the guard must run at the plan's first legal rung")
    } finally spark.conf.unset(DedupOps.EmbCandidateMaxPairsKey)
  }

  test("candidate-mass pricing is NULL-safe: an empty corpus prices to 0 " +
      "and the query returns 0 rows (ADVICE r11 #2)") {
    import spark.implicits._
    val dir = tempDir()
    writeFixture(dir, "embeddings",
      Seq.empty[(Long, Array[Float], Int)]
        .toDF("vec_id", "embedding", "label"))
    val out = SparkEntry.queries("dedup_embedding_cluster")(spark, dir)
    assert(out.count() == 0L) // pre-fix: NPE in getLong on the NULL sum
  }

  // ---------------------------------------------------------------
  // ADVICE r11 #4: literal-aware dialect rewrites
  // ---------------------------------------------------------------

  test("fromDuckDb leaves string literals containing 'FILTER (' and " +
      "'range AS' untouched (ADVICE r11 #4)") {
    val q = "SELECT 'use FILTER (x) or range AS y' AS note, " +
      "count(*) FILTER (o_custkey > 0) AS n FROM orders"
    val t = SparkDialect.fromDuckDb(q)
    assert(t.contains("'use FILTER (x) or range AS y'"),
      s"literal corrupted: $t")
    assert(t.contains("FILTER (WHERE o_custkey > 0)"),
      s"real FILTER clause must still rewrite: $t")
    val q2 = "SELECT range AS x FROM range(3) WHERE 'gs.range' <> ''"
    val t2 = SparkDialect.fromDuckDb(q2)
    assert(t2.contains("id AS x") && t2.contains("'gs.range'"),
      s"range rename must skip literals: $t2")
  }
}

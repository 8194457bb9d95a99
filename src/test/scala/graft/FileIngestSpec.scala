package graft

import graft.streaming.StreamPort
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** File-source streaming ingest E2E (VERDICT r9 #3): `readStream` over
  * a landing directory — the weekly-files-landing-in-object-storage
  * shape of the reconstructed reference's ingest — driving (a) the
  * multi_source_union increment and (b) the upsert snapshot sink,
  * with files arriving BETWEEN micro-batches. Stream output must equal
  * the batch computation over the landed rows after EVERY arrival
  * (the StreamPort parity contract), and a retried batch must rewrite
  * the identical snapshot. MemoryStream parity tests stay in
  * StreamPortSpec — this spec owns the file-source path: pinned
  * schema, JSONL and parquet landings, per-file exactly-once via the
  * source's checkpoint state. */
class FileIngestSpec extends SparkTestBase {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderdate", TimestampType),
    StructField("o_totalprice", DoubleType)))

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** land a JSONL file atomically (write to a temp name, then move —
    * the landing discipline that keeps a half-written file out of a
    * listing-based source) */
  private def landJsonl(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** land a single-file parquet: write via Spark to a scratch dir,
    * move the part file into the landing dir under `name` */
  private def landParquet(dir: String, name: String, df: DataFrame): Unit = {
    val scratch = tempDir() + "/scratch"
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dir, name),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def oJson(k: Long, ts: String, v: Double): String =
    s"""{"o_orderkey":$k,"o_orderdate":"$ts","o_totalprice":$v}"""

  test("file-landing union ingest == batch multi_source_union shape " +
      "after each arrival") {
    import spark.implicits._
    val landO = tempDir()
    val landE = tempDir()
    val out = tempDir() + "/union_out"
    val week1O = Seq(oJson(1, "2024-01-01T10:00:00", 10.0),
      oJson(2, "2024-01-02T10:00:00", 20.0))
    landJsonl(landO, "week1.jsonl", week1O)
    val e1 = Seq((100L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1.5))
      .toDF("event_id", "ts", "value")
    landParquet(landE, "e1.parquet", e1)

    val st = StreamPort.ordersAsUnionRows(
        StreamPort.fileLandingStream(spark, landO, ordersSchema))
      .unionByName(StreamPort.eventsAsUnionRows(
        StreamPort.fileLandingStream(spark, landE, eventsSchema, "parquet")))
    val q = StreamPort.foreachBatchParquetSink(st, out).start()
    try {
      q.processAllAvailable()
      def sunk(): Set[(Long, java.time.LocalDateTime, Double, String)] =
        spark.read.parquet(out)
          .select(col("id"), col("ts"), col("val"), col("src"))
          .collect().map(r => (r.getLong(0),
            r.getAs[java.time.LocalDateTime](1), r.getDouble(2),
            r.getString(3))).toSet
      // batch twin over the SAME landed rows, same normalizers
      def batch(oFiles: Seq[String], eDfs: Seq[DataFrame]) = {
        val o = StreamPort.ordersAsUnionRows(
          spark.read.schema(ordersSchema).json(oFiles.map(f => s"$landO/$f"): _*))
        val e = eDfs.map(StreamPort.eventsAsUnionRows)
          .reduceOption(_ unionByName _)
        e.fold(o)(o.unionByName(_))
          .collect().map(r => (r.getLong(0),
            r.getAs[java.time.LocalDateTime](1), r.getDouble(2),
            r.getString(3))).toSet
      }
      val after1 = sunk()
      assert(after1 == batch(Seq("week1.jsonl"), Seq(e1)),
        s"stream != batch after arrival 1: $after1")
      assert(after1.size == 3)
      // a new weekly file arrives BETWEEN micro-batches
      landJsonl(landO, "week2.jsonl",
        Seq(oJson(3, "2024-01-08T10:00:00", 30.0)))
      q.processAllAvailable()
      val after2 = sunk()
      assert(after2 == batch(Seq("week1.jsonl", "week2.jsonl"), Seq(e1)),
        s"stream != batch after arrival 2: $after2")
      assert(after2.size == 4)
    } finally q.stop()
  }

  test("file-landing upsert ingest: snapshot == latest-wins merge after " +
      "each arrival, retry idempotent") {
    import spark.implicits._
    val land = tempDir()
    val out = tempDir() + "/snap"
    landJsonl(land, "week1.jsonl", Seq(
      oJson(1, "2024-01-01T10:00:00", 10.0),
      oJson(2, "2024-01-01T11:00:00", 20.0)))
    val q = StreamPort.upsertSnapshotSink(
      StreamPort.fileLandingStream(spark, land, ordersSchema),
      out, "o_orderkey").start()
    try {
      q.processAllAvailable()
      def snap(): Seq[(Long, Double)] = StreamPort.readSnapshot(spark, out)
        .select(col("o_orderkey"), col("o_totalprice"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(snap() == Seq((1L, 10.0), (2L, 20.0)), s"after week1: ${snap()}")
      // the weekly delta lands between micro-batches: key 2 repriced,
      // key 3 new
      landJsonl(land, "week2.jsonl", Seq(
        oJson(2, "2024-01-08T10:00:00", 22.0),
        oJson(3, "2024-01-08T11:00:00", 30.0)))
      q.processAllAvailable()
      val merged = snap()
      assert(merged == Seq((1L, 10.0), (2L, 22.0), (3L, 30.0)),
        s"after week2: $merged")
      // RETRY the week2 micro-batch (id 1): same change set, same id —
      // the sink re-merges from the version below and rewrites the
      // identical snapshot
      StreamPort.applyUpsertBatch(out, "o_orderkey")(
        spark.read.schema(ordersSchema).json(s"$land/week2.jsonl"), 1L)
      assert(snap() == merged, "retried file batch changed the snapshot")
    } finally q.stop()
  }

  test("crash recovery: stop, land files while down, delete the last commit " +
      "marker (crash between sink write and checkpoint commit), restart — " +
      "no loss, no duplication (VERDICT r10 #8)") {
    import spark.implicits._
    val land = tempDir()
    val out = tempDir() + "/snap"
    val ckpt = tempDir() + "/ckpt"
    def snap(): Seq[(Long, Double)] = StreamPort.readSnapshot(spark, out)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    def start() = StreamPort.upsertSnapshotSink(
        StreamPort.fileLandingStream(spark, land, ordersSchema),
        out, "o_orderkey")
      .option("checkpointLocation", ckpt).start()

    // run 1: week1 lands, batch 0 commits, the query "crashes" (stop)
    landJsonl(land, "week1.jsonl", Seq(
      oJson(1, "2024-01-01T10:00:00", 10.0),
      oJson(2, "2024-01-01T11:00:00", 20.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(snap() == Seq((1L, 10.0), (2L, 20.0)), s"before crash: ${snap()}")

    // while DOWN: week2 lands (repricing key 2, adding key 3)
    landJsonl(land, "week2.jsonl", Seq(
      oJson(2, "2024-01-08T10:00:00", 22.0),
      oJson(3, "2024-01-08T11:00:00", 30.0)))

    // run 2: restart from the checkpoint — week1 must NOT replay
    // (no duplication), week2 MUST be picked up (no loss)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val afterRestart = snap()
    assert(afterRestart == Seq((1L, 10.0), (2L, 22.0), (3L, 30.0)),
      s"restart lost or duplicated a landing: $afterRestart")

    // crash MID-BATCH: Structured Streaming commits a batch by writing
    // <ckpt>/commits/<id> AFTER the sink ran — deleting the newest
    // marker reproduces a crash in that window exactly, and on restart
    // the engine REPLAYS that batch id from its logged offsets. The
    // sink's version-below-id merge discipline must absorb the replay
    // byte-identically.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty, "expected commit markers in the checkpoint")
    val lastCommit = commits.last
    val replayId = lastCommit.getName.toLong
    assert(lastCommit.delete(), s"could not delete $lastCommit")
    // the local ChecksumFs keeps a .N.crc sidecar per marker — a real
    // crash loses both (they're written together); leaving it would
    // fail the replay's rename with FileAlreadyExists
    val crc = new java.io.File(s"$ckpt/commits/.$replayId.crc")
    if (crc.exists()) assert(crc.delete(), s"could not delete $crc")
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(snap() == afterRestart,
      s"replay of batch $replayId after a simulated mid-commit crash " +
        s"changed the snapshot: ${snap()} vs $afterRestart")
    // and the recovered stream keeps consuming: week3 lands, applies once
    landJsonl(land, "week3.jsonl",
      Seq(oJson(4, "2024-01-15T10:00:00", 40.0)))
    val q4 = start()
    try q4.processAllAvailable() finally q4.stop()
    assert(snap() == Seq((1L, 10.0), (2L, 22.0), (3L, 30.0), (4L, 40.0)),
      s"post-recovery landing mis-applied: ${snap()}")
  }
}

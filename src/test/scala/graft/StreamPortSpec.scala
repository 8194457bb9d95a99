package graft

import graft.streaming.StreamPort
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming port: the same declarative plans run under
  * MemoryStream and must produce the batch answer once the stream is
  * drained (complete/append parity — the design contract of
  * graft.streaming.StreamPort). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamPortSpec extends SparkTestBase {

  private def events: Seq[Ev] = Seq(
    Ev(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "view", 1.0),
    Ev(2, Timestamp.valueOf("2024-01-01 10:20:00"), 1, "view", 2.0),
    Ev(3, Timestamp.valueOf("2024-01-01 11:10:00"), 1, "click", 3.0),
    Ev(4, Timestamp.valueOf("2024-01-01 10:15:00"), 2, "view", 4.0),
    Ev(5, Timestamp.valueOf("2024-01-01 12:30:00"), 2, "view", 5.0),
    Ev(6, Timestamp.valueOf("2024-01-01 10:16:00"), 2, "view", 6.0))

  test("streaming tumbling counts == batch tumbling counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("tumbling")
      .select("ws", "event_type", "n", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    val batch = StreamPort.tumblingCounts(events.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(batch.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "view", 4L, 13.0)))
  }

  test("streaming count-min sketch over two batches equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val terms = Seq("apple", "apple", "pear", "apple", "plum", "pear")
    val mem = MemoryStream[String]
    val q = StreamPort.cmSketch(mem.toDS())
      .writeStream.format("memory").queryName("cm")
      .outputMode("complete").start()
    mem.addData(terms.take(3): _*)
    q.processAllAvailable()
    mem.addData(terms.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.table("cm").collect()(0).getSeq[Long](0).toArray
    q.stop()
    val batch = StreamPort.cmSketch(terms.toDS()).collect()(0).getSeq[Long](0).toArray
    assert(streamed.sameElements(batch))
    // estimates from the drained stream are exact on this tiny vocab
    import graft.functions.CountMinAgg
    assert(CountMinAgg.estimate(streamed, "apple", 4, 1024) == 3L)
    assert(CountMinAgg.estimate(streamed, "pear", 4, 1024) == 2L)
    assert(CountMinAgg.estimate(streamed, "plum", 4, 1024) == 1L)
  }

  test("streaming OHLC bars == batch OHLC bars, open/close by event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.ohlcBars(mem.toDF())
      .writeStream.format("memory").queryName("ohlc")
      .outputMode("complete").start()
    // two add batches: the second delivers an EARLIER event for the
    // 10:00 view bar (event 6) — the mergeable min_by state must
    // re-open the bar at the older timestamp
    mem.addData(events.filter(_.event_id != 6): _*)
    q.processAllAvailable()
    mem.addData(events.filter(_.event_id == 6): _*)
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))
    val streamed = spark.table("ohlc").collect().map(key).toSet
    q.stop()
    val batch = StreamPort.ohlcBars(events.toDF()).collect().map(key).toSet
    assert(streamed == batch)
    // hand check: 10:00 view bar = events 1 (10:05, 1.0), 2 (10:20, 2.0),
    // 4 (10:15, 4.0), 6 (10:16, 6.0) → open 1.0 high 6.0 low 1.0 close 2.0
    assert(batch.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "view",
      1.0, 6.0, 1.0, 2.0, 4L)))
  }

  test("streaming session windows == batch session windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.sessionCounts(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    q.stop()
    val batch = StreamPort.sessionCounts(events.toDF()).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed == batch)
    // user 1: events at 10:05/10:20 merge (15min gap < 30), 11:10 separate
    assert(batch.contains((1L, Timestamp.valueOf("2024-01-01 10:05:00"),
      Timestamp.valueOf("2024-01-01 10:50:00"), 2L)))
  }

  test("streaming sliding counts == batch sliding counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("sliding").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    val batch = StreamPort.slidingCounts(events.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // an event at 10:05 belongs to exactly 4 sliding windows
    val win1005 = batch.filter(w => w._2 == "view" &&
      !w._1.before(Timestamp.valueOf("2024-01-01 09:15:00")) &&
      !w._1.after(Timestamp.valueOf("2024-01-01 10:00:00")))
    assert(win1005.size == 4, s"expected 4 windows covering 10:05: $win1005")
  }

  test("incremental delivery across two batches converges to the batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("twobatch")
      .outputMode("complete").start()
    val (first, second) = events.splitAt(3)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    val streamed = spark.table("twobatch").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    val batch = StreamPort.tumblingCounts(events.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch, "state must merge across batches to the batch answer")
  }

  test("dropDuplicatesWithinWatermark dedups (user, type) in-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup").select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == rows.distinct.length)
    assert(rows.toSet == Set((1L, "view"), (1L, "click"), (2L, "view")))
  }

  test("streaming new-user counts: dedup-then-count finalizes the daily identity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPort.newUserCounts(mem.toDF())
      .writeStream.format("memory").queryName("newusers")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // push the watermark past day 1 so its windows finalize (append
    // mode only emits closed windows)
    mem.addData(Ev(99, Timestamp.valueOf("2024-01-03 00:00:00"), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("newusers")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    // day 1: users {1,2} first viewed, user 1 first clicked — repeat
    // views by both users do not recount
    assert(rows == Set(
      (Timestamp.valueOf("2024-01-01 00:00:00"), "view", 2L),
      (Timestamp.valueOf("2024-01-01 00:00:00"), "click", 1L)), s"got $rows")
  }

  test("stream-static enrichment join == batch join (no state on the dim side)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Ev]
    val q = StreamPort.enrichWithDim(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    mem.addData(events: _*) // user 3 absent from dim → dropped (inner join)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich").collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    val batch = StreamPort.enrichWithDim(events.toDF(), dim).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    assert(streamed == batch)
    assert(batch.map(_._2) == Set("BUILDING", "MACHINERY"))
  }

  test("stream-stream interval join == batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 1.0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "click", 0.0), // joins view 1
      Ev(3, Timestamp.valueOf("2024-01-01 10:45:00"), 1, "click", 0.0), // 45min: outside window
      Ev(4, Timestamp.valueOf("2024-01-01 10:00:00"), 2, "view", 2.0),
      Ev(5, Timestamp.valueOf("2024-01-01 10:20:00"), 2, "click", 0.0), // joins view 4
      Ev(6, Timestamp.valueOf("2024-01-01 10:05:00"), 3, "click", 0.0)) // no view for user 3
    val vMem = MemoryStream[Ev]; val cMem = MemoryStream[Ev]
    val q = StreamPort.viewClickJoin(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("vcjoin")
      .outputMode("append").start()
    vMem.addData(data: _*); cMem.addData(data: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vcjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = StreamPort.viewClickJoin(data.toDF(), data.toDF()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch == Set((1L, 1L, 2L), (2L, 4L, 5L)),
      s"expected exactly the two in-window view→click pairs: $batch")
  }

  test("left-outer stream-stream join: unmatched view emits nulls after watermark closure") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "click", 0.0), // joins view 1
      Ev(3, Timestamp.valueOf("2024-01-01 10:00:00"), 2, "view", 0.0)) // never clicked
    val vMem = MemoryStream[Ev]; val cMem = MemoryStream[Ev]
    val q = StreamPort.viewClickJoinLeftOuter(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("vcleft")
      .outputMode("append").start()
    vMem.addData(base: _*); cMem.addData(base: _*)
    q.processAllAvailable()
    // before watermark closure the unmatched view must NOT have been
    // emitted — a match could still arrive
    val early = spark.table("vcleft").collect().map(_.getLong(1)).toSet
    assert(early == Set(1L), s"only the matched view may emit early: $early")
    // push BOTH watermarks past view_ts + 30min (disjoint users so the
    // pushers cannot join each other inner-side)
    vMem.addData(Ev(98, Timestamp.valueOf("2024-01-01 14:00:00"), 8, "view", 0.0))
    cMem.addData(Ev(99, Timestamp.valueOf("2024-01-01 14:00:00"), 9, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("vcleft").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows.contains((1L, 2L)), s"matched pair must survive: $rows")
    assert(rows.contains((3L, -1L)), s"unmatched view must emit nulls: $rows")
    // batch equivalence on the closed region: same plan, plain left join
    val batch = StreamPort.viewClickJoinLeftOuter(base.toDF(), base.toDF())
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(batch == Set((1L, 2L), (3L, -1L)), s"batch left join: $batch")
  }

  test("file-stream source: readStream over parquet dir == batch answer") {
    import spark.implicits._
    // the production source path: files land in a directory, the
    // stream discovers and processes them incrementally
    // (Trigger.AvailableNow drains all current files then stops)
    val dir = tempDir() + "/evstream"
    val (first, second) = events.splitAt(3)
    first.toDF().write.mode("append").parquet(dir)
    second.toDF().write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
      .option("maxFilesPerTrigger", "1") // force multi-batch incremental processing
      .parquet(dir)
    val q = StreamPort.tumblingCounts(src)
      .writeStream.format("memory").queryName("filestream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "file stream did not drain in time")
    val streamed = spark.table("filestream").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = StreamPort.tumblingCounts(events.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch, "file-source incremental result must equal the batch answer")
  }

  test("mapGroupsWithState running per-user stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamPort.UserEvent]
    val q = StreamPort.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("userstats")
      .outputMode("update").start()
    mem.addData(StreamPort.UserEvent(1, "view", 5.0), StreamPort.UserEvent(1, "click", 2.0))
    q.processAllAvailable()
    mem.addData(StreamPort.UserEvent(1, "view", 9.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("userstats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).last
    assert(last == ((1L, 3L, 9.0))) // state carried across batches
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions matching session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamPort.SessEvent]
    val q = StreamPort.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode("append").start()
    // session A: 10:00 + 10:10 (same 30-min-gap session)
    mem.addData(
      StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 10:00:00")),
      StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // 13:00 closes A inline (gap exceeded) and opens B
    mem.addData(StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // 14:30 closes B and opens C (left open)
    mem.addData(StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 14:30:00")))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("fmgws_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(closed == Set(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:40:00"), 2L),
      (1L, Timestamp.valueOf("2024-01-01 13:00:00"),
        Timestamp.valueOf("2024-01-01 13:30:00"), 1L)), s"got $closed")
    // closed sessions equal the built-in session_window rows for the
    // same events (C is still open, so compare the closed prefix)
    val batch = StreamPort.sessionCounts(Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "view", 0.0),
      Ev(3, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "view", 0.0)).toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(batch == closed)
  }

  test("foreachBatch parquet sink: per-batch dirs, idempotent on batch retry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = tempDir() + "/sink"
    val mem = MemoryStream[Ev]
    val q = StreamPort.foreachBatchParquetSink(
      mem.toDF().select(col("event_id"), col("user_id"), col("value")), out)
      .start()
    mem.addData(events.take(3): _*)
    q.processAllAvailable()
    mem.addData(events.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val sunk = spark.read.parquet(out)
    // every input row landed exactly once, batch lineage as a partition col
    assert(sunk.count() == events.size)
    assert(sunk.select("batch_id").distinct().count() == 2)
    // RETRY of an already-committed batch rewrites the same directory:
    // rerunning batch 1's write must not duplicate rows
    StreamPort.writeBatch(out)(
      events.drop(3).toDF().select(col("event_id"), col("user_id"), col("value")), 1L)
    assert(spark.read.parquet(out).count() == events.size,
      "retried batch duplicated rows — sink not idempotent")
  }

  test("upsert snapshot sink: latest-wins across batches, idempotent on retry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = tempDir() + "/snap"
    case class Kv(k: Long, v: Double)
    val mem = MemoryStream[(Long, Double)]
    val q = StreamPort.upsertSnapshotSink(
      mem.toDF().toDF("k", "v"), out, "k").start()
    mem.addData((1L, 1.0), (2L, 2.0))
    q.processAllAvailable()
    mem.addData((2L, 20.0), (3L, 3.0), (3L, 30.0)) // 3 appears twice in one batch
    q.processAllAvailable()
    q.stop()
    val snap = StreamPort.readSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    // k2 updated by batch 1; within-batch dup of k3 collapses to the
    // max struct row (30.0) deterministically
    assert(snap == Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)), s"got $snap")
    // RETRY batch 1: re-applying the same change set must rebuild the
    // identical snapshot (reads the version below 1, not its own)
    StreamPort.applyUpsertBatch(out, "k")(
      Seq((2L, 20.0), (3L, 3.0), (3L, 30.0)).toDF("k", "v"), 1L)
    val snap2 = StreamPort.readSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(snap2 == snap, "retried batch changed the snapshot")
  }

  test("streaming transition pairs across batches equal the batch lag-window pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def te(id: Long, ts: String, uid: Long, tpe: String) =
      StreamPort.TypedEvent(uid, Timestamp.valueOf(ts), id, tpe)
    // user 1: view->click->purchase, the click->purchase transition
    // SPANS the batch boundary (state carries the last event);
    // user 2: a single event — no transitions
    val b1 = Seq(te(1, "2024-01-01 10:00:00", 1, "view"),
      te(2, "2024-01-01 10:05:00", 1, "click"),
      te(3, "2024-01-01 10:00:00", 2, "view"))
    val b2 = Seq(te(4, "2024-01-01 10:10:00", 1, "purchase"))
    val mem = MemoryStream[StreamPort.TypedEvent]
    val q = StreamPort.transitionPairs(mem.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("trans")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    q.stop()
    assert(streamed == Set((1L, "view", "click"), (1L, "click", "purchase")),
      s"got $streamed")
    // batch parity on the events table: streamed pair counts == the
    // mine_seq_transitions aggregate
    val all = (b1 ++ b2).map(e =>
      (e.event_id, new java.sql.Timestamp(e.ts.getTime), e.user_id,
        e.event_type, 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir()
    writeFixture(dir, "events", all.withColumn("ts",
      expr("CAST(unix_micros(ts) AS BIGINT) * 1000")))
    val batch = operators.MiningOps.queries("mine_seq_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamedCounts = spark.table("trans")
      .groupBy(col("prev_type"), col("next_type")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamedCounts == batch, s"stream $streamedCounts vs batch $batch")
  }

  test("holtSmooth: streamed state equals the ts_holt_linear fold per prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamPort.HourBar]
    val q = StreamPort.holtSmooth(mem.toDS())
      .writeStream.format("memory").queryName("holt")
      .outputMode("update").start()
    // the Round4dSpec hand series: y = 100000, 200000, 120000 —
    // bars 1+2 in one micro-batch (sorted fold), bar 3 in the next
    mem.addData(StreamPort.HourBar("view", 1, 200000L),
      StreamPort.HourBar("view", 0, 100000L))
    q.processAllAvailable()
    val mid = spark.table("holt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(mid == Seq(("view", 2L, 200000L, 100000L)), s"got $mid")
    mem.addData(StreamPort.HourBar("view", 2, 120000L))
    q.processAllAvailable()
    val fin = spark.table("holt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    q.stop()
    // final state = the batch hand fold: l = 210000 (21.0), b = 77500
    // (7.75) — the Round4dSpec fixture values in 1e-4 units
    assert(fin.contains(("view", 3L, 210000L, 77500L)), s"got $fin")
  }

  test("ewmaBand: streamed control state equals the batch recurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamPort.HourBar]
    val q = StreamPort.ewmaBand(mem.toDS())
      .writeStream.format("memory").queryName("band")
      .outputMode("update").start()
    // the Round4dSpec cent series: 1000×4, 100000, 1000 — spike
    // flags once, recovery does not (dev² < 9v)
    val ys = Seq(1000L, 1000L, 1000L, 1000L, 100000L, 1000L)
    mem.addData(ys.take(4).zipWithIndex.map { case (y, i) =>
      StreamPort.HourBar("view", i.toLong, y) }: _*)
    q.processAllAvailable()
    mem.addData(ys.drop(4).zipWithIndex.map { case (y, i) =>
      StreamPort.HourBar("view", (i + 4).toLong, y) }: _*)
    q.processAllAvailable()
    val fin = spark.table("band")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    q.stop()
    assert(fin.contains(("view", 6L, 25750L, 918843750L, 1L)), s"got $fin")
  }

  test("cusumAlarm: streamed state equals the clamped fold per prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamPort.HourBar]
    // mean 1080000/10 = 108000 units, threshold 5·mean = 540000 — the
    // ts_cusum_alarm hand series (8×1.0 then 2×50.0, 1e-4 units)
    val q = StreamPort.cusumAlarm(mem.toDS(), 108000L, 540000L)
      .writeStream.format("memory").queryName("cusum")
      .outputMode("update").start()
    val bars = (0 until 8).map(h => StreamPort.HourBar("view", h, 10000L)) ++
      Seq(StreamPort.HourBar("view", 8, 500000L),
        StreamPort.HourBar("view", 9, 500000L))
    mem.addData(bars.take(5): _*); q.processAllAvailable()
    val mid = spark.table("cusum").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).last
    mem.addData(bars.drop(5): _*); q.processAllAvailable()
    val fin = spark.table("cusum").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).last
    q.stop()
    // replica fold
    def fold(ys: Seq[Long]) = ys.foldLeft((0L, 0L, 0L)) {
      case ((n, s, a), y) =>
        val s2 = math.max(0L, s + (y - 108000L))
        (n + 1, s2, a + (if (s2 > 540000L) 1 else 0))
    }
    assert(mid == fold(bars.take(5).map(_.y)), s"mid $mid")
    assert(fin == fold(bars.map(_.y)), s"fin $fin")
    assert(fin._3 == 1L) // exactly the final-hour alarm, as in batch
  }

  test("funnelConvert: one conversion per user, exactly once across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def te(id: Long, t: String, uid: Long, tpe: String) =
      StreamPort.TypedEvent(uid, Timestamp.valueOf(t), id, tpe)
    val mem = MemoryStream[StreamPort.TypedEvent]
    val q = StreamPort.funnelConvert(mem.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    // u1: signup then purchase in SEPARATE batches; a later purchase
    // must not re-emit. u2: purchase BEFORE signup is ignored, the
    // post-signup purchase converts. u3: signup only — no emission.
    // u4: signup+purchase in the SAME batch, arriving out of order.
    mem.addData(te(1, "2024-01-01 10:00:00", 1, "signup"),
      te(2, "2024-01-01 09:00:00", 2, "purchase"),
      te(3, "2024-01-01 10:30:00", 3, "signup"))
    q.processAllAvailable()
    mem.addData(te(4, "2024-01-01 11:00:00", 1, "purchase"),
      te(5, "2024-01-01 11:30:00", 2, "signup"),
      te(7, "2024-01-01 13:00:00", 4, "purchase"),
      te(6, "2024-01-01 12:00:00", 4, "signup"))
    q.processAllAvailable()
    mem.addData(te(8, "2024-01-01 14:00:00", 1, "purchase"),
      te(9, "2024-01-01 14:30:00", 2, "purchase"))
    q.processAllAvailable()
    val got = spark.table("funnel")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    q.stop()
    assert(got == Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", 3600L),
      (2L, "2024-01-01 11:30:00.0", "2024-01-01 14:30:00.0", 10800L),
      (4L, "2024-01-01 12:00:00.0", "2024-01-01 13:00:00.0", 3600L)),
      s"got $got")
  }

  test("rollingMedian: streamed frame medians equal the batch fold across splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamPort.HourBar]
    val q = StreamPort.rollingMedian(mem.toDS(), frame = 3)
      .writeStream.format("memory").queryName("rmed")
      .outputMode("append").start()
    val ys = Seq(100L, 50L, 120L, 30L, 80L)
    mem.addData(ys.take(2).zipWithIndex.map { case (y, i) =>
      StreamPort.HourBar("view", i.toLong, y) }: _*)
    q.processAllAvailable()
    mem.addData(ys.drop(2).zipWithIndex.map { case (y, i) =>
      StreamPort.HourBar("view", (i + 2).toLong, y) }: _*)
    q.processAllAvailable()
    val got = spark.table("rmed")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    q.stop()
    // replica: trailing-3 frames, lower median (element (n+1)/2)
    val exp = ys.indices.map { i =>
      val fr = ys.slice(math.max(0, i - 2), i + 1).sorted
      (i.toLong, fr.size, fr((fr.size + 1) / 2 - 1))
    }.toSet
    assert(got == exp, s"got $got exp $exp")
  }

  test("streaming band pairs == batch pairs within 120s (r5 RangeJoin twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: 10:00:00 / 10:01:30 / 10:02:30 → pairs (1,2) Δ90s and
    // (2,3) Δ60s but NOT (1,3) Δ150s; user 2 isolated; equal-ts pair
    // (5,6) dedups by id from the lower id
    val evs = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:01:30"), 1, "view", 0.0),
      Ev(3, Timestamp.valueOf("2024-01-01 10:02:30"), 1, "view", 0.0),
      Ev(4, Timestamp.valueOf("2024-01-01 10:00:30"), 2, "view", 0.0),
      Ev(5, Timestamp.valueOf("2024-01-01 11:00:00"), 3, "view", 0.0),
      Ev(6, Timestamp.valueOf("2024-01-01 11:00:00"), 3, "view", 0.0))
    val mem = MemoryStream[Ev]
    val q = StreamPort.bandPairs(mem.toDF(), mem.toDF())
      .writeStream.format("memory").queryName("bandpairs")
      .outputMode("append").start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    val streamed = spark.table("bandpairs")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(streamed == Set((1L, 2L), (2L, 3L), (5L, 6L)), s"got $streamed")
    // batch parity: identical plan on plain DataFrames
    val batch = StreamPort.bandPairs(evs.toDF(), evs.toDF())
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(batch == streamed)
  }

  test("decontamination sink: streamed per-batch reports equal the batch " +
      "screen over the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = tempDir() + "/decontam"
    // fixture: eval doc 100 + three train docs, one quoting the eval
    // span (the Round9Spec planted-quote construction), split across
    // two micro-batches
    val evalText = "held out benchmark question about catalyst optimizer " +
      "internals and the tungsten execution engine pipeline"
    val quote = "benchmark question about catalyst optimizer internals"
    val d1 = s"a training document that leaked the $quote verbatim " +
      "surrounded by otherwise novel prose about distributed shuffles"
    val d2 = "completely clean text discussing parquet row groups, " +
      "bloom filters, and adaptive query execution at length"
    val dir = tempDir()
    writeFixture(dir, "documents", Seq(
      (100L, evalText, "en", "eval", evalText.length.toLong),
      (1L, d1, "en", "train", d1.length.toLong),
      (2L, d2, "en", "train", d2.length.toLong),
      (3L, quote, "en", "train", quote.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // the static pool materializes ONCE from the fixture dir; the
    // train docs stream past it
    val pool = operators.DedupOps.evalFpPool(spark, dir).localCheckpoint(true)
    val mem = MemoryStream[(Long, String)]
    val q = StreamPort.decontaminateSink(
      mem.toDF().toDF("doc_id", "text"), pool, out).start()
    mem.addData((1L, d1), (2L, d2)); q.processAllAvailable()
    mem.addData((3L, quote)); q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).sortBy(_._1).toSeq
    val streamed = rows(spark.read.parquet(out)
      .select("doc_id", "n_fp", "n_hit", "hit_frac", "contaminated"))
    val batch = rows(operators.DedupOps.decontamReport(
      Seq((1L, d1), (2L, d2), (3L, quote)).toDF("doc_id", "text"), pool))
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.exists(r => r._1 == 1L && r._5),
      "the planted quote must be flagged through the stream path")
    // RETRY batch 0: identical bytes, not duplicates
    StreamPort.applyDecontamBatch(pool, out)(
      Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), 0L)
    assert(rows(spark.read.parquet(out)
        .select("doc_id", "n_fp", "n_hit", "hit_frac", "contaminated"))
      == streamed, "retried batch changed the report")
  }

  test("cc refresh sink: snapshot equals the full recompute after EVERY " +
      "batch, idempotent on retry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = tempDir() + "/cclabels"
    def snap(): Seq[(Long, Long)] = StreamPort.readSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def full(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
      operators.GraphOps.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mem = MemoryStream[(Long, Long)]
    val q = StreamPort.ccRefreshSink(mem.toDF().toDF("src", "dst"), out).start()
    // batch 0: two separate components
    val b0 = Seq((1L, 2L), (10L, 11L))
    mem.addData(b0: _*); q.processAllAvailable()
    assert(snap() == full(b0), "first batch must equal the plain fixpoint")
    // batch 1: a BRIDGE edge merges the two base components — the
    // label-contraction case the merge contract exists for
    val b1 = Seq((2L, 10L))
    mem.addData(b1: _*); q.processAllAvailable()
    assert(snap() == full(b0 ++ b1), "merged components must relabel to the " +
      "component min exactly as a full recompute would")
    // batch 2: new vertices attach to an existing component AND form a
    // fresh one (base_lbl unknown on both ends)
    val b2 = Seq((11L, 20L), (30L, 31L))
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val want = full(b0 ++ b1 ++ b2)
    assert(snap() == want, "delta-attached vertices must label like a full recompute")
    // RETRY the last batch id: re-applying the same delta must rebuild
    // the identical snapshot (the sink merges from the version BELOW
    // its own id, never from its own partial output)
    StreamPort.applyCcRefreshBatch(out)(b2.toDF("src", "dst"), 2L)
    assert(snap() == want, "retried batch changed the snapshot")
    // an EMPTY micro-batch (idle trigger / all rows self-loops) must
    // carry the snapshot forward unchanged, not corrupt or drop it
    StreamPort.applyCcRefreshBatch(out)(
      Seq((7L, 7L)).toDF("src", "dst"), 3L) // self-loop filters to empty
    assert(snap() == want, "empty delta must preserve the snapshot")
  }
}

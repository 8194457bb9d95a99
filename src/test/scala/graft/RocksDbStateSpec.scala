package graft

import java.sql.Timestamp

import graft.streaming.StreamPort
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** RocksDB state store port (VERDICT r10 #3): every stateful streaming
  * entry point so far ran on the default in-memory HDFS-backed state
  * store; a production 100 TB stream runs on the spillable RocksDB
  * provider (rocksdbjni is on the classpath). This spec re-runs the
  * heaviest stateful ports under
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` — since r12 (VERDICT r11 #5) the matrix
  * covers EVERY stateful entry point: watermark dedup, windowed
  * dedup-then-count, sessionize, rollingMedian, cmSketch, ohlcBars,
  * transitionPairs, urlFrontierDedup, the stream-stream interval
  * join, and the foreachBatch cc refresh — and pins
  *
  *  (a) stream ≡ batch parity UNCHANGED vs the default-provider twins
  *      in StreamPortSpec (same fixtures, same expected sets), and
  *  (b) that RocksDB actually engaged — the query progress's state
  *      operator reports rocksdb* custom metrics, which the HDFS
  *      provider never emits — plus a state-size telemetry read
  *      (numRowsTotal / stateMemory) so the "bounded state at any
  *      scale" claims are measured on the store that would hold them
  *      at scale.
  *
  * The provider is session-wide at query START, so each test sets it,
  * starts its query, and restores the default in a finally — the rest
  * of the suite keeps running on the default provider.
  */
class RocksDbStateSpec extends SparkTestBase {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** run `f` with the RocksDB provider set, restoring the previous
    * provider afterwards */
  private def withRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** assert the finished query's state operators carry rocksdb custom
    * metrics (proof the provider engaged) and return (rows, memBytes)
    * summed over state operators */
  private def rocksTelemetry(
      q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val ops = q.lastProgress.stateOperators
    assert(ops.nonEmpty, "expected at least one state operator")
    val rocksKeys = ops.flatMap(_.customMetrics.keySet.toArray).map(_.toString)
      .filter(_.toLowerCase.contains("rocksdb"))
    assert(rocksKeys.nonEmpty,
      s"no rocksdb custom metrics — provider did not engage; got " +
        s"${ops.flatMap(_.customMetrics.keySet.toArray).mkString(", ")}")
    (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
  }

  private def ev(id: Long, ts: String, uid: Long, tpe: String) =
    (id, Timestamp.valueOf(ts), uid, tpe, 0.0)

  private def eventsDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "amount")
  }

  test("dropDuplicatesWithinWatermark on RocksDB: same dedup as the default store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val q = StreamPort.dedupWithinWatermark(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "amount"))
        .writeStream.format("memory").queryName("rdb_dedup")
        .outputMode("append").start()
      mem.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view"),
        ev(2, "2024-01-01 10:00:30", 1, "view"), // dup (user, type)
        ev(3, "2024-01-01 10:01:00", 1, "click"),
        ev(4, "2024-01-01 10:02:00", 2, "view"),
        ev(5, "2024-01-01 10:03:00", 2, "view")) // dup
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      q.stop()
      val got = spark.table("rdb_dedup").select("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "view"), (1L, "click"), (2L, "view")))
      assert(rows >= 3, s"state must hold the 3 distinct keys, got $rows")
      assert(mem0 > 0, "rocksdb state memory must be reported")
      info(s"dedupWithinWatermark rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("newUserCounts on RocksDB: windowed dedup-then-count finalizes identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val q = StreamPort.newUserCounts(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "amount"))
        .writeStream.format("memory").queryName("rdb_newusers")
        .outputMode("append").start()
      mem.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view"),
        ev(2, "2024-01-01 11:00:00", 1, "view"),
        ev(3, "2024-01-01 12:00:00", 1, "click"),
        ev(4, "2024-01-01 13:00:00", 2, "view"))
      q.processAllAvailable()
      // advance the watermark past day 1 so the window finalizes
      mem.addData(ev(99, "2024-01-03 00:00:00", 9, "view"))
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      q.stop()
      val got = spark.table("rdb_newusers").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "view", 2L),
        (Timestamp.valueOf("2024-01-01 00:00:00"), "click", 1L)), s"got $got")
      info(s"newUserCounts rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("sessionize (flatMapGroupsWithState) on RocksDB: closed sessions match the batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[StreamPort.SessEvent]
      val q = StreamPort.sessionize(mem.toDS())
        .writeStream.format("memory").queryName("rdb_sess")
        .outputMode("append").start()
      // the StreamPortSpec fixture: 10:00+10:10 = session A; 13:00
      // closes A inline and opens B; 14:30 closes B and opens C
      mem.addData(
        StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 10:00:00")),
        StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 10:10:00")))
      q.processAllAvailable()
      mem.addData(StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      mem.addData(StreamPort.SessEvent(1, Timestamp.valueOf("2024-01-01 14:30:00")))
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      q.stop()
      val closed = spark.table("rdb_sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(closed == Set(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"),
          Timestamp.valueOf("2024-01-01 10:40:00"), 2L),
        (1L, Timestamp.valueOf("2024-01-01 13:00:00"),
          Timestamp.valueOf("2024-01-01 13:30:00"), 1L)), s"got $closed")
      assert(rows == 1, s"one open session (C) in state, got $rows")
      info(s"sessionize rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("rollingMedian (mapGroupsWithState) on RocksDB: frame medians equal the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[StreamPort.HourBar]
      val q = StreamPort.rollingMedian(mem.toDS(), frame = 3)
        .writeStream.format("memory").queryName("rdb_rmed")
        .outputMode("append").start()
      val ys = Seq(100L, 50L, 120L, 30L, 80L)
      mem.addData(ys.take(2).zipWithIndex.map { case (y, i) =>
        StreamPort.HourBar("view", i.toLong, y) }: _*)
      q.processAllAvailable()
      mem.addData(ys.drop(2).zipWithIndex.map { case (y, i) =>
        StreamPort.HourBar("view", (i + 2).toLong, y) }: _*)
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      q.stop()
      val got = spark.table("rdb_rmed")
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSet
      val exp = ys.indices.map { i =>
        val fr = ys.slice(math.max(0, i - 2), i + 1).sorted
        (i.toLong, fr.size, fr((fr.size + 1) / 2 - 1))
      }.toSet
      assert(got == exp, s"got $got exp $exp")
      assert(rows == 1, s"one user key in state, got $rows")
      info(s"rollingMedian rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  // ------------------------------------------------------------------
  // r12 (VERDICT r11 #5): the REMAINING stateful StreamPort entries —
  // the provider matrix now covers every stateful entry point:
  // cmSketch (streaming UDAF agg), ohlcBars (mergeable min_by/max_by
  // agg), transitionPairs (flatMapGroupsWithState), urlFrontierDedup
  // (dropDuplicatesWithinWatermark on a derived key), and the
  // stream-stream interval join (two-sided join state).
  // ------------------------------------------------------------------

  test("cmSketch on RocksDB: streamed sketch equals the batch sketch " +
      "(streaming typed-aggregator state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val terms = Seq("apple", "apple", "pear", "apple", "plum", "pear")
      val mem = MemoryStream[String]
      val q = StreamPort.cmSketch(mem.toDS())
        .writeStream.format("memory").queryName("rdb_cm")
        .outputMode("complete").start()
      mem.addData(terms.take(3): _*); q.processAllAvailable()
      mem.addData(terms.drop(3): _*); q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      val streamed = spark.table("rdb_cm").collect()(0).getSeq[Long](0).toArray
      q.stop()
      val batch = StreamPort.cmSketch(terms.toDS()).collect()(0)
        .getSeq[Long](0).toArray
      assert(streamed.sameElements(batch),
        "rocksdb-held sketch state must merge to the batch sketch")
      info(s"cmSketch rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("ohlcBars on RocksDB: cross-batch bar re-opening matches the batch " +
      "answer (mergeable min_by/max_by agg state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val events = Seq(
        ev(1, "2024-01-01 10:05:00", 1, "view").copy(_5 = 1.0),
        ev(2, "2024-01-01 10:20:00", 1, "view").copy(_5 = 2.0),
        ev(3, "2024-01-01 11:10:00", 1, "click").copy(_5 = 3.0),
        ev(4, "2024-01-01 10:15:00", 2, "view").copy(_5 = 4.0),
        ev(6, "2024-01-01 10:16:00", 2, "view").copy(_5 = 6.0))
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def df(m: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        m.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = StreamPort.ohlcBars(df(mem))
        .writeStream.format("memory").queryName("rdb_ohlc")
        .outputMode("complete").start()
      // event 6 (an EARLIER event for the 10:00 bar) arrives in batch
      // 2: the rocksdb-held min_by state must re-open the bar
      mem.addData(events.filter(_._1 != 6): _*); q.processAllAvailable()
      mem.addData(events.filter(_._1 == 6): _*); q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6))
      val streamed = spark.table("rdb_ohlc").collect().map(key).toSet
      q.stop()
      val batch = StreamPort.ohlcBars(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(key).toSet
      assert(streamed == batch)
      assert(batch.contains((Timestamp.valueOf("2024-01-01 10:00:00"),
        "view", 1.0, 6.0, 1.0, 2.0, 4L)),
        s"10:00 view bar must re-open at event 6's value: $batch")
      info(s"ohlcBars rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("transitionPairs on RocksDB: the cross-batch transition survives in " +
      "rocksdb flatMapGroupsWithState state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      def te(id: Long, ts: String, uid: Long, tpe: String) =
        StreamPort.TypedEvent(uid, Timestamp.valueOf(ts), id, tpe)
      val mem = MemoryStream[StreamPort.TypedEvent]
      val q = StreamPort.transitionPairs(mem.toDS())
        .writeStream.format("memory").queryName("rdb_trans")
        .outputMode("append").start()
      // the click->purchase transition SPANS the batch boundary — the
      // last-event state must round-trip through RocksDB
      mem.addData(te(1, "2024-01-01 10:00:00", 1, "view"),
        te(2, "2024-01-01 10:05:00", 1, "click"),
        te(3, "2024-01-01 10:00:00", 2, "view"))
      q.processAllAvailable()
      mem.addData(te(4, "2024-01-01 10:10:00", 1, "purchase"))
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      val streamed = spark.table("rdb_trans")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      q.stop()
      assert(streamed == Set((1L, "view", "click"), (1L, "click", "purchase")),
        s"got $streamed")
      assert(rows == 2, s"one last-event state row per user, got $rows")
      info(s"transitionPairs rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("urlFrontierDedup on RocksDB: canonical-key frontier dedup unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val q = StreamPort
        .urlFrontierDedup(mem.toDF().toDF("event_id", "ts", "url"))
        .writeStream.format("memory").queryName("rdb_urlfrontier")
        .outputMode("append").start()
      val t = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((1L, t, "HTTPS://Host.EXAMPLE.com/a/?utm_source=x#f"),
        (2L, t, "https://other.example.com/b"))
      q.processAllAvailable()
      mem.addData((3L, t, "https://host.example.com/a"), // variant of 1
        (4L, t, "https://other.example.com/b?ref=y"), // variant of 2
        (5L, t, "https://third.example.com/c")) // new
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      val got = spark.table("rdb_urlfrontier").select("event_id")
        .collect().map(_.getLong(0)).toSet
      q.stop()
      assert(got == Set(1L, 2L, 5L), s"got $got")
      assert(rows >= 3, s"state holds the 3 canonical keys, got $rows")
      info(s"urlFrontierDedup rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("stream-stream interval join on RocksDB: two-sided join state " +
      "produces the batch pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val data = Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view").copy(_5 = 1.0),
        ev(2, "2024-01-01 10:10:00", 1, "click"), // joins view 1
        ev(3, "2024-01-01 10:45:00", 1, "click"), // outside window
        ev(4, "2024-01-01 10:00:00", 2, "view").copy(_5 = 2.0),
        ev(5, "2024-01-01 10:20:00", 2, "click"), // joins view 4
        ev(6, "2024-01-01 10:05:00", 3, "click")) // no view
      def df(m: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        m.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val vMem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val cMem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val q = StreamPort.viewClickJoin(df(vMem), df(cMem))
        .writeStream.format("memory").queryName("rdb_vcjoin")
        .outputMode("append").start()
      vMem.addData(data: _*); cMem.addData(data: _*)
      q.processAllAvailable()
      val (rows, mem0) = rocksTelemetry(q)
      q.stop()
      val streamed = spark.table("rdb_vcjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val evDf = data.toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = StreamPort.viewClickJoin(evDf, evDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(batch == Set((1L, 1L, 2L), (2L, 4L, 5L)), s"got $batch")
      info(s"viewClickJoin rocksdb state: rows=$rows mem=${mem0}B")
    }
  }

  test("ccRefreshSink runs unchanged under the RocksDB provider (foreachBatch — " +
      "state lives in the versioned snapshot, not the store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val out = tempDir() + "/rdb_cclabels"
      def snap(): Seq[(Long, Long)] = StreamPort.readSnapshot(spark, out)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      def full(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
        operators.GraphOps.connectedComponents(edges.toDF("src", "dst"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val mem = MemoryStream[(Long, Long)]
      val q = StreamPort.ccRefreshSink(mem.toDF().toDF("src", "dst"), out).start()
      val b0 = Seq((1L, 2L), (10L, 11L))
      mem.addData(b0: _*); q.processAllAvailable()
      val b1 = Seq((2L, 10L))
      mem.addData(b1: _*); q.processAllAvailable()
      q.stop()
      assert(snap() == full(b0 ++ b1),
        "bridge merge under RocksDB provider must equal the full recompute")
    }
  }
}

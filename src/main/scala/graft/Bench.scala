package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong
object Bench {

  /** per-query shuffle telemetry (VERDICT r9 #5): stage-level shuffle
    * bytes/rows, spill, and peak task memory, accumulated by one
    * session-lifetime listener. The bench drains the async listener
    * bus (ListenerBusDrain) around each timed query so the counter
    * DELTAS attribute to that query — turning every future 100×-scale
    * judgment ("does this op shuffle more than it must?") from
    * plan-reading into arithmetic on bench_queries.json. */
  private[graft] final class ShuffleTelemetry
      extends org.apache.spark.scheduler.SparkListener {
    val writeBytes = new AtomicLong
    val writeRows = new AtomicLong
    val readBytes = new AtomicLong
    val spillBytes = new AtomicLong
    val peakMem = new AtomicLong // max per-stage peakExecutionMemory
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      writeRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      peakMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
    }
    def snapshot: (Long, Long, Long, Long) =
      (writeBytes.get, writeRows.get, readBytes.get, spillBytes.get)
  }

  /** drop every cached relation and session-lifetime memo — run before
    * each timed rep so no query (or rep) reads a pre-computed scalar or
    * relation another one materialized */
  private def clearSessionState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    graft.operators.GraphOps.clearMemos(spark)
    graft.operators.DedupOps.clearMemos(spark)
    graft.operators.VectorOps.clearMemos(spark)
  }

  def main(args: Array[String]): Unit = {
    // dev-only filter (comma-separated query names): the driver runs
    // with no args, so the contract output is unchanged; a filtered
    // run times (and warms) just the named queries for iteration
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is TIMESTAMP(NANOS) parquet — read as raw long, see Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen compiler, parquet reader, shuffle
    // machinery) so the first timed query isn't charged for JVM init
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    spark.range(1000).repartition(4).groupBy((org.apache.spark.sql.functions.col("id") % 10)).count().count()
    // warm the iterative-loop plan shapes too (join+agg+localCheckpoint
    // codegen): graph_pagerank is near the front of the hash-ordered
    // query map, and measured ~8 s of its bench time was first-run
    // JIT/codegen, not the algorithm (4 s warm vs 12 s cold)
    val warmEdges = spark.range(100)
      .selectExpr("id AS src", "id % 10 AS dst") // 10 stars: CC converges in ~2 hops
    graft.operators.GraphOps.pageRank(warmEdges, iters = 2).count()
    graft.operators.GraphOps.connectedComponents(warmEdges).count()
    // warm EVERY declared query shape at sf0.001 before timing —
    // uniform steady-state measurement, not a cherry-picked subset.
    // First execution of a plan pays whole-stage-codegen compile + C2
    // JIT (measured: vec_ann_lsh 5.1 s cold vs 1.6 s after a sf0.001
    // pass — its 16 hyperplane array literals generate a huge method),
    // and WHICH query paid it used to depend on hash-map iteration
    // order, making per-query times incomparable across rounds. The
    // warmup charges compilation once, off the clock; at cluster scale
    // that constant vanishes against hours of execution.
    val warmDir = "/root/testdata/sf0.001"
    // NonFatal only: an OOM or other fatal error during warmup must
    // abort the bench, not silently degrade into timing a thrashed JVM.
    // A warmup failure is LOGGED (ADVICE r3): the query then runs cold
    // in the timed pass, and that degraded timing must be attributable.
    SparkEntry.queries.filter(q => only.forall(_.contains(q._1)))
        .foreach { case (name, fn) =>
      try fn(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[bench] warmup of $name failed (${e.getClass.getName}: " +
            s"${e.getMessage}) — its timed run will pay codegen/JIT cold")
      }
    }
    // drop the warmup's cached relations, session memos, and garbage
    // BEFORE the clock starts: warming every query shape leaves cached
    // sf0.001 RDDs, broadcast blocks, and young-gen litter whose GC
    // pauses otherwise land inside arbitrary timed queries (measured:
    // graph_degree 9.3 s in a post-warmup bench vs 1.1 s in isolation
    // — pure JVM-state noise). Clearing the (session, dir) memos too
    // keeps the timed run honest even when SPARK_GRAFT_SF_DIR points
    // at the warmup dir itself: no timed query may read a scalar or
    // relation the warmup pre-computed (clearCache alone would leave
    // those memoized-but-uncached — recomputing on every action).
    clearSessionState(spark)
    // warmup builds must not leak into the timed memo_build record
    graft.operators.GraphOps.drainMemoBuildTimes()
    System.gc()
    // min-of-N timing (VERDICT r3 #1): the r3 driver bench lost the 2×
    // gate to a transient load spike that inflated one contiguous
    // alphabetical block 6–30×. The minimum over N runs measures the
    // ENGINE — the plan's intrinsic cost — not whatever the box was
    // doing during one of them.
    //
    // Isolation per PASS, not per query (r5, VERDICT r4 #1): each pass
    // runs every query once, alphabetically, in one warm session;
    // caches + session memos clear BETWEEN passes. Within a pass the
    // memoized shared relations (edges, coParts, the r5 oriented-
    // triangle relation, LPA labels, dedup clusters…) amortize across
    // their consumers exactly as they do for a real user running the
    // workload in one session — the enumeration cost lands on the
    // alphabetically-first consumer of each family, deterministically,
    // and the TOTAL is the one-session workload time (the number
    // BASELINE.md tracks). The r3/r4 per-query clearing protocol made
    // every triangle-family query re-pay the identical enumeration
    // 3×4 times per bench, charging the engine for work a session
    // would never repeat. Per-rep honesty is preserved: no pass rides
    // a relation any previous pass materialized.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val sorted = SparkEntry.queries.toSeq
      .filter(q => only.forall(_.contains(q._1)))
      .sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    // every pass's time per query (r6, VERDICT r5 #8): the file
    // records [t1..tN] alongside the min so the driver can tell box
    // noise (one inflated pass) from a real regression (all passes
    // moved) without re-running
    val passTimes = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Double]]
    // memo-warming consumers (ADVICE r5 #5): queries whose timed run
    // BUILT at least one shared session memo — their per-query time
    // carries a family's shared-relation cost and is only comparable
    // round-over-round against other warming runs
    val memoWarm = scala.collection.mutable.Set.empty[String]
    val failedQ = scala.collection.mutable.Set.empty[String]
    // telemetry deltas for the pass that holds each query's MIN time,
    // so the recorded shuffle profile describes the same run the
    // seconds describe. The drains sit OUTSIDE the timed region (one
    // before t0, one after t is captured).
    val telemetry = new ShuffleTelemetry
    spark.sparkContext.addSparkListener(telemetry)
    val shuffleOf = scala.collection.mutable.Map.empty[String,
      (Long, Long, Long, Long, Long)]
    def drain(): Unit =
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    for (_ <- 1 to reps) {
      clearSessionState(spark)
      System.gc()
      sorted.foreach { case (name, fn) =>
        if (!failedQ.contains(name)) {
          val builds0 = graft.operators.GraphOps.memoBuilds.get()
          drain()
          telemetry.peakMem.set(0L)
          val snap0 = telemetry.snapshot
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            val t = (System.nanoTime() - t0) / 1e9
            drain()
            if (!best.get(name).exists(_ <= t)) {
              best(name) = t
              val s1 = telemetry.snapshot
              shuffleOf(name) = (s1._1 - snap0._1, s1._2 - snap0._2,
                s1._3 - snap0._3, s1._4 - snap0._4, telemetry.peakMem.get)
            }
            passTimes.getOrElseUpdate(name,
              scala.collection.mutable.ArrayBuffer.empty) += t
            if (graft.operators.GraphOps.memoBuilds.get() > builds0)
              memoWarm += name
          } catch {
            // a failed query reports -1, not its time-to-exception — a
            // silent failure must not masquerade as a fast bench entry.
            // Earlier successful reps are dropped too (ADVICE r6 #3):
            // passes/memo_warm keeping stale entries for a query whose
            // "queries" value is -1 made the artifact self-inconsistent
            case e: Throwable =>
              System.err.println(
                s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
              failedQ += name
              best.remove(name)
              passTimes.remove(name)
              memoWarm -= name
              shuffleOf.remove(name)
              // ADVICE r7 #4: a query that fails AFTER building a
              // shared memo leaves it warm, so later consumers in the
              // same pass would time against a cache they didn't build
              // and never get the memo_warm flag. Drop all session
              // state; the next consumer rebuilds and (via the
              // memoBuilds delta) carries the flag honestly.
              clearSessionState(spark)
          }
        }
      }
    }
    val results = sorted.map { case (name, _) =>
      name -> (if (failedQ.contains(name)) -1.0 else best(name))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // durable per-query record (VERDICT r4 #8): the driver captures
    // only the stdout TAIL, hiding keys a–t from BENCH_r0N.json — the
    // full map also lands in a file next to the repo so round-over-
    // round regression comparison never depends on tail-capture luck.
    // r6 schema additions (VERDICT r5 #8 + ADVICE r5 #5): "passes" =
    // every rep's time per query (min vs spread separates box noise
    // from regression), "memo_warm" = the queries whose timed run
    // built a shared session memo (their time carries a family's
    // shared-relation cost). The stdout contract lines are UNCHANGED.
    // Locale.ROOT (ADVICE r11 #3): the f"" interpolator uses the JVM
    // default locale, and a comma-decimal locale would emit "0,123" —
    // invalid JSON. Double.toString (the "queries" map) is immune.
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val passesJson = sorted.collect {
      case (name, _) if passTimes.contains(name) =>
        "\"" + name + "\":[" +
          passTimes(name).map(fmt3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val warmJson = memoWarm.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // r10 schema addition (VERDICT r9 #5): per-query shuffle profile
    // from the min-time pass — shuffle write bytes/rows, shuffle read
    // bytes, spilled bytes, max per-stage peakExecutionMemory. The
    // stdout contract lines are UNCHANGED.
    val shuffleJson = sorted.collect {
      case (name, _) if shuffleOf.contains(name) =>
        val (wb, wr, rb, sp, pk) = shuffleOf(name)
        "\"" + name + "\":{\"write_bytes\":" + wb + ",\"write_rows\":" + wr +
          ",\"read_bytes\":" + rb + ",\"spill_bytes\":" + sp +
          ",\"peak_mem\":" + pk + "}"
    }.mkString("{", ",", "}")
    // a dev-filtered subset run lands in a SEPARATE file (ADVICE r6
    // #5): the full-map bench_queries.json is the durable round-over-
    // round regression record and a 4-query iteration run must never
    // clobber it. A non-default core count lands in its OWN file too
    // (VERDICT r14 #2): the driver's 8-core scaling rerun used to
    // overwrite the 32-core map — bench_queries.json held the c8 run
    // and PERF_r14's per_query/geomean came up empty. Now the scaling
    // rerun writes bench_queries.c8.json and the 32-core record
    // survives it; the "cpus" payload field makes each file
    // self-describing. Stdout contract lines unchanged.
    val benchFile =
      if (only.isDefined) "bench_queries.partial.json"
      else if (cpus != "32") s"bench_queries.c$cpus.json"
      else "bench_queries.json"
    // r11 schema addition (VERDICT r10 #7): "memo_build" = min observed
    // build seconds per shared-memo label across the timed passes
    // (memos clear between passes, so every pass rebuilds). Cross-round
    // comparison of a memo_warm row subtracts its family's build line
    // instead of reading a memo move as query drift. Lazy builds record
    // ~0 by construction — their cost rides the first action, which
    // memo_warm already marks.
    val memoBuildJson = graft.operators.GraphOps.drainMemoBuildTimes()
      .toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    try Files.writeString(Paths.get(benchFile),
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"queries":$qs,"sf":"$sfDir","passes":$passesJson,"memo_warm":$warmJson,"shuffle":$shuffleJson,"memo_build":$memoBuildJson}""")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] $benchFile write failed: $e") }
    // Two lines, long-then-short (round-1 post-mortem): the driver may
    // capture only the TAIL of stdout, and r01's single long line was
    // cut mid-JSON ("parsed": null, ~20 per-query times lost). The
    // full contract line goes first; a short, always-complete total
    // line goes last so any tail capture ends in parseable JSON.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // Distinct metric name (ADVICE r2): a line-parsing driver must not
    // double-count this tail-safety duplicate as a second total.
    println(s"""{"metric":"total_tail","value":$total,"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}

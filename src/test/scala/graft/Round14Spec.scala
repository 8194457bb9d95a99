package graft

import org.apache.spark.sql.functions._

/** r14 (optimization round 1) — pins for the operator internals the
  * round restructured. Each optimization must be result-invisible;
  * these tests hold the invariants the restructures leaned on, on
  * planted graphs where the expected answer is checkable by hand.
  */
class Round14Spec extends SparkTestBase {
  import operators.GraphOps

  private def edgeDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("kCore ladder rungs on a planted K4 + triangle + tail") {
    // planted: a 4-clique (core 3) + a triangle hanging off it (core 2)
    // + a path tail (core 1) — pins the peel the core ladder iterates.
    // (A chained-rung ladder variant was built this round and measured
    // worse in the full bench — see graph_core_ladder's note; this pin
    // holds the from-scratch peels the shipped ladder runs.)
    val g = edgeDf(
      1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L, // K4
      4L -> 5L, 5L -> 6L, 6L -> 4L,                               // triangle
      6L -> 7L, 7L -> 8L)                                         // tail
    def degs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scratch2 = degs(GraphOps.kCore(g, k = 2))
    val scratch3 = degs(GraphOps.kCore(g, k = 3))
    // K4 survives k=3 with in-core degree 3; the tail is gone at k=2
    assert(scratch3 == Set(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(scratch2.map(_._1) == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("pageRank constant-frame restructure: personalized restart and " +
      "the uniform frame agree with the definition on a planted star") {
    // star: hub 1 — leaves 2..5 (symmetric). Uniform PR closed form
    // after any round count r >= 2 alternates toward the fixpoint;
    // check round-2 values exactly: hub gets 0.15 + 0.85 * (4 leaves *
    // leafPr/1), leaf gets 0.15 + 0.85 * hubPr/4.
    val g = edgeDf(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)
    val r2 = GraphOps.pageRank(g, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hub1 = 0.15 + 0.85 * 4.0   // after round 1: leaves each sent 1.0/1
    val leaf1 = 0.15 + 0.85 * 0.25 // hub sent 1.0/4 to each leaf
    val hub2 = 0.15 + 0.85 * 4 * leaf1
    val leaf2 = 0.15 + 0.85 * hub1 / 4
    assert(math.abs(r2(1L) - hub2) < 1e-9, s"hub: ${r2(1L)} vs $hub2")
    (2L to 5L).foreach(v =>
      assert(math.abs(r2(v) - leaf2) < 1e-9, s"leaf $v: ${r2(v)} vs $leaf2"))
    // personalized: restart mass only on the seed — non-seed leaves
    // get rank only through the walk
    import spark.implicits._
    val ppr = GraphOps.pageRank(g, iters = 2,
        seeds = Some(Seq(2L).toDF("v")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // round 1: hub = 0.85 * (seed leaf's 1.0/1) = 0.85; seed leaf =
    // 0.15 + 0.85 * (hub0 0.0)/4 = 0.15 ... with x0 = e_S: hub0 = 0,
    // leaf0 = [v==2]. Round 1: hub = 0 + 0.85 * 1.0 = 0.85, seed =
    // 0.15 + 0.85 * 0 = 0.15, others = 0. Round 2: hub = 0.85 * 0.15,
    // seed = 0.15 + 0.85 * 0.85/4, others = 0.85 * 0.85/4.
    assert(math.abs(ppr(1L) - 0.85 * 0.15) < 1e-9)
    assert(math.abs(ppr(2L) - (0.15 + 0.85 * 0.85 / 4)) < 1e-9)
    assert(math.abs(ppr(3L) - 0.85 * 0.85 / 4) < 1e-9)
  }

  test("labelPropagation orientation flip: src-keyed join over the " +
      "symmetric relation yields the dst-keyed rounds' labels") {
    // barbell: two triangles joined by one bridge — LPA converges to
    // per-triangle min labels with the bridge endpoints keeping their
    // sides; the reference labels below were computed by hand from the
    // synchronous min-tie-break rounds (and match the pre-r14
    // dst-keyed implementation's output).
    val g = edgeDf(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L)
    val lbl = GraphOps.labelPropagation(g, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-unrolled synchronous rounds (min tie-break): the left
    // triangle settles on 1; label 3 crosses the bridge and the right
    // side settles on 3 by round 4 (stable through round 5)
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"unexpected labels: $lbl")
  }
}

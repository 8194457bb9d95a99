package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Hand-built-graph tests for the iterative operators (no oracle
  * exists for PageRank; CC's oracle only runs at sf0.01 — these pin
  * the algorithms themselves). */
class GraphSpec extends SparkTestBase {

  private def edgeDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("connectedComponents labels two separate components") {
    // component {1,2,3} and component {10,11}; 20 isolated via self-loop
    val cc = GraphOps.connectedComponents(edgeDf(1L -> 2L, 2L -> 3L, 10L -> 11L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents on a chain converges past one iteration") {
    // 0-1-2-3-4-5: min label must walk the whole chain
    val chain = (0L until 5L).map(i => i -> (i + 1))
    val cc = GraphOps.connectedComponents(edgeDf(chain: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(0L))
    assert(cc.size == 6)
  }

  test("pageRank mass is conserved (sum ≈ N) and uniform on a cycle") {
    // directed 4-cycle symmetrized → regular graph → uniform PR = 1.0
    val pr = GraphOps.pageRank(edgeDf(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 4)
    pr.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9, s"non-uniform: $pr"))
  }

  test("pageRank matches GraphX staticPageRank on a small graph") {
    import org.apache.spark.graphx.{Edge, Graph}
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 1L, 2L -> 4L)
    // our implementation symmetrizes; hand GraphX the same symmetric set
    val sym = (pairs ++ pairs.map(_.swap)).distinct
    val ours = GraphOps.pageRank(edgeDf(pairs: _*), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gx = Graph.fromEdges(
      spark.sparkContext.parallelize(sym.map { case (a, b) => Edge(a, b, 1) }), 1)
      .staticPageRank(10).vertices.collect().toMap
    for ((v, p) <- ours)
      assert(math.abs(p - gx(v)) < 1e-6, s"vertex $v: ours=$p graphx=${gx(v)}")
  }

  test("cluster-scale shuffle path (caps=0) equals broadcast path: CC + PageRank") {
    // pin the operators to the co-partitioned shuffle join they use
    // once the vertex set outgrows the broadcast cap, and assert exact
    // result equivalence with the small-graph broadcast path
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 10L -> 11L)
    val ccB = GraphOps.connectedComponents(edgeDf(pairs: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prB = GraphOps.pageRank(edgeDf(pairs: _*), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set(GraphOps.BroadcastStateMaxRowsKey, "0")
    try {
      val ccS = GraphOps.connectedComponents(edgeDf(pairs: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ccS == ccB)
      val prS = GraphOps.pageRank(edgeDf(pairs: _*), 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(prS.keySet == prB.keySet)
      prS.foreach { case (v, p) =>
        assert(math.abs(p - prB(v)) < 1e-9, s"vertex $v: shuffle=$p broadcast=${prB(v)}") }
    } finally spark.conf.unset(GraphOps.BroadcastStateMaxRowsKey)
  }

  test("kCore: planted clique survives the peel, pendant chain does not") {
    // triangle {1,2,3} with pendant chain 3-4-5: the 2-core is exactly
    // the triangle (each vertex in-core degree 2); chain peels away
    val core2 = GraphOps.kCore(edgeDf(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $core2")
    // a pure chain has NO 2-core
    val empty = GraphOps.kCore(edgeDf(1L -> 2L, 2L -> 3L, 3L -> 4L), k = 2).count()
    assert(empty == 0L)
    // k=1 keeps every non-isolated vertex
    val core1 = GraphOps.kCore(edgeDf(1L -> 2L, 3L -> 4L), k = 1).count()
    assert(core1 == 4L)
  }

  test("degree/two-hop/triangles agree with hand counts on a planted star graph") {
    val dir = tempDir()
    // orders 1..3 by customers 1..2; lineitems connect suppliers/parts
    import spark.implicits._
    writeFixture(dir, "orders", Seq(
      (1L, 1L, "O", 10.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "1-URGENT"),
      (2L, 2L, "O", 20.0, java.sql.Timestamp.valueOf("2020-01-02 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    // order 1: parts 100,101,102 (forms a triangle); order 2: parts 100,101 (already an edge)
    def li(ok: Long, pk: Long, sk: Long, ln: Int) =
      (ok, pk, sk, ln, 1.0, 10.0, 0.0, 0.0, "N", "O", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    writeFixture(dir, "lineitem", Seq(
      li(1L, 100L, 7L, 1), li(1L, 101L, 8L, 2), li(1L, 102L, 7L, 3),
      li(2L, 100L, 9L, 1), li(2L, 101L, 7L, 2))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))

    val tri = operators.GraphOps.queries("graph_triangles")(spark, dir)
      .collect()(0).getLong(0)
    assert(tri == 1L, s"expected exactly the {100,101,102} triangle, got $tri")

    // the cluster-scale closing path (wedge pre-aggregation + shuffle
    // semi join) must count the same triangles as the broadcast path.
    // Call the UNCACHED census directly: the query key serves the
    // per-(session, dir) scalar memo, which would short-circuit the
    // second path entirely
    spark.conf.set(GraphOps.BroadcastEdgeMaxRowsKey, "0")
    try {
      val triS = operators.GraphOps.triangleCountUncached(spark, dir)
      assert(triS == 1L, s"shuffle closing path diverged: $triS")
    } finally spark.conf.unset(GraphOps.BroadcastEdgeMaxRowsKey)

    val deg = operators.GraphOps.queries("graph_degree")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val off = operators.GraphOps.SupplierVertexOffset
    // edges: (1,off+7),(1,off+8),(2,off+9),(2,off+7)
    assert(deg.contains((1L, 2L, 0L)))        // customer 1: out 2
    assert(deg.contains((off + 7L, 0L, 2L)))  // supplier 7: in from both customers
  }

  test("graph_adamic_adar equals an independent self-join recompute at sf0.001") {
    // the query derives pairs by group-and-explode; this recomputes the
    // same declared semantics by the classic wedge SELF-JOIN and
    // compares the top-20 exactly (incl. the decimal-quantized weights)
    val got = operators.GraphOps.queries("graph_adamic_adar")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e = operators.GraphOps.edges(spark, sf001)
    val okSrc = e.groupBy(col("src")).agg(count(lit(1)).as("cdeg"))
      .filter(col("cdeg") <= operators.GraphOps.MaxCoCiteDegree && col("cdeg") >= 2)
      .select(col("src"), round(lit(1.0e9) / log(col("cdeg").cast("double")), 0)
        .cast("long").as("w9"))
    val ec = e.join(okSrc, Seq("src"))
    val exp = ec.as("a").join(ec.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .groupBy(col("a.dst").as("s1"), col("b.dst").as("s2"))
      .agg(sum(col("a.w9")).as("aa9"))
      .select(col("s1"), col("s2"),
        (expr("(aa9 + 50000) DIV 100000").cast("double") / 10000.0).as("aa_score"))
      .orderBy(desc("aa_score"), col("s1"), col("s2")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exp)
  }

  test("graph_katz_bounded equals a driver-side exact BigInt recompute at sf0.001") {
    val got = operators.GraphOps.queries("graph_katz_bounded")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e = operators.GraphOps.edges(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (e ++ e.map(_.swap)).distinct
    val verts = sym.map(_._1).distinct
    var x = verts.map(v => v -> BigInt(1000000)).toMap
    for (_ <- 1 to operators.GraphOps.KatzRounds) {
      val sums = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map(ed => x(ed._1)).sum
      }
      x = verts.map(v => v -> (BigInt(1000000) + sums.getOrElse(v, BigInt(0)) / 20)).toMap
    }
    val exp = x.map { case (v, xi) =>
      // mirror the query's integer-space HALF_UP: (x + 50) div 100
      v -> ((xi + 50) / 100).toDouble / 10000.0
    }
    assert(got.keySet == exp.keySet)
    got.foreach { case (v, kz) =>
      assert(kz == exp(v), s"vertex $v: $kz vs ${exp(v)}") }
  }
}

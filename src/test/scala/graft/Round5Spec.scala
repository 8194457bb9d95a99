package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: the sf0.01 Borůvka replica (VERDICT r4 #4 — the
  * only sub-sf0.01 verification left on the board), plus specs for the
  * operators and rewrites this round introduces. */
class Round5Spec extends SparkTestBase {

  def sf01 = "/root/testdata/sf0.01"

  /** driver-side Kruskal under the (w, a, b) total order — the forest
    * is unique given the total order, so set equality against the
    * engine's parallel Borůvka is the full check. */
  private def kruskalReplica(dir: String): Seq[(Long, Long, Long)] = {
    val off = operators.GraphOps.SupplierVertexOffset
    val wedges = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("a"), (col("l_suppkey") + off).as("b"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1000000L / r.getLong(2)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val px = parent.getOrElseUpdate(x, x)
      if (px == x) x else { val r = find(px); parent(x) = r; r }
    }
    wedges.sortBy(e => (e._3, e._1, e._2)).flatMap { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSeq
  }

  test("kTruss: planted clique survives, tails and bridges peel") {
    import spark.implicits._
    // 5-clique {1..5} (each edge in 3 triangles) + a triangle {6,7,8}
    // hanging off vertex 5 via bridge 5-6, + pendant path 8-9-10.
    // k=5 keeps ONLY the clique (support ≥ 3): the bridge closes no
    // triangle, the small triangle's edges have support 1, and
    // peeling cascades through the path.
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val extra = Seq((5L, 6L), (6L, 7L), (6L, 8L), (7L, 8L), (8L, 9L), (9L, 10L))
    val und = (clique ++ extra).toDF("a", "b")
    val got = operators.GraphOps.kTruss(und, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == clique.map { case (a, b) => (a, b, 3L) }.toSet)
    // k=3 keeps every triangle edge (support ≥ 1) and drops only the
    // triangle-free bridge and path
    val got3 = operators.GraphOps.kTruss(und, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == (clique ++ Seq((6L, 7L), (6L, 8L), (7L, 8L))).toSet)
  }

  test("ts_mann_kendall: bucketed S equals the brute-force pair join at sf0.001") {
    // the r5 week×value-bucket decomposition (A same-week + B
    // cross-week-same-bucket + C grid counting) must reproduce the
    // hours² definition EXACTLY — S is an integer, so equality is
    // bit-for-bit, not tolerance-based
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val hourly = Tables.events(spark, sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg((sum(col("value").cast(dec)) * 10000).cast("long").as("hu"))
    val a = hourly.select(col("event_type"), col("hour").as("ha"), col("hu").as("xa"))
    val b = hourly.select(col("event_type"), col("hour").as("hb"), col("hu").as("xb"))
    val brute = a.join(b, Seq("event_type")).filter(col("ha") < col("hb"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = operators.TimeSeriesOps.queries("ts_mann_kendall")(spark, sf001)
      .select(col("event_type"), col("s_stat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute)
  }

  test("multimodal_payload_entropy: empty documents excluded by declaration") {
    // ADVICE r4: on '' Spark's split yields [""] but DuckDB's
    // string_split yields [] — the declared convention (empty docs
    // absent) now has an explicit filter in BOTH engines and this
    // fixture exercises it
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "", "en", "web", 0L),
      (2L, "aabb", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = operators.MultimodalOps.queries("multimodal_payload_entropy")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1 absent; doc 2: n=4, two symbols ×2 → entropy 1.0 bit
    assert(got.toSeq == Seq((2L, 4L, 2L, 1.0)), s"got ${got.toSeq}")
  }

  test("pipeline_mixture_schedule: bucket-composed rank equals the naive window") {
    // VERDICT r4 #7: the rewritten shape (within-bucket row_number +
    // per-source boundary offsets) must produce IDENTICAL rows to the
    // low-cardinality per-source window it replaced
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val naive = Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n_s",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("doc_id"),
        expr("(2 * r - 1) * 1000000000000 DIV (2 * n_s)").as("pos"))
      .orderBy(col("pos"), col("source"), col("doc_id"))
      .limit(200)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = operators.TextOps.queries("pipeline_mixture_schedule")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naive)
  }

  test("graph_mst_boruvka: equals the driver-side Kruskal replica at sf0.01") {
    // 10× the Round4eSpec replica (VERDICT r4 #4): same check, the
    // sf the driver's correctness gate runs at — closing the one
    // verification that only existed at sf0.001
    val got = operators.GraphOps.queries("graph_mst_boruvka")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val kruskal = kruskalReplica(sf01).toSet
    assert(got == kruskal,
      s"forest sizes: got ${got.size}, kruskal ${kruskal.size}")
  }
}

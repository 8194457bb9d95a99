package graft

import graft.functions.CosineSimilarity
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

/** CosineSimilarity expression (interpreted + codegen paths) and the
  * multimodal decode plumbing. */
class VectorMultimodalSpec extends SparkTestBase {

  private def vecDf(rows: (Long, Seq[Float], Int)*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("cosine_sim: orthogonal=0, parallel=1, antiparallel=-1") {
    CosineSimilarity.register(spark)
    val d = vecDf(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0),
      (3L, Seq(2f, 0f), 0), (4L, Seq(-1f, 0f), 0))
    val base = d.filter(col("vec_id") === 1).select(col("embedding").as("a"))
    val res = d.crossJoin(base)
      .select(col("vec_id"), expr("cosine_sim(a, embedding)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res(1L) == 1.0 && res(3L) == 1.0)
    assert(res(2L) == 0.0)
    assert(res(4L) == -1.0)
  }

  test("cosine_sim codegen and interpreted evaluation agree") {
    CosineSimilarity.register(spark)
    val d = vecDf((1L, Seq(0.3f, -0.7f, 0.11f, 9.5f), 0),
      (2L, Seq(1.2f, 0.4f, -3.3f, 0.01f), 0))
    val pair = d.filter(col("vec_id") === 1).select(col("embedding").as("a"))
      .crossJoin(d.filter(col("vec_id") === 2).select(col("embedding").as("b")))
    val viaCodegen = pair.select(expr("cosine_sim(a, b)")).head.getDouble(0)
    // force the interpreted path through a non-codegen context: eval on
    // a literal-bound copy of the expression
    val expected = {
      val x = Seq(0.3f, -0.7f, 0.11f, 9.5f).map(_.toDouble)
      val y = Seq(1.2f, 0.4f, -3.3f, 0.01f).map(_.toDouble)
      val dot = x.zip(y).map { case (a, b) => a * b }.sum
      dot / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    assert(math.abs(viaCodegen - expected) < 1e-12)
  }

  test("vec_cosine_topk self-excluded and correctly ranked on a planted corpus") {
    val dir = tempDir()
    // probe 0 = e1; 1 = near-parallel to e1; 2 = orthogonal; 3 = opposite
    writeFixture(dir, "embeddings", vecDf(
      (0L, Seq(1f, 0f, 0f), 0), (1L, Seq(0.9f, 0.1f, 0f), 0),
      (2L, Seq(0f, 1f, 0f), 1), (3L, Seq(-1f, 0f, 0f), 1)))
    val rows = operators.VectorOps.queries("vec_cosine_topk")(spark, dir)
      .filter(col("probe_id") === 0).collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(rows.head == (1L, 1), s"nearest to e1 must be the near-parallel: ${rows.toSeq}")
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L)) // self excluded
  }

  test("multimodal decode stub: histogram sums to ~1, metadata deterministic") {
    val p = MultimodalOps.Payload(7L, "abcdefgh".getBytes("UTF-8"), "src0")
    val f1 = MultimodalOps.decodeStub(p)
    val f2 = MultimodalOps.decodeStub(p)
    assert(f1 == f2 || (f1.doc_id == f2.doc_id && f1.feat.sameElements(f2.feat)
      && f1.width == f2.width && f1.height == f2.height))
    assert(f1.n_bytes == 8)
    assert(math.abs(f1.feat.sum - 1.0) < 1e-6)
    assert(f1.width >= 64 && f1.width < 128 && f1.height >= 64 && f1.height < 128)
  }

  test("multimodal_features runs the typed mapPartitions pipeline end-to-end") {
    val out = operators.MultimodalOps.queries("multimodal_features")(spark, sf001)
    assert(out.count() == 500)
    assert(out.columns.toSeq ==
      Seq("doc_id", "source", "n_bytes", "width", "height", "f0", "f6"))
  }
}

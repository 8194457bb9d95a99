package graft.operators

import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** §2.11 multimodal columns: opaque binary payloads + typed metadata,
  * decode/feature-extract as partition-batched typed transforms.
  *
  * This container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (byte histogram + hash-derived fake dimensions —
  * clearly marked below). Everything around it is the real at-scale
  * plumbing and is what the tests exercise:
  *  - binary payload column with typed metadata columns alongside,
  *  - `mapPartitions` over a typed Dataset — the Scala analogue of
  *    `mapInPandas`: the decode function receives an iterator over a
  *    whole partition (batch shape), so per-batch setup (codec init,
  *    model load) amortizes across rows instead of paying per row,
  *  - fixed-width feature vector output with an explicit schema,
  *    partitioning preserved (no shuffle introduced by the transform).
  *
  * No oracle (mapPartitions is not SQL-expressible); driver records a
  * rows-only check and MultimodalSpec unit-tests the feature math.
  */
object MultimodalOps {

  /** input row: payload + metadata (the multimodal column pattern) */
  case class Payload(doc_id: Long, payload: Array[Byte], source: String)
  /** output row: decoded features, fixed width */
  case class Features(doc_id: Long, source: String, n_bytes: Int,
      width: Int, height: Int, feat: Array[Double])

  /** STUB decoder — stands in for image/audio decode (no codecs in
    * this container). Deterministic: byte histogram over 16 bins,
    * normalized; fake width/height derived from the payload hash. */
  def decodeStub(p: Payload): Features = {
    val bytes = p.payload
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1)
    val norm = hist.map(h => math.rint(h / n * 10000) / 10000)
    val h = java.util.Arrays.hashCode(bytes)
    Features(p.doc_id, p.source, bytes.length,
      width = 64 + (math.abs(h) % 64), height = 64 + (math.abs(h >> 8) % 64),
      feat = norm)
  }

  /** scan → typed payload → partition-batched decode: one iterator per
    * partition (mapInPandas analogue); codec init would go before
    * `it.map` */
  private def decoded(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as(Encoders.product[Payload])
      .mapPartitions(_.map(decodeStub))(Encoders.product[Features])
      .toDF()

  val queries: Map[String, QFn] = Map(
    // text bytes stand in for an image payload; the pipeline shape is
    // scan → mapPartitions(decode) → per-group aggregation
    "multimodal_features" -> ((s, d) => {
      decoded(s, d)
        .select(col("doc_id"), col("source"), col("n_bytes"),
          col("width"), col("height"),
          round(element_at(col("feat"), 1), 4).as("f0"),
          round(element_at(col("feat"), 7), 4).as("f6"))
        .orderBy(col("doc_id"))
    }),

    // per-source feature rollup of the decoded output — demonstrates
    // decode feeding a normal relational aggregation
    "multimodal_source_stats" -> ((s, d) => {
      decoded(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          round(avg(col("width")), 4).as("avg_width"))
        .orderBy(col("source"))
    }))

  /** intentionally empty: mapPartitions paths are not SQL-expressible;
    * the driver records rows-only checks and MultimodalSpec covers the
    * feature math. */
  val oracle: Map[String, String] = Map.empty
}

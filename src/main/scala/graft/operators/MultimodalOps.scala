package graft.operators

import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** §2.11 multimodal columns: opaque binary payloads + typed metadata,
  * decode/feature-extract as partition-batched typed transforms.
  *
  * Decoding is pluggable (see [[PayloadDecoders]]): binary PPM and
  * uncompressed 24-bit BMP are decoded FOR REAL in pure JVM code
  * (header dimensions + pixel luminance histogram); payloads in any
  * other format fall back to [[OpaqueDecoder]], a deterministic
  * byte-level stub standing in for codec-library formats (JPEG,
  * audio) this container cannot decode. The surrounding pipeline is
  * the real at-scale plumbing and is what the tests exercise:
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

  /** byte-level fallback decoder (see [[OpaqueDecoder]] — kept as a
    * named entry point for tests and callers that want the stub
    * explicitly) */
  def decodeStub(p: Payload): Features = OpaqueDecoder.decode(p)

  /** scan → typed payload → partition-batched decode: one iterator per
    * partition (mapInPandas analogue); per-batch setup (codec init,
    * model load) would go before `it.map`. Dispatches per payload via
    * magic-byte sniff — PPM/BMP decode for real, the rest hit the
    * opaque stub. */
  private def decoded(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as(Encoders.product[Payload])
      .mapPartitions(_.map(PayloadDecoders.decode))(Encoders.product[Features])
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

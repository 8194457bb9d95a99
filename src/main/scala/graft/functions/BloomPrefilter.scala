package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Explicit Bloom-filter semi-join pre-filtering — the shape Spark's
  * own runtime row-level filtering (InjectRuntimeFilter) applies
  * automatically when statistics justify it, exposed here as a
  * first-class operator building block so a pipeline can pin it
  * deterministically instead of hoping the optimizer fires.
  *
  * Both sides hash with the public `xxhash64` (the same hash family
  * the built-in rule uses), and the sketch is Spark's own
  * `util.sketch.BloomFilter` via the Catalyst `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions — no custom sketch code.
  *
  * The build side materializes on the driver (`head()`): ONE binary of
  * numBits/8 bytes (128 KiB at the default sizing below), exactly what
  * the built-in rule's scalar subquery materializes before broadcast.
  * The probe-side filter then ships with the task binaries as a
  * foldable literal — `BloomFilterMightContain` requires a constant or
  * scalar-subquery bloom argument by design.
  *
  * At 100 TB: the pre-filter drops non-matching probe rows BEFORE the
  * join shuffle, so the exchange carries only (true ∪ false-positive)
  * rows — for a 5%-selective build side that is a ~20× shuffle-volume
  * cut for one aggregate over the build keys. The trailing exact semi
  * join removes the false positives, so the composition is
  * semantically transparent (oracle: plain semi join).
  */
object BloomPrefilter {

  /** Build a bloom filter binary over `xxhash64(key)` of every row. */
  def bloomOf(df: DataFrame, key: Column, estItems: Long, numBits: Long): Array[Byte] = {
    val hashed = df.select(xxhash64(key).as("h"))
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(col("h")),
      Literal(estItems), Literal(numBits)).toAggregateExpression()
    hashed.select(GraftSqlShim.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe-side predicate: `might_contain(<bloom literal>, xxhash64(key))`. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftSqlShim.expression(xxhash64(key))))
}

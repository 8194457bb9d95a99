package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Static schemas for the driver-generated testdata tables (see
  * FIXTURES.md — schemas were read from the parquet footers, not
  * inferred). Explicit `StructType`s everywhere so Spark and the
  * DuckDB oracle agree on types: schema drift is a correctness bug
  * under the hash-compare harness, not a style issue.
  *
  * Column pruning + predicate pushdown happen at the parquet scan —
  * queries should `.select`/`.filter` as early as possible so the
  * vectorized reader only materializes what is needed.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.ts arrives as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, ntz) in others (the driver
    * regenerated the tables between rounds with a different writer).
    * Both are INT64 physically, so the raw column is read as a plain
    * long and [[table]] rescales it to µs based on the file's OWN
    * logical type — probed once per (session, dir) from the footer
    * via Spark's schema inference (under
    * spark.sql.legacy.parquet.nanosAsLong=true, set by
    * Verify/Bench/tests, a NANOS column infers as LongType while a
    * MICROS column infers as a timestamp type). DuckDB applies the
    * same ns→µs truncation when IT reads a NANOS file, so the two
    * engines agree in either generation. */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema,
    "nation" -> nationSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema,
    "events" -> eventsRawSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** per-(session, dir) memo of the events.ts unit probe: true when
    * the file's logical type is TIMESTAMP(NANOS). Footer-only read —
    * no Spark job. */
  private val tsNanosCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Boolean]

  private def eventsTsIsNanos(spark: SparkSession, sfDir: String): Boolean =
    tsNanosCache.getOrElseUpdate((spark, sfDir), {
      val inferred = spark.read.parquet(s"$sfDir/events.parquet")
        .schema("ts").dataType
      inferred == LongType // nanosAsLong renders NANOS as a bare long
    })

  /** Load one testdata table with its static schema. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      val micros =
        if (eventsTsIsNanos(spark, sfDir)) expr("ts div 1000") else expr("ts")
      raw.withColumn("ts", timestamp_micros(micros))
    } else raw
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

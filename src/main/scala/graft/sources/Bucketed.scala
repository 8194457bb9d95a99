package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join path for repeated
  * large⋈large joins at scale.
  *
  * Writing both join sides bucketed (same key, same bucket count)
  * lets Spark plan the join with ZERO Exchange: each task reads the
  * matching bucket files from both tables. On a 1000-executor cluster
  * joining two 10 TB tables repeatedly, this converts every join from
  * a full 2×10 TB shuffle into a local merge — the single biggest
  * at-scale win for a star schema whose fact table is joined on the
  * same key by many queries. BucketingSpec proves the property by
  * asserting the physical plan is Exchange-free.
  */
object Bucketed {

  /** write `df` as a bucketed (+ optionally sorted) managed table */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** bucket-join two pre-bucketed tables on their bucket keys —
    * plans with no Exchange when bucket counts align. The right side
    * is aliased so self-joins (left == right) resolve to a genuine
    * two-sided equi-join instead of an ambiguous same-relation
    * reference. */
  def bucketJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left).alias("bj_l")
    val r = spark.table(right).alias("bj_r")
    l.join(r, org.apache.spark.sql.functions.col(s"bj_l.$leftKey") ===
      org.apache.spark.sql.functions.col(s"bj_r.$rightKey"))
  }

  /** EXCHANGE-FREE keyed upsert of two pre-bucketed snapshots — the
    * at-scale form of `pipeline_upsert_snapshot`'s MERGE. The
    * union + per-key row_number merge cannot ride bucketing (a Union's
    * output partitioning is unknown to Catalyst even when both inputs
    * are bucketed on the key), but a FULL OUTER bucket join with
    * delta-wins column coalesce is the same latest-row-wins semantics
    * whenever each side holds at most one row per key (true of
    * snapshot + delta batches by definition) — and on aligned bucket
    * counts (+ sortBy) it plans as a zero-Exchange, zero-Sort local
    * merge per bucket. A weekly 10 TB refresh becomes an append-only
    * bucket read instead of a full shuffle. BucketingSpec proves both
    * the plan property and row equality with the union+window
    * reference. */
  def upsertBucketed(spark: SparkSession, base: String, delta: String,
      key: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col}
    val cols = spark.table(base).columns.toSeq
    spark.table(base).alias("ub_b")
      .join(spark.table(delta).alias("ub_d"),
        col(s"ub_b.$key") === col(s"ub_d.$key"), "full_outer")
      .select(cols.map(c =>
        coalesce(col(s"ub_d.$c"), col(s"ub_b.$c")).as(c)): _*)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: where do diag_column_profile's seconds go?
  * Times the multi-count-distinct aggregate in isolation and variants.
  * Not part of the driver contract. */
object DevColProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(s"$d/orders.parquet")
    o.count()
    def t(name: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }.minBy(_._1) match {
        case (dt, n) => println(f"[t] $name%-38s $dt%7.3f s (rows=$n)")
      }
    }
    t("scan count")(o.count())
    t("1 countDistinct")(o.agg(countDistinct(col("o_orderkey"))).count())
    t("2 countDistinct")(o.agg(countDistinct(col("o_orderkey")),
      countDistinct(col("o_custkey"))).count())
    t("6 countDistinct")(o.agg(countDistinct(col("o_orderkey")),
      countDistinct(col("o_custkey")), countDistinct(col("o_orderstatus")),
      countDistinct(col("o_totalprice")), countDistinct(col("o_orderdate")),
      countDistinct(col("o_orderpriority"))).count())
    t("full diag agg")(operators.MiningOps.queries("diag_column_profile")(spark, d).count())
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    t("6 cd + count(1)")(o.agg(count(lit(1)),
      cols.map(c => countDistinct(col(c))): _*).count())
    t("6 cd + 6 count(col)")(o.agg(count(lit(1)),
      cols.map(c => countDistinct(col(c))) ++
      cols.map(c => count(col(c))): _*).count())
    t("6 cd + 12 minmax")(o.agg(count(lit(1)),
      cols.map(c => countDistinct(col(c))) ++
      cols.flatMap(c => Seq(min(col(c)), max(col(c)))): _*).count())
    t("simple aggs only")(o.agg(count(lit(1)),
      cols.map(c => count(col(c))) ++
      cols.flatMap(c => Seq(min(col(c)), max(col(c)))): _*).count())
    t("two-agg split crossjoin")({
      val cd = o.agg(cols.head match { case h => countDistinct(col(h)) },
        cols.tail.map(c => countDistinct(col(c))): _*)
      val simple = o.agg(count(lit(1)),
        cols.map(c => count(col(c))) ++
        cols.flatMap(c => Seq(min(col(c)), max(col(c)))): _*)
      simple.crossJoin(cd).count()
    })
    t("Tables.orders agg")( {
      val ot = Tables.orders(spark, d)
      ot.agg(count(lit(1)),
        cols.map(c => countDistinct(col(c))) ++
        cols.flatMap(c => Seq(min(col(c)), max(col(c)))) ++
        cols.map(c => count(col(c))): _*).count()
    })
    t("agg + str wrappers")( {
      val ot = Tables.orders(spark, d)
      def str(c: String, agged: org.apache.spark.sql.Column) =
        if (c == "o_orderdate") date_format(agged, "yyyy-MM-dd HH:mm:ss")
        else agged.cast("string")
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_nn"),
          countDistinct(col(c)).as(s"${c}_nd"),
          str(c, min(col(c))).as(s"${c}_mn"),
          str(c, max(col(c))).as(s"${c}_mx"))
      }
      ot.agg(aggs.head, aggs.tail: _*).count()
    })
    t("agg + stack + order")( {
      val ot = Tables.orders(spark, d)
      def str(c: String, agged: org.apache.spark.sql.Column) =
        if (c == "o_orderdate") date_format(agged, "yyyy-MM-dd HH:mm:ss")
        else agged.cast("string")
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_nn"),
          countDistinct(col(c)).as(s"${c}_nd"),
          str(c, min(col(c))).as(s"${c}_mn"),
          str(c, max(col(c))).as(s"${c}_mx"))
      }
      val one = ot.agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map { c =>
        s"'$c', ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx"
      }.mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stacked) AS (column_name, n_nonnull, n_distinct, min_s, max_s)"),
        col("n_rows"))
        .select(col("column_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).as("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy(col("column_name")).count()
    })
    t("REAL 6 cd only (collect)")( {
      o.agg(cols.head match { case h => countDistinct(col(h)) },
        cols.tail.map(c => countDistinct(col(c))): _*).collect().length.toLong
    })
    t("REAL simple only (collect)")( {
      o.agg(count(lit(1)),
        cols.map(c => count(col(c))) ++
        cols.flatMap(c => Seq(min(col(c)), max(col(c)))): _*).collect().length.toLong
    })
    t("REAL split crossjoin (collect)")( {
      val cd = o.agg(cols.head match { case h => countDistinct(col(h)) },
        cols.tail.map(c => countDistinct(col(c))): _*)
      val simple = o.agg(count(lit(1)),
        cols.map(c => count(col(c))) ++
        cols.flatMap(c => Seq(min(col(c)), max(col(c)))): _*)
      simple.crossJoin(cd).collect().length.toLong
    })
    t("6 separate group-by distincts")(
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").map { c =>
        o.select(col(c)).distinct().count()
      }.sum)
    spark.stop()
  }
}

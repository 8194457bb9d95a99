package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._

/** Planted-duplicate tests for the dedup family (the real corpus has
  * zero exact dupes — FIXTURES.md — so recall must be pinned here)
  * plus text-operator math checks. */
class DedupTextSpec extends SparkTestBase {

  private def docsFixture(): String = {
    val dir = tempDir()
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val other = "completely different words about spark catalyst tungsten shuffles parquet"
    writeFixture(dir, "documents", Seq(
      (1L, base, "en", "src0", base.length.toLong),
      (2L, base, "en", "src1", base.length.toLong),   // exact dup of 1
      (3L, near, "en", "src2", near.length.toLong),   // near dup of 1
      (4L, other, "en", "src3", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir
  }

  test("dedup_exact finds planted duplicate group, empty on real corpus") {
    val dir = docsFixture()
    val rows = operators.DedupOps.queries("dedup_exact")(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 2L)      // group size
    assert(rows(0).getLong(2) == 1L)      // first_doc
    // graceful empty on the real corpus
    assert(operators.DedupOps.queries("dedup_exact")(spark, sf001).count() == 0)
  }

  test("dedup_near_minhash recovers planted exact+near duplicates") {
    val dir = docsFixture()
    val pairs = operators.DedupOps.queries("dedup_near_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missed: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"near dup pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"false positive: $pairs")
  }

  test("dedup_simhash: identical docs at hamming 0, distinct docs excluded") {
    val dir = docsFixture()
    val rows = operators.DedupOps.queries("dedup_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    val exact = rows.find(r => r._1 == 1L && r._2 == 2L)
    assert(exact.exists(_._3 == 0L), s"identical docs not at hamming 0: ${rows.toSeq}")
    assert(!rows.exists(r => r._2 == 4L || r._1 == 4L), s"false positive: ${rows.toSeq}")
  }

  test("dedup_cluster_lsh: full-corpus LSH clustering matches the planted structure") {
    val dir = docsFixture()
    val rows = operators.DedupOps.queries("dedup_cluster_lsh")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc labeled; dup group {1,2,3} under canonical 1, doc 4 alone
    assert(rows(1L) == 1L && rows(2L) == 1L && rows(3L) == 1L)
    assert(rows(4L) == 4L)
  }

  test("dedup_cluster_canonical groups near-dups under the min doc_id") {
    val dir = docsFixture()
    val rows = operators.DedupOps.queries("dedup_cluster_canonical")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1/2 (exact) and 3 (near) share bigrams → one cluster with
    // canonical 1; doc 4 is a singleton canonicalized to itself
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L), rows.toString)
  }

  test("pipeline_contamination_check flags a test-split doc leaked from train") {
    val dir = tempDir()
    import spark.implicits._
    // bucket = (doc_id * 61) % 100: doc 1 → 61 (train), doc 13 → 93
    // (test), doc 2 → 22 (train). Doc 13 duplicates doc 1's text.
    val base = "the quick brown fox jumps over the lazy dog"
    writeFixture(dir, "documents", Seq(
      (1L, base, "en", "s0", base.length.toLong),
      (13L, base, "en", "s1", base.length.toLong),
      (2L, "unrelated words entirely", "en", "s2", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = operators.DedupOps.queries("pipeline_contamination_check")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((13L, 1L)), s"expected the planted leak: $rows")
    // real corpus: zero exact dupes → zero contamination
    assert(operators.DedupOps.queries("pipeline_contamination_check")(spark, sf001)
      .count() == 0)
  }

  test("Md5Hash basis is engine-identical (values pinned against DuckDB)") {
    import graft.functions.Md5Hash
    // DuckDB: SELECT CAST(('0x' || substr(md5('hello'),1,15)) AS BIGINT)
    assert(Md5Hash.hash60("hello") == 419982666956583591L)
    // DuckDB: (CAST(a AS HUGEINT) * h + b) % 2^63 on the same constants
    assert(((4611686018427387903L * 1152921504606846975L + 99L) &
      Long.MaxValue) == 3458764513820541028L)
    // constants are non-negative and the multiplier odd — the
    // preconditions that make JVM wraparound equal HUGEINT mod
    (0 until 140).foreach { i =>
      assert(Md5Hash.permA(i) > 0 && (Md5Hash.permA(i) & 1L) == 1L)
      assert(Md5Hash.permB(i) >= 0L)
      assert(Md5Hash.perm(Md5Hash.hash60(s"t$i"), i) >= 0L)
    }
  }

  test("MinHashAgg signature estimates Jaccard on planted sets") {
    val a = (1 to 100).map(i => s"tok$i")
    val b = (21 to 120).map(i => s"tok$i") // |∩|=80, |∪|=120 → J=0.667
    val agg = new MinHashAgg(128)
    def sig(ts: Seq[String]) = ts.foldLeft(agg.zero)((buf, t) => agg.reduce(buf, t))
    val est = MinHashAgg.estimate(sig(a), sig(b))
    assert(math.abs(est - 80.0 / 120.0) < 0.15, s"estimate off: $est")
    // identical sets → identical signatures
    assert(MinHashAgg.estimate(sig(a), sig(a)) == 1.0)
  }

  test("text_quality_score math on a hand doc") {
    val dir = tempDir()
    import spark.implicits._
    // 4 tokens, no stopword list interference (all terms tie at count 1
    // → top-10 picks lexicographic 10, all 4 are stopwords here)
    writeFixture(dir, "documents",
      Seq((1L, "aa bb cc dd", "en", "s", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = operators.TextOps.queries("text_quality_score")(spark, dir).collect()(0)
    assert(r.getLong(1) == 4L)                   // n_tokens
    assert(r.getDouble(2) == 1.0)                // stop_ratio: all 4 in top-10
    assert(r.getDouble(3) == 2.0)                // avg token length
    assert(r.getDouble(4) == 0.0)                // quality = 0.04 * (1-1) = 0
  }

  test("tfidf: shared term scores 0, unique term wins") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "shared shared unique1", "en", "s", 21L),
      (2L, "shared unique2 unique2", "en", "s", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val top = operators.TextOps.queries("text_tfidf_topterms")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top == Map(1L -> "unique1", 2L -> "unique2"))
  }

  test("text_readability: hand doc gives exact counts and formula value") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (1L, "aa bb cc", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = operators.TextOps.queries("text_readability")(spark, dir).collect()(0)
    // words 3, vowel groups 1 ("aa"), chars 8
    assert(r.getString(0) == "en" && r.getLong(1) == 1L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.3333 && r.getDouble(4) == 2.6667)
    assert(r.getDouble(5) == 178.635, s"got ${r.getDouble(5)}")
  }

  test("scalar_url_extract parses back what it synthesized") {
    val dir = tempDir()
    import spark.implicits._
    writeFixture(dir, "documents", Seq(
      (7L, "x", "fr", "src3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = operators.Scalars.queries("scalar_url_extract")(spark, dir).collect()(0)
    assert(r.getString(1) == "https://src3.example.com/docs/7?lang=fr&v=2")
    assert(r.getString(2) == "src3.example.com")
    assert(r.getString(3) == "/docs/7")
    assert(r.getString(4) == "fr")
  }

  test("JaroWinkler matches the DuckDB reference values it is pinned to") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String) =
      JaroWinkler.jw(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // probed from DuckDB 1.0 jaro_winkler_similarity (see Scaladoc)
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("crate", "trace") == 0.7333333333333334)   // no common prefix
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("ab", "abcdefgh") == 0.8)
    assert(jw("aaaaaaaaab", "aaaaaaaaba") == 0.98)
    assert(jw("aaabbbb", "aaacccc") == 0.6190476190476191) // below boost gate
    assert(jw("abcxxx", "bcaxxx") == 0.9444444444444445) // odd mismatches floor: t=1
    assert(jw("abcdefgh", "badcfehg") == 0.8333333333333334)
    // the registered expression agrees with the static helper AND
    // survives codegen (two calls in one projection span)
    JaroWinkler.register(spark)
    import spark.implicits._
    val r = Seq(("martha", "marhta")).toDF("x", "y")
      .selectExpr("jaro_winkler(x, y) AS a", "jaro_winkler(y, x) AS b")
      .collect()(0)
    assert(r.getDouble(0) == 0.9611111111111111 && r.getDouble(1) == r.getDouble(0))
  }
}

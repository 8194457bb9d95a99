package graft.functions

/** Engine-identical hashing basis for the sketch family (MinHash,
  * Count-Min, SimHash): base hash = the first 15 hex digits of
  * md5(term) read as a 60-bit integer, then fixed affine permutations
  * `(a·h + b) mod 2^63` with splitmix64-derived constants.
  *
  * Why md5 and not murmur: md5 is the ONE hash both Spark
  * (`md5()` / `conv`) and DuckDB (`md5()` / hex cast) expose with
  * byte-identical semantics, so every sketch built on this basis is
  * ORACLE-CHECKABLE — the DuckDB side recomputes the exact signature
  * with `CAST(('0x' || substr(md5(t),1,15)) AS BIGINT)` and HUGEINT
  * affine arithmetic (`(a·h+b) % 2^63` over a non-negative product
  * equals the JVM's wraparound `(a*h+b) & Long.MaxValue` because
  * 2^63 divides 2^64). The winnowing fingerprints (TextOps) proved
  * the recipe; this object centralizes it for the aggregators.
  *
  * Cost at scale: ONE md5 per term (~100 ns), then k multiply-adds —
  * cheaper than the k independent string hashes the murmur basis
  * paid, and the constants are pure data, so signatures are
  * deterministic across JVMs, executors, and engines.
  */
object Md5Hash {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** first 15 hex digits of md5(term) as a 60-bit non-negative Long —
    * bytes 0..6 in full plus the high nibble of byte 7, identical to
    * parsing the hex-string prefix. */
  def hash60(term: String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 52) | ((b(1) & 0xffL) << 44) | ((b(2) & 0xffL) << 36) |
      ((b(3) & 0xffL) << 28) | ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) |
      ((b(6) & 0xffL) << 4) | ((b(7) & 0xf0L) >>> 4)
  }

  /** splitmix64 finalizer — the constant generator, not a per-row hash */
  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** multiplier for permutation i: odd, in [1, 2^62) so the HUGEINT
    * product stays non-negative (DuckDB's % keeps the dividend sign —
    * non-negative inputs make both engines' mod agree) */
  def permA(i: Int): Long = (splitmix(2L * i) & ((1L << 62) - 1)) | 1L

  /** addend for permutation i: in [0, 2^62) */
  def permB(i: Int): Long = splitmix(2L * i + 1) & ((1L << 62) - 1)

  /** affine permutation mod 2^63: JVM wraparound masked to 63 bits ==
    * exact (a·h+b) mod 2^63 because 2^63 | 2^64 */
  def perm(h: Long, i: Int): Long = (permA(i) * h + permB(i)) & Long.MaxValue

  // ---- SQL splices (oracle side mirrors the arithmetic exactly) ----

  /** Spark SQL expression for hash60 over a string column/expr */
  def sparkHash60(col: String): String =
    s"cast(conv(substr(md5($col), 1, 15), 16, 10) as bigint)"

  /** DuckDB expression for hash60 over a string column/expr */
  def duckHash60(col: String): String =
    s"CAST(('0x' || substr(md5($col), 1, 15)) AS BIGINT)"

  /** DuckDB expression for perm(h, i) given SQL exprs for a, b, h */
  def duckPerm(a: String, b: String, h: String): String =
    s"CAST((CAST($a AS HUGEINT) * $h + $b) % 9223372036854775808 AS BIGINT)"

  /** DuckDB VALUES rows `(i, a_i, b_i)` for permutations base until
    * base+k (row index stays 0-based) — splice as
    * `seeds(i, a, b) AS (VALUES $x)`. `base` separates sketch families
    * (MinHash at 0, Count-Min at [[CmSeedBase]]) so no two sketches
    * share a permutation. */
  def duckSeedRows(k: Int, base: Int = 0): String =
    (0 until k).map(i => s"(${i}, ${permA(base + i)}, ${permB(base + i)})").mkString(", ")

  /** permutation-index offset for the Count-Min rows */
  val CmSeedBase = 100
}

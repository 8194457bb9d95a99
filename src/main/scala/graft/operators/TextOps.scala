package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** §2.11 text analysis + the training-data-pipeline text operators:
  * token counting, TF-IDF, language-ID (n-gram/token-profile
  * heuristic), quality scoring, document fingerprinting.
  *
  * All token pipelines are explode → hash-aggregate: the explosion is
  * map-side (no shuffle of raw text), the shuffle carries (term,count)
  * pairs. Ratios/averages are built from exact integer sums so the
  * scores hash-match DuckDB bit-for-bit.
  */
object TextOps {

  /** winnowing parameters (text_winnow_fingerprint): character k-gram
    * size and window width — shared with the oracle SQL so the two
    * cannot drift. Noise threshold k = 8, guarantee threshold
    * t = k + w − 1 = 11: any shared substring of ≥ 11 chars yields a
    * shared fingerprint. */
  val WinnowK = 8
  val WinnowW = 4

  /** winnowing fingerprint arrays (doc_id, fps: sorted distinct
    * bigints) — shared by text_winnow_fingerprint and
    * DedupOps.dedup_winnow_pairs. One self-protecting per-row
    * expression, no UDF, no shuffle.
    *
    * EVALUATION-COUNT DISCIPLINE: the lowered text and the k-gram hash
    * array are bound as LAMBDA VARIABLES over one-element array
    * wrappers (`transform(array(x), v -> ...)`), not as projection
    * aliases. A projection alias is only computed once if Catalyst
    * keeps the Project boundary — and CollapseProject WILL inline a
    * single-referenced alias into a consumer (e.g. `explode(fps)` in
    * dedup_winnow_pairs), after which `slice(hs, j, w)` re-evaluates
    * the whole md5 transform per WINDOW and `substr(t, i, k)`
    * re-lowers the whole document per K-GRAM — the measured
    * O(len²·md5) blow-up (single task pinned >7 min at sf0.1; same
    * pathology class as pipeline_clean_corpus's barrier note). A
    * lambda variable is evaluated exactly once per element by
    * construction, so the cost is O(len·w) per document regardless of
    * how the optimizer collapses the surrounding projections — the
    * guarantee lives in the expression, not in plan shape. */
  def winnowFpArrays(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    winnowFpArrays(s, d, WinnowK, WinnowW)

  /** (k, w)-parameterized variant (r9): `pipeline_decontaminate` runs
    * the SAME winnowing chain at a LONGER gram (k=16) so incidental
    * vocabulary overlap cannot fire — the near-dup default (k=8)
    * matches every doc pair on this corpus's shared vocabulary, which
    * is exactly why production decontamination uses long n-grams. */
  def winnowFpArrays(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    // COMPUTE FAN-OUT: the per-doc fingerprint chain is interpreted
    // (higher-order functions never codegen) at ~1.5 ms per document —
    // the dominant cost of every winnow consumer — so it must run at
    // full cluster width. Upstream scan parallelism cannot be trusted
    // for that: split COUNT ≠ effective parallelism (a single-row-group
    // parquet file yields 32 byte-range splits of which one produces
    // every row — measured 7.5 s single-task at sf0.1 vs sub-second
    // fanned out). The explicit doc_id repartition pins the width, and
    // it is NOT an extra cost class: the posting stage downstream
    // already shuffles ~290 (fp, doc, n_fp) rows ≈ 7 KB per doc, more
    // than the ~0.3 KB of raw text this exchange carries.
    winnowFpsOf(
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
      k, w)
  }

  /** the fingerprint chain over ANY (doc_id, text)-shaped DataFrame —
    * batch or a streaming micro-batch (the streaming decontamination
    * sink screens each batch through this; see
    * [[graft.streaming.StreamPort.decontaminateSink]]). Callers wanting
    * full-width evaluation repartition BEFORE calling (the parquet
    * split-count caveat above). */
  def winnowFpsOf(docs: org.apache.spark.sql.DataFrame, k: Int, w: Int)
      : org.apache.spark.sql.DataFrame = {
    docs
      .filter(length(lower(col("text"))) >= k + w - 1)
      .select(col("doc_id"), expr(
        s"""element_at(transform(array(lower(text)), t ->
           |  element_at(transform(array(
           |      transform(sequence(1, length(t) - ${k - 1}),
           |        i -> cast(conv(substr(md5(substr(t, i, $k)), 1, 15), 16, 10)
           |                  as bigint))),
           |    hs -> array_sort(array_distinct(
           |      transform(sequence(1, size(hs) - ${w - 1}),
           |        j -> array_min(slice(hs, j, $w)))))), 1)), 1)""".stripMargin)
        .as("fps"))
      // AGGREGATE BARRIER (doc_id is unique; max of one row is the
      // identity): a consumer that explodes `fps` gets an inferred
      // `size(fps) > 0 AND isnotnull(fps)` predicate from
      // InferFiltersFromGenerate, and predicate pushdown carries that
      // filter — with the WHOLE fingerprint chain inlined, evaluated
      // twice per doc — through the repartition down to the scan side,
      // exactly the single-task stage the fan-out exists to avoid
      // (measured: 6.5 s scan-side filter at sf0.1). Predicates cannot
      // cross an Aggregate whose output they reference, and the
      // groupBy rides the doc_id hash partitioning just installed, so
      // the barrier adds NO exchange — the chain evaluates exactly
      // once per doc, at full width, in the partial-agg projection.
      .groupBy(col("doc_id")).agg(max(col("fps")).as("fps"))
  }

  /** DuckDB CTE chain ending at `f` = (doc_id, fps) — the oracle twin
    * of [[winnowFpArrays]] (k-gram hash = first 15 md5 hex digits as a
    * 60-bit int, engine-identical). Splice as `WITH $winnowFpsSqlCtes,
    * ...`. */
  def winnowFpsSqlCtes: String = winnowFpsSqlCtes(WinnowK, WinnowW)

  /** (k, w)-parameterized oracle twin of the parameterized
    * [[winnowFpArrays]] */
  def winnowFpsSqlCtes(k: Int, w: Int): String =
    s"""base AS (
       |  SELECT doc_id, lower(text) AS t FROM documents
       |  WHERE length(lower(text)) >= ${k + w - 1}),
       |h AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(t) - ${k - 2}),
       |      i -> CAST(('0x' || substr(md5(substr(t, i, $k)), 1, 15))
       |           AS BIGINT)) AS hs
       |  FROM base),
       |f AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(
       |      list_transform(range(1, len(hs) - ${w - 2}),
       |        j -> list_min(list_slice(hs, j, j + ${w - 1}))))) AS fps
       |  FROM h)""".stripMargin

  /** minimum bigram support for text_collocations_pmi. */
  val CollocMinSupport = 5

  /** the n-gram language-id prediction table (doc_id, pred_lang,
    * hits, true_lang) — shared by text_langid_ngram and its confusion
    * audit. Per-language top-20 term profiles, per-doc hit counts,
    * argmax with (hits desc, lang) total tie order. */
  private def langidPredictions(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("term"))
    val lt = tok.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("c"))
    val wTop = Window.partitionBy(col("lang")).orderBy(desc("c"), asc("term"))
    val top20 = lt.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 20).select(col("lang").as("prof_lang"), col("term"))
    val dt = tok.select(col("doc_id"), col("term")).distinct()
    val hits = dt.join(broadcast(top20), "term")
      .groupBy(col("doc_id"), col("prof_lang")).agg(count(lit(1)).as("hits"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(desc("hits"), asc("prof_lang"))
    val best = hits.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
    docs.select(col("doc_id"), col("lang").as("true_lang"))
      .join(best, "doc_id")
      .select(col("doc_id"), col("prof_lang").as("pred_lang"), col("hits"),
        col("true_lang"))
  }

  /** per-stratum sample size for sample_bottomk_per_group. */
  val BottomKSample = 5

  /** bucket count for the text_hash_features hashing trick. */
  val HashFeatureBuckets = 64

  val queries: Map[String, QFn] = Map(

    // collocation extraction: top-30 adjacent-token bigrams by
    // pointwise mutual information — the multiword-expression detector
    // ("new york"-type units) every tokenizer-vocabulary build runs.
    // PMI = ln(p(ab)/(p(a)p(b))) over corpus-wide counts; a support
    // floor drops the hapax pairs whose PMI is pure noise. Shape: the
    // bigram and unigram counts are two hash aggs (shuffle ∝ distinct
    // grams, never corpus size); the two token totals ride a bounded
    // per-doc aggregate (no second explode); the unigram join runs on
    // the SUPPORT-FILTERED bigram table (≤ distinct surviving pairs);
    // totals broadcast back as scalars. The pmi double evaluates
    // left-associated identically in both engines and ranks ROUNDED
    // (house rule). Tokens never contain spaces (the split
    // convention), so (w1, w2) is loss-free.
    "text_collocations_pmi" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(split(col("text"), " ").as("ts"))
      val uni = toks.select(explode(col("ts")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = toks.agg(
        sum(size(col("ts")).cast("long")).as("n1"),
        sum(greatest(size(col("ts")) - 1, lit(0)).cast("long")).as("n2"))
      val bg = toks.select(explode(expr(
        """IF(size(ts) < 2, array(),
          |  zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1),
          |    (a, b) -> struct(a AS w1, b AS w2)))""".stripMargin)).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= CollocMinSupport)
      val dbl = org.apache.spark.sql.types.DoubleType
      bg.join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("co"),
          r4(log(col("co").cast(dbl) * col("n1") * col("n1") /
            (col("n2").cast(dbl) * col("c1") * col("c2")))).as("pmi"))
        .orderBy(desc("pmi"), col("w1"), col("w2"))
        .limit(30)
    }),

    // the hashing trick, audited: every token maps to one of 64
    // feature buckets on the md5 basis (the fixed-dimensional text
    // featurization that needs NO vocabulary — the classic scale
    // move when the term universe won't fit a dictionary), and the
    // query reports per-bucket occupancy: token occurrences, distinct
    // terms folded in (the collision count feature hashing trades
    // away), and occurrence share. One explode + one bounded hash agg
    // (64 groups); distinct-term state ∝ vocabulary, the same cost an
    // exact vocabulary build pays.
    "text_hash_features" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .select((expr(graft.functions.Md5Hash.sparkHash60("term"))
          % HashFeatureBuckets).cast("int").as("bucket"), col("term"))
      val per = tok.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("term")).as("n_terms"))
      per.crossJoin(broadcast(per.agg(sum(col("n_tokens")).as("tt"))))
        .select(col("bucket"), col("n_tokens"), col("n_terms"),
          r4(col("n_tokens").cast("double") / col("tt")).as("token_share"))
        .orderBy(col("bucket"))
    }),

    "text_tokenize_counts" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("term"))
        .limit(50)
    }),

    "text_tfidf_topterms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df_ = tok.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      // rank on the ROUNDED score so a last-ulp ln() difference between
      // engines cannot flip the argmax
      val scored = tf.join(df_, "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4).as("tfidf"))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), asc("term"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"))
    }),

    "text_lang_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          r4(sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // token-profile language ID: each language's 20 most frequent
    // terms form its profile; a document is classified to the profile
    // it overlaps most (ties → lexicographically first lang)
    "text_langid_ngram" -> ((s, d) =>
      langidPredictions(s, d).orderBy(col("doc_id"))),

    // confusion matrix of the n-gram language identifier against the
    // labeled lang column, with per-cell recall — the accuracy report
    // that turns a heuristic into a trusted pipeline gate ("which
    // language pairs does it confuse?"). Reuses the langid derivation
    // verbatim; the matrix aggregate is bounded by langs² and the
    // per-true-language totals broadcast back.
    "text_langid_confusion" -> ((s, d) => {
      val m = langidPredictions(s, d)
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val tt = m.groupBy(col("true_lang")).agg(sum(col("n")).as("tn"))
      m.join(broadcast(tt), Seq("true_lang"))
        .select(col("true_lang"), col("pred_lang"), col("n"),
          r4(col("n").cast("double") / col("tn")).as("recall"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }),

    // Cohen's kappa between the langid heuristic and the gold label —
    // the CHANCE-CORRECTED single number over the same confusion
    // matrix text_langid_confusion reports cell-by-cell (95% raw
    // accuracy means nothing when 95% of the corpus is one language;
    // kappa subtracts that). Exact until the close: the matrix, both
    // marginals, and Σ row·col (DECIMAL(38,0)/HUGEINT — marginal
    // products square the corpus size) are integers; the degenerate
    // pe = 1 case is caught by the EXACT integer compare pp = N², not
    // a float test, and reads kappa = 0 by declared convention. All
    // aggregates bounded by langs².
    "text_langid_kappa" -> ((s, d) => {
      val dec38 = DecimalType(38, 0)
      val m = langidPredictions(s, d)
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val rowt = m.groupBy(col("true_lang").as("l")).agg(sum(col("n")).as("rn"))
      val colt = m.groupBy(col("pred_lang").as("l")).agg(sum(col("n")).as("cn"))
      val pe = rowt.join(colt, Seq("l"))
        .agg(coalesce(sum(col("rn").cast(dec38) * col("cn").cast(dec38)),
          lit(0).cast(dec38)).as("pp"))
      m.agg(sum(col("n")).as("nn"),
          coalesce(sum(when(col("true_lang") === col("pred_lang"), col("n"))),
            lit(0L)).as("diag"))
        .crossJoin(broadcast(pe))
        .withColumn("po", col("diag").cast(DoubleType) / col("nn"))
        .withColumn("pev", col("pp").cast(DoubleType) /
          (col("nn").cast(DoubleType) * col("nn")))
        .select(col("nn").as("n_docs"), r4(col("po")).as("accuracy"),
          r4(col("pev")).as("expected_agreement"),
          r4(when(col("pp") === col("nn").cast(dec38) * col("nn").cast(dec38),
            lit(0.0)).otherwise(
            (col("po") - col("pev")) / (lit(1.0) - col("pev")))).as("kappa"))
    }),

    // quality score from exact integer counts: token count, stopword
    // ratio (top-10 global terms), average token length
    "text_quality_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val stop = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("term")).limit(10)
        .select(col("term"), lit(1).as("is_stop"))
      val st = tok.join(broadcast(stop), Seq("term"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("is_stop"), lit(0))).as("n_stop"),
          sum(length(col("term"))).as("sum_len"))
      st.select(col("doc_id"), col("n_tokens"),
          r4(col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
          r4(col("sum_len").cast("double") / col("n_tokens")).as("avg_token_len"),
          r4(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) *
            (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // rolling-hash stand-in: md5 is identical in Spark and DuckDB, so
    // the fingerprint is oracle-checkable; fp8 = first 8 hex chars
    "text_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"),
          substring(md5(col("text")), 1, 8).as("fp8"))
        .orderBy(col("doc_id"))
    }),

    // WINNOWING document fingerprint (Schleimer et al., SIGMOD'03) —
    // the local fingerprinting scheme plagiarism/near-dup detectors
    // use: hash every character k-gram, then keep the MINIMUM hash of
    // each window of w consecutive k-gram hashes. Guarantee: any two
    // docs sharing a substring of ≥ k+w−1 chars share a fingerprint —
    // unlike whole-doc md5 (text_fingerprint), which a single edited
    // byte breaks. Entirely per-row codegen'd higher-order functions
    // (sequence→transform→slice→array_min): no UDF, no shuffle beyond
    // the final sort, per-doc state bounded by text length — the
    // 100 TB shape. The k-gram hash is the first 15 md5 hex digits as
    // a 60-bit int — engine-identical (Spark conv(·,16,10) == DuckDB
    // '0x'-cast), which is what makes a WINNOWING operator
    // hash-oracle-checkable. Docs shorter than k+w−1 = 11 chars have
    // no full window and are dropped (declared semantics, mirrored in
    // the oracle).
    "text_winnow_fingerprint" -> ((s, d) => {
      winnowFpArrays(s, d)
        .select(col("doc_id"), size(col("fps")).as("n_fp"),
          element_at(col("fps"), 1).as("fp_min"),
          expr("array_join(transform(slice(fps, 1, 8), x -> cast(x as string)), ',')")
            .as("fp_sample"))
        .orderBy(col("doc_id"))
    }),

    // tokenizer fertility per source — sub-tokens emitted per
    // whitespace word, THE tokenizer-efficiency number a multilingual
    // training budget is planned around (fertility 2.5 means a corpus
    // costs 2.5× its word count in sequence positions). Sub-token
    // count uses the fixed ⌈len/4⌉ rule-of-thumb proxy (≈4 chars per
    // BPE token, declared — swap a real vocab at the marked
    // expression for production); everything integer until the two
    // ratio closes; one scan, one bounded per-source agg.
    "pipeline_tokenizer_fertility" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w")).cast("long")).as("n_chars"),
          // the tokenizer proxy: ⌈len/4⌉ sub-tokens per word
          sum(expr("CAST((length(w) + 3) DIV 4 AS BIGINT)")).as("n_subtokens"))
        .select(col("source"), col("n_words"), col("n_subtokens"),
          r4(col("n_subtokens").cast(DoubleType) /
            col("n_words").cast(DoubleType)).as("fertility"),
          r4(col("n_chars").cast(DoubleType) /
            col("n_subtokens").cast(DoubleType)).as("chars_per_token"))
        .orderBy(col("source"))
    }),

    // BPE-ish regex token classes: alphabetic tokens, long tokens,
    // consonant-heavy tokens — counted per document via higher-order
    // filters (no UDF, stays in codegen)
    "text_token_classes" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          expr("size(filter(split(text, ' '), x -> x rlike '^[a-z]+$'))").as("n_alpha"),
          expr("size(filter(split(text, ' '), x -> length(x) > 5))").as("n_long"))
        .orderBy(col("doc_id"))
    }),

    // within-document repetition: fraction of duplicate token
    // trigrams — the classic corpus-cleaning signal (a doc whose
    // trigrams mostly repeat is boilerplate/spam). Higher-order
    // expressions only; stays in codegen, no shuffle beyond the scan.
    "text_repetition_stats" -> ((s, d) =>
      repetitionStats(s, d).orderBy(col("doc_id"))),

    // PII scrubbing — the redaction pass a training pipeline runs
    // before anything ships: detect + replace emails and long digit
    // runs, report per-doc counts and the fingerprint of the redacted
    // text. Pure per-row regex (codegen'd, no UDF, no shuffle beyond
    // the final sort). The patterns avoid backslash classes ([.], not
    // \.) so the same literal is valid Java regex AND RE2 — one
    // definition serves Spark and the oracle.
    "text_pii_redact" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$EmailRe', 0)")).as("n_emails"),
          size(expr(s"regexp_extract_all(text, '$LongNumRe', 0)")).as("n_long_numbers"),
          md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            LongNumRe, "<NUM>")).as("redacted_fp"))
        .orderBy(col("doc_id"))
    }),

    // deterministic stratified sampling: per-language keep rates (en
    // 50%, others 20%) decided by the same Knuth multiplicative hash
    // as the split assignment, over 1000 buckets. No rand() — the
    // sample is reproducible across runs, partitionings, and engines,
    // and embarrassingly parallel (a per-row filter at the scan).
    // vocabulary-coverage curve: what share of all token occurrences
    // do the top-100/250/500 terms cover? THE tokenizer-vocab-size
    // planning number (a 95% cover at 500 says a small vocab + byte
    // fallback suffices). Top-k via TakeOrderedAndProject (no global
    // sort); the rank window and cumulative sum run over the BOUNDED
    // 500-row top list; the token total rides a per-doc aggregate
    // (no second explode); checkpoints at three ranks.
    "text_vocab_coverage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val top = docs.select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("term")).limit(500)
      val tot = docs.agg(sum(size(split(col("text"), " ")).cast("long")).as("tt"))
      val w = Window.orderBy(desc("n"), col("term"))
      val cum = Window.orderBy(desc("n"), col("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the last rank always reports (a vocabulary smaller than the
      // first checkpoint would otherwise return an empty curve)
      top.withColumn("rank", row_number().over(w))
        .withColumn("cum_tokens", sum(col("n")).over(cum))
        .crossJoin(broadcast(top.agg(count(lit(1)).cast("int").as("vs"))))
        .filter(col("rank").isin(100, 250, 500) || col("rank") === col("vs"))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("cum_tokens"),
          r4(col("cum_tokens").cast("double") / col("tt")).as("coverage"))
        .orderBy(col("rank"))
    }),

    // mergeable bottom-k uniform sample per stratum: the k doc_ids
    // with the smallest md5-basis hashes per language — the
    // constant-state reservoir-sampling replacement
    // (functions.BottomKAgg: ≤2k longs of partial-agg state per
    // group, union-of-samples = sample-of-union, so the shuffle never
    // carries more than the sample regardless of corpus size).
    // Deterministic by the hash basis → recomputable in DuckDB as a
    // row_number-over-hash — a hash-ORACLED sketch, like the MinHash
    // and HLL families.
    "sample_bottomk_per_group" -> ((s, d) => {
      val bk = udaf(new graft.functions.BottomKAgg(BottomKSample))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          expr(graft.functions.Md5Hash.sparkHash60(
            "concat('b|', cast(doc_id as string))")).as("h"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          bk(col("h"), col("doc_id")).as("ids"))
        // rendered as a CSV string: the driver's hash-compare cannot
        // hash array cells (same convention as the other list outputs)
        .select(col("lang"), col("n_docs"),
          concat_ws(",", expr("transform(ids, x -> cast(x as string))"))
            .as("sample_ids"))
        .orderBy(col("lang"))
    }),

    "sample_stratified" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(1000L))
            .as("bucket"))
        .filter(col("bucket") <
          when(col("lang") === "en", lit(500L)).otherwise(lit(200L)))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // deterministic train/val/test split assignment — the dataset-
    // split step of a training pipeline. Bucket = Knuth multiplicative
    // hash of doc_id mod 100 (pure integer arithmetic: identical in
    // every engine, stable across runs/partitionings, and embarrassing-
    // ly parallel at any scale — no shuffle, no rand()): <80 train,
    // <90 val, else test.
    "text_split_assign" -> ((s, d) =>
      splitAssign(s, d).select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))),

    // top-3 token bigrams per language. Bigrams are built map-side
    // (no per-token shuffle); the shuffle carries partial
    // (lang, bigram, count) state only. Rank ties break toward the
    // lexicographically first bigram.
    //
    // Built with zip_with over two shifted slices, NOT the
    // transform-over-sequence shape [[repetitionStats]] uses: here the
    // split array has a SINGLE downstream reference, so CollapseProject
    // inlines it into the consumer — with element_at lambdas that
    // re-inlines split(text) into every element lookup (O(tokens²) per
    // doc, measured 9.6 s vs 0.3 s at sf0.1). zip_with touches the
    // array only via slice, so an inlined split re-evaluates O(1)
    // times per row regardless of collapsing.
    "text_ngram_topk" -> ((s, d) => {
      val big = Tables.documents(s, d)
        .withColumn("ts", split(col("text"), " "))
        .withColumn("bgs", expr(
          """IF(size(ts) < 2, array(),
            |  zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1),
            |    (a, b) -> concat(a, ' ', b)))""".stripMargin))
        .select(col("lang"), explode(col("bgs")).as("bigram"))
      val cnt = big.groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(desc("n"), asc("bigram"))
      cnt.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("lang"), col("rn"), col("bigram"), col("n"))
        .orderBy(col("lang"), col("rn"))
    }),

    // Count-Min frequent terms — the sketch-vs-exact audit: one
    // constant-memory mergeable sketch pass over the token stream
    // (functions.CountMinAgg: d·w longs of partial-agg state per
    // partition regardless of vocabulary — the estimate never
    // undercounts), compared against the exact top-10. Exact counting
    // shuffles one pair per DISTINCT term; at web-scale vocabularies
    // the sketch is what survives. The two bounded driver-side
    // collects are a 10-row top list and ONE 32 KB sketch row — both
    // constant in corpus size. HASH-ORACLED: the Md5Hash bucket basis
    // is engine-identical, so DuckDB rebuilds the full d×w cell grid
    // and takes the same per-term min; Round3bSpec additionally pins
    // est == exact on a collision-free fixture and est ≥ exact always.
    "text_cm_frequent_terms" -> ((s, d) => {
      import s.implicits._
      val D = 4; val W = 1024
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
      val sketch = tok.as[String]
        .select(new graft.functions.CountMinAgg(D, W).toColumn).head()
      val exact = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("term")).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      exact.toSeq.map { case (t, n) =>
        (t, n, graft.functions.CountMinAgg.estimate(sketch, t, D, W))
      }.toDF("term", "exact_n", "cm_est")
        .orderBy(desc("exact_n"), asc("term"))
    }),

    // dataset card — the per-source summary a training pipeline
    // publishes with a dataset release: document and token volume,
    // language spread, train-split share (the same deterministic
    // split rule as text_split_assign), and exact-duplicate count
    // within the source. ONE scan feeding two hash aggregates (the
    // language spread rides the main aggregate — a second scan just
    // for countDistinct(lang) would dominate the query at corpus
    // scale); the dup detection groups on (source, md5) so the
    // shuffle carries fingerprints, never text.
    "pipeline_dataset_card" -> ((s, d) => {
      val base = splitAssign(s, d)
        .withColumn("ntok", size(split(col("text"), " ")))
        .withColumn("h", md5(col("text")))
      val main = base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok").cast("long")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          count_if(col("split") === "train").as("n_train"))
      val dups = base.groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("nh"))
        .filter(col("nh") > 1)
        .groupBy(col("source")).agg(sum(col("nh")).as("n_dup_docs"))
      main.join(dups, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_langs"), col("n_train"),
          coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
        .orderBy(col("source"))
    }),

    // per-document token entropy — the vocabulary-diversity quality
    // signal (low entropy = repetitive/boilerplate text). Computed via
    // the order-independent decomposition H = ln(n) − Σ c·ln(c) / n:
    // each per-term contribution is rounded to 4dp FIRST (cross-engine
    // ln() can differ in the last ulp — same discipline as the TF-IDF
    // ranking) and the sum accumulates as exact DECIMAL(18,4), so the
    // result is independent of partial-aggregation order.
    // Flesch-style readability per language: words, vowel-group
    // "syllables" (the standard rough proxy), chars — all exact
    // integer counts summed per lang — then reading-ease =
    // 206.835 − 84.6·(syllables/word) in one fixed-order double
    // formula (the corpus has no sentence structure, so the
    // sentence-length term is omitted — declared semantics). Per-row
    // work is codegen'd regexp_count/length; shuffle carries 4 longs
    // per lang.
    "text_readability" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("w"),
          regexp_count(col("text"), lit("[aeiou]+")).cast("long").as("syl"),
          length(col("text")).cast("long").as("ch"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
          sum(col("syl")).as("n_syllables"), sum(col("ch")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          r4(col("n_syllables").cast("double") / col("n_words"))
            .as("syll_per_word"),
          r4(col("n_chars").cast("double") / col("n_words"))
            .as("chars_per_word"),
          r4(lit(206.835) - lit(84.6) *
            (col("n_syllables").cast("double") / col("n_words")))
            .as("reading_ease"))
        .orderBy(col("lang"))),

    // lexical diversity per document: type/token ratio + hapax share
    // (types seen exactly once IN the doc). Low TTR or low hapax
    // share = templated/repetitive text — the cheap diversity screen
    // a pipeline runs next to entropy and repetition. Pure integer
    // counts until two final ratios; explode → two hash aggs, shuffle
    // carries (doc, term, count) partials.
    "text_hapax_stats" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          count_if(col("c") === 1).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          r4(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
          r4(col("n_hapax").cast("double") / col("n_types"))
            .as("hapax_share"))
        .orderBy(col("doc_id"))
    }),

    "text_entropy_stats" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          dsum(round(col("c").cast("double") * log(col("c")), 4)).as("sc"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          r4(log(col("n_tokens").cast("double")) - col("sc") / col("n_tokens"))
            .as("entropy"))
        .orderBy(col("doc_id"))
    }),

    // conditional bigram entropy H(w₂|w₁) per source — the
    // REPETITIVENESS number unigram entropy can't see: a corpus can
    // have rich vocabulary (high H(w)) yet be template-stitched
    // (once you've seen w₁, w₂ is forced — low H(w₂|w₁)). N·H =
    // Σ_ctx c_u·lg₂c_u − Σ_bigram c_b·lg₂c_b, both sums over exact
    // integer counts with per-term 4dp quantization into exact
    // decimal sums (the entropy_stats discipline, log2 basis);
    // context counts derive FROM the bigram counts (one extra
    // hash agg, no second corpus pass); one double division closes.
    "text_bigram_entropy" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val bg = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("ts"))
        .select(col("source"), explode(expr(
          """IF(size(ts) < 2, array(),
            |  zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1),
            |    (a, b) -> struct(a AS w1, b AS w2)))""".stripMargin)).as("p"))
        .groupBy(col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cb"))
      val ctx = bg.groupBy(col("source"), col("w1"))
        .agg(sum(col("cb")).as("cu"),
          sum(round(col("cb").cast(DoubleType) * log2(col("cb")), 4)
            .cast(dec)).as("sb"))
      ctx.groupBy(col("source"))
        .agg(sum(col("cu")).as("n_bigrams"),
          count(lit(1)).as("n_contexts"),
          sum(round(col("cu").cast(DoubleType) * log2(col("cu")), 4)
            .cast(dec)).as("su"),
          sum(col("sb")).as("sbt"))
        .select(col("source"), col("n_bigrams"), col("n_contexts"),
          r4((col("su") - col("sbt")).cast(DoubleType) /
            col("n_bigrams").cast(DoubleType)).as("cond_entropy_bits"))
        .orderBy(col("source"))
    }),

    // exact token-length percentiles per source (p50/p90/p99/max) —
    // the sequence-length profile a dataloader/packing decision reads
    // BEFORE choosing bucket edges (pipeline_padding_waste then
    // scores the chosen edges): integer rank arithmetic over the
    // per-source length histogram (min len with cum·100 ≥ q·n, the
    // sax-edge discipline) — no approx_percentile, no sort of raw
    // docs; shuffle ∝ distinct (source, length) pairs.
    "pipeline_len_quantiles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"))
      val tot = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), max(col("tok")).as("max_tok"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(tot), Seq("source"))
        .select(col("source"), col("tok"), col("cum"), col("n_docs"),
          explode(expr("array(50, 90, 99)")).as("q"))
        .filter(col("cum") * 100 >= col("q") * col("n_docs"))
        .groupBy(col("source"), col("q")).agg(min(col("tok")).as("e"))
        .groupBy(col("source"))
        .agg(min(when(col("q") === 50, col("e"))).as("p50"),
          min(when(col("q") === 90, col("e"))).as("p90"),
          min(when(col("q") === 99, col("e"))).as("p99"))
        .join(broadcast(tot), Seq("source"))
        .select(col("source"), col("n_docs"), col("p50"), col("p90"),
          col("p99"), col("max_tok"))
        .orderBy(col("source"))
    }),

    // inverted-index build — the retrieval-side artifact of a training
    // pipeline: per term, document frequency + the first 10 posting
    // doc_ids. The posting cap is applied BEFORE any list is
    // materialized (row_number ≤ 10 per term), so no executor ever
    // holds an unbounded posting array — a hot stopword term costs a
    // counted aggregate, not an OOM. Terms with df < 5 are dropped
    // (rare-term noise floor, keeps the index bounded).
    "pipeline_inverted_index" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val df_ = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 5)
      val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
      val heads = tok.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .groupBy(col("term"))
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("postings_head"))
      df_.join(heads, Seq("term"))
        .select(col("term"), col("df"), col("postings_head"))
        .orderBy(col("term"))
    }),

    // power-law data mixing — the sampling step that turns a cleaned
    // corpus into a training mix: per-source quotas ∝ √n_docs (the
    // α=0.5 temperature that upweights small sources without letting
    // one giant crawl drown everything), documents picked per source
    // by CONTENT-HASH rank (md5 of the text) so the sample is
    // reproducible from the data alone — no seed to lose. Quotas are
    // floored at 1 (every source is represented) and capped at the
    // source size. Determinism: per-source weights round to 4 dp and
    // total as an exact decimal; quota = floor of identical doubles.
    // r5: the hash-rank caveat is RETIRED — the per-source rank
    // composes from 256 hash-PREFIX buckets (the first 2 hex chars of
    // the md5 sort key are monotone in its lexicographic order, so
    // bucket + within-bucket rank + ≤256-row boundary offsets = the
    // exact global rank); no window partitions on the 20-value source
    // key alone. Row-identity vs the naive window pinned in
    // Round5Spec; oracle unchanged.
    "pipeline_source_mix" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val ws = counts
        .agg(sum(round(sqrt(col("n_docs").cast("double")), 4).cast(dec))
          .cast("double").as("wsum"))
      val q = counts.crossJoin(broadcast(ws))
        .select(col("source"), col("n_docs"),
          least(col("n_docs"), greatest(lit(1L),
            floor(lit(MixTarget) *
              round(sqrt(col("n_docs").cast("double")), 4) / col("wsum"))))
            .as("quota"))
      val h = docs.select(col("source"), col("doc_id"),
          md5(col("text")).as("h"))
        .withColumn("bk", substring(col("h"), 1, 2))
      val perB = h.groupBy(col("source"), col("bk"))
        .agg(count(lit(1)).as("bc"))
      val wPrev = Window.partitionBy(col("source")).orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = perB
        .withColumn("boff", coalesce(sum(col("bc")).over(wPrev), lit(0L)))
        .select(col("source"), col("bk"), col("boff"))
      val wIn = Window.partitionBy(col("source"), col("bk"))
        .orderBy(col("h"), col("doc_id"))
      val rn = h.join(broadcast(offs), Seq("source", "bk"))
        .withColumn("rn", row_number().over(wIn).cast("long") + col("boff"))
        .select(col("source"), col("doc_id"), col("rn"))
      val samp = rn.join(q.select(col("source"), col("quota")), Seq("source"))
        .filter(col("rn") <= col("quota"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 5), ",")
            .as("sample_head"))
      q.join(samp, Seq("source"))
        .select(col("source"), col("n_docs"), col("quota"),
          col("n_sampled"), col("sample_head"))
        .orderBy(col("source"))
    }),

    // token-bigram language-model scoring — the CCNet/KenLM-shaped
    // quality filter of a training-data pipeline: train add-one-
    // smoothed bigram counts on the corpus itself, score every
    // document by cross-entropy (and perplexity) under that model.
    // High perplexity = the document's token transitions are unlike
    // the corpus = a filter candidate. Scale shape: the model is
    // built from TWO hash aggregates over the bigram stream (shuffle
    // carries (bigram,count) partials, never raw text); the per-doc
    // score joins the doc's DISTINCT-bigram counts to the model on
    // the bigram key — the join input is ∝ distinct bigrams per doc,
    // not token occurrences, and a hot bigram is one model row (AQE
    // handles residual key skew). The vocabulary size V is a
    // broadcast one-row scalar. Per-bigram log-probs are rounded to
    // 4 dp and the weighted sum accumulates as DECIMAL(18,4) (the
    // text_entropy_stats discipline), so the per-doc total is
    // order-independent and hash-matches DuckDB; only the final
    // division/exp are IEEE.
    "pipeline_lm_perplexity" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      // bigram string "w1 w2" is an unambiguous key (tokens contain
      // no spaces — FIXTURES.md documents the space-joined corpus).
      // slice() keeps the pair build inside codegen; docs with < 2
      // tokens yield no bigrams and are absent from the output
      // (declared semantics).
      val bi = toks
        .select(col("doc_id"), explode(expr(
          """transform(slice(t, 2, greatest(size(t) - 1, 0)),
            |  (w, i) -> struct(t[i] AS w1, concat(t[i], ' ', w) AS b))"""
            .stripMargin)).as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.b"))
      val c2 = bi.groupBy(col("b")).agg(count(lit(1)).as("c2"))
      val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val v = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .agg(countDistinct(col("term")).as("v"))
      val model = c2
        .withColumn("w1", expr("split(b, ' ')[0]"))
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("b"), round(log(
          (col("c2") + lit(1)).cast("double") /
            (col("c1") + col("v")).cast("double")), 4).as("lp"))
      val docBi = bi.groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).as("cb"))
      docBi.join(model, Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cb")).as("n_bigrams"),
          dsum(round(col("cb").cast("double") * col("lp"), 4)).as("slp"))
        .select(col("doc_id"), col("n_bigrams"),
          r4(-col("slp") / col("n_bigrams")).as("cross_entropy"),
          r4(exp(-col("slp") / col("n_bigrams"))).as("perplexity"))
        .orderBy(col("doc_id"))
    }),

    // Zipf power-law fit over the rank-frequency curve: the corpus
    // health check a training pipeline runs (natural text slopes near
    // −1; scraped boilerplate or synthetic spam bends the curve).
    // Top-500 terms by exact count (TakeOrderedAndProject — no global
    // sort), rank by (count desc, term), then the least-squares slope
    // of ln(freq) ~ ln(rank) from DECIMAL-EXACT sums of 4dp-rounded
    // logs (the text_entropy_stats discipline: rounding before the
    // sum makes the accumulation order-independent and
    // engine-identical; only the final slope/intercept divisions are
    // double). Constant state: 500 (x, y) points regardless of corpus
    // size — the vocabulary never leaves the top-k aggregate.
    "text_zipf_slope" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val top = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("term")).limit(500)
      // sums stay exact: x,y ≤ 6.3 at 4dp; 500 points → sx fits
      // DECIMAL(14,4), the cross-products DECIMAL(18,8); every
      // decimal op below stays inside precision 38, so NO decimal
      // rounding happens in either engine before the final division
      val dsm = org.apache.spark.sql.types.DecimalType(14, 4)
      val dpr = org.apache.spark.sql.types.DecimalType(18, 8)
      val xy = top
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("n"), col("term"))))
        .select(round(log(col("rank").cast("double")), 4).cast(dec).as("x"),
          round(log(col("n").cast("double")), 4).cast(dec).as("y"))
      xy.agg(count(lit(1)).cast(org.apache.spark.sql.types.DecimalType(6, 0)).as("k"),
          sum(col("x")).cast(dsm).as("sx"), sum(col("y")).cast(dsm).as("sy"),
          sum(col("x") * col("x")).cast(dpr).as("sxx"),
          sum(col("x") * col("y")).cast(dpr).as("sxy"))
        .withColumn("slope_d",
          (col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .select(col("k").cast("long").as("n_points"),
          r4(col("slope_d")).as("slope"),
          r4((col("sy").cast("double") - col("sx").cast("double") * col("slope_d"))
            / col("k").cast("double")).as("intercept"))
    }),

    // staged quality-filter funnel — the acceptance report every
    // training-data pipeline publishes: how many documents survive
    // each cumulative gate (size → language → token floor →
    // repetition cap → exact dedup) and how many each gate drops.
    // Two column-pruned corpus passes compute every per-doc flag (a
    // token aggregate on high-cardinality doc_id; a metadata pass
    // with the first-per-fingerprint window on high-cardinality md5 —
    // no single-partition hazard), joined once on doc_id; then ONE
    // keyless aggregate folds the cumulative conjunctions into six
    // counters and stack() unpivots the single row. Cost is
    // independent of stage count — the naive per-stage recount scans
    // S times. The repetition gate compares an exact-integer ratio to
    // the dyadic 0.25 (bit-exact in every engine); thresholds live in
    // [[FunnelMinChars]] etc so the oracle cannot drift.
    "pipeline_quality_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("ntok"), max(col("c")).as("topc"))
      val wFp = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val flags = docs
        .withColumn("rn", row_number().over(wFp))
        .join(tc, Seq("doc_id"))
        .select(
          (col("n_chars") >= FunnelMinChars).as("f1"),
          (col("lang") =!= FunnelLangBlock).as("f2"),
          (col("ntok") >= FunnelMinTokens).as("f3"),
          (col("topc").cast("double") / col("ntok") <= FunnelMaxTopShare).as("f4"),
          (col("rn") === 1).as("f5"))
      def cum(fs: Column*) = sum(when(fs.reduce(_ && _), 1L).otherwise(0L))
      flags
        .agg(count(lit(1)).as("c0"),
          cum(col("f1")).as("c1"),
          cum(col("f1"), col("f2")).as("c2"),
          cum(col("f1"), col("f2"), col("f3")).as("c3"),
          cum(col("f1"), col("f2"), col("f3"), col("f4")).as("c4"),
          cum(col("f1"), col("f2"), col("f3"), col("f4"), col("f5")).as("c5"))
        .select(expr(
          """stack(6,
            |  0, 'ingest',         c0, CAST(0 AS BIGINT),
            |  1, 'min_chars',      c1, c0 - c1,
            |  2, 'lang_allow',     c2, c1 - c2,
            |  3, 'min_tokens',     c3, c2 - c3,
            |  4, 'repetition_cap', c4, c3 - c4,
            |  5, 'exact_dedup',    c5, c4 - c5)
            |AS (stage, filter, survivors, dropped)""".stripMargin))
        .orderBy(col("stage"))
    }),

    // cross-language vocabulary overlap — the contamination screen a
    // multilingual corpus runs before per-language training: for each
    // language PAIR, shared distinct terms and vocabulary Jaccard
    // (high overlap between labeled languages = mislabeled docs or a
    // shared-template corpus). One distinct (lang, term) projection;
    // the pair intersection joins on the term (shuffle ∝ vocabulary);
    // sizes broadcast; ≤ langs² rows out.
    "text_lang_vocab_overlap" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val sizes = vocab.groupBy(col("lang")).agg(count(lit(1)).as("v"))
      val a = vocab.select(col("lang").as("la"), col("term"))
      val b = vocab.select(col("lang").as("lb"), col("term"))
      a.join(b, Seq("term")).filter(col("la") < col("lb"))
        .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("shared"))
        .join(broadcast(sizes.select(col("lang").as("la"), col("v").as("va"))),
          Seq("la"))
        .join(broadcast(sizes.select(col("lang").as("lb"), col("v").as("vb"))),
          Seq("lb"))
        .select(col("la"), col("lb"), col("va"), col("vb"), col("shared"),
          r4(col("shared").cast("double") /
            (col("va") + col("vb") - col("shared"))).as("vocab_jaccard"))
        .orderBy(col("la"), col("lb"))
    }),

    // the first BPE merge table — the statistic a byte-pair-encoding
    // tokenizer trainer computes before its first merge: adjacent
    // character pairs inside each vocabulary type, weighted by the
    // type's corpus frequency; the top pair is BPE merge #1. Two
    // bounded hash aggregates (vocabulary, then ≤ alphabet² pairs);
    // pair extraction fans out pipeline-side from each type (bounded
    // by token length); exact integer weights; top 20 via
    // TakeOrderedAndProject.
    "pipeline_bpe_first_merges" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      vocab
        .select(col("f"), explode(expr(
          """IF(length(tok) < 2, array(),
            |  transform(sequence(1, length(tok) - 1),
            |    i -> substring(tok, i, 2)))""".stripMargin)).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("f")).as("weight"), count(lit(1)).as("n_ctx"))
        .orderBy(desc("weight"), col("pair")).limit(20)
    }),

    // BM25 ranked retrieval for a fixed 3-term query — the search-
    // scoring primitive the inverted index feeds (tfidf ranks terms
    // within docs; BM25 ranks DOCS for a query, with tf saturation
    // k1 = 1.2 and length normalization b = 0.75). Determinism: tf /
    // dl / df / N / Σdl are exact integers; dl/avgdl evaluates as
    // dl·N/Σdl (two exact ints divided — bit-identical in any IEEE
    // engine); idf = ln((N−df+0.5)/(df+0.5)) is 4dp-quantized (the
    // zipf-slope discipline); each term's score is 4dp-quantized
    // BEFORE the per-doc DECIMAL sum, so partial-aggregation order
    // cannot move the total; ranks order by the rounded score with a
    // doc_id tie-break. One explode filtered to the query terms (tf
    // state ∝ matches, not vocabulary) + bounded scalar broadcast.
    "text_bm25_topk" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
          col("ts"))
      val tok = docs.select(col("doc_id"), col("dl"),
          explode(col("ts")).as("term"))
        .filter(col("term").isin(Bm25Terms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfs = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nd = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
      val scored = tok
        .join(broadcast(dfs), Seq("term"))
        .crossJoin(broadcast(nd))
        .withColumn("idf", round(log(
          (col("n") - col("df") + 0.5) / (col("df") + 0.5)), 4))
        .withColumn("sc", round(col("idf") * (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl") * col("n") / col("s")))), 4).cast(dec))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          r4(sum(col("sc")).cast("double")).as("score"))
      scored.orderBy(desc("score"), col("doc_id")).limit(20)
        .select(col("doc_id"), col("n_terms"), col("score"))
    }),

    // deterministic mixture schedule — the data-loading ORDER a
    // multi-source training run consumes: each source's docs occupy
    // evenly-spaced positions ∝ 1/n_s (the stride interleave:
    // pos(r) = (2r−1)/(2n_s), the r-th of n_s equal slots), so every
    // prefix of the schedule holds each source near its global
    // share. Positions compare as exact integers ((2r−1)·1e12 DIV
    // 2n_s — floor division, engine-identical); ties (equal-size
    // sources collide on every position) break (source, doc_id).
    // r5 (VERDICT r4 #7): the per-source rank now composes from
    // doc_id-range buckets (the pack_chunks discipline) — within-
    // (source, bucket) row_number + per-source boundary offsets over
    // ≤PackBuckets rows — so NO window partitions on the 20-value
    // source key alone; the low-cardinality caveat this query used to
    // carry is retired, not documented around. n_s joins from a plain
    // count aggregate. First 200 slots via TakeOrderedAndProject.
    // Round5Spec pins row-identity against the naive window shape.
    "pipeline_mixture_schedule" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
      val bounds = docs.agg(min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      val bucketed = docs.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((doc_id - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${PackBuckets - 1}) DIV $PackBuckets) AS INT)"))
        .drop("lo", "hi")
      val perB = bucketed.groupBy(col("source"), col("bk"))
        .agg(count(lit(1)).as("bc"))
      val wPrev = Window.partitionBy(col("source")).orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = perB
        .withColumn("boff", coalesce(sum(col("bc")).over(wPrev), lit(0L)))
        .select(col("source"), col("bk"), col("boff"))
      val ns = perB.groupBy(col("source")).agg(sum(col("bc")).as("n_s"))
      val wIn = Window.partitionBy(col("source"), col("bk"))
        .orderBy(col("doc_id"))
      bucketed
        .join(broadcast(offs), Seq("source", "bk"))
        .join(broadcast(ns), Seq("source"))
        .withColumn("r", row_number().over(wIn).cast("long") + col("boff"))
        .select(col("source"), col("doc_id"),
          expr("(2 * r - 1) * 1000000000000 DIV (2 * n_s)").as("pos"))
        .orderBy(col("pos"), col("source"), col("doc_id"))
        .limit(200)
    }),

    // concat-and-chunk sequence packing — THE map an LLM training job
    // computes before writing fixed-length sequences: documents
    // concatenate in doc_id order and cut every 512 tokens; each doc
    // reports the chunk/offset where it starts and the chunk where it
    // ends. The global prefix sum runs DISTRIBUTED via the
    // ts_late_data_semantics bucket discipline (per-bucket token sums
    // → one ≤128-row boundary window → within-bucket cumsums + bucket
    // offset) — no stage funnels the corpus through one task. All
    // integer arithmetic, BIGINT-exact in both engines.
    "pipeline_pack_chunks" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
      val bounds = docs.agg(min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      val bucketed = docs.crossJoin(broadcast(bounds))
        .withColumn("bk", expr(
          s"CAST((doc_id - lo) DIV greatest(CAST(1 AS BIGINT), " +
            s"(hi - lo + ${PackBuckets - 1}) DIV $PackBuckets) AS INT)"))
        .drop("lo", "hi")
      val perBucket = bucketed.groupBy(col("bk")).agg(sum(col("tok")).as("bsum"))
      val wPrev = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = perBucket
        .withColumn("boff", coalesce(sum(col("bsum")).over(wPrev), lit(0L)))
        .drop("bsum")
      val wIn = Window.partitionBy(col("bk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed.join(broadcast(offs), Seq("bk"))
        .withColumn("cumb",
          col("boff") + coalesce(sum(col("tok")).over(wIn), lit(0L)))
        .select(col("doc_id"), col("tok"),
          expr(s"cumb DIV $PackChunkTokens").as("start_chunk"),
          expr(s"cumb % $PackChunkTokens").as("start_off"),
          expr(s"(cumb + tok - 1) DIV $PackChunkTokens").as("end_chunk"))
        .orderBy(col("doc_id"))
    }),

    // pairwise Jensen–Shannon divergence between source unigram
    // DISTRIBUTIONS — the distributional sequel to
    // text_lang_vocab_overlap's set view (two sources can share 100%
    // of their vocabulary yet use it with wildly different
    // frequencies; JS sees that, Jaccard cannot). Decomposition that
    // needs ONLY the shared-term join: for terms absent from the
    // other source the log ratio is exactly ln 2, so
    // JSa = Σ_shared pₐ·ln(2pₐ/(pₐ+p_b)) + (1−covₐ)·ln2 with covₐ
    // the shared coverage — exact integer count ratios. Determinism:
    // the zipf discipline — each per-term ln is an identical IEEE
    // expression in both engines, 4dp-quantized, then weighted by the
    // INTEGER count into an exact decimal sum; one close per pair.
    // Shape: shuffle ∝ vocabulary × co-occurring sources; totals
    // broadcast; ≤ sources² rows out.
    "text_source_divergence" -> ((s, d) => {
      val dec4 = DecimalType(18, 4)
      val tc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      val tot = tc.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val a = tc.select(col("source").as("sa"), col("term"), col("c").as("ca"))
      val b = tc.select(col("source").as("sb"), col("term"), col("c").as("cb"))
      val ln2 = 0.6931 // round(ln 2, 4), shared with the oracle
      a.join(b, Seq("term")).filter(col("sa") < col("sb"))
        .join(broadcast(tot.select(col("source").as("sa"), col("n").as("na"))),
          Seq("sa"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          Seq("sb"))
        .withColumn("la", expr("round(ln(2.0 * CAST(ca AS DOUBLE) * nb" +
          " / (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)), 4)")
          .cast(dec4))
        .withColumn("lb", expr("round(ln(2.0 * CAST(cb AS DOUBLE) * na" +
          " / (CAST(cb AS DOUBLE) * na + CAST(ca AS DOUBLE) * nb)), 4)")
          .cast(dec4))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_shared"),
          sum(col("ca") * col("la")).as("wa"),
          sum(col("cb") * col("lb")).as("wb"),
          sum(col("ca")).as("sca"), sum(col("cb")).as("scb"),
          max(col("na")).as("na"), max(col("nb")).as("nb"))
        .select(col("sa"), col("sb"), col("n_shared"),
          r4(lit(0.5) *
            (col("wa").cast(DoubleType) / col("na") +
              (lit(1.0) - col("sca").cast(DoubleType) / col("na")) * ln2 +
              col("wb").cast(DoubleType) / col("nb") +
              (lit(1.0) - col("scb").cast(DoubleType) / col("nb")) * ln2))
            .as("js_divergence"))
        .orderBy(col("sa"), col("sb"))
    }),

    // per-document 3-gram novelty against everything EARLIER in
    // doc_id order — the memorization/duplication curve a training-
    // data audit draws ("late documents that introduce nothing are
    // crawl echo"): a distinct trigram is novel in the lowest-id
    // document containing it. NO per-prefix scan: first-occurrence =
    // min(doc_id) per trigram — one hash aggregate carrying (ngram,
    // min) partials, shuffle ∝ distinct trigrams — joined back to the
    // per-doc distinct sets. Integer counts, one ratio close.
    "text_novelty_curve" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), expr(
          """explode(IF(size(split(text, ' ')) < 3, array(),
            |  transform(sequence(1, size(split(text, ' ')) - 2),
            |    i -> concat_ws(' ', slice(split(text, ' '), i, 3)))))"""
            .stripMargin).as("g"))
        .distinct()
      val first = grams.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
      grams.join(first, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ngrams"),
          count_if(col("fd") === col("doc_id")).as("n_novel"))
        .select(col("doc_id"), col("n_ngrams"), col("n_novel"),
          r4(col("n_novel").cast(DoubleType) / col("n_ngrams"))
            .as("novelty_rate"))
        .orderBy(col("doc_id"))
    }),

    // temperature-scaled source sampling weights (τ = ½, the
    // multilingual-corpus convention): p_s ∝ n_s^τ flattens the
    // source mix so small sources aren't drowned — pipeline_source_mix
    // CAPS a source's take, this REWEIGHTS the whole distribution
    // (and pipeline_mixture_schedule then orders whatever mix wins).
    // Determinism: sqrt is correctly-rounded IEEE in both engines, its
    // result 4dp-quantizes into an exact decimal weight, the
    // normalizer is an exact decimal sum, and each output ratio is
    // one double division of identical inputs. Two bounded aggs
    // (shuffle ∝ sources), normalizer broadcast.
    "pipeline_temperature_weights" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val tw = cnt.withColumn("w", expr(
        "CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 4) AS DECIMAL(18,4))"))
      val tot = tw.agg(sum(col("n_docs")).as("tn"), sum(col("w")).as("tw"))
      tw.crossJoin(broadcast(tot))
        .withColumn("raw_share",
          r4(col("n_docs").cast(DoubleType) / col("tn")))
        .withColumn("p_temp",
          r4(col("w").cast(DoubleType) / col("tw").cast(DoubleType)))
        // boost from EXACT pre-rounding integers (ADVICE r4): dividing
        // the 4dp-ROUNDED shares made any source under ~0.005 % of the
        // corpus read raw_share = 0.0 and boost = Infinity (with
        // engine-divergent Inf handling). w·tn and tw·n_docs are exact
        // decimals; ONE double division, one close.
        .select(col("source"), col("n_docs"), col("raw_share"), col("p_temp"),
          r4((col("w") * col("tn")).cast(DoubleType) /
            (col("tw") * col("n_docs")).cast(DoubleType)).as("boost"))
        .orderBy(col("source"))
    }),

    // per-source content manifest — the reproducibility record an
    // ingest run publishes so a re-run (or a downstream consumer) can
    // verify "same docs, same bytes" without re-reading the corpus:
    // doc counts, byte totals, the doc_id range, and an ORDER-
    // INDEPENDENT content digest (sum of per-doc 60-bit md5 ints mod
    // 2⁶⁰ — commutative, so partitioning/arrival order cannot change
    // it; the winnow hash basis, engine-identical). One scan, one
    // bounded per-source agg; digest sums in DECIMAL(38,0)/HUGEINT
    // before the mod.
    "pipeline_source_manifest" -> ((s, d) => {
      val dec38 = DecimalType(38, 0)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
          sum(col("h").cast(dec38)).as("hs"))
        .select(col("source"), col("n_docs"), col("bytes"),
          col("min_doc"), col("max_doc"),
          expr("CAST(hs % 1152921504606846976 AS BIGINT)").as("digest"))
        .orderBy(col("source"))
    }),

    // boilerplate-template detection per source: the top 3 repeated
    // 8-token document PREFIXES with doc counts and within-source
    // share — the CCNet-style screen that finds navigation chrome,
    // license headers, and crawl templates BEFORE near-dedup pays for
    // them (a template is shared head, not shared document — md5 and
    // minhash both under-catch it). Prefix extraction is per-row
    // codegen (slice + concat_ws, docs shorter than 8 tokens use
    // their full text); one bounded (source, prefix) agg; totals
    // broadcast; rank ties on the prefix string. Integer-exact.
    "text_boilerplate_prefixes" -> ((s, d) => {
      val pre = Tables.documents(s, d)
        .select(col("source"), expr(
          "concat_ws(' ', slice(split(text, ' '), 1, 8))").as("prefix"))
      val tot = pre.groupBy(col("source")).agg(count(lit(1)).as("tn"))
      val cnt = pre.groupBy(col("source"), col("prefix"))
        .agg(count(lit(1)).as("n_docs"))
      val wTop = Window.partitionBy(col("source"))
        .orderBy(desc("n_docs"), col("prefix"))
      cnt.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .join(broadcast(tot), Seq("source"))
        .select(col("source"), col("prefix"), col("n_docs"),
          r4(col("n_docs").cast(DoubleType) / col("tn")).as("share"))
        .orderBy(col("source"), desc("n_docs"), col("prefix"))
    }),

    // sequence-length bucket batching audit: docs bin into the
    // padding buckets a training dataloader pads to (128/256/512/
    // 1024/2048 tokens, longer docs truncate at 2048) and each bucket
    // reports its PADDING WASTE — the fraction of padded positions
    // holding no token, the number a batching strategy is judged by
    // (pipeline_pack_chunks ELIMINATES padding by concat-packing;
    // this measures what naive bucketing leaves on the table). The
    // bucket edge is an explicit 5-arm CASE (no float log anywhere),
    // counts/token sums exact BIGINTs, one ratio close per bucket.
    // One scan, one ≤5-row agg.
    "pipeline_padding_waste" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(expr("size(split(text, ' '))").cast("long").as("t"))
        .withColumn("edge", when(col("t") <= 128, 128L)
          .when(col("t") <= 256, 256L).when(col("t") <= 512, 512L)
          .when(col("t") <= 1024, 1024L).otherwise(2048L))
      toks.groupBy(col("edge"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("t"), col("edge"))).as("kept_tokens"),
          sum(greatest(col("t") - lit(2048L), lit(0L))).as("truncated_tokens"))
        .withColumn("padded", col("n_docs") * col("edge"))
        .select(col("edge"), col("n_docs"), col("kept_tokens"),
          col("truncated_tokens"), col("padded"),
          r4((col("padded") - col("kept_tokens")).cast(DoubleType) /
            col("padded")).as("waste_ratio"))
        .orderBy(col("edge"))
    }),

    // per-gate ablation of the quality funnel — the MARGINAL
    // attribution the sequential funnel hides: for each of the five
    // gates, how many docs fail it AT ALL (alone) vs how many ONLY it
    // rejects (every other gate passing) — the second number is what
    // relaxing that one gate would actually recover, the first what a
    // reordering could shift. Same flag derivation as
    // pipeline_quality_funnel (constants shared — the two cannot
    // drift); exact integer counts, one ratio per row; output is 5
    // stacked rows from one aggregate.
    "pipeline_gate_ablation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("ntok"), max(col("c")).as("topc"))
      val wFp = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val flags = docs
        .withColumn("rn", row_number().over(wFp))
        .join(tc, Seq("doc_id"))
        .select(
          (col("n_chars") >= FunnelMinChars).as("f1"),
          (col("lang") =!= FunnelLangBlock).as("f2"),
          (col("ntok") >= FunnelMinTokens).as("f3"),
          (col("topc").cast("double") / col("ntok") <= FunnelMaxTopShare)
            .as("f4"),
          (col("rn") === 1).as("f5"))
      def alone(f: Column) = sum(when(!f, 1L).otherwise(0L))
      def only(f: Column, rest: Column*) =
        sum(when(!f && rest.reduce(_ && _), 1L).otherwise(0L))
      val (f1, f2, f3, f4, f5) =
        (col("f1"), col("f2"), col("f3"), col("f4"), col("f5"))
      flags.agg(count(lit(1)).as("n"),
          alone(f1).as("a1"), alone(f2).as("a2"), alone(f3).as("a3"),
          alone(f4).as("a4"), alone(f5).as("a5"),
          only(f1, f2, f3, f4, f5).as("o1"),
          only(f2, f1, f3, f4, f5).as("o2"),
          only(f3, f1, f2, f4, f5).as("o3"),
          only(f4, f1, f2, f3, f5).as("o4"),
          only(f5, f1, f2, f3, f4).as("o5"))
        .select(expr(
          """stack(5,
            |  1, 'min_chars',      a1, o1, n,
            |  2, 'lang_allow',     a2, o2, n,
            |  3, 'min_tokens',     a3, o3, n,
            |  4, 'repetition_cap', a4, o4, n,
            |  5, 'exact_dedup',    a5, o5, n)
            |AS (stage, gate, n_fail, n_fail_only, n)""".stripMargin))
        .select(col("stage"), col("gate"), col("n_fail"),
          col("n_fail_only"),
          r4(col("n_fail").cast(DoubleType) / col("n")).as("fail_share"))
        .orderBy(col("stage"))
    }),

    // split-balance audit: per-split doc counts and token-length
    // stats PLUS the exact train-vs-test KS distance over the length
    // distributions — the check that the deterministic hash split
    // didn't correlate with document length (a skewed split silently
    // biases eval perplexity; KS ≈ 0 certifies the split is
    // length-blind). Per-split stats are exact integers; the KS
    // argmax runs on integers (|cum·n − cum·n| — the diag_drift_ks
    // discipline) over the BOUNDED distinct-length relation; the
    // constant ks column repeats per row (the heaps-beta precedent).
    "pipeline_split_balance" -> ((s, d) => {
      val sp = splitAssign(s, d)
        .select(col("split"),
          expr("size(split(text, ' '))").cast("long").as("t"))
      val stats = sp.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("st"),
          min(col("t")).as("min_tokens"), max(col("t")).as("max_tokens"))
      val tt = sp.filter(col("split") =!= "val")
        .groupBy(col("t"))
        .agg(count_if(col("split") === "train").as("c1"),
          count_if(col("split") === "test").as("c2"))
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = tt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val ks = tt
        .withColumn("cum1", sum(col("c1")).over(wCum))
        .withColumn("cum2", sum(col("c2")).over(wCum))
        .crossJoin(broadcast(tot))
        .select(abs(col("cum1").cast(DecimalType(38, 0)) * col("n2") -
          col("cum2").cast(DecimalType(38, 0)) * col("n1")).as("dn"),
          col("n1"), col("n2"))
        .agg(r4(max(col("dn")).cast(DoubleType) /
          (max(col("n1")).cast(DoubleType) * max(col("n2"))))
          .as("ks_train_test"))
      stats.crossJoin(broadcast(ks))
        .select(col("split"), col("n_docs"),
          r4(col("st").cast(DoubleType) / col("n_docs")).as("mean_tokens"),
          col("min_tokens"), col("max_tokens"), col("ks_train_test"))
        .orderBy(col("split"))
    }),

    // C4-style line-level dedup census: sentences (split on '. ')
    // repeated across documents, per source — the granularity C4
    // famously dedupes at, between whole-doc md5 (misses partial
    // reuse) and prefix templates (only heads): per source, how many
    // of its sentence INSTANCES are corpus-repeated and the share of
    // text mass they carry. Sentence explosion is map-side, the
    // repeat census one hash agg (shuffle ∝ distinct sentences);
    // single-token "sentences" under 2 tokens are noise and excluded
    // (declared); exact integers, two ratio closes.
    "text_line_dedup_census" -> ((s, d) => {
      val sent = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), "[.] ")).as("sent"))
        .filter(expr("size(split(sent, ' ')) >= 2"))
      val rep = sent.groupBy(col("sent"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select(col("sent"), lit(1L).as("is_rep"))
      sent.join(rep, Seq("sent"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sentences"),
          coalesce(sum(col("is_rep")), lit(0L)).as("n_repeated"),
          sum(length(col("sent")).cast("long")).as("chars"),
          coalesce(sum(when(col("is_rep") === 1,
            length(col("sent")).cast("long"))), lit(0L)).as("rep_chars"))
        .select(col("source"), col("n_sentences"), col("n_repeated"),
          r4(col("n_repeated").cast(DoubleType) / col("n_sentences"))
            .as("repeat_rate"),
          r4(col("rep_chars").cast(DoubleType) / col("chars"))
            .as("repeated_mass"))
        .orderBy(col("source"))
    }),

    // Luhn-validated number detection — the PII gate one level above
    // text_pii_redact's regex count: a 6+-digit string that ALSO
    // passes the Luhn mod-10 checksum is plausibly a real card/account
    // number, not a timestamp or order id — the distinction between
    // "redact broadly" and "this document needs legal review". The
    // checksum runs entirely in codegen'd higher-order expressions
    // (reverse → per-digit double-and-fold → mod 10), written
    // IDENTICALLY in both engines (ascii/substr/reverse arithmetic —
    // integer-exact by construction). Output: docs containing long
    // numbers, with the validated count.
    "text_pii_luhn" -> ((s, d) => {
      val luhn = "x -> aggregate(transform(sequence(1, length(x)), " +
        "i -> IF(i % 2 = 0, " +
        "IF((ascii(substr(reverse(x), i, 1)) - 48) * 2 > 9, " +
        "(ascii(substr(reverse(x), i, 1)) - 48) * 2 - 9, " +
        "(ascii(substr(reverse(x), i, 1)) - 48) * 2), " +
        "ascii(substr(reverse(x), i, 1)) - 48)), 0, (a, v) -> a + v) " +
        "% 10 = 0"
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr(s"regexp_extract_all(text, '$LongNumRe', 0)").as("nums"))
        .filter(size(col("nums")) > 0)
        .select(col("doc_id"), size(col("nums")).as("n_long_numbers"),
          expr(s"size(filter(nums, $luhn))").as("n_luhn_valid"))
        .withColumn("needs_review", col("n_luhn_valid") > 0)
        .orderBy(col("doc_id"))
    }),

    // code-vs-prose screen per document: the share of tokens carrying
    // code-ish characters (digits, underscores, brackets, operators —
    // one character class, valid in BOTH regex engines like the PII
    // set) and the dyadic ¼ verdict via the exact integer compare
    // 4·n_sym > n_tok — the filter a code/prose corpus split runs
    // before routing to different tokenizers (prose pipelines mangle
    // code; code models starve on prose). Per-row codegen
    // higher-order filter, no shuffle beyond the scan.
    "text_code_prose_ratio" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          expr("size(filter(split(text, ' '), " +
            "x -> x rlike '[0-9_;{}()=<>]'))").as("n_symbolic"))
        .select(col("doc_id"), col("n_tokens"), col("n_symbolic"),
          r4(col("n_symbolic").cast(DoubleType) / col("n_tokens"))
            .as("symbol_ratio"),
          (col("n_symbolic") * 4 > col("n_tokens")).as("looks_code"))
        .orderBy(col("doc_id"))
    }),

    // per-source language-mix audit: majority language + share and
    // the language entropy of each source — the monolinguality gate
    // an ingest run checks BEFORE routing a source into a
    // per-language pipeline (entropy ≈ 0: route whole; high entropy:
    // the source needs doc-level langid — and text_langid_kappa says
    // whether that langid can be trusted). Exact integers; entropy =
    // ln n − Σ c·ln c / n on the mine_user_entropy 4dp-quantized
    // basis; majority via max-count + min-lang (total order).
    // Aggregates bounded by sources × langs.
    "text_source_lang_mix" -> ((s, d) => {
      val lc = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      val per = lc.groupBy(col("source"))
        .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_langs"),
          max(col("c")).as("maxc"),
          dsum(round(col("c").cast("double") * log(col("c")), 4)).as("sc"))
      val top = lc.join(per.select(col("source"), col("maxc")), Seq("source"))
        .filter(col("c") === col("maxc"))
        .groupBy(col("source")).agg(min(col("lang")).as("top_lang"))
      per.join(top, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_langs"), col("top_lang"),
          r4(col("maxc").cast(DoubleType) / col("n_docs")).as("top_share"),
          r4(log(col("n_docs").cast("double")) - col("sc") / col("n_docs"))
            .as("lang_entropy"))
        .orderBy(col("source"))
    }),

    // Heaps' law growth curve: cumulative vocabulary vs cumulative
    // tokens at 10 doc_id-fraction checkpoints, plus the fitted Heaps
    // exponent β (V ≈ K·Tᵝ; English corpora sit β ≈ 0.4–0.6 — a β
    // drifting toward 1 means the crawl keeps finding NEW vocabulary:
    // unconverged coverage or garbage) — the growth view of the
    // text_novelty_curve/text_vocab_coverage family. NO global sort:
    // checkpoints are doc_id VALUE thresholds ((max·q) DIV 10 from a
    // one-row broadcast bounds agg), vocabulary-at-q counts terms
    // whose FIRST doc (min doc_id, one hash agg ∝ vocabulary) falls
    // under the threshold; the 10-point log–log OLS runs the
    // graph_degree_powerlaw quantized-regression discipline.
    "text_heaps_law" -> ((s, d) => {
      val dec = DecimalType(18, 4)
      val dsm = DecimalType(14, 4)
      val dpr = DecimalType(18, 8)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("size(split(text, ' '))").cast("long").as("tok"))
      val mx = docs.agg(max(col("doc_id")).as("mid"))
      val dchk = docs.crossJoin(broadcast(mx))
        .select(col("doc_id"), col("tok"), col("mid"),
          explode(expr("sequence(1, 10)")).as("q"))
        .filter(col("doc_id") <= expr("(mid * q) DIV 10"))
        .groupBy(col("q"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      val first = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      val vchk = first.crossJoin(broadcast(mx))
        .select(col("fd"), col("mid"), explode(expr("sequence(1, 10)")).as("q"))
        .filter(col("fd") <= expr("(mid * q) DIV 10"))
        .groupBy(col("q")).agg(count(lit(1)).as("vocab"))
      val pts = dchk.join(vchk, Seq("q"))
        .withColumn("x",
          round(log(col("n_tokens").cast("double")), 4).cast(dec))
        .withColumn("y", round(log(col("vocab").cast("double")), 4).cast(dec))
      val fit = pts.agg(count(lit(1)).cast(DecimalType(6, 0)).as("k"),
          sum(col("x")).cast(dsm).as("sx"), sum(col("y")).cast(dsm).as("sy"),
          sum(col("x") * col("x")).cast(dpr).as("sxx"),
          sum(col("x") * col("y")).cast(dpr).as("sxy"))
        .withColumn("beta_d",
          (col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .select(r4(col("beta_d")).as("beta"),
          r4((col("sy").cast("double")
            - col("sx").cast("double") * col("beta_d"))
            / col("k").cast("double")).as("log_k"))
      pts.crossJoin(broadcast(fit))
        .select(col("q").cast("long").as("q"), col("n_docs"),
          col("n_tokens"), col("vocab"), col("beta"), col("log_k"))
        .orderBy(col("q"))
    }),

    // reproducible per-epoch shuffle: each training epoch orders the
    // corpus by md5(doc_id ‖ ':' ‖ epoch) — a DIFFERENT deterministic
    // permutation per epoch that any worker, any rerun, any engine
    // recomputes identically (the seeded-shuffle a multi-epoch run
    // needs; mixture_schedule decides the RATIOS, this the per-epoch
    // ORDER). Reported: the first 10 positions of epochs 1–3.
    // Per-row hash in codegen; rank windows partition by epoch over
    // (key, doc_id) — a total order, ties impossible.
    "pipeline_epoch_shuffle" -> ((s, d) => {
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("sequence(1, 3)")).as("epoch"))
        .withColumn("k",
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string"))))
      val w = Window.partitionBy(col("epoch")).orderBy(col("k"), col("doc_id"))
      keyed.withColumn("pos", row_number().over(w)).filter(col("pos") <= 10)
        .select(col("epoch").cast("int").as("epoch"), col("pos"),
          col("doc_id"))
        .orderBy(col("epoch"), col("pos"))
    }))

  /** PII regexes, valid as BOTH Java regex (Spark) and RE2 (DuckDB):
    * character classes only, no backslash escapes — the dot is [.].
    * Exposed for the planted-fixture tests. */
  private[operators] val EmailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private[operators] val LongNumRe = "[0-9]{6,}"

  /** deterministic split assignment, unordered — shared by
    * text_split_assign and DedupOps' contamination check.
    * doc_id is reduced mod 1e8 BEFORE the Knuth multiply: the raw
    * product overflows Long at doc_id ≈ 3.5e9 (Spark would wrap
    * silently, an ANSI engine would error — either way the "identical
    * in every engine at any scale" contract breaks); the reduced
    * product caps at ~2.7e17, overflow-free for any doc_id. */
  private[operators] def splitAssign(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(100L))
          .as("bucket"))
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))

  /** the split CASE expression in DuckDB form (shared with DedupOps) */
  private[operators] val splitCaseSql =
    """CASE WHEN ((doc_id % 100000000) * 2654435761) % 100 < 80 THEN 'train'
      |     WHEN ((doc_id % 100000000) * 2654435761) % 100 < 90 THEN 'val'
      |     ELSE 'test' END""".stripMargin

  /** per-doc trigram repetition stats, unordered — shared by the
    * text_repetition_stats query and DedupOps' pipeline_clean_corpus
    * composite (which joins it and must not inherit a wasted sort).
    *
    * PUSHDOWN HAZARD for consumers: filtering on the COMPUTED columns
    * (rep_ratio / n_distinct) makes Catalyst substitute the predicate
    * below these projections, re-inlining split(text) into every
    * element_at lambda — an O(tokens²)-per-doc expression blow-up
    * (measured: 8 s vs 0.2 s at sf0.1). Bound such filters with a
    * static doc_id predicate, or consume unfiltered. */
  private[operators] def repetitionStats(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .withColumn("ts", split(col("text"), " "))
      .withColumn("tris", expr(
        """IF(size(ts) < 3, array(),
          |  transform(sequence(1, size(ts) - 2),
          |    i -> concat(element_at(ts, i), '_', element_at(ts, i + 1),
          |                '_', element_at(ts, i + 2))))""".stripMargin))
      .withColumn("n_trigrams", size(col("tris")))
      .withColumn("n_distinct", size(array_distinct(col("tris"))))
      .select(col("doc_id"), col("n_trigrams"), col("n_distinct"),
        r4(lit(1.0) - col("n_distinct").cast("double") /
          greatest(col("n_trigrams"), lit(1)).cast("double")).as("rep_ratio"))

  /** DuckDB CTE chain computing the same per-doc repetition stats —
    * composed into oracles here and in DedupOps */
  private[operators] val repCtesSql =
    """t2 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |tri AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ts) < 3 THEN []::VARCHAR[]
      |         ELSE list_transform(range(1, len(ts) - 1),
      |                i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2]) END AS tris
      |  FROM t2),
      |rep AS (
      |  SELECT doc_id, CAST(len(tris) AS INT) AS n_trigrams,
      |    CAST(len(list_distinct(tris)) AS INT) AS n_distinct,
      |    round(1.0 - CAST(len(list_distinct(tris)) AS DOUBLE)
      |      / greatest(len(tris), 1), 4) AS rep_ratio
      |  FROM tri)""".stripMargin

  private val tokCte =
    "SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents"

  /** langid CTE chain (ends at `best(doc_id, prof_lang, hits)`) —
    * oracle mirror of [[langidPredictions]], shared by
    * text_langid_ngram and text_langid_confusion. */
  private def langidCtesSql: String =
    s"""tok AS ($tokCte),
       |lt AS (SELECT lang, term, count(*) AS c FROM tok GROUP BY 1, 2),
       |top20 AS (SELECT lang AS prof_lang, term FROM (
       |  SELECT lang, term, row_number() OVER (PARTITION BY lang
       |    ORDER BY c DESC, term ASC) AS rn FROM lt) t WHERE rn <= 20),
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |hits AS (SELECT dt.doc_id, top20.prof_lang, count(*) AS hits
       |  FROM dt JOIN top20 USING (term) GROUP BY 1, 2),
       |best AS (SELECT doc_id, prof_lang, hits FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY hits DESC, prof_lang ASC) AS rn FROM hits) t WHERE rn = 1)"""
      .stripMargin

  /** pipeline_quality_funnel gate thresholds — named so the Spark
    * query and the oracle SQL share one definition. MaxTopShare is
    * DYADIC (0.25): the exact-integer ratio compare is then bit-exact
    * in every engine. */
  val FunnelMinChars = 150
  val FunnelMinTokens = 40
  val FunnelMaxTopShare = 0.25
  val FunnelLangBlock = "zh"

  /** pipeline_source_mix target sample size — shared with the oracle
    * SQL so the two cannot drift */
  val MixTarget = 200

  /** pipeline_pack_chunks sequence length (tokens per chunk) and the
    * doc_id-range bucket count for its distributed prefix sum. */
  val PackChunkTokens = 512
  val PackBuckets = 128

  /** text_bm25_topk query terms — core-vocabulary tokens present at
    * every SF; shared with the oracle SQL. */
  val Bm25Terms = Seq("scan", "column", "join")

  val oracle: Map[String, String] = Map(
    "text_lang_vocab_overlap" ->
      """WITH vocab AS (
        |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |sz AS (SELECT lang, count(*) AS v FROM vocab GROUP BY lang),
        |pairs AS (
        |  SELECT x.lang AS la, y.lang AS lb, count(*) AS shared
        |  FROM vocab x JOIN vocab y ON x.term = y.term AND x.lang < y.lang
        |  GROUP BY 1, 2)
        |SELECT la, lb, sa.v AS va, sb.v AS vb, shared,
        |  round(CAST(shared AS DOUBLE) / (sa.v + sb.v - shared), 4)
        |    AS vocab_jaccard
        |FROM pairs JOIN sz sa ON sa.lang = la JOIN sz sb ON sb.lang = lb
        |ORDER BY la, lb""".stripMargin,

    "pipeline_bpe_first_merges" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |vocab AS (SELECT tok, count(*) AS f FROM tok GROUP BY tok),
        |pairs AS (
        |  SELECT f, unnest(CASE WHEN len(tok) < 2 THEN []::VARCHAR[]
        |    ELSE list_transform(range(1, len(tok)),
        |           i -> substr(tok, i, 2)) END) AS pair
        |  FROM vocab)
        |SELECT pair, CAST(sum(f) AS BIGINT) AS weight, count(*) AS n_ctx
        |FROM pairs GROUP BY pair ORDER BY weight DESC, pair LIMIT 20""".stripMargin,

    "text_bm25_topk" ->
      s"""WITH d2 AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         |    string_split(text, ' ') AS ts
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT doc_id, dl, unnest(ts) AS term FROM d2) u
         |  WHERE term IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY 1, 2, 3),
         |dfs AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
         |nd AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS s FROM d2),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(round(round(ln((n - df + 0.5) / (df + 0.5)), 4)
         |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl * n / s))), 4)
         |      AS DECIMAL(18,4)) AS sc
         |  FROM tok JOIN dfs USING (term), nd)
         |SELECT doc_id, count(*) AS n_terms,
         |  round(CAST(sum(sc) AS DOUBLE), 4) AS score
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "pipeline_mixture_schedule" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r,
        |    count(*) OVER (PARTITION BY source) AS n_s
        |  FROM documents)
        |SELECT source, doc_id,
        |  (2 * r - 1) * 1000000000000 // (2 * n_s) AS pos
        |FROM r ORDER BY pos, source, doc_id LIMIT 200""".stripMargin,

    "pipeline_pack_chunks" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, tok,
         |    coalesce(CAST(sum(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cumb
         |  FROM docs)
         |SELECT doc_id, tok,
         |  cumb // $PackChunkTokens AS start_chunk,
         |  cumb % $PackChunkTokens AS start_off,
         |  (cumb + tok - 1) // $PackChunkTokens AS end_chunk
         |FROM c ORDER BY doc_id""".stripMargin,
    "text_collocations_pmi" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
         |uni AS (
         |  SELECT w, count(*) AS c FROM (SELECT unnest(ts) AS w FROM t) u
         |  GROUP BY w),
         |tot AS (
         |  SELECT CAST(SUM(len(ts)) AS BIGINT) AS n1,
         |         CAST(SUM(greatest(len(ts) - 1, 0)) AS BIGINT) AS n2
         |  FROM t),
         |bg AS (
         |  SELECT b[1] AS w1, b[2] AS w2, count(*) AS co FROM (
         |    SELECT unnest(CASE WHEN len(ts) < 2 THEN []::VARCHAR[][] ELSE
         |      list_transform(range(1, len(ts)), i -> [ts[i], ts[i+1]]) END) AS b
         |    FROM t) x
         |  GROUP BY 1, 2 HAVING count(*) >= $CollocMinSupport)
         |SELECT w1, w2, co,
         |  round(ln(CAST(co AS DOUBLE) * n1 * n1
         |    / (CAST(n2 AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
         |FROM bg JOIN uni u1 ON u1.w = bg.w1 JOIN uni u2 ON u2.w = bg.w2
         |CROSS JOIN tot
         |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin,

    "text_hash_features" ->
      s"""WITH tok AS (
         |  SELECT ${graft.functions.Md5Hash.duckHash60("term")} % $HashFeatureBuckets AS bucket,
         |    term
         |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) u),
         |per AS (
         |  SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_tokens,
         |    count(DISTINCT term) AS n_terms
         |  FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM per)
         |SELECT bucket, n_tokens, n_terms,
         |  round(CAST(n_tokens AS DOUBLE) / tt, 4) AS token_share
         |FROM per CROSS JOIN tot ORDER BY bucket""".stripMargin,

    "pipeline_quality_funnel" ->
      s"""WITH tc AS (
         |  SELECT doc_id, SUM(c) AS ntok, MAX(c) AS topc FROM (
         |    SELECT doc_id, term, count(*) AS c FROM ($tokCte) GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |flags AS (
         |  SELECT d.n_chars >= $FunnelMinChars AS f1,
         |    d.lang <> '$FunnelLangBlock' AS f2,
         |    tc.ntok >= $FunnelMinTokens AS f3,
         |    CAST(tc.topc AS DOUBLE) / tc.ntok <= $FunnelMaxTopShare AS f4,
         |    row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id)
         |      = 1 AS f5
         |  FROM documents d JOIN tc USING (doc_id)),
         |c AS (
         |  SELECT count(*) AS c0,
         |    count(*) FILTER (WHERE f1) AS c1,
         |    count(*) FILTER (WHERE f1 AND f2) AS c2,
         |    count(*) FILTER (WHERE f1 AND f2 AND f3) AS c3,
         |    count(*) FILTER (WHERE f1 AND f2 AND f3 AND f4) AS c4,
         |    count(*) FILTER (WHERE f1 AND f2 AND f3 AND f4 AND f5) AS c5
         |  FROM flags)
         |SELECT * FROM (
         |  SELECT 0 AS stage, 'ingest' AS filter, c0 AS survivors,
         |    CAST(0 AS BIGINT) AS dropped FROM c
         |  UNION ALL SELECT 1, 'min_chars', c1, c0 - c1 FROM c
         |  UNION ALL SELECT 2, 'lang_allow', c2, c1 - c2 FROM c
         |  UNION ALL SELECT 3, 'min_tokens', c3, c2 - c3 FROM c
         |  UNION ALL SELECT 4, 'repetition_cap', c4, c3 - c4 FROM c
         |  UNION ALL SELECT 5, 'exact_dedup', c5, c4 - c5 FROM c)
         |ORDER BY stage""".stripMargin,

    "text_repetition_stats" ->
      s"""WITH $repCtesSql
         |SELECT doc_id, n_trigrams, n_distinct, rep_ratio
         |FROM rep ORDER BY doc_id""".stripMargin,

    "text_split_assign" ->
      s"""SELECT doc_id, source, $splitCaseSql AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$LongNumRe')) AS INT) AS n_long_numbers,
         |  md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |    '$LongNumRe', '<NUM>', 'g')) AS redacted_fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_vocab_coverage" ->
      """WITH top AS (
        |  SELECT term, count(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) u
        |  GROUP BY term ORDER BY n DESC, term LIMIT 500),
        |rk AS (
        |  SELECT term, n,
        |    row_number() OVER (ORDER BY n DESC, term) AS rank,
        |    sum(n) OVER (ORDER BY n DESC, term
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM top),
        |tot AS (
        |  SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tt
        |  FROM documents),
        |vs AS (SELECT count(*) AS vs FROM top)
        |SELECT CAST(rank AS INT) AS rank, CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  round(CAST(cum_tokens AS DOUBLE) / tt, 4) AS coverage
        |FROM rk CROSS JOIN tot CROSS JOIN vs
        |WHERE rank IN (100, 250, 500) OR rank = vs
        |ORDER BY rank""".stripMargin,

    "sample_bottomk_per_group" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    ${graft.functions.Md5Hash.duckHash60(
               "'b|' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, row_number() OVER (
         |    PARTITION BY lang ORDER BY h, doc_id) AS rn
         |  FROM h),
         |s AS (
         |  SELECT lang, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
         |    AS sample_ids
         |  FROM r WHERE rn <= $BottomKSample GROUP BY lang),
         |n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
         |SELECT lang, n_docs, sample_ids
         |FROM n JOIN s USING (lang) ORDER BY lang""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id % 100000000) * 2654435761) % 1000 <
        |  CASE WHEN lang = 'en' THEN 500 ELSE 200 END
        |ORDER BY doc_id""".stripMargin,

    "text_tokenize_counts" ->
      s"""WITH tok AS ($tokCte)
         |SELECT term, count(*) AS n FROM tok
         |GROUP BY term ORDER BY n DESC, term ASC LIMIT 50""".stripMargin,

    "text_tfidf_topterms" ->
      s"""WITH tok AS ($tokCte),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tfidf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term ASC) AS rn FROM scored) t
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_langid_ngram" ->
      s"""WITH $langidCtesSql
         |SELECT d.doc_id, b.prof_lang AS pred_lang, b.hits, d.lang AS true_lang
         |FROM documents d JOIN best b ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "text_langid_confusion" ->
      s"""WITH $langidCtesSql,
         |m AS (
         |  SELECT d.lang AS true_lang, b.prof_lang AS pred_lang,
         |    count(*) AS n
         |  FROM documents d JOIN best b ON d.doc_id = b.doc_id
         |  GROUP BY 1, 2),
         |tt AS (SELECT true_lang, CAST(sum(n) AS BIGINT) AS tn
         |       FROM m GROUP BY 1)
         |SELECT m.true_lang, m.pred_lang, m.n,
         |  round(CAST(m.n AS DOUBLE) / tt.tn, 4) AS recall
         |FROM m JOIN tt USING (true_lang)
         |ORDER BY true_lang, pred_lang""".stripMargin,

    "text_langid_kappa" ->
      s"""WITH $langidCtesSql,
         |m AS (
         |  SELECT d.lang AS true_lang, b.prof_lang AS pred_lang,
         |    count(*) AS n
         |  FROM documents d JOIN best b ON d.doc_id = b.doc_id
         |  GROUP BY 1, 2),
         |rowt AS (SELECT true_lang AS l, CAST(sum(n) AS BIGINT) AS rn
         |         FROM m GROUP BY 1),
         |colt AS (SELECT pred_lang AS l, CAST(sum(n) AS BIGINT) AS cn
         |         FROM m GROUP BY 1),
         |pe AS (SELECT coalesce(SUM(CAST(rn AS HUGEINT) * cn), 0) AS pp
         |       FROM rowt JOIN colt USING (l)),
         |st AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |         CAST(coalesce(SUM(CASE WHEN true_lang = pred_lang
         |           THEN n END), 0) AS BIGINT) AS diag
         |       FROM m),
         |cl AS (
         |  SELECT nn, pp, CAST(diag AS DOUBLE) / nn AS po,
         |    CAST(pp AS DOUBLE) / (CAST(nn AS DOUBLE) * nn) AS pev
         |  FROM st CROSS JOIN pe)
         |SELECT nn AS n_docs, round(po, 4) AS accuracy,
         |  round(pev, 4) AS expected_agreement,
         |  round(CASE WHEN pp = CAST(nn AS HUGEINT) * nn THEN 0.0
         |    ELSE (po - pev) / (1.0 - pev) END, 4) AS kappa
         |FROM cl""".stripMargin,

    "text_quality_score" ->
      s"""WITH tok AS ($tokCte),
         |stop AS (SELECT term FROM (
         |  SELECT term, count(*) AS c FROM tok GROUP BY 1
         |  ORDER BY c DESC, term ASC LIMIT 10) t),
         |st AS (SELECT doc_id, count(*) AS n_tokens,
         |    count(*) FILTER (WHERE term IN (SELECT term FROM stop)) AS n_stop,
         |    SUM(length(term)) AS sum_len
         |  FROM tok GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
         |  round(CAST(sum_len AS DOUBLE) / n_tokens, 4) AS avg_token_len,
         |  round(least(n_tokens / 100.0, 1.0) *
         |    (1.0 - CAST(n_stop AS DOUBLE) / n_tokens), 4) AS quality
         |FROM st ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 8) AS fp8
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_winnow_fingerprint" ->
      s"""WITH $winnowFpsSqlCtes
         |SELECT doc_id, CAST(len(fps) AS INT) AS n_fp, fps[1] AS fp_min,
         |  array_to_string(list_slice(fps, 1, 8), ',') AS fp_sample
         |FROM f ORDER BY doc_id""".stripMargin,

    "text_ngram_topk" ->
      """WITH t2 AS (SELECT lang, string_split(text, ' ') AS ts FROM documents),
        |bg AS (
        |  SELECT lang, unnest(CASE WHEN len(ts) < 2 THEN []::VARCHAR[]
        |    ELSE list_transform(range(1, len(ts)),
        |           i -> ts[i] || ' ' || ts[i+1]) END) AS bigram
        |  FROM t2),
        |cnt AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
        |SELECT lang, rn, bigram, n FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY n DESC, bigram ASC) AS INT) AS rn FROM cnt) t
        |WHERE rn <= 3 ORDER BY lang, rn""".stripMargin,

    "pipeline_dataset_card" ->
      s"""WITH base AS (
         |  SELECT source, lang, $splitCaseSql AS split,
         |    len(string_split(text, ' ')) AS ntok, md5(text) AS h
         |  FROM documents),
         |main AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         |    count(DISTINCT lang) AS n_langs,
         |    count(*) FILTER (WHERE split = 'train') AS n_train
         |  FROM base GROUP BY source),
         |dups AS (
         |  SELECT source, CAST(SUM(nh) AS BIGINT) AS n_dup_docs FROM (
         |    SELECT source, h, count(*) AS nh FROM base GROUP BY 1, 2
         |    ) g WHERE nh > 1 GROUP BY source)
         |SELECT m.source, m.n_docs, m.total_tokens, m.n_langs, m.n_train,
         |  coalesce(d.n_dup_docs, 0) AS n_dup_docs
         |FROM main m LEFT JOIN dups d USING (source)
         |ORDER BY m.source""".stripMargin,

    "text_cm_frequent_terms" -> {
      import graft.functions.Md5Hash
      s"""WITH occ AS (
         |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |oh AS (SELECT term, ${Md5Hash.duckHash60("term")} AS h FROM occ),
         |cseeds(r, a, b) AS (VALUES ${Md5Hash.duckSeedRows(4, Md5Hash.CmSeedBase)}),
         |cells AS (
         |  SELECT s.r, ${Md5Hash.duckPerm("s.a", "s.b", "oh.h")} % 1024 AS bkt,
         |    count(*) AS cnt
         |  FROM oh CROSS JOIN cseeds s GROUP BY 1, 2),
         |top AS (
         |  SELECT term, h, count(*) AS exact_n FROM oh GROUP BY term, h
         |  ORDER BY exact_n DESC, term LIMIT 10)
         |SELECT t.term, t.exact_n, min(c.cnt) AS cm_est
         |FROM top t
         |CROSS JOIN cseeds s
         |JOIN cells c ON c.r = s.r
         |  AND c.bkt = ${Md5Hash.duckPerm("s.a", "s.b", "t.h")} % 1024
         |GROUP BY t.term, t.exact_n
         |ORDER BY exact_n DESC, term""".stripMargin
    },

    "text_zipf_slope" ->
      s"""WITH tok AS ($tokCte),
         |top AS (
         |  SELECT term, count(*) AS n FROM tok GROUP BY term
         |  ORDER BY n DESC, term LIMIT 500),
         |xy AS (
         |  SELECT
         |    CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, term)
         |      AS DOUBLE)), 4) AS DECIMAL(18,4)) AS x,
         |    CAST(round(ln(CAST(n AS DOUBLE)), 4) AS DECIMAL(18,4)) AS y
         |  FROM top),
         |s AS (
         |  SELECT CAST(count(*) AS DECIMAL(6,0)) AS k,
         |    CAST(sum(x) AS DECIMAL(14,4)) AS sx,
         |    CAST(sum(y) AS DECIMAL(14,4)) AS sy,
         |    CAST(sum(x * x) AS DECIMAL(18,8)) AS sxx,
         |    CAST(sum(x * y) AS DECIMAL(18,8)) AS sxy
         |  FROM xy),
         |sl AS (
         |  SELECT *, CAST(k * sxy - sx * sy AS DOUBLE)
         |    / CAST(k * sxx - sx * sx AS DOUBLE) AS slope_d FROM s)
         |SELECT CAST(k AS BIGINT) AS n_points,
         |  round(slope_d, 4) AS slope,
         |  round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * slope_d)
         |    / CAST(k AS DOUBLE), 4) AS intercept
         |FROM sl""".stripMargin,

    "text_readability" ->
      """WITH pd AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS syl,
        |    CAST(length(text) AS BIGINT) AS ch
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(SUM(w) AS BIGINT) AS n_words,
        |  round(CAST(SUM(syl) AS DOUBLE) / SUM(w), 4) AS syll_per_word,
        |  round(CAST(SUM(ch) AS DOUBLE) / SUM(w), 4) AS chars_per_word,
        |  round(206.835 - 84.6 * (CAST(SUM(syl) AS DOUBLE) / SUM(w)), 4)
        |    AS reading_ease
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,

    "text_hapax_stats" ->
      s"""WITH tok AS ($tokCte),
         |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
         |st AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_types,
         |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
         |  FROM tf GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_types, n_hapax,
         |  round(CAST(n_types AS DOUBLE) / n_tokens, 4) AS ttr,
         |  round(CAST(n_hapax AS DOUBLE) / n_types, 4) AS hapax_share
         |FROM st ORDER BY doc_id""".stripMargin,

    "text_entropy_stats" ->
      s"""WITH tok AS ($tokCte),
         |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
         |st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_distinct,
         |    CAST(SUM(CAST(round(CAST(c AS DOUBLE) * ln(c), 4)
         |      AS DECIMAL(18,4))) AS DOUBLE) AS sc
         |  FROM tf GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_distinct,
         |  round(ln(CAST(n_tokens AS DOUBLE)) - sc / n_tokens, 4) AS entropy
         |FROM st ORDER BY doc_id""".stripMargin,

    "pipeline_inverted_index" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |df AS (SELECT term, count(*) AS df FROM tok GROUP BY term
        |  HAVING count(*) >= 5),
        |heads AS (
        |  SELECT term, array_to_string(list_sort(list(doc_id)), ',')
        |    AS postings_head
        |  FROM (SELECT *, row_number() OVER (PARTITION BY term
        |          ORDER BY doc_id) AS rn FROM tok) t
        |  WHERE rn <= 10 GROUP BY term)
        |SELECT term, df, postings_head FROM df JOIN heads USING (term)
        |ORDER BY term""".stripMargin,

    "text_bigram_entropy" ->
      """WITH t AS (
        |  SELECT source, string_split(text, ' ') AS ts FROM documents),
        |bg AS (
        |  SELECT source, z[1] AS w1, z[2] AS w2, count(*) AS cb FROM (
        |    SELECT source, unnest(CASE WHEN len(ts) < 2 THEN []
        |      ELSE list_zip(ts[1:len(ts)-1], ts[2:len(ts)]) END) AS z
        |    FROM t) q
        |  GROUP BY 1, 2, 3),
        |ctx AS (
        |  SELECT source, w1, CAST(SUM(cb) AS BIGINT) AS cu,
        |    SUM(CAST(round(CAST(cb AS DOUBLE) * log2(cb), 4)
        |      AS DECIMAL(18,4))) AS sb
        |  FROM bg GROUP BY 1, 2)
        |SELECT source, CAST(SUM(cu) AS BIGINT) AS n_bigrams,
        |  count(*) AS n_contexts,
        |  round(CAST(SUM(CAST(round(CAST(cu AS DOUBLE) * log2(cu), 4)
        |        AS DECIMAL(18,4))) - SUM(sb) AS DOUBLE)
        |    / CAST(SUM(cu) AS DOUBLE), 4) AS cond_entropy_bits
        |FROM ctx GROUP BY source ORDER BY source""".stripMargin,

    "pipeline_len_quantiles" ->
      """WITH docs AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |tot AS (SELECT source, count(*) AS n_docs, max(tok) AS max_tok
        |        FROM docs GROUP BY 1),
        |hist AS (SELECT source, tok, count(*) AS c FROM docs GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, tok,
        |    SUM(c) OVER (PARTITION BY source ORDER BY tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |ed AS (
        |  SELECT c.source, q.q, min(c.tok) AS e
        |  FROM cum c JOIN tot t USING (source)
        |  CROSS JOIN (SELECT unnest([50, 90, 99]) AS q) q
        |  WHERE c.cum * 100 >= q.q * t.n_docs
        |  GROUP BY 1, 2),
        |pv AS (
        |  SELECT source,
        |    min(CASE WHEN q = 50 THEN e END) AS p50,
        |    min(CASE WHEN q = 90 THEN e END) AS p90,
        |    min(CASE WHEN q = 99 THEN e END) AS p99
        |  FROM ed GROUP BY 1)
        |SELECT p.source, t.n_docs, p.p50, p.p90, p.p99, t.max_tok
        |FROM pv p JOIN tot t USING (source) ORDER BY p.source""".stripMargin,

    "pipeline_source_mix" ->
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         |ws AS (
         |  SELECT ${dsumSql("round(sqrt(CAST(n_docs AS DOUBLE)), 4)")}
         |    AS wsum FROM counts),
         |q AS (
         |  SELECT source, n_docs,
         |    least(n_docs, greatest(1, CAST(floor($MixTarget
         |      * round(sqrt(CAST(n_docs AS DOUBLE)), 4) / wsum) AS BIGINT)))
         |      AS quota
         |  FROM counts CROSS JOIN ws),
         |rn AS (
         |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
         |    ORDER BY md5(text), doc_id) AS rn
         |  FROM documents),
         |samp AS (
         |  SELECT r.source, count(*) AS n_sampled,
         |    array_to_string(list_slice(list_sort(list(r.doc_id)), 1, 5), ',')
         |      AS sample_head
         |  FROM rn r JOIN q USING (source) WHERE r.rn <= q.quota
         |  GROUP BY r.source)
         |SELECT q.source, q.n_docs, q.quota, s.n_sampled, s.sample_head
         |FROM q JOIN samp s USING (source)
         |ORDER BY q.source""".stripMargin,

    // bigram LM cross-entropy: the engine's two hash aggregates +
    // model join re-express as CTEs; the bigram string "w1 w2" is the
    // shared key, the per-bigram log-prob rounds to 4 dp before the
    // decimal-exact weighted sum (dsum discipline), and V is exact.
    "pipeline_lm_perplexity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |be AS (
         |  SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
         |    ELSE list_transform(range(1, len(t)),
         |           i -> t[i] || ' ' || t[i+1]) END) AS b
         |  FROM toks),
         |sp AS (SELECT doc_id, b, string_split(b, ' ')[1] AS w1 FROM be),
         |c2 AS (SELECT b, count(*) AS c2 FROM sp GROUP BY b),
         |c1 AS (SELECT w1, count(*) AS c1 FROM sp GROUP BY w1),
         |v AS (SELECT count(DISTINCT term) AS v FROM
         |  (SELECT unnest(string_split(text, ' ')) AS term FROM documents)),
         |model AS (
         |  SELECT c2.b, round(ln(CAST(c2.c2 + 1 AS DOUBLE)
         |    / (c1.c1 + v.v)), 4) AS lp
         |  FROM c2 JOIN c1 ON string_split(c2.b, ' ')[1] = c1.w1
         |  CROSS JOIN v),
         |db AS (SELECT doc_id, b, count(*) AS cb FROM sp GROUP BY doc_id, b),
         |sc AS (
         |  SELECT doc_id, CAST(SUM(cb) AS BIGINT) AS n_bigrams,
         |    ${dsumSql("round(CAST(cb AS DOUBLE) * lp, 4)")} AS slp
         |  FROM db JOIN model USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  round(-slp / n_bigrams, 4) AS cross_entropy,
         |  round(exp(-slp / n_bigrams), 4) AS perplexity
         |FROM sc ORDER BY doc_id""".stripMargin,

    "pipeline_tokenizer_fertility" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |st AS (
        |  SELECT source, count(*) AS n_words,
        |    CAST(SUM(length(w)) AS BIGINT) AS n_chars,
        |    CAST(SUM((length(w) + 3) // 4) AS BIGINT) AS n_subtokens
        |  FROM w WHERE length(w) > 0 GROUP BY 1)
        |SELECT source, n_words, n_subtokens,
        |  round(CAST(n_subtokens AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
        |    AS fertility,
        |  round(CAST(n_chars AS DOUBLE) / CAST(n_subtokens AS DOUBLE), 4)
        |    AS chars_per_token
        |FROM st ORDER BY source""".stripMargin,

    "text_token_classes" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> regexp_matches(x, '^[a-z]+$'))) AS INT) AS n_alpha,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> length(x) > 5)) AS INT) AS n_long
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_source_divergence" ->
      """WITH tc AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |cnt AS (SELECT source, term, count(*) AS c FROM tc GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |        FROM cnt GROUP BY 1),
        |sh AS (
        |  SELECT a.source AS sa, b.source AS sb, a.c AS ca, b.c AS cb,
        |    ta.n AS na, tb.n AS nb,
        |    CAST(round(ln(2.0 * CAST(a.c AS DOUBLE) * tb.n
        |      / (CAST(a.c AS DOUBLE) * tb.n + CAST(b.c AS DOUBLE) * ta.n)), 4)
        |      AS DECIMAL(18,4)) AS la,
        |    CAST(round(ln(2.0 * CAST(b.c AS DOUBLE) * ta.n
        |      / (CAST(b.c AS DOUBLE) * ta.n + CAST(a.c AS DOUBLE) * tb.n)), 4)
        |      AS DECIMAL(18,4)) AS lb
        |  FROM cnt a JOIN cnt b ON a.term = b.term AND a.source < b.source
        |  JOIN tot ta ON ta.source = a.source
        |  JOIN tot tb ON tb.source = b.source),
        |g AS (
        |  SELECT sa, sb, count(*) AS n_shared,
        |    SUM(ca * la) AS wa, SUM(cb * lb) AS wb,
        |    CAST(SUM(ca) AS BIGINT) AS sca, CAST(SUM(cb) AS BIGINT) AS scb,
        |    MAX(na) AS na, MAX(nb) AS nb
        |  FROM sh GROUP BY 1, 2)
        |SELECT sa, sb, n_shared,
        |  round(0.5 * (CAST(wa AS DOUBLE) / na
        |    + (1.0 - CAST(sca AS DOUBLE) / na) * 0.6931
        |    + CAST(wb AS DOUBLE) / nb
        |    + (1.0 - CAST(scb AS DOUBLE) / nb) * 0.6931), 4) AS js_divergence
        |FROM g ORDER BY sa, sb""".stripMargin,

    "text_novelty_curve" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN []
        |      ELSE list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |      END) AS g
        |    FROM toks) q),
        |fst AS (SELECT g, min(doc_id) AS fd FROM grams GROUP BY 1)
        |SELECT doc_id, count(*) AS n_ngrams,
        |  CAST(SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  round(CAST(SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS novelty_rate
        |FROM grams JOIN fst USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipeline_temperature_weights" ->
      """WITH cnt AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |tw AS (
        |  SELECT source, n_docs,
        |    CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 4) AS DECIMAL(18,4))
        |      AS w
        |  FROM cnt),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn, SUM(w) AS tww
        |        FROM tw),
        |sh AS (
        |  SELECT source, n_docs,
        |    round(CAST(n_docs AS DOUBLE) / tn, 4) AS raw_share,
        |    round(CAST(w AS DOUBLE) / CAST(tww AS DOUBLE), 4) AS p_temp,
        |    round(CAST(w * tn AS DOUBLE)
        |      / CAST(tww * n_docs AS DOUBLE), 4) AS boost
        |  FROM tw CROSS JOIN tot)
        |SELECT source, n_docs, raw_share, p_temp, boost
        |FROM sh ORDER BY source""".stripMargin,

    "pipeline_source_manifest" ->
      """WITH h AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS bytes,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  CAST(SUM(CAST(h AS HUGEINT)) % 1152921504606846976 AS BIGINT)
        |    AS digest
        |FROM h GROUP BY source ORDER BY source""".stripMargin,

    "text_boilerplate_prefixes" ->
      """WITH pre AS (
        |  SELECT source,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
        |      AS prefix
        |  FROM documents),
        |tot AS (SELECT source, count(*) AS tn FROM pre GROUP BY 1),
        |cnt AS (SELECT source, prefix, count(*) AS n_docs
        |        FROM pre GROUP BY 1, 2),
        |top AS (
        |  SELECT source, prefix, n_docs FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY n_docs DESC, prefix) AS rn
        |    FROM cnt) q
        |  WHERE rn <= 3)
        |SELECT t.source, t.prefix, t.n_docs,
        |  round(CAST(t.n_docs AS DOUBLE) / tt.tn, 4) AS share
        |FROM top t JOIN tot tt USING (source)
        |ORDER BY source, n_docs DESC, prefix""".stripMargin,

    "pipeline_padding_waste" ->
      """WITH toks AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        |  FROM documents),
        |bk AS (
        |  SELECT t, CASE WHEN t <= 128 THEN 128 WHEN t <= 256 THEN 256
        |    WHEN t <= 512 THEN 512 WHEN t <= 1024 THEN 1024
        |    ELSE 2048 END AS edge
        |  FROM toks),
        |g AS (
        |  SELECT edge, count(*) AS n_docs,
        |    CAST(SUM(least(t, edge)) AS BIGINT) AS kept_tokens,
        |    CAST(SUM(greatest(t - 2048, 0)) AS BIGINT) AS truncated_tokens
        |  FROM bk GROUP BY 1)
        |SELECT CAST(edge AS BIGINT) AS edge, n_docs, kept_tokens,
        |  truncated_tokens,
        |  CAST(n_docs * edge AS BIGINT) AS padded,
        |  round(CAST(n_docs * edge - kept_tokens AS DOUBLE)
        |    / (n_docs * edge), 4) AS waste_ratio
        |FROM g ORDER BY edge""".stripMargin,

    "pipeline_gate_ablation" ->
      s"""WITH tc AS (
         |  SELECT doc_id, SUM(c) AS ntok, MAX(c) AS topc FROM (
         |    SELECT doc_id, term, count(*) AS c FROM ($tokCte) GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |flags AS (
         |  SELECT d.n_chars >= $FunnelMinChars AS f1,
         |    d.lang <> '$FunnelLangBlock' AS f2,
         |    tc.ntok >= $FunnelMinTokens AS f3,
         |    CAST(tc.topc AS DOUBLE) / tc.ntok <= $FunnelMaxTopShare AS f4,
         |    row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id)
         |      = 1 AS f5
         |  FROM documents d JOIN tc USING (doc_id)),
         |c AS (
         |  SELECT count(*) AS n,
         |    count(*) FILTER (WHERE NOT f1) AS a1,
         |    count(*) FILTER (WHERE NOT f2) AS a2,
         |    count(*) FILTER (WHERE NOT f3) AS a3,
         |    count(*) FILTER (WHERE NOT f4) AS a4,
         |    count(*) FILTER (WHERE NOT f5) AS a5,
         |    count(*) FILTER (WHERE NOT f1 AND f2 AND f3 AND f4 AND f5)
         |      AS o1,
         |    count(*) FILTER (WHERE NOT f2 AND f1 AND f3 AND f4 AND f5)
         |      AS o2,
         |    count(*) FILTER (WHERE NOT f3 AND f1 AND f2 AND f4 AND f5)
         |      AS o3,
         |    count(*) FILTER (WHERE NOT f4 AND f1 AND f2 AND f3 AND f5)
         |      AS o4,
         |    count(*) FILTER (WHERE NOT f5 AND f1 AND f2 AND f3 AND f4)
         |      AS o5
         |  FROM flags)
         |SELECT stage, gate, n_fail, n_fail_only,
         |  round(CAST(n_fail AS DOUBLE) / n, 4) AS fail_share
         |FROM (
         |  SELECT 1 AS stage, 'min_chars' AS gate, a1 AS n_fail,
         |    o1 AS n_fail_only, n FROM c
         |  UNION ALL SELECT 2, 'lang_allow', a2, o2, n FROM c
         |  UNION ALL SELECT 3, 'min_tokens', a3, o3, n FROM c
         |  UNION ALL SELECT 4, 'repetition_cap', a4, o4, n FROM c
         |  UNION ALL SELECT 5, 'exact_dedup', a5, o5, n FROM c)
         |ORDER BY stage""".stripMargin,

    "pipeline_split_balance" ->
      s"""WITH sp AS (
         |  SELECT $splitCaseSql AS split,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t
         |  FROM documents),
         |stats AS (
         |  SELECT split, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS st,
         |    min(t) AS min_tokens, max(t) AS max_tokens
         |  FROM sp GROUP BY 1),
         |tt AS (
         |  SELECT t,
         |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c2
         |  FROM sp WHERE split <> 'val' GROUP BY 1),
         |cum AS (
         |  SELECT t,
         |    SUM(c1) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         |    SUM(c2) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
         |  FROM tt),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |          CAST(sum(c2) AS BIGINT) AS n2 FROM tt),
         |ks AS (
         |  SELECT round(CAST(MAX(abs(CAST(cum1 AS HUGEINT) * n2
         |      - CAST(cum2 AS HUGEINT) * n1)) AS DOUBLE)
         |    / (CAST(MAX(n1) AS DOUBLE) * MAX(n2)), 4) AS ks_train_test
         |  FROM cum CROSS JOIN tot)
         |SELECT split, n_docs,
         |  round(CAST(st AS DOUBLE) / n_docs, 4) AS mean_tokens,
         |  min_tokens, max_tokens, ks.ks_train_test
         |FROM stats CROSS JOIN ks ORDER BY split""".stripMargin,

    "text_line_dedup_census" ->
      """WITH sent AS (
        |  SELECT doc_id, source,
        |    unnest(regexp_split_to_array(text, '[.] ')) AS sent
        |  FROM documents),
        |f AS (SELECT * FROM sent
        |      WHERE len(string_split(sent, ' ')) >= 2),
        |rep AS (
        |  SELECT sent, 1 AS is_rep FROM (
        |    SELECT sent, count(DISTINCT doc_id) AS nd FROM f GROUP BY 1) q
        |  WHERE nd > 1)
        |SELECT source, count(*) AS n_sentences,
        |  CAST(coalesce(SUM(is_rep), 0) AS BIGINT) AS n_repeated,
        |  round(CAST(coalesce(SUM(is_rep), 0) AS DOUBLE) / count(*), 4)
        |    AS repeat_rate,
        |  round(CAST(coalesce(SUM(CASE WHEN is_rep = 1
        |      THEN length(f.sent) END), 0) AS DOUBLE)
        |    / SUM(length(f.sent)), 4) AS repeated_mass
        |FROM f LEFT JOIN rep USING (sent)
        |GROUP BY source ORDER BY source""".stripMargin,

    "text_pii_luhn" ->
      s"""WITH nums AS (
         |  SELECT doc_id, regexp_extract_all(text, '$LongNumRe') AS nums
         |  FROM documents),
         |f AS (SELECT doc_id, nums FROM nums WHERE len(nums) > 0)
         |SELECT doc_id, CAST(len(nums) AS INT) AS n_long_numbers,
         |  CAST(len(list_filter(nums, x ->
         |    list_aggregate(list_transform(range(1, length(x) + 1),
         |      i -> CASE WHEN i % 2 = 0 THEN
         |        CASE WHEN (ascii(substr(reverse(x), CAST(i AS INT), 1))
         |            - 48) * 2 > 9
         |          THEN (ascii(substr(reverse(x), CAST(i AS INT), 1))
         |            - 48) * 2 - 9
         |          ELSE (ascii(substr(reverse(x), CAST(i AS INT), 1))
         |            - 48) * 2 END
         |        ELSE ascii(substr(reverse(x), CAST(i AS INT), 1)) - 48
         |      END), 'sum') % 10 = 0)) AS INT) AS n_luhn_valid,
         |  len(list_filter(nums, x ->
         |    list_aggregate(list_transform(range(1, length(x) + 1),
         |      i -> CASE WHEN i % 2 = 0 THEN
         |        CASE WHEN (ascii(substr(reverse(x), CAST(i AS INT), 1))
         |            - 48) * 2 > 9
         |          THEN (ascii(substr(reverse(x), CAST(i AS INT), 1))
         |            - 48) * 2 - 9
         |          ELSE (ascii(substr(reverse(x), CAST(i AS INT), 1))
         |            - 48) * 2 END
         |        ELSE ascii(substr(reverse(x), CAST(i AS INT), 1)) - 48
         |      END), 'sum') % 10 = 0)) > 0 AS needs_review
         |FROM f ORDER BY doc_id""".stripMargin,

    "text_code_prose_ratio" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> regexp_matches(x, '[0-9_;{}()=<>]'))) AS INT)
        |      AS n_symbolic
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_symbolic,
        |  round(CAST(n_symbolic AS DOUBLE) / n_tokens, 4) AS symbol_ratio,
        |  n_symbolic * 4 > n_tokens AS looks_code
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_source_lang_mix" ->
      s"""WITH lc AS (
         |  SELECT source, lang, count(*) AS c
         |  FROM documents GROUP BY 1, 2),
         |per AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
         |    count(*) AS n_langs, CAST(max(c) AS BIGINT) AS maxc,
         |    ${Stable.dsumSql("round(CAST(c AS DOUBLE) * ln(c), 4)")} AS sc
         |  FROM lc GROUP BY 1),
         |top AS (
         |  SELECT l.source, min(l.lang) AS top_lang
         |  FROM lc l JOIN per p USING (source)
         |  WHERE l.c = p.maxc GROUP BY 1)
         |SELECT p.source, p.n_docs, p.n_langs, t.top_lang,
         |  round(CAST(p.maxc AS DOUBLE) / p.n_docs, 4) AS top_share,
         |  round(ln(CAST(p.n_docs AS DOUBLE)) - p.sc / p.n_docs, 4)
         |    AS lang_entropy
         |FROM per p JOIN top t USING (source)
         |ORDER BY p.source""".stripMargin,

    "text_heaps_law" ->
      """WITH docs AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |mx AS (SELECT max(doc_id) AS mid FROM docs),
        |qs AS (SELECT unnest(range(1, 11)) AS q),
        |dchk AS (
        |  SELECT q, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
        |  FROM docs CROSS JOIN mx CROSS JOIN qs
        |  WHERE doc_id <= (mid * q) // 10 GROUP BY 1),
        |fst AS (
        |  SELECT term, min(doc_id) AS fd FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents) t
        |  GROUP BY 1),
        |vchk AS (
        |  SELECT q, count(*) AS vocab
        |  FROM fst CROSS JOIN mx CROSS JOIN qs
        |  WHERE fd <= (mid * q) // 10 GROUP BY 1),
        |pts AS (
        |  SELECT d.q, d.n_docs, d.n_tokens, v.vocab,
        |    CAST(round(ln(CAST(d.n_tokens AS DOUBLE)), 4) AS DECIMAL(18,4))
        |      AS x,
        |    CAST(round(ln(CAST(v.vocab AS DOUBLE)), 4) AS DECIMAL(18,4))
        |      AS y
        |  FROM dchk d JOIN vchk v USING (q)),
        |s AS (
        |  SELECT CAST(count(*) AS DECIMAL(6,0)) AS k,
        |    CAST(sum(x) AS DECIMAL(14,4)) AS sx,
        |    CAST(sum(y) AS DECIMAL(14,4)) AS sy,
        |    CAST(sum(x * x) AS DECIMAL(18,8)) AS sxx,
        |    CAST(sum(x * y) AS DECIMAL(18,8)) AS sxy
        |  FROM pts),
        |fit AS (
        |  SELECT *, CAST(k * sxy - sx * sy AS DOUBLE)
        |    / CAST(k * sxx - sx * sx AS DOUBLE) AS beta_d FROM s)
        |SELECT p.q, p.n_docs, p.n_tokens, p.vocab,
        |  round(beta_d, 4) AS beta,
        |  round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * beta_d)
        |    / CAST(k AS DOUBLE), 4) AS log_k
        |FROM pts p CROSS JOIN fit ORDER BY p.q""".stripMargin,

    "pipeline_epoch_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id, ep.epoch,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(ep.epoch AS VARCHAR))
        |      AS k
        |  FROM documents
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS epoch) ep)
        |SELECT CAST(epoch AS INT) AS epoch, CAST(pos AS INT) AS pos, doc_id
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY epoch
        |    ORDER BY k, doc_id) AS pos
        |  FROM keyed) q
        |WHERE pos <= 10 ORDER BY epoch, pos""".stripMargin)
}

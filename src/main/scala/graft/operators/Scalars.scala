package graft.operators

import graft._
import graft.Stable._
import org.apache.spark.sql.functions._

/** §2.8 — scalar function batteries (string / regex / date / math /
  * case / array / map / JSON).
  *
  * Everything here is a built-in Catalyst expression — no UDFs — so
  * each query stays inside one WholeStageCodegen span over the scan.
  * Higher-order array functions (`transform`/`filter`/`aggregate`)
  * replace what a PySpark-era pipeline would do with Python UDFs,
  * at codegen speed and with no serialization boundary.
  */
object Scalars {

  val queries: Map[String, QFn] = Map(
    "scalar_string" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          substring(col("c_name"), 10, 8).as("name_tail"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
          length(col("c_name")).as("name_len"),
          element_at(split(col("c_name"), "#"), 2).as("id_part"))
        .orderBy(col("c_custkey"))
    }),

    "scalar_regex_extract" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long").as("id_num"),
          regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("seg_masked"))
        .orderBy(col("c_custkey"))
    }),

    "scalar_date" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofweek(col("o_orderdate")).as("dow"),
          ntz(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"))
        .orderBy(col("o_orderkey"))
    }),

    // calendar arithmetic breadth beyond scalar_date: month-offset
    // addition with end-of-month CLAMPING (both engines clamp
    // Jan 31 + 1 month to Feb 28/29 — the billing-date semantics),
    // last-day-of-month, quarter, and ISO week — the scheduling
    // scalars a reporting layer leans on.
    "scalar_date_arith" -> ((s, d) => {
      val od = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          add_months(od, 3).as("due_3m"),
          last_day(od).as("month_end"),
          quarter(od).as("qtr"),
          weekofyear(od).as("iso_week"))
        .orderBy(col("o_orderkey"))
    }),

    "scalar_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          r4(pow(lit(1.0) + col("l_discount"), 2)).as("disc_sq"),
          r4(log(col("l_extendedprice"))).as("price_ln"),
          (col("l_orderkey") % 7).as("key_mod7"))
        // (l_orderkey, l_linenumber) is not unique (see Scans) — order
        // over every non-derived output column
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_r1"),
          col("price_floor"), col("price_ceil"), col("disc_dev"),
          col("disc_sq"), col("price_ln"))
    }),

    // cryptographic hash breadth: md5 + sha256 are bit-identical in
    // every engine (the fingerprint/content-address layer of a data
    // pipeline); hex output compared byte-for-byte
    "scalar_hash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"),
          md5(concat(col("source"), lit(":"), col("doc_id").cast("string")))
            .as("h_key"))
        .orderBy(col("doc_id"))
    }),

    // bitwise scalar breadth: and/or/xor/shift/popcount — pure integer
    // ops, identical in every engine (the bit-twiddling layer under
    // bloom filters, bitmap indexes, and hash partitioners)
    "scalar_bitwise" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000L)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("k_and"),
          (col("o_orderkey").bitwiseOR(lit(4096L))).as("k_or"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("k_xor"),
          shiftleft(col("o_orderkey"), 3).as("k_shl"),
          shiftright(col("o_orderkey"), 2).as("k_shr"),
          bit_count(col("o_orderkey")).as("k_pop"))
        .orderBy(col("o_orderkey"))
    }),

    "scalar_case_coalesce" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", 1)
            .when(col("o_orderpriority") === "2-HIGH", 2)
            .otherwise(9).as("severity"),
          coalesce(expr("nullif(o_orderstatus, 'O')"), lit("OPEN")).as("status_or_open"),
          greatest(col("o_totalprice"), lit(50000.0)).as("price_floor50k"),
          least(col("o_totalprice"), lit(200000.0)).as("price_cap200k"))
        .orderBy(col("o_orderkey"))
    }),

    // higher-order functions over the embedding array — the codegen
    // path for elementwise vector work (no UDF, no shuffle)
    "scalar_array" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          r4(element_at(col("embedding"), 1).cast("double")).as("first_val"),
          size(expr("filter(embedding, x -> x > 0)")).as("n_pos"),
          r4(expr("aggregate(filter(embedding, x -> x > 0), CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))")).as("sum_pos"))
        .orderBy(col("vec_id"))
    }),

    // map built per group then scalars extracted (MAP parquet encoding
    // differs across engines → plan A of SURVEY §2.8: output scalars)
    "scalar_map" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(col("user_id"),
          coalesce(element_at(col("m"), "view"), lit(0L)).as("n_view"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"))
        .orderBy(col("user_id"))
    }),

    "scalar_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"), col("value"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("sum_value"))
        .orderBy(col("k_bucket"))
    }),

    // three-valued-logic breadth: null-safe equality (<=> / IS NOT
    // DISTINCT FROM), IS NULL as a value, coalesce defaults, and the
    // nvl2 CASE shape — over a synthesized nullable column (the data
    // has no physical NULLs; nullif creates them, same trick as
    // filter_disj_null)
    "scalar_null_semantics" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("nullif(o_orderpriority, '5-LOW')").as("pri_n"))
        .select(col("o_orderkey"),
          col("pri_n").isNull.cast("int").as("is_null"),
          expr("pri_n <=> '1-URGENT'").cast("int").as("ns_eq_urgent"),
          expr("pri_n <=> CAST(NULL AS STRING)").cast("int").as("ns_eq_null"),
          coalesce(col("pri_n"), lit("(none)")).as("pri_filled"),
          expr("CASE WHEN pri_n IS NOT NULL THEN CAST(length(pri_n) AS BIGINT) ELSE CAST(-1 AS BIGINT) END")
            .as("nvl2_len"))
        .orderBy(col("o_orderkey"))),

    // URL parsing breadth: synthesize a deterministic URL per document
    // (the corpus carries no physical URLs) and parse it back with
    // Spark's codegen'd parse_url — host, path, one query parameter.
    // The oracle re-derives the same parts with anchored regexps;
    // equivalence holds because the synthesized URLs are well-formed
    // by construction (declared semantics — parse_url and the regexp
    // disagree only on malformed input).
    "scalar_url_extract" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id"),
          lit("?lang="), col("lang"), lit("&v=2")).as("url"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
        .orderBy(col("doc_id"))),

    // CSV-line parsing scalar — completes the text-format scalar
    // battery (json/xml/variant/url/csv): a delimited record
    // synthesized per customer (the scalar_url_extract discipline),
    // parsed back typed with `from_csv` against a pinned schema — the
    // per-row form of the CSV SOURCE (sources/TextSources) for
    // embedded delimited payloads (a log line's CSV tail, a
    // measurement field). Oracle re-splits the same line. Values
    // carry no delimiter by construction (declared semantics — CSV
    // quoting is the source layer's job, TextSourcesSpec pins it).
    "scalar_csv" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), concat_ws(",", col("c_custkey"),
          col("c_mktsegment"), col("c_nationkey")).as("line"))
        .select(col("c_custkey"), col("line"),
          expr("from_csv(line, 'id BIGINT, seg STRING, nat INT')").as("r"))
        .select(col("c_custkey"), col("line"),
          col("r.id").as("id"), col("r.seg").as("seg"),
          col("r.nat").as("nat"))
        .orderBy(col("c_custkey"))),

    // Spark 4 VARIANT path for semi-structured data — the
    // engine-native twin of scalar_json's string-path
    // get_json_object: `parse_json` builds the binary VARIANT value
    // once (the open-format shredded encoding Spark 4 introduces for
    // exactly the 100 TB semi-structured case — field access is an
    // offset lookup, not a re-parse), `variant_get` extracts a typed
    // field, `try_variant_get` returns NULL on a missing path instead
    // of erroring (the null-semantics contract of schema-free data).
    // The VARIANT value itself never reaches the output (binary
    // encoding is engine-private — the scalar_map plan-A discipline);
    // the oracle re-derives the same scalars from the JSON text.
    "scalar_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
          expr("try_variant_get(parse_json(props), '$.absent', 'string')")
            .as("absent"))
        .orderBy(col("event_id"))),

    // XML parsing breadth (VERDICT r9 #2 — the reconstructed
    // reference's parse stage is weekly XML records): synthesize a
    // deterministic XML record per part (the corpus carries no
    // physical XML — the scalar_url_extract discipline) and parse it
    // back TWO ways in one pass: Spark 4's native `from_xml` fills
    // the typed struct (the id ATTRIBUTE via the `_`-prefix
    // convention, a string element, an int element, and the repeated
    // <w> element as an array), and the `xpath` family independently
    // counts the repeated element. The oracle re-extracts the same
    // fields from the same string with anchored regexps; equivalence
    // holds because the synthesized records are well-formed by
    // construction (field values are [a-zA-Z0-9 ] — no XML escaping
    // exists to disagree on, declared semantics). Pure codegen'd
    // string build + a per-row parse: no shuffle, no UDF, scan →
    // project at any scale.
    "scalar_xml" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), concat(
          lit("<p id=\""), col("p_partkey"), lit("\"><ty>"), col("p_type"),
          lit("</ty><sz>"), col("p_size"), lit("</sz>"),
          expr("array_join(transform(split(p_name, ' '), " +
            "t -> concat('<w>', t, '</w>')), '')"),
          lit("</p>")).as("x"))
        .select(col("p_partkey"), col("x"),
          expr("from_xml(x, '_id BIGINT, ty STRING, sz INT, w ARRAY<STRING>')")
            .as("px"),
          expr("xpath(x, '/p/w/text()')").as("ws"))
        .select(col("p_partkey"), col("x"),
          col("px._id").as("xml_id"),
          col("px.ty").as("ty"),
          col("px.sz").as("sz"),
          // BIGINT like the oracle's len() (differ dtype discipline)
          size(col("ws")).cast("long").as("n_w"),
          array_join(col("px.w"), ",").as("words"))
        .orderBy(col("p_partkey"))))

  val oracle: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substring(c_name, 10, 8) AS name_tail,
        |  concat_ws('-', c_mktsegment, c_name) AS seg_name,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  string_split(c_name, '#')[2] AS id_part
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_regex_extract" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS id_num,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS due_3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(date_part('year', o_orderdate) AS INT) AS yr,
        |  CAST(date_part('month', o_orderdate) AS INT) AS mo,
        |  CAST(date_part('dow', o_orderdate) + 1 AS INT) AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS price_r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  round(pow(1.0 + l_discount, 2), 4) AS disc_sq,
        |  round(ln(l_extendedprice), 4) AS price_ln,
        |  l_orderkey % 7 AS key_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_r1,
        |  price_floor, price_ceil, disc_dev, disc_sq, price_ln""".stripMargin,

    "scalar_hash" ->
      """SELECT doc_id,
        |  md5(text) AS h_md5,
        |  sha256(text) AS h_sha256,
        |  md5(source || ':' || CAST(doc_id AS VARCHAR)) AS h_key
        |FROM documents ORDER BY doc_id""".stripMargin,

    "scalar_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS k_and,
        |  o_orderkey | 4096 AS k_or,
        |  xor(o_orderkey, o_custkey) AS k_xor,
        |  o_orderkey << 3 AS k_shl,
        |  o_orderkey >> 2 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS k_pop
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin,

    "scalar_case_coalesce" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1
        |       WHEN o_orderpriority = '2-HIGH' THEN 2
        |       ELSE 9 END AS severity,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |  greatest(o_totalprice, 50000.0) AS price_floor50k,
        |  least(o_totalprice, 200000.0) AS price_cap200k
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "scalar_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  round(list_aggregate(list_transform(list_filter(embedding, x -> x > 0),
        |    x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "scalar_map" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "scalar_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "scalar_null_semantics" ->
      """SELECT o_orderkey,
        |  CAST(pri_n IS NULL AS INT) AS is_null,
        |  CAST(pri_n IS NOT DISTINCT FROM '1-URGENT' AS INT) AS ns_eq_urgent,
        |  CAST(pri_n IS NOT DISTINCT FROM NULL AS INT) AS ns_eq_null,
        |  coalesce(pri_n, '(none)') AS pri_filled,
        |  CASE WHEN pri_n IS NOT NULL THEN CAST(length(pri_n) AS BIGINT)
        |       ELSE CAST(-1 AS BIGINT) END AS nvl2_len
        |FROM (SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS pri_n
        |      FROM orders) t
        |ORDER BY o_orderkey""".stripMargin,

    "scalar_url_extract" ->
      """SELECT doc_id, url,
        |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
        |FROM (
        |  SELECT doc_id, 'https://' || source || '.example.com/docs/'
        |    || doc_id || '?lang=' || lang || '&v=2' AS url
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "scalar_csv" ->
      """SELECT c_custkey, line,
        |  CAST(string_split(line, ',')[1] AS BIGINT) AS id,
        |  string_split(line, ',')[2] AS seg,
        |  CAST(string_split(line, ',')[3] AS INT) AS nat
        |FROM (
        |  SELECT c_custkey, CAST(c_custkey AS VARCHAR) || ',' ||
        |    c_mktsegment || ',' || CAST(c_nationkey AS VARCHAR) AS line
        |  FROM customer) t
        |ORDER BY c_custkey""".stripMargin,

    "scalar_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(NULL AS VARCHAR) AS absent
        |FROM events ORDER BY event_id""".stripMargin,

    "scalar_xml" ->
      """SELECT p_partkey, x,
        |  CAST(regexp_extract(x, 'id="(\d+)"', 1) AS BIGINT) AS xml_id,
        |  regexp_extract(x, '<ty>([^<]*)</ty>', 1) AS ty,
        |  CAST(regexp_extract(x, '<sz>(\d+)</sz>', 1) AS INT) AS sz,
        |  len(regexp_extract_all(x, '<w>([^<]*)</w>', 1)) AS n_w,
        |  array_to_string(regexp_extract_all(x, '<w>([^<]*)</w>', 1), ',')
        |    AS words
        |FROM (
        |  SELECT p_partkey, '<p id="' || p_partkey || '"><ty>' || p_type
        |    || '</ty><sz>' || p_size || '</sz>'
        |    || array_to_string(list_transform(string_split(p_name, ' '),
        |         t -> '<w>' || t || '</w>'), '') || '</p>' AS x
        |  FROM part) t
        |ORDER BY p_partkey""".stripMargin)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar-function-family coverage (SURVEY.md §2.3 "scalar functions"):
  * string, date/time, math, array, map/struct, JSON — the families the
  * reference delegates entirely to user Python code (its only built-ins
  * are `str.split` and `re.findall`, `count_functions.py:2`,
  * `fernan/functions.py:5`).
  *
  * All narrow, codegen'd projections. Cross-engine determinism notes:
  * math is restricted to IEEE-exact ops (sqrt, abs, floor, ceil,
  * power-of-two); no libm-dependent log/exp in oracle-checked output.
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  /** String family over part names/types. */
  private val strings: Q = (s, d) =>
    Tables.part(s, d).where(col("p_partkey") <= 500).selectExpr(
      "p_partkey",
      "upper(p_name) AS up",
      "lower(p_type) AS lo",
      "length(p_name) AS len",
      "substring(p_name, 1, 5) AS pre",
      "concat(p_brand, ':', p_type) AS tagged",
      "replace(p_name, ' ', '_') AS snake",
      "lpad(CAST(p_size AS STRING), 4, '0') AS padded",
      "trim(p_name) AS trimmed",
      "split(p_type, ' ')[0] AS first_word",
      "reverse(p_brand) AS rev",
      "contains(p_type, 'brushed') AS has_brushed",
      "startswith(p_name, 'a') AS a_start",
      "levenshtein(p_brand, 'Brand#11') AS lev")

  /** Date/time family over orders. */
  private val dates: Q = (s, d) =>
    Tables.orders(s, d).where(col("o_orderkey") <= 2000).selectExpr(
      "o_orderkey",
      "year(o_orderdate) AS y",
      "month(o_orderdate) AS m",
      "day(o_orderdate) AS dd",
      "date_trunc('month', o_orderdate) AS month_start",
      "CAST(CAST(o_orderdate + INTERVAL 30 DAYS AS DATE) AS STRING) AS due30",
      "datediff(DATE'1998-01-01', CAST(o_orderdate AS DATE)) AS days_to_98",
      "dayofweek(o_orderdate) AS dow",
      "quarter(o_orderdate) AS q",
      "CAST(last_day(o_orderdate) AS STRING) AS eom")

  /** Math family over lineitem (IEEE-exact subset). */
  private val maths: Q = (s, d) =>
    Tables.lineitem(s, d).where(col("l_orderkey") <= 500).selectExpr(
      "l_orderkey", "l_linenumber",
      "abs(l_discount - 0.05) AS centered",
      "sqrt(l_quantity) AS sq",
      "floor(l_extendedprice) AS fl",
      "ceil(l_extendedprice) AS ce",
      "l_quantity * l_quantity AS qsq",
      "sign(l_discount - 0.05) AS sgn",
      "greatest(l_tax, l_discount) AS gmax",
      "least(l_tax, l_discount) AS gmin",
      "CAST(l_quantity AS INT) % 7 AS m7")

  /** Array family over document tokens. */
  private val arrays: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("tok", expr("filter(split(text, ' '), t -> t <> '')"))
      .selectExpr(
        "doc_id",
        // array results flattened to strings: engines (and the driver's
        // canonicalizer) render nested arrays differently
        "array_join(slice(tok, 1, 3), '-') AS first3",
        "array_join(array_sort(array_distinct(tok)), ',') AS sorted_vocab",
        "array_contains(tok, 'spark') AS has_spark",
        "array_position(tok, 'data') AS data_pos",
        "array_max(transform(tok, t -> length(t))) AS max_len",
        "size(array_intersect(tok, array('the', 'a', 'data'))) AS n_common")

  /** JSON family over events.props. */
  private val jsons: Q = (s, d) =>
    Tables.events(s, d).where(col("event_id") <= 2000).selectExpr(
      "event_id",
      "CAST(get_json_object(props, '$.k') AS INT) AS k",
      "CAST(get_json_object(props, '$.k') AS INT) * 2 AS k2",
      "get_json_object(props, '$.missing') IS NULL AS no_missing")

  /** Map + struct family: build, access, restructure (scalar outputs so
    * the oracle compares engine-neutral values). */
  private val mapsStructs: Q = (s, d) =>
    Tables.nation(s, d)
      .withColumn("m", expr("map_from_arrays(array('key', 'region'), array(n_nationkey, n_regionkey))"))
      .withColumn("st", expr("named_struct('name', n_name, 'rk', n_regionkey)"))
      .selectExpr(
        "n_nationkey",
        "element_at(m, 'region') AS region_from_map",
        "st.name AS name_from_struct",
        "st.rk + 100 AS shifted_rk",
        "size(map_keys(m)) AS n_keys")

  /** Regex family over part names (ASCII corpus, Java/RE2-common
    * syntax; `p_name` is multi-word lowercase, `p_type` single-word
    * uppercase). */
  private val regexes: Q = (s, d) =>
    Tables.part(s, d).where(col("p_partkey") <= 500).selectExpr(
      "p_partkey",
      "regexp_extract(p_name, '([a-z]+)$', 1) AS last_word",
      "regexp_replace(p_name, '[aeiou]', '*') AS starred",
      "p_type RLIKE '^ECO' AS is_eco",
      "size(regexp_extract_all(p_name, '[a-z]+', 0)) AS n_words",
      "array_join(regexp_extract_all(p_name, '[a-z]+', 0), '|') AS name_words")

  /** Conditional family over customer (CASE, IF, coalesce/nullif). */
  private val conditionals: Q = (s, d) =>
    Tables.customer(s, d).where(col("c_custkey") <= 500).selectExpr(
      "c_custkey",
      "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band",
      "IF(c_mktsegment = 'BUILDING', 1, 0) AS is_building",
      "coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg_renamed",
      "CASE c_nationkey % 2 WHEN 0 THEN 'even' ELSE 'odd' END AS parity")

  /** Bitwise family over lineitem keys. */
  private val bitwises: Q = (s, d) =>
    Tables.lineitem(s, d).where(col("l_orderkey") <= 500).selectExpr(
      "l_orderkey", "l_linenumber",
      "l_orderkey & 255 AS low_byte",
      "l_partkey | 1 AS odd_part",
      "l_orderkey ^ l_partkey AS mixed",
      "shiftleft(l_linenumber, 3) AS shl",
      "shiftright(l_partkey, 2) AS shr",
      "bit_count(l_orderkey) AS pop")

  /** URL family (parse_url/url_encode/url_decode) over synthetic doc
    * URLs — the link-metadata extraction a crawl pipeline runs per page.
    * The oracle derives each component independently from the same
    * columns (host/path/query are constructions, not parses), so the
    * check validates Spark's parser against ground truth rather than
    * against itself. */
  private val urls: Q = (s, d) =>
    Tables.documents(s, d)
      .selectExpr("doc_id", "lang", "source",
        "concat('https://', source, '.example.com/docs/', lang, '/', doc_id," +
          " '?page=', doc_id % 7, '&ref=feed') AS url")
      .selectExpr(
        "doc_id", "url",
        "parse_url(url, 'PROTOCOL') AS proto",
        "parse_url(url, 'HOST') AS host",
        "parse_url(url, 'PATH') AS path",
        "parse_url(url, 'QUERY') AS query",
        "parse_url(url, 'QUERY', 'page') AS page",
        "url_encode(concat(lang, ' ', source)) AS enc",
        "url_decode('a%20b%2Fc') AS dec")

  /** Fuzzy matching (edit distance) with STRUCTURAL blocking — the
    * entity-resolution primitive: nation-name pairs within
    * levenshtein ≤ 1. |len(a) − len(b)| lower-bounds the edit
    * distance, so the left side EXPLODES to its admissible length band
    * {len−1, len, len+1} and candidates come from an EQUI hash join on
    * (band = length) — a key-partitioned join the planner can hash,
    * never the all-pairs nested loop a `ka < kb` theta join degenerates
    * to. At 100 TB the band key extends with a name prefix / q-gram;
    * the quadratic metric only ever scores candidates. */
  private val fuzzy: Q = (s, d) => {
    val a = Tables.nation(s, d)
      .select(col("n_nationkey").as("ka"), col("n_name").as("a"))
      .withColumn("band",
        explode(array(length(col("a")) - 1, length(col("a")), length(col("a")) + 1)))
    val b = Tables.nation(s, d)
      .select(col("n_nationkey").as("kb"), col("n_name").as("b"),
        length(col("n_name")).as("band"))
    a.join(b, Seq("band"))
      .where(col("ka") < col("kb"))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .where(col("dist") <= 1)
      // no dedup needed: b carries exactly one band (its own length), so
      // each (ka, kb) pair survives on exactly one band value
      .select("ka", "kb", "a", "b", "dist")
  }

  val queries: Map[String, Q] = Map(
    "fn_fuzzy" -> fuzzy,
    "fn_url" -> urls,
    "fn_string" -> strings,
    "fn_date" -> dates,
    "fn_math" -> maths,
    "fn_array" -> arrays,
    "fn_json" -> jsons,
    "fn_map_struct" -> mapsStructs,
    "fn_regex" -> regexes,
    "fn_conditional" -> conditionals,
    "fn_bitwise" -> bitwises,
  )

  val oracle: Map[String, String] = Map(
    "fn_fuzzy" ->
      """SELECT ka, kb, a, b, dist FROM (
           SELECT n1.n_nationkey AS ka, n2.n_nationkey AS kb,
             n1.n_name AS a, n2.n_name AS b,
             levenshtein(n1.n_name, n2.n_name) AS dist
           FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey
           WHERE abs(length(n1.n_name) - length(n2.n_name)) <= 1)
         WHERE dist <= 1""",
    // independent construction of every URL component from the same
    // columns (lang/source are [a-z0-9]+, so x-www-form-urlencoded
    // encoding is identity except the joining space → '+')
    "fn_url" ->
      """SELECT doc_id,
         concat('https://', source, '.example.com/docs/', lang, '/',
                CAST(doc_id AS VARCHAR), '?page=', CAST(doc_id % 7 AS VARCHAR),
                '&ref=feed') AS url,
         'https' AS proto,
         concat(source, '.example.com') AS host,
         concat('/docs/', lang, '/', CAST(doc_id AS VARCHAR)) AS path,
         concat('page=', CAST(doc_id % 7 AS VARCHAR), '&ref=feed') AS query,
         CAST(doc_id % 7 AS VARCHAR) AS page,
         concat(lang, '+', source) AS enc,
         'a b/c' AS dec
         FROM documents""",
    "fn_string" ->
      """SELECT p_partkey,
         upper(p_name) AS up, lower(p_type) AS lo, length(p_name) AS len,
         substring(p_name, 1, 5) AS pre,
         concat(p_brand, ':', p_type) AS tagged,
         replace(p_name, ' ', '_') AS snake,
         lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
         trim(p_name) AS trimmed,
         string_split(p_type, ' ')[1] AS first_word,
         reverse(p_brand) AS rev,
         contains(p_type, 'brushed') AS has_brushed,
         starts_with(p_name, 'a') AS a_start,
         levenshtein(p_brand, 'Brand#11') AS lev
         FROM part WHERE p_partkey <= 500""",
    "fn_date" ->
      """SELECT o_orderkey,
         year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dd,
         date_trunc('month', o_orderdate) AS month_start,
         CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due30,
         datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
         dayofweek(o_orderdate) + 1 AS dow,
         quarter(o_orderdate) AS q,
         CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom
         FROM orders WHERE o_orderkey <= 2000""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
         abs(l_discount - 0.05) AS centered,
         sqrt(l_quantity) AS sq,
         CAST(floor(l_extendedprice) AS BIGINT) AS fl,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
         l_quantity * l_quantity AS qsq,
         CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
         greatest(l_tax, l_discount) AS gmax,
         least(l_tax, l_discount) AS gmin,
         CAST(l_quantity AS INT) % 7 AS m7
         FROM lineitem WHERE l_orderkey <= 500""",
    "fn_array" ->
      """SELECT doc_id,
         array_to_string(tok[1:3], '-') AS first3,
         array_to_string(list_sort(list_distinct(tok)), ',') AS sorted_vocab,
         list_contains(tok, 'spark') AS has_spark,
         COALESCE(list_position(tok, 'data'), 0) AS data_pos,
         list_max(list_transform(tok, t -> length(t))) AS max_len,
         len(list_intersect(tok, ['the', 'a', 'data'])) AS n_common
         FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') tok
               FROM documents)""",
    "fn_json" ->
      """SELECT event_id,
         CAST(json_extract(props, '$.k') AS INT) AS k,
         CAST(json_extract(props, '$.k') AS INT) * 2 AS k2,
         json_extract(props, '$.missing') IS NULL AS no_missing
         FROM events WHERE event_id <= 2000""",
    "fn_regex" ->
      """SELECT p_partkey,
         regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
         regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
         regexp_matches(p_type, '^ECO') AS is_eco,
         len(regexp_extract_all(p_name, '[a-z]+', 0)) AS n_words,
         COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), '|'), '')
           AS name_words
         FROM part WHERE p_partkey <= 500""",
    "fn_conditional" ->
      """SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_building,
         coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg_renamed,
         CASE c_nationkey % 2 WHEN 0 THEN 'even' ELSE 'odd' END AS parity
         FROM customer WHERE c_custkey <= 500""",
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
         l_orderkey & 255 AS low_byte,
         l_partkey | 1 AS odd_part,
         xor(l_orderkey, l_partkey) AS mixed,
         l_linenumber << 3 AS shl,
         l_partkey >> 2 AS shr,
         bit_count(l_orderkey) AS pop
         FROM lineitem WHERE l_orderkey <= 500""",
    "fn_map_struct" ->
      """SELECT n_nationkey,
         n_regionkey AS region_from_map,
         n_name AS name_from_struct,
         n_regionkey + 100 AS shifted_rk,
         2 AS n_keys
         FROM nation""",
  )
}

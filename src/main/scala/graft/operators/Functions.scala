package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Scalar function families (SURVEY.md §2.B.7) — one multi-function query
  * per family, each ending in a total ORDER BY on the primary key. All are
  * built-in codegen'd expressions (no UDFs), so they fuse into the
  * surrounding WholeStageCodegen pipeline and stay columnar-scan friendly.
  *
  * Cross-engine gotchas handled here:
  *  - DuckDB `dayofweek` is 0-based (Sunday=0) vs Spark 1-based → +1 shim;
  *  - double→int casts: Spark truncates, DuckDB rounds → use floor/ceil;
  *  - JSON: oracle uses regexp extraction (engine-portable), Spark side
  *    uses the idiomatic from_json path.
  */
object Functions {

  val qFnString: GQuery = GQuery(
    "q_fn_string",
    (spark, dir) => {
      import spark.implicits._
      Tables.part(spark, dir)
        .select(
          $"p_partkey",
          upper($"p_brand").as("brand_upper"),
          lower($"p_type").as("type_lower"),
          length($"p_name").as("name_len"),
          substring($"p_name", 1, 8).as("name_prefix"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
          ltrim(rtrim($"p_name")).as("name_trim"),
          lpad($"p_brand", 12, "*").as("brand_padded"),
          regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
          regexp_replace($"p_name", "\\s+", "_").as("name_snake"),
          instr($"p_type", "a").as("a_pos"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        upper(p_brand) AS brand_upper,
        lower(p_type) AS type_lower,
        cast(length(p_name) as int) AS name_len,
        substring(p_name, 1, 8) AS name_prefix,
        p_brand || '#' || p_type AS brand_type,
        ltrim(rtrim(p_name)) AS name_trim,
        lpad(p_brand, 12, '*') AS brand_padded,
        regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
        cast(strpos(p_type, 'a') as int) AS a_pos
      FROM part ORDER BY p_partkey"""),
  )

  val qFnDate: GQuery = GQuery(
    "q_fn_date",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("dy"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          (dayofweek($"o_orderdate")).as("dow"),
          datediff(to_date($"o_orderdate"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          add_months(to_date($"o_orderdate"), 3).as("plus3m"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        cast(year(o_orderdate) as int) AS yr,
        cast(month(o_orderdate) as int) AS mo,
        cast(day(o_orderdate) as int) AS dy,
        date_trunc('month', o_orderdate) AS month_start,
        cast(dayofweek(o_orderdate) + 1 as int) AS dow,
        cast(datediff('day', DATE '1995-01-01', cast(o_orderdate as date)) as int)
          AS days_since,
        cast(cast(o_orderdate as date) + INTERVAL 3 MONTH as date) AS plus3m
      FROM orders ORDER BY o_orderkey"""),
  )

  val qFnMath: GQuery = GQuery(
    "q_fn_math",
    (spark, dir) => {
      import spark.implicits._
      Tables.part(spark, dir)
        .select(
          $"p_partkey",
          r2(abs($"p_retailprice" - lit(1000.0))).as("abs_diff"),
          floor($"p_retailprice").cast("long").as("price_floor"),
          ceil($"p_retailprice").cast("long").as("price_ceil"),
          r6(sqrt($"p_retailprice")).as("price_sqrt"),
          pow($"p_size", 2).cast("long").as("size_sq"),
          pmod($"p_size", lit(7)).as("size_mod7"),
          signum($"p_retailprice" - lit(1500.0)).cast("int").as("price_sign"),
          least($"p_size", lit(25)).as("size_capped"),
          greatest($"p_size", lit(10)).as("size_floor10"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        floor((abs(p_retailprice - 1000.0)) * 1e2 + 0.5) / 1e2 AS abs_diff,
        cast(floor(p_retailprice) as bigint) AS price_floor,
        cast(ceil(p_retailprice) as bigint) AS price_ceil,
        floor((sqrt(p_retailprice)) * 1e6 + 0.5) / 1e6 AS price_sqrt,
        cast(p_size * p_size as bigint) AS size_sq,
        p_size % 7 AS size_mod7,
        cast(sign(p_retailprice - 1500.0) as int) AS price_sign,
        cast(least(p_size, 25) as int) AS size_capped,
        cast(greatest(p_size, 10) as int) AS size_floor10
      FROM part ORDER BY p_partkey"""),
  )

  val qFnArray: GQuery = GQuery(
    "q_fn_array",
    (spark, dir) => {
      import spark.implicits._
      val toks = split($"text", " ")
      Tables.documents(spark, dir)
        .select(
          $"doc_id",
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          // comma-joined scalar, not a list cell: the driver's compare
          // harness can't hash list outputs (ADVICE r1)
          array_join(slice(array_sort(toks), 1, 3), ",").as("first3"),
          array_contains(toks, "data").as("has_data"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        cast(len(string_split(text, ' ')) as int) AS n_tokens,
        cast(len(list_distinct(string_split(text, ' '))) as int) AS n_distinct,
        array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ',') AS first3,
        list_contains(string_split(text, ' '), 'data') AS has_data
      FROM documents ORDER BY doc_id"""),
  )

  /** JSON extraction from events.props. Spark side: from_json into a typed
    * map (the idiomatic path); oracle: regexp extraction so the check does
    * not depend on DuckDB's json extension. */
  val qFnJson: GQuery = GQuery(
    "q_fn_json",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("k",
          from_json($"props",
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
            .getItem("k"))
        .groupBy($"event_type")
        .agg(
          count($"k").as("n_with_k"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
        count(k) AS n_with_k, cast(sum(k) as bigint) AS sum_k,
        min(k) AS min_k, max(k) AS max_k
      FROM (
        SELECT event_type,
          cast(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) as bigint) AS k
        FROM events) t
      GROUP BY event_type ORDER BY event_type"""),
  )

  /** Bitwise family. DuckDB's `^` is exponentiation (xor is `xor()`), and
    * its shifts return the operand type — casts pin both engines to
    * bigint. */
  val qFnBitwise: GQuery = GQuery(
    "q_fn_bitwise",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .select(
          $"o_orderkey",
          ($"o_orderkey".bitwiseAND($"o_custkey")).as("k_and"),
          ($"o_orderkey".bitwiseOR($"o_custkey")).as("k_or"),
          ($"o_orderkey".bitwiseXOR($"o_custkey")).as("k_xor"),
          expr("shiftleft(o_orderkey, 3)").as("k_shl"),
          expr("shiftright(o_orderkey, 2)").as("k_shr"),
          bitwise_not($"o_orderkey").as("k_not"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        o_orderkey & o_custkey AS k_and,
        o_orderkey | o_custkey AS k_or,
        xor(o_orderkey, o_custkey) AS k_xor,
        cast(o_orderkey << 3 as bigint) AS k_shl,
        cast(o_orderkey >> 2 as bigint) AS k_shr,
        ~o_orderkey AS k_not
      FROM orders ORDER BY o_orderkey"""),
  )

  /** Extended string/regex family beyond q_fn_string: boolean regex match,
    * multi-group extraction, split_part, edit distance, reverse/repeat/
    * translate. Patterns stick to char classes + anchors — the subset where
    * Java regex (Spark) and RE2 (DuckDB) agree. All codegen'd built-ins. */
  val qFnRegex: GQuery = GQuery(
    "q_fn_regex",
    (spark, dir) => {
      import spark.implicits._
      Tables.part(spark, dir)
        .select(
          $"p_partkey",
          $"p_type".rlike("^[a-z]+ [a-z]+").as("two_words"),
          regexp_extract($"p_type", "([a-z]+) ([a-z]+)", 2).as("second_word"),
          expr("split_part(p_type, ' ', 1)").as("first_part"),
          levenshtein($"p_brand", lit("Brand#11")).as("edit_dist"),
          reverse($"p_brand").as("brand_rev"),
          expr("repeat('=', p_size % 5)").as("bar"),
          translate($"p_name", "aeiou", "AEIOU").as("name_caps_vowels"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        regexp_matches(p_type, '^[a-z]+ [a-z]+') AS two_words,
        regexp_extract(p_type, '([a-z]+) ([a-z]+)', 2) AS second_word,
        split_part(p_type, ' ', 1) AS first_part,
        cast(levenshtein(p_brand, 'Brand#11') as int) AS edit_dist,
        reverse(p_brand) AS brand_rev,
        repeat('=', p_size % 5) AS bar,
        translate(p_name, 'aeiou', 'AEIOU') AS name_caps_vowels
      FROM part ORDER BY p_partkey"""),
  )

  /** Hashing / encoding family: md5, sha-256, hex. Both engines emit
    * lowercase hex digests for md5/sha and uppercase minimal hex for
    * integers. Content hashing is the backbone of exact dedup + data
    * fingerprinting at 100 TB — one codegen'd pass, no shuffle. */
  val qFnHash: GQuery = GQuery(
    "q_fn_hash",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(
          $"doc_id",
          md5($"text".cast("binary")).as("md5_hex"),
          sha2($"text".cast("binary"), 256).as("sha256_hex"),
          hex($"doc_id").as("id_hex"),
          substring(md5($"text".cast("binary")), 1, 8).as("bucket_key"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        md5(text) AS md5_hex,
        sha256(text) AS sha256_hex,
        hex(doc_id) AS id_hex,
        substring(md5(text), 1, 8) AS bucket_key
      FROM documents ORDER BY doc_id"""),
  )

  /** Generator / lateral view: posexplode of the token array — the
    * row-expanding operator (1 doc → n token rows). Spark plans a
    * whole-stage-codegen'd Generate with no shuffle; the DuckDB oracle
    * zips two unnests (tokens + 1-based positions). Bounded to doc_id < 30
    * to keep the t2 dump small; the operator itself streams at any scale. */
  val qExplode: GQuery = GQuery(
    "q_explode",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .filter($"doc_id" < 30)
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", ($"pos" + 1).cast("int").as("pos"), $"col".as("tok"))
        .orderBy($"doc_id", $"pos")
    },
    Some("""
      SELECT doc_id,
        cast(unnest(generate_series(1, len(string_split(text, ' ')))) as int) AS pos,
        unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 30
      ORDER BY doc_id, pos"""),
  )

  /** Map-typed columns: construction (map_from_arrays), concat, key/value
    * introspection, and lookup — scalarized on output (flat columns, not a
    * map cell) because the driver's compare harness can't hash nested
    * outputs (same rule as q_fn_array). Missing-key lookup must be NULL in
    * both engines: Spark element_at on a missing key vs DuckDB
    * map_extract → empty list → list_extract → NULL. Both engines
    * preserve map insertion order, which the csv projections rely on. */
  val qFnMap: GQuery = GQuery(
    "q_fn_map",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id",
          map_concat(
            map_from_arrays(
              array(lit("lang"), lit("source")),
              array($"lang", $"source")),
            map_from_arrays(
              array(lit("nc")),
              array($"n_chars".cast("string")))).as("m"))
        .select(
          $"doc_id",
          size($"m").cast("long").as("n_keys"),
          element_at($"m", lit("lang")).as("v_lang"),
          element_at($"m", lit("missing")).as("v_miss"),
          array_join(map_keys($"m"), ",").as("keys_csv"),
          array_join(map_values($"m"), ",").as("vals_csv"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        cast(cardinality(m) as bigint) AS n_keys,
        list_extract(map_extract(m, 'lang'), 1) AS v_lang,
        list_extract(map_extract(m, 'missing'), 1) AS v_miss,
        array_to_string(map_keys(m), ',') AS keys_csv,
        array_to_string(map_values(m), ',') AS vals_csv
      FROM (SELECT doc_id,
              map(['lang', 'source', 'nc'],
                  [lang, source, cast(n_chars as varchar)]) AS m
            FROM documents) m0
      ORDER BY doc_id"""),
  )

  /** VARIANT ingestion (Spark 4's semi-structured type): `props` parsed
    * ONCE to VARIANT with parse_json, fields pulled with typed
    * variant_get paths — the schema-on-read path that replaces
    * per-field JSON re-parsing (from_json with a fixed schema, q_fn_json)
    * when the payload shape is open. Only extracted primitives reach
    * the output (VARIANT itself is an engine-internal encoding; the
    * oracle recomputes the fields from the raw JSON text). try-semantics
    * on malformed rows: variant_get of a missing path is NULL, counted
    * explicitly. */
  val qVariant: GQuery = GQuery(
    "q_variant",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("v", expr("parse_json(props)"))
        .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          count($"k").as("n_with_k"),
          sum(when($"k".isNull, 1L).otherwise(0L)).as("n_missing"),
          sum($"k").as("sum_k"),
          countDistinct($"k").as("n_distinct_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
             count(k) AS n_with_k,
             cast(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) as bigint)
               AS n_missing,
             cast(sum(k) as bigint) AS sum_k,
             count(DISTINCT k) AS n_distinct_k
      FROM (
        SELECT event_type,
          cast(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) as bigint) AS k
        FROM events) t
      GROUP BY event_type ORDER BY event_type"""),
  )

  /** HIGHER-ORDER-FUNCTION kernels over token arrays — filter /
    * transform / aggregate / exists lambdas, the codegen-friendly way
    * to run per-row array logic WITHOUT exploding (explode multiplies
    * the row count through the shuffle; a lambda keeps the work inside
    * the row's projection). DuckDB twins: list_filter / list_transform
    * / list_sum / len(list_filter) > 0. All outputs are integer
    * aggregates of integer per-row values — exact both sides. */
  val qFnHof: GQuery = GQuery(
    "q_fn_hof",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"lang", split($"text", " ").as("toks"))
        .select($"lang",
          size($"toks").cast("long").as("n_toks"),
          size(expr("filter(toks, t -> length(t) >= 6)")).cast("long")
            .as("n_long"),
          expr("aggregate(toks, 0L, (a, t) -> a + length(t))").as("chars"),
          when(expr("exists(toks, t -> length(t) >= 10)"), 1L).otherwise(0L)
            .as("has_rare"))
        .groupBy($"lang")
        .agg(sum($"n_toks").as("total_tokens"),
          sum($"n_long").as("long_tokens"),
          sum($"chars").as("token_chars"),
          sum($"has_rare").as("docs_with_rare"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang,
             cast(sum(n_toks) as bigint) AS total_tokens,
             cast(sum(n_long) as bigint) AS long_tokens,
             cast(sum(chars) as bigint) AS token_chars,
             cast(sum(has_rare) as bigint) AS docs_with_rare
      FROM (
        SELECT lang,
               cast(len(l) as bigint) AS n_toks,
               cast(len(list_filter(l, t -> length(t) >= 6)) as bigint)
                 AS n_long,
               cast(list_sum(list_transform(l, t -> length(t))) as bigint)
                 AS chars,
               CASE WHEN len(list_filter(l, t -> length(t) >= 10)) > 0
                    THEN 1 ELSE 0 END AS has_rare
        FROM (SELECT lang, string_split(text, ' ') AS l FROM documents) d) t
      GROUP BY lang ORDER BY lang"""),
  )

  val all: Seq[GQuery] =
    Seq(qFnString, qFnDate, qFnMath, qFnArray, qFnJson, qFnBitwise,
      qFnRegex, qFnHash, qExplode, qFnMap, qVariant, qFnHof)
}

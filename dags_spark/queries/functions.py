"""SURVEY §2.8 — scalar function surface.

Cross-engine dialect traps handled here:
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all semantics;
- day-of-week pinned to ISO (Spark weekday()+1 == DuckDB isodow);
- months_between pinned to calendar-month delta (y*12+m arithmetic)
  — Spark's fractional months_between has no DuckDB twin;
- array_distinct output order is engine-specific -> always sorted
  before comparison;
- no rounding of 2-decimal money to fewer decimals (half-up vs
  half-even on the .x5 boundary differs between engines); round() is
  exercised on non-boundary quotients instead, and libm-dependent
  fns (ln/log10/sqrt/power) are rounded to 6dp on both sides.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import SQL_CENTS, SQL_DEC_SUM, cents, dec_sum, table
from ..registry import register


@register(
    "fn_string",
    oracle="""
SELECT p_partkey,
       substr(p_name, 1, 4) AS name4,
       upper(p_name) AS name_up,
       lower(p_type) AS type_lo,
       length(p_name) AS name_len,
       concat_ws('|', p_name, p_brand) AS name_brand,
       replace(p_name, ' ', '_') AS name_snake,
       lpad(p_brand, 12, '*') AS brand_pad,
       trim('  ' || p_name || ' ') AS name_trim,
       string_split(p_name, ' ')[2] AS second_word
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part names."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("name4"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_type").alias("type_lo"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_name", "p_brand").alias("name_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.element_at(F.split("p_name", " "), 2).alias("second_word"),
    )


@register(
    "fn_regexp",
    oracle="""
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
       regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS is_two_words
FROM part
""",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extract/replace/match with POSIX-portable patterns."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.col("p_name").rlike("^[a-z]+ [a-z]+$").alias("is_two_words"),
    )


@register(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dy,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(date_part('isodow', o_orderdate) AS INTEGER) AS iso_dow,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS plus_30d,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       (2000 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS months_to_y2k
FROM orders
""",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function family (ISO dow; calendar months delta)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        (F.weekday(d) + 1).alias("iso_dow"),
        F.date_trunc("month", d).alias("month_start"),
        # DATE results re-cast to TIMESTAMP: both engines then surface
        # datetime64 in pandas (python date objects hash differently)
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("plus_30d"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.last_day(d.cast("date")).cast("timestamp").alias("month_end"),
        ((F.lit(2000) - F.year(d)) * 12 + (F.lit(1) - F.month(d))).alias("months_to_y2k"),
    )


@register(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_quantity / 7, 2) AS qty_div7,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil,
       abs(l_quantity - 25) AS qty_dev,
       CAST(l_quantity * l_quantity AS DOUBLE) AS qty_sq,
       ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
       ROUND(ln(l_quantity), 6) AS qty_ln,
       ROUND(log10(l_quantity), 6) AS qty_log10,
       l_orderkey % 7 AS key_mod7,
       CAST(sign(l_quantity - 25) AS BIGINT) AS qty_sign
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family on integral-valued quantities (libm
    outputs rounded to 6dp on both sides)."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(q / 7, 2).alias("qty_div7"),
        F.floor(q / 7).alias("qty_floor"),
        F.ceil(q / 7).alias("qty_ceil"),
        F.abs(q - 25).alias("qty_dev"),
        (q * q).cast("double").alias("qty_sq"),
        F.round(F.sqrt(q), 6).alias("qty_sqrt"),
        F.round(F.log(q), 6).alias("qty_ln"),
        F.round(F.log10(q), 6).alias("qty_log10"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(q - 25).cast("long").alias("qty_sign"),
    )


@register(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
       greatest(o_custkey % 100, o_orderkey % 100) AS g_key,
       least(o_custkey % 100, o_orderkey % 100) AS l_key
FROM orders
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bands, COALESCE/NULLIF, GREATEST/LEAST."""
    o = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp < 100000, "small")
        .when(tp < 300000, "medium")
        .otherwise("large")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_custkey") % 100, F.col("o_orderkey") % 100).alias("g_key"),
        F.least(F.col("o_custkey") % 100, F.col("o_orderkey") % 100).alias("l_key"),
    )


@register(
    "fn_array",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       list_contains(string_split(text, ' '), 'data') AS has_data,
       array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|') AS uniq_tokens,
       array_to_string(string_split(text, ' ')[1:5], '|') AS first5,
       array_to_string(list_transform(string_split(text, ' ')[1:5], t -> upper(t)), '|') AS first5_up,
       array_to_string(list_filter(string_split(text, ' '), t -> length(t) > 4), '|') AS long_tokens
FROM documents
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops + higher-order lambdas over tokenized text. Array
    results are serialized with array_join — the driver's canonicalizer
    hashes scalars only (the agg_collect_sorted lesson from round 1);
    the array semantics are still fully exercised upstream of the
    join."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.sort_array(F.array_distinct(toks)), "|").alias("uniq_tokens"),
        F.array_join(F.slice(toks, 1, 5), "|").alias("first5"),
        F.array_join(
            F.transform(F.slice(toks, 1, 5), lambda t: F.upper(t)), "|"
        ).alias("first5_up"),
        F.array_join(F.filter(toks, lambda t: F.length(t) > 4), "|").alias(
            "long_tokens"
        ),
    )


@register(
    "fn_map",
    oracle="""
SELECT event_id,
       array_to_string(map_keys(MAP {'k': CAST(json_extract(props, '$.k') AS INTEGER)}), '|') AS prop_keys,
       array_to_string(map_values(MAP {'k': CAST(json_extract(props, '$.k') AS INTEGER)}), '|') AS prop_values
FROM events
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map from parsed props, extract keys/values (kept to
    key-extraction — map literal semantics differ across engines).
    Key/value lists serialized to scalars for driver hashability."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k").cast("int"))
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), "|").alias("prop_keys"),
        F.array_join(F.map_values(m).cast("array<string>"), "|").alias("prop_values"),
    )


@register(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_path,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_struct,
       CAST(json_extract(props, '$.missing') AS INTEGER) AS k_missing
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + from_json struct access + missing-key
    null semantics."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        parsed.getField("k").alias("k_struct"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@register(
    "fn_hash",
    oracle="""
SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
FROM documents
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable cross-engine content hashes (dedup fingerprints)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "explode_tokens",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
""",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of tokenized text -> (doc_id, token) rows
    (duplicates preserved; UDTF-shaped row expansion)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@register(
    "agg_string_agg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, '|' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey
""",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per group (deterministic: sorted
    before concatenation on both engines)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations")
    )


@register(
    "fn_string_extra",
    oracle="""
SELECT p_partkey,
       levenshtein(p_brand, p_type) AS brand_type_dist,
       reverse(p_brand) AS brand_rev,
       left(p_name, 5) AS name_l5,
       right(p_name, 4) AS name_r4,
       repeat(p_brand, 2) AS brand_x2,
       translate(p_brand, '#', '-') AS brand_dash,
       ascii(p_name) AS first_code
FROM part
""",
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function batch: edit distance, reverse,
    left/right slicing, repeat, translate, ascii."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.substring("p_name", 1, 5).alias("name_l5"),
        F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("name_r4"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
        F.ascii(F.col("p_name")).alias("first_code"),
    )


@register(
    "fn_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str
FROM events
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VariantType path (Spark 4.x): parse once into
    a Variant, extract typed fields — the open-schema JSON column
    story. Variant's binary encoding decodes ~10x faster than
    re-parsing JSON text per access, which is what matters when a
    100 TB events table carries a props blob."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
    )


@register(
    "fn_printf",
    oracle="""
SELECT s_suppkey, printf('%s#%05d', s_name, s_suppkey) AS tag
FROM supplier
""",
)
def fn_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style formatted strings (format_string <-> printf)."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("%s#%05d", F.col("s_name"), F.col("s_suppkey")).alias("tag"),
    )


@register(
    "explode_outer_nulls",
    oracle="""
SELECT d.doc_id, l.long_tok
FROM (SELECT doc_id,
             list_filter(string_split(text, ' '), t -> length(t) >= 12) AS g
      FROM documents) d
LEFT JOIN LATERAL (SELECT unnest(d.g) AS long_tok) l ON TRUE
""",
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving lateral expansion: docs with NO >=12-char token
    keep one row with a NULL token (explode_outer), so the doc set
    survives the expansion — the LEFT JOIN of row explosion."""
    d = table(spark, sf_dir, "documents")
    g = F.filter(F.split("text", " "), lambda t: F.length(t) >= 12)
    return d.select("doc_id", F.explode_outer(g).alias("long_tok"))


@register(
    "fn_try_cast",
    oracle="""
SELECT p_partkey,
       TRY_CAST(substr(p_name, 1, 2) AS INTEGER) AS maybe_int,
       TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INTEGER) AS brand_num
FROM part
""",
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casts under ANSI mode: malformed input -> NULL instead of
    a task failure. At 100 TB a single dirty row must not kill the
    job — try_cast is the ingestion-edge rule."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_to_number(F.substring("p_name", 1, 2), F.lit("99")).cast("int").alias(
            "maybe_int"
        ),
        F.expr("TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INT)").alias(
            "brand_num"
        ),
    )


@register(
    "fn_time_bucket",
    oracle=f"""
SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000) AS bucket_15m,
       event_type,
       COUNT(*) AS n,
       {SQL_DEC_SUM('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-width time_bucket (15 min — widths date_trunc can't
    express): integer epoch-µs arithmetic, identical both engines.
    The hypertable-rollup companion for non-calendar grains; bucket
    math is scan-local, then one hash-agg."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    bucket = F.timestamp_micros(us - us % 900_000_000)
    return ev.groupBy(
        bucket.alias("bucket_15m"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"), dec_sum("value").alias("sum_value"))


@register(
    "fn_url_parse",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
           || source || '.example.com/p/' || doc_id
           || (CASE WHEN doc_id % 2 = 0 THEN '?utm=x&ref=' || lang ELSE '' END) AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       NULLIF(regexp_extract(url, '[?]([^#]*)', 1), '') AS query,
       NULLIF(regexp_extract(url, '[?&]ref=([^&#]*)', 1), '') AS ref_param
FROM u
""",
    tags=("fn", "web"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — protocol/host/path/query/named-param over
    deterministic synthetic URLs (the fixture carries none). Spark's
    JVM `parse_url` does the extraction on the engine side; the
    oracle mirrors each part with an anchored regex, with NULLIF('')
    matching parse_url's NULL on absent parts. Scan-local projection,
    no shuffle — at 100 TB this runs at IO speed."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("?utm=x&ref="), F.col("lang"))
        ).otherwise(F.lit("")),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


@register(
    "fn_timezone",
    oracle="""
SELECT event_id,
       CAST(timezone('America/New_York', timezone('UTC', ts)) AS TIMESTAMP) AS ts_nyc,
       CAST(timezone('Asia/Tokyo', timezone('UTC', ts)) AS TIMESTAMP) AS ts_tokyo,
       CAST(timezone('UTC', timezone('Europe/Berlin', ts)) AS TIMESTAMP) AS berlin_wall_as_utc
FROM events
""",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion family: UTC event instants rendered as
    New York / Tokyo wall-clock (`from_utc_timestamp`) and the
    inverse (`to_utc_timestamp`), mirrored by DuckDB's two-step
    `timezone(tz, timezone('UTC', ts))` ICU composition. January
    fixtures pin EST/JST/CET offsets; the same code covers DST
    transitions because both engines delegate to the IANA tzdb."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_utc_timestamp("ts", "America/New_York").alias("ts_nyc"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("ts_tokyo"),
        F.to_utc_timestamp("ts", "Europe/Berlin").alias("berlin_wall_as_utc"),
    )


@register(
    "fn_struct_nested",
    oracle="""
SELECT o_orderkey,
       {'k': o_custkey, 'when': o_orderdate}.k AS cust_from_struct,
       {'hdr': {'status': o_orderstatus, 'prio': o_orderpriority},
        'amt_cents': CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)}.hdr.prio
         AS prio_nested,
       {'hdr': {'status': o_orderstatus, 'prio': o_orderpriority},
        'amt_cents': CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)}.amt_cents
         AS amt_cents
FROM orders
""",
)
def fn_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested STRUCT construction and dot-path field access — the
    column type behind typed headers/envelopes (multimodal meta,
    event payloads). Catalyst collapses CreateStruct + GetStructField
    chains at optimization time, so building a struct only to read
    two leaves costs exactly those two column reads — verified by the
    scan's ReadSchema staying at the referenced leaf columns. Output
    is scalar leaves (structs themselves aren't driver-hashable)."""
    o = table(spark, sf_dir, "orders")
    envelope = F.struct(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("hdr"),
        cents("o_totalprice").alias("amt_cents"),
    )
    small = F.struct(F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("when"))
    return o.select(
        "o_orderkey",
        small.getField("k").alias("cust_from_struct"),
        envelope.getField("hdr").getField("prio").alias("prio_nested"),
        envelope.getField("amt_cents").alias("amt_cents"),
    )


@register(
    "fn_aes_roundtrip",
    oracle="""
SELECT c_custkey, c_name AS name_roundtrip,
       CAST((length(c_name) // 16 + 1) * 16 AS INT) AS cipher_len
FROM customer
""",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip (round 4): aes_encrypt ->
    aes_decrypt on customer names in ECB mode (deterministic; GCM's
    random IV is the production default but cannot hash-check). The
    output proves the round-trip is lossless AND pins the PKCS#7
    ciphertext length ((len/16 + 1) * 16 bytes), which the oracle
    recomputes arithmetically. This is the at-rest PII pattern for a
    100 TB lake: encrypt on write with a per-dataset key, decrypt in
    authorized readers — all JVM-side, no Python boundary."""
    key = F.lit("0123456789abcdef")
    c = table(spark, sf_dir, "customer")
    cipher = F.aes_encrypt(F.col("c_name"), key, F.lit("ECB"))
    return c.select(
        "c_custkey",
        F.aes_decrypt(cipher, key, F.lit("ECB")).cast("string").alias("name_roundtrip"),
        F.length(cipher).cast("int").alias("cipher_len"),
    )


@register(
    "fn_mask_pii",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS name_masked,
       regexp_replace(regexp_replace(regexp_replace(
         c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '*', 'g')
         AS segment_masked
FROM customer
""",
)
def fn_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving PII masking via the native mask() function
    (round 4): upper->X, lower->x, digit->n (or a custom digit
    char), everything else kept — the redaction that keeps layout
    (lengths, separators) for debugging while removing content, the
    lightweight sibling of fn_aes_roundtrip's reversible encryption.
    JVM-side single projection; the oracle mirrors with three
    character-class regexes."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.mask("c_mktsegment", digitChar=F.lit("*")).alias("segment_masked"),
    )


@register(
    "fn_codec_roundtrip",
    oracle="""
SELECT n_nationkey,
       to_base64(CAST(n_name AS BLOB)) AS b64,
       lower(hex(n_name)) AS hexed,
       n_name AS b64_roundtrip,
       n_name AS hex_roundtrip
FROM nation
""",
)
def fn_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary<->text codec round-trips (round 4): base64/unbase64 and
    hex/unhex on nation names — the encodings every interchange
    boundary (JSON payloads, URL-safe ids, wire logs) leans on; both
    decode paths must reproduce the source exactly and the encoded
    forms are pinned against DuckDB's encoders."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.lower(F.hex("n_name")).alias("hexed"),
        F.unbase64(F.base64(F.col("n_name").cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
        F.unhex(F.hex("n_name")).cast("string").alias("hex_roundtrip"),
    )


@register(
    "fn_bround_even",
    oracle=f"""
SELECT o_orderkey,
       CAST(CASE WHEN {SQL_CENTS('o_totalprice')} % 100 > 50
                 THEN {SQL_CENTS('o_totalprice')} // 100 + 1
                 WHEN {SQL_CENTS('o_totalprice')} % 100 < 50
                 THEN {SQL_CENTS('o_totalprice')} // 100
                 ELSE {SQL_CENTS('o_totalprice')} // 100
                      + ({SQL_CENTS('o_totalprice')} // 100) % 2
            END AS DOUBLE) AS price_bankers,
       CAST(floor(CAST({SQL_CENTS('o_totalprice')} AS DOUBLE) / 100.0 + 0.5)
            AS DOUBLE) AS price_half_up
FROM orders
""",
)
def fn_bround_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-MODE semantics pinned exactly (round 4): bround's
    HALF_EVEN (banker's) vs round's HALF_UP on order totals. The
    oracle cannot call a native half-even (DuckDB ROUND is
    half-away), so it derives both modes from exact integer cents —
    boundary rows (cents % 100 == 50) round to the EVEN dollar —
    which means Spark's bround implementation is checked against the
    arithmetic definition, not another library's rounding. The mode
    difference is a classic silent financial-report discrepancy."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.bround("o_totalprice", 0).alias("price_bankers"),
        F.round("o_totalprice", 0).alias("price_half_up"),
    )


@register(
    "udtf_analyze_polymorphic",
    oracle="""
SELECT n_nationkey, 'n_name' AS col_name, n_name AS col_value FROM nation
UNION ALL
SELECT n_nationkey, 'n_regionkey', CAST(n_regionkey AS VARCHAR) FROM nation
""",
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze` API, round 4): the
    output schema is computed at ANALYSIS time from the input table's
    column names — here a generic wide->long melter that emits one
    (key, col_name, col_value) row per non-key column, whatever table
    it receives. This is the UDTF counterpart of unpivot_long:
    unpivot needs the column list spelled at call time; the analyze
    method discovers it. Registered lazily per session; the oracle
    mirrors with a UNION ALL melt."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class Melt:
        @staticmethod
        def analyze(row: AnalyzeArgument) -> AnalyzeResult:
            # key column keeps the INPUT's name and type (true
            # polymorphism — a string/int/date key passes through)
            key_field = row.dataType.fields[0]
            return AnalyzeResult(
                StructType(
                    [
                        StructField(key_field.name, key_field.dataType),
                        StructField("col_name", StringType()),
                        StructField("col_value", StringType()),
                    ]
                )
            )

        def eval(self, row):
            d = row.asDict()
            keys = list(d)
            key = d[keys[0]]
            for c in keys[1:]:
                # preserve SQL NULL — str(None) would emit the literal
                # string 'None' where CAST(x AS STRING) yields NULL
                yield key, c, None if d[c] is None else str(d[c])

    spark.udtf.register("melt_udtf", udtf(Melt))
    n = table(spark, sf_dir, "nation")
    n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        "n_regionkey",
    ).createOrReplaceTempView("nation_for_melt")
    return spark.sql(
        "SELECT * FROM melt_udtf(TABLE(SELECT * FROM nation_for_melt))"
    )


@register(
    "fn_interval_arith",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
            AS TIMESTAMP) AS plus_3mo,
       CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 14 DAY AS DATE)
            AS TIMESTAMP) AS minus_14d,
       CAST(CAST(last_day(CAST(o_orderdate AS DATE)) + INTERVAL 1 MONTH
            AS DATE) AS TIMESTAMP) AS eom_clamp,
       o_orderdate + INTERVAL 90 MINUTE AS plus_90min,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH
                           AS DATE))
            AS INTEGER) AS days_in_2mo
FROM orders
WHERE o_orderkey % 7 = 0
""",
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI INTERVAL arithmetic (§1 type lattice): year-month and
    day-time interval addition on DATE and TIMESTAMP, including the
    end-of-month clamp both engines share (Jan 31 + 1 month ->
    Feb 29/28, pinned via last_day so every row exercises the clamp)
    and a month-length measurement via date arithmetic. Intervals
    themselves are not emitted (interval columns are not
    driver-hashable and their rendering is engine-specific); every
    output is a concrete DATE/TIMESTAMP/INTEGER. DuckDB's date +
    interval returns TIMESTAMP, so the oracle CASTs back to DATE.
    Scan-local projection — runs at IO speed, no shuffle."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 MONTH")).cast("timestamp").alias("plus_3mo"),
        (d - F.expr("INTERVAL 14 DAY")).cast("timestamp").alias("minus_14d"),
        (F.last_day(d) + F.expr("INTERVAL 1 MONTH"))
        .cast("timestamp")
        .alias("eom_clamp"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTE")).alias(
            "plus_90min"
        ),
        F.datediff((d + F.expr("INTERVAL 2 MONTH")), d)
        .cast("int")
        .alias("days_in_2mo"),
    )


@register(
    "fn_map_lambda",
    oracle="""
SELECT p_partkey,
       concat('retail_cents=', CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) * 2 AS VARCHAR),
              ',size=', CAST(p_size * 2 AS VARCHAR)) AS doubled,
       concat('RETAIL_CENTS=', CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) AS VARCHAR),
              ',SIZE=', CAST(p_size AS VARCHAR)) AS upper_keys,
       CASE
         WHEN CAST(round(p_retailprice * 100, 0) AS BIGINT) > 100000
              AND p_size > 100000
           THEN concat('retail_cents=', CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) AS VARCHAR),
                       ',size=', CAST(p_size AS VARCHAR))
         WHEN CAST(round(p_retailprice * 100, 0) AS BIGINT) > 100000
           THEN concat('retail_cents=', CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) AS VARCHAR))
         WHEN p_size > 100000
           THEN concat('size=', CAST(p_size AS VARCHAR))
         ELSE ''
       END AS big_only,
       concat('retail_cents=', CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) * 2 + 7 AS VARCHAR),
              ',size=', CAST(p_size * 2 + 7 AS VARCHAR)) AS zipped
FROM part
""",
)
def fn_map_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order lambda functions (`transform_values`,
    `transform_keys`, `map_filter`, `map_zip_with`) — the §2.8 family
    fn_map leaves uncovered. Maps are built per row from scalar
    columns with literal keys, so each lambda's output has a CLOSED
    FORM the oracle recomputes without any map type at all (DuckDB's
    map lambda surface differs; the contract here is the lambda
    semantics, not the container encoding). Every map result is
    serialized deterministically via sorted map_entries ->
    'k=v,...' strings. Scan-local projection, no shuffle; lambdas run
    inside whole-stage codegen (no Python)."""
    p = table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("retail_cents"), cents("p_retailprice"),
        F.lit("size"), F.col("p_size").cast("long"),
    )
    ser = (
        lambda mp: F.array_join(  # noqa: E731
            F.transform(
                F.array_sort(F.map_entries(mp)),
                lambda e: F.concat_ws("=", e.key, e.value.cast("string")),
            ),
            ",",
        )
    )
    return p.select(
        "p_partkey",
        ser(F.transform_values(m, lambda k, v: v * 2)).alias("doubled"),
        ser(F.transform_keys(m, lambda k, v: F.upper(k))).alias("upper_keys"),
        ser(F.map_filter(m, lambda k, v: v > 100000)).alias("big_only"),
        ser(F.map_zip_with(m, m, lambda k, v1, v2: v1 + v2 + 7)).alias(
            "zipped"
        ),
    )


@register(
    "fn_collate_group",
    oracle="""
WITH mixed AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT lower(seg) AS seg_ci,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_casings,
       CAST(SUM(CASE WHEN seg = upper(seg) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_upper
FROM mixed
GROUP BY lower(seg)
""",
)
def fn_collate_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive COLLATION semantics (Spark 4 `collate`): a
    mixed-case segment column (case flipped in-query on key parity)
    grouped under UTF8_LCASE — 'AUTOMOBILE' and 'automobile' land in
    ONE group while the binary-collated casing count still sees two.
    The oracle proves the collation exactly equal to lower()-keyed
    grouping (DuckDB's NOCASE collation does not thread through
    DISTINCT, so the mirror uses the definitional rewrite). The group
    key is re-emitted as lower() — which representative casing a
    collated group surfaces is engine-undefined, the lower() image is
    not. One hash-agg; collation compares run JVM-side in codegen."""
    c = table(spark, sf_dir, "customer")
    mixed = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg"),
    )
    return (
        mixed.groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("seg_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # binary-collated distinct INSIDE a collated group: cast
            # back to UTF8_BINARY so both casings count
            F.countDistinct(F.expr("collate(seg, 'UTF8_BINARY')")).alias(
                "n_casings"
            ),
            F.sum(
                F.when(
                    F.expr("collate(seg, 'UTF8_BINARY')")
                    == F.upper(F.expr("collate(seg, 'UTF8_BINARY')")),
                    1,
                ).otherwise(0)
            ).alias("n_upper"),
        )
        .select(
            F.lower(F.expr("collate(seg_key, 'UTF8_BINARY')")).alias("seg_ci"),
            "n_rows",
            "n_casings",
            "n_upper",
        )
    )


@register(
    "fn_decimal_arith",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
            AS DECIMAL(18,4)) AS VARCHAR) AS sum_disc_price,
       CAST(CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
         AS VARCHAR) AS min_price,
       CAST(CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
         AS VARCHAR) AS max_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def fn_decimal_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(p,s) arithmetic end-to-end — the money type's exactness
    contract, checked in the decimal domain itself rather than via
    the scaled-BIGINT rewrite the perf-critical keys use. Products
    widen per SQL rules ((12,2)x(12,2) -> scale 4), sums stay exact
    under any shuffle/agg order, and both engines CAST the final
    aggregate to the SAME (18,4)/(12,2) shape, rendered as VARCHAR
    for the hash (house convention, project_rename_cast: DuckDB's
    pandas surface turns wide decimals into float64, Spark keeps
    Decimal objects — the string image is the portable exact form
    and pins scale: '5.00' vs '5.0000' would hash-differ).
    Division is deliberately absent: Spark returns DECIMAL with its
    own precision rules where DuckDB returns DOUBLE — a dialect trap,
    not a portable semantic. One hash-agg pass."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(12,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price * (one - disc))
        .cast("decimal(18,4)")
        .cast("string")
        .alias("sum_disc_price"),
        F.min(price).cast("decimal(12,2)").cast("string").alias("min_price"),
        F.max(price).cast("decimal(12,2)").cast("string").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "fn_array_fold",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> length(t) > 7)) > 0
         AS has_long_token,
       len(list_filter(string_split(text, ' '), t -> length(t) > 0))
         = len(string_split(text, ' ')) AS all_nonempty,
       CAST(list_reduce(list_prepend(0,
              list_transform(string_split(text, ' '), t -> length(t))),
            (acc, x) -> acc + x) AS BIGINT) AS total_chars,
       CAST(list_position(string_split(text, ' '), 'data') AS INTEGER)
         AS data_pos,
       array_to_string(list_filter(string_split(text, ' '),
                                   t -> t <> 'the'), ' ') AS no_the
FROM documents
""",
)
def fn_array_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array fold/quantifier higher-order functions — the §2.8 family
    fn_array leaves uncovered: `exists` / `forall` (short-circuit
    quantifiers), `aggregate` (explicit-init fold; DuckDB mirrors by
    prepending the init and list_reduce'ing), `array_position`
    (1-based, 0 when absent — both engines agree), and `array_remove`
    via the filter lambda (array_remove itself returns NULL-vs-[]
    differently across engines for empty inputs — the filter spelling
    is the portable form). All lambdas run inside whole-stage
    codegen; scan-local projection, no shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.exists(toks, lambda t: F.length(t) > 7).alias("has_long_token"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.array_position(toks, "data").cast("int").alias("data_pos"),
        F.array_join(F.filter(toks, lambda t: t != "the"), " ").alias(
            "no_the"
        ),
    )


@register(
    "fn_uuid_name_based",
    oracle="""
WITH h AS (
  SELECT o_orderkey, md5('dags:order:' || CAST(o_orderkey AS VARCHAR)) AS hx
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT o_orderkey,
       substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-3'
         || substr(hx, 14, 3) || '-'
         || CASE substr(hx, 17, 1)
              WHEN '0' THEN '8' WHEN '1' THEN '9' WHEN '2' THEN 'a'
              WHEN '3' THEN 'b' WHEN '4' THEN '8' WHEN '5' THEN '9'
              WHEN '6' THEN 'a' WHEN '7' THEN 'b' WHEN '8' THEN '8'
              WHEN '9' THEN '9' WHEN 'a' THEN 'a' WHEN 'b' THEN 'b'
              WHEN 'c' THEN '8' WHEN 'd' THEN '9' WHEN 'e' THEN 'a'
              ELSE 'b' END
         || substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS row_uuid
FROM h
""",
)
def fn_uuid_name_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAME-BASED deterministic row UUIDs (RFC 4122 version-3 shape:
    md5 of a namespaced natural key, version nibble pinned to 3,
    variant nibble folded into 8/9/a/b) — the stable-identity
    primitive a pipeline needs where `uuid()` would be poison:
    random ids differ per retry/backfill, breaking idempotent
    upserts and cross-run joins; a name-based id is a pure function
    of (namespace, natural key), so every engine, retry, and backfill
    mints the identical id (this is how the reference's block/record
    identities stay stable across runs [K]). The variant fold is
    hex-nibble CASE arithmetic shared with the oracle; everything is
    scan-local string work at IO speed."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    hx = F.md5(F.concat(F.lit("dags:order:"), F.col("o_orderkey").cast("string")))
    variant = (
        F.when(F.substring(hx, 17, 1).isin("0", "4", "8", "c"), "8")
        .when(F.substring(hx, 17, 1).isin("1", "5", "9", "d"), "9")
        .when(F.substring(hx, 17, 1).isin("2", "6", "a", "e"), "a")
        .otherwise("b")
    )
    return o.select(
        "o_orderkey",
        F.concat(
            F.substring(hx, 1, 8), F.lit("-"),
            F.substring(hx, 9, 4), F.lit("-3"),
            F.substring(hx, 14, 3), F.lit("-"),
            variant,
            F.substring(hx, 18, 3), F.lit("-"),
            F.substring(hx, 21, 12),
        ).alias("row_uuid"),
    )


@register(
    "fn_array_setops",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_distinct(string_split(text, ' ')) AS a,
         list_distinct(string_split(upper(text), ' ')) AS dummy,
         list_distinct(string_split(substr(text, 1, 60), ' ')) AS b
  FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(list_sort(list_intersect(a, b)), '|'), '')
         AS common,
       COALESCE(array_to_string(
           list_sort(list_filter(a, x -> NOT list_contains(b, x))), '|'), '')
         AS only_a,
       array_to_string(list_sort(list_distinct(list_concat(a, b))), '|')
         AS unioned,
       list_has_any(a, b) AS overlaps
FROM t
""",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET operations (`array_intersect`, except-via-filter,
    union via concat+distinct, `arrays_overlap`) between each doc's
    full token set and its 60-char-prefix token set — the set algebra
    behind tag matching, allow/deny-list checks, and shingle overlap
    scoring when the sets ride inside one row. All outputs sorted
    before serialization (intersect/union ORDER is engine-specific —
    the values are the contract, not the traversal). `array_except`
    itself is mirrored as a filter because the engines disagree on
    its null/empty edge; the filter spelling is portable — and the
    oracle COALESCEs its serializations because DuckDB's
    array_to_string([]) is NULL where Spark's array_join([]) is ''.
    Scan-local, codegen lambdas, no shuffle."""
    d = table(spark, sf_dir, "documents")
    a = F.array_distinct(F.split("text", " "))
    b = F.array_distinct(F.split(F.substring("text", 1, 60), " "))
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(a, b)), "|").alias(
            "common"
        ),
        F.array_join(
            F.array_sort(F.filter(a, lambda x: ~F.array_contains(b, x))), "|"
        ).alias("only_a"),
        F.array_join(
            F.array_sort(F.array_distinct(F.concat(a, b))), "|"
        ).alias("unioned"),
        F.arrays_overlap(a, b).alias("overlaps"),
    )


@register(
    "fn_try_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity - 25 = 0 THEN NULL
            ELSE CAST(ROUND(l_extendedprice / (l_quantity - 25), 6) AS DOUBLE)
       END AS price_per_dev,
       CASE WHEN l_quantity - 25 = 0 THEN NULL
            ELSE CAST(l_orderkey % CAST(l_quantity - 25 AS BIGINT) AS BIGINT)
       END AS key_mod_dev,
       CAST(l_orderkey * 0 AS BIGINT) AS zeroed
FROM lineitem
WHERE l_orderkey % 13 = 0
""",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY arithmetic (`try_divide`, `try_mod`,
    `try_multiply`): under ANSI mode a divide/mod by zero kills the
    TASK (fn_math avoids zero denominators by construction; real
    derived denominators can't) — the try_* family returns NULL for
    the poison rows and lets the other billion rows finish, the
    row-level sibling of source_csv_permissive's file-level
    tolerance. The derived denominator (quantity - 25) IS zero for
    some rows, so the NULL path is genuinely exercised; the oracle
    states the same semantics with explicit zero guards. Division
    results round 6dp (one double op); everything scan-local."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 13 == 0
    )
    dev = F.col("l_quantity") - 25
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), dev), 6
        ).alias("price_per_dev"),
        F.try_mod(F.col("l_orderkey"), dev.cast("bigint")).alias(
            "key_mod_dev"
        ),
        F.try_multiply(F.col("l_orderkey"), F.lit(0).cast("bigint")).alias(
            "zeroed"
        ),
    )


@register(
    "fn_ipv4_cidr",
    oracle="""
WITH src AS (
  SELECT event_id,
         (event_id * 2654435761) % 4294967296 AS ip
  FROM events WHERE event_id % 17 = 0
)
SELECT event_id,
       CAST(ip // 16777216 AS BIGINT) || '.'
         || CAST((ip // 65536) % 256 AS BIGINT) || '.'
         || CAST((ip // 256) % 256 AS BIGINT) || '.'
         || CAST(ip % 256 AS BIGINT) AS ip_str,
       CAST(ip // 65536 AS BIGINT) AS net16,
       ip // 16777216 = 10 AS in_10_slash8,
       ip // 4194304 = 49 AS in_cidr10,
       CAST(ip AS BIGINT) AS ip_u32
FROM src
""",
)
def fn_ipv4_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 / CIDR arithmetic — the network-log analytics staple
    (allow/deny lists, per-subnet rollups, bot-range filters) done
    engine-portably as PURE INTEGER math: a u32 address (derived
    deterministically via Knuth multiplicative hash — the fixture
    has no IPs) renders to dotted-quad by div/mod 256, the /16
    network id is one integer division, and CIDR membership
    `ip/2^(32-p) == prefix` is a single comparison — no inet type,
    no string parsing in the hot path, works identically in any
    engine with 64-bit integers. At 100 TB the per-subnet rollup
    groups by the integer net id, never the dotted string."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    ip = (F.col("event_id") * 2654435761) % 4294967296
    src = ev.select("event_id", ip.alias("ip"))
    return src.selectExpr(
        "event_id",
        "CAST(ip div 16777216 AS STRING) || '.' || "
        "CAST((ip div 65536) % 256 AS STRING) || '.' || "
        "CAST((ip div 256) % 256 AS STRING) || '.' || "
        "CAST(ip % 256 AS STRING) AS ip_str",
        "ip div 65536 AS net16",
        "ip div 16777216 = 10 AS in_10_slash8",
        "ip div 4194304 = 49 AS in_cidr10",
        "CAST(ip AS BIGINT) AS ip_u32",
    )


@register(
    "fn_geo_haversine",
    oracle="""
WITH pts AS (
  SELECT event_id,
         (CAST(event_id * 2654435761 % 1600001 AS DOUBLE) / 10000.0) - 80.0
           AS lat,
         (CAST(event_id * 40503 % 3600001 AS DOUBLE) / 10000.0) - 180.0
           AS lon
  FROM events WHERE event_id % 29 = 0
)
SELECT event_id,
       ROUND(lat, 4) AS lat, ROUND(lon, 4) AS lon,
       ROUND(
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(lat - 40.7128) / 2), 2)
           + cos(radians(lat)) * cos(radians(40.7128))
             * pow(sin(radians(lon - (-74.0060)) / 2), 2)
         )), 3) AS km_to_nyc
FROM pts
""",
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance — the geo primitive behind
    geofencing, nearest-POI features, and delivery-radius filters:
    each synthesized point (deterministic lat/lon from the event
    key; the fixture has no coordinates) gets its distance to a
    fixed anchor via the numerically-stable haversine form
    (asin-sqrt — well-conditioned for small angles where the plain
    spherical law of cosines loses digits). Both engines run the
    IDENTICAL expression tree over IEEE doubles and the same libm
    family (sin/cos/asin agree to <=1 ulp), so rounding the final
    kilometers to 3 decimals (~1 m) absorbs any ulp drift — the
    fn_math contract applied to trig. Scan-local; at 100 TB the
    same expression feeds a geohash-style integer bucketing
    (fn_zorder_key) for spatial joins."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 29 == 0)
    lat = (
        (F.col("event_id") * 2654435761 % 1600001).cast("double") / 10000.0
    ) - 80.0
    lon = (
        (F.col("event_id") * 40503 % 3600001).cast("double") / 10000.0
    ) - 180.0
    pts = ev.select("event_id", lat.alias("lat"), lon.alias("lon"))
    a = (
        F.pow(F.sin(F.radians(F.col("lat") - 40.7128) / 2), 2)
        + F.cos(F.radians("lat"))
        * F.cos(F.radians(F.lit(40.7128)))
        * F.pow(F.sin(F.radians(F.col("lon") - (-74.0060)) / 2), 2)
    )
    return pts.select(
        "event_id",
        F.round("lat", 4).alias("lat"),
        F.round("lon", 4).alias("lon"),
        F.round(2 * 6371.0088 * F.asin(F.sqrt(a)), 3).alias("km_to_nyc"),
    )


@register(
    "fn_try_collection",
    oracle="""
SELECT n_nationkey,
       CASE WHEN len(string_split(n_name, ' ')) >= 2
            THEN string_split(n_name, ' ')[2] END AS second_token,
       string_split(n_name, ' ')[-1] AS last_token,
       CAST(NULL AS VARCHAR) AS beyond_end,
       CASE WHEN n_regionkey <> 0
            THEN CAST(n_nationkey // n_regionkey AS BIGINT) END AS try_div_key
FROM nation
""",
)
def fn_try_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY-variant collection access — the out-of-bounds semantics
    that differ between `element_at` (ANSI: ERROR on a bad index)
    and `try_element_at` (NULL): second token when present, negative
    indexing for the last token, a deliberately out-of-range index
    that must come back NULL instead of killing the job, and
    try_divide for the division twin. On an ANSI-mode 100 TB
    pipeline this family is the difference between one malformed
    row quarantining itself as NULL and one malformed row failing a
    six-hour job. The oracle states the same semantics with guards
    (DuckDB list indexing is NULL-safe natively; the CASE guards
    document the contract being tested)."""
    n = table(spark, sf_dir, "nation")
    toks = F.split("n_name", " ")
    return n.select(
        "n_nationkey",
        F.try_element_at(toks, F.lit(2)).alias("second_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.try_element_at(toks, F.lit(99)).alias("beyond_end"),
        F.try_divide(F.col("n_nationkey"), F.col("n_regionkey"))
        .cast("bigint")
        .alias("try_div_key"),
    )


@register(
    "fn_levenshtein_threshold",
    oracle="""
WITH pairs AS (
  SELECT a.n_nationkey AS id_a, b.n_nationkey AS id_b,
         a.n_name AS na, b.n_name AS nb
  FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
)
SELECT id_a, id_b,
       CAST(CASE WHEN levenshtein(na, nb) <= 3
                 THEN levenshtein(na, nb) ELSE -1 END AS BIGINT)
         AS bounded_dist,
       CAST(levenshtein(na, nb) AS BIGINT) AS full_dist
FROM pairs
""",
)
def fn_levenshtein_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED edit distance — `levenshtein(l, r, threshold)` (Spark
    3.5+) returns -1 the moment the distance provably exceeds the
    bound, turning the O(|l|*|r|) matrix into an O(k*min(|l|,|r|))
    band. That asymptotic is why every fuzzy-verify pass at scale
    (dedup_levenshtein_verify's adjudicator) should carry its
    acceptance threshold INTO the kernel rather than filter after:
    at k=3 over 200-char fields the banded form does ~1.5% of the
    work. The oracle states the contract definitionally (full
    distance, CASE'd at the bound — DuckDB has no threshold arg),
    and emitting both columns pins the -1 sentinel semantics
    exactly. Nation-pair cross is dim-sized by construction."""
    n = table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("id_a"), F.col("n_name").alias("na"))
    b = n.select(F.col("n_nationkey").alias("id_b"), F.col("n_name").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.levenshtein("na", "nb", 3).cast("bigint").alias("bounded_dist"),
        F.levenshtein("na", "nb").cast("bigint").alias("full_dist"),
    )


@register(
    "fn_split_part",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', -1) AS last_word,
       CASE WHEN len(string_split(p_name, ' ')) >= 3
            THEN string_split(p_name, ' ')[3] ELSE '' END AS third_word
FROM part
""",
)
def fn_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`split_part` — field extraction from delimited strings as ONE
    scan-local expression (the everyday parse for paths, SKUs,
    hierarchical names): first field, NEGATIVE indexing from the
    end, and the out-of-range contract (empty string, NOT an error
    and NOT NULL — all three engines' split_part agree on '' and the
    key pins it; contrast fn_try_collection where array indexing
    returns NULL). The out-of-range third_word is spelled
    definitionally in the oracle (CASE to ''), pinning the rule
    rather than trusting engine agreement."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1)).alias("last_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(3)).alias("third_word"),
    )


@register(
    "fn_stack_wide_to_long",
    oracle="""
SELECT n_nationkey, metric, value FROM (
  SELECT n_nationkey, 'name_len' AS metric,
         CAST(length(n_name) AS BIGINT) AS value
  FROM nation
  UNION ALL
  SELECT n_nationkey, 'region', CAST(n_regionkey AS BIGINT) FROM nation
  UNION ALL
  SELECT n_nationkey, 'key_mod7', CAST(n_nationkey % 7 AS BIGINT) FROM nation
)
""",
)
def fn_stack_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`stack(n, k1, v1, k2, v2, ...)` — wide-to-long reshaping as a
    single GENERATOR expression (the third spelling of melt in this
    registry: unpivot_long is the DataFrame API, udtf_analyze_
    polymorphic the UDTF; stack is the expression form that inlines
    into any SELECT with no join and no Python). Catalyst plans one
    Generate node over the scan — the row expansion happens inside
    codegen, which is why stack is the cheapest melt at scale. The
    oracle is the definitional UNION ALL."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.expr(
            "stack(3,"
            " 'name_len', CAST(length(n_name) AS BIGINT),"
            " 'region', CAST(n_regionkey AS BIGINT),"
            " 'key_mod7', CAST(n_nationkey % 7 AS BIGINT)"
            ") AS (metric, value)"
        ),
    )


@register(
    "fn_business_days",
    oracle="""
WITH ship AS (
  SELECT l_orderkey AS okey, MIN(l_shipdate) AS first_ship
  FROM lineitem GROUP BY l_orderkey
),
d AS (
  SELECT o.o_orderkey,
         date_trunc('day', o.o_orderdate) AS d1,
         date_trunc('day', s.first_ship) AS d2,
         CAST(date_diff('day', date_trunc('day', o.o_orderdate),
                        date_trunc('day', s.first_ship)) AS BIGINT) AS cal_days,
         CAST(date_part('isodow', o.o_orderdate) AS BIGINT) AS w1
  FROM orders o JOIN ship s ON o.o_orderkey = s.okey
)
SELECT o_orderkey, d1, d2, cal_days, w1,
       (cal_days // 7) * 5
       + (CASE WHEN 1 <= cal_days % 7 AND (w1 - 1 + 1) % 7 < 5 THEN 1 ELSE 0 END)
       + (CASE WHEN 2 <= cal_days % 7 AND (w1 - 1 + 2) % 7 < 5 THEN 1 ELSE 0 END)
       + (CASE WHEN 3 <= cal_days % 7 AND (w1 - 1 + 3) % 7 < 5 THEN 1 ELSE 0 END)
       + (CASE WHEN 4 <= cal_days % 7 AND (w1 - 1 + 4) % 7 < 5 THEN 1 ELSE 0 END)
       + (CASE WHEN 5 <= cal_days % 7 AND (w1 - 1 + 5) % 7 < 5 THEN 1 ELSE 0 END)
       + (CASE WHEN 6 <= cal_days % 7 AND (w1 - 1 + 6) % 7 < 5 THEN 1 ELSE 0 END)
         AS bus_days
FROM d
""",
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-DAY difference (order date -> first ship date) in
    closed form — no calendar table, no per-day explode: full weeks
    contribute 5 each (integer division), and the <=6 remainder days
    are tested individually against the ISO weekday of the start
    ((w1-1+i) mod 7 < 5 means day i of the tail is Mon-Fri). The
    count is exclusive of the start day, inclusive of the end —
    pinned by the same 6-term expression on both engines, pure
    integer arithmetic, scan-local after one agg+broadcast join.
    Spark weekday()+1 == DuckDB isodow (module convention)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    ship = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.min("l_shipdate").alias("first_ship")
    )
    d = o.join(ship, o.o_orderkey == F.col("okey")).select(
        "o_orderkey",
        F.date_trunc("day", "o_orderdate").alias("d1"),
        F.date_trunc("day", "first_ship").alias("d2"),
        F.datediff(
            F.date_trunc("day", "first_ship"), F.date_trunc("day", "o_orderdate")
        )
        .cast("bigint")
        .alias("cal_days"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("w1"),
    )
    rem = F.col("cal_days") % 7
    extra = sum(
        F.when(
            (F.lit(i) <= rem) & (((F.col("w1") - 1 + i) % 7) < 5), 1
        ).otherwise(0)
        for i in range(1, 7)
    )
    return d.select(
        "o_orderkey",
        "d1",
        "d2",
        "cal_days",
        "w1",
        (F.expr("cal_days DIV 7") * 5 + extra).alias("bus_days"),
    )


@register(
    "fn_luhn_checksum",
    oracle="""
WITH digits AS (
  SELECT o_orderkey,
         """ + " + ".join(
        # position i from the right of the payload; odd positions
        # (0-based even index) are doubled per Luhn
        (
            f"(CASE WHEN ((o_orderkey // {10 ** i}) % 10) * 2 > 9 "
            f"THEN ((o_orderkey // {10 ** i}) % 10) * 2 - 9 "
            f"ELSE ((o_orderkey // {10 ** i}) % 10) * 2 END)"
            if i % 2 == 0
            else f"((o_orderkey // {10 ** i}) % 10)"
        )
        for i in range(12)
    ) + """ AS luhn_sum
  FROM orders
)
SELECT o_orderkey, CAST(luhn_sum AS BIGINT) AS luhn_sum,
       CAST((10 - luhn_sum % 10) % 10 AS BIGINT) AS check_digit
FROM digits
""",
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN (mod-10) CHECK DIGIT — the checksum behind card numbers,
    IMEIs, and most human-keyed numeric IDs, and therefore a staple
    DQ validation: compute the check digit an id-issuing system
    would append to each order key. Classic algorithm, fully
    unrolled over 12 decimal positions as pure integer div/mod
    arithmetic (rightmost payload digit doubles, digit-sums fold as
    x-9): no string ops, no UDF, scan-local in one codegen span —
    the same 12-term expression on both engines."""
    o = table(spark, sf_dir, "orders")
    terms = []
    for i in range(12):
        # integer DIV, not float division: stays exact past 2^53 ids
        digit = F.expr(f"o_orderkey DIV {10 ** i}") % 10
        if i % 2 == 0:
            doubled = digit * 2
            terms.append(F.when(doubled > 9, doubled - 9).otherwise(doubled))
        else:
            terms.append(digit)
    luhn_sum = terms[0]
    for t in terms[1:]:
        luhn_sum = luhn_sum + t
    return o.select(
        "o_orderkey",
        luhn_sum.cast("bigint").alias("luhn_sum"),
        ((10 - luhn_sum % 10) % 10).cast("bigint").alias("check_digit"),
    )


@register(
    "fn_iban_mod97",
    oracle="""
WITH built AS (
  SELECT c_custkey,
         'GB' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')
              || chr(65 + CAST(c_custkey % 26 AS INTEGER))
              || chr(65 + CAST(c_custkey * 2 % 26 AS INTEGER))
              || chr(65 + CAST(c_custkey * 3 % 26 AS INTEGER))
              || chr(65 + CAST(c_custkey * 5 % 26 AS INTEGER))
              || lpad(CAST(c_custkey * 7919 % 100000000000000 AS VARCHAR),
                      14, '0') AS iban
  FROM customer
),
folded AS (
  SELECT c_custkey, iban,
         list_reduce(
           list_transform(
             string_split_regex(substr(iban, 5) || substr(iban, 1, 4), ''),
             c -> CASE WHEN c BETWEEN '0' AND '9' THEN CAST(c AS INTEGER)
                       ELSE ord(c) - 55 END),
           (acc, v) -> (acc * (CASE WHEN v < 10 THEN 10 ELSE 100 END) + v)
                       % 97) AS residue
  FROM built
)
SELECT c_custkey, iban, CAST(residue AS BIGINT) AS residue,
       residue = 1 AS valid
FROM folded
""",
)
def fn_iban_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBAN mod-97 VALIDATION (ISO 7064 / ISO 13616): move the first
    4 chars to the end, expand letters to two digits (A=10..Z=35),
    and the number mod 97 must equal 1. The expanded number is up to
    ~34 digits — far past BIGINT — so the practical implementation
    is the char-by-char FOLD acc = (acc*10_or_100 + v) mod 97, which
    both engines run as a higher-order array fold (Spark
    F.aggregate, DuckDB list_reduce), entirely JVM/vector-side — the
    canonical 'checksum too big for the integer type' pattern every
    payments DQ pipeline needs. IBANs are synthesized GB-style from
    c_custkey (letters in the bank code exercise the two-digit
    expansion; check digits come from custkey%100, so ~1% validate
    and the rest pin the residue arithmetic)."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    letter = lambda m: F.chr(  # noqa: E731
        (65 + (k * m) % 26).cast("bigint")
    )
    iban = F.concat(
        F.lit("GB"),
        F.lpad((k % 100).cast("string"), 2, "0"),
        letter(1),
        letter(2),
        letter(3),
        letter(5),
        F.lpad((k * 7919 % 100000000000000).cast("string"), 14, "0"),
    )
    d = c.select("c_custkey", iban.alias("iban"))
    rearr = F.concat(F.substring("iban", 5, 18), F.substring("iban", 1, 4))
    vals = F.transform(
        F.split(rearr, ""),
        lambda ch: F.when(
            ch.between("0", "9"), ch.cast("int")
        ).otherwise(F.ascii(ch) - 55),
    )
    residue = F.aggregate(
        vals,
        F.lit(0),
        lambda acc, v: (
            acc * F.when(v < 10, F.lit(10)).otherwise(F.lit(100)) + v
        )
        % 97,
    )
    return d.select(
        "c_custkey",
        "iban",
        residue.cast("bigint").alias("residue"),
        (residue == 1).alias("valid"),
    )


_ULID_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def _ulid_sql(div_op: str) -> str:
    """Shared ULID expression, parameterized only by the engine's
    integer-division operator (Spark `DIV`, DuckDB `//`): 10
    Crockford-base32 chars from the 48-bit millisecond timestamp
    (top 2 bits zero-padded per spec) + 16 chars from two 40-bit
    md5-derived words — 26 chars, lexicographically time-ordered."""
    from ..operators.trainprep import MD5_WORD

    alph = f"'{_ULID_ALPHABET}'"
    hi = MD5_WORD("o_orderkey", 10)
    lo = MD5_WORD("concat(cast(o_orderkey as string), 'x')", 10)
    parts = []
    for i in range(10):
        p = 2 ** (45 - 5 * i)
        parts.append(f"substr({alph}, CAST((t_ms {div_op} {p}) % 32 AS INT) + 1, 1)")
    for word in (hi, lo):
        for i in range(8):
            p = 2 ** (35 - 5 * i)
            parts.append(
                f"substr({alph}, CAST((({word}) {div_op} {p}) % 32 AS INT) + 1, 1)"
            )
    return "concat(" + ", ".join(parts) + ")"


@register(
    "fn_ulid_encode",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey,
         CAST(date_diff('day', TIMESTAMP '1970-01-01',
                        date_trunc('day', o_orderdate)) AS BIGINT)
           * 86400000 AS t_ms
  FROM orders
)
SELECT o_orderkey, t_ms, {_ulid_sql("//")} AS ulid
FROM t
""",
)
def fn_ulid_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ULID GENERATION — the sortable unique identifier (48-bit
    millisecond time + 80 bits of entropy, Crockford base32): ids
    that sort lexicographically BY CREATION TIME, which is what
    makes them the index-friendly replacement for UUIDv4 in
    log-structured storage. The entropy lanes are deterministic
    md5-derived words (the repo's no-RNG rule — reproducible across
    engines and retries); the 26 characters are pure integer
    div/mod arithmetic into the alphabet, generated from ONE shared
    expression builder so Spark and the oracle cannot drift. Scan-
    local, no shuffle, whole-stage codegen."""
    o = table(spark, sf_dir, "orders")
    # arithmetic epoch-ms (orderdate is midnight-precise): timezone-
    # free on both engines, unlike unix_millis on a TIMESTAMP_NTZ
    t = o.select(
        "o_orderkey",
        (
            F.datediff(
                F.date_trunc("day", "o_orderdate"),
                F.lit("1970-01-01").cast("timestamp"),
            ).cast("bigint")
            * 86400000
        ).alias("t_ms"),
    )
    return t.select("o_orderkey", "t_ms", F.expr(_ulid_sql("DIV")).alias("ulid"))


@register(
    "sql_parameterized_query",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_totalprice > 50000.0
GROUP BY o_orderpriority
""",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (named parameter markers, Spark 3.4+) —
    the injection-safe query API a serving layer needs: literals
    arrive as TYPED bind parameters (:min_date, :min_total), never
    string-spliced, so '1997-01-01; DROP TABLE' is a value, not
    SQL. The key pins that the PARSER binds both markers and that
    the bound literals still constant-fold into scan pushdown
    (same plan as inlining). DuckDB's oracle runs the inlined
    equivalent — identical semantics is exactly the claim."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM orders_param
        WHERE o_orderdate >= :min_date AND o_totalprice > :min_total
        GROUP BY o_orderpriority
        """,
        args={"min_date": "1997-01-01", "min_total": 50000.0},
    )


@register(
    "fn_month_arith_clamp",
    oracle="""
WITH d AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE) AS od
  FROM orders WHERE o_orderkey % 50 = 0
)
SELECT o_orderkey,
       CAST(od AS TIMESTAMP) AS order_date,
       CAST(od + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_1m,
       CAST(od + INTERVAL 13 MONTH AS TIMESTAMP) AS plus_13m,
       CAST(od - INTERVAL 2 MONTH AS TIMESTAMP) AS minus_2m,
       CAST(last_day(od) AS TIMESTAMP) AS month_end,
       CAST((od = last_day(od)) AS BOOLEAN) AS is_month_end,
       CAST(date_trunc('month', od) + INTERVAL 1 MONTH - INTERVAL 1 DAY
            AS TIMESTAMP) AS month_end_derived
FROM d
""",
)
def fn_month_arith_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MONTH ARITHMETIC CLAMP semantics — the calendar edge every
    billing system hits: Jan 31 + 1 month has no Feb 31, and the
    industry convention (Spark add_months, DuckDB + INTERVAL MONTH)
    CLAMPS to the month's last day rather than overflowing into
    March. This key pins that both engines agree on the clamp for
    +1/+13/-2 months across every month-end in a 7-year order
    history, plus the two month-end idioms (last_day vs
    trunc+1mo-1day) agreeing with each other — the identity a
    report migration must not break. Pure projection; pushdown
    keeps the sampled scan tiny."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        od.cast("timestamp").alias("order_date"),
        F.add_months(od, 1).cast("timestamp").alias("plus_1m"),
        F.add_months(od, 13).cast("timestamp").alias("plus_13m"),
        F.add_months(od, -2).cast("timestamp").alias("minus_2m"),
        F.last_day(od).cast("timestamp").alias("month_end"),
        (od == F.last_day(od)).alias("is_month_end"),
        F.date_sub(F.add_months(F.date_trunc("month", od).cast("date"), 1), 1)
        .cast("timestamp")
        .alias("month_end_derived"),
    )


def _soundex_sql(word: str, g_flag: bool) -> str:
    """Simplified-soundex key as a shared expression pipeline:
    lowercase -> first letter + consonant digit classes (vowels and
    h/w/y map to 0) -> collapse adjacent equal digits -> strip 0s ->
    first letter upper + first 3 digits right-padded with 0.

    DuckDB's regexp engine (RE2) has no backreferences and collapses
    runs only with an explicit 'g' flag, while Spark's Java regex
    replaces globally by default — so the run-collapse is ten chained
    per-digit '<d>+' replaces, parameterized only by the g-flag.
    Everything else (translate/substr/replace/upper/rpad) is
    identical text on both engines."""
    mapped = (
        f"translate(lower({word}), 'abcdefghijklmnopqrstuvwxyz',"
        f" '01230120022455012623010202')"
    )
    rest = f"substr({mapped}, 2)"
    for d in range(10):
        g = ", 'g'" if g_flag else ""
        rest = f"regexp_replace({rest}, '{d}+', '{d}'{g})"
    digits = f"replace({rest}, '0', '')"
    return (
        f"upper(substr(lower({word}), 1, 1)) || rpad(substr({digits}, 1, 3),"
        f" 3, '0')"
    )


@register(
    "fn_phonetic_soundex",
    oracle=f"""
WITH words AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
),
keys AS (
  SELECT w, {_soundex_sql('w', True)} AS sdx FROM words
)
SELECT sdx,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       MIN(w) AS example_word
FROM keys GROUP BY sdx
""",
    tags=("functions", "text"),
)
def fn_phonetic_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHONETIC BLOCKING KEY (simplified soundex) — the fuzzy-match
    staple that buckets 'smith'/'smyth' together before an expensive
    pairwise compare. Spark ships a soundex() builtin but DuckDB
    does not, so the spec is pinned as an explicit shared pipeline
    (translate to digit classes, collapse runs, strip separators,
    letter + 3 digits) built from primitives BOTH engines implement
    identically — the same cross-engine discipline as the repo's
    other shared-SQL-text lanes, and the honest way to hash-check a
    function one engine lacks. Runs over the distinct words of
    p_name; output is blocking-key -> bucket size, i.e. exactly the
    blocking histogram an entity-resolution pass plans with. One
    explode + two grid hash-aggs; at 100 TB the distinct-words agg
    is the only data-sized shuffle."""
    pt = table(spark, sf_dir, "part")
    words = (
        pt.select(F.explode(F.split("p_name", " ")).alias("w")).distinct()
    )
    keys = words.selectExpr("w", f"{_soundex_sql('w', False)} AS sdx")
    return keys.groupBy("sdx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.min("w").alias("example_word"),
    )


# Damm quasigroup table (the standard 10x10 anti-symmetric, weakly
# totally anti-symmetric matrix), flattened row-major into a 100-char
# literal: cell (i, d) = substr(TABLE, i*10 + d + 1, 1).
_DAMM_TABLE = (
    "0317598642"
    "7092154863"
    "4206871359"
    "1750983426"
    "6123045978"
    "3674209581"
    "5869720134"
    "8945362017"
    "9438617205"
    "2581436790"
)


def _damm_sql(key: str) -> str:
    """Damm check digit of a zero-padded 7-digit key as shared SQL:
    the quasigroup fold unrolls to 7 chained substr lookups into the
    literal table — a lookup-table technique both engines execute
    identically with no arithmetic at all."""
    padded = f"lpad(CAST({key} AS STRING), 7, '0')"
    interim = "0"
    for pos in range(1, 8):
        digit = f"CAST(substr({padded}, {pos}, 1) AS INT)"
        interim = (
            f"CAST(substr('{_DAMM_TABLE}',"
            f" ({interim}) * 10 + {digit} + 1, 1) AS INT)"
        )
    return interim


@register(
    "fn_damm_checksum",
    oracle=f"""
WITH keyed AS (
  SELECT c_custkey,
         {_damm_sql('c_custkey').replace('AS STRING', 'AS VARCHAR')} AS damm
  FROM customer
)
SELECT damm AS check_digit,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(SUM(CASE WHEN damm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_self_valid
FROM keyed GROUP BY damm
""",
    tags=("functions",),
)
def fn_damm_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAMM CHECK DIGIT — the quasigroup checksum that catches ALL
    single-digit errors AND all adjacent transpositions (which Luhn
    misses for 09<->90), used by industrial ID schemes; next to
    fn_luhn_checksum it completes the check-digit family. The
    10x10 anti-symmetric quasigroup lives in a 100-char string
    literal and the digit fold unrolls to 7 chained substr lookups
    — a shared-SQL LOOKUP-TABLE lane (zero arithmetic, zero doubles)
    that both engines evaluate bytewise-identically; the same trick
    generalizes to any table-driven codec. Output is the check-
    digit distribution over customer keys (near-uniform for a good
    quasigroup), keeping the whole fold under one projection +
    grid agg."""
    c = table(spark, sf_dir, "customer")
    keyed = c.selectExpr(
        "c_custkey", f"{_damm_sql('c_custkey')} AS damm"
    )
    return keyed.groupBy(F.col("damm").alias("check_digit")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.min("c_custkey").cast("bigint").alias("min_key"),
        F.sum(F.when(F.col("damm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_self_valid"),
    )


def _feistel_sql(key: str) -> str:
    """Two-round Feistel network over a 32-bit key split into 16-bit
    halves, round function = 16 bits of md5 of (half || round salt).
    A Feistel network is a BIJECTION regardless of the round
    function — shared SQL text, md5 nibbles only."""

    def rf(half: str, salt: str) -> str:
        h = f"md5(CAST({half} AS STRING) || '{salt}')"
        return (
            f"((instr('0123456789abcdef', substr({h}, 1, 1)) - 1) * 4096"
            f" + (instr('0123456789abcdef', substr({h}, 2, 1)) - 1) * 256"
            f" + (instr('0123456789abcdef', substr({h}, 3, 1)) - 1) * 16"
            f" + (instr('0123456789abcdef', substr({h}, 4, 1)) - 1))"
        )

    l0 = f"({key} % 65536)"
    r0 = f"({key} // 65536)" if False else f"CAST(floor({key} / 65536) AS BIGINT)"
    # round 1: (l1, r1) = (r0, l0 XOR F(r0))
    l1 = r0
    r1 = f"(({l0} + {rf(r0, ':f1')}) % 65536)"
    # round 2
    l2 = r1
    r2 = f"(({l1} + {rf(r1, ':f2')}) % 65536)"
    return f"({r2} * 65536 + {l2})"


@register(
    "fn_feistel_permutation",
    oracle=f"""
WITH scrambled AS (
  SELECT o_orderkey, {_feistel_sql('o_orderkey')} AS token
  FROM orders WHERE o_orderkey < CAST(65536 AS BIGINT) * 65536
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
       COUNT(*) = COUNT(DISTINCT token) AS is_bijective,
       CAST(MIN(token) AS BIGINT) AS min_token,
       CAST(MAX(token) AS BIGINT) AS max_token,
       CAST(SUM(CASE WHEN token = o_orderkey THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fixed_points
FROM scrambled
""",
    tags=("functions", "privacy"),
)
def fn_feistel_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORMAT-PRESERVING KEY SCRAMBLING via a 2-round FEISTEL
    NETWORK — the pseudonymization trick that beats both hashing
    (not invertible, collides) and sequence remapping (needs a
    mapping table): split the 32-bit key into 16-bit halves and
    swap-mix them with an md5-derived round function; the Feistel
    structure guarantees a BIJECTION of the 32-bit space no matter
    what the round function is, which the key asserts empirically
    (count == distinct count). Stateless, deterministic, join-safe
    across tables — scramble FKs on both sides and referential
    integrity survives pseudonymization. Same md5-nibble shared-SQL
    lane as the sampling keys; zero fixed points expected and
    reported."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 65536 * 65536
    )
    scrambled = o.selectExpr(
        "o_orderkey", f"{_feistel_sql('o_orderkey')} AS token"
    )
    return scrambled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.countDistinct("token").cast("bigint").alias("n_distinct_tokens"),
        (F.count(F.lit(1)) == F.countDistinct("token")).alias("is_bijective"),
        F.min("token").cast("bigint").alias("min_token"),
        F.max("token").cast("bigint").alias("max_token"),
        F.sum(F.when(F.col("token") == F.col("o_orderkey"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fixed_points"),
    )


def _easter_sql(y: str) -> tuple[str, str]:
    """Anonymous Gregorian computus (Meeus/Jones/Butcher) — pure
    integer arithmetic, identical text both engines; returns
    (month_expr, day_expr)."""
    a = f"({y} % 19)"
    b = f"CAST(floor({y} / 100) AS BIGINT)"
    c = f"({y} % 100)"
    d = f"CAST(floor({b} / 4) AS BIGINT)"
    e = f"({b} % 4)"
    f_ = f"CAST(floor(({b} + 8) / 25) AS BIGINT)"
    g = f"CAST(floor(({b} - {f_} + 1) / 3) AS BIGINT)"
    h = f"((19 * {a} + {b} - {d} - {g} + 15) % 30)"
    i = f"CAST(floor({c} / 4) AS BIGINT)"
    k = f"({c} % 4)"
    l = f"((32 + 2 * {e} + 2 * {i} - {h} - {k}) % 7)"
    m = f"CAST(floor(({a} + 11 * {h} + 22 * {l}) / 451) AS BIGINT)"
    month = f"CAST(floor(({h} + {l} - 7 * {m} + 114) / 31) AS BIGINT)"
    day = f"((({h} + {l} - 7 * {m} + 114) % 31) + 1)"
    return month, day


@register(
    "fn_easter_computus",
    oracle=f"""
WITH years AS (
  SELECT DISTINCT date_part('year', o_orderdate) AS y FROM orders
),
easter AS (
  SELECT y,
         {_easter_sql('y')[0]} AS em,
         {_easter_sql('y')[1]} AS ed
  FROM years
)
SELECT CAST(y AS BIGINT) AS year,
       CAST(em AS BIGINT) AS easter_month,
       CAST(ed AS BIGINT) AS easter_day,
       CAST(date_part('dow', make_date(CAST(y AS INT), CAST(em AS INT),
                                       CAST(ed AS INT))) AS BIGINT)
         AS day_of_week
FROM easter
""",
    tags=("functions", "datetime"),
)
def fn_easter_computus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EASTER COMPUTUS (anonymous Gregorian / Meeus-Jones-Butcher
    algorithm) — the hardest mainstream calendar computation (a
    lunisolar fixpoint no closed calendar API exposes), and the
    anchor for a whole family of business-calendar holidays (Good
    Friday, Pentecost = +49d). Pure integer div/mod arithmetic in
    SHARED SQL text over the fixture's order years; the oracle
    cross-checks the result by asking the engine's own calendar for
    the weekday — every computed date lands on day_of_week = 0
    (Sunday), which is the built-in correctness certificate. At 100
    TB calendar math is a broadcast dimension, never a row-wise
    UDF."""
    o = table(spark, sf_dir, "orders")
    years = o.select(F.year("o_orderdate").alias("y")).distinct()
    em, ed = _easter_sql("y")
    easter = years.selectExpr("y", f"{em} AS emn", f"{ed} AS edy")
    return easter.selectExpr(
        "CAST(y AS BIGINT) AS year",
        "CAST(emn AS BIGINT) AS easter_month",
        "CAST(edy AS BIGINT) AS easter_day",
        "CAST(dayofweek(make_date(CAST(y AS INT), CAST(emn AS INT),"
        " CAST(edy AS INT))) - 1 AS BIGINT) AS day_of_week",
    )


@register(
    "fn_uuid_v7",
    oracle="""
WITH b AS (
  SELECT o_orderkey,
         lpad(lower(hex(CAST(epoch_ms(o_orderdate) AS BIGINT))), 12, '0')
           AS ts_hex,
         md5(CAST(o_orderkey AS VARCHAR)) AS m
  FROM orders WHERE o_orderkey % 17 = 3
),
u AS (
  SELECT o_orderkey,
         ts_hex || '7' || substr(m, 1, 3)
           || substr('89ab',
                     1 + CAST(
                       (CASE WHEN substr(m, 4, 1) BETWEEN '0' AND '9'
                             THEN ascii(substr(m, 4, 1)) - 48
                             ELSE ascii(substr(m, 4, 1)) - 87 END) % 4
                       AS INT),
                     1)
           || substr(m, 5, 15) AS hex32
  FROM b
)
SELECT o_orderkey,
       substr(hex32, 1, 8) || '-' || substr(hex32, 9, 4) || '-'
         || substr(hex32, 13, 4) || '-' || substr(hex32, 17, 4) || '-'
         || substr(hex32, 21, 12) AS uuid7
FROM u
""",
    tags=("fn",),
)
def fn_uuid_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UUIDv7 construction from the RFC 9562 layout — the
    time-ordered UUID replacing v4 as the default surrogate key in
    new systems precisely because of a DISTRIBUTED-SYSTEMS property:
    the leading 48-bit unix-ms timestamp makes ids cluster by
    insertion time, so a parquet layout sorted by uuid7 gets the
    same row-group time-locality a date column gives (v4 ids
    scatter uniformly and destroy min/max pruning). Layout per spec:
    unix_ts_ms(48) | ver=7(4) | rand_a(12) | var=10xx(2) |
    rand_b(62); the 'random' bits here are md5-derived so the
    construction is deterministic and HASH-CHECKED cross-engine
    (the variant nibble maps one hash nibble onto {8,9,a,b} — the
    four RFC-valid values of the 10xx variant). Pure string/bit
    projection, scan-local, codegen'd; companion key to
    fn_ulid_encode (same idea, Crockford encoding) and
    fn_uuid_name_based (v5)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 3)
    b = o.select(
        "o_orderkey",
        F.lpad(
            F.lower(F.hex(F.unix_millis(F.col("o_orderdate").cast("timestamp")))),
            12, "0"
        ).alias("ts_hex"),
        F.md5(F.col("o_orderkey").cast("string")).alias("m"),
    )
    nib = F.substring("m", 4, 1)
    nib_val = (
        F.when(nib.between("0", "9"), F.ascii(nib) - 48)
        .otherwise(F.ascii(nib) - 87)
    )
    hex32 = F.concat(
        F.col("ts_hex"),
        F.lit("7"),
        F.substring("m", 1, 3),
        F.substring(F.lit("89ab"), (nib_val % 4 + 1).cast("int"), 1),
        F.substring("m", 5, 15),
    )
    u = b.select("o_orderkey", hex32.alias("hex32"))
    return u.select(
        "o_orderkey",
        F.concat_ws(
            "-",
            F.substring("hex32", 1, 8),
            F.substring("hex32", 9, 4),
            F.substring("hex32", 13, 4),
            F.substring("hex32", 17, 4),
            F.substring("hex32", 21, 12),
        ).alias("uuid7"),
    )


# ---------------------------------------------------------- round 9

@register(
    "fn_semver_compare",
    oracle="""
WITH v AS (
  SELECT p_partkey, p_brand,
         CAST(p_size % 5 AS BIGINT) || '.'
           || CAST(p_partkey % 6 AS BIGINT) || '.'
           || CAST(p_partkey % 3 AS BIGINT)
           || CASE p_partkey % 4
                WHEN 1 THEN '-alpha'
                WHEN 2 THEN '-' || CAST(p_partkey % 20 AS BIGINT)
                WHEN 3 THEN '-rc'
                ELSE '' END AS version
  FROM part
),
parsed AS (
  SELECT p_partkey, p_brand, version,
         CAST(split_part(split_part(version, '-', 1), '.', 1) AS BIGINT) AS maj,
         CAST(split_part(split_part(version, '-', 1), '.', 2) AS BIGINT) AS mnr,
         CAST(split_part(split_part(version, '-', 1), '.', 3) AS BIGINT) AS pat,
         CASE WHEN version LIKE '%-%'
              THEN split_part(version, '-', 2) ELSE NULL END AS pre
  FROM v
),
keyed AS (
  SELECT p_partkey, p_brand, version, maj, mnr, pat,
         CASE WHEN pre IS NULL THEN 1 ELSE 0 END AS is_release,
         CASE WHEN pre IS NULL THEN 1
              WHEN regexp_matches(pre, '^[0-9]+$') THEN 0 ELSE 1 END
           AS pre_alpha,
         CASE WHEN pre IS NOT NULL AND regexp_matches(pre, '^[0-9]+$')
              THEN CAST(pre AS BIGINT) ELSE -1 END AS pre_num,
         COALESCE(CASE WHEN pre IS NOT NULL
                       AND NOT regexp_matches(pre, '^[0-9]+$')
                       THEN pre END, '') AS pre_str
  FROM parsed
)
SELECT p_partkey, version,
       CAST(RANK() OVER (PARTITION BY p_brand
         ORDER BY maj, mnr, pat, is_release, pre_alpha, pre_num, pre_str)
         AS BIGINT) AS precedence_rank
FROM keyed
""",
)
def fn_semver_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMVER 2.0.0 PRECEDENCE (semver.org §11) — parse version
    strings and rank them by the spec's comparison algebra: numeric
    major.minor.patch; ANY pre-release sorts BEFORE its release
    (1.2.3-rc < 1.2.3 — the rule naive string sorts get backwards);
    among pre-releases, numeric identifiers compare numerically and
    sort BEFORE alphanumeric ones, which compare as ASCII strings.
    The version strings are constructed from part keys (so all four
    shapes — release, numeric pre, 'alpha', 'rc' — occur and tie
    within a (maj,mnr,pat) group), then PARSED BACK with
    split_part/regexp like any registry/package-index pipeline
    would: the operator's surface is string-in, rank-out. RANK (not
    row_number) exposes precedence TIES exactly — equal versions
    share a rank. Scale: pure per-row string functions + one
    brand-partitioned window; no shuffle beyond the rank's hash
    partition."""
    p = table(spark, sf_dir, "part")
    version = F.concat(
        (F.col("p_size") % 5).cast("bigint").cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 6).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 3).cast("string"),
        F.when(F.col("p_partkey") % 4 == 1, F.lit("-alpha"))
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat(F.lit("-"), (F.col("p_partkey") % 20).cast("string")),
        )
        .when(F.col("p_partkey") % 4 == 3, F.lit("-rc"))
        .otherwise(F.lit("")),
    )
    v = p.select("p_partkey", "p_brand", version.alias("version"))
    core = F.split_part(F.col("version"), F.lit("-"), F.lit(1))
    pre = F.when(
        F.col("version").like("%-%"),
        F.split_part(F.col("version"), F.lit("-"), F.lit(2)),
    )
    parsed = v.select(
        "p_partkey",
        "p_brand",
        "version",
        F.split_part(core, F.lit("."), F.lit(1)).cast("bigint").alias("maj"),
        F.split_part(core, F.lit("."), F.lit(2)).cast("bigint").alias("mnr"),
        F.split_part(core, F.lit("."), F.lit(3)).cast("bigint").alias("pat"),
        pre.alias("pre"),
    )
    is_num = F.col("pre").rlike("^[0-9]+$")
    keyed = parsed.select(
        "p_partkey",
        "p_brand",
        "version",
        "maj",
        "mnr",
        "pat",
        F.when(F.col("pre").isNull(), 1).otherwise(0).alias("is_release"),
        F.when(F.col("pre").isNull(), 1)
        .when(is_num, 0)
        .otherwise(1)
        .alias("pre_alpha"),
        F.when(F.col("pre").isNotNull() & is_num, F.col("pre").cast("bigint"))
        .otherwise(F.lit(-1))
        .alias("pre_num"),
        F.coalesce(
            F.when(F.col("pre").isNotNull() & ~is_num, F.col("pre")), F.lit("")
        ).alias("pre_str"),
    )
    w = Window.partitionBy("p_brand").orderBy(
        "maj", "mnr", "pat", "is_release", "pre_alpha", "pre_num", "pre_str"
    )
    return keyed.select(
        "p_partkey",
        "version",
        F.rank().over(w).cast("bigint").alias("precedence_rank"),
    )


@register(
    "fn_cron_next_fire",
    oracle="""
WITH spec AS (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 60 AS BIGINT) AS cm,
         CAST(o_orderkey % 24 AS BIGINT) AS ch,
         CAST(o_orderkey % 7 AS BIGINT) AS cdow,
         CAST(dayofweek(o_orderdate) AS BIGINT) AS now_dow
  FROM orders
),
calc AS (
  SELECT o_orderkey, o_orderdate, cm, ch, cdow,
         CASE WHEN (cdow - now_dow + 7) % 7 = 0 AND ch = 0 AND cm = 0
              THEN 7 ELSE (cdow - now_dow + 7) % 7 END AS days_ahead
  FROM spec
)
SELECT o_orderkey,
       CAST(cm AS VARCHAR) || ' ' || CAST(ch AS VARCHAR) || ' * * '
         || CAST(cdow AS VARCHAR) AS cron_expr,
       o_orderdate + INTERVAL (days_ahead) DAY + INTERVAL (ch) HOUR
         + INTERVAL (cm) MINUTE AS next_fire,
       CAST(days_ahead * 1440 + ch * 60 + cm AS BIGINT) AS wait_minutes
FROM calc
""",
)
def fn_cron_next_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRON NEXT-FIRE-TIME evaluation for the (minute hour * * dow)
    schedule family — the scheduler primitive behind every batch
    orchestrator: given 'now' (o_orderdate, midnight-valued) and a
    cron spec derived from the order key, compute the next strictly-
    future fire instant CLOSED-FORM (no candidate-grid scan):
    days_ahead = (dow_target - dow_now) mod 7, bumped to a full week
    when the same-day fire time (h=0,m=0) would collide with 'now'
    exactly — the strictly-after contract. Both engines share the
    cron dow convention 0=Sunday; Spark's dayofweek() is 1=Sunday,
    so the Spark side shifts by 1 while DuckDB's dayofweek() is
    0=Sunday natively — the one calendar-convention seam, pinned by
    the oracle (house determinism rule 6 families). wait_minutes is
    exact integer arithmetic; next_fire is date + interval on both
    sides. Scale: pure per-row expressions, zero shuffles — the
    100 TB shape is a map over the schedule table."""
    o = table(spark, sf_dir, "orders")
    spec = o.select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderkey") % 60).cast("bigint").alias("cm"),
        (F.col("o_orderkey") % 24).cast("bigint").alias("ch"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("cdow"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("now_dow"),
    )
    raw = (F.col("cdow") - F.col("now_dow") + 7) % 7
    days = F.when(
        (raw == 0) & (F.col("ch") == 0) & (F.col("cm") == 0), F.lit(7)
    ).otherwise(raw)
    calc = spec.withColumn("days_ahead", days.cast("bigint"))
    return calc.select(
        "o_orderkey",
        F.concat_ws(
            " ",
            F.col("cm").cast("string"),
            F.col("ch").cast("string"),
            F.lit("*"),
            F.lit("*"),
            F.col("cdow").cast("string"),
        ).alias("cron_expr"),
        (
            F.col("o_orderdate")
            + F.expr("make_interval(0, 0, 0, days_ahead, ch, cm, 0)")
        ).alias("next_fire"),
        (F.col("days_ahead") * 1440 + F.col("ch") * 60 + F.col("cm"))
        .cast("bigint")
        .alias("wait_minutes"),
    )


@register(
    "fn_snowflake_id_decode",
    oracle="""
WITH src AS (
  SELECT o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) * 86400000 AS ts_ms,
         o_custkey % 32 AS dc,
         o_orderkey % 32 AS wk,
         o_orderkey % 4096 AS seq
  FROM orders WHERE o_orderkey % 7 = 2
),
ids AS (
  SELECT o_orderkey,
         (ts_ms << 22) | (dc << 17) | (wk << 12) | seq AS snowflake_id,
         ts_ms, dc, wk, seq
  FROM src
)
SELECT o_orderkey,
       CAST(snowflake_id AS BIGINT) AS snowflake_id,
       CAST(snowflake_id >> 22 AS BIGINT) AS dec_ts_ms,
       CAST((snowflake_id >> 17) & 31 AS BIGINT) AS dec_datacenter,
       CAST((snowflake_id >> 12) & 31 AS BIGINT) AS dec_worker,
       CAST(snowflake_id & 4095 AS BIGINT) AS dec_sequence,
       (snowflake_id >> 22) = ts_ms AND ((snowflake_id >> 17) & 31) = dc
         AND ((snowflake_id >> 12) & 31) = wk
         AND (snowflake_id & 4095) = seq AS roundtrip_ok
FROM ids
""",
)
def fn_snowflake_id_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNOWFLAKE-ID PACK/DECODE — the 64-bit time-sortable id layout
    (41-bit ms timestamp | 5-bit datacenter | 5-bit worker | 12-bit
    sequence) every distributed id service mints (Twitter
    Snowflake; Discord/Instagram variants shift the same fields).
    Ids are PACKED from order attributes with shift-or arithmetic
    and DECODED back with shift-and masks — the decode any
    event-pipeline does to recover event time + shard from a bare
    id without a lookup join (the k-sortability that makes these
    ids range-prunable in time-partitioned storage). All BIGINT
    bitwise ops, JVM-side, zero shuffle: per-row codegen at any
    scale; the roundtrip_ok column certifies pack∘decode =
    identity on every row."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 2)
    src = o.select(
        "o_orderkey",
        (F.unix_date(F.col("o_orderdate").cast("date")).cast("bigint") * 86400000).alias("ts_ms"),
        (F.col("o_custkey") % 32).alias("dc"),
        (F.col("o_orderkey") % 32).alias("wk"),
        (F.col("o_orderkey") % 4096).alias("seq"),
    )
    sid = (
        F.shiftleft("ts_ms", 22)
        .bitwiseOR(F.shiftleft("dc", 17))
        .bitwiseOR(F.shiftleft("wk", 12))
        .bitwiseOR(F.col("seq"))
    )
    ids = src.select("o_orderkey", sid.alias("snowflake_id"), "ts_ms", "dc", "wk", "seq")
    s = F.col("snowflake_id")
    dec_ts = F.shiftright(s, 22)
    dec_dc = F.shiftright(s, 17).bitwiseAND(F.lit(31))
    dec_wk = F.shiftright(s, 12).bitwiseAND(F.lit(31))
    dec_seq = s.bitwiseAND(F.lit(4095))
    return ids.select(
        "o_orderkey",
        s.cast("bigint").alias("snowflake_id"),
        dec_ts.cast("bigint").alias("dec_ts_ms"),
        dec_dc.cast("bigint").alias("dec_datacenter"),
        dec_wk.cast("bigint").alias("dec_worker"),
        dec_seq.cast("bigint").alias("dec_sequence"),
        (
            (dec_ts == F.col("ts_ms"))
            & (dec_dc == F.col("dc"))
            & (dec_wk == F.col("wk"))
            & (dec_seq == F.col("seq"))
        ).alias("roundtrip_ok"),
    )


@register(
    "fn_user_agent_parse",
    oracle="""
WITH ua AS (
  SELECT c_custkey,
         CAST(90 + c_custkey % 30 AS BIGINT) AS v,
         CAST(4000 + c_custkey % 500 AS BIGINT) AS b,
         c_custkey % 5 AS cls
  FROM customer
),
s AS (
  SELECT c_custkey,
    CASE cls
      WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/' || v || '.0.' || b || '.100 Safari/537.36'
      WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/' || v || '.1 Safari/605.1.15'
      WHEN 2 THEN 'Mozilla/5.0 (X11; Linux x86_64; rv:' || v || '.0) Gecko/20100101 Firefox/' || v || '.0'
      WHEN 3 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/' || v || '.0.0.0 Safari/537.36 Edg/' || v || '.0.' || b || '.64'
      ELSE 'Googlebot/2.1 (+http://www.google.com/bot.html)'
    END AS ua
  FROM ua
)
SELECT c_custkey, ua,
  CASE WHEN regexp_matches(lower(ua), 'bot') THEN 'bot'
       WHEN ua LIKE '%Edg/%' THEN 'Edge'
       WHEN ua LIKE '%Chrome/%' THEN 'Chrome'
       WHEN ua LIKE '%Firefox/%' THEN 'Firefox'
       WHEN ua LIKE '%Version/%' AND ua LIKE '%Safari/%' THEN 'Safari'
       ELSE 'other' END AS family,
  CAST(CASE WHEN regexp_matches(lower(ua), 'bot') THEN 0
       WHEN ua LIKE '%Edg/%' THEN CAST(regexp_extract(ua, 'Edg/([0-9]+)', 1) AS BIGINT)
       WHEN ua LIKE '%Chrome/%' THEN CAST(regexp_extract(ua, 'Chrome/([0-9]+)', 1) AS BIGINT)
       WHEN ua LIKE '%Firefox/%' THEN CAST(regexp_extract(ua, 'Firefox/([0-9]+)', 1) AS BIGINT)
       WHEN ua LIKE '%Version/%' THEN CAST(regexp_extract(ua, 'Version/([0-9]+)', 1) AS BIGINT)
       ELSE 0 END AS BIGINT) AS major_version,
  CASE WHEN ua LIKE '%Windows NT%' THEN 'Windows'
       WHEN ua LIKE '%Mac OS X%' THEN 'macOS'
       WHEN ua LIKE '%Linux%' THEN 'Linux'
       ELSE 'other' END AS os
FROM s
""",
)
def fn_user_agent_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-AGENT PARSING — the first projection every web-log
    pipeline runs: classify browser family / major version / OS
    from the UA string with ordered token rules (bot markers first,
    then Edg/ BEFORE Chrome/ — Edge ships the Chrome token, the
    classic misclassification — then Firefox, then Safari which
    requires Version/ because Chrome also ships the Safari token).
    Five realistic UA shapes are synthesized per customer
    (Chrome/Safari/Firefox/Edge/bot with key-derived versions) and
    parsed back with the SAME regexp dialect both engines compile.
    Pure per-row string/regex projection: whole-stage codegen,
    pushdown-transparent, no shuffle at any scale."""
    c = table(spark, sf_dir, "customer")
    v = (90 + F.col("c_custkey") % 30).cast("bigint").cast("string")
    b = (4000 + F.col("c_custkey") % 500).cast("bigint").cast("string")
    cls = F.col("c_custkey") % 5
    ua = (
        F.when(cls == 0, F.concat(F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/"), v, F.lit(".0."), b, F.lit(".100 Safari/537.36")))
        .when(cls == 1, F.concat(F.lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/"), v, F.lit(".1 Safari/605.1.15")))
        .when(cls == 2, F.concat(F.lit("Mozilla/5.0 (X11; Linux x86_64; rv:"), v, F.lit(".0) Gecko/20100101 Firefox/"), v, F.lit(".0")))
        .when(cls == 3, F.concat(F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/"), v, F.lit(".0.0.0 Safari/537.36 Edg/"), v, F.lit(".0."), b, F.lit(".64")))
        .otherwise(F.lit("Googlebot/2.1 (+http://www.google.com/bot.html)"))
    )
    s = c.select("c_custkey", ua.alias("ua"))
    u = F.col("ua")
    is_bot = F.lower(u).rlike("bot")
    family = (
        F.when(is_bot, "bot")
        .when(u.contains("Edg/"), "Edge")
        .when(u.contains("Chrome/"), "Chrome")
        .when(u.contains("Firefox/"), "Firefox")
        .when(u.contains("Version/") & u.contains("Safari/"), "Safari")
        .otherwise("other")
    )
    major = (
        F.when(is_bot, F.lit("0"))
        .when(u.contains("Edg/"), F.regexp_extract(u, r"Edg/([0-9]+)", 1))
        .when(u.contains("Chrome/"), F.regexp_extract(u, r"Chrome/([0-9]+)", 1))
        .when(u.contains("Firefox/"), F.regexp_extract(u, r"Firefox/([0-9]+)", 1))
        .when(u.contains("Version/"), F.regexp_extract(u, r"Version/([0-9]+)", 1))
        .otherwise(F.lit("0"))
    )
    os_ = (
        F.when(u.contains("Windows NT"), "Windows")
        .when(u.contains("Mac OS X"), "macOS")
        .when(u.contains("Linux"), "Linux")
        .otherwise("other")
    )
    return s.select(
        "c_custkey",
        "ua",
        family.alias("family"),
        major.cast("bigint").alias("major_version"),
        os_.alias("os"),
    )


@register(
    "fn_mime_type_sniff",
    oracle="""
WITH src AS (
  SELECT doc_id,
         CASE doc_id % 8
           WHEN 0 THEN '89504E470D0A1A0A'
           WHEN 1 THEN 'FFD8FFE0'
           WHEN 2 THEN '474946383961'
           WHEN 3 THEN '255044462D'
           WHEN 4 THEN '504B0304'
           WHEN 5 THEN '1F8B08'
           WHEN 6 THEN '524946460000000057415645'
           ELSE '00000018667479706D703432'
         END || upper(md5(text)) AS hx
  FROM documents
),
h AS (SELECT doc_id, substr(hx, 1, 32) AS h32, substr(hx, 1, 8) AS magic8
      FROM src)
SELECT doc_id, magic8,
  CASE WHEN h32 LIKE '89504E47%' THEN 'image/png'
       WHEN h32 LIKE 'FFD8FF%' THEN 'image/jpeg'
       WHEN h32 LIKE '4749463837%' OR h32 LIKE '4749463839%' THEN 'image/gif'
       WHEN h32 LIKE '25504446%' THEN 'application/pdf'
       WHEN h32 LIKE '504B0304%' THEN 'application/zip'
       WHEN h32 LIKE '1F8B%' THEN 'application/gzip'
       WHEN h32 LIKE '52494646%' AND substr(h32, 17, 8) = '57415645'
         THEN 'audio/wav'
       WHEN substr(h32, 9, 8) = '66747970' THEN 'video/mp4'
       ELSE 'application/octet-stream' END AS mime
FROM h
""",
)
def fn_mime_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIME-TYPE SNIFFING BY MAGIC BYTES — the ingestion gate every
    multimodal corpus needs BEFORE trusting a file extension: the
    content-type is decided from the leading bytes (PNG's 8-byte
    signature, JPEG FFD8FF, GIF87a/89a, %PDF-, ZIP PK.., gzip 1F8B,
    plus the two NON-prefix shapes that break naive startswith
    sniffers — RIFF needs 'WAVE' at byte offset 8, MP4 keys on
    'ftyp' at offset 4 AFTER the box-size word). Eight header
    shapes are synthesized per document (magic + md5-of-text
    payload), materialized as a real BINARY column via unhex, and
    sniffed Spark-side with binary substring + hex — the actual
    byte-level plumbing a 100 TB binaryFile scan would run; the
    oracle mirrors the classification on the hex string. Per-row
    projection, codegen, no shuffle."""
    d = table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 8 == 0, "89504E470D0A1A0A")
        .when(F.col("doc_id") % 8 == 1, "FFD8FFE0")
        .when(F.col("doc_id") % 8 == 2, "474946383961")
        .when(F.col("doc_id") % 8 == 3, "255044462D")
        .when(F.col("doc_id") % 8 == 4, "504B0304")
        .when(F.col("doc_id") % 8 == 5, "1F8B08")
        .when(F.col("doc_id") % 8 == 6, "524946460000000057415645")
        .otherwise("00000018667479706D703432")
    )
    bin_ = F.unhex(F.concat(magic, F.upper(F.md5("text"))))
    h = d.select(
        "doc_id",
        F.hex(F.substring(bin_, 1, 16)).alias("h32"),
        F.hex(F.substring(bin_, 1, 4)).alias("magic8"),
    )
    c = F.col("h32")
    mime = (
        F.when(c.startswith("89504E47"), "image/png")
        .when(c.startswith("FFD8FF"), "image/jpeg")
        .when(
            c.startswith("4749463837") | c.startswith("4749463839"),
            "image/gif",
        )
        .when(c.startswith("25504446"), "application/pdf")
        .when(c.startswith("504B0304"), "application/zip")
        .when(c.startswith("1F8B"), "application/gzip")
        .when(
            c.startswith("52494646")
            & (F.substring(c, 17, 8) == "57415645"),
            "audio/wav",
        )
        .when(F.substring(c, 9, 8) == "66747970", "video/mp4")
        .otherwise("application/octet-stream")
    )
    return h.select("doc_id", "magic8", mime.alias("mime"))


@register(
    "fn_quoted_printable",
    oracle="""
SELECT doc_id,
       CAST(strlen(text)
            - strlen(regexp_replace(text, '[^!-<>-~]', '', 'g'))
         AS BIGINT) AS n_escaped,
       md5(text) AS dec_md5,
       TRUE AS roundtrip_ok
FROM documents
""",
)
def fn_quoted_printable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUOTED-PRINTABLE CODEC (RFC 2045 §6.7) — the MIME transfer
    encoding every mbox/email pipeline must invert before text
    processing (pairs with source_mbox_messages): bytes outside
    the printable-ASCII safe set become =XX hex escapes, lines wrap
    at 76 chars with '=' soft breaks. Encode and decode run as
    Arrow-batched pandas UDFs over the CPython binascii
    b2a_qp/a2b_qp primitives (quotetabs mode: space/tab escape
    too, so the escape census is position-independent). The
    oracle certifies BOTH directions without reimplementing the
    codec in SQL: n_escaped (counted Spark-side from the ENCODED
    stream as '=HH' triplets — soft breaks '=\\n' never match) must
    equal the analytic unsafe-byte count octet_length minus the
    kept-safe-bytes length, and dec_md5 (md5 of the DECODED text)
    must equal md5 of the original — encode∘decode = identity,
    byte-exact. Scale: two vectorized Arrow stages, per-row,
    no shuffle."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("string")
    def qp_encode(s: pd.Series) -> pd.Series:
        import binascii

        return s.map(
            lambda t: binascii.b2a_qp(
                t.encode("utf-8"), quotetabs=1, istext=0
            ).decode("ascii")
        )

    @pandas_udf("string")
    def qp_decode(s: pd.Series) -> pd.Series:
        import binascii

        return s.map(
            lambda t: binascii.a2b_qp(t.encode("ascii")).decode("utf-8")
        )

    d = table(spark, sf_dir, "documents")
    enc = d.select("doc_id", "text", qp_encode("text").alias("enc"))
    return enc.select(
        "doc_id",
        F.regexp_count("enc", F.lit(r"=[0-9A-F]{2}"))
        .cast("bigint")
        .alias("n_escaped"),
        F.md5(qp_decode("enc")).alias("dec_md5"),
        (F.md5(qp_decode("enc")) == F.md5("text")).alias("roundtrip_ok"),
    )


@register(
    "fn_punycode",
    oracle="""
WITH lbl AS (
  SELECT p_partkey,
         lower(split_part(p_name, ' ', 1)) ||
         CASE p_partkey % 5
           WHEN 1 THEN 'é' WHEN 2 THEN 'ü' WHEN 3 THEN '中文'
           WHEN 4 THEN 'λ' ELSE '' END AS label
  FROM part
)
SELECT p_partkey, label,
       label = regexp_replace(label, '[^!-~]', '', 'g') AS is_ascii,
       NOT (label = regexp_replace(label, '[^!-~]', '', 'g')) AS has_xn_prefix,
       CAST(length(regexp_replace(label, '[^!-~]', '', 'g')) AS BIGINT)
         AS n_basic,
       CASE WHEN label = regexp_replace(label, '[^!-~]', '', 'g')
            THEN label END AS encoded_if_ascii,
       TRUE AS roundtrip_ok
FROM lbl
""",
)
def fn_punycode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PUNYCODE / IDN LABELS (RFC 3492 + the IDNA xn-- surface
    rule) — the encoding every URL canonicalizer and domain-dedup
    pipeline must apply before comparing hostnames: unicode labels
    become 'xn--' + the bootstring ASCII form; pure-ASCII labels
    pass through UNCHANGED (the identity the oracle checks
    literally via encoded_if_ascii). The codec is implemented
    FROM THE SPEC in operators/punycode.py (§6.1-6.3 pseudocode:
    bias adaptation, variable-length integers, the insertion-sort
    coding loop) and certified two ways: against the independent
    CPython 'punycode' codec in pytest, and here by the
    decode∘encode = identity roundtrip_ok column over every label
    plus the analytic basic-char census. Encode and decode run as
    Arrow-batched pandas UDFs — per-row, no shuffle; at 100 TB this
    is a map stage on the hostname column."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from ..operators.punycode import (  # noqa: PLC0415
        idn_decode_label,
        idn_encode_label,
    )

    @pandas_udf("string")
    def enc(s: pd.Series) -> pd.Series:
        return s.map(idn_encode_label)

    @pandas_udf("string")
    def dec(s: pd.Series) -> pd.Series:
        return s.map(idn_decode_label)

    p = table(spark, sf_dir, "part")
    suffix = (
        F.when(F.col("p_partkey") % 5 == 1, "é")
        .when(F.col("p_partkey") % 5 == 2, "ü")
        .when(F.col("p_partkey") % 5 == 3, "中文")
        .when(F.col("p_partkey") % 5 == 4, "λ")
        .otherwise("")
    )
    lbl = p.select(
        "p_partkey",
        F.concat(
            F.lower(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))),
            suffix,
        ).alias("label"),
    )
    basic = F.regexp_replace("label", r"[^!-~]", "")
    e = lbl.select(
        "p_partkey",
        "label",
        (F.col("label") == basic).alias("is_ascii"),
        enc("label").alias("encoded"),
        F.length(basic).cast("bigint").alias("n_basic"),
    )
    return e.select(
        "p_partkey",
        "label",
        "is_ascii",
        F.col("encoded").startswith("xn--").alias("has_xn_prefix"),
        "n_basic",
        F.when(F.col("is_ascii"), F.col("encoded")).alias(
            "encoded_if_ascii"
        ),
        (dec("encoded") == F.col("label")).alias("roundtrip_ok"),
    )


@register(
    "fn_xpath_extract",
    oracle="""
WITH x AS (
  SELECT o_orderkey,
         '<order id="' || o_orderkey || '"><status>' || o_orderstatus
         || '</status><items>'
         || repeat('<item qty="2"/>', CAST(1 + o_orderkey % 3 AS BIGINT))
         || '</items><total>' || CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
         || '</total></order>' AS xml
  FROM orders WHERE o_orderkey % 9 = 4
)
SELECT o_orderkey,
       regexp_extract(xml, 'id="([0-9]+)"', 1) AS id_attr,
       regexp_extract(xml, '<status>(.*?)</status>', 1) AS status,
       CAST(regexp_extract(xml, '<total>([0-9]+)</total>', 1) AS BIGINT)
         AS total_c,
       CAST((length(xml) - length(replace(xml, '<item ', ''))) // 6
            AS BIGINT) AS n_items
FROM x
""",
)
def fn_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPATH EXTRACTION — Spark's xpath_* function family (the
    Hive-inherited surface: xpath_string for text nodes,
    xpath_long for numeric casts, xpath_number with XPath's own
    count() for node-set cardinality, and attribute axes via /@id)
    run against per-row XML fragments — the shape config payloads
    and legacy B2B feeds arrive in when a full spark-xml schema
    read (source_xml) is overkill and you just need three fields
    out. DuckDB has no XPath engine, so the oracle extracts the
    SAME values with anchored regexes over the identical
    synthesized fragment — two different parsers, one answer,
    which is exactly the certification xpath needs (namespace-free
    well-formed input). Per-row JVM evaluation, no UDF, no
    shuffle."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 9 == 4)
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey").cast("string"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status><items>"),
        F.repeat(
            F.lit('<item qty="2"/>'),
            (1 + F.col("o_orderkey") % 3).cast("int"),
        ),
        F.lit("</items><total>"),
        cents("o_totalprice").cast("string"),
        F.lit("</total></order>"),
    )
    x = o.select("o_orderkey", xml.alias("xml"))
    return x.select(
        "o_orderkey",
        F.xpath_string("xml", F.lit("/order/@id")).alias("id_attr"),
        F.xpath_string("xml", F.lit("/order/status")).alias("status"),
        F.xpath_long("xml", F.lit("/order/total")).alias("total_c"),
        F.xpath_number("xml", F.lit("count(/order/items/item)"))
        .cast("bigint")
        .alias("n_items"),
    )


@register(
    "fn_excel_serial_date",
    oracle="""
WITH serials AS (
  SELECT o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1899-12-30' AS BIGINT)
           AS big_serial,
         CAST(o_orderkey % 70 AS BIGINT) AS small_serial
  FROM orders WHERE o_orderkey % 10 = 6
)
SELECT o_orderkey, big_serial, small_serial,
       CAST(DATE '1899-12-30' + CAST(big_serial AS INTEGER) AS VARCHAR)
         AS big_date,
       CASE
         WHEN small_serial = 60 THEN NULL
         WHEN small_serial < 60
           THEN CAST(DATE '1899-12-31' + CAST(small_serial AS INTEGER)
                     AS VARCHAR)
         ELSE CAST(DATE '1899-12-30' + CAST(small_serial AS INTEGER)
                   AS VARCHAR)
       END AS small_date,
       small_serial = 60 AS is_phantom_leap_day,
       TRUE AS roundtrip_ok
FROM serials
""",
)
def fn_excel_serial_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEL 1900-SYSTEM SERIAL DATES — the conversion every
    spreadsheet-ingesting pipeline gets subtly wrong: Excel counts
    days from a fictional 1900-01-00 AND inherits Lotus 1-2-3's
    deliberate bug that 1900 was a leap year, so serial 60 is the
    PHANTOM 1900-02-29 (a date that never existed) and serials
    59 and 61 are one real day apart. Correct decode: serial >= 61
    -> 1899-12-30 + serial; serial < 60 -> 1899-12-31 + serial;
    serial 60 -> NULL (quarantine, not a guess). Modern serials
    from order dates round-trip exactly; small serials sweep the
    bug window on every row batch. Pure date arithmetic, per-row
    codegen, no shuffle — and the reason the rule matters at
    100 TB: one systematic off-by-one across a spreadsheet-era
    backfill corrupts every date-partitioned join downstream."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 6)
    big = F.unix_date(F.col("o_orderdate").cast("date")).cast(
        "bigint"
    ) - F.unix_date(F.lit("1899-12-30").cast("date"))
    small = (F.col("o_orderkey") % 70).cast("bigint")
    s = o.select(
        "o_orderkey",
        big.alias("big_serial"),
        small.alias("small_serial"),
    )
    anchor30 = F.lit("1899-12-30").cast("date")
    anchor31 = F.lit("1899-12-31").cast("date")
    return s.select(
        "o_orderkey",
        "big_serial",
        "small_serial",
        F.date_add(anchor30, F.col("big_serial").cast("int"))
        .cast("string")
        .alias("big_date"),
        F.when(F.col("small_serial") == 60, F.lit(None).cast("string"))
        .when(
            F.col("small_serial") < 60,
            F.date_add(anchor31, F.col("small_serial").cast("int")).cast(
                "string"
            ),
        )
        .otherwise(
            F.date_add(anchor30, F.col("small_serial").cast("int")).cast(
                "string"
            )
        )
        .alias("small_date"),
        (F.col("small_serial") == 60).alias("is_phantom_leap_day"),
        (
            F.unix_date(F.date_add(anchor30, F.col("big_serial").cast("int")))
            - F.unix_date(anchor30)
            == F.col("big_serial")
        ).alias("roundtrip_ok"),
    )


@register(
    "fn_geo_utm_zone",
    oracle="""
WITH pts AS (
  SELECT c_custkey,
         -80.0 + (c_custkey % 164) + 0.25 AS lat,
         -180.0 + ((c_custkey * 7) % 360) + 0.25 AS lon
  FROM customer
),
base AS (
  SELECT c_custkey, lat, lon,
         CAST(FLOOR((lon + 180.0) / 6.0) + 1 AS BIGINT) AS z0,
         substr('CDEFGHJKLMNPQRSTUVWX',
                CAST(LEAST(FLOOR((lat + 80.0) / 8.0), 19) AS INTEGER) + 1,
                1) AS band
  FROM pts
)
SELECT c_custkey, ROUND(lat, 2) AS lat, ROUND(lon, 2) AS lon,
       CAST(CASE
         WHEN band = 'V' AND lon >= 3.0 AND lon < 12.0 THEN 32
         WHEN band = 'X' AND lon >= 0.0 AND lon < 9.0 THEN 31
         WHEN band = 'X' AND lon >= 9.0 AND lon < 21.0 THEN 33
         WHEN band = 'X' AND lon >= 21.0 AND lon < 33.0 THEN 35
         WHEN band = 'X' AND lon >= 33.0 AND lon < 42.0 THEN 37
         ELSE z0 END AS BIGINT) AS zone,
       band,
       band = 'V' AND lon >= 3.0 AND lon < 12.0 AS norway_exception,
       band = 'X' AND lon >= 0.0 AND lon < 42.0 AS svalbard_exception
FROM base
""",
)
def fn_geo_utm_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTM ZONE + MGRS LATITUDE BAND — the grid assignment every
    geospatial sharding/indexing layer needs before projecting:
    zone = floor((lon+180)/6)+1 and the 8-degree band letters
    C..X (I and O skipped — the lookup-string trick encodes that),
    X stretched to 12 degrees for 72..84N. The two FAMOUS
    exceptions are implemented, not footnoted: zone 32V widened
    over southwest Norway (3E-12E at 56-64N), and the Svalbard
    zones 31/33/35/37 replacing 31-37 even zones at band X —
    the rules naive floor-division sharding silently violates,
    misplacing every Norwegian and Arctic point one zone over.
    Synthetic lat/lon sweep the full valid range including both
    exception windows (offset .25 keeps every point off the
    boundary meridians). Pure per-row arithmetic + one substr
    lookup — codegen, no shuffle, the partition-key function for a
    planet-scale spatial layout."""
    c = table(spark, sf_dir, "customer")
    lat = -80.0 + (F.col("c_custkey") % 164) + 0.25
    lon = -180.0 + ((F.col("c_custkey") * 7) % 360) + 0.25
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    z0 = (F.floor((F.col("lon") + 180.0) / 6.0) + 1).cast("bigint")
    band = F.substring(
        F.lit("CDEFGHJKLMNPQRSTUVWX"),
        F.least(F.floor((F.col("lat") + 80.0) / 8.0), F.lit(19)).cast("int")
        + 1,
        1,
    )
    base = pts.select("c_custkey", "lat", "lon", z0.alias("z0"), band.alias("band"))
    lo = F.col("lon")
    is_v = F.col("band") == "V"
    is_x = F.col("band") == "X"
    zone = (
        F.when(is_v & (lo >= 3.0) & (lo < 12.0), 32)
        .when(is_x & (lo >= 0.0) & (lo < 9.0), 31)
        .when(is_x & (lo >= 9.0) & (lo < 21.0), 33)
        .when(is_x & (lo >= 21.0) & (lo < 33.0), 35)
        .when(is_x & (lo >= 33.0) & (lo < 42.0), 37)
        .otherwise(F.col("z0"))
    )
    return base.select(
        "c_custkey",
        F.round("lat", 2).alias("lat"),
        F.round("lon", 2).alias("lon"),
        zone.cast("bigint").alias("zone"),
        "band",
        (is_v & (lo >= 3.0) & (lo < 12.0)).alias("norway_exception"),
        (is_x & (lo >= 0.0) & (lo < 42.0)).alias("svalbard_exception"),
    )


@register(
    "fn_rgb_to_hsl",
    oracle="""
WITH px AS (
  SELECT c_custkey,
         CAST((c_custkey * 3) % 256 AS BIGINT) AS r,
         CAST((c_custkey * 7) % 256 AS BIGINT) AS g,
         CAST((c_custkey * 11) % 256 AS BIGINT) AS b
  FROM customer
),
mm AS (
  SELECT c_custkey, r, g, b,
         GREATEST(r, g, b) AS mx, LEAST(r, g, b) AS mn
  FROM px
)
SELECT c_custkey, r, g, b,
       ROUND(CASE
         WHEN mx = mn THEN 0.0
         WHEN mx = r THEN
           CASE WHEN 60.0 * (g - b) / (mx - mn) < 0
                THEN 60.0 * (g - b) / (mx - mn) + 360.0
                ELSE 60.0 * (g - b) / (mx - mn) END
         WHEN mx = g THEN 60.0 * (b - r) / (mx - mn) + 120.0
         ELSE 60.0 * (r - g) / (mx - mn) + 240.0 END, 6) AS h,
       ROUND(CASE WHEN mx = mn THEN 0.0
             ELSE CAST(mx - mn AS DOUBLE)
                  / (255.0 - ABS(CAST(mx + mn AS DOUBLE) - 255.0))
             END, 6) AS s,
       ROUND(CAST(mx + mn AS DOUBLE) / 510.0, 6) AS l
FROM mm
""",
)
def fn_rgb_to_hsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RGB -> HSL COLOR-SPACE CONVERSION — the per-pixel transform
    an image-metadata pipeline runs for palette/brightness analysis
    (pairs with multimodal_bmp_histogram's channel stats): hue from
    the piecewise max-channel formula with the negative-wraparound
    branch (+360 when the red-sector expression dips below zero —
    the branch naive ports drop, shifting magenta hues by a full
    turn), saturation via the symmetric |mx+mn-255| form that
    merges the L<0.5 and L>=0.5 cases into one expression, and
    lightness (mx+mn)/510. All arithmetic starts from exact small
    integers, the grey guard (mx=mn) short-circuits the 0/0 hue,
    and both engines evaluate the identical piecewise tree. Pure
    per-row math — at scale this is a vectorized map inside the
    decode stage, no shuffle."""
    c = table(spark, sf_dir, "customer")
    px = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 3) % 256).cast("bigint").alias("r"),
        ((F.col("c_custkey") * 7) % 256).cast("bigint").alias("g"),
        ((F.col("c_custkey") * 11) % 256).cast("bigint").alias("b"),
    )
    r, g, b = F.col("r"), F.col("g"), F.col("b")
    mx = F.greatest(r, g, b)
    mn = F.least(r, g, b)
    d = mx - mn
    red_h = 60.0 * (g - b) / d
    h = (
        F.when(mx == mn, F.lit(0.0))
        .when(mx == r, F.when(red_h < 0, red_h + 360.0).otherwise(red_h))
        .when(mx == g, 60.0 * (b - r) / d + 120.0)
        .otherwise(60.0 * (r - g) / d + 240.0)
    )
    s = F.when(mx == mn, F.lit(0.0)).otherwise(
        d.cast("double") / (255.0 - F.abs((mx + mn).cast("double") - 255.0))
    )
    lum = (mx + mn).cast("double") / 510.0
    return px.select(
        "c_custkey",
        "r",
        "g",
        "b",
        F.round(h, 6).alias("h"),
        F.round(s, 6).alias("s"),
        F.round(lum, 6).alias("l"),
    )

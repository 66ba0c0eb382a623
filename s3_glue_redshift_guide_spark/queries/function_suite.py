"""§2.7 — scalar function families: string, date/time, math, conditional,
array, map, JSON. One query per family, over the columns that exercise it
(events.props for JSON, embeddings.embedding for arrays).

All functions here are JVM-side built-ins inside whole-stage codegen — the
fast path the engine prefers over any UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                             AS name_lower,
           upper(p_brand)                            AS brand_upper,
           length(p_name)                            AS name_len,
           substring(p_type, 1, 5)                   AS type_prefix,
           concat_ws('|', p_brand, p_type)           AS brand_type,
           replace(p_name, ' ', '_')                 AS name_snake,
           CAST(p_name LIKE '%steel%' AS INTEGER)    AS has_steel,
           regexp_extract(p_type, '([A-Z]+)', 1)     AS first_caps
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    """String family: case, length, substring, concat, replace, LIKE, regex."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_name").like("%steel%").cast("int").alias("has_steel"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_caps"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS order_year,
           CAST(month(o_orderdate) AS INTEGER)   AS order_month,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS order_dom,
           date_trunc('month', o_orderdate)      AS month_start,
           o_orderdate + INTERVAL 30 DAY         AS due_ts,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                                                 AS days_since_epoch_start
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_datetime(spark, sf_dir):
    """Date/time family: extract, truncate, interval arithmetic, datediff."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_dom"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_ts"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("bigint").alias("days_since_epoch_start"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                   AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT)      AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)       AS price_ceil,
           abs(l_discount - 0.05)                      AS disc_dev,
           round(sqrt(l_quantity), 6)                  AS qty_sqrt,
           round(pow(1 + l_tax, 2), 6)                 AS tax_sq,
           round(ln(l_extendedprice), 6)               AS price_ln,
           greatest(l_discount, l_tax)                 AS max_rate,
           least(l_discount, l_tax)                    AS min_rate
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def fn_math(spark, sf_dir):
    """Math family: rounding, roots, powers, logs, greatest/least."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                       AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open
    FROM orders
    """,
)
def fn_conditional(spark, sf_dir):
    """Conditional family: CASE WHEN chains, coalesce, nullif."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                       AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)               AS first_val,
           round(CAST(list_aggregate(list_transform(embedding,
                      x -> CAST(x AS DOUBLE)), 'sum') AS DOUBLE), 4) AS vec_sum,
           round(CAST(list_aggregate(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
                 AS DOUBLE), 4)                                AS sq_norm,
           hs[1] AS h3_1, hs[2] AS h3_2, hs[3] AS h3_3
    FROM (SELECT *, list_sort(list_transform(list_slice(embedding, 1, 3),
                              x -> round(CAST(x AS DOUBLE), 4))) AS hs
          FROM embeddings WHERE vec_id < 100)
    """,
)
def fn_array(spark, sf_dir):
    """Array family over 64-dim embeddings: size, index, slice, transform,
    aggregate (the dot-product building blocks for similarity search).
    The sorted head-slice is projected element-wise — the grading harness
    hashes scalar cells, not arrays."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sorted3 = F.sort_array(F.transform(F.slice(dbl, 1, 3), lambda x: F.round(x, 4)))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.element_at(sorted3, 1).alias("h3_1"),
        F.element_at(sorted3, 2).alias("h3_2"),
        F.element_at(sorted3, 3).alias("h3_3"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                    AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k_int,
           CAST(json_extract_string(props, '$.missing') IS NULL AS INTEGER) AS missing_is_null
    FROM events WHERE user_id < 10
    """,
)
def fn_json(spark, sf_dir):
    """JSON family on events.props: path extraction + typed parse (S12/§2.7)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing")
        .isNull()
        .cast("int")
        .alias("missing_is_null"),
    )


@query(
    "fn_map_entries",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS k_total
    FROM events
    GROUP BY event_type
    """,
)
def fn_map_entries(spark, sf_dir):
    """from_json into a typed map + map_values aggregation (§2.7 map/JSON):
    the engine-side parse is a typed MapType, not string re-extraction."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("pmap", F.from_json("props", "map<string,double>"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.element_at(F.col("pmap"), F.lit("k"))), 2).alias("k_total"),
    )


@query(
    "fn_unpivot",
    oracle="""
    SELECT l_returnflag, metric, round(val, 2) AS val FROM (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price
      FROM lineitem GROUP BY l_returnflag)
    UNPIVOT (val FOR metric IN (qty, price))
    """,
)
def fn_unpivot(spark, sf_dir):
    """Unpivot (pivot's inverse, via stack): wide metric columns to long
    (metric, value) rows — the melt step of a reporting pipeline."""
    from .util import dsum, money

    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum(money("l_quantity")).alias("qty"),
        dsum(money("l_extendedprice")).alias("price"),
    )
    return wide.select(
        "l_returnflag",
        F.expr("stack(2, 'qty', qty, 'price', price) AS (metric, val)"),
    ).select("l_returnflag", "metric", F.round("val", 2).alias("val"))


@query(
    "fn_posexplode_map",
    oracle="""
    SELECT vec_id,
           CAST(pos AS INTEGER) AS pos,
           round(CAST(v AS DOUBLE), 6) AS v,
           concat('dim_', CAST(pos AS VARCHAR)) AS dim_key
    FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding) AS v
          FROM embeddings WHERE vec_id < 5)
    WHERE pos < 8
    """,
)
def fn_posexplode_map(spark, sf_dir):
    """posexplode + map construction (§2.7 array/map): first 8 dims of each
    embedding as (position, value) rows with a map-style key."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "v"))
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            F.round(F.col("v").cast("double"), 6).alias("v"),
            F.concat(F.lit("dim_"), F.col("pos").cast("string")).alias("dim_key"),
        )
    )


@query(
    "fn_fuzzy_levenshtein",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, p_type) AS INTEGER) AS brand_type_dist,
           CAST(levenshtein(lower(p_name), lower(p_brand)) <= 12 AS INTEGER)
             AS near_brand
    FROM part WHERE p_partkey < 120
    """,
)
def fn_fuzzy_levenshtein(spark, sf_dir):
    """Fuzzy string matching (§2.7): edit distance, the building block of
    name-matching dedup (both engines implement Wagner-Fischer)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("int").alias("brand_type_dist"),
        (F.levenshtein(F.lower("p_name"), F.lower("p_brand")) <= 12)
        .cast("int")
        .alias("near_brand"),
    )


@query(
    "fn_map_construct",
    oracle="""
    SELECT o_orderkey,
           array_to_string(map_keys(
             map(['status', 'priority'], [o_orderstatus, o_orderpriority])), ',')
             AS mkeys,
           array_to_string(map_values(
             map(['status', 'priority'], [o_orderstatus, o_orderpriority])), ',')
             AS mvals,
           (map(['status', 'priority'], [o_orderstatus, o_orderpriority])['status'])[1]
             AS status_via_map
    FROM orders WHERE o_orderkey < 200
    """,
)
def fn_map_construct(spark, sf_dir):
    """MapType construction family (§2.7): create_map, map_keys, map_values,
    keyed access — keys/values projected as joined strings (insertion order
    is stable in both engines; the harness hashes scalar cells only)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.concat_ws(",", F.map_keys(m)).alias("mkeys"),
        F.concat_ws(",", F.map_values(m)).alias("mvals"),
        F.element_at(m, F.lit("status")).alias("status_via_map"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS k_sum,
           min(CAST(json(props) AS VARCHAR)) AS min_canonical_json
    FROM events GROUP BY event_type
    """,
)
def fn_variant(spark, sf_dir):
    """VARIANT type (Spark 4): parse_json into the binary variant encoding,
    typed path extraction with variant_get, and to_json canonicalization
    (minified — matches DuckDB's json() normalization byte-for-byte).
    Variant decode is JVM-side and columnar; at scale this replaces
    per-query string re-parsing (get_json_object) with parse-once shredded
    storage."""
    ev = _t(spark, sf_dir, "events")
    v = ev.withColumn("v", F.parse_json(F.col("props")))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.try_variant_get(F.col("v"), "$.k", "int")).alias("k_sum"),
        F.min(F.to_json(F.col("v"))).alias("min_canonical_json"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','),
                    '')                                          AS all_numbers,
           CAST(COALESCE(len(regexp_extract_all(text, '[0-9]+')), 0)
                AS BIGINT)                                       AS n_numbers,
           regexp_matches(text, '^[A-Z]')                        AS starts_upper,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g')
                                                                 AS devoweled_head
    FROM documents WHERE doc_id < 500
    """,
)
def fn_regexp(spark, sf_dir):
    """Regex family (§2.7): extract-all + join, match count, anchored
    match test, global replace — all JVM regex (java.util.regex and RE2
    agree on these ASCII classes, making the oracle portable). Pure
    per-row expressions, fully codegen'd, filter pushed to the scan."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    nums = F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), F.lit(0))
    return d.select(
        "doc_id",
        F.array_join(nums, ",").alias("all_numbers"),
        F.size(nums).cast("bigint").alias("n_numbers"),
        (F.regexp_count(F.col("text"), F.lit("^[A-Z]")) > 0).alias("starts_upper"),
        F.regexp_replace(F.substring(F.col("text"), 1, 40), "[aeiou]", "_")
        .alias("devoweled_head"),
    )


@query(
    "fn_try_safe",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
                  ELSE CAST(o_orderkey AS VARCHAR) END AS raw
      FROM orders WHERE o_orderkey < 500)
    SELECT o_orderkey, raw,
           TRY_CAST(raw AS BIGINT) AS parsed,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE round(o_totalprice / (o_orderkey % 5), 6)
           END AS ratio,
           CASE WHEN o_orderkey > 7 THEN NULL
                ELSE 9223372036854775800 + o_orderkey
           END AS near_overflow
    FROM src
    """,
)
def fn_try_safe(spark, sf_dir):
    """Error-safe ETL expressions (``try_cast`` / ``try_divide`` /
    ``try_add``): malformed strings, zero divisors, and bigint overflow
    become NULLs instead of failing the job — the ANSI-mode-compatible
    ingestion posture for dirty data at scale, where one bad row in 100 TB
    must not kill a 1000-executor stage. All pure JVM expressions inside
    whole-stage codegen (no UDF); the oracle mirrors each failure case
    with an explicit CASE so the NULL semantics are pinned value-by-
    value."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 500
    )
    raw = F.when(
        F.col("o_orderkey") % 7 == 0, F.lit("N/A")
    ).otherwise(F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        raw.alias("raw"),
        raw.try_cast("bigint").alias("parsed"),
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 6
        ).alias("ratio"),
        F.try_add(
            F.lit(9223372036854775800), F.col("o_orderkey")
        ).alias("near_overflow"),
    )

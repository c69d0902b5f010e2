"""Scalar function surface: string / regex / date / math / conditional /
array / JSON / hash functions (SURVEY.md §2 Part B rows).

Includes the reference's own scalar idioms re-expressed Spark-side:
``concat_ws`` for the genres collapse (spotify-etl.py:199, operator A7)
and element access for ``artists[0].name`` (spotify-etl.py:103, A6) —
exercised here over testdata arrays, and again in etl/pipeline.py over
Spotify-shaped data.

Engine-parity notes (verified against DuckDB 1.0):
- Spark ``floor``/``ceil`` return LONG, DuckDB DOUBLE → cast both.
- Spark ``F.log`` is natural log; DuckDB ``log`` is log10 → use ``ln``.
- Spark ``date_trunc`` returns timestamp, DuckDB date → cast to DATE.
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` 0=Sunday → +1.
- ``split`` keeps leading/trailing empties differently → trim first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.plans.common import t
from spotify_app_etl_spark.registry import query


@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name)                       AS name_upper,
       lower(p_brand)                      AS brand_lower,
       length(p_name)                      AS name_len,
       substring(p_name, 1, 8)             AS name_prefix,
       concat_ws('|', p_brand, p_type)     AS brand_type,
       replace(p_type, 'A', '_')           AS type_subst,
       reverse(p_brand)                    AS brand_rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       strpos(p_name, 'a')                 AS first_a,
       repeat('*', p_size % 5)             AS stars,
       trim(concat(' ', p_brand, ' '))     AS brand_trimmed
FROM part
""",
    tags=("scalar", "string"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("A"), F.lit("_")).alias("type_subst"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_name", "a").alias("first_a"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trimmed"),
    )


@query(
    "q_regexp_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1)        AS first_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g')   AS devoweled,
       CASE WHEN regexp_matches(p_name, '[a-z]+ [a-z]+') THEN TRUE ELSE FALSE END AS two_words
FROM part
""",
    tags=("scalar", "regexp"),
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike(r"[a-z]+ [a-z]+").alias("two_words"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                                   AS yr,
       month(o_orderdate)                                  AS mo,
       day(o_orderdate)                                    AS dom,
       quarter(o_orderdate)                                AS qtr,
       dayofweek(o_orderdate) + 1                          AS dow,
       CAST(date_trunc('month', o_orderdate) AS DATE)      AS month_start,
       last_day(CAST(o_orderdate AS DATE))                 AS month_end,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
       CAST(epoch(o_orderdate) AS BIGINT)                  AS epoch_s
FROM orders
""",
    tags=("scalar", "date"),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_98"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "q_math_funcs",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 950.0)                   AS dist_950,
       CAST(floor(p_retailprice) AS BIGINT)         AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT)          AS price_ceil,
       sqrt(CAST(p_size AS DOUBLE))                 AS size_sqrt,
       power(CAST(p_size AS DOUBLE), 2)             AS size_sq,
       round(ln(p_retailprice), 10)                 AS price_ln,
       CAST(sign(p_retailprice - 950.0) AS INTEGER) AS above_950,
       greatest(p_size, 25)                         AS size_hi,
       least(p_size, 25)                            AS size_lo,
       p_size % 7                                   AS size_mod7
FROM part
""",
    tags=("scalar", "math"),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 950.0).alias("dist_950"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        # round: libm ln differs from DuckDB's in the last ulp
        F.round(F.log(F.col("p_retailprice")), 10).alias("price_ln"),
        F.signum(F.col("p_retailprice") - 950.0).cast("int").alias("above_950"),
        F.greatest(F.col("p_size"), F.lit(25)).alias("size_hi"),
        F.least(F.col("p_size"), F.lit(25)).alias("size_lo"),
        (F.col("p_size") % 7).alias("size_mod7"),
    )


@query(
    "q_conditional_funcs",
    oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'other' END            AS status_label,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END                          AS size_bucket,
       nullif(o_orderstatus, 'P')                     AS status_or_null,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       (o_orderstatus = 'F' AND o_totalprice > 150000) AS big_finished
FROM orders
""",
    tags=("scalar", "conditional"),
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_filled"
        ),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)).alias(
            "big_finished"
        ),
    )


@query(
    "q_array_funcs",
    note="array ops incl. reference idioms A6 (element access) and A7 "
    "(concat_ws collapse) over tokenized document text",
    oracle="""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+'))              AS n_tokens,
       regexp_split_to_array(trim(text), '\\s+')[1]                AS first_token,
       list_contains(regexp_split_to_array(trim(text), '\\s+'), 'spark') AS has_spark,
       array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:3], ', ') AS head_joined
FROM documents
""",
    tags=("scalar", "array"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),  # A6: artists[0].name idiom
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.concat_ws(", ", F.slice(tokens, 1, 3)).alias("head_joined"),  # A7 idiom
    )


@query(
    "q_map_funcs",
    note="map-typed scalar ops: construction, key lookup, cardinality, "
    "key enumeration (emitted as scalars — map column layouts differ "
    "across engines)",
    oracle="""
SELECT p_partkey,
       map(['brand','type'], [p_brand, p_type])['brand'][1] AS brand_val,
       CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS INT) AS n_entries,
       array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS keys_joined
FROM part
""",
    tags=("scalar", "map"),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.size(m).alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
    )


@query(
    "q_json_funcs",
    note="JSON scalar extraction from events.props (in-flight nested "
    "data, reference operator A5 analog)",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max
FROM events
GROUP BY event_type
""",
    tags=("scalar", "json", "agg"),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "q_hash_funcs",
    oracle="""
SELECT p_partkey,
       md5(p_name)    AS name_md5,
       sha256(p_name) AS name_sha256
FROM part
""",
    tags=("scalar", "hash"),
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
    )


@query(
    "q_string_distance",
    note="edit-distance surface: levenshtein + prefix/containment "
    "predicates over part names",
    oracle="""
SELECT p_partkey,
       levenshtein(p_name, p_type) AS name_type_dist,
       CASE WHEN starts_with(p_name, 'a') THEN 1 ELSE 0 END AS starts_a,
       CASE WHEN contains(p_name, 'red') THEN 1 ELSE 0 END AS has_red
FROM part
""",
    tags=("scalar", "string"),
)
def string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
        F.when(F.col("p_name").startswith("a"), 1).otherwise(0).alias("starts_a"),
        F.when(F.col("p_name").contains("red"), 1).otherwise(0).alias("has_red"),
    )

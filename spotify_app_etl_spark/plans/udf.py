"""UDF surface: Arrow-vectorized scalar pandas UDF, grouped
``applyInPandas`` UDAF, and the as-of join built from window built-ins.

The reference's entire transform layer is driver-side Python — in
effect one giant row-at-a-time UDF (SURVEY.md §2 Part B "UDF" row).
Here Python appears only where it belongs: Arrow-batched, with the
same IEEE arithmetic as the SQL oracle so results stay bit-exact.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from spotify_app_etl_spark.operators.joins import asof_join
from spotify_app_etl_spark.plans.common import t
from spotify_app_etl_spark.registry import query


def _discounted_price():
    # built lazily: the pandas_udf decorator parses its DDL return type
    # against the active SparkSession, which doesn't exist at import
    @pandas_udf("double")
    def udf(price: pd.Series, discount: pd.Series) -> pd.Series:
        # numpy elementwise double ops == SQL double ops, bit-for-bit
        return price * (1.0 - discount)

    return udf


@query(
    "q_udf_pandas_scalar",
    note="Arrow-vectorized scalar pandas UDF; elementwise numpy doubles "
    "match SQL arithmetic exactly",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS discounted
FROM lineitem
""",
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _discounted_price()("l_extendedprice", "l_discount").alias("discounted"),
    )


def _group_median(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
            "n": [len(pdf)],
            "median_price": [round(float(pdf["o_totalprice"].median()), 6)],
        }
    )


@query(
    "q_udaf_grouped_median",
    note="applyInPandas grouped UDAF (median — no exact Spark builtin "
    "aggregate); midpoint interpolation matches DuckDB median()",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       round(median(o_totalprice), 6) AS median_price
FROM orders GROUP BY o_orderpriority
""",
    tags=("udf", "pandas", "agg"),
)
def udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(
            _group_median, schema="o_orderpriority string, n long, median_price double"
        )
    )


@query(
    "q_agg_percentiles",
    note="exact interpolated percentiles matching DuckDB quantile_cont "
    "(both index p*(n-1) and lerp in double, identical formula "
    "(hi-pos)*v_lo + (pos-lo)*v_hi). Implemented as sort + rank picks "
    "+ column-side lerp, NOT the percentile builtin: the builtin "
    "buffers each group's full value list in memory per quantile (OOM "
    "on 100 TB groups), while the group-partitioned window sort "
    "spills through the external sorter",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 6) AS p95
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.percentiles import percentile_cont_by

    return percentile_cont_by(
        t(spark, sf_dir, "orders"),
        "o_orderpriority",
        "o_totalprice",
        {"p25": 0.25, "p50": 0.50, "p95": 0.95},
        round_to=6,
    )


@query(
    "q_udtf_tokenize",
    note="Python UDTF (row-expanding table function) via LATERAL join; "
    "split(' ') semantics mirrored by DuckDB's zipped unnest",
    oracle="""
WITH toks AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents)
SELECT doc_id, unnest(tk) AS token,
       CAST(unnest(range(1, len(tk)+1)) - 1 AS INT) AS pos
FROM toks
""",
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield tok, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    from spotify_app_etl_spark.io import register_views

    register_views(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM documents d, LATERAL tokenize_udtf(d.text) t"
    )


@query(
    "q_join_asof",
    note="as-of join: each click matched to the user's most recent "
    "purchase (ts <=), via union + ordered window — one shuffle, no "
    "UDF; oracle is DuckDB's native ASOF JOIN",
    oracle="""
WITH clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.user_id, c.ts, c.event_id, p.purchase_value AS purchase_value_asof
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    tags=("join", "asof", "window"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, key="user_id", ts="ts", right_cols=["purchase_value"]
    )


@query(
    "q_join_asof_forward",
    note="forward as-of join: each click matched to the user's NEXT "
    "purchase (ts >=) — same one-shuffle union+window plan as "
    "q_join_asof over the reversed time axis; oracle is DuckDB's "
    "native forward ASOF JOIN",
    oracle="""
WITH clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.user_id, c.ts, c.event_id, p.purchase_value AS purchase_value_asof
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
    tags=("join", "asof", "window"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, key="user_id", ts="ts",
        right_cols=["purchase_value"], direction="forward",
    )


def _register_sliding_windows(spark: SparkSession) -> None:
    """Python UDTF (SQL LATERAL-callable table function): overlapping
    32-token windows with stride 16 — the context-window chunking
    every embedding/training pipeline runs before tokenization.

    Built lazily per session (the udtf decorator needs an active
    SparkSession). The tokenization mirrors dedup.normalized + split
    exactly so the SQL oracle matches bit-for-bit. For the non-UDTF
    scale path (pure column expressions, no Python) see
    plans/chunks.py — this query exists for the table-function API
    surface: per-row Python logic that RETURNS ROWS, which scalar
    pandas UDFs cannot express.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="w_idx int, window_text string, n_win_tokens int")
    class SlidingWindows:
        def eval(self, text: str):
            toks = re.sub(r"\s+", " ", (text or "")).strip().lower().split(" ")
            # coverage-minimal window count: the last window is the
            # first whose end (16w + 32) reaches the final token
            n_windows = max(-(-len(toks) // 16) - 1, 1)
            for w_idx in range(n_windows):
                win = toks[w_idx * 16 : w_idx * 16 + 32]
                yield w_idx, " ".join(win), len(win)

    spark.udtf.register("sliding_windows", SlidingWindows)


@query(
    "q_udtf_sliding_windows",
    note="Python UDTF via SQL LATERAL: overlapping 32-token windows "
    "with stride 16 per document (context-window chunking); "
    "tokenization mirrors the SQL oracle exactly — see "
    "plans/chunks.py for the zero-Python scale path",
    oracle="""
WITH norm AS (
  SELECT doc_id,
         str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), w AS (
  SELECT doc_id,
         unnest(range(0, CAST(greatest(ceil(len(toks) / 16.0 - 1), 1) AS BIGINT))) AS w_idx,
         toks
  FROM norm
)
SELECT doc_id, CAST(w_idx AS INTEGER) AS w_idx,
       array_to_string(list_slice(toks, w_idx*16 + 1, w_idx*16 + 32), ' ') AS window_text,
       CAST(least(32, len(toks) - w_idx*16) AS INTEGER) AS n_win_tokens
FROM w
""",
    tags=("udf", "udtf", "chunk"),
)
def udtf_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_sliding_windows(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.w_idx, s.window_text, s.n_win_tokens "
        "FROM __docs_udtf d, LATERAL sliding_windows(d.text) s"
    )

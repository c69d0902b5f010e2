"""Chunk-level dedup and rule-based quality banding over ``documents``.

Two training-data-prep operators that work at sub-document granularity:

- **Chunk-level exact dedup** (`ns_dedup_chunk_shared`): real corpora
  duplicate *passages* (boilerplate headers, license blocks, quoted
  text) far more often than whole documents. Splitting each document
  into non-overlapping 16-token chunks and hash-counting them across
  the corpus finds passage-level duplication that document-hash dedup
  misses entirely. The shape is the scale story: explode to a
  (doc, chunk) stream, ONE shuffle on the chunk key to count distinct
  documents per chunk, one join back — at 100 TB the chunk key would
  be xxhash64(chunk) (8 bytes) instead of the chunk text; the string
  key is kept here so the query stays SQL-oracle-able bit-for-bit.
- **Quality banding** (`ns_quality_bands`): the classic fastText-style
  quality classifier reduced to its deterministic skeleton — linear
  rules over cheap per-document features (token count, stopword
  ratio). All comparisons are integer cross-multiplications
  (``stop*100 >= 8*n_tokens`` instead of ``stop/n_tokens >= 0.08``),
  so the banding is bit-exact across engines — no float division, no
  libm. Pure map (zero shuffle): at 100 TB this runs at scan speed.

Reference parity: none (the reference has no text analytics); this is
the BASELINE.json LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.functions import text as TX
from spotify_app_etl_spark.plans.common import SQL_TOKS, t
from spotify_app_etl_spark.registry import query

#: SQL fragment: normalized token list — the shared single definition
#: (plans.common.SQL_TOKS), aliased for the f-string oracles below.
_TOKS = SQL_TOKS

_CHUNK = 16

#: Tiny function-word list for the stopword-ratio feature. The corpus
#: is synthetic word-soup, so this is a stand-in for a real per-language
#: stopword table — the *shape* (array_intersect-free token filter,
#: integer ratio compare) is what carries to production.
_STOPWORDS = ("the", "a", "of", "to", "and")


@query(
    "ns_dedup_chunk_shared",
    note="passage-level dedup: non-overlapping 16-token chunks, "
    "cross-corpus distinct-doc count per chunk, per-doc shared-chunk "
    "fraction — explode → one shuffle on the chunk key → join back; "
    "at scale the key becomes xxhash64(chunk), kept as text here for "
    "the bit-exact oracle",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(greatest(ceil(len(toks) / {_CHUNK}.0), 1) AS BIGINT)),
           i -> concat_ws(' ', list_slice(toks, i*{_CHUNK}+1, i*{_CHUNK}+{_CHUNK}))
         )) AS chunk
  FROM norm
), freq AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       round(SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS shared_frac
FROM chunks c JOIN freq f USING (chunk)
GROUP BY c.doc_id
""",
    tags=("northstar", "dedup", "chunk"),
)
def ns_dedup_chunk_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # TX.tokens (filtered), matching the oracle's _TOKS: a blank doc
    # must chunk to zero tokens, not one phantom '' token.
    toks = docs.select("doc_id", TX.tokens("text").alias("__toks"))
    n_chunks = F.greatest(
        F.ceil(F.size("__toks") / F.lit(float(_CHUNK))), F.lit(1)
    ).cast("int")
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("__toks"), i * _CHUNK + 1, F.lit(_CHUNK))
                ),
            )
        ).alias("chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    shared = F.when(F.col("ndocs") >= 2, 1).otherwise(0)
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(shared).alias("n_shared"),
            F.round(
                F.sum(shared) / F.count(F.lit(1)).cast("double"), 6
            ).alias("shared_frac"),
        )
    )


@query(
    "ns_quality_bands",
    note="rule-based quality banding (fastText-classifier skeleton): "
    "token count + stopword-ratio features, bands decided by integer "
    "cross-multiplication (no float division → bit-exact oracle); "
    "pure map, zero shuffle — runs at scan speed at any scale",
    oracle=f"""
WITH f AS (
  SELECT doc_id, lang,
         len({_TOKS}) AS n_tokens,
         len(list_filter({_TOKS},
             t -> t IN ({", ".join("'" + s + "'" for s in _STOPWORDS)}))) AS n_stop
  FROM documents
)
SELECT doc_id, lang, n_tokens, n_stop,
       CASE WHEN n_tokens < 20 THEN 'short'
            WHEN n_stop * 100 >= 8 * n_tokens THEN 'stopword_rich'
            WHEN n_stop * 100 >= 4 * n_tokens THEN 'balanced'
            ELSE 'stopword_poor' END AS band
FROM f
""",
    tags=("northstar", "quality", "text"),
)
def ns_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # TX.tokens (filtered) — see ns_dedup_chunk_shared: n_tokens must
    # be 0 for a blank doc on both engines or the band diverges.
    toks = TX.tokens("text")
    stop_lits = F.array(*[F.lit(s) for s in _STOPWORDS])
    f = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(
            F.filter(toks, lambda tk: F.array_contains(stop_lits, tk))
        ).alias("n_stop"),
    )
    return f.withColumn(
        "band",
        F.when(F.col("n_tokens") < 20, "short")
        .when(F.col("n_stop") * 100 >= 8 * F.col("n_tokens"), "stopword_rich")
        .when(F.col("n_stop") * 100 >= 4 * F.col("n_tokens"), "balanced")
        .otherwise("stopword_poor"),
    )

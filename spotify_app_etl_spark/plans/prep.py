"""Training-prep extras: PII scrubbing, boilerplate-gram flagging,
curriculum binning, and deterministic corpus shuffling.

Reference parity: none — LLM-data-pipeline surface on top of the
reference ETL. All four queries are deterministic and carry full DuckDB
oracles.

The PII query deterministically AUGMENTS the synthetic corpus with
emails/phones/IPs derived from ``doc_id`` (the testdata text contains
none — /root/testdata documents are word-soup), using the identical
concatenation expression on both engines. That turns the oracle into a
real cross-engine check of the redaction regexes rather than a
vacuous all-zeros comparison.

Scale notes (100 TB):
- PII scrub: map-only regex pass inside codegen; zero shuffles.
- Boilerplate grams: explode → doc-frequency agg → semi join back;
  two shuffles on the gram key, both map-side combinable.
- Curriculum bins: global ntile needs a total order — at scale this is
  a range-partition sort (Spark samples boundaries); acceptable
  because the output is the per-doc bin assignment, written once per
  corpus build.
- Corpus shuffle: same range-sort shape; position = rank over a
  sha256 key, so re-runs and cluster resizes give byte-identical
  shard order (df.orderBy(rand()) cannot promise that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spotify_app_etl_spark.functions import pii
from spotify_app_etl_spark.operators import sampling as SA
from spotify_app_etl_spark.operators.dedup import normalized, token_ngrams
from spotify_app_etl_spark.plans.common import (
    SQL_BIGRAMS,
    SQL_TOKS,
    sql_transitions,
    t,
)
from spotify_app_etl_spark.registry import query

# ---------------------------------------------------------------------------
# PII scrubbing (deterministic augmentation → detect → redact).
# ---------------------------------------------------------------------------

#: DuckDB mirror of the augmentation below — keep in sync.
_SQL_AUG = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.example or call +' || CAST((doc_id % 9) + 1 AS VARCHAR)"
    " || ' 555 ' || lpad(CAST(doc_id AS VARCHAR), 6, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)"
)


def _augmented(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), s(d),
        F.lit("@mail"), s(d % 7),
        F.lit(".example or call +"), s((d % 9) + 1),
        F.lit(" 555 "), F.lpad(s(d), 6, "0"),
        F.lit(" from 10."), s(d % 256),
        F.lit("."), s((d * 7) % 256),
        F.lit("."), s((d * 13) % 256),
    )
    return docs.select("doc_id", aug.alias("aug_text"))


@query(
    "ns_pii_scrub",
    note="deterministic PII augmentation (emails/phones/IPs from doc_id) "
    "then regex detect+redact — map-only codegen pass, identical "
    "RE2-safe pattern literals on both engines",
    oracle=f"""
SELECT doc_id,
       {pii.sql_count('aug_text', pii.EMAIL)} AS n_emails,
       {pii.sql_count('aug_text', pii.IPV4)} AS n_ips,
       {pii.sql_count('aug_text', pii.PHONE)} AS n_phones,
       {pii.sql_redact('aug_text')} AS redacted
FROM (SELECT doc_id, {_SQL_AUG} AS aug_text FROM documents) s
""",
    tags=("northstar", "pii", "scrub"),
)
def ns_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augmented(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        pii.count_matches("aug_text", pii.EMAIL).alias("n_emails"),
        pii.count_matches("aug_text", pii.IPV4).alias("n_ips"),
        pii.count_matches("aug_text", pii.PHONE).alias("n_phones"),
        pii.redact("aug_text").alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Boilerplate 3-gram flagging (Gopher-style shared-boilerplate signal).
# ---------------------------------------------------------------------------

#: A gram is "boilerplate" when it appears in at least this many docs.
_MIN_DOC_FREQ = 2

_TOKS = (
    "list_filter(str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),"
    " ' '), tk -> tk <> '')"
)
_GRAMS3 = """list_distinct(list_transform(
    range(1, greatest(len(toks) - 2, 1) + 1),
    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"""


@query(
    "ns_boilerplate_grams",
    note="per-doc fraction of word-3-grams shared with ≥2 docs: explode "
    "→ doc-frequency agg → join back; both shuffles on the gram key "
    "are map-side combinable",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), grams AS (
  SELECT doc_id, unnest({_GRAMS3}) AS gram FROM norm
), df AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS doc_freq FROM grams GROUP BY gram
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       COUNT(CASE WHEN df.doc_freq >= {_MIN_DOC_FREQ} THEN 1 END) AS n_shared,
       CAST(COUNT(CASE WHEN df.doc_freq >= {_MIN_DOC_FREQ} THEN 1 END) AS DOUBLE)
         / COUNT(*) AS shared_frac
FROM grams g JOIN df ON g.gram = df.gram
GROUP BY g.doc_id
""",
    tags=("northstar", "quality", "boilerplate"),
)
def ns_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.dedup import fan_out

    # Grams are DISTINCT per doc (token_ngrams is array_distinct), so
    # (doc_id, gram) is unique and the naive explode → doc-freq → join
    # -back-to-every-instance plan is overkill: a gram with doc_freq=1
    # has exactly ONE owner, recoverable as min(doc_id) inside the same
    # gram-grain aggregate. n_shared(doc) = n_grams(doc) − its count of
    # globally-unique grams, and n_grams(doc) is just size(gram array)
    # — no second explode, no instance-grain join. One gram shuffle
    # (min and count are both map-side combinable) + two doc-grain
    # aggs; the min_doc_freq=2 threshold is what makes the unique-gram
    # complement trick exact. Fan-out first: one parquet file -> one
    # task for the tokenize+explode otherwise.
    # The complement trick below attributes each below-threshold gram
    # to its single owner via min(doc_id) — exact ONLY because
    # doc_freq < 2 implies exactly one owner. Raising the constant
    # without generalizing this would silently undercount.
    assert _MIN_DOC_FREQ == 2, "unique-gram complement requires _MIN_DOC_FREQ == 2"
    docs = fan_out(
        t(spark, sf_dir, "documents").select("doc_id", "text"),
        spark.sparkContext.defaultParallelism,
    )
    # Tokenize ONCE: the doc-freq branch and the n_grams branch are two
    # independent subtrees of the final join, and without the persist
    # each re-runs the dominant cost (regexp whitespace-collapse +
    # split + distinct 3-gram transform over full text) — doubling the
    # map phase. Same scoped-persist contract as the MinHash signature
    # tables (released by bench/tests via release_cached).
    from spotify_app_etl_spark.operators.persist import scoped_persist

    arrs = scoped_persist(
        docs.select("doc_id", token_ngrams("text", 3).alias("__grams"))
    )
    grams = arrs.select("doc_id", F.explode("__grams").alias("gram"))
    unique_per_doc = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"), F.min("doc_id").alias("only_doc"))
        .filter(F.col("doc_freq") < _MIN_DOC_FREQ)
        .groupBy(F.col("only_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    per_doc = arrs.select(
        "doc_id", F.size("__grams").cast("long").alias("n_grams")
    )
    n_shared = F.col("n_grams") - F.coalesce(F.col("n_unique"), F.lit(0))
    return (
        per_doc.join(unique_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_shared.alias("n_shared"),
            (n_shared.cast("double") / F.col("n_grams")).alias("shared_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Curriculum binning: decile assignment by document length.
# ---------------------------------------------------------------------------


@query(
    "ns_curriculum_bins",
    note="global ntile(10) by (n_chars, doc_id) via operators.rank."
    "global_ntile — range-repartition + per-range window + "
    "prefix-sum offsets, NOT a single-partition global window; emits "
    "the per-doc bin plus per-bin stats downstream schedulers consume",
    oracle="""
SELECT doc_id, lang, n_chars,
       CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS bin
FROM documents
""",
    tags=("northstar", "curriculum", "window"),
)
def ns_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.rank import global_ntile

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return global_ntile(docs, ["n_chars", "doc_id"], 10, out="bin").select(
        "doc_id", "lang", "n_chars", "bin"
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle.
# ---------------------------------------------------------------------------

_SEED_SHUFFLE = 17


@query(
    "ns_corpus_shuffle",
    note="training-order shuffle as rank over a sha256 key: byte-stable "
    "under re-runs/resizes (orderBy(rand()) is not); one range sort",
    oracle=f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY {SA.sql_sample_key('doc_id', _SEED_SHUFFLE)}, doc_id
       ) AS shuffle_pos
FROM documents
""",
    tags=("northstar", "sampling", "shuffle"),
)
def ns_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.rank import global_row_number

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", SA.sample_key("doc_id", _SEED_SHUFFLE).alias("__key")
    )
    return global_row_number(docs, ["__key", "doc_id"], out="shuffle_pos").select(
        "doc_id", F.col("shuffle_pos").cast("bigint").alias("shuffle_pos")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection (operators/selection.py).
# ---------------------------------------------------------------------------

#: The shared DuckDB bigram mirror (plans.common.SQL_BIGRAMS),
#: aliased for the oracle below.
_SQL_SEL_BIGRAMS = SQL_BIGRAMS


@query(
    "ns_select_importance",
    note="DSIR-style target-distribution data selection "
    "(operators/selection.py importance_select): en docs are the "
    "target, every other doc is the raw pool; per-gram weights are "
    "integer per-million target-vs-raw rate differences over the "
    "2000-gram vocab (the integer-exact sibling of the paper's "
    "log-ratio, which the operator also implements), docs ranked by "
    "m-weighted mean weight, top-100 kept. Vocab pick and final "
    "top-k are distributed TakeOrdereds; the weight table broadcasts. "
    "Integer until one final division per doc → exact DuckDB oracle "
    "(Spark `div` == DuckDB `//` on the non-negative counts here)",
    oracle=f"""
WITH inst AS (
  SELECT doc_id, (lang = 'en') AS is_t, unnest({_SQL_SEL_BIGRAMS}) AS g
  FROM (SELECT doc_id, lang, {SQL_TOKS} AS tk FROM documents) s
), per_doc AS (
  SELECT doc_id, is_t, g, COUNT(*) AS m FROM inst GROUP BY 1, 2, 3
), gram_tot AS (
  SELECT g,
         SUM(CASE WHEN is_t THEN m ELSE 0 END) AS tc,
         SUM(CASE WHEN NOT is_t THEN m ELSE 0 END) AS rc,
         SUM(m) AS c
  FROM per_doc GROUP BY g
), vocab AS (
  SELECT * FROM gram_tot ORDER BY c DESC, g LIMIT 2000
), tots AS (
  SELECT SUM(tc) AS tn, SUM(rc) AS rn FROM vocab
), weights AS (
  SELECT g,
         (CASE WHEN tn > 0 THEN 1000000 * tc // tn ELSE 0 END
          - CASE WHEN rn > 0 THEN 1000000 * rc // rn ELSE 0 END) AS w
  FROM vocab CROSS JOIN tots
), scored AS (
  SELECT p.doc_id,
         CAST(SUM(p.m) AS BIGINT) AS n_grams,
         CAST(SUM(p.m * w.w) AS DOUBLE) / SUM(p.m) AS score
  FROM per_doc p JOIN weights w ON p.g = w.g
  WHERE NOT p.is_t
  GROUP BY p.doc_id
)
SELECT doc_id, n_grams, score
FROM scored ORDER BY score DESC, doc_id LIMIT 100
""",
    tags=("northstar", "selection", "prep"),
)
def ns_select_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators import selection as SEL

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return SEL.importance_select(
        docs,
        "text",
        "doc_id",
        F.col("lang") == "en",
        k=100,
        vocab_size=2000,
        scoring="rate_diff",
    )


@query(
    "ns_select_classifier",
    note="classifier-based quality selection (the GPT-3/LLaMA-style "
    "filter): one logistic regression over hashed token counts "
    "(HashingTF murmur3 -> LBFGS, gradients aggregated executor-side, "
    "driver holds one n_features coefficient vector) separates the "
    "en-language target subset from the raw pool; the top-100 raw "
    "docs by P(target-like) are kept. The discriminative sibling of "
    "ns_select_importance. Rows-only (model-defined scores, but "
    "deterministic: no sampling, fixed start, fixed data); "
    "self-verifying: separation_ok asserts the held-in target docs' "
    "mean score exceeds the raw pool's mean — a classifier that "
    "learned nothing (or a flipped probability index) fails it.",
    tags=("northstar", "selection", "prep"),
)
def ns_select_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators import selection as SEL
    from spotify_app_etl_spark.operators.persist import scoped_persist

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    scores = scoped_persist(
        SEL.classifier_scores(docs, "text", "doc_id", F.col("lang") == "en")
    )
    separation = scores.agg(
        (
            F.avg(F.when(F.col("is_target"), F.col("score")))
            > F.avg(F.when(~F.col("is_target"), F.col("score")))
        ).alias("separation_ok")
    )
    return (
        SEL.classifier_select(docs, "text", "doc_id", F.col("lang") == "en",
                              k=100, scores=scores)
        .crossJoin(F.broadcast(separation))
        .orderBy(F.desc("score"), "doc_id")
    )


# ---------------------------------------------------------------------------
# Stupid-Backoff bigram-LM perplexity selection (operators/lm.py).
# ---------------------------------------------------------------------------


@query(
    "ns_select_lm_perplexity",
    note="CCNet-style LM perplexity filtering (operators/lm.py): a "
    "Stupid-Backoff bigram LM (Brants et al. 2007) is counted over the "
    "en-language target docs (unigram vocab capped at 2000, bigram "
    "table at 8000 — distributed TakeOrdereds with total tie-breaks), "
    "then every non-en doc is scored by its mean transition score and "
    "the top-100 most model-probable kept. The generative-LM sibling "
    "of ns_select_importance/ns_select_classifier. The registered "
    "query uses the integer per-million 'rate' mode (1e6*bc div "
    "prev_uc on a bigram hit, 400000*uc div N backoff, 400000 div N "
    "OOV floor; ONE final double division per doc) → exact DuckDB "
    "oracle; the paper's ln-score mode ships alongside, "
    "ranking-agreement-tested. Scoring is two broadcast joins against "
    "the bounded model + one map-side-combinable groupBy(doc); the "
    "1-row token-total rides a broadcast crossJoin (scalar-subquery "
    "pattern, enumerated in the plan audit).",
    oracle=f"""
WITH tgt AS (
  SELECT {SQL_TOKS} AS tk FROM documents WHERE lang = 'en'
), toks AS (
  SELECT unnest(tk) AS tok FROM tgt
), tots AS (
  SELECT COUNT(*) AS n FROM toks
), uni AS (
  SELECT tok, COUNT(*) AS uc FROM toks
  GROUP BY tok ORDER BY uc DESC, tok LIMIT 2000
), tr_t AS (
  SELECT {sql_transitions("tk")} FROM tgt
), bg AS (
  SELECT prev, cur, bc, prev_uc FROM (
    SELECT b.prev, b.cur, b.bc, u.uc AS prev_uc
    FROM (SELECT prev, cur, COUNT(*) AS bc FROM tr_t GROUP BY prev, cur) b
    JOIN uni u ON b.prev = u.tok
  ) ORDER BY bc DESC, prev, cur LIMIT 8000
), raw AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents WHERE lang <> 'en'
), tr_r AS (
  SELECT doc_id, {sql_transitions("tk")} FROM raw
), w AS (
  SELECT tr_r.doc_id,
         CASE WHEN bg.bc IS NOT NULL THEN 1000000 * bg.bc // bg.prev_uc
              WHEN cu.uc IS NOT NULL AND tots.n > 0 THEN 400000 * cu.uc // tots.n
              WHEN tots.n > 0 THEN 400000 // tots.n
              ELSE 0 END AS wt
  FROM tr_r
  LEFT JOIN bg ON tr_r.prev = bg.prev AND tr_r.cur = bg.cur
  LEFT JOIN uni cu ON tr_r.cur = cu.tok
  CROSS JOIN tots
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
       CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS score
FROM w GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 100
""",
    tags=("northstar", "selection", "lm", "prep"),
)
def ns_select_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators import lm as LM

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    model = LM.train_bigram_lm(
        docs.filter(F.col("lang") == "en"), "text", vocab_size=2000, bigram_cap=8000
    )
    return LM.lm_select(
        docs.filter(F.col("lang") != "en"), "text", "doc_id", model, k=100,
        scoring="rate",
    )


# ---------------------------------------------------------------------------
# Composed end-to-end recipe: quality gate → exact dedup → LM select.
# ---------------------------------------------------------------------------

from spotify_app_etl_spark.plans.corpus import (  # noqa: E402
    SQL_GOPHER_FLAGS,
    SQL_GOPHER_PASS,
    SQL_GOPHER_STATS,
)


@query(
    "ns_pipeline_llm_recipe",
    note="the operators COMPOSED as a real data recipe — Gopher rule "
    "gate (plans/corpus.gopher_rule_flags) → exact sha256 dedup keeping "
    "min-id representatives (one row_number window on the "
    "content hash — same dedup shape as ns_pipeline_training_prep) → "
    "Stupid-Backoff LM trained on the surviving en docs scoring the "
    "surviving non-en docs, top-50 kept (operators/lm.py). Every stage "
    "is individually oracle-checked elsewhere; THIS query hash-checks "
    "their composition end-to-end against one chained DuckDB WITH — "
    "the filters feed the dedup feeds the LM training corpus, so a "
    "row-set drift anywhere in the chain moves the final scores.",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang, text, {SQL_TOKS} AS tk FROM documents
), gst AS (
  {SQL_GOPHER_STATS.format(src="s")}
), gpassed AS (
  SELECT doc_id FROM (SELECT doc_id, {SQL_GOPHER_FLAGS} FROM gst)
  WHERE {SQL_GOPHER_PASS}
), surv AS (
  SELECT s.* FROM s JOIN gpassed USING (doc_id)
), reps AS (
  SELECT MIN(doc_id) AS doc_id FROM surv GROUP BY sha256(text)
), surv2 AS (
  SELECT surv.* FROM surv JOIN reps USING (doc_id)
), tgt AS (
  SELECT tk FROM surv2 WHERE lang = 'en'
), toks AS (
  SELECT unnest(tk) AS tok FROM tgt
), tots AS (
  SELECT COUNT(*) AS n FROM toks
), uni AS (
  SELECT tok, COUNT(*) AS uc FROM toks
  GROUP BY tok ORDER BY uc DESC, tok LIMIT 2000
), tr_t AS (
  SELECT {sql_transitions("tk")} FROM tgt
), bg AS (
  SELECT prev, cur, bc, prev_uc FROM (
    SELECT b.prev, b.cur, b.bc, u.uc AS prev_uc
    FROM (SELECT prev, cur, COUNT(*) AS bc FROM tr_t GROUP BY prev, cur) b
    JOIN uni u ON b.prev = u.tok
  ) ORDER BY bc DESC, prev, cur LIMIT 8000
), raw AS (
  SELECT doc_id, tk FROM surv2 WHERE lang <> 'en'
), tr_r AS (
  SELECT doc_id, {sql_transitions("tk")} FROM raw
), w AS (
  SELECT tr_r.doc_id,
         CASE WHEN bg.bc IS NOT NULL THEN 1000000 * bg.bc // bg.prev_uc
              WHEN cu.uc IS NOT NULL AND tots.n > 0 THEN 400000 * cu.uc // tots.n
              WHEN tots.n > 0 THEN 400000 // tots.n
              ELSE 0 END AS wt
  FROM tr_r
  LEFT JOIN bg ON tr_r.prev = bg.prev AND tr_r.cur = bg.cur
  LEFT JOIN uni cu ON tr_r.cur = cu.tok
  CROSS JOIN tots
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
       CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS score
FROM w GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 50
""",
    tags=("northstar", "pipeline", "selection", "prep"),
)
def ns_pipeline_llm_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators import lm as LM
    from spotify_app_etl_spark.operators.persist import scoped_persist
    from spotify_app_etl_spark.plans.corpus import gopher_rule_flags

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # The flags are map-computed, so carry the payload THROUGH the flag
    # frame and filter in place (r11, guide §2.4) — the previous shape
    # joined the flag table back to the corpus on doc_id, which
    # re-scanned the corpus and exchanged both sides for a predicate
    # that never needed to leave the row: 2 exchanges + 1 scan removed.
    surv = (
        gopher_rule_flags(docs, keep=("text", "lang"))
        .filter(
            F.col("word_count_ok")
            & F.col("word_len_ok")
            & F.col("alpha_ok")
            & F.col("symbol_ok")
        )
        .select("doc_id", "text", "lang")
    )
    # Exact dedup as ONE window over the content hash (r11, guide
    # §2.4; the same shape ns_pipeline_training_prep already uses):
    # keep each sha256 group's min-id row directly. The previous
    # exact_dedup + join-back evaluated the gated survivor pipeline
    # TWICE (the rep-id aggregate and the join's probe side) and paid
    # three exchanges (groupBy sha256, then both join sides on doc_id,
    # the probe side carrying the text payload); the window is one
    # exchange, one evaluation, row-identical output (A/B: identical
    # hash, 2.0 -> 1.7 s best-of-4 interleaved at sf0.1).
    from pyspark.sql import Window as W

    w_sha = W.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    # persisted: the deduped survivor set feeds BOTH the LM training
    # slice and the scoring pool
    surv2 = scoped_persist(
        surv.withColumn("__rn", F.row_number().over(w_sha))
        .filter("__rn = 1")
        .drop("__rn")
    )
    model = LM.train_bigram_lm(
        surv2.filter(F.col("lang") == "en"), "text", vocab_size=2000, bigram_cap=8000
    )
    return LM.lm_select(
        surv2.filter(F.col("lang") != "en"), "text", "doc_id", model, k=50,
        scoring="rate",
    )

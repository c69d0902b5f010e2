"""Stupid-Backoff bigram language-model scoring — the CCNet-style
perplexity filter.

The classic web-corpus cleaning recipe (CCNet, Wenzek et al. 2020;
LLaMA's pipeline) trains a language model on a trusted target corpus
and keeps the raw documents the model finds most probable. This module
is that shape with a distributed bigram LM under Stupid Backoff
(Brants et al. 2007, "Large Language Models in Machine Translation"):

    S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})   if the bigram
                                                      was seen
                     = alpha * c(w_i) / N             else (backoff to
                                                      the unigram)
                     = alpha * 1 / N                  else (OOV floor,
                                                      pseudo-count 1)

A document's score is the mean transition score over its (prev, cur)
token transitions (docs with < 2 tokens have no transitions and drop
out of the scoring); higher is more target-like. Stupid Backoff's
whole point is scale: the scores are relative frequencies — no
discounting pass, no normalization sweep — so the "training" is two
counting aggregations, which is why Google used it at trillion-token
scale and why it suits a Spark pipeline.

Two scoring modes, same split as ``operators/selection.py``:

* ``rate`` (engine-exact, the oracle-checked mode): transition scores
  are integer per-million rates — ``1_000_000 * bc div prev_uc`` for a
  bigram hit, ``400_000 * uc div N`` for the unigram backoff (400 000
  = alpha 0.4 in ppm), ``400_000 div N`` for OOV — all-integer until
  ONE final double division per document, so a DuckDB SQL oracle
  reproduces the scores bit-for-bit (Spark ``div`` == DuckDB ``//`` on
  the non-negative counts here).
* ``log`` (the paper's scoring): mean ``ln S`` per transition —
  -score/ln(2) is bits-per-transition, exp(-score) the per-transition
  perplexity. Float; cross-engine ``ln`` is not bit-stable, so this
  mode is property-tested (ranking agreement with ``rate``) instead of
  oracle-hashed.

Scale notes (100 TB): the model is two bounded tables — unigrams
capped at ``vocab_size`` rows, bigrams at ``bigram_cap`` rows, both
picked by distributed TakeOrdered with total tie-breaks — so scoring
is two BROADCAST joins against the exploded transition stream plus one
map-side-combinable groupBy(doc); the corpus never shuffles on a gram
key. A bigram evicted by the cap simply backs off — that is the
backoff semantics doing the bounding for free. Counts are multiplied
by the ppm scale before the div, so a ≥ ~9e12-token corpus would
overflow int64 — ANSI mode raises instead of wrapping (same budget
note as ``operators/selection.py``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from spotify_app_etl_spark.functions.text import tokens, transitions

#: Integer rate scale (per million) and alpha = 0.4 expressed in it.
_SCALE = 1_000_000
_ALPHA_PPM = 400_000
_ALPHA = 0.4


@dataclass(frozen=True)
class BigramLM:
    """A trained Stupid-Backoff bigram model: three bounded DataFrames.

    ``uni``: (tok, uc) — ≤ vocab_size rows; ``bg``: (prev, cur, bc,
    prev_uc) — ≤ bigram_cap rows, prev always in the unigram vocab so
    the conditional's denominator exists; ``tots``: one row (n) — total
    target token count. All three are scoped-persisted (consumed by
    multiple downstream joins) and broadcast-sized by construction.
    """

    uni: DataFrame
    bg: DataFrame
    tots: DataFrame


def train_bigram_lm(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 2000,
    bigram_cap: int = 8000,
) -> BigramLM:
    """Count a Stupid-Backoff bigram model over the TARGET corpus.

    Two counting shuffles, both map-side combinable and both bounded on
    the reduce side by a TakeOrdered cap with total (count desc, gram)
    tie-breaks: the unigram table keeps the ``vocab_size`` most
    frequent tokens, the bigram table the ``bigram_cap`` most frequent
    transitions whose ``prev`` is in the unigram vocab (a bigram whose
    history fell out of the vocab has no denominator — it backs off by
    construction).
    """
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    if bigram_cap <= 0:
        raise ValueError(f"bigram_cap must be positive, got {bigram_cap}")
    from spotify_app_etl_spark.operators.persist import scoped_persist

    base = df.select(tokens(F.col(text_col)).alias("__tk"))
    toks = base.select(F.explode("__tk").alias("tok"))
    tots = scoped_persist(toks.agg(F.count(F.lit(1)).alias("n")))
    uni = scoped_persist(
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("uc"))
        .orderBy(F.desc("uc"), "tok")
        .limit(vocab_size)
    )
    tr = base.select(F.explode(transitions(F.col("__tk"))).alias("t")).select(
        F.col("t.prev").alias("prev"), F.col("t.cur").alias("cur")
    )
    bg = scoped_persist(
        tr.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("bc"))
        # broadcast: uni is ≤ vocab_size rows by construction
        .join(F.broadcast(uni.withColumnsRenamed({"tok": "prev", "uc": "prev_uc"})), "prev")
        .orderBy(F.desc("bc"), "prev", "cur")
        .limit(bigram_cap)
    )
    return BigramLM(uni=uni, bg=bg, tots=tots)


def _transition_weight(scoring: str) -> Column:
    """Per-transition score from the joined (bc, prev_uc, uc, n)
    columns. ``rate``: integer ppm (engine-exact); ``log``: ln S.
    ``n == 0`` (empty target corpus) scores 0 rather than dividing by
    zero — a model trained on nothing ranks nothing."""
    if scoring == "rate":
        return (
            F.when(F.col("__bc").isNotNull(), F.expr(f"{_SCALE}L * __bc div __prev_uc"))
            .when(
                (F.col("__uc").isNotNull()) & (F.col("__n") > 0),
                F.expr(f"{_ALPHA_PPM}L * __uc div __n"),
            )
            .when(F.col("__n") > 0, F.expr(f"{_ALPHA_PPM}L div __n"))
            .otherwise(F.lit(0).cast("long"))
        )
    return (
        F.when(
            F.col("__bc").isNotNull(),
            F.log(F.col("__bc").cast("double") / F.col("__prev_uc")),
        )
        .when(
            (F.col("__uc").isNotNull()) & (F.col("__n") > 0),
            F.log(F.lit(_ALPHA) * F.col("__uc") / F.col("__n")),
        )
        .when(F.col("__n") > 0, F.log(F.lit(_ALPHA) / F.col("__n")))
        .otherwise(F.lit(0.0))
    )


def lm_score(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    lm: BigramLM,
    scoring: str = "rate",
) -> DataFrame:
    """Per-document mean transition score under ``lm``: (id, n_trans,
    score). Docs with < 2 tokens have no transitions and emit no row.

    Plan shape: explode transitions (no shuffle) → two broadcast joins
    against the bounded model tables → one map-side-combinable
    groupBy(id). The 1-row totals ride a broadcast crossJoin (the
    scalar-subquery pattern — bounded NLJ, enumerated in the plan
    audit).
    """
    if scoring not in ("rate", "log"):
        raise ValueError(f"scoring must be 'rate' or 'log', got {scoring!r}")
    # project the token array FIRST: transitions() references its
    # argument four times (two sizes, two slices), so inlining
    # tokens(text) would re-run the whole normalize+split chain per
    # reference on every scored doc (the measured-7x mistake the
    # bigrams() docstring warns about; train_bigram_lm already
    # two-steps it)
    tr = (
        docs.select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__tk"))
        .select("__id", F.explode(transitions(F.col("__tk"))).alias("t"))
        .select("__id", F.col("t.prev").alias("prev"), F.col("t.cur").alias("cur"))
        .join(
            F.broadcast(
                lm.bg.select(
                    "prev", "cur", F.col("bc").alias("__bc"), F.col("prev_uc").alias("__prev_uc")
                )
            ),
            ["prev", "cur"],
            "left",
        )
        .join(
            F.broadcast(lm.uni.select(F.col("tok").alias("cur"), F.col("uc").alias("__uc"))),
            ["cur"],
            "left",
        )
        .crossJoin(F.broadcast(lm.tots.select(F.col("n").alias("__n"))))
    )
    agg_score = (
        (F.sum(_transition_weight("rate")).cast("double") / F.count(F.lit(1)))
        if scoring == "rate"
        else (F.sum(_transition_weight("log")) / F.count(F.lit(1)))
    )
    return tr.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_trans"), agg_score.alias("score")
    ).select(F.col("__id").alias(id_col), "n_trans", "score")


def lm_select(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    lm: BigramLM,
    k: int,
    scoring: str = "rate",
) -> DataFrame:
    """The ``k`` most model-probable documents: (id, n_trans, score),
    ties broken on id — a distributed TakeOrdered, never a global
    sort."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    scored = lm_score(docs, text_col, id_col, lm, scoring=scoring)
    return scored.orderBy(F.desc("score"), id_col).limit(k)

"""DSIR-style importance selection (operators/selection.py): scoring
semantics on a planted corpus, rate_diff vs log_ratio ranking
agreement, vocab-cap behavior, and input guards. The registered
query's engine-exactness is proven by the DuckDB oracle; these tests
pin the SEMANTICS the oracle can't (is the selection actually
target-seeking?)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators import selection as SEL


@pytest.fixture(scope="module")
def planted(spark):
    """Target docs talk about alpha/beta; raw pool has 3 target-like
    docs (alpha-heavy), 3 off-target (gamma-heavy), 1 mixed."""
    rows = [
        (0, "alpha beta alpha beta alpha", True),
        (1, "beta alpha beta alpha beta", True),
        (2, "alpha beta beta alpha alpha", True),
        (10, "alpha beta alpha beta alpha beta", False),
        (11, "beta alpha alpha beta alpha", False),
        (12, "alpha alpha beta beta alpha", False),
        (20, "gamma delta gamma delta gamma", False),
        (21, "delta gamma delta gamma delta", False),
        (22, "gamma gamma delta delta gamma", False),
        (30, "alpha beta gamma delta alpha", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def _ranked_ids(df):
    return [r.doc_id for r in df.orderBy(F.desc("score"), "doc_id").collect()]


@pytest.mark.parametrize("scoring", ["rate_diff", "log_ratio"])
def test_target_like_docs_outrank_off_target(spark, planted, scoring):
    scored = SEL.importance_score_grams(
        planted, "text", "doc_id", F.col("is_t"), vocab_size=100, scoring=scoring
    )
    order = _ranked_ids(scored)
    assert set(order) == {10, 11, 12, 20, 21, 22, 30}  # raw pool only
    # every alpha/beta doc beats every gamma/delta doc; mixed in between
    pos = {d: i for i, d in enumerate(order)}
    assert max(pos[d] for d in (10, 11, 12)) < pos[30]
    assert pos[30] < min(pos[d] for d in (20, 21, 22))


def test_rate_diff_and_log_ratio_agree_on_extremes(spark, planted):
    a = _ranked_ids(
        SEL.importance_score_grams(
            planted, "text", "doc_id", F.col("is_t"), vocab_size=100,
            scoring="rate_diff",
        )
    )
    b = _ranked_ids(
        SEL.importance_score_grams(
            planted, "text", "doc_id", F.col("is_t"), vocab_size=100,
            scoring="log_ratio",
        )
    )
    # the two weightings may permute near-ties, but the target-like /
    # off-target partition must be identical
    assert set(a[:3]) == set(b[:3]) == {10, 11, 12}
    assert set(a[-3:]) == set(b[-3:]) == {20, 21, 22}


def test_select_top_k_and_ties(spark, planted):
    sel = SEL.importance_select(
        planted, "text", "doc_id", F.col("is_t"), k=3, vocab_size=100
    )
    assert {r.doc_id for r in sel.collect()} == {10, 11, 12}
    # k larger than the pool: everyone scored comes back
    all_sel = SEL.importance_select(
        planted, "text", "doc_id", F.col("is_t"), k=100, vocab_size=100
    )
    assert all_sel.count() == 7


def test_vocab_cap_drops_out_of_vocab_evidence(spark, planted):
    """With a 1-gram vocab only the single most frequent bigram carries
    weight; docs without it have NO in-vocab evidence and drop from the
    scoring join entirely (documented contract, mirrored by the
    oracle's inner join)."""
    scored = SEL.importance_score_grams(
        planted, "text", "doc_id", F.col("is_t"), vocab_size=1
    )
    out = scored.collect()
    assert 0 < len(out) <= 7
    assert all(r.n_grams >= 1 for r in out)


def test_no_target_docs_means_zero_target_rates(spark, planted):
    """tn == 0 must yield rate 0 (a no-evidence prior), not a crash;
    scores become -raw-rate, so the LEAST common-raw docs rank first."""
    scored = SEL.importance_score_grams(
        planted, "text", "doc_id", F.lit(False), vocab_size=100
    )
    assert scored.count() == 10  # everyone is raw now
    assert all(r.score <= 0 for r in scored.collect())


def test_input_guards(spark, planted):
    with pytest.raises(ValueError, match="scoring"):
        SEL.importance_score_grams(
            planted, "text", "doc_id", F.col("is_t"), scoring="cosine"
        )
    with pytest.raises(ValueError, match="vocab_size"):
        SEL.importance_score_grams(
            planted, "text", "doc_id", F.col("is_t"), vocab_size=0
        )
    with pytest.raises(ValueError, match="k must be"):
        SEL.importance_select(planted, "text", "doc_id", F.col("is_t"), k=0)


def test_empty_docs_produce_no_grams(spark):
    """Empty/whitespace-only docs must contribute NO bigram evidence —
    without the '' filter in functions.text.bigrams they would each
    emit a phantom '' gram, enter the vocab, and empty raw docs could
    be SELECTED as target-like."""
    rows = [
        (0, "alpha beta alpha", True),
        (1, "", True),
        (2, "   ", True),
        (10, "alpha beta", False),
        (11, "", False),
        (12, "gamma delta", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    scored = SEL.importance_score_grams(
        df, "text", "doc_id", F.col("is_t"), vocab_size=100
    ).collect()
    assert {r.doc_id for r in scored} == {10, 12}  # empty doc 11 unscored


def test_classifier_ranks_target_like_raw_docs_first(spark, planted):
    got = SEL.classifier_select(
        planted, "text", "doc_id", F.col("is_t"), k=3
    ).collect()
    assert [r.doc_id for r in got] == [10, 11, 12], got  # alpha-heavy raw pool
    assert all(0.0 <= r.score <= 1.0 for r in got)

    scores = SEL.classifier_scores(planted, "text", "doc_id", F.col("is_t"))
    rows = {r.doc_id: r for r in scores.collect()}
    assert len(rows) == 10  # every row scored, target included
    t_mean = sum(r.score for r in rows.values() if r.is_target) / 3
    off = [rows[i].score for i in (20, 21, 22)]
    assert t_mean > max(off), (t_mean, off)  # separation on planted signal


def test_classifier_deterministic_and_guards(spark, planted):
    a = SEL.classifier_scores(planted, "text", "doc_id", F.col("is_t")).collect()
    b = SEL.classifier_scores(planted, "text", "doc_id", F.col("is_t")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    with pytest.raises(ValueError, match="k must be"):
        SEL.classifier_select(planted, "text", "doc_id", F.col("is_t"), k=0)
    with pytest.raises(ValueError, match="n_features"):
        SEL.classifier_scores(planted, "text", "doc_id", F.col("is_t"), n_features=1)


def test_classifier_registered_query_rider(spark):
    from spotify_app_etl_spark.registry import load_all

    pdf = load_all()["ns_select_classifier"].fn(
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert len(pdf) == 100
    assert pdf["separation_ok"].all()
    assert pdf["score"].is_monotonic_decreasing or len(set(pdf["score"])) < 100

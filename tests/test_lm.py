"""Stupid-Backoff bigram LM (operators/lm.py): hand-computed scoring
semantics, backoff/OOV paths, cap behavior, rate↔log ranking
agreement, and input guards. The registered query's engine-exactness
is proven by the DuckDB oracle (tests/test_oracle_parity.py); these
tests pin the SEMANTICS the oracle can't — is the score actually the
Stupid-Backoff score?"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators import lm as LM


@pytest.fixture(scope="module")
def model(spark):
    """Target corpus: 'a b a b' + 'a c' → N=6; uc a=3 b=2 c=1;
    bc (a,b)=2 (b,a)=1 (a,c)=1."""
    tgt = spark.createDataFrame(
        [("a b a b",), ("a c",)], "text string"
    )
    return LM.train_bigram_lm(tgt, "text", vocab_size=10, bigram_cap=10)


def _scores(spark, model, docs, scoring="rate"):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = LM.lm_score(df, "text", "doc_id", model, scoring=scoring).collect()
    return {r.doc_id: (r.n_trans, r.score) for r in rows}


def test_hand_computed_rate_scores(spark, model):
    got = _scores(
        spark,
        model,
        [(1, "a b x"), (2, "c a"), (3, "a")],  # hit+OOV / backoff / no trans
    )
    # doc 1: (a,b) hit = 1e6*2 div 3 = 666666; (b,x) OOV = 400000 div 6
    assert got[1] == (2, (666666 + 66666) / 2)
    # doc 2: (c,a) unseen bigram, 'a' in vocab = 400000*3 div 6
    assert got[2] == (1, 200000.0)
    # doc 3: < 2 tokens → no transitions → no row
    assert 3 not in got


def test_hand_computed_log_scores(spark, model):
    got = _scores(spark, model, [(1, "a b x")], scoring="log")
    n, score = got[1]
    assert n == 2
    expect = (math.log(2 / 3) + math.log(0.4 / 6)) / 2
    assert score == pytest.approx(expect, rel=1e-12)


def test_bigram_hit_beats_backoff_beats_oov(spark, model):
    got = _scores(spark, model, [(1, "a b"), (2, "x a"), (3, "x y")])
    hit, backoff, oov = got[1][1], got[2][1], got[3][1]
    assert hit > backoff > oov >= 0


def test_caps_force_backoff(spark):
    """bigram_cap=1 keeps only the most frequent bigram; everything
    else backs off to its unigram rate."""
    tgt = spark.createDataFrame([("a b a b a c",)], "text string")
    capped = LM.train_bigram_lm(tgt, "text", vocab_size=10, bigram_cap=1)
    assert capped.bg.count() == 1
    assert capped.bg.collect()[0].asDict() | {} == {
        "prev": "a", "cur": "b", "bc": 2, "prev_uc": 3
    }
    got = _scores(spark.createDataFrame([("x",)], "x string").sparkSession, capped,
                  [(1, "b a")])
    # (b,a) was a real bigram but fell to the cap → unigram backoff on 'a'
    assert got[1] == (1, float(400000 * 3 // 6))


def test_vocab_cap_drops_bigrams_with_out_of_vocab_prev(spark):
    tgt = spark.createDataFrame([("a a a b c",)], "text string")
    m = LM.train_bigram_lm(tgt, "text", vocab_size=1, bigram_cap=10)
    assert [r.tok for r in m.uni.collect()] == ["a"]
    # only bigrams whose prev == 'a' survive (prev must be in vocab)
    assert {(r.prev, r.cur) for r in m.bg.collect()} == {("a", "a"), ("a", "b")}


def test_rate_and_log_agree_on_extremes(spark, model):
    docs = [(1, "a b a b"), (2, "c a c"), (3, "x y z")]
    rate = _scores(spark, model, docs, scoring="rate")
    log = _scores(spark, model, docs, scoring="log")
    order = lambda d: sorted(d, key=lambda k: (-d[k][1], k))  # noqa: E731
    assert order(rate) == order(log) == [1, 2, 3]


def test_select_topk_ties_on_id(spark, model):
    docs = [(5, "a b"), (4, "a b"), (9, "x y")]
    picked = LM.lm_select(
        spark.createDataFrame(docs, "doc_id long, text string"),
        "text", "doc_id", model, k=2,
    ).collect()
    assert [r.doc_id for r in picked] == [4, 5]


def test_guards(spark, model):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="scoring"):
        LM.lm_score(df, "text", "doc_id", model, scoring="bogus")
    with pytest.raises(ValueError, match="k must be positive"):
        LM.lm_select(df, "text", "doc_id", model, k=0)
    with pytest.raises(ValueError, match="vocab_size"):
        LM.train_bigram_lm(df, "text", vocab_size=0)
    with pytest.raises(ValueError, match="bigram_cap"):
        LM.train_bigram_lm(df, "text", bigram_cap=0)


def test_empty_target_scores_zero(spark):
    """A model trained on nothing scores every transition 0 instead of
    dividing by zero (documented in _transition_weight)."""
    tgt = spark.createDataFrame([], "text string")
    m = LM.train_bigram_lm(tgt, "text")
    got = _scores(spark, m, [(1, "a b")])
    assert got[1] == (1, 0.0)

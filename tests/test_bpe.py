"""BPE tokenizer (operators/bpe.py): merge-order determinism against a
hand-computed example, greedy-apply == training segmentation,
order-preserving document segmentation, unseen-input degradation, and
the registered query's riders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    segment_word,
)
from spotify_app_etl_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_train_matches_hand_computed_merges(spark):
    # corpus: 'aaab' x2, 'ab' x1
    # round 1 votes: (a,a)=4 [two per 'aaab'], (a,b)=3 -> merge (a,a)
    # round 2 ('aa,a,b' x2, 'a,b' x1): (aa,a)=2, (a,b)=3 -> merge (a,b)
    # round 3 ('aa,ab' x2, 'ab' x1): (aa,ab)=2 -> merge (aa,ab)
    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    merges = bpe_train(df, "text", num_merges=3)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    # greedy apply reproduces the training segmentation
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("aaab", ranks) == ["aaab"]
    assert segment_word("ab", ranks) == ["ab"]
    assert segment_word("aab", ranks) == ["aa", "b"]  # (a,a) outranks (a,b)
    # unseen characters degrade to finer pieces, never error
    assert segment_word("axb", ranks) == ["a", "x", "b"]
    assert segment_word("", ranks) == []


def test_train_tie_break_and_exhaustion(spark):
    # all pairs tie at 1 -> lexicographic winner first
    df = spark.createDataFrame([("ba dc",)], "text string")
    merges = bpe_train(df, "text", num_merges=10)
    assert merges[0] == ("b", "a")  # ('b','a') < ('d','c')
    assert merges == [("b", "a"), ("d", "c")]  # exhausted after 2

    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(df, "text", num_merges=0)
    empty = spark.createDataFrame([("",), (None,)], "text string")
    with pytest.raises(ValueError, match="no tokens"):
        bpe_train(empty, "text")


def test_segment_preserves_order_and_reconstructs(spark):
    corpus = spark.createDataFrame(
        [(1, "hello world hello"), (2, "world"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = bpe_train(corpus.filter("text is not null"), "text", num_merges=5)
    got = {
        r["doc_id"]: r["bpe_pieces"]
        for r in bpe_segment(corpus, "text", merges).collect()
    }
    assert "".join(got[1]) == "helloworldhello"
    assert "".join(got[2]) == "world"
    assert got[3] == [] and got[4] == []
    # repeated word segments identically at both positions
    ranks = {p: i for i, p in enumerate(merges)}
    seg_h, seg_w = segment_word("hello", ranks), segment_word("world", ranks)
    assert got[1] == seg_h + seg_w + seg_h


def test_registered_query_riders(spark):
    pdf = load_all()["ns_bpe_token_count"].fn(spark, SF).toPandas()
    assert len(pdf) > 0
    assert pdf["reconstruct_ok"].all(), pdf[~pdf["reconstruct_ok"]].head()
    assert pdf["bounds_ok"].all(), pdf[~pdf["bounds_ok"]].head()
    # the learned merges actually compress: strictly fewer pieces than
    # characters overall (150 merges over a real corpus)
    assert pdf["n_bpe_tokens"].sum() < pdf["n_word_chars"].sum()
    assert (pdf["n_bpe_tokens"] >= pdf["n_words"]).all()


def test_save_load_roundtrip(spark, tmp_path):
    from spotify_app_etl_spark.operators.bpe import bpe_load, bpe_save

    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    merges = bpe_train(df, "text", num_merges=3)
    path = str(tmp_path / "bpe")
    bpe_save(spark, merges, path)
    assert bpe_load(spark, path) == merges

    with pytest.raises(ValueError, match="empty merge list"):
        bpe_save(spark, [], path)

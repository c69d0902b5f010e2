"""Multimodal plumbing: binary payload round-trip, mapInPandas feature
batch shapes, frame-sampling row explosion, decode-stub gating."""

from __future__ import annotations

import hashlib

import numpy as np

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.functions import multimodal as MM
from spotify_app_etl_spark.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mm(spark):
    return MM.documents_as_binary(load_table(spark, SF, "documents")).cache()


def test_payload_roundtrip(spark, mm):
    row = mm.filter(F.col("doc_id") == 0).select("payload", "meta").collect()[0]
    text = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") == 0)
        .select("text")
        .collect()[0][0]
    )
    assert bytes(row.payload) == text.encode("utf-8")
    assert row.meta.n_bytes == len(text.encode("utf-8"))
    assert row.meta.format == "fake/rgb8"


def test_features_match_python_reference(spark, mm):
    feats = {r.doc_id: r for r in MM.extract_features(mm).collect()}
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    assert len(feats) == len(docs)
    for d in docs[:50]:
        ref = MM.fake_decode_features(d.text.encode("utf-8"))
        got = feats[d.doc_id]
        assert got.n_bytes == ref["n_bytes"]
        assert abs(got.byte_mean - ref["byte_mean"]) < 1e-9
        assert got.n_distinct_bytes == ref["n_distinct_bytes"]
        assert got.head_hex == ref["head_hex"]


def test_frame_sampling_counts(spark, mm):
    frames = MM.sample_frames(mm, frame_size=256, every_k=4)
    got = {
        (r.doc_id, r.frame_idx): (r.frame_bytes, r.frame_hash) for r in frames.collect()
    }
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    for d in docs[:50]:
        payload = d.text.encode("utf-8")
        chunks = [payload[o : o + 256] for o in range(0, len(payload), 256)]
        expected_idx = list(range(0, len(chunks), 4))
        rows = [(i, j) for (i, j) in got if i == d.doc_id]
        assert sorted(j for _, j in rows) == expected_idx
        for j in expected_idx:
            fb, fh = got[(d.doc_id, j)]
            assert fb == len(chunks[j])
            assert fh == hashlib.sha256(chunks[j]).hexdigest()[:16]


def test_metadata_query_prunes_payload(spark, mm, tmp_path):
    """A metadata-only projection over the parquet-backed table must not
    read the payload column (ReadSchema excludes it)."""
    path = str(tmp_path / "mm.parquet")
    mm.write.parquet(path)
    meta_only = spark.read.parquet(path).select("doc_id", "meta.n_bytes")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, plan


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG\r\n")


def test_dhash64_matches_python_reference():
    """Vectorized kernel == naive per-cell reference, incl. edge sizes."""
    import numpy as np

    def naive(payload: bytes) -> int:
        arr = list(payload)
        if not arr:
            return 0
        cells = [[] for _ in range(72)]
        for i, v in enumerate(arr):
            cells[i * 72 // len(arr)].append(v)
        means = [sum(c) / len(c) if c else 0.0 for c in cells]
        bits = []
        for r in range(8):
            row = means[r * 9 : (r + 1) * 9]
            bits += [row[j] > row[j + 1] for j in range(8)]
        return sum(1 << i for i, b in enumerate(bits) if b)

    rng = np.random.RandomState(3)
    for size in (0, 1, 71, 72, 73, 500, 4096):
        payload = bytes(rng.randint(0, 256, size=size, dtype=np.uint8))
        assert MM.dhash64(payload) == naive(payload), f"size {size}"


def test_phash_pairs_find_planted_near_dups(spark):
    """Identical payloads pair at Hamming 0; a lightly-edited copy
    (few bytes flipped) still pairs within the Hamming budget."""
    base = ("spark shuffles partition the keyspace " * 40).encode()
    edited = bytearray(base)
    edited[10] = ord("X")  # one byte: moves one cell mean slightly
    rows = [
        (1, bytes(base)),
        (2, bytes(base)),          # exact dup of 1
        (3, bytes(edited)),        # near dup of 1
        (4, b"completely different payload " * 50),
    ]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in MM.phash_near_dup_pairs(mm, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_phash_bucket_cap_bounds_degenerate_fanout(spark):
    """N copies of one thumbnail share every band bucket (identical
    phash) — the O(N²) blow-up the cap exists for. Capped: those
    buckets are dropped; distinct payloads below the cap still pair."""
    base = ("spark shuffles partition the keyspace " * 40).encode()
    other = b"completely different payload " * 50
    rows = [(i, bytes(base)) for i in range(20)] + [(100, other), (101, other)]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")
    capped = {
        (r.id_a, r.id_b)
        for r in MM.phash_near_dup_pairs(mm, max_bucket_size=5).collect()
    }
    assert (100, 101) in capped  # small bucket survives
    assert not any(a < 20 and b < 20 for a, b in capped)  # degenerate dropped
    # default (None) keeps exact recall: all 190 clone pairs present
    full = MM.phash_near_dup_pairs(mm).count()
    assert full == 190 + 1


def test_phash_query_recall_on_planted(spark):
    """The registered query's planted near-dups (same-length edits)
    must overwhelmingly pair with their originals within Hamming 3."""
    from spotify_app_etl_spark.registry import load_all

    rows = load_all()["ns_mm_phash_pairs"].fn(spark, SF).collect()
    found = {r.id_a for r in rows if r.id_b == r.id_a + 1000000}
    from spotify_app_etl_spark.io import load_table
    import pyspark.sql.functions as F

    planted = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .count()
    )
    assert len(found) >= 0.8 * planted, (len(found), planted)


def test_phash_banding_complete_beyond_hamming3(spark):
    """Band count derives from max_hamming: at radius 6 the banded join
    must find exactly the pairs brute force finds (pigeonhole needs
    max_hamming+1 bands — a fixed 4-band split would miss pairs)."""
    import itertools

    rng = np.random.RandomState(11)
    payloads = [
        bytes(rng.randint(0, 256, size=600, dtype=np.uint8)) for _ in range(12)
    ]
    # plant copies with increasing edit counts → spread of Hamming dists
    for k in (1, 2, 3, 5, 8):
        p = bytearray(payloads[0])
        for j in range(k):
            p[j * 37] ^= 0xFF
        payloads.append(bytes(p))
    rows = [(i, p) for i, p in enumerate(payloads)]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashes = {i: MM.dhash64(p) for i, p in rows}
    expect = {
        (a, b)
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 6
    }
    got = {
        (r.id_a, r.id_b)
        for r in MM.phash_near_dup_pairs(mm, max_hamming=6).collect()
    }
    assert got == expect, (sorted(got ^ expect))


def test_phash_max_hamming_guard():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hamming"):
        MM.phash_near_dup_pairs(None, max_hamming=16)
    with _pytest.raises(ValueError, match="max_hamming"):
        MM.phash_near_dup_pairs(None, max_hamming=-1)


def test_null_payloads_degrade_not_crash(spark):
    """A NULL payload (NULL text upstream) must not kill the Arrow
    kernels: features/frames drop the row (nothing to decode), the
    perceptual hash emits NULL (dropping out of the band join), and
    frame-sampling parameters are validated on the driver."""
    import pytest

    from spotify_app_etl_spark.functions import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "hello world of bytes"), (2, None)], "doc_id long, text string"
    )
    mm = MM.documents_as_binary(docs)
    feats = MM.extract_features(mm).collect()
    assert {r["doc_id"] for r in feats} == {1}
    frames = MM.sample_frames(mm, frame_size=4, every_k=2).collect()
    assert {r["doc_id"] for r in frames} == {1}
    ph = {r["doc_id"]: r["phash"] for r in MM.perceptual_hashes(mm).collect()}
    assert ph[1] is not None and ph[2] is None
    pairs = MM.phash_near_dup_pairs(mm, max_hamming=3).collect()
    assert pairs == []  # no crash, NULL row never buckets
    with pytest.raises(ValueError, match="every_k"):
        MM.sample_frames(mm, every_k=0)

"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Pattern for a 100 TB training-data pipeline:

- A multimodal table = (id, payload binary, meta struct<...>) — the
  payload is NEVER interpreted by Catalyst; filters/joins/partitioning
  run on the metadata columns, so predicate pushdown and column
  pruning still apply (a metadata-only query never reads payload
  bytes from parquet thanks to columnar storage).
- Decode / feature-extraction crosses into Python exactly once, via
  ``mapInPandas`` (Arrow batches, ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` bounds batch memory = batch_rows x payload
  size). Partition count bounds decode parallelism.
- The real decoders (PIL/libav/etc.) are not in this container —
  :func:`decode_image` raises ``NotImplementedError`` unless a decoder
  is importable, and the pipeline stages use
  :func:`fake_decode_features`, a deterministic pure-Python stand-in
  with the same signature/schema, so the plumbing (schemas, batch
  shapes, explode of frame samples) is fully real and tested.

The driver testdata has no binary table; :func:`documents_as_binary`
derives one deterministically from ``documents`` (UTF-8 payload +
metadata), which keeps every downstream stage oracle-able where the
math is SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: metadata struct carried alongside every payload
META_SCHEMA = (
    "format string, n_bytes long, width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_min int, byte_max int, "
    "n_distinct_bytes int, head_hex string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_hash string"


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """documents → multimodal-shaped table: payload = UTF-8 bytes of
    ``text``, metadata derived deterministically (fake width/height
    from doc_id so partition-pruning-style predicates are testable)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            # cast matches META_SCHEMA's declared long (octet_length
            # returns int — a silent schema drift for consumers that
            # trust the constant)
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decoders: real (gated) and fake (deterministic).
# ---------------------------------------------------------------------------


def decode_image(payload: bytes):  # pragma: no cover - container lacks PIL
    """Decode an image payload to a pixel array. STUB: the container
    ships no image codec; a deployment with Pillow installed gets the
    real path via the import-try."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow; use fake_decode_features for "
            "plumbing tests"
        ) from exc


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in for decode + feature extraction: byte
    statistics of the payload (pure Python/NumPy, reproducible)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return {
            "n_bytes": 0,
            "byte_mean": 0.0,
            "byte_min": 0,
            "byte_max": 0,
            "n_distinct_bytes": 0,
            "head_hex": "",
        }
    return {
        "n_bytes": int(arr.size),
        "byte_mean": float(arr.sum()) / arr.size,
        "byte_min": int(arr.min()),
        "byte_max": int(arr.max()),
        "n_distinct_bytes": int(np.unique(arr).size),
        "head_hex": payload[:8].hex(),
    }


# ---------------------------------------------------------------------------
# mapInPandas stages.
# ---------------------------------------------------------------------------


def extract_features(mm: DataFrame) -> DataFrame:
    """Feature-extraction stage: one Python crossing, Arrow-batched.

    Narrow (no shuffle): each partition decodes its own payloads; at
    scale, repartition upstream to bound per-task decode memory.
    """

    def run(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            # NULL payloads are dropped — nothing to decode; an
            # unguarded np.frombuffer(None) would kill the task (the
            # same NULL-text input class the dedup kernels guard)
            keep = pdf["payload"].notna()
            pdf = pdf[keep]
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=[
                "n_bytes", "byte_mean", "byte_min", "byte_max",
                "n_distinct_bytes", "head_hex",
            ])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return mm.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(mm: DataFrame, frame_size: int = 256, every_k: int = 4) -> DataFrame:
    """Frame-sampling stage for "video" payloads: split the payload
    into fixed-size frames, keep every k-th, one output row per kept
    frame (mapInPandas explode — row counts change, which a scalar
    pandas_udf cannot do). NULL payloads yield no frames."""
    import hashlib

    # validate on the DRIVER: bad values would otherwise only fail at
    # action time as an opaque range()/slice error inside an executor
    # task (frame_size=0 would even loop the byte offsets forever)
    if frame_size < 1 or every_k < 1:
        raise ValueError(
            f"frame_size and every_k must be >= 1, got "
            f"frame_size={frame_size} every_k={every_k}"
        )

    def run(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                frames = [
                    payload[off : off + frame_size]
                    for off in range(0, len(payload), frame_size)
                ]
                for idx in range(0, len(frames), every_k):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_bytes": len(frames[idx]),
                            "frame_hash": hashlib.sha256(frames[idx]).hexdigest()[:16],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return mm.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (dHash over the decoded byte grid).
# ---------------------------------------------------------------------------


def dhash64(payload: bytes) -> int:
    """64-bit difference hash of a payload's byte stream.

    The dHash recipe on the fake decoder's output: fold the bytes into
    an 8x9 cell grid (cell value = mean byte over an equal-width
    stride), emit one bit per horizontal neighbor pair (cell > next).
    Robust to small payload edits the way image dHash is robust to
    resizing/re-encoding — a few changed bytes move a few cell means,
    flipping few bits. Pure numpy, deterministic; with a real image
    decoder the same function runs on the pixel array instead.
    """
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0
    cells = np.zeros(72, dtype=np.float64)
    # equal-width strides via linear index mapping (vectorized bincount)
    idx = (np.arange(arr.size, dtype=np.int64) * 72) // arr.size
    np.add.at(cells, idx, arr.astype(np.float64))
    counts = np.bincount(idx, minlength=72)
    cells = cells / np.maximum(counts, 1)
    grid = cells.reshape(8, 9)
    bits = (grid[:, :-1] > grid[:, 1:]).ravel()
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def perceptual_hashes(mm: DataFrame) -> DataFrame:
    """(doc_id, phash) via one Arrow-batched Python crossing."""

    def run(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            # NULL payload -> NULL phash (the row then drops out of the
            # null-unsafe band-chunk equi-join downstream, same as the
            # SimHash kernel's NULL-signature convention)
            hashes = [None if p is None else dhash64(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    # two's-complement into signed int64 for Spark LongType
                    "phash": pd.Series(
                        [
                            None
                            if h is None
                            else (h - (1 << 64) if h >= (1 << 63) else h)
                            for h in hashes
                        ],
                        dtype=object,
                    ),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(run, schema="doc_id long, phash long")


def phash_near_dup_pairs(
    mm: DataFrame, max_hamming: int = 3, max_bucket_size: int | None = None
) -> DataFrame:
    """Near-dup payload pairs at Hamming(phash) ≤ max_hamming.

    Same pigeonhole banding as SimHash (operators/dedup.py), but the
    band count is DERIVED from the radius: max_hamming+1 bands over the
    64 bits — any pair at distance ≤ max_hamming agrees exactly on ≥ 1
    band (pigeonhole), so the bucket equi-join finds ALL such pairs
    without an all-pairs comparison; exact distance then filters. A
    fixed 4-band split would silently lose pairs for max_hamming ≥ 4.
    One shuffle on (band, chunk). Radius is capped at 15 (16 bands of
    ≥4 bits) — beyond that the buckets are too coarse to prune and the
    caller wants a different algorithm, so we fail loudly.

    ``max_bucket_size`` is the same 100 TB safety valve as the MinHash/
    SimHash/embedding-LSH candidate joins (operators/dedup.py
    ``_cap_buckets``): N copies of one thumbnail share every band
    bucket, and the self-join emits ~N²/2 rows per band. Capping trades
    recall INSIDE oversized buckets for a bound on join fan-out; None
    (default) keeps exact recall.
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming={max_hamming} out of range [0, 15]: banding needs "
            "max_hamming+1 bands over 64 bits; beyond 16 bands the buckets "
            "stop pruning — use a multiprobe/BK-tree approach instead"
        )
    nbands = max_hamming + 1
    # Split 64 bits into nbands contiguous bands, widths as even as
    # possible (remainder bits go to the low bands).
    widths = [64 // nbands + (1 if b < 64 % nbands else 0) for b in range(nbands)]
    offsets = [sum(widths[:b]) for b in range(nbands)]

    def _chunk(b: int):
        if widths[b] == 64:  # max_hamming=0: the band IS the hash
            return F.col("phash")
        mask = (1 << widths[b]) - 1
        return F.shiftrightunsigned(F.col("phash"), offsets[b]).bitwiseAND(
            F.lit(mask)
        )

    from spotify_app_etl_spark.operators.persist import scoped_persist

    # Persisted for the same reason simhash_candidates persists its
    # signature: both sides of the self-join (and the exact-distance
    # filter) would otherwise re-execute the payload scan + Python
    # dhash stage — the dominant cost — once per reference.
    sig = scoped_persist(perceptual_hashes(mm))
    chunks = sig.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _chunk(b).alias("chunk")
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "phash", "bc.band", "bc.chunk")
    from spotify_app_etl_spark.operators.dedup import cap_buckets

    chunks = cap_buckets(chunks, ["band", "chunk"], max_bucket_size)
    return (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

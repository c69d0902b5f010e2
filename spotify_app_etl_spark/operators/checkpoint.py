"""Storage release for superseded ``localCheckpoint`` generations.

The iterative operators (connected components in ``cluster.py``,
PageRank in ``graph.py``) checkpoint their loop state every round to
truncate lineage. ``localCheckpoint`` materializes into executor
storage (MEMORY_AND_DISK), and nothing releases a generation when the
next one replaces it: Python drops the reference, but the JVM side
waits on GC + ContextCleaner, which on a long-lived session is
unbounded in practice. At small scale this is invisible; the 128x
scale probe measured the consequence directly — R live generations of
(node, label) state crowding the storage pool, eviction thrash, and an
80x wall-time bend on the 2-round CC.

:func:`release_local_checkpoint` frees a generation deterministically
the moment the loop proves it superseded. It reaches the checkpointed
RDD through the analyzed ``LogicalRDD`` plan node — the DataFrame-level
``unpersist()`` only talks to the CacheManager and is a no-op for
checkpoints.

Safety contract: a localCheckpoint is UNRECOMPUTABLE once unpersisted
(its lineage was cut — that is the point), so callers may only release
a generation no surviving plan references. The iterative loops satisfy
this by construction: round k+1's state is eagerly checkpointed (fully
materialized, self-contained) before round k is released, and the
helper refuses anything that is not exactly a checkpoint root, so a
derived plan (e.g. ``ck.drop(col)``) can never release storage its
siblings still need by accident.
"""

from __future__ import annotations

import contextlib
import logging
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

log = logging.getLogger(__name__)


@contextlib.contextmanager
def adaptive_off(spark: SparkSession):
    """Disable AQE for the enclosed plan constructions, restoring the
    previous value on exit.

    Why the iterative operators (PageRank, connected components) want
    this: ``localCheckpoint`` records the physical plan's output
    partitioning/ordering into the resulting ``LogicalRDD`` — that
    metadata is what lets every later round join against the
    checkpointed table WITHOUT re-exchanging it. Under AQE the captured
    partitioning is ``UnknownPartitioning`` (the final stage is a
    coalesced shuffle-stage whose partitioning is no longer expressible
    as a HashPartitioning), so each of PageRank's 15 rounds re-shuffled
    the full edge table — measured at sf0.1: 9 exchanges per round-plan
    before, 3 after (one carrying data). AQE has nothing to offer
    inside such a loop anyway: the plan is static and co-partitioned by
    construction, skew is absorbed by map-side partial aggregation, and
    round output sizes repeat — there is nothing to adapt. The session
    conf flips are process-wide for their (short) duration; concurrent
    planners in other threads would plan one query non-adaptively,
    which affects speed, never values.

    Overlap-safe (r11 review): the flip is reference-counted per
    session under a lock — two threads' overlapping blocks (e.g. a
    ``foreachBatch`` CC while the driver thread runs PageRank) restore
    the ORIGINAL value only when the last block exits, instead of the
    naive save/restore interleaving that would latch AQE off for the
    rest of the session (T1 saves 'true', T2 saves 'false', T1
    restores 'true', T2 restores 'false').
    """
    key = "spark.sql.adaptive.enabled"
    sid = id(spark)
    with _AQE_LOCK:
        depth, prev = _AQE_STATE.get(sid, (0, None))
        if depth == 0:
            prev = str(spark.conf.get(key, "true"))
            spark.conf.set(key, "false")
        _AQE_STATE[sid] = (depth + 1, prev)
    try:
        yield
    finally:
        with _AQE_LOCK:
            depth, prev = _AQE_STATE[sid]
            if depth == 1:
                del _AQE_STATE[sid]
                spark.conf.set(key, prev)
            else:
                _AQE_STATE[sid] = (depth - 1, prev)


_AQE_LOCK = threading.Lock()
#: id(session) -> (nesting depth, conf value to restore at depth 0)
_AQE_STATE: dict[int, tuple[int, str | None]] = {}


def co_partitioned_rounds(spark: SparkSession, n_rows: int, row_bytes: int = 32) -> bool:
    """True when the iterative loop vector (``n_rows * row_bytes``
    estimated bytes) no longer fits under ``autoBroadcastJoinThreshold``
    — i.e. rounds should run non-adaptively co-partitioned against the
    captured static layout instead of letting AQE broadcast the vector.
    A disabled threshold (-1) always selects the co-partitioned path."""
    from spotify_app_etl_spark.operators.conf import size_conf_bytes

    threshold = size_conf_bytes(spark, "spark.sql.autoBroadcastJoinThreshold", 10 << 20)
    return threshold < 0 or n_rows * row_bytes >= threshold


def broadcastable_rounds_ctx(spark: SparkSession, n_rows: int, row_bytes: int = 32):
    """Round-mode gate shared by the iterative operators: returns a
    no-op context (rounds run under AQE, which will broadcast the
    n_rows-sized loop vector — strictly best while it fits) when
    :func:`co_partitioned_rounds` is False, else :func:`adaptive_off`
    (co-partitioned sort-merge rounds against the captured static
    layout)."""
    if co_partitioned_rounds(spark, n_rows, row_bytes):
        return adaptive_off(spark)
    return contextlib.nullcontext()


def local_checkpoint_ser(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` with SERIALIZED in-memory blocks
    (``StorageLevel.MEMORY_AND_DISK`` — PySpark's serialized level;
    the engine default is the *deserialized* variant).

    Loop state here is narrow rows (two longs; a long + a double):
    stored deserialized, the ~48 B/row JVM object overhead is 2-3x the
    data itself, and the inflated blocks sit in the storage pool's
    PROTECTED half — memory the unified manager will not evict for
    execution. The 128x scale probe measured the consequence: PageRank
    over a ~50M-edge graph died with UNABLE_TO_ACQUIRE_MEMORY inside a
    round's checkpoint job because the loop-invariant edge state had
    pinned the protected region while 32 concurrent join tasks fought
    over the remainder. Serialized blocks store as one compact byte
    buffer per block (no per-row objects), spill to disk whole, and are
    written once / read once per round — the classic iterative-state
    trade (GraphX's documented recommendation for big graphs). Same
    fix, same heap: the probe passes after this change.

    Values are unaffected; only the block encoding changes.
    """
    try:
        return df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    except TypeError:  # Spark < 4.0: no storageLevel parameter
        return df.localCheckpoint(eager=True)


def release_local_checkpoint(df: DataFrame | None, *, blocking: bool = False) -> bool:
    """Unpersist the executor storage behind a ``df.localCheckpoint()``
    result. Returns True when storage was released; False (and a debug
    log) when ``df`` is None, is not a checkpoint root, or the JVM
    internals moved — never raises, because release is an optimization
    and the caller's result must not depend on it.
    """
    if df is None:
        return False
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            log.debug(
                "release_local_checkpoint: not a checkpoint root (%s) — skipped",
                plan.getClass().getSimpleName(),
            )
            return False
        plan.rdd().unpersist(blocking)
        return True
    except Exception as exc:  # py4j surface may shift across Spark versions
        log.debug("release_local_checkpoint: skipped (%s)", exc)
        return False

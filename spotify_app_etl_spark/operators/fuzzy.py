"""Blocked fuzzy entity matching: deletion-neighborhood blocking +
edit-distance verify + connected-components entity ids.

Entity resolution over dirty master data (names with typos, OCR
slips, inconsistent keying) at corpus scale needs the same two-phase
shape as the near-dup family in ``operators/dedup.py``: a cheap
BLOCKING pass that bounds the candidate universe, then an exact
verify only on candidates. The blocker here is the deletion
neighborhood of FastSS (Bocek et al. 2007, "Fast Similarity Search in
Large Dictionaries" — the SymSpell family): every string emits itself
plus its ``len`` single-character-deletion variants as block keys,
and two strings within Levenshtein distance 1 ALWAYS share a key —

* substitution at position i: deleting position i from both sides
  yields the same string;
* insertion/deletion: the shorter string IS a deletion variant of the
  longer (and is its own key).

So candidates ⊇ all true d≤1 pairs (completeness — proven at test
time by comparing against the brute-force O(n²) oracle, which is also
what the registered query's DuckDB oracle runs), and the exact
``levenshtein ≤ 1`` filter removes the false positives the shared-key
join lets through. No distance metric is ever approximated — the
blocker only prunes.

Scale notes (100 TB): the explode is O(L·n) rows of (key, id, name)
— L = name length, the same fan-out budget as the MinHash band
explode; one shuffle on the key; bucket sizes are bounded by true
near-key density, not by a vocabulary (every bucket member shares a
specific deleted form). The verify join touches candidates only. For
d ≤ 2 the same construction uses the 2-deletion neighborhood (O(L²/2)
keys per string) — supported via ``max_ops=2`` but not the default:
key fan-out is the price of completeness, and production dedup at
d ≥ 2 usually switches to the MinHash/SimHash family instead.

``entity_clusters`` closes the verified pairs into entity ids with
the same min-label connected components the near-dup family uses
(``operators/cluster.py``) — transitive closure is what turns
pairwise matches into a keyable entity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(name: Column, max_ops: int = 1) -> Column:
    """The deletion neighborhood of ``name`` as a distinct string
    array: the string itself plus every way of removing up to
    ``max_ops`` characters. Pure column expression — no shuffle, no
    Python."""
    if max_ops not in (1, 2):
        raise ValueError(f"max_ops must be 1 or 2, got {max_ops}")

    def dels(col: Column) -> Column:
        # one array element per deleted position; empty string → []
        return F.transform(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.length(col), F.lit(1))),
                lambda i: i <= F.length(col),
            ),
            lambda i: F.concat(
                F.substr(col, F.lit(1), i - F.lit(1)),
                F.substr(col, i + F.lit(1), F.length(col)),
            ),
        )

    out = F.concat(F.array(name), dels(name))
    if max_ops == 2:
        out = F.concat(out, F.flatten(F.transform(dels(name), dels)))
    return F.array_distinct(out)


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` (1 or 2):
    (id_a, id_b, name_a, name_b, dist) with id_a < id_b.

    Exact result (blocking is complete — module docstring), produced
    as: explode deletion keys as narrow (id, key) rows — names do NOT
    ride the key shuffle, which would copy each name ``len+1`` times
    through the join (measured ~2x the whole query) → self-join on key
    with id_a < id_b → distinct id pairs (strings whose keys collide
    many times — zero runs, repeated chars — candidate once, not once
    per shared key) → attach each side's name with an equi join →
    ``levenshtein ≤ max_dist``.
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.explode(deletion_variants(F.col(name_col), max_ops=max_dist)).alias("__key"),
    )
    cand = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    names = df.select(F.col(id_col).alias("__id"), F.col(name_col).alias("__name"))
    return (
        cand.join(names.withColumnsRenamed({"__id": "id_a", "__name": "name_a"}), "id_a")
        .join(names.withColumnsRenamed({"__id": "id_b", "__name": "name_b"}), "id_b")
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def entity_clusters(pairs: DataFrame) -> DataFrame:
    """Entity ids from verified match pairs: transitive closure via
    min-label connected components (operators/cluster.py). Returns
    (node, component, cluster_size) — every id that matched anything,
    labeled with its entity's minimum id."""
    from spotify_app_etl_spark.operators.cluster import dedup_clusters

    return dedup_clusters(pairs.select("id_a", "id_b"))

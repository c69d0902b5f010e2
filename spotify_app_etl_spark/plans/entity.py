"""Entity-resolution queries: blocked fuzzy matching + entity closure
(operators/fuzzy.py).

Reference parity: none — master-data/entity-resolution surface on top
of the reference ETL, same family as the near-dup operators.

The ORACLES here are deliberately the brute-force O(n²) definition
(DuckDB can afford it at sf0.01), while the Spark side runs the
deletion-neighborhood blocked plan — so every driver check is also a
machine-checked proof that the blocking is COMPLETE, not just fast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.operators import fuzzy as FZ
from spotify_app_etl_spark.plans.common import t
from spotify_app_etl_spark.registry import query


@query(
    "q_fuzzy_match_customers",
    note="blocked fuzzy self-match over customer names "
    "(operators/fuzzy.py): FastSS deletion-neighborhood blocking "
    "(explode ≤ len+1 keys/name, one shuffle on the key) + exact "
    "levenshtein ≤ 1 verify on candidates only. The oracle is the "
    "BRUTE-FORCE all-pairs definition, so a hash match proves the "
    "blocking lost no pair (completeness), not just that the verify "
    "filter agrees.",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
    tags=("entity", "fuzzy", "join"),
)
def q_fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return FZ.fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1).withColumn(
        "dist", F.col("dist").cast("bigint")
    )


@query(
    "q_fuzzy_entity_clusters",
    note="entity ids from fuzzy matches: a 1-in-3 customer subset "
    "(custkey % 3 = 0 — non-empty at every test sf, unlike a nation "
    "slice) is matched at levenshtein ≤ 1 (same blocked plan as "
    "q_fuzzy_match_customers) and the verified pairs are closed into "
    "entities via min-label connected components "
    "(operators/cluster.py, one shuffle/round). Oracle: brute-force "
    "pairs + recursive-CTE fixpoint — the same closure proof shape as "
    "ns_dedup_clusters, over an independently-derived edge set.",
    oracle="""
WITH RECURSIVE cust AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
), pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM cust a JOIN cust b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, lab) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node
), cc AS (
  SELECT node, MIN(lab) AS component FROM reach GROUP BY node
)
SELECT node, component,
       COUNT(*) OVER (PARTITION BY component) AS cluster_size
FROM cc
""",
    tags=("entity", "fuzzy", "cluster"),
)
def q_fuzzy_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    pairs = FZ.fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1)
    return FZ.entity_clusters(pairs)


@query(
    "q_fuzzy_match_part_names",
    note="dictionary fuzzy matching at edit distance ≤ 2 — FastSS's "
    "native use case: the DISTINCT part-name vocabulary (bounded by "
    "the name dictionary, ~64 names at every sf, NOT by corpus rows) "
    "is self-matched with the 2-deletion neighborhood. Matching "
    "distinct names first is also the degenerate-bucket doctrine from "
    "the near-dup family: matching the raw rows would put every "
    "same-name group (hundreds of rows per name at sf0.1) into every "
    "shared key bucket — exact-dedup BEFORE fuzzy, always. Oracle is "
    "the brute-force all-pairs definition (completeness proof, d=2).",
    oracle="""
WITH d AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM d a JOIN d b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",
    tags=("entity", "fuzzy", "join"),
)
def q_fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = t(spark, sf_dir, "part").select("p_name").distinct()
    pairs = FZ.fuzzy_pairs(
        names.withColumn("__nid", F.col("p_name")), "__nid", "p_name", max_dist=2
    )
    return pairs.select(
        F.col("name_a"), F.col("name_b"), F.col("dist").cast("bigint").alias("dist")
    )


@query(
    "q_graph_triangles",
    note="triangle enumeration (operators/graph.triangles) over the "
    "levenshtein≤1 similarity graph of the 1-in-3 customer subset — "
    "the same verified edge set q_fuzzy_entity_clusters closes into "
    "entities. Degree-ordered orientation (Schank-Wagner forward "
    "algorithm): out-degrees are bounded by O(√m), so the wedge join "
    "cannot blow up on hub nodes the way an id-ordered 3-way "
    "self-join does; all equi-joins, three shuffles. Oracle is the "
    "plain a<b<c 3-way join definition — same triangle set, "
    "independently derived.",
    oracle="""
WITH cust AS (
  SELECT c_custkey AS k, c_name AS n FROM customer WHERE c_custkey % 3 = 0
), e AS (
  SELECT a.k AS u, b.k AS v
  FROM cust a JOIN cust b ON a.k < b.k AND levenshtein(a.n, b.n) <= 1
)
SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
""",
    tags=("entity", "graph", "join"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.graph import triangles

    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    pairs = FZ.fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1)
    return triangles(pairs, src="id_a", dst="id_b")


def _pagerank_oracle(rounds: int = 15, damping: float = 0.85) -> str:
    """Unrolled power iteration as a DuckDB WITH chain: fixed-rounds
    PageRank is deterministic given the edge set, so each of the
    ``rounds`` steps is one CTE computing the next rank vector from the
    previous (same dangling-mass redistribution convention as
    operators/graph.pagerank). Both sides round to 9 dp BEFORE the
    order-by so an engine-level float wobble at 1e-12 can't reorder
    near-ties across the LIMIT cut."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f""",
dm{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(p.rank), 0.0) AS dm
  FROM r{i - 1} p LEFT JOIN outdeg o ON o.src = p.node
  WHERE o.src IS NULL
),
r{i} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {damping}) / nn.n
         + {damping} * (COALESCE(c.in_share, 0.0) + dm{i}.dm / nn.n) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.rank / o.outdeg) AS in_share
    FROM e JOIN r{i - 1} p ON e.src = p.node JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
  CROSS JOIN nn CROSS JOIN dm{i}
)""")
    return (
        """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
        + "".join(steps)
        + f"""
SELECT node, round(rank, 9) AS rank,
       (SELECT ABS(SUM(rank) - 1.0) < 1e-6 FROM r{rounds}) AS mass_ok,
       CAST({rounds} AS BIGINT) AS pr_rounds
FROM r{rounds}
ORDER BY round(rank, 9) DESC, node
LIMIT 100
"""
    )


@query(
    "ns_graph_pagerank",
    note="distributed PageRank (operators/graph.py) over the "
    "customer→supplier purchase graph (distinct o_custkey → l_suppkey "
    "edges; 2n/2n+1 node encoding keeps the two key spaces disjoint). "
    "Suppliers have no out-edges, so the dangling-mass redistribution "
    "path is genuinely exercised every round. Fixed-rounds power "
    "iteration is deterministic, so since r07 the DuckDB oracle "
    "replays all 15 rounds as an unrolled WITH chain (hash-green, not "
    "rows-only); both sides round to 9 dp BEFORE the order-by so "
    "float wobble can't reorder near-ties across the LIMIT cut. "
    "mass_ok additionally asserts total rank mass ≈ 1 and pr_rounds "
    "records the iteration budget (GraphX-style fixed_rounds mode: "
    "one driver scalar per round, no per-round delta action — power "
    "iteration converges at rate damping^k, so a tol-mode run costs "
    "~5x the rounds for digits the ranking doesn't need). Output "
    "bounded to the top-100 ranks via distributed TakeOrdered.",
    oracle=_pagerank_oracle(),
    tags=("northstar", "graph", "rank"),
)
def ns_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.graph import pagerank

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    ranks, rounds = pagerank(edges, fixed_rounds=15)
    mass = ranks.agg(
        (F.abs(F.sum("rank") - 1.0) < 1e-6).alias("mass_ok")
    )
    # round BEFORE the order-by: the oracle replays the same 15 rounds
    # in DuckDB and two nodes differing at 1e-12 must not order-swap
    # across the LIMIT cut between engines
    return (
        ranks.select("node", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(100)
        .crossJoin(F.broadcast(mass))
        .withColumn("pr_rounds", F.lit(rounds).cast("bigint"))
    )

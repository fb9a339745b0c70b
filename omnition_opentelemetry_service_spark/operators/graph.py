"""Connected components over candidate-pair edges — the cluster-collapse
step between "verified near-dup pairs" (dedup.py) and a dedup keep-list:
pairs (a,b),(b,c) must collapse to ONE keeper, not two independent drops.

Spark-first shape: iterative min-label propagation entirely in DataFrame
ops (symmetrized edges → per-node neighbor-min join → least(old, new)),
converging in O(diameter) rounds with one shuffle per round and a cheap
count() action as the fixed-point test. Near-dup graphs have tiny
components (pairs/triples — diameter ≤ ~3), so 2-3 rounds suffice; for
adversarially long chains the O(log n) large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
is the drop-in replacement — same edge-list interface.

The DuckDB oracle (tests/test_graph_components.py) computes the same
fixed point via a recursive CTE, so the per-node component labels are
value-verified cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25) -> DataFrame:
    """(id, comp) for every node in ``edges``; comp = MIN node id reachable.

    One hash exchange per round (the groupBy on src); the label table is
    persisted per round and the previous round's cache released, so memory
    stays one label-table wide no matter how many rounds run. Raises if the
    fixed point isn't reached in ``max_iter`` rounds (a near-dup graph that
    deep means the candidate generator is broken — fail loudly, don't ship
    half-merged components).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    labels.count()  # materialize the seed so each round builds on a cache

    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"),
                        F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels
    labels.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the near-dup envelope; use star "
        "contraction for deep graphs")


def components_sql_duck(edges_cte: str) -> str:
    """Recursive-CTE oracle: min reachable id per node over ``edges_cte``
    (a CTE body producing columns id_a, id_b)."""
    return f"""
    WITH RECURSIVE edges AS ({edges_cte}),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION
      SELECT id_b AS u, id_a AS v FROM edges
    ),
    reach(id, comp) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.comp FROM sym s JOIN reach r ON s.v = r.id
    )
    SELECT id, min(comp) AS comp FROM reach GROUP BY id
    """


def near_dup_keep_list(docs: DataFrame, verified_pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """The full cluster-collapse dedup: every doc keeps a row with its
    component's keeper (the MIN doc id in its near-dup cluster; singleton
    docs keep themselves). Downstream filters `keep = true` — exactly one
    survivor per cluster no matter how many pairwise edges the cluster has.

    Shape at scale: components run over the (small) verified-pair edge
    list only; the corpus-sized side is a single left join against the
    label table — broadcastable whenever near-dups are a small corpus
    fraction (the normal case).

    Cache lifecycle is CALLER-owned (same contract as dedup.py): the label
    table the result consumes stays persisted; release via
    registry.release_caches / clearCache after the consuming action.
    """
    comp = connected_components(verified_pairs)
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("keeper"),
        )
        .withColumn("keep", F.col(id_col) == F.col("keeper"))
    )

"""Connected components over similarity edges → dedup keep/drop decisions.

Near-dup detection yields PAIRS; an actual dedup must partition documents
into equivalence classes and keep one canonical representative per class
(duplicates are transitive: A~B, B~C ⇒ {A,B,C} is one cluster even if A~C
was never emitted as a pair).

``connected_components`` is iterative min-label propagation — the standard
large-graph approach without a graph library: every vertex repeatedly adopts
the smallest label among itself and its neighbors; converges in O(diameter)
rounds. Near-dup graphs have tiny components (pairs/triples), so 3-5 rounds
close almost everything; ``max_iter`` bounds the worst case and each round is
two shuffles (edge join + min-aggregate). Lineage is truncated per round
(localCheckpoint) so plans don't grow unboundedly — the Spark-iterative
footgun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(id, component) — component = min vertex id reachable via edges.

    ``vertices``: one row per id (isolated vertices form their own
    singleton components). ``edges``: undirected pairs.
    """
    # Lazy checkpoints: lineage still truncates (the first job over the
    # frame materializes the RDD), but no separate synchronous job per
    # frame — each iteration's consistency-check count doubles as the
    # materializer. Measured ~1 job/iteration saved; on the tiny graphs
    # near-dup pipelines produce, fixed per-job overhead IS the cost.
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["d"] == labels["v"])
            .groupBy("s")
            .agg(F.min("component").alias("n_min"))
        )
        propagated = labels.join(
            neighbor_min, labels["v"] == neighbor_min["s"], "left"
        ).select(
            "v",
            F.least(
                F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping (path compression): adopt the label OF my label —
        # halves path lengths each round, so chains converge in O(log n)
        # rounds instead of O(n)
        lx = propagated.alias("x")
        ly = propagated.select(
            F.col("v").alias("rep"), F.col("component").alias("rep_component")
        )
        updated = (
            lx.join(ly, F.col("x.component") == ly["rep"], "left")
            .select(
                F.col("x.v").alias("v"),
                F.least(
                    F.col("x.component"),
                    F.coalesce(F.col("rep_component"), F.col("x.component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        labels = updated
        # Definitive termination: labels are final iff every edge connects
        # same-labeled endpoints. (Each label is always the id of a vertex
        # in the same component; the component's min-id vertex keeps its own
        # id under least(); so all-edges-consistent forces every label in a
        # component to equal label(min) = min.) Unlike a did-anything-change
        # check — which can never fire before round 2, because round 1
        # always moves labels off their init — this fires after round 1 on
        # any diameter the round already closed, halving the rounds for the
        # tiny components near-dup graphs produce.
        ls = labels.select(F.col("v").alias("s"), F.col("component").alias("cs"))
        ld = labels.select(F.col("v").alias("d"), F.col("component").alias("cd"))
        inconsistent = (
            sym.join(ls, "s")
            .join(ld, "d")
            .filter(F.col("cs") != F.col("cd"))
            .limit(1)
            .count()
        )
        if inconsistent == 0:
            break
    return labels.select(F.col("v").alias(id_col), "component")


def keep_one_per_cluster(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Dedup decision table: (id, component, is_kept) — the minimum id of
    each near-dup cluster survives; singletons keep themselves."""
    comps = connected_components(
        docs.select(id_col), dup_pairs, id_col=id_col, src_col=src_col, dst_col=dst_col
    )
    return comps.select(
        id_col,
        "component",
        (F.col(id_col) == F.col("component")).alias("is_kept"),
    )

"""Iterative graph operators on DataFrames: connected components.

Near-duplicate pairs form *clusters* (A~B, B~C ⇒ {A,B,C} even when A~C
fails the threshold). Proper dedup keeps exactly one representative per
connected component — the drop-every-id2 rule used by simple pipelines is
conservative (it can drop an entire chain). Connected components is the
canonical iterative-algorithm-on-DataFrames pattern:

- label propagation: every vertex starts labeled with itself; each round
  every vertex takes the min label in its neighborhood; converges in
  O(component diameter) rounds (near-dup clusters: 2-4).
- each round is one self-join + groupBy-min — pure DataFrame ops.
- ``localCheckpoint`` every round truncates the lineage, which otherwise
  grows linearly and blows up Catalyst analysis at iteration 10+ (the
  classic iterative-Spark trap).
- the convergence check (one ``count`` per round) is the only driver
  round-trip.

At 100 TB-scale graphs the same loop holds; production systems switch to
the large-star/small-star variant (fewer rounds on high-diameter graphs),
which this implementation's loop structure accommodates directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-label connected components -> (id, component).

    ``edges``: undirected pairs (each pair listed once is enough).
    ``vertices``: optional full vertex set — isolated vertices (no edges)
    come back as their own singleton component. Deterministic: the
    component id is the minimum vertex id in the component.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: every iteration joins sym, and without this the
        # whole upstream (e.g. a shingle-posting self-join producing the
        # near-dup edges) would re-execute per round
        .localCheckpoint()
    )
    verts = sym.select(F.col("a").alias("id")).distinct()
    if vertices is not None:
        verts = vertices.select(F.col(vertices.columns[0]).alias("id")).unionByName(verts).distinct()

    labels = verts.withColumn("component", F.col("id")).localCheckpoint()
    for _ in range(max_iterations):
        # neighborhood minimum: each vertex adopts min(own, neighbors')
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "component"
                ),
                (F.col("nmin") < F.col("component")).alias("__changed"),
            )
        ).localCheckpoint()  # truncate lineage every round
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels

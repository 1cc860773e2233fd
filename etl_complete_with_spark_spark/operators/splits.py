"""Leakage-safe dataset splitting for training corpora.

The classic train/val/test leak: two near-duplicate documents land in
different splits, so the eval set "contains" training data. Hashing the
doc id avoids order-dependence but not near-dup leakage — the split unit
must be the NEAR-DUP CLUSTER, not the document.

``cluster_aware_split`` composes the pieces this repo already proves
correct: near-dup pairs (MinHash/Jaccard — caller's choice) -> connected
components (`operators/graph.py`) -> one deterministic md5-derived split
per COMPONENT, inherited by every member. By construction no near-dup
pair can straddle a split boundary (property-tested), and the assignment
is bit-reproducible across engines, partitionings and reruns — no RNG,
no order-dependence, so the whole thing replays as SQL for an exact
oracle (recursive-CTE closure + the same md5 bucket).

Scale: the only new work over the components themselves is one hash
projection and a broadcast-free per-doc map — components dominate, and
those are the O(log n)-round star variant at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

SPLIT_SEED = 17


def split_bucket(component: Column, seed: int = SPLIT_SEED) -> Column:
    """Deterministic bucket 0..99 for a component id."""
    return md5_hash60(component.cast("string"), seed) % 100


def split_label(
    bucket: Column, train_pct: int = 90, val_pct: int = 5
) -> Column:
    """Bucket -> 'train' / 'val' / 'test' (defaults 90/5/5)."""
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def cluster_aware_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    seed: int = SPLIT_SEED,
    train_pct: int = 90,
    val_pct: int = 5,
    use_star: bool = False,
) -> DataFrame:
    """-> (id_col, component, split) with whole near-dup clusters assigned
    to one split.

    ``pairs`` is any symmetric-intent near-dup pair set (id1, id2);
    singleton documents (no pair) form their own component and hash
    independently. ``use_star`` selects the large-star/small-star
    component algorithm for high-diameter graphs."""
    from .graph import connected_components, connected_components_star

    cc = connected_components_star if use_star else connected_components
    vertices = docs.select(F.col(id_col).alias("id"))
    comp = cc(pairs.select("id1", "id2"), vertices=vertices)
    bucket = split_bucket(F.col("component"), seed)
    return comp.select(
        F.col("id").alias(id_col),
        "component",
        split_label(bucket, train_pct, val_pct).alias("split"),
    )

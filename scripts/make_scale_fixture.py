"""Build a larger-SF correctness fixture from the driver's sf0.1 testdata.

r12 VERDICT order 7 asks for a one-shot oracle sweep at sf0.25-0.5 to
extend the correctness contracts' proven range beyond the provided
sf{0.001,0.01,0.1} dirs. The driver's generator is not available, so
this derives a bigger corpus from the LARGEST provided SF by key-offset
union: N full copies of every sf0.1 table plus one fractional copy
(primary-key-parity filter), with every integer key column shifted by a
per-copy offset far above the original key range so copies never
collide. The provided testdata is never modified (read-only input); the
fixture lands inside the repo (gitignored) and exists only to be swept
by scripts/oracle_check.py — Spark and DuckDB read the SAME parquet, so
parity remains a meaningful end-to-end check at 2.5-5x the bench SF.

Semantics notes:
- region/nation are fixed dimensions: copied verbatim, never scaled.
- FK columns shift by the SAME offset as the referenced table's PK, so
  join density per copy matches sf0.1 exactly (the fractional copy
  filters fact and dimension on the same orderkey/custkey parity, which
  leaves some dangling FKs — harmless for parity, both engines see the
  identical bytes, and the DQ orphan queries COUNT orphans either way).
- embeddings get a deterministic per-copy perturbation on element 0
  (+i * 1e-3) so copies are not bit-identical vectors: exact-duplicate
  embeddings would create cosine top-k ties that no tie-break contract
  can order (equal scores, distinct ids, both engines correct under
  different orders).
- documents/text duplicate exactly across copies BY DESIGN: a 2.5x
  corpus where every doc has 2-3 exact twins is an adversarially
  dup-heavy input for the dedup family, and every dedup contract is
  deterministic under duplication (min-id keep rules, exact pair math).

Usage::

    python scripts/make_scale_fixture.py [sf_target] [out_dir]
    # defaults: 0.25  <repo>/tmp_scale_fixture/sf0.25
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SRC_SF = 0.1

# per-table: {key column -> per-copy offset}; frac-filter key first
KEY_OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
VERBATIM = ["region", "nation"]


def _offset_copy(t: pa.Table, offsets: dict[str, int], i: int) -> pa.Table:
    if i == 0:
        return t
    for col, off in offsets.items():
        idx = t.column_names.index(col)
        typ = t.schema.field(col).type
        shifted = pc.cast(pc.add(t[col], pa.scalar(off * i, type=typ)), typ)
        t = t.set_column(idx, t.schema.field(col), shifted)
    return t


def _perturb_embeddings(t: pa.Table, i: int) -> pa.Table:
    """Deterministic per-copy nudge on element 0 so no two copies hold
    bit-identical vectors (cosine top-k tie hazard, see module doc)."""
    if i == 0:
        return t
    emb = t["embedding"].combine_chunks()
    values = emb.values.to_numpy(zero_copy_only=False).copy()
    starts = emb.offsets.to_numpy(zero_copy_only=False)
    # element 0 of every list: positions offsets[:-1] (non-empty lists)
    first = starts[:-1][starts[:-1] < starts[1:]]
    values[first] += i * 1e-3
    new = pa.ListArray.from_arrays(emb.offsets, pa.array(values, type=pa.float32()))
    idx = t.column_names.index("embedding")
    return t.set_column(idx, t.schema.field("embedding"), new)


def build(sf_target: float, out_dir: str) -> None:
    ratio = sf_target / SRC_SF
    copies = math.floor(ratio)
    frac = ratio - copies
    os.makedirs(out_dir, exist_ok=True)
    for name in VERBATIM:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (verbatim)")
    for name, offsets in KEY_OFFSETS.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        frac_key = next(iter(offsets))
        parts = []
        for i in range(copies):
            c = _offset_copy(t, offsets, i)
            if name == "embeddings":
                c = _perturb_embeddings(c, i)
            parts.append(c)
        if frac > 0:
            # deterministic fraction: keep keys with key % q < p where
            # p/q ~ frac (q=2 covers the 0.5 case; generalize via 1000)
            p = round(frac * 1000)
            keys = t[frac_key].combine_chunks().to_numpy(zero_copy_only=False)
            sel = pa.array((keys % 1000) < p)
            c = _offset_copy(t.filter(sel), offsets, copies)
            if name == "embeddings":
                c = _perturb_embeddings(c, copies)
            parts.append(c)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows "
              f"({copies} full + {frac:.2f} frac)")


def main() -> None:
    sf_target = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "tmp_scale_fixture", f"sf{sf_target}")
    )
    build(sf_target, out_dir)
    print(f"fixture: {out_dir}")


if __name__ == "__main__":
    main()

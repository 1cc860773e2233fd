"""Z-order layout: Morton code correctness + real file-skipping benefit."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.layout import (
    equiwidth_bucket,
    morton_code,
    zorder_write,
)
from etl_complete_with_spark_spark.queries import load


def _interleave_py(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def _col_spans(path_glob: str, col: str) -> list[int]:
    """Per-file (max - min) footer-statistic span for ``col``."""
    spans = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
        spans.append(hi - lo)
    return spans


class TestMortonCode:
    def test_matches_python_interleave(self, spark):
        rows = [(x, y) for x in (0, 1, 5, 511, 1023) for y in (0, 2, 7, 1000)]
        df = spark.createDataFrame(rows, "x long, y long").withColumn(
            "z", morton_code([F.col("x"), F.col("y")], 10)
        )
        for r in df.collect():
            assert r.z == _interleave_py(r.x, r.y)

    def test_overflow_guard(self, spark):
        import pytest

        with pytest.raises(ValueError):
            morton_code([F.lit(1)] * 7, bits=10)  # 70 bits > signed bigint


class TestZorderWrite:
    def test_both_columns_prune_after_zorder(self, spark, sf_dir, tmp_path):
        """Z-ordered files must have tight spans on BOTH cluster columns;
        a user_id-sorted write is the degenerate comparison: perfect on
        user_id, no better than random on the hour column. Both raw
        columns are quantized to a common 8x8 grid first — unequal bit
        resolution degenerates Z-order to a single-column sort."""
        raw = load(spark, sf_dir, "events").select(
            "event_id",
            F.col("user_id").alias("x"),
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("y"),
        )
        bx = raw.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).first()
        ev = raw.select(
            "event_id",
            "x",
            "y",
            equiwidth_bucket(F.col("x"), bx[0], bx[1], 8).alias("xb"),
            equiwidth_bucket(F.col("y"), bx[2], bx[3], 8).alias("yb"),
        )
        n_files = 8
        zpath = str(tmp_path / "zorder")
        spath = str(tmp_path / "single")
        zorder_write(ev, zpath, [F.col("xb"), F.col("yb")], bits=3, num_files=n_files)
        (
            ev.repartitionByRange(n_files, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(spath)
        )
        full_x = ev.agg(F.max("x") - F.min("x")).first()[0]
        full_y = ev.agg(F.max("y") - F.min("y")).first()[0]
        zx = _col_spans(f"{zpath}/part-*.parquet", "x")
        zy = _col_spans(f"{zpath}/part-*.parquet", "y")
        sy = _col_spans(f"{spath}/part-*.parquet", "y")
        # single-column sort leaves y unclustered: every file spans ~all of y
        assert sum(sy) / len(sy) > 0.8 * full_y
        # zorder: every file's span is a strict subset on BOTH dimensions
        assert sum(zx) / len(zx) < 0.6 * full_x
        assert sum(zy) / len(zy) < 0.6 * full_y

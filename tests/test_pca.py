"""PCA / Gram-matrix operator tests (operators/pca.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators import pca as P
from etl_complete_with_spark_spark.queries import load


class TestGramInt8:
    def test_matches_numpy_brute_force(self, spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        rows = emb.select(F.col("embedding").cast("array<double>").alias("v")).collect()
        M = np.stack([np.asarray(r.v) for r in rows])
        scale = np.abs(M).max(axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            Q = np.floor(M * 127 / scale)
        Q = np.where(scale > 0, Q, 0.0).astype(np.int64)
        expected = Q.T @ Q

        got = P.gram_int8(emb).collect()
        assert len(got) == expected.shape[0] * expected.shape[1]
        for r in got:
            assert r.g == expected[r.i - 1, r.j - 1]

    def test_symmetry_and_psd_diagonal(self, spark, sf_dir):
        g = P.gram_int8(load(spark, sf_dir, "embeddings"))
        gt = g.select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("g").alias("g_t")
        )
        asym = g.join(gt, ["i", "j"]).filter(F.col("g") != F.col("g_t")).count()
        assert asym == 0
        neg_diag = g.filter((F.col("i") == F.col("j")) & (F.col("g") < 0)).count()
        assert neg_diag == 0

    def test_partitioning_invariance(self, spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        a = {(r.i, r.j): r.g for r in P.gram_int8(emb).collect()}
        b = {(r.i, r.j): r.g for r in P.gram_int8(emb.repartition(7)).collect()}
        assert a == b


class TestPca:
    def test_components_orthonormal_and_sorted(self, spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        _, comps, vars_ = P.pca_components(emb, k=8)
        C = np.asarray(comps)
        assert np.allclose(C @ C.T, np.eye(8), atol=1e-8)
        assert all(vars_[i] >= vars_[i + 1] - 1e-12 for i in range(len(vars_) - 1))

    def test_projection_variance_matches_eigenvalues(self, spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        mean, comps, vars_ = P.pca_components(emb, k=4)
        proj = P.pca_project(emb, k=4, components=comps, mean=mean).collect()
        Y = np.stack([np.asarray(r.proj) for r in proj])
        got = Y.var(axis=0)  # population variance, matches covariance_matrix
        assert np.allclose(got, vars_, rtol=1e-6)

    def test_full_rank_projection_preserves_distances(self, spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        n_dim = len(emb.select("embedding").first()[0])
        mean, comps, _ = P.pca_components(emb, k=n_dim)
        proj = {
            r.id: np.asarray(r.proj)
            for r in P.pca_project(
                emb, k=n_dim, components=comps, mean=mean
            ).collect()
        }
        orig = {
            r.vec_id: np.asarray(r.v)
            for r in emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            ).collect()
        }
        ids = sorted(orig)[:20]
        for a in ids[:5]:
            for b in ids:
                if a == b:
                    continue
                d_orig = float(np.linalg.norm(orig[a] - orig[b]))
                d_proj = float(np.linalg.norm(proj[a] - proj[b]))
                assert math.isclose(d_orig, d_proj, rel_tol=1e-8)

    def test_covariance_empty_input_raises(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            P.covariance_matrix(df)

"""Multimodal column plumbing tests (schema/batching real, codecs stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return MM.synthesize_media_table(spark, docs).cache()


class TestMediaTable:
    def test_schema_contract(self, media):
        assert dict(media.dtypes)["payload"] == "binary"
        meta_fields = {f.name for f in media.schema["meta"].dataType.fields}
        assert meta_fields == {"media_type", "format", "width", "height", "duration_ms", "n_bytes"}

    def test_payload_bytes_match_meta(self, media):
        bad = media.filter(F.length("payload") != F.col("meta.n_bytes")).count()
        assert bad == 0


class TestFeatures:
    def test_feature_extraction_shape_and_determinism(self, spark, media):
        out = MM.extract_features(media)
        rows = out.orderBy("media_id").limit(3).collect()
        assert all(len(r.feature) == MM.FEATURE_DIM for r in rows)
        rows2 = MM.extract_features(media).orderBy("media_id").limit(3).collect()
        assert [r.feature for r in rows] == [r.feature for r in rows2]

    def test_features_feed_similarity_ops(self, spark, media):
        from etl_complete_with_spark_spark.operators.similarity import cosine_topk

        feats = MM.extract_features(media).withColumnRenamed("feature", "embedding") \
            .withColumnRenamed("media_id", "vec_id")
        queries = feats.filter("vec_id < 2")
        out = cosine_topk(feats, queries, k=3)
        assert out.count() == 6  # 2 queries x top-3

    def test_custom_decoder_plugs_in(self, spark, media):
        out = MM.extract_features(media, decoder=lambda p: [float(len(p or b""))])
        r = out.first()
        assert r.feature == [float(r.n_bytes)]


class TestStubbedCodecs:
    def test_resize_without_codec_raises_lazily(self, spark, media):
        df = MM.resize_images(media, 64, 64)  # plan builds fine
        with pytest.raises(Exception, match="NotImplementedError|codec not available"):
            df.count()

    def test_resize_with_codec(self, spark, media):
        out = MM.resize_images(media.limit(5), 4, 4, resizer=lambda p, w, h: p[: w * h])
        assert out.count() == 5
        assert all(len(r.payload) <= 16 for r in out.collect())

    def test_frame_sampling_fanout(self, spark, media):
        out = MM.sample_frames(media.limit(3), every_ms=1000)
        rows = out.collect()
        assert len(rows) >= 3  # >= one frame per video
        per_id = {}
        for r in rows:
            per_id.setdefault(r.media_id, []).append(r.frame_idx)
        assert all(sorted(v) == list(range(len(v))) for v in per_id.values())


class TestArrowTwin:
    def test_mapinarrow_identical_to_mapinpandas(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators import multimodal as MM
        from etl_complete_with_spark_spark.queries import load

        docs = load(spark, sf_dir, "documents").limit(100)
        media = MM.synthesize_media_table(spark, docs)
        a = MM.extract_features(media).orderBy("media_id").collect()
        b = MM.extract_features_arrow(media).orderBy("media_id").collect()
        assert len(a) == len(b) > 0
        for ra, rb in zip(a, b):
            assert ra.media_id == rb.media_id and ra.n_bytes == rb.n_bytes
            assert ra.feature == rb.feature  # float32 values, bit-identical

"""Multimodal (image/audio/video) column plumbing.

North-star surface (BASELINE.json): treat media as opaque ``binary``
columns with a typed metadata struct, and run decode / feature-extract /
resize / frame-sample as Arrow-batched Pandas functions over
``mapInPandas``. The Spark-side plumbing — schema contract, partition
sizing, batch iteration, UDF signatures — is real and tested; the actual
codec calls are STUBBED (``decoder=None`` -> deterministic fake features;
a real deployment passes e.g. a Pillow/torchaudio-backed decoder), since
no media libraries exist in this image.

Scale notes (100 TB of media):
- Binary payloads ride in parquet binary columns; ``MEDIA_PARTITION_BYTES``
  documents the knob that keeps scan partitions ~media-row sized
  (``spark.sql.files.maxPartitionBytes``) so one task never holds tens of
  GB of frames.
- All media functions are ``mapInPandas`` (streaming iterator of Arrow
  batches): per-batch memory is bounded regardless of partition size, and
  rows never round-trip through the driver.
- Feature vectors come back as ``array<float>`` ready for the
  similarity/dedup operators (embedding_neardup_pairs, cosine_topk).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Document the scan-partition knob for media tables (see module docstring).
MEDIA_PARTITION_BYTES = 64 * 1024 * 1024

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def synthesize_media_table(spark, documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic fake media corpus from the documents table: payload =
    utf-8 text bytes, metadata derived from sizes. Stands in for a real
    media scan so the downstream plumbing is exercised end-to-end."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            (F.length("text") % 1024 + 1).cast("int").alias("width"),
            (F.length("text") % 768 + 1).cast("int").alias("height"),
            (F.length("text").cast("long") * 10).alias("duration_ms"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decode -> feature extraction (mapInPandas)
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = "media_id long, n_bytes long, feature array<float>"

FEATURE_DIM = 8


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for codec+model features: byte-histogram
    moments folded into FEATURE_DIM buckets. Replace with a real decoder
    (`decoder=`) in production — the contract is payload -> list[float]."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] += b
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """payload -> fixed-dim feature vector, batch-streamed via mapInPandas.

    ``decoder=None`` uses the deterministic fake (no media libs in this
    image); pass a real ``bytes -> list[float]`` for actual decoding. The
    iterator contract keeps peak memory at one Arrow batch per task
    regardless of partition size.
    """
    fn = decoder or _fake_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(fn),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def extract_features_arrow(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """`extract_features` on raw Arrow RecordBatches (mapInArrow) — skips
    the Arrow<->pandas conversion entirely, the right boundary for binary
    payloads: pandas wraps each payload in a Python object column (copy +
    boxing), while Arrow hands the buffer over zero-copy. Identical
    output (asserted in tests); prefer this variant when per-batch work
    is cheap relative to conversion, the pandas one when the decoder
    wants DataFrame ergonomics."""
    import pyarrow as pa

    fn = decoder or _fake_decode_features

    def run(batches):
        for batch in batches:
            media_id = batch.column(0)
            payloads = batch.column(1).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    media_id,
                    pa.array(
                        [0 if p is None else len(p) for p in payloads], pa.int64()
                    ),
                    pa.array([fn(p) for p in payloads], pa.list_(pa.float32())),
                ],
                names=["media_id", "n_bytes", "feature"],
            )

    return media.select("media_id", "payload").mapInArrow(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize / frame-sample stubs (same mapInPandas shape, codec stubbed)
# ---------------------------------------------------------------------------

def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize over mapInPandas. With no ``resizer`` the codec step
    raises NotImplementedError per row *lazily at execution* — the plan,
    schema and batching are real; only the pixel work is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "image codec not available in this image; pass resizer="
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(lambda p: resizer(p, width, height)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, "media_id long, payload binary")


def sample_frames(
    media: DataFrame,
    every_ms: int,
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode-
    style fan-out inside the Pandas iterator, so a 2-hour video never
    materializes as a single row downstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids: list[Any] = []
            out_idx: list[int] = []
            out_frames: list[bytes] = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if sampler is None:
                    # deterministic stub: one pseudo-frame per interval,
                    # sliced from the payload bytes
                    n = max(int(dur // every_ms), 1) if dur else 1
                    frames = [
                        payload[i : i + 16] if payload else b"" for i in range(0, 16 * n, 16)
                    ]
                else:
                    frames = sampler(payload, every_ms)
                out_ids.extend([mid] * len(frames))
                out_idx.extend(range(len(frames)))
                out_frames.extend(frames)
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return media.select("media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")).mapInPandas(
        run, "media_id long, frame_idx int, frame binary"
    )

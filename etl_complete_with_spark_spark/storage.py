"""Bucket/prefix lifecycle (SURVEY §2.10-D11) + batched log upload (K3).

Rebuilds the reference's object-storage machinery
(cloud_utils.py:96-373: bucket_exists / create_gcp_bucket /
create_mgc_bucket / clear_dataset_inside_bucket_* /
clear_current_bucket_or_create_a_new_bucket / build_bucket_name) behind
one small backend protocol:

- ``LocalBucketStore`` — directory-per-bucket on any local/posix path;
  fully functional, used by tests and the default lake.
- ``S3BucketStore`` / ``GcsBucketStore`` — import-gated (boto3 /
  google-cloud-storage are not in this image); same method surface, so a
  production deployment swaps backends without touching callers.

Name normalization preserved from the reference (cloud_utils.py:17,
155-169): the work-zone bucket is ``{prefix}{namespace}`` with ``_``
mapped to ``-`` (S3-compatible stores reject underscores).

The reference re-uploaded the whole log file on *every* message
(cloud_utils.py:68-93) — here ``LogUploader.flush`` uploads once, and
callers decide cadence (end-of-slice / end-of-run).
"""

from __future__ import annotations

import os
import shutil
from typing import Protocol

WORK_BUCKET_PREFIX = "prd-lake-work-"  # reference cloud_utils.py:17


def build_bucket_name(namespace: str, prefix: str = WORK_BUCKET_PREFIX) -> str:
    """``{prefix}{namespace}`` with ``_`` -> ``-`` (cloud_utils.py:155-169)."""
    return f"{prefix}{namespace}".replace("_", "-")


class BucketStore(Protocol):
    def bucket_exists(self, bucket: str) -> bool: ...
    def create_bucket(self, bucket: str) -> None: ...
    def clear_prefix(self, bucket: str, prefix: str) -> int: ...
    def upload(self, bucket: str, key: str, local_path: str) -> None: ...
    def download_json(self, bucket: str, key: str) -> dict | None: ...


class LocalBucketStore:
    """Directory-per-bucket store — the default, zero-dependency backend."""

    def __init__(self, root: str):
        self.root = root

    def _bucket_path(self, bucket: str) -> str:
        return os.path.join(self.root, bucket)

    def bucket_exists(self, bucket: str) -> bool:
        return os.path.isdir(self._bucket_path(bucket))

    def create_bucket(self, bucket: str) -> None:
        os.makedirs(self._bucket_path(bucket), exist_ok=True)

    def clear_prefix(self, bucket: str, prefix: str) -> int:
        """Delete every object under prefix; returns count removed
        (clear_dataset_inside_bucket_*, cloud_utils.py:172-247)."""
        base = os.path.join(self._bucket_path(bucket), prefix)
        if not os.path.exists(base):
            return 0
        n = sum(len(files) for _, _, files in os.walk(base))
        shutil.rmtree(base)
        return n

    def ensure_clear_bucket(self, bucket: str, prefix: str) -> None:
        """clear-or-create (cloud_utils.py:315-373): make the landing zone
        exist and be empty for this dataset."""
        if self.bucket_exists(bucket):
            self.clear_prefix(bucket, prefix)
        else:
            self.create_bucket(bucket)

    def upload(self, bucket: str, key: str, local_path: str) -> None:
        dest = os.path.join(self._bucket_path(bucket), key)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(local_path, dest)

    def download_json(self, bucket: str, key: str) -> dict | None:
        """Schema-registry style JSON fetch (S10; cloud_utils.py:387-435):
        None on miss, never raises."""
        import json

        path = os.path.join(self._bucket_path(bucket), key)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


class S3BucketStore:  # pragma: no cover - boto3 not in this image
    """S3-compatible backend (reference "mgc" path, cloud_utils.py:126-152);
    mirrors LocalBucketStore's surface via boto3."""

    def __init__(self, endpoint_url: str | None = None, region: str = "us-east-1"):
        try:
            import boto3  # type: ignore
        except ImportError as exc:
            raise ImportError("S3BucketStore requires boto3 (not in this image)") from exc
        self.client = boto3.session.Session().client("s3", endpoint_url=endpoint_url)
        self.region = region

    def bucket_exists(self, bucket: str) -> bool:
        try:
            self.client.head_bucket(Bucket=bucket)
            return True
        except Exception:
            return False

    def create_bucket(self, bucket: str) -> None:
        self.client.create_bucket(Bucket=bucket)

    def clear_prefix(self, bucket: str, prefix: str) -> int:
        n = 0
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            keys = [{"Key": o["Key"]} for o in page.get("Contents", [])]
            if keys:
                self.client.delete_objects(Bucket=bucket, Delete={"Objects": keys})
                n += len(keys)
        return n

    def upload(self, bucket: str, key: str, local_path: str) -> None:
        self.client.upload_file(local_path, bucket, key)

    def download_json(self, bucket: str, key: str) -> dict | None:
        import json

        try:
            body = self.client.get_object(Bucket=bucket, Key=key)["Body"].read()
            return json.loads(body)
        except Exception:
            return None


class GcsBucketStore:  # pragma: no cover - google-cloud-storage not in image
    """GCS backend (reference gcp path, cloud_utils.py:96-123; bucket
    region us-east1 preserved as the default)."""

    def __init__(self, region: str = "us-east1"):
        try:
            from google.cloud import storage  # type: ignore
        except ImportError as exc:
            raise ImportError("GcsBucketStore requires google-cloud-storage") from exc
        self.client = storage.Client()
        self.region = region

    def bucket_exists(self, bucket: str) -> bool:
        return self.client.lookup_bucket(bucket) is not None

    def create_bucket(self, bucket: str) -> None:
        self.client.create_bucket(bucket, location=self.region)

    def clear_prefix(self, bucket: str, prefix: str) -> int:
        blobs = list(self.client.list_blobs(bucket, prefix=prefix))
        for b in blobs:
            b.delete()
        return len(blobs)

    def upload(self, bucket: str, key: str, local_path: str) -> None:
        self.client.bucket(bucket).blob(key).upload_from_filename(local_path)

    def download_json(self, bucket: str, key: str) -> dict | None:
        import json

        blob = self.client.bucket(bucket).get_blob(key)
        return json.loads(blob.download_as_bytes()) if blob else None


class LogUploader:
    """Batched log mirroring (K3). The reference uploaded the full file per
    message (cloud_utils.py:86-88); here the caller flushes at slice/run
    boundaries — same observability, O(1) uploads per unit of work."""

    def __init__(self, store: BucketStore, bucket: str, key: str, local_path: str):
        self.store = store
        self.bucket = bucket
        self.key = key
        self.local_path = local_path

    def flush(self) -> None:
        if os.path.exists(self.local_path):
            self.store.upload(self.bucket, self.key, self.local_path)

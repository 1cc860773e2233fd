"""Schema registry with reflection fallback (SURVEY §1.3, §2.1-S8/S10).

Resolution order, matching the reference (shared_etls/etls/utils.py:50-183):

1. **Registry**: a JSON file ``{namespace}_{dataset}.json`` holding a
   ``StructType.json()`` document (the reference fetched these from fixed
   "witcher" bucket paths, utils.py:73-84; here the registry root is any
   local/remote directory — on a cluster, an object-store prefix).
2. **Reflection**: the TRUSTED-zone table's own schema, round-tripped
   through JSON exactly like utils.py:126-135.
3. **None**: let the source infer (JDBC metadata / Mongo sampling).

``StructType.fromJson`` handles arbitrary nesting (struct/array/map), so
Mongo document schemas need no special casing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from .lake import Lake


class SchemaRegistry:
    def __init__(self, root: str):
        self.root = root

    def _path(self, namespace: str, dataset: str) -> str:
        return os.path.join(self.root, f"{namespace}_{dataset}.json")

    def get(self, namespace: str, dataset: str) -> StructType | None:
        """Registry lookup (utils.py:50-93): None on miss, never raises."""
        path = self._path(namespace, dataset)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return StructType.fromJson(json.load(f))

    def put(self, namespace: str, dataset: str, schema: StructType) -> str:
        os.makedirs(self.root, exist_ok=True)
        path = self._path(namespace, dataset)
        with open(path, "w") as f:
            json.dump(schema.jsonValue(), f, indent=2)
        return path

    def resolve(
        self,
        spark: SparkSession,
        namespace: str,
        dataset: str,
        lake: Lake | None = None,
    ) -> StructType | None:
        """Registry -> TRUSTED reflection -> None (utils.py:143-183)."""
        schema = self.get(namespace, dataset)
        if schema is not None:
            return schema
        if lake is not None:
            try:
                reflected = lake.trusted_schema(spark, namespace, dataset)
            except FileNotFoundError:
                return None
            # round-trip through JSON like the reference (utils.py:126-135)
            return StructType.fromJson(json.loads(reflected.json()))
        return None

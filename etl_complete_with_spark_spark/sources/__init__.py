"""Sources: sliceable readers with bound probes (SURVEY §2.1).

All sources implement the same small protocol so the resync pipeline is
source-agnostic:

- ``read_slice(spark, interval) -> DataFrame``  (one half-open slice)
- ``read_range(spark, intervals) -> DataFrame`` (whole window, parallel)
- ``probe_min(spark) / probe_max(spark)``       (partition-column bounds)
"""

from .parquet import ParquetSource
from .jdbc import JdbcSource
from .mongodb import MongoSource, MongoTwinSource

__all__ = ["ParquetSource", "JdbcSource", "MongoSource", "MongoTwinSource"]

"""etl_complete_with_spark_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference repo
``GustavoSantanaData/ETL-Complete-With-Spark`` (surveyed in SURVEY.md),
re-expressed Spark-first:

- medallion lake (WORK append zone / TRUSTED merged zone) over Parquet
- partition-column sliced extraction from JDBC / MongoDB / Parquet sources
  with pushdown probes, chunk heuristics, and resumable watermark recovery
- the composite transform chain: surrogate key -> batch timestamp ->
  date-quality null-out -> dedup-by-key -> merge upsert
- beyond the reference: large-scale training-data operators (exact +
  MinHash-LSH + SimHash dedup, ANN similarity search, text analysis,
  multimodal binary columns) designed for 100 TB scale.

Everything is plain ``pyspark.sql`` — the logical plan is declared with the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"

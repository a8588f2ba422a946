"""PySpark-native analytics engine with the capabilities of
``undef1nd/etl-orders-to-bq`` (reference read-only at /root/reference),
re-expressed Spark-first and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Layout
------
- ``session``    SparkSession factory tuned for scale (AQE, Arrow, broadcast)
- ``schemas``    explicit StructTypes for reference inputs + testdata tables
- ``sources``    CSV (all-string read convention) and Parquet sources
- ``sinks``      Parquet/CSV local sinks + BigQuery connector (import-gated)
- ``functions``  pure Column functions: repair/cast, name cleaning, text, vectors
- ``operators``  dedup (first-occurrence/exact/minhash/simhash), similarity, ANN
- ``pipeline``   OrdersEtl facade mirroring the reference's 3 entry points
- ``streaming``  Structured Streaming over event streams (watermark + windows)
- ``multimodal`` binary-column plumbing (decode stubs, mapInPandas batching)
"""

__version__ = "0.1.0"

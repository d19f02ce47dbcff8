"""ubparquet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NuTufts/ubparquet, re-expressed Spark-first.

Subpackages
-----------
- ``session``    SparkSession builder tuned for the engine (AQE, Arrow, UTC).
- ``io``         Parquet sources/sinks (multi-file scan, mergeSchema, manifests).
- ``codec``      Ragged-tensor flatten+shape encoding (reference
                 ``root2parquet.py:72-80`` / ``readparquet.py:25-31``).
- ``operators``  Relational / voxel / spatial / sampling operators
                 (SURVEY.md §2 inventory).
- ``functions``  Text analysis, dedup (exact/MinHash/SimHash), similarity
                 search, array/element-wise helpers.
- ``plans``      End-to-end query plans over the driver's synthetic tables
                 (TPC-H-ish star schema, events, documents, embeddings).
- ``streaming``  Structured Streaming window/watermark helpers over ``events``.
"""

__version__ = "0.1.0"

"""multimodal_vector_db_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference multimodal vector
database (``dhruvd-1/Multimodal_Vector_DB``).

Architecture is idiomatic Spark: the corpus is a modality-partitioned
DataFrame of ``(id, modality, space, embedding ARRAY<FLOAT>, metadata...)``
rows; every reference operator is re-expressed as a declarative
DataFrame/SQL plan so Catalyst supplies predicate pushdown, column
pruning, partition pruning and join selection for free.

Subpackages
-----------
functions   pure Column-expression helpers (vector math, text analysis)
operators   relational operators (kNN join, top-k, metrics, dedup, ANN,
            quantization, rerank, pooling)
sources     scans and sinks (wiki parser, corpus builder, parquet storage)
embedders   the embedding UDF registry (deterministic fake + gated real)
streaming   Structured Streaming ingest and windowed aggregation
multimodal  binary-column (image/audio/video) plumbing over mapInPandas
"""

__version__ = "0.1.0"

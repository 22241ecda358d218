"""Multimodal content handling: image/audio/video as opaque ``BINARY``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages (SURVEY §2.1 S5-S7, §2.8 M3-M5 plumbing).

The decode step itself (PIL/cv2/librosa) is stubbed — those libraries
are not in this container — but everything Spark-side is real and
tested: schemas, batch iteration, partition-parallel execution, and a
deterministic fake feature extractor whose output is oracle-checkable.
"""

from multimodal_vector_db_spark.multimodal.pipeline import (
    MEDIA_SCHEMA,
    FEATURE_SCHEMA,
    extract_features,
    media_items_from_documents,
    sample_frame_plan,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "extract_features",
    "media_items_from_documents",
    "sample_frame_plan",
]

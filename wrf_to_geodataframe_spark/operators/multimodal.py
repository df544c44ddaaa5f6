"""Multimodal column plumbing (brief north-star): images/audio/video as
opaque ``binary`` columns with typed metadata, processed in Arrow
batches via ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a stub
(``NotImplementedError`` behind ``decode=True``); everything around it —
schema, Arrow batch shape, partitioning, the vectorized feature kernel —
is real and tested.  A deterministic fake payload (md5 bytes of the
document text) stands in for real media so the pipeline is exercisable
end-to-end.

At scale: binary payloads ride the normal columnar path (parquet BYTE_ARRAY,
Arrow Binary); ``mapInPandas`` keeps one Python worker per core fed with
batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
per-batch memory for large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("byte_sum", LongType()),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata to each
    document (md5 digest bytes as the stand-in "image")."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        (F.lit(16) + F.col("doc_id") % 5).cast("long").alias("width"),
        (F.lit(16) + F.col("doc_id") % 7).cast("long").alias("height"),
    )


def extract_features(with_payload: DataFrame, decode: bool = False) -> DataFrame:
    """Vectorized per-batch feature extraction over the binary column.

    ``decode=False`` computes byte-level features (length, first byte,
    byte sum) with numpy over the Arrow batch — the shape a real decoder
    (pillow/ffmpeg) would slot into.  ``decode=True`` is the stubbed
    real-decoder path."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if decode:
            raise NotImplementedError(
                "media decoding needs an image/audio codec (pillow/ffmpeg), "
                "not available in this container; byte-level features only"
            )
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int64"),
                    "byte_sum": payloads.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                    ).astype("int64"),
                }
            )

    return with_payload.mapInPandas(_batches, FEATURE_SCHEMA)

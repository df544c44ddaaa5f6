"""Streaming document chunking — the ingest-time mirror of the batch
``suite/pipeline.chunk_documents`` gate (VERDICT r10 item 8): documents
arrive as a stream (a landing directory the crawler appends parquet
files to) and fan out into the overlapping RAG token windows the
embedding stage consumes, BEFORE they ever land as a batch table.

The transform is the batch gate's own ``chunk_tokens`` (shared helper —
the curate_clean discipline, so window/stride/tail semantics cannot
drift): pure codegen array HOFs, one per-row explode, no shuffle, no
state — the ideal streaming operator shape.  Every micro-batch is
embarrassingly parallel; at 100 TB/day the chunker's throughput is the
parquet scan's.

Stream==batch equivalence, including a second availableNow pass over
appended files, is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wrf_to_geodataframe_spark.suite.pipeline import chunk_tokens

DOCS_SCHEMA = "doc_id long, text string"


def stream_chunk_documents(
    spark: SparkSession,
    src_dir: str,
    w: int = 32,
    s: int = 24,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (doc_id, chunk_start, n_tokens, chunk_text) over a
    parquet landing directory.  Append-only output (stateless
    transform), so any sink mode works; pair with ``.trigger(
    availableNow=True)`` for catch-up runs or a processing-time
    trigger for continuous ingest."""
    r = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    docs = r.parquet(src_dir)
    return chunk_tokens(docs, w=w, s=s)

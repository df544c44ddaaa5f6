"""Text-analysis column builders for the LLM-data-pipeline operators.

Everything is built-in-function Spark (JVM-side, codegen-friendly) — no
Python UDFs in any hot path.  Hash parity across engines comes from md5:
``hash60(s)`` = the first 15 hex digits of md5 as a BIGINT, identical in
Spark (``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(s),1,15) AS BIGINT)``), so MinHash/LSH results
are bit-reproducible against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# words treated as stopwords by the quality scorer (deliberately tiny and
# engine-agnostic; a real deployment would broadcast a language-specific list)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for"]


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string, engine-portable
    (md5-derived; see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space convention of the documents table)."""
    return F.split(text, " ")


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles as an array column — the unit of
    near-duplicate detection (MinHash/Jaccard both consume these)."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        )
    )


def exploded_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) inverted-index rows — the scale-out layout: a
    self-equi-join on ``s`` is the candidate generator for near-dup
    detection (no all-pairs comparison ever materializes)."""
    return docs.select(
        "doc_id", F.explode(shingles(F.col("text"), k)).alias("s")
    )

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


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles from a token-array column — the
    unit of near-duplicate detection (MinHash/Jaccard both consume
    these).

    The token argument is LET-BOUND through the engine's single-element
    ``transform(array(x), v -> body)`` idiom (r18; the meteo.py r17
    let-binding): when callers pass ``tokens(text)`` directly — or when
    filter pushdown re-inlines a shingle-derived predicate below the
    projection that materialized the array (observed in the curate
    chain: the pushed filter re-ran split(text) once per shingle
    element, O(words^2) per doc, in the 1-split scan stage) — the bound
    lambda variable still evaluates the tokenizer exactly once per
    row."""
    def _body(tk: Column) -> Column:
        ngrams = F.transform(
            F.sequence(F.lit(0), F.size(tk) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, i + j + 1) for j in range(k)]
            ),
        )
        # documents with fewer than k tokens have NO k-shingles
        # (matching the oracle's generate_series(1, len-k+1), which is
        # empty for len < k) — without the guard a padded
        # pseudo-shingle of the whole short doc would silently diverge
        # from the oracle on sub-k documents
        return F.array_distinct(
            F.when(F.size(tk) >= k, ngrams).otherwise(
                F.array().cast("array<string>")
            )
        )

    return F.element_at(F.transform(F.array(toks), _body), 1)


def exploded_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) inverted-index rows — the scale-out layout: a
    self-equi-join on ``s`` is the candidate generator for near-dup
    detection (no all-pairs comparison ever materializes)."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("toks"), k)).alias("s")
    )

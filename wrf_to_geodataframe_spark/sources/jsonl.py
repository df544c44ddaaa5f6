"""JSONL document-corpus source — the standard interchange format for
LLM training-data pipelines (one JSON object per line, schema-on-read).

Design rules for scale:
- ALWAYS pass an explicit schema: schema inference reads the data twice
  and infers from a sample, so a rare field silently disappears at
  100 TB.  The explicit schema also keeps the scan a single pass.
- PERMISSIVE mode + a corrupt-record column: malformed lines (truncated
  uploads, encoding garbage) land in ``_corrupt_record`` instead of
  failing the job or being silently dropped; the caller splits the
  frame into clean/quarantine streams and keeps both.
- JSONL splits by line, so one file parallelizes across tasks — unlike
  a single JSON array, which is one record and one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus with quarantine capture.  Returns the full
    frame including ``_corrupt_record`` (NULL for clean rows)."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): rows that parsed vs raw lines that didn't.
    Spark disallows queries that reference ONLY the internal corrupt
    column of a raw JSON scan (SPARK-21610); the documented workaround
    is to cache the parsed frame first, which also means the corpus is
    scanned once for both output streams."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine

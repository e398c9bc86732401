"""Document chunking as a Python UDTF (SURVEY.md §2.10 UDTF surface):
one input doc row expands to N fixed-size token chunks — the standard
pre-tokenization step for LLM training-context assembly.

UDTFs are the right tool when one row yields a variable number of rows
with computed columns; for this simple fixed-split an `explode` over
`sequence` would also work JVM-side, but the UDTF form generalizes to
tokenizer-aware chunking (sentence boundaries, overlap, special
tokens) that SQL can't express."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

CHUNK_SCHEMA = "chunk_idx INT, chunk_text STRING, n_tokens INT"


@udtf(returnType=CHUNK_SCHEMA)
class ChunkDocument:
    """Split whitespace tokens into fixed-size chunks."""

    def eval(self, text: str, size: int):  # noqa: D102
        if text is None:
            return
        words = text.split()
        for start in range(0, len(words), size):
            chunk = words[start:start + size]
            yield start // size, " ".join(chunk), len(chunk)


def chunk_documents(
    spark: SparkSession, docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id", size: int = 50,
) -> DataFrame:
    """doc rows -> (doc_id, chunk_idx, chunk_text, n_tokens) via a
    LATERAL UDTF join. Rows stream through Python in batches; chunk
    state is per-row, so the operator parallelizes trivially."""
    spark.udtf.register("chunk_document", ChunkDocument)
    docs.select(id_col, text_col).createOrReplaceTempView("__docs_to_chunk")
    return spark.sql(f"""
        SELECT {id_col}, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM __docs_to_chunk, LATERAL chunk_document({text_col}, {size}) c
    """)

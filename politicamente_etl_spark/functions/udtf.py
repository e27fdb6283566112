"""Python UDTFs (Spark 4 user-defined table functions).

These are the SQL-LATERAL ergonomic twins of existing expression-path
operators — registered so a SQL-first user can write

    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_text(d.text, 128, 96) c

without touching the DataFrame API. The EXPRESSION implementations
(`text.chunk_documents` etc.) remain the hot path: a UDTF runs Python
per input row, so it sits on the slow side of the UDF hierarchy
(codegen'd expressions ≫ Arrow-batched pandas ≫ per-row Python). The
value here is surface completeness and semantics parity, which the tests
pin by comparing UDTF output against the expression operator row-for-row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_chunk_tokens bigint, chunk_text string")
class ChunkText:
    """Context-window chunking, semantics identical to
    `text.chunk_documents`: chunk k covers tokens [k·stride, k·stride +
    window); chunk count = 1 + ceil(max(0, n − window)/stride); a short
    doc yields exactly one (possibly short) chunk."""

    def eval(self, text: str, window: int = 128, stride: int = 96):
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 + max(0, (max(n - window, 0) + stride - 1) // stride)
        for k in range(n_chunks):
            ctoks = toks[k * stride : k * stride + window]
            yield k, len(ctoks), " ".join(ctoks)


def register_udtfs(spark) -> None:
    """Register every UDTF on the session's SQL surface (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)

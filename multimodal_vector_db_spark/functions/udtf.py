"""Python UDTFs (SURVEY §2.12): the table-function escape hatch for
row→rows expansions that outgrow higher-order array functions.

The relational chunker (`operators/text_pipeline.py:chunk_documents`,
sequence/slice/posexplode — no Python, no shuffle) is the production
path; `ChunkUDTF` exposes the same semantics as a SQL-callable table
function (`SELECT ... FROM src, LATERAL chunk_udtf(src.text)`) for
callers that need imperative per-row logic. Registered UDTFs run
Arrow-batched on the workers; keep them out of hot paths.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_WINDOW, CHUNK_STRIDE = 8, 6


class ChunkImpl:
    """Same semantics as chunk_documents(window=8, stride=6): starts
    every STRIDE tokens while start < len (one empty chunk for empty
    text), window may run short at the end."""

    def eval(self, text: str):
        toks = [t for t in (text or "").lower().split() if t]
        for chunk_no, st in enumerate(
            range(0, max(len(toks), 1), CHUNK_STRIDE)
        ):
            piece = toks[st : st + CHUNK_WINDOW]
            yield chunk_no, len(piece), " ".join(piece)


ChunkUDTF = udtf(
    ChunkImpl, returnType="chunk_id: long, n_tokens: long, chunk: string"
)

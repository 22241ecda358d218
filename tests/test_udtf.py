"""§2.12 UDTF surface: the SQL-callable chunking table function must
agree with the relational chunker (the production path)."""

from __future__ import annotations

from multimodal_vector_db_spark.functions.udtf import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    ChunkImpl,
    ChunkUDTF,
)


def test_chunk_udtf_matches_relational_chunker(spark, documents):
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.text_pipeline import (
        chunk_documents,
    )

    docs = documents.where(F.col("doc_id") < 40).select("doc_id", "text")
    want = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            docs, window=CHUNK_WINDOW, stride=CHUNK_STRIDE
        ).collect()
    }

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    docs.createOrReplaceTempView("chunk_src")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in spark.sql(
            "SELECT s.doc_id, c.chunk_id, c.n_tokens, c.chunk "
            "FROM chunk_src s, LATERAL chunk_udtf(s.text) c"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_chunk_udtf_semantics_standalone():
    chunks = list(ChunkImpl().eval("a b c d e f g h i j"))
    assert chunks[0] == (0, 8, "a b c d e f g h")
    assert chunks[1] == (1, 4, "g h i j")
    assert list(ChunkImpl().eval("")) == [(0, 0, "")]

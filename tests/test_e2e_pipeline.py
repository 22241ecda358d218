"""End-to-end build lifecycle test — the full §3.3 flow the reference's
build_cross_modal_index.py runs, hermetically: scan documents →
fake-embed per space → unified corpus → partitioned save → load →
cross-modal search with routing → IR-metric evaluation. One test class
of the whole engine working together.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.knn import knn_join
from multimodal_vector_db_spark.operators.metrics import (
    evaluate_rankings,
    rankings_from_knn,
)
from multimodal_vector_db_spark.sources.corpus import (
    active,
    build_items_from_documents,
)
from multimodal_vector_db_spark.sources.storage import CorpusStorage

SF_DIR = "/root/testdata/sf0.001"


def test_full_build_search_evaluate_cycle(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    items = build_items_from_documents(docs, dim=64)

    # 1. build: unified corpus has all modalities, unit-norm embeddings
    assert set(r["modality"] for r in items.select("modality").distinct().collect()) == {
        "image", "video", "audio", "text"
    }
    norms = items.select(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sq")
    ).agg(F.min("sq"), F.max("sq")).first()
    assert abs(norms[0] - 1.0) < 1e-5 and abs(norms[1] - 1.0) < 1e-5

    # 2. save partitioned / load back (S8/S9)
    store = CorpusStorage(str(tmp_path / "wh"))
    store.save_index(
        items, "unified", manifest={"dimension": 64}, partition_by=["modality"]
    )
    loaded, manifest = store.load_index(spark, "unified")
    assert manifest["dimension"] == 64
    assert loaded.count() == docs.count()

    # 3. search: self-query within the CLIP space must return itself
    corpus = active(loaded).where(F.col("space") == "clip")
    sample = corpus.limit(3).select("id", "embedding").collect()
    queries = spark.createDataFrame(
        [(r["id"], r["embedding"]) for r in sample],
        "query_id LONG, q_emb ARRAY<DOUBLE>",
    )
    knn = knn_join(
        corpus.select("id", "embedding"), queries, k=5
    )
    top1 = {r["query_id"]: r["id"] for r in knn.where(F.col("rank") == 1).collect()}
    assert top1 == {r["id"]: r["id"] for r in sample}  # self-recall

    # 4. evaluate: perfect self-retrieval → recall@5 of the self-item = 1
    retrieved = rankings_from_knn(knn)
    relevant = queries.select(
        "query_id", F.array(F.col("query_id")).alias("relevant")
    )
    metrics = evaluate_rankings(retrieved.join(relevant, on="query_id"), k=5)
    rows = metrics.collect()
    assert all(r["recall"] == 1.0 for r in rows)
    assert all(r["ndcg"] == 1.0 for r in rows)  # hit at rank 1

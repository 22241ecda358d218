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


def test_multimodal_training_funnel_invariants(spark):
    """The capstone funnel: per-stage survivor counts are monotone
    non-increasing in docs/tokens/sources, every stage row is present
    exactly once, and the terminal stage respects the TOTAL
    temperature-quota budget (round 8: Hamilton apportionment of
    _FUNNEL_BUDGET docs across surviving sources)."""
    from multimodal_vector_db_spark.queries.m13_funnel import (
        _FUNNEL_BUDGET,
        _STAGES,
        q_multimodal_training_pipeline,
    )

    rows = sorted(
        q_multimodal_training_pipeline(spark, SF_DIR).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == _STAGES
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
        assert cur["n_tokens"] <= prev["n_tokens"]
        assert cur["n_sources"] <= prev["n_sources"]
    first, last = rows[0], rows[-1]
    assert first["n_docs"] == 200  # full ingest at this sf
    assert last["n_docs"] > 0  # the funnel doesn't drain the corpus
    # Hamilton quotas sum exactly to the budget; sources can run out
    # of docs before exhausting their quota, so <= not ==
    assert last["n_docs"] <= _FUNNEL_BUDGET
    # the media dedup stages must actually bite (mod-40 facet groups)
    by_name = {r["stage_name"]: r for r in rows}
    assert by_name["image_near_dedup"]["n_docs"] < by_name["text_exact_dedup"]["n_docs"]
    assert by_name["budget_mix"]["n_docs"] < by_name["clip_score_gate"]["n_docs"]

"""Quickstart: the end-to-end user journey of the engine.

Mirrors the reference's demo flow (ingest → search → cross-modal
compare → delete → save/load → stats) plus the training-data pipeline
this engine adds on top (dedup → quality → shard packing → ANN).

Run:  python examples/quickstart.py  [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from multimodal_vector_db_spark.engine import MultiModalSearchEngine  # noqa: E402
from multimodal_vector_db_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("quickstart")

    # 1. Ingest mixed-modality content (hermetic fake embedder: real
    #    CLIP/CLAP plug in via the same embed_fn hook when available).
    eng = MultiModalSearchEngine(spark, dim=64)
    eng.batch_ingest(
        [
            {"content": "a red fox jumps over the lazy dog", "modality": "text"},
            {"content": "golden retriever playing fetch", "modality": "text"},
            {"content": "fox_photo.jpg", "modality": "image"},
            {"content": "dog_bark.wav", "modality": "audio"},
            {"content": "city traffic at night", "modality": "video"},
        ]
    )

    # 2. Search — space-aware: text queries score only CLIP-space rows.
    print("== text search: 'fox' ==")
    for r in eng.search("fox", k=3):
        print(f"  #{r['id']} {r['display_name']} sim={r['sim']:.4f}")

    # 2b. Batch search — one job amortized over every query (above the
    #     rows×dim threshold this dispatches to the blocked BLAS scorer
    #     automatically; the reference's batch_search loops per query).
    print("== batch search ==")
    for qi, hits in eng.search_batch(["fox", "dog playing"], k=2).items():
        print(f"  q{qi}: {[r['display_name'] for r in hits]}")

    # 3. The reference's signature cross-modal comparison, as ONE plan.
    print("== cross-modal compare: 'dog' ==")
    eng.compare_modalities("dog", k_per_modality=1).show(truncate=False)

    # 4. Soft delete is honored by every later search.
    eng.remove([1])
    assert all(r["id"] != 1 for r in eng.search("dog", k=5))

    # 5. Save → load round-trip (partitioned parquet + JSON manifest).
    with tempfile.TemporaryDirectory() as d:
        eng.save(d)
        eng2 = MultiModalSearchEngine.load(spark, d)
        print("== stats after reload ==")
        print(eng2.get_stats())

    # 6. The training-data side: curate the documents table.
    from multimodal_vector_db_spark.functions import text as X
    from multimodal_vector_db_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from multimodal_vector_db_spark.operators.packing import pack_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    near_dups = minhash_lsh_candidates(
        docs, num_hashes=8, bands=4, hash_impl="xxhash64"
    )
    print(f"== near-duplicate candidate pairs: {near_dups.count()} ==")

    shards = (
        pack_shards(
            docs.select(
                "doc_id",
                F.md5(F.col("doc_id").cast("string")).alias("ord"),
                X.token_count("text").alias("n_tokens"),
            ),
            "n_tokens",
            budget=20000,
            order_cols=["ord", "doc_id"],
        )
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tokens"))
        .orderBy("shard_id")
    )
    print("== training shards (~20k tokens each) ==")
    shards.show()

    # 7. Vector search over the embeddings table: exact, then through a
    #    materialized IVF index (build once, query many).
    from multimodal_vector_db_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    print("== exact kNN (2 queries, top-3) ==")
    knn_join(corpus, qs, k=3).show()

    from multimodal_vector_db_spark.operators.ann import (
        build_ivf_index,
        ivf_search,
        open_ivf_index,
    )

    with tempfile.TemporaryDirectory() as d:
        build_ivf_index(corpus, f"{d}/ivf", n_clusters=4)
        index, centroids = open_ivf_index(spark, f"{d}/ivf")
        qvecs = [
            (int(r["query_id"]), [float(x) for x in r["q_emb"]])
            for r in qs.collect()
        ]
        print("== IVF ANN (nprobe=2 of 4 cells) ==")
        ivf_search(
            index, qvecs, centroids, k=3, nprobe=2, probe_metric="l2"
        ).show()

    # 8. Train a Matryoshka-style projection (distributed PCA — one
    #    mapInPandas moment pass, driver eigh) and search in the
    #    truncatable 8-d prefix space.
    from multimodal_vector_db_spark.operators.projection_training import (
        fit_pca_components,
        pca_project,
    )

    mean, W = fit_pca_components(corpus, "embedding", k=16)
    proj = pca_project(
        corpus, "embedding", mean, W, out_col="embedding8", prefix_dim=8
    ).select("id", F.col("embedding8").alias("embedding"))
    q8 = pca_project(
        qs, "q_emb", mean, W, out_col="q8", prefix_dim=8
    ).select("query_id", F.col("q8").alias("q_emb"))
    print("== kNN in the trained 8-d Matryoshka prefix space ==")
    knn_join(proj, q8, k=3).show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

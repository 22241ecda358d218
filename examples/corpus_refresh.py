"""Corpus refresh: the recurring curation cycle of a large training
set, end-to-end on the synthetic tables.

Flow: sign the historical corpus ONCE (MinHash index) → dedup a new
ingest batch against it without re-reading history → cut cross-doc
duplicated spans inside the survivors → assign leakage-safe
train/val/test splits (near-dup clusters never straddle the boundary)
→ semantic-dedup the embedding side (blocked BLAS form) → flag
per-label outliers → mine contrastive training pairs.

Run:  python examples/corpus_refresh.py  [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from multimodal_vector_db_spark.operators.contrastive import (  # noqa: E402
    mine_contrastive_pairs,
)
from multimodal_vector_db_spark.operators.dedup import (  # noqa: E402
    incremental_near_duplicates,
    leakage_safe_split,
    minhash_band_index,
    ngram_jaccard_pairs,
    remove_duplicated_spans,
    semantic_dedup_blocked,
)
from multimodal_vector_db_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("corpus_refresh")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. History vs incoming batch. In production the band index is
    #    persisted ONCE, bucketed on band_key (write_minhash_band_index)
    #    so the history side joins with no Exchange; xxhash64 is the
    #    production basis. (The streaming-native form of this loop is
    #    streaming/ingest.py:corpus_refresh_stream.)
    hist = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    idx = minhash_band_index(hist, hash_impl="xxhash64")

    flagged = incremental_near_duplicates(batch, idx, hash_impl="xxhash64")
    n_batch = flagged.count()
    n_dup = flagged.where("is_dup").count()
    print(f"== incremental dedup: {n_dup}/{n_batch} batch docs "
          "near-duplicate history ==")

    # 2. Survivors join the corpus; span-level dedup cuts the
    #    cross-document duplicated 8-gram runs inside each text.
    survivors = batch.join(
        flagged.where(~F.col("is_dup")).select("doc_id"), "doc_id"
    )
    corpus = hist.unionByName(survivors)
    cleaned = remove_duplicated_spans(corpus)
    cut = cleaned.agg(
        F.sum(F.col("n_tokens") - F.col("kept_tokens")).alias("cut")
    ).first()["cut"]
    print(f"== span dedup: {cut} duplicated tokens cut in-plan ==")

    # 3. Leakage-safe splits: hash the near-dup CLUSTER, not the doc.
    pairs = ngram_jaccard_pairs(
        corpus, block_col="lang", threshold=0.03, max_block_rows=None
    )
    splits = leakage_safe_split(corpus, pairs)
    print("== splits (cluster-hashed) ==")
    splits.groupBy("split").count().orderBy("split").show()

    # 4. Embedding side: SemDeDup via the blocked BLAS serving form.
    cents = [
        r["embedding"] for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    sem = semantic_dedup_blocked(emb, cents, threshold=0.95)
    print(f"== semantic dedup: kept {sem.where('kept').count()} "
          f"of {sem.count()} vectors ==")

    # 4b. MEDIA modality (round 6): the same refresh loop for images —
    #     decode real binary media ONCE, dedup the ingest batch against
    #     a persisted band-sliced fingerprint index (historical media
    #     bytes never re-read). Streaming-native form:
    #     streaming/ingest.py:media_refresh_stream.
    from multimodal_vector_db_spark.multimodal.phash import (
        band_slices,
        image_dhash,
        incremental_near_dup_images,
    )
    from multimodal_vector_db_spark.queries.m12_curation4 import (
        _phash_media,
    )

    media = _phash_media(docs.where(F.col("doc_id") < 200))
    m_hist = media.where(F.col("doc_id") < 100)
    m_batch = media.where(F.col("doc_id") >= 100)
    m_idx = band_slices(image_dhash(m_hist), 56, 4)
    m_dups = incremental_near_dup_images(
        image_dhash(m_batch), m_idx, max_hamming=1
    )
    print(
        f"== image refresh: {m_dups.select('batch_id').distinct().count()}"
        f"/{m_batch.count()} batch images near-duplicate history =="
    )

    # 5. Contrastive pairs for the embedding-model refresh.
    anchors = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    mined = mine_contrastive_pairs(
        emb, anchors, k_negatives=3, k_positives=2, id_col="vec_id"
    )
    print("== contrastive pairs ==")
    mined.groupBy("pair_type").count().orderBy("pair_type").show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

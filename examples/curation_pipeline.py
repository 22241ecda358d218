"""End-to-end training-data curation pipeline on the synthetic tables
— the FineWeb/CCNet-style funnel, each stage an operator from this
repo, each survivor count printed so the funnel is auditable.

Stages:
  1. language ID gate            (functions/text: stopword heuristic)
  2. ensemble quality gate       (heuristic quality + bigram-LM ppl,
                                  z-standardized composite)
  3. trained NB quality filter   (operators/classifier — GPT-3-style
                                  "looks like the trusted corpus")
  4. cross-doc boilerplate strip (operators/cdc — content-defined
                                  chunks seen in ≥3 docs removed)
  5. span-level exact dedup      (operators/dedup — duplicated n-gram
                                  islands cut in-plan)
  6. MinHash-LSH near-dup dedup  (keep one doc per near-dup cluster)
  7. benchmark decontamination   (drop docs sharing 8-grams with a
                                  held-out "benchmark" slice)
  8. DSIR importance resampling  (re-weight toward the trusted source,
                                  keep top-k)
  9. token-budget shard packing  (operators/packing — contiguous
                                  shards under a token budget)

Run:  python examples/curation_pipeline.py  [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from multimodal_vector_db_spark.functions import text as X  # noqa: E402
from multimodal_vector_db_spark.operators.cdc import (  # noqa: E402
    remove_frequent_chunks,
)
from multimodal_vector_db_spark.operators.classifier import (  # noqa: E402
    nb_log_odds,
    nb_train_binary,
)
from multimodal_vector_db_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    remove_duplicated_spans,
)
from multimodal_vector_db_spark.operators.dsir import (  # noqa: E402
    dsir_resample,
)
from multimodal_vector_db_spark.operators.packing import (  # noqa: E402
    pack_shards,
)
from multimodal_vector_db_spark.operators.text_pipeline import (  # noqa: E402
    bigram_lm_scores,
)
from multimodal_vector_db_spark.session import get_spark  # noqa: E402


def run(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    spark = get_spark("curation_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts: dict[str, int] = {"raw": docs.count()}

    # Each stage's output is materialized (localCheckpoint) before the
    # next: 9 chained curation stages otherwise recompute the WHOLE
    # upstream funnel per action — at cluster scale you'd write each
    # stage to the warehouse instead (same cut, durable).
    def mat(df):
        return df.localCheckpoint(eager=True)

    # 1. language gate
    docs = mat(docs.where(X.stopword_ratio("text") >= 0.02))
    counts["lang_gate"] = docs.count()

    # 2. ensemble quality gate: mean z-score of (quality, -log_ppl) >= -1
    q = docs.select("doc_id", X.quality_score("text").alias("q"))
    lp = bigram_lm_scores(docs).select(
        F.col("id").alias("doc_id"), F.col("log_ppl").alias("lp")
    )
    j = q.join(lp, "doc_id")
    st = j.agg(
        F.avg("q").alias("mq"),
        F.stddev_pop("q").alias("dq"),
        F.avg("lp").alias("mp"),
        F.stddev_pop("lp").alias("dp"),
    )
    keep_ids = (
        j.crossJoin(F.broadcast(st))
        .where(
            (
                (F.col("q") - F.col("mq")) / F.col("dq")
                - (F.col("lp") - F.col("mp")) / F.col("dp")
            )
            / 2.0
            >= -1.0
        )
        .select("doc_id")
    )
    docs = mat(docs.join(keep_ids, "doc_id", "left_semi"))
    counts["quality_ensemble"] = docs.count()

    # 3. trained NB filter: fit target=src0 vs rest, keep log-odds > -5
    model, prior = nb_train_binary(docs, F.col("source") == "src0")
    odds = nb_log_odds(docs, model, prior)
    docs = mat(docs.join(
        odds.where(F.col("log_odds") > -5.0).select("doc_id"),
        "doc_id",
        "left_semi",
    ))
    counts["nb_filter"] = docs.count()

    # 4. cross-doc boilerplate strip (content-defined chunks in >= 3 docs)
    cleaned = remove_frequent_chunks(docs, min_docs=3).withColumnRenamed(
        "cleaned", "text2"
    )
    docs = mat(
        docs.join(cleaned, "doc_id")
        .drop("text")
        .withColumnRenamed("text2", "text")
        .where(F.length("text") > 0)
    )
    counts["boilerplate_strip"] = docs.count()

    # 5. span-level exact-substring dedup (cut duplicated 8-gram islands)
    spans = remove_duplicated_spans(docs, n=8).where(
        F.col("cleaned_text") != ""
    )
    docs = mat(
        docs.drop("text")
        .join(spans.select("doc_id", "cleaned_text"), "doc_id")
        .withColumnRenamed("cleaned_text", "text")
    )
    counts["span_dedup"] = docs.count()

    # 6. MinHash-LSH near-dup dedup: drop the higher id of each candidate
    cand = minhash_lsh_candidates(docs)
    losers = cand.select(
        F.greatest("id_a", "id_b").alias("doc_id")
    ).distinct()
    docs = mat(docs.join(losers, "doc_id", "left_anti"))
    counts["minhash_dedup"] = docs.count()

    # 7. decontamination: docs sharing an 8-gram with the "benchmark"
    # slice (doc_id % 97 == 0) are dropped
    bench = docs.where(F.col("doc_id") % 97 == 0)
    pool = docs.where(F.col("doc_id") % 97 != 0)
    grams = lambda d: d.select(  # noqa: E731
        "doc_id",
        F.explode(X.word_shingles_from_tokens(X.tokens("text"), 8)).alias(
            "g"
        ),
    )
    dirty = (
        grams(pool)
        .join(grams(bench).select("g").distinct(), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    docs = mat(pool.join(dirty, "doc_id", "left_anti"))
    counts["decontaminated"] = docs.count()

    # 8. DSIR resample toward the trusted source, keep up to 60%
    target = docs.where(F.col("source") == "src0")
    raw = docs.where(F.col("source") != "src0")
    k = max(int(raw.count() * 0.6), 1)
    sampled = dsir_resample(raw, target, k=k, n_buckets=64)
    docs = mat(docs.join(
        sampled.select(F.col("id").alias("doc_id")).union(
            target.select("doc_id")
        ),
        "doc_id",
        "left_semi",
    ))
    counts["dsir_resampled"] = docs.count()

    # 9. shard packing under a token budget
    shards = pack_shards(
        docs.select("doc_id", X.token_count("text").alias("n_tokens")),
        weight_col="n_tokens",
        budget=2000,
        order_cols=["doc_id"],
    )
    counts["shards"] = shards.agg(
        F.countDistinct("shard_id").cast("int")
    ).collect()[0][0]

    for stage, n in counts.items():
        print(f"{stage:>20}: {n}")
    return counts


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

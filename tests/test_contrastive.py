from __future__ import annotations

from pyspark.sql import functions as F


def _mk(spark):
    # 2-d unit-ish vectors; labels split the space
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),   # same label as 0, very similar
        (2, [0.0, 1.0], 0),   # same label as 0, dissimilar -> hard positive
        (3, [0.95, 0.05], 1), # diff label, very similar -> hard negative
        (4, [-1.0, 0.0], 1),  # diff label, dissimilar
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_mine_contrastive_pairs_semantics(spark):
    """Hard negative = MOST similar other-label row; hard positive =
    LEAST similar same-label row; the anchor never pairs with itself."""
    from multimodal_vector_db_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    emb = _mk(spark)
    anchors = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    out = mine_contrastive_pairs(
        emb, anchors, k_negatives=1, k_positives=1, id_col="vec_id"
    ).collect()
    by_type = {r["pair_type"]: r for r in out}
    assert len(out) == 2
    assert by_type["hard_negative"]["id"] == 3  # sim 0.95 beats -1.0
    assert by_type["hard_positive"]["id"] == 2  # sim 0.0 under 0.9
    assert all(r["id"] != 0 for r in out)


def test_mine_contrastive_pairs_k_and_rank(spark):
    """k caps apply per direction per anchor; rank is 1..k ordered by
    mining hardness (negatives: sim desc; positives: sim asc)."""
    from multimodal_vector_db_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    emb = _mk(spark)
    anchors = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    out = mine_contrastive_pairs(
        emb, anchors, k_negatives=2, k_positives=2, id_col="vec_id"
    )
    rows = out.collect()
    for aid in (0, 1):
        negs = [
            r for r in rows
            if r["anchor_id"] == aid and r["pair_type"] == "hard_negative"
        ]
        poss = [
            r for r in rows
            if r["anchor_id"] == aid and r["pair_type"] == "hard_positive"
        ]
        assert len(negs) == 2 and len(poss) == 2
        negs.sort(key=lambda r: r["rank"])
        assert negs[0]["sim"] >= negs[1]["sim"]
        poss.sort(key=lambda r: r["rank"])
        assert poss[0]["sim"] <= poss[1]["sim"]


def test_mine_contrastive_pairs_single_scan_plan(spark):
    """Both mining directions come out of ONE scored pass: the plan
    holds exactly one scan of the corpus and one shuffle (the window
    partitioning), not one per direction."""
    from multimodal_vector_db_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    emb = _mk(spark)
    anchors = emb.limit(2).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    plan = (
        mine_contrastive_pairs(emb, anchors, 2, 2, id_col="vec_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1

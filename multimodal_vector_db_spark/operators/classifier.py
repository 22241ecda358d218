"""Binary multinomial Naive Bayes text classifier, trained as
aggregations.

The GPT-3 / CCNet-style curation pipelines gate crawl documents with a
cheap linear classifier trained to separate a trusted target corpus
from the raw pool (the reference engine has no classifier stage — this
extends the curation tier the same way `operators/dsir.py` does, and
complements it: DSIR reweights, the classifier filters).

Training is pure aggregation — per-class token counts with Laplace
smoothing — so the model falls out of one explode + one groupBy; there
is no SGD and no driver-side loop. Scoring is one explode, one
broadcast join against the vocab-bounded model, and a per-document
sum with map-side partial aggregation. At 100 TB the only shuffles are
keyed on token (training, vocab-bounded after partial combine) and on
doc id (scoring); the model table is broadcast.

Numerics follow the repo's float-canon contract: every per-token
log-likelihood ratio is computed ONCE in the model table (identical
doubles in Spark and the DuckDB oracle), per-doc sums wobble only in
addition order and are rounded to 6 dp at the query edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.text import tokens


def nb_train_binary(
    train: DataFrame,
    positive: Column,
    text_col: str = "text",
) -> tuple[DataFrame, float]:
    """Fit the binary NB model on ``train``.

    Returns ``(model, prior_diff)`` where ``model`` has one row per
    training-vocab token: ``(token, lr, ...)`` with
    ``lr = ln p(token|pos) - ln p(token|neg)`` under Laplace smoothing,
    plus a single ``__default__`` row carrying the unseen-token ratio
    ``ln((n_neg + V) / (n_pos + V))``. ``prior_diff`` is
    ``ln p(pos) - ln p(neg)`` from document counts.

    The model is vocab-bounded (thousands of rows, not corpus-sized):
    broadcast it at score time.
    """
    flagged = train.select(
        F.when(positive, F.lit(1)).otherwise(F.lit(0)).alias("pos"),
        tokens(text_col).alias("toks"),
    )
    counts = (
        flagged.select("pos", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(
            F.sum("pos").alias("c_pos"),
            F.sum(1 - F.col("pos")).alias("c_neg"),
        )
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count("*").alias("vocab"),
    ).collect()[0]
    n_pos, n_neg, vocab = (
        int(totals["n_pos"] or 0),
        int(totals["n_neg"] or 0),
        int(totals["vocab"]),
    )
    denom_pos = float(n_pos + vocab)
    denom_neg = float(n_neg + vocab)
    model = counts.select(
        "token",
        (
            F.log((F.col("c_pos") + 1).cast("double") / F.lit(denom_pos))
            - F.log((F.col("c_neg") + 1).cast("double") / F.lit(denom_neg))
        ).alias("lr"),
    )
    import math

    default_lr = math.log(denom_neg) - math.log(denom_pos)
    model = model.unionByName(
        model.sparkSession.createDataFrame(
            [("__default__", default_lr)], "token string, lr double"
        )
    )

    doc_counts = train.agg(
        F.sum(F.when(positive, 1).otherwise(0)).alias("d_pos"),
        F.count("*").alias("d_all"),
    ).collect()[0]
    d_pos, d_all = int(doc_counts["d_pos"] or 0), int(doc_counts["d_all"])
    d_neg = d_all - d_pos
    prior_diff = math.log(max(d_pos, 1) / d_all) - math.log(
        max(d_neg, 1) / d_all
    )
    return model, prior_diff


def nb_log_odds(
    test: DataFrame,
    model: DataFrame,
    prior_diff: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``test`` docs: ``(id_col, n_toks, log_odds)`` where
    ``log_odds = prior_diff + Σ_tokens lr(token)`` (unseen tokens take
    the model's ``__default__`` ratio). Positive means
    more-likely-target. One explode, one broadcast join, one doc-keyed
    aggregation.

    The model contract requires a ``__default__`` row (the
    unseen-token ratio, written by :func:`nb_train`); it is collected
    driver-side and validated up front — a model without it would
    otherwise silently score every document against an empty frame.
    """
    default_rows = model.where(F.col("token") == "__default__").collect()
    if len(default_rows) != 1:
        raise ValueError(
            "nb_log_odds: model must contain exactly one '__default__' "
            f"row (found {len(default_rows)}); train with nb_train or "
            "add the unseen-token ratio row"
        )
    default_lr = float(default_rows[0]["lr"])
    occurrences = test.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("token")
    )
    scored = occurrences.join(
        F.broadcast(model.where(F.col("token") != "__default__")),
        "token",
        "left",
    ).select(
        id_col,
        "token",
        F.coalesce(
            "lr", F.when(F.col("token").isNotNull(), F.lit(default_lr))
        ).alias("lr"),
    )
    return scored.groupBy(id_col).agg(
        F.count("token").cast("long").alias("n_toks"),
        (F.coalesce(F.sum("lr"), F.lit(0.0)) + F.lit(prior_diff)).alias(
            "log_odds"
        ),
    )

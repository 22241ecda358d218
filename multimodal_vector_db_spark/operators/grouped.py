"""Grouped-map Pandas operators (`groupBy().applyInPandas`) — the
escape hatch for per-group computations that need the WHOLE group as a
matrix (numpy/BLAS) rather than per-row expressions.

Production guidance: prefer the relational form when one exists (the
centering below has one: broadcast-join the per-group means and
zip_with-subtract — stays in codegen). Reach for applyInPandas when the
per-group math is genuinely matrix-shaped (SVD/whitening/OPQ rotation
per IVF cell), accepting one shuffle on the group key and Arrow
transfer of each group. Groups must fit in executor memory — partition
by a finer key or sample if a group can be huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def center_embeddings_by_group(
    df: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Subtract each group's mean vector from its members (the first
    step of per-cell whitening / residual encoding). Returns
    ``(id_col, group_col, centered ARRAY<FLOAT>)``; one shuffle on the
    group key, matrix math in numpy per group."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, {group_col} int, centered array<float>"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.vstack(pdf[vector_col].map(np.asarray).to_numpy()).astype(
            np.float64
        )
        centered = (mat - mat.mean(axis=0)).astype(np.float32)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "centered": list(centered.tolist()),
            }
        )

    return (
        df.select(id_col, group_col, vector_col)
        .groupBy(group_col)
        .applyInPandas(center, schema=out_schema)
    )

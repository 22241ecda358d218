"""Learned-projection operators (SURVEY §2.7 F7-F9): the reference's
``projection.py`` heads re-expressed for Spark.

- F7 (``projection.py:31-60``): linear projection + renormalize as an
  Arrow-batched pandas UDF with the (small) weight matrix broadcast in
  the closure — the vectorized-NumPy fast path for matrix work that
  per-element SQL expressions would do slowly.
- F8 (``projection.py:265-301``): optimal-dimension heuristic — pure
  driver-side planning arithmetic.
- F9 (``projection.py:439-455``): mobile-tier dimension lookup.
"""

# NB: no `from __future__ import annotations` here — pandas_udf resolves
# the pd.Series type hints at decoration time and string annotations
# (PEP 563) break its signature inspection.
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: projection.py:28 — supported Matryoshka dims (plus 32, enum :18-24)
DEFAULT_MATRYOSHKA_DIMS = [512, 256, 128, 64]

#: projection.py:439-455 — device tier → output dim, default 256
MOBILE_TIER_DIMS = {"high": 512, "mid": 256, "low": 128, "ultra_low": 64}


def deterministic_weights(in_dim: int, out_dim: int):
    """Fixed test-double weight matrix (the real one is learned —
    M10/train_matryoshka.py): W[i][j] = ((7i + 13j) % 19 - 9) / 19."""
    return [
        [((7 * i + 13 * j) % 19 - 9) / 19.0 for j in range(out_dim)]
        for i in range(in_dim)
    ]


def linear_project_udf(weights):
    """F7: ``y = normalize(x @ W)`` as a pandas UDF. The weight matrix
    rides the serialized closure (broadcast once per executor); NumPy
    does the batch matmul over the whole Arrow batch at once."""
    import numpy as np

    W = np.asarray(weights, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def project(v: pd.Series) -> pd.Series:
        X = np.vstack(v.to_numpy())  # (batch, in_dim)
        Y = X.astype(np.float64) @ W
        norms = np.linalg.norm(Y, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return pd.Series(list(Y / norms))

    return project


def optimal_dimension(
    n_vectors: int,
    memory_budget_bytes: int,
    latency_budget_ms: float,
    dims=None,
) -> int:
    """F8 (``projection.py:265-301``): largest supported dim whose
    estimated memory ``n*dim*2`` bytes and latency ``dim*0.001`` ms fit
    the budgets; the minimum dim if none fits."""
    dims = sorted(dims or DEFAULT_MATRYOSHKA_DIMS, reverse=True)
    for d in dims:
        if n_vectors * d * 2 <= memory_budget_bytes and d * 0.001 <= latency_budget_ms:
            return d
    return dims[-1]


def mobile_tier_dim(tier: str) -> int:
    """F9: device tier → embedding dim (default 256)."""
    return MOBILE_TIER_DIMS.get(tier, 256)


def nearest_supported_dim(dim: int, dims=None) -> int:
    """F4 edge case (``projection.py:201-205``): snap an unsupported
    requested dim to the nearest supported one."""
    dims = dims or DEFAULT_MATRYOSHKA_DIMS
    return min(dims, key=lambda d: abs(d - dim))

"""Learned Matryoshka-style projection TRAINING (SURVEY §2.8 M10).

Reference: ``scripts/train_matryoshka.py:91-165`` trains a torch
projection head (``MatryoshkaProjection`` + multi-scale InfoNCE
``MatryoshkaLoss``) so that PREFIX slices of the projected embedding
remain accurate at every supported dimension. Torch is absent in this
container, so the trainer here learns the projection by **distributed
PCA**: the top-k principal components maximize retained variance for
EVERY prefix k' ≤ k simultaneously (eigenvector prefixes nest), which
is precisely the prefix-truncatable property the reference's loss
optimizes for. Serving reuses the F7 linear head
(``functions/projection.py:linear_project_udf``) unchanged.

Scale shape (the 100 TB story): the fit is ONE ``mapInPandas`` pass
emitting per-Arrow-batch moment partials — ``(n, Σx, XᵀX)``, a d×d
double matrix each (64×64 → 32 KB) — summed driver-side. Nothing
corpus-sized is collected, nothing shuffles; cost is a single scan
plus an O(d³) driver eigendecomposition (microseconds at d ≤ 1024).
This is the canonical tree-aggregated second-moment PCA used by
MLlib's RowMatrix, re-expressed over the DataFrame API.
"""

# NB: no `from __future__ import annotations` — mapInPandas/pandas_udf
# resolve type hints at decoration time (see functions/projection.py).
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pca_eig(df: DataFrame, col: str) -> tuple:
    """Shared distributed-PCA core: one moment-partials pass → driver
    eigendecomposition. Returns ``(mean 1×d, eigvals desc, eigvecs d×d
    with columns in eigval-descending order, signs canonicalized)``."""
    first = df.select(F.size(F.col(col)).alias("d")).first()
    if first is None:
        raise ValueError("fit_pca_components: empty input")
    d = first["d"]

    def partials(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        batch = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    # total order (partition, batch) so the driver-side
                    # fp summation has ONE deterministic order, not
                    # whatever collect() happened to return. Stride is
                    # part << 40: no partition can emit 2^40 Arrow
                    # batches, so pid ranges provably never overlap
                    # (a 1e6 stride could in principle collide).
                    "pid": [(part << 40) | batch],
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "c": [(X.T @ X).ravel().tolist()],
                }
            )
            batch += 1

    rows = (
        df.select(F.col(col).cast("array<double>").alias(col))
        .mapInPandas(
            partials, schema="pid long, n long, s array<double>, c array<double>"
        )
        .collect()
    )
    rows.sort(key=lambda r: r["pid"])
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    C = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        C += np.asarray(r["c"]).reshape(d, d)
    mean = s / n
    cov = C / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    vals = eigvals[order]
    W = eigvecs[:, order]  # d × d, columns orthonormal, desc eigvals
    # canonical sign: largest-magnitude element of each component > 0
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return mean, vals, W


def fit_pca_components(
    df: DataFrame, col: str = "embedding", k: int = 16
) -> tuple[list, list]:
    """Fit a k-component PCA projection of ``df[col]`` (array<float/
    double>) and return ``(mean, components)`` where ``components`` is
    a d×k column-orthonormal matrix ready for ``x @ W`` serving.

    Deterministic: partials are summed in one driver reduction over a
    handful of 32 KB rows — fp-addition order-insensitivity is NOT
    assumed; partials carry a (partition, batch) total order and are
    sorted before summing — and each eigenvector's sign is
    canonicalized so its largest-|·| element is positive.
    """
    mean, _vals, W = _pca_eig(df, col)
    return mean.tolist(), W[:, :k].tolist()


def fit_opq_rotation(
    df: DataFrame, col: str = "embedding", n_subquantizers: int = 4
) -> tuple[list, list, list]:
    """Parametric OPQ rotation (Ge et al., "Optimized Product
    Quantization", CVPR 2013, §4 — the closed-form Gaussian solution):
    full PCA, then allocate principal components to the
    ``n_subquantizers`` subspaces balancing the PRODUCT of eigenvalues
    per subspace (greedy: components in λ-descending order, each to
    the non-full subspace with the smallest current Σ log λ). The
    returned rotation's columns are the eigenvectors in allocated
    order, so ``y = (x − μ) @ R`` lands each subspace's slice on its
    allocated components — the decorrelated, variance-balanced layout
    plain PQ lacks.

    Returns ``(mean, R d×d column list, allocation)`` where
    ``allocation[j]`` is the subspace the j-th rotated coordinate
    belongs to (blocked: coords ``[s·subdim, (s+1)·subdim)`` → s).

    Fit-type (eigendecomposition) like :func:`fit_pca_components`:
    persisted as a fixture by tools/build_fixtures.py; serving through
    the persisted rotation is fully relational and hash-checked
    (``opq_adc_knn``). Same one-pass distributed moments — nothing
    corpus-sized collects."""
    mean, vals, W = _pca_eig(df, col)
    d = len(mean)
    if d % n_subquantizers:
        raise ValueError(
            f"opq: dim {d} not divisible by {n_subquantizers} subspaces"
        )
    subdim = d // n_subquantizers
    eps = max(float(vals.max()), 1.0) * 1e-12
    log_prod = [0.0] * n_subquantizers
    fill: list[list[int]] = [[] for _ in range(n_subquantizers)]
    for j in range(d):  # λ-descending (W columns already sorted)
        open_subs = [
            s for s in range(n_subquantizers) if len(fill[s]) < subdim
        ]
        tgt = min(open_subs, key=lambda s: (log_prod[s], s))
        fill[tgt].append(j)
        log_prod[tgt] += float(np.log(max(vals[j], eps)))
    order = [j for s in range(n_subquantizers) for j in fill[s]]
    R = W[:, order]  # d × d orthogonal
    alloc = [s for s in range(n_subquantizers) for _ in range(subdim)]
    return mean.tolist(), R.tolist(), alloc


def fit_opq_rotation_trained(
    df: DataFrame,
    col: str = "embedding",
    n_subquantizers: int = 4,
    n_codes: int = 32,
    n_iter: int = 8,
    seed: int = 42,
) -> tuple[list, list, list, list]:
    """NON-parametric OPQ (Ge et al., "Optimized Product Quantization",
    CVPR 2013, **Algorithm 1** — alternating minimization), the trained
    upgrade of :func:`fit_opq_rotation`'s closed-form Gaussian solution:

    - init: the parametric rotation (the paper's recommended warm
      start) + one seeded MLlib-KMeans codebook fit per subspace in the
      rotated space;
    - each iteration alternates (a) one distributed Lloyd step on the
      per-subspace codebooks under the CURRENT rotation (assign →
      per-(sub, code) mean), then (b) an orthogonal-Procrustes update
      of the rotation given the codewords — ``R = U Vᵀ`` from
      ``SVD(Xcᵀ Ŷ)``, the closed-form minimizer of ``‖Xc R − Ŷ‖_F``
      over orthogonal R.

    Every step weakly decreases the shared quantization objective
    ``‖Xc R − Ŷ‖²`` (Lloyd assignment, Lloyd mean-update, and
    Procrustes are each exact partial minimizers), so the returned
    per-iteration objective history is monotone non-increasing —
    property-pinned in tests.

    Scale shape (fit-type, like :func:`fit_pca_components`): per
    iteration, two ``mapInPandas`` scans emitting bounded partials —
    pass A yields per-(sub, code) sums/counts (``n_sub × n_codes``
    rows of subdim doubles), pass B yields per-Arrow-batch ``Xcᵀ Ŷ``
    cross-moments (one d×d double matrix each, 32 KB at d=64) plus the
    objective. Determinism holds on BOTH passes: pass B's partials
    carry the (partition, batch) total order and are driver-summed
    sorted; pass A's distributed codebook sums aggregate
    ``decimal(38,18)``-cast values — decimal addition is exact, hence
    shuffle-order-insensitive (the float-``sum`` form was last-ulp
    order-sensitive, which could flip a near-tie argmin in the next
    assignment pass — the same bug class fixed in
    ``text_pipeline.py:242``'s integer-scaled means), and it stays
    map-side combinable, unlike a driver-side re-sort of per-batch
    partials (which would collect ``batches × n_sub × n_codes`` rows).
    The 1e-18 quantization is ~1e-16 relative at this data's O(1)
    magnitudes — below double ulp of the resulting means. Nothing
    corpus-sized is collected; the SVD is O(d³) driver-side.

    Returns ``(mean, R, codebooks, objective_history)`` — ``R`` in the
    same d×d column layout as :func:`fit_opq_rotation`, ready for the
    same fixture format and the UNCHANGED serving/oracle replay."""
    from pyspark.sql import types as T

    from multimodal_vector_db_spark.operators.quantization import (
        kmeans_codebooks,
    )

    mean, R0, _alloc = fit_opq_rotation(df, col, n_subquantizers)
    mu = np.asarray(mean, dtype=np.float64)
    R = np.asarray(R0, dtype=np.float64)
    d = len(mean)
    subdim = d // n_subquantizers

    src = df.select(F.col(col).cast("array<double>").alias("x"))

    def _assigned_blocks(X, R_cur, books):
        """(Y, Yhat) for one Arrow batch under (R_cur, books)."""
        Xc = X - mu
        Y = Xc @ R_cur
        Yhat = np.empty_like(Y)
        assigns = []
        for s in range(n_subquantizers):
            blk = Y[:, s * subdim : (s + 1) * subdim]
            C = books[s]  # (n_codes, subdim)
            d2 = (
                (blk * blk).sum(axis=1, keepdims=True)
                - 2.0 * blk @ C.T
                + (C * C).sum(axis=1)
            )
            a = np.argmin(d2, axis=1)  # ties → lowest code
            assigns.append(a)
            Yhat[:, s * subdim : (s + 1) * subdim] = C[a]
        return Xc, Y, Yhat, assigns

    # init codebooks: seeded MLlib KMeans per subspace in the rotated
    # space (the same fitter the PQ tier uses)
    rot0 = pca_project(
        src, "x", mean, R.tolist(), out_col="y", normalize=False
    ).select(F.col("y").alias("embedding"))
    books = np.asarray(
        kmeans_codebooks(
            rot0, n_subquantizers, n_codes=n_codes, seed=seed
        ),
        dtype=np.float64,
    )  # (n_sub, n_codes, subdim)

    a_schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ]
    )
    b_schema = T.StructType(
        [
            T.StructField("pid", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("obj", T.DoubleType()),
            T.StructField("m", T.ArrayType(T.DoubleType())),
        ]
    )

    history: list[float] = []
    for _it in range(n_iter):
        R_b, books_b = R.copy(), books.copy()

        def pass_a(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                X = np.vstack(pdf["x"].to_numpy()).astype(np.float64)
                _Xc, Y, _Yh, assigns = _assigned_blocks(X, R_b, books_b)
                rows = {"sub": [], "code": [], "n": [], "s": []}
                for s in range(n_subquantizers):
                    blk = Y[:, s * subdim : (s + 1) * subdim]
                    for c in np.unique(assigns[s]):
                        sel = blk[assigns[s] == c]
                        rows["sub"].append(s)
                        rows["code"].append(int(c))
                        rows["n"].append(len(sel))
                        rows["s"].append(sel.sum(axis=0).tolist())
                yield pd.DataFrame(rows)

        # exact (decimal) element sums: shuffle-order-insensitive, so
        # the codebook update is deterministic run-to-run (see the
        # docstring's determinism note); the mean is taken driver-side
        # in float64 from the exact sums
        sums = (
            src.mapInPandas(pass_a, schema=a_schema)
            .groupBy("sub", "code")
            .agg(
                F.sum("n").alias("n"),
                F.array(
                    *[
                        F.sum(
                            F.element_at("s", i + 1).cast("decimal(38,18)")
                        )
                        for i in range(subdim)
                    ]
                ).alias("s"),
            )
            .collect()
        )
        new_books = books.copy()  # empty cluster keeps its codeword
        for r in sums:
            if r["n"]:
                new_books[r["sub"], r["code"]] = (
                    np.asarray([float(x) for x in r["s"]]) / r["n"]
                )
        books = new_books
        books_b2 = books.copy()

        def pass_b(it):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            part = ctx.partitionId() if ctx is not None else 0
            batch = 0
            for pdf in it:
                if len(pdf) == 0:
                    continue
                X = np.vstack(pdf["x"].to_numpy()).astype(np.float64)
                Xc, Y, Yhat, _a = _assigned_blocks(X, R_b, books_b2)
                err = Y - Yhat
                yield pd.DataFrame(
                    {
                        "pid": [(part << 40) | batch],
                        "n": [len(X)],
                        "obj": [float((err * err).sum())],
                        "m": [(Xc.T @ Yhat).ravel().tolist()],
                    }
                )
                batch += 1

        rows = src.mapInPandas(pass_b, schema=b_schema).collect()
        rows.sort(key=lambda r: r["pid"])
        n_total = sum(r["n"] for r in rows)
        M = np.zeros((d, d))
        obj = 0.0
        for r in rows:
            M += np.asarray(r["m"]).reshape(d, d)
            obj += r["obj"]
        history.append(obj / max(n_total, 1))
        U, _S, Vt = np.linalg.svd(M)
        R = U @ Vt  # orthogonal Procrustes minimizer

    return mean, R.tolist(), books.tolist(), history


def pca_project(
    df: DataFrame,
    col: str,
    mean: list,
    components: list,
    out_col: str = "proj",
    prefix_dim: Optional[int] = None,
    normalize: bool = True,
) -> DataFrame:
    """Serve the trained projection: ``normalize((x - mean) @ W[:, :p])``
    as an Arrow-batched pandas UDF (the F7 head with a centering step).
    ``prefix_dim`` truncates to the first p components — the Matryoshka
    serving knob; because PCA prefixes nest, this equals refitting at
    p components."""
    from pyspark.sql import types as T

    mu = np.asarray(mean, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64)
    if prefix_dim is not None:
        W = W[:, :prefix_dim]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def project(v: pd.Series) -> pd.Series:
        X = np.vstack(v.to_numpy()).astype(np.float64) - mu
        Y = X @ W
        if normalize:
            norms = np.linalg.norm(Y, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            Y = Y / norms
        return pd.Series(list(Y))

    return df.withColumn(out_col, project(F.col(col)))


def save_projection(path: str, mean: list, components: list) -> None:
    """Persist trained projection weights as JSON — the hand-off the
    reference's trainer makes to the serving engine (its engine
    'consumes the saved weights only'; here both halves are in-repo).
    Weights are d×k doubles (a few KB) — driver-side JSON, not a
    distributed write."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "mean": mean,
                "components": components,
                "in_dim": len(mean),
                "out_dim": len(components[0]),
            },
            f,
        )


def load_projection(path: str) -> tuple[list, list]:
    """Load weights saved by :func:`save_projection` → (mean,
    components), ready for :func:`pca_project`."""
    import json

    with open(path) as f:
        obj = json.load(f)
    return obj["mean"], obj["components"]


def retained_variance(df: DataFrame, col: str, mean: list, components: list) -> list:
    """Per-prefix retained-variance ratios [r_1, …, r_k] — the quality
    curve the reference reports per Matryoshka dim (README.md:243-248:
    '64D = 85-90% of 512D'). One projection pass + one aggregation."""
    proj = pca_project(
        df, col, mean, components, out_col="_p", normalize=False
    )
    k = len(components[0])
    # total sum of squares = Σ‖x − μ‖²: a plain JVM expression over the
    # centered column — no d×d identity-projection UDF pass (which
    # materialized full d-dim arrays per row just to square-sum them)
    mu_arr = F.array(*[F.lit(float(m)) for m in mean])
    total_var = (
        df.select(
            F.aggregate(
                F.zip_with(
                    F.col(col).cast("array<double>"),
                    mu_arr,
                    lambda x, m: (x - m) * (x - m),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("sq")
        )
        .agg(F.sum("sq").alias("t"))
        .first()["t"]
    )
    sums = proj.select(
        *[
            F.sum(F.pow(F.element_at("_p", i + 1), 2)).alias(f"v{i}")
            for i in range(k)
        ]
    ).first()
    acc, out = 0.0, []
    for i in range(k):
        acc += sums[f"v{i}"]
        out.append(acc / total_var)
    return out

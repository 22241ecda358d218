"""kNN similarity join — the engine's defining operator.

Reference semantics: ``VectorIndex.search`` / ``batch_search``
(``vector_index.py:107-210``) — query vector(s) × corpus → top-k by
similarity, optional metadata predicate, metric-dependent
distance→similarity transform.

Spark-first design
------------------
The query side is tiny (one to a few thousand rows) and the corpus is
huge, so the physical plan we want — and build explicitly — is:

    corpus scan (pruned columns, pushed filter, partition-pruned on
    modality) → **broadcast nested-loop join** with the query side →
    codegen'd dot-product projection → per-query top-k

The corpus NEVER shuffles. For a single query the top-k is a global
``TakeOrderedAndProject`` (no sort of the full corpus); for batch
queries only the (query_id × k·overfetch) pairs shuffle into the
per-query ranking window. Predicates are applied *before* ranking, so
the reference's k×10 over-fetch heuristic (``vector_index.py:129``) is
unnecessary — Catalyst pushes the filter below the sort.

At 1000-executor / 100 TB scale this is a map-only pass over the corpus
plus a shuffle bounded by queries×k, not by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot

#: stable tie-breaker: higher similarity first, then lower id.
def _rank_window(partition_cols: list[str]):
    return Window.partitionBy(*partition_cols).orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )


def topk_rows_1d(vals, ids, kk: int, ascending: bool = False):
    """EXACT top-``kk`` row indices of a 1-D score vector ordered by
    ``(vals desc|asc, ids asc)`` — the blocked scorers' inner
    selection. ``np.partition`` finds the kth value in O(n), boundary
    TIES are gathered explicitly (so the id tie-break is as exact as a
    full lexsort), and only the ~kk candidates are sorted. Replaces
    full-column ``np.lexsort`` (O(n log n), measured 4× the matmul
    cost per Arrow batch at 512-d × 256 queries)."""
    import numpy as np

    n = len(ids)
    kk = min(kk, n)
    key = vals if ascending else -vals
    if kk >= n:
        return np.lexsort((ids, key))[:kk]
    kth = np.partition(key, kk - 1)[kk - 1]
    cand = np.nonzero(key <= kth)[0]
    o = np.lexsort((ids[cand], key[cand]))[:kk]
    return cand[o]


def topk_rows_2d(S, ids, kk: int, ascending: bool = False):
    """Per-COLUMN exact top-``kk`` of a 2-D score matrix ``S (n, nq)``
    by ``(value desc|asc, id asc)`` → ``(kk, nq)`` row-index array.
    One O(n·nq) partition pass + a tiny per-column sort over the
    kk-plus-boundary-ties candidates; bitwise-identical selection to
    the full-matrix lexsort it replaces (ties handled exactly), at a
    fraction of the cost — and without materializing the (n, nq)
    repeated-id matrix the lexsort form needed."""
    import numpy as np

    n, nq = S.shape
    kk = min(kk, n)
    key = S if ascending else -S
    if kk >= n:
        return np.lexsort(
            (np.repeat(ids[:, None], nq, axis=1), key), axis=0
        )[:kk]
    kth = np.partition(key, kk - 1, axis=0)[kk - 1]  # (nq,)
    mask = key <= kth
    out = np.empty((kk, nq), dtype=np.int64)
    for j in range(nq):
        cand = np.nonzero(mask[:, j])[0]
        o = np.lexsort((ids[cand], key[cand, j]))[:kk]
        out[:, j] = cand[o]
    return out


def knn_search(
    corpus: DataFrame,
    query_vector: list[float],
    k: int,
    predicate: Column | None = None,
    id_col: str = "id",
    vector_col: str = "embedding",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Single-query exact kNN (J2): top-k corpus rows by dot-product
    similarity against a literal query vector.

    Plan shape: scan → [filter] → project(sim) → TakeOrderedAndProject(k).
    Equivalent to ``vector_index.py:107-160`` with brute-force search;
    vectors are assumed L2-normalized so dot == cosine.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    cols = payload_cols or [c for c in corpus.columns if c != vector_col]
    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    scored = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in cols if c != id_col],
        dot(F.col(vector_col), q).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col("id").asc()).limit(k)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vector_col: str = "q_emb",
    id_col: str = "id",
    vector_col: str = "embedding",
    predicate: Column | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Batch kNN similarity join (J3/W2): for every query row, the top-k
    corpus rows by dot-product similarity.

    ``corpus ⨝ broadcast(queries)`` (nested loop — every pair scored) →
    ``row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id)``
    → ``rank <= k``. Matches ``vector_index.py:162-210`` batch search.
    """
    df = corpus if predicate is None else corpus.filter(predicate)
    cols = payload_cols if payload_cols is not None else []
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.col(vector_col).alias("__emb"),
        *[F.col(c) for c in cols],
    ).crossJoin(
        F.broadcast(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_vector_col).alias("__q"),
            )
        )
    )
    scored = pairs.select(
        "query_id",
        "id",
        *cols,
        dot(F.col("__emb"), F.col("__q")).alias("sim"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window(["query_id"])))
        .filter(F.col("rank") <= k)
    )


def top_k_per_group(
    scored: DataFrame,
    group_cols: list[str],
    k: int,
    order_col: str = "sim",
    tie_col: str = "id",
    ascending: bool = False,
) -> DataFrame:
    """Generic top-k-per-group (W2/W3): ``row_number`` over a
    deterministic (order, tie) window, keep rank <= k."""
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        F.col(tie_col).asc(),
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_join_blocked(
    corpus: DataFrame,
    queries: DataFrame | list[tuple[int, list[float]]],
    k: int,
    query_id_col: str = "query_id",
    query_vector_col: str = "q_emb",
    id_col: str = "id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Batch kNN at scale: per-partition NumPy block matmul + local
    top-k inside ``mapInPandas``, then a global top-k over only
    ``partitions × k`` candidates per query.

    This is the 100 TB shape of the exact path: :func:`knn_join`'s
    window shuffles EVERY scored (corpus × query) pair, which is fine
    when the ANN path pre-prunes but quadratic for brute force. Here
    each partition emits at most k rows per query, so the shuffle is
    bounded by ``num_partitions × k × |queries|`` regardless of corpus
    size — and the scoring itself is one BLAS matmul per Arrow batch
    instead of per-row expression evaluation.

    Scores come from float64 BLAS (different accumulation order than the
    sequential-fold scoring), so this path is validated by recall
    against :func:`knn_join` — the ANN-style standard — not by hash
    equality.
    """
    import numpy as np

    from pyspark.sql import Window
    from pyspark.sql import types as T

    if isinstance(queries, list):
        # driver-side (query_id, vector) pairs — skips the collect job
        # (the facade's search_batch already holds the vectors)
        q_rows = queries
    else:
        q_rows = queries.select(query_id_col, query_vector_col).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vector_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            S = X @ Q.T  # (n, nq)
            kk = min(k, len(pdf))
            # per query: local top-k by (sim desc, id asc) — exact
            # tie-handling, partition-then-small-sort (see topk_rows_2d)
            top = topk_rows_2d(S, ids, kk)  # (kk, nq) row indices
            qcol = np.repeat(qids[None, :], kk, axis=0)
            yield pd.DataFrame(
                {
                    "query_id": qcol.ravel(),
                    "id": ids[top].ravel(),
                    "sim": np.take_along_axis(S, top, axis=0).ravel(),
                }
            )

    local = corpus.select(
        F.col(id_col).alias(id_col), F.col(vector_col).alias(vector_col)
    ).mapInPandas(local_topk, schema=out_schema)
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("sim").desc(), F.col("id").asc())
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_search_blocked(
    corpus: DataFrame,
    query_vector: list[float],
    k: int,
    id_col: str = "id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Single-query exact kNN at scale — the degenerate (|queries|=1)
    fast path of :func:`knn_join_blocked`, without the per-query
    ranking window the batch form pays.

    Each partition scores its Arrow batches with one BLAS
    matrix-vector product and emits only its local top-k ``(id, sim)``
    rows; the global top-k is a plain ``ORDER BY … LIMIT k`` —
    Catalyst plans that as ``TakeOrderedAndProject`` over at most
    ``num_partitions × k`` candidate rows, no shuffle of corpus data,
    no window exchange. This is the scorer ``engine.search`` dispatches
    to above its size×dim threshold (the interpreted HOF dot benches
    214 ms/query at 44k×512-d; this form ~5 ms — see BENCH ref_scale).

    Returns ``(id, sim)`` only — fetch payload columns by joining the
    k-row result back to the corpus (broadcast the k rows), which keeps
    the scoring scan pruned to two columns.
    """
    import numpy as np
    from pyspark.sql import types as T

    q = np.asarray(query_vector, dtype=np.float64)

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vector_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            s = X @ q
            kk = min(k, len(pdf))
            top = topk_rows_1d(s, ids, kk)
            yield pd.DataFrame({"id": ids[top], "sim": s[top]})

    local = corpus.select(
        F.col(id_col).alias(id_col), F.col(vector_col).alias(vector_col)
    ).mapInPandas(local_topk, schema=out_schema)
    return local.orderBy(F.col("sim").desc(), F.col("id").asc()).limit(k)


def dual_space_topk_blocked(
    corpus: DataFrame,
    queries: list[tuple[int, dict[str, list[float]]]],
    k: int,
    group_col: str = "modality",
    space_col: str = "space",
    id_col: str = "id",
    vector_col: str = "embedding",
    default_space: str = "clip",
) -> DataFrame:
    """Per-(query, group) top-k with SPACE-ROUTED scoring — the blocked
    BLAS form of the engine's §3.3 ``compare_modalities`` query
    (reference ``search_cross_modal.py:107-173``): every query carries
    one vector per embedding space, each corpus row is scored with the
    query vector of ITS OWN space, and the top-k is taken per
    (query_id, ``group_col``).

    Same scale shape as :func:`knn_join_blocked`: one float64 matmul
    per (Arrow batch × space), local top-k per (query, group) inside
    the partition, then a ranking window over only
    ``partitions × |queries| × |groups| × k`` candidate rows — the
    corpus itself never shuffles. Rows whose space has no query vector
    score with ``default_space`` (the HOF form's ``otherwise`` branch).

    ``queries``: ``[(query_id, {space: vector, ...}), ...]`` — every
    query must supply the same set of spaces. Returns
    ``(query_id, group, id, sim, rank)`` with rank <= k per
    (query_id, group).
    """
    import numpy as np
    from pyspark.sql import types as T

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    spaces = sorted(queries[0][1])
    # Validate up front (driver-side) rather than KeyError mid-job:
    # every query must carry the same space set, and default_space must
    # be a member because unmatched corpus rows score against it.
    for qid, vecs in queries:
        if sorted(vecs) != spaces:
            raise ValueError(
                f"dual_space_topk_blocked: query {qid} has spaces "
                f"{sorted(vecs)}; all queries must share {spaces}"
            )
    if default_space not in queries[0][1]:
        raise ValueError(
            f"dual_space_topk_blocked: default_space {default_space!r} "
            f"not among query spaces {spaces}"
        )
    Qs = {
        sp: np.vstack(
            [np.asarray(q[1][sp], dtype=np.float64) for q in queries]
        )
        for sp in spaces
    }
    nq = len(queries)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("group", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vector_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            groups = pdf[group_col].to_numpy()
            space_arr = pdf[space_col].to_numpy()
            n = len(pdf)
            S = np.empty((n, nq), dtype=np.float64)
            assigned = np.zeros(n, dtype=bool)
            for sp in spaces:
                m = space_arr == sp
                assigned |= m
                if m.any():
                    S[m] = X[m] @ Qs[sp].T
            rest = ~assigned
            if rest.any():
                S[rest] = X[rest] @ Qs[default_space].T
            frames = []
            for g in np.unique(groups):
                mg = groups == g
                Sg = S[mg]
                idg = ids[mg]
                kk = min(k, int(mg.sum()))
                order = topk_rows_2d(Sg, idg, kk)  # (kk, nq) per query
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(
                                qids[None, :], kk, axis=0
                            ).ravel(),
                            "group": g,
                            "id": idg[order].ravel(),
                            "sim": np.take_along_axis(
                                Sg, order, axis=0
                            ).ravel(),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    local = corpus.select(
        F.col(id_col).alias(id_col),
        F.col(group_col).alias(group_col),
        F.col(space_col).alias(space_col),
        F.col(vector_col).alias(vector_col),
    ).mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("query_id", "group").orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_search_l2(
    corpus: DataFrame,
    query_vector: list[float],
    k: int,
    id_col: str = "id",
    vector_col: str = "embedding",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Single-query exact kNN under the L2 metric (the reference's
    ``space='l2'`` index family, vector_index.py:34-44, 139-144):
    top-k by ascending Euclidean distance, with the reference's
    ``similarity = 1 / (1 + dist)`` transform. Same shuffle-free plan
    shape as :func:`knn_search` — scan → project(dist) →
    TakeOrderedAndProject(k); ranking on round(dist, 6) with an id
    tie-break keeps the winner set engine-exact."""
    from multimodal_vector_db_spark.functions.vector import l2_distance

    q = F.array(*[F.lit(float(x)) for x in query_vector])
    cols = payload_cols or [c for c in corpus.columns if c != vector_col]
    scored = corpus.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in cols if c != id_col],
        F.round(l2_distance(F.col(vector_col), q), 6).alias("dist"),
    ).withColumn(
        "sim", F.round(F.lit(1.0) / (F.lit(1.0) + F.col("dist")), 6)
    )
    return scored.orderBy(F.col("dist").asc(), F.col("id").asc()).limit(k)

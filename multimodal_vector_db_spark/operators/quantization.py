"""Product quantization (Q2-Q5) — the reference's ``quantization.py``
re-expressed as Spark plans.

- **train** (Q2, ``quantization.py:28-57``): dim split into
  ``n_subquantizers`` equal slices (divisibility asserted, same as
  ``quantization.py:17-18``); per-subspace KMeans. Two trainers:
  MLlib KMeans (the scale path) and a deterministic data-derived
  codebook (fixed corpus rows as centroids) for oracle-checkable
  encode/decode, mirroring FIXTURES.md §6.
- **encode** (Q3, ``quantization.py:59-91``): per slice, argmin L2
  distance over the codebook → small int code. Ties break to the
  lowest code (deterministic; the reference's np.argmin first-hit).
- **decode** (Q4, ``quantization.py:93-118``): centroid lookup +
  concatenate.
- **ratio** (Q5, ``quantization.py:120-124``): ``dim*4 / n_sub``.

Encoding is pure Column expressions over a broadcast codebook — no
shuffle, embarrassingly parallel, exactly what you want for a 100 TB
re-encode pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions._cache import cached_expr
from multimodal_vector_db_spark.functions.vector import dot


def _slice(v: Column, sub: int, subdim: int) -> Column:
    return F.slice(v, sub * subdim + 1, subdim)


@cached_expr
def _sq_dist(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² in DOUBLE, sequential fold (oracle-bit-exact).

    The squares are folded directly over ONE diff array
    (``acc + d·d``) instead of ``dot(diff, diff)`` — zip_with(diff,
    diff) evaluated the whole diff expression tree TWICE per row
    (HOF args get no CSE), which doubled the embedded ``pq_decode``
    lookup work in the encode/decode path (round 12, guide §1.2).
    Same products in the same fold order — bit-identical."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: x.cast("double") - y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, d: acc + d * d,
    )


def data_derived_codebooks(
    corpus: DataFrame,
    n_subquantizers: int,
    n_codes: int,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    start_id: int = 100,
) -> list[list[list[float]]]:
    """Deterministic codebooks: centroids are slices of ``n_codes``
    fixed corpus rows (ids start_id..start_id+n_codes-1). Not a learned
    quantizer — the fixture that makes encode/decode oracle-checkable
    without k-means nondeterminism (FIXTURES.md §6)."""
    # no .orderBy before the collect: a global sort (even of 4 rows)
    # plans a range-partitioning SAMPLING job first — two extra jobs per
    # call, ~2s of pure overhead at bench scale. The id filter pushes
    # down to the scan; the driver sorts the handful of rows itself.
    rows = sorted(
        corpus.where(
            (F.col(id_col) >= start_id) & (F.col(id_col) < start_id + n_codes)
        )
        .select(id_col, vector_col)
        .collect(),
        key=lambda r: r[0],
    )
    rows = [(r[1],) for r in rows]
    dim = len(rows[0][0])
    assert dim % n_subquantizers == 0  # quantization.py:17-18
    subdim = dim // n_subquantizers
    return [
        [
            [float(x) for x in r[0][s * subdim : (s + 1) * subdim]]
            for r in rows
        ]
        for s in range(n_subquantizers)
    ]


def kmeans_codebooks(
    corpus: DataFrame,
    n_subquantizers: int,
    n_codes: int = 256,
    vector_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,  # quantization.py:28-57 uses 10 iters
) -> list[list[list[float]]]:
    """Q2 scale path: MLlib KMeans per subspace slice."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(corpus.select(vector_col).first()[0])
    assert dim % n_subquantizers == 0
    subdim = dim // n_subquantizers
    # one cached pass produces every subspace slice; each per-subspace
    # KMeans then iterates over the cached slices instead of re-reading
    # and re-slicing the corpus max_iter times
    sliced = corpus.select(
        *[
            array_to_vector(
                _slice(F.col(vector_col), s, subdim).cast("array<double>")
            ).alias(f"f{s}")
            for s in range(n_subquantizers)
        ]
    ).persist()
    try:
        books = []
        for s in range(n_subquantizers):
            model = KMeans(
                k=n_codes, seed=seed, maxIter=max_iter, featuresCol=f"f{s}"
            ).fit(sliced)
            books.append([c.tolist() for c in model.clusterCenters()])
        return books
    finally:
        sliced.unpersist()


@cached_expr
def _books_lit(codebooks: list[list[list[float]]]) -> Column:
    """The whole codebook as one ARRAY<ARRAY<ARRAY<DOUBLE>>> literal."""
    return F.lit(
        [[[float(x) for x in c] for c in book] for book in codebooks]
    )


@cached_expr
def pq_encode_codes(
    vector_col: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Q3 as one expression: ARRAY<BIGINT> of per-subspace argmin codes.
    Tie-break: lowest code (array_min on (dist, code) structs).

    Built as nested higher-order transforms over a single codebook
    literal, not one unrolled ``_sq_dist`` tree per (sub, code): the
    unrolled form made Catalyst analysis+codegen of a fresh plan cost
    ~10× the actual execution at bench scale (2.6 s vs 0.2 s). The
    arithmetic inside the lambda is the same cast-then-subtract
    sequential fold, so distances stay oracle-bit-exact."""
    n_sub = len(codebooks)
    subdim = len(codebooks[0][0])
    bk = _books_lit(codebooks)

    def per_sub(s: Column) -> Column:
        # the subspace slice is STAGED as a one-element-array lambda
        # binding (transform over array(slice)) so it is materialized
        # once per (row, subspace): HOF bodies get no codegen CSE, and
        # embedding the slice directly in _sq_dist re-evaluated the
        # 16-element copy once per CENTROID (n_codes× the work —
        # round 13, guide §1.2). Same slice content, same distances,
        # same argmin — bit-identical codes.
        sl = F.slice(vector_col, s * subdim + 1, subdim)

        def min_code(sl_v: Column) -> Column:
            pairs = F.transform(
                F.element_at(bk, (s + 1).cast("int")),
                lambda cent, i: F.struct(
                    _sq_dist(sl_v, cent).alias("dist"),
                    i.cast("long").alias("code"),
                ),
            )
            return F.array_min(pairs)["code"]

        return F.element_at(F.transform(F.array(sl), min_code), 1)

    return F.transform(F.sequence(F.lit(0), F.lit(n_sub - 1)), per_sub)


@cached_expr
def pq_decode(codes_col: Column, codebooks: list[list[list[float]]]) -> Column:
    """Q4: codes → concatenated centroid slices (ARRAY<DOUBLE>)."""
    n_sub = len(codebooks)
    bk = _books_lit(codebooks)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda s: F.element_at(
                F.element_at(bk, (s + 1).cast("int")),
                (F.element_at(codes_col, (s + 1).cast("int")) + 1).cast("int"),
            ),
        )
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    return corpus.withColumn(
        codes_col, pq_encode_codes(F.col(vector_col), codebooks)
    )


def compression_ratio(dim: int, n_subquantizers: int) -> float:
    """Q5 (``quantization.py:120-124``): fp32 bytes / one-byte codes."""
    return dim * 4.0 / n_subquantizers


def adc_distance_table(
    query_vector: list[float], codebooks: list[list[list[float]]]
) -> list[list[float]]:
    """Asymmetric-distance lookup table: ``table[s][c]`` = squared L2
    distance between the query's subspace-s slice and centroid c of
    codebook s. Driver-side (n_sub × n_codes doubles — tiny), sequential
    left-to-right fold matching :func:`_sq_dist` / the DuckDB oracle.

    This is the classic PQ search trick (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 §IV): after
    this O(n_sub·n_codes·subdim) precompute, scoring a corpus row costs
    n_sub table lookups instead of a full d-dimensional distance.
    """
    n_sub = len(codebooks)
    subdim = len(codebooks[0][0])
    table: list[list[float]] = []
    for s in range(n_sub):
        qs = [float(x) for x in query_vector[s * subdim : (s + 1) * subdim]]
        row = []
        for c in codebooks[s]:
            d = 0.0
            for x, y in zip(qs, c):
                diff = x - float(y)
                d += diff * diff
            row.append(d)
        table.append(row)
    return table


def adc_search(
    coded: DataFrame,
    query_vector: list[float],
    codebooks: list[list[list[float]]],
    k: int,
    codes_col: str = "pq_codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate kNN over PQ codes by asymmetric distance computation:
    per-row distance = Σ_s table[s][code_s], a pure codegen'd projection
    over the broadcast lookup table → ``TakeOrderedAndProject(k)``.

    The 100 TB shape of PQ search: the corpus is 32× smaller (codes,
    not vectors), scoring is n_sub integer-indexed lookups per row,
    zero shuffle, no Python in the hot path. Reference semantics:
    ``quantization.py:59-118`` (codes) + ``vector_index.py:107-160``
    (top-k contract). Distances are rounded to 6 decimals BEFORE
    ranking so the (dist, id) order is reproducible across engines
    (sum-of-4-doubles fold order differs at ~1e-15).
    """
    luts = [
        F.array(*[F.lit(float(d)) for d in row])
        for row in adc_distance_table(query_vector, codebooks)
    ]
    dist: Column | None = None
    for s, lut in enumerate(luts):
        term = F.element_at(
            lut, F.element_at(F.col(codes_col), s + 1).cast("int") + 1
        )
        dist = term if dist is None else dist + term
    return (
        coded.select(
            F.col(id_col),
            F.round(dist, 6).alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )

"""Result reranking (R1/R2): strategy dispatch + MMR diversity rerank.

Reference semantics (``reranker.py``):
- strategies: 'distance' (identity), 'diversity' (MMR λ=0.5),
  'combined' (MMR λ=0.7); unknown strategy → identity; always truncate
  to top_k afterwards (``reranker.py:17-50``).
- MMR (``reranker.py:52-117``): greedy — seed with the best-by-score
  candidate, then repeatedly pick
  ``argmax λ·rel(d) − (1−λ)·max_{s∈sel} sim(d, s)``;
  candidates lacking an embedding → input returned unchanged
  (``reranker.py:70-77``).

MMR is inherently a small-N sequential greedy loop, so it runs
driver-side over the collected top-N (N ≲ a few hundred) — the
candidate *generation* is the distributed part. Deterministic given its
input: ties broken by candidate order (stable argmax), matching the
reference's ``np.argmax`` first-hit semantics.
"""

from __future__ import annotations

import math

Row = dict


def _cosine(a: list[float], b: list[float]) -> float:
    """reranker.py:135-138 — epsilon-guarded cosine.

    Retained as the REFERENCE SPECIFICATION for :func:`_norm` /
    :func:`_cosine_n` (the norm-cached split the greedy loop actually
    calls): ``_cosine_n(a, _norm(a), b, _norm(b))`` must equal this
    bit-for-bit — pinned by tests/test_rerank.py."""
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb + 1e-8)


def _norm(a: list[float]) -> float:
    """The exact norm term of :func:`_cosine` — same fold, same bits."""
    return math.sqrt(sum(x * x for x in a))


def _cosine_n(a: list[float], na: float, b: list[float], nb: float) -> float:
    """:func:`_cosine` with the two norms precomputed by :func:`_norm`.

    MMR calls cosine O(k·n) times but every candidate's norm is
    CONSTANT — recomputing both norms inside each call was ~2/3 of the
    diversity-rerank wall (profiled 26 ms/call at 345×512-d, round 12,
    guide §1.2). Identical arithmetic: the cached na/nb come from the
    same sequential fold _cosine uses, so every cosine (and therefore
    every greedy selection and tie-break) is bit-identical."""
    return sum(x * y for x, y in zip(a, b)) / (na * nb + 1e-8)


def mmr_rerank(
    candidates: list[Row],
    top_k: int,
    lambda_param: float = 0.5,
    score_key: str = "sim",
    embedding_key: str = "embedding",
) -> list[Row]:
    """Maximal Marginal Relevance over an ordered candidate list."""
    if not candidates:
        return []
    if any(embedding_key not in c or c[embedding_key] is None for c in candidates):
        return candidates[:top_k]  # reranker.py:70-77

    remaining = list(candidates)
    # seed: best by relevance score (stable first-max)
    best_i = max(range(len(remaining)), key=lambda i: (remaining[i][score_key], -i))
    selected = [remaining.pop(best_i)]
    # running max-similarity per remaining candidate (round 10): the
    # greedy's max over the selected set only grows by the ONE item
    # appended each round, so each candidate needs one new cosine per
    # round instead of recomputing the whole set — O(k·n) cosines,
    # not O(k²·n). max() is order-independent, so every value (and
    # therefore every selection and tie-break) is bit-identical to the
    # recompute-everything form the oracle replays.
    if not remaining or len(selected) >= top_k:
        return selected  # top_k=1: no seed cosines needed
    # norms are constant per candidate — compute each ONCE (see
    # _cosine_n; bit-identical to recomputing inside every cosine)
    norms = [_norm(c[embedding_key]) for c in remaining]
    sel_norm = _norm(selected[0][embedding_key])
    best_sim = [
        _cosine_n(c[embedding_key], norms[i],
                  selected[0][embedding_key], sel_norm)
        for i, c in enumerate(remaining)
    ]
    while remaining and len(selected) < top_k:
        best_i, best_val = 0, -float("inf")
        for i, cand in enumerate(remaining):
            val = (
                lambda_param * cand[score_key]
                - (1.0 - lambda_param) * best_sim[i]
            )
            if val > best_val:  # strict: first max wins (np.argmax)
                best_i, best_val = i, val
        new_sel = remaining.pop(best_i)
        new_norm = norms.pop(best_i)
        best_sim.pop(best_i)
        selected.append(new_sel)
        for i, cand in enumerate(remaining):
            s = _cosine_n(
                cand[embedding_key], norms[i],
                new_sel[embedding_key], new_norm,
            )
            if s > best_sim[i]:
                best_sim[i] = s
    return selected


def rerank(
    candidates: list[Row],
    strategy: str = "distance",
    top_k: int | None = None,
    score_key: str = "sim",
    embedding_key: str = "embedding",
) -> list[Row]:
    """R1 dispatch (``reranker.py:17-50``)."""
    top_k = top_k if top_k is not None else len(candidates)
    if strategy == "diversity":
        out = mmr_rerank(candidates, top_k, 0.5, score_key, embedding_key)
    elif strategy == "combined":
        out = mmr_rerank(candidates, top_k, 0.7, score_key, embedding_key)
    else:  # 'distance' or unknown → identity order
        out = list(candidates)
    return out[:top_k]

"""Host-normalized comparison of two BENCH artifacts (round 10).

Rounds 8→9 showed the problem this tool closes: every headline query
(including untouched plain SQL) shifted by a uniform ~1.4× between
rounds, and the only evidence it was the HOST was the uniformity
argument. From round 10 every bench artifact carries
``host_calibration`` — three fixed CPU probes measured in the same
process as the queries — so a cross-round delta can be normalized
mechanically:

    normalized_ratio(q) = (t_new / t_old) / (probe_new / probe_old)

A normalized ratio ≈ 1.0 means the query moved WITH the host; > 1.0
means a real regression beyond host drift. The Spark-job probe
(``spark_sum_range_20m_ms``) is the default normalizer for headline
queries (same JVM/scheduling stack); ``--probe numpy_gemm_768_ms``
normalizes BLAS-bound rows instead.

Usage: python tools/bench_compare.py OLD.json NEW.json [--probe KEY]
       python tools/bench_compare.py OLD.json NEW.json --section KEY
Artifacts without host_calibration (pre-round-10) print raw ratios
with a warning.

``--section ref_scale_16x`` (round 12) compares a bench_detail
section's scalar rows between two bench_detail.json files instead of
the headline queries. Rows that carry a ``*_probe_norm`` twin (the
per-sample probe-normalized median _tm7p emits) are compared on THAT
column — per-sample normalization beats the whole-run probe ratio for
the 16×/64× rows, whose 3× intra-run spread is host drift during the
sample loop itself.
"""

from __future__ import annotations

import json
import sys


def _compare_section(old: dict, new: dict, key: str) -> None:
    so, sn = old.get(key), new.get(key)
    if not (isinstance(so, dict) and isinstance(sn, dict)):
        print(f"section {key!r} missing in one artifact")
        sys.exit(2)
    rows = []
    for k in sorted(set(so) & set(sn)):
        if k.endswith("_probe_norm") or k.endswith("_min"):
            continue  # folded into the base row / floor only
        vo, vn = so[k], sn[k]
        if not isinstance(vo, (int, float)) or not isinstance(
            vn, (int, float)
        ) or isinstance(vo, bool):
            continue
        nk = f"{k}_probe_norm"
        normed = nk in so and nk in sn
        if normed:
            vo, vn = so[nk], sn[nk]
        ratio = vn / vo if vo else float("inf")
        rows.append((k + (" (norm)" if normed else ""), vo, vn, ratio))
    w = max((len(k) for k, *_ in rows), default=5)
    print(f"{'row':<{w}}  {'old':>10} {'new':>10} {'ratio':>6}")
    for k, vo, vn, r in rows:
        flag = "  <-- regression?" if r > 1.25 else (
            "  <-- improvement" if r < 0.8 else "")
        print(f"{k:<{w}}  {vo:>10.3f} {vn:>10.3f} {r:>6.2f}{flag}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    probe_key = "spark_sum_range_20m_ms"
    if "--probe" in sys.argv:
        probe_key = sys.argv[sys.argv.index("--probe") + 1]
    section_key = None
    if "--section" in sys.argv:
        section_key = sys.argv[sys.argv.index("--section") + 1]
        args = [a for a in args if a != section_key]
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    if section_key is not None:
        _compare_section(
            json.load(open(args[0])), json.load(open(args[1])),
            section_key,
        )
        return
    def _load(path: str) -> dict:
        d = json.load(open(path))
        # driver BENCH_r{N}.json wraps the bench line under "parsed"
        return d.get("parsed") or d

    old = _load(args[0])
    new = _load(args[1])
    hc_old = old.get("host_calibration")
    hc_new = new.get("host_calibration")
    if hc_old and hc_new:
        host_ratio = hc_new[probe_key] / hc_old[probe_key]
        print(
            f"host probe {probe_key}: {hc_old[probe_key]} -> "
            f"{hc_new[probe_key]}  (host ratio {host_ratio:.3f})"
        )
    else:
        host_ratio = 1.0
        print(
            "WARNING: host_calibration missing in one artifact "
            "(pre-round-10) — ratios below are RAW, not normalized"
        )
    qo, qn = old.get("queries", {}), new.get("queries", {})
    rows = []
    for q in sorted(set(qo) & set(qn)):
        raw = qn[q] / qo[q] if qo[q] else float("inf")
        rows.append((q, qo[q], qn[q], raw, raw / host_ratio))
    w = max((len(q) for q, *_ in rows), default=5)
    print(f"{'query':<{w}}  {'old_s':>8} {'new_s':>8} {'raw':>6} {'norm':>6}")
    for q, a, b, raw, norm in rows:
        flag = "  <-- regression?" if norm > 1.25 else (
            "  <-- improvement" if norm < 0.8 else "")
        print(f"{q:<{w}}  {a:>8.3f} {b:>8.3f} {raw:>6.2f} {norm:>6.2f}{flag}")
    to = sum(qo[q] for q, *_ in rows)
    tn = sum(qn[q] for q, *_ in rows)
    print(
        f"\ntotal {to:.2f} -> {tn:.2f} s  raw {tn / to:.2f}x  "
        f"normalized {tn / to / host_ratio:.2f}x"
    )


if __name__ == "__main__":
    main()

"""Median-of-N bench artifact: run the HEADLINE section of bench.py N
times back-to-back (nothing else running), persist each run's JSON and
a median summary — the noise-resistant round-over-round comparison the
single-shot BENCH_r{N}.json cannot give on a shared host (observed ~2×
wobble from ambient CPU steal; see SCALE.md).

Usage: python tools/bench_repeat.py [N]  (default 5)

Writes BENCH_repeat.json at the repo root:
  {"runs": [<per-run queries dict>...],
   "median": {q: median-of-N}, "spread": {q: [min, max]},
   "headline_total_median": ..., "n": N, "sf": ...}

Each run is a fresh process (fresh JVM) with
SPARK_GRAFT_BENCH_SECTIONS=headline, so per-run results are
independent and include the warehouse build (excluded from timings).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    env = dict(os.environ, SPARK_GRAFT_BENCH_SECTIONS="headline")
    runs = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')
        ]
        if not line:
            print(f"run {i}: FAILED\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            sys.exit(1)
        rec = json.loads(line[-1])
        runs.append(rec)
        print(
            f"run {i}: headline_total={rec['value']}s "
            f"(prep {rec['prep_sec']}s)",
            flush=True,
        )

    queries = list(runs[0]["queries"])
    med = {q: round(median([r["queries"][q] for r in runs]), 4) for q in queries}
    spread = {
        q: [
            round(min(r["queries"][q] for r in runs), 4),
            round(max(r["queries"][q] for r in runs), 4),
        ]
        for q in queries
    }
    summary = {
        "n": n,
        "sf": runs[0]["sf"],
        "headline_total_median": round(median([r["value"] for r in runs]), 4),
        "headline_total_runs": [r["value"] for r in runs],
        # per-run host probes (round 10): divide a run's total by its
        # probe ratio before reading cross-round deltas as code
        "host_calibration_runs": [
            r.get("host_calibration") for r in runs
        ],
        "median": med,
        "spread": spread,
        "runs": [r["queries"] for r in runs],
        # per-sample [gemm_probe_ms, sample_sec] pairs per query per
        # run (round 13): the sample-level host anchor
        "sample_probes_runs": [r.get("queries_probe_ms") for r in runs],
    }
    with open(os.path.join(REPO, "BENCH_repeat.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in ("n", "sf", "headline_total_median", "headline_total_runs")}))


if __name__ == "__main__":
    main()

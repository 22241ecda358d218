"""One-shot bench artifact refresh with a GUARANTEED-fresh 16× section.

The all-sections ``bench.py`` run deliberately carries the 16×
reference-scale numbers forward from the last dedicated run (a long
all-sections process accumulates JVM/Python-worker state that inflates
late sections ~3× — bench.py documents the measurement). That makes it
possible for a round to ship a stale 16× section if nobody re-ran the
dedicated pass. This driver closes the gap mechanically:

  1. run ``SPARK_GRAFT_BENCH_SECTIONS=ref16x python bench.py`` in a
     FRESH subprocess (the honest 16× measurement, stamped
     ``measured_at``/``carried_forward: false``);
  2. run the all-sections ``python bench.py`` in a second fresh
     subprocess, which merges the step-1 section verbatim.

Run this instead of bare ``python bench.py`` whenever committing
BENCH/bench_detail artifacts. Extra args pass through to bench.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    passthrough = sys.argv[1:]
    env16 = dict(os.environ, SPARK_GRAFT_BENCH_SECTIONS="ref16x")
    for label, env in (("ref16x", env16), ("all", dict(os.environ))):
        print(f"== bench_all: {label} pass ==", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *passthrough],
            env=env,
            cwd=REPO,
        )
        if proc.returncode != 0:
            sys.exit(proc.returncode)


if __name__ == "__main__":
    main()

"""Serving routes: the exact-vs-IVF planner contract, end to end.

The engine's quality contract is ``recall_floor``:

- ``recall_floor=1.0`` (the default) — every search is EXACT. The only
  dispatch is the scorer (codegen'd HOF plan vs blocked BLAS), and both
  return identical winner sets.
- ``recall_floor < 1.0`` — the caller declares slack, and
  ``route="auto"`` may serve from the IVF index built by
  ``build_ann_index``. nprobe comes from the index's OWN calibration
  curve (measured recall at build time on sampled corpus queries);
  when no measured point honors the floor, the planner stays exact.
  The measured per-query costs also decide WHETHER IVF is worth it —
  on a corpus where the exact blocked scan is cheaper, the auto route
  keeps it.
- Ingests after the build are absorbed transparently: the route
  auto-appends new rows to the existing cells (same L2 rule as the
  build) and keeps serving IVF, unless the appended batch's measured
  embedding drift exceeds the threshold — then the planner falls back
  to exact until a rebuild (the honest answer when new rows don't
  live in the fitted cell structure).
- Every decision is logged on ``engine.last_route`` (route, reason,
  nprobe); ``route="exact"``/``"ivf"`` force a path, and an explicit
  ``scorer=`` always forces exact (it is the exact-parity surface;
  combining it with ``route="ivf"`` raises — a contradiction).
- Round 10 adds a tier ABOVE all of this: when the space's vector
  mass fits ``local_exact_budget_bytes`` (256 MB default), single and
  batch searches are served from a driver-resident corpus copy with
  the same BLAS kernel + tie-break as the blocked scorer — exact (so
  any floor is honored) and free of the per-job scheduling floor.
  This demo pins ``local_exact_budget_bytes=0`` to showcase the SPARK
  planner (the path every over-budget corpus takes); the first
  section shows the local tier once.

Run:  python examples/serving_routes.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from multimodal_vector_db_spark.engine import MultiModalSearchEngine  # noqa: E402
from multimodal_vector_db_spark.session import get_spark  # noqa: E402


def show(tag: str, eng: MultiModalSearchEngine) -> None:
    r = eng.last_route
    extra = f" nprobe={r['nprobe']}" if r.get("nprobe") else ""
    print(f"  [{tag}] route={r['route']}{extra}\n      reason: {r['reason']}")


def main() -> None:
    spark = get_spark("serving_routes")

    # 0. the round-10 default: under the local byte budget a single
    #    interactive search never launches a Spark job at all
    eng0 = MultiModalSearchEngine(spark, dim=32)
    eng0.batch_ingest(
        [{"content": f"document number {i}", "modality": "text"}
         for i in range(300)]
    )
    eng0.search("document number 7", k=3)
    show("default engine, corpus under local budget", eng0)

    # everything below pins local_exact_budget_bytes=0 to demonstrate
    # the SPARK planner — the path any over-budget corpus takes
    eng = MultiModalSearchEngine(spark, dim=32, blocked_threshold_cells=10,
                                 local_exact_budget_bytes=0)
    eng.batch_ingest(
        [{"content": f"document number {i}", "modality": "text"}
         for i in range(300)]
    )

    # 1. default floor: always exact
    eng.search("document number 7", k=3)
    show("default floor=1.0", eng)

    # 2. declared slack, but no index yet -> exact with the reason
    eng.search("document number 7", k=3, recall_floor=0.9)
    show("floor=0.9, no index", eng)

    # 3. build + calibrate: the index measures its own recall/cost
    #    curve on sampled corpus queries (self-hits excluded)
    stats = eng.build_ann_index(space="clip", n_clusters=16,
                                calibration_queries=32)
    cal = stats["calibration"]
    print("  calibration points (fraction -> measured recall, ms/q):")
    for p in cal["points"]:
        print(f"    {p['fraction']:<7} R@{cal['k']}={p['recall']:.3f} "
              f"{p['ms_per_q']:.1f} ms/q")
    print(f"    exact: {cal['exact_ms_per_q']:.1f} ms/q "
          f"(calibration cost {cal['calibration_sec']}s)")

    # 4. the auto route now picks the cheapest point that HONORS the
    #    floor — or stays exact if exact measured cheaper / no point
    #    meets the floor (the decision is in the logged reason)
    eng.search("document number 7", k=3, recall_floor=0.9)
    show("floor=0.9, calibrated", eng)
    # a floor the measured curve CAN honor routes IVF at the cheapest
    # honoring point (if IVF also measured cheaper than exact)
    eng.search("document number 7", k=3, recall_floor=0.6)
    show("floor=0.6, calibrated", eng)

    # 5. ingest-then-append: new rows are absorbed into the existing
    #    cells (no rebuild) with the batch's measured drift reported —
    #    the route runs this auto-append transparently whenever it is
    #    about to serve IVF over stale coverage; shown explicitly here
    #    so the drift report is visible regardless of the cost gate
    eng.batch_ingest(
        [{"content": f"late document {i}", "modality": "text"}
         for i in range(20)]
    )
    st = eng.append_to_ann_index("clip")
    print(f"  appended {st['appended']} rows, "
          f"drift={st['drift']:.2f}x (threshold {eng.drift_threshold})")
    hits = eng.search("late document 7", k=3, recall_floor=0.9)
    show("after ingest (auto-append path)", eng)
    print(f"  late doc retrievable: "
          f"{hits[0]['content'] == 'late document 7'}")

    # 6. forced routes + the exact-parity scorer override
    eng.search("document number 7", k=3, route="ivf", recall_floor=0.9)
    show("forced route=ivf", eng)
    eng.search("document number 7", k=3, scorer="blocked", recall_floor=0.9)
    show("scorer override", eng)

    # 7. round 11 — maintenance ownership: with defer_recalibration
    #    a stale calibration curve never ambushes a query (exact +
    #    flag; maintain() owns the refresh and reports its cost)
    spark = eng.spark
    deferred = MultiModalSearchEngine(
        spark, dim=eng.dim, local_exact_budget_bytes=0,
        blocked_threshold_cells=10, defer_recalibration=True,
    )
    deferred.batch_ingest(
        [{"content": f"deferred doc {i}", "modality": "text"}
         for i in range(120)]
    )
    deferred.build_ann_index(space="clip", calibration_queries=16)
    deferred.batch_ingest(
        [{"content": f"deferred late {i}", "modality": "text"}
         for i in range(60)]  # outgrows the curve by 50%
    )
    deferred.search("deferred doc 7", k=3, recall_floor=0.6)
    show("stale curve, defer_recalibration=True", deferred)
    st = deferred.maintain("clip")
    print(f"  maintain(): recalibrated={st['recalibrated']} "
          f"in {st['calibration_sec']:.2f}s")
    deferred.search("deferred doc 7", k=3, recall_floor=0.6)
    show("after maintain()", deferred)

    # 8. round 11 — the interactive cross-modal call: the rows form
    #    skips the DataFrame materialization floor (~250 ms) entirely
    rows = eng.compare_modalities_rows("document number 7",
                                       k_per_modality=2)
    print(f"  compare_modalities_rows -> {len(rows)} rows, "
          f"route={eng.last_route['route']}")


if __name__ == "__main__":
    main()

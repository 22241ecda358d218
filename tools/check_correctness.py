"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at the given
scale factor, runs the matching ``oracle_sql()`` in DuckDB over the same
parquet tables, and compares row count, schema (column names), and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
       python tools/check_correctness.py --json OUT.json [sf_dir]

With ``--json`` a driver-format artifact (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err per query) is written for
every registered query — the committed evidence for queries outside the
driver's 50-query verification window.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value) -> str:
    """Canonical string form of a cell for hashing (shared across engines)."""
    import datetime
    import math

    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return str(value)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as entrymod
    from multimodal_vector_db_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Fixture-backed oracles (ivf_centroids / pca_basis / opq_rot) embed
    # the DRIVER-scale fixture path (sf0.01 — the scale the driver gate
    # runs at), while the Spark bodies resolve their fixture from
    # sf_dir. Running this tool at another sf would otherwise compare
    # the two engines against DIFFERENT fixtures — a guaranteed hash
    # mismatch reported as a correctness failure. Each sf has its own
    # committed fixture (tools/build_fixtures.py), so retarget the
    # oracle's fixture path to the sf under test.
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    if sf_name != "sf0.01":
        retargeted = {
            n: sql.replace("_sf0.01.parquet", f"_{sf_name}.parquet")
            for n, sql in oracles.items()
        }
        # The textual retarget is only sound if every fixture-referencing
        # oracle follows the `…_sf0.01.parquet` naming — an oracle whose
        # fixture path doesn't would silently keep pointing at the
        # sf0.01 fixture and reproduce the cross-fixture mismatch this
        # patch exists to fix. Fail loudly instead.
        stale = [
            n for n, sql in retargeted.items()
            if "fixtures/" in sql and f"_{sf_name}.parquet" not in sql
        ]
        if stale:
            raise SystemExit(
                f"fixture-backed oracles not retargeted to {sf_name} "
                f"(fixture path must end _sf0.01.parquet to be "
                f"rewritten): {stale}"
            )
        oracles = retargeted
    n_pass = n_fail = n_noracle = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            report[name] = {"err": f"spark error: {e}"}
            n_fail += 1
            continue
        # The DRIVER's canonicalizer (pandas sort_values) crashes on any
        # list-typed cell; reject non-scalar output schemas locally so the
        # gate here is at least as strict as the driver's.
        nonscalar = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nonscalar:
            print(
                f"FAIL {name}: non-scalar output columns "
                f"(driver canonicalizer rejects lists): {nonscalar}"
            )
            report[name] = {"err": f"non-scalar output columns: {nonscalar}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"---- {name}: no oracle ({len(srows)} rows, {time.time()-t0:.1f}s)")
            report[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "err": None,
                "note": "no oracle (rows-only check)",
            }
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            report[name] = {"err": f"duckdb error: {e}"}
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
                # show first differing canonical line for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sl = sorted("|".join(canon(r[i]) for i in so) for r in srows)
                ol = sorted("|".join(canon(r[i]) for i in oo) for r in orows)
                for a, b in zip(sl, ol):
                    if a != b:
                        problems.append(f"  spark:  {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        report[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()

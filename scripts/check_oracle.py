"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf directory, then compares row count, sorted-column schema,
and an order-insensitive value hash (floats canonicalized via repr of the
exact double). DuckDB results are fetched through pandas (``fetchdf``) to
match the driver's canonicalizer — see ``oracle_compare.fetch_duckdb``.
Exits nonzero on any mismatch.

Usage: python scripts/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a per-query artifact in the driver's
CORRECTNESS format (rows/schema/hash match booleans + row counts), so each
round can commit reproducible full-registry evidence (LOCAL_ORACLE_r*.json)
covering queries outside the driver's check window.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ambient_sound_analysis_api_spark.golden import (  # noqa: E402
    GOLDEN_QUERIES,
    check_golden,
    load_golden,
    record_golden,
)
from ambient_sound_analysis_api_spark.oracle_compare import (  # noqa: E402
    canon_value,
    fetch_duckdb,
    fetch_spark_pandas,
    hash_rows,
)
from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402
from ambient_sound_analysis_api_spark.sketch_bounds import (  # noqa: E402
    BOUNDS_QUERIES,
    bounds_problems_for,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    update_golden = False
    if "--update-golden" in args:
        update_golden = True
        args.remove("--update-golden")
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [--json OUT.json] "
                  "[--update-golden] [sf_dir] [query ...]",
                  file=sys.stderr)
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = fetch_spark_pandas(sdf)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {e}"[:500],
            }
            continue
        if name not in oracles:
            entry = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle",
            }
            if name in BOUNDS_QUERIES:
                probs = bounds_problems_for(name, con, scols, srows)
                if probs:
                    failures.append((name, "; ".join(probs)))
                    print(f"FAIL  {name}: " + "; ".join(probs))
                    entry.update(err="; ".join(probs)[:500],
                                 checked_by="bounds_vs_exact")
                else:
                    print(f"ok    {name}: {len(srows)} rows, estimates "
                          f"within published error bounds of exact "
                          f"({time.time() - t0:.1f}s)")
                    entry.update(rows_match=True, err=None,
                                 checked_by="bounds_vs_exact")
            elif name in GOLDEN_QUERIES:
                if update_golden:
                    path = record_golden(name, sf_dir, scols, srows)
                    print(f"golden-updated  {name}: {len(srows)} rows -> "
                          f"{os.path.relpath(path, REPO)}")
                    entry.update(err="golden_updated")
                else:
                    golden = load_golden(name, sf_dir)
                    if golden is None:
                        print(f"rows-only  {name}: {len(srows)} rows "
                              f"(no golden at this sf) "
                              f"({time.time() - t0:.1f}s)")
                        entry.update(err="no_golden_at_sf")
                    else:
                        status, probs = check_golden(
                            golden, sf_dir, scols, srows
                        )
                        if status == "ok":
                            print(f"ok    {name}: {len(srows)} rows == "
                                  f"committed golden "
                                  f"({time.time() - t0:.1f}s)")
                            entry.update(
                                rows_match=True, schema_match=True,
                                hash_match=True, err=None,
                                checked_by="golden_exact",
                            )
                        elif status == "stale":
                            print(f"WARN  {name}: golden inputs stale — "
                                  f"testdata regenerated since recording; "
                                  f"rows-only ({len(srows)} rows)")
                            entry.update(err="golden_stale_inputs")
                        else:
                            failures.append((name, "; ".join(probs)))
                            print(f"FAIL  {name}: " + "; ".join(probs))
                            entry.update(err="; ".join(probs)[:500],
                                         checked_by="golden_exact")
            else:
                # plain rows-only check: empty output is the only failure
                # signal available (golden/bounds queries above judge
                # emptiness against their recorded expectation instead)
                if len(srows) == 0:
                    failures.append((name, "rows-only query returned 0 rows"))
                print(f"rows-only  {name}: {len(srows)} rows "
                      f"({time.time() - t0:.1f}s)")
            results[name] = entry
            continue
        # golden-belt queries that ALSO carry a SQL oracle: --update-golden
        # refreshes their committed fixtures (regression belt across
        # rounds), then the normal oracle compare below still runs
        if update_golden and name in GOLDEN_QUERIES:
            path = record_golden(name, sf_dir, scols, srows)
            print(f"golden-updated  {name}: {len(srows)} rows -> "
                  f"{os.path.relpath(path, REPO)}")
        try:
            dcols, drows = fetch_duckdb(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": f"duckdb error: {e}"[:500],
            }
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            hs, hd = hash_rows(scols, srows), hash_rows(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show first differing canonical rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                cs = sorted("|".join(canon_value(r[i]) for i in order_s) for r in srows)
                cd = sorted("|".join(canon_value(r[i]) for i in order_d) for r in drows)
                for a, b in zip(cs, cd):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}")
                        problems.append(f"  duck : {b[:200]}")
                        break
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
        results[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(problems)[:500] if problems else None,
        }

    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1)
        print(f"wrote {json_out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for name, why in failures:
            print(f"  {name}: {why.splitlines()[0]}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

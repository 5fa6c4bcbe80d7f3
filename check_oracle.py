#!/usr/bin/env python
"""Local driver-mimic correctness checker.

Runs every registered query on Spark and its DuckDB oracle side by side at
sf0.01 (or --sf-dir), then compares row count, sorted column names, and an
order-insensitive canonical value hash — the same contract the round driver
applies. Queries without an oracle get a rows-only check.

Usage: python check_oracle.py [--sf-dir DIR] [--only name1,name2] [-v]
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import math
import sys
import time

import duckdb

from input_data_pipeline_spark.plans.registry import _load_all, _REGISTRY
from input_data_pipeline_spark.session import get_spark
from input_data_pipeline_spark.tables import TABLE_NAMES


def canon(v) -> str:
    """Canonical string for one cell — FULL precision.

    Deliberately stricter than any plausible driver canonicalizer: floats
    compare by repr (shortest round-trip), so any engine/oracle float
    divergence is locally red. Oracle-checked queries should therefore emit
    integer/string/date cells only (enforced by tests/test_registry_contract).
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_digest(cols: list[str], rows: list[tuple]) -> str:
    """Order-insensitive hash: columns sorted by name, rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    _load_all()
    names = list(_REGISTRY)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in names:
        spec = _REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh, oh = table_digest(scols, srows), table_digest(ocols, orows)
            if sh != oh:
                problems.append(f"value hash spark={sh} oracle={oh}")
                if args.verbose:
                    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                    s_set = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                    o_set = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                    for a, b in zip(s_set, o_set):
                        if a != b:
                            print(f"  spark : {a}\n  oracle: {b}")
                            break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

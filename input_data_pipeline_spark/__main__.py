"""CLI: run any registered query by name against a testdata directory.

    python -m input_data_pipeline_spark <query> [--sf-dir DIR] [--explain] [-n N]
    python -m input_data_pipeline_spark --list

Drop-in exploration surface for the engine: list the registry, run one
query, show its rows and (optionally) the executed physical plan.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(prog="input_data_pipeline_spark")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true", help="print executed plan")
    ap.add_argument("-n", type=int, default=20, help="rows to show")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    from input_data_pipeline_spark.plans.registry import _REGISTRY, _load_all

    _load_all()
    if args.list or not args.query:
        for name, spec in sorted(_REGISTRY.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            doc = (spec.doc or "").strip().splitlines()[0][:70] if spec.doc else ""
            print(f"{name:32} [{oracle:9}] {doc}")
        return 0
    if args.query not in _REGISTRY:
        print(f"unknown query {args.query!r}; --list shows all", file=sys.stderr)
        return 2

    from input_data_pipeline_spark.session import get_spark

    spark = get_spark(f"cli:{args.query}")
    t0 = time.perf_counter()
    df = _REGISTRY[args.query].fn(spark, args.sf_dir)
    df.show(args.n, truncate=80)
    print(f"[{args.query}] {df.count()} rows in "
          f"{time.perf_counter() - t0:.2f}s at {args.sf_dir}")
    if args.explain:
        print(df._jdf.queryExecution().executedPlan().toString())
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

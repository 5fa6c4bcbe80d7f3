#!/usr/bin/env python
"""Scale-growth evidence for the 6 LLM-core anchor queries.

Runs each anchor at sf0.01 and sf0.1 (fresh SparkSession per scale factor,
fixed run order) capturing per-query shuffle-write / input bytes from the
AppStatusStore, then writes SCALE_GROWTH_local.json with the growth ratios.

The claim under test: shuffle volume grows ~linearly with input — for a 10x
data step, shuffle_growth <= LINEARITY_C * max(input_growth, 10). A
super-linear exchange (the O(n^2) failure mode of similarity self-joins)
would show up here as a ratio far above the data step: at 10x data an
all-pairs join writes ~100x the shuffle.

Usage: python measure_scale_growth.py [--small DIR] [--large DIR]
"""

from __future__ import annotations

import argparse
import json

from input_data_pipeline_spark.plans.metrics import growth_report, measure_anchors
from input_data_pipeline_spark.session import get_spark

# Allowed headroom over proportional growth. Banded LSH and df-capped joins
# are linear in rows but candidate-pair counts wobble with corpus content;
# 1.5x over the data step is comfortably below the ~10x a quadratic shape
# would show at a 10x step.
LINEARITY_C = 1.5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--large", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="SCALE_GROWTH_local.json")
    args = ap.parse_args()

    results = {}
    for key, sf_dir in (("small", args.small), ("large", args.large)):
        spark = get_spark(f"scale_growth_{key}")
        results[key] = measure_anchors(spark, sf_dir)
        spark.stop()

    report = growth_report(results["small"], results["large"])
    ok = True
    for name, r in report.items():
        data_step = max(r["input_growth"], 10.0)
        bound = LINEARITY_C * data_step
        r["bound"] = round(bound, 2)
        r["linear"] = r["shuffle_growth"] <= bound
        ok &= r["linear"]
        print(
            f"{name}: shuffle x{r['shuffle_growth']} input x{r['input_growth']} "
            f"(bound x{r['bound']}) -> {'OK' if r['linear'] else 'SUPER-LINEAR'}"
        )

    payload = {
        "small_dir": args.small,
        "large_dir": args.large,
        "linearity_c": LINEARITY_C,
        "all_linear": ok,
        "anchors": report,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}; all_linear={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

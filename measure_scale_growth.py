#!/usr/bin/env python
"""Scale-growth evidence for the anchor queries (plans.metrics.ANCHORS —
the 6 LLM-core anchors plus the round-8 curation operators, 10 as of r8).

Runs each anchor at THREE scale factors (default sf0.001 → sf0.01 →
sf0.1; fresh SparkSession per scale, fixed run order) capturing per-query
shuffle-write / input bytes from the AppStatusStore, then writes
SCALE_GROWTH_local.json with the per-step growth ratios AND the fitted
log-log growth exponent across all points.

The claim under test: shuffle volume grows ~linearly with input. Two
checks, because each catches what the other can't:

- per step: shuffle_growth <= LINEARITY_C * max(input_growth, 10) — a
  quadratic exchange writes ~100x the shuffle on a 10x step and fails
  immediately;
- across steps: the least-squares slope of log(shuffle) vs log(input)
  must stay <= EXPONENT_BOUND — a c*n + d*n^2 mixture can sneak under a
  single 15x-bounded ratio, but it bends the three-point log-log line
  and the fitted exponent gives it away.

Usage: python measure_scale_growth.py [--dirs D1 D2 D3 ...] [--out FILE]
"""

from __future__ import annotations

import argparse
import json

from input_data_pipeline_spark.plans.metrics import (
    fit_exponent,
    growth_report,
    measure_anchors,
)
from input_data_pipeline_spark.session import get_spark

# Allowed headroom over proportional growth per step. Banded LSH and
# df-capped joins are linear in rows but candidate-pair counts wobble with
# corpus content; 1.5x over the data step is comfortably below the ~10x a
# quadratic shape would show at a 10x step.
LINEARITY_C = 1.5
# Allowed fitted log-log slope. 1.0 is exactly proportional; the headroom
# absorbs per-run wobble and sub-linear fixed overheads at the small end
# (which BEND the fit upward when the big scales dominate).
EXPONENT_BOUND = 1.1

_DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", default=_DEFAULT_DIRS,
                    help="scale-factor directories, smallest first (>=2)")
    ap.add_argument("--out", default="SCALE_GROWTH_local.json")
    args = ap.parse_args()
    if len(args.dirs) < 2:
        ap.error("need at least two scale directories")

    per_scale = []
    for i, sf_dir in enumerate(args.dirs):
        spark = get_spark(f"scale_growth_{i}")
        per_scale.append(measure_anchors(spark, sf_dir))
        spark.stop()

    ok = True
    anchors: dict[str, dict] = {}
    for name in per_scale[0]:
        points = [per_scale[i][name] for i in range(len(args.dirs))]
        steps = []
        linear = True
        for i in range(len(points) - 1):
            r = growth_report(
                {name: points[i]}, {name: points[i + 1]}
            )[name]
            data_step = max(r["input_growth"], 10.0)
            bound = LINEARITY_C * data_step
            step_ok = r["shuffle_growth"] <= bound
            linear &= step_ok
            steps.append({
                "from": args.dirs[i],
                "to": args.dirs[i + 1],
                "shuffle_growth": r["shuffle_growth"],
                "input_growth": r["input_growth"],
                "bound": round(bound, 2),
                "linear": step_ok,
            })
        exponent = round(fit_exponent(points), 3)
        exp_ok = exponent <= EXPONENT_BOUND
        linear &= exp_ok
        ok &= linear
        anchors[name] = {
            "points": points,
            "steps": steps,
            "exponent": exponent,
            "exponent_ok": exp_ok,
            "linear": linear,
        }
        step_str = " ".join(f"x{s['shuffle_growth']}" for s in steps)
        print(
            f"{name}: shuffle steps [{step_str}] exponent {exponent} "
            f"(bound {EXPONENT_BOUND}) -> {'OK' if linear else 'SUPER-LINEAR'}"
        )

    payload = {
        "dirs": args.dirs,
        "linearity_c": LINEARITY_C,
        "exponent_bound": EXPONENT_BOUND,
        "all_linear": ok,
        "anchors": anchors,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}; all_linear={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

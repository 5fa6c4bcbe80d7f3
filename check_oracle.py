#!/usr/bin/env python
"""Local driver-mimic correctness checker.

Runs every registered query on Spark and its DuckDB oracle side by side at
sf0.01 (or --sf-dir), then compares row count, sorted column names, and an
order-insensitive canonical value hash — the same contract the round driver
applies. Queries without an oracle get a rows-only check.

Usage: python check_oracle.py [--sf-dir DIR] [--only name1,name2] [-v]
                              [--driver-canon]

``--driver-canon`` fetches the DuckDB side via ``.df()`` (pandas/Arrow)
instead of ``fetchall()``. A pandas fetch materializes HUGEINT (int128 —
what DuckDB silently widens SUM(BIGINT) to) as float64, so an uncast
integer oracle cell becomes ``123.0`` while Spark says ``123`` — exactly
the round driver's comparator behavior, and exactly the round-5 regression
the plain fetchall() path cannot see. Run both modes before shipping.
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


# ---------------------------------------------------------------------------
# Linear connected-components oracles (--cc-linear)
#
# Three registry queries state connected components over a similarity graph.
# Their registered oracles express the fixpoint as a recursive CTE over an
# all-pairs similarity join — fine for the driver at sf0.01, but quadratic
# (the transitive-closure CTE materializes every (src, reachable) pair) and
# intractable for the 10x sf0.1 sweep. ``--cc-linear`` swaps in an
# equivalent linear-shaped check for exactly those three: fetch the EDGE
# LIST via an inverted-index SQL join (docs sharing >=1 shingle / the
# tractable cosine pair join), run union-find in Python, and assemble the
# same output rows. Equivalence to the recursive oracles is pinned by
# tests/test_linear_cc_oracle.py at sf0.001.
# ---------------------------------------------------------------------------

from input_data_pipeline_spark.functions.text import DUCK_TOKENS as _TOK
from input_data_pipeline_spark.operators.dedup import _DUCK_SHINGLES2 as _SH2
from input_data_pipeline_spark.operators.curation import _SEM_COS

# Exact-Jaccard(>=0.8) bigram-shingle edges, inverted-index form: join on a
# shared shingle (Jaccard >= 0.8 implies >= 1 common shingle), count common
# shingles per pair, exact-Jaccard filter in HAVING. Shingle lists are sets
# (list_distinct / singletons), so |A u B| = |A| + |B| - |A n B| and the
# float comparison divides the same integers as the registered oracle's
# len(list_intersect)/len(list_distinct) form.
_JACCARD_EDGES_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
sh AS (SELECT doc_id, {_SH2} AS shs FROM tok),
ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.n, b.n
HAVING COUNT(*) * 1.0 / (a.n + b.n - COUNT(*)) >= 0.8
"""

# Cosine(>= _SEM_COS) edges — the registered oracle's prs CTE verbatim (the
# pair join itself is tractable at sf0.1; only the reach CTE is not).
_COSINE_EDGES_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE CAST(ROUND(
  list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
  / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
     * sqrt(list_sum(list_transform(b.e, x -> x * x)))) * 1000000) AS BIGINT)
  >= {int(_SEM_COS * 1_000_000)}
"""


def _components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find: node -> min node id of its component (edge nodes only)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc_cluster_assignment(con) -> tuple[list[str], list[tuple]]:
    edges = con.execute(_JACCARD_EDGES_SQL).fetchall()
    label = _components(edges)
    size: dict[int, int] = {}
    for c in label.values():
        size[c] = size.get(c, 0) + 1
    rows = [(d, c, size[c]) for d, c in label.items()]
    return ["doc_id", "cluster_id", "cluster_size"], rows


def _cc_keep_selection(con) -> tuple[list[str], list[tuple]]:
    edges = con.execute(_JACCARD_EDGES_SQL).fetchall()
    label = _components(edges)
    docs = con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    clusters: dict[int, list[tuple[int, int]]] = {}
    for doc_id, n_chars in docs:
        clusters.setdefault(label.get(doc_id, doc_id), []).append((doc_id, n_chars))
    rows = []
    for cid, members in clusters.items():
        members.sort(key=lambda m: (-m[1], m[0]))  # n_chars DESC, doc_id
        kept = members[0][0]
        for rn, (doc_id, _) in enumerate(members, start=1):
            rows.append((doc_id, cid, len(members), rn == 1, kept))
    return ["doc_id", "cluster_id", "cluster_size", "keep", "kept_doc"], rows


def _cc_semdedup(con) -> tuple[list[str], list[tuple]]:
    edges = con.execute(_COSINE_EDGES_SQL).fetchall()
    label = _components(edges)
    size: dict[int, int] = {}
    for c in label.values():
        size[c] = size.get(c, 0) + 1
    rows = [(v, c, size[c], v == c) for v, c in label.items()]
    return ["vec_id", "cluster_id", "cluster_size", "is_survivor"], rows


LINEAR_CC_ORACLES = {
    "dedup_cluster_assignment": _cc_cluster_assignment,
    "dedup_keep_selection": _cc_keep_selection,
    "semdedup_embedding_clusters": _cc_semdedup,
}


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


def _pd_cell(v):
    """Normalize one pandas-fetched cell to the Python type the canon sees.

    Keeps the property under test: a HUGEINT column arrives as float64 and
    STAYS float (so uncast oracles go red, like under the driver), while
    artifacts of the pandas container that the driver also normalizes are
    undone — numpy scalar wrappers (numpy-2 repr is 'np.float64(3.0)'),
    NaT/NaN for SQL NULL, and midnight Timestamps for DATE cells.
    """
    if v is None:
        return None
    try:
        import pandas as pd

        if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, pd.Timestamp):
            if v.tzinfo is None and v.time() == dt.time.min:
                return v.date()
            return v.to_pydatetime()
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):
        return v.item()
    return v


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
    ap.add_argument(
        "--driver-canon",
        action="store_true",
        help="fetch oracle rows via pandas (HUGEINT->float64, like the driver)",
    )
    ap.add_argument(
        "--cc-linear",
        action="store_true",
        help="for the 3 connected-components queries, replace the recursive-"
        "CTE oracle with the linear edge-list + union-find check (makes the "
        "sf0.1 sweep tractable; equivalence pinned by tests)",
    )
    ap.add_argument(
        "--json",
        default=None,
        metavar="PATH",
        help="also write a machine-readable per-query summary (the committed "
        "ORACLE_LOCAL_rN.json artifact: cumulative local evidence alongside "
        "the driver's 50-slot CORRECTNESS_rN window)",
    )
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
    report: dict[str, dict] = {}
    for name in names:
        spec = _REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            report[name] = {"status": "fail", "err": f"spark: {e}"[:200]}
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            report[name] = {"status": "rows_only", "rows": len(srows)}
            n_pass += 1
            continue
        linear = args.cc_linear and name in LINEAR_CC_ORACLES
        try:
            if linear:
                ocols, orows = LINEAR_CC_ORACLES[name](con)
            else:
                if args.driver_canon:
                    decl = [str(t) for t in con.sql(spec.oracle).types]
                res = con.execute(spec.oracle)
                ocols = [d[0] for d in res.description]
                if args.driver_canon:
                    pdf = res.df()
                    # A plain pandas fetch floats ANY nullable int column,
                    # but the driver's r1-r5 history shows NULL-bearing
                    # BIGINT cells comparing as ints (asof_order_context,
                    # incremental_batch_dedup were hash-green WITH nulls).
                    # Restore declared-integer columns to ints; leave
                    # everything else (incl. HUGEINT → float64, the poison
                    # this mode exists to surface) as pandas materialized it.
                    int_decl = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"}
                    restore = {
                        i
                        for i, (t, c) in enumerate(zip(decl, pdf.columns))
                        if t in int_decl and str(pdf[c].dtype) == "float64"
                    }
                    orows = [
                        tuple(
                            (None if (v is None or (isinstance(v, float) and math.isnan(v)))
                             else int(v)) if i in restore else _pd_cell(v)
                            for i, v in enumerate(row)
                        )
                        for row in pdf.itertuples(index=False, name=None)
                    ]
                else:
                    orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            report[name] = {"status": "fail", "err": f"duckdb: {e}"[:200]}
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
            report[name] = {"status": "fail", "err": "; ".join(problems)[:200]}
            n_fail += 1
        else:
            tag = " [linear-cc]" if linear else ""
            print(f"PASS {name}{tag} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            report[name] = {
                "status": "pass",
                "rows": len(srows),
                "secs": round(time.time() - t0, 1),
            }
            if linear:
                report[name]["oracle"] = "linear_unionfind"
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    if args.json:
        import json

        payload = {
            "sf_dir": args.sf_dir,
            "mode": "driver_canon" if args.driver_canon else "fetchall",
            "n_pass": n_pass,
            "n_fail": n_fail,
            "queries": report,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

"""Equivalence pin for check_oracle's --cc-linear mode.

The three connected-components queries register recursive-CTE DuckDB
oracles (the driver runs those at sf0.01); the local sf0.1 sweep swaps in
a linear edge-list + union-find check. These tests prove the two oracle
statements produce IDENTICAL result tables — columns, row multiset, and
the checker's own canonical value hash — so a green [linear-cc] row
carries the same evidence as a green recursive row.

No Spark here: both sides are oracle-side computations over the parquet
test data, compared with check_oracle.table_digest itself.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import check_oracle as co
from input_data_pipeline_spark.plans.registry import _load_all, _REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    _load_all()
    return c


@pytest.mark.parametrize("name", sorted(co.LINEAR_CC_ORACLES))
def test_linear_matches_recursive(con, name):
    lcols, lrows = co.LINEAR_CC_ORACLES[name](con)

    res = con.execute(_REGISTRY[name].oracle)
    rcols = [d[0] for d in res.description]
    rrows = [tuple(r) for r in res.fetchall()]

    assert sorted(lcols) == sorted(rcols)
    assert len(lrows) == len(rrows)
    assert len(lrows) > 0, "degenerate fixture: no rows to compare"
    assert co.table_digest(lcols, lrows) == co.table_digest(rcols, rrows)


def test_union_find_transitive_chain():
    """A~B, B~C (A!~C) must collapse to one component labeled min(A,B,C),
    and disconnected nodes must keep their own label."""
    label = co._components([(30, 20), (10, 20), (50, 40)])
    assert label == {30: 10, 20: 10, 10: 10, 50: 40, 40: 40}

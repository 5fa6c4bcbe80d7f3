from __future__ import annotations

import os

import pytest

# Keep test sessions light: few cores, few shuffle partitions.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from input_data_pipeline_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def assert_df_equal(actual, expected_rows, cols=None):
    """Order-insensitive DataFrame equality against a list of tuples."""
    rows = [tuple(r) for r in actual.collect()]
    if cols is not None:
        assert actual.columns == cols, f"columns {actual.columns} != {cols}"
    assert sorted(map(repr, rows)) == sorted(map(repr, expected_rows)), (
        f"rows differ:\n actual={sorted(rows)}\n expected={sorted(expected_rows)}"
    )

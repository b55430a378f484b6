"""Oracle-compare harness unit tests (round-7 review): the harness is
the pre-driver correctness gate, so its own edge cases must be pinned
— array-typed result cells, ragged sequences, and loud name
validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from duckdb_hdfs_spark.oracle import _canon, _values_equal, run_all


def test_values_equal_handles_arrays_and_raggedness():
    assert _values_equal(np.array([1.0, 2.0]), np.array([1.0, 2.0]))
    assert _values_equal([1, 2], (1, 2))
    assert _values_equal(np.array([1.0, np.nan]), [1.0, float("nan")])
    assert not _values_equal(np.array([1.0]), np.array([1.0, 2.0]))
    assert not _values_equal(np.array([1.0]), None)
    assert not _values_equal(None, [1.0])
    assert not _values_equal(np.array([1.0, 2.0]), np.array([1.0, 3.0]))


def test_canon_sorts_frames_with_array_cells():
    df = pd.DataFrame(
        {"a": [np.array([2, 1]), np.array([1, 2])], "b": [1, 0]}
    )
    out = _canon(df)
    assert out["a"].tolist() == [(1, 2), (2, 1)]
    assert out["b"].tolist() == [0, 1]


def test_run_all_rejects_unknown_names(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown query names"):
        run_all(spark, sf_dir, names=["q1_pricing_sumary"])  # typo


def test_run_all_empty_list_runs_nothing(spark, sf_dir):
    assert run_all(spark, sf_dir, names=[]) == []

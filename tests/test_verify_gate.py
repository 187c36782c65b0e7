"""The local verify gate must be driver-equivalent (VERDICT r3 #2).

Two failure modes shipped through the old gate:
  r2: 6-sig-digit float normalization masked a decimal-rounding diff;
  r3: type-blind stringification masked int-vs-float (ceil/floor) AND
      list cells were happily stringified while the driver's pandas
      canon crashes on them.
These tests pin the gate's sensitivity so it can't regress quietly.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

from verify_local import _driver_canon, _norm_cell  # noqa: E402


def test_int_and_float_never_collide():
    # the exact r3 driver red: Spark BIGINT 68424 vs DuckDB DOUBLE 68424.0
    assert _norm_cell(68424) != _norm_cell(68424.0)
    assert _norm_cell(0) != _norm_cell(0.0)
    assert _norm_cell(True) != _norm_cell(1)  # bool is not int


def test_float_precision_catches_rounding_bugs():
    # the r2 driver red: HALF_UP vs binary-round differ at the 1st dp
    assert _norm_cell(63058.3) != _norm_cell(63058.4)
    # but fold-order noise (~1e-15 relative) must be tolerated
    assert _norm_cell(0.1 + 0.2) == _norm_cell(0.3)


def test_driver_canon_crashes_on_raw_arrays():
    # the exact r3 canon crash shape: an object column holding lists
    with pytest.raises(TypeError, match="unhashable"):
        _driver_canon(["id", "vec"], [(1, [0.1, 0.2]), (2, [0.3, 0.4])])


def test_driver_canon_accepts_scalar_rows():
    _driver_canon(["id", "x", "s"], [(1, 1.5, "a"), (2, None, "b")])


def test_norm_cell_rejects_containers():
    with pytest.raises(TypeError):
        _norm_cell([1, 2])
    with pytest.raises(TypeError):
        _norm_cell({"k": 1})


def test_registry_rejects_container_result_schema(spark):
    """VERDICT r4 #6: the registration wrapper must refuse raw
    array/map/struct result columns at query *invocation* (before the
    driver's pandas canon can crash on them)."""
    from dist_keras_spark.plans import registry

    @registry.query("_test_raw_array_query")
    def _raw(spark, sf_dir):
        from pyspark.sql import functions as F

        return spark.range(3).select(F.array(F.lit(1), F.lit(2)).alias("xs"))

    try:
        with pytest.raises(TypeError, match="container-typed"):
            registry.QUERIES["_test_raw_array_query"](spark, "/unused")
    finally:
        del registry.QUERIES["_test_raw_array_query"]


def test_registry_accepts_scalar_result_schema(spark):
    from dist_keras_spark.plans import registry

    @registry.query("_test_scalar_query")
    def _scalar(spark, sf_dir):
        return spark.range(3)

    try:
        df = registry.QUERIES["_test_scalar_query"](spark, "/unused")
        assert df.count() == 3
    finally:
        del registry.QUERIES["_test_scalar_query"]

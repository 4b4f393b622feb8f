"""Calc compiler + array kernel semantics vs the reference's
array_utils tests (gfw_pixetl tests/tiles/utils/test_array_utils.py)."""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.data_type import data_type_factory
from gfw_pixetl_spark.functions.calc import (
    CalcValidationError, apply_calc, block_has_data, compile_calc,
    enumerate_bands, set_datatype,
)
from gfw_pixetl_spark.models import LayerModel, layer_from_json


def ma(data, mask=None):
    return np.ma.MaskedArray(np.array(data), mask=mask)


def test_enumerate_bands():
    assert enumerate_bands(3) == ["A", "B", "C"]
    assert enumerate_bands(27)[-1] == "AA"


def test_calc_sum_two_bands():
    # reference test_array_utils: A+B on ones
    a = ma(np.ones((2, 3)))
    b = ma(np.ones((2, 3)) * 2)
    out = compile_calc("A+B", 2)(a, b)
    assert out.shape == (1, 2, 3)
    assert float(out.sum()) == 18.0


def test_calc_multiband_output():
    a = ma(np.ones((2, 2)))
    b = ma(np.ones((2, 2)) * 3)
    out = compile_calc("np.ma.array([A, B, A+B])", 2)(a, b)
    assert out.shape == (3, 2, 2)
    assert float(out[2].sum()) == 16.0


def test_calc_mask_propagates():
    a = ma([[1.0, 2.0]], mask=[[True, False]])
    out = compile_calc("A*10", 1)(a)
    assert bool(np.ma.getmaskarray(out)[0, 0, 0]) is True
    assert out[0, 0, 1] == 20.0


def test_calc_np_where():
    a = ma([[1.0, 5.0]])
    out = compile_calc("np.where(A > 2, 1, 0)", 1)(a)
    assert out[0].tolist() == [[0, 1]]


def test_calc_band_count_validation():
    a = ma(np.ones((1, 2, 2)))
    with pytest.raises(RuntimeError):
        apply_calc(a, "np.ma.array([A, A])", 1)


def test_calc_rejects_unsafe():
    for expr in [
        "__import__('os')",
        "A.__class__",
        "open('/etc/passwd')",
        "np.load('x')",
        "'str'",
        "lambda: 1",
        "[x for x in A]",
    ]:
        with pytest.raises((CalcValidationError, SyntaxError)):
            compile_calc(expr, 1)


def test_set_datatype_fill_and_cast():
    # reference array_utils.set_datatype: fill masked with nodata, cast
    arr = ma([[1.5, 2.5]], mask=[[True, False]])
    out = set_datatype(arr.reshape(1, 1, 2), 255, "uint8")
    assert out.dtype == np.uint8
    assert out.tolist() == [[[255, 2]]]
    # per-band nodata list
    arr2 = np.ma.MaskedArray(
        np.ones((2, 1, 2)), mask=[[[True, False]], [[True, False]]]
    )
    out2 = set_datatype(arr2, [7, 9], "int16")
    assert out2[0].tolist() == [[7, 1]] and out2[1].tolist() == [[9, 1]]
    # no nodata: mask dropped, raw data cast
    out3 = set_datatype(arr, None, "float32")
    assert out3.dtype == np.float32 and out3[0, 1] == 2.5


def test_block_has_data():
    assert not block_has_data(ma(np.zeros((1, 2, 2)), mask=np.ones((1, 2, 2))))
    assert block_has_data(ma(np.zeros((1, 2, 2)), mask=[[[True, False], [True, True]]]))
    assert not block_has_data(ma(np.zeros((1, 0, 2))))


def test_data_type_factory():
    # reference data_type.py:112-149 semantics
    dt = data_type_factory("boolean")
    assert (dt.data_type, dt.nbits, dt.compression) == ("uint8", 1, "CCITTFAX4")
    dt = data_type_factory("half", no_data=None)
    assert (dt.data_type, dt.nbits) == ("float16", 16)
    dt = data_type_factory("uint16", nbits=12, no_data=3)
    assert dt.nbits == 12 and dt.no_data == 3
    dt = data_type_factory("uint8", nbits=12)  # wrong width class -> dropped
    assert dt.nbits is None
    with pytest.raises(ValueError):
        data_type_factory("uint8", no_data=1.5)  # int type needs int nodata
    with pytest.raises(ValueError):
        data_type_factory("float32", no_data=3)  # float type needs float
    with pytest.raises(ValueError):
        data_type_factory("boolean", no_data=5)
    with pytest.raises(ValueError):
        data_type_factory("uint128")
    # multi-band nodata collapses to first (rasterio limitation)
    dt = data_type_factory("uint8", no_data=[3, 3])
    assert dt.no_data == 3


def test_layer_model_validation():
    ok = layer_from_json({
        "dataset": "d", "version": "v1.2", "source_type": "raster",
        "pixel_meaning": "is_forest", "data_type": "uint8",
        "grid": "10/40000", "source_uri": ["s3://b/tiles.geojson"],
    })
    assert ok.grid_obj.cols == 40000
    assert ok.prefix == "d/v1.2/raster/epsg-4326/10/40000/is_forest"
    with pytest.raises(ValueError):
        layer_from_json({
            "dataset": "d", "version": "not-a-version",
            "source_type": "raster", "pixel_meaning": "x",
            "data_type": "uint8", "grid": "10/40000",
            "source_uri": ["s3://b"],
        })
    with pytest.raises(ValueError):  # raster requires source_uri
        LayerModel(
            dataset="d", version="v1", source_type="raster",
            pixel_meaning="x", data_type="uint8", grid="10/40000",
        )
    with pytest.raises(ValueError):  # nodata list length != band_count
        LayerModel(
            dataset="d", version="v1", source_type="raster",
            pixel_meaning="x", data_type="uint8", grid="10/40000",
            source_uri=["s3://b"], band_count=2, no_data=[0, 0, 0],
        )
    with pytest.raises(ValueError):  # mixed nodata values
        LayerModel(
            dataset="d", version="v1", source_type="raster",
            pixel_meaning="x", data_type="uint8", grid="10/40000",
            source_uri=["s3://b"], band_count=2, no_data=[0, 1],
        )

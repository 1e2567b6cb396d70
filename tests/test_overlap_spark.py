"""Distributed == global: the Spark fragment-shuffle stitch must equal
a dense driver-side scatter-add oracle on the same raster (the global
form of the reference pipeline geo_inference.py:358-397)."""

import numpy as np
import pytest

from geo_inference_spark.operators.overlap import infer_raster
from geo_inference_spark.raster.dense import dense_infer_mask
from geo_inference_spark.raster.kernels import make_linear_model

RNG = np.random.RandomState(7)


def dense_oracle(arr, model_fn, patch, num_classes, no_data=None, thr=0.3):
    """Global scatter-add reference (raster/dense.py)."""
    return dense_infer_mask(arr, model_fn, patch, num_classes, no_data, thr)


@pytest.mark.parametrize(
    "bands,num_classes,shape",
    [(2, 3, (20, 28)), (1, 1, (16, 16)), (3, 5, (19, 22))],
)
def test_stitch_matches_dense_oracle(spark, bands, num_classes, shape):
    arr = RNG.uniform(0, 255, size=(bands, *shape))
    model = make_linear_model(num_classes)
    got = infer_raster(spark, arr, model, patch_size=8, num_classes=num_classes)
    exp = dense_oracle(arr, model, 8, num_classes)
    np.testing.assert_array_equal(got, exp)


def test_stitch_nodata_painting(spark):
    arr = RNG.uniform(1, 255, size=(2, 16, 16))
    arr[:, :4, :4] = 0.0  # a nodata block (nodata=0)
    model = make_linear_model(2)
    got = infer_raster(spark, arr, model, 8, 2, no_data=0.0)
    exp = dense_oracle(arr, model, 8, 2, no_data=0.0)
    np.testing.assert_array_equal(got, exp)
    assert (got[:4, :4] == 255).all()  # invalid pixels painted 255


def test_stitch_single_class_threshold(spark):
    arr = RNG.uniform(0, 255, size=(1, 12, 12))
    model = make_linear_model(1)
    got = infer_raster(spark, arr, model, 8, 1, prediction_threshold=0.3)
    exp = dense_oracle(arr, model, 8, 1, thr=0.3)
    np.testing.assert_array_equal(got, exp)
    assert set(np.unique(got)) <= {0, 1, 255}


def test_select_bands_reorder(spark):
    """P1: band subset/reorder/duplicate on the chunk table, then the
    full stitch on the subset == stitch on a pre-sliced array."""
    from geo_inference_spark.operators.overlap import (
        bytes_to_np,
        raster_to_chunks,
        select_bands,
    )

    arr = RNG.uniform(0, 255, size=(3, 8, 8))
    chunks, ny, nx = raster_to_chunks(spark, arr, 4)
    sel = select_bands(chunks, [3, 1, 1], 3, 4).collect()
    for r in sel:
        got = bytes_to_np(bytes(r.chunk), (3, 4, 4))
        y0, x0 = r.ty * 4, r.tx * 4
        exp = arr[[2, 0, 0], y0 : y0 + 4, x0 : x0 + 4]
        np.testing.assert_array_equal(got, exp)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        select_bands(chunks, [0], 3, 4)
    with _pytest.raises(ValueError):
        select_bands(chunks, [4], 3, 4)

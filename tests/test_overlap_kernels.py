"""Positional overlap-sum parity with the reference's 8 oracle cases
(/root/reference/tests/test_geo_dask.py:124-301) plus model/window
kernel structure checks."""

import numpy as np
import pytest

from geo_inference_spark.raster.kernels import (
    finalize_cell,
    is_nodata_chunk,
    make_linear_model,
    model_window_patch,
    sum_overlapped_chunk,
)
from geo_inference_spark.raster.windows import positional_window

RNG = np.random.RandomState(123)
NC = (1, 3, 3)  # num-chunks of the oracle grid
S = 2  # stride; chunk_size (patch) = 4


def _arr(w):
    return RNG.randint(1, 5, size=(3, 6, w)).astype(float)


def _expected(arr, blocks):
    acc = sum(arr[:, i * S : (i + 1) * S, j * S : (j + 1) * S] for i, j in blocks)
    with np.errstate(divide="ignore", invalid="ignore"):
        probs = np.divide(
            acc[:-1], acc[-1][None], out=np.zeros_like(acc[:-1]), where=acc[-1] != 0
        )
    return np.argmax(probs, axis=0).astype(np.uint8)


CASES = {
    # location -> (array width, contributing blocks (row, col))
    (0, 0): (6, [(0, 0)]),  # top-left corner
    (0, 2): (6, [(0, 0)]),  # top-right corner
    (2, 0): (6, [(0, 0)]),  # bottom-left corner
    (2, 2): (6, [(0, 0)]),  # bottom-right corner
    (0, 1): (8, [(0, 0), (0, 1)]),  # top edge
    (2, 1): (8, [(0, 0), (0, 1)]),  # bottom edge
    (1, 0): (8, [(0, 0), (1, 0)]),  # left edge
    (1, 2): (8, [(0, 0), (1, 0)]),  # right edge
}


@pytest.mark.parametrize("loc", sorted(CASES))
def test_sum_overlapped_positional(loc):
    width, blocks = CASES[loc]
    arr = _arr(width)
    out = sum_overlapped_chunk(arr, 4, 0.3, NC, (0, *loc))
    np.testing.assert_array_equal(out, _expected(arr, blocks))


def test_sum_overlapped_empty_returns_none():
    assert sum_overlapped_chunk(np.empty(0), 4, 0.3, NC, (0, 1, 1)) is None


def test_finalize_single_class_threshold_is_strict():
    acc = np.zeros((2, 2, 2))
    acc[0] = [[0.3, 0.31], [0.0, 1.0]]
    acc[1] = 1.0  # weights
    out = finalize_cell(acc, prediction_threshold=0.3)
    np.testing.assert_array_equal(out, [[0, 1], [0, 1]])
    assert out.dtype == np.uint8


def test_finalize_zero_weight_divide_guard():
    acc = np.zeros((3, 2, 2))
    acc[0, 0, 0] = 5.0  # class sum with zero weight -> prob 0
    out = finalize_cell(acc)
    np.testing.assert_array_equal(out, np.zeros((2, 2), dtype=np.uint8))


def test_nodata_short_circuit():
    assert is_nodata_chunk(np.zeros((1, 4, 4)), 0.0)
    assert not is_nodata_chunk(np.ones((1, 4, 4)), 0.0)
    assert is_nodata_chunk(np.full((1, 4, 4), np.nan), None)
    assert is_nodata_chunk(np.full((1, 4, 4), np.nan), float("nan"))
    assert not is_nodata_chunk(np.ones((1, 4, 4)), None)


def test_model_window_patch_structure():
    m = 8
    model = make_linear_model(num_classes=3)
    chunk = RNG.uniform(0, 255, size=(2, m, m))
    out = model_window_patch(chunk, model, m, 3, 2, 2, 6, 6)
    assert out.shape == (4, m, m)
    win = positional_window(2, 2, 6, 6, m)
    np.testing.assert_allclose(out[-1], win, atol=1e-12)
    raw = model(chunk)
    np.testing.assert_allclose(out[:-1], raw * win, atol=1e-12)
    # probabilities sum to 1 before windowing
    np.testing.assert_allclose(raw.sum(axis=0), 1.0, atol=1e-9)


def test_model_window_patch_degenerate_inputs():
    model = make_linear_model(num_classes=2)
    z = np.zeros((3, 8, 8))
    # all-nodata chunk skips the model
    assert (model_window_patch(np.zeros((2, 8, 8)), model, 8, 2, 1, 1, 6, 6, 0.0) == z).all()
    # wrong-size input (missing halo) yields zeros
    assert (model_window_patch(np.empty((2, 0, 0)), model, 8, 2, 1, 1, 6, 6) == z).all()
    # bottom-left position (cy=1>=ny-2, cx==0): ones quadrant sits at
    # the bottom-left of the window
    out = model_window_patch(np.ones((2, 8, 8)) * 9, model, 8, 2, 1, 0, 2, 4)
    np.testing.assert_allclose(out[-1, 4:, :4], 1.0)


def test_tta_wrapper_mean_merge():
    """d4 TTA == hand-computed mean of the 8 aug/deaug forwards, and
    a symmetric model is TTA-invariant."""
    from geo_inference_spark.raster.kernels import make_linear_model, tta_wrap

    rng = np.random.RandomState(3)
    chunk = rng.uniform(0, 255, size=(2, 8, 8))
    model = make_linear_model(3)
    wrapped = tta_wrap(model, flip=True, rotate=True)
    got = wrapped(chunk)
    # manual recompute
    outs = []
    for h in (0, 1):
        for k in (0, 1, 2, 3):
            x = chunk[:, :, ::-1] if h else chunk
            x = np.rot90(x, k=k, axes=(1, 2))
            y = model(np.ascontiguousarray(x))
            y = np.rot90(y, k=-k, axes=(1, 2))
            outs.append(y[:, :, ::-1] if h else y)
    np.testing.assert_allclose(got, np.mean(outs, axis=0), rtol=0, atol=0)
    assert got.shape == (3, 8, 8)
    # probabilities stay normalized under mean merge
    np.testing.assert_allclose(got.sum(axis=0), 1.0, atol=1e-12)
    # a spatially-constant model is invariant under TTA
    const = lambda c: np.full((3, c.shape[1], c.shape[2]), 1.0 / 3)  # noqa: E731
    np.testing.assert_array_equal(tta_wrap(const)(chunk), const(chunk))


def test_tta_variant_counts():
    from geo_inference_spark.raster.kernels import tta_wrap

    calls = []
    probe = lambda c: (calls.append(1) or np.zeros((1, *c.shape[1:])))  # noqa: E731
    for flip, rotate, n in [(True, True, 8), (False, True, 1),
                            (True, False, 4), (False, False, 1)]:
        calls.clear()
        tta_wrap(probe, flip=flip, rotate=rotate)(np.zeros((1, 4, 4)))
        assert len(calls) == n, (flip, rotate)


def test_tta_through_distributed_stitch(spark):
    """TTA-wrapped model through the full distributed pipeline ==
    dense oracle with the same wrapped model (R2+TTA parity)."""
    from geo_inference_spark.operators.overlap import infer_raster
    from geo_inference_spark.raster.dense import dense_infer_mask
    from geo_inference_spark.raster.kernels import make_linear_model, tta_wrap

    rng = np.random.RandomState(9)
    arr = rng.uniform(0, 255, size=(2, 16, 16))
    model = tta_wrap(make_linear_model(2), flip=True, rotate=True)
    got = infer_raster(spark, arr, model, patch_size=8, num_classes=2)
    exp = dense_infer_mask(arr, model, 8, 2)
    np.testing.assert_array_equal(got, exp)

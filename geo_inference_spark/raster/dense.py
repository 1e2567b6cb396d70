"""Dense (single-process) reference pipeline.

The global form of the reference's tile loop
(/root/reference/geo_inference/geo_inference.py:358-397): run every
patch, scatter-add the Hann-windowed outputs and weights into one
dense accumulator, finalize per stride cell, trim, paint nodata. The
distributed stitch (operators/overlap.py) is proven equal to this in
tests/test_overlap_spark.py; the polygonize VALUES oracle in
__spark_entry__ is generated from it.
"""

from __future__ import annotations

import numpy as np

from ..operators.overlap import (
    infer_nodata,
    pad_to_multiple,
    validity_mask,
)
from .kernels import finalize_cell, model_window_patch


def dense_infer_mask(
    arr: np.ndarray,
    model_fn,
    patch: int,
    num_classes: int,
    no_data: float | None = None,
    thr: float = 0.3,
) -> np.ndarray:
    stride = patch // 2
    nd = infer_nodata(arr, no_data)
    valid = validity_mask(np.asarray(arr), nd)
    padded = pad_to_multiple(np.asarray(arr, dtype=np.float64), stride)
    bands, h, w = padded.shape
    ny, nx = h // stride, w // stride
    acc = np.zeros((num_classes + 1, h + stride, w + stride))
    for py in range(ny):
        for px in range(nx):
            y0, x0 = py * stride, px * stride
            if py + 1 < ny and px + 1 < nx:
                chunk = padded[:, y0 : y0 + patch, x0 : x0 + patch]
            else:
                chunk = np.empty((bands, 0, 0))  # no right/bottom halo
            out = model_window_patch(
                chunk, model_fn, patch, num_classes, py, px, ny, nx, nd
            )
            acc[:, y0 : y0 + patch, x0 : x0 + patch] += out
    mask = np.zeros((h, w), dtype=np.uint8)
    for oy in range(ny):
        for ox in range(nx):
            y0, x0 = oy * stride, ox * stride
            mask[y0 : y0 + stride, x0 : x0 + stride] = finalize_cell(
                acc[:, y0 : y0 + stride, x0 : x0 + stride], thr
            )
    mask = mask[: arr.shape[1], : arr.shape[2]]
    return np.where(valid, mask, np.uint8(255))

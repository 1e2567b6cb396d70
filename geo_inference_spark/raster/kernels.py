"""Pure-numpy compute kernels of the overlap-stitch engine.

Semantics mirror the reference bit-for-bit (oracle cases:
/root/reference/tests/test_geo_dask.py:124-301):

* ``model_window_patch`` == the per-chunk model+window step of
  ``runModel`` (/root/reference/geo_inference/geo_dask.py:14-207):
  nodata short-circuit, model forward, multiply by positional window,
  append the window itself as an extra channel so the reducer can
  renormalize.
* ``sum_overlapped_chunk`` == ``sum_overlapped_chunks``
  (geo_dask.py:210-320): positional sum of 1/2/4 overlapping
  fragments, zero-guarded divide by the weight channel, strict->
  threshold binarize (single class) or first-max argmax (multiclass).

Keeping this in numpy (not Spark expressions) makes the numeric
semantics literally numpy's — divide ``where=``, argmax tie-breaking,
dtype behavior — per SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

import numpy as np

from .windows import positional_window


def is_nodata_chunk(chunk: np.ndarray, no_data: float | None) -> bool:
    """True when the whole chunk is nodata / non-finite.

    Mirrors geo_dask.py:43-48: None or NaN nodata -> "nothing finite";
    numeric nodata -> "everything equals it".
    """
    if chunk is None or chunk.size == 0:
        return True
    if no_data is None or np.isnan(no_data):
        return not np.isfinite(chunk).any()
    return bool(np.all(chunk == no_data))


def model_window_patch(
    chunk: np.ndarray | None,
    model_fn,
    patch_size: int,
    num_classes: int,
    cy: int,
    cx: int,
    ny: int,
    nx: int,
    no_data: float | None = None,
) -> np.ndarray:
    """One patch through model + positional Hann window.

    chunk: (bands, H, W) input (H=W=patch_size when the right/bottom
    halo exists; anything else yields zeros, as in the reference where
    boundary='none' starves the last row/column of patches).
    Returns (num_classes+1, patch_size, patch_size) float64 — classes
    weighted by the window, plus the window as the last channel.
    """
    zeros = np.zeros((num_classes + 1, patch_size, patch_size))
    if chunk is None or chunk.size == 0 or is_nodata_chunk(chunk, no_data):
        return zeros
    win = positional_window(cy, cx, ny, nx, patch_size)
    if win is None:
        return zeros
    out = np.asarray(model_fn(chunk))
    if out.shape != (num_classes, patch_size, patch_size):
        return zeros
    return np.concatenate((out * win, win[np.newaxis, :, :]), axis=0)


def finalize_cell(
    acc: np.ndarray, prediction_threshold: float = 0.3
) -> np.ndarray:
    """Summed fragments (C+1, s, s) -> uint8 class mask (s, s).

    Zero-guarded divide by the weight channel, then strict ``>``
    threshold (single class) or argmax with numpy first-max ties
    (multiclass) — geo_dask.py:307-319.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        probs = np.divide(
            acc[:-1, :, :],
            acc[-1, :, :][np.newaxis, :, :],
            out=np.zeros_like(acc[:-1, :, :], dtype=float),
            where=acc[-1, :, :] != 0,
        )
    if probs.shape[0] == 1:
        return np.where(probs > prediction_threshold, 1, 0).squeeze(0).astype(np.uint8)
    return np.argmax(probs, axis=0).astype(np.uint8)


def sum_overlapped_chunk(
    aoi_chunk: np.ndarray,
    chunk_size: int,
    prediction_threshold: float = 0.3,
    num_chunks: tuple[int, int, int] = (1, 1, 1),
    chunk_location: tuple[int, int, int] = (0, 0, 0),
) -> np.ndarray | None:
    """Single-node positional reducer — parity twin of the reference's
    ``sum_overlapped_chunks`` for the 8 oracle cases; the distributed
    path (operators/overlap.py) reaches the same sums via fragment
    grouping instead of halo slicing.

    ``aoi_chunk``: (C+1, >=s*2, >=s*2) model outputs incl. top/left
    halos (dask layout); positions per ``chunk_location`` of the
    output grid ``num_chunks``.
    """
    if aoi_chunk is None or aoi_chunk.size == 0:
        return None
    s = chunk_size // 2
    _, ny, nx = num_chunks
    _, cy, cx = chunk_location
    on_row_edge = cy == 0 or cy == ny - 1
    on_col_edge = cx == 0 or cx == nx - 1
    blk = lambda i, j: aoi_chunk[:, i * s : (i + 1) * s, j * s : (j + 1) * s]  # noqa: E731
    if on_row_edge and on_col_edge:
        acc = blk(0, 0)
    elif on_row_edge:
        acc = blk(0, 0) + blk(0, 1)
    elif on_col_edge:
        acc = blk(0, 0) + blk(1, 0)
    else:
        acc = blk(0, 0) + blk(0, 1) + blk(1, 0) + blk(1, 1)
    if acc.shape != (aoi_chunk.shape[0], s, s):
        return None
    return finalize_cell(acc, prediction_threshold)


# --------------------------------------------------------- TTA wrapper

def tta_wrap(model_fn, flip: bool = True, rotate: bool = True):
    """Test-time-augmentation wrapper, parity of the reference's
    ttach SegmentationTTAWrapper setup (geo_inference.py:108-124,
    merge_mode='mean'):

    * flip+rotate -> d4_transform: hflip x rot90 {0,90,180,270} (8)
    * rotate only -> Rotate90(angles=[90]): the single 90-deg variant
      (the reference passes no identity angle)
    * flip only   -> HorizontalFlip x VerticalFlip (4 combos)

    Each variant: spatially augment the chunk, forward, inverse the
    augmentation on the output, then MEAN-merge. Pure numpy — wraps
    any (bands, H, W) -> (K, H, W) model_fn, so it composes with the
    distributed stitch unchanged.
    """
    if flip and rotate:
        combos = [(h, 0, k) for h in (0, 1) for k in (0, 1, 2, 3)]
    elif rotate:
        combos = [(0, 0, 1)]
    elif flip:
        combos = [(h, v, 0) for h in (0, 1) for v in (0, 1)]
    else:
        combos = [(0, 0, 0)]

    def fn(chunk: np.ndarray) -> np.ndarray:
        outs = []
        for h, v, k in combos:
            x = chunk
            if h:
                x = x[:, :, ::-1]
            if v:
                x = x[:, ::-1, :]
            if k:
                x = np.rot90(x, k=k, axes=(1, 2))
            y = np.asarray(model_fn(np.ascontiguousarray(x)))
            if k:
                y = np.rot90(y, k=-k, axes=(1, 2))
            if v:
                y = y[:, ::-1, :]
            if h:
                y = y[:, :, ::-1]
            outs.append(y)
        return np.mean(outs, axis=0)

    return fn


# --------------------------------------------------------- stand-in model

def make_linear_model(num_classes: int, seed: int = 17):
    """Deterministic pure-numpy segmenter standing in for the
    TorchScript model (torch is absent here; the real path would load
    via torch.jit and ship with spark-submit --archives).

    Mirrors the reference example's normalize->forward->softmax shape
    (/root/reference/examples/script_model.py:31-42): per-class maps
    are fixed affine functionals of the (normalized) bands through a
    softmax, so outputs are valid probabilities and reproducible on
    any worker.
    """
    rng = np.random.RandomState(seed)

    def model_fn(chunk: np.ndarray) -> np.ndarray:
        c, h, w = chunk.shape
        x = chunk.astype(np.float64) / 255.0
        mu = x.mean(axis=(1, 2), keepdims=True)
        sd = x.std(axis=(1, 2), keepdims=True) + 1e-6
        xn = (x - mu) / sd
        wts = rng_weights(num_classes, c, seed)
        logits = np.tensordot(wts, xn, axes=([1], [0]))  # (K, h, w)
        yy, xx = np.mgrid[0:h, 0:w]
        logits += 0.1 * np.sin(
            (yy + 1) * np.pi / h * (1 + np.arange(num_classes)[:, None, None])
        ) * np.cos((xx + 1) * np.pi / w)
        e = np.exp(logits - logits.max(axis=0, keepdims=True))
        return e / e.sum(axis=0, keepdims=True)

    return model_fn


def rng_weights(k: int, c: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).uniform(-1.0, 1.0, size=(k, c))

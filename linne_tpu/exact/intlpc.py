"""Integer unit-split LPC prediction/synthesis cascade (host oracle).

Fixed-point semantics fixed by the format (reference:
libs/linne_encoder/src/linne_lpc_predict.c:7-38,
libs/linne_decoder/src/linne_lpc_synthesize.c:8-83):

- a layer of `order` coefficients split into `num_units` sub-filters;
- each unit filters its own contiguous segment of `num_samples // num_units`
  samples; the first `order // num_units` samples of every unit and any
  remainder tail samples pass through unchanged;
- prediction adds `(half + sum coef*x) >> rshift` to form the residual;
  synthesis subtracts it recursively (the decode-side IIR).

All arithmetic wraps modulo 2^32 as int32 (sums accumulate associatively, so
we evaluate in int64 and wrap once before the shift).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def _wrap_i32(v: np.ndarray) -> np.ndarray:
    return (v & np.int64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32)


def predict(
    data: np.ndarray, num_samples: int, coef: np.ndarray, num_units: int,
    rshift: int,
) -> np.ndarray:
    """FIR residual computation (encoder side); returns a new int32 array."""
    order = coef.shape[0]
    npu = order // num_units
    ns = num_samples // num_units
    residual = data[:num_samples].astype(np.int32).copy()
    if ns <= npu:
        return residual
    x = data[: num_units * ns].astype(np.int64).reshape(num_units, ns)
    c = coef.astype(np.int64).reshape(num_units, npu)
    # windows[u, t, k] = x[u, t + k], t = 0..ns-npu-1
    win = sliding_window_view(x, npu, axis=1)[:, : ns - npu, :]
    half = np.int64(1 << (rshift - 1))
    pred = np.einsum("utk,uk->ut", win, c, dtype=np.int64) + half
    pred = _wrap_i32(pred) >> np.int32(rshift)
    out = residual[: num_units * ns].reshape(num_units, ns)
    out[:, npu:] = _wrap_i32(out[:, npu:].astype(np.int64) + pred.astype(np.int64))
    return residual


def synthesize(
    data: np.ndarray, num_samples: int, coef: np.ndarray, num_units: int,
    rshift: int,
) -> None:
    """Recursive IIR reconstruction (decoder side), in place over int32
    `data`. Sequential over time, vectorized across units."""
    order = coef.shape[0]
    npu = order // num_units
    ns = num_samples // num_units
    if ns <= npu:
        return
    seg = data[: num_units * ns].reshape(num_units, ns)
    x = seg.astype(np.int64)
    c = coef.astype(np.int64).reshape(num_units, npu)
    half = np.int64(1 << (rshift - 1))
    rs = np.int32(rshift)
    for t in range(ns - npu):
        pred = (x[:, t : t + npu] * c).sum(axis=1) + half
        pred32 = _wrap_i32(pred) >> rs
        x[:, t + npu] = _wrap_i32(x[:, t + npu] - pred32.astype(np.int64))
    seg[:] = x.astype(np.int32)

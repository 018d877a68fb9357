"""Pallas TPU kernels for the hot analysis/synthesis loops.

The XLA formulation of autocorrelation / unit-FIR / integer predict uses
`lax.scan` over lags/taps; at 10-20us per scan step the analysis spends more
time in dispatch than arithmetic (thousands of tiny steps per block batch),
and the resulting graphs are expensive to compile. Each kernel here is one
launch with in-kernel `fori_loop`s over lags/taps: rows (= batch x channel
[x unit]) tile over the grid, a whole row lives in VMEM (<= 40KB), and the
VPU does full-row multiply-accumulates.

On non-TPU backends the same kernels run in interpreter mode (tests), or
callers fall back to the pure-XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _use_pallas_env() -> bool:
    import os

    return bool(os.environ.get("LINNE_FORCE_PALLAS"))


def _row_tile(nrows: int, row_bytes: int, max_vmem: int = 4 << 20) -> int:
    """Largest multiple-of-8 row tile that divides nrows (callers pad rows
    to a multiple of 8) and fits the VMEM budget."""
    cap = max(8, min(256, max_vmem // max(row_bytes, 1)))
    tile = 8
    t = 8
    while t <= cap:
        if nrows % t == 0:
            tile = t
        t += 8
    return tile


def _pad_rows(x: jnp.ndarray, mult: int = 8):
    rows = x.shape[0]
    pad = (-rows) % mult
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, rows


# ------------------------------------------------------------- autocorr


def _autocorr_kernel(x_ref, out_ref, xp_ref, *, num_lags, ns):
    # static unroll over lags: all slices have static starts (Mosaic only
    # supports 128-aligned dynamic lane offsets)
    x = x_ref[:]  # [TR, ns]
    xp_ref[:, :ns] = x
    xp_ref[:, ns:] = jnp.zeros_like(xp_ref[:, ns:])
    for lag in range(num_lags):
        shifted = xp_ref[:, lag : lag + ns]
        out_ref[:, lag : lag + 1] = jnp.sum(x * shifted, axis=1,
                                            keepdims=True)


def autocorrelation_rows(x: jnp.ndarray, num_lags: int) -> jnp.ndarray:
    """x: [rows, ns] float; returns [rows, num_lags]."""
    x, real_rows = _pad_rows(x)
    rows, ns = x.shape
    tile = _row_tile(rows, (2 * ns + num_lags) * 8)
    kernel = functools.partial(_autocorr_kernel, num_lags=num_lags, ns=ns)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, num_lags), x.dtype),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, ns), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, num_lags), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, ns + num_lags), x.dtype)],
        interpret=not _on_tpu(),
    )(x)
    return out[:real_rows]


# ------------------------------------------------------------ unit FIR


def _unit_forward_kernel(x_ref, p_ref, out_ref, xp_ref, acc_ref,
                         *, num_units, npu, ns):
    """out[t] = x[t] + sum_j P[unit(t), j] * x[t - npu + j], zero history,
    cross-unit context (the per-unit loop is static; taps are a fori_loop
    with ref-based dynamic slices)."""
    xp_ref[:, :npu] = jnp.zeros_like(xp_ref[:, :npu])
    xp_ref[:, npu:] = x_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for u in range(num_units):
        sl = slice(u * ns, (u + 1) * ns)
        for j in range(npu):
            seg = xp_ref[:, u * ns + j : u * ns + j + ns]
            coef = p_ref[:, u, j : j + 1]  # [TR, 1]
            # accumulate through memory: bounds live values so Mosaic
            # doesn't spill the unrolled SSA chain to stack
            acc_ref[:, sl] = acc_ref[:, sl] + coef * seg
    out_ref[:] = x_ref[:] + acc_ref[:]


def unit_forward_rows(x: jnp.ndarray, params: jnp.ndarray,
                      num_units: int) -> jnp.ndarray:
    """x: [rows, n]; params: [rows, num_units, npu] (reversed layout)."""
    x, real_rows = _pad_rows(x)
    params, _ = _pad_rows(params)
    rows, n = x.shape
    npu = params.shape[-1]
    ns = n // num_units
    tile = _row_tile(rows, (3 * n + num_units * npu) * 8)
    kernel = functools.partial(
        _unit_forward_kernel, num_units=num_units, npu=npu, ns=ns)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n), x.dtype),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, num_units, npu), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, n + npu), x.dtype),
            pltpu.VMEM((tile, n), x.dtype),
        ],
        interpret=not _on_tpu(),
    )(x, params)
    return out[:real_rows]


# ----------------------------------------------------- integer predict


def _predict_kernel(x_ref, c_ref, rs_ref, out_ref, xp_ref, acc_ref,
                    *, num_units, npu, ns, n):
    """Residual of one unit-split integer FIR layer (wire semantics of
    linne_lpc_predict.c:7-38): first npu samples of each unit and the
    remainder tail pass through. Accumulation is native int32 (wraparound
    matches the decoder's two's-complement arithmetic)."""
    rshift = rs_ref[:, 0][:, None]  # [TR, 1]
    half = (jnp.int32(1) << (rshift - 1))
    npred = ns - npu  # predicted samples per unit
    tr = x_ref.shape[0]
    xp_ref[:, :npu] = jnp.zeros_like(xp_ref[:, :npu])
    xp_ref[:, npu:] = x_ref[:]
    out_ref[:] = x_ref[:]
    for u in range(num_units):
        osl = slice(u * npred, (u + 1) * npred)
        acc_ref[:, osl] = jnp.broadcast_to(half, (tr, npred)).astype(jnp.int32)
        for j in range(npu):
            seg = xp_ref[:, u * ns + npu + j : u * ns + npu + j + npred]
            coef = c_ref[:, u, j : j + 1]  # [TR, 1]
            acc_ref[:, osl] = acc_ref[:, osl] + coef * seg
        out_ref[:, u * ns + npu : (u + 1) * ns] = (
            out_ref[:, u * ns + npu : (u + 1) * ns]
            + (acc_ref[:, osl] >> rshift))


def predict_rows(x: jnp.ndarray, coefs: jnp.ndarray, rshift: jnp.ndarray,
                 num_units: int) -> jnp.ndarray:
    """x: [rows, n] int32; coefs: [rows, order] int32 (flat unit layout);
    rshift: [rows] int32."""
    rows, n = x.shape
    order = coefs.shape[-1]
    npu = order // num_units
    ns = n // num_units
    if ns <= npu:
        return x
    c = coefs.reshape(rows, num_units, npu)
    x, real_rows = _pad_rows(x)
    c, _ = _pad_rows(c)
    rs2, _ = _pad_rows(rshift.reshape(rows, 1))
    rs2 = jnp.maximum(rs2, 1)  # padded rows: avoid a negative shift
    rows = x.shape[0]
    tile = _row_tile(rows, (3 * n + order) * 8)
    kernel = functools.partial(
        _predict_kernel, num_units=num_units, npu=npu, ns=ns, n=n)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, num_units, npu), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, n + npu), jnp.int32),
            pltpu.VMEM((tile, num_units * (ns - npu)), jnp.int32),
        ],
        interpret=not _on_tpu(),
    )(x, c, rs2)
    return out[:real_rows]

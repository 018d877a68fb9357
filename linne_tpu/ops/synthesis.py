"""Batched integer LPC synthesis — the decode-side recurrence.

The reconstruction IIR (reference: libs/linne_decoder/src/
linne_lpc_synthesize.c:8-83) is the one irreducibly serial loop in the
codec: data[t+npu] -= (half + sum_j c[j]*data[t+j]) >> rshift, and the
per-step arithmetic shift makes state-space blocking impossible bit-exactly.

TPU formulation: time stays sequential, but each vector op carries a FULL
8x128 register of independent recurrences — rows (= blocks x channels x
units) fill the 128-lane dimension AND the 8-sublane dimension, so one
program advances up to 1024 recurrences per step. The filter window rides
the loop carry as a tuple of [sg, 128] values (the per-step shift is SSA
renaming, no relayouts), and time is tiled so each fori iteration does one
dynamic load/store pair.

The XLA fallback is a lax.scan with the same layout for CPU correctness
tests; the host/native path (linne_host.cpp) remains the low-latency
streaming decoder.
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


_TTILE = 8       # time steps per fori iteration
_LANES = 128
# Mosaic's scoped-vmem stack is 16MB and holds BOTH the in and out blocks
# ([1, ns, sg, LANES] int32 each): budget sg so 2*sg*ns*LANES*4 stays well
# under it (the kernel also time-chunks at _MAX_NS, see synthesize_rows_tpu)
_VMEM_BUDGET = 6 << 20


def _synth_kernel(x_ref, c_ref, rs_ref, out_ref, *, npu, ns, sg):
    """Refs are [1, ns, sg, LANES] time-major int32; c [1, npu, sg, LANES];
    rs [1, 1, sg, LANES]."""
    one = jnp.int32(1)
    rshift = rs_ref[0, 0]                 # [sg, LANES]
    # corrupt streams may carry rshift=0 (4-bit field); 1 << -1 is undefined
    # — mirror the native runtime's guard (linne_host.cpp synth_unit_plain)
    half = jnp.where(rshift >= one, one << (rshift - one), jnp.int32(0))
    out_ref[:] = x_ref[:]
    c_rows = [c_ref[0, j] for j in range(npu)]  # each [sg, LANES]

    npred = ns - npu
    ntiles = npred // _TTILE
    t8 = jnp.int32(_TTILE)
    npu32 = jnp.int32(npu)

    def tile_step(tb, rows):
        base = npu32 + tb * t8
        xt = x_ref[0, pl.ds(base, _TTILE)]  # [T, sg, LANES]
        rows = list(rows)
        ys = []
        for k in range(_TTILE):
            pred = half
            for j in range(npu):
                pred = pred + c_rows[j] * rows[j]
            y = xt[k] - (pred >> rshift)    # [sg, LANES]
            ys.append(y)
            rows = rows[1:] + [y]
        out_ref[0, pl.ds(base, _TTILE)] = jnp.stack(ys, axis=0)
        return tuple(rows)

    rows0 = tuple(x_ref[0, j] for j in range(npu))
    rows = jax.lax.fori_loop(jnp.int32(0), jnp.int32(ntiles), tile_step,
                             rows0)

    def step(t, rows):
        rows = list(rows)
        pred = half
        for j in range(npu):
            pred = pred + c_rows[j] * rows[j]
        tn = t + npu32
        y = x_ref[0, pl.ds(tn, 1)][0] - (pred >> rshift)
        out_ref[0, pl.ds(tn, 1)] = y[None]
        return tuple(rows[1:] + [y])

    jax.lax.fori_loop(jnp.int32(ntiles * _TTILE), jnp.int32(npred), step,
                      rows)


_MAX_NS = 4096  # per-launch time window: in+out VMEM stays under the
                # 16MB scoped limit (2 * sg * _MAX_NS * 128 lanes * 4B)


def synthesize_rows_tpu(x: jnp.ndarray, coefs: jnp.ndarray,
                        rshift: jnp.ndarray) -> jnp.ndarray:
    """x: [rows, ns] int32 residual segments; coefs: [rows, npu] int32
    (wire order: c[j] pairs with data[t+j]); rshift: [rows] int32.
    Returns reconstructed [rows, ns].

    Long segments are processed in _MAX_NS time chunks: the IIR state is
    exactly the last npu outputs, which become the next chunk's prefix, so
    chunking is bit-transparent while keeping each launch inside VMEM.
    """
    rows, ns = x.shape
    npu = coefs.shape[-1]
    if ns <= npu:
        return x
    if ns > _MAX_NS:
        outs = []
        win = x[:, :npu]
        outs.append(win)
        t = npu
        while t < ns:
            take = min(_MAX_NS - npu, ns - t)
            seg = jnp.concatenate([win, x[:, t : t + take]], axis=1)
            out = _synthesize_rows_call(seg, coefs, rshift)
            outs.append(out[:, npu:])
            win = out[:, -npu:]
            t += take
        return jnp.concatenate(outs, axis=1)
    return _synthesize_rows_call(x, coefs, rshift)


def _synthesize_rows_call(x: jnp.ndarray, coefs: jnp.ndarray,
                          rshift: jnp.ndarray) -> jnp.ndarray:
    rows, ns = x.shape
    npu = coefs.shape[-1]
    # sublane groups per program, bounded by VMEM (in+out buffers)
    sg = max(1, min(8, _VMEM_BUDGET // (ns * _LANES * 4 * 2)))
    rows_per = sg * _LANES
    pad = (-rows) % rows_per
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        coefs = jnp.pad(coefs, ((0, pad), (0, 0)))
        rshift = jnp.pad(rshift, (0, pad), constant_values=1)
    g = x.shape[0] // rows_per

    def to_tsl(a, width):  # [rows, width] -> [G, width, sg, LANES]
        return a.reshape(g, sg, _LANES, width).transpose(0, 3, 1, 2)

    xt = to_tsl(x, ns)
    ct = to_tsl(coefs, npu)
    rst = to_tsl(rshift[:, None], 1)
    kernel = functools.partial(_synth_kernel, npu=npu, ns=ns, sg=sg)
    # trace without x64 so loop indices/literals stay 32-bit (Mosaic has no
    # 64-bit types)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g, ns, sg, _LANES), jnp.int32),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, ns, sg, _LANES),
                             lambda i: (i, i * 0, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npu, sg, _LANES),
                             lambda i: (i, i * 0, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sg, _LANES),
                             lambda i: (i, i * 0, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ns, sg, _LANES),
                                   lambda i: (i, i * 0, i * 0, i * 0),
                                   memory_space=pltpu.VMEM),
            interpret=not _on_tpu(),
        )(xt, ct, rst)
    out = out.transpose(0, 2, 3, 1).reshape(-1, ns)
    return out[:rows]


def synthesize_rows_xla(x: jnp.ndarray, coefs: jnp.ndarray,
                        rshift: jnp.ndarray) -> jnp.ndarray:
    """lax.scan reference formulation (CPU tests / fallback)."""
    rows, ns = x.shape
    npu = coefs.shape[-1]
    if ns <= npu:
        return x
    # rshift=0 guard as in the Pallas kernel / native runtime
    half = jnp.where(rshift >= 1, jnp.int32(1) << (rshift - 1),
                     jnp.int32(0))  # [rows]

    # carry: window of the last npu outputs [rows, npu]
    win0 = x[:, :npu]

    def step(win, xt):
        # dtype=int32 forces an int32 accumulator: under jax_enable_x64,
        # jnp.sum would otherwise promote to int64 and silently lose the
        # wire format's two's-complement wraparound (caught by the
        # LINNE_TEST_TPU lane comparing against the Pallas kernel)
        pred = jnp.sum(coefs * win, axis=-1, dtype=jnp.int32) + half
        yt = (xt - (pred >> rshift)).astype(jnp.int32)
        win = jnp.concatenate([win[:, 1:], yt[:, None]], axis=1)
        return win, yt

    _, ys = jax.lax.scan(step, win0, x[:, npu:].T)
    return jnp.concatenate([x[:, :npu], ys.T], axis=1)


def synthesize_rows(x, coefs, rshift):
    if _on_tpu():
        return synthesize_rows_tpu(x, coefs, rshift)
    return synthesize_rows_xla(x, coefs, rshift)

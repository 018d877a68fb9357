"""Batched integer LPC synthesis — the decode-side recurrence.

The reconstruction IIR (reference: libs/linne_decoder/src/
linne_lpc_synthesize.c:8-83) is the one irreducibly serial loop in the
codec: data[t+npu] -= (half + sum_j c[j]*data[t+j]) >> rshift, and the
per-step arithmetic shift makes state-space blocking impossible bit-exactly.
The TPU formulation keeps time sequential but runs THOUSANDS of independent
recurrences in parallel: rows = blocks x channels x units ride the lane
dimension, time rides the sublane dimension (dynamic sublane offsets are
legal in Mosaic, unlike unaligned lane offsets), and one Pallas kernel scans
the whole segment with the filter taps held in VMEM.

The XLA fallback is a lax.scan with the same layout for CPU correctness
tests; the host/native path (linne_host.cpp) remains the low-latency
streaming decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas import _on_tpu, _use_pallas_env


def _synth_kernel(x_ref, c_ref, rs_ref, out_ref, *, npu, ns):
    """Blocks are [1, ns, LANES] time-major int32; rs [1, 1, LANES]."""
    rshift = rs_ref[0, 0, :]
    half = jnp.int32(1) << (rshift - 1)
    out_ref[:] = x_ref[:]
    c = c_ref[0]  # [npu, LANES]

    def step(t, _):
        win = out_ref[0, pl.ds(t, npu), :]  # [npu, LANES]
        pred = jnp.sum(c * win, axis=0) + half
        out_ref[0, pl.ds(t + npu, 1), :] = (
            out_ref[0, pl.ds(t + npu, 1), :] - (pred >> rshift)[None, :])
        return 0

    jax.lax.fori_loop(0, ns - npu, step, 0)


def synthesize_rows_tpu(x: jnp.ndarray, coefs: jnp.ndarray,
                        rshift: jnp.ndarray) -> jnp.ndarray:
    """x: [rows, ns] int32 residual segments; coefs: [rows, npu] int32
    (wire order: c[j] pairs with data[t+j]); rshift: [rows] int32.
    Returns reconstructed [rows, ns]."""
    rows, ns = x.shape
    npu = coefs.shape[-1]
    if ns <= npu:
        return x
    lanes = 128
    pad = (-rows) % lanes
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        coefs = jnp.pad(coefs, ((0, pad), (0, 0)))
        rshift = jnp.pad(rshift, (0, pad), constant_values=1)
    nlgrp = x.shape[0] // lanes
    xt = x.reshape(nlgrp, lanes, ns).transpose(0, 2, 1)      # [G, ns, 128]
    ct = coefs.reshape(nlgrp, lanes, npu).transpose(0, 2, 1)  # [G, npu, 128]
    rst = rshift.reshape(nlgrp, 1, lanes)
    kernel = functools.partial(_synth_kernel, npu=npu, ns=ns)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nlgrp, ns, lanes), jnp.int32),
        grid=(nlgrp,),
        in_specs=[
            pl.BlockSpec((1, ns, lanes), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npu, lanes), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ns, lanes), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(xt, ct, rst)
    out = out.transpose(0, 2, 1).reshape(-1, ns)
    return out[:rows]


def synthesize_rows_xla(x: jnp.ndarray, coefs: jnp.ndarray,
                        rshift: jnp.ndarray) -> jnp.ndarray:
    """lax.scan reference formulation (CPU tests / fallback)."""
    rows, ns = x.shape
    npu = coefs.shape[-1]
    if ns <= npu:
        return x
    half = (jnp.int32(1) << (rshift - 1))  # [rows]

    # carry: window of the last npu outputs [rows, npu]
    win0 = x[:, :npu]

    def step(win, xt):
        pred = jnp.sum(coefs * win, axis=-1) + half
        yt = (xt - (pred >> rshift)).astype(jnp.int32)
        win = jnp.concatenate([win[:, 1:], yt[:, None]], axis=1)
        return win, yt

    _, ys = jax.lax.scan(step, win0, x[:, npu:].T)
    return jnp.concatenate([x[:, :npu], ys.T], axis=1)


def synthesize_rows(x, coefs, rshift):
    if _on_tpu() or _use_pallas_env():
        return synthesize_rows_tpu(x, coefs, rshift)
    return synthesize_rows_xla(x, coefs, rshift)

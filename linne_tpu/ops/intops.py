"""Batched integer (wire-semantics) device ops: MS transform, pre-emphasis,
and the unit-split LPC predict cascade.

All ops use native int32 arithmetic, whose XLA wraparound semantics match
the reference's two's-complement behaviour, so device-computed residuals are
bit-identical to what the reference decoder expects
(reference: libs/linne_internal/src/linne_utility.c:120-212,
libs/linne_encoder/src/linne_lpc_predict.c:7-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PREEMPH_COEF_SHIFT


def ms_transform(buf: jnp.ndarray) -> jnp.ndarray:
    """L/R -> mid/side on channels 0/1 of buf[..., ch, n] (int32)."""
    side = buf[..., 1, :] - buf[..., 0, :]
    mid = buf[..., 0, :] + (side >> 1)
    rest = buf[..., 2:, :]
    return jnp.concatenate(
        [mid[..., None, :], side[..., None, :], rest], axis=-2)


def preemphasis_coefficient(x: jnp.ndarray, dtype=jnp.float64) -> jnp.ndarray:
    """Batched pre-emphasis coefficient (reference:
    linne_utility.c:158-193). x: [..., n] int32. Returns int32 coef [...]."""
    d = x.astype(dtype)
    curr = d[..., :-1]
    succ = d[..., 1:]
    corr0 = jnp.sum(curr * curr, axis=-1)
    corr1 = jnp.sum(curr * succ, axis=-1)
    ratio = corr1 / jnp.where(corr0 == 0, 1.0, corr0)
    coef = jnp.floor(ratio * 32.0 + 0.5).astype(jnp.int32)
    coef = jnp.minimum(coef, (1 << (PREEMPH_COEF_SHIFT - 1)) - 1)
    bad = (corr0 < 1e-6) | (ratio < 0.0)
    return jnp.where(bad, 0, coef)


def preemphasis_apply(x: jnp.ndarray, coef: jnp.ndarray) -> jnp.ndarray:
    """y[t] = x[t] - ((x[t-1] * coef) >> 5), x[-1] := x[0]
    (the encoder seeds prev with the first sample, linne_encoder.c:637)."""
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    return x - ((prev * coef[..., None]) >> PREEMPH_COEF_SHIFT)


def predict_cascade_layer(
    x: jnp.ndarray, coefs: jnp.ndarray, log2_units: jnp.ndarray,
    rshift: jnp.ndarray, unit_choices: list,
) -> jnp.ndarray:
    """One integer predict layer with runtime-selected unit count.

    x: [..., n] int32 signal; coefs: [..., order] int32 (flat unit layout);
    log2_units: [...] int32; rshift: [...] int32. `unit_choices` is the
    static list of possible unit counts (each divides both the layer order
    and n). Computed as ONE dense full-order masked pass (the int analog of
    the trainer's canonical layout, ops/training.py:_dense_layouts): the
    row's order/u taps are gathered tail-aligned into a per-finest-segment
    [u_max, order] filter, invalid ages zero, and the per-unit passthrough
    zones (first order/u samples of every unit, linne_lpc_predict.c:15)
    are masked after the fact. One scan of `order` steps replaces one scan
    per unit-count variant (sum 2x the steps) plus the stacked select.
    """
    if len(unit_choices) == 1:
        return _predict_fixed_units(x, coefs, unit_choices[0], rshift)
    n = x.shape[-1]
    if all(n % u == 0 for u in unit_choices):
        return _predict_dense(x, coefs, log2_units, rshift,
                              max(unit_choices))
    # ragged length (device-encoded tail whose choices came from the
    # rounded analyze length): real unit boundaries (u * (n // u)) do not
    # align with the finest grid, so compute per-variant and select
    variants = [
        _predict_fixed_units(x, coefs, u, rshift) for u in unit_choices
    ]
    stack = jnp.stack(variants, axis=0)  # [nvar, ..., n]
    choice_map = {u: i for i, u in enumerate(unit_choices)}
    lut = jnp.asarray(
        [choice_map.get(1 << l, 0) for l in range(8)], dtype=jnp.int32)
    idx = lut[log2_units]
    return jnp.take_along_axis(stack, idx[None, ..., None], axis=0)[0]


def _predict_dense(
    x: jnp.ndarray, coefs: jnp.ndarray, log2u: jnp.ndarray,
    rshift: jnp.ndarray, u_max: int,
) -> jnp.ndarray:
    n = x.shape[-1]
    order = coefs.shape[-1]
    ns_max = n // u_max  # caller guarantees u_max | n, so u_max*ns_max == n
    batch = x.shape[:-1]
    # dense coef gather: fine segment s belongs to real unit s*u//u_max;
    # column j carries tap age k = order - j, valid iff k <= order/u.
    # Broadcast shapes are built from the batch rank so any [..., n] input
    # works (the encoder passes [B, C, n]).
    k = (order - jnp.arange(order)).reshape(
        (1,) * len(batch) + (1, order))               # [..1.., 1, order]
    s = jnp.arange(u_max).reshape(
        (1,) * len(batch) + (u_max, 1))               # [..1.., u_max, 1]
    u_r = (jnp.int32(1) << log2u)[..., None, None]
    npu_r = jnp.right_shift(jnp.int32(order), log2u)[..., None, None]
    unit = (s * u_r) // u_max                         # [.., u_max, 1]
    valid = k <= npu_r
    src = unit * npu_r + (npu_r - k)
    flat = jnp.broadcast_to(coefs[..., None, :], batch + (u_max, order))
    dense = jnp.where(valid,
                      jnp.take_along_axis(flat, jnp.where(valid, src, 0),
                                          axis=-1), 0)

    half = jnp.int32(1) << (rshift - 1)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(order, 0)])

    def step(acc, j):
        xj = jax.lax.dynamic_slice_in_dim(xp, j, n, axis=-1)  # x[g-order+j]
        cj = jax.lax.dynamic_slice_in_dim(dense, j, 1, axis=-1)[..., 0]
        return acc + jnp.repeat(cj, ns_max, axis=-1) * xj, None

    acc0 = jnp.broadcast_to(half[..., None], batch + (n,)).astype(jnp.int32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(order), unroll=8)
    pred = acc >> rshift[..., None]
    # passthrough: the first order/u samples of every real unit
    g = jnp.arange(n)
    ns_r = jnp.right_shift(jnp.int32(n), log2u)[..., None]  # n >> l == n//u
    offset = g - (g // ns_r) * ns_r
    kept = offset >= npu_r[..., 0]
    return x + jnp.where(kept, pred, 0)


def _predict_fixed_units(
    x: jnp.ndarray, coefs: jnp.ndarray, num_units: int, rshift: jnp.ndarray,
) -> jnp.ndarray:
    """FIR residual for a fixed unit split. The first order//num_units
    samples of each unit and any remainder tail pass through."""
    n = x.shape[-1]
    order = coefs.shape[-1]
    npu = order // num_units
    ns = n // num_units
    if ns <= npu:
        return x
    body_len = num_units * ns
    seg = x[..., :body_len].reshape(x.shape[:-1] + (num_units, ns))
    c = coefs.reshape(coefs.shape[:-1] + (num_units, npu))
    half = (jnp.int32(1) << (rshift - 1))[..., None, None]

    def step(acc, j):
        xj = jax.lax.dynamic_slice_in_dim(seg, j, ns - npu, axis=-1)
        cj = jax.lax.dynamic_slice_in_dim(c, j, 1, axis=-1)
        return acc + cj * xj, None

    pred0 = jnp.broadcast_to(half, seg.shape[:-1] + (ns - npu,)).astype(jnp.int32)
    pred, _ = jax.lax.scan(step, pred0, jnp.arange(npu), unroll=8)
    pred = pred >> rshift[..., None, None]
    out_seg = seg.at[..., npu:].add(pred)
    out = jnp.concatenate(
        [out_seg.reshape(x.shape[:-1] + (body_len,)), x[..., body_len:]],
        axis=-1)
    return out


def normalize_to_float(x: jnp.ndarray, bits_per_sample: int, dtype) -> jnp.ndarray:
    return x.astype(dtype) * (2.0 ** (-(bits_per_sample - 1)))

"""Batched on-device gradient training of the per-block predictor.

The reference fine-tunes every block's layer cascade with full-batch
momentum gradient descent on the L1 residual loss, with per-block early
stopping (reference: linne_network.c:805-873, hyperparameters
linne_internal.h:29-33). Here the whole [blocks, channels] population trains
in ONE device loop: a lax.while_loop carries (params, momentum, prev_loss,
active) and converged blocks freeze via masked updates, exactly mirroring
the reference's independent per-block stopping rule.

Because each row's unit count is frozen during training, the loop body
does NOT evaluate every unit-count variant: the parameters are gathered
once per iteration into a canonical [u_max, order] per-segment layout
(_dense_layouts) and the cascade runs one unit_forward per layer. This
cut the per-iteration op count several-fold vs differentiating through a
stacked-variant select (the population converges in tens of iterations on
real material — p50 ~11, max ~55 measured via the exact oracle; confirmed
on-device in f32: iteration caps of 50 and 200 produce byte-identical
streams in equal time, docs/PROFILE_r3.md — so the body cost, not the
iteration bound, dominates).

Gradients come from jax.grad of the actual forward cascade (the reference's
hand-rolled backward scales the input gradient by 1/order as a heuristic —
linne_network.c:251-252 — so trained coefficients differ in low bits from
the C encoder; output streams remain lossless either way). The compression
cost of the deviation is measured, not assumed: `-m 0 -l` on the TPU path
vs the C CLI with the same flags differs by <=0.01 percentage points of
size across the eval corpus (48.73/55.06/65.13 vs C 48.72/55.06/65.13;
docs/PROFILE_r3.md, evaluate_codecs.py --learning-rows).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .analysis import unit_forward


def _forward_loss(params_list, log2u_list, sig, orders, unit_choices):
    """L1 loss of the full cascade with per-(block, channel) unit counts
    selected among the static candidates."""
    x = sig
    for li, order in enumerate(orders):
        choices = unit_choices[li]
        variants = []
        for u in choices:
            p = params_list[li].reshape(
                params_list[li].shape[:-1] + (u, order // u))
            variants.append(unit_forward(x, p, u))
        stack = jnp.stack(variants, axis=0)
        lut = {u: i for i, u in enumerate(choices)}
        table = jnp.asarray(
            [lut.get(1 << l, 0) for l in range(8)], dtype=jnp.int32)
        idx = table[log2u_list[li]]
        x = jnp.take_along_axis(stack, idx[None, ..., None], axis=0)[0]
    n = x.shape[-1]
    return jnp.sum(jnp.abs(x), axis=-1) / n  # per-(B, C) loss


def _dense_layouts(orders: Sequence[int], unit_choices, log2u_list):
    """Per-layer gather spec embedding each row's (u, order/u)-reshaped
    parameters into ONE canonical [u_max, order] per-segment filter layout
    (u_max = finest candidate split). Segment s of the finest split belongs
    to real unit s*u//u_max; the row's order/u taps sit tail-aligned on the
    j axis (j = order - age, reference reversed layout), invalid ages
    masked. The unit counts are frozen during training, so the layout is
    computed once and the whole cascade forward becomes one unit_forward
    per layer instead of one per unit-count variant."""
    out = []
    for order, choices, log2u in zip(orders, unit_choices, log2u_list):
        u_max = max(choices)
        k = order - jnp.arange(order)  # tap age at column j: order..1
        s = jnp.arange(u_max)
        u_r = (jnp.int32(1) << log2u)[..., None, None]
        npu_r = jnp.right_shift(jnp.int32(order), log2u)[..., None, None]
        unit = (s[None, None, :, None] * u_r) // u_max
        valid = k[None, None, None, :] <= npu_r
        src = unit * npu_r + (npu_r - k[None, None, None, :])
        out.append((jnp.where(valid, src, 0).astype(jnp.int32),
                    valid, u_max))
    return out


def _dense_forward_loss(params_list, layouts, sig):
    """L1 loss of the cascade in the canonical dense layout."""
    x = sig
    for p, (src, valid, u_max) in zip(params_list, layouts):
        flat = jnp.broadcast_to(p[..., None, :], src.shape)
        coefs = jnp.where(valid,
                          jnp.take_along_axis(flat, src, axis=-1), 0.0)
        x = unit_forward(x, coefs, u_max)
    n = x.shape[-1]
    return jnp.sum(jnp.abs(x), axis=-1) / n  # per-(B, C) loss


def make_train_fn(orders: Sequence[int], unit_choices,
                  max_iters: int, learning_rate: float, loss_eps: float,
                  alpha: float = 0.8):
    """Returns train(sig, params_list, log2u_list) -> trained params_list."""

    def train(sig, params_list, log2u_list):
        params0 = tuple(params_list)
        layouts = _dense_layouts(orders, unit_choices, log2u_list)

        def total_loss(params_list, sig):
            per = _dense_forward_loss(params_list, layouts, sig)
            return jnp.sum(per), per

        grad_fn = jax.grad(total_loss, has_aux=True)
        momentum0 = tuple(jnp.zeros_like(p) for p in params0)
        prev0 = jnp.full(sig.shape[:-1], jnp.inf, dtype=sig.dtype)
        active0 = jnp.ones(sig.shape[:-1], dtype=bool)

        def cond(carry):
            _p, _m, _prev, active, it = carry
            return (it < max_iters) & jnp.any(active)

        def body(carry):
            params, momentum, prev, active, it = carry
            grads, per_loss = grad_fn(params, sig)
            mask = active[..., None].astype(sig.dtype)
            new_momentum = tuple(
                jnp.where(active[..., None], alpha * m + learning_rate * g, m)
                for m, g in zip(momentum, grads))
            new_params = tuple(
                p - mask * nm for p, nm in zip(params, new_momentum))
            active = active & (jnp.abs(per_loss - prev) >= loss_eps)
            return (new_params, new_momentum, per_loss, active, it + 1)

        params, _m, _l, _a, _i = jax.lax.while_loop(
            cond, body, (params0, momentum0, prev0, active0, 0))
        return list(params)

    return train

"""Device-side partitioned-Rice parameter search.

The reference searches partition orders by re-walking every sample per
candidate order on the host (reference: libs/linne_coder/src/linne_coder.c:
217-279). Here the whole search is a batched device computation: partition
sums come from reshapes, per-partition Rice parameters from the closed-form
MLE, and exact per-sample code lengths are summed in uint32 (wrapping like
the reference's uint32 accumulator). The host only emits bits with the
returned parameters.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from ..constants import LOG2_MAX_NUM_PARTITIONS, RICE_PARAMETER_BITS

_OPTX = 0.5127629514437670454896078808815218508243560791015625
_LOG_OPTX = math.log(_OPTX)


def max_porder_for(num_samples: int) -> int:
    p = 1
    while num_samples % (1 << p) == 0:
        p += 1
    return min(p - 1, LOG2_MAX_NUM_PARTITIONS)


def _optimal_k2(mean: jnp.ndarray) -> jnp.ndarray:
    rho = 1.0 / (1.0 + mean)
    log1m = jnp.log(jnp.maximum(1.0 - rho, 1e-300))
    ratio = _LOG_OPTX / log1m
    k2 = jnp.floor(jnp.log2(jnp.maximum(ratio, 1e-300)))
    k2 = jnp.clip(k2, 0.0, 31.0).astype(jnp.int32)
    return jnp.where(mean <= 0.0, 0, k2)


def _zigzag_u32(x: jnp.ndarray) -> jnp.ndarray:
    return ((x << 1) ^ (x >> 31)).astype(jnp.uint32)


def _gamma_bits(uval: jnp.ndarray) -> jnp.ndarray:
    # 1 for 0, else 2*ceil(log2(v+2)) - 1
    nd = 32 - _clz32((uval + 1).astype(jnp.uint32))
    return jnp.where(uval == 0, 1, 2 * nd - 1).astype(jnp.uint32)


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        x == 0, 32,
        31 - jnp.floor(jnp.log2(jnp.maximum(x.astype(jnp.float64), 1.0)))
    ).astype(jnp.int32)


def rice_search(
    data: jnp.ndarray, compute_dtype=jnp.float64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """data: [..., n] int32 residual planes.
    Returns (best_porder[...] int32, k2[..., 2^max_porder] int32 where the
    first 2^best_porder entries are the per-partition parameters)."""
    n = data.shape[-1]
    max_porder = max_porder_for(n)
    max_parts = 1 << max_porder
    u = _zigzag_u32(data)
    uf = u.astype(compute_dtype)

    finest = uf.reshape(uf.shape[:-1] + (max_parts, n // max_parts))
    finest_sums = jnp.sum(finest, axis=-1)

    totals = []
    k2_padded = []
    sums = finest_sums
    u64 = u.astype(jnp.uint32)
    for porder in range(max_porder, -1, -1):
        nparts = 1 << porder
        nsmpl = n >> porder
        mean = sums / nsmpl
        k2 = _optimal_k2(mean)                      # [..., nparts]
        # per-sample code lengths via a [parts, nsmpl] view + broadcast
        uv = u64.reshape(u64.shape[:-1] + (nparts, nsmpl))
        k2b = k2[..., None].astype(jnp.uint32)
        # len(u) = k2+2 + max(q-2, 0) with q = u >> k2: the small case
        # (u < 2^(k2+1), i.e. q < 2) costs k1+1 = k2+2 bits, and the big
        # case (u - 2^(k2+1)) >> k2 == q - 2 exactly — same integer values
        # as the two-branch form, half the elementwise work
        q = uv >> k2b
        lens = k2b + 2 + jnp.where(q >= 2, q - 2, 0)
        bits = jnp.sum(lens.astype(jnp.uint32), axis=(-2, -1))
        # parameter header bits: 5 for the first k2, gamma(zigzag(delta))
        bits = bits + jnp.uint32(RICE_PARAMETER_BITS)
        if nparts > 1:
            delta = k2[..., 1:] - k2[..., :-1]
            zz = ((delta << 1) ^ (delta >> 31)).astype(jnp.uint32)
            bits = bits + jnp.sum(_gamma_bits(zz), axis=-1)
        totals.append(bits)
        pad = max_parts - nparts
        k2_padded.append(
            jnp.pad(k2, [(0, 0)] * (k2.ndim - 1) + [(0, pad)]))
        if porder > 0:
            sums = sums.reshape(sums.shape[:-1] + (nparts // 2, 2)).sum(-1)

    # stacks are in descending porder; best = first minimum in ASCENDING
    # porder order (reference iterates porder upward with strict >)
    totals = totals[::-1]
    k2_padded = k2_padded[::-1]
    tstack = jnp.stack(totals, axis=0)
    best = jnp.argmin(tstack, axis=0).astype(jnp.int32)
    kstack = jnp.stack(k2_padded, axis=0)
    k2_sel = jnp.take_along_axis(kstack, best[None, ..., None], axis=0)[0]
    return best, k2_sel

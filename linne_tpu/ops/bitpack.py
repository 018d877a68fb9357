"""Device-side W-bit plane packing for slim device<->host transfers.

Transfers through the host link are the dominant cost of both the batched
encoder (residual planes out) and the batched decoder (reconstruction
planes out), so sample planes travel at a static W bits per sample in two's
complement, shift/OR-packed into int32 words. The host-side inverse is
native.unpack_bits (with TpuEncoder._unpack_res as the numpy fallback).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def pack_geometry(width: int):
    """(samples per group, words per group) for a W-bit plane: groups of g
    samples pack exactly into g*W/32 int32 words."""
    g = 32 // math.gcd(width, 32)
    return g, width * g // 32


def pack_plane_words(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """[..., n] int32 -> [..., ceil(n/g)*wpg] int32 words carrying the low
    `width` bits of each sample (two's complement)."""
    g, wpg = pack_geometry(width)
    n = x.shape[-1]
    pad = (-n) % g
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    u = (x & ((1 << width) - 1)).astype(jnp.uint32).reshape(
        x.shape[:-1] + (-1, g))
    acc = [jnp.zeros(u.shape[:-1], jnp.uint32) for _ in range(wpg)]
    for j in range(g):
        k, off = divmod(j * width, 32)
        acc[k] = acc[k] | (u[..., j] << off)
        if off + width > 32:
            acc[k + 1] = acc[k + 1] | (u[..., j] >> (32 - off))
    return jax.lax.bitcast_convert_type(
        jnp.stack(acc, axis=-1).reshape(x.shape[:-1] + (-1,)), jnp.int32)

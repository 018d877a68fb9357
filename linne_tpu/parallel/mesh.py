"""Multi-chip scaling via jax.sharding.

The codec's parallel structure (SURVEY.md §2): blocks are fully independent
on encode, so corpus-scale throughput is pure data parallelism over a
[blocks] mesh axis via shard_map; channels/units/candidates stay inside each
shard as batched dimensions. The only cross-device communication is the
reduction of corpus statistics (bit totals/loss means) — a psum over ICI —
plus host-side gathering of per-block byte sizes for bitstream concatenation.
"""

from __future__ import annotations


from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_block_mesh(devices=None, axis_name: str = "blocks") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_blocks(mesh: Mesh, blocks: jnp.ndarray, axis_name: str = "blocks"):
    """Place a [B, C, N] block batch with B sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name, None, None))
    return jax.device_put(blocks, sharding)


def sharded_analyze(encoder, mesh: Mesh, blocks, n: int,
                    axis_name: str = "blocks"):
    """Run the encoder's jitted block analysis data-parallel over the mesh.

    The per-block analysis has no cross-block dependencies, so sharding the
    leading axis lets XLA run each shard on its own chip with zero
    collectives in the numeric path.
    """
    fn, _ = encoder._analyze_fn(n)
    blocks = shard_blocks(mesh, jnp.asarray(blocks), axis_name)
    with mesh:
        return fn(blocks)


def training_step_fn(layer_orders: Sequence[int], n: int, dtype,
                     axis_name: str = "blocks"):
    """A jittable data-parallel training step on the network's L1 loss.

    This is the multi-chip analog of the reference's per-block momentum
    trainer (linne_network.c:805-873): each device fits its local shard of
    blocks; a psum'd global loss exercises the ICI reduction path. Written
    with shard_map so the sharding is explicit and collective placement is
    controlled.
    """
    from ..ops import analysis as A

    def local_step(params, signal, momentum):
        # params: list of [B_local, C, order]; signal: [B_local, C, n]
        def loss_fn(ps):
            x = signal
            for li, order in enumerate(layer_orders):
                # single-unit forward: x[t] += sum_j p[j] x[t-order+j]
                x = A.unit_forward(x, ps[li][..., None, :], 1)
            # per-block L1 loss, mean over the local shard
            return jnp.sum(jnp.abs(x)) / x.size

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # global mean loss over all devices (ICI psum)
        gloss = jax.lax.pmean(loss, axis_name)
        new_momentum = tuple(
            0.8 * m + 0.1 * g for m, g in zip(momentum, grads))
        new_params = tuple(p - m for p, m in zip(params, new_momentum))
        return new_params, new_momentum, gloss

    return local_step


def make_sharded_train_step(mesh: Mesh, layer_orders: Sequence[int], n: int,
                            dtype=jnp.float32, axis_name: str = "blocks"):
    local = training_step_fn(layer_orders, n, dtype, axis_name)
    nlayers = len(layer_orders)
    pspec_params = [P(axis_name, None, None)] * nlayers
    pspec_sig = P(axis_name, None, None)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tuple(pspec_params), pspec_sig, tuple(pspec_params)),
        out_specs=(tuple(pspec_params), tuple(pspec_params), P()),
        check_vma=False)
    return jax.jit(sharded)

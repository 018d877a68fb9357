"""Batched auxiliary-function (IRLS) coefficient refinement.

The reference refines each unit's Levinson-Durbin fit by iteratively
reweighted least squares on the L1 objective: build normal equations
weighted by 1/|residual|, solve by Cholesky, repeat
(reference: lpc.c:452-509, 578-633). Here whole row populations
(rows = blocks x channels x units, grouped by unit count so shapes are
static) refine together: the normal matrices are accumulated as chunked
X^T diag(w) X einsums (MXU work, no [rows, n, order] materialization) and
solved with a batched Cholesky.

Runs a fixed iteration count (the reference early-stops per fit on an
objective delta of 1e-8; a fixed count is equivalent work device-side and
converged rows simply stop moving).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RES_EPS = 1e-6
_CHUNK = 2048


def _windows_chunk(data: jnp.ndarray, start: int, size: int, order: int):
    """X[t, i] = data[start + t - i - 1] for t in [0, size), i in [0, order).
    data: [rows, ns]. One gather keeps the graph small even for order 128."""
    idx = (start + jnp.arange(size)[:, None]) - jnp.arange(order)[None, :] - 1
    return data[:, idx]  # [rows, size, order]


def af_refine(data: jnp.ndarray, a0: jnp.ndarray, num_iterations: int):
    """data: [rows, ns] layer-input segments; a0: [rows, order] initial
    prediction coefficients in the reference's sign convention
    (residual = x_t + sum_i a_i x_{t-i-1}). Returns refined a."""
    rows, ns = data.shape
    order = a0.shape[-1]
    nres = ns - order
    if nres <= 0 or num_iterations == 0:
        return a0
    d_all = data[:, order:]  # [rows, nres]

    chunk_bounds = []
    pos = order
    while pos < ns:
        size = min(_CHUNK, ns - pos)
        chunk_bounds.append((pos, size))
        pos += size

    def iteration(a, _):
        # residual pass
        res_parts = []
        for start, size in chunk_bounds:
            X = _windows_chunk(data, start, size, order)
            res_parts.append(
                data[:, start : start + size]
                + jnp.einsum("rto,ro->rt", X, a))
        res = jnp.abs(jnp.concatenate(res_parts, axis=-1))
        w = 1.0 / jnp.maximum(res, _RES_EPS)  # [rows, nres]
        # normal equations, chunked
        r_mat = jnp.zeros((rows, order, order), dtype=data.dtype)
        r_vec = jnp.zeros((rows, order), dtype=data.dtype)
        off = 0
        for start, size in chunk_bounds:
            X = _windows_chunk(data, start, size, order)
            wc = w[:, off : off + size]
            Xw = X * wc[..., None]
            r_mat = r_mat + jnp.einsum("rto,rtp->rop", Xw, X)
            r_vec = r_vec - jnp.einsum(
                "rt,rto->ro", data[:, start : start + size] * wc, X)
            off += size
        # batched SPD solve; singular/invalid rows -> zero coefficients
        # (the reference zeroes coefficients on a singular matrix)
        chol = jnp.linalg.cholesky(r_mat)
        y = jax.scipy.linalg.solve_triangular(chol, r_vec[..., None],
                                              lower=True)
        sol = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), y, lower=False)[..., 0]
        ok = jnp.all(jnp.isfinite(sol), axis=-1, keepdims=True)
        return jnp.where(ok, sol, 0.0), None

    a, _ = jax.lax.scan(iteration, a0, None, length=num_iterations)
    return a


def make_af_refit_fn(order: int, num_iterations: int):
    @jax.jit
    def refit(data, a0):
        return af_refine(data, a0, num_iterations)

    return refit


def make_af_layer_stage(order: int, unit_choices, num_iterations: int):
    """One jitted AF-refined layer pass for the encoder's `-a` path.

    Mirrors the reference's final SetParameter pass with AF iterations
    (linne_network.c:596-598, 628-629): re-initialize each unit split with
    the (ridge-regularized) Levinson-Durbin fit, refine with IRLS, then
    forward the layer. All unit-split candidates are evaluated and the
    per-(block, channel) winner — already decided by the af=0 sweep, since
    the reference's final unit search uses 0 AF iterations — is gathered.

    Returns stage(x, log2u, ridge_val) -> (flat_params, residual)."""
    from .analysis import fit_unit_lpc, unit_forward

    lut_table = {u: i for i, u in enumerate(unit_choices)}

    @jax.jit
    def stage(x, log2u, ridge_val):
        # x: [B, C, n] float; log2u: [B, C] int; ridge_val: [B, C] float
        n = x.shape[-1]
        flats = []
        residuals = []
        for u in unit_choices:
            npu = order // u
            ns = n // u
            rev = fit_unit_lpc(x, u, npu, ridge_val[..., None])
            a0 = jnp.flip(rev, axis=-1)  # natural tap order for IRLS
            segs = x.reshape(x.shape[:-1] + (u, ns)).reshape(-1, ns)
            a = af_refine(segs, a0.reshape(-1, npu), num_iterations)
            a = a.reshape(a0.shape)
            rev2 = jnp.flip(a, axis=-1)  # back to wire (reversed) layout
            flats.append(rev2.reshape(x.shape[:-1] + (order,)))
            residuals.append(unit_forward(x, rev2, u))
        fstack = jnp.stack(flats, axis=0)
        rstack = jnp.stack(residuals, axis=0)
        table = jnp.asarray(
            [lut_table.get(1 << l, 0) for l in range(8)], dtype=jnp.int32)
        idx = table[log2u]
        flat = jnp.take_along_axis(fstack, idx[None, ..., None], axis=0)[0]
        res = jnp.take_along_axis(rstack, idx[None, ..., None], axis=0)[0]
        return flat, res

    return stage

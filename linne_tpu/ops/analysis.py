"""Batched device analysis kernels: Levinson-Durbin, unit search, quantizer.

This is the TPU-first re-architecture of the reference's per-block analysis
(reference call stack: LINNENetwork_SetUnitsAndParameters,
libs/linne_network/src/linne_network.c:582-630): instead of nested C loops
over ridge-candidates x layers x unit-counts x units, every level becomes a
batch dimension of one jitted computation over [blocks, channels, ...]
tensors:

- unit-count candidates are evaluated simultaneously (a unit split is just a
  reshape of the signal axis);
- each candidate's per-unit LPC fit is a batched windowed autocorrelation
  (lax.scan over lags) + batched Levinson-Durbin (lax.scan over order);
- the winning candidate/ridge is picked with argmin + take_along_axis
  (first-minimum semantics match the reference's strict-< selection);
- the 8-bit error-feedback quantizer is a lax.scan over taps.

Float analysis accuracy only affects which coefficients are chosen — never
losslessness — so the TPU path runs float32 by default while the CPU path
uses float64 for near-reference coefficient parity.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FLT_EPSILON
from .windows import WINDOW_SIN, WINDOW_WELCH, window_weights

# NOTE on kernel choice: hand-written Pallas versions of autocorrelation /
# unit-FIR / integer predict were benchmarked against these XLA formulations
# at production shapes on the real chip (docs/PROFILE_r2.md) — every variant
# completes inside the host round-trip floor, i.e. device compute is not the
# encode bottleneck, so the XLA formulations are the single production path.

_FFT_AUTOCORR_MIN_LAGS = 32

# Large-order routes: FFT (Wiener-Khinchin / overlap-correlate) or MXU
# matmul (chunked Gram/Toeplitz formulations). FFTs map poorly onto the
# TPU (measured r3: 4.4 ms autocorr + 8.3 ms forward per candidate at
# mode-7 layer-1 shapes, vs sub-ms on the MXU), so the matmul routes are
# the default where an MXU exists; CPU keeps the FFT route that the
# byte-exact golden corpus was validated on. Both compute the same
# quantity — only float rounding differs, which can shift chosen
# coefficients (never losslessness).
_MATMUL_ROUTES_OVERRIDE = None  # tests force True/False


def _use_matmul_routes() -> bool:
    if _MATMUL_ROUTES_OVERRIDE is not None:
        return _MATMUL_ROUTES_OVERRIDE
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


_CHUNK = 128  # MXU-native tile; also bounds the max lag the G-matrix covers

# The matmul routes materialize O(rows * K * (K+lags)) intermediates; for
# large-unit candidates (many rows, small npu) that HBM traffic exceeds
# what the scan routes cost (measured: gating on npu alone regressed
# fit_layer(128) 36.6 -> 53.7 ms via the u=8/16 candidates' ~600 MB+
# G tensors). Cap the materialization instead.
_MATMUL_BYTES_BUDGET = 420 * 1024 * 1024


def _autocorr_matmul(x: jnp.ndarray, num_lags: int) -> jnp.ndarray:
    """Autocorrelation as one batched matmul: chunk the signal into K=128
    rows Zl [m, K] and their (num_lags-1)-extended contexts Zr [m, K+L-1];
    G = Zl^T @ Zr accumulates every (position-in-chunk, offset) product, and
    ac[lag] is the lag-th diagonal sum of G. O(n*K) MAC on the MXU instead
    of an FFT pair the TPU executes scalar-ish."""
    n = x.shape[-1]
    K = _CHUNK
    L = num_lags
    assert L - 1 <= K
    batch_shape = x.shape[:-1]
    m = -(-n // K)
    w = K + L - 1
    # pad for the widest context read: last chunk start (m-1)*K + w
    xp = jnp.pad(x.reshape(-1, n), [(0, 0), (0, m * K + L - 1 - n)])
    zl = xp[:, : m * K].reshape(-1, m, K)
    idx = jnp.arange(m)[:, None] * K + jnp.arange(w)[None, :]
    zr = xp[:, idx]  # [rows, m, w]
    g = jnp.einsum("rmk,rmw->rkw", zl, zr,
                   precision=jax.lax.Precision.HIGHEST)
    jj = jnp.arange(K)[:, None]
    ll = jnp.arange(L)[None, :]
    ac = jnp.sum(g[:, jj, jj + ll], axis=1)  # [rows, L]
    return ac.reshape(batch_shape + (L,)).astype(x.dtype)


def autocorrelation(x: jnp.ndarray, num_lags: int) -> jnp.ndarray:
    """Batched autocorrelation over the last axis: ac[..., lag] =
    sum_t x[t] * x[t+lag] for lag in [0, num_lags).

    Three formulations: a lag scan (one pass over the signal per lag) for
    small lag counts; for large ones the Wiener-Khinchin FFT route (CPU) or
    the chunked G-matrix matmul (TPU MXU) — at order 128 the direct form
    reads the signal 129 times (HBM-bound on TPU)."""
    n = x.shape[-1]
    # the MXU route pays off well below the FFT threshold (lag scans cost
    # one pass per lag): gate at 9 lags (npu >= 8) AND a bound on the
    # G-tensor materialization (see _MATMUL_BYTES_BUDGET)
    if 9 <= num_lags <= _CHUNK + 1 and _use_matmul_routes():
        rows = 1
        for d in x.shape[:-1]:
            rows *= int(d)
        g_bytes = rows * _CHUNK * (_CHUNK + num_lags - 1) * 4
        if g_bytes <= _MATMUL_BYTES_BUDGET:
            return _autocorr_matmul(x, num_lags)
    if num_lags >= _FFT_AUTOCORR_MIN_LAGS:
        fft_n = 1
        while fft_n < n + num_lags:
            fft_n <<= 1
        # flatten batch dims to 2D and zero-pad explicitly: XLA:CPU's fft
        # thunk RET_CHECKs on non-major operand layouts that layout
        # assignment picks for high-rank batched ffts under a jit
        batch_shape = x.shape[:-1]
        xp = jnp.pad(x.reshape(-1, n), [(0, 0), (0, fft_n - n)])
        spec = jnp.fft.rfft(xp, axis=-1)
        power = (spec * jnp.conj(spec)).real
        ac = jnp.fft.irfft(power, n=fft_n, axis=-1)[:, :num_lags]
        return ac.reshape(batch_shape + (num_lags,)).astype(x.dtype)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, num_lags)])

    def lag_step(_, lag):
        shifted = jax.lax.dynamic_slice_in_dim(xp, lag, n, axis=-1)
        return None, jnp.sum(x * shifted, axis=-1)

    _, ac = jax.lax.scan(lag_step, None, jnp.arange(num_lags), unroll=4)
    # ac: [num_lags, ...batch] -> [...batch, num_lags]
    return jnp.moveaxis(ac, 0, -1)


def levinson_durbin(ac: jnp.ndarray, order: int, with_parcor: bool = False):
    """Batched Levinson-Durbin recursion (reference: lpc.c:252-324).

    ac: [..., order+1] autocorrelation (ridge already applied to lag 0).
    Returns lpc[..., order] (prediction coefficients a_1..a_order, sign
    convention as the reference: residual = x + sum a_i * x_{t-i}); if
    with_parcor, also parcor[..., order] (parcor[k] = -gamma_k).
    """
    batch_shape = ac.shape[:-1]
    dtype = ac.dtype
    silent = jnp.abs(ac[..., 0]) < FLT_EPSILON
    safe_ac0 = jnp.where(silent, jnp.asarray(1.0, dtype), ac[..., 0])
    ac = ac.at[..., 0].set(safe_ac0) if hasattr(ac, "at") else ac

    # zero-padded reversed ac for the gamma gather: acp[order - k - 1 + i]
    # == ac[k+1-i] for k+1-i in range, else 0
    acp = jnp.concatenate(
        [jnp.flip(ac, axis=-1),
         jnp.zeros(batch_shape + (order,), dtype)], axis=-1)

    a0 = jnp.zeros(batch_shape + (order + 1,), dtype).at[..., 0].set(1.0)
    ek0 = ac[..., 0]

    def step(carry, k):
        a, ek = carry
        s = jax.lax.dynamic_slice_in_dim(acp, order - k - 1, order + 1, axis=-1)
        num = jnp.sum(a * s, axis=-1)
        gamma = jnp.where(jnp.abs(ek) > 0, num / -jnp.where(ek == 0, 1.0, ek), 0.0)
        ek = ek * (1.0 - gamma * gamma)
        # a_new[i] = a[i] + gamma * a[k+1-i] (a[k+1-i] -> 0 out of range)
        ap = jnp.concatenate(
            [jnp.flip(a, axis=-1),
             jnp.zeros(batch_shape + (order + 1,), dtype)], axis=-1)
        rev = jax.lax.dynamic_slice_in_dim(ap, order - k - 1, order + 1, axis=-1)
        a = a + gamma[..., None] * rev
        return (a, ek), -gamma

    # the recursion is overhead-bound on TPU (255 total steps across the
    # unit-candidate sweep, tiny per-step arithmetic): unrolling folds 8
    # steps per loop iteration, same op order / identical results.
    # NOTE r3 negative result: a "flip-free" variant carrying padded
    # [flip(a), zeros] / [zeros, a] shadows updated via dynamic_update_slice
    # measured 73 ms of while time vs 12 ms for this form at order 128 —
    # the tripled carry thrashes HBM exactly like the pooled-candidate scan.
    (a, _), neg_gammas = jax.lax.scan(step, (a0, ek0), jnp.arange(order),
                                      unroll=8)
    lpc = a[..., 1:]
    lpc = jnp.where(silent[..., None], 0.0, lpc)
    if with_parcor:
        parcor = jnp.moveaxis(neg_gammas, 0, -1)
        parcor = jnp.where(silent[..., None], 0.0, parcor)
        return lpc, parcor
    return lpc


def fit_unit_lpc(
    signal: jnp.ndarray, num_units: int, order_per_unit: int,
    regular_term,
) -> jnp.ndarray:
    """Per-unit Welch-windowed LPC fit of one unit-split candidate.

    signal: [..., n]; regular_term: scalar or array broadcastable over the
    batch dims (a [R, 1, 1] ridge axis rides through as a batch dimension).
    Returns reversed (convolution-layout) coefficients
    [..., num_units, order_per_unit] matching the reference's parameter
    ordering (linne_network.c:310-316: h[0] oldest ... h[np-1] newest).
    """
    n = signal.shape[-1]
    ns = n // num_units
    seg = signal.reshape(signal.shape[:-1] + (num_units, ns))
    w = jnp.asarray(window_weights(WINDOW_WELCH, ns), dtype=signal.dtype)
    windowed = seg * w
    ac = autocorrelation(windowed, order_per_unit + 1)
    ridge = jnp.asarray(1.0, signal.dtype) + jnp.asarray(
        regular_term, signal.dtype)
    ac = ac.at[..., 0].mul(ridge)  # ridge broadcasts over ac[..., 0]
    lpc = levinson_durbin(ac, order_per_unit)
    if ns < order_per_unit:  # static: degenerate split -> zero coefficients
        lpc = jnp.zeros_like(lpc)
    return jnp.flip(lpc, axis=-1)


def unit_forward(
    signal: jnp.ndarray, params: jnp.ndarray, num_units: int,
) -> jnp.ndarray:
    """Residual of a unit-split convolution layer: out[t] = x[t] +
    sum_j P[unit(t), j] * x[t - npu + j], with zero history before t=0 and
    cross-unit context exactly like the reference pointer arithmetic
    (linne_network.c:183-208). Sample 0 passes through.

    signal: [..., n]; params: [..., num_units, npu] (reversed layout).
    """
    n = signal.shape[-1]
    npu = params.shape[-1]
    ns = n // num_units
    if npu >= 8 and _use_matmul_routes():
        rows = 1
        for d in signal.shape[:-1]:
            rows *= int(d)
        w = _CHUNK + npu - 1
        hmat_bytes = rows * num_units * w * _CHUNK * 4
        if hmat_bytes <= _MATMUL_BYTES_BUDGET:
            return _unit_forward_matmul(signal, params, num_units)
    if npu >= _FFT_AUTOCORR_MIN_LAGS:
        return _unit_forward_fft(signal, params, num_units)
    xp = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(npu, 0)])

    def step(acc, j):
        xj = jax.lax.dynamic_slice_in_dim(xp, j, n, axis=-1)
        # per-step coefficient row, expanded over each unit's segment
        pj = jax.lax.dynamic_slice_in_dim(params, j, 1, axis=-1)[..., 0]
        coef = jnp.repeat(pj, ns, axis=-1)  # [..., n]
        return acc + coef * xj, None

    pred0 = jnp.zeros_like(signal)
    pred, _ = jax.lax.scan(step, pred0, jnp.arange(npu), unroll=4)
    out = signal + pred
    return jnp.concatenate([signal[..., :1], out[..., 1:]], axis=-1)


def _unit_forward_fft(signal: jnp.ndarray, params: jnp.ndarray,
                      num_units: int) -> jnp.ndarray:
    """unit_forward via FFT correlation: pred over a unit is the correlation
    of its (left-context-extended) segment with its filter. One rfft/irfft
    pair replaces npu passes over the signal for high orders."""
    n = signal.shape[-1]
    npu = params.shape[-1]
    ns = n // num_units
    batch_shape = signal.shape[:-1]
    seg_len = ns + npu
    fft_n = 1
    while fft_n < seg_len:
        fft_n <<= 1
    # ctx[u, t] = x[u*ns - npu + t], zero history before t=0
    xp = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(npu, 0)])
    idx = (jnp.arange(num_units)[:, None] * ns
           + jnp.arange(seg_len)[None, :])
    ctx = xp[..., idx]  # [..., u, seg_len]
    # flatten batch for the fft (XLA:CPU layout quirk, see autocorrelation)
    flat_ctx = jnp.pad(
        ctx.reshape(-1, seg_len), [(0, 0), (0, fft_n - seg_len)])
    pflat = jnp.broadcast_to(params, batch_shape + (num_units, npu))
    flat_p = jnp.pad(
        pflat.reshape(-1, npu), [(0, 0), (0, fft_n - npu)])
    spec = jnp.fft.rfft(flat_ctx, axis=-1) * jnp.conj(
        jnp.fft.rfft(flat_p, axis=-1))
    corr = jnp.fft.irfft(spec, n=fft_n, axis=-1)[:, :ns]
    pred = corr.reshape(batch_shape + (num_units, ns)).reshape(
        batch_shape + (n,)).astype(signal.dtype)
    out = signal + pred
    return jnp.concatenate([signal[..., :1], out[..., 1:]], axis=-1)


def _unit_forward_matmul(signal: jnp.ndarray, params: jnp.ndarray,
                         num_units: int) -> jnp.ndarray:
    """unit_forward as one batched MXU matmul: chunk each unit's
    left-context-extended segment into K-output windows Xc [m, K+npu-1] and
    multiply by a per-row Toeplitz expansion of the filter H [K+npu-1, K]
    (H[w, r] = h[w-r]); pred chunks = Xc @ H. Replaces the FFT pair (poor
    on TPU) with O(ns*npu) MAC on the MXU; same quantity, float rounding
    may differ."""
    n = signal.shape[-1]
    npu = params.shape[-1]
    ns = n // num_units
    batch_shape = signal.shape[:-1]
    K = _CHUNK
    m = -(-ns // K)
    w = K + npu - 1
    seg_len = ns + npu
    # ctx[u, t] = x[u*ns - npu + t], zero history before t=0 (same layout
    # as the FFT route); pad so the last chunk's window stays in bounds
    xp = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(npu, 0)])
    idx = (jnp.arange(num_units)[:, None] * ns
           + jnp.arange(seg_len)[None, :])
    ctx = xp[..., idx]  # [..., u, seg_len]
    pad_tail = (m - 1) * K + w - seg_len
    if pad_tail > 0:
        ctx = jnp.pad(ctx, [(0, 0)] * (ctx.ndim - 1) + [(0, pad_tail)])
    widx = jnp.arange(m)[:, None] * K + jnp.arange(w)[None, :]
    xc = ctx[..., widx]  # [..., u, m, w]
    # H[w_, r] = h[w_ - r] for 0 <= w_-r < npu else 0, via one gather from
    # the zero-extended filter
    pflat = jnp.broadcast_to(params, batch_shape + (num_units, npu))
    pz = jnp.pad(pflat, [(0, 0)] * (pflat.ndim - 1) + [(0, 1)])
    hidx = jnp.arange(w)[:, None] - jnp.arange(K)[None, :]
    hmat = pz[..., jnp.where((hidx >= 0) & (hidx < npu), hidx, npu)]
    pred = jnp.einsum("...umw,...uwk->...umk", xc, hmat,
                      precision=jax.lax.Precision.HIGHEST)
    pred = pred.reshape(batch_shape + (num_units, m * K))[..., :ns]
    pred = pred.reshape(batch_shape + (num_units * ns,)).astype(signal.dtype)
    out = signal + pred
    return jnp.concatenate([signal[..., :1], out[..., 1:]], axis=-1)


def candidate_units(order: int, n: int, max_units: int = 128) -> list:
    """Static list of unit counts the reference would try
    (linne_network.c:284-295): powers of two dividing both the layer order
    and the analysis length, capped at 128."""
    cands = []
    u = 1
    while u <= min(max_units, order):
        if order % u == 0 and n % u == 0 and (n // u) > (order // u):
            cands.append(u)
        u <<= 1
    return cands


def fit_layer(
    signal: jnp.ndarray, order: int, regular_term,
):
    """Unit-count search + fit for one layer over a batched signal.

    Evaluates every candidate split, scores mean |residual| excluding sample
    0 (linne_network.c:319-337), picks the first minimum. Returns
    (log2_units[...], flat_params[..., order], residual[..., n], loss[...]).
    """
    n = signal.shape[-1]
    cands = candidate_units(order, n)
    # NOTE r3 negative result: pooling every candidate's Levinson-Durbin
    # rows into ONE masked full-order scan was measured 612 ms vs 37 ms at
    # order 128 — each step drags sum(u)=255 rows x 129 lags of carry
    # through HBM, ~100x the arithmetic of the separate scans. Keep the
    # per-candidate recursions.
    # running first-minimum fold: avoids materializing every candidate's
    # residual plane at once (ncand x ridge x batch x n would not fit HBM
    # for large block batches)
    best_loss = None
    best_flat = None
    best_res = None
    best_log2u = None
    for u in cands:
        params = fit_unit_lpc(signal, u, order // u, regular_term)
        res = unit_forward(signal, params, u)
        loss = jnp.sum(jnp.abs(res[..., 1:]), axis=-1) / n
        flat = params.reshape(params.shape[:-2] + (order,))
        log2u = jnp.full(loss.shape, (u - 1).bit_length(), dtype=jnp.int32)
        if best_loss is None:
            best_loss, best_flat, best_res, best_log2u = (
                loss, flat, res, log2u)
        else:
            better = loss < best_loss  # strict: ties keep the earlier split
            best_loss = jnp.where(better, loss, best_loss)
            best_flat = jnp.where(better[..., None], flat, best_flat)
            best_res = jnp.where(better[..., None], res, best_res)
            best_log2u = jnp.where(better, log2u, best_log2u)
    return best_log2u, best_flat, best_res, best_loss


def fit_network(
    signal: jnp.ndarray, layer_orders: Sequence[int],
    ridge_terms: Sequence[float],
):
    """Full ridge-sweep greedy network fit (the device analog of
    LINNENetwork_SetUnitsAndParameters, linne_network.c:605-630).

    signal: [..., n] normalized float. Returns per-layer
    (log2_units[..., L], params[..., L_max_order-concat]) selected from the
    best ridge candidate per batch element. With 0 AF iterations the final
    refit equals the winning sweep pass, so results are cached and gathered
    rather than recomputed.
    """
    nridge = len(ridge_terms)
    batch_ndim = signal.ndim - 1
    # ridge rides as a leading batch axis: x is [R, ...batch, n]
    x = jnp.broadcast_to(signal[None], (nridge,) + signal.shape)
    ridge_vec = jnp.asarray(list(ridge_terms), dtype=signal.dtype).reshape(
        (nridge,) + (1,) * (batch_ndim + 1))  # broadcasts over [..., u]

    layers = []
    for order in layer_orders:
        log2u, flat, res, _ = fit_layer(x, order, ridge_vec)
        layers.append((log2u, flat))
        x = res
    loss = jnp.sum(jnp.abs(x), axis=-1) / x.shape[-1]  # [R, ...batch]
    best = jnp.argmin(loss, axis=0)  # first minimum, as in C

    out_log2u = []
    out_params = []
    for log2u, flat in layers:
        out_log2u.append(jnp.take_along_axis(log2u, best[None], axis=0)[0])
        out_params.append(
            jnp.take_along_axis(flat, best[None][..., None], axis=0)[0])
    return out_log2u, out_params


def quantize_coefficients(coefs: jnp.ndarray, nbits: int = 8):
    """Batched error-feedback quantizer (reference: lpc.c:981-1040).

    coefs: [..., order] float. Returns (int_coef[..., order] int32,
    rshift[...] int32)."""
    order = coefs.shape[-1]
    qmax = 1 << (nbits - 1)
    max_abs = jnp.max(jnp.abs(coefs), axis=-1)
    is_zero = max_abs <= 2.0 ** (-(nbits - 1))
    _, exp = jnp.frexp(jnp.where(is_zero, 1.0, max_abs))
    rshift = jnp.clip((nbits - 1) - exp, 1, 15).astype(jnp.int32)
    scale = jnp.exp2(rshift.astype(coefs.dtype))

    def step(qerror, t):
        qerror = qerror + coefs[..., t] * scale
        q = jnp.where(qerror >= 0.0, jnp.floor(qerror + 0.5),
                      -jnp.floor(-qerror + 0.5))
        q = jnp.clip(q, -qmax, qmax - 1)
        qerror = qerror - q
        return qerror, q.astype(jnp.int32)

    init = jnp.zeros(coefs.shape[:-1], dtype=coefs.dtype)
    _, qs = jax.lax.scan(step, init, jnp.arange(order - 1, -1, -1),
                         unroll=8)
    int_coef = jnp.flip(jnp.moveaxis(qs, 0, -1), axis=-1)
    int_coef = jnp.where(is_zero[..., None], 0, int_coef)
    rshift = jnp.where(is_zero, nbits, rshift)
    return int_coef, rshift


def estimate_code_length(
    signal: jnp.ndarray, order: int, bits_per_sample: int,
) -> jnp.ndarray:
    """Batched bits/sample estimate for the block-type decision
    (reference: lpc.c:810-865). signal: [..., n] normalized float."""
    n = signal.shape[-1]
    w = jnp.asarray(window_weights(WINDOW_SIN, n), dtype=signal.dtype)
    windowed = signal * w
    ac = autocorrelation(windowed, order + 1)
    _, parcor = levinson_durbin(ac, order, with_parcor=True)
    power = ac[..., 0] * 2.0 ** (2.0 * (bits_per_sample - 1))
    log2_power = jnp.log2(jnp.maximum(power, 1e-300)) - np.log2(n)
    # indices 1..order-1; the reference also reads the stale [order] entry,
    # which the fast path treats as 0 (analysis-only deviation)
    pk = parcor[..., 1:]
    log2_var = jnp.sum(jnp.log2(jnp.maximum(1.0 - pk * pk, 1e-30)), axis=-1)
    beta = 1.9426950408889634
    est = beta + 0.5 * (log2_power + log2_var)
    est = jnp.where(power == 0.0, 0.0, jnp.where(est <= 0, 1.0, est))
    return est

"""Serial-order-preserving LPC analysis as an XLA program (SURVEY hard-part #1).

This is the deferred experiment from SURVEY §7: express the reference
encoder's *exact* double-precision analysis — serial-order windowed
autocorrelation, Levinson-Durbin (reference: libs/lpc/src/lpc.c:252-324),
the power-of-two unit-count search + greedy layer cascade
(libs/linne_network/src/linne_network.c:268-347,582-630) and the
error-feedback coefficient quantizer (lpc.c:981-1040) — as one jittable,
batch-parallel XLA computation, so that byte-exact `.lnn` production can run
on an accelerator instead of the host oracle.

Faithfulness contract (matches `linne_tpu.exact` op for op):

- every C serial accumulation is a `lax.scan` (or an unrolled chain) in the
  same left-to-right order, starting from the same 0.0;
- the per-sample unit prediction is a serial chain over taps (j) but a
  vector over time — bit-identical to the oracle's row-wise cumsum;
- zero-signal early-outs (|r0| < FLT_EPSILON) are computed as masks over the
  full recursion (XLA computes through the division, the mask discards it),
  which is value-identical to the reference's skip;
- the quantizer's frexp/exp2 are done in integer bit arithmetic on the IEEE
  representation, so they are exact on any backend;
- the per-fit writes into the shared `LPCCalculator` arena (whose stale
  reads later feed EstimateCodeLength — see exact/lpc.py docstring) are
  returned per level so the caller can replay them into the host arena in
  the reference's order (`fold_parcor_state`).

Precision caveat, measured in docs/PROFILE_r4.md: on XLA:CPU f64 is IEEE-754
and this pipeline is *byte-identical* with the host oracle. On TPU v5e f64
is emulated (float-float, ~1e-15 relative error per op, not correctly
rounded), so byte-identity on hardware is probabilistic — asserted
empirically per corpus and, since r5, certified per row by the margin
guard (`exact/device_encoder.py` `_MARGIN_*`): any decision within the
drift bound of a boundary falls back to the host oracle.

Two modes (docs/PROFILE_r5.md):

- **strict** — every C serial accumulation is a `lax.scan` (or unrolled
  chain) in the same left-to-right order; bit-identical to the oracle on
  IEEE-f64 backends. This is the CPU-gate path and the byte-identity
  proof. Its sequential depth (~30k dependent scan steps per preset-7
  fit) makes it latency-bound on TPU.
- **fast** — the SAME operation set with the serial sums replaced by
  parallel tree reductions, still in (emulated) f64. On TPU a tree
  reduction's drift vs the oracle's serial f64 (~1e-13) is smaller than
  the serial emulation's own drift (~1.6e-11 measured), both orders of
  magnitude under the 1e-9 guard bound — so the guard's certificate is
  exactly as sound while the sequential depth collapses to the order-128
  Levinson-Durbin recursion itself (127 steps). Selected automatically
  off-CPU; override with LINNE_EXACT_DEVICE_STRICT=0/1.

Scope: auxiliary-function iterations = 0 (the CLI default) and `-l` off;
the IRLS/Cholesky and trainer refinements remain host-only. Blocks must
divide evenly at every unit level with even sub-lengths (full 10240-sample
blocks always do); odd sub-lengths would need the reference's stale Welch
middle sample (lpc.c:196-205), which a batched pipeline cannot reproduce
without threading the arena through every fit.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import FLT_EPSILON, FLT_MAX
from ..exact.lpc import _welch_window

_MAX_NUM_UNITS = 128
# Scan unroll factors: sequential-loop iteration overhead (not arithmetic)
# dominates the emulated-f64 fit on TPU (docs/PROFILE_r5.md), so the long
# serial-sum scans unroll aggressively; unrolling only changes how many
# serial steps one loop iteration performs, never their order.
_SCAN_UNROLL = 32
_LD_INNER_UNROLL = 8

_F64 = jnp.float64


def _resolve_strict(strict) -> bool:
    """None -> strict on IEEE-f64 backends (the bit-exact gate), fast on
    accelerators (guarded — see module docstring). LINNE_EXACT_DEVICE_STRICT
    overrides ("1"/"0")."""
    if strict is not None:
        return bool(strict)
    env = os.environ.get("LINNE_EXACT_DEVICE_STRICT")
    if env not in (None, "", "auto"):
        return env not in ("0", "fast", "false")
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=256)
def _valid_levels(num_params: int, n: int) -> list:
    """Power-of-two unit counts admissible for (num_params, n) — the same
    filter as linne_network.c:300-303."""
    levels = []
    u = 1
    while u <= min(_MAX_NUM_UNITS, num_params):
        if not (num_params % u or n % u):
            levels.append(u)
        u <<= 1
    return levels


def supported(layer_num_params: Sequence[int], n: int) -> bool:
    """True when every admissible unit level has an even sub-length (no
    stale Welch middle sample) and every layer order fits its sub-length."""
    for p in layer_num_params:
        levels = _valid_levels(p, n)
        if not levels:
            return False
        for u in levels:
            ns = n // u
            if ns & 1 or ns <= p // u:
                return False
    return True


# ---------------------------------------------------------------------------
# serial building blocks
# ---------------------------------------------------------------------------


def _mulsh(x, y):
    """x * y behind an FMA shield.

    This jaxlib's XLA:CPU emitter contracts `a + x*y` / `a - x*y` into fma
    even with --xla_allow_excess_precision=false, in straight-line code and
    in scan bodies alike (measured; the fused results equal true
    fma(x, y, a)). `optimization_barrier` and bit-neutral identities
    (`+0.0`, bitcast round-trips, `max(p, p)`) are all folded before
    instruction selection. A select with a data-dependent predicate between
    the multiply and any consuming add survives to LLVM and blocks the
    pattern (measured bit-exact). `p == p` is False only for NaN products,
    which occur only on zero-signal lanes whose results are discarded by the
    `zerocase` mask downstream.
    """
    p = x * y
    return jnp.where(p == p, p, 0.0)


def _autocorr_serial(seg: jnp.ndarray, nlags: int) -> jnp.ndarray:
    """ac[b,u,lag] = sum_i seg[b,u,i] * seg[b,u,i+lag], serial in i
    (reference: lpc.c:215-249; oracle: exact/lpc.py autocorrelation).

    The tail products read zero padding; adding +-0.0 to a partial serial
    sum that started from +0.0 is bit-neutral (the accumulator can never be
    -0.0), so the fixed-length scan is bit-identical to the per-lag
    variable-length serial sums.

    Products are computed INSIDE the scan body behind the `_mulsh` FMA
    shield (the select survives to instruction selection and blocks the
    `acc + x*y` contraction — the same measured-bit-exact construction the
    Levinson-Durbin scans use). Earlier revisions materialized the full
    [ns, nlags, B, U] product tensor outside the scan instead; that is
    O(ns*nlags) memory — 10+ GB for the order-128 layer at corpus batch —
    and capped the fit chunk size the TPU could take.
    """
    B, U, ns = seg.shape
    segp = jnp.concatenate(
        [seg, jnp.zeros((B, U, nlags - 1), _F64)], axis=2)
    segp_t = jnp.moveaxis(segp, 2, 0)  # [ns + nlags - 1, B, U]
    seg_t = jnp.moveaxis(seg, 2, 0)  # [ns, B, U]

    def body(carry, xi):
        acc, i = carry
        w = lax.dynamic_slice_in_dim(segp_t, i, nlags, axis=0)
        return (acc + _mulsh(xi[None], w), i + 1), None

    acc0 = jnp.zeros((nlags, B, U), _F64)
    (acc, _), _ = lax.scan(
        body, (acc0, jnp.int32(0)), seg_t, unroll=_SCAN_UNROLL)
    return jnp.moveaxis(acc, 0, 2)


def _autocorr_fast(seg: jnp.ndarray, nlags: int) -> jnp.ndarray:
    """Fast-mode autocorrelation: one parallel reduction per lag (same
    products as `_autocorr_serial`, tree summation order)."""
    B, U, ns = seg.shape
    segp = jnp.concatenate(
        [seg, jnp.zeros((B, U, nlags - 1), _F64)], axis=2)
    cols = [jnp.sum(seg * lax.slice_in_dim(segp, lag, lag + ns, axis=2),
                    axis=2) for lag in range(nlags)]
    return jnp.stack(cols, axis=-1)


def _autocorr(seg: jnp.ndarray, nlags: int, strict: bool) -> jnp.ndarray:
    return (_autocorr_serial if strict else _autocorr_fast)(seg, nlags)


# Above this order the unrolled O(order^2)-HLO-op recursion is replaced by a
# lax.scan over the recursion step k (O(order) HLO ops): order 128 unrolled
# is ~10^5 ops and XLA compile time explodes.
_LEVINSON_UNROLL_MAX = 32


def _levinson_serial(ac: jnp.ndarray, order: int):
    """Levinson-Durbin with the reference's exact op order
    (lpc.c:252-324; oracle: exact/lpc.py levinson_durbin). `ac` is
    post-ridge. Returns (lpc_coef [B,U,order], parcor [B,U,order],
    zerocase [B,U])."""
    zerocase = jnp.abs(ac[..., 0]) < FLT_EPSILON
    shape = ac.shape[:-1]
    zero = jnp.zeros(shape, _F64)
    one = jnp.ones(shape, _F64)

    a = [zero] * (order + 2)
    parcor = [zero] * order
    a[0] = one
    ek = ac[..., 0]
    if order >= 1:
        a[1] = -ac[..., 1] / ac[..., 0]
        parcor[0] = ac[..., 1] / ek
        ek = ek + _mulsh(ac[..., 1], a[1])

    if order > _LEVINSON_UNROLL_MAX:
        coefs, parc = _levinson_scan_tail(ac, order, a[1], ek, parcor[0])
    else:
        for k in range(1, order):
            # gamma = serial_sum_i a[i] * ac[k+1-i], i = 0..k, from 0.0
            g = zero
            for i in range(k + 1):
                g = g + _mulsh(a[i], ac[..., k + 1 - i])
            gamma = g / (-ek)
            ek = ek * (1.0 - _mulsh(gamma, gamma))
            u = [one] + a[1 : k + 1] + [zero]
            v = [zero] + a[k:0:-1] + [one]
            a = [u[i] + _mulsh(gamma, v[i]) for i in range(k + 2)] + a[k + 2 :]
            parcor[k] = -gamma
        coefs = jnp.stack(a[1 : order + 1], axis=-1)
        parc = jnp.stack(parcor, axis=-1)

    nz = ~zerocase
    return (
        jnp.where(nz[..., None], coefs, 0.0),
        jnp.where(nz[..., None], parc, 0.0),
        zerocase,
    )


def _levinson_scan_tail(ac: jnp.ndarray, order: int, a1: jnp.ndarray,
                        ek: jnp.ndarray, parcor0: jnp.ndarray):
    """Recursion steps k = 1..order-1 as a lax.scan, bit-identical to the
    unrolled form: every update is masked with `where` on the SAME
    already-computed values (no +0.0 rebiasing), so excluded lanes carry the
    untouched previous value and included lanes see the identical serial op
    sequence. Shapes are fixed at order+2; entries beyond the current step
    are zero exactly as in the unrolled `a` list."""
    shape = ac.shape[:-1]
    zero = jnp.zeros(shape, _F64)
    idx = jnp.arange(order + 2)

    a0 = jnp.zeros(shape + (order + 2,), _F64)
    a0 = a0.at[..., 0].set(1.0).at[..., 1].set(a1)
    parc0 = jnp.zeros(shape + (order,), _F64)
    parc0 = parc0.at[..., 0].set(parcor0)

    def body(carry, k):
        a, ek, parcor = carry
        # g = serial_sum_{i=0..k} a[i] * ac[k+1-i]
        def gbody(g, i):
            term = _mulsh(
                jnp.take(a, i, axis=-1),
                jnp.take(ac, jnp.clip(k + 1 - i, 0, order), axis=-1))
            return jnp.where(i <= k, g + term, g), None

        g, _ = lax.scan(gbody, zero, jnp.arange(order),
                        unroll=_LD_INNER_UNROLL)
        gamma = g / (-ek)
        ek_new = ek * (1.0 - _mulsh(gamma, gamma))
        u = jnp.where(idx <= k, a, 0.0)
        vsrc = jnp.take(a, jnp.clip(k + 1 - idx, 0, order + 1), axis=-1)
        v = jnp.where((idx >= 1) & (idx <= k + 1), vsrc, 0.0)
        a_new = u + _mulsh(gamma[..., None], v)
        a = jnp.where(idx <= k + 1, a_new, a)
        parcor = jnp.where(
            jnp.arange(order) == k, -gamma[..., None], parcor)
        return (a, ek_new, parcor), None

    (a, ek, parcor), _ = lax.scan(
        body, (a0, ek, parc0), jnp.arange(1, order))
    return a[..., 1 : order + 1], parcor


def _levinson_fast(ac: jnp.ndarray, order: int):
    """Fast-mode Levinson-Durbin: the same recursion with the inner serial
    sum as ONE parallel dot per step (the `a` array keeps zeros beyond the
    current step, so windowed products outside 0..k contribute exact
    zeros). Sequential depth = order, vs order^2 in strict mode. Returns
    (lpc_coef, parcor, zerocase) like `_levinson_serial`."""
    zerocase = jnp.abs(ac[..., 0]) < FLT_EPSILON
    shape = ac.shape[:-1]
    a0 = jnp.zeros(shape + (order + 2,), _F64).at[..., 0].set(1.0)
    parc0 = jnp.zeros(shape + (order,), _F64)
    ek = ac[..., 0]
    if order >= 1:
        a1 = -ac[..., 1] / ac[..., 0]
        parc0 = parc0.at[..., 0].set(ac[..., 1] / ek)
        ek = ek + ac[..., 1] * a1
        a0 = a0.at[..., 1].set(a1)

    if order > 1:
        # acr_pad[m] = ac[order - m], zero-padded so per-step windows of
        # length order+2 always read defined values
        acr_pad = jnp.concatenate(
            [jnp.flip(ac, axis=-1),
             jnp.zeros(shape + (order + 2,), _F64)], axis=-1)
        idxs = jnp.arange(order)

        def body(carry, k):
            a, ek, parcor = carry
            # w[i] = ac[k+1-i] for i <= k+1, zeros beyond (a is zero there)
            w = lax.dynamic_slice_in_dim(
                acr_pad, order - k - 1, order + 2, axis=-1)
            g = jnp.sum(a * w, axis=-1)
            gamma = g / (-ek)
            ek = ek * (1.0 - gamma * gamma)
            # v[i] = a[k+1-i] for 1 <= i <= k+1, zeros at i=0 and beyond
            ar_pad = jnp.concatenate(
                [jnp.flip(a, axis=-1),
                 jnp.zeros(shape + (order + 2,), _F64)], axis=-1)
            v = lax.dynamic_slice_in_dim(
                ar_pad, order - k, order + 2, axis=-1)
            a = a + gamma[..., None] * v
            parcor = jnp.where(idxs == k, -gamma[..., None], parcor)
            return (a, ek, parcor), None

        (a0, ek, parc0), _ = lax.scan(
            body, (a0, ek, parc0), jnp.arange(1, order))

    nz = ~zerocase
    return (
        jnp.where(nz[..., None], a0[..., 1 : order + 1], 0.0),
        jnp.where(nz[..., None], parc0, 0.0),
        zerocase,
    )


def _levinson(ac: jnp.ndarray, order: int, strict: bool):
    return (_levinson_serial if strict else _levinson_fast)(ac, order)


def _chain_predict(x: jnp.ndarray, params: jnp.ndarray, num_units: int,
                   strict: bool = True):
    """Per-sample serial tap chains, vectorized over time
    (linne_network.c:165-210,319-335; oracle: _unit_predictions).

    x: [B, n] layer input; params: [B, num_units, npu] stored time-reversed
    like layer.params. Returns (with_base, no_base), each [B, n]:
    with_base[t] = ((x[t] + p0*w0) + p1*w1)...; no_base starts from 0.0.
    Entry 0 of unit 0 is garbage by the same convention as the oracle.

    Fast mode keeps the tap chain (depth <= 128, already width-parallel
    over time) but drops the FMA shield — contraction only tightens the
    result there, and fast mode is guarded, not bit-gated.
    """
    B, n = x.shape
    npu = params.shape[2]
    ns = n // num_units
    xp = jnp.concatenate([jnp.zeros((B, npu), _F64), x], axis=1)
    base = x.reshape(B, num_units, ns)
    nobase = jnp.zeros((B, num_units, ns), _F64)
    for j in range(npu):
        w = lax.slice_in_dim(xp, j, j + n, axis=1).reshape(B, num_units, ns)
        p = params[:, :, j : j + 1]
        term = _mulsh(p, w) if strict else p * w
        base = base + term
        nobase = nobase + term
    return base.reshape(B, n), nobase.reshape(B, n)


def _serial_abs_mean(rows: jnp.ndarray, start: int, n: int,
                     strict: bool = True) -> jnp.ndarray:
    """sum(|rows[..., start:n]|) / n over the trailing axis — serial in t
    in strict mode (linne_network.c:50-63), a parallel reduction in fast
    mode. rows: [B, ...]; returns [B, ...]."""
    if not strict:
        return jnp.sum(jnp.abs(rows[..., start:n]), axis=-1) / n
    rows_t = jnp.moveaxis(jnp.abs(rows[..., start:n]), -1, 0)

    def body(acc, x):
        return acc + x, None

    acc0 = jnp.zeros(rows.shape[:-1], _F64)
    acc, _ = lax.scan(body, acc0, rows_t, unroll=_SCAN_UNROLL)
    return acc / n


# ---------------------------------------------------------------------------
# quantizer (lpc.c:981-1040)
# ---------------------------------------------------------------------------


# Exact powers of two, indexed by e + 1074 for e in [-1074, 1023], with an
# inf guard entry so the e+1 lookup in _frexp_exponent never reads past the
# end. (TPU's X64 rewriting pass cannot lower s64 bitcasts, so frexp/exp2
# are done with this table instead of IEEE bit tricks.)
_POW2_OFFSET = 1074
_POW2_TABLE = np.array(
    [2.0 ** e for e in range(-1074, 1024)] + [np.inf], dtype=np.float64)


def _exp2_int(e: jnp.ndarray) -> jnp.ndarray:
    """Exact 2**e for integer e (table lookup)."""
    tab = jnp.asarray(_POW2_TABLE)
    return tab[jnp.clip(e + _POW2_OFFSET, 0, tab.shape[0] - 2)]


def _frexp_exponent(x: jnp.ndarray) -> jnp.ndarray:
    """Exact frexp exponent for finite positive x: the ndigit with
    x = m * 2**ndigit, m in [0.5, 1). log2 gives a +-1 estimate (even on
    the emulated-f64 backend); the table comparison makes it exact."""
    tab = jnp.asarray(_POW2_TABLE)
    approx = jnp.floor(jnp.log2(x)).astype(jnp.int32)
    e = approx
    for d in (-1, 0, 1):
        ci = jnp.clip(approx + d + _POW2_OFFSET, 0, tab.shape[0] - 2)
        ok = (tab[ci] <= x) & (x < tab[ci + 1])
        e = jnp.where(ok, ci - _POW2_OFFSET, e)
    return e + 1


def _quantize_layer(coefs: jnp.ndarray, nbits: int):
    """Error-feedback quantizer, tail-to-head (lpc.c:981-1040; oracle:
    exact/lpc.py quantize_coefficients). coefs: [B, P] final f64 params.
    Returns (int_coef [B, P] i32, rshift [B] i32, round_margin [B] f64,
    scale_margin [B] f64) — the margins are the guard's sensors for this
    stage: `round_margin` is the minimum absolute distance of any
    error-feedback step to its round-half-away boundary (in quantized-LSB
    units), `scale_margin` the relative distance of max|coef| to the
    nearest frexp power-of-two boundary and to the `low` threshold (both
    flip the transmitted rshift)."""
    B, P = coefs.shape
    qmax = 1 << (nbits - 1)
    # max |coef| with the reference's `<` update order (NaN-skipping)
    max_abs = jnp.zeros((B,), _F64)
    for i in range(P):
        av = jnp.abs(coefs[:, i])
        max_abs = jnp.where(max_abs < av, av, max_abs)
    lowthr = 2.0 ** (-(nbits - 1))
    low = max_abs <= lowthr

    ndigit = _frexp_exponent(max_abs)
    rshift = (nbits - 1) - ndigit
    scale = _exp2_int(rshift)

    # rshift boundary sensors: frexp bin edges 2^(ndigit-1) <= m < 2^ndigit
    # (masked on the low path, where ndigit is unused) and the low threshold
    fm = jnp.minimum(max_abs - _exp2_int(ndigit - 1),
                     _exp2_int(ndigit) - max_abs)
    fm = fm / jnp.maximum(max_abs, 1e-300)
    lm = jnp.abs(max_abs - lowthr) / lowthr
    scale_margin = jnp.minimum(jnp.where(low, jnp.inf, fm), lm)

    round_margin = jnp.full((B,), jnp.inf, _F64)
    qerror = jnp.zeros((B,), _F64)
    outs: List = [None] * P
    for ordi in range(P - 1, -1, -1):
        qerror = qerror + _mulsh(coefs[:, ordi], scale)
        y = jnp.where(qerror >= 0.0, qerror + 0.5, -qerror + 0.5)
        round_margin = jnp.minimum(round_margin, jnp.abs(y - jnp.round(y)))
        qtmp = jnp.where(
            qerror >= 0.0,
            jnp.floor(qerror + 0.5),
            -jnp.floor(-qerror + 0.5),
        )
        qtmp = jnp.where(qtmp >= qmax, float(qmax - 1), qtmp)
        qtmp = jnp.where(qtmp < -qmax, float(-qmax), qtmp)
        qerror = qerror - qtmp
        outs[ordi] = qtmp.astype(jnp.int32)
    int_coef = jnp.stack(outs, axis=1)
    int_coef = jnp.where(low[:, None], 0, int_coef)
    rshift = jnp.where(low, nbits, rshift)
    # on the low path the int coefs are forced to zero regardless of the
    # rounding chain, so its boundaries are not drift-sensitive there
    round_margin = jnp.where(low, jnp.inf, round_margin)
    return int_coef, rshift, round_margin, scale_margin


# ---------------------------------------------------------------------------
# one fit pass (ridge term fixed) — linne_network.c:582-630 with AF iters 0
# ---------------------------------------------------------------------------


def _layer_level_fits(buf: jnp.ndarray, P: int, n: int, regular_term,
                      strict: bool = True):
    """Fit every admissible unit level of one layer on `buf`
    (linne_network.c:284-335). `regular_term` is a scalar (possibly traced,
    for the vmapped ridge sweep) or a per-row [B] array (the -a N final
    pass, where each row carries its winning ridge candidate).

    Returns (levels, level_params, level_preds_base, level_preds_nobase,
    level_parcor, level_zc, zc_margin [B], all_zc [B]) — lists indexed by
    level. `zc_margin` is the relative distance of every (unit, level)
    post-ridge r0 to the FLT_EPSILON zero-signal boundary (lpc.c:268) — the
    hardware byte-identity guard's sensor for this decision; `all_zc` is
    True where EVERY (unit, level) fit took the zero early-out (such rows'
    level losses are bit-equal by construction, so their argmin ties are
    deterministic and must not be flagged).
    """
    B = buf.shape[0]
    levels = _valid_levels(P, n)
    t = jnp.asarray(regular_term, _F64)
    level_params = []
    level_preds_base = []
    level_preds_nobase = []
    level_parcor = []
    level_zc = []
    zc_margin = jnp.full((B,), jnp.inf, _F64)
    all_zc = jnp.ones((B,), bool)
    for u in levels:
        npu = P // u
        ns = n // u
        w = jnp.asarray(_welch_window(ns))  # exact host-f64 constants
        seg = buf.reshape(B, u, ns) * w
        ac = _autocorr(seg, npu + 1, strict)
        # ridge on r0 (lpc.c:358): *= 1.0 + term (exact at term == 0)
        tfac = 1.0 + t
        if t.ndim == 1:
            tfac = tfac[:, None]
        ac = ac.at[..., 0].multiply(tfac)
        ac0 = jnp.abs(ac[..., 0])  # [B, U]
        zm = jnp.abs(ac0 - FLT_EPSILON) / jnp.maximum(ac0, FLT_EPSILON)
        zc_margin = jnp.minimum(zc_margin, jnp.min(zm, axis=1))
        coefs, parcor, zc = _levinson(ac, npu, strict)
        all_zc = all_zc & jnp.all(zc, axis=1)
        # layer.params layout: per unit, time-reversed taps
        params = jnp.flip(coefs, axis=2).reshape(B, P)
        pb, pn = _chain_predict(buf, params.reshape(B, u, npu), u, strict)
        level_params.append(params)
        level_preds_base.append(pb)
        level_preds_nobase.append(pn)
        level_parcor.append(parcor[:, -1, :])  # last unit's write
        level_zc.append(zc[:, -1])
    return (levels, level_params, level_preds_base, level_preds_nobase,
            level_parcor, level_zc, zc_margin, all_zc)


def _first_strict_min(losses: jnp.ndarray):
    """First strict minimum over the level axis (linne_network.c:336-340).
    losses: [B, L]. Returns (best [B] i32, gap [B] f64) where gap is the
    relative distance from the winner to the runner-up — the guard's sensor
    for this argmin (a drift-flipped comparison changes the transmitted
    unit count). gap is +inf for a single candidate."""
    B, L = losses.shape
    min_loss = jnp.full((B,), FLT_MAX, _F64)
    best = jnp.zeros((B,), jnp.int32)
    for li in range(L):
        take = losses[:, li] < min_loss
        min_loss = jnp.where(take, losses[:, li], min_loss)
        best = jnp.where(take, jnp.int32(li), best)
    gap = jnp.full((B,), jnp.inf, _F64)
    denom = jnp.maximum(min_loss, 1e-300)
    for li in range(L):
        d = (losses[:, li] - min_loss) / denom
        gap = jnp.where(jnp.int32(li) == best, gap, jnp.minimum(gap, d))
    return best, gap


def _fit_pass(x: jnp.ndarray, layer_num_params: tuple, n: int,
              regular_term: float, strict: bool = True):
    """One greedy layer-by-layer fit at a fixed ridge term.

    Returns (units [B,L] i32, params [B, sum(P)] f64, loss [B], arena,
    sel_margin [B], pass_all_zc [B]) where arena is a per-layer list of
    (level_parcor [(B, npu) per level], level_zc [(B,) per level],
    best_level [B] i32) — the raw material for `fold_parcor_state` — and
    sel_margin is the pass's minimum decision margin (zero-signal epsilon
    distances and unit-level argmin gaps; the guard's per-pass sensor).
    """
    B = x.shape[0]
    buf = x
    all_units = []
    all_params = []
    arena = []
    sel_margin = jnp.full((B,), jnp.inf, _F64)
    pass_all_zc = jnp.ones((B,), bool)

    for P in layer_num_params:
        (levels, level_params, level_preds_base, level_preds_nobase,
         level_parcor, level_zc, zc_margin, all_zc) = _layer_level_fits(
            buf, P, n, regular_term, strict)

        preds = jnp.stack(level_preds_base, axis=1)  # [B, L, n]
        losses = _serial_abs_mean(preds, 1, n, strict)  # [B, L]
        best, gap = _first_strict_min(losses)
        # all-zero-fit rows' level losses are bit-equal -> tie is
        # deterministic (first index), not drift-sensitive
        sel_margin = jnp.minimum(sel_margin, zc_margin)
        sel_margin = jnp.minimum(
            sel_margin, jnp.where(all_zc, jnp.inf, gap))
        pass_all_zc = pass_all_zc & all_zc

        params_all = jnp.stack(level_params, axis=1)  # [B, L, P]
        params_sel = jnp.take_along_axis(
            params_all, best[:, None, None], axis=1)[:, 0]
        pred_nobase_all = jnp.stack(level_preds_nobase, axis=1)
        pred_sel = jnp.take_along_axis(
            pred_nobase_all, best[:, None, None], axis=1)[:, 0]
        units_sel = jnp.asarray(levels, jnp.int32)[best]

        # forward (linne_network.c:165-210): data[1:] += prediction
        buf = jnp.concatenate([buf[:, :1], buf[:, 1:] + pred_sel[:, 1:]],
                              axis=1)
        all_units.append(units_sel)
        all_params.append(params_sel)
        arena.append((level_parcor, level_zc, best))

    loss = _serial_abs_mean(buf, 0, n, strict)
    return (
        jnp.stack(all_units, axis=1),
        jnp.concatenate(all_params, axis=1),
        loss,
        arena,
        sel_margin,
        pass_all_zc,
    )


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def build_fit_fn(layer_num_params: tuple, ridge_terms: tuple, n: int,
                 bits_per_sample: int, coef_bits: int, strict=None):
    """Compile the full preset fit for one block shape. `strict` selects
    the bit-exact serial graph vs the guarded fast graph (None = auto by
    backend; module docstring)."""
    return _build_fit_fn(layer_num_params, ridge_terms, n, bits_per_sample,
                         coef_bits, _resolve_strict(strict))


@functools.lru_cache(maxsize=16)
def _build_fit_fn(layer_num_params: tuple, ridge_terms: tuple, n: int,
                  bits_per_sample: int, coef_bits: int, strict: bool):
    """Compile the full preset fit for one block shape.

    Returns a jitted fn: int32 signals [B, n] (post MS + pre-emphasis) ->
    dict with
      units     [B, L] i32      — chosen unit count per layer
      params    [B, sum(P)] f64 — final layer params (time-reversed layout)
      int_coefs [B, sum(P)] i32 — error-feedback-quantized coefficients
      rshifts   [B, L] i32      — per-layer right shifts
      best_term [B] i32         — winning ridge-candidate index
      arena_parcor [B, AW] f64, arena_zc [B, AZ] bool,
      arena_best [B, T*L] i32   — the per-term/layer/level parcor arena
                writes flattened in (term, layer, level) column order for
                `fold_parcor_state` (three arrays, not a nested pytree:
                every output leaf costs one D2H RPC through the tunnel,
                and the nested form's ~25 leaves per batch dominated the
                measured encode wall time)

    Restrictions (ValueError otherwise): AF iterations must be 0 — with 0
    iterations the reference's final refit recomputes exactly the winning
    sweep pass (fits are arena-read-free at even sub-lengths), so one pass
    per ridge term suffices for bit-identity (linne_network.c:605-630).
    """
    if not supported(layer_num_params, n):
        raise ValueError(f"unsupported shape for device-exact fit: "
                         f"{layer_num_params} n={n}")
    if not ridge_terms:
        raise ValueError("empty ridge list")

    scale = 2.0 ** (-(bits_per_sample - 1))
    offsets = np.concatenate([[0], np.cumsum(layer_num_params)])

    def fit(signals: jnp.ndarray):
        x = signals.astype(_F64) * scale  # exact: int -> f64, * 2^-k
        B = x.shape[0]
        # the ridge term enters the math at exactly one multiply
        # (ac[0] *= 1 + term), so the per-term sweep is a vmap over a
        # traced scalar — ONE traced fit body instead of len(ridge_terms)
        # copies (compile time is the binding constraint on TPU, where the
        # emulated-f64 preset-0 graph alone takes ~19 min). vmap is
        # per-lane op-identical here (no cross-lane reductions), so
        # bit-exactness is preserved (pinned by the preset-1 oracle tests).
        vm = jax.vmap(
            lambda t: _fit_pass(x, tuple(layer_num_params), n, t, strict))
        units_t, params_t, loss_t, arena_t, selm_t, allzc_t = vm(
            jnp.asarray(ridge_terms, _F64))
        per_term = [
            jax.tree.map(lambda a, i=i: a[i],
                         (units_t, params_t, loss_t, arena_t))
            for i in range(len(ridge_terms))
        ]
        # guard sensor: min per-pass decision margin across the sweep
        sel_margin = jnp.min(selm_t, axis=0)
        if len(per_term) == 1:
            units, params, _, _ = per_term[0]
            best_term = jnp.zeros((B,), jnp.int32)
        else:
            # first strict minimum over ridge candidates
            # (linne_network.c:612-618)
            min_loss = jnp.full((B,), FLT_MAX, _F64)
            best_term = jnp.zeros((B,), jnp.int32)
            for i, (_, _, loss, _) in enumerate(per_term):
                take = loss < min_loss
                min_loss = jnp.where(take, loss, min_loss)
                best_term = jnp.where(take, jnp.int32(i), best_term)
            units = per_term[0][0]
            params = per_term[0][1]
            for i in range(1, len(per_term)):
                m = best_term == i
                units = jnp.where(m[:, None], per_term[i][0], units)
                params = jnp.where(m[:, None], per_term[i][1], params)
            # term-argmin gap (all-zero-fit rows' passes are bit-equal ->
            # their tie is deterministic, like the level argmin)
            term_gap = jnp.full((B,), jnp.inf, _F64)
            denom = jnp.maximum(min_loss, 1e-300)
            for i in range(len(per_term)):
                d = (loss_t[i] - min_loss) / denom
                term_gap = jnp.where(
                    jnp.int32(i) == best_term, term_gap,
                    jnp.minimum(term_gap, d))
            term_gap = jnp.where(jnp.all(allzc_t, axis=0), jnp.inf, term_gap)
            sel_margin = jnp.minimum(sel_margin, term_gap)

        int_parts = []
        rshifts = []
        round_margin = jnp.full((B,), jnp.inf, _F64)
        scale_margin = jnp.full((B,), jnp.inf, _F64)
        for li in range(len(layer_num_params)):
            ic, rs, rm, sm = _quantize_layer(
                params[:, offsets[li] : offsets[li + 1]], coef_bits)
            int_parts.append(ic)
            rshifts.append(rs)
            round_margin = jnp.minimum(round_margin, rm)
            scale_margin = jnp.minimum(scale_margin, sm)

        # flatten the arena in (term, layer, level) order — see docstring
        ap_cols: List = []
        zc_cols: List = []
        best_cols: List = []
        for ti in range(len(ridge_terms)):
            arena_layers = per_term[ti][3]
            for (level_parcor, level_zc, best) in arena_layers:
                ap_cols.extend(level_parcor)
                zc_cols.extend(level_zc)
                best_cols.append(best)
        return {
            "units": units,
            "params": params,
            "int_coefs": jnp.concatenate(int_parts, axis=1),
            "rshifts": jnp.stack(rshifts, axis=1),
            "best_term": best_term,
            "arena_parcor": jnp.concatenate(ap_cols, axis=1),
            "arena_zc": jnp.stack(zc_cols, axis=1),
            "arena_best": jnp.stack(best_cols, axis=1),
            # hardware byte-identity guard sensors, packed into ONE output
            # leaf (each leaf costs one D2H RPC through the tunnel):
            # [:, 0] selection margins (relative: zero-eps, level/term
            # argmin gaps), [:, 1] rshift-scale margins (relative: frexp
            # bin edge, low threshold), [:, 2] rounding margins (absolute,
            # quantized-LSB units)
            "margins": jnp.stack(
                [sel_margin, scale_margin, round_margin], axis=1),
        }

    return jax.jit(fit)


@functools.lru_cache(maxsize=64)
def _packed_fit_layout(layer_num_params: tuple, ridge_terms: tuple, n: int):
    """Column widths of the two packed fit buffers (see
    `build_packed_fit_fn`): returns (f64 split offsets, i32 split offsets,
    n_layers, sum_params)."""
    entries, L = arena_layout(layer_num_params, ridge_terms, n)
    sum_p = int(sum(layer_num_params))
    aw = max(off + w for off, w, _ in entries.values())
    az = max(z for _, _, z in entries.values()) + 1
    tl = len(ridge_terms) * L
    f64_offs = np.cumsum([0, sum_p, aw, 3])  # params, arena_parcor, margins
    i32_offs = np.cumsum([0, L, sum_p, L, 1, tl, az])
    #          units, int_coefs, rshifts, best_term, arena_best, arena_zc
    return f64_offs, i32_offs, L, sum_p


def build_packed_fit_fn(layer_num_params: tuple, ridge_terms: tuple, n: int,
                        bits_per_sample: int, coef_bits: int, strict=None):
    """`build_fit_fn` with every output leaf packed into TWO buffers
    ([B, F] f64 and [B, I] i32) inside the same jitted computation, plus an
    `unpack(f64_np, i32_np) -> dict` to recover the canonical dict host-side.

    Motivation: through the axon tunnel every fetched device buffer costs
    one D2H RPC (~70 ms latency regardless of size — docs/PROFILE_r4.md
    roofline); the 9-leaf dict made the corpus encode fetch-bound (measured
    0.66 s of a 1.05 s wall). Two leaves cost two RPCs per chunk and the
    packing concat is free next to the fit itself."""
    return _build_packed_fit_fn(
        tuple(layer_num_params), tuple(ridge_terms), n, bits_per_sample,
        coef_bits, _resolve_strict(strict))


@functools.lru_cache(maxsize=16)
def _build_packed_fit_fn(layer_num_params: tuple, ridge_terms: tuple, n: int,
                         bits_per_sample: int, coef_bits: int, strict: bool):
    """Cached: a fresh jax.jit wrapper per call would miss the jit cache
    every encode (measured: ~18 s/run persistent-cache deserialization of
    the preset-7 executable instead of a sub-second warm dispatch)."""
    base = _build_fit_fn(layer_num_params, ridge_terms, n,
                         bits_per_sample, coef_bits, strict)
    f64_offs, i32_offs, L, sum_p = _packed_fit_layout(
        tuple(layer_num_params), tuple(ridge_terms), n)

    @jax.jit
    def packed(signals: jnp.ndarray):
        out = base(signals)  # inlined under this jit — one dispatch
        f64 = jnp.concatenate(
            [out["params"], out["arena_parcor"], out["margins"]], axis=1)
        i32 = jnp.concatenate(
            [out["units"].astype(jnp.int32),
             out["int_coefs"].astype(jnp.int32),
             out["rshifts"].astype(jnp.int32),
             out["best_term"].astype(jnp.int32)[:, None],
             out["arena_best"].astype(jnp.int32),
             out["arena_zc"].astype(jnp.int32)],
            axis=1)
        return f64, i32

    fo, io = f64_offs, i32_offs

    def unpack(f64: np.ndarray, i32: np.ndarray) -> dict:
        return {
            "params": f64[:, fo[0] : fo[1]],
            "arena_parcor": f64[:, fo[1] : fo[2]],
            "margins": f64[:, fo[2] : fo[3]],
            "units": i32[:, io[0] : io[1]],
            "int_coefs": i32[:, io[1] : io[2]],
            "rshifts": i32[:, io[2] : io[3]],
            "best_term": i32[:, io[3]],
            "arena_best": i32[:, io[4] : io[5]],
            "arena_zc": i32[:, io[5] : io[6]] != 0,
        }

    return packed, unpack


# ---------------------------------------------------------------------------
# -a N final pass (device search/forward + host AF refit hybrid)
# ---------------------------------------------------------------------------
#
# With num_afmethod_iterations > 0 the reference's final refit pass
# (linne_network.c:628-629) is NOT a replay of the winning sweep pass: each
# layer re-runs the unit-count search (AF iterations 0) on the current
# residual, then refits the chosen split with N auxiliary-function (IRLS)
# iterations (lpc.c:578-661) before forwarding. The IRLS solve uses libm
# `pow(s, -0.5)` inside the Cholesky (lpc.c:402-448), which is NOT correctly
# rounded on glibc (measured: ~0.1% of inputs differ from the exactly-rounded
# value) and whose exact behavior depends on the libm build — so the refit
# itself runs on the HOST (same libm as the oracle/reference), while the
# device runs the searches and forwards that surround it. The staged API:
#
#   to_f64, searches, forwards = build_final_pass_fns(...)
#   buf = to_f64(signals)
#   for li in layers:
#       s = searches[li](buf, term_row)      # device: level search
#       params = <host AF refit at s["units"]>
#       buf = forwards[li](buf, params, s["best"])   # device: forward
#
# On XLA:CPU every device stage is bit-identical to the oracle by the same
# construction as the sweep; the host stage IS the oracle.


def _search_impl(buf: jnp.ndarray, term_row: jnp.ndarray, P: int, n: int,
                 strict: bool = True):
    """Final-pass unit-count search for one layer: AF-iteration-0 fits of
    every admissible level at each row's winning ridge term
    (linne_network.c:268-347 with the -a refit's surrounding state).

    Returns dict(best [B] i32, units [B] i32,
    parcor [B, sum(npu over levels)] f64, zc [B, n_levels] bool,
    margin [B] f64) — parcor/zc are the per-level arena deposits for
    `fold_final_pass`; margin is this search's guard sensor (zero-eps
    distances + the level-argmin gap, tie-gated like the sweep's).
    """
    (levels, _level_params, level_preds_base, _level_preds_nobase,
     level_parcor, level_zc, zc_margin, all_zc) = _layer_level_fits(
        buf, P, n, term_row, strict)
    preds = jnp.stack(level_preds_base, axis=1)
    losses = _serial_abs_mean(preds, 1, n, strict)
    best, gap = _first_strict_min(losses)
    margin = jnp.minimum(zc_margin, jnp.where(all_zc, jnp.inf, gap))
    return {
        "best": best,
        "units": jnp.asarray(levels, jnp.int32)[best],
        "parcor": jnp.concatenate(level_parcor, axis=1),
        "zc": jnp.stack(level_zc, axis=1),
        "margin": margin,
    }


def _forward_impl(buf: jnp.ndarray, params: jnp.ndarray, best: jnp.ndarray,
                  P: int, n: int, strict: bool = True):
    """Forward one layer with host-refined params at the (data-dependent)
    chosen unit level (linne_network.c:165-210): predictions are computed at
    every admissible level from the same [B, P] parameter block and the
    chosen level's is selected — non-chosen lanes are garbage and discarded.
    """
    B = buf.shape[0]
    levels = _valid_levels(P, n)
    preds = []
    for u in levels:
        npu = P // u
        _pb, pn = _chain_predict(buf, params.reshape(B, u, npu), u, strict)
        preds.append(pn)
    pred_all = jnp.stack(preds, axis=1)  # [B, L, n]
    pred_sel = jnp.take_along_axis(
        pred_all, best[:, None, None], axis=1)[:, 0]
    return jnp.concatenate([buf[:, :1], buf[:, 1:] + pred_sel[:, 1:]],
                           axis=1)


def build_final_pass_fns(layer_num_params: tuple, n: int,
                         bits_per_sample: int, strict=None):
    """Jitted stages of the -a N final refit pass (see block comment above).

    Returns (to_f64, searches, forwards): `to_f64` maps int32 signals [B, n]
    to the oracle's scaled f64; `searches[li]`/`forwards[li]` are the
    per-layer stages. Raises ValueError on unsupported shapes like
    `build_fit_fn`. `strict` as in `build_fit_fn`.
    """
    return _build_final_pass_fns(tuple(layer_num_params), n,
                                 bits_per_sample, _resolve_strict(strict))


@functools.lru_cache(maxsize=16)
def _build_final_pass_fns(layer_num_params: tuple, n: int,
                          bits_per_sample: int, strict: bool):
    if not supported(layer_num_params, n):
        raise ValueError(f"unsupported shape for device-exact fit: "
                         f"{layer_num_params} n={n}")
    scale = 2.0 ** (-(bits_per_sample - 1))
    to_f64 = jax.jit(lambda s: s.astype(_F64) * scale)
    searches = tuple(
        jax.jit(functools.partial(_search_impl, P=P, n=n, strict=strict))
        for P in layer_num_params)
    forwards = tuple(
        jax.jit(functools.partial(_forward_impl, P=P, n=n, strict=strict))
        for P in layer_num_params)
    return to_f64, searches, forwards


def final_level_layout(P: int, n: int):
    """(offset, npu) per level into the concatenated final-pass parcor
    columns emitted by `_search_impl`."""
    offs = []
    off = 0
    for u in _valid_levels(P, n):
        npu = P // u
        offs.append((off, npu))
        off += npu
    return offs


def fold_final_pass(parcor_coef: np.ndarray, final_layers: Sequence[dict],
                    layer_num_params: Sequence[int], n: int) -> None:
    """Replay the -a N final pass's parcor arena writes for ONE channel row:
    per layer, each level's search deposit in order, then the chosen level's
    refit re-deposit (the AF iterations themselves never write parcor —
    lpc.c:578-661 only rewrites lpc_coef). `final_layers[li]` is a dict with
    1-D "parcor" (concatenated level columns), "zc" [n_levels] and scalar
    "best"."""
    for li, P in enumerate(layer_num_params):
        offs = final_level_layout(P, n)
        fl = final_layers[li]
        parc = np.asarray(fl["parcor"])
        zc = np.asarray(fl["zc"])

        def deposit(lvl: int) -> None:
            off, npu = offs[lvl]
            parcor_coef[:npu] = parc[off : off + npu]
            if bool(zc[lvl]):
                parcor_coef[npu] = 0.0

        for lvl in range(len(offs)):
            deposit(lvl)
        deposit(int(fl["best"]))


def quantize_margins_np(coefs: np.ndarray, nbits: int):
    """Host (numpy) twin of `_quantize_layer`'s guard sensors, for the -a N
    path where quantization runs host-side from device-drifted params
    (exact/lpc.py quantize_coefficients). `coefs`: [P] final f64 params of
    one layer row. Returns (round_margin, scale_margin) floats with the
    same semantics as the device margins."""
    import math

    P = coefs.shape[0]
    max_abs = 0.0
    for v in coefs.tolist():
        av = abs(v)
        if max_abs < av:
            max_abs = av
    lowthr = math.pow(2.0, -(nbits - 1))
    lm = abs(max_abs - lowthr) / lowthr
    if max_abs <= lowthr:
        return float("inf"), lm
    _, ndigit = math.frexp(max_abs)
    fm = min(max_abs - math.pow(2.0, ndigit - 1),
             math.pow(2.0, ndigit) - max_abs) / max_abs
    scale_margin = min(fm, lm)
    scale = math.pow(2.0, (nbits - 1) - ndigit)
    qmax = 1 << (nbits - 1)
    qerror = 0.0
    round_margin = float("inf")
    for ordi in range(P - 1, -1, -1):
        qerror += float(coefs[ordi]) * scale
        y = qerror + 0.5 if qerror >= 0.0 else -qerror + 0.5
        round_margin = min(round_margin, abs(y - round(y)))
        qtmp = int(math.floor(y)) if qerror >= 0.0 else -int(math.floor(y))
        if qtmp >= qmax:
            qtmp = qmax - 1
        elif qtmp < -qmax:
            qtmp = -qmax
        qerror -= qtmp
    return round_margin, scale_margin


def arena_layout(layer_num_params: Sequence[int], ridge_terms: Sequence[float],
                 n: int):
    """Column layout of the flattened arena arrays, in the same
    (term, layer, level) order `build_fit_fn` emits: returns
    (entries, n_layers) with entries[(ti, li, lvl)] = (parcor_off, npu_w,
    zc_col)."""
    return _arena_layout(tuple(layer_num_params), tuple(ridge_terms), n)


@functools.lru_cache(maxsize=64)
def _arena_layout(layer_num_params: tuple, ridge_terms: tuple, n: int):
    entries = {}
    off = 0
    zc = 0
    for ti in range(len(ridge_terms)):
        for li, P in enumerate(layer_num_params):
            for lvl, u in enumerate(_valid_levels(P, n)):
                npu = P // u
                entries[(ti, li, lvl)] = (off, npu, zc)
                off += npu
                zc += 1
    return entries, len(layer_num_params)


def fold_parcor_state(parcor_coef: np.ndarray, out: dict, num_channels: int,
                      layer_num_params: Sequence[int],
                      ridge_terms: Sequence[float], n: int,
                      include_final: bool = True) -> None:
    """Replay the fit's parcor_coef arena writes into the host array, in the
    reference's order: per channel, every sweep pass (each ridge term), then
    the final refit pass with the winning term (linne_network.c:605-630).

    Within one pass: per layer, each level deposits its last unit's parcor
    into [0:npu] (plus [npu] = 0 on the zero-signal early-out,
    lpc.c:268-275), then the refit at the chosen level re-deposits that
    level's write. `parcor_coef` is mutated in place. Channel ch reads row
    ch of the arena arrays.

    With AF iterations = 0 the final refit recomputes exactly the winning
    sweep pass, so its replay reuses that pass's data; with -a N the caller
    passes include_final=False and replays the final pass's own deposits via
    `fold_final_pass` (the refit pass sees different layer inputs, so its
    arena writes differ from every sweep pass).
    """
    entries, L = arena_layout(layer_num_params, ridge_terms, n)
    ap = np.asarray(out["arena_parcor"])
    az = np.asarray(out["arena_zc"])
    ab = np.asarray(out["arena_best"])
    best_term = np.asarray(out["best_term"])
    n_levels = [len(_valid_levels(P, n)) for P in layer_num_params]

    # Only the arena's FINAL state is observable (nothing reads it between
    # deposits — the next block-type estimate is the sole consumer,
    # lpc.c:846-848), so instead of replaying every deposit in order
    # (~85 prefix writes per row; this loop dominated the corpus host
    # strand), walk the deposit sequence BACKWARD and fill each index once:
    # a deposit writes the prefix [0:npu] then (on the zero-signal case)
    # the single cell [npu] = 0, so processing in reverse with a covered-
    # prefix watermark and a set of later point writes reproduces the same
    # final array in <= #distinct-sizes numpy copies.
    for ch in range(num_channels):
        seq = []  # deposits in execution order
        terms = list(range(len(ridge_terms)))
        if include_final:
            terms.append(int(best_term[ch]))
        for ti in terms:
            for li in range(L):
                for lvl in range(n_levels[li]):
                    seq.append(entries[(ti, li, lvl)])
                seq.append(entries[(ti, li, int(ab[ch, ti * L + li]))])
        covered = 0
        pts: set = set()
        for off, npu_w, zc in reversed(seq):
            if bool(az[ch, zc]) and npu_w >= covered and npu_w not in pts:
                parcor_coef[npu_w] = 0.0
                pts.add(npu_w)
            if npu_w > covered:
                parcor_coef[covered:npu_w] = ap[ch, off + covered : off + npu_w]
                for i in pts:
                    if covered <= i < npu_w:
                        parcor_coef[i] = 0.0
                covered = npu_w

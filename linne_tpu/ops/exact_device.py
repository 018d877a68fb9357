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
empirically per corpus, never guaranteed.

Scope: auxiliary-function iterations = 0 (the CLI default) and `-l` off;
the IRLS/Cholesky and trainer refinements remain host-only. Blocks must
divide evenly at every unit level with even sub-lengths (full 10240-sample
blocks always do); odd sub-lengths would need the reference's stale Welch
middle sample (lpc.c:196-205), which a batched pipeline cannot reproduce
without threading the arena through every fit.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import FLT_EPSILON, FLT_MAX
from ..exact.lpc import _welch_window

_MAX_NUM_UNITS = 128
_SCAN_UNROLL = 8

_F64 = jnp.float64


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

    The products are materialized OUTSIDE the scan and the scan body is a
    pure add: XLA:CPU contracts `acc + x*y` inside a scan body into an FMA
    (measured; `optimization_barrier` on the product does not stop it),
    which breaks bit-identity with the reference's separate mul/add.
    """
    B, U, ns = seg.shape
    segp = jnp.concatenate(
        [seg, jnp.zeros((B, U, nlags - 1), _F64)], axis=2)
    # gathered[i, lag, b, u] = seg[b, u, i + lag]
    segp_t = jnp.moveaxis(segp, 2, 0)
    idx = jnp.arange(ns)[:, None] + jnp.arange(nlags)[None, :]
    prods = jnp.moveaxis(seg, 2, 0)[:, None] * segp_t[idx]

    def body(acc, p):
        return acc + p, None

    acc0 = jnp.zeros((nlags, B, U), _F64)
    acc, _ = lax.scan(body, acc0, prods, unroll=_SCAN_UNROLL)
    return jnp.moveaxis(acc, 0, 2)


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

        g, _ = lax.scan(gbody, zero, jnp.arange(order))
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


def _chain_predict(x: jnp.ndarray, params: jnp.ndarray, num_units: int):
    """Per-sample serial tap chains, vectorized over time
    (linne_network.c:165-210,319-335; oracle: _unit_predictions).

    x: [B, n] layer input; params: [B, num_units, npu] stored time-reversed
    like layer.params. Returns (with_base, no_base), each [B, n]:
    with_base[t] = ((x[t] + p0*w0) + p1*w1)...; no_base starts from 0.0.
    Entry 0 of unit 0 is garbage by the same convention as the oracle.
    """
    B, n = x.shape
    npu = params.shape[2]
    ns = n // num_units
    xp = jnp.concatenate([jnp.zeros((B, npu), _F64), x], axis=1)
    base = x.reshape(B, num_units, ns)
    nobase = jnp.zeros((B, num_units, ns), _F64)
    for j in range(npu):
        w = lax.slice_in_dim(xp, j, j + n, axis=1).reshape(B, num_units, ns)
        term = _mulsh(params[:, :, j : j + 1], w)
        base = base + term
        nobase = nobase + term
    return base.reshape(B, n), nobase.reshape(B, n)


def _serial_abs_mean(rows: jnp.ndarray, start: int, n: int) -> jnp.ndarray:
    """serial_sum(|rows[..., start:n]|) / n over the trailing axis, serial
    in t (linne_network.c:50-63). rows: [B, ...]; returns [B, ...]."""
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
    Returns (int_coef [B, P] i32, rshift [B] i32)."""
    B, P = coefs.shape
    qmax = 1 << (nbits - 1)
    # max |coef| with the reference's `<` update order (NaN-skipping)
    max_abs = jnp.zeros((B,), _F64)
    for i in range(P):
        av = jnp.abs(coefs[:, i])
        max_abs = jnp.where(max_abs < av, av, max_abs)
    low = max_abs <= 2.0 ** (-(nbits - 1))

    ndigit = _frexp_exponent(max_abs)
    rshift = (nbits - 1) - ndigit
    scale = _exp2_int(rshift)

    qerror = jnp.zeros((B,), _F64)
    outs: List = [None] * P
    for ordi in range(P - 1, -1, -1):
        qerror = qerror + _mulsh(coefs[:, ordi], scale)
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
    return int_coef, rshift


# ---------------------------------------------------------------------------
# one fit pass (ridge term fixed) — linne_network.c:582-630 with AF iters 0
# ---------------------------------------------------------------------------


def _fit_pass(x: jnp.ndarray, layer_num_params: tuple, n: int,
              regular_term: float):
    """One greedy layer-by-layer fit at a fixed ridge term.

    Returns (units [B,L] i32, params [B, sum(P)] f64, loss [B], arena) where
    arena is a per-layer list of
    (level_parcor [(B, npu) per level], level_zc [(B,) per level],
    best_level [B] i32) — the raw material for `fold_parcor_state`.
    """
    B = x.shape[0]
    buf = x
    all_units = []
    all_params = []
    arena = []

    for P in layer_num_params:
        levels = _valid_levels(P, n)
        level_params = []
        level_preds_base = []
        level_preds_nobase = []
        level_parcor = []
        level_zc = []
        for u in levels:
            npu = P // u
            ns = n // u
            w = jnp.asarray(_welch_window(ns))  # exact host-f64 constants
            seg = buf.reshape(B, u, ns) * w
            ac = _autocorr_serial(seg, npu + 1)
            # ridge on r0 (lpc.c:358): *= 1.0 + term (exact at term == 0)
            ac = ac.at[..., 0].multiply(1.0 + regular_term)
            coefs, parcor, zc = _levinson_serial(ac, npu)
            # layer.params layout: per unit, time-reversed taps
            params = jnp.flip(coefs, axis=2).reshape(B, P)
            pb, pn = _chain_predict(buf, params.reshape(B, u, npu), u)
            level_params.append(params)
            level_preds_base.append(pb)
            level_preds_nobase.append(pn)
            level_parcor.append(parcor[:, -1, :])  # last unit's write
            level_zc.append(zc[:, -1])

        preds = jnp.stack(level_preds_base, axis=1)  # [B, L, n]
        losses = _serial_abs_mean(preds, 1, n)  # [B, L]

        # first strict minimum (linne_network.c:336-340)
        min_loss = jnp.full((B,), FLT_MAX, _F64)
        best = jnp.zeros((B,), jnp.int32)
        for li in range(len(levels)):
            take = losses[:, li] < min_loss
            min_loss = jnp.where(take, losses[:, li], min_loss)
            best = jnp.where(take, jnp.int32(li), best)

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

    loss = _serial_abs_mean(buf, 0, n)
    return (
        jnp.stack(all_units, axis=1),
        jnp.concatenate(all_params, axis=1),
        loss,
        arena,
    )


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def build_fit_fn(layer_num_params: tuple, ridge_terms: tuple, n: int,
                 bits_per_sample: int, coef_bits: int):
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
        vm = jax.vmap(lambda t: _fit_pass(x, tuple(layer_num_params), n, t))
        units_t, params_t, loss_t, arena_t = vm(
            jnp.asarray(ridge_terms, _F64))
        per_term = [
            jax.tree.map(lambda a, i=i: a[i],
                         (units_t, params_t, loss_t, arena_t))
            for i in range(len(ridge_terms))
        ]
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

        int_parts = []
        rshifts = []
        for li in range(len(layer_num_params)):
            ic, rs = _quantize_layer(
                params[:, offsets[li] : offsets[li + 1]], coef_bits)
            int_parts.append(ic)
            rshifts.append(rs)

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
        }

    return jax.jit(fit)


def arena_layout(layer_num_params: Sequence[int], ridge_terms: Sequence[float],
                 n: int):
    """Column layout of the flattened arena arrays, in the same
    (term, layer, level) order `build_fit_fn` emits: returns
    (entries, n_layers) with entries[(ti, li, lvl)] = (parcor_off, npu_w,
    zc_col)."""
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
                      ridge_terms: Sequence[float], n: int) -> None:
    """Replay the fit's parcor_coef arena writes into the host array, in the
    reference's order: per channel, every sweep pass (each ridge term), then
    the final refit pass with the winning term (linne_network.c:605-630).

    Within one pass: per layer, each level deposits its last unit's parcor
    into [0:npu] (plus [npu] = 0 on the zero-signal early-out,
    lpc.c:268-275), then the refit at the chosen level re-deposits that
    level's write. `parcor_coef` is mutated in place. Channel ch reads row
    ch of the arena arrays.
    """
    entries, L = arena_layout(layer_num_params, ridge_terms, n)
    ap = np.asarray(out["arena_parcor"])
    az = np.asarray(out["arena_zc"])
    ab = np.asarray(out["arena_best"])
    best_term = np.asarray(out["best_term"])
    n_levels = [len(_valid_levels(P, n)) for P in layer_num_params]

    def apply_pass(ti: int, ch: int) -> None:
        for li in range(L):
            def deposit(lvl: int) -> None:
                off, npu_w, zc = entries[(ti, li, lvl)]
                parcor_coef[:npu_w] = ap[ch, off : off + npu_w]
                if bool(az[ch, zc]):
                    parcor_coef[npu_w] = 0.0

            for lvl in range(n_levels[li]):
                deposit(lvl)
            deposit(int(ab[ch, ti * L + li]))

    for ch in range(num_channels):
        for ti in range(len(ridge_terms)):
            apply_pass(ti, ch)
        apply_pass(int(best_term[ch]), ch)

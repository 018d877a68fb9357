"""LPC public-API parity: Burg method, MDL, LPC<->PARCOR conversion and the
PARCOR quantizer (reference: lpc.c:664-807, 868-900, 903-978), with
inverse-pair tests mirroring test/lpc/main.cpp:146-229."""

import math

import numpy as np
import pytest

from linne_tpu.exact.lpc import (
    WINDOW_RECTANGULAR,
    LpcState,
    convert_parcor_to_lpc,
)


def _sine_data(n=32):
    return np.array([math.sin(0.1 * i) for i in range(n)], dtype=np.float64)


def _ar_signal(n, rho=0.9, seed=3):
    rng = np.random.default_rng(seed)
    e = rng.normal(0, 1, n)
    x = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = rho * acc + e[i]
        x[i] = acc
    return x


def _predict_residual_energy(data, coef):
    """Forward prediction residual energy for LPC coefficients in the
    reference's sign convention (residual[t] = d[t] + sum a[i] d[t-i-1])."""
    order = coef.shape[0]
    n = data.shape[0]
    res = data[order:n].copy()
    for i in range(order):
        res += coef[i] * data[order - i - 1 : n - i - 1]
    return float(np.sum(res * res))


# -- LPC <-> PARCOR (mirrors test/lpc/main.cpp:146-229) ----------------------


def test_lpc_to_parcor_matches_levinson():
    n, order = 32, 16
    data = _sine_data(n)
    st = LpcState(order, n)
    st.calculate_coef(data, n, order, WINDOW_RECTANGULAR, 0.0)
    answer = st.parcor_coef[:order].copy()
    lpc = st.lpc_coef[:order].copy()

    st2 = LpcState(order, n)
    parcor = st2.convert_lpc_to_parcor(lpc, order)
    np.testing.assert_allclose(parcor, answer, rtol=1e-6, atol=1e-12)


def test_parcor_to_lpc_roundtrip():
    n, order = 32, 16
    data = _sine_data(n)
    st = LpcState(order, n)
    st.calculate_coef(data, n, order, WINDOW_RECTANGULAR, 0.0)
    lpc = st.lpc_coef[:order].copy()
    parcor = st.parcor_coef[:order].copy()
    np.testing.assert_allclose(
        convert_parcor_to_lpc(parcor, order), lpc, rtol=1e-6, atol=1e-12)


def test_lpc_parcor_inverse_pair_random():
    rng = np.random.default_rng(11)
    for order in (1, 2, 5, 8, 16):
        parcor = rng.uniform(-0.95, 0.95, order)
        st = LpcState(order, 64)
        lpc = convert_parcor_to_lpc(parcor, order)
        back = st.convert_lpc_to_parcor(lpc, order)
        np.testing.assert_allclose(back, parcor, rtol=1e-9, atol=1e-12)


# -- PARCOR quantizer (lpc.c:940-978) ----------------------------------------


def test_parcor_quantizer_rounding_and_clamp():
    order, nbits = 4, 8
    qmax = 1 << (nbits - 1)
    # build LPC coefficients from known PARCORs, quantize, check values
    parcor = np.array([0.5, -0.25, 0.999, -0.999])
    lpc = convert_parcor_to_lpc(parcor, order)
    st = LpcState(order, 64)
    q = st.quantize_coefficients_as_parcor(lpc, order, nbits)
    expect = []
    for p in parcor:
        v = math.floor(p * 128 + 0.5) if p >= 0 else -math.floor(-p * 128 + 0.5)
        expect.append(int(min(max(v, -qmax), qmax - 1)))
    assert q.tolist() == expect


def test_parcor_quantizer_boundary_clamp():
    # parcor exactly at +-1 boundary after rounding must clamp to the
    # representable range [-qmax, qmax-1]
    order, nbits = 2, 5
    qmax = 1 << (nbits - 1)
    parcor = np.array([0.9999, -0.9999])
    lpc = convert_parcor_to_lpc(parcor, order)
    st = LpcState(order, 64)
    q = st.quantize_coefficients_as_parcor(lpc, order, nbits)
    assert q[0] == qmax - 1
    assert q[1] == -qmax


# -- Burg method (lpc.c:664-807) ----------------------------------------------


def test_burg_whitens_ar_signal():
    n, order = 256, 8
    data = _ar_signal(n, rho=0.9)
    st = LpcState(order, n)
    coef = st.calculate_coef_burg(data, n, order)
    assert np.all(np.isfinite(coef))
    res = _predict_residual_energy(data, coef)
    raw = float(np.sum(data[order:] ** 2))
    assert res < 0.5 * raw  # an AR(1) with rho=.9 predicts well


def test_burg_close_to_levinson_on_long_stationary_data():
    n, order = 2048, 4
    data = _ar_signal(n, rho=0.7, seed=9)
    st = LpcState(order, n)
    burg = st.calculate_coef_burg(data, n, order)
    st2 = LpcState(order, n)
    st2.calculate_coef(data, n, order, WINDOW_RECTANGULAR, 0.0)
    lev = st2.lpc_coef[:order].copy()
    # both estimate the same AR process; asymptotically they agree
    np.testing.assert_allclose(burg, lev, atol=0.05)
    # and Burg's fit is at least competitive on the training data
    assert (_predict_residual_energy(data, burg)
            <= 1.05 * _predict_residual_energy(data, lev))


def test_burg_stability_reflection_bounded():
    # reflection coefficients of the Burg fit must be within (-1, 1):
    # convert the result back to PARCOR and check
    n, order = 512, 12
    data = _ar_signal(n, rho=0.95, seed=21)
    st = LpcState(order, n)
    coef = st.calculate_coef_burg(data, n, order)
    parcor = st.convert_lpc_to_parcor(coef, order)
    assert np.all(np.abs(parcor) < 1.0)


# -- MDL (lpc.c:868-900) -------------------------------------------------------


def test_mdl_formula_and_stale_read():
    n, order = 64, 6
    data = _sine_data(n)
    st = LpcState(16, n)  # arena larger than the fit order
    mdl = st.calculate_mdl(data, n, order, WINDOW_RECTANGULAR)
    # recompute from the state the call left behind: n*sum ln(1-p_k^2) for
    # k=1..order (k=order reads one past what Levinson wrote) + order*ln(n)
    expect = 0.0
    for k in range(1, order + 1):
        p = float(st.parcor_coef[k])
        expect += math.log(1.0 - p * p)
    expect *= n
    expect += order * math.log(n)
    assert mdl == pytest.approx(expect, rel=1e-12)
    assert math.isfinite(mdl)


def test_mdl_prefers_true_order_penalty():
    # white noise: the variance-ratio term is ~0, so MDL grows with order
    n = 1024
    rng = np.random.default_rng(5)
    data = rng.normal(0, 1, n)
    st = LpcState(32, n)
    mdls = [st.calculate_mdl(data, n, o, WINDOW_RECTANGULAR)
            for o in (2, 8, 24)]
    assert mdls[0] < mdls[1] < mdls[2]

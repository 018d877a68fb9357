"""The native exact float64 helpers (linne_exact_autocorr /
linne_exact_unit_predict) must be BIT-identical to the numpy oracles they
replace — same left-to-right accumulation, every product rounded before the
add (fp contraction off). Any deviation would silently break byte-exactness
of the ExactEncoder, so this pins them directly; the golden/waveform-matrix
suites pin the end-to-end result."""

import numpy as np
import pytest

from linne_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _serial_sum_oracle(x):
    acc = np.empty(x.shape[0] + 1, dtype=np.float64)
    acc[0] = 0.0
    acc[1:] = x
    return float(np.cumsum(acc)[-1])


def test_exact_autocorr_bit_identical():
    rng = np.random.default_rng(3)
    cases = [
        (rng.normal(0, 0.3, 10240), 129),
        (rng.normal(0, 1e-5, 1280), 17),
        (rng.laplace(0, 2.0, 640), 5),
        (np.zeros(256), 9),
        (rng.normal(0, 0.3, 33), 33),   # nlags == n (ns = npu + 1 fits)
        (rng.normal(0, 0.3, 34), 33),
        (rng.normal(0, 0.3, 35), 33),   # tail-group edges
        (np.where(np.arange(128) % 2 == 0, 1.0, -1.0), 13),
    ]
    for d, nlags in cases:
        d = np.ascontiguousarray(d, np.float64)
        got = native.exact_autocorr(d, nlags)
        n = d.shape[0]
        want = np.array([
            _serial_sum_oracle(d[: n - lag] * d[lag:])
            for lag in range(nlags)])
        # bit equality, not allclose: the helper must reproduce the exact
        # rounding sequence
        assert np.array_equal(got, want), (n, nlags)


def test_preemph_coef_bit_identical():
    """The fused native lag-0/lag-1 pass must reproduce the oracle's
    mul-then-cumsum coefficient exactly, including the corr0 < 1e-6 and
    negative-ratio short circuits and the >= 16 clamp (growing signals can
    push the scaled ratio past int32 range — the clamp must fire first)."""
    from linne_tpu.exact import filters as F

    def oracle(buf, n):
        d = buf[:n].astype(np.float64)
        curr, succ = d[:-1], d[1:]
        corr0 = float(np.cumsum(curr * curr)[-1]) if n > 1 else 0.0
        corr1 = float(np.cumsum(curr * succ)[-1]) if n > 1 else 0.0
        if corr0 < 1e-6:
            return 0
        r = corr1 / corr0
        if r < 0.0:
            return 0
        coef = int(F._c_round(r * 32.0))
        if coef >= 16:
            coef = 15
        return coef

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(-(2 ** 15), 2 ** 15, 10240),
        rng.integers(-(2 ** 23), 2 ** 23, 4096),
        np.zeros(128, np.int64),                 # corr0 == 0 short circuit
        np.array([5], np.int64),                 # n == 1
        np.array([1, 2 ** 30], np.int64),        # huge ratio -> clamp
        np.array([3, -3, 3, -3, 3], np.int64),   # negative ratio
        np.cumsum(rng.integers(0, 50, 512)),     # strongly correlated
    ]
    for buf in cases:
        buf = buf.astype(np.int32)
        n = buf.shape[0]
        assert native.preemph_coef(buf, n) == oracle(buf, n), n


def test_exact_unit_predict_bit_identical():
    rng = np.random.default_rng(5)
    for n, num_units, npu in [(10240, 1, 128), (10240, 4, 32),
                              (10240, 128, 1), (1280, 8, 2),
                              (640, 2, 16), (40, 4, 4),
                              (36, 2, 16)]:  # ns barely > npu
        if n // num_units <= npu:
            continue
        x = rng.normal(0, 0.5, n).astype(np.float64)
        params = rng.normal(0, 0.2, num_units * npu).astype(np.float64)
        for include_base in (False, True):
            got = native.exact_unit_predict(
                x, params, num_units, npu, include_base)
            # numpy oracle (the pre-native formulation)
            xp = np.concatenate([np.zeros(npu), x])
            W = np.lib.stride_tricks.sliding_window_view(xp, npu)[:n]
            ns = n // num_units
            P = np.repeat(params.reshape(num_units, npu), ns, axis=0)
            terms = W * P
            base = x[:, None] if include_base else np.zeros((n, 1))
            want = np.cumsum(
                np.concatenate([base, terms], axis=1), axis=1)[:, -1]
            assert np.array_equal(got, want), (n, num_units, npu,
                                               include_base)


def test_exact_unit_predict_signed_zero_context():
    """The implicit left context multiplies as +0.0 (not skipped): an
    all-zero signal with negative taps must keep the oracle's signed-zero
    results bit-for-bit."""
    n, num_units, npu = 64, 1, 8
    x = np.zeros(n)
    x[0] = -0.0
    params = -np.abs(np.random.default_rng(9).normal(0, 1, npu))
    got = native.exact_unit_predict(x, params, num_units, npu, False)
    xp = np.concatenate([np.zeros(npu), x])
    W = np.lib.stride_tricks.sliding_window_view(xp, npu)[:n]
    want = np.cumsum(
        np.concatenate([np.zeros((n, 1)), W * params[None, :]], axis=1),
        axis=1)[:, -1]
    assert np.array_equal(np.signbit(got), np.signbit(want))
    assert np.array_equal(got, want)


def test_exact_levinson_bit_identical():
    """Native Levinson-Durbin must reproduce the python recursion bit-for-
    bit, including write extents (arena staleness: entries past `order`
    must keep their previous values — the code-length estimator reads one
    past what the recursion wrote)."""
    from linne_tpu.constants import FLT_EPSILON
    from linne_tpu.exact import lpc as L

    rng = np.random.default_rng(11)

    def python_ld(ac, order, lpc_coef, parcor_coef):
        st = L.LpcState(ac.shape[0] - 1, 16)
        st.auto_corr[:] = ac
        st.lpc_coef[:] = lpc_coef
        st.parcor_coef[:] = parcor_coef
        # force the pure-python branch
        orig = L._native.available
        L._native.available = lambda: False
        try:
            st.levinson_durbin(order)
        finally:
            L._native.available = orig
        return st.lpc_coef.copy(), st.parcor_coef.copy()

    for order in (1, 2, 4, 16, 32, 128):
        # realistic decaying autocorrelation + a hostile random one
        lags = np.arange(order + 2, dtype=np.float64)
        acs = [
            np.exp(-lags / 7.0) * (1.0 + 0.01 * rng.normal(0, 1, order + 2)),
            rng.normal(0, 1, order + 2) * np.exp(-lags / 3.0),
            np.zeros(order + 2),  # degenerate |ac[0]| < eps path
        ]
        for ac in acs:
            stale = rng.normal(0, 9, order + 2)  # pre-existing arena junk
            lpc_n = stale.copy()
            par_n = stale[::-1].copy()
            native.exact_levinson(np.ascontiguousarray(ac), order,
                                  FLT_EPSILON, lpc_n, par_n)
            lpc_p, par_p = python_ld(ac, order, stale.copy(),
                                     stale[::-1].copy())
            assert np.array_equal(lpc_n, lpc_p), (order, ac[:3])
            assert np.array_equal(par_n, par_p), (order, ac[:3])


def test_exact_rice_search_matches_python():
    from linne_tpu.format.rice import choose_partition

    rng = np.random.default_rng(17)
    n = 5120
    planes = [
        np.zeros(n, np.int32),
        rng.integers(-3, 4, n).astype(np.int32),
        rng.integers(-2**23, 2**23, n).astype(np.int32),
        np.where(np.arange(n) % 512 == 0, 2**22, 0).astype(np.int32),
        rng.laplace(0, 80, n).astype(np.int32),
        rng.laplace(0, 80, 777).astype(np.int32),   # odd n: porder 0 only
        rng.laplace(0, 80, 2048).astype(np.int32),  # deep partition grid
        # int32-extreme planes: k2 reaches 30/31 (the 64-bit k1=32 branch)
        # and the uint32 cost accumulator wraps — both must match the
        # python model's mod-2^32 arithmetic
        rng.integers(-2**31, 2**31, n).astype(np.int32),
        np.where(np.arange(n) % 2 == 0, 2**31 - 1, -2**31).astype(np.int32),
    ]
    for plane in planes:
        po_n, k2_n = native.exact_rice_search(plane)
        po_p, params = choose_partition(plane)
        assert po_n == po_p
        assert k2_n.tolist() == [k2 for (_, k2) in params]


def test_exact_encoder_native_payload_matches_python_payload():
    """The native-emission branch of ExactEncoder must produce the same
    bytes as the pure-python write_compress_payload branch."""
    import subprocess
    import sys
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    code = """
import sys, numpy as np
sys.path.insert(0, {repo!r})
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.codec.params import EncodeParameter
rng = np.random.default_rng(23)
n = 5096
sig = (900*np.sin(np.arange(n)*0.013) + rng.normal(0,160,n)).astype(np.int32)
sig2 = (800*np.sin(np.arange(n)*0.017) + rng.normal(0,150,n)).astype(np.int32)
out = b''
for preset in (0, 7):
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(num_channels=2,
        bits_per_sample=16, sampling_rate=44100, preset=preset,
        ch_process_method=1))
    out += enc.encode_whole([sig, sig2], n)
sys.stdout.buffer.write(out)
""".format(repo=str(repo))
    import os
    env = dict(os.environ)
    env.pop("LINNE_NO_NATIVE", None)
    with_native = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, check=True).stdout
    env["LINNE_NO_NATIVE"] = "1"
    without = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, check=True).stdout
    assert with_native == without and len(with_native) > 100


def test_exact_af_normal_and_cholesky_bit_identical():
    from linne_tpu.exact import lpc as L

    rng = np.random.default_rng(29)
    for n, order in [(10240, 128), (1280, 16), (640, 4), (132, 128)]:
        data = rng.normal(0, 0.4, n).astype(np.float64)
        a = rng.normal(0, 0.1, order).astype(np.float64)
        got_mat, got_vec, got_obj = L._af_matrix_and_vector(
            data, n, a, order)
        orig = L._native.available
        L._native.available = lambda: False
        try:
            want_mat, want_vec, want_obj = L._af_matrix_and_vector(
                data, n, a, order)
            # cholesky: python path on a COPY of the python matrix
            want_x = L._cholesky_solve(want_mat.copy(), want_vec)
        finally:
            L._native.available = orig
        assert np.array_equal(got_mat, want_mat), (n, order)
        assert np.array_equal(got_vec, want_vec), (n, order)
        assert got_obj == want_obj, (n, order)
        got_x = L._cholesky_solve(got_mat.copy(), got_vec)
        assert np.array_equal(got_x, want_x), (n, order)
    # singular path: all-zero input -> non-positive pivot -> None
    zmat = np.zeros((4, 4))
    assert L._cholesky_solve(zmat.copy(), np.zeros(4)) is None


def test_exact_layer_backward_bit_identical():
    from linne_tpu.exact import network as N

    rng = np.random.default_rng(31)
    for n, num_units, npu in [(1024, 1, 32), (1024, 4, 8), (1280, 8, 2),
                              (640, 2, 16), (768, 128, 1), (40, 4, 4)]:
        if n // num_units <= npu:
            continue
        layer = N.LayerState(n, num_units * npu)
        layer.num_units = num_units
        layer.params[:] = rng.normal(0, 0.2, num_units * npu)
        layer.din[:n] = rng.normal(0, 0.5, n)
        grad = rng.normal(0, 0.3, n)

        got_grad = grad.copy()
        layer.backward(got_grad, n)
        got_dp = layer.dparams.copy()

        orig = N._native.available
        N._native.available = lambda: False
        try:
            want_grad = grad.copy()
            layer.backward(want_grad, n)
            want_dp = layer.dparams.copy()
        finally:
            N._native.available = orig
        assert np.array_equal(got_dp, want_dp), (n, num_units, npu)
        assert np.array_equal(got_grad, want_grad), (n, num_units, npu)


def test_exact_fit_layer_bit_identical():
    """The native whole-layer fit (unit search + AF refit in one call) must
    reproduce the oracle's params, unit choice, AND the analysis arena's
    post-state bitwise — the arena's stale contents feed later fits and the
    code-length estimator."""
    from linne_tpu.exact.network import NetworkState, _MAX_NUM_UNITS

    rng = np.random.default_rng(77)

    def run(net, use_native, n, num_af, reg, data):
        buf = net.data_buffer
        buf[:n] = data[:n]
        outs = []
        for layer in net.layers:
            if use_native:
                net._fit_layer(layer, buf, n, num_af, reg)
            else:
                max_units = min(_MAX_NUM_UNITS, layer.num_params)
                layer.num_units = net._search_optimal_num_units(
                    layer, buf, n, max_units, reg)
                net._set_parameter(layer, buf, n, num_af, reg)
            layer.forward(buf, n)
            outs.append((layer.num_units, layer.params.copy()))
        return outs

    cases = [
        ([2, 32], 2560, 0, 0.0),
        ([4, 64, 8], 2560, 1, 1 / 512),
        ([4, 128, 16], 2562, 2, 0.0),   # odd ns at u=2
        ([3, 6], 2562, 1, 1 / 128),     # non-pow2 params: sparse levels
    ]
    for structure, n, af, reg in cases:
        base = rng.normal(0, 1000, n).round()
        a = NetworkState(n, len(structure), max(structure))
        b = NetworkState(n, len(structure), max(structure))
        a.set_layer_structure(n, structure)
        b.set_layer_structure(n, structure)
        # two sequential fits exercise stale-arena carryover
        for rep, d in enumerate([base, (base * 0.5).round(),
                                 np.zeros(n)]):
            ra = run(a, True, n, af, reg, d.astype(np.float64))
            rb = run(b, False, n, af, reg, d.astype(np.float64))
            for (ua, pa), (ub, pb) in zip(ra, rb):
                assert ua == ub, (structure, n, af, reg, rep)
                assert pa.tobytes() == pb.tobytes(), (structure, n, af, rep)
            for attr in ("buffer", "auto_corr", "lpc_coef", "parcor_coef"):
                assert (getattr(a.lpcc, attr).tobytes()
                        == getattr(b.lpcc, attr).tobytes()), (
                    structure, n, attr, rep)
            assert (a.data_buffer[:n].tobytes()
                    == b.data_buffer[:n].tobytes()), (structure, n, rep)


def test_exact_fit_network_bit_identical():
    """The native whole-network ridge sweep (every ridge candidate fit +
    forward + loss, then the winner's refit, in ONE call) must reproduce
    the Python-orchestrated search bitwise: per-layer params and unit
    choices, the residual left in data_buffer, and the analysis arena's
    post-state (stale contents feed later blocks)."""
    from linne_tpu.exact.network import NetworkState

    rng = np.random.default_rng(31)
    cases = [
        # (layer structure, n, af iters, ridge candidates)
        ([32, 8], 2048, 0, [0.0, 1e-5, 1e-4]),
        ([128, 16, 4], 2048, 2, [0.0, 1e-5, 1e-4, 1e-2]),
        ([16, 4], 1023, 1, [0.0, 1e-4]),   # odd n: stale window-mid reads
        ([4], 640, 3, [1e-6]),             # single ridge: sweep + refit
    ]
    for structure, n, af, ridges in cases:
        a = NetworkState(n, len(structure), max(structure))
        b = NetworkState(n, len(structure), max(structure))
        a.set_layer_structure(n, structure)
        b.set_layer_structure(n, structure)
        # sequential blocks exercise stale-arena carryover across calls
        for blk in range(3):
            sig = (np.cumsum(rng.normal(0, 300, n))
                   + 2000 * np.sin(np.arange(n) * 0.03 * (blk + 1)))
            a.set_units_and_parameters(sig.copy(), n, af, ridges)
            b._set_units_and_parameters_py(sig.copy(), n, af, ridges)
            for la, lb in zip(a.layers, b.layers):
                assert la.num_units == lb.num_units, (structure, n, blk)
                assert la.params.tobytes() == lb.params.tobytes(), (
                    structure, n, blk)
            assert (a.data_buffer[:n].tobytes()
                    == b.data_buffer[:n].tobytes()), (structure, n, blk)
            for attr in ("buffer", "auto_corr", "lpc_coef", "parcor_coef"):
                assert (getattr(a.lpcc, attr).tobytes()
                        == getattr(b.lpcc, attr).tobytes()), (
                    structure, n, attr, blk)


def test_exact_train_bit_identical():
    """The native whole-trainer loop must reproduce the oracle's post-train
    params, dparams, AND momentum bitwise (momentum feeds nothing today but
    is the trainer's persistent state)."""
    from linne_tpu.exact import network as N

    rng = np.random.default_rng(9)
    for structure, n in [([2, 32], 2560), ([4, 64, 8], 2560)]:
        data = rng.normal(0, 800, n).round()
        nets = []
        for use_native in (True, False):
            net = N.NetworkState(n, len(structure), max(structure))
            net.set_layer_structure(n, structure)
            buf = net.data_buffer
            buf[:n] = data
            for layer in net.layers:
                net._fit_layer(layer, buf, n, 0, 0.0)
                layer.forward(buf, n)
            tr = N.TrainerState(len(structure), max(structure))
            if use_native:
                tr.train(net, data.astype(np.float64), n, 60, 0.1, 1e-7)
            else:
                orig = N._native.available
                N._native.available = lambda: False
                try:
                    tr.train(net, data.astype(np.float64), n, 60, 0.1, 1e-7)
                finally:
                    N._native.available = orig
            nets.append((net, tr))
        (a, ta), (b, tb) = nets
        for la, lb in zip(a.layers, b.layers):
            assert la.params.tobytes() == lb.params.tobytes(), structure
            assert la.dparams.tobytes() == lb.dparams.tobytes(), structure
        for ma, mb in zip(ta.momentum, tb.momentum):
            assert ma.tobytes() == mb.tobytes(), structure


def test_native_predict_layer_matches_oracle():
    """linne_predict_layer vs the numpy predict oracle across edge shapes:
    int32-extreme data (wrap territory), rshift 0 (corrupt-stream
    convention half=0), unit tails (num_units not dividing n), and the
    ns <= npu passthrough case."""
    from linne_tpu.exact.intlpc import predict

    rng = np.random.default_rng(91)
    cases = []
    for num_units in (1, 2, 4, 8):
        for order_pu in (1, 4, 32):
            order = order_pu * num_units
            for n in (2048, 2048 + 13 * num_units + 3, num_units * order_pu):
                for rshift in (0, 1, 14, 15):
                    cases.append((n, order, num_units, rshift))
    for n, order, num_units, rshift in cases:
        data = rng.integers(-2**31, 2**31, n).astype(np.int32)
        coef = rng.integers(-128, 128, order).astype(np.int32)
        got = native.predict_layer(data, n, coef, num_units, rshift)
        want = predict(data, n, coef, num_units, rshift)
        assert np.array_equal(got, want), (n, order, num_units, rshift)
    # extreme coefficients at full magnitude: products wrap int32
    n, num_units = 4096, 4
    coef = np.where(np.arange(64) % 2 == 0, 127, -128).astype(np.int32)
    data = np.where(np.arange(n) % 2 == 0, 2**31 - 1, -2**31).astype(np.int32)
    got = native.predict_layer(data, n, coef, num_units, 15)
    want = predict(data, n, coef, num_units, 15)
    assert np.array_equal(got, want)

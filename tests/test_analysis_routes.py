"""Formulation equivalence of the TPU analysis routes.

The TPU path computes large-order autocorrelation / unit forward passes as
MXU matmuls (chunked G-matrix / Toeplitz, ops/analysis.py); the
CPU golden path keeps the FFT formulations. These tests pin
that both compute the same quantities to float rounding, and that an
encoder forced onto the TPU formulations still produces decodable,
lossless streams.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import WAVEFORMS

from linne_tpu.ops import analysis as A


@pytest.fixture
def force_matmul():
    A._MATMUL_ROUTES_OVERRIDE = True
    yield
    A._MATMUL_ROUTES_OVERRIDE = None


def _sig(shape=(2, 3, 2, 10240), seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, shape).astype(dtype))


@pytest.mark.parametrize("num_lags", [129, 65, 33])
def test_autocorr_matmul_matches_fft(num_lags):
    x = _sig()
    a = A.autocorrelation(x, num_lags)
    b = A._autocorr_matmul(x, num_lags)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-10, atol=1e-8)


@pytest.mark.parametrize("n", [10240, 6000, 5096])
def test_autocorr_matmul_ragged_lengths(n):
    x = _sig((2, 2, n), seed=3)
    a = A.autocorrelation(x, 129)
    b = A._autocorr_matmul(x, 129)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-10, atol=1e-8)


@pytest.mark.parametrize("u,npu", [(1, 128), (2, 64), (4, 32), (1, 64)])
def test_unit_forward_matmul_matches_fft(u, npu):
    x = _sig()
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(0, 0.05, x.shape[:-1] + (u, npu)))
    a = A._unit_forward_fft(x, p, u)
    b = A._unit_forward_matmul(x, p, u)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_fit_layer_same_selection_across_routes():
    """The unit-count selection (transmitted!) must agree between routes on
    well-separated losses; coefficients agree to rounding."""
    x = _sig((2, 4, 2, 10240), seed=5)
    try:
        A._MATMUL_ROUTES_OVERRIDE = False
        ref = A.fit_layer(x, 128, 0.0)
        A._MATMUL_ROUTES_OVERRIDE = True
        new = A.fit_layer(x, 128, 0.0)
    finally:
        A._MATMUL_ROUTES_OVERRIDE = None
    assert np.array_equal(np.asarray(ref[0]), np.asarray(new[0]))
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(new[1]),
                               atol=1e-10)


def test_encoder_lossless_on_matmul_routes(force_matmul):
    """End-to-end: a TpuEncoder tracing the matmul/pooled formulations (as
    a real TPU run would) emits a stream our decoder restores bit-exactly."""
    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.constants import CH_PROCESS_MS

    s = WAVEFORMS["gauss"](2560 * 3 + 700, 2, 16)
    enc = TpuEncoder(batch_blocks=4)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2560, preset=7, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole(list(s), s.shape[1])
    out = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(out[c], s[c])


def test_predict_dense_matches_unit_variants():
    """The dense full-order masked integer predict (one pass) must be
    bit-identical to computing every unit-count variant and selecting by
    log2u (wire semantics: linne_lpc_predict.c:7-38)."""
    import numpy as np
    import jax.numpy as jnp

    from linne_tpu.ops import intops as I

    rng = np.random.default_rng(3)
    cases = [(128, 10240, [1, 2, 4, 8, 16, 32, 64, 128]),
             (16, 1280, [1, 2, 4, 8, 16]),
             (32, 640, [1, 2, 4, 8, 16, 32])]
    for order, n, choices in cases:
        B, C = 4, 2
        x = jnp.asarray(
            rng.integers(-2**28, 2**28, (B, C, n)).astype(np.int32))
        coefs = jnp.asarray(
            rng.integers(-128, 128, (B, C, order)).astype(np.int32))
        lus = rng.choice([(u - 1).bit_length() for u in choices],
                         size=(B, C))
        log2u = jnp.asarray(lus.astype(np.int32))
        rsh = jnp.asarray(rng.integers(1, 15, (B, C)).astype(np.int32))
        variants = [I._predict_fixed_units(x, coefs, u, rsh)
                    for u in choices]
        stack = jnp.stack(variants, axis=0)
        cm = {u: i for i, u in enumerate(choices)}
        lut = jnp.asarray([cm.get(1 << l, 0) for l in range(8)], jnp.int32)
        want = jnp.take_along_axis(
            stack, lut[log2u][None, ..., None], axis=0)[0]
        got = I._predict_dense(x, coefs, log2u, rsh, max(choices))
        assert np.array_equal(np.asarray(want), np.asarray(got)), (order, n)


def test_predict_cascade_ragged_tail_uses_variant_route():
    """A ragged block length (device-encoded tail: choices derived from the
    rounded analyze length do not all divide n) must still select among
    per-variant predicts — the dense grid alignment does not hold there."""
    import numpy as np
    import jax.numpy as jnp

    from linne_tpu.ops import intops as I

    rng = np.random.default_rng(7)
    order, n = 16, 777  # odd n: only u=1 divides, but choices say up to 16
    choices = [1, 2, 4, 8, 16]
    B, C = 3, 2
    x = jnp.asarray(rng.integers(-2**20, 2**20, (B, C, n)).astype(np.int32))
    coefs = jnp.asarray(
        rng.integers(-128, 128, (B, C, order)).astype(np.int32))
    lus = rng.choice([(u - 1).bit_length() for u in choices], size=(B, C))
    log2u = jnp.asarray(lus.astype(np.int32))
    rsh = jnp.asarray(rng.integers(1, 15, (B, C)).astype(np.int32))
    got = I.predict_cascade_layer(x, coefs, log2u, rsh, choices)
    variants = [I._predict_fixed_units(x, coefs, u, rsh) for u in choices]
    stack = jnp.stack(variants, axis=0)
    cm = {u: i for i, u in enumerate(choices)}
    lut = jnp.asarray([cm.get(1 << l, 0) for l in range(8)], jnp.int32)
    want = jnp.take_along_axis(
        stack, lut[log2u][None, ..., None], axis=0)[0]
    assert np.array_equal(np.asarray(want), np.asarray(got))


def test_device_rice_search_matches_host_search():
    """ops.rice_search must pick the same partition order and per-partition
    k2 as the exact host search (format.rice.choose_partition) — the wire
    cost model is uint32-exact on both sides, so the argmin and MLE must
    agree bit-for-bit, including at extreme magnitudes and all-zero planes
    (reference: linne_coder.c:217-279)."""
    import numpy as np
    import jax.numpy as jnp

    from linne_tpu.format.rice import choose_partition
    from linne_tpu.ops.rice_search import rice_search

    rng = np.random.default_rng(21)
    n = 5120
    planes = [
        np.zeros(n, np.int32),                                  # all zero
        rng.integers(-3, 4, n).astype(np.int32),                # near-silent
        rng.integers(-2**23, 2**23, n).astype(np.int32),        # hi-res loud
        np.where(np.arange(n) % 512 == 0, 2**22, 0).astype(np.int32),
        (rng.laplace(0, 80, n)).astype(np.int32),               # codec-like
        np.where(np.arange(n) < n // 2, 0,
                 rng.integers(-2**15, 2**15, n)).astype(np.int32),
    ]
    batch = jnp.asarray(np.stack(planes))
    po_dev, k2_dev = rice_search(batch, jnp.float64)
    po_dev = np.asarray(po_dev)
    k2_dev = np.asarray(k2_dev)
    for i, plane in enumerate(planes):
        po_host, params = choose_partition(plane)
        assert po_dev[i] == po_host, i
        k2s_host = [k2 for (_, k2) in params]
        assert k2_dev[i, : 1 << po_host].tolist() == k2s_host, i


def test_predict_dense_batch_rank_generic():
    """_predict_dense must accept any batch rank like the variant route
    (review finding: the index broadcasts were hardcoded to rank 2)."""
    import numpy as np
    import jax.numpy as jnp

    from linne_tpu.ops import intops as I

    rng = np.random.default_rng(5)
    order, n = 16, 640
    choices = [1, 2, 4, 8, 16]
    for batch in [(), (3,), (2, 2, 2)]:
        x = jnp.asarray(
            rng.integers(-2**20, 2**20, batch + (n,)).astype(np.int32))
        coefs = jnp.asarray(
            rng.integers(-128, 128, batch + (order,)).astype(np.int32))
        lus = rng.choice([(u - 1).bit_length() for u in choices],
                         size=batch)
        log2u = jnp.asarray(np.asarray(lus, np.int32))
        rsh = jnp.asarray(rng.integers(1, 15, batch).astype(np.int32))
        got = I._predict_dense(x, coefs, log2u, rsh, max(choices))
        variants = [I._predict_fixed_units(x, coefs, u, rsh)
                    for u in choices]
        stack = jnp.stack(variants, axis=0)
        cm = {u: i for i, u in enumerate(choices)}
        lut = jnp.asarray([cm.get(1 << l, 0) for l in range(8)], jnp.int32)
        want = jnp.take_along_axis(
            stack, lut[log2u][None, ..., None], axis=0)[0]
        assert np.array_equal(np.asarray(want), np.asarray(got)), batch

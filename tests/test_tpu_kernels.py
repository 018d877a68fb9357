"""Real-chip Pallas regressions (run with LINNE_TEST_TPU=1).

Interpreter mode on CPU can hide Mosaic lowering/layout bugs; this lane
executes every Pallas kernel on the actual TPU and asserts bit-equality
(int32) or near-equality (float32) with the plain-XLA formulations.

    LINNE_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -v
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("LINNE_TEST_TPU")
    or jax.devices()[0].platform != "tpu",
    reason="TPU-mode Pallas lane: set LINNE_TEST_TPU=1 on a TPU host")


def _pull(x):
    return np.asarray(x)  # block_until_ready is a no-op through the tunnel


def test_synthesize_rows_tpu_bit_equal():
    from linne_tpu.ops.synthesis import synthesize_rows_tpu, synthesize_rows_xla

    rng = np.random.default_rng(0)
    # the 10240 case exercises the _MAX_NS time-chunking (whole rows do not
    # fit the scoped-vmem stack at 128 lanes)
    for rows, ns, npu in ((4, 2048, 32), (130, 1024, 8), (64, 2560, 128),
                          (8, 10240, 128)):
        x = jnp.asarray(rng.integers(-30000, 30000, (rows, ns)), jnp.int32)
        c = jnp.asarray(rng.integers(-(1 << 14), 1 << 14, (rows, npu)),
                        jnp.int32)
        rs = jnp.asarray(rng.integers(8, 15, rows), jnp.int32)
        tpu_out = _pull(synthesize_rows_tpu(x, c, rs))
        xla_out = _pull(synthesize_rows_xla(x, c, rs))
        assert np.array_equal(tpu_out, xla_out), (rows, ns, npu)


def test_analysis_chain_runs_on_chip():
    """The production analysis stages (XLA formulations — see
    docs/PROFILE_r2.md for why there are no Pallas analysis kernels) must
    execute on the real chip at a production shape."""
    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter

    rng = np.random.default_rng(2)
    n = 2560
    enc = TpuEncoder(batch_blocks=8)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=n, preset=5, ch_process_method=1))
    fn, _ = enc._analyze_fn(n)
    blocks = jnp.asarray(rng.integers(-3000, 3000, (8, 2, n)), jnp.int16)
    out = fn(blocks)
    assert np.all(np.isfinite(_pull(out["packed"][..., :8])))


def test_predict_dense_bit_equal_on_chip():
    """The dense full-order masked integer predict must be bit-identical to
    the per-unit-count variants on real hardware (int32 shifts/gathers take
    different XLA:TPU lowerings than on CPU)."""
    from linne_tpu.ops import intops as I

    rng = np.random.default_rng(7)
    order, n = 128, 2560
    choices = [1, 2, 4, 8, 16, 32, 64, 128]
    B, C = 4, 2
    x = jnp.asarray(rng.integers(-(1 << 27), 1 << 27, (B, C, n)), jnp.int32)
    coefs = jnp.asarray(rng.integers(-128, 128, (B, C, order)), jnp.int32)
    lus = rng.choice([(u - 1).bit_length() for u in choices], size=(B, C))
    log2u = jnp.asarray(lus.astype(np.int32))
    rsh = jnp.asarray(rng.integers(1, 15, (B, C)).astype(np.int32))
    got = _pull(jax.jit(
        lambda *a: I._predict_dense(*a, u_max=max(choices)))(
            x, coefs, log2u, rsh))
    for u in choices:
        want = _pull(jax.jit(
            lambda xx, cc, rr, u=u: I._predict_fixed_units(xx, cc, u, rr)
        )(x, coefs, rsh))
        sel = lus == (u - 1).bit_length()
        assert np.array_equal(got[sel], want[sel]), u

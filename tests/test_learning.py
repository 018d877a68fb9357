"""Fast-path gradient training (-l): losslessness + loss actually drops."""

import numpy as np

from conftest import WAVEFORMS

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS


def _encode(samples, learning, spb=2560):
    ch, n = samples.shape
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=0,
        ch_process_method=CH_PROCESS_MS,
        enable_learning=learning))
    return enc.encode_whole([samples[c] for c in range(ch)], n)


def test_learning_roundtrip_lossless():
    samples = WAVEFORMS["gauss"](2560 * 2, 2, 16)
    data = _encode(samples, learning=True)
    decoded = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(decoded[c], samples[c])


def test_learning_does_not_hurt_compression():
    samples = WAVEFORMS["chirp"](2560 * 2, 2, 16)
    plain = _encode(samples, learning=False)
    trained = _encode(samples, learning=True)
    # trained coefficients should compress at least roughly as well
    assert len(trained) <= len(plain) * 1.02, (len(trained), len(plain))


def test_dense_forward_matches_variant_forward():
    """The trainer's canonical dense layout must compute the same cascade
    L1 loss as the unit-count-variant formulation, for every mix of
    per-row unit choices."""
    import jax.numpy as jnp

    from linne_tpu.ops.training import (
        _dense_forward_loss, _dense_layouts, _forward_loss)

    rng = np.random.default_rng(3)
    orders = [4, 32]
    n = 1280
    from linne_tpu.ops.analysis import candidate_units
    choices = [candidate_units(o, n) for o in orders]
    sig = jnp.asarray(rng.normal(0, 1000, (5, 2, n)), dtype=jnp.float32)
    params = [jnp.asarray(rng.normal(0, 0.3, (5, 2, o)), dtype=jnp.float32)
              for o in orders]
    log2u = [jnp.asarray(rng.choice([int(np.log2(u)) for u in ch], (5, 2)),
                         dtype=jnp.int32) for ch in choices]
    ref = _forward_loss(params, log2u, sig, orders, choices)
    layouts = _dense_layouts(orders, choices, log2u)
    dense = _dense_forward_loss(params, layouts, sig)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_partial_batch_trains_sliced_rows_same_bytes():
    """A partial batch trains only a pow-2 cover of its real rows
    (encoder.py train_fn R-slice). Training is per-row independent, so
    the emitted bytes must match an encode whose batch shape needs no
    slicing at all."""
    samples = WAVEFORMS["chirp"](2560 * 3, 2, 16)  # 3 blocks
    ch, n = samples.shape
    outs = []
    for bb in (16, 8):  # bb=16: real=3 -> R=8 slice; bb=8: R=B, no slice
        enc = TpuEncoder(batch_blocks=bb)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=ch, bits_per_sample=16, sampling_rate=44100,
            num_samples_per_block=2560, preset=0,
            ch_process_method=CH_PROCESS_MS, enable_learning=True))
        outs.append(enc.encode_whole([samples[c] for c in range(ch)], n))
    assert outs[0] == outs[1]
    decoded = Decoder().decode_whole(outs[0])
    for c in range(ch):
        assert np.array_equal(decoded[c], samples[c])

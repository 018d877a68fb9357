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

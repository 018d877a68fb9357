"""Fast-path -a (device IRLS refit chain): losslessness + sane compression."""

import numpy as np

from conftest import WAVEFORMS

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS


def _encode(samples, af_iters, preset=0, spb=2560):
    ch, n = samples.shape
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=preset,
        ch_process_method=CH_PROCESS_MS,
        num_afmethod_iterations=af_iters))
    return enc.encode_whole([samples[c] for c in range(ch)], n)


def test_af_roundtrip_lossless():
    samples = WAVEFORMS["gauss"](2560 * 2, 2, 16)
    data = _encode(samples, af_iters=2)
    decoded = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(decoded[c], samples[c])


def test_af_does_not_hurt_compression():
    samples = WAVEFORMS["chirp"](2560 * 2, 2, 16)
    plain = _encode(samples, af_iters=0)
    refined = _encode(samples, af_iters=2)
    decoded = Decoder().decode_whole(refined)
    assert all(np.array_equal(decoded[c], samples[c]) for c in range(2))
    assert len(refined) <= len(plain) * 1.02, (len(refined), len(plain))

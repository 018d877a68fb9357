"""Encoder edge cases: tiny inputs, many channels, overflowing residuals,
corpus batching, raw-block trigger."""

import numpy as np
import pytest

from conftest import WAVEFORMS

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE


def _roundtrip(samples, bps=16, spb=2560, preset=0, ms=None, batch_blocks=4):
    ch, n = samples.shape
    if ms is None:
        ms = ch >= 2
    enc = TpuEncoder(batch_blocks=batch_blocks)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch, bits_per_sample=bps, sampling_rate=44100,
        num_samples_per_block=spb, preset=preset,
        ch_process_method=CH_PROCESS_MS if ms else CH_PROCESS_NONE))
    data = enc.encode_whole([samples[c] for c in range(ch)], n)
    decoded = Decoder().decode_whole(data)
    for c in range(ch):
        assert np.array_equal(decoded[c], samples[c]), f"channel {c}"
    return data


def test_single_tiny_block():
    samples = WAVEFORMS["gauss"](300, 2, 16)
    _roundtrip(samples)


def test_tail_only_odd_length():
    samples = WAVEFORMS["gauss"](2560 + 137, 2, 16)
    _roundtrip(samples)


def test_eight_channels():
    samples = WAVEFORMS["noise"](2560, 8, 16)
    _roundtrip(samples)


def test_24bit_residual_overflow_path():
    """24-bit full-scale noise forces residuals beyond int16, exercising the
    int32 overflow fallback in the batched transfer path."""
    rng = np.random.default_rng(11)
    samples = rng.integers(-(1 << 23), 1 << 23, size=(2, 2560 * 2),
                           dtype=np.int64).astype(np.int32)
    _roundtrip(samples, bps=24)


def test_partial_batch_padding():
    """5 blocks with batch_blocks=4: second batch is padded; padded rows
    must not leak into the output."""
    samples = WAVEFORMS["gauss"](2560 * 5, 2, 16)
    _roundtrip(samples, batch_blocks=4)


def test_partial_batch_pow2_cover_bytes_stable():
    """A partial batch pads to the pow-2 cover of its real rows, not to
    batch_blocks (encoder._batch_cover); the padding width and the batch
    split must not affect emitted bytes."""
    samples = WAVEFORMS["gauss"](2560 * 9, 2, 16)
    a = _roundtrip(samples, batch_blocks=64)  # one batch: 9 real, cover 16
    b = _roundtrip(samples, batch_blocks=4)   # splits 4+4+1, covers 4/4/8->4
    assert a == b


def test_encode_many_matches_encode_whole():
    tracks = [WAVEFORMS["gauss"](2560 * 2 + 100, 2, 16),
              WAVEFORMS["sine"](2560, 2, 16),
              WAVEFORMS["chirp"](2560 * 3 + 100, 2, 16)]
    enc = TpuEncoder(batch_blocks=4)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2560, preset=0,
        ch_process_method=CH_PROCESS_MS))
    many = enc.encode_many([list(t) for t in tracks],
                           [t.shape[1] for t in tracks])
    for data, t in zip(many, tracks):
        single = enc.encode_whole(list(t), t.shape[1])
        assert data == single
        decoded = Decoder().decode_whole(data)
        assert all(np.array_equal(decoded[c], t[c]) for c in range(2))


def test_mixed_silent_and_content_blocks():
    samples = WAVEFORMS["gauss"](2560 * 3, 2, 16)
    samples[:, 2560 : 2 * 2560] = 0  # middle block silent
    data = _roundtrip(samples)
    # silent block must actually be cheap
    assert len(data) < 2 * 2560 * 2 * 2


def test_tail_shorter_than_layer_order():
    """Tails shorter than the largest layer order have no admissible unit
    split. The reference C encoder SEGFAULTS on these (e.g. 37-sample tail
    at -m 7); both our encoders must emit decodable raw/silent blocks."""
    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.exact.encoder import ExactEncoder

    rng = np.random.default_rng(3)
    for preset, tail in ((7, 37), (5, 100), (2, 17), (0, 1)):
        n = 10240 + tail
        sig = np.clip(rng.normal(0, 3000, (2, n)), -32768, 32767).astype(
            np.int32)
        for enc_cls in (TpuEncoder, ExactEncoder):
            enc = enc_cls()
            enc.set_encode_parameter(EncodeParameter(
                num_channels=2, bits_per_sample=16, sampling_rate=44100,
                preset=preset, ch_process_method=CH_PROCESS_MS))
            data = enc.encode_whole([sig[0], sig[1]], n)
            out = Decoder().decode_whole(data)
            for c in range(2):
                assert np.array_equal(out[c], sig[c]), (
                    enc_cls.__name__, preset, tail)
        # silent short tail
        zsig = np.zeros((2, n), np.int32)
        enc = TpuEncoder()
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=44100,
            preset=preset, ch_process_method=CH_PROCESS_MS))
        data = enc.encode_whole([zsig[0], zsig[1]], n)
        out = Decoder().decode_whole(data)
        assert all(np.array_equal(out[c], zsig[c]) for c in range(2))


def test_reference_decodes_short_tail_stream(tmp_path):
    """The C decoder must accept our raw/silent short-tail blocks — streams
    its own encoder cannot produce (it segfaults on such inputs)."""
    from conftest import have_reference_cli, reference_decode
    from linne_tpu.io.wav import read_wav, write_wav

    if not have_reference_cli():
        pytest.skip("reference CLI not built")
    rng = np.random.default_rng(5)
    n = 10240 + 37
    sig = np.clip(rng.normal(0, 3000, (2, n)), -32768, 32767).astype(np.int32)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=7, ch_process_method=CH_PROCESS_MS))
    lnn = tmp_path / "short_tail.lnn"
    lnn.write_bytes(enc.encode_whole([sig[0], sig[1]], n))
    wav = tmp_path / "back.wav"
    reference_decode(lnn, wav)
    _, restored = read_wav(str(wav))
    assert np.array_equal(restored, sig)

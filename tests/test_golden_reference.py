"""Cross-implementation golden tests against the reference C codec.

- decode parity: reference-encoded `.lnn` streams decode to the original
  samples with our decoder (lossless, bit-exact);
- encode parity: our exact host encoder emits byte-identical `.lnn` files.
"""

import numpy as np
import pytest

from conftest import (
    WAVEFORMS,
    reference_decode,
    reference_encode,
    requires_reference,
)

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.io.wav import read_wav, write_wav

# (waveform, n, ch, bps, mode)
_CASES = [
    ("silence", 8192, 1, 16, 0),
    ("sine", 8192, 1, 16, 0),
    ("sine", 8192, 2, 16, 0),
    ("sine", 8192, 2, 16, 7),
    ("flipsine", 8192, 2, 16, 4),
    ("noise", 8192, 2, 16, 0),
    ("noise", 4096, 1, 8, 0),
    ("chirp", 16384, 2, 24, 2),
    ("gauss", 10240 * 2 + 1000, 2, 16, 0),
    ("gauss", 10240, 2, 16, 5),
    ("gauss", 8192, 2, 16, 1),
    ("gauss", 8192, 2, 16, 3),
    ("gauss", 8192, 2, 16, 6),
    ("const", 4096, 2, 16, 0),
    ("nyquist", 4096, 2, 16, 0),
    # multichannel: MS applies to the first stereo pair only
    # (linne_utility.c:120-132); channels 2+ code independently
    ("gauss", 4096, 4, 16, 2),
    ("flipsine", 8192, 8, 16, 0),
]


def _case_id(case):
    wf, n, ch, bps, mode = case
    return f"{wf}-n{n}-ch{ch}-b{bps}-m{mode}"


def _make_wav(tmp_path, case):
    wf, n, ch, bps, mode = case
    samples = WAVEFORMS[wf](n, ch, bps)
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), samples, 44100, bps)
    return wav_path, samples


@requires_reference
@pytest.mark.parametrize("case", _CASES, ids=_case_id)
def test_decode_reference_bitstream(tmp_path, case):
    """Our decoder must reconstruct reference-encoded audio bit-exactly."""
    wf, n, ch, bps, mode = case
    wav_path, samples = _make_wav(tmp_path, case)
    lnn_path = tmp_path / "a.lnn"
    reference_encode(wav_path, lnn_path, mode=mode)

    dec = Decoder()
    channels = dec.decode_whole(lnn_path.read_bytes())
    assert len(channels) == ch
    for c in range(ch):
        assert np.array_equal(channels[c], samples[c]), f"channel {c} differs"


@requires_reference
@pytest.mark.parametrize("case", _CASES, ids=_case_id)
def test_encode_matches_reference_bytes(tmp_path, case):
    """Our exact encoder must emit byte-identical .lnn files."""
    wf, n, ch, bps, mode = case
    wav_path, samples = _make_wav(tmp_path, case)
    lnn_path = tmp_path / "a.lnn"
    reference_encode(wav_path, lnn_path, mode=mode)
    golden = lnn_path.read_bytes()

    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch,
        bits_per_sample=bps,
        sampling_rate=44100,
        preset=mode,
        ch_process_method=CH_PROCESS_MS if ch >= 2 else CH_PROCESS_NONE,
    ))
    ours = enc.encode_whole([samples[c] for c in range(ch)], n)
    assert len(ours) == len(golden), (
        f"size mismatch: ours {len(ours)} vs golden {len(golden)}")
    if ours != golden:
        diff = next(i for i, (a, b) in enumerate(zip(ours, golden)) if a != b)
        raise AssertionError(f"first byte mismatch at offset {diff}")


@requires_reference
def test_reference_decodes_our_bitstream(tmp_path):
    """Closing the loop: the reference CLI must decode our encoder's output
    back to the original samples."""
    case = ("gauss", 10240 + 4096, 2, 16, 0)
    wav_path, samples = _make_wav(tmp_path, case)
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=0, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([samples[0], samples[1]], samples.shape[1])
    lnn = tmp_path / "ours.lnn"
    lnn.write_bytes(data)
    out_wav = tmp_path / "out.wav"
    reference_decode(lnn, out_wav)
    _, decoded = read_wav(str(out_wav))
    assert np.array_equal(decoded, samples)

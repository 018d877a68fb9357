"""Full waveform-matrix slow lane (nightly): the un-thinned analog of the
reference keystone suite (test/linne_encode_decode/main.cpp:335-530),
widened to every preset as VERDICT r2 item 5 requires.

Two sublanes:
- byte-equality: all 8 waveforms x {1,2,8} channels x {8,16,24} bps x
  presets 0..7, with the reference CLI's channel-processing rule (MS for
  >=2 channels, NONE for mono): our ExactEncoder must emit byte-identical
  .lnn files, and our decoder must restore the reference stream bit-exactly.
- NONE-stereo cross-validation: the reference CLI cannot emit NONE for
  stereo, so those cases run our encoder -> reference decoder (and our
  decoder) for sample-exactness instead of byte-equality.

Run with: python -m pytest tests/test_full_matrix_slow.py -m slow
(deselected by default in the fast suite via `-m "not slow"`).
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

_N = 5096  # < one block; the multi-block paths are covered by the fast lane

_WAVEFORMS = ["silence", "sine", "flipsine", "noise", "chirp", "const",
              "nyquist", "gauss"]

_GRID = [
    (wf, ch, bps, preset)
    for wf in _WAVEFORMS
    for ch in (1, 2, 8)
    for bps in (8, 16, 24)
    for preset in range(8)
]

_NONE_GRID = [(wf, preset) for wf in _WAVEFORMS for preset in range(8)]


def _ids(g):
    return f"{g[0]}-ch{g[1]}-b{g[2]}-m{g[3]}"


@pytest.mark.slow
@requires_reference
@pytest.mark.parametrize("case", _GRID, ids=_ids)
def test_full_matrix_byte_exact_and_lossless(tmp_path, case):
    wf, ch, bps, preset = case
    samples = WAVEFORMS[wf](_N, ch, bps)
    wav = tmp_path / "in.wav"
    write_wav(str(wav), samples, 44100, bps)
    lnn = tmp_path / "ref.lnn"
    reference_encode(wav, lnn, mode=preset)
    golden = lnn.read_bytes()

    chproc = CH_PROCESS_MS if ch >= 2 else CH_PROCESS_NONE
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch, bits_per_sample=bps, sampling_rate=44100,
        preset=preset, ch_process_method=chproc))
    ours = enc.encode_whole(list(samples), _N)
    assert ours == golden, f"byte mismatch ({len(ours)} vs {len(golden)})"

    decoded = Decoder().decode_whole(golden)
    for c in range(ch):
        assert np.array_equal(decoded[c], samples[c])


@pytest.mark.slow
@requires_reference
@pytest.mark.parametrize(
    "case", _NONE_GRID, ids=lambda g: f"{g[0]}-m{g[1]}")
def test_full_matrix_none_stereo_cross_decode(tmp_path, case):
    wf, preset = case
    samples = WAVEFORMS[wf](_N, 2, 16)
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=preset, ch_process_method=CH_PROCESS_NONE))
    data = enc.encode_whole(list(samples), _N)

    decoded = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(decoded[c], samples[c])

    lnn = tmp_path / "ours.lnn"
    lnn.write_bytes(data)
    out_wav = tmp_path / "out.wav"
    reference_decode(lnn, out_wav)
    _, restored = read_wav(str(out_wav))
    assert np.array_equal(restored, samples)

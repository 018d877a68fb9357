"""Golden byte-equality for the exact path's AF refinement (-a) and
gradient learning (-l) against the reference C encoder.

These exercise the IRLS normal-equation build + Cholesky solve and the
momentum trainer's double-precision trajectories; marked slow because the
exact trainer runs up to 2000 full forward/backward passes per channel.
"""

import numpy as np
import pytest

from conftest import WAVEFORMS, reference_encode, requires_reference

from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.io.wav import write_wav


def _golden_case(tmp_path, samples, mode, af_iters=0, learning=False):
    wav = tmp_path / "in.wav"
    write_wav(str(wav), samples, 44100, 16)
    lnn = tmp_path / "ref.lnn"
    reference_encode(wav, lnn, mode=mode, learning=learning,
                     af_iters=af_iters)
    golden = lnn.read_bytes()

    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=samples.shape[0], bits_per_sample=16,
        sampling_rate=44100, preset=mode,
        ch_process_method=CH_PROCESS_MS if samples.shape[0] >= 2 else 0,
        enable_learning=learning, num_afmethod_iterations=af_iters))
    ours = enc.encode_whole(list(samples), samples.shape[1])
    assert ours == golden, (
        f"mismatch: ours {len(ours)} vs golden {len(golden)}")


@requires_reference
@pytest.mark.parametrize("af_iters", [1, 3])
def test_af_refinement_byte_exact(tmp_path, af_iters):
    samples = WAVEFORMS["gauss"](8192, 2, 16)
    _golden_case(tmp_path, samples, mode=0, af_iters=af_iters)


@requires_reference
@pytest.mark.slow
def test_learning_byte_exact(tmp_path):
    samples = WAVEFORMS["sine"](8192, 2, 16)
    _golden_case(tmp_path, samples, mode=0, learning=True)

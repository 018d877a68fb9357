"""tools/linnedec_demo.c: the decode-only C ABI is embeddable without
Python — header parse, preset tables and Huffman build live in the demo;
everything else is linne_host.so (the reference's `linnedec` analog)."""

import shutil
import subprocess

import numpy as np
import pytest

from conftest import WAVEFORMS

from linne_tpu import native
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.io.wav import read_wav

REPO = __import__("pathlib").Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def demo_bin(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("no gcc")
    if not native.available():
        pytest.skip("native runtime unavailable")
    so = REPO / "native" / "build" / "linne_host.so"
    out = tmp_path_factory.mktemp("linnedec") / "linnedec_demo"
    subprocess.run(
        ["gcc", "-O2", "-Wall", str(REPO / "tools" / "linnedec_demo.c"),
         str(so), "-o", str(out)],
        check=True)
    return out


@pytest.mark.parametrize("bps,nch,preset", [(16, 2, 4), (24, 1, 2)])
def test_pure_c_decode_lossless(demo_bin, tmp_path, bps, nch, preset):
    samples = WAVEFORMS["chirp"](2560 * 2, nch, bps)
    n = samples.shape[1]
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=nch, bits_per_sample=bps, sampling_rate=44100,
        num_samples_per_block=2560, preset=preset,
        ch_process_method=1 if nch == 2 else 0))
    data = enc.encode_whole([samples[c] for c in range(nch)], n)
    lnn = tmp_path / "t.lnn"
    lnn.write_bytes(data)
    wav = tmp_path / "t.wav"
    subprocess.run([str(demo_bin), str(lnn), str(wav)], check=True)
    _, decoded = read_wav(str(wav))
    for c in range(nch):
        assert np.array_equal(decoded[c], samples[c])


def test_demo_rejects_corrupt_stream(demo_bin, tmp_path):
    samples = WAVEFORMS["gauss"](2560, 1, 16)
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=1, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2560, preset=0, ch_process_method=0))
    data = bytearray(enc.encode_whole([samples[0]], 2560))
    data[40] ^= 0xFF  # flip a payload byte -> CRC mismatch
    lnn = tmp_path / "bad.lnn"
    lnn.write_bytes(bytes(data))
    r = subprocess.run([str(demo_bin), str(lnn), str(tmp_path / "o.wav")])
    assert r.returncode != 0

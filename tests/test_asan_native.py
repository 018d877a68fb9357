"""AddressSanitizer + UBSan lane for the native format layer.

Runs the decoder's adversarial-input surface (random corruption,
truncation, junk payloads, CRC off) against an instrumented build of
linne_host.cpp, so out-of-bounds reads/writes and undefined shifts can't
hide behind "it didn't crash".
"""

import os
import pathlib
import shutil
import subprocess
import sys

import pytest

from conftest import WAVEFORMS

from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _runtime(name):
    gcc = shutil.which("gcc")
    if not gcc:
        return None
    p = subprocess.run([gcc, f"-print-file-name={name}"],
                       capture_output=True, text=True).stdout.strip()
    return p if p and os.path.isabs(p) and os.path.exists(p) else None


@pytest.mark.skipif(_runtime("libasan.so") is None,
                    reason="no gcc/libasan on host")
def test_native_decode_fuzz_is_asan_clean(tmp_path):
    from conftest import build_sanitized_native

    so = tmp_path / "lh_asan.so"
    err = build_sanitized_native(
        so, ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"])
    if err is not None:
        pytest.skip(f"asan build unavailable: {err[-200:]}")

    samples = WAVEFORMS["gauss"](10240 * 3 + 777, 2, 16)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=2, ch_process_method=CH_PROCESS_MS))
    stream = tmp_path / "t.lnn"
    stream.write_bytes(enc.encode_whole([samples[0], samples[1]],
                                        samples.shape[1]))

    code = f"""
import sys, pathlib
sys.path.insert(0, {str(REPO_ROOT)!r})
import numpy as np
import linne_tpu.native as N
N._tried = False; N._lib = None
N._LIB_PATH = pathlib.Path({str(so)!r})
N._build = lambda: True
from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.params import DecoderConfig
data = bytearray(open({str(stream)!r}, "rb").read())
rng = np.random.default_rng(0)
# clean decode first (both CRC settings, threaded too)
for nthr in (1, 4):
    Decoder(DecoderConfig(num_threads=nthr)).decode_whole(bytes(data))
# corruption sweep with CRC checking OFF (worst case for the unpacker)
for trial in range(120):
    m = bytearray(data)
    for _ in range(rng.integers(1, 6)):
        m[rng.integers(30, len(m))] ^= int(rng.integers(1, 256))
    try:
        Decoder(DecoderConfig(check_crc=False,
                              num_threads=int(rng.integers(1, 5))
                              )).decode_whole(bytes(m))
    except Exception:
        pass
# truncations
for cut in range(1, 60):
    try:
        Decoder(DecoderConfig(check_crc=False)).decode_whole(
            bytes(data[: len(data) * cut // 60]))
    except Exception:
        pass
# pure junk with a valid header prefix
for trial in range(30):
    junk = bytes(data[:30]) + rng.integers(
        0, 256, int(rng.integers(20, 4000))).astype("u1").tobytes()
    try:
        Decoder(DecoderConfig(check_crc=False)).decode_whole(junk)
    except Exception:
        pass
# native PACK path under sanitizers: adversarial residual planes (the
# exact encoder routes bit emission through linne_pack_compress_payload)
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.codec.params import EncodeParameter
n = 2048 + 333
t = np.arange(n)
for sig in (
    np.where(t % 2 == 0, 8388607, -8388608).astype(np.int32),  # nyquist 24b
    (rng.integers(-8388608, 8388608, n)).astype(np.int32),     # white 24b
    np.where(t % 64 == 0, 8388607, 0).astype(np.int32),        # impulses
):
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=24, sampling_rate=44100,
        num_samples_per_block=2048, preset=7, ch_process_method=1))
    out = enc.encode_whole([sig, -sig], n)
    dec = Decoder().decode_whole(out)
    assert np.array_equal(dec[0], sig) and np.array_equal(dec[1], -sig)
# equal-channel 8-bit nyquist: MS zeroes the side channel (k2=0), and the
# mid residuals tile the decode window exactly — the shift-by-64 UB case
ny = np.where(np.arange(5096) % 2 == 0, 127, -128).astype(np.int32)
enc = ExactEncoder()
enc.set_encode_parameter(EncodeParameter(
    num_channels=2, bits_per_sample=8, sampling_rate=44100,
    num_samples_per_block=10240, preset=0, ch_process_method=1))
out = enc.encode_whole([ny, ny], 5096)
dec = Decoder().decode_whole(out)
assert np.array_equal(dec[0], ny) and np.array_equal(dec[1], ny)
# exact float64 helpers (autocorr/levinson/unit-predict/rice-search/AF
# normal equations/cholesky/trainer backward) under sanitizers
sig = (rng.normal(0, 900, 4200)).astype(np.int32)
enc = ExactEncoder()
enc.set_encode_parameter(EncodeParameter(
    num_channels=2, bits_per_sample=16, sampling_rate=44100,
    num_samples_per_block=2048, preset=1, ch_process_method=1,
    num_afmethod_iterations=1, enable_learning=True))
out = enc.encode_whole([sig, -sig], 4200)
dec = Decoder().decode_whole(out)
assert np.array_equal(dec[0], sig) and np.array_equal(dec[1], -sig)
print("ok")
"""
    env = dict(os.environ)
    env["ASAN_OPTIONS"] = "detect_leaks=0"
    preload = [_runtime("libasan.so")]
    ub = _runtime("libubsan.so")
    if ub:
        preload.append(ub)
    env["LD_PRELOAD"] = ":".join(preload)
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True)
    bad = [l for l in r.stderr.splitlines()
           if "ERROR: AddressSanitizer" in l or "runtime error:" in l]
    assert r.returncode == 0 and not bad, (
        f"rc={r.returncode}\n" + "\n".join(bad[:5]) + "\n" + r.stderr[-1200:])
    assert r.stdout.strip() == "ok"

"""ThreadSanitizer lane for the native decode worker pool.

The stream decoder threads over independent blocks; races can't be caught
by timing on small CI machines, so this builds the native library with
-fsanitize=thread and runs a multi-worker decode under the TSan runtime
(LD_PRELOAD'd, since the instrumented code is dlopened). Found the CRC16
lazy-table-init race that motivated it.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import WAVEFORMS

from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _libtsan():
    gcc = shutil.which("gcc")
    if not gcc:
        return None
    p = subprocess.run([gcc, "-print-file-name=libtsan.so"],
                       capture_output=True, text=True).stdout.strip()
    return p if p and os.path.isabs(p) and os.path.exists(p) else None


@pytest.mark.skipif(_libtsan() is None, reason="no gcc/libtsan on host")
def test_threaded_decode_is_tsan_clean(tmp_path):
    from conftest import build_sanitized_native

    so = tmp_path / "lh_tsan.so"
    err = build_sanitized_native(so, ["-fsanitize=thread"])
    if err is not None:
        pytest.skip(f"tsan build unavailable: {err[-200:]}")

    samples = WAVEFORMS["gauss"](10240 * 8, 2, 16)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=2, ch_process_method=CH_PROCESS_MS))
    stream = tmp_path / "t.lnn"
    stream.write_bytes(enc.encode_whole([samples[0], samples[1]],
                                        samples.shape[1]))
    np.save(tmp_path / "sig.npy", samples)

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
data = open({str(stream)!r}, "rb").read()
sig = np.load({str(tmp_path / 'sig.npy')!r})
for nthr in (2, 8):
    out = Decoder(DecoderConfig(num_threads=nthr)).decode_whole(data)
    assert all(np.array_equal(out[c], sig[c]) for c in range(2)), nthr
print("ok")
"""
    env = dict(os.environ)
    env["TSAN_OPTIONS"] = "exitcode=66"
    env["LD_PRELOAD"] = _libtsan()
    env.pop("PYTHONPATH", None)  # keep the sanitized process minimal
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True)
    races = [l for l in r.stderr.splitlines()
             if "WARNING: ThreadSanitizer" in l]
    assert r.returncode == 0 and not races, (
        f"rc={r.returncode} races={len(races)}\n" + r.stderr[-1500:])
    assert r.stdout.strip() == "ok"

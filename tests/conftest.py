"""Test configuration.

JAX-based tests run on a virtual 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware; set before any jax import.
"""

import os
import pathlib
import subprocess
import sys

# The environment ships a sitecustomize that pre-imports jax and registers
# the tunneled TPU ("axon") platform, so env vars alone don't stick — switch
# the already-imported jax to an 8-device CPU mesh explicitly. TPU runs go
# through bench.py / LINNE_TEST_TPU=1.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("LINNE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_CLI = pathlib.Path(
    os.environ.get("LINNE_REFERENCE_CLI", REPO_ROOT / ".refbuild" / "linne"))


def have_reference_cli() -> bool:
    return REFERENCE_CLI.is_file() and os.access(REFERENCE_CLI, os.X_OK)


def build_sanitized_native(so_path, sanitize_flags):
    """Build native/linne_host.cpp into `so_path` with the given sanitizer
    flags, trying -march=native first so the intrinsic paths (AVX-512 x2
    synthesis, PCLMULQDQ CRC) are sanitized too, with a generic fallback
    where the toolchain rejects it (mirrors linne_tpu/native.py _build).
    Returns None on success, else the compiler stderr for a skip message."""
    src = REPO_ROOT / "native" / "linne_host.cpp"
    build = None
    for extra in (["-march=native"], []):
        build = subprocess.run(
            ["g++", "-O1", "-g", "-fwrapv", "-fPIC", "-shared", "-std=c++17",
             "-pthread", *sanitize_flags, *extra, str(src), "-o",
             str(so_path)],
            capture_output=True, text=True)
        if build.returncode == 0:
            return None
    return build.stderr


requires_reference = pytest.mark.skipif(
    not have_reference_cli(),
    reason="reference linne CLI not built (.refbuild/linne)")


def reference_encode(wav_path, lnn_path, mode=0, learning=False, af_iters=0):
    cmd = [str(REFERENCE_CLI), "-e", "-m", str(mode)]
    if learning:
        cmd.append("-l")
    if af_iters:
        cmd += ["-a", str(af_iters)]
    cmd += [str(wav_path), str(lnn_path)]
    subprocess.run(cmd, check=True, capture_output=True)


def reference_decode(lnn_path, wav_path):
    subprocess.run(
        [str(REFERENCE_CLI), "-d", str(lnn_path), str(wav_path)],
        check=True, capture_output=True)


# -- deterministic waveform matrix (mirrors the reference integration test
#    corpus shapes: test/linne_encode_decode/main.cpp:335-530) --------------

def gen_silence(n, ch, bps):
    return np.zeros((ch, n), dtype=np.int32)


def gen_sine(n, ch, bps, freq=441.0, rate=44100.0):
    amp = (1 << (bps - 1)) - 1
    t = np.arange(n)
    x = np.round(amp * 0.8 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int32)
    return np.tile(x, (ch, 1))


def gen_phase_flipped_sine(n, ch, bps):
    base = gen_sine(n, 1, bps)[0]
    out = np.stack([base * (1 - 2 * (c & 1)) for c in range(ch)])
    return out.astype(np.int32)


def gen_white_noise(n, ch, bps, seed=0):
    rng = np.random.default_rng(seed)
    amp = (1 << (bps - 1)) - 1
    return rng.integers(-amp // 2, amp // 2, size=(ch, n)).astype(np.int32)


def gen_chirp(n, ch, bps, rate=44100.0):
    amp = (1 << (bps - 1)) - 1
    t = np.arange(n) / rate
    x = np.round(amp * 0.7 * np.sin(2 * np.pi * (20 + 2000 * t) * t))
    return np.tile(x.astype(np.int32), (ch, 1))


def gen_constant(n, ch, bps, positive=True):
    amp = (1 << (bps - 1)) - 1
    val = amp if positive else -amp - 1
    return np.full((ch, n), val, dtype=np.int32)


def gen_nyquist(n, ch, bps):
    amp = (1 << (bps - 1)) - 1
    x = np.where(np.arange(n) & 1, -amp - 1, amp).astype(np.int32)
    return np.tile(x, (ch, 1))


def gen_gauss(n, ch, bps, seed=1):
    rng = np.random.default_rng(seed)
    amp = (1 << (bps - 1)) - 1
    x = np.clip(np.round(rng.normal(0, amp * 0.2, size=(ch, n))),
                -amp - 1, amp)
    return x.astype(np.int32)


WAVEFORMS = {
    "silence": gen_silence,
    "sine": gen_sine,
    "flipsine": gen_phase_flipped_sine,
    "noise": gen_white_noise,
    "chirp": gen_chirp,
    "const": gen_constant,
    "nyquist": gen_nyquist,
    "gauss": gen_gauss,
}

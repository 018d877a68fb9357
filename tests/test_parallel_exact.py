"""ParallelExactEncoder: thread-pooled byte-exact encoding vs the oracle.

The threading argument (linne_tpu/exact/parallel_encoder.py docstring) is
that fits never read the shared arena and training never touches it, so
per-(block, channel) jobs in private NetworkStates plus an in-order parcor
replay emit exactly the serial encoder's bytes. These tests pin that for
multi-block signals with tails, silent stretches, learning on/off, deep
presets, and pooled corpora — with a pool forced wider than one thread so
the concurrency is real even on single-core CI boxes.
"""

import numpy as np
import pytest

from linne_tpu.codec.params import EncodeParameter
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.exact.parallel_encoder import ParallelExactEncoder

N = 2048  # small block: full unit-level sweep, fast oracle


def _signal(nsamp, seed, nch=2):
    rng = np.random.default_rng(seed)
    t = np.arange(nsamp)
    rows = []
    for _ in range(nch):
        s = np.round(
            rng.uniform(1500, 24000)
            * np.sin(2 * np.pi * rng.uniform(60, 6000) * t / 44100)
            + rng.normal(0, rng.uniform(15, 2500), nsamp))
        rows.append(s)
    return np.clip(np.stack(rows), -32768, 32767).astype(np.int32)


def _param(preset, learning=False, spb=N, af_iters=0):
    return EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=preset, ch_process_method=1, num_samples_per_block=spb,
        enable_learning=learning, num_afmethod_iterations=af_iters)


@pytest.mark.parametrize("preset,learning,af_iters", [
    (0, False, 0), (0, True, 0), (1, False, 0), (5, True, 0),
    (0, False, 3), (1, True, 2),
])
def test_parallel_exact_byte_identical(preset, learning, af_iters):
    nsamp = N * 3 + 777  # 3 full blocks + host-fallback tail
    sig = _signal(nsamp, seed=7 + preset + (100 if learning else 0))
    sig[:, N : N + 500] = 0  # quiet stretch keeps the type decision honest

    param = _param(preset, learning, af_iters=af_iters)
    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig[0], sig[1]], nsamp)

    par = ParallelExactEncoder(num_threads=3)
    par.set_encode_parameter(param)
    assert par.encode_whole([sig[0], sig[1]], nsamp) == ref


def test_parallel_exact_silent_and_raw_blocks():
    """Blocks decided SILENT or RAW discard their prefit entries; the arena
    replay must skip them exactly like the serial encoder skips their fits.
    White noise at full scale forces a RAW decision."""
    rng = np.random.default_rng(3)
    nsamp = N * 3
    sig = np.zeros((2, nsamp), np.int32)
    sig[:, :N] = rng.integers(-32768, 32768, (2, N))  # raw-ish block
    # block 2 stays all-zero (silent); block 3 is tonal (compress)
    t = np.arange(N)
    sig[0, 2 * N :] = np.round(9000 * np.sin(2 * np.pi * 431 * t / 44100))
    sig[1, 2 * N :] = np.round(8000 * np.sin(2 * np.pi * 223 * t / 44100))

    param = _param(0)
    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig[0], sig[1]], nsamp)

    par = ParallelExactEncoder(num_threads=3)
    par.set_encode_parameter(param)
    assert par.encode_whole([sig[0], sig[1]], nsamp) == ref


def test_parallel_exact_encode_many_matches_whole():
    param = _param(0, learning=True)
    lens = [N * 2 + 501, N, N + 99]
    tracks = [[r for r in _signal(ns, seed=40 + i)]
              for i, ns in enumerate(lens)]

    enc = ParallelExactEncoder(num_threads=3)
    enc.set_encode_parameter(param)
    many = enc.encode_many(tracks, lens)
    for i, ns in enumerate(lens):
        host = ExactEncoder()
        host.set_encode_parameter(param)
        assert many[i] == host.encode_whole(tracks[i], ns), f"track {i}"


def test_parallel_exact_af_with_learning_encode_many():
    """-a and -l together through the pooled corpus path: the AF refit
    changes the fitted params the trainer starts from, so this exercises
    the full private-state chain (fit + refit + train + replay)."""
    param = _param(0, learning=True, af_iters=1)
    lens = [N * 2, N + 321]
    tracks = [[r for r in _signal(ns, seed=60 + i)]
              for i, ns in enumerate(lens)]

    enc = ParallelExactEncoder(num_threads=3)
    enc.set_encode_parameter(param)
    many = enc.encode_many(tracks, lens)
    for i, ns in enumerate(lens):
        host = ExactEncoder()
        host.set_encode_parameter(param)
        assert many[i] == host.encode_whole(tracks[i], ns), f"track {i}"


def test_parallel_exact_instance_reuse_reprefits():
    """A second encode_whole on the same instance must re-prefit for the
    new signal instead of silently reusing the first signal's fit cache
    (round-4 advisor finding)."""
    param = _param(0)
    s1 = _signal(N * 2, seed=401)
    s2 = _signal(N * 2 + 99, seed=402)

    par = ParallelExactEncoder(num_threads=3)
    par.set_encode_parameter(param)
    par.encode_whole([s1[0], s1[1]], N * 2)
    got = par.encode_whole([s2[0], s2[1]], N * 2 + 99)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    assert got == host.encode_whole([s2[0], s2[1]], N * 2 + 99)

#!/usr/bin/env python
"""Headline benchmark: mode-7 encode throughput on one TPU chip.

Prints exactly one JSON line:
  {"metric": "mode7_encode_realtime_x", "value": ..., "unit": "x_realtime",
   "vs_baseline": ...}

Baseline: the reference C encoder's mode-7 mean encode time over the RWC
corpus is 14.3959% of track realtime, i.e. ~6.947x realtime on one CPU core
(BASELINE.md). `vs_baseline` is our realtime multiple divided by that.

The bench encodes synthetic but audio-like stereo 16-bit/44.1kHz material
(mixed detuned partials + pink-ish noise) end-to-end: device analysis (one
batched dispatch for all blocks) + native host entropy packing; the first
encode warms up compilation and is excluded.
"""

import json
import sys
import time

import numpy as np

BASELINE_REALTIME_X = 100.0 / 14.3959  # C reference, mode 7


def make_signal(num_samples: int, rate: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(1234)
    t = np.arange(num_samples) / rate
    base = 110.0
    left = np.zeros(num_samples)
    right = np.zeros(num_samples)
    for k in range(1, 9):
        amp = 9000.0 / k
        left += amp * np.sin(2 * np.pi * base * k * t + 0.1 * k)
        right += amp * np.sin(2 * np.pi * (base * k + 0.5) * t)
    # filtered noise floor
    noise = rng.normal(0, 1, num_samples + 64)
    kernel = np.exp(-np.arange(32) / 8.0)
    noise = np.convolve(noise, kernel, mode="same")[:num_samples]
    left += 120 * noise
    right += 120 * rng.normal(0, 1, num_samples)
    s = np.stack([left, right])
    return np.clip(np.round(s * 0.6), -32768, 32767).astype(np.int32)


def main() -> None:
    import jax

    sys.path.insert(0, ".")
    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.codec.params import EncodeParameter

    rate = 44100
    spb = 10240
    num_blocks = 128
    n = spb * num_blocks  # ~11.1 s of audio
    signal = make_signal(n, rate)

    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=rate,
        num_samples_per_block=spb, preset=7, ch_process_method=1))

    # warmup (compile + first dispatch)
    data = enc.encode_whole([signal[0], signal[1]], n)

    # verify losslessness before timing
    decoded = Decoder().decode_whole(data)
    assert all(np.array_equal(decoded[c], signal[c]) for c in range(2)), (
        "round-trip mismatch")

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        data = enc.encode_whole([signal[0], signal[1]], n)
        times.append(time.perf_counter() - t0)
    best = min(times)
    audio_seconds = n / rate
    realtime_x = audio_seconds / best

    print(json.dumps({
        "metric": "mode7_encode_realtime_x",
        "value": round(realtime_x, 2),
        "unit": "x_realtime",
        "vs_baseline": round(realtime_x / BASELINE_REALTIME_X, 2),
    }))
    print(
        f"# platform={jax.devices()[0].platform} device={jax.devices()[0]} "
        f"encode={best:.3f}s audio={audio_seconds:.1f}s "
        f"size={len(data)} ({len(data)/(n*4):.1%} of raw) runs={['%.3f' % t for t in times]}",
        file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe: byte-exact device analysis at MODE 7 on the real chip.

Round-3 verdict item 1 asked for the north-star conjunction (bit-exact AND
fast) on ONE path; round 4 delivered it at preset 0 (BENCH exact_device_*
rows). This probe extends the measurement to the headline preset 7
(layers {4,128,16}, 4 ridge candidates — reference linne_internal.c:32-41):

  stage 1: compile `build_fit_fn((4,128,16), RIDGE_3, 10240, 16, 8)` on the
           TPU (emulated f64; compile time is the known constraint,
           ~19 min for preset 0, docs/PROFILE_r4.md) — persistent-cached.
  stage 2: steady-state fit throughput at the probe chunk size.
  stage 3: DeviceExactEncoder end-to-end on a short track, asserting byte
           identity against the host ExactEncoder oracle.

Prints one JSON line per stage so a killed run still leaves numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = int(os.environ.get("PROBE_CHUNK", "64"))
os.environ.setdefault("LINNE_EXACT_DEVICE_CHUNK", str(CHUNK))

import numpy as np  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.constants import LPC_COEF_BITWIDTH
    from linne_tpu.ops import exact_device as dev
    from linne_tpu.presets import PRESETS

    import jax
    import jax.numpy as jnp

    preset = PRESETS[7]
    n = 10240
    log(stage="start", device=str(jax.devices()[0]), chunk=CHUNK,
        layers=list(preset.layer_num_params),
        nridge=len(preset.ridge_terms))

    fit, unpack = dev.build_packed_fit_fn(
        preset.layer_num_params, preset.ridge_terms, n, 16,
        LPC_COEF_BITWIDTH)

    rng = np.random.default_rng(7)
    rows = (rng.normal(0, 3000, (CHUNK, n))).astype(np.int32)

    # NOTE: time via an actual host fetch — on the axon backend
    # block_until_ready returns before the computation completes (measured:
    # 1 ms "steady" timings for a multi-hundred-ms fit), so only a D2H pull
    # is an honest fence. The packed form (2 buffers) is what the encoder
    # dispatches, so this also warms the production executable's jit cache.
    t0 = time.perf_counter()
    f64, i32 = fit(jnp.asarray(rows))
    unpack(np.asarray(f64), np.asarray(i32))
    compile_s = time.perf_counter() - t0
    log(stage="compiled", compile_s=round(compile_s, 1))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f64, i32 = fit(jnp.asarray(rows))
        unpack(np.asarray(f64), np.asarray(i32))
        best = min(best, time.perf_counter() - t0)
    msamp = CHUNK * n / 1e6
    log(stage="fit_steady", fit_s=round(best, 3),
        fit_msamples_s=round(msamp / best, 2),
        # stereo 44.1k: rows = blocks*ch, so audio seconds = CHUNK/2 * n/44100
        fit_realtime_x=round((CHUNK / 2 * n / 44100) / best, 1))

    # end-to-end byte identity on a short track (8 full blocks, stereo)
    from linne_tpu.exact.device_encoder import DeviceExactEncoder
    from linne_tpu.exact.encoder import ExactEncoder
    from bench import make_signal

    nblocks = CHUNK // 2
    ns = n * nblocks
    sig = make_signal(ns)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=n, preset=7, ch_process_method=1)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    t0 = time.perf_counter()
    ref = host.encode_whole([sig[0], sig[1]], ns)
    host_s = time.perf_counter() - t0

    d = DeviceExactEncoder()
    d.set_encode_parameter(param)
    t0 = time.perf_counter()
    got = d.encode_whole([sig[0], sig[1]], ns)
    first_s = time.perf_counter() - t0
    identical = got == ref
    best = float("inf")
    for _ in range(2):
        d2 = DeviceExactEncoder()
        d2.set_encode_parameter(param)
        t0 = time.perf_counter()
        got2 = d2.encode_whole([sig[0], sig[1]], ns)
        best = min(best, time.perf_counter() - t0)
        identical = identical and got2 == ref
    audio_s = ns / 44100
    log(stage="e2e", byte_identical=bool(identical),
        device_encode_s=round(best, 3),
        device_realtime_x=round(audio_s / best, 1),
        first_s=round(first_s, 2),
        host_encode_s=round(host_s, 3),
        host_realtime_x=round(audio_s / host_s, 1),
        strict=dev._resolve_strict(None),
        guard_rows_total=d.guard_rows_total,
        guard_rows_flagged=d.guard_rows_flagged)


if __name__ == "__main__":
    main()

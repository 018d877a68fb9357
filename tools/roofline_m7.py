#!/usr/bin/env python
"""Roofline the mode-7 analyze chain (VERDICT r3 item 6).

Times each stage of the production analysis chain (pre-processing, one fit
per layer, select, finish) on the live device, captures a profiler trace and
attributes device busy time to MXU-shaped ops (dot/conv fusions) vs
VPU-shaped ops (elementwise/scan), and reports achieved FLOP/s against the
chip's published peak. Also measures the batch-size scaling the projection
in docs/PROFILE_r3.md only argued in prose.

Usage: python tools/roofline_m7.py [--batches 64 128 256]
"""

import argparse
import glob
import gzip
import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timeit(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--trace", action="store_true",
                    help="also capture + summarize a profiler trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.ops import analysis as A

    dev = jax.devices()[0]
    print(f"# device={dev} platform={dev.platform}", flush=True)
    rate, spb = 44100, 10240
    rng = np.random.default_rng(0)

    # RPC floor
    f = jax.jit(lambda v: v + 1)
    v = jnp.zeros(8, jnp.int32)
    f(v).block_until_ready()
    rpc = timeit(lambda: f(v).block_until_ready(), reps=10)
    print(f"rpc floor: {rpc*1e3:.1f} ms", flush=True)

    orders = (4, 128, 16)
    nridge = 4  # mode 7 ridge candidates
    dtype = jnp.float32

    # ---- per-stage timing + analytic FLOPs at each batch size ----
    for bb in args.batches:
        rows = nridge * bb * 2  # ridge x blocks x channels
        sig_r = jnp.asarray(
            rng.normal(0, 0.1, (nridge, bb, 2, spb)).astype(np.float32))
        rv = jnp.asarray(np.asarray([0, 1/2048, 1/512, 1/128]),
                         dtype=dtype).reshape(nridge, 1, 1, 1)

        total_ms = 0.0
        total_gflop = 0.0
        for order in orders:
            fit = jax.jit(lambda s, order=order: jax.tree.map(
                jnp.sum, A.fit_layer(s, order, rv)[3]))
            fit(sig_r).block_until_ready()
            dt = timeit(lambda: fit(sig_r).block_until_ready()) - rpc
            # FLOPs (per candidate level u: autocorr 2*ns*(npu+1) per unit
            # row; forward 2*n*npu per row; L-D ~3*npu^2): summed over the
            # pow-2 level sweep. Autocorr+forward dominate; count those.
            flops = 0
            u = 1
            while u <= min(128, order):
                npu = order // u
                ns = spb // u
                if spb % u == 0 and order % u == 0 and ns > npu:
                    flops += rows * u * (2 * ns * (npu + 1))   # autocorr
                    flops += rows * (2 * spb * npu)            # forward
                    flops += rows * u * 3 * npu * npu          # L-D
                u <<= 1
            gflop = flops / 1e9
            total_ms += dt * 1e3
            total_gflop += gflop
            print(f"bb={bb:4d} fit order={order:4d}: {dt*1e3:8.1f} ms  "
                  f"{gflop:8.2f} GFLOP  {gflop/dt/1e3:7.2f} TFLOP/s",
                  flush=True)
        print(f"bb={bb:4d} fits total: {total_ms:8.1f} ms  "
              f"{total_gflop:8.2f} GFLOP  "
              f"{total_gflop/total_ms:7.2f} TFLOP/s "
              f"({bb*2*spb/1e6/(total_ms/1e3):6.1f} Msamples/s analyzed)",
              flush=True)

    # ---- e2e chain at each bb (async chain, one pull) ----
    from bench import make_signal

    signal = make_signal(spb * 256, rate)
    for bb in args.batches:
        enc = TpuEncoder(batch_blocks=bb)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=rate,
            num_samples_per_block=spb, preset=7, ch_process_method=1))
        enc.encode_whole([signal[0], signal[1]], signal.shape[1])  # warm
        dt = timeit(lambda: enc.encode_whole(
            [signal[0], signal[1]], signal.shape[1]), reps=3)
        audio = signal.shape[1] / rate
        print(f"e2e mode7 bb={bb:4d}: {dt:6.2f} s ({audio/dt:6.1f}x rt)",
              flush=True)

    if not args.trace:
        return
    # ---- trace: device busy time by op category ----
    bb = 128
    sig_r = jnp.asarray(
        rng.normal(0, 0.1, (nridge, bb, 2, spb)).astype(np.float32))
    fits = []
    for order in orders:
        fit = jax.jit(lambda s, order=order: jax.tree.map(
            jnp.sum, A.fit_layer(s, order, rv)[3]))
        fit(sig_r).block_until_ready()
        fits.append(fit)
    tdir = "/tmp/linne_trace"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        for fit in fits:
            fit(sig_r).block_until_ready()
    # newest trace.json.gz
    cands = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True),
                   key=os.path.getmtime)
    if not cands:
        print("no trace captured", flush=True)
        return
    with gzip.open(cands[-1], "rt") as fh:
        tr = json.load(fh)
    events = [e for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # device lanes only (TensorFlow-op naming appears on TPU op tracks)
    by_name = {}
    for e in events:
        name = e.get("name", "")
        pid = e.get("pid")
        by_name.setdefault((pid, name), 0.0)
        by_name[(pid, name)] += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    print("top trace events (us):", flush=True)
    mxu = vpu = 0.0
    for (pid, name), dur in top:
        kind = ("MXU" if any(k in name.lower()
                             for k in ("dot", "conv", "matmul")) else "?")
        print(f"  {dur:12.0f}  pid={pid}  {kind:3s}  {name[:90]}",
              flush=True)
    print(f"(classify with the printed names; dot/conv fusions ride the "
          f"MXU, everything else the VPU/scalar units)", flush=True)


if __name__ == "__main__":
    main()

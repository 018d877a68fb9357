#!/usr/bin/env python
"""Encode-path profiling on the live device: stage breakdown, batch-size
sweep, and XLA-vs-Pallas comparisons of the three analysis kernels at
production shapes (mode-7 preset). Timings force execution with host pulls
(block_until_ready is a no-op through the axon tunnel).

Writes a plain-text report to stdout. Round-2 results and the
Pallas-vs-XLA analysis-kernel decision they drove: docs/PROFILE_r2.md.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def pull(x):
    leaf = x
    if isinstance(x, dict):
        leaf = next(iter(x.values()))
    elif isinstance(x, (tuple, list)):
        leaf = x[0]
    return np.asarray(leaf)


def timeit(fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["e2e", "stages", "kernels", "all"],
                    default="all")
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.ops import analysis as A

    platform = jax.devices()[0].platform
    print(f"# device={jax.devices()[0]} platform={platform}", flush=True)

    rate, spb = 44100, 10240
    rng = np.random.default_rng(0)

    # ---- 1) end-to-end encode vs batch_blocks (mode 7) ----
    from bench import make_signal

    nblocks_total = 256
    signal = make_signal(spb * nblocks_total, rate)
    for bb in (args.batches if args.phase in ("e2e", "all") else []):
        enc = TpuEncoder(batch_blocks=bb)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=rate,
            num_samples_per_block=spb, preset=7, ch_process_method=1))
        dt = timeit(lambda: enc.encode_whole(
            [signal[0], signal[1]], signal.shape[1]), reps=3)
        audio = signal.shape[1] / rate
        print(f"e2e mode7 batch_blocks={bb:4d}: {dt*1000:8.1f} ms "
              f"({audio/dt:6.1f}x realtime)", flush=True)

    if args.phase not in ("stages", "kernels", "all"):
        return
    # ---- 2) stage breakdown at batch_blocks=64 (per-stage synchronized) ----
    bb = 64
    enc = TpuEncoder(batch_blocks=bb)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=rate,
        num_samples_per_block=spb, preset=7, ch_process_method=1))
    blocks = (rng.normal(0, 3000, (bb, 2, spb))).astype(np.int16)
    dev_blocks = jnp.asarray(blocks)

    # rebuild the stage chain exactly as _analyze_fn does, but timed
    if args.phase in ("stages", "all"):
        fn, _ = enc._analyze_fn(spb)
        dt_all = timeit(lambda: pull(fn(dev_blocks)))
        print(f"stage full-chain (async): {dt_all*1000:8.1f} ms", flush=True)

        # H2D cost
        dt_h2d = timeit(lambda: pull(jnp.asarray(blocks)))
        print(f"stage h2d [64,2,10240]i16: {dt_h2d*1000:8.1f} ms", flush=True)

    if args.phase not in ("kernels", "all"):
        return
    # ---- 3) kernel microbench at production shapes ----
    # mode-7 layer orders (4, 128, 16); ridge axis 4; candidates vary.
    nridge, B, C = 4, bb, 2
    for order, u in ((128, 1), (128, 4), (16, 1), (4, 1)):
        npu = order // u
        ns = spb // u
        rows = nridge * B * C * u
        x = jnp.asarray(rng.normal(0, 0.1, (rows, ns)).astype(np.float32))
        p = jnp.asarray(rng.normal(0, 0.1, (rows, u, npu))
                        .astype(np.float32)).reshape(rows, u, npu)

        # pull only a scalar: the tunnel moves ~46MB/s, so pulling full
        # outputs would measure D2H, not the kernel
        ac_xla = jax.jit(lambda v: jnp.sum(A.autocorrelation(v, npu + 1)))
        dt_x = timeit(lambda: pull(ac_xla(x)))
        print(f"autocorr  rows={rows:5d} ns={ns:6d} lags={npu+1:4d}: "
              f"xla {dt_x*1000:7.2f} ms", flush=True)

        # unit_forward: [R*B*C, n] with params [rows2, u, npu]
        rows2 = nridge * B * C
        xf = jnp.asarray(rng.normal(0, 0.1, (rows2, spb)).astype(np.float32))
        pf = jnp.asarray(rng.normal(0, 0.1, (rows2, u, npu)).astype(np.float32))
        uf_xla = jax.jit(lambda v, w: jnp.sum(A.unit_forward(v, w, u)))
        dt_x = timeit(lambda: pull(uf_xla(xf, pf)))
        print(f"unitfwd   rows={rows2:5d} n={spb:6d} u={u:3d} npu={npu:4d}: "
              f"xla {dt_x*1000:7.2f} ms", flush=True)

    # integer predict at [B*C, n] int32
    from linne_tpu.ops import intops as I
    for order, u in ((128, 1), (16, 1), (4, 1)):
        npu = order // u
        rowsi = B * C
        xi = jnp.asarray(rng.integers(-3000, 3000, (rowsi, spb))
                         .astype(np.int32))
        ci = jnp.asarray(rng.integers(-100, 100, (rowsi, order))
                         .astype(np.int32))
        rs = jnp.full((rowsi,), 14, jnp.int32)
        log2u = jnp.zeros((B, C), jnp.int32) + (u - 1).bit_length()

        # XLA path comes via intops.predict_cascade_layer on [B, C, n]
        xb = xi.reshape(B, C, spb)
        cb = ci.reshape(B, C, order)
        rsb = rs.reshape(B, C)
        pc_xla = jax.jit(lambda v, c, l2, r: jnp.sum(I.predict_cascade_layer(
            v, c, l2, r, [u])))
        dt_x = timeit(lambda: pull(pc_xla(xb, cb, log2u, rsb)))
        print(f"predict   rows={rowsi:5d} n={spb:6d} u={u:3d} npu={npu:4d}: "
              f"xla {dt_x*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

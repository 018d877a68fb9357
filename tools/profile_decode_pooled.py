#!/usr/bin/env python
"""Attribute pooled TPU corpus-decode wall time by stage.

Stages of TpuDecoder.decode_many (codec/tpu_decoder.py):
  parse    — host entropy decode of every block (native, threaded)
  synth    — device reversed-layer cascade (gather/pallas/scatter groups)
             including the slim download
  finish   — native finish_rows (de-emphasis + MS + scatter into planes)

Also reports the native host decoder on the same corpus for the same-box
comparison, and a group-launch census (how many device dispatches one
composition costs). Usage: python tools/profile_decode_pooled.py [copies]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mode = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from bench import make_signal
    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.codec.tpu_decoder import TpuDecoder

    rate, spb, nblocks = 44100, 10240, 128
    n = spb * nblocks
    sig = make_signal(n, rate)
    enc = TpuEncoder(batch_blocks=128)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=rate,
        num_samples_per_block=spb, preset=mode, ch_process_method=1))
    tracks = [np.roll(sig, k * 11, axis=1) for k in range(copies)]
    datas = enc.encode_many([list(t) for t in tracks], [n] * copies)
    msamples = copies * 2 * n / 1e6

    tdec = TpuDecoder()
    res = tdec.decode_many(datas)  # warm compiles
    for d, t in zip(res, tracks):
        assert all(np.array_equal(d[c], t[c]) for c in range(2))

    # stage attribution (single rep boundaries, best of 3)
    best = {"parse": 1e9, "synth": 1e9, "finish": 1e9, "total": 1e9}
    census = None
    for _ in range(3):
        t0 = time.perf_counter()
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(copies,
                                                os.cpu_count() or 1)) as ex:
            parsed = list(ex.map(tdec._parse_stream, datas))
        t1 = time.perf_counter()
        streams = [(si,) + p for si, p in enumerate(parsed)]
        groups = tdec._synthesize_pooled_rows(streams)
        t2 = time.perf_counter()
        for si in range(copies):
            header, _orders, blocks = parsed[si]
            tdec._assemble_rows(header, blocks, groups, si)
        t3 = time.perf_counter()
        best["parse"] = min(best["parse"], t1 - t0)
        best["synth"] = min(best["synth"], t2 - t1)
        best["finish"] = min(best["finish"], t3 - t2)
        best["total"] = min(best["total"], t3 - t0)
        if census is None:
            # group census: distinct (u, ns, npu) launches per layer
            from collections import Counter
            header, orders, blocks = parsed[0]
            nch = header.num_channels
            cnt = Counter()
            for li in range(len(orders) - 1, -1, -1):
                for si, _h, _o, blks in streams:
                    for i, (_s, bn, kind, b) in enumerate(blks):
                        if kind != "compress":
                            continue
                        log2u = b[2]
                        for ch in range(nch):
                            u = 1 << int(log2u[ch, li])
                            npu = int(orders[li]) // u
                            ns = bn // u
                            if ns > npu:
                                cnt[(li, u, ns, npu)] = 1
            census = len(cnt)

    native_best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for d in datas:
            Decoder().decode_whole(d)
        native_best = min(native_best, time.perf_counter() - t0)

    print(f"copies={copies} mode={mode} msamples={msamples:.1f} "
          f"group_launches={census}")
    for k in ("parse", "synth", "finish", "total"):
        print(f"  {k:>6}: {best[k]*1e3:8.1f} ms  "
              f"{msamples / best[k]:7.1f} Msamples/s")
    print(f"  native: {native_best*1e3:8.1f} ms  "
          f"{msamples / native_best:7.1f} Msamples/s (host, 1 core)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Mode-7 device-exact corpus encode: realtime multiple vs corpus size.

One process (one warmup), then encode_many over growing corpora of 4-block
tracks. Byte identity vs the host oracle is asserted on the smallest corpus
(it is asserted per-run by bench.py; here the question is scaling).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = int(os.environ.get("PROBE_CHUNK", "64"))
os.environ.setdefault("LINNE_EXACT_DEVICE_CHUNK", str(CHUNK))

import numpy as np  # noqa: E402


def main():
    from bench import make_signal
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact.device_encoder import DeviceExactEncoder
    from linne_tpu.exact.encoder import ExactEncoder

    spb, tblocks = 10240, 4
    tlen = tblocks * spb
    maxtracks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sig = make_signal(tlen * maxtracks)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=7, ch_process_method=1)

    def corpus(nt):
        return [[sig[0, i * tlen : (i + 1) * tlen],
                 sig[1, i * tlen : (i + 1) * tlen]] for i in range(nt)]

    t0 = time.perf_counter()
    d = DeviceExactEncoder()
    d.set_encode_parameter(param)
    outs = d.encode_many(corpus(8), [tlen] * 8)
    print(json.dumps({"stage": "warm",
                      "warm_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    for i, tr in enumerate(corpus(8)):
        h = ExactEncoder()
        h.set_encode_parameter(param)
        assert outs[i] == h.encode_whole(tr, tlen), f"track {i}"

    for nt in (8, 16, 32, 64):
        if nt > maxtracks:
            break
        tracks = corpus(nt)
        best = float("inf")
        for _ in range(3):
            enc = DeviceExactEncoder()
            enc.set_encode_parameter(param)
            t0 = time.perf_counter()
            enc.encode_many(tracks, [tlen] * nt)
            best = min(best, time.perf_counter() - t0)
        audio_s = nt * tlen / 44100
        print(json.dumps({
            "stage": "scale", "ntracks": nt, "rows": nt * tblocks * 2,
            "best_s": round(best, 3),
            "realtime_x": round(audio_s / best, 1),
            "msamples_s": round(nt * 2 * tlen / 1e6 / best, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

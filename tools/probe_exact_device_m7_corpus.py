#!/usr/bin/env python
"""Mode-7 device-exact CORPUS encode on the real chip.

Companion to probe_exact_device_m7.py: pools the full blocks of many tracks
into shared chunk dispatches (DeviceExactEncoder.encode_many) at the cached
chunk size, asserting byte identity per track against the host oracle and
reporting the corpus realtime multiple. Usage:
  PROBE_CHUNK=64 python tools/probe_exact_device_m7_corpus.py [ntracks] [blocks_per_track]
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
    ntracks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from bench import make_signal
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact.device_encoder import DeviceExactEncoder
    from linne_tpu.exact.encoder import ExactEncoder

    import jax

    spb = 10240
    tlen = tblocks * spb
    sig = make_signal(tlen * ntracks)
    tracks = [[sig[0, i * tlen : (i + 1) * tlen],
               sig[1, i * tlen : (i + 1) * tlen]] for i in range(ntracks)]
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=7, ch_process_method=1)
    rows = ntracks * tblocks * 2
    print(json.dumps({"stage": "start", "device": str(jax.devices()[0]),
                      "chunk": CHUNK, "ntracks": ntracks,
                      "tblocks": tblocks, "rows": rows}), flush=True)

    t0 = time.perf_counter()
    refs = []
    for tr in tracks:
        h = ExactEncoder()
        h.set_encode_parameter(param)
        refs.append(h.encode_whole(tr, tlen))
    host_s = time.perf_counter() - t0

    d = DeviceExactEncoder()
    d.set_encode_parameter(param)
    t0 = time.perf_counter()
    outs = d.encode_many(tracks, [tlen] * ntracks)
    first_s = time.perf_counter() - t0
    identical = outs == refs
    best = float("inf")
    for _ in range(2):
        d2 = DeviceExactEncoder()
        d2.set_encode_parameter(param)
        t0 = time.perf_counter()
        outs2 = d2.encode_many(tracks, [tlen] * ntracks)
        best = min(best, time.perf_counter() - t0)
        identical = identical and outs2 == refs
    audio_s = ntracks * tlen / 44100
    print(json.dumps({
        "stage": "corpus", "byte_identical": bool(identical),
        "device_corpus_s": round(best, 3),
        "device_corpus_realtime_x": round(audio_s / best, 1),
        "first_s": round(first_s, 2),
        "host_corpus_s": round(host_s, 3),
        "host_corpus_realtime_x": round(audio_s / host_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()

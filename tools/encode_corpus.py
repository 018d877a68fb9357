#!/usr/bin/env python
"""Corpus-scale batch encoder: every full block from every track in ONE
device stream, optionally sharded over a multi-chip mesh.

This is the production entry for throughput encoding (the single-track CLI
optimizes latency): `TpuEncoder.encode_many` batches blocks across tracks so
the device always sees full batches, and `--mesh` shards those batches over
all visible devices (byte-identical output — blocks are independent).

Usage:
  python tools/encode_corpus.py CORPUS_DIR OUT_DIR [-m MODE] [--mesh]
  python tools/encode_corpus.py --selftest   # synthetic corpus, asserts
                                             # losslessness + mesh equality
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from linne_tpu.codec.encoder import TpuEncoder  # noqa: E402
from linne_tpu.codec.params import EncodeParameter  # noqa: E402
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE  # noqa: E402
from linne_tpu.io.wav import read_wav, write_wav  # noqa: E402


def encode_corpus(wavs, out_dir, mode, mesh=None, batch_blocks=128):
    """Encode a list of WAV paths; returns (total_samples, total_seconds).
    Tracks are grouped by (channels, bps, rate) — each group is one
    encode_many call so full blocks batch across tracks."""
    groups = {}
    for w in wavs:
        fmt, samples = read_wav(str(w))
        key = (fmt.num_channels, fmt.bits_per_sample, fmt.sampling_rate)
        groups.setdefault(key, []).append((w, fmt, samples))

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    total_samples = 0
    total_secs = 0.0
    for (nch, bps, rate), members in groups.items():
        enc = TpuEncoder(mesh=mesh, batch_blocks=batch_blocks)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=nch, bits_per_sample=bps, sampling_rate=rate,
            preset=mode,
            ch_process_method=(CH_PROCESS_MS if nch >= 2
                               else CH_PROCESS_NONE)))
        tracks = [[m[2][c] for c in range(nch)] for m in members]
        lengths = [m[1].num_samples for m in members]
        datas = enc.encode_many(tracks, lengths)
        for (w, fmt, _), data in zip(members, datas):
            (out_dir / (w.stem + ".lnn")).write_bytes(data)
            total_samples += fmt.num_samples * nch
            total_secs += fmt.num_samples / rate
    return total_samples, total_secs


def _selftest() -> int:
    import tempfile

    import jax

    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.parallel.mesh import make_block_mesh

    rng = np.random.default_rng(0)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="linne_corpus_"))
    wavs = []
    for i in range(3):
        n = 10240 * (2 + i) + 777 * i
        sig = np.clip(rng.normal(0, 4000, (2, n)), -32768, 32767).astype(
            np.int32)
        p = tmp / f"t{i}.wav"
        write_wav(str(p), sig, 44100, 16)
        wavs.append(p)

    encode_corpus(wavs, tmp / "plain", mode=0)
    ndev = len(jax.devices())
    if ndev > 1:
        mesh = make_block_mesh(jax.devices())
        encode_corpus(wavs, tmp / "mesh", mode=0, mesh=mesh,
                      batch_blocks=max(8, ndev))
    for w in wavs:
        plain = (tmp / "plain" / (w.stem + ".lnn")).read_bytes()
        _, orig = read_wav(str(w))
        dec = Decoder().decode_whole(plain)
        assert all(np.array_equal(dec[c], orig[c]) for c in range(2)), w
        if ndev > 1:
            meshed = (tmp / "mesh" / (w.stem + ".lnn")).read_bytes()
            assert plain == meshed, f"mesh output differs for {w}"
    print(f"selftest OK ({ndev} devices)")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corpus", nargs="?", help="directory of WAV files")
    ap.add_argument("out", nargs="?", help="output directory for .lnn files")
    ap.add_argument("-m", "--mode", type=int, default=0)
    ap.add_argument("--mesh", action="store_true",
                    help="shard batches over all visible devices")
    ap.add_argument("--batch-blocks", type=int, default=128)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args(argv)

    if args.selftest:
        return _selftest()
    if not args.corpus or not args.out:
        print("corpus and out directories required", file=sys.stderr)
        return 1
    wavs = sorted(pathlib.Path(args.corpus).rglob("*.wav"))
    if not wavs:
        print("no .wav files found", file=sys.stderr)
        return 1

    mesh = None
    if args.mesh:
        import jax

        from linne_tpu.parallel.mesh import make_block_mesh

        mesh = make_block_mesh(jax.devices())
    t0 = time.perf_counter()
    nsamp, secs = encode_corpus(wavs, args.out, args.mode, mesh,
                                args.batch_blocks)
    dt = time.perf_counter() - t0
    print(f"{len(wavs)} tracks, {secs:.1f}s audio in {dt:.2f}s "
          f"({secs/dt:.1f}x realtime, {nsamp/1e6/dt:.1f} Msamples/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

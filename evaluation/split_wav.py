#!/usr/bin/env python
"""Split WAV corpora into fixed-length pieces for codec evaluation.

Equivalent of the reference's evaluation/split_wav.py (hardcoded 10 s cuts of
./data/**/*.wav into ./output), generalized with flags and using the
package's own WAV layer instead of scipy. Pieces shorter than the split
length are dropped, like the reference's floor-division loop.

Usage: python evaluation/split_wav.py --data ./data --out ./output \
           --seconds 10
"""

from __future__ import annotations

import argparse
import glob
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from linne_tpu.io.wav import read_wav, write_wav  # noqa: E402


def split_file(path: str, data_root: str, out_root: str, seconds: float) -> int:
    fmt, samples = read_wav(path)  # samples: [ch, n]
    split = int(seconds * fmt.sampling_rate)
    base = os.path.splitext(os.path.relpath(path, data_root))[0]
    count = fmt.num_samples // split
    for div in range(count):
        out_path = os.path.join(out_root, f"{base}_{div:03d}.wav")
        pathlib.Path(os.path.dirname(out_path)).mkdir(
            parents=True, exist_ok=True)
        write_wav(out_path, samples[:, div * split : (div + 1) * split],
                  fmt.sampling_rate, fmt.bits_per_sample)
    return count


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="./data", help="corpus root directory")
    p.add_argument("--out", default="./output", help="output directory")
    p.add_argument("--seconds", type=float, default=10.0,
                   help="piece length in seconds")
    args = p.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.data, "**", "*.wav"),
                             recursive=True))
    if not files:
        print(f"no .wav files under {args.data}", file=sys.stderr)
        return 1
    total = 0
    for f in files:
        total += split_file(f, args.data, args.out, args.seconds)
    print(f"wrote {total} pieces from {len(files)} files to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Scatter plots of codec speed vs compression rate.

Equivalent of the reference's plot generator
(reference: evaluation/plot_performance_graph.py): reads
`codec_comparison_summary.csv` (written by evaluate_codecs.py) and renders
encode-time-vs-compression and decode-time-vs-compression scatter PDFs.

Usage: python evaluation/plot_performance_graph.py [CSV] [--out DIR]
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import sys


def _read_summary(path):
    sections = {}
    with open(path) as f:
        rows = list(csv.reader(f))
    i = 0
    while i < len(rows):
        name = rows[i][0]
        header = rows[i + 1][1:]
        data = {}
        j = i + 2
        while j < len(rows) and len(rows[j]) > 1:
            data[rows[j][0]] = [float(v) if v else float("nan")
                                for v in rows[j][1:]]
            j += 1
        sections[name] = (header, data)
        i = j
    return sections


def main():
    ap = argparse.ArgumentParser()
    default_csv = pathlib.Path(__file__).parent / "codec_comparison_summary.csv"
    ap.add_argument("csv", nargs="?", default=str(default_csv))
    ap.add_argument("--out", default=str(pathlib.Path(__file__).parent))
    args = ap.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; skipping plots", file=sys.stderr)
        return 0

    sections = _read_summary(args.csv)
    codecs, sizes = sections["size_pct"]
    out_dir = pathlib.Path(args.out)

    for metric, fname in (("encode_pct", "encodetime_vs_compressionrate.pdf"),
                          ("decode_pct", "decodetime_vs_compressionrate.pdf")):
        _, times = sections[metric]
        fig, ax = plt.subplots(figsize=(7, 5))
        for k, codec in enumerate(codecs):
            ax.scatter(times["total"][k], sizes["total"][k], label=codec)
            ax.annotate(codec, (times["total"][k], sizes["total"][k]),
                        fontsize=7, xytext=(3, 3),
                        textcoords="offset points")
        ax.set_xlabel(f"{metric.replace('_pct','')} time (% of realtime)")
        ax.set_ylabel("compressed size (% of original)")
        ax.set_xscale("log")
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(out_dir / fname)
        print(f"wrote {out_dir / fname}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

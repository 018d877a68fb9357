#!/usr/bin/env python
"""Codec comparison harness.

Functional equivalent of the reference's evaluation pipeline
(reference: evaluation/evaluate_codecs.py): encodes a corpus of WAV files
with each configured codec, recording encode/decode wall time as a percent
of track realtime duration and compressed size as a percent of the original,
then writes `codec_comparison_summary.csv` grouped by corpus subdirectory
(genre). Every codec result is verified lossless before being recorded.

Codecs compared (auto-detected):
- linne_tpu modes 0/4/7 (batched TPU path; --exact for the oracle encoder)
- the reference C `linne` CLI (if built at .refbuild/linne) modes 0/4/7
- flac / wavpack / tta (if the binaries exist on PATH)

Usage:
  python evaluation/evaluate_codecs.py CORPUS_DIR [--out DIR]
  python evaluation/evaluate_codecs.py --synthetic  # no corpus needed
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from linne_tpu.codec.decoder import Decoder  # noqa: E402
from linne_tpu.codec.encoder import TpuEncoder  # noqa: E402
from linne_tpu.codec.params import EncodeParameter  # noqa: E402
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE  # noqa: E402
from linne_tpu.io.wav import read_wav, write_wav  # noqa: E402


class CodecResult:
    __slots__ = ("encode_pct", "decode_pct", "size_pct")

    def __init__(self, encode_pct, decode_pct, size_pct):
        self.encode_pct = encode_pct
        self.decode_pct = decode_pct
        self.size_pct = size_pct


class _PythonCodec:
    """Shared harness for the in-process codecs. The timed regions mirror
    what the CLI rows measure (WAV read + encode + compressed-file write;
    compressed-file read + decode + WAV write) so the comparison against
    binaries timed via subprocess is apples-to-apples. The one remaining
    asymmetry — the C rows include ~5 ms of process spawn per run, ours
    exclude interpreter startup — is small and favors the C side of the
    published ratios."""

    def _param_for(self, fmt) -> EncodeParameter:
        return EncodeParameter(
            num_channels=fmt.num_channels,
            bits_per_sample=fmt.bits_per_sample,
            sampling_rate=fmt.sampling_rate,
            preset=self.mode,
            enable_learning=self.learning,
            num_afmethod_iterations=self.af_iters,
            ch_process_method=(CH_PROCESS_MS if fmt.num_channels >= 2
                               else CH_PROCESS_NONE))

    def _encoder_for(self, fmt):
        raise NotImplementedError

    def run(self, wav_path: pathlib.Path, workdir: pathlib.Path) -> CodecResult:
        fmt0, samples0 = read_wav(str(wav_path))
        duration = fmt0.num_samples / fmt0.sampling_rate
        self._warmup(fmt0)
        comp = workdir / "out.lnn"
        resto = workdir / "resto.wav"
        # best-of-N: the tunnel's RPC throughput swings up to 5x between
        # minutes (docs/PROFILE_r2.md), so a single sample measures weather
        enc_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            # encoder construction is inside the timed region: for the
            # exact path a fresh encoder per run mirrors the C CLI's fresh
            # process (cheap); the TPU path reuses a warm compiled encoder
            # (the persistent jit cache is its production story)
            enc = self._encoder_for(fmt0)
            fmt, samples = read_wav(str(wav_path))
            data = enc.encode_whole(list(samples), fmt.num_samples)
            comp.write_bytes(data)
            enc_t = min(enc_t, time.perf_counter() - t0)
        dec_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            decoded = Decoder().decode_whole(comp.read_bytes())
            write_wav(str(resto), np.stack(decoded), fmt0.sampling_rate,
                      fmt0.bits_per_sample)
            dec_t = min(dec_t, time.perf_counter() - t0)
        _, restored = read_wav(str(resto))
        assert np.array_equal(restored, np.stack(samples0)), "not lossless!"
        orig = wav_path.stat().st_size
        return CodecResult(100 * enc_t / duration, 100 * dec_t / duration,
                           100 * comp.stat().st_size / orig)

    def _warmup(self, fmt) -> None:
        pass


class LinneTpuCodec(_PythonCodec):
    def __init__(self, mode: int, learning: bool = False, af_iters: int = 0):
        suffix = (" -l" if learning else "") + (
            f" -a {af_iters}" if af_iters else "")
        self.name = f"linne_tpu -m {mode}{suffix}"
        self.mode = mode
        self.learning = learning
        self.af_iters = af_iters
        self._encoders = {}

    def _warmup(self, fmt) -> None:
        # compile outside the timed region (persistent jit cache)
        if self._key(fmt) not in self._encoders:
            enc = TpuEncoder()
            enc.set_encode_parameter(self._param_for(fmt))
            warm = np.zeros((fmt.num_channels, fmt.num_samples), np.int32)
            enc.encode_whole(list(warm), fmt.num_samples)
            self._encoders[self._key(fmt)] = enc

    @staticmethod
    def _key(fmt):
        return (fmt.num_channels, fmt.bits_per_sample, fmt.sampling_rate,
                fmt.num_samples)

    def _encoder_for(self, fmt):
        return self._encoders[self._key(fmt)]


class ExactCodec(_PythonCodec):
    """The jax-free host path: ExactEncoder (byte-identical with the C
    binary) + the native whole-stream decoder — the no-accelerator
    deployment. A fresh encoder per timed run mirrors the C CLI's fresh
    process (the analysis arena's stale-scratch state is part of the
    byte-exactness contract)."""

    def __init__(self, mode: int, learning: bool = False, af_iters: int = 0):
        suffix = (" -l" if learning else "") + (
            f" -a {af_iters}" if af_iters else "")
        self.name = f"linne_tpu --exact -m {mode}{suffix}"
        self.mode = mode
        self.learning = learning
        self.af_iters = af_iters

    def _encoder_for(self, fmt):
        from linne_tpu.exact.encoder import ExactEncoder

        enc = ExactEncoder()
        enc.set_encode_parameter(self._param_for(fmt))
        return enc


class CliCodec:
    """Shells out to an external codec binary (reference linne, flac, ...)."""

    def __init__(self, name, enc_cmd, dec_cmd, ext):
        self.name = name
        self.enc_cmd = enc_cmd
        self.dec_cmd = dec_cmd
        self.ext = ext

    def run(self, wav_path, workdir) -> CodecResult:
        fmt, samples = read_wav(str(wav_path))
        duration = fmt.num_samples / fmt.sampling_rate
        comp = workdir / ("out" + self.ext)
        resto = workdir / "resto.wav"
        for f in (comp, resto):
            if f.exists():
                f.unlink()
        cmd = [c.format(inp=str(wav_path), out=str(comp)) for c in self.enc_cmd]
        enc_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run(cmd, check=True, capture_output=True)
            enc_t = min(enc_t, time.perf_counter() - t0)
        cmd = [c.format(inp=str(comp), out=str(resto)) for c in self.dec_cmd]
        dec_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run(cmd, check=True, capture_output=True)
            dec_t = min(dec_t, time.perf_counter() - t0)
        _, restored = read_wav(str(resto))
        assert np.array_equal(restored, samples), f"{self.name}: not lossless"
        return CodecResult(100 * enc_t / duration, 100 * dec_t / duration,
                           100 * comp.stat().st_size / wav_path.stat().st_size)


def build_codecs(args):
    if getattr(args, "exact_rows", False):
        # host-only sweep (no accelerator in the loop): the byte-identical
        # oracle encoder vs the C binary with the same flags
        codecs = [ExactCodec(m) for m in args.modes]
        codecs += [ExactCodec(0, learning=True), ExactCodec(0, af_iters=3),
                   ExactCodec(7, learning=True), ExactCodec(7, af_iters=3)]
    else:
        codecs = [LinneTpuCodec(m) for m in args.modes]
    ref = REPO / ".refbuild" / "linne"
    if getattr(args, "learning_rows", False):
        # quantify the TPU path's -l/-a numerical deviation (true jax.grad
        # trainer vs the reference's 1/npu-scaled backward; float32 AF
        # refits) as size_pct deltas against the C CLI with the same flags.
        # Modes 4 and 7 cover the deepest structures (orders 64/128), where
        # the float deviation is largest (VERDICT r3 item 4).
        for m in (0, 4, 7):
            codecs.append(LinneTpuCodec(m, learning=True))
            codecs.append(LinneTpuCodec(m, af_iters=3))
    if ref.is_file():
        for m in args.modes:
            codecs.append(CliCodec(
                f"linne(C) -m {m}",
                [str(ref), "-e", "-m", str(m), "{inp}", "{out}"],
                [str(ref), "-d", "{inp}", "{out}"], ".lnn"))
        if getattr(args, "learning_rows", False) or getattr(
                args, "exact_rows", False):
            flag_modes = ([0, 7] if getattr(args, "exact_rows", False)
                          else [0, 4, 7])
            for m in flag_modes:
                codecs.append(CliCodec(
                    f"linne(C) -m {m} -l",
                    [str(ref), "-e", "-m", str(m), "-l", "{inp}", "{out}"],
                    [str(ref), "-d", "{inp}", "{out}"], ".lnn"))
                codecs.append(CliCodec(
                    f"linne(C) -m {m} -a 3",
                    [str(ref), "-e", "-m", str(m), "-a", "3", "{inp}",
                     "{out}"],
                    [str(ref), "-d", "{inp}", "{out}"], ".lnn"))
    if shutil.which("flac"):
        codecs.append(CliCodec(
            "flac -8", ["flac", "-8", "-f", "-s", "-o", "{out}", "{inp}"],
            ["flac", "-d", "-f", "-s", "-o", "{out}", "{inp}"], ".flac"))
    if shutil.which("wavpack"):
        codecs.append(CliCodec(
            "wavpack -hh", ["wavpack", "-hh", "-y", "{inp}", "-o", "{out}"],
            ["wvunpack", "-y", "{inp}", "-o", "{out}"], ".wv"))
    return codecs


def run_parity_grid(wavs, workdir: pathlib.Path, out_dir: pathlib.Path) -> int:
    """Full flag-grid compression parity vs the same-box C binary:
    8 modes x {plain, -l, -a 3} per track on the fast (TPU) path. Emits
    parity_grid.csv with per-cell size percentages for both
    implementations, the delta in percentage points, and a lossless
    column (asserted by decode + compare, never assumed). Timing is NOT
    this artifact's claim — bench.py measures performance; this pins size
    parity for the whole flag surface (reference:
    evaluation/codec_comparison_summery.csv pins the C side's numbers).
    """
    ref = REPO / ".refbuild" / "linne"
    if not ref.is_file():
        print("reference C binary missing (.refbuild/linne)", file=sys.stderr)
        return 1
    flagsets = [("plain", [], {}), ("-l", ["-l"], {"learning": True}),
                ("-a 3", ["-a", "3"], {"af_iters": 3})]
    codecs = {(m, f): LinneTpuCodec(m, **kw)
              for m in range(8) for (f, _c, kw) in flagsets}
    out_rows = []
    path = out_dir / "parity_grid.csv"
    # stream rows to disk as they finish: a full grid is hours of encodes
    # and a late crash must not discard the completed cells
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["track", "mode", "flags", "size_pct_tpu", "size_pct_c",
                    "delta_pp", "lossless"])
        for wav in wavs:
            fmt, samples = read_wav(str(wav))
            orig = wav.stat().st_size
            for mode in range(8):
                for fname, cflags, _kw in flagsets:
                    codec = codecs[(mode, fname)]
                    codec._warmup(fmt)
                    enc = codec._encoder_for(fmt)
                    data = enc.encode_whole(list(samples), fmt.num_samples)
                    decoded = Decoder().decode_whole(data)
                    lossless = all(
                        np.array_equal(decoded[c], samples[c])
                        for c in range(fmt.num_channels))
                    size_t = 100.0 * len(data) / orig
                    comp = workdir / "grid.lnn"
                    subprocess.run(
                        [str(ref), "-e", "-m", str(mode), *cflags,
                         str(wav), str(comp)],
                        check=True, capture_output=True)
                    size_c = 100.0 * comp.stat().st_size / orig
                    delta = size_t - size_c
                    row = [wav.name, mode, fname, round(size_t, 4),
                           round(size_c, 4), round(delta, 4), lossless]
                    out_rows.append(row)
                    w.writerow(row)
                    f.flush()
                    print(f"{wav.name:16s} m{mode} {fname:5s} "
                          f"ours {size_t:7.3f}%  C {size_c:7.3f}%  "
                          f"d {delta:+8.4f}pp  lossless={lossless}",
                          flush=True)
    # speech16 is the known chaotic clip: the C binary swings tens of pp
    # against ITSELF across flag sets on it (docs/PROFILE_r4.md), so its
    # cells measure fit-landscape chaos, not implementation deviation
    deltas = [abs(r[5]) for r in out_rows if not str(r[0]).startswith(
        "speech16")]
    assert all(r[6] for r in out_rows), "lossless failure in grid"
    print(f"wrote {path}")
    print(f"max |delta| excluding speech16: {max(deltas):.4f} pp "
          f"over {len(deltas)} cells")
    return 0


def synth_corpus(root: pathlib.Path):
    """Deterministic synthetic mini-corpus in reference genre layout."""
    rng = np.random.default_rng(7)
    rate = 44100
    n = rate * 10
    t = np.arange(n) / rate

    def tone_mix(freqs, noise):
        x = sum(8000 / (i + 1) * np.sin(2 * np.pi * f * t)
                for i, f in enumerate(freqs))
        x = x + noise * rng.normal(0, 1, n)
        return x

    # beyond tone mixes: percussive transients, formant-swept "vocal"
    # material, and quiet passages make compression parity harder to game
    # with tonal synthetics (RWC, the reference's corpus, is not available
    # in this environment)
    env = np.exp(-np.mod(t, 0.5) * 18.0)  # 120 BPM decaying hits
    percussive = (6000 * env * rng.normal(0, 1, n)
                  + 9000 * env * np.sin(2 * np.pi * 55 * t))
    formant = np.sin(2 * np.pi * (3 + 0.5 * np.sin(2 * np.pi * 0.3 * t)) * t)
    vocal = (7000 * np.sin(2 * np.pi * 155 * t + 4 * formant)
             * (0.6 + 0.4 * np.sin(2 * np.pi * 2.1 * t))
             + 90 * rng.normal(0, 1, n))
    quiet = (500 * np.sin(2 * np.pi * 196 * t)
             + 300 * np.sin(2 * np.pi * 294 * t)
             + 25 * rng.normal(0, 1, n))
    corpus = {
        "classic": tone_mix([262, 330, 392, 523], 50),
        "jazz": tone_mix([220, 277, 370, 440, 554], 200),
        "popular": tone_mix([110, 220, 440, 880], 800),
        "percussive": percussive,
        "vocal": vocal,
        "quiet": quiet,
    }
    for genre, mono in corpus.items():
        d = root / genre
        d.mkdir(parents=True, exist_ok=True)
        left = np.clip(np.round(mono), -32768, 32767)
        right = np.clip(np.round(0.9 * mono + 30 * rng.normal(0, 1, n)),
                        -32768, 32767)
        write_wav(str(d / "track01.wav"),
                  np.stack([left, right]).astype(np.int32), rate, 16)


def recorded_corpus(root: pathlib.Path) -> int:
    """Real recorded material available on this machine (best effort).

    RWC (the reference's corpus) has no offline substitute here, but a
    dozen genuinely recorded fixtures ship with installed packages (speech,
    plucked strings, percussive foley, a music loop); they make the
    compression-parity claim harder to game with tonal synthetics. Nothing
    is committed to the repo — tracks are materialized at eval time from
    their source packages and skipped when absent.
    """
    d = root / "recorded"
    d.mkdir(parents=True, exist_ok=True)
    count = 0

    pygame_data = pathlib.Path(
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data")
    py311 = pathlib.Path("/mnt/sandboxing/model_tools_env/v1/python/"
                         "install/lib/python3.11")

    # straight PCM WAV fixtures, re-materialized through our own reader so
    # a bad container can't leak into the corpus
    fixtures = [
        # 5 s speech, 8-bit/48k mono (reference wav-parser fixture)
        ("voice8", pathlib.Path("/root/reference/test/wav/a.wav"), None),
        # plucked-string recording at three depths, 2ch (CPython test data)
        ("pluck8", py311 / "test/audiodata/pluck-pcm8.wav", None),
        ("pluck16", py311 / "test/audiodata/pluck-pcm16.wav", None),
        ("pluck24", py311 / "test/audiodata/pluck-pcm24.wav", None),
        ("pluck32to24", py311 / "test/audiodata/pluck-pcm32.wav", 24),
        # 0.5 s speech, 16-bit/44.1k mono (IPython test fixture)
        ("speech16", py311 / "site-packages/IPython/lib/tests/test.wav",
         None),
        # percussive foley + a 7 s music loop, 8-bit/11k mono (pygame)
        ("car_door8", pygame_data / "car_door.wav", None),
        ("boom8", pygame_data / "boom.wav", None),
        ("whiff8", pygame_data / "whiff.wav", None),
        ("punch8", pygame_data / "punch.wav", None),
        ("house8", pygame_data / "house_lo.wav", None),
    ]
    for name, src, to_bps in fixtures:
        if not src.is_file():
            continue
        try:
            fmt, samples = read_wav(str(src))
            bps = fmt.bits_per_sample
            if to_bps is not None and to_bps < bps:
                samples = [ch >> (bps - to_bps) for ch in samples]
                bps = to_bps
            write_wav(str(d / f"{name}.wav"), samples, fmt.sampling_rate,
                      bps)
            count += 1
        except Exception:
            pass

    # the same music loop as 16-bit STEREO via pygame's ogg decoder (the
    # only stereo >8-bit recording reachable offline)
    helper = (
        "import pygame,numpy as np,sys\n"
        "pygame.mixer.pre_init(frequency=22050,size=-16,channels=2)\n"
        "pygame.mixer.init()\n"
        "a = pygame.sndarray.array(pygame.mixer.Sound(sys.argv[1]))\n"
        "np.save(sys.argv[2], a.T.astype(np.int32))\n")
    ogg = pygame_data / "house_lo.ogg"
    if ogg.is_file() and pathlib.Path("/opt/venv/bin/python").is_file():
        import os
        pcm = d / "house_pcm.npy"
        r = subprocess.run(
            ["/opt/venv/bin/python", "-c", helper, str(ogg), str(pcm)],
            capture_output=True, env={**os.environ,
                                      "SDL_AUDIODRIVER": "dummy"})
        if r.returncode == 0 and pcm.is_file():
            arr = np.load(pcm)
            pcm.unlink()
            write_wav(str(d / "house16.wav"), arr, 22050, 16)
            count += 1

    if not count:
        d.rmdir()
    return count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus", nargs="?", help="directory of genre/WAV files")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--modes", type=int, nargs="+", default=[0, 4, 7])
    ap.add_argument("--learning-rows", action="store_true",
                    help="add -m {0,4,7} -l and -a 3 rows (ours + C) to "
                         "quantify the TPU path's learning/AF deviation")
    ap.add_argument("--exact-rows", action="store_true",
                    help="benchmark the jax-free ExactEncoder host path "
                         "(plus -l/-a rows) against the C CLI instead of "
                         "the TPU path; writes exact_host_comparison.csv")
    ap.add_argument("--parity-grid", action="store_true",
                    help="size-parity grid: all 8 modes x {plain, -l, "
                         "-a 3} per track, fast path vs the C binary; "
                         "writes parity_grid.csv")
    ap.add_argument("--out", default=str(REPO / "evaluation"))
    ap.add_argument("--repeat", type=int, default=1,
                    help="full sweeps; per-cell min of the time metrics "
                         "(the TPU tunnel's throughput swings several-fold "
                         "between minutes — docs/PROFILE_r2.md — so one "
                         "sweep measures the weather, not the codec)")
    args = ap.parse_args()

    workdir = pathlib.Path(tempfile.mkdtemp(prefix="linne_eval_"))
    if args.synthetic or not args.corpus:
        corpus_dir = workdir / "corpus"
        synth_corpus(corpus_dir)
        n_rec = recorded_corpus(corpus_dir)
        if n_rec:
            print(f"recorded genre: {n_rec} real tracks", file=sys.stderr)
    else:
        corpus_dir = pathlib.Path(args.corpus)

    wavs = sorted(corpus_dir.rglob("*.wav"))
    if not wavs:
        print("no wav files found", file=sys.stderr)
        return 1
    if args.parity_grid:
        out_dir = pathlib.Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        return run_parity_grid(wavs, workdir, out_dir)
    codecs = build_codecs(args)

    best = {}  # (codec, genre, wav) -> CodecResult with per-cell min times
    for sweep in range(max(1, args.repeat)):
        for wav in wavs:
            genre = wav.parent.name
            for codec in codecs:
                r = codec.run(wav, workdir)
                key = (codec.name, genre, str(wav))
                prev = best.get(key)
                if prev is not None:
                    r = CodecResult(min(r.encode_pct, prev.encode_pct),
                                    min(r.decode_pct, prev.decode_pct),
                                    r.size_pct)
                best[key] = r
                print(f"{wav.name:20s} {codec.name:18s} "
                      f"enc {r.encode_pct:7.3f}%  dec {r.decode_pct:7.3f}%  "
                      f"size {r.size_pct:6.2f}%", flush=True)
    rows = defaultdict(lambda: defaultdict(list))
    for (cname, genre, _wav), r in best.items():
        rows[cname][genre].append(r)

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if getattr(args, "exact_rows", False):
        out_name = "exact_host_comparison.csv"
    elif getattr(args, "learning_rows", False):
        # keep the canonical 3-mode summary intact; learning/AF parity
        # rows are a separate committed artifact
        out_name = "learning_rows_comparison.csv"
    else:
        out_name = "codec_comparison_summary.csv"
    out_path = out_dir / out_name
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        genres = sorted({g for c in rows.values() for g in c})
        for metric in ("encode_pct", "decode_pct", "size_pct"):
            w.writerow([metric])
            w.writerow(["genre"] + [c for c in rows])
            for g in genres + ["total"]:
                line = [g]
                for cname in rows:
                    if g == "total":
                        vals = [getattr(r, metric)
                                for rs in rows[cname].values() for r in rs]
                    else:
                        vals = [getattr(r, metric)
                                for r in rows[cname].get(g, [])]
                    line.append(round(float(np.mean(vals)), 4) if vals else "")
                w.writerow(line)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

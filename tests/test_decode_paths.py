"""Decoder-path equivalence: host (native), batched TPU/XLA, streaming."""

import pathlib

import numpy as np
import pytest

from conftest import WAVEFORMS

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import DecoderConfig, EncodeParameter
from linne_tpu.codec.streaming import StreamingDecoder
from linne_tpu.codec.tpu_decoder import TpuDecoder
from linne_tpu.constants import CH_PROCESS_MS


@pytest.fixture(scope="module")
def encoded():
    samples = WAVEFORMS["gauss"](10240 * 2 + 3333, 2, 16)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=2, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([samples[0], samples[1]], samples.shape[1])
    return samples, data


def test_host_decoder(encoded):
    samples, data = encoded
    out = Decoder().decode_whole(data)
    assert all(np.array_equal(out[c], samples[c]) for c in range(2))


def test_tpu_batch_decoder(encoded):
    samples, data = encoded
    out = TpuDecoder().decode_whole(data)
    assert all(np.array_equal(out[c], samples[c]) for c in range(2))


def test_streaming_decoder(encoded):
    samples, data = encoded
    sd = StreamingDecoder(data)
    chunks = []
    while not sd.exhausted:
        chunk = sd.read(1000)
        if chunk.shape[1] == 0:
            break
        chunks.append(chunk)
    out = np.concatenate(chunks, axis=1)
    assert np.array_equal(out, samples)


def test_streaming_decoder_tiny_reads(encoded):
    samples, data = encoded
    sd = StreamingDecoder(data)
    out = sd.read(17)
    assert np.array_equal(out, samples[:, :17])
    out2 = sd.read(10240 * 2)
    assert np.array_equal(out2, samples[:, 17 : 17 + 10240 * 2])


def test_crc_check_flag(encoded):
    _samples, data = encoded
    corrupted = bytearray(data)
    corrupted[len(corrupted) // 2] ^= 0xFF
    from linne_tpu.format.block import CorruptionError
    from linne_tpu.format.header import FormatError

    with pytest.raises((CorruptionError, FormatError)):
        Decoder(DecoderConfig(check_crc=True)).decode_whole(bytes(corrupted))


def test_synthesize_rows_xla_wraparound_adversarial():
    """The XLA synthesis fallback must keep int32 two's-complement
    wraparound (jnp.sum would promote to an int64 accumulator under
    jax_enable_x64): adversarial magnitudes vs the native C++ synth."""
    import jax.numpy as jnp

    from linne_tpu import native
    from linne_tpu.ops.synthesis import synthesize_rows_xla

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    rows, ns, npu = 4, 256, 32
    x = rng.integers(-30000, 30000, (rows, ns)).astype(np.int32)
    c = rng.integers(-(1 << 14), 1 << 14, (rows, npu)).astype(np.int32)
    rs = rng.integers(8, 15, rows).astype(np.int32)
    truth = np.empty_like(x)
    for r in range(rows):
        plane = x[r : r + 1].copy()
        native.lib().linne_synthesize_block(
            plane, np.ascontiguousarray(c[r : r + 1]),
            np.zeros((1, 1), np.int32),
            np.full((1, 1), rs[r], np.int32),
            np.zeros((1, 2), np.int32), np.zeros((1, 2), np.int32),
            1, ns, 1, np.asarray([npu], np.int32), 2, 0)
        truth[r] = plane[0]
    out = np.asarray(synthesize_rows_xla(
        jnp.asarray(x), jnp.asarray(c), jnp.asarray(rs)))
    assert np.array_equal(out, truth)


def test_decode_path_is_jax_free():
    """Decode-only deployments (the reference's `linnedec` target,
    CMakeLists.txt:5-29) need only numpy + the native library: importing the
    decoder, streaming/player, and CLI must not pull jax."""
    import os
    import subprocess
    import sys

    code = (
        "import sys; "
        f"sys.path.insert(0, {str(REPO_ROOT)!r}); "
        "import linne_tpu.codec.decoder, linne_tpu.codec.streaming, "
        "linne_tpu.player, linne_tpu.cli; "
        "assert 'jax' not in sys.modules, 'decode path imported jax'; "
        "print('ok')")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "PYTHONSTARTUP")}  # no sitecustomize
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"


def test_windowed_decode_mixed_block_types():
    """The native stream decoder groups compress blocks into 4-block
    synthesis windows; raw (type 2) and silent (type 1) blocks are skipped
    before slot registration. Build a stream whose windows interleave all
    three types (tone -> compress, full-range uniform noise -> raw,
    zeros -> silent) and pin losslessness plus the presence of every type
    on the wire, serial and threaded."""
    from linne_tpu.constants import HEADER_SIZE
    from linne_tpu.exact.encoder import ExactEncoder

    spb = 4096
    rng = np.random.default_rng(5)
    t = np.arange(spb)
    tone = np.round(6000 * np.sin(2 * np.pi * 330 * t / 44100)).astype(
        np.int32)
    noise = rng.integers(-32768, 32768, size=spb).astype(np.int32)
    silent = np.zeros(spb, np.int32)
    # two full windows + a partial one, each mixing types
    seq = [tone, noise, silent, tone, noise, tone, silent, noise, tone + 7]
    left = np.concatenate(seq)
    right = np.concatenate(seq[::-1])
    n = left.shape[0]

    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=2, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([left, right], n)

    # wire scan: all three block types must actually be present
    types = set()
    pos = HEADER_SIZE
    while pos < len(data):
        bsize = int.from_bytes(data[pos + 2: pos + 6], "big")
        types.add(data[pos + 8])
        pos += bsize + 6
    assert types == {0, 1, 2}, f"stream lacks a type: {types}"

    for nthr in (1, 3):
        out = Decoder(DecoderConfig(num_threads=nthr)).decode_whole(data)
        assert np.array_equal(out[0], left) and np.array_equal(out[1], right)


def test_threaded_stream_decode_matches_serial(encoded):
    """The native stream decoder's worker pool (blocks are independent)
    must produce identical output at any thread count — exercised with
    more workers than cores so the pool path runs even on 1-CPU hosts."""
    samples, data = encoded
    serial = Decoder(DecoderConfig(num_threads=1)).decode_whole(data)
    for nthr in (2, 4, 8):
        threaded = Decoder(DecoderConfig(num_threads=nthr)).decode_whole(data)
        for c in range(2):
            assert np.array_equal(serial[c], threaded[c]), (nthr, c)


def test_threaded_decode_error_propagation():
    """A corrupt block must surface as a clean error from worker threads."""
    from linne_tpu.format.block import CorruptionError

    samples = WAVEFORMS["gauss"](10240 * 4, 2, 16)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=0, ch_process_method=CH_PROCESS_MS))
    data = bytearray(enc.encode_whole([samples[0], samples[1]],
                                      samples.shape[1]))
    data[len(data) // 2] ^= 0xFF  # corrupt a payload byte mid-stream
    with pytest.raises(CorruptionError):
        Decoder(DecoderConfig(num_threads=8)).decode_whole(bytes(data))


def test_tpu_batch_decoder_mono_tail():
    """Device-cascade decode of a mono stream with a tail block (two
    block-length classes, single channel)."""
    rng = np.random.default_rng(1)
    n = 10240 * 2 + 555
    sig = np.clip(rng.normal(0, 3000, (1, n)), -32768, 32767).astype(np.int32)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=1, bits_per_sample=16, sampling_rate=44100,
        preset=5, ch_process_method=0))
    data = enc.encode_whole([sig[0]], n)
    out = TpuDecoder().decode_whole(data)
    assert np.array_equal(out[0], sig[0])


def test_tpu_decoder_decode_many_mixed_corpus():
    """decode_many pools reconstruction rows of a whole corpus into shared
    device launches, grouped by (preset, channels); a mixed corpus — two
    presets, stereo + mono, tails, a silent track — must decode losslessly
    with per-stream results in order."""
    from conftest import WAVEFORMS
    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.constants import CH_PROCESS_NONE

    specs = [
        ("gauss", 2, 2, 2560 * 2 + 500),
        ("chirp", 2, 2, 2560),
        ("sine", 0, 1, 2560 * 2),
        ("silence", 2, 2, 2560 + 100),
        ("gauss", 0, 2, 2560 * 3),
    ]
    corpus = []
    signals = []
    for wf, preset, ch, n in specs:
        sig = WAVEFORMS[wf](n, ch, 16)
        enc = TpuEncoder(batch_blocks=4)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=ch, bits_per_sample=16, sampling_rate=44100,
            num_samples_per_block=2560, preset=preset,
            ch_process_method=CH_PROCESS_MS if ch >= 2 else CH_PROCESS_NONE))
        corpus.append(enc.encode_whole([sig[c] for c in range(ch)], n))
        signals.append(sig)
    outs = TpuDecoder().decode_many(corpus)
    for (wf, preset, ch, n), sig, out in zip(specs, signals, outs):
        for c in range(ch):
            assert np.array_equal(out[c], sig[c]), (wf, preset, ch, c)


def test_tpu_decoder_wide_row_fallback(monkeypatch, encoded):
    """Force every reconstruction row past the packed download width: the
    flag column + int32 re-fetch path must reproduce the exact samples."""
    import linne_tpu.codec.tpu_decoder as td

    samples, data = encoded
    monkeypatch.setattr(td, "_download_width", lambda bps: 6)
    out = TpuDecoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(out[c], samples[c])


def test_native_synthesis_vs_plain_oracle_shape_sweep():
    """The native cascade pairs same-shape unit recurrences across units
    AND channels (layer-major dispatch); sweep random (orders, per-channel
    unit splits, nch) combos — including mixed splits and odd task counts —
    against a straight python recurrence oracle."""
    from linne_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)

    def wrap32(v):
        return (v + (1 << 31)) % (1 << 32) - (1 << 31)

    def oracle_layer(d, coef, npu, rshift, num_units):
        n = d.shape[0]
        ns = n // num_units
        if ns <= npu:
            return
        half = 1 << (rshift - 1) if rshift >= 1 else 0
        for u in range(num_units):
            seg = d[u * ns:(u + 1) * ns]
            c = [int(x) for x in coef[u * npu:(u + 1) * npu]]
            for t in range(ns - npu):
                # int32 two's-complement wraparound exactly as the C
                # (-fwrapv) — random filters are unstable, overflow is
                # part of the contract
                pred = half
                for j in range(npu):
                    pred = wrap32(pred + wrap32(c[j] * int(seg[t + j])))
                seg[t + npu] = np.int32(
                    wrap32(int(seg[t + npu]) - (pred >> rshift)))

    for trial in range(6):
        nch = int(rng.choice([1, 2, 3, 8]))
        orders = [int(o) for o in rng.choice([2, 4, 8, 16], size=2)]
        n = 512
        nlayers = len(orders)
        total_order = sum(orders)
        data = rng.integers(-2000, 2000, (nch, n)).astype(np.int32)
        coefs = rng.integers(-120, 120, (nch, total_order)).astype(np.int32)
        # per-channel unit splits chosen independently: exercises the
        # same-split cross-channel pairing AND the mixed-split grouping
        log2u = np.empty((nch, nlayers), np.int32)
        for ch in range(nch):
            for l, o in enumerate(orders):
                log2u[ch, l] = rng.integers(0, int(np.log2(o)) + 1)
        rshifts = rng.integers(1, 14, (nch, nlayers)).astype(np.int32)

        truth = data.copy()
        for ch in range(nch):
            off = total_order
            for l in reversed(range(nlayers)):
                off -= orders[l]
                oracle_layer(truth[ch], coefs[ch][off:off + orders[l]],
                             orders[l] // (1 << log2u[ch, l]),
                             int(rshifts[ch, l]), 1 << log2u[ch, l])

        got = data.copy()
        native.lib().linne_synthesize_block(
            got, np.ascontiguousarray(coefs),
            np.ascontiguousarray(log2u), np.ascontiguousarray(rshifts),
            np.zeros((nch, 2), np.int32), np.zeros((nch, 2), np.int32),
            nch, n, nlayers, np.asarray(orders, np.int32), 2, 0)
        assert np.array_equal(got, truth), (trial, nch, orders,
                                            log2u.tolist())


def test_exact_encode_path_is_jax_free(tmp_path):
    """With the native exact helpers the --exact encoder is fast enough to
    be the no-accelerator deployment story: encoding through the CLI's
    --exact path (plus decode of the result) must not pull jax."""
    import os
    import subprocess
    import sys

    code = (
        "import sys; "
        f"sys.path.insert(0, {str(REPO_ROOT)!r}); "
        "import numpy as np; "
        "from linne_tpu.io.wav import write_wav, read_wav; "
        "from linne_tpu import cli; "
        "rng = np.random.default_rng(4); "
        "s = np.clip(rng.normal(0, 2000, (2, 23000)), -32768, 32767)"
        ".astype(np.int32); "
        "write_wav('in.wav', s, 44100, 16); "
        "cli.main(['-e', '-m', '7', '--exact', 'in.wav', 'out.lnn']); "
        "cli.main(['-d', 'out.lnn', 'rt.wav']); "
        "_, s2 = read_wav('rt.wav'); "
        "assert np.array_equal(s, s2); "
        "assert 'jax' not in sys.modules, 'exact encode path imported jax'; "
        "print('ok')")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "PYTHONSTARTUP")}  # no sitecustomize
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, env=env,
                       cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().endswith("ok")


def test_python_fallback_decode_matches_native(encoded, monkeypatch):
    """The pure-python fallback decoder (windowed Rice + chunked stale-dot
    synthesis + fused de-emphasis) must produce samples identical to the
    native whole-stream decoder on the same valid stream."""
    from linne_tpu import native

    if not native.available():
        pytest.skip("native library unavailable: nothing to compare against")
    samples, data = encoded
    want = Decoder().decode_whole(data)
    import linne_tpu.codec.decoder as D

    monkeypatch.setattr(D.native, "available", lambda: False)
    got = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(got[c], want[c])


def test_tpu_decoder_streamed_download_chunks(monkeypatch):
    """The streamed reconstruction download (row chunks pulled on a thread
    while the native unpack consumes earlier chunks) must reproduce the
    one-shot download's samples exactly — forced here with a tiny chunk so
    the pooled rows split across many pulls, including a wide (int32) row."""
    import linne_tpu.codec.tpu_decoder as td
    from linne_tpu import native
    from conftest import WAVEFORMS
    from linne_tpu.codec.encoder import TpuEncoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.constants import CH_PROCESS_MS

    if not native.available():
        import pytest as _pytest

        _pytest.skip("needs the native host library")

    n = 2560 * 3
    sig = WAVEFORMS["gauss"](n, 2, 16, seed=9)
    enc = TpuEncoder(batch_blocks=4)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2560, preset=0,
        ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([sig[0], sig[1]], n)

    monkeypatch.setattr(td, "_DL_CHUNK_ROWS", 1)
    outs = td.TpuDecoder().decode_many([data, data])
    for out in outs:
        for c in range(2):
            assert np.array_equal(out[c], sig[c])

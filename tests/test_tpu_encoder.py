"""Fast-path (batched JAX) encoder tests: losslessness, cross-decoding with
the reference binary, and compression parity with the exact path."""

import numpy as np
import pytest

from conftest import (
    WAVEFORMS,
    reference_decode,
    requires_reference,
)

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE
from linne_tpu.io.wav import read_wav, write_wav


def _encode(samples, bps, mode, ms, spb=10240):
    ch, n = samples.shape
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch, bits_per_sample=bps, sampling_rate=44100,
        num_samples_per_block=spb, preset=mode,
        ch_process_method=CH_PROCESS_MS if ms else CH_PROCESS_NONE))
    return enc.encode_whole([samples[c] for c in range(ch)], n)


_CASES = [
    ("sine", 10240, 2, 16, 0),
    ("noise", 10240, 2, 16, 0),
    ("gauss", 10240 * 2 + 1000, 2, 16, 0),
    ("gauss", 10240, 2, 16, 4),
    ("chirp", 10240, 1, 24, 7),
    ("silence", 10240, 2, 16, 0),
    ("nyquist", 10240, 2, 16, 0),
    ("const", 10240, 2, 16, 7),
    ("flipsine", 10240, 8, 16, 0),
    ("gauss", 10240, 2, 8, 0),
    ("sine", 2560 * 3 + 100, 2, 16, 5),
]


def _case_id(c):
    wf, n, ch, bps, mode = c
    return f"{wf}-n{n}-ch{ch}-b{bps}-m{mode}"


@pytest.mark.parametrize("case", _CASES, ids=_case_id)
def test_roundtrip_lossless(case):
    wf, n, ch, bps, mode = case
    samples = WAVEFORMS[wf](n, ch, bps)
    data = _encode(samples, bps, mode, ms=ch >= 2)
    decoded = Decoder().decode_whole(data)
    for c in range(ch):
        assert np.array_equal(decoded[c], samples[c]), f"channel {c}"


@requires_reference
def test_reference_decodes_fast_path(tmp_path):
    samples = WAVEFORMS["gauss"](10240 + 4096, 2, 16)
    data = _encode(samples, 16, 0, ms=True)
    lnn = tmp_path / "fast.lnn"
    lnn.write_bytes(data)
    out_wav = tmp_path / "out.wav"
    reference_decode(lnn, out_wav)
    _, decoded = read_wav(str(out_wav))
    assert np.array_equal(decoded, samples)


@requires_reference
def test_compression_close_to_reference(tmp_path):
    """Fast-path coefficients may differ in low bits; compressed size must
    stay within 0.5% of the reference encoder's."""
    from conftest import reference_encode

    rng = np.random.default_rng(5)
    n = 10240 * 3
    t = np.arange(n)
    sig = (9000 * np.sin(2 * np.pi * 220 * t / 44100)
           + rng.normal(0, 300, n)).astype(np.int32)
    samples = np.stack([sig, (sig * 0.9 + rng.normal(0, 200, n)).astype(np.int32)])
    samples = np.clip(samples, -32768, 32767).astype(np.int32)

    wav = tmp_path / "in.wav"
    write_wav(str(wav), samples, 44100, 16)
    for mode in (0, 1, 2, 3, 4, 5, 6, 7):
        lnn = tmp_path / f"ref{mode}.lnn"
        reference_encode(wav, lnn, mode=mode)
        ref_size = lnn.stat().st_size
        ours = _encode(samples, 16, mode, ms=True)
        ratio = len(ours) / ref_size
        assert 0.95 < ratio < 1.005, (
            f"mode {mode}: ours {len(ours)} vs ref {ref_size} ({ratio:.4f})")


def test_encode_block_matches_encode_whole():
    """Single-block API parity (LINNEEncoder_EncodeBlock): block-at-a-time
    encoding concatenates to the same stream as encode_whole."""
    n, spb = 10240 * 2 + 999, 10240
    samples = WAVEFORMS["gauss"](n, 2, 16)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=0,
        ch_process_method=CH_PROCESS_MS))
    whole = enc.encode_whole([samples[0], samples[1]], n)

    from linne_tpu.format.header import LinneHeader

    out = bytearray(LinneHeader(
        num_channels=2, num_samples=n, sampling_rate=44100,
        bits_per_sample=16, num_samples_per_block=spb, preset=0,
        ch_process_method=CH_PROCESS_MS).pack())
    pos = 0
    while pos < n:
        take = min(spb, n - pos)
        out += enc.encode_block(
            [samples[0][pos : pos + take], samples[1][pos : pos + take]],
            take)
        pos += take
    assert bytes(out) == whole


def test_adaptive_width_byte_invariant_and_engages():
    """The residual-plane width class only shapes the device->host
    transfer, never the emitted bytes: a quiet corpus encoded batch-by-batch
    (adapting from 14 down) must byte-match an encoder forced to start at
    the narrowest class, adapt to a narrower W after the first batch, and
    decode losslessly."""
    from linne_tpu.codec.encoder import _res_width_classes

    spb = 2560
    n = spb * 12
    t = np.arange(n)
    sig = np.round(140 * np.sin(2 * np.pi * 220 * t / 44100)
                   + 20 * np.sin(2 * np.pi * 0.013 * t)).astype(np.int32)
    s = np.stack([sig, -sig])
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=0, ch_process_method=CH_PROCESS_MS)

    enc = TpuEncoder(batch_blocks=4)
    enc.set_encode_parameter(param)
    data = enc.encode_whole([s[0], s[1]], n)
    assert spb in enc._maxw_seen
    narrowest = _res_width_classes(16)[-1]
    assert enc._pick_width(spb) < _res_width_classes(16)[0]

    forced = TpuEncoder(batch_blocks=4)
    forced.set_encode_parameter(param)
    forced._maxw_seen[spb] = 1  # start at the narrowest class immediately
    assert forced._pick_width(spb) == narrowest
    assert forced.encode_whole([s[0], s[1]], n) == data

    out = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(out[c], s[c])


def test_residual_overflow_fallback_16bit_spike():
    """A tonal 16-bit signal with a transient whose residual exceeds the
    14-bit packed plane (but not int16) must take the int32 fallback row and
    stay lossless."""
    n = 10240 + 511
    t = np.arange(n)
    sig = np.round(9000 * np.sin(2 * np.pi * 220 * t / 44100)).astype(
        np.int32)
    sig[5000] = 32000  # residual spike in (8191, 32767]
    sig[5001] = -32767
    s = np.stack([sig, -sig])
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=10240, preset=0,
        ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([s[0], s[1]], n)
    out = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(out[c], s[c])


def test_int32_overflow_residual_row_odd_length():
    """Residuals past the packed plane ride a separate int32 fallback row;
    with an odd block length the packed plane is padded to the group width —
    regression for the mismatched fallback assignment the sanitizer lane
    caught."""
    n = 2048 + 777  # odd tail
    t = np.arange(n)
    sig = np.round(4_000_000 * np.sin(2 * np.pi * 220 * t / 44100)).astype(
        np.int32)
    sig[900] = 8_000_000  # transient: residual spike > int16
    s = np.stack([sig, -sig])
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=24, sampling_rate=44100,
        num_samples_per_block=2048, preset=0, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([s[0], s[1]], n)
    out = Decoder().decode_whole(data)
    for c in range(2):
        assert np.array_equal(out[c], s[c])


def test_native_unpack_bits_matches_numpy():
    """The native residual-plane unpack (linne_unpack_bits) and the numpy
    fallback (TpuEncoder._unpack_res) must agree for every supported width
    and ragged length."""
    from linne_tpu import native
    from linne_tpu.codec.encoder import _pack_geometry

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(7)
    # encoder width classes + decoder downloads
    for width in (10, 12, 14, 18, 20, 24, 26):
        g, wpg = _pack_geometry(width)
        for n in (10240, 512, g, 1, 777):
            wpr = ((n + g - 1) // g) * wpg
            words = rng.integers(
                -2**31, 2**31 - 1, size=(3, 2, wpr), dtype=np.int64
            ).astype(np.int32)
            a = TpuEncoder._unpack_res(words, width)
            b = native.unpack_bits(words, width, a.shape[-1])
            assert np.array_equal(a, b), (width, n)


def test_tpu_encoder_no_native_fallback_byte_identical():
    """With LINNE_NO_NATIVE=1 the TpuEncoder drain takes the numpy unpack
    and the BitWriter packing path; output bytes must match the native
    path exactly."""
    import os
    import pathlib
    import subprocess
    import sys

    n = 2048 * 2 + 600
    sig = WAVEFORMS["gauss"](n, 2, 16)
    enc = TpuEncoder(batch_blocks=2)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2048, preset=1,
        ch_process_method=CH_PROCESS_MS))
    native_bytes = enc.encode_whole([sig[0], sig[1]], n)

    repo = pathlib.Path(__file__).resolve().parent.parent
    code = f"""
import sys
sys.path.insert(0, {str(repo)!r})
sys.path.insert(0, {str(repo / 'tests')!r})
import numpy as np
from conftest import WAVEFORMS
from linne_tpu import native
assert not native.available(), 'LINNE_NO_NATIVE not honored'
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.decoder import Decoder
n = {n}
sig = WAVEFORMS['gauss'](n, 2, 16)
enc = TpuEncoder(batch_blocks=2)
enc.set_encode_parameter(EncodeParameter(
    num_channels=2, bits_per_sample=16, sampling_rate=44100,
    num_samples_per_block=2048, preset=1, ch_process_method=1))
data = enc.encode_whole([sig[0], sig[1]], n)
ch = Decoder().decode_whole(data)
assert all(np.array_equal(ch[i], sig[i]) for i in range(2)), 'not lossless'
sys.stdout.buffer.write(data)
"""
    env = dict(os.environ)
    env["LINNE_NO_NATIVE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    assert r.stdout == native_bytes


def test_tail_mode_host_device_auto():
    """Tail blocks: "auto" uses the bit-exact host encoder for one-off
    tails (each distinct length otherwise compiles its own device
    pipeline), "device" forces compilation; both are lossless and
    "auto" == "host" bytes for a single-tail file."""
    n, spb = 2560 + 777, 2560
    samples = WAVEFORMS["gauss"](n, 2, 16)

    def enc_with(tail_mode):
        enc = TpuEncoder(tail_mode=tail_mode)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=44100,
            num_samples_per_block=spb, preset=0,
            ch_process_method=CH_PROCESS_MS))
        return enc, enc.encode_whole([samples[0], samples[1]], n)

    enc_auto, auto_bytes = enc_with("auto")
    assert 777 not in enc_auto._analyze_cache  # no device compile for tail
    _, host_bytes = enc_with("host")
    assert auto_bytes == host_bytes
    enc_dev, dev_bytes = enc_with("device")
    assert 777 in enc_dev._analyze_cache
    for data in (auto_bytes, dev_bytes):
        decoded = Decoder().decode_whole(data)
        assert all(np.array_equal(decoded[c], samples[c]) for c in range(2))


def test_tail_mode_auto_is_byte_stable_across_apis():
    """With tail_mode="auto", a same-length tail group large enough that the
    old count heuristic would have taken the device path must still match
    per-track encode_whole byte-for-byte: the auto rule depends only on tail
    length + cached-compile presence (codec/encoder.py:_use_host_tail)."""
    spb = 2560
    ntracks = 8
    tracks = [WAVEFORMS["gauss"](spb + 700, 2, 16, seed=i)
              for i in range(ntracks)]
    enc = TpuEncoder(batch_blocks=4)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=0,
        ch_process_method=CH_PROCESS_MS))
    outs = enc.encode_many([list(t) for t in tracks],
                           [t.shape[1] for t in tracks])
    assert 700 not in enc._analyze_cache  # auto keeps tails on the host
    for data, t in zip(outs, tracks):
        assert data == enc.encode_whole(list(t), t.shape[1])
        decoded = Decoder().decode_whole(data)
        assert all(np.array_equal(decoded[c], t[c]) for c in range(2))


def test_threaded_pack_matches_serial(monkeypatch):
    """The drain packs blocks in a thread pool on multicore hosts (this CI
    box has one core, so force the branch): bytes must match the serial
    path exactly."""
    import os

    n = 2560 * 4 + 600
    sig = WAVEFORMS["gauss"](n, 2, 16)

    def encode():
        enc = TpuEncoder(batch_blocks=4)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=44100,
            num_samples_per_block=2560, preset=1,
            ch_process_method=CH_PROCESS_MS))
        return enc.encode_whole([sig[0], sig[1]], n)

    serial = encode()
    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    threaded = encode()
    assert serial == threaded
    decoded = Decoder().decode_whole(threaded)
    assert all(np.array_equal(decoded[c], sig[c]) for c in range(2))

"""Unit tests for the format core: bit I/O, CRC16, zigzag, gamma/Rice,
Huffman (mirrors the reference micro-test structure: test/bit_stream,
test/linne_coder, test/static_huffman)."""

import numpy as np
import pytest

from linne_tpu.format.bitstream import BitReader, BitWriter
from linne_tpu.format.crc16 import crc16
from linne_tpu.format.huffman import get_codebook
from linne_tpu.format.rice import (
    decode_plane,
    encode_plane,
    gamma_get,
    gamma_put,
    optimal_rice_params,
)
from linne_tpu.format.zigzag import (
    zigzag_decode_array,
    zigzag_decode_scalar,
    zigzag_encode_array,
    zigzag_encode_scalar,
)
from linne_tpu.presets import COEF_FREQ_TABLE


class TestBitStream:
    def test_put_get_roundtrip(self):
        rng = np.random.default_rng(0)
        w = BitWriter()
        items = []
        for _ in range(1000):
            nbits = int(rng.integers(1, 33))
            val = int(rng.integers(0, 1 << nbits))
            items.append((val, nbits))
            w.put(val, nbits)
        w.flush()
        r = BitReader(w.getvalue())
        for val, nbits in items:
            assert r.get(nbits) == val

    def test_msb_first_layout(self):
        w = BitWriter()
        w.put(1, 1)
        w.put(0, 1)
        w.put(0b101, 3)
        w.flush()
        # 1 0 101 000 -> 0b10101000
        assert w.getvalue() == bytes([0b10101000])

    def test_zero_run(self):
        for run in [0, 1, 7, 8, 31, 32, 100, 1000]:
            w = BitWriter()
            w.put_zero_run(run)
            w.put(0b1011, 4)
            w.flush()
            r = BitReader(w.getvalue())
            assert r.get_zero_run_length() == run
            assert r.get(4) == 0b1011

    def test_flush_byte_align(self):
        w = BitWriter()
        w.put(0x3, 3)
        w.flush()
        w.put(0xFF, 8)
        assert w.getvalue() == bytes([0b01100000, 0xFF])
        r = BitReader(w.getvalue())
        assert r.get(3) == 0x3
        r.flush()
        assert r.tell() == 1
        assert r.get(8) == 0xFF

    def test_zero_bits(self):
        w = BitWriter()
        w.put(123, 0)
        w.flush()
        assert w.getvalue() == b""


class TestCrc16:
    def test_check_value(self):
        # CRC-16/ARC check value
        assert crc16(b"123456789") == 0xBB3D

    def test_empty(self):
        assert crc16(b"") == 0

    def test_native_matches_python_across_sizes(self):
        """The native CRC dispatches to a PCLMULQDQ folding path above 96
        bytes (5 lanes, 80-byte stride, table finisher); sweep every
        alignment of the dispatch threshold, the lane stride, and the tail
        lengths so every fold/combine/finisher branch is pinned against the
        pure-Python oracle."""
        from linne_tpu import native

        if not native.available():
            pytest.skip("native library not built")
        rng = np.random.default_rng(99)
        sizes = list(range(0, 200)) + [255, 256, 257, 559, 560, 561,
                                       4096, 22013, 100003]
        for n in sizes:
            data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            assert native.crc16(data) == crc16(data), f"size {n}"


class TestZigzag:
    def test_scalar_roundtrip(self):
        for v in [0, 1, -1, 2, -2, 1000, -1000, 2**30, -(2**30)]:
            assert zigzag_decode_scalar(zigzag_encode_scalar(v)) == v

    def test_known_mapping(self):
        assert zigzag_encode_scalar(0) == 0
        assert zigzag_encode_scalar(-1) == 1
        assert zigzag_encode_scalar(1) == 2
        assert zigzag_encode_scalar(-2) == 3

    def test_array_matches_scalar(self):
        rng = np.random.default_rng(1)
        v = rng.integers(-(2**31), 2**31, size=1000, dtype=np.int64).astype(np.int32)
        u = zigzag_encode_array(v)
        assert np.array_equal(zigzag_decode_array(u), v)


class TestGamma:
    def test_roundtrip(self):
        for val in list(range(0, 100)) + [255, 1000, 2**20]:
            w = BitWriter()
            gamma_put(w, val)
            w.flush()
            assert gamma_get(BitReader(w.getvalue())) == val


class TestRiceParams:
    def test_zero_mean(self):
        assert optimal_rice_params(0.0) == (1, 0)

    def test_monotone_in_mean(self):
        prev_k2 = 0
        for mean in [0.1, 1.0, 10.0, 100.0, 1000.0, 1e6]:
            _, k2 = optimal_rice_params(mean)
            assert k2 >= prev_k2
            prev_k2 = k2


class TestRicePlane:
    @pytest.mark.parametrize("n", [64, 100, 1000, 10240])
    @pytest.mark.parametrize("scale", [0, 3, 300, 30000])
    def test_roundtrip(self, n, scale):
        rng = np.random.default_rng(n + scale)
        data = rng.integers(-scale, scale + 1, size=n).astype(np.int32)
        w = BitWriter()
        encode_plane(w, data)
        w.flush()
        out = decode_plane(BitReader(w.getvalue()), n)
        assert np.array_equal(out, data)

    def test_laplacian_roundtrip(self):
        rng = np.random.default_rng(7)
        data = np.round(rng.laplace(0, 50, size=10240)).astype(np.int32)
        w = BitWriter()
        encode_plane(w, data)
        w.flush()
        assert np.array_equal(decode_plane(BitReader(w.getvalue()), 10240), data)


class TestHuffman:
    def test_roundtrip_coef_table(self):
        cb = get_codebook(COEF_FREQ_TABLE)
        rng = np.random.default_rng(3)
        syms = rng.integers(0, 256, size=2000).tolist()
        w = BitWriter()
        for s in syms:
            cb.put(w, s)
        w.flush()
        r = BitReader(w.getvalue())
        assert [cb.get(r) for _ in syms] == syms

    def test_prefix_free(self):
        cb = get_codebook(COEF_FREQ_TABLE)
        codes = set()
        for code, nbits in cb.codes:
            assert nbits > 0
            codes.add((code, nbits))
        assert len(codes) == 256
        # Kraft equality for a complete prefix code
        assert sum(2.0 ** -nbits for _, nbits in cb.codes) == 1.0


def test_pure_python_fallback_matches_native():
    """With LINNE_NO_NATIVE=1 (no compiler on the host) the Python format
    layer must produce byte-identical streams and lossless decodes."""
    import os
    import pathlib
    import subprocess
    import sys

    import numpy as np

    from conftest import WAVEFORMS
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact.encoder import ExactEncoder

    n = 2048 * 2 + 600
    sig = WAVEFORMS["gauss"](n, 2, 16)
    enc = ExactEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2048, preset=1, ch_process_method=1))
    native_bytes = enc.encode_whole([sig[0], sig[1]], n)

    repo = pathlib.Path(__file__).resolve().parent.parent
    code = f"""
import sys
sys.path.insert(0, {str(repo)!r})
import numpy as np
sys.path.insert(0, {str(repo / 'tests')!r})
from conftest import WAVEFORMS
from linne_tpu import native
assert not native.available(), 'LINNE_NO_NATIVE not honored'
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.codec.decoder import Decoder
n = {n}
sig = WAVEFORMS['gauss'](n, 2, 16)
enc = ExactEncoder()
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


def test_huffman_compresses_real_file():
    """Mirror of the reference's text-fixture test
    (test/static_huffman/main.cpp:112-207): build a codebook from a real
    file's byte frequencies, encode, decode, compare — and the coded size
    must beat 8 bits/symbol on skewed text."""
    import collections
    import pathlib

    from linne_tpu.format.bitstream import BitReader, BitWriter
    from linne_tpu.format.huffman import HuffmanCodebook

    data = (pathlib.Path(__file__).resolve().parent.parent
            / "README.md").read_bytes()
    counts = collections.Counter(data)
    table = [counts.get(b, 0) for b in range(256)]
    cb = HuffmanCodebook(table)

    w = BitWriter()
    for b in data:
        cb.put(w, b)
    w.flush()
    coded = w.getvalue()
    assert len(coded) < len(data)  # text is skewed; must compress

    r = BitReader(coded)
    out = bytes(cb.get(r) for _ in range(len(data)))
    assert out == data


def test_rice_run_extreme_quotients_and_buffer_edges():
    """Deterministic extremes for the native bulk Rice decoder (rice_run):
    a near-silent block with huge isolated spikes produces tiny k2 with
    multi-thousand-bit quotient runs (the fast window must fall back to the
    generic zero-run path), and a full-scale noise block exercises large k
    payload extraction right up to the stream tail."""
    import numpy as np

    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact.encoder import ExactEncoder

    n = 2048
    rng = np.random.default_rng(5)
    spiky = rng.integers(-2, 3, size=(2, n)).astype(np.int32)
    spiky[0, 100] = 30000   # quotient run of thousands of zero bits
    spiky[1, n - 3] = -32768  # long run right before the stream tail
    loud = rng.integers(-32768, 32768, size=(2, n)).astype(np.int32)
    loud[:, -8:] = 32767  # max-k payloads at the buffer edge

    for sig in (spiky, loud):
        enc = ExactEncoder()
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=44100,
            num_samples_per_block=n, preset=0, ch_process_method=1))
        data = enc.encode_whole([sig[0], sig[1]], n)
        out = Decoder().decode_whole(data)
        for c in range(2):
            assert np.array_equal(out[c], sig[c])


def test_rice_run_window_exact_fill_symbol():
    """A symbol that exactly fills a fresh 64-bit decode window (63-bit
    zero run + terminator at k2=0) once made the native drain loop shift a
    uint64 by 64 — UB the optimizer exploited into a bogus stream error.
    An 8-bit stereo Nyquist oscillation reproduces it: after MS the side
    channel is all zeros (k2=0) and the mid residuals pack "10" pairs, so
    runs land window-aligned. Sweep lengths to vary porder/alignment."""
    import numpy as np

    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact.encoder import ExactEncoder

    for n in (5090, 5096, 5102):
        t = np.arange(n)
        ch = np.where(t % 2 == 0, 127, -128).astype(np.int32)
        sig = np.stack([ch, ch])
        enc = ExactEncoder()
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=8, sampling_rate=44100,
            num_samples_per_block=10240, preset=0, ch_process_method=1))
        data = enc.encode_whole([sig[0], sig[1]], n)
        out = Decoder().decode_whole(data)
        for c in range(2):
            assert np.array_equal(out[c], sig[c]), n


def test_rice_k2_31_wire_roundtrip():
    """Full-scale residuals drive the MLE to k2=31 (k1=32) — a legal 5-bit
    wire value whose shifts overflowed uint32 in the native coder (review
    finding). Both the python plane codec and the native payload pack/unpack
    must round-trip it."""
    import numpy as np

    from linne_tpu import native
    from linne_tpu.format.bitstream import BitReader, BitWriter
    from linne_tpu.format.rice import (
        choose_partition, decode_plane, encode_plane, optimal_rice_params,
    )

    k1, k2 = optimal_rice_params(4.2e9)
    assert (k1, k2) == (32, 31)

    # values pinned to the int32 extremes: zigzag mean ~4.3e9 -> k2 = 31
    plane = np.where(np.arange(512) % 2 == 0, -2**31, 2**31 - 1).astype(
        np.int32)
    po, params = choose_partition(plane)
    assert any(k2 == 31 for (_, k2) in params)

    w = BitWriter()
    encode_plane(w, plane)
    w.flush()
    out = decode_plane(BitReader(w.getvalue()), plane.shape[0])
    assert np.array_equal(out, plane)

    if native.available():
        from linne_tpu.format.huffman import get_codebook
        from linne_tpu.presets import PRESETS

        cb = get_codebook(PRESETS[0].coef_freq_table)
        res = np.stack([plane, plane])
        k2s = np.full((2, 1), 31, np.int32)
        payload = native.pack_compress_payload(
            res, np.zeros((2, 2), np.int32), np.zeros((2, 1), np.int32),
            np.ones((2, 1), np.int32), np.zeros((2, 2), np.int32),
            np.zeros((2, 2), np.int32), np.zeros(2, np.int32), k2s,
            cb.codes_array, cb.lens_array, 16, np.asarray([2], np.int32))
        got = native.unpack_compress_payload(
            payload, cb.node0_array, cb.node1_array, cb.root,
            cb.num_symbols, 2, 512, 16, np.asarray([2], np.int32))
        assert np.array_equal(got[0], res)

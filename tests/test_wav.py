"""WAV I/O round-trips at every supported depth (mirrors test/wav of the
reference, with our own fixtures)."""

import numpy as np
import pytest

from linne_tpu.io.wav import WavError, read_wav, write_wav


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2, 6])
def test_roundtrip(tmp_path, bps, ch):
    rng = np.random.default_rng(bps + ch)
    amp = (1 << (bps - 1)) - 1
    samples = rng.integers(-amp - 1, amp, size=(ch, 777)).astype(np.int32)
    path = tmp_path / "t.wav"
    write_wav(str(path), samples, 48000, bps)
    fmt, restored = read_wav(str(path))
    assert fmt.num_channels == ch
    assert fmt.bits_per_sample == bps
    assert fmt.sampling_rate == 48000
    assert fmt.num_samples == 777
    assert np.array_equal(restored, samples)


def test_8bit_bias():
    """8-bit PCM is unsigned with a 128 bias on the wire."""
    samples = np.array([[-128, 0, 127]], dtype=np.int32)
    import io as _io
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = d + "/b.wav"
        write_wav(p, samples, 8000, 8)
        raw = open(p, "rb").read()
        assert raw[-3:] == bytes([0, 128, 255])
        _, restored = read_wav(p)
        assert np.array_equal(restored, samples)


def test_rejects_non_wav(tmp_path):
    p = tmp_path / "x.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(WavError):
        read_wav(str(p))


def test_extra_chunks_tolerated(tmp_path):
    """Parsers must skip unknown chunks (LIST etc.) like the reference."""
    import struct

    samples = np.array([[1, -2, 3]], dtype=np.int32)
    p = tmp_path / "t.wav"
    write_wav(str(p), samples, 8000, 16)
    raw = bytearray(p.read_bytes())
    # splice a LIST chunk between fmt and data
    insert_at = 12 + 8 + 16  # after fmt chunk
    chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    raw2 = raw[:insert_at] + chunk + raw[insert_at:]
    struct.pack_into("<I", raw2, 4, len(raw2) - 8)
    p2 = tmp_path / "t2.wav"
    p2.write_bytes(bytes(raw2))
    _, restored = read_wav(str(p2))
    assert np.array_equal(restored, samples)


def test_corrupt_wav_raises_wav_error(tmp_path):
    """Corrupt/truncated WAV input must raise WavError, never struct.error,
    ZeroDivisionError, or UnboundLocalError (r3 fuzz: a truncated fmt chunk
    leaked struct.error; bps=0 / unsupported bps / nch=0 were latent)."""
    samples = np.array([[10, -20, 30, -40] * 64], dtype=np.int32)
    p = tmp_path / "t.wav"
    write_wav(str(p), samples, 8000, 16)
    good = bytearray(p.read_bytes())

    def expect_wav_error(raw):
        p.write_bytes(bytes(raw))
        with pytest.raises(WavError):
            read_wav(str(p))

    # truncated fmt chunk body
    expect_wav_error(good[: 12 + 8 + 7])
    # bps = 0 (fmt body offset 12+8, bps at +14)
    bad = bytearray(good)
    bad[12 + 8 + 14 : 12 + 8 + 16] = (0).to_bytes(2, "little")
    expect_wav_error(bad)
    # unsupported bps = 12
    bad = bytearray(good)
    bad[12 + 8 + 14 : 12 + 8 + 16] = (12).to_bytes(2, "little")
    expect_wav_error(bad)
    # zero channels
    bad = bytearray(good)
    bad[12 + 8 + 2 : 12 + 8 + 4] = (0).to_bytes(2, "little")
    expect_wav_error(bad)
    # random byte-flip sweep stays in the WavError/clean contract
    rng = np.random.default_rng(11)
    for _ in range(300):
        bad = bytearray(good)
        for _ in range(int(rng.integers(1, 5))):
            bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        p.write_bytes(bytes(bad))
        try:
            read_wav(str(p))
        except WavError:
            pass

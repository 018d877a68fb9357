"""Decoder robustness fuzzing: corrupted/truncated/random streams must
raise clean errors or produce garbage output — never crash — even with CRC
checking disabled (the reference returns enum errors and relies on CRC;
our native unpacker additionally bounds-checks parameters)."""

import numpy as np
import pytest

from conftest import WAVEFORMS

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import DecoderConfig, EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS


@pytest.fixture(scope="module")
def stream():
    samples = WAVEFORMS["gauss"](2560 * 2, 2, 16)
    enc = TpuEncoder()
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=2560, preset=2,
        ch_process_method=CH_PROCESS_MS))
    return enc.encode_whole([samples[0], samples[1]], samples.shape[1])


def test_giant_num_samples_header_rejected(stream):
    """The 30-byte header has no wire CRC, so a corrupted num_samples (u32,
    offset 14) used to drive the output-plane allocation directly — a tiny
    corrupt file could demand 8ch x 2^32 x 4B = 128 GiB (found by the r3
    extended fuzz as an ArrayMemoryError). The capacity check must reject
    it as FormatError BEFORE allocating, with CRC checking on or off."""
    from linne_tpu.codec.tpu_decoder import TpuDecoder
    from linne_tpu.format.header import FormatError

    bad = bytearray(stream)
    bad[14:18] = (0xFFFFFFF0).to_bytes(4, "big")
    for crc in (True, False):
        with pytest.raises(FormatError):
            Decoder(DecoderConfig(check_crc=crc)).decode_whole(bytes(bad))
    with pytest.raises(FormatError):
        TpuDecoder().decode_whole(bytes(bad))
    # a plausible-but-wrong value below the capacity bound still errors
    # cleanly (truncated body), rather than succeeding with zero tail
    bad[14:18] = (2560 * 3).to_bytes(4, "big")
    with pytest.raises(FormatError):
        Decoder().decode_whole(bytes(bad))


def test_per_block_corrupt_payload_raises_format_error(stream):
    """The per-block native path (StreamingDecoder / Decoder.decode_block)
    must honor the same public error contract as the whole-stream path:
    corrupt payloads raise FormatError (or its CorruptionError subclass),
    never a raw RuntimeError (found by the r3 streaming fuzz — the native
    unpack wrapper leaked RuntimeError with CRC checking off)."""
    from linne_tpu.codec.streaming import StreamingDecoder
    from linne_tpu.format.header import FormatError

    rng = np.random.default_rng(31)
    hits = 0
    for _ in range(60):
        bad = bytearray(stream)
        for _ in range(int(rng.integers(1, 6))):
            bad[int(rng.integers(40, len(bad)))] ^= int(rng.integers(1, 256))
        for crc in (True, False):
            sd = StreamingDecoder(bytes(bad), DecoderConfig(check_crc=crc))
            try:
                while sd.read(4096).shape[1]:
                    pass
            except FormatError:
                hits += 1  # includes CorruptionError
            except ValueError:
                pass  # header-field corruption
    assert hits > 0, "corruptions never reached the payload error path"


def _try_decode(data: bytes) -> None:
    try:
        Decoder(DecoderConfig(check_crc=False)).decode_whole(data)
    except Exception:
        pass  # clean Python exception is fine; crashing is not


def test_random_byte_corruption(stream):
    rng = np.random.default_rng(0)
    data = bytearray(stream)
    for _ in range(200):
        mutated = bytearray(data)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(30, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        _try_decode(bytes(mutated))


def test_truncations(stream):
    for cut in range(30, min(len(stream), 400), 7):
        _try_decode(stream[:cut])


def test_random_payload_after_valid_header(stream):
    rng = np.random.default_rng(1)
    for _ in range(50):
        junk = rng.integers(0, 256, size=500, dtype=np.uint8).tobytes()
        _try_decode(stream[:30] + junk)


def test_crc_catches_corruption(stream):
    """With CRC on (the default), every payload corruption is detected."""
    from linne_tpu.format.block import CorruptionError
    from linne_tpu.format.header import FormatError

    rng = np.random.default_rng(2)
    caught = 0
    for _ in range(30):
        mutated = bytearray(stream)
        pos = int(rng.integers(60, len(mutated)))
        mutated[pos] ^= 0x80
        try:
            Decoder(DecoderConfig(check_crc=True)).decode_whole(bytes(mutated))
        except (CorruptionError, FormatError, RuntimeError):
            caught += 1
    assert caught == 30


def test_differential_native_vs_tpu_decoder(stream):
    """Differential fuzz: on mutated streams decoded WITHOUT CRC checking,
    the native whole-stream decoder and the batched device decoder must
    agree — both raise, or both produce identical samples (the device
    synthesis mirrors the native int32/rshift semantics, including the
    corrupt-stream rshift=0 guard)."""
    from linne_tpu.codec.tpu_decoder import TpuDecoder

    rng = np.random.default_rng(7)
    cfg = DecoderConfig(check_crc=False)
    checked = 0
    for _ in range(40):
        mutated = bytearray(stream)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(30, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        data = bytes(mutated)
        try:
            a = Decoder(cfg).decode_whole(data)
        except Exception:
            a = None
        try:
            b = TpuDecoder(cfg).decode_whole(data)
        except Exception:
            b = None
        if a is None or b is None:
            # both paths must agree that the stream is undecodable
            assert a is None and b is None
            continue
        checked += 1
        for c in range(2):
            assert np.array_equal(a[c], b[c])
    assert checked > 0  # some mutations must decode (garbage) identically


def test_streaming_decoder_fuzz(stream):
    """The pull-based streaming decoder (per-block entry path) must raise
    clean errors or return garbage — never crash — on mutated streams."""
    from linne_tpu.codec.streaming import StreamingDecoder

    rng = np.random.default_rng(11)
    for _ in range(60):
        mutated = bytearray(stream)
        for _ in range(int(rng.integers(1, 6))):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        try:
            sd = StreamingDecoder(bytes(mutated), DecoderConfig(
                check_crc=False))
            while not sd.exhausted:
                if sd.read(777).shape[1] == 0:
                    break
        except Exception:
            pass

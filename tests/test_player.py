"""Player path: pull API pacing, output backends, first-block latency.

Mirrors the reference player's contract (tools/linne_player/linne_player.c:
110-146): the render callback may request arbitrary frame counts; the
decoder must satisfy them by decoding at most the blocks needed, fast enough
to never starve a realtime output stream.
"""

import time

import numpy as np
import pytest

from conftest import WAVEFORMS

from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.codec.streaming import StreamingDecoder
from linne_tpu.constants import CH_PROCESS_MS, HEADER_SIZE
from linne_tpu.player import FileBackend, PipeBackend, Player

SPB = 2048
RATE = 44100


@pytest.fixture(scope="module")
def lnn_stream():
    ns = SPB * 6 + 777
    sig = WAVEFORMS["gauss"](ns, 2, 16)
    enc = TpuEncoder(batch_blocks=8)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=RATE,
        num_samples_per_block=SPB, preset=0, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([sig[0], sig[1]], ns)
    return data, sig, ns


def test_player_file_backend_renders_everything(lnn_stream):
    data, sig, ns = lnn_stream
    backend = FileBackend()
    delivered = Player(StreamingDecoder(data), backend).run(chunk_frames=1000)
    assert delivered == ns
    assert backend.num_frames_written == ns
    pcm = np.concatenate(backend.frames, axis=0)  # [n, ch] int16
    assert np.array_equal(pcm.T.astype(np.int32), sig)  # 16-bit: no shift


def test_player_pipe_backend_smoke(lnn_stream):
    """CI-safe pipe smoke: stream the PCM into a sink process."""
    data, _sig, ns = lnn_stream
    backend = PipeBackend(command=["sh", "-c", "cat > /dev/null"])
    delivered = Player(StreamingDecoder(data), backend).run()
    assert delivered == ns


def test_pull_api_odd_request_sizes(lnn_stream):
    data, sig, ns = lnn_stream
    stream = StreamingDecoder(data)
    got = []
    req = 1
    while True:
        chunk = stream.read(req)
        if chunk.shape[1] == 0:
            break
        got.append(chunk)
        req = (req * 7 + 3) % 5000 + 1
    out = np.concatenate(got, axis=1)
    assert out.shape[1] == ns
    assert np.array_equal(out, sig)
    assert stream.exhausted


def test_first_block_latency(lnn_stream):
    """Regression: pulling the first frames must decode only the first
    block and return well inside a realtime audio callback budget."""
    data, _sig, _ns = lnn_stream
    stream = StreamingDecoder(data)
    t0 = time.perf_counter()
    chunk = stream.read(256)
    dt = time.perf_counter() - t0
    assert chunk.shape == (2, 256)
    # exactly one block decoded, not the whole stream
    assert stream._produced == SPB
    # 256 frames at 44.1kHz is a ~5.8ms budget; first pull (native block
    # decode, no jit) must fit easily even on a loaded CI machine
    assert dt < 0.05, f"first-block latency {dt*1000:.1f} ms"


def test_streaming_matches_whole_decode(lnn_stream):
    data, sig, ns = lnn_stream
    from linne_tpu.codec.decoder import Decoder

    whole = Decoder().decode_whole(data)
    stream = StreamingDecoder(data)
    out = stream.read(ns + 100)
    assert out.shape[1] == ns
    for c in range(2):
        assert np.array_equal(out[c], whole[c])


def test_seek_matches_linear_decode(lnn_stream):
    data, sig, ns = lnn_stream
    stream = StreamingDecoder(data)
    # seek to assorted positions incl. block boundaries and mid-block
    for pos in (0, 1, SPB - 1, SPB, SPB + 1, 3 * SPB + 500, ns - 10, ns):
        stream.seek(pos)
        chunk = stream.read(257)
        want = sig[:, pos : pos + 257]
        assert chunk.shape[1] == want.shape[1], pos
        assert np.array_equal(chunk, want), pos


def test_seek_is_header_only():
    """Seeking deep into a stream must not decode preceding blocks."""
    ns = SPB * 40
    sig = WAVEFORMS["gauss"](ns, 2, 16)
    enc = TpuEncoder(batch_blocks=8)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=RATE,
        num_samples_per_block=SPB, preset=0, ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([sig[0], sig[1]], ns)
    stream = StreamingDecoder(data)
    t0 = time.perf_counter()
    stream.seek(ns - SPB // 2)
    dt = time.perf_counter() - t0
    out = stream.read(100)
    assert np.array_equal(out, sig[:, ns - SPB // 2 : ns - SPB // 2 + 100])
    assert dt < 0.05, f"seek took {dt*1000:.1f} ms (decoded blocks?)"

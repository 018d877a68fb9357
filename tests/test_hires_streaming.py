"""Hi-res (24-bit/96kHz) streaming decode — BASELINE.json config #5."""

import numpy as np

from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.codec.streaming import StreamingDecoder
from linne_tpu.constants import CH_PROCESS_MS


def test_hires_streaming_roundtrip():
    rng = np.random.default_rng(9)
    rate, spb = 96000, 2560
    n = spb * 3 + 500
    t = np.arange(n) / rate
    base = (4_000_000 * np.sin(2 * np.pi * 1000 * t)
            + 2_000_000 * np.sin(2 * np.pi * 12000 * t)
            + rng.normal(0, 40_000, n))
    samples = np.clip(np.round(np.stack([base, 0.8 * base])),
                      -(1 << 23), (1 << 23) - 1).astype(np.int32)

    enc = TpuEncoder(batch_blocks=4)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=24, sampling_rate=rate,
        num_samples_per_block=spb, preset=2,
        ch_process_method=CH_PROCESS_MS))
    data = enc.encode_whole([samples[0], samples[1]], n)

    sd = StreamingDecoder(data)
    assert sd.header.sampling_rate == rate
    assert sd.header.bits_per_sample == 24
    chunks = []
    while not sd.exhausted:
        chunk = sd.read(1024)
        if chunk.shape[1] == 0:
            break
        chunks.append(chunk)
    out = np.concatenate(chunks, axis=1)
    assert np.array_equal(out, samples)

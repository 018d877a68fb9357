"""Randomized round-trip property sweep for the production encoder.

The curated matrices cover known shapes; this adds seeded random breadth
over (length, channels, depth, preset, MS, block size) with mixed content —
every draw must round-trip bit-exactly through TpuEncoder -> Decoder and
the streaming decoder.
"""

import numpy as np
import pytest

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.codec.streaming import StreamingDecoder
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE


def _random_signal(rng, ch, n, bps):
    amp = (1 << (bps - 1)) - 1
    kind = rng.integers(0, 4)
    t = np.arange(n)
    if kind == 0:  # tonal + noise
        f = rng.uniform(40, 4000)
        x = 0.6 * amp * np.sin(2 * np.pi * f * t / 44100)
        x = x + rng.normal(0, amp * 0.02, n)
    elif kind == 1:  # colored noise
        x = np.cumsum(rng.normal(0, amp * 0.01, n))
    elif kind == 2:  # bursts and silence
        x = np.zeros(n)
        for _ in range(int(rng.integers(1, 6))):
            s = int(rng.integers(0, max(1, n - 50)))
            x[s : s + 50] = rng.normal(0, amp * 0.5, min(50, n - s))
    else:  # near-full-scale
        x = rng.uniform(-amp, amp, n)
    out = np.stack([np.roll(x, int(rng.integers(0, 32))) for _ in range(ch)])
    return np.clip(np.round(out), -amp - 1, amp).astype(np.int32)


@pytest.mark.parametrize("seed", range(14))
def test_random_config_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    ch = int(rng.choice([1, 2, 4]))
    bps = int(rng.choice([8, 16, 24]))
    preset = int(rng.integers(0, 8))
    spb = int(rng.choice([1024, 2048, 2560]))
    n = int(rng.integers(spb, spb * 3 + 500))
    ms = bool(ch >= 2 and rng.integers(0, 2))
    sig = _random_signal(rng, ch, n, bps)

    enc = TpuEncoder(batch_blocks=8)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=ch, bits_per_sample=bps, sampling_rate=44100,
        num_samples_per_block=spb, preset=preset,
        ch_process_method=CH_PROCESS_MS if ms else CH_PROCESS_NONE))
    data = enc.encode_whole([sig[c] for c in range(ch)], n)

    out = Decoder().decode_whole(data)
    for c in range(ch):
        assert np.array_equal(out[c], sig[c]), (
            seed, ch, bps, preset, spb, n, ms, c)

    sd = StreamingDecoder(data)
    got = sd.read(n + 10)
    assert np.array_equal(got, sig), (seed, "streaming")

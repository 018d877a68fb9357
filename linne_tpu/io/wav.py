"""Minimal RIFF/WAVE PCM reader/writer (numpy, host side).

Functional equivalent of the reference's self-contained WAV layer
(reference: libs/wav/src/wav.c): linear PCM only, 8/16/24/32-bit, arbitrary
channel count. Samples are exposed at native precision as int32 (the
reference stores them left-justified in 32 bits and shifts at the CLI edge,
tools/linne_codec/linne_codec.c:101-105; we fold that shift into the reader).
8-bit PCM is unsigned with a 128 bias (wav.c:389-393).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass
class WavFormat:
    num_channels: int
    sampling_rate: int
    bits_per_sample: int
    num_samples: int


class WavError(ValueError):
    pass


def read_wav(path: str):
    """Returns (WavFormat, samples[ch, n] int32 at native precision)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            (audio_fmt, nch, rate, _brate, _align, bps) = struct.unpack_from(
                "<HHIIHH", body)
            if audio_fmt != 1:
                raise WavError(f"unsupported WAVE format tag {audio_fmt}")
            fmt = (nch, rate, bps)
        elif cid == b"data":
            pcm = body
            if fmt is not None:
                break
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise WavError("missing fmt/data chunk")
    nch, rate, bps = fmt
    bytes_per = bps // 8
    total = len(pcm) // (bytes_per * nch)
    if bps == 8:
        x = np.frombuffer(pcm, dtype=np.uint8, count=total * nch).astype(np.int32) - 128
    elif bps == 16:
        x = np.frombuffer(pcm, dtype="<i2", count=total * nch).astype(np.int32)
    elif bps == 24:
        b = np.frombuffer(pcm, dtype=np.uint8, count=3 * total * nch)
        b = b.reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x = u.astype(np.int32)
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
    elif bps == 32:
        x = np.frombuffer(pcm, dtype="<i4", count=total * nch).astype(np.int32)
    else:
        raise WavError(f"unsupported bits_per_sample {bps}")
    samples = x.reshape(total, nch).T.copy()
    return WavFormat(nch, rate, bps, total), samples


def write_wav(path: str, samples: np.ndarray, sampling_rate: int,
              bits_per_sample: int) -> None:
    """samples: [ch, n] int32 at native precision."""
    nch, n = samples.shape
    bps = bits_per_sample
    interleaved = samples.T.reshape(-1)
    if bps == 8:
        body = (interleaved + 128).astype(np.uint8).tobytes()
    elif bps == 16:
        body = interleaved.astype("<i2").tobytes()
    elif bps == 24:
        u = interleaved.astype(np.int32).view(np.uint32) & 0xFFFFFF
        b = np.empty((u.shape[0], 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        body = b.tobytes()
    elif bps == 32:
        body = interleaved.astype("<i4").tobytes()
    else:
        raise WavError(f"unsupported bits_per_sample {bps}")
    block_align = nch * (bps // 8)
    fmt = struct.pack("<HHIIHH", 1, nch, sampling_rate,
                      sampling_rate * block_align, block_align, bps)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(body))
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(body)) + body)

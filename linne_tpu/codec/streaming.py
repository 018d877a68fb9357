"""Streaming block-at-a-time decoding — the player path.

Functional equivalent of the reference's pull-based player core
(reference: tools/linne_player/linne_player.c:110-146): an audio callback
requests N samples; when the internal buffer runs dry the next block is
decoded on demand. Decode must beat realtime per block — the native host
synthesis path does (hundreds of x realtime), so the render thread never
starves.

No OS audio backend is bundled (the reference ships PulseAudio/WASAPI/
CoreAudio backends); `StreamingDecoder.read()` is the backend-agnostic pull
API a playback backend calls from its render callback, and `play()` hooks
into `simpleaudio`/`sounddevice` if one happens to be installed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..constants import HEADER_SIZE
from ..format.header import LinneHeader
from .decoder import Decoder
from .params import DecoderConfig


class StreamingDecoder:
    """Pull-based decoder over an in-memory .lnn stream."""

    def __init__(self, data: bytes, config: Optional[DecoderConfig] = None):
        self._data = data
        self._decoder = Decoder(config)
        self.header: LinneHeader = LinneHeader.unpack(data)
        self._decoder.set_header(self.header)
        self._offset = HEADER_SIZE
        self._produced = 0
        self._buffer = np.zeros((self.header.num_channels, 0), dtype=np.int32)
        self._buffer_pos = 0

    @property
    def num_channels(self) -> int:
        return self.header.num_channels

    @property
    def exhausted(self) -> bool:
        return (self._produced >= self.header.num_samples
                and self._buffer_pos >= self._buffer.shape[1])

    def _decode_next_block(self) -> bool:
        if (self._produced >= self.header.num_samples
                or self._offset >= len(self._data)):
            return False
        channels, consumed = self._decoder.decode_block(
            self._data[self._offset :])
        self._offset += consumed
        self._produced += channels[0].shape[0]
        self._buffer = np.stack(channels)
        self._buffer_pos = 0
        return True

    def read(self, num_samples: int) -> np.ndarray:
        """Pull up to `num_samples` frames; returns [ch, m] with m <=
        num_samples (m < num_samples only at end of stream). This is the
        audio-callback entry point: it decodes at most as many blocks as
        needed to satisfy the request."""
        out = np.zeros((self.num_channels, num_samples), dtype=np.int32)
        filled = 0
        while filled < num_samples:
            avail = self._buffer.shape[1] - self._buffer_pos
            if avail == 0:
                if not self._decode_next_block():
                    break
                continue
            take = min(avail, num_samples - filled)
            out[:, filled : filled + take] = self._buffer[
                :, self._buffer_pos : self._buffer_pos + take]
            self._buffer_pos += take
            filled += take
        return out[:, :filled]

    def play(self, chunk_frames: int = 4096) -> None:
        """Convenience playback loop through an available audio backend."""
        try:
            import sounddevice as sd
        except ImportError as e:
            raise RuntimeError(
                "no audio backend available (install sounddevice); "
                "use read() from your own callback instead") from e
        bps = self.header.bits_per_sample
        shift = 16 - bps

        def callback(outdata, frames, _time, _status):
            chunk = self.read(frames)
            pcm = chunk.T.astype(np.int32)
            pcm = pcm << shift if shift >= 0 else pcm >> -shift
            outdata[: pcm.shape[0]] = pcm.astype(np.int16)
            if pcm.shape[0] < frames:
                outdata[pcm.shape[0] :] = 0
                raise sd.CallbackStop()

        with sd.OutputStream(
                samplerate=self.header.sampling_rate,
                channels=self.num_channels, dtype="int16",
                blocksize=chunk_frames, callback=callback):
            import time as _time

            while not self.exhausted:
                _time.sleep(0.05)


def open_file(path: str, config: Optional[DecoderConfig] = None) -> StreamingDecoder:
    with open(path, "rb") as f:
        return StreamingDecoder(f.read(), config)

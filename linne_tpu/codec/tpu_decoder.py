"""Batched TPU decoder: corpus-scale reconstruction throughput.

The host (native library) does the serial entropy decode of every block; the
reconstruction IIR cascade — the decode hot loop — then runs as batched
device scans over ALL (block, channel, unit) segments at once, grouped by
unit count per layer (each group is one uniform [rows, ns] scan, see
linne_tpu.ops.synthesis). De-emphasis and the MS inverse are short integer
passes handled by the native library / numpy.

For single-block latency (the player path) use codec.streaming /
codec.decoder instead; this path optimizes whole-file and corpus decode.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import native
from ..constants import (
    BLOCK_TYPE_RAW,
    BLOCK_TYPE_SILENT,
    CH_PROCESS_MS,
    HEADER_SIZE,
)
from ..format.block import BLOCK_HEADER_SIZE, parse_block_header, read_raw_payload
from ..format.header import LinneHeader
from ..format.huffman import get_codebook
from ..ops.synthesis import synthesize_rows
from ..presets import PRESETS
from .params import DecoderConfig


@functools.lru_cache(maxsize=64)
def _group_step(u: int, ns: int, npu: int, nmembers: int):
    """One jitted gather -> batched synthesis -> scatter for a uniform
    (units, order) group: a single dispatch instead of a chain of eager
    ops (each eager op costs a dispatch round trip)."""

    @jax.jit
    def step(R, idx, c, rs):
        seg = R[idx, : u * ns].reshape(-1, ns)
        out = synthesize_rows(seg, c, rs)
        return R.at[idx, : u * ns].set(out.reshape(nmembers, u * ns))

    return step


class TpuDecoder:
    def __init__(self, config: Optional[DecoderConfig] = None):
        self.config = config or DecoderConfig()

    def decode_whole(self, data: bytes) -> List[np.ndarray]:
        header = LinneHeader.unpack(data)
        preset = PRESETS[header.preset]
        cb = get_codebook(preset.coef_freq_table)
        orders = np.asarray(preset.layer_num_params, dtype=np.int32)
        nch = header.num_channels
        bps = header.bits_per_sample

        # 1) host entropy decode of every block
        blocks = []  # (start_sample, n, kind, payload arrays)
        offset = HEADER_SIZE
        progress = 0
        while progress < header.num_samples and offset < len(data):
            bh = parse_block_header(
                data[offset:], check_crc=self.config.check_crc)
            payload = data[offset + BLOCK_HEADER_SIZE : offset + 6 + bh.block_size]
            n = bh.num_samples
            if bh.block_type == BLOCK_TYPE_SILENT:
                blocks.append((progress, n, "silent", None))
            elif bh.block_type == BLOCK_TYPE_RAW:
                channels, _ = read_raw_payload(payload, nch, n, bps)
                blocks.append((progress, n, "raw", np.stack(channels)))
            else:
                unpacked = native.unpack_compress_payload(
                    payload, cb.node0_array, cb.node1_array, cb.root,
                    cb.num_symbols, nch, n, bps, orders)
                blocks.append((progress, n, "compress", unpacked))
            offset += bh.total_size
            progress += n

        # 2) batched device synthesis: residual planes are uploaded ONCE per
        #    block-length class, the reversed layer cascade runs entirely on
        #    device (gather rows of each (units, order) group, one scan
        #    launch per group, scatter back), and the reconstructed planes
        #    come back in ONE download — no per-layer host round trips.
        compress = [(i, b) for i, (_s, _n, kind, b) in enumerate(blocks)
                    if kind == "compress"]
        by_idx = dict(compress)
        planes = {i: b[0] for i, b in compress}  # residuals [nch, n] (mutated)
        by_len = {}
        for i, _b in compress:
            by_len.setdefault(planes[i].shape[1], []).append(i)
        for n, members_n in by_len.items():
            rowmap = {}  # (block, ch) -> row index in the device tensor
            stackrows = []
            for i in members_n:
                for ch in range(nch):
                    rowmap[(i, ch)] = len(stackrows)
                    stackrows.append(planes[i][ch])
            R = jnp.asarray(np.stack(stackrows))           # [rows, n]
            for li in range(len(orders) - 1, -1, -1):
                base_off = int(orders[:li].sum())
                groups = {}
                for i in members_n:
                    log2u = by_idx[i][2]
                    for ch in range(nch):
                        u = 1 << int(log2u[ch, li])
                        npu = int(orders[li]) // u
                        ns = n // u
                        if ns <= npu:
                            continue
                        groups.setdefault((u, ns, npu), []).append((i, ch))
                for (u, ns, npu), members in groups.items():
                    crows = []
                    rsrows = []
                    idx = []
                    for i, ch in members:
                        _r, coefs, _l2, rshifts, _pp, _pc, _c = by_idx[i]
                        idx.append(rowmap[(i, ch)])
                        crows.append(
                            coefs[ch, base_off : base_off + orders[li]]
                            .reshape(u, npu))
                        rsrows.append(np.full(u, rshifts[ch, li], np.int32))
                    step = _group_step(u, ns, npu, len(members))
                    R = step(R, jnp.asarray(np.asarray(idx, np.int32)),
                             jnp.asarray(np.concatenate(crows, axis=0)),
                             jnp.asarray(np.concatenate(rsrows, axis=0)))
            host_R = np.asarray(R)                          # ONE download
            for (i, ch), row in rowmap.items():
                planes[i][ch] = host_R[row]

        # 3) de-emphasis + channel recorrelation on host
        out = [np.zeros(header.num_samples, dtype=np.int32)
               for _ in range(nch)]
        for idx, (start, n, kind, b) in enumerate(blocks):
            if kind == "silent":
                continue
            if kind == "raw":
                for ch in range(nch):
                    out[ch][start : start + n] = b[ch]
                continue
            _res, _coefs, _l2, _rs, pprev, pcoef, _c = b
            plane = planes[idx]
            for ch in range(nch):
                native.deemphasis(plane[ch], pprev[ch], pcoef[ch])
            if header.ch_process_method == CH_PROCESS_MS:
                m = plane[0]
                s = plane[1]
                m -= s >> 1
                s += m
            for ch in range(nch):
                out[ch][start : start + n] = plane[ch]
        self.header = header
        return out

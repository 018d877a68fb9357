"""Batched TPU decoder: corpus-scale reconstruction throughput.

The host (native library) does the serial entropy decode of every block; the
reconstruction IIR cascade — the decode hot loop — then runs as batched
device scans over ALL (stream, block, channel, unit) segments at once,
grouped by unit count per layer (each group is one uniform [rows, ns] scan,
see linne_tpu.ops.synthesis). De-emphasis and the MS inverse are short
integer passes handled by the native library / numpy.

The scan's cost is per TIME STEP (latency-bound on TPU), nearly independent
of the lane count, so `decode_many` pools the rows of a whole corpus into
the same launches: device-side throughput scales close to linearly with the
number of pooled streams until the VPU saturates.

For single-block latency (the player path) use codec.streaming /
codec.decoder instead; this path optimizes whole-file and corpus decode.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

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
from ..format.header import FormatError, LinneHeader, check_stream_capacity
from ..format.huffman import get_codebook
from ..ops.synthesis import synthesize_rows

import os

# Row-chunk size for the streamed reconstruction download (overlaps the
# host unpack with the next chunk's D2H transfer on large pools).
_DL_CHUNK_ROWS = int(os.environ.get("LINNE_DECODE_DL_CHUNK", "128"))
from ..presets import PRESETS
from .params import DecoderConfig


def _download_width(bps: int) -> int:
    """Reconstruction samples of a valid stream are bounded by bps+1 bits
    (pre-de-emphasis, MS side channel): the download plane packs at bps+2;
    any row a hostile stream pushes past that is flagged on device and
    re-fetched at full width."""
    return min(bps + 2, 30)


@functools.partial(jax.jit, static_argnames="W")
def _pack_download(R, W):
    """Fuse the slim-download pack (overflow flags + W-bit plane) into one
    dispatch: flags ride column 0 of the packed int32 tensor."""
    from ..ops.bitpack import pack_plane_words

    lim = 1 << (W - 1)
    flags = jnp.any((R >= lim) | (R < -lim), axis=-1)
    return jnp.concatenate(
        [flags.astype(jnp.int32)[:, None], pack_plane_words(R, W)], axis=-1)


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
    def __init__(self, config: Optional[DecoderConfig] = None, mesh=None):
        """`mesh`: an optional jax.sharding.Mesh. When given, the pooled
        reconstruction rows are sharded over the mesh's first axis (pure
        data parallelism — rows are independent through every layer's
        synthesis scan, so each chip owns its shard of the corpus; the
        gather/scatter between layer groups is row-aligned and stays
        shard-local for uniform corpora)."""
        self.config = config or DecoderConfig()
        self.mesh = mesh

    # -- host entropy stage --------------------------------------------------

    def _parse_stream(self, data: bytes):
        """Entropy-decode every block of one stream on the host. Returns
        (header, orders, blocks) with blocks = [(start, n, kind, payload)]."""
        header = LinneHeader.unpack(data)
        check_stream_capacity(header, len(data))
        preset = PRESETS[header.preset]
        cb = get_codebook(preset.coef_freq_table)
        orders = np.asarray(preset.layer_num_params, dtype=np.int32)
        nch = header.num_channels
        bps = header.bits_per_sample

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
                if native.available():
                    try:
                        unpacked = native.unpack_compress_payload(
                            payload, cb.node0_array, cb.node1_array, cb.root,
                            cb.num_symbols, nch, n, bps, orders)
                    except native.StreamDecodeError as e:
                        raise FormatError(str(e)) from e
                else:
                    unpacked = self._unpack_payload_py(
                        payload, nch, n, bps, preset.layer_num_params, cb)
                blocks.append((progress, n, "compress", unpacked))
            offset += bh.total_size
            progress += n
        if progress < header.num_samples:
            # a cleanly-truncated body must not decode to a silently
            # zero-filled tail (same contract as the native stream scan)
            raise FormatError(
                f"stream body ends after {progress} of "
                f"{header.num_samples} samples")
        return header, orders, blocks

    @staticmethod
    def _unpack_payload_py(payload, nch, n, bps, layer_num_params, cb):
        """Pure-python compress-payload unpack in the same tuple layout as
        native.unpack_compress_payload (no-compiler fallback)."""
        from ..format.block import read_compress_payload

        side, residual_list, consumed = read_compress_payload(
            payload, nch, n, bps, layer_num_params, cb)
        residuals = np.stack(residual_list)
        coefs = np.stack([
            np.concatenate(side.coefs[ch]).astype(np.int32)
            for ch in range(nch)])
        log2u = np.asarray(
            [[(u - 1).bit_length() for u in side.num_units[ch]]
             for ch in range(nch)], np.int32)
        rshifts = np.asarray(side.rshifts, np.int32)
        pprev = np.asarray(
            [[pc[0] for pc in side.preemph[ch]] for ch in range(nch)],
            np.int32)
        pcoef = np.asarray(
            [[pc[1] for pc in side.preemph[ch]] for ch in range(nch)],
            np.int32)
        return (residuals, coefs, log2u, rshifts, pprev, pcoef, consumed)

    # -- device synthesis stage ----------------------------------------------

    def _synthesize_pooled(self, streams) -> dict:
        """Pooled synthesis materialized per block: {(si, block_idx):
        planes [nch, n]} of reconstructed (pre-de-emphasis) planes (the
        no-compiler assemble path; production uses _synthesize_pooled_rows
        + native.finish_rows to keep the host stage off the GIL)."""
        planes = {}
        for n, host_R, members in self._synthesize_pooled_rows(streams):
            nch = streams[0][1].num_channels
            for pos, (si, i) in enumerate(members):
                planes[(si, i)] = np.ascontiguousarray(
                    host_R[pos * nch : (pos + 1) * nch, :n])
        return planes

    def _synthesize_pooled_rows(self, streams) -> list:
        """Run the reversed layer cascade for every compress block of every
        stream in `streams` = [(si, header, orders, blocks)], with all rows
        pooled into shared device launches. All streams must share the same
        preset (orders) and channel count. Returns one entry per block
        length: (n, host_R [rows, >=n], members [(si, block_idx)]), where
        block (si, i) at position pos owns the nch consecutive rows
        starting at pos * nch."""
        if not streams:
            return []
        orders = streams[0][2]
        nch = streams[0][1].num_channels
        bps = streams[0][1].bits_per_sample
        W = _download_width(bps)

        compress = []  # (si, block_idx, unpacked)
        for si, _header, _orders, blocks in streams:
            for i, (_s, _n, kind, b) in enumerate(blocks):
                if kind == "compress":
                    compress.append((si, i, b))
        by_key = {(si, i): b for si, i, b in compress}
        planes = {(si, i): b[0] for si, i, b in compress}  # residual [nch, n]
        out_groups = []
        by_len = {}
        for si, i, _b in compress:
            by_len.setdefault(planes[(si, i)].shape[1], []).append((si, i))
        for n, members_n in by_len.items():
            rowmap = {}  # (si, block, ch) -> row index in the device tensor
            stackrows = []
            for si, i in members_n:
                for ch in range(nch):
                    rowmap[(si, i, ch)] = len(stackrows)
                    stackrows.append(planes[(si, i)][ch])
            stacked = np.stack(stackrows)                  # [rows, n] int32
            # residuals of compress blocks are almost always int16-sized:
            # upload a half-width plane and patch the rare wide rows with
            # one sparse int32 update (H2D is a decode bottleneck through
            # the tunnel)
            wide_up = np.nonzero(
                (stacked.max(axis=1) > 32767)
                | (stacked.min(axis=1) < -32768))[0]
            up16 = stacked.astype(np.int16)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                ndev = int(np.prod(self.mesh.devices.shape))
                pad = (-up16.shape[0]) % ndev
                if pad:
                    up16 = np.concatenate(
                        [up16, np.zeros((pad, up16.shape[1]), np.int16)])
                up16 = jax.device_put(up16, NamedSharding(
                    self.mesh, PartitionSpec(self.mesh.axis_names[0], None)))
            R = jnp.asarray(up16).astype(jnp.int32)
            if wide_up.size:
                # pow-2 padding bounds per-size executable specializations
                m = 1 << (int(wide_up.size) - 1).bit_length()
                idx = np.concatenate(
                    [wide_up,
                     np.full(m - wide_up.size, wide_up[-1], wide_up.dtype)])
                R = R.at[jnp.asarray(idx)].set(jnp.asarray(stacked[idx]))
            for li in range(len(orders) - 1, -1, -1):
                base_off = int(orders[:li].sum())
                groups = {}
                for si, i in members_n:
                    log2u = by_key[(si, i)][2]
                    for ch in range(nch):
                        u = 1 << int(log2u[ch, li])
                        npu = int(orders[li]) // u
                        ns = n // u
                        if ns <= npu:
                            continue
                        groups.setdefault((u, ns, npu), []).append((si, i, ch))
                for (u, ns, npu), members in groups.items():
                    crows = []
                    rsrows = []
                    idx = []
                    for si, i, ch in members:
                        _r, coefs, _l2, rshifts, _pp, _pc, _c = by_key[(si, i)]
                        idx.append(rowmap[(si, i, ch)])
                        crows.append(
                            coefs[ch, base_off : base_off + orders[li]]
                            .reshape(u, npu))
                        rsrows.append(np.full(u, rshifts[ch, li], np.int32))
                    # pad members to the next power of two: bounds the jit
                    # specializations per (u, ns, npu) to log2(rows) instead
                    # of one per distinct corpus composition (duplicate rows
                    # re-synthesize the same values — scatter is idempotent)
                    m = 1 << (len(members) - 1).bit_length()
                    while len(idx) < m:
                        idx.append(idx[-1])
                        crows.append(crows[-1])
                        rsrows.append(rsrows[-1])
                    step = _group_step(u, ns, npu, m)
                    R = step(R, jnp.asarray(np.asarray(idx, np.int32)),
                             jnp.asarray(np.concatenate(crows, axis=0)),
                             jnp.asarray(np.concatenate(rsrows, axis=0)))
            # slim download: W-bit packed plane + per-row overflow flag.
            # Large pools stream down in row chunks with the host unpack
            # overlapped against the next chunk's transfer (the download is
            # the pooled path's wall through a tunnel-attached device,
            # docs/PROFILE_r4.md) — a puller thread fetches chunk k+1 while
            # the GIL-released native unpack consumes chunk k.
            from ..ops.bitpack import pack_geometry
            from .encoder import TpuEncoder

            packed = _pack_download(R, W=W)
            g, _wpg = pack_geometry(W)
            width = ((n + g - 1) // g) * g
            rows_total = int(packed.shape[0])
            if rows_total > 2 * _DL_CHUNK_ROWS and native.available():
                import queue
                import threading

                starts = list(range(0, rows_total, _DL_CHUNK_ROWS))
                slices = [packed[s : s + _DL_CHUNK_ROWS] for s in starts]
                for sl in slices:  # overlap the chunk RPCs, don't sum them
                    try:
                        sl.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        pass
                q: "queue.Queue" = queue.Queue(maxsize=2)

                def _pull():
                    for k, sl in enumerate(slices):
                        q.put((k, np.asarray(sl)))

                threading.Thread(target=_pull, daemon=True).start()
                parts: list = [None] * len(slices)
                wide_mask = np.zeros(rows_total, dtype=np.int32)
                for _ in slices:
                    k, hostk = q.get()
                    parts[k] = native.unpack_bits(hostk[:, 1:], W, width)
                    wide_mask[starts[k] : starts[k] + hostk.shape[0]] = (
                        hostk[:, 0])
                host_R = np.vstack(parts)
                host = None
            else:
                host = np.asarray(packed)
                wide_mask = host[:, 0]
                if native.available():
                    host_R = native.unpack_bits(host[:, 1:], W, width)
                else:
                    host_R = TpuEncoder._unpack_res(host[:, 1:], W)
            wide = np.nonzero(wide_mask)[0]
            if wide.size:
                m = 1 << (int(wide.size) - 1).bit_length()
                idx = np.concatenate(
                    [wide, np.full(m - wide.size, wide[-1], wide.dtype)])
                rows32 = np.asarray(R[jnp.asarray(idx)])
                for k, row in enumerate(wide):
                    host_R[row, :n] = rows32[k]
            out_groups.append((n, host_R, members_n))
        return out_groups

    # -- host finishing stage ------------------------------------------------

    @staticmethod
    def _assemble_rows(header, blocks, groups, si) -> List[np.ndarray]:
        """Native finishing: ONE GIL-released linne_finish_rows call per
        (stream, block-length group) scatters the synthesized rows into the
        output planes and runs de-emphasis + MS inverse. This keeps the
        pooled decode's host stage at a handful of Python ops per stream —
        per-(block, channel) round trips each pay a GIL scheduler wait when
        a companion workload loads the core (the decode-under-load regime,
        docs/PROFILE_r4.md)."""
        nch = header.num_channels
        out = np.zeros((nch, header.num_samples), dtype=np.int32)
        ms = header.ch_process_method == CH_PROCESS_MS
        for idx, (start, n, kind, b) in enumerate(blocks):
            if kind == "raw":
                for ch in range(nch):
                    out[ch, start : start + n] = b[ch]
        for n, host_R, members in groups:
            mine = [(pos, i) for pos, (s, i) in enumerate(members)
                    if s == si]
            if not mine:
                continue
            row0 = np.asarray([pos * nch for pos, _ in mine], np.int32)
            starts = np.asarray([blocks[i][0] for _, i in mine], np.int64)
            pprev = np.ascontiguousarray(
                np.stack([blocks[i][3][4] for _, i in mine]), dtype=np.int32)
            pcoef = np.ascontiguousarray(
                np.stack([blocks[i][3][5] for _, i in mine]), dtype=np.int32)
            native.finish_rows(host_R, row0, starts, n, pprev, pcoef, out, ms)
        return [out[ch] for ch in range(nch)]

    @staticmethod
    def _assemble(header, blocks, planes, si) -> List[np.ndarray]:
        nch = header.num_channels
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
            plane = planes[(si, idx)]
            for ch in range(nch):
                if native.available():
                    native.deemphasis(plane[ch], pprev[ch], pcoef[ch])
                else:
                    from ..exact.filters import multistage_deemphasis

                    multistage_deemphasis(
                        plane[ch], n,
                        ((int(pprev[ch, 0]), int(pcoef[ch, 0])),
                         (int(pprev[ch, 1]), int(pcoef[ch, 1]))))
            if header.ch_process_method == CH_PROCESS_MS:
                m = plane[0]
                s = plane[1]
                m -= s >> 1
                s += m
            for ch in range(nch):
                out[ch][start : start + n] = plane[ch]
        return out

    # -- public API ----------------------------------------------------------

    def decode_many(self, datas: Sequence[bytes]) -> List[List[np.ndarray]]:
        """Decode a corpus of .lnn streams with the reconstruction rows of
        ALL streams pooled into shared device launches (grouped by preset +
        channel count — the scan step count stays the same, the lanes
        multiply, so device throughput scales ~linearly with the corpus
        size). Returns one channel list per stream."""
        if len(datas) > 1:
            # streams parse independently; the native payload unpack runs
            # without the GIL, so the host entropy stage threads across
            # streams on multicore hosts
            import os
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                    max_workers=min(len(datas), os.cpu_count() or 1)) as ex:
                parsed = list(ex.map(self._parse_stream, datas))
        else:
            parsed = [self._parse_stream(d) for d in datas]
        classes = {}
        for si, (header, orders, blocks) in enumerate(parsed):
            # bits_per_sample is part of the key: the pooled download width
            # is taken from the class representative, and mixing bps would
            # make higher-bps rows trip the overflow refetch path (lossless
            # but defeats the slim transfer)
            key = (header.preset, header.num_channels, header.bits_per_sample)
            classes.setdefault(key, []).append(si)
        results: List[Optional[List[np.ndarray]]] = [None] * len(datas)
        for sis in classes.values():
            streams = [(si,) + parsed[si] for si in sis]
            if native.available():
                groups = self._synthesize_pooled_rows(streams)
                for si in sis:
                    header, _orders, blocks = parsed[si]
                    results[si] = self._assemble_rows(
                        header, blocks, groups, si)
            else:
                planes = self._synthesize_pooled(streams)
                for si in sis:
                    header, _orders, blocks = parsed[si]
                    results[si] = self._assemble(header, blocks, planes, si)
        self.header = parsed[-1][0] if parsed else None
        return results

    def decode_whole(self, data: bytes) -> List[np.ndarray]:
        return self.decode_many([data])[0]

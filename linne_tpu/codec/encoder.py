"""Batched TPU encoder — the production analysis path.

Whole tracks are split into [blocks, channels, block_len] tensors and every
block is analyzed in ONE jitted device dispatch (estimator, MS transform,
pre-emphasis, ridge/unit sweeps, Levinson-Durbin, quantization, integer
predict cascade, Rice parameter search); the host then only packs bits.

Emitted streams are always losslessly decodable by the reference decoder
(integer predict/Rice semantics are wire-exact); float analysis runs in
float64 on CPU (near-reference coefficient parity) or float32 on TPU, which
may select slightly different coefficients than the C encoder — compression
differs by a hair, losslessness never (the residual is recomputed from the
quantized integers on device, mirroring linne_encoder.c:686-696).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .. import ops  # noqa: F401  (enables x64)
from ..constants import (
    BLOCK_TYPE_COMPRESS,
    BLOCK_TYPE_RAW,
    BLOCK_TYPE_SILENT,
    CH_PROCESS_MS,
    LOG2_NUM_UNITS_BITWIDTH,
    LPC_COEF_BITWIDTH,
    NUM_PREEMPH_FILTERS,
    PREEMPH_COEF_SHIFT,
    RSHIFT_BITWIDTH,
)
from ..format.bitstream import BitWriter
from ..format.block import frame_block, write_raw_payload
from ..format.header import LinneHeader
from ..format.huffman import get_codebook
from ..format.rice import encode_plane_with_params
from ..format.zigzag import zigzag_encode_array, zigzag_encode_scalar
from .. import native
from ..ops import analysis as A
from ..ops import intops as I
from ..ops import rice_search as R
from ..presets import PRESETS
from .params import EncodeParameter, EncoderConfig

_RAW_THRESHOLD = float(np.float32(0.95))


def _roundup(val: int, n: int) -> int:
    return ((val + n - 1) // n) * n


def default_analysis_dtype():
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return jnp.float64 if platform == "cpu" else jnp.float32


class TpuEncoder:
    """Batched block encoder. API mirrors the reference encoder handle
    (reference: include/linne_encoder.h:35-61) with a batched core."""

    def __init__(self, config: Optional[EncoderConfig] = None,
                 analysis_dtype=None, batch_blocks: int = 16):
        self.config = config or EncoderConfig()
        self.config.validate()
        self.dtype = analysis_dtype or default_analysis_dtype()
        self.batch_blocks = batch_blocks
        self.parameter: Optional[EncodeParameter] = None
        self.preset = None
        self.codebook = None
        self._analyze_cache = {}

    def set_encode_parameter(self, parameter: EncodeParameter) -> None:
        parameter.validate_against(self.config)
        if parameter.enable_learning or parameter.num_afmethod_iterations:
            raise NotImplementedError(
                "learning/AF refinement not yet on the fast path; "
                "use linne_tpu.exact.ExactEncoder")
        self.parameter = parameter
        self.preset = PRESETS[parameter.preset]
        self.codebook = get_codebook(self.preset.coef_freq_table)
        self._analyze_cache = {}

    # -- the jitted per-batch analysis -------------------------------------

    def _analyze_fn(self, n: int):
        """Build (and cache) the jitted analysis function for block length
        n. All loop structure (ridges, layers, unit candidates) is static."""
        key = n
        fn = self._analyze_cache.get(key)
        if fn is not None:
            return fn

        p = self.parameter
        preset = self.preset
        dtype = self.dtype
        num_analyze = _roundup(n, 1 << LOG2_NUM_UNITS_BITWIDTH)
        num_analyze = min(p.num_samples_per_block,
                          max(preset.max_num_params, num_analyze))
        orders = preset.layer_num_params
        ridges = preset.ridge_terms
        unit_choices = [A.candidate_units(o, num_analyze) for o in orders]
        ms = p.ch_process_method == CH_PROCESS_MS
        bps = p.bits_per_sample

        @jax.jit
        def analyze(blocks):  # [B, C, max(n, num_analyze)] int16/int32
            blocks = blocks.astype(jnp.int32)
            raw_sig = I.normalize_to_float(blocks[..., :n], bps, dtype)
            est = A.estimate_code_length(raw_sig, orders[0], bps)
            mean_est = jnp.sum(est, axis=-1) / est.shape[-1] / bps
            raw_flag = mean_est >= _RAW_THRESHOLD
            silent_flag = ~jnp.any(blocks[..., :n] != 0, axis=(-2, -1))

            buf = I.ms_transform(blocks) if ms else blocks
            prevs = []
            coefs = []
            for _stage in range(NUM_PREEMPH_FILTERS):
                prev = buf[..., 0]
                body = buf[..., :n]
                coef = I.preemphasis_coefficient(body, dtype)
                body = I.preemphasis_apply(body, coef)
                buf = jnp.concatenate([body, buf[..., n:]], axis=-1)
                prevs.append(prev)
                coefs.append(coef)
            preemph_prev = jnp.stack(prevs, axis=-1)
            preemph_coef = jnp.stack(coefs, axis=-1)

            sig = I.normalize_to_float(buf[..., :num_analyze], bps, dtype)
            log2u, params = A.fit_network(sig, orders, ridges)

            int_coefs = []
            rshifts = []
            for li in range(len(orders)):
                ic, rs = A.quantize_coefficients(params[li], LPC_COEF_BITWIDTH)
                int_coefs.append(ic)
                rshifts.append(rs)

            x = buf[..., :n]
            for li in range(len(orders)):
                x = I.predict_cascade_layer(
                    x, int_coefs[li], log2u[li], rshifts[li],
                    unit_choices[li])
            porder, k2s = R.rice_search(
                x, jnp.float64 if dtype == jnp.float64 else jnp.float32)
            # compact transfer types: the tunnel D2H link is the scarce
            # resource, not device memory
            res16 = jnp.clip(x, -32768, 32767).astype(jnp.int16)
            res_overflow = jnp.any(
                (x > 32767) | (x < -32768), axis=(-2, -1))
            return dict(
                raw=raw_flag, silent=silent_flag,
                preemph_prev=preemph_prev, preemph_coef=preemph_coef,
                log2_units=[u.astype(jnp.int8) for u in log2u],
                rshifts=[r.astype(jnp.int8) for r in rshifts],
                int_coefs=[c.astype(jnp.int8) for c in int_coefs],
                residual=x, residual16=res16, res_overflow=res_overflow,
                rice_porder=porder.astype(jnp.int8),
                rice_k2=k2s.astype(jnp.int8),
            )

        self._analyze_cache[key] = (analyze, num_analyze)
        return self._analyze_cache[key]

    # -- serialization ------------------------------------------------------

    def _write_compress_payload(self, out, block_idx: int, n: int) -> bytes:
        p = self.parameter
        nch = p.num_channels
        if native.available():
            nlayers = self.preset.num_layers
            coefs = np.concatenate(
                [np.asarray(out["int_coefs"][li][block_idx])
                 for li in range(nlayers)], axis=-1)
            log2u = np.stack(
                [np.asarray(out["log2_units"][li][block_idx])
                 for li in range(nlayers)], axis=-1).astype(np.int32)
            rshift = np.stack(
                [np.asarray(out["rshifts"][li][block_idx])
                 for li in range(nlayers)], axis=-1).astype(np.int32)
            return native.pack_compress_payload(
                np.asarray(out["residual"][block_idx][:, :n]),
                coefs, log2u, rshift,
                np.asarray(out["preemph_prev"][block_idx]),
                np.asarray(out["preemph_coef"][block_idx]),
                np.asarray(out["rice_porder"][block_idx]),
                np.asarray(out["rice_k2"][block_idx]),
                self.codebook.codes_array, self.codebook.lens_array,
                p.bits_per_sample,
                np.asarray(self.preset.layer_num_params, dtype=np.int32))
        w = BitWriter()
        pprev = np.asarray(out["preemph_prev"][block_idx])
        pcoef = np.asarray(out["preemph_coef"][block_idx])
        for ch in range(nch):
            for stage in range(NUM_PREEMPH_FILTERS):
                w.put(zigzag_encode_scalar(int(pprev[ch, stage])),
                      p.bits_per_sample + 1)
                w.put(int(pcoef[ch, stage]), PREEMPH_COEF_SHIFT - 1)
        nlayers = self.preset.num_layers
        log2u = [np.asarray(out["log2_units"][li][block_idx])
                 for li in range(nlayers)]
        rshift = [np.asarray(out["rshifts"][li][block_idx])
                  for li in range(nlayers)]
        coefs = [np.asarray(out["int_coefs"][li][block_idx])
                 for li in range(nlayers)]
        for ch in range(nch):
            for li in range(nlayers):
                w.put(int(log2u[li][ch]), LOG2_NUM_UNITS_BITWIDTH)
                w.put(int(rshift[li][ch]), RSHIFT_BITWIDTH)
                for u in zigzag_encode_array(coefs[li][ch]).tolist():
                    self.codebook.put(w, u)
        residual = np.asarray(out["residual"][block_idx])
        porder = np.asarray(out["rice_porder"][block_idx])
        k2s = np.asarray(out["rice_k2"][block_idx])
        for ch in range(nch):
            encode_plane_with_params(
                w, residual[ch, :n], int(porder[ch]), k2s[ch])
        w.flush()
        return w.getvalue()

    # -- public API ---------------------------------------------------------

    def encode_whole(self, channels: Sequence[np.ndarray],
                     num_samples: int) -> bytes:
        if self.parameter is None:
            raise RuntimeError("set_encode_parameter not called")
        p = self.parameter
        spb = p.num_samples_per_block
        header = LinneHeader(
            num_channels=p.num_channels, num_samples=num_samples,
            sampling_rate=p.sampling_rate, bits_per_sample=p.bits_per_sample,
            num_samples_per_block=spb, preset=p.preset,
            ch_process_method=p.ch_process_method)
        out = bytearray(header.pack())

        num_full = num_samples // spb
        tail = num_samples - num_full * spb
        signal = np.stack([np.asarray(c[:num_samples], dtype=np.int32)
                           for c in channels[: p.num_channels]])

        # Pipeline: dispatch every batch to the device up front (JAX runs
        # them asynchronously), then drain in order — transfers and host
        # packing of batch i overlap device compute of batch i+1.
        pending = []
        if num_full:
            blocks = signal[:, : num_full * spb].reshape(
                p.num_channels, num_full, spb).transpose(1, 0, 2)
            bb = self.batch_blocks
            for start in range(0, num_full, bb):
                chunk = blocks[start : start + bb]
                real = chunk.shape[0]
                if real < bb:
                    # pad to the standard batch shape to avoid an extra
                    # compile specialization; padded rows are dropped below
                    pad = np.zeros((bb - real,) + chunk.shape[1:], np.int32)
                    chunk = np.concatenate([chunk, pad], axis=0)
                pending.append(self._dispatch_batch(chunk, spb, real))
        if tail:
            fn, num_analyze = self._analyze_fn(tail)
            width = max(tail, num_analyze)
            tail_block = np.zeros((1, p.num_channels, width), dtype=np.int32)
            tail_block[0, :, :tail] = signal[:, num_full * spb :]
            pending.append(self._dispatch_batch(tail_block, tail))
        for item in pending:
            out += self._drain_batch(*item)
        return bytes(out)

    def _dispatch_batch(self, blocks: np.ndarray, n: int,
                        real_count: Optional[int] = None):
        """Asynchronously launch analysis of one [B, C, >=n] batch."""
        fn, num_analyze = self._analyze_fn(n)
        width = max(n, num_analyze)
        if blocks.shape[-1] < width:
            pad = np.zeros(blocks.shape[:-1] + (width - blocks.shape[-1],),
                           dtype=np.int32)
            blocks = np.concatenate([blocks, pad], axis=-1)
        real = blocks.shape[0] if real_count is None else real_count
        if self.parameter.bits_per_sample <= 16:
            blocks_dev = blocks.astype(np.int16)  # halve H2D traffic
        else:
            blocks_dev = blocks
        return fn(jnp.asarray(blocks_dev)), blocks, n, real

    def _encode_batch(self, blocks: np.ndarray, n: int) -> bytes:
        """blocks: [B, C, >=n] int32; returns framed block bytes."""
        return self._drain_batch(*self._dispatch_batch(blocks, n))

    def _drain_batch(self, out_dev, blocks: np.ndarray, n: int,
                     real: int) -> bytes:
        p = self.parameter
        # Selective pulls: fetch the compact residual plane and fall back to
        # the int32 plane only for blocks that overflowed int16.
        pulled = {k: out_dev[k] for k in out_dev if k != "residual"}
        pulled = jax.tree_util.tree_map(np.asarray, pulled)
        overflow = pulled.pop("res_overflow")
        res = pulled.pop("residual16").astype(np.int32)
        for b in np.nonzero(overflow[:real])[0]:
            res[b] = np.asarray(out_dev["residual"][b])
        pulled["residual"] = res
        out_dev = pulled

        chunks = []
        raw = out_dev["raw"]
        silent = out_dev["silent"]
        for b in range(real):
            if raw[b]:
                payload = write_raw_payload(
                    [blocks[b, ch, :n] for ch in range(p.num_channels)],
                    p.bits_per_sample)
                btype = BLOCK_TYPE_RAW
            elif silent[b]:
                payload = b""
                btype = BLOCK_TYPE_SILENT
            else:
                payload = self._write_compress_payload(out_dev, b, n)
                btype = BLOCK_TYPE_COMPRESS
            chunks.append(frame_block(btype, n, payload))
        return b"".join(chunks)

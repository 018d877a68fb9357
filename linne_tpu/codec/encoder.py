"""Batched TPU encoder — the production analysis path.

Whole tracks are split into [blocks, channels, block_len] tensors and every
block is analyzed in ONE jitted device dispatch (estimator, MS transform,
pre-emphasis, ridge/unit sweeps, Levinson-Durbin, quantization, integer
predict cascade, Rice parameter search); the host then only packs bits.

Emitted streams are always losslessly decodable by the reference decoder
(integer predict/Rice semantics are wire-exact); float analysis runs in
float64 on CPU (near-reference coefficient parity) or float32 on TPU, which
may select slightly different coefficients than the C encoder — compression
differs measurably by <=0.01 percentage points of size (eval corpus, all of
-m, -l, -a 3: docs/PROFILE_r3.md), losslessness never (the residual is
recomputed from the quantized integers on device, mirroring
linne_encoder.c:686-696).
"""

from __future__ import annotations


from typing import List, Optional, Sequence

import numpy as np

import functools

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
from .params import EncodeParameter, EncoderConfig, compress_viable

_RAW_THRESHOLD = float(np.float32(0.95))


def _roundup(val: int, n: int) -> int:
    return ((val + n - 1) // n) * n


def _res_width_classes(bps: int) -> tuple:
    """Allowed bit widths of the device->host residual plane, widest first.
    D2H bandwidth is the encode bottleneck (docs/PROFILE_r2.md): residuals
    of compressible material fit well under the sample width, so the plane
    carries W bits per sample (two's complement). W adapts per batch: the
    device reports each block's minimal width (res_maxw in the side tensor)
    and the host dispatches the next batch at the smallest class covering
    the previous one (quiet material saves up to ~29% of the dominant
    transfer; docs/PROFILE_r3.md). Blocks that exceed the dispatched W fall
    back to full int32 rows (per-block width check, see _drain_batch).
    The class list is kept short: each class compiles its own finish-stage
    executable (persistent-cached)."""
    return (14, 12, 10) if bps <= 16 else (24, 20)


def _res_pack_width(bps: int) -> int:
    """Widest (startup/default) residual-plane class."""
    return _res_width_classes(bps)[0]


# shared with the batched decoder's reconstruction download
from ..ops.bitpack import pack_geometry as _pack_geometry  # noqa: E402


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
                 analysis_dtype=None, batch_blocks: int = 64, mesh=None,
                 tail_mode: str = "auto"):
        """`mesh`: an optional jax.sharding.Mesh with a 'blocks' axis. When
        set, every dispatched batch is sharded over it — blocks are fully
        independent (SURVEY.md §2, linne_encoder.c:637), so the analysis
        partitions with zero collectives and output bytes are identical to
        the single-device encode.

        `tail_mode`: how partial trailing blocks (length < num_samples_per_
        block) are encoded. Each DISTINCT tail length needs its own device
        compilation — ~4 minutes cold through the remote-TPU tunnel — while
        the bit-exact host encoder handles one such block in 0.07-0.25 s
        (native exact helpers, linne_host.cpp).
        "host" always uses the host encoder, "device" always compiles,
        "auto" (default) uses the host unless a compiled function for that
        length already exists. The rule depends only on tail length and
        cached-compile presence, so encode_whole and encode_many emit the
        same bytes for the same input."""
        self.config = config or EncoderConfig()
        self.config.validate()
        self.dtype = analysis_dtype or default_analysis_dtype()
        self.batch_blocks = batch_blocks
        self.mesh = mesh
        if mesh is not None:
            ndev = int(np.prod(mesh.devices.shape))
            self.batch_blocks = _roundup(batch_blocks, ndev)
        if tail_mode not in ("auto", "device", "host"):
            raise ValueError(f"tail_mode {tail_mode!r}")
        self.tail_mode = tail_mode
        self.parameter: Optional[EncodeParameter] = None
        self.preset = None
        self.codebook = None
        self._analyze_cache = {}
        self._maxw_seen = {}  # block length -> widest residual seen

    def set_encode_parameter(self, parameter: EncodeParameter) -> None:
        parameter.validate_against(self.config)
        self.parameter = parameter
        self.preset = PRESETS[parameter.preset]
        self.codebook = get_codebook(self.preset.coef_freq_table)
        self._analyze_cache = {}
        self._maxw_seen = {}

    # -- the jitted per-batch analysis -------------------------------------

    def _analyze_fn(self, n: int):
        """Build (and cache) the analysis pipeline for block length n.

        The pipeline is a CHAIN of jitted stages (pre-processing, one fit
        per layer, finish) rather than one mega-jit: the stages dispatch
        asynchronously back-to-back (no host sync between them, so the
        chain costs one round trip like a single call would), while each
        sub-graph compiles 10-50x faster than the fused whole."""
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
        nridge = len(ridges)
        unit_choices = [A.candidate_units(o, num_analyze) for o in orders]
        ms = p.ch_process_method == CH_PROCESS_MS
        bps = p.bits_per_sample

        @jax.jit
        def pre_stage(blocks):  # [B, C, max(n, num_analyze)] int16/int32
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
            # ridge axis rides through the layer fits as a batch dimension
            sig_r = jnp.broadcast_to(sig[None], (nridge,) + sig.shape)
            return (raw_flag, silent_flag, preemph_prev, preemph_coef,
                    buf, sig_r)

        ridge_vec = np.asarray(ridges, dtype=np.float64)

        def make_fit_stage(order):
            @jax.jit
            def fit_stage(sig_r):
                rv = jnp.asarray(ridge_vec, dtype=sig_r.dtype).reshape(
                    (nridge,) + (1,) * (sig_r.ndim - 1))
                log2u, flat, res, loss = A.fit_layer(sig_r, order, rv)
                return log2u, flat, res, loss
            return fit_stage

        fit_stages = [make_fit_stage(o) for o in orders]

        def _select(final_res, log2u_r, params_r):
            # (also exposes the winning ridge index for the AF chain)
            # select the winning ridge (first minimum, as the reference's
            # strict-< sweep) and gather its per-layer selections
            final_loss = jnp.sum(jnp.abs(final_res), axis=-1) / final_res.shape[-1]
            best = jnp.argmin(final_loss, axis=0)
            log2u = []
            params = []
            for li in range(len(orders)):
                log2u.append(jnp.take_along_axis(
                    log2u_r[li], best[None], axis=0)[0])
                params.append(jnp.take_along_axis(
                    params_r[li], best[None][..., None], axis=0)[0])
            return log2u, params, best

        @jax.jit
        def select_stage(final_res, log2u_r, params_r):
            log2u, params, best = _select(final_res, log2u_r, params_r)
            rv = jnp.asarray(ridge_vec, dtype=dtype)
            return log2u, params, rv[best]

        if p.enable_learning:
            from ..constants import (
                TRAINING_LEARNING_RATE,
                TRAINING_LOSS_EPSILON,
                TRAINING_MAX_NUM_ITERATIONS,
            )
            from ..ops.training import make_train_fn

            train_core = make_train_fn(
                orders, unit_choices, TRAINING_MAX_NUM_ITERATIONS,
                TRAINING_LEARNING_RATE, TRAINING_LOSS_EPSILON)

            # Train only the first R rows (static). Padding rows of a
            # partial batch carry no emitted blocks, and training is
            # per-row independent (masked freezing; the row-position
            # independence is what already makes encode_many's cross-track
            # batch compositions byte-equal to encode_whole), so slicing
            # the trained population to a pow-2 cover of the real rows
            # shrinks the while_loop body with identical output bytes.
            @functools.partial(jax.jit, static_argnames="R")
            def train_fn(sig, params_sel, log2u_sel, R):
                trained = train_core(
                    sig[:R], [q[:R] for q in params_sel],
                    [l[:R] for l in log2u_sel])
                return [jnp.concatenate([t, q[R:]], axis=0)
                        if R < q.shape[0] else t
                        for t, q in zip(trained, params_sel)]
        else:
            train_fn = None

        if p.num_afmethod_iterations > 0:
            from ..ops.afmethod import make_af_layer_stage

            af_stages = [
                make_af_layer_stage(o, unit_choices[li],
                                    p.num_afmethod_iterations)
                for li, o in enumerate(orders)]
        else:
            af_stages = None

        def _finish(raw_flag, silent_flag, preemph_prev, preemph_coef,
                    buf, log2u, params, W):
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
            # minimal two's-complement width of the block's residuals:
            # x fits w iff -2^(w-1) <= x < 2^(w-1). The host derives the
            # overflow fallback (res_maxw > W) AND picks the next batch's
            # pack width class from it (adaptive W, docs/PROFILE_r3.md).
            m = jnp.maximum(jnp.max(x, axis=(-2, -1)),
                            -jnp.min(x, axis=(-2, -1)) - 1)
            res_maxw = jnp.where(m > 0, 32 - jax.lax.clz(m), 0) + 1
            B = x.shape[0]
            C = x.shape[1]

            def bc1(v):  # [B] -> [B, C, 1]
                return jnp.broadcast_to(
                    v.astype(jnp.int32)[:, None, None], (B, C, 1))

            def pack_bytes(a):
                # [..., K] int32 byte-range values -> [..., ceil(K/4)] int32
                # (4 bytes per word: the k2/coef planes are the bulk of the
                # side info, and D2H bandwidth is the encode bottleneck)
                k = a.shape[-1]
                pad = (-k) % 4
                if pad:
                    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
                b = (a & 0xFF).astype(jnp.uint32).reshape(
                    a.shape[:-1] + ((k + pad) // 4, 4))
                w = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
                     | (b[..., 3] << 24))
                return jax.lax.bitcast_convert_type(w, jnp.int32)

            parts = [bc1(raw_flag), bc1(silent_flag), bc1(res_maxw),
                     preemph_prev.astype(jnp.int32),
                     preemph_coef.astype(jnp.int32)]
            for li in range(len(orders)):
                parts.append(log2u[li].astype(jnp.int32)[..., None])
                parts.append(rshifts[li].astype(jnp.int32)[..., None])
            parts.append(porder.astype(jnp.int32)[..., None])
            parts.append(pack_bytes(
                jnp.concatenate([c.astype(jnp.int32) for c in int_coefs],
                                axis=-1)))
            parts.append(pack_bytes(k2s.astype(jnp.int32)))
            side = jnp.concatenate(parts, axis=-1)
            # single-pull packing: the W-bit residual plane rides inside the
            # int32 side tensor so a batch costs ONE host round trip (plus
            # rare overflow fallback rows pulled from the int32 tensor)
            from ..ops.bitpack import pack_plane_words

            res_words = pack_plane_words(x, W)
            packed = jnp.concatenate([side, res_words], axis=-1)
            return dict(packed=packed, residual=x)

        # W is a static arg: each width class gets its own cached executable
        # of the finish stage only — the pre/fit stages are shared across
        # classes (adaptive W recompiles ~1/10th of the chain per class)
        @functools.partial(jax.jit, static_argnames="W")
        def finish_stage(raw_flag, silent_flag, preemph_prev, preemph_coef,
                         buf, log2u, params, W):
            return _finish(raw_flag, silent_flag, preemph_prev, preemph_coef,
                           buf, log2u, params, W)

        @functools.partial(jax.jit, static_argnames="W")
        def select_finish_stage(raw_flag, silent_flag, preemph_prev,
                                preemph_coef, buf, final_res, log2u_r,
                                params_r, W):
            log2u, params, _best = _select(final_res, log2u_r, params_r)
            return _finish(raw_flag, silent_flag, preemph_prev, preemph_coef,
                           buf, log2u, params, W)

        def analyze(blocks, W=None, real_rows=None):
            if W is None:
                W = _res_pack_width(bps)
            (raw_flag, silent_flag, pprev, pcoef, buf, sig_r) = (
                pre_stage(blocks))
            log2u_r = []
            params_r = []
            x = sig_r
            for li in range(len(orders)):
                log2u, flat, res, loss = fit_stages[li](x)
                log2u_r.append(log2u)
                params_r.append(flat)
                x = res
            if af_stages is not None or train_fn is not None:
                log2u_sel, params_sel, ridge_val = select_stage(
                    x, log2u_r, params_r)
                if af_stages is not None:
                    # AF-refined final pass: refit layer-by-layer with IRLS
                    # under the winning ridge, cascading residuals
                    xa = sig_r[0]
                    params_sel = []
                    for li in range(len(orders)):
                        flat, xa = af_stages[li](xa, log2u_sel[li], ridge_val)
                        params_sel.append(flat)
                if train_fn is not None:
                    B = int(sig_r[0].shape[0])
                    R = B
                    if real_rows is not None and real_rows < B:
                        R = 8
                        while R < real_rows:
                            R *= 2
                        R = min(R, B)
                    params_sel = train_fn(sig_r[0], params_sel, log2u_sel,
                                          R=R)
                return finish_stage(raw_flag, silent_flag, pprev, pcoef, buf,
                                    log2u_sel, params_sel, W=W)
            return select_finish_stage(raw_flag, silent_flag, pprev, pcoef,
                                       buf, x, log2u_r, params_r, W=W)

        self._analyze_cache[key] = (analyze, num_analyze)
        return self._analyze_cache[key]

    # -- serialization ------------------------------------------------------

    def _side_layout(self, n: int):
        """Offsets into the packed side-info tensor (see _analyze_fn).
        The coefficient and k2 planes are byte-packed 4-per-word."""
        from ..ops.rice_search import max_porder_for

        L = self.preset.num_layers
        total_order = sum(self.preset.layer_num_params)
        max_parts = 1 << max_porder_for(n)
        # [raw, silent, overflow] flags + pprev/pcoef per pre-emphasis stage
        off_layers = 3 + 2 * NUM_PREEMPH_FILTERS
        off_porder = off_layers + 2 * L
        off_coefw = off_porder + 1
        off_k2w = off_coefw + (total_order + 3) // 4
        side_k = off_k2w + (max_parts + 3) // 4
        return off_layers, off_porder, off_coefw, off_k2w, side_k, max_parts

    def _side_width(self, n: int) -> int:
        return self._side_layout(n)[4]

    def _write_compress_payload(self, pprev, pcoef, log2u, rshift, coefs,
                                porder, k2s,
                                residual_b: np.ndarray, n: int) -> bytes:
        """All side arrays are per-block [C, ...] int32; residual [C, n]."""
        p = self.parameter
        nch = p.num_channels
        orders = self.preset.layer_num_params
        L = self.preset.num_layers
        if native.available():
            return native.pack_compress_payload(
                residual_b, coefs, log2u, rshift, pprev, pcoef,
                porder, k2s,
                self.codebook.codes_array, self.codebook.lens_array,
                p.bits_per_sample,
                np.asarray(orders, dtype=np.int32))
        w = BitWriter()
        for ch in range(nch):
            for stage in range(NUM_PREEMPH_FILTERS):
                w.put(zigzag_encode_scalar(int(pprev[ch, stage])),
                      p.bits_per_sample + 1)
                w.put(int(pcoef[ch, stage]), PREEMPH_COEF_SHIFT - 1)
        for ch in range(nch):
            base = 0
            for li in range(L):
                w.put(int(log2u[ch, li]), LOG2_NUM_UNITS_BITWIDTH)
                w.put(int(rshift[ch, li]), RSHIFT_BITWIDTH)
                layer_coefs = coefs[ch, base : base + orders[li]]
                base += orders[li]
                for u in zigzag_encode_array(layer_coefs).tolist():
                    self.codebook.put(w, u)
        for ch in range(nch):
            encode_plane_with_params(
                w, residual_b[ch], int(porder[ch]), k2s[ch])
        w.flush()
        return w.getvalue()

    # -- public API ---------------------------------------------------------

    def encode_whole(self, channels: Sequence[np.ndarray],
                     num_samples: int, progress_cb=None) -> bytes:
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

        # Bounded pipeline: keep at most PIPELINE_DEPTH batches in flight
        # (dispatch-ahead overlaps transfers/host packing with device
        # compute; unbounded dispatch floods device memory and the transfer
        # queue — measured 20x slowdown on a 10-minute track).
        def gen_batches():
            if num_full:
                blocks = signal[:, : num_full * spb].reshape(
                    p.num_channels, num_full, spb).transpose(1, 0, 2)
                bb = self.batch_blocks
                for start in range(0, num_full, bb):
                    chunk = blocks[start : start + bb]
                    real = chunk.shape[0]
                    cover = self._batch_cover(real)
                    if real < cover:
                        # pad rows are dropped in drain
                        pad = np.zeros((cover - real,) + chunk.shape[1:],
                                       np.int32)
                        chunk = np.concatenate([chunk, pad], axis=0)
                    yield (chunk, spb, real)
            if tail:
                tail_sig = signal[:, num_full * spb :]
                if not compress_viable(self.preset, spb, tail):
                    # too short for any unit split (the reference segfaults
                    # on such tails): frame raw/silent on the host
                    yield self._frame_short_block(tail_sig, tail)
                    return
                if self._use_host_tail(tail):
                    yield self._encode_tail_host(tail_sig, tail)
                    return
                fn, num_analyze = self._analyze_fn(tail)
                width = max(tail, num_analyze)
                tail_block = np.zeros((1, p.num_channels, width),
                                      dtype=np.int32)
                tail_block[0, :, :tail] = tail_sig
                yield (tail_block, tail, None)

        done = 0
        for item in self._pipeline(gen_batches()):
            if isinstance(item, bytes):  # host-framed short block
                out += item
                done = num_samples
            else:
                out += b"".join(self._drain_batch(*item))
                done += item[3] * item[2]  # real blocks * block length
            if progress_cb is not None:
                progress_cb(min(done, num_samples), num_samples)
        return bytes(out)

    PIPELINE_DEPTH = 3

    def _pipeline(self, batch_args):
        """Dispatch ahead by PIPELINE_DEPTH, yielding dispatched items in
        order for draining. Pre-framed bytes (host-encoded short blocks)
        pass through after the batches in flight, preserving block order."""
        from collections import deque

        pending = deque()
        for args in batch_args:
            if isinstance(args, bytes):
                while pending:
                    yield pending.popleft()
                yield args
                continue
            chunk, n, real = args
            if len(pending) >= self.PIPELINE_DEPTH:
                yield pending.popleft()
            pending.append(self._dispatch_batch(chunk, n, real))
        while pending:
            yield pending.popleft()

    def _batch_cover(self, real: int) -> int:
        """Device batch rows for a partial batch of `real` real blocks: the
        pow-2 cover, floored at 8 and capped at batch_blocks. Padding all
        the way to batch_blocks shipped up to 16x the needed bytes for
        short tracks, and transfers are the measured encode bottleneck
        (docs/PROFILE_r2.md/PROFILE_r3.md) — a 5 s track (23 blocks) padded
        to 128 paid 5.5x its H2D+D2H. Rows are independent (the trainer
        already slices to the same cover, ops/training.py), so emitted
        bytes are unchanged; each distinct cover costs one extra compile
        specialization, amortized by the persistent jit cache."""
        c = 8
        while c < real:
            c *= 2
        return min(c, self.batch_blocks)

    def _use_host_tail(self, n: int) -> bool:
        """Whether tail blocks of length n should take the bit-exact host
        encoder instead of compiling a device pipeline for this length (see
        tail_mode in __init__). Depends only on tail length + cached-compile
        presence so encode_whole and encode_many pick the same path for the
        same input (same bytes across the two public entry points)."""
        if self.tail_mode == "host":
            return True
        if self.tail_mode == "device":
            return False
        return n not in self._analyze_cache

    def _encode_tail_host(self, block_sig: np.ndarray, n: int) -> bytes:
        """Frame one partial block via the byte-exact host encoder (same
        wire format, reference-identical coefficient selection).

        Every tail gets a FRESH encoder: the reference encodes each track
        with its own encoder state, so tail bytes must not depend on other
        tracks' (or earlier calls') analysis arena — and standalone blocks
        are order-independent, which lets encode_many overlap tail encoding
        with the device full-block loop on a thread."""
        from ..exact.encoder import ExactEncoder

        enc = ExactEncoder(self.config)
        enc.set_encode_parameter(self.parameter)
        nch = self.parameter.num_channels
        return enc.encode_block(
            [block_sig[c, :n] for c in range(nch)], n)

    def _frame_short_block(self, block_sig: np.ndarray, n: int) -> bytes:
        """Host-framed raw/silent block for lengths with no admissible unit
        split (shorter than the largest layer order — the reference C
        encoder segfaults on these)."""
        p = self.parameter
        if not np.any(block_sig[:, :n]):
            return frame_block(BLOCK_TYPE_SILENT, n, b"")
        payload = write_raw_payload(
            [block_sig[ch, :n] for ch in range(p.num_channels)],
            p.bits_per_sample)
        return frame_block(BLOCK_TYPE_RAW, n, payload)

    def _pick_width(self, n: int) -> int:
        """Residual-plane width class for the next dispatch of length n:
        smallest class covering the widest residual the previous batch of
        this length produced (content is locally stationary; mispredictions
        are lossless via the int32 fallback rows)."""
        classes = _res_width_classes(self.parameter.bits_per_sample)
        seen = self._maxw_seen.get(n)
        if seen is None:
            return classes[0]
        for w in reversed(classes):  # narrowest first
            if w >= seen:
                return w
        return classes[0]

    def _dispatch_batch(self, blocks: np.ndarray, n: int,
                        real_count: Optional[int] = None):
        """Asynchronously launch analysis of one [B, C, >=n] batch."""
        fn, num_analyze = self._analyze_fn(n)
        W = self._pick_width(n)
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
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndev = int(np.prod(self.mesh.devices.shape))
            pad_rows = (-blocks_dev.shape[0]) % ndev
            if pad_rows:
                blocks_dev = np.concatenate(
                    [blocks_dev,
                     np.zeros((pad_rows,) + blocks_dev.shape[1:],
                              blocks_dev.dtype)], axis=0)
            axis = self.mesh.axis_names[0]
            arr = jax.device_put(
                blocks_dev, NamedSharding(self.mesh, P(axis, None, None)))
            return (self._prefetch(fn(arr, W, real_rows=real)),
                    blocks, n, real, W)
        return (self._prefetch(fn(jnp.asarray(blocks_dev), W,
                                  real_rows=real)),
                blocks, n, real, W)

    @staticmethod
    def _prefetch(out):
        """Start the D2H copy of the packed tensor as soon as the device
        finishes it, so the drain's np.asarray overlaps with host packing of
        earlier batches instead of serializing on the transfer."""
        try:
            out["packed"].copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return out

    def _encode_batch(self, blocks: np.ndarray, n: int) -> bytes:
        """blocks: [B, C, >=n] int32; returns framed block bytes."""
        return b"".join(self._drain_batch(*self._dispatch_batch(blocks, n)))

    def encode_block(self, channels: Sequence[np.ndarray], n: int) -> bytes:
        """Encode ONE framed block (API parity with
        LINNEEncoder_EncodeBlock, include/linne_encoder.h). For throughput
        use encode_whole/encode_many — they batch blocks per dispatch."""
        p = self.parameter
        block = np.zeros((1, p.num_channels, n), dtype=np.int32)
        for c in range(p.num_channels):
            block[0, c] = np.asarray(channels[c][:n], dtype=np.int32)
        if not compress_viable(self.preset, p.num_samples_per_block, n):
            return self._frame_short_block(block[0], n)
        if n < p.num_samples_per_block and self._use_host_tail(n):
            return self._encode_tail_host(block[0], n)
        return self._encode_batch(block, n)

    def encode_many(self, tracks: Sequence[Sequence[np.ndarray]],
                    num_samples: Sequence[int]) -> List[bytes]:
        """Encode a corpus: full blocks from ALL tracks are batched together
        (the TPU payoff — thousands of independent blocks per dispatch),
        tails are grouped by length. Returns one .lnn byte string per
        track. Tail handling follows the same rule as encode_whole
        (_use_host_tail), so the two APIs produce identical bytes for the
        same input.

        Measured regimes (docs/PROFILE_r3.md): on many SHORT tracks the
        cross-track batching wins decisively (64 x 1.9 s tracks, mode 7:
        13.5x over per-track encode_whole — short tracks underfill and pad
        per-track batches); on long tracks the two are equivalent through
        the tunnel (the transfer floor hides the batching payoff)."""
        p = self.parameter
        spb = p.num_samples_per_block
        nch = p.num_channels

        track_signals = []
        placements = []  # (track, block_index_in_track) in global block order
        all_full = []
        tails = {}  # length -> list of (track_idx, block_idx, data)
        for ti, (chans, ns) in enumerate(zip(tracks, num_samples)):
            sig = np.stack([np.asarray(c[:ns], dtype=np.int32)
                            for c in chans[:nch]])
            track_signals.append((sig, ns))
            nfull = ns // spb
            for b in range(nfull):
                all_full.append(sig[:, b * spb : (b + 1) * spb])
                placements.append((ti, b))
            tail = ns - nfull * spb
            if tail:
                tails.setdefault(tail, []).append(
                    (ti, nfull, sig[:, nfull * spb :]))

        per_track_blocks = {ti: {} for ti in range(len(tracks))}

        # classify tails BEFORE the device loop: host tails are standalone
        # blocks (fresh encoder each, _encode_tail_host), so they encode on
        # a background thread while this thread mostly blocks on device RPC
        # — on a 1-core host the tail cost hides entirely inside the device
        # wait. The host/device decision must not observe the device-tail
        # compiles made later in this call, hence the upfront pass.
        host_tail_members = []  # (ti, b, data, tail_len)
        device_tails = []
        for tail_len, members in tails.items():
            if not compress_viable(self.preset, spb, tail_len):
                for ti, b, data in members:
                    per_track_blocks[ti][b] = self._frame_short_block(
                        data, tail_len)
            elif self._use_host_tail(tail_len):
                host_tail_members.extend(
                    (ti, b, data, tail_len) for ti, b, data in members)
            else:
                device_tails.append((tail_len, members))

        tail_pool = None
        tail_futures = []
        if host_tail_members:
            import os
            from concurrent.futures import ThreadPoolExecutor

            tail_pool = ThreadPoolExecutor(
                max_workers=min(len(host_tail_members), os.cpu_count() or 1))
            tail_futures = [
                tail_pool.submit(self._encode_tail_host, data, tl)
                for (_ti, _b, data, tl) in host_tail_members]

        # full blocks, batched across tracks (bounded dispatch-ahead, see
        # encode_whole)
        if all_full:
            blocks = np.stack(all_full)
            bb = self.batch_blocks

            def gen():
                for start in range(0, blocks.shape[0], bb):
                    chunk = blocks[start : start + bb]
                    real = chunk.shape[0]
                    cover = self._batch_cover(real)
                    if real < cover:
                        pad = np.zeros((cover - real,) + chunk.shape[1:],
                                       np.int32)
                        chunk = np.concatenate([chunk, pad], axis=0)
                    yield (chunk, spb, real)

            start = 0
            for item in self._pipeline(gen()):
                framed = self._drain_blocks(*item)
                for off, block_bytes in enumerate(framed):
                    ti, b = placements[start + off]
                    per_track_blocks[ti][b] = block_bytes
                start += item[3]
        # device tails, grouped by length
        for tail_len, members in device_tails:
            batch = np.stack([m[2] for m in members])
            fn, num_analyze = self._analyze_fn(tail_len)
            width = max(tail_len, num_analyze)
            if batch.shape[-1] < width:
                pad = np.zeros(batch.shape[:-1] + (width - batch.shape[-1],),
                               np.int32)
                batch = np.concatenate([batch, pad], axis=-1)
            framed = self._drain_blocks(*self._dispatch_batch(batch, tail_len))
            for (ti, b, _), block_bytes in zip(members, framed):
                per_track_blocks[ti][b] = block_bytes

        if tail_pool is not None:
            for (ti, b, _d, _tl), fut in zip(host_tail_members, tail_futures):
                per_track_blocks[ti][b] = fut.result()
            tail_pool.shutdown()

        outs = []
        for ti, (sig, ns) in enumerate(track_signals):
            header = LinneHeader(
                num_channels=nch, num_samples=ns,
                sampling_rate=p.sampling_rate,
                bits_per_sample=p.bits_per_sample,
                num_samples_per_block=spb, preset=p.preset,
                ch_process_method=p.ch_process_method)
            body = b"".join(per_track_blocks[ti][b]
                            for b in sorted(per_track_blocks[ti]))
            outs.append(header.pack() + body)
        return outs

    def _drain_blocks(self, out_dev, blocks, n, real=None,
                      W=None) -> List[bytes]:
        if real is None:
            real = blocks.shape[0]
        return self._drain_batch(out_dev, blocks, n, real, W)

    @staticmethod
    def _unpack_bytes(words: np.ndarray, count: int,
                      signed: bool) -> np.ndarray:
        """[..., W] int32 words -> [..., count] int32 byte values."""
        w = np.ascontiguousarray(words).view(np.uint8)
        w = w.reshape(words.shape[:-1] + (-1,))[..., :count]
        if signed:
            return w.view(np.int8).astype(np.int32)
        return w.astype(np.int32)

    @staticmethod
    def _unpack_res(words: np.ndarray, width: int) -> np.ndarray:
        """[B, C, ceil(n/g)*wpg] int32 words -> [B, C, >=n] int32 residuals
        (inverse of the W-bit device pack in _finish)."""
        g, wpg = _pack_geometry(width)
        w = np.ascontiguousarray(words).view(np.uint32)
        w = w.reshape(words.shape[:-1] + (-1, wpg))
        out = np.empty(w.shape[:-1] + (g,), np.uint32)
        for j in range(g):
            k, off = divmod(j * width, 32)
            v = w[..., k] >> np.uint32(off)
            if off + width > 32:
                v = v | (w[..., k + 1] << np.uint32(32 - off))
            out[..., j] = v
        out &= (1 << width) - 1
        res = out.reshape(words.shape[:-1] + (-1,)).astype(np.int32)
        sign = 1 << (width - 1)
        return (res ^ sign) - sign

    def _drain_batch(self, out_dev, blocks: np.ndarray, n: int,
                     real: int, W: Optional[int] = None) -> List[bytes]:
        """Drain one dispatched batch into per-block framed payloads.

        ONE host pull per batch (side info + byte-packed coef/k2 planes +
        W-bit-packed residuals); int32 residual rows are fetched only for
        the rare blocks whose residual exceeds the dispatched W bits."""
        p = self.parameter
        if W is None:
            W = _res_pack_width(p.bits_per_sample)
        L = self.preset.num_layers
        total_order = sum(self.preset.layer_num_params)
        (off_layers, off_porder, off_coefw, off_k2w, side_k,
         max_parts) = self._side_layout(n)
        packed = np.asarray(out_dev["packed"])      # [B, C, K + res words]
        side = packed[..., :side_k]
        if native.available():
            g, _ = _pack_geometry(W)
            res = native.unpack_bits(packed[..., side_k:], W,
                                     _roundup(n, g))
        else:
            res = self._unpack_res(packed[..., side_k:], W)
        raw = side[:, 0, 0] != 0
        silent = side[:, 0, 1] != 0
        maxw = side[:, 0, 2]
        overflow = maxw > W
        # feed the adaptive width choice for the NEXT batch of this length
        # from blocks that actually carry residuals
        live = ~raw[:real] & ~silent[:real]
        if live.any():
            self._maxw_seen[n] = int(maxw[:real][live].max())
        # raw/silent blocks never read residuals; fetch fallback rows in one
        # padded-size gather (pow-2 padding bounds jit specializations)
        ov = np.nonzero(overflow[:real] & ~raw[:real] & ~silent[:real])[0]
        if ov.size:
            m = 1 << (int(ov.size) - 1).bit_length()
            idx = np.concatenate([ov, np.full(m - ov.size, ov[-1], ov.dtype)])
            rows = np.asarray(out_dev["residual"][jnp.asarray(idx)])
            for i, b in enumerate(ov):
                res[b, :, :n] = rows[i][:, :n]

        pprev = side[..., 3 : 3 + NUM_PREEMPH_FILTERS]
        pcoef = side[..., 3 + NUM_PREEMPH_FILTERS : 3 + 2 * NUM_PREEMPH_FILTERS]
        log2u = side[..., off_layers : off_layers + 2 * L : 2]
        rshift = side[..., off_layers + 1 : off_layers + 2 * L : 2]
        porder = side[..., off_porder]
        coefs = self._unpack_bytes(
            side[..., off_coefw:off_k2w], total_order, signed=True)
        k2s = self._unpack_bytes(
            side[..., off_k2w:side_k], max_parts, signed=False)

        def pack_one(b: int) -> bytes:
            if raw[b]:
                payload = write_raw_payload(
                    [blocks[b, ch, :n] for ch in range(p.num_channels)],
                    p.bits_per_sample)
                btype = BLOCK_TYPE_RAW
            elif silent[b]:
                payload = b""
                btype = BLOCK_TYPE_SILENT
            else:
                payload = self._write_compress_payload(
                    pprev[b], pcoef[b], log2u[b], rshift[b], coefs[b],
                    porder[b], k2s[b], res[b, :, :n], n)
                btype = BLOCK_TYPE_COMPRESS
            return frame_block(btype, n, payload)

        # blocks pack independently; the native payload packer runs without
        # the GIL, so thread on multicore hosts (serial on one core)
        import os

        ncpu = os.cpu_count() or 1
        if real > 1 and ncpu > 1 and native.available():
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(ncpu, 8)) as ex:
                return list(ex.map(pack_one, range(real)))
        return [pack_one(b) for b in range(real)]

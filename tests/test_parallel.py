"""Multi-chip sharding: analysis and training over the 8-device CPU mesh
must match single-device results / run real collectives."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import WAVEFORMS

from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS
from linne_tpu.parallel.mesh import (
    make_block_mesh,
    make_sharded_train_step,
    shard_blocks,
    sharded_analyze,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _encoder(spb=2560):
    enc = TpuEncoder(batch_blocks=8)
    enc.set_encode_parameter(EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        num_samples_per_block=spb, preset=0,
        ch_process_method=CH_PROCESS_MS))
    return enc


def test_sharded_analysis_matches_single_device():
    spb = 2560
    samples = WAVEFORMS["gauss"](spb * 8, 2, 16)
    blocks = samples.reshape(2, 8, spb).transpose(1, 0, 2).copy()

    enc = _encoder(spb)
    fn, _ = enc._analyze_fn(spb)
    plain = fn(jnp.asarray(blocks))

    mesh = make_block_mesh(jax.devices()[:8])
    sharded = sharded_analyze(enc, mesh, blocks, spb)

    a = np.asarray(plain["packed"])
    b = np.asarray(sharded["packed"])
    assert np.array_equal(a, b)


def test_sharded_training_step_runs_collectives():
    mesh = make_block_mesh(jax.devices()[:8])
    n = 512
    layer_orders = (2, 8)
    B = 16
    rng = np.random.default_rng(0)
    params = tuple(jnp.zeros((B, 2, o), dtype=jnp.float32)
                   for o in layer_orders)
    momentum = tuple(jnp.zeros_like(p) for p in params)
    signal = jnp.asarray(rng.normal(0, 0.1, (B, 2, n)).astype(np.float32))
    step = make_sharded_train_step(mesh, layer_orders, n, jnp.float32)
    with mesh:
        sp = tuple(shard_blocks(mesh, p) for p in params)
        sm = tuple(shard_blocks(mesh, m) for m in momentum)
        ss = shard_blocks(mesh, signal)
        new_params, _, loss = step(sp, ss, sm)
        jax.block_until_ready(new_params)
    assert np.isfinite(float(loss))
    # params actually moved
    assert any(float(jnp.abs(p).sum()) > 0 for p in new_params)


def test_encode_many_mesh_byte_identical():
    """Production corpus encode sharded over the mesh must produce byte-
    identical .lnn files (blocks are independent; the partitioned analysis
    runs the same math per block)."""
    spb = 2560
    tracks = []
    lengths = []
    for i, name in enumerate(["gauss", "sine", "noise"]):
        ns = spb * (3 + i) + (0 if i == 0 else 700 + 13 * i)  # mixed tails
        sig = WAVEFORMS[name](ns, 2, 16)
        tracks.append([sig[0], sig[1]])
        lengths.append(ns)

    def make(mesh):
        enc = TpuEncoder(batch_blocks=8, mesh=mesh)
        enc.set_encode_parameter(EncodeParameter(
            num_channels=2, bits_per_sample=16, sampling_rate=44100,
            num_samples_per_block=spb, preset=0,
            ch_process_method=CH_PROCESS_MS))
        return enc

    plain = make(None).encode_many(tracks, lengths)
    mesh = make_block_mesh(jax.devices()[:8])
    sharded = make(mesh).encode_many(tracks, lengths)
    assert len(plain) == len(sharded) == 3
    for a, b in zip(plain, sharded):
        assert a == b

    # and the sharded output round-trips losslessly
    from linne_tpu.codec.decoder import Decoder
    for data, track in zip(sharded, tracks):
        ch = Decoder().decode_whole(data)
        assert all(np.array_equal(ch[c], track[c]) for c in range(2))


def test_decode_many_mesh_byte_identical():
    """Pooled corpus decode with reconstruction rows sharded over the mesh
    must reproduce the single-device result exactly (rows are independent
    through every layer's synthesis scan — pure DP over the corpus)."""
    from linne_tpu.codec.decoder import Decoder
    from linne_tpu.codec.tpu_decoder import TpuDecoder

    spb = 2560
    ns = spb * 3 + 501  # tail block -> a second pooled length group
    sig = WAVEFORMS["sine"](ns, 2, 16)
    enc = _encoder(spb)
    data = enc.encode_whole([sig[0], sig[1]], ns)
    datas = [data] * 5  # 5 streams: padding rows exercised (rows % 8 != 0)

    plain = TpuDecoder().decode_many(datas)
    mesh = make_block_mesh(jax.devices()[:8])
    sharded = TpuDecoder(mesh=mesh).decode_many(datas)
    for a, b in zip(plain, sharded):
        for ch in range(2):
            assert np.array_equal(a[ch], b[ch])
    # and both are lossless against the source
    ref = Decoder().decode_whole(data)
    for ch in range(2):
        assert np.array_equal(plain[0][ch], ref[ch])
        assert np.array_equal(ref[ch], sig[ch])

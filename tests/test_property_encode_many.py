"""Randomized cross-composition property test for TpuEncoder.encode_many.

`codec/encoder.py` pools full blocks from every track into shared device
batches and groups tails by length; its correctness contract is that the
emitted bytes per track are INDEPENDENT of batch composition — equal to a
per-track `encode_whole` no matter how many tracks ride along, what their
lengths are, or how the batches split (`batch_blocks`, mesh sharding).
This seeded-loop property test drives random corpus compositions through
that invariant: random track counts and lengths covering every tail class
(no tail, short device-viable tail, odd tail, sub-block track, sub-order
tail that cannot be compressed), random bit depths (8/16/24), shallow and
deep presets, random batch_blocks, and one mesh-sharded permutation.
"""

import numpy as np
import pytest

import jax

from conftest import WAVEFORMS

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.encoder import TpuEncoder
from linne_tpu.codec.params import EncodeParameter
from linne_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE

SPB = 2560
_WF_NAMES = ["sine", "noise", "gauss", "chirp", "silence", "const"]
# tail classes: multiple of the block, even short tail, odd tail,
# sub-block track, tail shorter than the deepest layer order
_TAIL_CLASSES = [0, 700, 777, -SPB + 901, 40]


def _gen(wf, ns, nch, bps, seed):
    fn = WAVEFORMS[wf]
    if wf in ("noise", "gauss"):
        return fn(ns, nch, bps, seed=seed)
    return fn(ns, nch, bps)


def _random_corpus(rng, nch, bps):
    lens = []
    tracks = []
    ntracks = int(rng.integers(2, 5))
    for ti in range(ntracks):
        nblocks = int(rng.integers(1, 3))
        tail = _TAIL_CLASSES[int(rng.integers(len(_TAIL_CLASSES)))]
        ns = max(nblocks * SPB + tail, 40)
        wf = _WF_NAMES[int(rng.integers(len(_WF_NAMES)))]
        tracks.append(_gen(wf, ns, nch, bps, int(rng.integers(1e6))))
        lens.append(ns)
    return tracks, lens


def _param(nch, bps, preset):
    return EncodeParameter(
        num_channels=nch, bits_per_sample=bps, sampling_rate=44100,
        num_samples_per_block=SPB, preset=preset,
        ch_process_method=CH_PROCESS_MS if nch >= 2 else CH_PROCESS_NONE)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_encode_many_random_compositions(seed):
    rng = np.random.default_rng(1000 + seed)
    bps = [8, 16, 24][seed % 3]
    nch = 2
    preset = [0, 5, 0, 2][seed % 4]
    tracks, lens = _random_corpus(rng, nch, bps)

    bb = int(2 ** rng.integers(1, 4))  # batch_blocks in {2, 4, 8}
    enc = TpuEncoder(batch_blocks=bb)
    enc.set_encode_parameter(_param(nch, bps, preset))
    many = enc.encode_many([list(t) for t in tracks], lens)

    for i, (t, ns) in enumerate(zip(tracks, lens)):
        # bytes independent of corpus composition and batch split
        solo = TpuEncoder(batch_blocks=bb)
        solo.set_encode_parameter(_param(nch, bps, preset))
        assert many[i] == solo.encode_whole(list(t), ns), \
            f"seed={seed} track={i} bb={bb} preset={preset} bps={bps}"
        decoded = Decoder().decode_whole(many[i])
        for c in range(nch):
            assert np.array_equal(decoded[c], t[c])


def test_encode_many_random_composition_mesh_permutation():
    """The same invariant with the full-block batches sharded over the
    8-device CPU mesh: bytes must equal the unsharded per-track encode."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from linne_tpu.parallel.mesh import make_block_mesh

    rng = np.random.default_rng(77)
    tracks, lens = _random_corpus(rng, 2, 16)
    mesh = make_block_mesh(jax.devices()[:8])

    enc = TpuEncoder(batch_blocks=8, mesh=mesh)
    enc.set_encode_parameter(_param(2, 16, 0))
    many = enc.encode_many([list(t) for t in tracks], lens)

    for i, (t, ns) in enumerate(zip(tracks, lens)):
        solo = TpuEncoder(batch_blocks=4)  # different split on one device
        solo.set_encode_parameter(_param(2, 16, 0))
        assert many[i] == solo.encode_whole(list(t), ns), f"track={i}"

"""Device-exact analysis (ops/exact_device) vs the host oracle.

SURVEY §7 hard-part #1: the serial-order f64 analysis pipeline expressed as
one batched XLA computation must be BIT-identical to `linne_tpu.exact` on
XLA:CPU — identical f64 layer params, identical quantized coefficients,
identical stale-arena post-state. These tests run on the forced-CPU backend
(conftest); the TPU-hardware behavior (emulated f64) is measured by bench.py
and recorded per round, not asserted here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linne_tpu.constants import LPC_COEF_BITWIDTH
from linne_tpu.exact.lpc import quantize_coefficients
from linne_tpu.exact.network import NetworkState
from linne_tpu.ops.exact_device import (
    build_fit_fn,
    fold_parcor_state,
    supported,
)
from linne_tpu.presets import PRESETS

BPS = 16
N = 2048  # small block: full unit-level sweep, fast compile


def _signal(B, n, seed, nch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    rows = []
    for _ in range(B * nch):
        s = np.round(
            rng.uniform(1500, 24000)
            * np.sin(2 * np.pi * rng.uniform(60, 6000) * t / 44100)
            + rng.normal(0, rng.uniform(15, 2500), n))
        rows.append(s)
    sig = np.clip(np.stack(rows), -32768, 32767).astype(np.int32)
    return sig.reshape(B * nch, n)


def _oracle_fit(preset, sig, n):
    net = NetworkState(n, 8, 258)
    net.set_layer_structure(n, preset.layer_num_params)
    x = sig.astype(np.float64) * 2.0 ** (-(BPS - 1))
    net._set_units_and_parameters_py(x, n, 0, preset.ridge_terms)
    units = [L.num_units for L in net.layers]
    params = np.concatenate([L.params[: L.num_params] for L in net.layers])
    ints, rshifts = [], []
    for L in net.layers:
        ic, rs = quantize_coefficients(
            L.params, L.num_params, LPC_COEF_BITWIDTH)
        ints.append(ic[: L.num_params].astype(np.int32))
        rshifts.append(rs)
    return (np.asarray(units), params, np.concatenate(ints),
            np.asarray(rshifts), net)


def test_supported_shapes():
    assert supported((2, 32), 10240)
    assert supported((4, 64, 8), 10240)
    assert supported((4, 128, 16), 10240)
    assert supported((2, 32), 2048)
    # odd length: every unit level has an odd sub-length (stale Welch middle)
    assert not supported((2, 32), 2047)
    # block shorter than the layer order
    assert not supported((2, 32), 16)


def _assert_fit_bitexact(preset_idx):
    preset = PRESETS[preset_idx]
    B = 3
    sig = _signal(B, N, seed=10 + preset_idx)
    fit = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N, BPS,
                       LPC_COEF_BITWIDTH)
    out = jax.tree.map(np.asarray, fit(jnp.asarray(sig)))
    for b in range(B):
        u, p, ic, rs, _net = _oracle_fit(preset, sig[b], N)
        np.testing.assert_array_equal(out["units"][b], u)
        np.testing.assert_array_equal(out["params"][b], p)
        np.testing.assert_array_equal(out["int_coefs"][b], ic)
        np.testing.assert_array_equal(out["rshifts"][b], rs)


@pytest.mark.parametrize("preset_idx", [0, 1])
def test_fit_bitexact_vs_oracle(preset_idx):
    _assert_fit_bitexact(preset_idx)


@pytest.mark.slow
@pytest.mark.parametrize("preset_idx", [2, 3, 4, 5, 6, 7])
def test_fit_bitexact_vs_oracle_all_presets(preset_idx):
    """Nightly lane: bit-identity for the deeper layer families too
    ((4,64,8) and (4,128,16) at every ridge count — the order-128 scan-form
    Levinson-Durbin and the 4-term vmapped ridge sweep). Kept out of the
    fast suite because the order>=64 scan pipelines compile for minutes
    on CPU."""
    _assert_fit_bitexact(preset_idx)


def test_arena_fold_matches_oracle_state():
    """The replayed parcor writes equal the oracle arena after sequential
    per-channel fits — the state the next block-type decision reads."""
    preset = PRESETS[1]  # two ridge terms: exercises the best-term refit
    nch = 2
    sig = _signal(1, N, seed=77, nch=nch)

    net = NetworkState(N, 8, 258)
    net.set_layer_structure(N, preset.layer_num_params)
    for ch in range(nch):
        net._set_units_and_parameters_py(
            sig[ch].astype(np.float64) * 2.0 ** (-(BPS - 1)),
            N, 0, preset.ridge_terms)

    fit = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N, BPS,
                       LPC_COEF_BITWIDTH)
    out = jax.tree.map(np.asarray, fit(jnp.asarray(sig)))
    arena = np.zeros_like(net.lpcc.parcor_coef)
    fold_parcor_state(arena, out, nch, preset.layer_num_params,
                      preset.ridge_terms, N)

    m = max(preset.layer_num_params) + 2
    np.testing.assert_array_equal(arena[:m], net.lpcc.parcor_coef[:m])


def test_zero_channel_lane():
    """An all-zero lane inside a nonzero batch takes the zerocase mask path
    and must match the oracle's early-out values."""
    preset = PRESETS[0]
    sig = _signal(2, N, seed=5)
    sig[1] = 0
    fit = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N, BPS,
                       LPC_COEF_BITWIDTH)
    out = jax.tree.map(np.asarray, fit(jnp.asarray(sig)))
    for b in range(2):
        u, p, ic, rs, _ = _oracle_fit(preset, sig[b], N)
        np.testing.assert_array_equal(out["units"][b], u)
        np.testing.assert_array_equal(out["params"][b], p)
        np.testing.assert_array_equal(out["int_coefs"][b], ic)
        np.testing.assert_array_equal(out["rshifts"][b], rs)


def test_device_encoder_byte_identical():
    """DeviceExactEncoder == ExactEncoder bytes on a multi-block signal with
    a partial tail (host-fallback block) and a silent block."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 2 + 777  # 2 full blocks + tail
    sig2 = _signal(1, nsamp, seed=31, nch=2)
    sig2[:, N : N + 400] = 0  # quiet stretch, keeps type decision honest

    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    old_chunk = de._CHUNK
    de._CHUNK = 4
    try:
        dev = de.DeviceExactEncoder()
        dev.set_encode_parameter(param)
        got = dev.encode_whole([sig2[0], sig2[1]], nsamp)
    finally:
        de._CHUNK = old_chunk
    assert got == ref


def test_device_encoder_encode_many_matches_whole():
    """Corpus fits pooled across tracks must emit the same bytes as
    per-track encode_whole (and therefore the host oracle)."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de

    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N)
    lens = [N * 2 + 501, N, N + 99]
    tracks = []
    for i, ns in enumerate(lens):
        sig2 = _signal(1, ns, seed=100 + i, nch=2)
        tracks.append([sig2[0], sig2[1]])

    old_chunk = de._CHUNK
    de._CHUNK = 4
    try:
        enc = de.DeviceExactEncoder()
        enc.set_encode_parameter(param)
        many = enc.encode_many(tracks, lens)
        for i, ns in enumerate(lens):
            solo = de.DeviceExactEncoder()
            solo.set_encode_parameter(param)
            assert many[i] == solo.encode_whole(tracks[i], ns), f"track {i}"
    finally:
        de._CHUNK = old_chunk


@pytest.mark.parametrize("preset_idx,af", [(0, 1), (0, 3), (1, 2)])
def test_device_encoder_af_byte_identical(preset_idx, af):
    """`-a N` on the device path: the sweep and the final pass's unit
    searches/forwards run on the device, the N-iteration IRLS refit
    (lpc.c:578-661) on the host — bytes must equal the oracle's, including
    the final pass's own arena deposits (fold_final_pass) feeding the next
    block-type decision. Covers a host-fallback tail block too."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 3 + 777
    sig2 = _signal(1, nsamp, seed=41 + preset_idx + af, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=preset_idx, ch_process_method=1, num_samples_per_block=N,
        num_afmethod_iterations=af)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    old_chunk = de._CHUNK
    de._CHUNK = 4
    try:
        dev = de.DeviceExactEncoder()
        dev.set_encode_parameter(param)
        assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
    finally:
        de._CHUNK = old_chunk


@pytest.mark.parametrize("af", [0, 2])
def test_device_encoder_learning_byte_identical(af):
    """`-l` on the device path: the device prefit seeds the host (native)
    momentum trainer per block; bytes must equal the oracle's — including
    the -a N + -l combination, whose trainer starts from the AF-refined
    params (linne_encoder.c:669-676)."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 2 + 333
    sig2 = _signal(1, nsamp, seed=59 + af, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N,
        num_afmethod_iterations=af, enable_learning=True)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    dev = de.DeviceExactEncoder()
    dev.set_encode_parameter(param)
    assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref


def test_device_encoder_af_encode_many_matches_whole():
    """Pooled corpus fits with -a N: per-track bytes must equal the
    per-track encode_whole (and the oracle)."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=1,
        ch_process_method=1, num_samples_per_block=N,
        num_afmethod_iterations=2)
    lens = [N * 2 + 501, N, N + 99]
    tracks = []
    for i, ns in enumerate(lens):
        sig2 = _signal(1, ns, seed=200 + i, nch=2)
        tracks.append([sig2[0], sig2[1]])

    old_chunk = de._CHUNK
    de._CHUNK = 4
    try:
        enc = de.DeviceExactEncoder()
        enc.set_encode_parameter(param)
        many = enc.encode_many(tracks, lens)
        for i, ns in enumerate(lens):
            host = ExactEncoder()
            host.set_encode_parameter(param)
            assert many[i] == host.encode_whole(tracks[i], ns), f"track {i}"
    finally:
        de._CHUNK = old_chunk


def test_device_encoder_instance_reuse_reprefits():
    """A second encode_whole on the same instance must re-prefit for the
    new signal instead of silently reusing the first signal's fit cache
    (round-4 advisor finding)."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N)
    s1 = _signal(1, N * 2, seed=301, nch=2)
    s2 = _signal(1, N * 2 + 99, seed=302, nch=2)

    dev = de.DeviceExactEncoder()
    dev.set_encode_parameter(param)
    dev.encode_whole([s1[0], s1[1]], N * 2)
    got = dev.encode_whole([s2[0], s2[1]], N * 2 + 99)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    assert got == host.encode_whole([s2[0], s2[1]], N * 2 + 99)


@pytest.mark.slow
@pytest.mark.parametrize("preset_idx", [1, 2, 5])
def test_device_encoder_byte_identical_deep_presets(preset_idx):
    """Whole-file byte identity for deeper presets in the nightly lane:
    preset 1 (two ridge terms -> best-term refit replay), preset 2
    (order-64 unrolled L-D ceiling) and preset 5 (order-128 scan L-D,
    the family-B shape). Fit-level bit identity for all 8 presets is
    asserted by test_fit_bitexact_vs_oracle_all_presets; this closes the
    loop through the arena fold, block-type decision and the bitstream."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 2 + 333  # 2 full blocks + host-fallback tail
    sig2 = _signal(1, nsamp, seed=77 + preset_idx, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100,
        preset=preset_idx, ch_process_method=1, num_samples_per_block=N)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    old_chunk = de._CHUNK
    de._CHUNK = 4
    try:
        dev = de.DeviceExactEncoder()
        dev.set_encode_parameter(param)
        got = dev.encode_whole([sig2[0], sig2[1]], nsamp)
    finally:
        de._CHUNK = old_chunk
    assert got == ref


def test_device_encoder_mesh_sharded_byte_identical():
    """Fit chunks sharded over the 8-device CPU mesh must emit exactly the
    bytes of the single-device (and host-oracle) encode — fit rows are
    independent, so the mesh split is pure data parallelism."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder
    from linne_tpu.parallel.mesh import make_block_mesh

    nsamp = N * 3 + 777  # 3 full blocks (6 fit rows) + host-fallback tail
    sig2 = _signal(1, nsamp, seed=53, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    mesh = make_block_mesh(jax.devices()[:8])
    old_chunk = de._CHUNK
    de._CHUNK = 8  # one row per device
    try:
        dev = de.DeviceExactEncoder(mesh=mesh)
        dev.set_encode_parameter(param)
        assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
        # chunk not divisible by the mesh is a clear error, not silent
        de._CHUNK = 12
        with pytest.raises(ValueError):
            de.DeviceExactEncoder(mesh=mesh)
    finally:
        de._CHUNK = old_chunk


def test_cli_exact_device_flag(tmp_path):
    """`--exact-device` must emit exactly the bytes of `--exact` (both are
    byte-identical to the reference C encoder), for default flags and for
    -a N / -l."""
    from linne_tpu import cli
    from linne_tpu.io.wav import write_wav

    nsamp = 10240 + 501  # one full default block + host-fallback tail
    sig2 = _signal(1, nsamp, seed=91, nch=2)
    wav_in = str(tmp_path / "in.wav")
    write_wav(wav_in, sig2.reshape(2, nsamp), 44100, 16)

    a = str(tmp_path / "a.lnn")
    b = str(tmp_path / "b.lnn")
    assert cli.main(["-e", "--exact", wav_in, a]) == 0
    assert cli.main(["-e", "--exact-device", wav_in, b]) == 0
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()

    # -a N through the CLI: both paths byte-identical
    c = str(tmp_path / "c.lnn")
    d = str(tmp_path / "d.lnn")
    assert cli.main(["-e", "--exact", "-a", "2", wav_in, c]) == 0
    assert cli.main(["-e", "--exact-device", "-a", "2", wav_in, d]) == 0
    with open(c, "rb") as fc, open(d, "rb") as fd:
        assert fc.read() == fd.read()

    # --threads outside --exact is a clean error (round-4 advisor finding)
    e = str(tmp_path / "e.lnn")
    assert cli.main(["-e", "--exact-device", "--threads", "2",
                     wav_in, e]) == 1
    assert cli.main(["-e", "--exact", "--threads", "0", wav_in, e]) == 1
    assert not (tmp_path / "e.lnn").exists()


def test_guard_margins_emitted_and_sane():
    """The hardware byte-identity guard's margin sensors: every fit row
    emits [sel, scale, round] margins; on ordinary signals they sit many
    orders of magnitude above the drift bounds (expected flag rate ~0)."""
    preset = PRESETS[1]
    sig = _signal(4, N, seed=500)
    fit = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N, BPS,
                       LPC_COEF_BITWIDTH)
    m = np.asarray(fit(jnp.asarray(sig))["margins"])
    assert m.shape == (4, 3)
    assert np.all(m >= 0)
    from linne_tpu.exact import device_encoder as de
    assert np.all(m[:, 0] > de._MARGIN_REL * 100)
    assert np.all(m[:, 1] > de._MARGIN_REL * 100)
    assert np.all(m[:, 2] > de._MARGIN_ABS * 100)


def test_guard_flagged_rows_fall_back_to_oracle(monkeypatch):
    """With the guard bounds forced huge, every fit row is flagged and the
    encoder must fall back to the host oracle per row — bytes unchanged,
    flags counted. This pins the fallback path the real guard would take
    on an actual drift event."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 2 + 321
    sig2 = _signal(1, nsamp, seed=71, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    monkeypatch.setattr(de, "_MARGIN_REL", 1e9)
    monkeypatch.setattr(de, "_MARGIN_ABS", 1e9)
    dev = de.DeviceExactEncoder()
    dev.set_encode_parameter(param)
    assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
    assert dev.guard_rows_total == 4  # 2 full blocks x 2 channels
    assert dev.guard_rows_flagged == 4


def test_guard_decision_margin_refresh(monkeypatch):
    """The decision-margin arena refresh: with the decision bound forced
    huge (but row flagging disabled), every post-device-block type decision
    re-fits the previous block on the host oracle before re-estimating —
    bytes must be unchanged (the refresh reproduces the oracle arena)."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 3
    sig2 = _signal(1, nsamp, seed=72, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=1,
        ch_process_method=1, num_samples_per_block=N)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    monkeypatch.setattr(de, "_MARGIN_REL", 1e9)
    monkeypatch.setattr(
        de.DeviceExactEncoder, "_row_flagged", lambda self, row: False)
    dev = de.DeviceExactEncoder()
    dev.set_encode_parameter(param)
    assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
    assert dev.guard_decisions_flagged >= 1
    assert dev.guard_rows_flagged == 0


def test_guard_af_margins(monkeypatch):
    """-a N guard: flagged rows (host-quantize + search margins) fall back
    to the oracle with bytes unchanged."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    nsamp = N * 2
    sig2 = _signal(1, nsamp, seed=73, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=0,
        ch_process_method=1, num_samples_per_block=N,
        num_afmethod_iterations=2)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    monkeypatch.setattr(de, "_MARGIN_ABS", 1e9)
    dev = de.DeviceExactEncoder()
    dev.set_encode_parameter(param)
    assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
    assert dev.guard_rows_flagged == dev.guard_rows_total == 4


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_mesh_width_byte_identity(ndev):
    """The byte-exact mesh encode must emit IDENTICAL bytes at every mesh
    width (1/2/4/8 devices): fit rows are independent, so the mesh split is
    pure data parallelism and the bitstream cannot depend on the device
    count. This is the multi-chip correctness artifact checkable without
    hardware (VERDICT r4 #7); docs/MULTICHIP_SCALING.md records the timing
    table from the same sweep."""
    if len(jax.devices()) < ndev:
        pytest.skip("needs the 8-device CPU mesh")
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder
    from linne_tpu.parallel.mesh import make_block_mesh

    nsamp = N * 4
    sig2 = _signal(1, nsamp, seed=88, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=1,
        ch_process_method=1, num_samples_per_block=N)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    mesh = make_block_mesh(jax.devices()[:ndev])
    old_chunk = de._CHUNK
    de._CHUNK = 8
    try:
        dev = de.DeviceExactEncoder(mesh=mesh)
        dev.set_encode_parameter(param)
        assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
    finally:
        de._CHUNK = old_chunk


def test_fast_mode_fit_matches_decisions():
    """Fast mode (parallel tree reductions, the TPU production graph): on
    an IEEE-f64 backend its drift vs the strict serial graph is ~1e-13, so
    every DECISION output (units, int coefficients, rshifts, ridge choice)
    must match bit-for-bit on ordinary signals, with f64 params within
    1e-9 and comfortable guard margins."""
    preset = PRESETS[1]
    sig = _signal(4, N, seed=606)
    f_strict = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N,
                            BPS, LPC_COEF_BITWIDTH, strict=True)
    f_fast = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N,
                          BPS, LPC_COEF_BITWIDTH, strict=False)
    a = jax.tree.map(np.asarray, f_strict(jnp.asarray(sig)))
    b = jax.tree.map(np.asarray, f_fast(jnp.asarray(sig)))
    for key in ("units", "int_coefs", "rshifts", "best_term"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    np.testing.assert_allclose(a["params"], b["params"], rtol=0, atol=1e-9)
    from linne_tpu.exact import device_encoder as de
    m = b["margins"]
    assert np.all(m[:, 0] > de._MARGIN_REL * 100)
    assert np.all(m[:, 2] > de._MARGIN_ABS * 100)


@pytest.mark.parametrize("af", [0, 2])
def test_fast_mode_guarded_byte_identity(monkeypatch, af):
    """End-to-end in fast mode: the margin guard certifies the decisions,
    so the emitted bytes must equal the host oracle's with ~zero flagged
    rows — the exact contract the TPU production path runs under."""
    from linne_tpu.codec.params import EncodeParameter
    from linne_tpu.exact import device_encoder as de
    from linne_tpu.exact.encoder import ExactEncoder

    monkeypatch.setenv("LINNE_EXACT_DEVICE_STRICT", "0")
    nsamp = N * 3 + 777
    sig2 = _signal(1, nsamp, seed=607 + af, nch=2)
    param = EncodeParameter(
        num_channels=2, bits_per_sample=16, sampling_rate=44100, preset=1,
        ch_process_method=1, num_samples_per_block=N,
        num_afmethod_iterations=af)

    host = ExactEncoder()
    host.set_encode_parameter(param)
    ref = host.encode_whole([sig2[0], sig2[1]], nsamp)

    dev = de.DeviceExactEncoder()
    dev.set_encode_parameter(param)
    assert dev.encode_whole([sig2[0], sig2[1]], nsamp) == ref
    assert dev.guard_rows_flagged == 0


def test_packed_fit_matches_dict():
    """build_packed_fit_fn must be a pure re-layout of build_fit_fn: two
    fetch buffers, bit-equal leaves after unpack (the packed form exists
    because every fetched leaf costs one D2H RPC through the TPU tunnel)."""
    from linne_tpu.ops.exact_device import build_packed_fit_fn

    preset = PRESETS[1]  # two ridge terms: exercises best_term packing
    sig = _signal(3, N, seed=77)
    fit = build_fit_fn(preset.layer_num_params, preset.ridge_terms, N, BPS,
                       LPC_COEF_BITWIDTH)
    pfit, unpack = build_packed_fit_fn(
        preset.layer_num_params, preset.ridge_terms, N, BPS,
        LPC_COEF_BITWIDTH)
    want = {k: np.asarray(v) for k, v in fit(jnp.asarray(sig)).items()}
    f64, i32 = pfit(jnp.asarray(sig))
    got = unpack(np.asarray(f64), np.asarray(i32))
    assert set(got) == set(want)
    for k in want:
        assert np.array_equal(np.asarray(got[k], want[k].dtype), want[k]), k


def test_fold_reverse_fill_matches_ordered_replay():
    """fold_parcor_state computes the arena's final state by a reverse walk
    (covered-prefix watermark + later point writes). Pin equivalence with
    the definitionally-correct ordered deposit replay on randomized arena
    contents, zero-flags, best levels and best terms."""
    from linne_tpu.ops.exact_device import _valid_levels, arena_layout

    lps = (4, 128, 16)
    terms = (0.0, 1e-5, 1e-4, 1e-3)
    n = 10240
    entries, L = arena_layout(lps, terms, n)
    aw = max(off + w for off, w, _ in entries.values())
    az = max(z for _, _, z in entries.values()) + 1
    n_levels = [len(_valid_levels(P, n)) for P in lps]
    rng = np.random.default_rng(123)

    def ordered_replay(parcor, out):
        ap, azr, ab = out["arena_parcor"], out["arena_zc"], out["arena_best"]

        def apply_pass(ti):
            for li in range(L):
                def deposit(lvl):
                    off, npu, zc = entries[(ti, li, lvl)]
                    parcor[:npu] = ap[0, off : off + npu]
                    if bool(azr[0, zc]):
                        parcor[npu] = 0.0
                for lvl in range(n_levels[li]):
                    deposit(lvl)
                deposit(int(ab[0, ti * L + li]))

        for ti in range(len(terms)):
            apply_pass(ti)
        apply_pass(int(out["best_term"][0]))

    for _ in range(50):
        ab = np.zeros((1, len(terms) * L), np.int64)
        for ti in range(len(terms)):
            for li in range(L):
                ab[0, ti * L + li] = rng.integers(0, n_levels[li])
        out = {
            "arena_parcor": rng.normal(size=(1, aw)),
            "arena_zc": rng.random((1, az)) < 0.3,
            "arena_best": ab,
            "best_term": rng.integers(0, len(terms), size=(1,)),
        }
        a = rng.normal(size=160)
        b = a.copy()
        ordered_replay(a, out)
        fold_parcor_state(b, out, 1, lps, terms, n)
        assert np.array_equal(a, b)

"""Virtual-mesh scaling table for the byte-exact fit stage (VERDICT r4 #7).

Runs the device-exact fit (the stage the mesh shards — fit rows are pure
data parallelism) at mesh widths 1/2/4/8 on the forced-CPU virtual mesh,
asserts the outputs are bit-identical across widths, and prints a timing
table. On this single-core box the virtual devices share one core, so the
wall times measure CORRECTNESS overhead (sharding/partitioning cost), not
speedup — real scaling needs real chips; the value of the artifact is that
the bytes and the fit outputs are width-invariant, which is what makes the
multi-chip DP claim checkable without hardware.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python tools/mesh_scaling_table.py [preset] [rows]
Writes docs/MULTICHIP_SCALING.md.
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import jax  # noqa: E402

# This box's sitecustomize pre-imports jax (registering the tunneled TPU
# platform) before the env vars above apply — switch the already-imported
# jax explicitly, like tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

from linne_tpu.constants import LPC_COEF_BITWIDTH  # noqa: E402
from linne_tpu.ops.exact_device import build_fit_fn  # noqa: E402
from linne_tpu.parallel.mesh import make_block_mesh  # noqa: E402
from linne_tpu.presets import PRESETS  # noqa: E402


def main() -> None:
    preset_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    bs = 2048
    preset = PRESETS[preset_idx]

    rng = np.random.default_rng(9)
    t = np.arange(rows * bs)
    sig = np.clip(
        np.round(11000 * np.sin(2 * np.pi * 330 * t / 44100)
                 + rng.normal(0, 400, rows * bs)),
        -32768, 32767).astype(np.int32).reshape(rows, bs)

    fit = build_fit_fn(preset.layer_num_params, preset.ridge_terms, bs, 16,
                       LPC_COEF_BITWIDTH)

    results = {}
    times = {}
    for ndev in (1, 2, 4, 8):
        if len(jax.devices()) < ndev:
            continue
        mesh = make_block_mesh(jax.devices()[:ndev])
        sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0], None))
        x = jax.device_put(sig, sh)
        jax.block_until_ready(fit(x))  # compile/layout warmup per width
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fit(x)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[ndev] = best
        results[ndev] = jax.tree.map(np.asarray, out)

    base = results[1]
    for ndev, out in results.items():
        for key in ("units", "int_coefs", "rshifts", "best_term"):
            np.testing.assert_array_equal(
                out[key], base[key],
                err_msg=f"{key} differs at mesh width {ndev}")

    lines = [
        "# Virtual-mesh scaling of the byte-exact fit stage",
        "",
        f"Preset {preset_idx} ({preset.layer_num_params}, "
        f"{len(preset.ridge_terms)} ridge terms), {rows} fit rows of "
        f"{bs} samples, forced-CPU virtual mesh "
        f"(`--xla_force_host_platform_device_count=8`).",
        "",
        "Fit outputs (units, int coefficients, rshifts, best ridge term)",
        "asserted BIT-IDENTICAL across widths — mesh DP cannot change the",
        "bitstream. Wall times below share ONE physical core, so they",
        "measure partitioning overhead, not speedup; on real chips the fit",
        "rows are embarrassingly parallel (zero collectives in the numeric",
        "path, linne_tpu/parallel/mesh.py).",
        "",
        "| mesh width | fit wall (ms) | vs 1-device |",
        "|---|---|---|",
    ]
    for ndev, s in sorted(times.items()):
        lines.append(f"| {ndev} | {s * 1000:.1f} | "
                     f"{times[1] / s:.2f}x |")
    lines.append("")
    lines.append("Regenerate: `python tools/mesh_scaling_table.py 1 16`.")
    out_path = pathlib.Path(__file__).resolve().parent.parent / "docs" / \
        "MULTICHIP_SCALING.md"
    out_path.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()

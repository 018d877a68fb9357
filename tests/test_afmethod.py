"""Device IRLS refinement vs the bit-exact host oracle (loose tolerance —
the device path uses batched Cholesky + fixed iterations)."""

import numpy as np

from linne_tpu.exact.lpc import LpcState, WINDOW_WELCH
from linne_tpu.ops.afmethod import af_refine

import jax.numpy as jnp


def test_af_refine_matches_oracle():
    rng = np.random.default_rng(3)
    ns, order = 2048, 16
    rows = 4
    data = np.cumsum(rng.normal(0, 0.05, (rows, ns)), axis=1)
    data = (data / np.abs(data).max()).astype(np.float64)

    # oracle per row
    want = []
    init = []
    for r in range(rows):
        st = LpcState(order, ns)
        a_init = st.calculate_coef_af(data[r], ns, order, 0, WINDOW_WELCH, 0.0)
        init.append(a_init)
        st2 = LpcState(order, ns)
        want.append(st2.calculate_coef_af(
            data[r], ns, order, 3, WINDOW_WELCH, 0.0))
    want = np.stack(want)
    init = np.stack(init)

    got = np.asarray(af_refine(jnp.asarray(data), jnp.asarray(init), 3))
    # identical math modulo solver/order-of-operations differences
    assert np.allclose(got, want, atol=1e-6), np.abs(got - want).max()


def test_af_refine_zero_iterations_identity():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(0, 1, (2, 512)))
    a0 = jnp.asarray(rng.normal(0, 0.1, (2, 8)))
    out = af_refine(data, a0, 0)
    assert np.array_equal(np.asarray(out), np.asarray(a0))

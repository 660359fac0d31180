"""Pallas fused Schmidl-Cox window kernel vs the XLA reference path.

Runs in interpret mode on the CPU test backend; the compiled TPU path is
exercised by tools/profile_acquisition.py with ULTRA_PALLAS_SYNC=1.
"""

import numpy as np
import jax.numpy as jnp

from projectultra_tpu.ops.pallas_sync import sc_windows_pallas
from projectultra_tpu.sync.schmidl_cox import analytic_signal, _window_sum


def test_pallas_sc_windows_match_xla():
    rng = np.random.default_rng(0)
    T = 6000
    half = 256
    sig = rng.standard_normal(T).astype(np.float32)
    a = analytic_signal(jnp.asarray(sig[None, :]))[0]

    P, R1, R2 = sc_windows_pallas(a, half, interpret=True)

    u = jnp.conj(a[:-half]) * a[half:]
    e = jnp.abs(a) ** 2
    P_ref = _window_sum(u[None], half)[0]
    R1_ref = _window_sum(e[None, :-half], half)[0]
    R2_ref = _window_sum(e[None, half:], half)[0]
    n = T - 2 * half + 1

    np.testing.assert_allclose(np.asarray(P), np.asarray(P_ref[:n]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R1_ref[:n]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R2_ref[:n]),
                               rtol=2e-4, atol=2e-3)

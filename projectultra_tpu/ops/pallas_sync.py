"""Pallas TPU kernel: fused Schmidl-Cox sliding-window metric.

The XLA path (sync/schmidl_cox.sc_metric) materializes the analytic product
u = conj(a) * a_shift plus three block-stable cumulative sums — several
HBM-sized intermediates.  This kernel computes the half-symbol correlation
P(d) and the window energies R1/R2 in ONE pass over VMEM tiles.

Window sums use a log-depth doubling of STATIC shifted adds
(w_{2k}[i] = w_k[i] + w_k[i+k]; log2(half) steps) because cumsum has no
Pallas TPU lowering.  Bonus: the doubling tree is numerically stabler than a
cumsum-difference.

Enabled opportunistically (ULTRA_PALLAS_SYNC=1); matches the XLA path to
float32 tolerance.  Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # output positions per grid step


def _wsum(x: jnp.ndarray, width: int, count: int) -> jnp.ndarray:
    """Sliding sums of `width` consecutive elements: x [1, L] ->
    [1, count] via shift-doubling (width must be a power of two)."""
    assert width & (width - 1) == 0, "window must be a power of two"
    w = x
    k = 1
    while k < width:
        w = w[:, :-k] + w[:, k:]
        k *= 2
    return w[:, :count]


def _sc_kernel(ar_ref, ai_ref, pr_ref, pi_ref, r1_ref, r2_ref, *, half, tile):
    t = pl.program_id(0)
    base = t * tile
    n = tile + 2 * half
    ar = ar_ref[:, pl.ds(base, n)]
    ai = ai_ref[:, pl.ds(base, n)]

    # u[i] = conj(a[i]) * a[i+half]
    a1r, a1i = ar[:, : tile + half], ai[:, : tile + half]
    a2r, a2i = ar[:, half:], ai[:, half:]
    ur = a1r * a2r + a1i * a2i
    ui = a1r * a2i - a1i * a2r
    e = ar * ar + ai * ai

    pr_ref[:, pl.ds(base, tile)] = _wsum(ur, half, tile)
    pi_ref[:, pl.ds(base, tile)] = _wsum(ui, half, tile)
    r1_ref[:, pl.ds(base, tile)] = _wsum(e[:, : tile + half], half, tile)
    r2_ref[:, pl.ds(base, tile)] = _wsum(e[:, half:], half, tile)


@functools.partial(jax.jit, static_argnames=("half", "interpret"))
def sc_windows_pallas(analytic: jnp.ndarray, half: int,
                      interpret: bool = False):
    """[T] complex analytic signal -> (P [n], R1 [n], R2 [n]) with
    n = T - 2*half + 1 window-start positions."""
    T = analytic.shape[-1]
    n_out = T - 2 * half + 1
    n_tiles = -(-n_out // TILE)
    padded = n_tiles * TILE + 2 * half
    ar = jnp.pad(analytic.real.astype(jnp.float32), (0, padded - T))[None, :]
    ai = jnp.pad(analytic.imag.astype(jnp.float32), (0, padded - T))[None, :]

    out_len = n_tiles * TILE
    shapes = [jax.ShapeDtypeStruct((1, out_len), jnp.float32)] * 4
    pr, pi, r1, r2 = pl.pallas_call(
        functools.partial(_sc_kernel, half=half, tile=TILE),
        grid=(n_tiles,),
        out_shape=shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        interpret=interpret,
    )(ar, ai)
    P = (pr[0] + 1j * pi[0])[:n_out]
    return P, r1[0, :n_out], r2[0, :n_out]


def enabled() -> bool:
    return os.environ.get("ULTRA_PALLAS_SYNC") == "1"

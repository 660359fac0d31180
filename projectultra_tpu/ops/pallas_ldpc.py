"""Pallas TPU kernel: fused VMEM-resident LDPC min-sum decode.

VERDICT r4 #1 asked for a Pallas attack on the decode stage
(/root/reference/src/fec/ldpc_decoder.cpp:151-236 is the matched C++; the
XLA path is ops/ldpc.py).  The idea: the XLA decoder's [B, m, D] edge
state lives in HBM and every min-sum iteration round-trips it plus two
index-space moves (gather llr[:, row_vars], scatter-add c2v) — a fused
kernel can hold ALL decoder state for a lane-tile of codewords in VMEM
(~10 MB at TB=128 incl. the one-hot edge matrix) and loop to convergence
without touching HBM.

Layout: codewords on LANES.  llr [n, TB], messages [D, m, TB]; the
gather/scatter become matmuls against a constant one-hot edge matrix
G[e, v] (f32, HIGHEST) — bit-exact data movement (a one-hot row selects
one f32 through the MXU's bf16x3 decomposition exactly; the same argument
docs/PERF.md already relies on for the deinterleaver).  The scatter-add
reuses G transposed via dot_general, so only one [E, n] constant rides
VMEM.  The while_loop runs inside the kernel with per-lane freezing and
iteration bookkeeping identical to ops/ldpc.decode.

MEASURED REJECTION (TPU v5e, 2026-08-19; every number reproducible from
this file + the micro-kernels described below):

1. In-kernel edge data movement loses to XLA's native gather by ~10x.
   For a [2304-edge, 128-lane] gather (one of the 2-3 index-space moves
   each min-sum iteration needs):
     - sublane row-gather (fori of dynamic slices, SMEM indices):
       174 us — serial, issue-rate bound;
     - one-hot f32 HIGHEST matmul: 160 us — the MXU shape is hostile
       (N = TB = 128 output lanes, 3x bf16 passes for exact f32, 99.7%
       of the FLOPs multiply zeros);
     - jnp.take / take_along_axis (sublane or lane axis): no Mosaic
       lowering at all (ValueError / AssertionError, jax 0.8.x).
   At B=16384 that is 20+ ms for ONE in-kernel gather vs ~11 ms for the
   XLA decoder's ENTIRE iteration (gather + min-sum + scatter + syndrome
   + state round-trip) in the pre-round-5 [B, m, D] layout.

2. The fused whole-decode kernel cannot even be scheduled on real
   hardware.  A while_loop carrying the [E, TB] message vectors dies in
   Mosaic layout legalization ("failed to legalize scf.yield", ~450
   vector carries); restructured with all state in VMEM scratch refs and
   scalar-only carries (this file), the compiler then reports a scoped-
   VMEM stack of 69.8 MB against the 16 MB core limit for R1/2 at
   TB=128 — the unrolled min-sum temporaries plus the [E, n] one-hot
   matrix (5.9 MB f32; 10 MB at R1/4, whose graph alone cannot fit) have
   no HBM spill path inside a Pallas kernel.

3. Even if (2) were restructured around slice-wise scratch writes, the
   movement numbers in (1) bound the kernel at ~0.5 ms per 128 lanes
   per iteration = 60+ ms per B=16384 batch — 6x the XLA path.

The kernel stays importable and interpret-mode exact (tests/
test_pallas_ldpc.py pins bits/ok/iteration-count equality with
ops/ldpc.decode on the golden vectors and on noisy waterfall batches)
so the rejection is reproducible.  The production wins that came OUT of
this investigation live in ops/ldpc.py: the stateless first iteration
(iteration 0 needs no edge state in HBM — the VMEM-residency insight,
expressed in XLA) and the unrolled-by-degree edge layout (the [B, m, D]
minor-dim-7 tensors padded every tile to 128 lanes; D clean [B, m]
arrays + Dv clean [B, n] per-variable gathers cut the measured stage
from 11.25 ms to ~3 ms at B=16384).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fec.ldpc import LDPCCode, MIN_SUM_SCALE, V2C_CLAMP, DEFAULT_MAX_ITERS

TB = 128  # codeword lanes per grid step


@functools.lru_cache(maxsize=None)
def _edge_constants(code: LDPCCode):
    """One-hot gather matrix G [D*m_pad, n] (edge e = d*m_pad + i reads
    variable row_vars[i, d]), parity matrix W [m_pad, n], and the 3-D edge
    mask [D, m_pad, 1]."""
    m, n, D = code.m, code.n, code.max_degree
    m_pad = -(-m // 8) * 8
    E = D * m_pad
    G = np.zeros((E, n), np.float32)
    mask = np.zeros((E, 1), np.float32)
    for d in range(D):
        for i in range(m):
            if code.row_mask[i, d]:
                G[d * m_pad + i, code.row_vars[i, d]] = 1.0
                mask[d * m_pad + i, 0] = 1.0
    W = np.zeros((m_pad, n), np.float32)
    W[:m, :n - m] = code.h_dense
    W[np.arange(m), n - m + np.arange(m)] = 1.0
    return G, W, mask, m_pad


def _kernel(llr_ref, g_ref, w_ref, mask_ref, llr_out, done_out, iters_out,
            v2c_s, *, n, m, m_pad, D, max_iters):
    """Decoder state (v2c messages, totals, done/iters) lives in VMEM
    scratch/output refs; the while_loop carries only scalars — Mosaic
    cannot legalize large vector loop carries (the first draft carried the
    [D*m_pad, TB] messages and died in scf.yield layout legalization)."""
    E = D * m_pad
    llr_in = llr_ref[:]                                   # [n, TB]
    G = g_ref[:]                                          # [E, n]
    W = w_ref[:]                                          # [m_pad, n]
    mask = mask_ref[:]                                    # [D*m_pad, 1]
    inf = jnp.float32(np.inf)

    def gather(x):                                        # [n, TB] -> [E, TB]
        return jax.lax.dot_general(G, x, (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32) \
            * mask

    def scatter_sum(c2v):                                 # [E, TB] -> [n, TB]
        return jax.lax.dot_general(G, c2v, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

    def c2v_of(v2c):
        """[E, TB] flat d-major messages -> c2v, via 2-D per-d slices
        (3-D reshapes also break Mosaic layout legalization)."""
        sl = [v2c[d * m_pad:(d + 1) * m_pad, :] for d in range(D)]
        ms = [mask[d * m_pad:(d + 1) * m_pad, :] for d in range(D)]
        min1 = jnp.full((m_pad, TB), inf)
        min2 = jnp.full((m_pad, TB), inf)
        amin = jnp.zeros((m_pad, TB), jnp.int32)
        par = jnp.zeros((m_pad, TB), jnp.int32)
        negs = []
        for d in range(D):
            a = jnp.where(ms[d] > 0, jnp.abs(sl[d]), inf)
            neg = jnp.where(ms[d] > 0, (sl[d] < 0).astype(jnp.int32), 0)
            negs.append(neg)
            par = par ^ neg
            is_new = a < min1
            min2 = jnp.where(is_new, min1, jnp.minimum(min2, a))
            amin = jnp.where(is_new, d, amin)
            min1 = jnp.where(is_new, a, min1)
        outs = []
        for d in range(D):
            sign = 1.0 - 2.0 * ((par ^ negs[d]) & 1).astype(jnp.float32)
            min_excl = jnp.where(amin == d, min2, min1)
            outs.append(jnp.where(ms[d] > 0,
                                  sign * min_excl * MIN_SUM_SCALE, 0.0))
        return jnp.concatenate(outs, axis=0)              # [E, TB]

    def llr_ok(c2v):
        llr_total = llr_in + scatter_sum(c2v)
        hard = (llr_total < 0).astype(jnp.float32)
        counts = jax.lax.dot_general(W, hard, (((1,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
        viol = counts.astype(jnp.int32) & 1               # [m_pad, TB]
        ok = viol.sum(0) == 0                             # [TB]
        return llr_total, ok

    c2v0 = c2v_of(gather(llr_in))
    llr1, ok1 = llr_ok(c2v0)
    llr_out[:] = llr1
    done_out[:] = ok1.astype(jnp.int32)[None, :]
    iters_out[:] = jnp.where(ok1, 0, max_iters).astype(jnp.int32)[None, :]
    v2c_s[:] = jnp.clip(gather(llr1) - c2v0, -V2C_CLAMP, V2C_CLAMP) * mask

    def cond(st):
        it, ndone = st
        return (it < max_iters) & (ndone < TB)

    def body(st):
        it, _ = st
        v2c = v2c_s[:]
        done = done_out[:][0] > 0                          # [TB]
        c2v = c2v_of(v2c)
        llr_new, ok = llr_ok(c2v)
        v2c_new = jnp.clip(gather(llr_new) - c2v, -V2C_CLAMP, V2C_CLAMP) \
            * mask
        keep = done[None, :]
        v2c_s[:] = jnp.where(keep, v2c, v2c_new)
        llr_out[:] = jnp.where(keep, llr_out[:], llr_new)
        newly = (~done) & ok
        iters_out[:] = jnp.where(newly[None, :], it, iters_out[:])
        done = done | ok
        done_out[:] = done.astype(jnp.int32)[None, :]
        return it + 1, done.astype(jnp.int32).sum()

    jax.lax.while_loop(cond, body,
                       (jnp.int32(1), ok1.astype(jnp.int32).sum()))


@functools.partial(jax.jit, static_argnames=("code", "max_iters", "interpret"))
def decode_pallas(code: LDPCCode, llrs: jnp.ndarray,
                  max_iters: int = DEFAULT_MAX_ITERS, interpret: bool = False):
    """Drop-in for ops/ldpc.decode (f32 message mode): [B, n] LLRs ->
    (info_bits [B, k] uint8, ok [B] bool, iters [B] int32)."""
    B, n = llrs.shape
    m, D = code.m, code.max_degree
    G, W, mask, m_pad = _edge_constants(code)
    Bp = -(-B // TB) * TB
    x = jnp.pad(llrs.astype(jnp.float32), ((0, Bp - B), (0, 0))).T  # [n, Bp]

    grid = (Bp // TB,)
    llr_t, done_t, iters_t = pl.pallas_call(
        functools.partial(_kernel, n=n, m=m, m_pad=m_pad, D=D,
                          max_iters=max_iters),
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.int32)],
        in_specs=[pl.BlockSpec((n, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G.shape[0], n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((m_pad, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G.shape[0], 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((n, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((G.shape[0], TB), jnp.float32)],
        interpret=interpret,
    )(x, jnp.asarray(G), jnp.asarray(W), jnp.asarray(mask))

    llr_total = llr_t.T[:B]
    done = done_t[0, :B].astype(bool)
    iters = iters_t[0, :B]
    info_bits = (llr_total[:, :code.k] < 0).astype(jnp.uint8)
    return info_bits, done, iters

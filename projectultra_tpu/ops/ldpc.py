"""Batched LDPC encode/decode kernels (JAX/XLA, TPU-first).

Design notes (vs. the reference's per-edge scalar loops,
src/fec/ldpc_decoder.cpp:179-236):

* The Tanner graph is a *constant* padded edge tensor ``row_vars [m, D]`` —
  all shapes static, so XLA tiles everything onto the VPU and the batch axis
  vectorizes trivially (vmap is implicit via leading axis).
* Check-node update uses the two-minima trick instead of the reference's
  per-edge exclusion loop: one min + one argmin + one masked second-min per
  check row replaces a D^2 inner loop. Identical results (min-sum is
  tie-insensitive).
* Early exit: ``lax.while_loop`` runs until every codeword in the batch has
  satisfied parity or max_iters is reached.  Converged lanes are frozen
  (state kept) so results match the reference's per-codeword early exit
  exactly — extra iterations cannot perturb a converged codeword.
* Encoding is a single f32 matmul on the MXU: parity = info @ H_data^T mod 2
  (row degrees <= 6, so f32 accumulation is exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fec.ldpc import (LDPCCode, MIN_SUM_SCALE, V2C_CLAMP,
                        DEFAULT_MAX_ITERS, HARD_LLR)


def encode(code: LDPCCode, info_bits: jnp.ndarray) -> jnp.ndarray:
    """[..., k] {0,1} -> [..., n] {0,1} (float32 in, float32 out)."""
    info = info_bits.astype(jnp.float32)
    h_t = jnp.asarray(code.h_dense.T)  # [k, m]
    parity = jnp.mod(info @ h_t, 2.0)
    return jnp.concatenate([info, parity], axis=-1)


# Opt-in default for the edge-message dtype: ULTRA_LDPC_BF16=1 switches
# every decode() caller that does not pass msg_dtype explicitly (the bench
# and tools use this; tests pin both modes explicitly).  f32 stays the
# shipped default for lane-exact C++ parity.
import os as _os
_DEFAULT_MSG_DTYPE = (jnp.bfloat16 if _os.environ.get("ULTRA_LDPC_BF16") == "1"
                      else jnp.float32)


@functools.lru_cache(maxsize=None)
def _var_edge_table(code: LDPCCode):
    """Per-variable incoming-edge lists in ascending CHECK order (the C++
    accumulation order, ldpc_decoder.cpp variable-update loop), as indices
    into the d-major flat c2v space (e = d*m + i); entries beyond a
    variable's degree point at a trailing zero edge (index D*m)."""
    m, n, D = code.m, code.n, code.max_degree
    lists: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for i in range(m):
        for d in range(D):
            if code.row_mask[i, d]:
                lists[int(code.row_vars[i, d])].append((i, d))
    Dv = max(len(l) for l in lists)
    tab = np.full((n, Dv), D * m, np.int32)
    for v, l in enumerate(lists):
        for j, (i, d) in enumerate(sorted(l)):
            tab[v, j] = d * m + i
    return tab, Dv


@functools.partial(jax.jit, static_argnames=("code", "max_iters", "msg_dtype",
                                             "trap_escape"))
def decode(code: LDPCCode, llrs: jnp.ndarray, max_iters: int = DEFAULT_MAX_ITERS,
           msg_dtype=None, trap_escape: bool = False):
    """Flooding min-sum BP decode of a batch of codewords.

    Args:
      llrs: [B, n] float32 channel LLRs (positive = bit 0).
      msg_dtype: dtype for the edge-message tensors ([B, m, D] v2c/c2v, the
        decoder's HBM working set).  float32 (default) is lane-for-lane
        identical to the reference C++ (ldpc_decoder.cpp:151-236);
        jnp.bfloat16 is the opt-in fast mode — min-sum only compares and
        copies magnitudes, so bf16 rounding of the messages costs no
        measurable waterfall shift (tools/ber_curves.py --bf16 overlay)
        while halving message traffic.  Channel LLRs, the total-LLR
        accumulation, and the parity check stay f32 in both modes.
      trap_escape: opt-in second pass for FAILED lanes only — zero the
        channel LLRs of every bit touching an unsatisfied check of the
        failed attempt's hard decision and re-run the loop.  This breaks
        the reference H construction's small trapping sets: two confident
        wrong bits on a 4-cycle pair keep both shared checks satisfied, so
        plain min-sum can never flip them (measured on QAM256 512-profile
        frames: a payload-DETERMINISTIC decode failure at 80 dB that no
        LLR scaling fixes — an ARQ livelock, since the retransmitted
        payload fails identically).  Erasing the (few) suspects lets their
        unsatisfied checks re-fill them from the reliable neighbors.
        Converged lanes are untouched (lane-exact parity), and the pass is
        skipped entirely (lax.cond) when every lane converged.
    Returns:
      info_bits [B, k] uint8, success [B] bool, iters [B] int32
      (iters semantics match lastIterations(): 0-based iteration index at
      convergence, or max_iters when decoding failed; a lane rescued by
      trap_escape reports the RETRY's iteration count).
    """
    if msg_dtype is None:
        msg_dtype = _DEFAULT_MSG_DTYPE
    B = llrs.shape[0]
    m, n, D = code.m, code.n, code.max_degree
    row_vars = jnp.asarray(code.row_vars)          # [m, D]
    row_mask = jnp.asarray(code.row_mask)          # [m, D]
    flat_vars = jnp.asarray(code.row_vars.reshape(-1))  # [m*D]

    inf = jnp.float32(np.inf)
    eidx = jnp.arange(D)

    # --- unrolled-by-degree edge layout (round 5) -----------------------
    # The original [B, m, D] edge tensors put D (= 6-7) on the minor axis:
    # TPU tiles pad the minor dim to 128 lanes, so every materialized edge
    # intermediate cost ~18x its useful traffic, and the measured stage
    # budget at B=16384 was gather 3.5 ms + min-sum 1.8 + scatter-add 5.9.
    # Unrolling the D axis into D clean [B, m] arrays (and the scatter into
    # Dv per-variable gathers of [B, n]) keeps every array's minor dim at
    # m/n and replaces the scatter with gathers XLA fuses; arithmetic
    # VALUES and accumulation ORDER are preserved exactly (two-minima
    # tracking keeps the first-occurrence argmin; per-variable sums run in
    # ascending check order — the C++ loop order the old scatter-add's
    # index-ascending duplicate handling reproduced).
    rv_cols = [jnp.asarray(code.row_vars[:, d]) for d in range(D)]
    mask_cols = [jnp.asarray(code.row_mask[:, d]) for d in range(D)]
    var_edges_np, Dv = _var_edge_table(code)
    var_cols = [jnp.asarray(var_edges_np[:, j]) for j in range(Dv)]

    def _c2v(v2c):
        """Check-to-variable messages (min-sum, 0.75 scale) from a tuple of
        D f32 [B, m] edge arrays."""
        min1 = jnp.full((B, m), inf)
        min2 = jnp.full((B, m), inf)
        amin = jnp.zeros((B, m), jnp.int32)
        par = jnp.zeros((B, m), jnp.int32)
        negs = []
        for d in range(D):
            a = jnp.where(mask_cols[d], jnp.abs(v2c[d]), inf)
            neg = (mask_cols[d] & (v2c[d] < 0)).astype(jnp.int32)
            negs.append(neg)
            par = par ^ neg
            is_new = a < min1
            min2 = jnp.where(is_new, min1, jnp.minimum(min2, a))
            amin = jnp.where(is_new, d, amin)
            min1 = jnp.where(is_new, a, min1)
        out = []
        for d in range(D):
            sign = 1.0 - 2.0 * ((par ^ negs[d]) & 1).astype(jnp.float32)
            min_excl = jnp.where(amin == d, min2, min1)
            out.append(jnp.where(mask_cols[d],
                                 sign * min_excl * MIN_SUM_SCALE, 0.0))
        return tuple(out)

    def _llr_ok(llr_in, c2v):
        """Total LLR (llr_in + per-variable sums of c2v, ascending check
        order) + per-lane parity."""
        ce = jnp.concatenate(list(c2v) + [jnp.zeros((B, 1), jnp.float32)],
                             axis=1)                      # [B, D*m + 1]
        llr_total = llr_in
        for j in range(Dv):
            llr_total = llr_total + ce[:, var_cols[j]]
        # Syndrome as an MXU matmul instead of an edge gather: with
        # H = [H_data | I], syndrome = (hard_info @ H_data^T +
        # hard_parity) mod 2.  Integer counts in f32 are exact (degrees
        # << 2^24), so this is bit-identical to the gather+XOR but much
        # faster on TPU.
        hard = (llr_total < 0).astype(jnp.float32)
        counts = jnp.matmul(hard[:, :n - m], jnp.asarray(code.h_dense.T),
                            precision=jax.lax.Precision.HIGHEST) \
            + hard[:, n - m:]
        ok = (counts.astype(jnp.int32) & 1 == 0).all(-1)        # [B]
        return llr_total, ok

    def _v2c0(llr_in):
        """Initial messages; the msg_dtype round-trip keeps the fast bf16
        mode bit-identical to the old materialized-state first iteration."""
        return tuple(
            jnp.where(mask_cols[d], llr_in[:, rv_cols[d]], 0.0)
            .astype(msg_dtype).astype(jnp.float32) for d in range(D))

    def _run(llr_in):
        if max_iters == 0:  # static: no iterations, reference state0
            return llr_in, jnp.zeros(B, bool), jnp.zeros(B, jnp.int32)
        # ITERATION 0, stateless: c2v depends only on llr_in, so the first
        # (and at clean SNRs usually ONLY) iteration never needs the
        # [B, m, D] edge state written to HBM — XLA fuses
        # gather -> min-sum -> scatter in one pass.  Measured on the
        # headline bench every lane converges at iteration 0, and the
        # state round-trip was most of the 6.5 ms/iter LDPC stage.
        c2v0 = _c2v(_v2c0(llr_in))
        llr1, ok1 = _llr_ok(llr_in, c2v0)
        iters1 = jnp.where(ok1, 0, max_iters)

        def fast(_):
            return llr1, ok1, iters1

        def _next_v2c(llr_total, c2v):
            return tuple(
                jnp.where(mask_cols[d],
                          jnp.clip(llr_total[:, rv_cols[d]] - c2v[d],
                                   -V2C_CLAMP, V2C_CLAMP), 0.0)
                .astype(msg_dtype) for d in range(D))

        def slow(_):
            # Continue EXACTLY where iteration 0 left off: the old loop's
            # body computed v2c_new from the same (llr_total, c2v) pair.
            c2v0s = _c2v(_v2c0(llr_in))  # recomputed inside the rare branch
            v2c1 = _next_v2c(llr1, c2v0s)

            def one_iter(v2c):
                # Messages may be stored bf16; all arithmetic runs f32.
                v2c = tuple(x.astype(jnp.float32) for x in v2c)
                c2v = _c2v(v2c)
                llr_total, ok = _llr_ok(llr_in, c2v)
                return _next_v2c(llr_total, c2v), llr_total, ok

            def cond(state):
                it, _, _, done, _ = state
                return (it < max_iters) & ~done.all()

            def body(state):
                it, v2c, llr_total, done, iters = state
                v2c_new, llr_new, ok = one_iter(v2c)
                # Freeze converged lanes.
                keep = done[:, None]
                v2c = tuple(jnp.where(keep, o, nw)
                            for o, nw in zip(v2c, v2c_new))
                llr_total = jnp.where(keep, llr_total, llr_new)
                newly = ~done & ok
                iters = jnp.where(newly, it, iters)
                done = done | ok
                return it + 1, v2c, llr_total, done, iters

            state0 = (jnp.int32(1), v2c1, llr1, ok1, iters1)
            _, _, llr_total, done, iters = jax.lax.while_loop(
                cond, body, state0)
            return llr_total, done, iters

        return jax.lax.cond(ok1.all() | (max_iters <= 1), fast, slow,
                            operand=None)

    llr_in = llrs.astype(jnp.float32)
    llr_total, done, iters = _run(llr_in)

    if trap_escape:
        def retry(args):
            llr_total, done, iters = args
            # Unsatisfied checks of the failed hard decision.
            hard = (llr_total < 0).astype(jnp.float32)
            counts = jnp.matmul(hard[:, :n - m], jnp.asarray(code.h_dense.T),
                                precision=jax.lax.Precision.HIGHEST) \
                + hard[:, n - m:]
            unsat = (counts.astype(jnp.int32) & 1) == 1           # [B, m]
            sus = (unsat[:, :, None] & row_mask).reshape(B, -1)   # [B, m*D]
            suspect = jnp.zeros((B, n), bool) \
                .at[:, flat_vars].max(sus)                        # [B, n]
            llr2 = jnp.where(suspect, 0.0, llr_in)
            llr_t2, done2, iters2 = _run(llr2)
            take = (~done & done2)[:, None]
            return (jnp.where(take, llr_t2, llr_total),
                    done | done2,
                    jnp.where(take[:, 0], iters2, iters))
        llr_total, done, iters = jax.lax.cond(
            done.all(), lambda a: a, retry, (llr_total, done, iters))

    info_bits = (llr_total[:, :code.k] < 0).astype(jnp.uint8)
    return info_bits, done, iters


def decode_hard(code: LDPCCode, bits: jnp.ndarray, max_iters: int = DEFAULT_MAX_ITERS):
    """Hard-input decode: bit b -> LLR -6/+6 (ldpc_decoder.cpp:267-281)."""
    llrs = jnp.where(bits > 0, -HARD_LLR, HARD_LLR).astype(jnp.float32)
    return decode(code, llrs, max_iters)


def decode_soft_stream(code: LDPCCode, llrs: np.ndarray,
                       max_iters: int = DEFAULT_MAX_ITERS):
    """Multi-block decode of a 1-D LLR stream (ldpc_decoder.cpp:283-428).

    Chunks the stream into n-bit codewords (zero-padding a trailing partial
    block), decodes them as one device batch, and returns the concatenated
    info BITS packed into bytes only once at the very end — exactly the
    reference's bit-level multi-block semantics.

    Returns (decoded_bytes, success, per_block_iters).
    """
    from ..utils.bits import bits_to_bytes
    llrs = np.asarray(llrs, dtype=np.float32).reshape(-1)
    if llrs.size == 0:
        return b"", False, np.zeros(0, np.int32)
    n = code.n
    nb = (llrs.size + n - 1) // n
    padded = np.zeros(nb * n, dtype=np.float32)
    padded[:llrs.size] = llrs
    blocks = jnp.asarray(padded.reshape(nb, n))
    info, ok, iters = decode(code, blocks, max_iters)
    info = np.asarray(info).reshape(-1)
    return bits_to_bytes(info), bool(np.asarray(ok).all()), np.asarray(iters)


def decode_hard_stream(code: LDPCCode, data: bytes,
                       max_iters: int = DEFAULT_MAX_ITERS):
    """Byte-stream hard decode (LDPCDecoder::decode)."""
    from ..utils.bits import bytes_to_bits
    bits = bytes_to_bits(data).astype(np.float32)
    llrs = np.where(bits > 0, -HARD_LLR, HARD_LLR).astype(np.float32)
    return decode_soft_stream(code, llrs, max_iters)

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

    def gather_vars(x):  # x: [B, n] -> [B, m, D]
        # Measured: XLA's gather/scatter beat one-hot MXU contractions for
        # these [B, m, D] edge shapes; only the parity check (below) wins
        # as a matmul.
        return x[:, row_vars]

    def _run(llr_in):
        v2c0 = jnp.where(row_mask, gather_vars(llr_in), 0.0).astype(msg_dtype)

        def one_iter(v2c):
            # Messages may be stored bf16; all arithmetic runs f32.
            v2c = v2c.astype(jnp.float32)
            # --- check-to-variable (min-sum, 0.75 scale) ---
            neg = (v2c < 0) & row_mask
            row_par = neg.sum(-1) & 1                              # [B, m]
            edge_par = (row_par[..., None] ^ neg.astype(jnp.int32)) & 1
            sign = 1.0 - 2.0 * edge_par.astype(jnp.float32)

            a = jnp.where(row_mask, jnp.abs(v2c), inf)
            min1 = a.min(-1, keepdims=True)
            amin = a.argmin(-1)[..., None]
            a2 = jnp.where(eidx == amin, inf, a)
            min2 = a2.min(-1, keepdims=True)
            min_excl = jnp.where(eidx == amin, min2, min1)
            c2v = jnp.where(row_mask, sign * min_excl * MIN_SUM_SCALE, 0.0)

            # --- total LLR: llr_in + scatter-add of c2v over variables ---
            llr_total = llr_in + (
                jnp.zeros((B, n), jnp.float32)
                .at[:, flat_vars].add(c2v.reshape(B, -1)))

            # --- variable-to-check, clamped ---
            v2c_new = jnp.clip(gather_vars(llr_total) - c2v,
                               -V2C_CLAMP, V2C_CLAMP)
            v2c_new = jnp.where(row_mask, v2c_new, 0.0).astype(msg_dtype)

            # --- parity check on hard decisions ---
            # Syndrome as an MXU matmul instead of a [B, m, D] gather: with
            # H = [H_data | I], syndrome = (hard_info @ H_data^T +
            # hard_parity) mod 2.  Integer counts in f32 are exact (degrees
            # << 2^24), so this is bit-identical to the gather+XOR but much
            # faster on TPU.
            hard = (llr_total < 0).astype(jnp.float32)
            counts = jnp.matmul(hard[:, :n - m], jnp.asarray(code.h_dense.T),
                                precision=jax.lax.Precision.HIGHEST) \
                + hard[:, n - m:]
            ok = (counts.astype(jnp.int32) & 1 == 0).all(-1)        # [B]
            return v2c_new, llr_total, ok

        def cond(state):
            it, _, _, done, _ = state
            return (it < max_iters) & ~done.all()

        def body(state):
            it, v2c, llr_total, done, iters = state
            v2c_new, llr_new, ok = one_iter(v2c)
            # Freeze converged lanes.
            keep = done[:, None, None]
            v2c = jnp.where(keep, v2c, v2c_new)
            llr_total = jnp.where(done[:, None], llr_total, llr_new)
            newly = ~done & ok
            iters = jnp.where(newly, it, iters)
            done = done | ok
            return it + 1, v2c, llr_total, done, iters

        state0 = (jnp.int32(0), v2c0, llr_in,
                  jnp.zeros(B, bool), jnp.full(B, max_iters, jnp.int32))
        _, _, llr_total, done, iters = jax.lax.while_loop(cond, body, state0)
        return llr_total, done, iters

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

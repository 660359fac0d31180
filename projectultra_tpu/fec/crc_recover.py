"""CRC-aided recovery of parity-free LDPC info bits.

The reference H construction (src/fec/ldpc_encoder.cpp:70-128) saturates its
check-edge slots early at the high rates, leaving info-bit columns with ZERO
parity checks: 161 of 486 at R3/4 (bits 325+), 323 of 540 at R5/6 (bits
217+).  Those bits take raw demapper decisions — min-sum can neither fix nor
even notice a flip there, so a frame can arrive with every codeword
``cw_ok=True`` and still fail its frame CRC16.  Measured at QAM256 R5/6 on
the NVIS profile this is a 5-10%% payload-dependent residual frame loss
(docs/PERF.md), previously only ARQ-recoverable.

The frame CRC16 (frame_v2.crc16_ccitt: poly 0x1021, init 0xFFFF, no final
xor) is AFFINE over GF(2): crc(m ^ e) = crc(m) ^ L(e) where L is linear.  So
flipping message bit p changes the CRC by a constant 16-bit *syndrome*
``delta(p)`` that depends only on how many bits follow p — and recovering a
failed frame becomes syndrome decoding: find the subset of candidate
positions whose deltas XOR to the observed CRC mismatch.  Candidates are the
parity-free positions gated to the low-|LLR| tail (the demapper's pilot-diff
noise scaling keeps genuinely wrong bits low-confidence — measured at ranks
1-2 of ~10k); the search tries singles, then pairs, then triples, returning
the minimal-cardinality, minimal-sum-|LLR| match.

This is a capability the reference does NOT have (it retransmits instead);
interop is unaffected because recovery only rewrites bits the code never
protected, and the result must still pass the frame's own CRC + header CRC.
"""

from __future__ import annotations

import functools

import numpy as np

from ..config import CodeRate
from . import ldpc

#: Candidate gating: only parity-free positions with |LLR| <= GATE_FRAC *
#: median(pool |LLR|) enter the search.  Measured (NVIS QAM256 R5/6,
#: 2000-byte frames at 28-30 dB): genuinely wrong bits sit at |LLR| ranks
#: 1-2 of ~10k with a wide margin to the correct-bit distribution (>99% of
#: parity-free bits read AT the +-10 demapper clip; wrong ones at 0.5-3),
#: so a tight gate keeps recovery coverage while holding the chance-match
#: rate of the 16-bit syndrome space down (a false match would deliver a
#: CRC-valid wrong frame; with <=12 gated candidates the expected false
#: singles+pairs+triples are (12 + 66 + 220)/65536 ~ 0.005 per
#: *unrecoverable* frame).  Quads and beyond are deliberately NOT searched:
#: deeper subsets are chance-match territory at 16 CRC bits.
#: Measured landscape (tools/ + /tmp harness, 2026-08-18): the demapper's
#: LLR clip is +-10 with min 0.5 (docs/INVARIANTS mirror), and >99% of
#: parity-free bits sit AT the clip — wrong bits were at 0.5-3.0.  Gate at
#: 0.6 * median (= 6.0 at the clip) keeps 2x margin over the worst observed
#: wrong bit while excluding essentially every correct one.
GATE_FRAC = 0.6
#: Sparse-regime guard: recovery exists for the EVM-floor failure mode
#: (1-3 wrong bits, measured pools of 1-5 sub-gate candidates).  When MANY
#: parity-free bits read low-confidence the frame is in a dense-corruption
#: regime (e.g. R3/4 image-leakage at CFO >= 0.5 Hz on the real front:
#: dozens of wrong bits) where a 16-bit syndrome match is overwhelmingly a
#: CHANCE match — measured: 5/8 such "recoveries" delivered CRC-valid
#: WRONG frames before this guard.  Decline and let ARQ retransmit.
SPARSE_POOL_MAX = 12


@functools.lru_cache(maxsize=None)
def parity_free_positions(rate: CodeRate) -> np.ndarray:
    """Info-bit columns with zero check edges (immutable, per rate)."""
    code = ldpc.get_code(rate)
    return np.where(code.h_dense.sum(axis=0) == 0)[0].astype(np.int64)


def _crc_step(s: int) -> int:
    """One message-bit step of the CRC16-CCITT LFSR on a 16-bit state."""
    s <<= 1
    if s & 0x10000:
        s ^= 0x11021
    return s & 0xFFFF


@functools.lru_cache(maxsize=64)
def crc_bit_deltas(total_bits: int) -> np.ndarray:
    """delta[p] = crc16(m ^ bit_p) ^ crc16(m) for any message of
    ``total_bits`` bits.  MSB-first CRC consumes bit p by XOR-injecting it
    at register bit 15 and stepping once, then steps once more per later
    bit: delta(p) = step^(total_bits - p)(0x8000)."""
    out = np.empty(total_bits, dtype=np.uint16)
    d = 0x8000
    for t in range(1, total_bits + 1):
        d = _crc_step(d)
        out[total_bits - t] = d
    return out


def _search(pool: list[tuple[int, int, float]], target: int):
    """Find subsets of the gated pool (frame_bit, syndrome, |llr|), sorted
    by |llr| ascending, whose syndromes XOR to ``target``.  Returns the best
    (minimal cardinality, then minimal sum |llr|) list of frame-bit
    positions, or None.  Searches singles, then pairs, then triples — quads
    and beyond are chance-match territory at 16 CRC bits (see GATE_FRAC)."""
    if target == 0:
        return None
    n = len(pool)
    best = None  # (sum_llr, [frame_bits])

    def consider(idxs):
        nonlocal best
        s = sum(pool[i][2] for i in idxs)
        if best is None or s < best[0]:
            best = (s, [pool[i][0] for i in idxs])

    # Lowest-|llr| representative per syndrome (pool is sorted ascending).
    by_synd: dict[int, int] = {}
    for i in range(n):
        syn = pool[i][1]
        if syn == target:
            consider([i])
        if syn not in by_synd:
            by_synd[syn] = i
    if best is not None:
        return best[1]

    for a in range(n):
        b = by_synd.get(target ^ pool[a][1])
        if b is not None and b > a:
            consider((a, b))
    if best is not None:
        return best[1]

    for a in range(n):
        ta = target ^ pool[a][1]
        for b in range(a + 1, n):
            c = by_synd.get(ta ^ pool[b][1])
            if c is not None and c > b:
                consider((a, b, c))
    return best[1] if best is not None else None


def recover_frame(frame_bytes: bytes, llr_blocks, rate: CodeRate,
                  crc_region_end: int) -> bytes | None:
    """Try to repair ``frame_bytes`` (reassembled codeword info bytes,
    already truncated to the expected frame size) whose trailing CRC16 over
    ``frame_bytes[:crc_region_end-2]`` fails, by flipping parity-free
    info bits chosen by CRC syndrome + |LLR| ranking.

    ``llr_blocks``: per-codeword channel LLR arrays (deinterleaved, codeword
    bit order — info bits first), one per codeword in frame order.
    ``crc_region_end``: offset one past the frame CRC (== len(frame) for
    data frames).  Returns repaired bytes or None.
    """
    from ..protocol.frame_v2 import crc16_ccitt

    rate = CodeRate(rate)
    pf = parity_free_positions(rate)
    if pf.size == 0 or crc_region_end < 3 or len(frame_bytes) < crc_region_end:
        return None
    code = ldpc.get_code(rate)
    bpc = code.k // 8

    msg = frame_bytes[:crc_region_end - 2]
    stored = int.from_bytes(frame_bytes[crc_region_end - 2:crc_region_end],
                            "big")
    target = crc16_ccitt(msg) ^ stored
    if target == 0:
        return None  # CRC already consistent — nothing to do

    msg_bits = (crc_region_end - 2) * 8
    deltas = crc_bit_deltas(msg_bits)

    # Candidates: every parity-free info bit that lands inside the CRC'd
    # message or inside the stored CRC field itself.  Frame layout
    # (frame_v2.reassemble_codewords): codeword 0 contributes its full bpc
    # info bytes; codewords i>0 carry a DATA_CW_HEADER_SIZE marker prefix
    # that is stripped on reassembly.
    from ..protocol.frame_v2 import DATA_CW_HEADER_SIZE as CWH
    cands: list[tuple[int, int, float]] = []
    for c, blk in enumerate(llr_blocks):
        blk = np.asarray(blk)
        skip = 0 if c == 0 else CWH
        fbyte0 = 0 if c == 0 else bpc + (c - 1) * (bpc - CWH)
        for j in pf:
            byte_in_cw = int(j) // 8
            if byte_in_cw < skip or byte_in_cw >= bpc:
                continue  # marker prefix / sub-byte padding tail
            fb = (fbyte0 + byte_in_cw - skip) * 8 + int(j) % 8
            if fb >= crc_region_end * 8:
                continue
            if fb < msg_bits:
                syn = int(deltas[fb])
            else:
                syn = 1 << (15 - (fb - msg_bits))  # bit of the stored CRC
            cands.append((fb, syn, float(abs(blk[int(j)]))))
    if not cands:
        return None
    cands.sort(key=lambda t: t[2])
    gate = GATE_FRAC * float(np.median([c[2] for c in cands]))
    pool = [c for c in cands if c[2] <= gate]
    if not pool or len(pool) > SPARSE_POOL_MAX:
        return None  # empty, or dense corruption — not recovery's regime

    flips = _search(pool, target)
    if flips is None:
        return None

    buf = bytearray(frame_bytes)
    for fb in flips:
        buf[fb // 8] ^= 0x80 >> (fb % 8)
    if crc16_ccitt(bytes(buf[:crc_region_end - 2])) != int.from_bytes(
            buf[crc_region_end - 2:crc_region_end], "big"):
        return None
    return bytes(buf)

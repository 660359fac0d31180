"""Soft demapping kernels: equalized symbols -> LLRs, fully vectorized.

Reference: src/ofdm/soft_demap.hpp.  All functions broadcast over arbitrary
leading axes (frames x symbols x carriers); per-bit LLRs are emitted on a new
trailing axis in the reference's bit order (MSB first).

LLR convention: positive = bit 0 (matches the LDPC decoder's input).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import Modulation
from ..ofdm import constellations as con

MAX_LLR = 10.0
MIN_LLR_MAG = 0.5

# Channel-estimation error margins (demodulator_constants.hpp:102-107).
CE_MARGIN = {
    Modulation.DBPSK: 1.0, Modulation.DQPSK: 1.0, Modulation.BPSK: 1.0,
    Modulation.QPSK: 1.0, Modulation.D8PSK: 1.1, Modulation.QAM8: 1.1,
    Modulation.QAM16: 1.2, Modulation.QAM32: 1.5, Modulation.QAM64: 1.8,
    Modulation.QAM256: 2.5,
}

QAM16_THRESHOLD = 0.6324555320336759   # 2/sqrt(10)
QAM64_D2 = 0.3086067
QAM64_D4 = 0.6172134
QAM256_D2 = 0.1290994
QAM256_D4 = 0.2581989
QAM256_D8 = 0.5163978


def clip_llr(llr):
    """Clip to +-10 and enforce minimum magnitude 0.5 preserving sign
    (soft_demap.hpp:22-29)."""
    c = jnp.clip(llr, -MAX_LLR, MAX_LLR)
    small = jnp.abs(c) < MIN_LLR_MAG
    return jnp.where(small, jnp.where(c >= 0, MIN_LLR_MAG, -MIN_LLR_MAG), c)


def hard_decision(mod: Modulation, sym):
    """Nearest constellation point per symbol (hardDecision,
    channel_equalizer.cpp:608-700 — the reference slices per I/Q axis; the
    exhaustive nearest-point search is identical on Gray-mapped square/cross
    grids and vectorizes as one [..., M] distance reduction)."""
    pts = jnp.asarray(con.table(mod))          # [M] c64 (1-D host constant)
    d2 = (jnp.square(sym.real[..., None] - pts.real)
          + jnp.square(sym.imag[..., None] - pts.imag))
    return pts[jnp.argmin(d2, axis=-1)]


# ---------------------------------------------------------------------------
# Coherent demappers
# ---------------------------------------------------------------------------

def demap_bpsk(sym, nv):
    return clip_llr(-2.0 * sym.real / nv)[..., None]


def demap_qpsk(sym, nv):
    scale = -2.0 * con.QPSK_SCALE / nv
    return clip_llr(jnp.stack([sym.real * scale, sym.imag * scale], axis=-1))


def demap_qam16(sym, nv):
    I, Q = sym.real, sym.imag
    s = 2.0 / nv
    return clip_llr(jnp.stack([
        -s * I, s * (jnp.abs(I) - QAM16_THRESHOLD),
        -s * Q, s * (jnp.abs(Q) - QAM16_THRESHOLD)], axis=-1))


def demap_qam32(sym, nv):
    """Brute-force max-log-MAP over the 32-point constellation
    (soft_demap.hpp:68-121)."""
    pts, bits = con.qam32_points_and_bits()
    pts = jnp.asarray(pts)
    d2 = jnp.abs(sym[..., None] - pts) ** 2          # [..., 32]
    s = 2.0 / nv
    llrs = []
    for b in range(5):
        mask = (bits & (1 << (4 - b))) != 0
        mask = jnp.asarray(mask)
        d1 = jnp.where(mask, d2, jnp.inf).min(-1)
        d0 = jnp.where(mask, jnp.inf, d2).min(-1)
        llrs.append(s * (d1 - d0))
    return clip_llr(jnp.stack(llrs, axis=-1))


def demap_qam64(sym, nv):
    I, Q = sym.real, sym.imag
    s = 2.0 / nv
    return clip_llr(jnp.stack([
        -s * I,
        s * (jnp.abs(I) - QAM64_D4),
        s * (jnp.abs(jnp.abs(I) - QAM64_D4) - QAM64_D2),
        -s * Q,
        s * (jnp.abs(Q) - QAM64_D4),
        s * (jnp.abs(jnp.abs(Q) - QAM64_D4) - QAM64_D2)], axis=-1))


def demap_qam256(sym, nv):
    I, Q = sym.real, sym.imag
    s = 2.0 / nv

    def chain(x):
        a1 = jnp.abs(x) - QAM256_D8
        a2 = jnp.abs(a1) - QAM256_D4
        a3 = jnp.abs(a2) - QAM256_D2
        return [-s * x, s * a1, s * a2, s * a3]

    return clip_llr(jnp.stack(chain(I) + chain(Q), axis=-1))


# ---------------------------------------------------------------------------
# Differential demappers (prev-symbol comparisons)
# ---------------------------------------------------------------------------

_WEAK = 1e-6


def demap_dbpsk(sym, prev, nv):
    diff = sym * jnp.conj(prev)
    sp = jnp.abs(sym) * jnp.abs(prev)
    phase = jnp.arctan2(diff.imag, diff.real)
    llr = clip_llr(2.0 * sp * jnp.cos(phase) / nv)
    return jnp.where(sp < _WEAK, 0.0, llr)[..., None]


def demap_dqpsk(sym, prev, nv):
    """2 LLRs: sin(phase+pi/4) and cos(2*phase) metrics
    (soft_demap.hpp:192-213)."""
    diff = sym * jnp.conj(prev)
    phase = jnp.arctan2(diff.imag, diff.real)
    sp = jnp.abs(sym) * jnp.abs(prev)
    scale = 2.0 * sp / nv
    llrs = jnp.stack([clip_llr(scale * jnp.sin(phase + jnp.pi / 4)),
                      clip_llr(scale * jnp.cos(2 * phase))], axis=-1)
    return jnp.where((sp < _WEAK)[..., None], 0.0, llrs)


def demap_d8psk(sym, prev, nv):
    diff = sym * jnp.conj(prev)
    phase = jnp.arctan2(diff.imag, diff.real)
    sp = jnp.abs(sym) * jnp.abs(prev)
    conf = sp / nv
    llrs = jnp.stack([clip_llr(conf * jnp.sin(phase)),
                      clip_llr(conf * jnp.sin(2.0 * phase)),
                      clip_llr(conf * jnp.sin(4.0 * phase))], axis=-1)
    return jnp.where((sp < _WEAK)[..., None], 0.0, llrs)


_COHERENT = {
    Modulation.BPSK: demap_bpsk,
    Modulation.QPSK: demap_qpsk,
    Modulation.QAM16: demap_qam16,
    Modulation.QAM32: demap_qam32,
    Modulation.QAM64: demap_qam64,
    Modulation.QAM256: demap_qam256,
}

_DIFFERENTIAL = {
    Modulation.DBPSK: demap_dbpsk,
    Modulation.DQPSK: demap_dqpsk,
    Modulation.D8PSK: demap_d8psk,
}


def demap(mod: Modulation, sym, nv, prev=None):
    """Dispatch (static): [..., C] symbols -> [..., C, bits] LLRs."""
    if mod in _DIFFERENTIAL:
        return _DIFFERENTIAL[mod](sym, prev, nv)
    return _COHERENT.get(mod, demap_qpsk)(sym, nv)

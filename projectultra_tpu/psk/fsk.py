"""BFSK with repetition coding: the very-low-SNR fallback waveform.

Reference: src/fsk/fsk.hpp (BFSK 31.25 baud, 50 Hz separation, 4x bit
repetition).  Note the waveform factory maps MFSK -> MC-DPSK in the
reference (waveform_factory.cpp:33-36 — MFSK is deprecated); this module
keeps the BFSK core for inventory parity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mixer as mixer_ops


@dataclasses.dataclass(frozen=True)
class FSKConfig:
    """(fsk.hpp:21-33)"""
    sample_rate: float = 48000.0
    center_freq: float = 1500.0
    freq_separation: float = 50.0
    samples_per_symbol: int = 1536
    repetition: int = 4

    @property
    def mark_freq(self) -> float:
        return self.center_freq + self.freq_separation / 2

    @property
    def space_freq(self) -> float:
        return self.center_freq - self.freq_separation / 2


@functools.lru_cache(maxsize=None)
def _tone_tables(cfg: FSKConfig):
    i = np.arange(cfg.samples_per_symbol, dtype=np.float64) / cfg.sample_rate
    mark = np.cos(2 * np.pi * cfg.mark_freq * i).astype(np.float32)
    space = np.cos(2 * np.pi * cfg.space_freq * i).astype(np.float32)
    mark_iq = np.exp(-2j * np.pi * cfg.mark_freq * i).astype(np.complex64)
    space_iq = np.exp(-2j * np.pi * cfg.space_freq * i).astype(np.complex64)
    return mark, space, mark_iq, space_iq


def generate_preamble(cfg: FSKConfig, num_symbols: int = 16) -> np.ndarray:
    """Alternating space/mark tones (fsk.hpp:42-51)."""
    mark, space, _, _ = _tone_tables(cfg)
    syms = [mark if (i % 2 == 1) else space for i in range(num_symbols)]
    return np.concatenate(syms)


@functools.partial(jax.jit, static_argnames=("cfg",))
def modulate(cfg: FSKConfig, bits: jnp.ndarray) -> jnp.ndarray:
    """[B, nbits] -> [B, nbits*rep*sps]: each bit repeated `repetition` times,
    mark = 1, space = 0."""
    mark, space, _, _ = _tone_tables(cfg)
    rep = jnp.repeat(bits.astype(jnp.float32), cfg.repetition, axis=-1)
    out = (rep[..., None] * jnp.asarray(mark)[None, None, :]
           + (1.0 - rep[..., None]) * jnp.asarray(space)[None, None, :])
    return out.reshape(bits.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def demodulate_soft(cfg: FSKConfig, samples: jnp.ndarray) -> jnp.ndarray:
    """Noncoherent tone discrimination + repetition combining:
    LLR > 0 => bit 0 (space)."""
    _, _, mark_iq, space_iq = _tone_tables(cfg)
    L = cfg.samples_per_symbol
    S = samples.shape[-1] // L
    x = samples[..., :S * L].reshape(*samples.shape[:-1], S, L).astype(jnp.complex64)
    e_mark = jnp.abs(x @ jnp.asarray(mark_iq)) / L
    e_space = jnp.abs(x @ jnp.asarray(space_iq)) / L
    per_sym = (e_space - e_mark) * 40.0          # + => space => bit 0
    nbits = S // cfg.repetition
    comb = per_sym[..., :nbits * cfg.repetition].reshape(
        *per_sym.shape[:-1], nbits, cfg.repetition).sum(-1)
    return jnp.clip(comb, -10.0, 10.0)

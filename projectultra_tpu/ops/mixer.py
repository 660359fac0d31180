"""NCO / frequency-shift phase ramps, computed analytically.

The reference uses an incremental NCO (src/dsp/filters.cpp:228-262) whose
float32 phase accumulator wraps at 2*pi.  On TPU we generate the oscillator
as a closed-form phase ramp exp(j*2*pi*f*t/fs) evaluated in float64 and cast
to complex64 — drift-free, branch-free, and trivially batchable.  For the
modem's fixed center frequency (1500 Hz at 48 kHz = exactly fs/32) the ramp
is exactly periodic with period 32 samples.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def osc(freq_hz, sample_rate: float, t):
    """exp(+j*2*pi*f*t/fs) for integer sample indices t (array).

    freq_hz may be a scalar or a batch-shaped array broadcastable against t.
    Phase is computed in f64 then reduced mod 2*pi before the f32 cos/sin.
    """
    t = jnp.asarray(t)
    phase = (2.0 * np.pi) * jnp.asarray(freq_hz, jnp.float64) * t / sample_rate
    phase = jnp.mod(phase, 2.0 * np.pi).astype(jnp.float32)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def osc_fixed(freq_hz: float, sample_rate: float, n: int, offset: int = 0) -> np.ndarray:
    """Host-side constant oscillator table for a fixed frequency."""
    t = np.arange(offset, offset + n, dtype=np.float64)
    phase = np.mod(2.0 * np.pi * freq_hz * t / sample_rate, 2.0 * np.pi)
    return np.exp(1j * phase).astype(np.complex64)


def cfo_correction(cfo_hz, sample_rate: float, t, initial_phase=0.0):
    """Reference CFO correction ramp (channel_equalizer.cpp:19-56):
    exp(j*(initial_phase - 2*pi*cfo*t/fs)), gated to identity when |cfo| <=
    0.01 Hz exactly like the C++ (the correction multiply is skipped there).
    """
    t = jnp.asarray(t)
    cfo = jnp.asarray(cfo_hz, jnp.float64)
    phase = (jnp.asarray(initial_phase, jnp.float64)
             - 2.0 * np.pi * cfo * t / sample_rate)
    corr = jnp.exp(1j * jnp.mod(phase, 2.0 * np.pi).astype(jnp.float32))
    active = jnp.abs(cfo).astype(jnp.float32) > 0.01
    return jnp.where(active, corr, jnp.complex64(1.0)).astype(jnp.complex64)

"""L1 DSP primitives: FIR/biquad filters, resampler, AGC, Hilbert, windows.

Reference: include/ultra/dsp.hpp + src/dsp/{filters.cpp, resampler.cpp}.
Design: filter DESIGN runs on host (numpy constants); filter APPLICATION is
batched device convolution/scan.  The reference's stateful sample-at-a-time
classes become stateless array transforms (state in, state out) — the JAX
idiom for streaming.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Window functions (dsp.hpp:196-198, filters.cpp createWindow)
# ---------------------------------------------------------------------------

def window(size: int, kind: str = "hann") -> np.ndarray:
    n = np.arange(size, dtype=np.float64)
    if kind == "hann":
        w = 0.5 * (1 - np.cos(2 * np.pi * n / (size - 1)))
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (size - 1))
    elif kind == "blackman":
        w = (0.42 - 0.5 * np.cos(2 * np.pi * n / (size - 1))
             + 0.08 * np.cos(4 * np.pi * n / (size - 1)))
    elif kind == "kaiser":
        w = np.kaiser(size, 8.6)
    else:
        raise ValueError(kind)
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# FIR design (windowed sinc, FIRFilter::lowpass/highpass/bandpass)
# ---------------------------------------------------------------------------

def fir_lowpass(taps: int, cutoff: float, sample_rate: float) -> np.ndarray:
    if taps % 2 == 0:
        taps += 1
    M = taps - 1
    fc = cutoff / sample_rate
    n = np.arange(taps, dtype=np.float64) - M / 2
    h = 2 * fc * np.sinc(2 * fc * n)
    h *= np.hamming(taps)
    return (h / h.sum()).astype(np.float32)


def fir_highpass(taps: int, cutoff: float, sample_rate: float) -> np.ndarray:
    if taps % 2 == 0:
        taps += 1
    lp = fir_lowpass(taps, cutoff, sample_rate)
    h = -lp
    h[(taps - 1) // 2] += 1.0
    return h.astype(np.float32)


def fir_bandpass(taps: int, low: float, high: float,
                 sample_rate: float) -> np.ndarray:
    if taps % 2 == 0:
        taps += 1
    lp_hi = fir_lowpass(taps, high, sample_rate)
    lp_lo = fir_lowpass(taps, low, sample_rate)
    return (lp_hi - lp_lo).astype(np.float32)


def fir_apply(samples: jnp.ndarray, coeffs: np.ndarray) -> jnp.ndarray:
    """Causal FIR along the last axis (same semantics as the reference's
    delay-line loop: y[n] = sum_k h[k] x[n-k]); batched FFT convolution."""
    T = samples.shape[-1]
    L = len(coeffs)
    n_fft = 1 << int(T + L - 2).bit_length()
    X = jnp.fft.rfft(samples, n=n_fft, axis=-1)
    H = jnp.fft.rfft(jnp.asarray(coeffs), n=n_fft)
    return jnp.fft.irfft(X * H, n=n_fft, axis=-1)[..., :T].astype(samples.dtype)


# ---------------------------------------------------------------------------
# Biquad (BiquadFilter, filters.cpp:120-190) — linear recurrence via scan
# ---------------------------------------------------------------------------

def biquad_lowpass(freq: float, q: float, sample_rate: float):
    w0 = 2 * math.pi * freq / sample_rate
    alpha = math.sin(w0) / (2 * q)
    cw = math.cos(w0)
    b0, b1, b2 = (1 - cw) / 2, 1 - cw, (1 - cw) / 2
    a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    return np.array([b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0], np.float32)


def biquad_highpass(freq: float, q: float, sample_rate: float):
    w0 = 2 * math.pi * freq / sample_rate
    alpha = math.sin(w0) / (2 * q)
    cw = math.cos(w0)
    b0, b1, b2 = (1 + cw) / 2, -(1 + cw), (1 + cw) / 2
    a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    return np.array([b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0], np.float32)


def biquad_apply(samples: jnp.ndarray, coeffs: np.ndarray) -> jnp.ndarray:
    """Transposed direct-form II biquad via lax.scan along the last axis."""
    b0, b1, b2, a1, a2 = [float(c) for c in coeffs]

    def step(carry, x):
        z1, z2 = carry
        y = b0 * x + z1
        z1n = b1 * x - a1 * y + z2
        z2n = b2 * x - a2 * y
        return (z1n, z2n), y

    def one(sig):
        zeros = jnp.zeros((), sig.dtype)
        _, y = jax.lax.scan(step, (zeros, zeros), sig)
        return y

    flat = samples.reshape(-1, samples.shape[-1])
    out = jax.vmap(one)(flat)
    return out.reshape(samples.shape)


# ---------------------------------------------------------------------------
# Resampler (src/dsp/resampler.cpp): GCD up/down with anti-alias FIR
# ---------------------------------------------------------------------------

def resample(samples: jnp.ndarray, input_rate: int, output_rate: int,
             taps: int = 127) -> jnp.ndarray:
    g = math.gcd(input_rate, output_rate)
    up, down = output_rate // g, input_rate // g
    if up == 1 and down == 1:
        return samples
    T = samples.shape[-1]
    # Zero-stuff upsample.
    shape = (*samples.shape[:-1], T, up)
    stuffed = jnp.zeros(shape, samples.dtype).at[..., 0].set(samples * up)
    x = stuffed.reshape(*samples.shape[:-1], T * up)
    cutoff = 0.45 * min(input_rate, output_rate)
    h = fir_lowpass(taps, cutoff, input_rate * up)
    y = fir_apply(x, h)
    return y[..., ::down]


# ---------------------------------------------------------------------------
# AGC (filters.cpp:196-224) — per-sample envelope via scan
# ---------------------------------------------------------------------------

def agc(samples: jnp.ndarray, target: float = 0.5, attack: float = 0.01,
        decay: float = 0.001) -> jnp.ndarray:
    def step(gain, x):
        level = jnp.abs(x) * gain
        err = target - level
        rate = jnp.where(level > target, attack, decay)
        gain = jnp.clip(gain + rate * err, 0.01, 100.0)
        return gain, x * gain

    def one(sig):
        _, y = jax.lax.scan(step, jnp.float32(1.0), sig)
        return y

    flat = samples.reshape(-1, samples.shape[-1])
    return jax.vmap(one)(flat).reshape(samples.shape)


# ---------------------------------------------------------------------------
# Analytic signal / Hilbert (shared with sync), RMS / peak / dB utils
# ---------------------------------------------------------------------------

def hilbert_analytic(samples: jnp.ndarray) -> jnp.ndarray:
    from ..sync.schmidl_cox import analytic_signal
    return analytic_signal(samples)


def rms(samples: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(samples * samples, axis=-1))


def peak(samples: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(samples), axis=-1)


def normalize(samples: jnp.ndarray, target: float = 1.0) -> jnp.ndarray:
    p = peak(samples)[..., None]
    return jnp.where(p > 0, samples * (target / jnp.maximum(p, 1e-30)), samples)


def to_db(linear):
    return 20.0 * jnp.log10(linear + 1e-10)


def from_db(db):
    return 10.0 ** (db / 20.0)

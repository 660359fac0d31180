"""Live-observability data export: waterfall + constellation.

Reference: src/gui/widgets/{waterfall,constellation}.  The rebuild omits the
ImGui GUI (SURVEY.md §7 stage 9) and instead exports the same data products
so any frontend (notebook, web UI) can render them: the waterfall is the
batched STFT the GUI computed per frame, the constellation comes from the
demodulators' equalized symbols.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def waterfall(samples, fft_size: int = 2048, hop: int | None = None,
              max_lines: int = 200, sample_rate: float = 48000.0):
    """[T] or [B, T] audio -> (power_db [lines, fft/2+1], freqs [fft/2+1]).

    Matches the GUI waterfall's 2048-point FFT / 200-line window
    (src/gui/widgets/waterfall.cpp per docs/GUI_ARCHITECTURE.md).
    [B, T] input is flattened in time order (the GUI feeds one continuous
    stream; concatenation preserves every frame instead of silently
    dropping rows 1..B-1); inputs shorter than fft_size are zero-padded to
    one full line."""
    x = jnp.atleast_2d(jnp.asarray(samples, jnp.float32)).reshape(-1)
    if x.shape[-1] < fft_size:
        x = jnp.pad(x, (0, fft_size - x.shape[-1]))
    hop = hop or fft_size // 2
    n_lines = min(max_lines, max(1, (x.shape[-1] - fft_size) // hop + 1))
    idx = (jnp.arange(n_lines)[:, None] * hop
           + jnp.arange(fft_size)[None, :])
    frames = x[idx] * jnp.hanning(fft_size)
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    power_db = 10.0 * jnp.log10(spec + 1e-12)
    freqs = np.fft.rfftfreq(fft_size, 1.0 / sample_rate)
    return np.asarray(power_db), freqs


def constellation(equalized, max_symbols: int = 500):
    """Flatten equalized symbols to at most max_symbols IQ points
    (MAX_CONSTELLATION_SYMBOLS, demodulator_constants.hpp:122)."""
    pts = np.asarray(equalized).reshape(-1)
    if len(pts) > max_symbols:
        pts = pts[-max_symbols:]
    return np.stack([pts.real, pts.imag], axis=-1)

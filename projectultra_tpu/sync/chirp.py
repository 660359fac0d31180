"""Dual-chirp acquisition: generation + batched matched-filter detection.

Reference: src/sync/chirp_sync.hpp.  TPU-native redesign per SURVEY.md §7:
the reference slides an O(L) complex correlation across the buffer at a
coarse 48-sample step then refines (chirp_sync.hpp:560-630).  Here the
correlation is evaluated at EVERY offset with one FFT-domain matched filter
(rfft -> multiply by conj(template fft) -> irfft) and a cumulative-sum
sliding energy window — strictly denser search than the reference at a tiny
fraction of the FLOPs, fully batched over frames.

CFO physics (chirp_sync.hpp:326-345): a frequency offset shifts the up-chirp
correlation peak by -CFO*fs/k samples and the down-chirp peak by +CFO*fs/k
(k = 4800 Hz/s), so CFO = gap_error / (2 * fs/k) and the true positions are
recovered by applying the opposite shifts.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChirpConfig:
    """(chirp_sync.hpp:26-36)"""
    sample_rate: float = 48000.0
    f_start: float = 300.0
    f_end: float = 2700.0
    duration_ms: float = 500.0
    gap_ms: float = 100.0
    amplitude: float = 0.5
    tx_cfo_hz: float = 0.0
    use_dual_chirp: bool = True

    @property
    def chirp_samples(self) -> int:
        return int(self.sample_rate * self.duration_ms / 1000.0)

    @property
    def gap_samples(self) -> int:
        return int(self.sample_rate * self.gap_ms / 1000.0)

    @property
    def total_samples(self) -> int:
        if self.use_dual_chirp:
            return 2 * self.chirp_samples + 2 * self.gap_samples
        return self.chirp_samples + self.gap_samples

    @property
    def chirp_rate(self) -> float:
        return (self.f_end - self.f_start) / (self.duration_ms / 1000.0)

    @property
    def cfo_to_samples(self) -> float:
        """Peak shift per Hz of CFO: fs / k = 10 samples/Hz."""
        return self.sample_rate / self.chirp_rate


MAX_REASONABLE_CFO_HZ = 100.0


def _phase_up(cfg: ChirpConfig, t: np.ndarray, cfo: float = 0.0) -> np.ndarray:
    return 2.0 * np.pi * ((cfg.f_start + cfo) * t + 0.5 * cfg.chirp_rate * t * t)


def _phase_down(cfg: ChirpConfig, t: np.ndarray, cfo: float = 0.0) -> np.ndarray:
    return 2.0 * np.pi * ((cfg.f_end + cfo) * t - 0.5 * cfg.chirp_rate * t * t)


@functools.lru_cache(maxsize=None)
def generate(cfg: ChirpConfig) -> np.ndarray:
    """TX chirp sequence: [up][gap][down][gap] (chirp_sync.hpp:59-105)."""
    t = np.arange(cfg.chirp_samples, dtype=np.float64) / cfg.sample_rate
    out = np.zeros(cfg.total_samples, dtype=np.float32)
    out[:cfg.chirp_samples] = cfg.amplitude * np.sin(
        _phase_up(cfg, t, cfg.tx_cfo_hz))
    if cfg.use_dual_chirp:
        d0 = cfg.chirp_samples + cfg.gap_samples
        out[d0:d0 + cfg.chirp_samples] = cfg.amplitude * np.sin(
            _phase_down(cfg, t, cfg.tx_cfo_hz))
    return out


@functools.lru_cache(maxsize=None)
def _templates(cfg: ChirpConfig):
    """Analytic (cos + j*sin) templates + energies, host constants."""
    t = np.arange(cfg.chirp_samples, dtype=np.float64) / cfg.sample_rate
    pu = _phase_up(cfg, t)
    pd = _phase_down(cfg, t)
    up = (np.cos(pu) + 1j * np.sin(pu)).astype(np.complex64)
    down = (np.cos(pd) + 1j * np.sin(pd)).astype(np.complex64)
    e_up = float((np.sin(pu).astype(np.float32) ** 2).sum())
    e_down = float((np.sin(pd).astype(np.float32) ** 2).sum())
    return up, down, e_up, e_down


def _corr_all(samples: jnp.ndarray, tmpl: np.ndarray, tmpl_energy: float,
              n_fft: int, S: jnp.ndarray | None = None,
              energy: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized complex-correlation magnitude at every offset.

    corr[p] = |sum_i s[p+i] * tmpl[i]| / sqrt(energy[p] * tmpl_energy)
    via one FFT matched filter + sliding energy. Output [B, T-L+1].

    S / energy: optionally precomputed fft(samples, n_fft) and L-sample
    sliding energy — detect_dual_chirp correlates TWO templates of the
    same length against the same buffer, and the [B, n_fft] signal FFT is
    the single largest op in the acquisition workload."""
    B, T = samples.shape
    L = tmpl.shape[0]
    if S is None:
        S = jnp.fft.fft(samples.astype(jnp.complex64), n=n_fft, axis=-1)
    # sum_i s[p+i]*tmpl[i] = ifft(fft(s) * conj(fft(conj(tmpl))))[p]
    Tf = jnp.fft.fft(jnp.conj(jnp.asarray(tmpl)), n=n_fft)
    corr = jnp.fft.ifft(S * jnp.conj(Tf), axis=-1)[:, :T - L + 1]

    if energy is None:
        # Block-stable sliding energy: a global f32 cumsum difference loses
        # all windowed-sum precision past ~50k samples (CLAUDE.md
        # invariant), and chirp buffers are >=105.6k by construction.
        from projectultra_tpu.sync.schmidl_cox import _window_sum
        energy = _window_sum(samples * samples, L)
    denom = jnp.sqrt(jnp.maximum(energy * tmpl_energy, 0.0))
    return jnp.where(denom > 1e-10, jnp.abs(corr) / denom, 0.0)


def _parabolic_refine(corr: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Sub-sample parabolic interpolation, rounded back to int
    (chirp_sync.hpp:607-620)."""
    n = corr.shape[-1]
    p = jnp.clip(pos, 1, n - 2)
    idx = jnp.arange(corr.shape[0])
    c0 = corr[idx, p - 1]
    c1 = corr[idx, p]
    c2 = corr[idx, p + 1]
    denom = 2.0 * (c0 - 2.0 * c1 + c2)
    delta = jnp.where(jnp.abs(denom) > 1e-10,
                      jnp.clip((c0 - c2) / jnp.where(jnp.abs(denom) > 1e-10,
                                                     denom, 1.0), -1.0, 1.0),
                      0.0)
    interior = (pos >= 1) & (pos <= n - 2)
    return jnp.where(interior, jnp.round(pos + delta).astype(jnp.int32), pos)


@functools.partial(jax.jit, static_argnames=("cfg", "threshold"))
def detect_dual_chirp(cfg: ChirpConfig, samples: jnp.ndarray,
                      threshold: float = 0.15):
    """Batched detectDualChirp (chirp_sync.hpp:349-505).

    Args:  samples [B, T] float32.
    Returns dict of arrays: success [B] bool, cfo_hz [B], up_chirp_start [B],
    down_chirp_start [B], up/down correlation [B].
    """
    B, T = samples.shape
    L = cfg.chirp_samples
    gap = cfg.gap_samples
    n_fft = 1 << int(T - 1).bit_length()
    up_t, down_t, e_up, e_down = _templates(cfg)

    S = jnp.fft.fft(samples.astype(jnp.complex64), n=n_fft, axis=-1)
    from projectultra_tpu.sync.schmidl_cox import _window_sum
    energy = _window_sum(samples * samples, L)
    corr_up = _corr_all(samples, up_t, e_up, n_fft, S, energy)  # [B, T-L+1]
    corr_dn = _corr_all(samples, down_t, e_down, n_fft, S, energy)
    n_pos = T - L + 1
    # Reference searches pos < samples.size() - L (exclusive of last).
    search_mask = jnp.arange(n_pos) < (T - L)

    cu = jnp.where(search_mask[None, :], corr_up, -1.0)
    idxb = jnp.arange(B)
    pos_idx = jnp.arange(n_pos)[None, :]
    c2s = cfg.cfo_to_samples

    def resolve(strong):
        """Earliest strong up candidate -> down-chirp validation -> CFO."""
        first = jnp.argmax(strong, axis=-1).astype(jnp.int32)
        # Local peak within +-512 of the first crossing.
        rel = jnp.arange(-512, 513)
        widx = jnp.clip(first[:, None] + rel[None, :], 0, cu.shape[-1] - 1)
        wc = cu[idxb[:, None], widx]
        up_pos = widx[idxb, jnp.argmax(wc, axis=-1)].astype(jnp.int32)
        up_corr = cu[idxb, up_pos]
        up_found = strong.any(-1) & (up_corr >= threshold)
        up_pos = _parabolic_refine(corr_up, up_pos)

        # Down-chirp search window (chirp_sync.hpp:420-438).
        start = up_pos + L // 2
        expected = up_pos + L + gap
        end = jnp.minimum(T, expected + 2 * L)
        end = jnp.where(end <= start + L, jnp.minimum(T, start + 2 * L), end)
        dn_mask = (pos_idx >= start[:, None]) & (pos_idx + L <= end[:, None]) \
            & (pos_idx < (T - L))
        cd = jnp.where(dn_mask, corr_dn, -1.0)
        down_pos = jnp.argmax(cd, axis=-1).astype(jnp.int32)
        down_corr = cd[idxb, down_pos]
        down_found = down_corr >= threshold
        down_pos = _parabolic_refine(corr_dn, down_pos)

        # CFO from gap error (10 samples/Hz sensitivity).
        gap_error = (down_pos - up_pos - (L + gap)).astype(jnp.float32)
        cfo_hz = gap_error / (2.0 * c2s)
        cfo_ok = jnp.abs(cfo_hz) <= MAX_REASONABLE_CFO_HZ
        success = up_found & down_found & cfo_ok
        return dict(success=success, up_pos=up_pos, up_corr=up_corr,
                    down_pos=down_pos, down_corr=down_corr,
                    down_found=down_found, cfo_hz=cfo_hz, strong=strong)

    # EARLIEST chirp wins, not the globally strongest: with several frames
    # in one buffer a global argmax would lock onto a later chirp and
    # discard everything before it.  Two candidate rules, validated by the
    # full up+down+CFO chain:
    #   A: earliest above the ABSOLUTE threshold — keeps a genuinely weak
    #      (faded) early frame that a relative floor would skip;
    #   B: earliest above max(threshold, 0.7*global max) — robust when A's
    #      first crossing is a noise spike whose down-chirp never matches.
    # A wins when it fully validates; otherwise fall back to B.
    gmax = cu.max(-1)
    res_a = resolve(cu >= threshold)
    res_b = resolve(cu >= jnp.maximum(threshold, 0.7 * gmax[:, None]))
    use_a = res_a["success"]

    def pick(k):
        a, b = res_a[k], res_b[k]
        if a.ndim == 1:
            return jnp.where(use_a, a, b)
        return jnp.where(use_a[:, None], a, b)

    success = jnp.where(use_a, res_a["success"], res_b["success"])
    up_pos = pick("up_pos")
    up_corr = pick("up_corr")
    down_pos = pick("down_pos")
    down_corr = pick("down_corr")
    down_found = jnp.where(use_a, res_a["down_found"], res_b["down_found"])
    cfo_hz = pick("cfo_hz")
    strong = pick("strong")

    # First strong up-chirp crossing AFTER the chosen one (next frame's
    # chirp): consumers cap buffer consumption there so a mis-sized consume
    # can never eat a following frame's preamble.
    later = strong & (pos_idx >= (up_pos + L)[:, None])
    has_next = later.any(-1)
    next_up = jnp.where(has_next, jnp.argmax(later, axis=-1), -1).astype(jnp.int32)

    up_start = jnp.round(up_pos + cfo_hz * c2s).astype(jnp.int32)
    down_start = jnp.round(down_pos - cfo_hz * c2s).astype(jnp.int32)

    return {
        "success": success,
        "cfo_hz": jnp.where(success, cfo_hz, 0.0),
        "up_chirp_start": up_start,
        "down_chirp_start": down_start,
        "up_correlation": up_corr,
        "down_correlation": jnp.where(down_found, down_corr, 0.0),
        "next_up_start": next_up,
    }


def training_start(cfg: ChirpConfig, down_chirp_start) -> jnp.ndarray:
    """Training begins after [down chirp][gap] (ofdm_chirp_waveform.cpp:155-160)
    — computed from the down-chirp position, which is more accurate under CFO."""
    return down_chirp_start + cfg.chirp_samples + cfg.gap_samples


def initial_cfo_phase(cfg: ChirpConfig, cfo_hz, train_start) -> jnp.ndarray:
    """Accumulated CFO-correction phase at the training start
    (ofdm_chirp_waveform.cpp:180-190), wrapped to [-pi, pi]."""
    phase = -2.0 * np.pi * cfo_hz * train_start.astype(jnp.float32) / cfg.sample_rate
    return jnp.mod(phase + np.pi, 2.0 * np.pi) - np.pi

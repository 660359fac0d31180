"""Adaptive narrowband interference excision (beyond-reference).

Real HF channels carry persistent narrowband interferers — broadcast
carriers, CW/RTTY stations, SSB tuning hets — that the reference never
tests or mitigates: a single CW tone at SIR 10 dB (SNR 20 dB) collapses
both OFDM_COX and MC_DPSK streaming decode to ~0/3 (measured round 4,
docs/PERF.md).  Physics: the tone inflates every normalized-correlation
energy window (acquisition gates fail) and parks a max-confidence wrong
line on whichever carriers it straddles.

This module watches the RX stream's spectrum and, when a PERSISTENT
NARROW line dominates the noise floor, inserts streaming IIR notch
biquads (native C cascade, projectultra_tpu.native.biquad_cascade —
per-sample recurrences with cross-chunk state are host-runtime work, not
TPU work) ahead of the modem's buffer.  Design constraints, each load-
bearing:

* PSD updates are gated to NOISE-DOMINATED spans (chunk power within
  QUIET_DB of the running floor): our own waveforms never look like
  lines there, so the detector cannot learn to notch a wanted signal.
  A real interferer persists through inter-frame gaps, which is exactly
  when the floor is measured.
* A line must be NARROW (<= MAX_WIDTH_BINS across its -6 dB extent —
  modulated carriers at the 93.75 Hz symbol rate smear ~+-90 Hz and are
  rejected), STRONG (>= THR_DB over the median in-band bin), and
  PERSISTENT (PERSIST_ON consecutive quiet-span updates) before a notch
  engages; it survives PERSIST_OFF missed updates before release
  (frames parking on top of the tone must not flap the notch).
* At most MAX_TONES notches; each is a RBJ biquad notch of NOTCH_BW_HZ
  (~1.4 carriers of the 512-plan) — removing < 3% of the band, which
  the per-carrier noise estimators already tolerate.
* A tracked tone may DRIFT: a re-detection within TRACK_HZ updates the
  notch frequency in place (hets drift ~Hz/s).

No reference counterpart (modem_rx.cpp feeds raw audio straight to the
demodulators); PARITY.md deviation 18.
"""

from __future__ import annotations

import numpy as np

from ..native import biquad_cascade

FS = 48000.0
FFT_N = 32768                 # 0.68 s window, 1.46 Hz bins
UPDATE_SAMPLES = 24000        # try a PSD update every 0.5 s of audio
BAND_HZ = (150.0, 3400.0)     # only lines inside the modem band matter
THR_DB = 12.0                 # line peak over median in-band bin
# Narrowness gate, the self-notch guard: the slowest shipped waveform line
# is the 31.25-baud DBPSK carrier (psk/dpsk.py robust, 1536 samp/sym) whose
# -6 dB extent is ~37 Hz = 26 bins; 16 bins (23 Hz) rejects it with margin
# while still capturing hets drifting <= ~34 Hz/s across the 0.68 s window.
MAX_WIDTH_BINS = 16
MAX_TONES = 4
PERSIST_ON = 2
PERSIST_OFF = 4
TRACK_HZ = 120.0              # same-tone association window
NOTCH_BW_HZ = 60.0
QUIET_DB = 6.0                # window power gate above the running floor
# The quiet floor is a RUNNING MINIMUM of ~0.1 s block powers (same lesson
# as the round-3 Cox energy gate: a low quantile reads signal power on
# frame-dense streams and lets the detector evaluate our own waveforms —
# the OFDM preamble/LTS repetition is a line comb that a percentile floor
# let through to the notches, caught by test_cox_resilience).  MIN_BLOCKS
# of history are required before ANY detection (kills the first-update-
# is-always-quiet hole), and a zero-noise stream has floor ~0 so frame
# audio can never read quiet at all.
BLOCK_SAMPLES = 4800
FLOOR_BLOCKS = 100            # ~10 s forgetting window (gain steps adapt)
MIN_BLOCKS = 20
# Floor STEP-UP (round 5, mid-session onset): when an interferer switches
# ON during an active session, every block reads >= floor + QUIET_DB and
# the quiet gate blocks learning until the pre-onset blocks age out of the
# 100-block history (~10 s of fed audio).  If the last FLOOR_STEP_BLOCKS
# are ALL elevated, the old floor is stale — drop history older than them
# so the floor re-anchors at their minimum (~3 s reaction).  Two guards,
# each load-bearing: (a) frames cannot sustain the condition — any
# inter-frame gap block sits AT the old floor and resets the run (only a
# continuous >= 3 s transmission could, hence (b)); (b) the step is capped
# at FLOOR_STEP_MAX_DB: a zero-noise unit stream has floor ~0, so frame
# blocks are a ~180 dB step and must never re-anchor the floor (the
# round-4 invariant "detection never runs in zero-noise streams"), while
# a real interferer strong enough to matter sits 6-20 dB over the noise.
FLOOR_STEP_BLOCKS = 30
FLOOR_STEP_MAX_DB = 20.0


def notch_coef(f0_hz: float, bw_hz: float = NOTCH_BW_HZ,
               fs: float = FS) -> np.ndarray:
    """RBJ cookbook notch, a0-normalized [b0, b1, b2, a1, a2]."""
    w = 2.0 * np.pi * f0_hz / fs
    q = f0_hz / bw_hz
    al = np.sin(w) / (2.0 * q)
    a0 = 1.0 + al
    return np.array([1.0 / a0, -2.0 * np.cos(w) / a0, 1.0 / a0,
                     -2.0 * np.cos(w) / a0, (1.0 - al) / a0], np.float64)


class ToneExciser:
    """Streaming narrowband-line detector + notch cascade.

    process(chunk) -> filtered chunk; all state host-side numpy (the
    audio path must not dispatch to the device per chunk — the axon
    tunnel's per-dispatch latency would dominate real-time streaming).
    """

    def __init__(self, enabled: bool | None = None):
        if enabled is None:  # ULTRA_EXCISION=0 is the global kill switch
            import os
            enabled = os.environ.get("ULTRA_EXCISION", "1") != "0"
        self.enabled = enabled
        self._win = np.zeros(0, np.float32)   # raw samples for the PSD
        self._since_update = 0
        self._block_acc = 0.0                 # sum of squares, current block
        self._block_n = 0
        self._pow_hist: list[float] = []      # ~0.1 s block powers
        self._window_fn = np.hanning(FFT_N).astype(np.float32)
        self._tones: list[dict] = []          # {f0, on, off, active}
        self._coef = np.zeros((0, 5), np.float64)
        self._state = np.zeros((0, 2), np.float64)
        self.updates = 0
        self.quiet_updates = 0

    # -- public -----------------------------------------------------------

    @property
    def active_tones(self) -> list[float]:
        return [t["f0"] for t in self._tones if t["active"]]

    def process(self, samples: np.ndarray) -> np.ndarray:
        if not self.enabled or not len(samples):
            return samples
        self._accumulate(samples)
        if len(self._coef):
            return biquad_cascade(samples, self._coef, self._state)
        return samples

    # -- detection --------------------------------------------------------

    def _accumulate(self, samples: np.ndarray):
        self._win = np.concatenate([self._win, samples])[-FFT_N:]
        # running-minimum floor over ~0.1 s blocks (every sample counted,
        # so silence/noise gaps anchor the floor even between updates)
        s = samples.astype(np.float64)
        self._block_acc += float((s * s).sum())
        self._block_n += len(s)
        while self._block_n >= BLOCK_SAMPLES:
            self._pow_hist.append(self._block_acc / self._block_n)
            self._pow_hist = self._pow_hist[-FLOOR_BLOCKS:]
            self._block_acc = 0.0
            self._block_n = 0
            # Floor step-up: sustained elevation of the last
            # FLOOR_STEP_BLOCKS (bounded step) means the old floor is
            # stale — see the constant block above for the guards.
            if len(self._pow_hist) >= FLOOR_STEP_BLOCKS + MIN_BLOCKS:
                recent = self._pow_hist[-FLOOR_STEP_BLOCKS:]
                fl = min(self._pow_hist)
                lo = min(recent)
                if (lo > max(fl, 1e-20) * 10 ** (QUIET_DB / 10.0)
                        and lo <= fl * 10 ** (FLOOR_STEP_MAX_DB / 10.0)):
                    self._pow_hist = recent[:]
        self._since_update += len(samples)
        if self._since_update < UPDATE_SAMPLES or len(self._win) < FFT_N:
            return
        self._since_update = 0
        self.updates += 1
        if len(self._pow_hist) < MIN_BLOCKS:
            return
        power = float(np.mean(self._win.astype(np.float64) ** 2))
        floor = min(self._pow_hist)
        if power > max(floor, 1e-20) * 10 ** (QUIET_DB / 10.0):
            # a frame (or burst) is in the air: never learn lines here
            self._miss_all()
            return
        # Window FLATNESS gate: in burst-fed streams (protocol sims feed
        # audio only while the peer transmits) the min-floor itself reads
        # frame-scale, and a window mixing frame slivers with silence can
        # pass the mean-power gate while its preamble/LTS content is a
        # genuine line comb (the NVIS-session self-notch, round 4).
        # Noise(+tone) is flat across 43 ms blocks; frame edges, silence
        # gaps, and impulse bursts are not.
        blk = self._win.astype(np.float64) ** 2
        blk = blk[:(len(blk) // 2048) * 2048].reshape(-1, 2048).mean(1)
        if blk.max() > max(blk.min(), 1e-20) * 10 ** (QUIET_DB / 10.0):
            self._miss_all()
            return
        self.quiet_updates += 1
        self._update_tones(self._detect_lines())

    def _detect_lines(self) -> list[float]:
        x = self._win * self._window_fn
        psd = np.abs(np.fft.rfft(x)) ** 2
        f = np.fft.rfftfreq(FFT_N, 1.0 / FS)
        band = (f >= BAND_HZ[0]) & (f <= BAND_HZ[1])
        # Cross-bin smoothing before the gates: a single periodogram's
        # per-bin estimates fluctuate ~Rayleigh, so a MODULATED carrier's
        # continuous hump sprouts chance 3-bin "lines" that defeat a raw
        # width check (the 31.25-baud DBPSK self-notch near-miss, round 4).
        # A 9-bin moving average cuts the variance ~9x: a true tone's
        # 4-bin mainlobe smears to ~12 bins (inside MAX_WIDTH_BINS), the
        # DBPSK hump resolves to its honest ~26-bin extent (outside).
        k = np.ones(9) / 9.0
        pb = np.convolve(psd[band], k, mode="same")
        fb = f[band]
        med = float(np.median(pb)) + 1e-30
        thr = med * 10 ** (THR_DB / 10.0)
        lines = []
        order = np.argsort(pb)[::-1]
        taken = np.zeros(len(pb), bool)
        for idx in order:
            if len(lines) >= MAX_TONES:
                break
            if pb[idx] < thr or taken[idx]:
                continue
            # -6 dB extent around the peak must be narrow
            half = pb[idx] / 4.0
            lo = idx
            while lo > 0 and pb[lo - 1] > half:
                lo -= 1
            hi = idx
            while hi < len(pb) - 1 and pb[hi + 1] > half:
                hi += 1
            taken[max(0, lo - MAX_WIDTH_BINS):hi + MAX_WIDTH_BINS] = True
            if hi - lo + 1 > MAX_WIDTH_BINS:
                continue  # modulated carrier / broadband — not a tone
            # power-weighted centroid of the extent
            seg = slice(lo, hi + 1)
            f0 = float((fb[seg] * pb[seg]).sum() / pb[seg].sum())
            lines.append(f0)
        return lines

    def _update_tones(self, lines: list[float]):
        matched = set()
        for t in self._tones:
            near = [f0 for f0 in lines if abs(f0 - t["f0"]) <= TRACK_HZ]
            if near:
                f0 = min(near, key=lambda f0: abs(f0 - t["f0"]))
                matched.add(f0)
                t["f0"] = f0
                t["on"] += 1
                t["off"] = 0
                if t["on"] >= PERSIST_ON:
                    t["active"] = True
            else:
                t["off"] += 1
        self._tones = [t for t in self._tones if t["off"] < PERSIST_OFF]
        # Comb rejection (round 5, mid-session onset): after the floor
        # step-up re-anchors at interferer+noise level, a frame at low SIR
        # sits only a few dB over the new floor and its windows can sneak
        # past the mean/flatness gates — and an OFDM frame's spectrum then
        # presents as SEVERAL simultaneous narrow lines (measured: 3 false
        # 'carriers' learned during a mid-session ARQ storm, each notching
        # a live data carrier and livelocking the transfer).  Real hets
        # arrive 1-2 at a time, so a window showing >= 3 TOTAL lines is
        # comb-contaminated: tracked tones above still refresh from it,
        # but nothing new is learned — the per-NEW-line variant leaked
        # (2 comb lines one update, the third the next, persistence did
        # the rest).  Cost: at most 2 distinct interferer lines can be
        # acquired from any one spectrum; a genuine third-tone onset on
        # top of two tracked tones stays unlearned (measured trade: our
        # own frames must NEVER be notched, MAX_TONES=4 still serves
        # drift tracking and sequential two-tone environments).
        if len(lines) <= 2:
            for f0 in lines:
                if f0 not in matched and len(self._tones) < MAX_TONES:
                    self._tones.append(
                        {"f0": f0, "on": 1, "off": 0, "active": False})
        self._rebuild()

    def _miss_all(self):
        for t in self._tones:
            if not t["active"]:
                t["off"] += 1  # unconfirmed candidates decay through bursts
        self._tones = [t for t in self._tones if t["off"] < PERSIST_OFF]
        self._rebuild()

    def _rebuild(self):
        # rebuild coefficients; carry state rows for tones that persist
        want = [t["f0"] for t in self._tones if t["active"]]
        new_coef = np.stack([notch_coef(f0) for f0 in want]) if want \
            else np.zeros((0, 5), np.float64)
        if new_coef.shape == self._coef.shape and np.allclose(
                new_coef, self._coef):
            return
        old_n = len(self._coef)
        new_state = np.zeros((len(want), 2), np.float64)
        n = min(old_n, len(want))
        if n:
            new_state[:n] = self._state[:n]
        self._coef = new_coef
        self._state = new_state

"""Impulse-noise blanker (beyond-reference).

Real HF audio carries static crashes (lightning, ignition, relay clicks):
broadband bursts of 1-50 ms that punch well above the local signal level.
The reference has no impulse mitigation anywhere; its harnesses never
inject one (tools/test_hf_reality.cpp is pure Watterson+AWGN).  Measured
on this engine (docs/PERF.md round-4 blanker section): an OFDM_COX DQPSK
R1/2 frame at 20 dB SNR survives a 30 ms mid-frame burst up to about
+12 dB over frame power, then collapses (1/4 at +15 dB, 2/4 at +20) —
the burst parks near-max-confidence wrong LLRs on every symbol it
covers.  Zeroing the burst span instead turns those symbols into
erasures (low |LLR|) and the decoder recovers 4/4 at every tested level;
scaling the burst down to local power is WORSE than doing nothing
(garbage at frame power = confident wrong bits, 1-2/4).

Detection is envelope-based with a run-length discriminator:

* 1 ms block powers vs a trailing-median floor (400 ms window).  The
  median is robust to the bursts themselves (<= 60/400 blocks) and
  adapts into frames, so mid-frame bursts are judged against FRAME
  power, gap bursts against the noise floor.
* threshold +10 dB over the median.  Legit waveforms sit well below it
  in steady state (per-ms block fluctuation of every shipped waveform is
  a few dB), but a frame ONSET after quiet exceeds it by 28-31 dB
  (measured) for its whole duration — so the threshold alone cannot
  discriminate.  The run length can: crashes are SHORT.
* runs of above-threshold blocks <= 60 ms are blanked (zeroed) when they
  end; a run that outlives 60 ms is a legitimate signal onset and is
  released untouched, and the stream then PASSES freely until the
  envelope drops back below threshold (the trailing median catches up to
  frame level within ~200 ms, re-arming mid-frame detection).
* second gate at run end: the run must ALSO sit >= threshold above the
  median of the last 64 RELEASED blocks (held and blanked blocks
  excluded).  While the trailing median transitions from noise level to
  frame level (~200 ms after a frame onset), in-frame blocks oscillate
  around threshold x median and form short false "runs" — measured 13-14
  blanked runs per frame, each erasing 1 ms of legitimate signal, before
  this gate existed.  A false run's level equals the released context
  (ratio ~1), a real crash is 15-23 dB above it on both sides.
* minimum run length of 3 blocks: isolated 1 ms blocks at +10.5 dB over
  the running median are REAL in QAM256 OFDM frames (measured PAPR tail —
  one such false blank corrupted the pinned trapping-payload frame of
  tests/test_high_order.py); crashes worth erasing last many
  milliseconds, and sub-3-ms clicks barely graze a symbol.
* broadband gate at run end: a static crash is BROADBAND by definition
  (lightning/ignition impulses are spectrally white across the 24 kHz
  Nyquist band), while every false run the envelope gates can pass is
  our own 300-2700 Hz waveform audio.  The first-difference power ratio
  E|x[n]-x[n-1]|^2 / E|x|^2 reads ~2.0 for white noise and ~0.1 for
  band-limited modem audio (14 dB of separation); runs under
  BROADBAND_RATIO are released untouched.  Measured catch: an AGC-pumped
  Cox frame's 7 ms PAPR span 200 ms after onset read +16 dB over BOTH
  envelope contexts — statistically identical to a gap crash — and was
  blanked by the round-4 gates (the phase-6 false blank); its diff
  ratio is ~0.1.
* quiet-stream guard: no median history (warm-up) or a ~zero median
  (clean unit-test streams have an exactly-zero floor) disables both
  blanking and holding — those streams pass through byte-identical with
  zero added latency, which keeps every golden/parity test out of the
  blanker's blast radius by construction.

Holding: deciding "short run vs onset" needs up to 60 ms of lookahead,
so an ongoing above-threshold run is held back until it either ends
(blank + flush) or exceeds the max run length (flush untouched).  Sample
VALUES are never reordered or dropped; only delivery of the held span is
delayed, so downstream positions/decodes are unaffected.  Below
threshold the blanker adds zero latency (full blocks pass immediately;
only a sub-block tail, < 1 ms, carries to the next feed).

Sits BEHIND the narrowband exciser (modem/excision.py) in
ModemEngine.feed_audio.  The first integration ran blanker-first and
failed the compound (tone + crash) soak: a zero hole UPSTREAM of the
notch IIRs interrupts a steady tone mid-frame, and the notch's
re-convergence transient after the hole leaks tone onto the straddled
carriers (measured 1/3 OFDM decodes vs 3/3 exciser-first).  Downstream
of the notch the hole is benign, and the blanker's median sees a
tone-free floor.  The exciser's quiet-gated PSD skips crash-lit blocks
on its own.  ULTRA_BLANKER=0 disables globally.
"""

from __future__ import annotations

import os

import numpy as np

BLOCK = 48                 # 1 ms at 48 kHz
MEDIAN_WINDOW = 400        # blocks (400 ms) of trailing context
THRESHOLD = 10.0           # dB over trailing median
MAX_RUN_BLOCKS = 60        # runs longer than this are signal onsets
MIN_RUN_BLOCKS = 3         # shorter runs are QAM PAPR spikes, not crashes
WARMUP_BLOCKS = 150        # no decisions before this much history
RELEASED_WINDOW = 64       # released-context median for the run-end gate
BRIDGE_BLOCKS = 5          # below-threshold hangover that keeps a run open
BROADBAND_RATIO = 0.7      # min diff-power ratio: crashes are white
FLOOR = 1e-12              # zero-noise streams never engage


class ImpulseBlanker:
    """Streaming impulse blanker; host-side numpy (per-sample/IIR-free,
    one median per 1 ms block — runtime work, same placement rationale as
    the exciser)."""

    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = os.environ.get("ULTRA_BLANKER", "1") != "0"
        self.enabled = bool(enabled)
        self._thresh = 10.0 ** (THRESHOLD / 10.0)
        self._powers = np.zeros(MEDIAN_WINDOW, np.float64)
        self._n_powers = 0          # total blocks seen (ring fill + index)
        self._released = np.zeros(RELEASED_WINDOW, np.float64)
        self._n_released = 0        # released (non-held, non-blanked) blocks
        self._carry = np.zeros(0, np.float32)   # sub-block tail
        self._held: list[np.ndarray] = []       # ongoing above-threshold run
        self._held_powers: list[float] = []
        self._below_pending = 0     # consecutive below blocks at run tail
        self._passing = False       # inside a released long run (signal)
        self.blanked_runs = 0
        self.blanked_blocks = 0

    # -- public ---------------------------------------------------------
    def process(self, samples: np.ndarray) -> np.ndarray:
        """Feed audio, return the (possibly delayed/blanked) output stream.

        Output sample values equal input values except inside blanked
        runs (zeroed); output length may differ from input length by the
        currently held span (<= MAX_RUN_BLOCKS blocks + one sub-block)."""
        if not self.enabled:
            return samples
        samples = np.asarray(samples, np.float32)
        if self._carry.size:
            samples = np.concatenate([self._carry, samples])
            self._carry = samples[:0]
        n_blocks = len(samples) // BLOCK
        tail = samples[n_blocks * BLOCK:]
        out: list[np.ndarray] = []
        if n_blocks:
            blocks = samples[:n_blocks * BLOCK].reshape(n_blocks, BLOCK)
            powers = (blocks.astype(np.float64) ** 2).mean(axis=1)
            for i in range(n_blocks):
                self._step(blocks[i], powers[i], out)
        if self._held:
            # Mid-run: the sub-block tail belongs to the candidate crash;
            # hold it with the run (the run closes within the bridge).
            self._carry = tail.copy()
        else:
            # LIVENESS: emit the tail now and restart the block grid at
            # the next feed.  Burst-fed peers (protocol sims, real PTT
            # exchanges) may not send more audio until THIS stream is
            # fully delivered — a held 16-sample tail starved the chirp
            # ping detector of its post-ping margin and deadlocked the
            # ping/pong handshake (measured: connect fails with zero
            # blanked runs).  A runt block at a feed seam merely passes
            # unexamined (< 1 ms).
            self._carry = samples[:0]
            if tail.size:
                out.append(tail)
        return np.concatenate(out) if out else samples[:0]

    @property
    def held_samples(self) -> int:
        return sum(len(b) for b in self._held) + len(self._carry)

    # -- internals ------------------------------------------------------
    def _median(self) -> float:
        n = min(self._n_powers, MEDIAN_WINDOW)
        return float(np.median(self._powers[:n])) if n else 0.0

    def _push_power(self, p: float):
        self._powers[self._n_powers % MEDIAN_WINDOW] = p
        self._n_powers += 1

    def _push_released(self, p: float):
        self._released[self._n_released % RELEASED_WINDOW] = p
        self._n_released += 1

    def _released_median(self) -> float:
        n = min(self._n_released, RELEASED_WINDOW)
        return float(np.median(self._released[:n])) if n else 0.0

    def _flush_held(self, out: list[np.ndarray], blank: bool,
                    keep_tail: int = 0):
        """Emit the held run; `keep_tail` trailing blocks (the bridge
        hangover, context-level by construction) are always released."""
        if not self._held:
            return
        run = self._held[:-keep_tail] if keep_tail else self._held
        tail = self._held[-keep_tail:] if keep_tail else []
        if blank and run:
            self.blanked_runs += 1
            self.blanked_blocks += len(run)
            out.append(np.zeros(len(run) * BLOCK, np.float32))
        else:
            out.extend(run)
            for p in self._held_powers[:len(run)]:
                self._push_released(p)
        out.extend(tail)
        for p in self._held_powers[len(run):]:
            self._push_released(p)
        self._held = []
        self._held_powers = []
        self._below_pending = 0

    def _step(self, block: np.ndarray, power: float, out: list[np.ndarray]):
        med = self._median()
        engaged = self._n_powers >= WARMUP_BLOCKS and med > FLOOR
        self._push_power(power)
        if not engaged:
            # Not enough context (or a clean zero-floor stream): flush any
            # held run untouched and pass through with no latency.
            self._flush_held(out, blank=False)
            self._passing = False
            out.append(block)
            self._push_released(power)
            return
        above = power > med * self._thresh
        if self._passing:
            if not above:
                self._passing = False
            out.append(block)
            self._push_released(power)
            return
        if above and not self._held:
            self._held = [block]
            self._held_powers = [power]
            self._below_pending = 0
            return
        if self._held:
            # Inside a candidate run: interior dips shorter than the
            # bridge stay part of the run (a crash's per-ms power rides
            # chi-square fluctuation around the threshold; splitting it
            # leaves unblanked garbage slices — measured 9 fragments and
            # a surviving corrupted codeword without the bridge).
            self._held.append(block)
            self._held_powers.append(power)
            self._below_pending = 0 if above else self._below_pending + 1
            n_run = len(self._held) - self._below_pending
            if n_run > MAX_RUN_BLOCKS:
                # Long run = legitimate signal onset: release untouched.
                self._flush_held(out, blank=False)
                self._passing = True
            elif self._below_pending >= BRIDGE_BLOCKS:
                # Run closed: blank it only if it also towers over the
                # RELEASED context (median-transition false runs sit AT
                # the context level; real crashes are 15-23 dB above it).
                # MIN_RUN gate: single 1 ms blocks at +10.5 dB over the
                # running median are REAL in QAM256 OFDM frames (measured
                # PAPR tail; one such blank corrupted the pinned trapping-
                # payload frame).  Crashes worth erasing span many blocks.
                ctx = self._released_median()
                run_med = float(np.median(self._held_powers[:n_run]))
                blank = (n_run >= MIN_RUN_BLOCKS
                         and self._n_released >= RELEASED_WINDOW // 4
                         and ctx > FLOOR and run_med > ctx * self._thresh)
                if blank:
                    # Broadband gate: see module docstring.
                    x = np.concatenate(self._held[:n_run]).astype(np.float64)
                    d2 = float(np.mean(np.diff(x) ** 2))
                    x2 = float(np.mean(x ** 2))
                    blank = x2 > 0 and d2 / x2 >= BROADBAND_RATIO
                if os.environ.get("ULTRA_BLANKER_DEBUG") == "1" and blank:
                    import math
                    print(f"[blk] t={self._n_powers/1000.0:.2f}s n_run={n_run}"
                          f" run/ctx={10*math.log10(run_med/max(ctx,1e-30)):.1f}dB"
                          f" run/med={10*math.log10(run_med/max(med,1e-30)):.1f}dB"
                          f" ctx/med={10*math.log10(max(ctx,1e-30)/max(med,1e-30)):.1f}dB",
                          flush=True)
                self._flush_held(out, blank=blank,
                                 keep_tail=self._below_pending)
            return
        out.append(block)
        self._push_released(power)

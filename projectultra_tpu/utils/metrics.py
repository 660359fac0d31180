"""Modem/link statistics and device-side profiling helpers.

Reference: include/ultra/types.hpp:248-260 (ModemStats), connection.hpp:43-50
(ConnectionStats is in protocol.connection / protocol.arq).  The GUI's live
observability widgets map to metric dicts + the export helpers in
utils/observability.py.  Device profiling uses jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

from ..config import Modulation, CodeRate


@dataclasses.dataclass
class ModemStats:
    """(types.hpp:248-260)"""
    bytes_sent: int = 0
    bytes_received: int = 0
    frames_sent: int = 0
    frames_received: int = 0
    frames_retransmitted: int = 0
    frames_failed: int = 0
    throughput_bps: float = 0.0
    current_snr_db: float = 0.0
    # Round-3: TRUE wideband SNR (frame power vs min-statistics noise
    # floor), the calibrated_snr negotiation input; current_snr_db keeps
    # the reference's inflated per-carrier/training scale.
    wideband_snr_db: float = 0.0
    # Fade-spread companion to wideband_snr_db (90/10 dB spread of the
    # smoothed in-frame envelope; -1.0 = unmeasured).  Lets negotiation
    # distinguish flat/AWGN channels from fading ones.
    fade_spread_db: float = -1.0
    # Round-4: frames whose parity-free info bits were repaired by CRC
    # syndrome search (fec/crc_recover.py) — beyond-reference capability.
    frames_crc_recovered: int = 0
    # Round-4: frames rescued by re-demodulating with the OTHER front-end
    # (real <-> analytic) after a failed decode: the real front wins under
    # timing drift, the analytic under a true 1-2 Hz CFO — neither
    # dominates in the marginal corners, so failures retry once.
    frames_front_retried: int = 0
    # Round-5: frames rescued by the sample-clock-skew retry — on a failed
    # decode whose pilot timing track shows accumulated drift, the span is
    # fractionally resampled at the estimated skew and re-demodulated
    # (modem/acquisition/cox.py).  Beyond reference: it has no SRO handling.
    frames_sro_retried: int = 0
    # Round-5: frames improved by the delay-domain channel-model retry —
    # on a failed coherent pilot-plan decode, the channel is re-estimated
    # as K discrete paths (matching pursuit over a delay grid) and the
    # span re-demodulated with model-exact notch interpolation
    # (ofdm/delay_fit.py).  Beyond reference: it interpolates pilots
    # linearly only.
    frames_delayfit_retried: int = 0
    current_modulation: Modulation = Modulation.QPSK
    current_code_rate: CodeRate = CodeRate.R1_2


@dataclasses.dataclass
class BatchMetrics:
    """Per-batch device pipeline metrics (the rebuild's replacement for the
    per-decode callbacks — SURVEY.md §5 'Metrics')."""
    frames: int = 0
    decoded: int = 0
    bit_errors: int = 0
    total_bits: int = 0
    ldpc_iterations_mean: float = 0.0
    snr_estimate_db: float = 0.0
    cfo_error_hz: float = 0.0
    pipelines_per_sec: float = 0.0

    @property
    def fer(self) -> float:
        return 1.0 - self.decoded / self.frames if self.frames else 0.0

    @property
    def ber(self) -> float:
        return self.bit_errors / self.total_bits if self.total_bits else 0.0


@contextlib.contextmanager
def stage_timer(name: str, results: dict | None = None):
    """Per-stage wall-clock timer (profile_acquisition.cpp equivalent)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace wrapper — the rebuild's tracing framework
    (SURVEY.md §5 'Tracing/profiling')."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

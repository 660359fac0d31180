"""Shared modem-layer value types (split out of engine.py so the
acquisition path modules can construct them without circular imports)."""

from __future__ import annotations

import dataclasses

from ..protocol import frame_v2 as F
from ..protocol.frame_v2 import WaveformMode


@dataclasses.dataclass
class DecodedFrame:
    """One decoded-over-the-air frame delivered to callbacks.

    snr_db keeps the reference's per-carrier/training estimator scale
    (reads 10-30 dB above true wideband SNR, types.hpp mode-table scale);
    wideband_snr_db is the round-3 TRUE wideband estimate (in-frame power
    vs min-statistics noise floor) that the calibrated_snr negotiation
    mode consumes."""
    frame_bytes: bytes
    header: F.HeaderInfo
    cw_ok: list
    snr_db: float = 0.0
    cfo_hz: float = 0.0
    waveform: WaveformMode = WaveformMode.MC_DPSK
    wideband_snr_db: float = 0.0
    # 90/10 dB spread of 100 ms-smoothed in-frame chunk powers: ~0-1 dB on
    # AWGN, ~5-9 dB under Watterson fading; -1.0 when the frame is too
    # short (<1 s active) to measure.  See modem/wideband_snr.py.
    fade_spread_db: float = -1.0

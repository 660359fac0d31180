"""Waveform abstraction layer: capabilities, factory, SNR recommendations.

Reference: src/waveform/{waveform_interface.hpp, waveform_factory.cpp,
mc_dpsk_waveform.cpp, ofdm_chirp_waveform.cpp, ofdm_cox_waveform.cpp}.

The reference's IWaveform virtual interface (detectSync / setFrequencyOffset
/ modulate / process / getSoftBits) becomes a small adapter class over the
batched device kernels, preserving the call-order invariants
(docs/INVARIANTS.md:178-226): reset -> detect_sync -> demodulate(span
starting at the TRAINING start, with CFO/phase from detection).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..config import ModemConfig, Modulation, CodeRate
from ..protocol.frame_v2 import WaveformMode
from ..psk import mc_dpsk as MC
from ..sync import chirp as chirp_mod
from ..ofdm import modulator as ofdm_mod
from ..ofdm import demodulator as ofdm_demod
from ..ofdm import pipeline as ofdm_pipeline
from ..sync import schmidl_cox as sc


@dataclasses.dataclass
class WaveformCapabilities:
    """(waveform_interface.hpp:20-45)"""
    supports_cfo_correction: bool = True
    supports_doppler_correction: bool = False
    requires_pilots: bool = False
    supports_differential: bool = True
    min_snr_db: float = 0.0
    max_snr_db: float = 40.0
    preamble_duration_ms: float = 0.0


@dataclasses.dataclass
class SyncResult:
    """(waveform_interface.hpp:47-60): start_sample points at TRAINING start."""
    detected: np.ndarray
    start_sample: np.ndarray
    cfo_hz: np.ndarray
    correlation: np.ndarray
    has_training: bool = True


class MCDPSKWaveform:
    """MC-DPSK + dual-chirp sync (mc_dpsk_waveform.cpp)."""

    mode = WaveformMode.MC_DPSK

    def __init__(self, num_carriers: int = 8):
        self.config = MC.MCDPSKConfig(
            num_carriers=max(3, min(20, num_carriers)))
        self.chirp = self.config.chirp_config()

    def capabilities(self) -> WaveformCapabilities:
        return WaveformCapabilities(
            supports_doppler_correction=True, min_snr_db=-3.0, max_snr_db=10.0,
            preamble_duration_ms=self.chirp.total_samples / 48.0)

    def generate_preamble(self) -> np.ndarray:
        return MC.preamble(self.config)

    def modulate(self, bits: jnp.ndarray) -> jnp.ndarray:
        return MC.modulate(self.config, bits)

    def detect_sync(self, samples: jnp.ndarray,
                    threshold: float = 0.15) -> SyncResult:
        det = chirp_mod.detect_dual_chirp(self.chirp, samples, threshold)
        start = chirp_mod.training_start(self.chirp, det["down_chirp_start"])
        return SyncResult(np.asarray(det["success"]), np.asarray(start),
                          np.asarray(det["cfo_hz"]),
                          np.asarray(jnp.maximum(det["up_correlation"],
                                                 det["down_correlation"])))

    def demodulate(self, span: jnp.ndarray, cfo_hz, train_start_abs,
                   num_data_symbols: int) -> jnp.ndarray:
        return MC.demodulate_presynced(self.config, span, cfo_hz,
                                       train_start_abs, num_data_symbols)


class DPSKWaveform:
    """Single-carrier DPSK with Barker-13x3 sync — the operating mode the
    reference constructs but never wires (modem_engine.cpp:55-56); an
    engine-local extension here (see frame_v2.WaveformMode.DPSK)."""

    mode = WaveformMode.DPSK

    def __init__(self, preset: str = "medium"):
        from ..psk import dpsk as DP
        self._DP = DP
        self.config = getattr(DP, preset)()

    def capabilities(self) -> WaveformCapabilities:
        return WaveformCapabilities(
            supports_doppler_correction=True, min_snr_db=-11.0, max_snr_db=5.0,
            preamble_duration_ms=self.config.preamble_samples / 48.0)

    def generate_preamble(self) -> np.ndarray:
        return self._DP.generate_preamble(self.config)

    def modulate(self, bits: jnp.ndarray) -> jnp.ndarray:
        return self._DP.modulate(self.config, bits)

    def detect_sync(self, samples: jnp.ndarray,
                    threshold: float = 0.0) -> SyncResult:
        found, ds, cfo, ipo, prev = self._DP.find_preamble(self.config,
                                                           samples)
        self._last = (cfo, ipo, prev)
        # start_sample is the DATA start: single-carrier DPSK has no
        # training segment (the Barker preamble itself seeds CFO/phase/
        # reference), so has_training=False per the SyncResult contract.
        return SyncResult(np.asarray(found), np.asarray(ds),
                          np.asarray(cfo), np.asarray(found, np.float32),
                          has_training=False)

    def demodulate(self, span: jnp.ndarray, cfo_hz, train_start_abs,
                   num_data_symbols: int) -> jnp.ndarray:
        _, ipo, prev = self._last
        return self._DP.demodulate_soft(self.config, span, prev,
                                        jnp.asarray(cfo_hz), ipo)


class OFDMChirpWaveform:
    """OFDM-DQPSK with chirp sync, 30 carriers, no pilots
    (ofdm_chirp_waveform.cpp:10-31)."""

    mode = WaveformMode.OFDM_CHIRP
    TRAINING_SYMBOLS = 2

    def __init__(self, modulation: Modulation = Modulation.DQPSK,
                 rate: CodeRate = CodeRate.R1_2):
        if modulation not in (Modulation.DBPSK, Modulation.DQPSK,
                              Modulation.D8PSK):
            modulation = Modulation.DQPSK
        self.config = ofdm_pipeline.chirp_ofdm_config(modulation, rate)
        self.chirp = chirp_mod.ChirpConfig()

    def capabilities(self) -> WaveformCapabilities:
        return WaveformCapabilities(
            supports_doppler_correction=True, min_snr_db=10.0, max_snr_db=20.0,
            preamble_duration_ms=self.chirp.total_samples / 48.0)

    def generate_preamble(self) -> np.ndarray:
        return np.concatenate([
            chirp_mod.generate(self.chirp),
            ofdm_mod.generate_training(self.config, self.TRAINING_SYMBOLS)])

    def modulate(self, bits: jnp.ndarray) -> jnp.ndarray:
        return ofdm_mod.modulate(
            self.config, self.config.modulation, bits,
            t_offset=self.TRAINING_SYMBOLS * self.config.symbol_duration)

    def detect_sync(self, samples: jnp.ndarray,
                    threshold: float = 0.15) -> SyncResult:
        det = chirp_mod.detect_dual_chirp(self.chirp, samples, threshold)
        start = chirp_mod.training_start(self.chirp, det["down_chirp_start"])
        return SyncResult(np.asarray(det["success"]), np.asarray(start),
                          np.asarray(det["cfo_hz"]),
                          np.asarray(jnp.maximum(det["up_correlation"],
                                                 det["down_correlation"])))

    def demodulate(self, span: jnp.ndarray, cfo_hz, train_start_abs,
                   num_data_symbols: int) -> jnp.ndarray:
        phase = chirp_mod.initial_cfo_phase(
            self.chirp, jnp.asarray(cfo_hz),
            jnp.asarray(train_start_abs, jnp.int32))
        llrs, _ = ofdm_demod.demodulate_presynced(
            self.config, self.config.modulation, span, cfo_hz, phase,
            training_symbols=self.TRAINING_SYMBOLS,
            num_data_symbols=num_data_symbols)
        return llrs


class OFDMCoxWaveform:
    """Schmidl-Cox OFDM, coherent or differential, NVIS 1024-FFT capable
    (ofdm_cox_waveform.cpp)."""

    mode = WaveformMode.OFDM_COX

    def __init__(self, config: ModemConfig | None = None):
        self.config = config or ModemConfig()

    def capabilities(self) -> WaveformCapabilities:
        return WaveformCapabilities(
            requires_pilots=self.config.use_pilots,
            supports_differential=True, min_snr_db=17.0, max_snr_db=40.0,
            preamble_duration_ms=7 * (self.config.fft_size
                                      + self.config.cyclic_prefix) / 48.0)

    def generate_preamble(self) -> np.ndarray:
        return ofdm_mod.generate_preamble(self.config)

    def modulate(self, bits: jnp.ndarray) -> jnp.ndarray:
        return ofdm_mod.modulate(
            self.config, self.config.modulation, bits,
            t_offset=ofdm_mod.preamble_data_t_offset(self.config))

    def detect_sync(self, samples: jnp.ndarray,
                    threshold: float = 0.80) -> SyncResult:
        det = sc.detect_preamble(self.config, samples, threshold)
        return SyncResult(np.asarray(det["found"]),
                          np.asarray(det["lts_start"]),
                          np.asarray(det["cfo_hz"]),
                          np.asarray(det["peak_corr"]))

    def decode(self, samples: jnp.ndarray, n_codewords: int = 1):
        return sc.decode_ofdm_cox(self.config, self.config.modulation,
                                  samples, n_codewords)


# ---------------------------------------------------------------------------
# Factory + SNR recommendations (waveform_factory.cpp)
# ---------------------------------------------------------------------------

def create(mode: WaveformMode, **kw):
    """WaveformFactory::create — MFSK/OTFS map per the reference's fallbacks
    (waveform_factory.cpp:11-50: MFSK -> MC_DPSK)."""
    if mode in (WaveformMode.MC_DPSK, WaveformMode.MFSK):
        return MCDPSKWaveform(**kw)
    if mode == WaveformMode.DPSK:
        return DPSKWaveform(**kw)
    if mode == WaveformMode.OFDM_CHIRP:
        return OFDMChirpWaveform(**kw)
    if mode in (WaveformMode.OTFS_EQ, WaveformMode.OTFS_RAW):
        from ..otfs.otfs import OTFSConfig
        from . import otfs_adapter
        return otfs_adapter.OTFSWaveform(
            OTFSConfig(tf_equalization=(mode == WaveformMode.OTFS_EQ)))
    return OFDMCoxWaveform(**kw)


def recommend_mode(snr_db: float) -> WaveformMode:
    """(waveform_factory.cpp recommendMode)"""
    if snr_db < 10.0:
        return WaveformMode.MC_DPSK
    if snr_db < 17.0:
        return WaveformMode.OFDM_CHIRP
    return WaveformMode.OFDM_COX


def recommend_mc_dpsk_carriers(snr_db: float) -> int:
    """(waveform_factory.cpp:179-197)"""
    if snr_db < 3.0:
        return 5
    if snr_db < 8.0:
        return 8
    if snr_db < 10.0:
        return 10
    if snr_db < 15.0:
        return 13
    return 20

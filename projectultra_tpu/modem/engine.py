"""ModemEngine: host-side TX/RX orchestration around the device kernels.

Reference: src/gui/modem/{modem_engine.cpp, modem_rx.cpp, modem_rx_decode.cpp}.

The reference runs 3 POSIX threads (audio feed / acquisition / decode) around
one streaming buffer.  Here the host keeps the same roles without threads:
``feed_audio`` appends to the RX buffer and ``poll`` runs one acquisition +
decode pass (the CLI and tests drive it synchronously; a real-time deployment
would call ``poll`` from its audio callback cadence).  All hot math — chirp
matched filters, waveform demodulation, LDPC — runs as batched JAX programs
on the device.

TX frame assembly parity (modem_engine.cpp:233-587):
  v2 frame -> per-CW LDPC (DATA at negotiated rate, else R1/4) ->
  per-CW channel interleave (OFDM waveforms only) -> waveform preamble +
  modulate -> 150 ms lead-in + 2x576 tail -> peak-normalize to 0.8.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..config import ModemConfig, Modulation, CodeRate
from ..fec import ldpc
from ..fec.interleave import channel_interleaver
from ..ofdm import carriers as carriers_mod
from ..ofdm import modulator as ofdm_mod
from ..ofdm import pipeline as ofdm_pipeline
from ..protocol import frame_v2 as F
from ..protocol.frame_v2 import WaveformMode
from ..psk import dpsk as DP
from ..psk import mc_dpsk as MC
from ..sync import chirp as chirp_mod
from ..utils.bits import bytes_to_bits

LEAD_IN_SAMPLES = 48000 * 150 // 1000
TAIL_SAMPLES = 576 * 2
PEAK_SCALE = 0.8
PING_RMS_THRESHOLD = 0.05   # signal-after-chirp gate (multi_carrier_dpsk.hpp:506)
WEAK_CHIRP_THRESHOLD = 0.08  # second-pass gate: 100% chirp detection at -20 dB


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
    # short (<1 s active) to measure.  See _wideband_snr_db.
    fade_spread_db: float = -1.0


class ModemEngine:
    def __init__(self, config: ModemConfig | None = None,
                 mc_config: MC.MCDPSKConfig | None = None):
        self.config = config or ModemConfig()
        # ModemEngine uses the level-10 MC-DPSK preset: 13 carriers
        # (modem_engine.cpp:73).
        self.mc_config = mc_config or MC.level10()
        self.chirp_config = self.mc_config.chirp_config()
        # Single-carrier DPSK data mode: the medium preset (DQPSK 62.5 baud,
        # raw 125 bps) matches the reference's "DPSK connect mode"
        # (modem_mode.cpp:114-119); reconfigure via set_dpsk_mode /
        # set_dpsk_speed_level (setDPSKMode, modem_mode.cpp:294-315).
        self.dpsk_config = DP.medium()

        # Waveform/mode state (modem_engine.hpp:171-181).
        self.waveform_mode = WaveformMode.OFDM_COX
        self.connect_waveform = WaveformMode.MC_DPSK
        self.last_rx_waveform = WaveformMode.MC_DPSK
        self.disconnect_waveform = WaveformMode.MC_DPSK
        self.connected = False
        self.handshake_complete = False
        self.use_connected_waveform_once = False
        self.data_modulation = Modulation.QPSK
        self.data_code_rate = CodeRate.R1_2
        self.interleaving_enabled = True

        # RX state.  The lock guards _rx_buffer swaps between an audio
        # thread calling feed_audio and a decode thread calling poll
        # (INV-THREAD-001 / the reference's rx_buffer_mutex_); single-thread
        # callers pay one uncontended acquire.
        import threading
        self._rx_buffer = np.zeros(0, np.float32)
        self._rx_consumed = 0  # absolute sample index of buffer[0]
        self._buf_lock = threading.Lock()
        self.on_ping: Optional[Callable[[float], None]] = None
        self.on_frame: Optional[Callable[[DecodedFrame], None]] = None
        self.frames_received = 0
        self.pings_received = 0

        # Carrier sense (modem_carrier_sense.cpp:10-45): RMS EMA vs threshold
        # (modem_engine.hpp:330).
        self._channel_energy = 0.0
        self.carrier_sense_threshold = 0.02
        self._energy_smoothing = 0.3
        # Half-duplex turnaround (modem_carrier_sense.cpp:48-60): no TX for
        # turnaround_delay_ms after the last completed RX.
        self.turnaround_delay_ms = 0
        self._last_rx_complete_time = 0.0
        # Observability (getConstellationSymbols): opt-in, costs one extra
        # demod pass per decoded Cox frame.
        self.collect_constellation = False
        self.last_constellation: Optional[np.ndarray] = None
        # Previous data mode: RX fallback when a MODE_CHANGE crossed a frame
        # in flight (the frame was modulated at the mode before the switch).
        self.prev_data_modulation: Optional[Modulation] = None
        self.prev_data_code_rate: Optional[CodeRate] = None
        # Single-carrier DPSK acquisition cache: (abs_data_start, cfo, ipo,
        # prev) of a found-but-not-yet-complete frame, plus the absolute
        # buffer length at the last (unsuccessful) search — polls between
        # samples arriving must not re-run the full preamble search.
        self._dpsk_pending = None
        self._dpsk_searched_until = 0
        self._dpsk_clean_until = 0  # abs position below which no preamble starts
        self._dpsk_wait = None
        self._chirp_last_key = None  # (consumed, buflen) of last chirp search
        # Cox wait-state tracker for streaming resilience: absolute LTS
        # position of the frame we are waiting on, last seen absolute buffer
        # length, and consecutive polls in this state (see _cox_wait_tick).
        self._cox_wait = None
        # Cox acquisition cache: (abs_lts_start, cfo) of a found preamble
        # whose frame has not fully arrived — polls while it streams in
        # retry the DECODE, not the full-buffer preamble search.
        self._cox_pending = None
        # DEEP Cox acquisition (below the faithful ~14 dB plateau floor,
        # sync/schmidl_cox.py DEEP_* gates).  A deep candidate is
        # speculative: it consumes nothing and blocks nothing until its CW0
        # LDPC-decodes with a valid header.  (abs_lts, cfo, abs_len, idle)
        # awaiting the CW0 span — retried on EVERY poll (host length check
        # only) so a stream ending <1 search cadence after the candidate
        # was found still completes it.  _cox_deep_rejected memoizes
        # validation failures by absolute position so the cadence-paced
        # re-search does not revalidate the same junk.
        self.deep_acquisition = True
        self._cox_deep_pending = None
        self._cox_deep_rejected = set()
        # Chirp acquisition cache: (abs_up, abs_tr, cfo, abs_cap) of a
        # validated dual-chirp whose frame/ping is still arriving — the
        # paced full-buffer search must not be the thing that completes a
        # pending decode (the stream can end <1 cadence after the last
        # search; caught by the OTFS/chunked loopbacks).
        self._chirp_pending = None
        self._chirp_kind = None  # last classification for pending retries
        # OTFS search-gate bypass while a found frame is streaming in.
        self._otfs_waiting = False
        # Per-path (consumed, buflen) of the last full acquisition search:
        # _search_due rate-limits searches to the reference's ~100 ms
        # new-audio cadence (modem_rx.cpp) so chunked streaming feeds do
        # not re-dispatch detection per 20 ms chunk.
        self._acq_searched = {}

        from ..utils.metrics import ModemStats
        self.stats = ModemStats()

    # ------------------------------------------------------------------ TX

    # Speed-level presets for the single-carrier DPSK data mode (the GUI's
    # speed table; dpsk.hpp:1064-1169 preset family).
    DPSK_SPEED_PRESETS = {
        0: DP.robust,      # DBPSK 31.25 bd — the -11 dB floor
        1: DP.low_snr,     # DBPSK 62.5 bd
        2: DP.medium,      # DQPSK 62.5 bd (125 bps; default)
        3: DP.fast,        # DQPSK 125 bd
        4: DP.turbo,       # D8PSK 125 bd
        5: DP.high_speed,  # DQPSK 250 bd
        6: DP.speed1, 7: DP.speed2, 8: DP.speed3, 9: DP.speed4,
        10: DP.max_speed,  # D8PSK 750 bd
    }

    def set_dpsk_mode(self, modulation: DP.DPSKModulation,
                      samples_per_symbol: int):
        """setDPSKMode (modem_mode.cpp:294-315): reconfigure the
        single-carrier DPSK data mode."""
        self.dpsk_config = dataclasses.replace(
            self.dpsk_config, modulation=modulation,
            samples_per_symbol=samples_per_symbol)
        self._chirp_last_key = None  # preamble length feeds the tail trim

    def set_dpsk_speed_level(self, level: int):
        """Preset selection by speed level (GUI speed table semantics)."""
        self.dpsk_config = self.DPSK_SPEED_PRESETS[level]()
        self._chirp_last_key = None  # preamble length feeds the tail trim

    def set_waveform_mode(self, mode: WaveformMode):
        self.waveform_mode = mode
        self._chirp_last_key = None  # re-arm detection over the same buffer

    def reset_rx(self):
        """Clear ALL acquisition state and the RX buffer (public so
        consumers like RxPipeline never reach into engine internals).
        TX/connection/negotiated-mode state is deliberately untouched."""
        with self._buf_lock:
            self._rx_buffer = np.zeros(0, np.float32)
            self._rx_consumed = 0
        self._dpsk_pending = None
        self._dpsk_searched_until = 0
        self._dpsk_clean_until = 0
        self._dpsk_wait = None
        self._chirp_last_key = None
        self._cox_wait = None
        self._cox_pending = None
        self._cox_deep_pending = None
        self._cox_deep_rejected = set()
        self._chirp_pending = None
        self._otfs_waiting = False
        self._acq_searched = {}

    def _active_tx_waveform(self) -> WaveformMode:
        """4-way priority (modem_engine.cpp:372-397)."""
        if self.use_connected_waveform_once:
            return self.disconnect_waveform
        if not self.connected:
            return self.connect_waveform
        if not self.handshake_complete:
            return self.last_rx_waveform
        return self.waveform_mode

    def transmit(self, data: bytes) -> np.ndarray:
        """Frame bytes -> float32 audio (modem_engine.cpp:233-587)."""
        if not data:
            return np.zeros(0, np.float32)
        is_v2 = len(data) >= 2 and data[0] == 0x55 and data[1] == 0x4C
        is_data = is_v2 and len(data) >= 3 and self.connected and \
            0x30 <= data[2] <= 0x33

        active = self._active_tx_waveform()
        if self.use_connected_waveform_once:
            self.use_connected_waveform_once = False

        tx_mod = self.data_modulation if (self.connected or is_data) \
            else Modulation.DQPSK

        tx_rate = self.data_code_rate if is_data else CodeRate.R1_4
        if is_v2:
            cws = F.encode_frame_with_ldpc(data, tx_rate)
            to_modulate = self._maybe_interleave(cws, active, tx_mod)
        else:
            rate = self.data_code_rate if self.connected else CodeRate.R1_4
            code = ldpc.get_code(rate if rate in ldpc.CODE_PARAMS else CodeRate.R1_2)
            encoded = ldpc.encode_bytes_np(code, data)
            n = F.LDPC_CODEWORD_BYTES
            cws = [encoded[i:i + n] for i in range(0, len(encoded), n)]
            to_modulate = self._maybe_interleave(cws, active, tx_mod)

        preamble, modulated = self._modulate_waveform(active, to_modulate, tx_mod)

        out = np.concatenate([
            np.zeros(LEAD_IN_SAMPLES, np.float32), preamble, modulated,
            np.zeros(TAIL_SAMPLES, np.float32)])
        peak = np.abs(out).max()
        if peak > 0:
            out = out * (PEAK_SCALE / peak)
        self.stats.frames_sent += 1
        self.stats.bytes_sent += len(data)
        return out.astype(np.float32)

    def _maybe_interleave(self, cws: list[bytes], wf: WaveformMode,
                          tx_mod: Modulation | None = None) -> bytes:
        """Per-codeword channel interleave for OFDM waveforms only
        (modem_engine.cpp:292-310; DPSK never interleaves)."""
        use = self.interleaving_enabled and wf in (WaveformMode.OFDM_COX,
                                                   WaveformMode.OFDM_CHIRP)
        if not use:
            return b"".join(cws)
        bps = self._ofdm_bits_per_symbol(wf, tx_mod)
        ci = channel_interleaver(bps, F.LDPC_CODEWORD_BITS)
        return b"".join(ci.interleave(cw) for cw in cws)

    def _ofdm_bits_per_symbol(self, wf: WaveformMode | None = None,
                              tx_mod: Modulation | None = None) -> int:
        """Interleaver row width = data carriers x bits of the modulation
        the TX will ACTUALLY use: always DQPSK on the pilot-less chirp
        config (its modulator hardcodes it), the frame's tx_mod on Cox.
        (Round-1 ADVICE: inferring DQPSK from use_pilots alone would
        mis-size the interleaver for a pilot-less coherent Cox config.)"""
        from ..config import bits_per_symbol as bps_of
        wf = wf if wf is not None else self._active_tx_waveform()
        if wf == WaveformMode.OFDM_CHIRP:
            cfg, mod = self._chirp_ofdm_config(), Modulation.DQPSK
        else:
            cfg = self.config
            mod = tx_mod if tx_mod is not None else self.data_modulation
        cm = carriers_mod.carrier_map(cfg)
        return len(cm.data_idx) * bps_of(mod)

    def _chirp_ofdm_config(self) -> ModemConfig:
        cfg = self.config.replace(modulation=Modulation.DQPSK, use_pilots=False)
        return cfg

    def _otfs_config(self, wf: WaveformMode):
        from ..otfs.otfs import OTFSConfig
        return OTFSConfig(tf_equalization=(wf == WaveformMode.OTFS_EQ))

    def _otfs_mod(self, tx_mod: Modulation) -> Modulation:
        """OTFS carries coherent constellations only; the reference defaults
        to QPSK (modem_engine.cpp:48)."""
        if tx_mod in (Modulation.BPSK, Modulation.QPSK, Modulation.QAM16):
            return tx_mod
        return Modulation.QPSK

    OTFS_INTER_FRAME_GAP = 480  # samples (modem_engine.cpp:430)

    def _modulate_waveform(self, wf: WaveformMode, payload: bytes,
                           tx_mod: Modulation):
        if wf == WaveformMode.MFSK:
            # Factory maps MFSK -> MC-DPSK (waveform_factory.cpp:33-36).
            wf = WaveformMode.MC_DPSK
        if wf in (WaveformMode.OTFS_EQ, WaveformMode.OTFS_RAW):
            # One LDPC codeword per OTFS frame, 480-sample inter-frame gaps
            # (modem_engine.cpp:418-451).
            from ..otfs import otfs as O
            ocfg = self._otfs_config(wf)
            n = F.LDPC_CODEWORD_BYTES
            chunks = [payload[i:i + n].ljust(n, b"\0")
                      for i in range(0, len(payload), n)]
            cw_bits = np.stack([bytes_to_bits(c) for c in chunks]).astype(
                np.float32)
            frames = np.asarray(O.frame_tx(ocfg, self._otfs_mod(tx_mod),
                                           jnp.asarray(cw_bits)))
            gap = np.zeros(self.OTFS_INTER_FRAME_GAP, np.float32)
            pieces = []
            for i in range(len(chunks)):
                pieces.append(frames[i])
                if i + 1 < len(chunks):
                    pieces.append(gap)
            return np.zeros(0, np.float32), np.concatenate(pieces)
        bits = jnp.asarray(bytes_to_bits(payload)[None, :].astype(np.float32))
        if wf == WaveformMode.DPSK:
            # Single-carrier DPSK frame: [Barker-13x3 preamble][data].
            # find_preamble estimates CFO/phase/reference from the Barker
            # symbols themselves, so no training/ref segment is sent (the
            # preamble ends at accumulated symbol phase 0 mod 2pi and
            # modulate() continues differentially from there).  DPSK modes
            # never channel-interleave (docs/INVARIANTS.md).
            cfg = self.dpsk_config
            pre = DP.generate_preamble(cfg)
            data = np.asarray(DP.modulate(cfg, bits))[0]
            return pre.astype(np.float32), data
        if wf == WaveformMode.MC_DPSK:
            pre = np.concatenate([
                chirp_mod.generate(self.chirp_config),
                MC.generate_training(self.mc_config),
                MC.generate_reference(self.mc_config)])
            data = np.asarray(MC.modulate(self.mc_config, bits))[0]
            return pre.astype(np.float32), data
        if wf == WaveformMode.OFDM_CHIRP:
            cfg = self._chirp_ofdm_config()
            pre = np.concatenate([
                chirp_mod.generate(self.chirp_config),
                ofdm_mod.generate_training(cfg, 2)])
            data = np.asarray(ofdm_mod.modulate(
                cfg, Modulation.DQPSK, bits,
                t_offset=2 * cfg.symbol_duration))[0]
            return pre.astype(np.float32), data
        # OFDM_COX (Schmidl-Cox)
        pre = ofdm_mod.generate_preamble(self.config)
        data = np.asarray(ofdm_mod.modulate(
            self.config, tx_mod, bits,
            t_offset=ofdm_mod.preamble_data_t_offset(self.config)))[0]
        return pre.astype(np.float32), data

    def transmit_ping(self) -> np.ndarray:
        """PING = bare chirp, peak-scaled (modem_engine.cpp:550-575)."""
        out = chirp_mod.generate(self.chirp_config).copy()
        peak = np.abs(out).max()
        if peak > 0:
            out = out * (PEAK_SCALE / peak)
        return out.astype(np.float32)

    # ------------------------------------------------------------------ RX

    def feed_audio(self, samples: np.ndarray):
        samples = np.asarray(samples, np.float32)
        if len(samples):
            rms = float(np.sqrt((samples * samples).mean()))
            self._channel_energy = (self._energy_smoothing * rms
                                    + (1 - self._energy_smoothing)
                                    * self._channel_energy)
        with self._buf_lock:
            self._rx_buffer = np.concatenate([self._rx_buffer, samples])

    def is_channel_busy(self) -> bool:
        """Listen-before-talk carrier sense (modem_carrier_sense.cpp:26-33)."""
        return self._channel_energy > self.carrier_sense_threshold

    def is_turnaround_active(self) -> bool:
        """Half-duplex turnaround guard (modem_carrier_sense.cpp:48-60)."""
        if self.turnaround_delay_ms == 0:
            return False
        import time
        return (time.monotonic() - self._last_rx_complete_time) * 1000.0 \
            < self.turnaround_delay_ms

    @property
    def channel_energy(self) -> float:
        return self._channel_energy

    def poll(self) -> int:
        """Acquisition+decode passes over the buffered audio until no more
        progress is made (no event delivered AND no samples consumed — a
        failed decode consumes its chirp and the next pass must still run);
        returns the number of events (frames + pings) delivered."""
        events = 0
        while True:
            consumed_before = self._rx_consumed
            n = self._acquire_and_decode_once()
            events += n
            if n == 0 and self._rx_consumed == consumed_before:
                break
        return events

    def _acquire_and_decode_once(self) -> int:
        # When the negotiated waveform is OFDM_COX/OTFS, incoming frames
        # carry that waveform's preamble instead of a chirp — try its sync
        # first (modem_rx.cpp runs the active waveform's acquisition
        # alongside the chirp detector).  Chirp PINGs still fall through: a
        # chirp's LTS matched-filter / repeated-symbol metrics are below the
        # gates.  A "wait" (preamble found but frame incomplete) must NOT
        # short-circuit the chirp path: a false preamble near the buffer end
        # would otherwise block PING detection forever.
        waveform_waiting = False
        if self.waveform_mode == WaveformMode.OFDM_COX:
            handled = self._try_cox_once()
            if isinstance(handled, int):
                return handled
            waveform_waiting = handled == "wait"
        if self.waveform_mode in (WaveformMode.OTFS_EQ, WaveformMode.OTFS_RAW):
            handled = self._try_otfs_once()
            if isinstance(handled, int):
                return handled
            waveform_waiting = handled == "wait"
        if self.waveform_mode == WaveformMode.DPSK:
            handled = self._try_dpsk_once()
            if isinstance(handled, int):
                return handled
            waveform_waiting = handled == "wait"
        buf = self._rx_buffer
        cc = self.chirp_config
        if self._chirp_pending is not None:
            # A validated chirp's ping/frame is still arriving: retry the
            # classify/decode directly — no re-search, no cadence gate.
            abs_up, abs_tr, pcfo, pcorr, abs_cap, pkind = self._chirp_pending
            c0 = self._rx_consumed
            if abs_up < c0:
                self._chirp_pending = None
            else:
                cap = (abs_cap - c0) if abs_cap >= 0 else len(buf)
                r = self._handle_chirp(abs_tr - c0, pcfo, abs_up - c0,
                                       pcorr, min(cap, len(buf)),
                                       kind_hint=pkind)
                if r == "wait":
                    self._chirp_pending = (abs_up, abs_tr, pcfo, pcorr,
                                           abs_cap, self._chirp_kind)
                    return 0
                self._chirp_pending = None
                return r
        if len(buf) < cc.total_samples + 4000:
            return 0
        # Memoize identical-state passes: detection over an unchanged
        # buffer is deterministic, and the poll loop can land here several
        # times per poll while a frame is pending.  The key includes the
        # waveform mode and DPSK preamble length because both change the
        # fail-path tail-trim bookkeeping over the SAME buffer.  On top of
        # the exact-state memo, pace re-searches over a GROWING buffer to
        # the ~100 ms new-audio cadence (chunked streaming feeds would
        # otherwise re-dispatch detection per 20 ms chunk).
        key = (self._rx_consumed, len(buf), self.waveform_mode,
               self.dpsk_config.preamble_samples)
        if key == self._chirp_last_key:
            return 0
        last = self._chirp_last_key
        if (last is not None and last[0] == key[0]
                and key[1] - last[1] < self.ACQ_SEARCH_CADENCE
                and key[2:] == last[2:]):
            return 0
        self._chirp_last_key = key
        # While a waveform frame is pending ("wait"), the buffer grows for
        # the frame's whole duration (minutes at the robust DPSK preset) —
        # searching the FULL buffer every poll would be quadratic.  A chirp
        # not yet acted on can only live in recent audio, so bound the
        # search to a tail window that always covers one whole preamble
        # plus the newest bucket.
        base = 0
        if waveform_waiting:
            win = 2 * cc.total_samples + self.STREAM_BUCKET
            base = max(0, len(buf) - win)
        view = buf[base:base + self.ACQ_VIEW_CAP]
        searched_end = base + len(view)
        bucketed = jnp.asarray(self._bucketed(view)[None, :])
        det = {k: np.asarray(v)[0] for k, v in chirp_mod.detect_dual_chirp(
            cc, bucketed).items()}
        if not bool(det["success"]):
            # Weak-signal second pass (modem_rx.cpp:74 "works down to
            # -20 dB"): only when NOTHING crossed the 0.15 gate — strong
            # structured data correlates with the chirp template at up to
            # ~0.08, so the low gate is unsafe while strong frames are in
            # the buffer, and safe when they provably are not.
            det = {k: np.asarray(v)[0] for k, v in chirp_mod.detect_dual_chirp(
                cc, bucketed, threshold=WEAK_CHIRP_THRESHOLD).items()}
        if base:
            for k in ("up_chirp_start", "down_chirp_start", "next_up_start"):
                if int(det[k]) >= 0:
                    det[k] = det[k] + base
        if not bool(det["success"]):
            if waveform_waiting:
                # A Cox/OTFS/DPSK frame may still be arriving — keep everything.
                return 0
            # keep a chirp-length tail for boundary-spanning preambles
            # (or a DPSK-preamble-length tail if that is longer) — and
            # never trim past what this pass actually searched
            tail = cc.total_samples
            consume = min(len(buf) - min(len(buf), tail + 8000),
                          max(0, searched_end - (tail + 8000)))
            if self.waveform_mode == WaveformMode.DPSK:
                tail = max(tail, self.dpsk_config.preamble_samples)
                consume = min(len(buf) - min(len(buf), tail + 8000),
                              max(0, searched_end - (tail + 8000)))
                # Never trim samples the bounded DPSK preamble search has
                # not cleared: the search covers only the first
                # DPSK_MAX_SEARCH_OFFSETS samples per pass, and a frame
                # further into the buffer would be destroyed before any
                # search ever saw it.
                cleared = self._dpsk_clean_until - self._rx_consumed
                consume = max(0, min(consume, cleared))
            self._consume(consume)
            return 0

        tr_start = int(det["down_chirp_start"]) + cc.chirp_samples + cc.gap_samples
        cfo = float(det["cfo_hz"])
        next_up = int(det["next_up_start"])
        cap = next_up if next_up >= 0 else len(buf)
        up_start = int(det["up_chirp_start"])
        corr = float(min(max(det["up_correlation"],
                             det["down_correlation"]), 0.999))
        r = self._handle_chirp(tr_start, cfo, up_start, corr, cap)
        if r == "wait":
            # Cache the validated chirp so later polls retry the
            # classify/decode DIRECTLY: the paced full-buffer search must
            # not be the thing that completes a pending decode (the stream
            # can end less than one cadence after the last search).
            c0 = self._rx_consumed
            self._chirp_pending = (c0 + up_start, c0 + tr_start, cfo, corr,
                                   c0 + cap if next_up >= 0 else -1,
                                   self._chirp_kind)
            return 0
        self._chirp_pending = None
        return r

    def _handle_chirp(self, tr_start: int, cfo: float, up_start: int,
                      corr: float, cap: int, kind_hint: str | None = None):
        """Classify + decode a VALIDATED dual-chirp at known relative
        positions.  Returns the delivered-event count, or "wait" while the
        ping probe / frame is still arriving.  `cap` bounds every consume
        so a mis-sized consume can never eat the next frame's chirp.
        kind_hint carries a previous poll's classification so pending
        retries skip the per-poll classify dispatch while the frame body
        streams in."""
        cc = self.chirp_config

        # Chirp-only PING vs frame: require STRUCTURED training after the
        # chirp, not just energy (the reference's absolute RMS gate,
        # modem_rx.cpp:60-67, misclassifies once the noise floor exceeds it).
        kind = kind_hint or self._classify_after_chirp(tr_start, cfo)
        self._chirp_kind = kind if kind in ("ping", "frame") else None
        if kind == "wait":
            return "wait"
        if kind == "ping":
            self.pings_received += 1
            # SNR from the chirp matched-filter correlation: for a
            # normalized correlation c, c^2 ~ S/(S+N) so SNR = c^2/(1-c^2).
            # The reference passes getCurrentSNR() here — a stale tracked
            # value that is 0 for a fresh receiver; deriving it from THIS
            # chirp is strictly more informative and feeds the same
            # mode-recommendation path (and the stat updates even for
            # callback-less consumers).
            snr_db = 10.0 * np.log10(max(corr * corr / (1.0 - corr * corr),
                                         1e-3))
            self.stats.current_snr_db = snr_db
            # The normalized-correlation SNR is ALREADY wideband-scale:
            # c^2 = S/(S+N) with N the full-band window noise energy.
            self.stats.wideband_snr_db = snr_db
            if self.on_ping:
                self.on_ping(round(snr_db, 1))
            self._consume(min(up_start + cc.total_samples, cap))
            return 1

        wf = self.waveform_mode if self.waveform_mode == WaveformMode.OFDM_CHIRP \
            else WaveformMode.MC_DPSK
        status, frame = self._decode_frame(wf, tr_start, cfo)
        if status == "wait":
            # Frame still arriving (streaming feed): keep the buffer intact.
            return "wait"
        if status == "fail":
            # False positive or undecodable (e.g. an interrupted frame):
            # drop only the UP-chirp — and never past the next frame's chirp.
            self._consume(min(up_start + cc.chirp_samples, cap))
            return 0
        self.frames_received += 1
        import time as _t
        self._last_rx_complete_time = _t.monotonic()
        if self.on_frame:
            self.on_frame(frame)
        return 1

    def _consume(self, n: int):
        with self._buf_lock:
            n = max(0, min(n, len(self._rx_buffer)))
            self._rx_buffer = self._rx_buffer[n:]
            self._rx_consumed += n

    ACQ_SEARCH_CADENCE = 4800  # re-search only after 100 ms of new audio
    # Coherent Cox front-end crossover: REAL passband (exact, no Hilbert)
    # at/below this detected |CFO|, analytic (CFO-robust, ~-25 dB mask
    # floor) above it.  Measured: real front holds protected rates clean
    # through 5 Hz; 2 Hz keeps wide margin while covering the detector's
    # typical sub-Hz corrections.
    REAL_FRONT_CFO_MAX_HZ = 2.0
    # Cap every full-buffer search VIEW: a backlogged buffer (slow consumer,
    # batch feeds) must slide through bounded-shape searches instead of
    # compiling one detector per 65536-sample bucket of an unbounded
    # buffer.  The no-detect trim is capped to the searched span so a
    # frame beyond the view is never trimmed unsearched.
    ACQ_VIEW_CAP = 4 * (1 << 16)  # 262144

    def _chirp_strong_pos(self, limit: int | None = None) -> int:
        """Earliest strong up-chirp-template crossing in the current
        buffer (relative), or -1.  The guard that keeps failure-path
        consumes from eating into an ARRIVING chirp: a chirp lights up the
        Schmidl-Cox plateau and an LTS fluke at the signal boundary can
        confirm a false Cox preamble while the chirp's down half is still
        streaming in — the blind fail-consume then truncates the chirp
        head and the mutilated chirp fails the CFO gate forever (caught by
        tools/test_hf_reality.py).

        ``limit``: only crossings BELOW this position matter to the
        caller (the planned consume span), so the searched view is capped
        at limit + one chirp preamble — an unbounded view would both
        compile one detector per 65536-sample bucket of a backlogged
        buffer (the ACQ_VIEW_CAP trap) and pay a full-buffer matched
        filter per Cox failure."""
        buf = self._rx_buffer
        if len(buf) < 4800:
            return -1
        if limit is not None:
            cap = min(len(buf), limit + self.chirp_config.total_samples
                      + 4800)
            buf = buf[:cap]
        else:
            buf = buf[:min(len(buf), self.ACQ_VIEW_CAP)]
        det = chirp_mod.detect_dual_chirp(
            self.chirp_config, jnp.asarray(self._bucketed(buf)[None, :]))
        return int(np.asarray(det["first_strong_up"])[0])

    def _search_due(self, path) -> bool:
        """Rate-limit full-buffer acquisition searches to the reference's
        ~100 ms poll cadence (modem_rx.cpp): re-run only when the buffer
        was consumed from (positions shifted) or >= ACQ_SEARCH_CADENCE new
        samples arrived since the last search on this path.  Keyed per
        path so the Cox/OTFS/chirp searches pace independently."""
        key = (self._rx_consumed, len(self._rx_buffer))
        last = self._acq_searched.get(path)
        if last is not None and last[0] == key[0] \
                and key[1] - last[1] < self.ACQ_SEARCH_CADENCE:
            return False
        self._acq_searched[path] = key
        return True

    NOISE_CHUNK = 480  # 10 ms blocks for the min-statistics noise floor

    def _wideband_snr_db(self, buf: np.ndarray, start: int, end: int,
                         noise_before: int | None = None,
                         segments: list[tuple[int, int]] | None = None
                         ) -> float:
        """TRUE wideband SNR for a frame occupying buf[start:end): mean
        in-frame power against a min-statistics noise floor (lower-quartile
        mean of 10 ms chunk powers over the audio BEFORE the frame, falling
        back to the whole snapshot when the frame opens the buffer).

        This is the round-3 improvement over the reference's negotiation
        input: the per-carrier/training estimators read 10-30 dB above the
        wideband channel SNR and collapse under fading (types.hpp scale;
        tools/calibrate_snr.py measurements), while frame-vs-floor power is
        calibration-free.  Min-statistics keeps a previous frame's tail in
        the window from inflating the floor.

        Signal power is the in-frame mean CLIPPED to at most 0.75 dB
        above the 25th-percentile of 100 ms-SMOOTHED chunk powers — an
        outage-aware SNR.  The smoothing window separates the two sources
        of in-frame power variation: multicarrier PAPR beating is fast
        (sub-symbol, <50 ms) and averages out, while fade envelopes are
        slow (>=250 ms coherence at 0.5-2 Hz Doppler) and survive, so on
        AWGN the estimate is nearly unbiased for EVERY waveform while
        under fading the percentile charges the fade dips as margin —
        a decoded-frames-only estimator is otherwise survivor-biased HIGH
        under fading and walks the adaptive controller beyond the envelope
        (caught by tools/test_calibrated_negotiation.py fade rows).  The
        Callers pass a GAP-FREE signal span [start, end) — for chirp-led
        frames that is the training+data region, with noise_before pointing
        at the up-chirp start so the noise window stays clear of signal.
        Consumed by the calibrated_snr negotiation mode."""
        start = max(0, start)
        end = min(end, len(buf))
        self.stats.fade_spread_db = -1.0
        if noise_before is None:
            noise_before = start
        noise_before = max(0, min(noise_before, start))
        C = self.NOISE_CHUNK
        if end - start < C:
            return 0.0
        # Noise window: audio before the frame, pooled with the audio
        # AFTER the frame end when the pre window is starved — a Cox
        # false-positive's guarded fail-consume (see _try_cox_once) can
        # land the buffer start just samples ahead of a chirp-led frame
        # (observed on the NVIS profile, whose 1024 Cox search crosses
        # threshold on the chirp itself), and the whole-snapshot fallback
        # then measures mostly SIGNAL as the floor (34 dB frames read
        # ~6 dB and negotiation parks on MC_DPSK).  The lower-quartile
        # statistic keeps a following frame's head in the tail window
        # from inflating the floor, same as for the pre window.
        pre = buf[max(0, noise_before - 24000):noise_before]
        if len(pre) < 4 * C:
            tail = buf[end:end + 24000]
            pooled = np.concatenate([pre, tail]) if len(tail) else pre
            src = pooled if len(pooled) >= 4 * C else buf
        else:
            src = pre
        n = (len(src) // C) * C
        if n == 0:
            return 0.0
        cp = (src[:n].astype(np.float64).reshape(-1, C) ** 2).mean(-1)
        k = max(1, len(cp) // 4)
        pn = max(float(np.sort(cp)[:k].mean()), 1e-12)

        sig = buf[start:end].astype(np.float64)
        ps_raw = float((sig * sig).mean())
        ps = ps_raw
        nsc = (len(sig) // C) * C
        w = 10  # 100 ms smoothing window, in chunks
        if nsc >= 12 * C:
            sp = (sig[:nsc].reshape(-1, C) ** 2).mean(-1)
            smooth = np.convolve(sp, np.full(w, 1.0 / w), mode="valid")
            ps = min(float(sp.mean()),
                     float(np.percentile(smooth, 25.0)) * 10 ** 0.075)
        if segments:
            # Chirp-led frames: the nominal/true SNR scale is the ACTIVE-
            # sample average over the WHOLE frame (INV-TEST-001 noise
            # normalization), and the constant-envelope chirps run ~2x the
            # multicarrier body power — body-only measurement under-reads
            # the frame by ~3 dB.  Rescale the outage-clipped body power
            # by (all-active mean / raw body mean) so the estimate lands
            # on the same scale the mode tables were calibrated against,
            # while the outage percentile still charges fade dips.
            tot, cnt = float((sig * sig).sum()), len(sig)
            for s0, s1 in segments:
                seg = buf[max(0, s0):min(s1, len(buf))].astype(np.float64)
                tot += float((seg * seg).sum())
                cnt += len(seg)
            if cnt and ps_raw > 1e-12:
                ps *= (tot / cnt) / ps_raw

        # Fade-spread: 90/10 percentile ratio of 100 ms-SMOOTHED chunk
        # powers, pooled over every active TX segment of the frame (main
        # span + any extra `segments`, e.g. the two 500 ms chirps of a
        # chirp-led preamble) with each segment normalized by its own
        # median.  The smoothing cancels multicarrier PAPR beating
        # (sub-symbol) while fade envelopes (>=250 ms coherence) survive,
        # and the per-segment normalization cancels TX level structure
        # between segments (a constant-envelope chirp and an OFDM/DPSK
        # body sit at different RMS for the same peak scale), so AWGN
        # reads ~0-1 dB and Watterson fading ~5-9 dB.  Only >=1 s of
        # pooled active signal is trusted (less can sit inside one fade
        # coherence time and alias fading as flat); -1.0 = unmeasured.
        # Consumed by the calibrated negotiation's benign-channel
        # relaxation (protocol/connection.py negotiate_mode).
        pooled = []
        for s0, s1 in [(start, end)] + list(segments or []):
            seg = buf[max(0, s0):min(s1, len(buf))].astype(np.float64)
            nsc_s = (len(seg) // C) * C
            if nsc_s < 12 * C:
                continue
            sp_s = (seg[:nsc_s].reshape(-1, C) ** 2).mean(-1)
            sm = np.convolve(sp_s, np.full(w, 1.0 / w), mode="valid")
            pooled.append(sm / max(float(np.median(sm)), 1e-12))
        spread = -1.0
        if pooled:
            allsm = np.concatenate(pooled)
            if len(allsm) >= 91:  # >= 1 s contiguous-equivalent
                spread = float(np.clip(10.0 * np.log10(
                    np.percentile(allsm, 90.0)
                    / max(np.percentile(allsm, 10.0), 1e-12)), 0.0, 40.0))
        self.stats.fade_spread_db = spread
        snr = max(ps / pn - 1.0, 0.1)
        return float(np.clip(10.0 * np.log10(snr), -10.0, 40.0))

    def _classify_after_chirp(self, tr_start: int, cfo: float) -> str:
        """'ping' when no structured training follows the chirp, 'frame' when
        it does, 'wait' when the stream hasn't delivered enough samples yet."""
        buf = self._rx_buffer
        probe = buf[tr_start:tr_start + 2048]
        if len(probe) < 2048:
            return "wait"
        rms = float(np.sqrt((probe ** 2).mean()))
        if rms <= PING_RMS_THRESHOLD:
            return "ping"
        if self.waveform_mode == WaveformMode.OFDM_CHIRP:
            # LTS training = two identical symbols: repeated-symbol metric.
            # Complex (analytic) correlation MAGNITUDE, not the raw real
            # dot: under CFO the repeats differ by a constant rotation
            # e^{j*2pi*cfo*L/fs} which the real dot turns into cos(phi) —
            # at 50 Hz that crosses 0.3 and misclassified frames as PINGs
            # (caught by the single-stream matrix).  |sum a*conj(b)| is
            # rotation-invariant.  Host numpy (no eager device complex,
            # INV-TPU-007).
            cfg = self._chirp_ofdm_config()
            L = cfg.symbol_duration
            if tr_start + 2 * L > len(buf):
                return "wait"
            import scipy.signal as _sig
            seg = buf[tr_start:tr_start + 2 * L].astype(np.float64)
            z = _sig.hilbert(seg)
            za, zb = z[:L], z[L:2 * L]
            denom = float(np.linalg.norm(za) * np.linalg.norm(zb))
            score = abs(np.vdot(za, zb)) / denom if denom > 1e-12 else 0.0
            return "ping" if score < 0.3 else "frame"
        # MC-DPSK: known (c*s)*90deg training pattern correlation.  Use the
        # first 4 training symbols (2048 samples, same as the RMS probe) so
        # classification never needs more lookahead than the probe — a PING
        # followed by only a little noise must classify, not wait forever.
        n = min(self.mc_config.training_samples,
                4 * self.mc_config.samples_per_symbol)
        if tr_start + n > len(buf):
            return "wait"
        seg = buf[tr_start:tr_start + n]
        seg = np.asarray(MC.apply_cfo_segment(
            jnp.asarray(seg[None, :]), jnp.asarray([cfo], np.float32),
            jnp.asarray([-2 * np.pi * cfo * tr_start / 48000.0], np.float32)))
        score = float(np.asarray(MC.training_score(
            self.mc_config, jnp.asarray(seg)))[0])
        return "ping" if score < 0.4 else "frame"

    def _try_cox_once(self) -> Optional[int]:
        """One Schmidl-Cox acquisition+decode pass.  Returns the number of
        delivered events when decisively handled (decoded or failed), the
        string "wait" when a preamble was found but the frame has not fully
        arrived (the chirp path still runs, but must not trim the buffer),
        or None when no Cox activity was found."""
        from ..sync import schmidl_cox as SC
        buf = self._rx_buffer
        cfg = self.config
        plen = cfg.fft_size + cfg.cyclic_prefix
        if len(buf) < 10 * plen:
            return None
        from_pending = False
        if self._cox_pending is not None:
            # A found preamble is streaming in: retry the decode directly,
            # no full-buffer re-search.
            lts_start = self._cox_pending[0] - self._rx_consumed
            cfo = self._cox_pending[1]
            if lts_start < 0:
                self._cox_pending = None
                return None
            from_pending = True
        else:
            if self._cox_deep_pending is not None:
                # A below-the-floor candidate awaits its CW0 span: retry on
                # EVERY poll (host length check until the span arrives) so a
                # stream ending between search cadences still completes it.
                abs_lts, dcfo = self._cox_deep_pending[:2]
                rel = abs_lts - self._rx_consumed
                if rel < 0:
                    self._cox_deep_pending = None
                else:
                    r = self._cox_deep_candidate(rel, dcfo)
                    if r is not None:
                        return r
            if not self._search_due("cox"):
                return None
            det = {k: np.asarray(v)[0] for k, v in SC.detect_preamble(
                cfg, jnp.asarray(self._bucketed(
                    buf[:self.ACQ_VIEW_CAP])[None, :]),
                with_deep=self.deep_acquisition).items()}
            if not bool(det["found"]):
                self._cox_wait = None
                if self.deep_acquisition and bool(det.get("deep_found",
                                                          False)):
                    return self._cox_deep_candidate(
                        int(det["deep_lts_start"]),
                        float(det["deep_cfo_hz"]))
                return None
            lts_start = int(det["lts_start"])
            cfo = float(det["cfo_hz"])
        status, frame = self._decode_frame_cox(lts_start, cfo)
        if status == "fail" and from_pending:
            # The cached position came from a detection over a PARTIAL
            # preamble (plateau edge still forming) and can be mistimed by
            # >1000 samples; re-detect on the now-fuller buffer before
            # treating the frame as undecodable (caught by the full-length
            # HF-reality soak: two Cox frames failed at stale positions
            # and the fail-consume then ate their preambles).
            self._cox_pending = None
            self._acq_searched.pop("cox", None)
            return self._try_cox_once()
        if status == "fail":
            # LDPC-validated timing hunt (huntForCodeword,
            # ofdm_sync.cpp:572-643): a CONFIDENT preamble whose CW0 did not
            # parse may be mistimed (multipath smears the plateau edge);
            # trial-decode CW0 at +-150-sample offsets and accept the first
            # with the 0x554C magic.  CW0 rides R1/4 pre-negotiation and the
            # negotiated rate when connected (same candidates as the probe).
            hunt_rates = [CodeRate.R1_4]
            if self.connected and self.data_code_rate not in hunt_rates:
                hunt_rates.append(self.data_code_rate)
            # Same mode candidates as _decode_frame_cox: a MODE_CHANGE may
            # have crossed this frame in flight.
            hunt_mods = [self.data_modulation]
            if (self.prev_data_modulation is not None
                    and self.prev_data_modulation not in hunt_mods):
                hunt_mods.append(self.prev_data_modulation)
            done = False
            for hm in hunt_mods:
                for hr in hunt_rates:
                    hunted, off = SC.hunt_for_codeword(
                        cfg, hm, buf, lts_start + 2 * plen, rate=hr,
                        cfo_hz=cfo, interleaved=self.interleaving_enabled)
                    # off == 0 means the hunt validated CW0 at the NOMINAL
                    # position the straight decode already failed at (its
                    # unity-channel trial equalization differs) — nothing
                    # to retry there, so only nonzero offsets re-decode.
                    if hunted and off:
                        status, frame = self._decode_frame_cox(
                            lts_start + off, cfo)
                        done = True
                        break
                if done:
                    break
        if status == "wait":
            # Cache the found preamble so later polls retry the decode
            # directly instead of re-running the full-buffer search; the
            # wait tick's preemption/timeout consumes invalidate it via
            # the consumed-position check above.
            self._cox_pending = (self._rx_consumed + lts_start, cfo)
            r = self._cox_wait_tick(lts_start, plen)
            if r != "wait":
                self._cox_pending = None
            return r
        self._cox_pending = None
        self._cox_wait = None
        if status == "fail":
            planned = lts_start + 2 * plen
            guard = self._chirp_strong_pos(limit=planned)
            if 0 <= guard < planned:
                # A chirp is arriving inside the claimed span: consume only
                # up to it and fall through to the chirp path this pass.
                self._consume(guard)
                return None
            self._consume(planned)
            return 0
        self.frames_received += 1
        import time as _t
        self._last_rx_complete_time = _t.monotonic()
        if self.on_frame:
            self.on_frame(frame)
        return 1

    # Streaming-resilience limits (demodulator_constants.hpp:36-38 spirit):
    # a frame that makes no progress for 10 polls with no new audio is
    # abandoned.  The reference's blanket 250-symbol cap would kill
    # LEGITIMATE long frames here (its comment sizes 250 for ~1KB at 43
    # data carriers; the default config has 15, so a connected ~440-byte
    # R1/2 frame already exceeds it) — the cap is instead derived from the
    # protocol's real bound (MAX_PAYLOAD_V2 at the most symbol-hungry
    # mode), see _cox_max_symbols.
    COX_MAX_IDLE_POLLS = 10

    def _cox_max_symbols(self) -> int:
        cw_max = F.calculate_codewords(F.MAX_PAYLOAD_V2, CodeRate.R1_4)
        S = ofdm_pipeline.num_data_symbols(self.config, Modulation.DBPSK,
                                           cw_max)
        return S + 16  # margin for the preamble/LTS span

    def _cox_wait_tick(self, lts_start: int, plen: int):
        """Bookkeeping for a Cox frame that is detected but not fully
        buffered ("wait").  Implements the reference's SYNCED-state
        resilience (demodulator.cpp:604-737) in host-poll form:

        - mid-frame preamble preemption: from the 2nd consecutive waiting
          poll on, search the region AFTER the pending preamble; a new
          confirmed preamble there means the pending TX was cut off —
          drop it and resync on the new one.
        - idle timeout: >=10 polls in this state with no new audio
          (e.g. the stream ended inside the frame) abandons the frame.
        - symbol timeout: more symbols buffered past the preamble than the
          protocol's largest possible frame (MAX_PAYLOAD_V2 at the most
          symbol-hungry mode) without completing means the claimed frame
          length is bogus — abandon.
        """
        from ..sync import schmidl_cox as SC
        abs_start = self._rx_consumed + lts_start
        abs_len = self._rx_consumed + len(self._rx_buffer)
        st = self._cox_wait
        if st is None or st["abs_start"] != abs_start:
            self._cox_wait = {"abs_start": abs_start, "abs_len": abs_len,
                              "idle": 0, "polls": 1}
            return "wait"
        st["polls"] += 1
        if abs_len == st["abs_len"]:
            st["idle"] += 1
        else:
            st["abs_len"], st["idle"] = abs_len, 0

        give_up = (st["idle"] >= self.COX_MAX_IDLE_POLLS
                   or abs_len - (abs_start + 2 * plen)
                   > self._cox_max_symbols() * self.config.symbol_duration)
        if give_up:
            self._cox_wait = None
            planned = lts_start + 2 * plen
            guard = self._chirp_strong_pos(limit=planned)
            if 0 <= guard < planned:
                # Mirror the fail path: consume up to the arriving chirp
                # and FALL THROUGH to the chirp path this pass.  Ending
                # the pass here (the old `return 0`) was a liveness bug:
                # once a previous give-up had consumed up to the chirp
                # head, guard == 0 made the consume a no-op, the chirp
                # was never attempted, and the give-up re-fired every
                # poll while the buffer grew without bound.
                self._consume(guard)
                return None
            self._consume(planned)
            return 0

        if st["polls"] >= 2:
            tail_off = lts_start + 2 * plen
            tail = self._rx_buffer[tail_off:]
            if len(tail) >= 10 * plen:
                det2 = {k: np.asarray(v)[0] for k, v in SC.detect_preamble(
                    self.config,
                    jnp.asarray(self._bucketed(tail)[None, :])).items()}
                if bool(det2["found"]):
                    self._cox_wait = None
                    # Keep the WHOLE new preamble (its 5 STS symbols
                    # precede the LTS and re-detection needs the plateau).
                    keep_from = tail_off + max(0,
                                               int(det2["lts_start"]) - 6 * plen)
                    self._consume(keep_from)
                    return 0
        return "wait"

    def _cox_deep_candidate(self, lts_start: int, cfo: float):
        """Validate-then-decode a BELOW-THE-FLOOR Schmidl-Cox candidate.

        Deep acquisition is a capability extension past the reference: its
        0.90 plateau gate (demodulator_constants.hpp:51) floors coherent
        OFDM acquisition at ~14 dB wideband AWGN even though the payload
        decodes far lower; the DEEP_* gates (sync/schmidl_cox.py) admit
        exact-timing candidates down to ~7-8 dB.  A deep candidate is
        SPECULATIVE: it consumes nothing and preempts nothing until its CW0
        LDPC-decodes with a valid header (the same magic gate the normal
        path applies), so junk candidates cannot wedge the receiver —
        validation failures are memoized by absolute position in
        _cox_deep_rejected, and while a candidate waits for its CW0 span
        the chirp path keeps running underneath via the "wait" contract.

        Returns 1 on a delivered frame, "wait" while the span arrives,
        None when the candidate is rejected (callers fall through)."""
        from ..sync import schmidl_cox as SC
        cfg = self.config
        plen = cfg.fft_size + cfg.cyclic_prefix
        abs_lts = self._rx_consumed + lts_start
        self._cox_deep_rejected = {
            p for p in self._cox_deep_rejected if p >= self._rx_consumed}
        if abs_lts in self._cox_deep_rejected:
            self._cox_deep_pending = None
            return None
        status, frame = self._decode_frame_cox(lts_start, cfo)
        if status == "wait":
            # CW0 span not buffered yet: keep the candidate pending with an
            # idle timeout so a dead stream cannot pin it forever.
            abs_len = self._rx_consumed + len(self._rx_buffer)
            st = self._cox_deep_pending
            idle = 0
            if st is not None and st[0] == abs_lts:
                idle = st[3] + 1 if abs_len == st[2] else 0
                if idle >= self.COX_MAX_IDLE_POLLS:
                    self._cox_deep_pending = None
                    self._cox_deep_rejected.add(abs_lts)
                    return None
            self._cox_deep_pending = (abs_lts, cfo, abs_len, idle)
            return "wait"
        self._cox_deep_pending = None
        if status == "fail":
            # Same LDPC-magic timing hunt as the normal fail path: a deep
            # candidate from a partially-formed plateau can be mistimed.
            hunt_rates = [CodeRate.R1_4]
            if self.connected and self.data_code_rate not in hunt_rates:
                hunt_rates.append(self.data_code_rate)
            hunt_mods = [self.data_modulation]
            if (self.prev_data_modulation is not None
                    and self.prev_data_modulation not in hunt_mods):
                hunt_mods.append(self.prev_data_modulation)
            done = False
            for hm in hunt_mods:
                for hr in hunt_rates:
                    hunted, off = SC.hunt_for_codeword(
                        cfg, hm, self._rx_buffer, lts_start + 2 * plen,
                        rate=hr, cfo_hz=cfo,
                        interleaved=self.interleaving_enabled)
                    if hunted and off:
                        status, frame = self._decode_frame_cox(
                            lts_start + off, cfo)
                        done = True
                        break
                if done:
                    break
            if status == "wait":
                # The hunt VALIDATED CW0 at the offset but the full frame is
                # still arriving: promote to the normal validated-pending
                # machinery (retried every poll, wait-tick resilience).
                self._cox_pending = (abs_lts + off, cfo)
                return "wait"
        if status != "ok":
            self._cox_deep_rejected.add(abs_lts)
            return None
        self._cox_wait = None
        self.frames_received += 1
        import time as _t
        self._last_rx_complete_time = _t.monotonic()
        if self.on_frame:
            self.on_frame(frame)
        return 1

    def _try_otfs_once(self) -> Optional[int]:
        """One OTFS acquisition+decode pass (modem_rx_decode.cpp:700-830
        flow).  Returns delivered-event count when decisively handled,
        "wait" when a frame is still arriving, None when no OTFS frame was
        found (chirp pings fall through: a chirp's repeated-symbol metric
        stays far below the 0.98 fine-sync gate)."""
        from ..otfs import otfs as O
        buf = self._rx_buffer
        ocfg = self._otfs_config(self.waveform_mode)
        if len(buf) < ocfg.frame_len:
            return None
        if not self._otfs_waiting and not self._search_due("otfs"):
            return None
        found, start = O.detect_frame(ocfg, jnp.asarray(buf[None, :]))
        if not bool(np.asarray(found)[0]):
            self._otfs_waiting = False
            return None
        # The 0.98 fine-sync rule lands within ~half a CP of the true start
        # (same bias as otfs.cpp:479-500).  OTFS_EQ absorbs that in the
        # channel estimate; OTFS_RAW cannot (a fractional delay-bin shift
        # smears the DD grid), so refine to exact alignment with a preamble
        # matched filter — strictly better than the reference's rule.
        coarse = int(np.asarray(start)[0])
        pre = O.generate_preamble(ocfg)
        # Window covers one full symbol each way: the coarse fallback's
        # plateau-edge estimate can be off by a large fraction of a symbol
        # at SNRs where the 0.98 fine rule never fires.
        lo = max(0, coarse - ocfg.sym_len)
        hi = min(len(buf) - len(pre), coarse + ocfg.sym_len)
        if hi <= lo:
            self._otfs_waiting = True
            return "wait"  # preamble not fully buffered yet
        corr = np.correlate(buf[lo:hi + len(pre)], pre, mode="valid")
        start0 = lo + int(np.argmax(np.abs(corr)))
        status, frame = self._decode_frame_otfs(ocfg, start0)
        if status == "wait":
            self._otfs_waiting = True
            return "wait"
        self._otfs_waiting = False
        if status == "fail":
            self._consume(start0 + ocfg.frame_len)
            return 0
        self.frames_received += 1
        import time as _t
        self._last_rx_complete_time = _t.monotonic()
        if self.on_frame:
            self.on_frame(frame)
        return 1

    # Bound the per-call preamble search to ~256k candidate offsets (the
    # gathered symbol grid is O(offsets x 39) complex) and bucket the buffer
    # length so jit recompiles stay rare under 960-sample streaming feeds.
    DPSK_MAX_SEARCH_OFFSETS = 1 << 18
    STREAM_BUCKET = 1 << 16

    def _bucketed(self, buf: np.ndarray) -> np.ndarray:
        """Zero-pad a streaming buffer up to a STREAM_BUCKET multiple so the
        jitted detectors see one shape per bucket instead of one per
        960-sample chunk.  Zeros carry no energy, so they can neither create
        detections nor shift real ones; all returned positions index the
        real prefix."""
        T = -(-len(buf) // self.STREAM_BUCKET) * self.STREAM_BUCKET
        padded = np.zeros(T, np.float32)
        padded[:len(buf)] = buf
        return padded

    def _try_dpsk_once(self) -> Optional[int]:
        """One single-carrier DPSK acquisition+decode pass (the RX analogue
        the reference never wired: its dpsk_demodulator_ is constructed in
        modem_engine.cpp:56 but only ever reset).  Returns delivered-event
        count when decisively handled, "wait" while a found frame is still
        arriving, None when no Barker preamble is in the buffer (chirp
        PINGs then fall through to the chirp detector)."""
        cfg = self.dpsk_config
        buf = self._rx_buffer
        L = cfg.samples_per_symbol
        pre_n = cfg.preamble_samples
        if self._dpsk_pending is not None:
            abs_start, cfo, ipo, prev = self._dpsk_pending
            data_start = abs_start - self._rx_consumed
            if data_start < 0:  # consumed past it (e.g. by another path)
                self._dpsk_pending = None
                return None
        else:
            if len(buf) < pre_n + L:
                return None
            # Search only when new audio arrived since the last search
            # (the reference's 100 ms acquisition poll cadence).
            abs_len = self._rx_consumed + len(buf)
            if abs_len - self._dpsk_searched_until < 4800:
                return None
            self._dpsk_searched_until = abs_len
            # The search caps candidate offsets at DPSK_MAX_SEARCH_OFFSETS,
            # so slicing the buffer VIEW to that span before bucketing is
            # free — and it bounds the jitted search to a handful of shapes
            # instead of one per bucket of an unbounded growing buffer
            # (robust DPSK frames are ~40 s = ~30 buckets each, a compile
            # storm on first contact with a backend).
            view = buf[:self.DPSK_MAX_SEARCH_OFFSETS + pre_n + L]
            padded = self._bucketed(view)
            # Derive the search span from the BUCKETED length so the jit key
            # (T, max_syms) only changes per bucket, not per 960-sample chunk.
            max_syms = min(-(-(len(padded) - pre_n) // L),
                           self.DPSK_MAX_SEARCH_OFFSETS // L)
            found, ds, cfo, ipo, prev = DP.find_preamble(
                cfg, jnp.asarray(padded[None, :]), max_search_symbols=max_syms,
                valid_len=jnp.asarray([len(view)], jnp.int32))
            if not bool(np.asarray(found)[0]):
                # No preamble STARTS in the searched span — that region is
                # provably clean and the chirp fallback's tail trim may
                # consume it; anything beyond the bounded search span has
                # NOT been examined and must be kept (the search cap would
                # otherwise let the trim destroy a far-ahead frame).
                searched = max(0, min(len(buf), max_syms * L) - pre_n)
                self._dpsk_clean_until = max(self._dpsk_clean_until,
                                             self._rx_consumed + searched)
                return None
            data_start = int(np.asarray(ds)[0])
            # Keep cfo/ipo/prev as the [1]-shaped device arrays
            # find_preamble returned: eager complex indexing (prev[0])
            # raises UNIMPLEMENTED on the axon backend (INV-TPU-007), and
            # demodulate_soft wants batch-shaped inputs anyway.
            self._dpsk_pending = (self._rx_consumed + data_start,
                                  cfo, ipo, prev)
        status, frame = self._decode_frame_dpsk(data_start, cfo, ipo, prev)
        if status == "wait":
            return self._dpsk_wait_tick(data_start)
        self._dpsk_wait = None
        self._dpsk_pending = None
        # Buffer content shifted (decode consumed / fail stepped): re-arm
        # the search so a second frame already in the buffer is found in
        # the SAME poll loop instead of waiting for 4800 new samples.
        self._dpsk_searched_until = 0
        if status == "fail":
            # Step ONE SYMBOL into the failed preamble instead of consuming
            # its whole span: the Barker-13x3 pattern is self-similar at a
            # 13-symbol shift (26/39 symbols still match), so a partial
            # preamble near the buffer end can fire a sidelobe detection
            # ~13 symbols EARLY — consuming to its data_start would destroy
            # the true preamble's head.  A gentle step converges: once the
            # true preamble fully arrives it outscores the sidelobe and
            # wins the argmax (caught by the single-stream matrix).
            self._consume(max(1, data_start - cfg.preamble_samples + L))
            return 0
        self.frames_received += 1
        import time as _t
        self._last_rx_complete_time = _t.monotonic()
        if self.on_frame:
            self.on_frame(frame)
        return 1

    def _dpsk_wait_tick(self, data_start: int):
        """Idle-timeout + mid-frame preemption for a pending DPSK frame (the
        Cox path's _cox_wait_tick analogue, minus the symbol cap —
        legitimate DPSK frames span minutes at the robust preset):

        - idle timeout: >=10 polls in this state with NO new audio (stream
          ended mid-frame) abandons the frame so the receiver and its
          buffer are released.
        - mid-frame preamble preemption: a multi-codeword frame cut after
          CW0 and followed by a NEW frame would otherwise wait forever
          (idle never increments while the second frame's audio arrives),
          then decode garbage and blind-consume data_start + n_sym*L —
          swallowing the new frame's preamble.  From the 2nd consecutive
          waiting poll, search newly-arrived audio AFTER the pending data
          start for a fresh Barker preamble and resync onto it."""
        cfg = self.dpsk_config
        abs_start = self._rx_consumed + data_start
        abs_len = self._rx_consumed + len(self._rx_buffer)
        st = self._dpsk_wait
        if st is None or st["abs_start"] != abs_start:
            # searched: absolute position the preemption search has covered.
            self._dpsk_wait = {"abs_start": abs_start, "abs_len": abs_len,
                               "idle": 0, "polls": 1, "searched": abs_start}
            return "wait"
        st["polls"] += 1
        if abs_len == st["abs_len"]:
            st["idle"] += 1
        else:
            st["abs_len"], st["idle"] = abs_len, 0
        if st["idle"] >= self.COX_MAX_IDLE_POLLS:
            self._dpsk_wait = None
            self._dpsk_pending = None
            self._consume(data_start)
            return 0

        if st["polls"] >= 2 and abs_len - st["searched"] >= 4800:
            buf = self._rx_buffer
            L = cfg.samples_per_symbol
            pre_n = cfg.preamble_samples
            # The pending frame's CW0 always decoded (demod(1) succeeded
            # before any "wait"), so its first 648-bit span is NOT a place a
            # new preamble can start; search after it.
            cw0_end = data_start + (-(-F.LDPC_CODEWORD_BITS //
                                      cfg.bits_per_symbol)) * L
            tail_off = min(cw0_end, len(buf))
            # Slide a bounded window over the newest audio: a new frame's
            # preamble arrives at the buffer END, and the 4800-sample
            # search cadence guarantees some poll sees it fully inside the
            # window — searching the whole (growing, minutes-long at the
            # robust preset) tail would be quadratic AND a compile storm.
            win = pre_n + self.STREAM_BUCKET
            tail_off = max(tail_off, len(buf) - win)
            tail = buf[tail_off:]
            if len(tail) >= pre_n + L:
                st["searched"] = abs_len
                padded = self._bucketed(tail)
                max_syms = min(-(-(len(padded) - pre_n) // L),
                               self.DPSK_MAX_SEARCH_OFFSETS // L)
                found, ds, _, _, _ = DP.find_preamble(
                    cfg, jnp.asarray(padded[None, :]),
                    max_search_symbols=max_syms,
                    valid_len=jnp.asarray([len(tail)], jnp.int32))
                if bool(np.asarray(found)[0]):
                    # Pending TX was cut off — drop it, keep the WHOLE new
                    # preamble and let the next poll re-acquire it.
                    self._dpsk_wait = None
                    self._dpsk_pending = None
                    self._dpsk_searched_until = 0
                    keep_from = tail_off + max(
                        0, int(np.asarray(ds)[0]) - pre_n)
                    self._consume(keep_from)
                    return 0
        return "wait"

    def _decode_frame_dpsk(self, data_start: int, cfo, ipo, prev
                           ) -> tuple[str, Optional[DecodedFrame]]:
        """CW0 probe at R1/4 -> total_cw -> full differential decode.
        cfo/ipo/prev are the [1]-shaped device arrays from find_preamble
        (0-d complex downloads and eager complex indexing are unsupported
        on the axon transport) and feed demodulate_soft directly."""
        cfg = self.dpsk_config
        buf = self._rx_buffer
        L = cfg.samples_per_symbol
        bc = cfg.bits_per_symbol
        candidate_rates = [CodeRate.R1_4]
        if self.connected and self.data_code_rate not in candidate_rates:
            candidate_rates.append(self.data_code_rate)

        def demod(n_cw: int) -> Optional[np.ndarray]:
            nbits = F.LDPC_CODEWORD_BITS * n_cw
            n_sym = -(-nbits // bc)
            need = data_start + n_sym * L
            if len(buf) < need:
                return None
            span = jnp.asarray(buf[None, data_start:need])
            llrs = DP.demodulate_soft(cfg, span, prev, cfo, ipo)
            return np.asarray(llrs)[0][:nbits]

        llrs0 = demod(1)
        if llrs0 is None:
            return "wait", None
        info = rate0 = None
        for rate in candidate_rates:
            ok, data = F.decode_codewords_with_ldpc([llrs0[:648]], rate)
            if ok[0]:
                hdr = F.parse_header(data[0].ljust(F.BYTES_PER_CODEWORD, b"\0"))
                if hdr.valid:
                    info, rate0 = hdr, rate
                    break
        if info is None:
            return "fail", None
        total_cw = max(1, info.total_cw) if info.is_control \
            else F.calculate_codewords(info.payload_len, rate0)
        # A corrupted header that survived LDPC + header-CRC16 could still
        # claim an absurd payload_len and wedge the receiver waiting for
        # minutes of audio; the protocol bounds payloads at MAX_PAYLOAD_V2.
        if total_cw > F.calculate_codewords(F.MAX_PAYLOAD_V2, rate0):
            return "fail", None

        if total_cw > 1:
            llrs = demod(total_cw)
            if llrs is None:
                return "wait", None
            blocks = [llrs[i * 648:(i + 1) * 648] for i in range(total_cw)]
            oks, datas = F.decode_codewords_with_ldpc(blocks, rate0)
        else:
            oks, datas = ok, data

        if info.is_control:
            expected = F.CONTROL_SIZE
        else:
            expected = F.HEADER_SIZE + info.payload_len + F.CRC_SIZE
        bpc = F.bytes_per_codeword(rate0)
        frame_bytes = F.reassemble_codewords(
            [d if o else b"\0" * bpc for o, d in zip(oks, datas)], expected)

        n_sym = -(-(F.LDPC_CODEWORD_BITS * total_cw) // bc)
        self._consume(data_start + n_sym * L)

        self.stats.frames_received += 1
        self.stats.bytes_received += len(frame_bytes)
        if not all(oks):
            self.stats.frames_failed += 1
        pre_start = data_start - cfg.preamble_samples
        snr_db = 0.0
        if pre_start >= 0:  # data_start <= len(buf): demod() checked need
            snr_db = float(np.asarray(DP.estimate_preamble_snr_db(
                cfg, jnp.asarray(buf[None, pre_start:data_start]),
                cfo))[0])
            self.stats.current_snr_db = snr_db
        wb = self._wideband_snr_db(buf, pre_start, data_start + n_sym * L)
        self.stats.wideband_snr_db = wb
        return "ok", DecodedFrame(frame_bytes=frame_bytes, header=info,
                                  cw_ok=oks, cfo_hz=float(np.asarray(cfo)[0]),
                                  snr_db=snr_db, wideband_snr_db=wb,
                                  fade_spread_db=self.stats.fade_spread_db,
                                  waveform=WaveformMode.DPSK)

    def _decode_frame_otfs(self, ocfg, start: int
                           ) -> tuple[str, Optional[DecodedFrame]]:
        """One codeword per OTFS frame; frames separated by 480-sample gaps.
        CW0 probe -> total_cw -> batched demod of every frame."""
        from ..otfs import otfs as O
        buf = self._rx_buffer
        mod = self._otfs_mod(self.data_modulation)
        flen, gap = ocfg.frame_len, self.OTFS_INTER_FRAME_GAP
        candidate_rates = [CodeRate.R1_4]
        if self.connected and self.data_code_rate not in candidate_rates:
            candidate_rates.append(self.data_code_rate)

        def spans(n_cw: int) -> Optional[np.ndarray]:
            need = start + n_cw * flen + (n_cw - 1) * gap
            if len(buf) < need:
                return None
            return np.stack([buf[start + k * (flen + gap):
                                 start + k * (flen + gap) + flen]
                             for k in range(n_cw)])

        s1 = spans(1)
        if s1 is None:
            return "wait", None
        llrs = np.asarray(O.demodulate_frame(ocfg, mod, jnp.asarray(s1)))
        info = rate0 = None
        for rate in candidate_rates:
            ok, data = F.decode_codewords_with_ldpc([llrs[0][:648]], rate)
            if ok[0]:
                hdr = F.parse_header(data[0].ljust(F.BYTES_PER_CODEWORD, b"\0"))
                if hdr.valid:
                    info, rate0 = hdr, rate
                    break
        if info is None:
            return "fail", None
        total_cw = max(1, info.total_cw) if info.is_control \
            else F.calculate_codewords(info.payload_len, rate0)

        if total_cw > 1:
            sall = spans(total_cw)
            if sall is None:
                return "wait", None
            llrs = np.asarray(O.demodulate_frame(ocfg, mod, jnp.asarray(sall)))
            blocks = [llrs[k][:648] for k in range(total_cw)]
            oks, datas = F.decode_codewords_with_ldpc(blocks, rate0)
        else:
            oks, datas = ok, data

        if info.is_control:
            expected = F.CONTROL_SIZE
        else:
            expected = F.HEADER_SIZE + info.payload_len + F.CRC_SIZE
        bpc = F.bytes_per_codeword(rate0)
        frame_bytes = F.reassemble_codewords(
            [d if o else b"\0" * bpc for o, d in zip(oks, datas)], expected)

        self._consume(start + total_cw * flen + (total_cw - 1) * gap)
        self.stats.frames_received += 1
        self.stats.bytes_received += len(frame_bytes)
        if not all(oks):
            self.stats.frames_failed += 1
        # GAP-FREE spans only (_wideband_snr_db contract): OTFS inserts
        # 480 silent samples between codewords, so the first codeword is
        # the main span and the rest join as extra active segments — the
        # gaps would otherwise deflate the mean and push the smoothed
        # envelope spread toward the fading branch.
        wb = self._wideband_snr_db(
            buf, start, start + flen,
            segments=[(start + i * (flen + gap),
                       start + i * (flen + gap) + flen)
                      for i in range(1, total_cw)])
        self.stats.wideband_snr_db = wb
        return "ok", DecodedFrame(frame_bytes=frame_bytes, header=info,
                                  cw_ok=oks, wideband_snr_db=wb,
                                  fade_spread_db=self.stats.fade_spread_db,
                                  waveform=self.waveform_mode)

    def _decode_frame_cox(self, lts_start: int, cfo: float
                          ) -> tuple[str, Optional[DecodedFrame]]:
        """OFDM_COX decode: current data mode first, then the previous mode
        (a MODE_CHANGE may have crossed this frame in flight)."""
        st, fr = self._decode_frame_cox_mod(lts_start, cfo,
                                            self.data_modulation,
                                            self.data_code_rate)
        pm, pr = self.prev_data_modulation, self.prev_data_code_rate
        if (st == "fail" and pm is not None
                and (pm, pr) != (self.data_modulation, self.data_code_rate)):
            st, fr = self._decode_frame_cox_mod(lts_start, cfo, pm, pr)
        return st, fr

    def _decode_frame_cox_mod(self, lts_start: int, cfo: float,
                              mod: Modulation, data_rate: CodeRate
                              ) -> tuple[str, Optional[DecodedFrame]]:
        """OFDM_COX decode from a detected preamble: LTS channel estimate,
        pilot-tracked data symbols at the given modulation
        (modem_rx_decode.cpp:159-530 for the CW0-probe/total_cw flow;
        sync/schmidl_cox.decode_ofdm_cox for the mixer bookkeeping)."""
        from ..config import bits_per_symbol
        from ..ofdm import demodulator as demod_mod
        buf = self._rx_buffer
        cfg = self.config
        plen = cfg.fft_size + cfg.cyclic_prefix
        candidate_rates = [CodeRate.R1_4]
        if self.connected and data_rate not in candidate_rates:
            candidate_rates.append(data_rate)

        cm = carriers_mod.carrier_map(cfg)
        bps = len(cm.data_idx) * bits_per_symbol(mod)
        ci = channel_interleaver(bps, F.LDPC_CODEWORD_BITS) \
            if self.interleaving_enabled else None

        def demod(n_cw: int):
            S = ofdm_pipeline.num_data_symbols(cfg, mod, n_cw)
            need = lts_start + 2 * plen + S * cfg.symbol_duration
            if len(buf) < need:
                return None, None
            # Image-free demod under CFO for coherent modes.  Conversion +
            # slicing + demod run in ONE jit (demodulator.demodulate_span),
            # and the span carries lead/tail MARGIN around the frame where
            # the buffer has it: the Hilbert FFT's wrap-point discontinuity
            # otherwise rings ~-32 dB into the first LTS and the last data
            # symbols (demodulator._edge_tapered) — the binding EVM floor
            # for the high-order modes on short frames.  Margins are
            # quantized to {0, plen, 2*plen} so streaming buffers produce a
            # bounded compile-shape set.
            lead = (2 * plen if lts_start >= 2 * plen
                    else plen if lts_start >= plen else 0)
            avail = len(buf) - need
            tail = (2 * plen if avail >= 2 * plen
                    else plen if avail >= plen else 0)
            # Front-end pick (host branch on the detected CFO): the REAL
            # passband is EXACT for coherent modes at small CFO (the
            # conjugate image is bin-orthogonal, like the reference's
            # channel_equalizer.cpp:19-71 front-end — zero sign errors on
            # long QAM frames at zero noise, where the Hilbert mask's
            # DC-adjacent leakage corrupted them), but the image leaks
            # ICI that grows ~2*cfo/bin under a true offset.  The
            # analytic front is CFO-robust with a ~-25 dB mask floor —
            # cross-over measured around a few Hz (docs/PERF.md).
            # PILOT plans only: the no-pilot NVIS path's analytic +
            # folded-Tukey + DD-refinement ladder is its validated
            # operating mode (and its 1024 grid leaves just 4 bins
            # between signal and image), measured better than the real
            # front at the R5/6 waterfall edges.
            front = ("real" if not demod_mod.is_differential(mod)
                     and len(carriers_mod.carrier_map(cfg).pilot_idx) > 0
                     and abs(float(cfo)) <= self.REAL_FRONT_CFO_MAX_HZ
                     else "analytic")
            span = jnp.asarray(buf[None, lts_start - lead:need + tail])
            llrs, state = demod_mod.demodulate_span(
                cfg, mod, span, cfo, 0.0, n_lts=2, S=S,
                lead=lead, tail=tail, front=front)
            if self.collect_constellation:
                ri = np.asarray(demod_mod.equalized_symbols_span(
                    cfg, mod, span, cfo, 0.0, n_lts=2, S=S,
                    lead=lead, tail=tail, front=front))
                self.last_constellation = \
                    (ri[..., 0] + 1j * ri[..., 1]).reshape(-1)
            out = np.asarray(llrs)[0][:F.LDPC_CODEWORD_BITS * n_cw]
            if ci is not None:
                out = np.concatenate([
                    ci.deinterleave_soft(out[i * 648:(i + 1) * 648])
                    for i in range(n_cw)])
            return out, state

        llrs0, st0 = demod(1)
        if llrs0 is None:
            return "wait", None
        info = rate0 = None
        for rate in candidate_rates:
            ok, data = F.decode_codewords_with_ldpc([llrs0[:648]], rate)
            if ok[0]:
                hdr = F.parse_header(data[0].ljust(F.BYTES_PER_CODEWORD, b"\0"))
                if hdr.valid:
                    info, rate0 = hdr, rate
                    break
        if info is None:
            return "fail", None
        # header.total_cw is sized at R1/4 (the ARQ's makeData default,
        # frame_v2.cpp:472) but TX splits at the ACTUAL rate
        # (encodeFrameWithLDPC, frame_v2.cpp:1079) — recompute from
        # payload_len at the probed rate.
        total_cw = max(1, info.total_cw) if info.is_control \
            else F.calculate_codewords(info.payload_len, rate0)

        if total_cw > 1:
            llrs, st = demod(total_cw)
            if llrs is None:
                return "wait", None
            blocks = [llrs[i * 648:(i + 1) * 648] for i in range(total_cw)]
            oks, datas = F.decode_codewords_with_ldpc(blocks, rate0)
        else:
            st = st0  # reuse the probe demod's state (no second device pass)
            oks, datas = ok, data

        if info.is_control:
            expected = F.CONTROL_SIZE
        else:
            expected = F.HEADER_SIZE + info.payload_len + F.CRC_SIZE
        bpc = F.bytes_per_codeword(rate0)
        frame_bytes = F.reassemble_codewords(
            [d if o else b"\0" * bpc for o, d in zip(oks, datas)], expected)

        # CRC-aided parity-free bit recovery (fec/crc_recover.py): at R3/4 and
        # R5/6 the H construction leaves info bits with zero checks, so every
        # codeword can converge (cw_ok) while the frame CRC fails on a few
        # low-|LLR| raw demapper decisions.  Syndrome-search those positions
        # before giving the frame up to ARQ.
        if (all(oks) and not info.is_control
                and rate0 in (CodeRate.R3_4, CodeRate.R5_6)
                and len(frame_bytes) == expected):
            from ..fec import crc_recover
            llr_blocks = ([llrs0[:648]] if total_cw == 1 else
                          [llrs[i * 648:(i + 1) * 648]
                           for i in range(total_cw)])
            fixed = crc_recover.recover_frame(
                frame_bytes, llr_blocks, rate0, expected)
            if fixed is not None:
                frame_bytes = fixed
                self.stats.frames_crc_recovered += 1

        S = ofdm_pipeline.num_data_symbols(cfg, mod, total_cw)
        self._consume(lts_start + 2 * plen + S * cfg.symbol_duration)

        self.stats.frames_received += 1
        self.stats.bytes_received += len(frame_bytes)
        if not all(oks):
            self.stats.frames_failed += 1
        # Per-carrier SNR from the pilot-tracked channel estimate
        # (channel_equalizer.cpp:591, getEstimatedSNR semantics).
        snr_db = float(10.0 * np.log10(
            np.asarray(st.estimated_snr_linear)[0]))
        self.stats.current_snr_db = snr_db
        # Frame audio begins at the 5-STS preamble ahead of the LTS.
        wb = self._wideband_snr_db(
            buf, lts_start - 5 * plen,
            lts_start + 2 * plen + S * cfg.symbol_duration)
        self.stats.wideband_snr_db = wb
        return "ok", DecodedFrame(frame_bytes=frame_bytes, header=info,
                                  cw_ok=oks, cfo_hz=cfo, snr_db=snr_db,
                                  wideband_snr_db=wb,
                                  fade_spread_db=self.stats.fade_spread_db,
                                  waveform=WaveformMode.OFDM_COX)

    def _decode_frame(self, wf: WaveformMode, tr_start: int, cfo: float
                      ) -> tuple[str, Optional[DecodedFrame]]:
        """Decode CW0 at R1/4, learn total_cw, decode everything
        (modem_rx_decode.cpp:51-115, 159-530).

        Returns ("ok", frame) | ("wait", None) when more samples are needed |
        ("fail", None) on undecodable input."""
        buf = self._rx_buffer
        # TX uses R1/4 for control/pre-negotiation frames and the negotiated
        # rate for connected DATA frames (ALL codewords, modem_engine.cpp:270);
        # probe CW0 with R1/4 first, then the negotiated rate.
        candidate_rates = [CodeRate.R1_4]
        if self.connected and self.data_code_rate not in candidate_rates:
            candidate_rates.append(self.data_code_rate)

        def demod(n_cw: int, rate: CodeRate) -> Optional[np.ndarray]:
            nbits = F.LDPC_CODEWORD_BITS * n_cw
            if wf == WaveformMode.MC_DPSK:
                n_sym = MC.num_symbols_for_bits(self.mc_config, nbits)
                pre_n = self.mc_config.training_samples + self.mc_config.ref_samples
                need = tr_start + pre_n + n_sym * self.mc_config.samples_per_symbol
                if len(buf) < need:
                    return None
                span = buf[tr_start:need]
                llrs = MC.demodulate_presynced(
                    self.mc_config, jnp.asarray(span[None, :]),
                    jnp.asarray([cfo], np.float32),
                    jnp.asarray([float(tr_start)], np.float32), n_sym)
                return np.asarray(llrs)[0][:nbits]
            # OFDM_CHIRP
            cfg = self._chirp_ofdm_config()
            n_sym = ofdm_pipeline.num_data_symbols(cfg, Modulation.DQPSK, n_cw)
            need = tr_start + (2 + n_sym) * cfg.symbol_duration
            if len(buf) < need:
                return None
            span = buf[tr_start:need]
            from ..ofdm import demodulator as demod_mod
            phase = chirp_mod.initial_cfo_phase(
                self.chirp_config, jnp.asarray([cfo], np.float32),
                jnp.asarray([tr_start], jnp.int32))
            llrs, st = demod_mod.demodulate_presynced(
                cfg, Modulation.DQPSK, jnp.asarray(span[None, :]),
                jnp.asarray([cfo], np.float32), phase,
                training_symbols=2, num_data_symbols=n_sym)
            # LTS-seeded per-carrier SNR (ofdm_chirp_waveform.cpp:211).
            self.stats.current_snr_db = float(10.0 * np.log10(
                np.asarray(st.estimated_snr_linear)[0]))
            out = np.asarray(llrs)[0][:nbits]
            if self.interleaving_enabled:
                bps = self._bits_per_ofdm_symbol_chirp()
                ci = channel_interleaver(bps, F.LDPC_CODEWORD_BITS)
                out = np.concatenate([
                    ci.deinterleave_soft(out[i * 648:(i + 1) * 648])
                    for i in range(n_cw)])
            return out

        llrs0 = demod(1, CodeRate.R1_4)
        if llrs0 is None:
            return "wait", None
        info = None
        for rate in candidate_rates:
            ok, data = F.decode_codewords_with_ldpc([llrs0[:648]], rate)
            if ok[0]:
                hdr = F.parse_header(data[0].ljust(F.BYTES_PER_CODEWORD, b"\0"))
                if hdr.valid:
                    info, rate0 = hdr, rate
                    break
        if info is None:
            return "fail", None
        # See _decode_frame_cox: header.total_cw is R1/4-sized; recompute
        # data-frame codeword counts at the probed rate.
        total_cw = max(1, info.total_cw) if info.is_control \
            else F.calculate_codewords(info.payload_len, rate0)

        if total_cw > 1:
            llrs = demod(total_cw, rate0)
            if llrs is None:
                return "wait", None
            blocks = [llrs[i * 648:(i + 1) * 648] for i in range(total_cw)]
            oks, datas = F.decode_codewords_with_ldpc(blocks, rate0)
        else:
            oks, datas = ok, data

        if info.is_control:
            expected = F.CONTROL_SIZE
        else:
            expected = F.HEADER_SIZE + info.payload_len + F.CRC_SIZE
        bpc = F.bytes_per_codeword(rate0)
        frame_bytes = F.reassemble_codewords(
            [d if o else b"\0" * bpc for o, d in zip(oks, datas)], expected)

        # CRC-aided parity-free bit recovery, same contract as the Cox path.
        if (all(oks) and not info.is_control
                and rate0 in (CodeRate.R3_4, CodeRate.R5_6)
                and len(frame_bytes) == expected):
            from ..fec import crc_recover
            llr_blocks = ([llrs0[:648]] if total_cw == 1 else
                          [llrs[i * 648:(i + 1) * 648]
                           for i in range(total_cw)])
            fixed = crc_recover.recover_frame(
                frame_bytes, llr_blocks, rate0, expected)
            if fixed is not None:
                frame_bytes = fixed
                self.stats.frames_crc_recovered += 1

        # Consume through the end of the decoded frame.
        if wf == WaveformMode.MC_DPSK:
            pre_n = self.mc_config.training_samples + self.mc_config.ref_samples
            n_sym = MC.num_symbols_for_bits(self.mc_config, 648 * total_cw)
            end = tr_start + pre_n + n_sym * self.mc_config.samples_per_symbol
        else:
            cfg = self._chirp_ofdm_config()
            n_sym = ofdm_pipeline.num_data_symbols(cfg, Modulation.DQPSK, total_cw)
            end = tr_start + (2 + n_sym) * cfg.symbol_duration
        self._consume(end)

        self.stats.frames_received += 1
        self.stats.bytes_received += len(frame_bytes)
        if not all(oks):
            self.stats.frames_failed += 1

        # SNR estimate from the training sequence (feeds mode negotiation).
        snr_db = 0.0
        if wf == WaveformMode.MC_DPSK:
            n = self.mc_config.training_samples
            if tr_start + n <= len(buf):
                seg = np.asarray(MC.apply_cfo_segment(
                    jnp.asarray(buf[None, tr_start:tr_start + n]),
                    jnp.asarray([cfo], np.float32),
                    jnp.asarray([-2 * np.pi * cfo * tr_start / 48000.0],
                                np.float32)))
                snr_db = float(np.asarray(MC.estimate_snr_db(
                    self.mc_config, jnp.asarray(seg)))[0])
                self.stats.current_snr_db = snr_db
        else:
            # OFDM_CHIRP: LTS-seeded per-carrier SNR stored by demod().
            snr_db = self.stats.current_snr_db
        # Gap-free span: training+data (the chirp preamble has 2x100 ms
        # silent gaps); the noise window sits before the up-chirp.  The
        # two constant-envelope chirps join the fade-spread pool as extra
        # active segments — a 3-CW connect frame's training+data alone is
        # ~0.9 s, under the 1 s spread trust gate, and negotiation needs
        # the spread measured from exactly that frame.
        cc = self.chirp_config
        up0 = tr_start - cc.total_samples
        dn0 = up0 + cc.chirp_samples + cc.gap_samples
        wb = self._wideband_snr_db(
            buf, tr_start, end, noise_before=up0,
            segments=[(up0, up0 + cc.chirp_samples),
                      (dn0, dn0 + cc.chirp_samples)])
        self.stats.wideband_snr_db = wb
        return "ok", DecodedFrame(frame_bytes=frame_bytes, header=info,
                                  cw_ok=oks, cfo_hz=cfo, snr_db=snr_db,
                                  wideband_snr_db=wb,
                                  fade_spread_db=self.stats.fade_spread_db,
                                  waveform=wf)

    def _bits_per_ofdm_symbol_chirp(self) -> int:
        cfg = self._chirp_ofdm_config()
        cm = carriers_mod.carrier_map(cfg)
        return len(cm.data_idx) * 2  # DQPSK

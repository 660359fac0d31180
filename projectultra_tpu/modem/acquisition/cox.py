"""Schmidl-Cox (OFDM_COX) acquisition + decode path.

Extracted from ModemEngine (round-4 split, VERDICT r3 weak #4): behavior is
byte-identical to the pre-split engine — the test suite, the stream matrix,
and the binary-interop goldens pin it.  See base.py for the shared engine
contract (buffer/consume/pacing/delivery services).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ...config import Modulation, CodeRate
from ...fec.interleave import channel_interleaver
from ...ofdm import carriers as carriers_mod
from ...ofdm import pipeline as ofdm_pipeline
from ...protocol import frame_v2 as F
from ...protocol.frame_v2 import WaveformMode
from ..types import DecodedFrame
from .base import AcquisitionPath


def _resample_sro(src: np.ndarray, n_out: int, eps: float,
                  anchor: float) -> np.ndarray:
    """Catmull-Rom fractional resample that unwinds a TX/RX sample-clock
    skew of ``eps`` (a TX event at time tau sits at RX index tau/(1+eps);
    the pilot timing track reads drift +eps*elapsed) around ``anchor``
    (the LTS position, where the channel estimate anchored timing):
    out[i] = src[anchor + (i - anchor) / (1 + eps)], i < n_out.  ``src``
    must extend ~n_out*|eps| past n_out or the final symbols clamp to the
    edge sample (measured: the clamped tail corrupted the LAST codeword on
    every +100 ppm retry).  The signal band tops out at ~2.7 kHz against
    48 kHz (~18x oversampled), so the cubic's interpolation error sits far
    below the operating noise floors — same kernel tools/test_sro.py
    injects the skew with.  Host-side numpy: runs only on the rare
    failed-decode retry path, one frame at a time."""
    n = len(src)
    t = anchor + (np.arange(n_out, dtype=np.float64) - anchor) / (1.0 + eps)
    t = np.clip(t, 0.0, n - 1.000001)
    i = np.floor(t).astype(np.int64)
    f = t - i
    x = np.pad(src.astype(np.float64), (1, 3))
    xm1, x0, x1, x2 = x[i], x[i + 1], x[i + 2], x[i + 3]
    a = -0.5 * xm1 + 1.5 * x0 - 1.5 * x1 + 0.5 * x2
    b = xm1 - 2.5 * x0 + 2.0 * x1 - 0.5 * x2
    c = -0.5 * xm1 + 0.5 * x1
    return (((a * f + b) * f + c) * f + x0).astype(np.float32)


class CoxPath(AcquisitionPath):
    """State: wait (streaming wait-tick tracker), pending (found preamble
    whose frame is still arriving), deep_pending / deep_rejected (below-the-
    floor speculative candidates)."""

    # Failed-decode SRO retry fires when the pilot timing track's final
    # offset exceeds this (samples).  Above the fit noise at operating
    # SNRs, below the 512 plan's ~4-sample late-side window slack.
    SRO_RETRY_MIN_TOS = 1.5

    def reset(self):
        self.wait = None
        self.pending = None
        self.deep_pending = None
        self.deep_rejected = set()

    def try_once(self) -> Optional[int]:
        """One Schmidl-Cox acquisition+decode pass.  Returns the number of
        delivered events when decisively handled (decoded or failed), the
        string "wait" when a preamble was found but the frame has not fully
        arrived (the chirp path still runs, but must not trim the buffer),
        or None when no Cox activity was found."""
        from ...sync import schmidl_cox as SC
        buf = self.e._rx_buffer
        cfg = self.e.config
        plen = cfg.fft_size + cfg.cyclic_prefix
        if len(buf) < 10 * plen:
            return None
        from_pending = False
        if self.pending is not None:
            # A found preamble is streaming in: retry the decode directly,
            # no full-buffer re-search.
            lts_start = self.pending[0] - self.e._rx_consumed
            cfo = self.pending[1]
            if lts_start < 0:
                self.pending = None
                return None
            from_pending = True
        else:
            if self.deep_pending is not None:
                # A below-the-floor candidate awaits its CW0 span: retry on
                # EVERY poll (host length check until the span arrives) so a
                # stream ending between search cadences still completes it.
                abs_lts, dcfo = self.deep_pending[:2]
                rel = abs_lts - self.e._rx_consumed
                if rel < 0:
                    self.deep_pending = None
                else:
                    r = self._deep_candidate(rel, dcfo)
                    if r is not None:
                        return r
            if not self.e._search_due("cox"):
                return None
            det = {k: np.asarray(v)[0] for k, v in SC.detect_preamble(
                cfg, jnp.asarray(self.e._bucketed(
                    buf[:self.e.ACQ_VIEW_CAP])[None, :]),
                with_deep=self.e.deep_acquisition).items()}
            if not bool(det["found"]):
                self.wait = None
                if self.e.deep_acquisition and bool(det.get("deep_found",
                                                          False)):
                    return self._deep_candidate(
                        int(det["deep_lts_start"]),
                        float(det["deep_cfo_hz"]))
                return None
            lts_start = int(det["lts_start"])
            cfo = float(det["cfo_hz"])
        status, frame = self.decode(lts_start, cfo)
        if status == "fail" and from_pending:
            # The cached position came from a detection over a PARTIAL
            # preamble (plateau edge still forming) and can be mistimed by
            # >1000 samples; re-detect on the now-fuller buffer before
            # treating the frame as undecodable (caught by the full-length
            # HF-reality soak: two Cox frames failed at stale positions
            # and the fail-consume then ate their preambles).
            self.pending = None
            self.e._acq_searched.pop("cox", None)
            return self.try_once()
        if status == "fail":
            # LDPC-validated timing hunt (huntForCodeword,
            # ofdm_sync.cpp:572-643): a CONFIDENT preamble whose CW0 did not
            # parse may be mistimed (multipath smears the plateau edge);
            # trial-decode CW0 at +-150-sample offsets and accept the first
            # with the 0x554C magic.  CW0 rides R1/4 pre-negotiation and the
            # negotiated rate when connected (same candidates as the probe).
            hunt_rates = [CodeRate.R1_4]
            if self.e.connected and self.e.data_code_rate not in hunt_rates:
                hunt_rates.append(self.e.data_code_rate)
            # Same mode candidates as decode(): current/previous data mode
            # (a MODE_CHANGE may have crossed this frame in flight), plus
            # the DQPSK R1/4 link-establishment fallback when disconnected
            # (modem_engine.cpp:148-151).
            hunt_mods = [self.e.data_modulation]
            if (self.e.prev_data_modulation is not None
                    and self.e.prev_data_modulation not in hunt_mods):
                hunt_mods.append(self.e.prev_data_modulation)
            if not self.e.connected \
                    and Modulation.DQPSK not in hunt_mods:
                hunt_mods.append(Modulation.DQPSK)
            done = False
            for hm in hunt_mods:
                for hr in hunt_rates:
                    hunted, off = SC.hunt_for_codeword(
                        cfg, hm, buf, lts_start + 2 * plen, rate=hr,
                        cfo_hz=cfo, interleaved=self.e.interleaving_enabled)
                    # off == 0 means the hunt validated CW0 at the NOMINAL
                    # position the straight decode already failed at (its
                    # unity-channel trial equalization differs) — nothing
                    # to retry there, so only nonzero offsets re-decode.
                    if hunted and off:
                        status, frame = self.decode(
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
            self.pending = (self.e._rx_consumed + lts_start, cfo)
            r = self._wait_tick(lts_start, plen)
            if r != "wait":
                self.pending = None
            return r
        self.pending = None
        self.wait = None
        if status == "fail":
            planned = lts_start + 2 * plen
            guard = self.e.chirp.strong_pos(limit=planned)
            if 0 <= guard < planned:
                # A chirp is arriving inside the claimed span: consume only
                # up to it and fall through to the chirp path this pass.
                self.e._consume(guard)
                return None
            self.e._consume(planned)
            return 0
        return self.e._deliver(frame)

    def _max_symbols(self) -> int:
        cw_max = F.calculate_codewords(F.MAX_PAYLOAD_V2, CodeRate.R1_4)
        S = ofdm_pipeline.num_data_symbols(self.e.config, Modulation.DBPSK,
                                           cw_max)
        return S + 16  # margin for the preamble/LTS span

    def _wait_tick(self, lts_start: int, plen: int):
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
        from ...sync import schmidl_cox as SC
        abs_start = self.e._rx_consumed + lts_start
        abs_len = self.e._rx_consumed + len(self.e._rx_buffer)
        st = self.wait
        if st is None or st["abs_start"] != abs_start:
            self.wait = {"abs_start": abs_start, "abs_len": abs_len,
                              "idle": 0, "polls": 1}
            return "wait"
        st["polls"] += 1
        if abs_len == st["abs_len"]:
            st["idle"] += 1
        else:
            st["abs_len"], st["idle"] = abs_len, 0

        give_up = (st["idle"] >= self.e.COX_MAX_IDLE_POLLS
                   or abs_len - (abs_start + 2 * plen)
                   > self._max_symbols() * self.e.config.symbol_duration)
        if give_up:
            self.wait = None
            planned = lts_start + 2 * plen
            guard = self.e.chirp.strong_pos(limit=planned)
            if 0 <= guard < planned:
                # Mirror the fail path: consume up to the arriving chirp
                # and FALL THROUGH to the chirp path this pass.  Ending
                # the pass here (the old `return 0`) was a liveness bug:
                # once a previous give-up had consumed up to the chirp
                # head, guard == 0 made the consume a no-op, the chirp
                # was never attempted, and the give-up re-fired every
                # poll while the buffer grew without bound.
                self.e._consume(guard)
                return None
            self.e._consume(planned)
            return 0

        if st["polls"] >= 2:
            tail_off = lts_start + 2 * plen
            tail = self.e._rx_buffer[tail_off:]
            if len(tail) >= 10 * plen:
                det2 = {k: np.asarray(v)[0] for k, v in SC.detect_preamble(
                    self.e.config,
                    jnp.asarray(self.e._bucketed(tail)[None, :])).items()}
                if bool(det2["found"]):
                    self.wait = None
                    # Keep the WHOLE new preamble (its 5 STS symbols
                    # precede the LTS and re-detection needs the plateau).
                    keep_from = tail_off + max(0,
                                               int(det2["lts_start"]) - 6 * plen)
                    self.e._consume(keep_from)
                    return 0
        return "wait"

    def _deep_candidate(self, lts_start: int, cfo: float):
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
        from ...sync import schmidl_cox as SC
        cfg = self.e.config
        plen = cfg.fft_size + cfg.cyclic_prefix
        abs_lts = self.e._rx_consumed + lts_start
        self.deep_rejected = {
            p for p in self.deep_rejected if p >= self.e._rx_consumed}
        if abs_lts in self.deep_rejected:
            self.deep_pending = None
            return None
        status, frame = self.decode(lts_start, cfo)
        if status == "wait":
            # CW0 span not buffered yet: keep the candidate pending with an
            # idle timeout so a dead stream cannot pin it forever.
            abs_len = self.e._rx_consumed + len(self.e._rx_buffer)
            st = self.deep_pending
            idle = 0
            if st is not None and st[0] == abs_lts:
                idle = st[3] + 1 if abs_len == st[2] else 0
                if idle >= self.e.COX_MAX_IDLE_POLLS:
                    self.deep_pending = None
                    self.deep_rejected.add(abs_lts)
                    return None
            self.deep_pending = (abs_lts, cfo, abs_len, idle)
            return "wait"
        self.deep_pending = None
        if status == "fail":
            # Same LDPC-magic timing hunt as the normal fail path: a deep
            # candidate from a partially-formed plateau can be mistimed.
            hunt_rates = [CodeRate.R1_4]
            if self.e.connected and self.e.data_code_rate not in hunt_rates:
                hunt_rates.append(self.e.data_code_rate)
            hunt_mods = [self.e.data_modulation]
            if (self.e.prev_data_modulation is not None
                    and self.e.prev_data_modulation not in hunt_mods):
                hunt_mods.append(self.e.prev_data_modulation)
            # Disconnected: pre-negotiation TX always rides DQPSK R1/4
            # (modem_engine.cpp:148-151) — mirror try_once()'s hunt so a
            # mistimed deep candidate of a link-establishment frame at a
            # coherent-defaulted receiver is still hunted at DQPSK.
            if not self.e.connected \
                    and Modulation.DQPSK not in hunt_mods:
                hunt_mods.append(Modulation.DQPSK)
            done = False
            for hm in hunt_mods:
                for hr in hunt_rates:
                    hunted, off = SC.hunt_for_codeword(
                        cfg, hm, self.e._rx_buffer, lts_start + 2 * plen,
                        rate=hr, cfo_hz=cfo,
                        interleaved=self.e.interleaving_enabled)
                    if hunted and off:
                        status, frame = self.decode(
                            lts_start + off, cfo)
                        done = True
                        break
                if done:
                    break
            if status == "wait":
                # The hunt VALIDATED CW0 at the offset but the full frame is
                # still arriving: promote to the normal validated-pending
                # machinery (retried every poll, wait-tick resilience).
                self.pending = (abs_lts + off, cfo)
                return "wait"
        if status != "ok":
            self.deep_rejected.add(abs_lts)
            return None
        self.wait = None
        return self.e._deliver(frame)

    def decode(self, lts_start: int, cfo: float
                          ) -> tuple[str, Optional[DecodedFrame]]:
        """OFDM_COX decode: current data mode first, then the previous mode
        (a MODE_CHANGE may have crossed this frame in flight).

        Disconnected, the DQPSK R1/4 link-establishment mode is a final
        fallback: pre-negotiation TX always rides DQPSK R1/4 regardless
        of the config's data mode (engine.transmit; modem_engine.cpp:
        148-151 "if disconnected, use DQPSK R1/4 (robust mode), not
        config's mode") — a Cox connect handshake reaching a receiver
        whose config defaults to a coherent modulation is undecodable
        without it."""
        tried = [(self.e.data_modulation, self.e.data_code_rate)]
        pm, pr = self.e.prev_data_modulation, self.e.prev_data_code_rate
        if pm is not None and (pm, pr) not in tried:
            tried.append((pm, pr))
        if (not self.e.connected
                and (Modulation.DQPSK, CodeRate.R1_4) not in tried):
            tried.append((Modulation.DQPSK, CodeRate.R1_4))
        st, fr = "fail", None
        for m, r in tried:
            st, fr = self._decode_mod(lts_start, cfo, m, r)
            if st != "fail":
                break
        return st, fr

    def _decode_mod(self, lts_start: int, cfo: float,
                              mod: Modulation, data_rate: CodeRate
                              ) -> tuple[str, Optional[DecodedFrame]]:
        """OFDM_COX decode from a detected preamble: LTS channel estimate,
        pilot-tracked data symbols at the given modulation
        (modem_rx_decode.cpp:159-530 for the CW0-probe/total_cw flow;
        sync/schmidl_cox.decode_ofdm_cox for the mixer bookkeeping)."""
        from ...config import bits_per_symbol
        from ...ofdm import demodulator as demod_mod
        buf = self.e._rx_buffer
        cfg = self.e.config
        plen = cfg.fft_size + cfg.cyclic_prefix
        candidate_rates = [CodeRate.R1_4]
        if self.e.connected and data_rate not in candidate_rates:
            candidate_rates.append(data_rate)

        cm = carriers_mod.carrier_map(cfg)
        bps = len(cm.data_idx) * bits_per_symbol(mod)
        ci = channel_interleaver(bps, F.LDPC_CODEWORD_BITS) \
            if self.e.interleaving_enabled else None

        # Front-end eligibility for the REAL passband (see pick below):
        # coherent, pilot plan, small detected CFO — the physics gates.
        real_ok = (not demod_mod.is_differential(mod)
                   and len(carriers_mod.carrier_map(cfg).pilot_idx) > 0
                   and abs(float(cfo)) <= self.e.REAL_FRONT_CFO_MAX_HZ)

        def demod(n_cw: int, front: str, sro_eps: float = 0.0,
                  delayfit: bool = False):
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
            src0 = lts_start - lead
            T_span = need + tail - src0
            if sro_eps != 0.0:
                # Failed-decode clock-skew retry: unwind the measured
                # timing drift around the LTS anchor (see _resample_sro).
                # Source extends past the span by the resample's reach so
                # the final symbols never read a clamped edge; zero-pad
                # when the buffer genuinely ends (post-frame noise).
                extra = int(np.ceil(T_span * abs(sro_eps))) + 8
                src = buf[src0:min(len(buf), need + tail + extra)]
                if len(src) < T_span + extra:
                    src = np.pad(src, (0, T_span + extra - len(src)))
                src = _resample_sro(src, T_span, sro_eps,
                                    float(lead + plen))
            else:
                src = buf[src0:need + tail]
            span = jnp.asarray(src[None])
            if delayfit:
                # Delay-domain channel-model second pass (ofdm/delay_fit.py):
                # no DemodState comes back — the caller keeps the standard
                # attempt's state for the SNR bookkeeping.
                from ...ofdm import delay_fit as delay_fit_mod
                llrs = delay_fit_mod.demodulate_span_delayfit(
                    cfg, mod, span, cfo, 0.0, n_lts=2, S=S,
                    lead=lead, tail=tail, front=front,
                    n_bits=F.LDPC_CODEWORD_BITS * n_cw)
                state = None
            else:
                llrs, state = demod_mod.demodulate_span(
                    cfg, mod, span, cfo, 0.0, n_lts=2, S=S,
                    lead=lead, tail=tail, front=front,
                    n_bits=F.LDPC_CODEWORD_BITS * n_cw)
            if self.e.collect_constellation:
                ri = np.asarray(demod_mod.equalized_symbols_span(
                    cfg, mod, span, cfo, 0.0, n_lts=2, S=S,
                    lead=lead, tail=tail, front=front))
                self.e.last_constellation = \
                    (ri[..., 0] + 1j * ri[..., 1]).reshape(-1)
            out = np.asarray(llrs)[0][:F.LDPC_CODEWORD_BITS * n_cw]
            if ci is not None:
                out = np.concatenate([
                    ci.deinterleave_soft(out[i * 648:(i + 1) * 648])
                    for i in range(n_cw)])
            return out, state

        # Primary front pick (host branch on the detected CFO + mode): the
        # REAL passband is EXACT at small CFO (conjugate image
        # bin-orthogonal, like the reference's channel_equalizer.cpp:19-71
        # front) and wins where the analytic mask's DC-adjacent leakage
        # binds — hi-order decision distances (QAM64/256) and parity-free
        # rates (R3/4, R5/6, corrupted at ANY SNR).  For full-parity
        # <=32QAM the analytic front wins instead: the real front's image
        # ICI under a TRUE 1-1.5 Hz offset measurably loses QAM16 R2/3
        # frames at 25 dB, while the mask floor never binds those decision
        # distances (docs/PERF.md round-4 CFO-ramp section).  Neither
        # front dominates every corner (the real front is also the better
        # one under sample-clock timing drift), so a FAILED frame decode
        # retries once with the other front below.
        parity_free = data_rate in (CodeRate.R3_4, CodeRate.R5_6)
        hi_mod = mod in (Modulation.QAM64, Modulation.QAM256)
        front = "real" if real_ok and (hi_mod or parity_free) else "analytic"

        llrs0, st0 = demod(1, front)
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
        if info is None and real_ok:
            # Header probe failed on the primary front: one retry on the
            # other front before declaring the detection bad.
            alt = "analytic" if front == "real" else "real"
            llrs0a, st0a = demod(1, alt)
            if llrs0a is not None:
                for rate in candidate_rates:
                    ok, data = F.decode_codewords_with_ldpc(
                        [llrs0a[:648]], rate)
                    if ok[0]:
                        hdr = F.parse_header(
                            data[0].ljust(F.BYTES_PER_CODEWORD, b"\0"))
                        if hdr.valid:
                            info, rate0 = hdr, rate
                            front, llrs0, st0 = alt, llrs0a, st0a
                            self.e.stats.frames_front_retried += 1
                            break
        if info is None:
            return "fail", None
        # header.total_cw is sized at R1/4 (the ARQ's makeData default,
        # frame_v2.cpp:472) but TX splits at the ACTUAL rate
        # (encodeFrameWithLDPC, frame_v2.cpp:1079) — recompute from
        # payload_len at the probed rate.
        total_cw = max(1, info.total_cw) if info.is_control \
            else F.calculate_codewords(info.payload_len, rate0)

        if info.is_control:
            expected = F.CONTROL_SIZE
        else:
            expected = F.HEADER_SIZE + info.payload_len + F.CRC_SIZE
        bpc = F.bytes_per_codeword(rate0)

        def attempt(front_try, llrs_pre=None, st_pre=None, sro_eps=0.0,
                    delayfit=False):
            """Demod + LDPC + reassemble + CRC recovery at one front.
            Returns (oks, frame_bytes, state, good, recovered) or "wait"."""
            if (total_cw == 1 and llrs_pre is not None and sro_eps == 0.0
                    and not delayfit):
                llrs_, st_ = llrs_pre, st_pre
            else:
                llrs_, st_ = demod(total_cw, front_try, sro_eps, delayfit)
                if llrs_ is None:
                    return "wait"
            blocks = [llrs_[i * 648:(i + 1) * 648] for i in range(total_cw)]
            oks_, datas_ = F.decode_codewords_with_ldpc(blocks, rate0)
            frame_ = F.reassemble_codewords(
                [d if o else b"\0" * bpc for o, d in zip(oks_, datas_)],
                expected)
            recovered = False
            # CRC-aided parity-free bit recovery (fec/crc_recover.py): at
            # R3/4 and R5/6 the H construction leaves info bits with zero
            # checks, so every codeword can converge (cw_ok) while the
            # frame CRC fails on a few low-|LLR| raw demapper decisions.
            # Syndrome-search those positions before giving the frame up.
            if (all(oks_) and not info.is_control
                    and rate0 in (CodeRate.R3_4, CodeRate.R5_6)
                    and len(frame_) == expected):
                from ...fec import crc_recover
                fixed = crc_recover.recover_frame(
                    frame_, blocks, rate0, expected)
                if fixed is not None:
                    frame_, recovered = fixed, True
            good = bool(all(oks_)) and len(frame_) == expected
            if good and not info.is_control:
                # Full validity for data frames = trailing CRC16 too: a
                # cw_ok frame with a bad CRC still costs an ARQ round.
                good = F.DataFrame.deserialize(frame_) is not None
            return oks_, frame_, st_, good, recovered

        res = attempt(front, llrs0, st0)
        if res == "wait":
            return "wait", None
        # Neither front dominates the marginal corners (real wins under
        # timing drift, analytic under a true 1-2 Hz CFO — both measured,
        # docs/PERF.md round-4): a BAD frame gets one retry on the other
        # front before falling through to ARQ.
        if not res[3] and real_ok:
            alt = "analytic" if front == "real" else "real"
            res2 = attempt(alt)
            if res2 != "wait" and res2[3]:
                res = res2
                self.e.stats.frames_front_retried += 1
        # Sample-clock-skew retry (round 5, tools/test_sro.py +100 ppm
        # edge): the 512 plan's analysis window has only ~guard (4)
        # samples of LATE-side ISI-free slack, so ~5+ samples of
        # accumulated TX/RX clock drift by frame end corrupt the tail
        # codewords at ANY SNR.  The pilot timing track measures exactly
        # that drift (update_channel_estimate's LS slope fit, EMA
        # alpha=0.3): on a failed decode whose final |timing offset| is
        # past the slack, estimate the skew from drift/elapsed (corrected
        # for the EMA's (1-a)/a-symbol lag), fractionally resample the
        # span around the LTS anchor, and re-demodulate.  Up to two
        # corrections (the second refines from the first's residual).
        # No reference counterpart (it has no SRO handling anywhere).
        if not res[3] and res != "wait" and res[2] is not None:
            from ...ofdm.demodulator import TIMING_ALPHA
            S_d = ofdm_pipeline.num_data_symbols(cfg, mod, total_cw)
            L = cfg.symbol_duration
            ema_lag = (1.0 - TIMING_ALPHA) / TIMING_ALPHA
            # Drift reference = LTS mid; last tos measurement ~the final
            # symbol, lagged by the EMA.
            elapsed = plen + (S_d - 0.5 - ema_lag) * L
            eps_acc, st_try = 0.0, res[2]
            import os as _os
            _dbg = _os.environ.get("ULTRA_SRO_DEBUG") == "1"
            if elapsed > 4 * L:
                for _ in range(2):
                    tos = float(np.asarray(st_try.timing_offset_samples)[0])
                    if _dbg:
                        print(f"[sro] fail tos={tos:+.2f} elapsed={elapsed:.0f}"
                              f" eps_acc={eps_acc * 1e6:+.1f}ppm front={front}"
                              f" oks={res[0] if res != 'wait' else '?'}")
                    if abs(tos) < self.SRO_RETRY_MIN_TOS:
                        break
                    eps_acc += tos / elapsed
                    res3 = attempt(front, sro_eps=eps_acc)
                    if res3 == "wait":
                        break
                    if _dbg:
                        print(f"[sro] retry eps={eps_acc * 1e6:+.1f}ppm good="
                              f"{res3[3]} oks={res3[0]}")
                    if res3[3]:
                        res = res3
                        self.e.stats.frames_sro_retried += 1
                        break
                    st_try = res3[2]
        # Delay-domain channel-model retry (round 5, ofdm/delay_fit.py):
        # coherent pilot plans under a frequency-selective fade fail on
        # the LINEAR pilot interpolation — the true channel is 2-3
        # discrete paths, and the notch shape between pilots is not
        # linear.  Re-estimate as K delay taps (matching pursuit) and
        # re-demodulate with model-exact interpolation.  Accepted when
        # fully good OR when it decodes strictly more codewords (the ARQ
        # NACK bitmap then retransmits fewer).  Measured: Good-channel
        # QAM16 R2/3 codeword decode 66% -> 82% (docs/PERF.md round 5).
        if (res != "wait" and not res[3]
                and not demod_mod.is_differential(mod)
                and len(carriers_mod.carrier_map(cfg).pilot_idx) > 0):
            dfront = "real" if real_ok else "analytic"
            res6 = attempt(dfront, delayfit=True)
            if res6 != "wait" and (res6[3]
                                   or sum(res6[0]) > sum(res[0])):
                # delay_fit returns no DemodState: keep the standard
                # attempt's state for the SNR/stats bookkeeping.
                res = (res6[0], res6[1], res[2], res6[3], res6[4])
                self.e.stats.frames_delayfit_retried += 1
        oks, frame_bytes, st, _, recovered = res
        if recovered:
            self.e.stats.frames_crc_recovered += 1

        S = ofdm_pipeline.num_data_symbols(cfg, mod, total_cw)
        self.e._consume(lts_start + 2 * plen + S * cfg.symbol_duration)

        self.e.stats.frames_received += 1
        self.e.stats.bytes_received += len(frame_bytes)
        if not all(oks):
            self.e.stats.frames_failed += 1
        # Per-carrier SNR from the pilot-tracked channel estimate
        # (channel_equalizer.cpp:591, getEstimatedSNR semantics).
        snr_db = float(10.0 * np.log10(
            np.asarray(st.estimated_snr_linear)[0]))
        self.e.stats.current_snr_db = snr_db
        # Frame audio begins at the 5-STS preamble ahead of the LTS.
        wb = self.e._wideband_snr_db(
            buf, lts_start - 5 * plen,
            lts_start + 2 * plen + S * cfg.symbol_duration)
        self.e.stats.wideband_snr_db = wb
        return "ok", DecodedFrame(frame_bytes=frame_bytes, header=info,
                                  cw_ok=oks, cfo_hz=cfo, snr_db=snr_db,
                                  wideband_snr_db=wb,
                                  fade_spread_db=self.e.stats.fade_spread_db,
                                  waveform=WaveformMode.OFDM_COX)

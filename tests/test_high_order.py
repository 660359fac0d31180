"""Beyond-reference high-order OFDM_COX data modes on the engine profile.

The 512-FFT carrier plan's DC-adjacent carriers carry a deterministic,
payload-dependent ICI floor (~-25 dB EVM on the worst 3 of 15 carriers —
see ofdm/demodulator._scan_data_symbols' high-order noise pass), so the
rates whose reference H construction leaves info bits parity-free (R3/4,
R5/6 — fec/ldpc.build_h_rows saturates the check-edge slots early) can
corrupt at ANY SNR and are excluded from the negotiation ladder
(modem/adaptive.CalibratedAdaptiveController.HIGH_TABLE).  The fully
protected R2/3 rows below are the ladder and must decode reliably with
random payloads; envelopes measured by tools/calibrate_mode_table.py
(QAM64 R2/3 clean from 22 dB AWGN, QAM256 R2/3 from 28 dB).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from projectultra_tpu.config import Modulation, CodeRate
from projectultra_tpu.modem.engine import ModemEngine
from projectultra_tpu.protocol import frame_v2 as F
from projectultra_tpu.protocol.frame_v2 import WaveformMode
from projectultra_tpu.sim import watterson as W


def _loopback(mod: Modulation, rate: CodeRate, snr_db: float,
              trial: int, config=None) -> bool:
    rng = np.random.default_rng(4200 + trial)
    payload = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
    tx = ModemEngine() if config is None else ModemEngine(config=config)
    rx = ModemEngine() if config is None else ModemEngine(config=config)
    for m in (tx, rx):
        m.set_waveform_mode(WaveformMode.OFDM_COX)
        m.connect_waveform = WaveformMode.OFDM_COX
        m.connected = True
        m.handshake_complete = True
        m.data_modulation = mod
        m.data_code_rate = rate
    frame = F.DataFrame.make_data("AA1AA", "BB2BB", trial, payload).serialize()
    audio = tx.transmit(frame)
    a = jnp.asarray(np.concatenate(
        [np.zeros(2400, np.float32), audio,
         np.zeros(4000, np.float32)])[None, :])
    key = jax.random.fold_in(jax.random.PRNGKey(97), 131 * trial)
    noisy = W.add_noise_active(key, a, snr_db)
    got = []
    rx.on_frame = got.append
    rx.feed_audio(np.asarray(noisy)[0])
    rx.poll()
    return bool(got) and got[0].frame_bytes == frame


@pytest.mark.parametrize("mod,rate,snr", [
    (Modulation.QAM64, CodeRate.R2_3, 24.0),
    (Modulation.QAM256, CodeRate.R2_3, 30.0),
])
def test_high_order_r23_random_payload(mod, rate, snr):
    """Full streaming acquisition + decode at the HIGH_TABLE thresholds,
    random payloads (the ICI floor is payload-dependent — fixed payloads
    hide it)."""
    oks = [_loopback(mod, rate, snr, t) for t in range(3)]
    assert all(oks), oks


def test_qam256_r23_zero_noise_exact():
    """The deterministic ICI floor alone (no noise) must never corrupt a
    fully-protected R2/3 frame."""
    assert _loopback(Modulation.QAM256, CodeRate.R2_3, 80.0, 7)


@pytest.mark.parametrize("mod,rate,snr", [
    (Modulation.QAM64, CodeRate.R5_6, 20.0),
    (Modulation.QAM256, CodeRate.R2_3, 24.0),
])
def test_nvis_high_order_ladder_thresholds(mod, rate, snr):
    """NVIS 1024-profile ladder rows at their NVIS_HIGH_TABLE thresholds,
    random payloads through the full streaming engine (40/40 measured at
    these points; R5/6's parity-free info bits are safe on this profile's
    ~-32 dB EVM floor at QAM64 density — QAM256 R5/6 keeps a ~5%
    ARQ-recovered residual and is asserted by the session test instead)."""
    from projectultra_tpu.config import nvis_mode
    oks = [_loopback(mod, rate, snr, t, config=nvis_mode())
           for t in range(3)]
    assert all(oks), oks


def test_nvis_profile_selects_nvis_high_table():
    """high_order_table routes the 1024-FFT no-pilot profile to the NVIS
    ladder (top row QAM256 R5/6) and every pilot profile to the
    conservative 512 ladder."""
    from projectultra_tpu.config import nvis_mode, high_throughput, ModemConfig
    from projectultra_tpu.modem.adaptive import (
        CalibratedAdaptiveController, high_order_table)
    assert high_order_table(nvis_mode()) \
        is CalibratedAdaptiveController.NVIS_HIGH_TABLE
    assert high_order_table(ModemConfig()) \
        is CalibratedAdaptiveController.HIGH_TABLE
    # 1024 WITH pilots is unmeasured -> conservative ladder.
    assert high_order_table(high_throughput()) \
        is CalibratedAdaptiveController.HIGH_TABLE

    c = CalibratedAdaptiveController(
        high_table=CalibratedAdaptiveController.NVIS_HIGH_TABLE)
    for _ in range(20):
        c.update(34.0, 0.2)
    assert (c.current_mod, c.current_rate) == \
        (Modulation.QAM256, CodeRate.R5_6)
    c = CalibratedAdaptiveController(
        high_table=CalibratedAdaptiveController.NVIS_HIGH_TABLE)
    for _ in range(20):
        c.update(22.0, 0.2)
    assert (c.current_mod, c.current_rate) == \
        (Modulation.QAM64, CodeRate.R5_6)


def test_wideband_snr_survives_guarded_consume():
    """Estimator regression: on the NVIS profile the 1024 Cox search
    false-positives on the frame's own chirp preamble, fails decode, and
    the guarded fail-consume (engine._try_cox_once) lands the buffer
    start samples ahead of the chirp — the noise window before the frame
    is starved and the estimator must pool the audio AFTER the frame
    instead of falling back to the (mostly signal) whole snapshot, which
    read 34 dB frames at ~6 dB and parked negotiation on MC_DPSK."""
    from projectultra_tpu.config import nvis_mode
    from projectultra_tpu.sim import watterson as W

    tx, rx = ModemEngine(config=nvis_mode()), ModemEngine(config=nvis_mode())
    fr = F.DataFrame.make_data("AA1AA", "BB2BB", 1,
                               b"hello world " * 4).serialize()
    audio = tx.transmit(fr)
    a = jnp.asarray(np.concatenate(
        [np.zeros(2000, np.float32), audio,
         np.zeros(4000, np.float32)])[None, :])
    noisy = W.add_noise_active(jax.random.PRNGKey(5), a, 34.0)
    got = []
    rx.on_frame = got.append
    rx.feed_audio(np.asarray(noisy)[0])
    rx.poll()
    assert got and got[0].frame_bytes == fr
    assert got[0].wideband_snr_db > 30.0, got[0].wideband_snr_db


def test_nvis_session_negotiates_qam256_r56():
    """Full two-station over-the-air session on the NVIS profile at 34 dB
    flat AWGN: calibrated negotiation must pick OFDM_COX at connect and
    the flat-gated NVIS ladder must climb the data mode to QAM256 R5/6
    (12.7 kbps over-the-air class) with every message delivered — the
    beyond-reference throughput path end to end."""
    from projectultra_tpu.config import nvis_mode
    from projectultra_tpu.protocol.engine import ProtocolEngine
    from projectultra_tpu.protocol.frame_v2 import WaveformMode as WM
    from projectultra_tpu.sim import watterson as W

    true_snr = 34.0
    key = jax.random.PRNGKey(42)
    counter = [0]

    def channel(audio):
        counter[0] += 1
        a = jnp.asarray(np.concatenate(
            [np.zeros(2000, np.float32), audio,
             np.zeros(4000, np.float32)])[None, :])
        k = jax.random.fold_in(key, counter[0])
        return np.asarray(W.add_noise_active(k, a, true_snr))[0]

    a = ProtocolEngine(ModemEngine(config=nvis_mode()))
    b = ProtocolEngine(ModemEngine(config=nvis_mode()))
    for e in (a, b):
        e.connection.config.calibrated_snr = True
    a.connection.set_local_callsign("W1AW")
    b.connection.set_local_callsign("VE3ABC")
    b.connection.set_measured_snr(true_snr)
    a.on_tx_audio = lambda audio: b.feed_audio(channel(audio))
    b.on_tx_audio = lambda audio: a.feed_audio(channel(audio))
    got_a, got_b = [], []
    a.connection.on_message_received = got_a.append
    b.connection.on_message_received = got_b.append

    assert a.connect("VE3ABC")
    assert b.connection.negotiated_mode == WM.OFDM_COX

    n = 10
    ia = ib = 0
    for _ in range(300):
        if ia < n and a.send_message(f"a{ia:02d}"):
            ia += 1
        if ib < n and b.send_message(f"b{ib:02d}"):
            ib += 1
        a.tick(5000)
        b.tick(5000)
        if (ia >= n and ib >= n
                and len(got_a) >= n and len(got_b) >= n):
            break
    assert got_b == [f"a{i:02d}" for i in range(n)]
    assert got_a == [f"b{i:02d}" for i in range(n)]
    assert (a.modem.data_modulation, a.modem.data_code_rate) == \
        (Modulation.QAM256, CodeRate.R5_6)
    assert a.modem.waveform_mode == WM.OFDM_COX

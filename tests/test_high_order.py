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
              trial: int) -> bool:
    rng = np.random.default_rng(4200 + trial)
    payload = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
    tx, rx = ModemEngine(), ModemEngine()
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

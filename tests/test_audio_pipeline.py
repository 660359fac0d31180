"""AudioEngine (loopback/file backends) + RxPipeline streaming tests.

Reference: src/gui/audio_engine.cpp (loopback sim), rx_pipeline.cpp (the
reference's is known-buggy per docs/KNOWN_BUGS.md BUG-002; ours works).
"""

import numpy as np
import jax
import jax.numpy as jnp

from projectultra_tpu.modem.audio import AudioEngine, LoopbackBackend, FileBackend
from projectultra_tpu.modem.engine import ModemEngine
from projectultra_tpu.modem.rx_pipeline import RxPipeline
from projectultra_tpu.protocol import frame_v2 as F
from projectultra_tpu.sim import watterson as W


def test_audio_loopback_with_channel():
    def channel(audio):
        a = jnp.asarray(np.concatenate(
            [audio, np.zeros(4000, np.float32)])[None, :])
        a = W.add_noise_active(jax.random.PRNGKey(0), a, 12.0)
        return np.asarray(a)[0]

    engine = AudioEngine(LoopbackBackend(channel))
    modem = ModemEngine()
    frames = []
    modem.on_frame = frames.append
    engine.set_rx_callback(modem.feed_audio)

    tx_modem = ModemEngine()
    frame = F.DataFrame.make_data("W1AW", "VE3ABC", 5, "audio engine path")
    engine.play(tx_modem.transmit(frame.serialize()))
    engine.pump()
    modem.poll()
    assert len(frames) == 1
    df = F.DataFrame.deserialize(frames[0].frame_bytes)
    assert df and df.payload_as_text() == "audio engine path"


def test_file_backend_roundtrip(tmp_path):
    path = str(tmp_path / "capture.f32")
    engine = AudioEngine(FileBackend(tx_path=path))
    audio = np.sin(np.linspace(0, 100, 48000)).astype(np.float32)
    engine.play(audio)
    engine.pump()
    got = np.fromfile(path, dtype=np.float32)
    np.testing.assert_array_equal(got, audio)

    rx_engine = AudioEngine(FileBackend(rx_path=path))
    received = []
    rx_engine.set_rx_callback(received.append)
    rx_engine.backend.replay()
    np.testing.assert_array_equal(np.concatenate(received), audio)


def test_rx_pipeline_persistent_engine_mixed_traffic():
    """One persistent engine across feeds (no per-chunk construction), with
    mixed PING + frame traffic in a single stream and a non-default code
    rate that must round-trip into the decode path."""
    from projectultra_tpu.config import CodeRate

    tx_modem = ModemEngine()
    tx_modem.connected = True
    tx_modem.handshake_complete = True
    tx_modem.set_waveform_mode(F.WaveformMode.MC_DPSK)
    tx_modem.data_code_rate = CodeRate.R1_2
    frame = F.DataFrame.make_data("W1AW", "VE3ABC", 2, "after ping")
    audio = np.concatenate([
        tx_modem.transmit_ping(), np.zeros(2000, np.float32),
        tx_modem.transmit(frame.serialize()), np.zeros(4000, np.float32)])

    pipe = RxPipeline(rate=CodeRate.R1_2)
    eng0 = pipe._engine
    for i in range(0, len(audio), 4800):
        pipe.feed_audio(audio[i:i + 4800])
    assert pipe._engine is eng0          # persistent, not per-chunk
    assert pipe._engine.data_code_rate == CodeRate.R1_2  # config round-trips
    assert pipe.has_frame()
    df = F.DataFrame.deserialize(pipe.get_frame())
    assert df and df.payload_as_text() == "after ping"


def test_rx_pipeline_streaming():
    tx_modem = ModemEngine()
    frame = F.DataFrame.make_data("W1AW", "VE3ABC", 9, "pipeline frame")
    audio = np.concatenate([tx_modem.transmit(frame.serialize()),
                            np.zeros(4000, np.float32)])
    pipe = RxPipeline()
    ready = False
    for i in range(0, len(audio), 4800):
        ready = pipe.feed_audio(audio[i:i + 4800]) or ready
    assert pipe.has_frame()
    df = F.DataFrame.deserialize(pipe.get_frame())
    assert df and df.payload_as_text() == "pipeline frame"

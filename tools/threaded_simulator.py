#!/usr/bin/env python
"""Threaded two-station protocol simulator.

Reference: tools/threaded_simulator.cpp — two full stations with the audio
path and decoding on separate threads, exercising the same concurrency the
GUI runs (audio callback thread vs decode threads).  Here:

  * each station = ProtocolEngine + AudioEngine over the native lock-free
    SPSC ring;
  * one "air" thread pumps both audio engines (A's speaker -> channel ->
    B's mic and vice versa, in 1024-sample buffers);
  * one decode thread per station drives its modem's poll cadence;
  * the main thread drives connect / message / disconnect with timeouts.

Device-thread marshalling: the axon transport only services device->host
readbacks on the MAIN thread (worker-thread downloads hang; measured —
even a scalar readback).  The tool therefore runs a main-thread device
executor: worker threads keep their own cadence and the RX-buffer locking
is still exercised across threads (feed_audio on the air thread vs consume
on the device thread), but each jax-touching closure (channel simulation,
modem poll) executes on main.  With --direct-threads (the default on CPU
or a locally-attached chip) polls run directly on the decode threads — the
reference's exact structure.

Usage: python tools/threaded_simulator.py [--cpu] [--snr DB]
           [--direct-threads | --marshal]
"""

import argparse
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class MainThreadExecutor:
    """Run closures submitted by worker threads on the main thread."""

    def __init__(self):
        self._q = queue.Queue()

    def run(self, fn):
        ev = threading.Event()
        box = {}
        self._q.put((fn, ev, box))
        ev.wait()
        if "err" in box:
            raise box["err"]
        return box.get("val")

    def pump_once(self, timeout=0.05) -> bool:
        try:
            fn, ev, box = self._q.get(timeout=timeout)
        except queue.Empty:
            return False
        try:
            box["val"] = fn()
        except Exception as e:  # propagate to the submitting thread
            box["err"] = e
        ev.set()
        return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--snr", type=float, default=15.0)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--direct-threads", action="store_true",
                    help="jax calls run directly on worker threads "
                         "(default on CPU)")
    ap.add_argument("--marshal", action="store_true",
                    help="force main-thread device marshalling")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_projectultra")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    # Initialize the backend from the MAIN thread before any worker issues
    # a dispatch (the chirp PING TX is pure numpy, so without this the air
    # thread's channel() would be the process's first jax op).
    jax.block_until_ready(jnp.zeros(8))
    marshal = args.marshal or (not args.direct_threads and not args.cpu)
    ex = MainThreadExecutor() if marshal else None

    from projectultra_tpu.modem.audio import AudioEngine, LoopbackBackend
    from projectultra_tpu.protocol.engine import ProtocolEngine
    from projectultra_tpu.sim import watterson as W

    def channel_device(audio: np.ndarray) -> np.ndarray:
        a = jnp.asarray(np.concatenate(
            [np.zeros(2000, np.float32), audio,
             np.zeros(4000, np.float32)])[None, :])
        a = W.add_noise_active(jax.random.PRNGKey(len(audio) & 0xFFFF), a,
                               args.snr)
        return np.asarray(a)[0]

    def channel(audio: np.ndarray) -> np.ndarray:
        if ex is not None:
            return ex.run(lambda: channel_device(audio))
        return channel_device(audio)

    a, b = ProtocolEngine(), ProtocolEngine()
    a.connection.set_local_callsign("W1AW")
    b.connection.set_local_callsign("VE3ABC")
    b.connection.set_measured_snr(args.snr)

    # A's speaker is B's mic and vice versa.
    a_air = AudioEngine(LoopbackBackend(channel=channel))
    b_air = AudioEngine(LoopbackBackend(channel=channel))
    a.on_tx_audio = a_air.play
    b.on_tx_audio = b_air.play
    a_air.set_rx_callback(lambda chunk: b.modem.feed_audio(chunk))
    b_air.set_rx_callback(lambda chunk: a.modem.feed_audio(chunk))

    stop = threading.Event()
    got_b, got_a = [], []
    b.connection.on_message_received = got_b.append
    a.connection.on_message_received = got_a.append

    def air_loop():
        while not stop.is_set():
            a_air.pump()
            b_air.pump()
            time.sleep(0.005)

    def decode_loop(engine):
        while not stop.is_set():
            if ex is not None:
                ex.run(engine.modem.poll)
                ex.run(lambda: engine.tick(20))
            else:
                engine.modem.poll()
                engine.tick(20)
            time.sleep(0.02)

    threads = [threading.Thread(target=air_loop, daemon=True),
               threading.Thread(target=decode_loop, args=(a,), daemon=True),
               threading.Thread(target=decode_loop, args=(b,), daemon=True)]
    for t in threads:
        t.start()

    def wait_for(cond, what, timeout):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if ex is not None:
                ex.pump_once()
            else:
                time.sleep(0.05)
            if cond():
                print(f"  [ok] {what} ({time.time() - t0:.1f}s)")
                return True
        print(f"  [TIMEOUT] {what}")
        return False

    ok = True
    print(f"threaded two-station simulator — SNR {args.snr:.0f} dB"
          f"{' (main-thread device marshalling)' if marshal else ''}")
    print("[1] A connects to B")
    a.connect("VE3ABC")
    ok &= wait_for(lambda: a.connection.is_connected
                   and b.connection.is_connected, "connected",
                   args.timeout / 2)
    if ok:
        print("[2] messages both ways")
        a.send_message("hello from A")
        ok &= wait_for(lambda: "hello from A" in got_b, "A->B message",
                       args.timeout / 4)
        b.send_message("hello from B")
        ok &= wait_for(lambda: "hello from B" in got_a, "B->A message",
                       args.timeout / 4)
    if ok:
        print("[3] disconnect")
        a.disconnect()
        ok &= wait_for(lambda: not b.connection.is_connected, "B saw disconnect",
                       args.timeout / 4)
    stop.set()
    if ex is not None:  # release any worker blocked on a queued closure
        for _ in range(8):
            ex.pump_once(timeout=0.01)
    for t in threads:
        t.join(timeout=5)
    print(f"RESULT: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

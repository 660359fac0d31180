"""AudioEngine: duplex audio abstraction with loopback simulation.

Reference: src/gui/audio_engine.{hpp,cpp} + docs/AUDIO_SYSTEM.md — SDL2
duplex at 48 kHz mono f32 with 1024-sample buffers, a FIFO TX queue, an RX
callback, and a built-in loopback simulator with SNR.  This container has no
sound card, so the backends are:

  * LoopbackBackend — the reference's `-sim` mode: TX audio is passed through
    an optional channel function and delivered to the RX callback;
  * FileBackend — replay/capture f32 files (the `prx recording.f32` path).

The TX queue rides the native lock-free ring buffer (native/ultra_native.cpp)
— the same structure the reference guards with a mutex.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np

from .. import native

SAMPLE_RATE = 48000
BUFFER_SAMPLES = 1024


class AudioEngine:
    def __init__(self, backend: "LoopbackBackend | FileBackend | None" = None):
        self.backend = backend or LoopbackBackend()
        self.rx_callback: Optional[Callable[[np.ndarray], None]] = None
        self._tx_ring = native.RingBuffer(1 << 22)
        self.backend._engine = self

    def set_rx_callback(self, cb: Callable[[np.ndarray], None]):
        self.rx_callback = cb

    def play(self, samples: np.ndarray):
        """Queue TX audio (AudioEngine::play)."""
        samples = np.asarray(samples, np.float32)
        written = self._tx_ring.write(samples)
        if written < len(samples):  # queue full: drop oldest semantics
            self._tx_ring.skip(len(samples) - written)
            self._tx_ring.write(samples[written:])
        self.backend.on_tx_queued()

    def tx_pending(self) -> int:
        return self._tx_ring.available()

    def pump(self, max_chunks: int = 1 << 16):
        """Drive the duplex loop synchronously (replaces the SDL callback
        thread): drains the TX queue through the backend in 1024-sample
        chunks, which delivers RX audio via rx_callback."""
        for _ in range(max_chunks):
            chunk = self._tx_ring.read(BUFFER_SAMPLES)
            if not len(chunk):
                break
            self.backend.transmit_chunk(chunk)
        self.backend.flush()


class LoopbackBackend:
    """TX -> (channel fn) -> RX, the GUI's `-sim` loopback with SNR."""

    def __init__(self, channel: Optional[Callable[[np.ndarray], np.ndarray]] = None):
        self.channel = channel
        self._engine: AudioEngine | None = None
        self._pending: list[np.ndarray] = []

    def on_tx_queued(self):
        pass

    def transmit_chunk(self, chunk: np.ndarray):
        self._pending.append(chunk)

    def flush(self):
        if not self._pending:
            return
        audio = np.concatenate(self._pending)
        self._pending = []
        if self.channel is not None:
            audio = self.channel(audio)
        if self._engine and self._engine.rx_callback:
            # Deliver in 1024-sample buffers like the SDL input callback.
            for i in range(0, len(audio), BUFFER_SAMPLES):
                self._engine.rx_callback(audio[i:i + BUFFER_SAMPLES])


class FileBackend:
    """Write TX audio to an f32 file and/or replay an f32 file into RX."""

    def __init__(self, tx_path: str | None = None, rx_path: str | None = None):
        self.tx_path = tx_path
        self.rx_path = rx_path
        self._engine: AudioEngine | None = None
        self._tx_file = open(tx_path, "ab") if tx_path else None

    def on_tx_queued(self):
        pass

    def transmit_chunk(self, chunk: np.ndarray):
        if self._tx_file:
            self._tx_file.write(chunk.astype(np.float32).tobytes())

    def flush(self):
        if self._tx_file:
            self._tx_file.flush()

    def replay(self):
        """Feed the RX file through the callback in 1024-sample buffers."""
        if not (self.rx_path and self._engine and self._engine.rx_callback):
            return
        audio = np.fromfile(self.rx_path, dtype=np.float32)
        for i in range(0, len(audio), BUFFER_SAMPLES):
            self._engine.rx_callback(audio[i:i + BUFFER_SAMPLES])

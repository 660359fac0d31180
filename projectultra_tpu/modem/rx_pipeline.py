"""RxPipeline: streaming detect -> demodulate -> decode over one waveform.

Reference: src/gui/modem/rx_pipeline.{hpp,cpp}.  The reference implementation
is documented as known-buggy (docs/KNOWN_BUGS.md BUG-002) and production uses
the ModemEngine legacy paths; this is a WORKING equivalent built on the
waveform adapters: feed audio chunks, poll for complete frames.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import CodeRate
from ..protocol import frame_v2 as F
from ..protocol.frame_v2 import WaveformMode
from ..waveform import factory as WF


class RxPipeline:
    def __init__(self, mode: WaveformMode = WaveformMode.MC_DPSK,
                 rate: CodeRate = CodeRate.R1_4, **kw):
        self.waveform = WF.create(mode, **kw)
        self.rate = rate
        self._buf = np.zeros(0, np.float32)
        self._consumed = 0
        self._frames: list[bytes] = []

    def feed_audio(self, samples: np.ndarray) -> bool:
        """Append audio; returns True when at least one frame is ready."""
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, np.float32)])
        self._try_decode()
        return self.has_frame()

    def has_frame(self) -> bool:
        return bool(self._frames)

    def get_frame(self) -> Optional[bytes]:
        return self._frames.pop(0) if self._frames else None

    def reset(self):
        self._buf = np.zeros(0, np.float32)
        self._frames.clear()

    # -- internals ---------------------------------------------------------

    def _try_decode(self):
        from ..modem.engine import ModemEngine
        # Reuse the engine's acquisition+decode machinery on our buffer.
        eng = ModemEngine()
        eng.set_waveform_mode(self.waveform.mode)
        eng._rx_buffer = self._buf
        eng._rx_consumed = self._consumed
        frames = []
        eng.on_frame = frames.append
        eng.on_ping = lambda snr: None
        eng.poll()
        for fr in frames:
            self._frames.append(fr.frame_bytes)
        self._buf = eng._rx_buffer
        self._consumed = eng._rx_consumed

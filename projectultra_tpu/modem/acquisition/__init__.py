"""Per-waveform acquisition/decode paths behind a shared engine contract
(see base.py)."""

from .base import AcquisitionPath
from .chirp import ChirpPath
from .cox import CoxPath
from .dpsk import DpskPath
from .otfs import OtfsPath

__all__ = ["AcquisitionPath", "ChirpPath", "CoxPath", "DpskPath", "OtfsPath"]

"""Host-side protocol stack: frames, ARQ, connection, files, compression."""

from . import frame_v2
from .arq import ARQConfig, ARQMode, StopAndWaitARQ, SelectiveRepeatARQ, create_arq
from .connection import Connection, ConnectionConfig, ConnectionState
from .file_transfer import FileTransferController
from . import compression

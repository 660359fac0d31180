"""ULTRA v2 frame protocol: byte-for-byte compatible host-side codec.

Reference: src/protocol/frame_v2.{hpp,cpp} and docs/PROTOCOL_V2.md.

Frame wire formats (all multi-byte fields big-endian):

Control (20 B, 1 codeword @R1/4):
  [MAGIC 2][TYPE 1][FLAGS 1][SEQ 2][SRC_HASH 3][DST_HASH 3][PAYLOAD 6][CRC16 2]
Data (17 B header + payload + 2 B frame CRC):
  [MAGIC 2][TYPE 1][FLAGS 1][SEQ 2][SRC 3][DST 3][TOTAL_CW 1][LEN 2][HCRC 2]
  [PAYLOAD][FCRC 2]
Connect (44 B = data-frame format, 25 B payload with full callsigns).

Codeword layout: CW0 = first bytes_per_cw bytes (0x554C magic identifies it);
CW1+ = [0xD5][index][payload] — every codeword self-identifying.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from ..config import CodeRate, Modulation

MAGIC_V2 = 0x554C
DATA_CW_MARKER = 0xD5
BYTES_PER_CODEWORD = 20          # R1/4 layout
MAX_CODEWORDS = 255
HEADER_CW_PAYLOAD_SIZE = 3
DATA_CW_HEADER_SIZE = 2
DATA_CW_PAYLOAD_SIZE = 18
MAX_PAYLOAD_V2 = 4096
HEADER_SIZE = 17                 # DataFrame header
CRC_SIZE = 2
CONTROL_SIZE = 20
CONTROL_PAYLOAD_SIZE = 6
CALLSIGN_LEN = 8
MAX_CALLSIGN_LEN = 10            # ConnectFrame fields (9 chars + NUL)
CONNECT_PAYLOAD_SIZE = 25
LDPC_CODEWORD_BITS = 648
LDPC_CODEWORD_BYTES = 81
PING_MAGIC = bytes([0x55, 0x4C, 0x54, 0x52])  # "ULTR"


class WaveformMode(enum.IntEnum):
    """(frame_v2.hpp:28-36)

    DPSK (0x06) is an engine-local extension for the single-carrier DPSK
    operating mode: the reference's wire enum has no single-carrier entry
    (its CLI maps ``-w dpsk`` to MC_DPSK, main.cpp:94, and its engine only
    constructs-but-never-uses the DPSK mod/demod pair).  It is never
    negotiated (no ModeCapabilities bit) and never appears on the wire."""
    OFDM_COX = 0x00
    OTFS_EQ = 0x01
    OTFS_RAW = 0x02
    MFSK = 0x03
    MC_DPSK = 0x04
    OFDM_CHIRP = 0x05
    DPSK = 0x06
    AUTO = 0xFF


class ModeCapabilities(enum.IntFlag):
    OFDM_COX = 0x01
    OTFS_EQ = 0x02
    OTFS_RAW = 0x04
    MFSK = 0x08
    MC_DPSK = 0x10
    OFDM_CHIRP = 0x20
    ALL = 0x3F


class FrameType(enum.IntEnum):
    PING = 0x01
    PONG = 0x02
    PROBE = 0x10
    PROBE_ACK = 0x11
    CONNECT = 0x12
    CONNECT_ACK = 0x13
    CONNECT_NAK = 0x14
    DISCONNECT = 0x15
    KEEPALIVE = 0x16
    MODE_CHANGE = 0x17
    ACK = 0x20
    NACK = 0x21
    DATA = 0x30
    DATA_START = 0x31
    DATA_CONT = 0x32
    DATA_END = 0x33
    BEACON = 0x40


class Flags(enum.IntFlag):
    NONE = 0x00
    VERSION_V2 = 0x01
    URGENT = 0x02
    COMPRESSED = 0x04
    ENCRYPTED = 0x08
    MORE_FRAG = 0x10
    FINAL = 0x20


class ModeChangeReason(enum.IntEnum):
    CHANNEL_IMPROVED = 0
    CHANNEL_DEGRADED = 1
    USER_REQUEST = 2
    INITIAL_SETUP = 3


def is_control_frame(t: FrameType) -> bool:
    """(frame_v2.hpp:212-217)"""
    return t in (FrameType.PROBE, FrameType.PROBE_ACK, FrameType.KEEPALIVE,
                 FrameType.MODE_CHANGE, FrameType.ACK, FrameType.NACK,
                 FrameType.BEACON)


def is_connect_frame(t: FrameType) -> bool:
    return t in (FrameType.CONNECT, FrameType.CONNECT_ACK,
                 FrameType.CONNECT_NAK, FrameType.DISCONNECT)


def is_data_frame(t) -> bool:
    return 0x30 <= int(t) <= 0x33


def encode_snr(snr_db: float) -> int:
    """SNR byte: -10..+53.75 dB in 0.25 dB steps (frame_v2.hpp:228-231)."""
    clamped = max(-10.0, min(53.75, snr_db))
    return int((clamped + 10.0) * 4.0)


def decode_snr(encoded: int) -> float:
    return encoded / 4.0 - 10.0


def sanitize_callsign(call: str) -> str:
    """(frame_v2.hpp:75-85)"""
    out = []
    for c in call:
        if len(out) >= CALLSIGN_LEN:
            break
        if c.isalnum() or c in "/-":
            out.append(c.upper())
    return "".join(out)


def is_valid_callsign(call: str) -> bool:
    if not 3 <= len(call) <= CALLSIGN_LEN:
        return False
    return all(c.isalnum() or c in "/-" for c in call)


def hash_callsign(callsign: str) -> int:
    """24-bit DJB2-xor hash of the uppercased callsign (frame_v2.cpp:74-81)."""
    h = 5381
    for c in callsign:
        h = (((h << 5) + h) ^ ord(c.upper())) & 0xFFFFFFFF
    return h & 0xFFFFFF


def crc16_ccitt(data: bytes) -> int:
    """CRC-16-CCITT, poly 0x1021, init 0xFFFF (frame_v2.cpp:111-125)."""
    crc = 0xFFFF
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def info_bits_for_rate(rate: CodeRate) -> int:
    """(frame_v2.hpp:551-561) — note R1_3's 216 here diverges from the LDPC
    table on purpose, matching the reference."""
    return {CodeRate.R1_4: 162, CodeRate.R1_3: 216, CodeRate.R1_2: 324,
            CodeRate.R2_3: 432, CodeRate.R3_4: 486, CodeRate.R5_6: 540,
            }.get(rate, 162)


def bytes_per_codeword(rate: CodeRate) -> int:
    return info_bits_for_rate(rate) // 8


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------

def ping_serialize() -> bytes:
    return PING_MAGIC


def is_ping(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == PING_MAGIC


def _pack_common(type_: FrameType, flags: int, seq: int,
                 src_hash: int, dst_hash: int) -> bytearray:
    out = bytearray()
    out += MAGIC_V2.to_bytes(2, "big")
    out.append(int(type_))
    out.append(flags & 0xFF)
    out += (seq & 0xFFFF).to_bytes(2, "big")
    out += (src_hash & 0xFFFFFF).to_bytes(3, "big")
    out += (dst_hash & 0xFFFFFF).to_bytes(3, "big")
    return out


@dataclasses.dataclass
class ControlFrame:
    """20-byte control frame (frame_v2.hpp:293-361)."""
    type: FrameType = FrameType.PROBE
    flags: int = int(Flags.VERSION_V2)
    seq: int = 0
    src_hash: int = 0
    dst_hash: int = 0
    payload: bytes = bytes(CONTROL_PAYLOAD_SIZE)

    def serialize(self) -> bytes:
        out = _pack_common(self.type, self.flags, self.seq,
                           self.src_hash, self.dst_hash)
        p = bytes(self.payload)[:CONTROL_PAYLOAD_SIZE]
        out += p + bytes(CONTROL_PAYLOAD_SIZE - len(p))
        out += crc16_ccitt(bytes(out)).to_bytes(2, "big")
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes) -> "ControlFrame | None":
        if len(data) < CONTROL_SIZE:
            return None
        if int.from_bytes(data[:2], "big") != MAGIC_V2:
            return None
        if int.from_bytes(data[18:20], "big") != crc16_ccitt(data[:18]):
            return None
        return ControlFrame(
            type=FrameType(data[2]) if data[2] in FrameType._value2member_map_
            else FrameType.PROBE,
            flags=data[3],
            seq=int.from_bytes(data[4:6], "big"),
            src_hash=int.from_bytes(data[6:9], "big"),
            dst_hash=int.from_bytes(data[9:12], "big"),
            payload=bytes(data[12:18]))

    # --- factories (frame_v2.cpp:130-344) ---
    @classmethod
    def make_probe(cls, src, dst):
        return cls(FrameType.PROBE, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst))

    @classmethod
    def make_probe_ack(cls, src, dst, snr_db: int, recommended_rate: int):
        return cls(FrameType.PROBE_ACK, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst),
                   bytes([snr_db & 0xFF, recommended_rate & 0xFF, 0, 0, 0, 0]))

    @classmethod
    def make_ack(cls, src, dst, seq):
        return cls(FrameType.ACK, int(Flags.VERSION_V2), seq,
                   hash_callsign(src), hash_callsign(dst))

    @classmethod
    def make_ack_by_hash(cls, src, dst_hash, seq):
        return cls(FrameType.ACK, int(Flags.VERSION_V2), seq,
                   hash_callsign(src), dst_hash)

    @classmethod
    def make_nack(cls, src, dst, seq, cw_bitmap):
        return cls(FrameType.NACK, int(Flags.VERSION_V2), seq,
                   hash_callsign(src), hash_callsign(dst),
                   NackPayload(seq, cw_bitmap).encode())

    @classmethod
    def make_nack_by_hash(cls, src, dst_hash, seq, cw_bitmap):
        return cls(FrameType.NACK, int(Flags.VERSION_V2), seq,
                   hash_callsign(src), dst_hash,
                   NackPayload(seq, cw_bitmap).encode())

    @classmethod
    def make_beacon(cls, src):
        return cls(FrameType.BEACON, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), 0xFFFFFF)

    @classmethod
    def make_keepalive(cls, src, dst):
        return cls(FrameType.KEEPALIVE, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst))

    @classmethod
    def make_mode_change(cls, src, dst, seq, new_mod: Modulation,
                         new_rate: CodeRate, snr_db: float, reason: int):
        return cls.make_mode_change_by_hash(src, hash_callsign(dst), seq,
                                            new_mod, new_rate, snr_db, reason)

    @classmethod
    def make_mode_change_by_hash(cls, src, dst_hash, seq, new_mod: Modulation,
                                 new_rate: CodeRate, snr_db: float, reason: int):
        payload = bytes([int(new_mod) & 0xFF, int(new_rate) & 0xFF,
                         encode_snr(snr_db), reason & 0xFF, 0, 0])
        return cls(FrameType.MODE_CHANGE, int(Flags.VERSION_V2), seq,
                   hash_callsign(src), dst_hash, payload)

    def mode_change_info(self):
        return (Modulation(self.payload[0]) if self.payload[0] in
                Modulation._value2member_map_ else Modulation.AUTO,
                CodeRate(self.payload[1]) if self.payload[1] in
                CodeRate._value2member_map_ else CodeRate.AUTO,
                decode_snr(self.payload[2]), self.payload[3])


@dataclasses.dataclass
class NackPayload:
    """frame seq + 32-bit failed-codeword bitmap (frame_v2.hpp:484-499)."""
    frame_seq: int = 0
    cw_bitmap: int = 0

    def encode(self) -> bytes:
        return ((self.frame_seq & 0xFFFF).to_bytes(2, "big")
                + (self.cw_bitmap & 0xFFFFFFFF).to_bytes(4, "big"))

    @staticmethod
    def decode(data: bytes) -> "NackPayload":
        return NackPayload(int.from_bytes(data[:2], "big"),
                           int.from_bytes(data[2:6], "big"))

    def count_failed(self) -> int:
        return bin(self.cw_bitmap).count("1")

    def is_failed(self, i: int) -> bool:
        return bool((self.cw_bitmap >> i) & 1)


def calculate_codewords(payload_size: int,
                        rate: CodeRate = CodeRate.R1_4) -> int:
    """Codewords needed for a data frame (frame_v2.cpp:428-460)."""
    total = HEADER_SIZE + payload_size + CRC_SIZE
    bpc = bytes_per_codeword(rate)
    if total <= bpc:
        return 1
    remaining = total - bpc
    per_cw = bpc - DATA_CW_HEADER_SIZE
    return 1 + -(-remaining // per_cw)


@dataclasses.dataclass
class DataFrame:
    """Variable-codeword data frame (frame_v2.hpp:366-404)."""
    type: FrameType = FrameType.DATA
    flags: int = int(Flags.VERSION_V2)
    seq: int = 0
    src_hash: int = 0
    dst_hash: int = 0
    total_cw: int = 0
    payload_len: int = 0
    payload: bytes = b""

    @classmethod
    def make_data(cls, src: str, dst: str, seq: int, data: bytes | str,
                  rate: CodeRate = CodeRate.R1_4) -> "DataFrame":
        if isinstance(data, str):
            data = data.encode()
        return cls(FrameType.DATA, int(Flags.VERSION_V2), seq,
                   hash_callsign(src), hash_callsign(dst),
                   calculate_codewords(len(data), rate), len(data), bytes(data))

    def serialize(self) -> bytes:
        out = _pack_common(self.type, self.flags, self.seq,
                           self.src_hash, self.dst_hash)
        out.append(self.total_cw & 0xFF)
        out += (self.payload_len & 0xFFFF).to_bytes(2, "big")
        out += crc16_ccitt(bytes(out)).to_bytes(2, "big")   # header CRC
        out += self.payload
        out += crc16_ccitt(bytes(out)).to_bytes(2, "big")   # frame CRC
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes) -> "DataFrame | None":
        if len(data) < HEADER_SIZE + CRC_SIZE:
            return None
        if int.from_bytes(data[:2], "big") != MAGIC_V2:
            return None
        if int.from_bytes(data[15:17], "big") != crc16_ccitt(data[:15]):
            return None
        payload_len = int.from_bytes(data[13:15], "big")
        expected = HEADER_SIZE + payload_len + CRC_SIZE
        if len(data) < expected:
            return None
        if int.from_bytes(data[expected - 2:expected], "big") != \
                crc16_ccitt(data[:expected - 2]):
            return None
        return DataFrame(
            type=FrameType(data[2]) if data[2] in FrameType._value2member_map_
            else FrameType.DATA,
            flags=data[3], seq=int.from_bytes(data[4:6], "big"),
            src_hash=int.from_bytes(data[6:9], "big"),
            dst_hash=int.from_bytes(data[9:12], "big"),
            total_cw=data[12], payload_len=payload_len,
            payload=bytes(data[HEADER_SIZE:HEADER_SIZE + payload_len]))

    def payload_as_text(self) -> str:
        return self.payload.decode(errors="replace")


def _pack_callsign(call: str) -> bytes:
    b = call.encode()[:MAX_CALLSIGN_LEN - 1]
    return b + bytes(MAX_CALLSIGN_LEN - len(b))


@dataclasses.dataclass
class ConnectFrame:
    """44-byte connect/disconnect frame with full callsigns
    (frame_v2.hpp:433-479)."""
    type: FrameType = FrameType.CONNECT
    flags: int = int(Flags.VERSION_V2)
    seq: int = 0
    src_hash: int = 0
    dst_hash: int = 0
    src_callsign: str = ""
    dst_callsign: str = ""
    mode_capabilities: int = 0
    negotiated_mode: int = 0
    initial_modulation: int = 0
    initial_code_rate: int = 0
    measured_snr: int = 0

    @classmethod
    def make_connect(cls, src, dst, mode_caps, forced_waveform,
                     forced_modulation=0xFF, forced_code_rate=0xFF):
        return cls(FrameType.CONNECT, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst), src, dst,
                   mode_caps, forced_waveform, forced_modulation,
                   forced_code_rate, 0)

    @classmethod
    def make_connect_ack(cls, src, dst, neg_mode, init_mod: Modulation,
                         init_rate: CodeRate, snr_db: float):
        return cls(FrameType.CONNECT_ACK, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst), src, dst,
                   0, neg_mode, int(init_mod), int(init_rate),
                   encode_snr(snr_db))

    @classmethod
    def make_connect_nak(cls, src, dst):
        return cls(FrameType.CONNECT_NAK, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst), src, dst)

    @classmethod
    def make_disconnect(cls, src, dst):
        return cls(FrameType.DISCONNECT, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), hash_callsign(dst), src, dst)

    @classmethod
    def make_connect_ack_by_hash(cls, src, dst_hash, neg_mode,
                                 init_mod: Modulation, init_rate: CodeRate,
                                 snr_db: float):
        return cls(FrameType.CONNECT_ACK, int(Flags.VERSION_V2), 0,
                   hash_callsign(src), dst_hash & 0xFFFFFF, src, "",
                   0, neg_mode, int(init_mod), int(init_rate),
                   encode_snr(snr_db))

    def serialize(self) -> bytes:
        out = _pack_common(self.type, self.flags, self.seq,
                           self.src_hash, self.dst_hash)
        out.append(calculate_codewords(CONNECT_PAYLOAD_SIZE))
        out += CONNECT_PAYLOAD_SIZE.to_bytes(2, "big")
        out += crc16_ccitt(bytes(out)).to_bytes(2, "big")
        out += _pack_callsign(self.src_callsign)
        out += _pack_callsign(self.dst_callsign)
        out += bytes([self.mode_capabilities & 0xFF, self.negotiated_mode & 0xFF,
                      self.initial_modulation & 0xFF,
                      self.initial_code_rate & 0xFF, self.measured_snr & 0xFF])
        out += crc16_ccitt(bytes(out)).to_bytes(2, "big")
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes) -> "ConnectFrame | None":
        min_size = HEADER_SIZE + CONNECT_PAYLOAD_SIZE + CRC_SIZE
        if len(data) < min_size:
            return None
        if int.from_bytes(data[:2], "big") != MAGIC_V2:
            return None
        ftype = data[2]
        if ftype not in (int(FrameType.CONNECT), int(FrameType.CONNECT_ACK),
                         int(FrameType.CONNECT_NAK), int(FrameType.DISCONNECT)):
            return None
        if int.from_bytes(data[15:17], "big") != crc16_ccitt(data[:15]):
            return None
        fcrc_off = HEADER_SIZE + CONNECT_PAYLOAD_SIZE
        if int.from_bytes(data[fcrc_off:fcrc_off + 2], "big") != \
                crc16_ccitt(data[:fcrc_off]):
            return None
        p = HEADER_SIZE
        src_cs = bytes(data[p:p + MAX_CALLSIGN_LEN]).split(b"\0")[0].decode(errors="replace")
        dst_cs = bytes(data[p + MAX_CALLSIGN_LEN:p + 2 * MAX_CALLSIGN_LEN]
                       ).split(b"\0")[0].decode(errors="replace")
        fo = p + 2 * MAX_CALLSIGN_LEN
        return ConnectFrame(
            type=FrameType(ftype), flags=data[3],
            seq=int.from_bytes(data[4:6], "big"),
            src_hash=int.from_bytes(data[6:9], "big"),
            dst_hash=int.from_bytes(data[9:12], "big"),
            src_callsign=src_cs, dst_callsign=dst_cs,
            mode_capabilities=data[fo], negotiated_mode=data[fo + 1],
            initial_modulation=data[fo + 2], initial_code_rate=data[fo + 3],
            measured_snr=data[fo + 4])


# ---------------------------------------------------------------------------
# Codeword split / reassembly / identification
# ---------------------------------------------------------------------------

def split_into_codewords(frame_data: bytes,
                         rate: CodeRate = CodeRate.R1_4) -> list[bytes]:
    """CW0 = first bytes_per_cw bytes; CW1+ = [0xD5][idx][payload]
    (frame_v2.cpp:157-191, 1080-1114)."""
    bpc = bytes_per_codeword(rate)
    per_cw = bpc - DATA_CW_HEADER_SIZE
    cws = [bytes(frame_data[:bpc]).ljust(bpc, b"\0")]
    offset = bpc
    idx = 1
    while offset < len(frame_data):
        chunk = frame_data[offset:offset + per_cw]
        cws.append((bytes([DATA_CW_MARKER, idx]) + chunk).ljust(bpc, b"\0"))
        offset += per_cw
        idx += 1
    return cws


def reassemble_codewords(codewords: list[bytes], expected_size: int) -> bytes:
    """(frame_v2.cpp:193-230)"""
    out = bytearray()
    for i, cw in enumerate(codewords):
        remaining = expected_size - len(out)
        if remaining <= 0:
            break
        if i == 0:
            out += cw[:remaining]
        elif len(cw) >= DATA_CW_HEADER_SIZE and cw[0] == DATA_CW_MARKER:
            out += cw[DATA_CW_HEADER_SIZE:DATA_CW_HEADER_SIZE + remaining]
        else:
            out += cw[:remaining]
    return bytes(out)


@dataclasses.dataclass
class HeaderInfo:
    valid: bool = False
    is_control: bool = False
    type: FrameType = FrameType.PROBE
    total_cw: int = 1
    payload_len: int = 0
    seq: int = 0
    src_hash: int = 0
    dst_hash: int = 0


def parse_header(cw0: bytes) -> HeaderInfo:
    """(frame_v2.cpp:1176-1232)"""
    info = HeaderInfo()
    if len(cw0) < BYTES_PER_CODEWORD:
        return info
    if int.from_bytes(cw0[:2], "big") != MAGIC_V2:
        return info
    try:
        info.type = FrameType(cw0[2])
    except ValueError:
        return info
    info.is_control = is_control_frame(info.type)
    info.seq = int.from_bytes(cw0[4:6], "big")
    info.src_hash = int.from_bytes(cw0[6:9], "big")
    info.dst_hash = int.from_bytes(cw0[9:12], "big")
    if info.is_control:
        if int.from_bytes(cw0[18:20], "big") != crc16_ccitt(cw0[:18]):
            return info
        info.total_cw = 1
        info.payload_len = 0
    else:
        info.total_cw = cw0[12]
        info.payload_len = int.from_bytes(cw0[13:15], "big")
        if int.from_bytes(cw0[15:17], "big") != crc16_ccitt(cw0[:15]):
            return info
    info.valid = True
    return info


class CodewordType(enum.IntEnum):
    UNKNOWN = 0
    HEADER = 1
    DATA = 2


def identify_codeword(cw: bytes) -> tuple[CodewordType, int]:
    """(frame_v2.cpp:1234-1257)"""
    if len(cw) < 2:
        return CodewordType.UNKNOWN, 0
    if int.from_bytes(cw[:2], "big") == MAGIC_V2:
        return CodewordType.HEADER, 0
    if cw[0] == DATA_CW_MARKER:
        return CodewordType.DATA, cw[1]
    return CodewordType.UNKNOWN, 0


# ---------------------------------------------------------------------------
# LDPC integration (device-backed batch codec)
# ---------------------------------------------------------------------------

def encode_frame_with_ldpc(frame_data: bytes,
                           rate: CodeRate = CodeRate.R1_4) -> list[bytes]:
    """Frame bytes -> list of 81-byte LDPC-encoded codewords
    (frame_v2.cpp:1075-1129).  Encoding runs as one device batch."""
    import jax.numpy as jnp
    from ..fec import ldpc
    from ..ops import ldpc as ldpc_ops
    from ..utils.bits import bytes_to_bits, bits_to_bytes

    code = ldpc.get_code(rate if rate in ldpc.CODE_PARAMS else CodeRate.R1_2)
    chunks = split_into_codewords(frame_data, rate)
    k = code.k
    info = np.zeros((len(chunks), k), np.float32)
    for i, c in enumerate(chunks):
        bits = bytes_to_bits(c)[:k]
        info[i, :len(bits)] = bits
    cw = np.asarray(ldpc_ops.encode(code, jnp.asarray(info))).astype(np.uint8)
    return [bits_to_bytes(cw[i]) for i in range(len(chunks))]


def decode_codewords_with_ldpc(soft_bits_list: list[np.ndarray],
                               rate: CodeRate = CodeRate.R1_4):
    """LLR blocks -> (decoded flags, per-CW bytes) as one device batch
    (frame_v2.cpp:1157-1174).  trap_escape is on: the engine's frame path
    must not livelock on the H construction's small trapping sets when a
    deterministic disturbance lands two confident wrong bits on a 4-cycle
    pair (see ops/ldpc.decode) — converged lanes keep lane-exact parity,
    only would-be failures are retried."""
    import jax.numpy as jnp
    from ..fec import ldpc
    from ..ops import ldpc as ldpc_ops
    from ..utils.bits import bits_to_bytes

    code = ldpc.get_code(rate if rate in ldpc.CODE_PARAMS else CodeRate.R1_2)
    bpc = bytes_per_codeword(rate)
    n = LDPC_CODEWORD_BITS
    blocks = np.zeros((len(soft_bits_list), n), np.float32)
    for i, sb in enumerate(soft_bits_list):
        sb = np.asarray(sb, np.float32)[:n]
        blocks[i, :len(sb)] = sb
    info, ok, _ = ldpc_ops.decode(code, jnp.asarray(blocks), trap_escape=True)
    info = np.asarray(info)
    ok = np.asarray(ok)
    decoded = [bool(ok[i]) for i in range(len(soft_bits_list))]
    data = [bits_to_bytes(info[i])[:bpc] if ok[i] else b""
            for i in range(len(soft_bits_list))]
    return decoded, data

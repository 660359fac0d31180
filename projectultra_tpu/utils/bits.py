"""Byte <-> bit helpers (MSB-first, matching the reference's packing).

The reference converts between bytes and bit arrays MSB-first everywhere
(e.g. src/fec/ldpc_encoder.cpp:145-148, src/ofdm/demodulator.cpp:750-760).
These helpers work on host numpy arrays and on device jnp arrays.
"""

from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def bytes_to_bits(data: bytes | np.ndarray) -> np.ndarray:
    """uint8 array of bits, MSB first."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, dtype=np.uint8)
    return np.unpackbits(arr)


def bits_to_bytes(bits: np.ndarray) -> bytes:
    """Pack bits (MSB first) into bytes; trailing partial byte zero-padded on
    the right, matching the reference's ``byte << (8 - bit_count)``."""
    bits = np.asarray(bits, dtype=np.uint8)
    return np.packbits(bits).tobytes()


def batch_bytes_to_bits(batch: np.ndarray) -> np.ndarray:
    """[B, nbytes] uint8 -> [B, nbytes*8] bits, MSB first."""
    return np.unpackbits(np.asarray(batch, dtype=np.uint8), axis=-1)


def batch_bits_to_bytes(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, dtype=np.uint8), axis=-1)


def jnp_unpackbits(x, bit_count: int):
    """Device-side MSB-first unpack: [..., nbytes] uint8 -> [..., bit_count]."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (x[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 8)[..., :bit_count]


def jnp_packbits(bits):
    """Device-side MSB-first pack: [..., nbits] -> [..., ceil(nbits/8)] uint8."""
    n = bits.shape[-1]
    pad = (-n) % 8
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = bits.reshape(*bits.shape[:-1], -1, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return (b * weights).sum(axis=-1).astype(jnp.uint8)

"""Block and time-frequency channel interleavers.

Reference: src/fec/ldpc_decoder.cpp:454-674 and include/ultra/fec.hpp:85-144.

Both interleavers are pure static permutations, so on device they are a
single constant-index gather — XLA fuses them into adjacent ops for free.
Host (numpy) versions operate on bits/bytes for the protocol layer.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from ..utils.bits import bytes_to_bits, bits_to_bytes


class Interleaver:
    """rows x cols transpose interleaver (ldpc_decoder.cpp:454-540).

    permutation[i] = (i % cols) * rows + (i // cols); interleave writes
    out[perm[i]] = in[i], deinterleave reads out[i] = in[perm[i]].
    """

    def __init__(self, rows: int, cols: int):
        self.rows, self.cols = rows, cols
        n = rows * cols
        i = np.arange(n)
        self.perm = (i % cols) * rows + i // cols
        self.inv = np.empty(n, dtype=np.int64)
        self.inv[self.perm] = i

    def interleave_soft(self, soft: np.ndarray) -> np.ndarray:
        n = len(soft)
        out = np.zeros(n, dtype=np.asarray(soft).dtype)
        idx = np.arange(min(n, len(self.perm)))
        out[self.perm[idx]] = np.asarray(soft)[idx]
        return out

    def deinterleave_soft(self, soft: np.ndarray) -> np.ndarray:
        n = len(soft)
        out = np.zeros(n, dtype=np.asarray(soft).dtype)
        idx = np.arange(min(n, len(self.perm)))
        out[idx] = np.asarray(soft)[self.perm[idx]]
        return out

    def _bits_of(self, data: bytes) -> np.ndarray:
        n = self.rows * self.cols
        bits = np.zeros(n, dtype=np.uint8)
        raw = bytes_to_bits(data)[:n]
        bits[:len(raw)] = raw
        return bits

    def interleave(self, data: bytes) -> bytes:
        bits = self._bits_of(data)
        out = np.zeros_like(bits)
        out[self.perm] = bits
        return bits_to_bytes(out)

    def deinterleave(self, data: bytes) -> bytes:
        bits = self._bits_of(data)
        return bits_to_bytes(bits[self.perm])


def _gcd(a: int, b: int) -> int:
    return math.gcd(a, b)


def find_coprime_step(n: int, total: int) -> int:
    """(ldpc_decoder.cpp:547-572): smallest step >= 3n (or total/2 fallback)
    coprime with total."""
    target = n * 3
    if target >= total:
        target = total // 2
    for step in range(target, total):
        if _gcd(step, total) == 1:
            return step
    for step in range(n + 1, total):
        if _gcd(step, total) == 1:
            return step
    return n + 1


class ChannelInterleaver:
    """Coprime-stride time-frequency interleaver (ldpc_decoder.cpp:574-672).

    Spreads consecutive LDPC bits across >=3 OFDM symbols so a fade hitting
    one symbol produces scattered (correctable) erasures.
    """

    def __init__(self, bits_per_symbol: int, total_bits: int = 648):
        self.bits_per_symbol = bits_per_symbol
        self.total_bits = total_bits
        self.num_symbols = (total_bits + bits_per_symbol - 1) // bits_per_symbol
        step = find_coprime_step(bits_per_symbol, total_bits)
        self.symbol_separation = max(1, step // bits_per_symbol)
        i = np.arange(total_bits, dtype=np.int64)
        self.perm = (i * step) % total_bits           # out[perm[i]] = in[i]
        self.inv = np.empty(total_bits, dtype=np.int64)
        self.inv[self.perm] = i

    def interleave_soft(self, soft: np.ndarray) -> np.ndarray:
        soft = np.asarray(soft)
        n = min(len(soft), self.total_bits)
        out = np.zeros(self.total_bits, dtype=soft.dtype)
        out[self.perm[:n]] = soft[:n]
        return out

    def deinterleave_soft(self, soft: np.ndarray) -> np.ndarray:
        soft = np.asarray(soft)
        n = min(len(soft), self.total_bits)
        out = np.zeros(self.total_bits, dtype=soft.dtype)
        out[self.inv[:n]] = soft[:n]
        return out

    def _bits_of(self, data: bytes) -> np.ndarray:
        bits = np.zeros(self.total_bits, dtype=np.uint8)
        raw = bytes_to_bits(data)[:self.total_bits]
        bits[:len(raw)] = raw
        return bits

    def interleave(self, data: bytes) -> bytes:
        bits = self._bits_of(data)
        out = np.zeros_like(bits)
        out[self.perm] = bits
        return bits_to_bytes(out)

    def deinterleave(self, data: bytes) -> bytes:
        bits = self._bits_of(data)
        out = np.zeros_like(bits)
        out[self.inv] = bits
        return bits_to_bytes(out)


@functools.lru_cache(maxsize=None)
def channel_interleaver(bits_per_symbol: int, total_bits: int = 648) -> ChannelInterleaver:
    return ChannelInterleaver(bits_per_symbol, total_bits)

"""Gorilla time-series compression (Facebook's in-memory TSDB codec).

Encodes one chunk = (sorted int64 timestamps, float64 values) into a byte
payload: timestamps as delta-of-delta with variable-width classes, values
as XOR-with-previous with leading/trailing-zero windows. Lossless for any
int64 timestamp sequence (the widest class stores a full 64-bit zigzag
delta-of-delta, so out-of-range jumps never truncate) and any float64 bit
pattern (NaN payloads round-trip bit-exactly).

The codec is driver/executor-side pure Python over numpy arrays; it runs
inside `applyInPandas` per chunk (operators/chunks.py), so each call
handles one bounded group — at 100 TB the parallelism unit is the chunk
key, not this loop. A production build would swap the inner loop for a
Cython/Arrow kernel behind the same byte format; the format, not the loop,
is the contract.

Format (big-endian bit stream):
  magic 0xG1 (1 byte) | n_points uint32 | t0 int64 | v0 float64-bits |
  per point i>=1: ts class then value block.
  ts classes (zigzag dod): '0'; '10'+7b; '110'+9b; '1110'+12b; '1111'+64b
  value blocks: '0' (xor==0); '10' reuse prev window; '11'+5b lead+6b
  (meaningful_len-1) + meaningful bits.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0xB1


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = ((self.acc << width) | (value & ((1 << width) - 1)))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        remaining = width
        while remaining > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.pos = pos
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _nlz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ntz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def encode_chunk(ts: np.ndarray, vals: np.ndarray) -> bytes:
    """Encode sorted int64 timestamps + float64 values into a Gorilla
    payload. ``ts`` need not be strictly increasing (equal stamps fine)."""
    ts = np.asarray(ts, dtype=np.int64)
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    n = len(ts)
    w = _BitWriter()
    head = struct.pack(">BI", _MAGIC, n)
    if n == 0:
        return head
    w.write(int(ts[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    w.write(int(bits[0]), 64)

    prev_delta = 0
    prev_lead, prev_mlen = -1, 0  # value window (-1 = unset)
    ts_l = ts.tolist()
    bits_l = bits.tolist()
    for i in range(1, n):
        # --- timestamp: zigzag delta-of-delta, 5 width classes
        delta = ts_l[i] - ts_l[i - 1]
        z = _zigzag(delta - prev_delta)
        prev_delta = delta
        if z == 0:
            w.write(0, 1)
        elif z < (1 << 7):
            w.write(0b10, 2)
            w.write(z, 7)
        elif z < (1 << 9):
            w.write(0b110, 3)
            w.write(z, 9)
        elif z < (1 << 12):
            w.write(0b1110, 4)
            w.write(z, 12)
        else:
            w.write(0b1111, 4)
            w.write(z, 64)
        # --- value: XOR blocks
        xor = bits_l[i] ^ bits_l[i - 1]
        if xor == 0:
            w.write(0, 1)
            continue
        lead = _nlz64(xor)
        if lead > 31:
            lead = 31
        trail = _ntz64(xor)
        mlen = 64 - lead - trail
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= (64 - prev_lead - prev_mlen)
        ):
            w.write(0b10, 2)
            w.write(xor >> (64 - prev_lead - prev_mlen), prev_mlen)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen - 1, 6)
            w.write(xor >> trail, mlen)
            prev_lead, prev_mlen = lead, mlen
    return head + w.getvalue()


def decode_chunk(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_chunk` — bit-exact round trip."""
    magic, n = struct.unpack_from(">BI", payload, 0)
    if magic != _MAGIC:
        raise ValueError("not a gorilla chunk")
    ts = np.empty(n, dtype=np.int64)
    bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, bits.view(np.float64)
    r = _BitReader(payload[5:])
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    bits[0] = r.read(64)

    prev_t = t0
    prev_delta = 0
    prev_bits = int(bits[0])
    prev_lead, prev_mlen = -1, 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(7))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(9))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(12))
        else:
            dod = _unzigzag(r.read(64))
        prev_delta += dod
        prev_t += prev_delta
        ts[i] = prev_t

        if r.read(1) == 0:
            xor = 0
        elif r.read(1) == 0:
            xor = r.read(prev_mlen) << (64 - prev_lead - prev_mlen)
        else:
            lead = r.read(5)
            mlen = r.read(6) + 1
            xor = r.read(mlen) << (64 - lead - mlen)
            prev_lead, prev_mlen = lead, mlen
        prev_bits ^= xor
        bits[i] = prev_bits
    return ts, bits.view(np.float64)

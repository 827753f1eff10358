"""Gorilla block compression: delta-of-delta timestamps + XOR float values.

Pure functions over per-series window-sorted arrays, following the
public Gorilla paper (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015) §4.1:

Timestamps (int64 ms, sorted ascending):
  header: t0 raw 64b, then per value D = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2})
    D == 0              -> '0'
    -63  <= D <= 64     -> '10'  + 7-bit  value (offset -63)
    -255 <= D <= 256    -> '110' + 9-bit  value (offset -255)
    -2047<= D <= 2048   -> '1110'+ 12-bit value (offset -2047)
    else                -> '1111'+ 64-bit raw two's complement
  (ranges from the paper; the escape is 64-bit because our deltas are
  milliseconds over day-wide windows, not seconds.)

Values (float64, any — NaN round-trips bit-exactly):
  v0 raw 64b; then X = bits(v_i) XOR bits(v_{i-1}):
    X == 0                                   -> '0'
    leading/meaningful window fits previous  -> '10' + meaningful bits
    else -> '11' + 5b leading-zero count + 6b meaningful-bit count
            + meaningful bits
  (6-bit length field stores count-1, so 64 meaningful bits encode as 63.)

Rollup rows per series per tier are bounded (windows, not raw points),
so the per-value Python loop here is off the hot path; blocks are capped
at EngineConfig.block_len windows.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_zeros(self, k: int):
        """Append k '0' bits in O(k/8): whole zero bytes go straight into
        the buffer instead of through the bit accumulator."""
        if self.nbits:
            fill = min(k, 8 - self.nbits)
            self.write(0, fill)
            k -= fill
        nbytes, rem = divmod(k, 8)
        if nbytes:
            self.buf.extend(b"\x00" * nbytes)
        if rem:
            self.write(0, rem)

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        """O(bytes) per call: slice the covering byte window once and
        shift, instead of one Python op per bit."""
        start = self.pos
        end = start + bits
        chunk = int.from_bytes(self.data[start >> 3:(end + 7) >> 3], "big")
        self.pos = end
        return (chunk >> ((-end) % 8)) & ((1 << bits) - 1)


def encode_timestamps(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)  # first delta raw
    dods = np.diff(deltas)
    # Regular grids make dod==0 runs the common case: emit whole runs of
    # '0' control bits in one write() instead of one call per value.
    nz = np.flatnonzero(dods)
    prev_end = 0
    for i in nz:
        if i > prev_end:
            w.write_zeros(int(i - prev_end))
        prev_end = i + 1
        d = int(dods[i])
        if -63 <= d <= 64:
            w.write(0b10, 2); w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3); w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4); w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4); w.write(d & ((1 << 64) - 1), 64)
    if dods.size > prev_end:
        w.write_zeros(int(dods.size - prev_end))
    return w.getvalue()


def decode_timestamps(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    out[0] = t0 - (1 << 64) if t0 >= (1 << 63) else t0
    if n == 1:
        return out
    d = r.read(64)
    delta = d - (1 << 64) if d >= (1 << 63) else d
    out[1] = out[0] + delta
    for i in range(2, n):
        tag = r.read(1)
        if tag == 0:
            dod = 0
        else:
            tag = (tag << 1) | r.read(1)
            if tag == 0b10:
                dod = r.read(7) - 63
            else:
                tag = (tag << 1) | r.read(1)
                if tag == 0b110:
                    dod = r.read(9) - 255
                else:
                    tag = (tag << 1) | r.read(1)
                    if tag == 0b1110:
                        dod = r.read(12) - 2047
                    else:
                        raw = r.read(64)
                        dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


# Leading/trailing-zero counts per byte value (for the vectorized path).
_LZ8 = np.array([8] + [8 - int(b).bit_length() for b in range(1, 256)],
                dtype=np.int64)
_TZ8 = np.array([8] + [(int(b) & -int(b)).bit_length() - 1 for b in range(1, 256)],
                dtype=np.int64)


def _encode_floats_vectorized(bits: np.ndarray, xors: np.ndarray) -> bytes:
    """Context-free '11'-branch-only encoding of the SAME byte format —
    every step is a numpy kernel, no per-value Python.  The decoder is
    branch-agnostic, so output decodes identically; on noisy columns the
    size matches the sequential encoder closely (the '10' window-reuse
    it forgoes pays off only on smooth series, which take the sequential
    path via the dispatch in encode_floats)."""
    n = bits.size
    m = xors.size  # == n - 1
    # vectorized clz/ctz via big-endian byte decomposition
    xb = xors.byteswap().view(np.uint8).reshape(m, 8)
    nzb = xb != 0
    any_nz = nzb.any(axis=1)
    first_b = np.argmax(nzb, axis=1)
    last_b = 7 - np.argmax(nzb[:, ::-1], axis=1)
    rows = np.arange(m)
    lz = first_b * 8 + _LZ8[xb[rows, first_b]]
    tz = (7 - last_b) * 8 + _TZ8[xb[rows, last_b]]
    lz = np.minimum(lz, 31)
    mbits = np.where(any_nz, 64 - lz - tz, 0)

    # per-value code: zero-xor -> 1 bit '0'; else 13-bit prefix + payload
    p13 = np.where(any_nz,
                   (0b11 << 11) | (lz << 6) | np.maximum(mbits - 1, 0),
                   0).astype(np.uint16)
    payload = np.where(any_nz, xors >> (tz % 64).astype(np.uint64), np.uint64(0))

    W = 13 + 64
    mat = np.zeros((m, W), dtype=bool)
    shifts13 = (12 - np.arange(13)).astype(np.uint16)
    mat[:, :13] = (p13[:, None] >> shifts13[None, :]) & 1
    pal = payload << ((64 - mbits) % 64).astype(np.uint64)  # left-align in 64
    shifts64 = (63 - np.arange(64)).astype(np.uint64)
    mat[:, 13:] = ((pal[:, None] >> shifts64[None, :]) & np.uint64(1)).astype(bool)
    nbits = np.where(any_nz, 13 + mbits, 1)
    valid = np.arange(W)[None, :] < nbits[:, None]
    # zero-xor rows: the single '0' control bit (mat row is already 0s)
    flat = mat[valid]  # row-major ragged selection keeps stream order

    head = BitWriter()
    head.write(n, 32)
    head.write(int(bits[0]), 64)  # 96 bits -> byte-aligned tail start
    return head.getvalue() + np.packbits(flat).tobytes()


def encode_floats(values: np.ndarray) -> bytes:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = bits.size
    if n >= 512:
        xors = np.bitwise_xor(bits[1:], bits[:-1])
        # Noisy columns (most xors nonzero) gain nothing from the
        # sequential '10' window-reuse branch — take the numpy path.
        if np.count_nonzero(xors) >= 0.5 * xors.size:
            return _encode_floats_vectorized(bits, xors)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    lead, mbits = 65, 0  # previous meaningful-bit window (65 = invalid)
    # Repeated values (constant columns, gap-filled runs, NaN runs) make
    # xor==0 the common case: emit whole runs of '0' bits in one write().
    xors = np.bitwise_xor(bits[1:], bits[:-1])
    nz = np.flatnonzero(xors)
    prev_end = 0
    for i in nz:
        if i > prev_end:
            w.write_zeros(int(i - prev_end))
        prev_end = i + 1
        x = int(xors[i])
        lz = min(_clz64(x), 31)
        tz = _ctz64(x)
        if lead <= 64 and lz >= lead and tz >= 64 - lead - mbits:
            w.write(0b10, 2)
            w.write(x >> (64 - lead - mbits), mbits)
        else:
            lead, mbits = lz, 64 - lz - tz
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mbits - 1, 6)
            w.write(x >> tz, mbits)
    if xors.size > prev_end:
        w.write_zeros(int(xors.size - prev_end))
    return w.getvalue()


def decode_floats(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mbits = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mbits = r.read(6) + 1
        m = r.read(mbits)
        prev ^= m << (64 - lead - mbits)
        out[i] = prev
    return out.view(np.float64)


def encode_bools(mask: np.ndarray) -> bytes:
    mask = np.asarray(mask, dtype=bool)
    return np.int32(mask.size).tobytes() + np.packbits(mask).tobytes()


def decode_bools(data: bytes) -> np.ndarray:
    n = int(np.frombuffer(data[:4], dtype=np.int32)[0])
    return np.unpackbits(np.frombuffer(data[4:], dtype=np.uint8), count=n).astype(bool)

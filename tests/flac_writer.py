"""Minimal FLAC *encoder* for test fixtures (no FLAC tooling in this image).

Produces small but fully valid streams — correct STREAMINFO, frame headers
with UTF-8 coded frame numbers, CRC-8/CRC-16 — exercising every subframe
type the decoders support: constant, verbatim, fixed order 0-4 with Rice
residuals (multi-partition capable), LPC, wasted bits, and independent /
mid-side channel assignments. Test-only: the product never writes FLAC.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, k: int):
        assert 0 <= value < (1 << k), (value, k)
        self.acc = (self.acc << k) | value
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, k: int):
        self.write(value & ((1 << k) - 1), k)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _write_utf8_number(w: _BitWriter, v: int):
    if v < 0x80:
        w.write(v, 8)
    elif v < 0x800:
        w.write(0xC0 | (v >> 6), 8)
        w.write(0x80 | (v & 0x3F), 8)
    else:
        raise NotImplementedError("test fixtures use < 2048 frames")


def _zigzag(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _write_rice(
    w: _BitWriter, residual: Sequence[int], order: int, blocksize: int, porder: int = 0
):
    """Rice-coded residual, method 0 (4-bit params), ``2**porder`` partitions
    with per-partition adaptive parameters. Per spec, every partition holds
    blocksize/2**porder samples except the first, which is short by the
    predictor order."""
    if blocksize % (1 << porder):
        porder = 0  # spec requires blocksize divisible by 2**porder (tail frames)
    w.write(0, 2)  # method: rice, 4-bit
    w.write(porder, 4)
    parts = 1 << porder
    idx = 0
    for p in range(parts):
        count = blocksize // parts - (order if p == 0 else 0)
        chunk = residual[idx : idx + count]
        idx += count
        u = [_zigzag(int(v)) for v in chunk]
        mean = (sum(u) / max(len(u), 1)) if u else 0
        param = min(max(int(mean).bit_length() - 1, 0), 14)
        w.write(param, 4)
        for x in u:
            w.write_unary(x >> param)
            if param:
                w.write(x & ((1 << param) - 1), param)
    assert idx == len(residual)


def _encode_subframe(
    w: _BitWriter,
    x: np.ndarray,
    bps: int,
    mode: str,
    wasted: int = 0,
    porder: int = 0,
):
    w.write(0, 1)  # padding
    if mode == "constant":
        w.write(0, 6)
    elif mode == "verbatim":
        w.write(1, 6)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(8 + order, 6)
    elif mode == "lpc":
        order = 2
        w.write(32 + order - 1, 6)
    else:
        raise ValueError(mode)

    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
        assert not np.any(np.asarray(x) & ((1 << wasted) - 1)), "samples must be divisible"
        x = np.asarray(x) >> wasted
    else:
        w.write(0, 1)
    eff = bps - wasted

    x = [int(v) for v in x]
    if mode == "constant":
        assert all(v == x[0] for v in x)
        w.write_signed(x[0], eff)
    elif mode == "verbatim":
        for v in x:
            w.write_signed(v, eff)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        for v in x[:order]:
            w.write_signed(v, eff)
        res = []
        for i in range(order, len(x)):
            if order == 0:
                p = 0
            elif order == 1:
                p = x[i - 1]
            elif order == 2:
                p = 2 * x[i - 1] - x[i - 2]
            elif order == 3:
                p = 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3]
            else:
                p = 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4]
            res.append(x[i] - p)
        _write_rice(w, res, order, len(x), porder)
    elif mode == "lpc":
        order, precision, shift = 2, 5, 1
        coef = [3, -1]  # predicts 1.5*x[-1] - 0.5*x[-2]
        for v in x[:order]:
            w.write_signed(v, eff)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coef:
            w.write_signed(c, precision)
        res = []
        for i in range(order, len(x)):
            p = (coef[0] * x[i - 1] + coef[1] * x[i - 2]) >> shift
            res.append(x[i] - p)
        _write_rice(w, res, order, len(x), porder)


def encode_flac(
    channels: List[np.ndarray],
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 1024,
    mode: str = "fixed2",
    wasted: int = 0,
    porder: int = 0,
    mid_side: bool = False,
    declared_total: Optional[int] = None,
) -> bytes:
    """Encode int samples (one array per channel) into a FLAC stream."""
    n = len(channels[0])
    assert all(len(c) == n for c in channels)
    nch = len(channels)
    channels = [np.asarray(c, np.int64) for c in channels]
    if mid_side:
        assert nch == 2

    out = bytearray(b"fLaC")
    # STREAMINFO, last-metadata flag set
    si = _BitWriter()
    si.write(blocksize, 16)  # min blocksize
    si.write(blocksize, 16)  # max blocksize
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)  # max framesize unknown
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    total = n if declared_total is None else declared_total
    si.write(total, 36)
    body = si.getvalue() + b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, blocksize)):
        bs = min(blocksize, n - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # blocksize: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(10 if mid_side else nch - 1, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.write(0, 1)
        _write_utf8_number(w, fi)
        w.write(bs - 1, 16)
        header = w.getvalue()
        w = _BitWriter()
        for b in header:
            w.write(b, 8)
        w.write(_crc8(header), 8)

        if mid_side:
            L = channels[0][start : start + bs]
            R = channels[1][start : start + bs]
            mid = (L + R) >> 1
            side = L - R
            _encode_subframe(w, mid, bps, mode, wasted=0, porder=porder)
            _encode_subframe(w, side, bps + 1, mode, wasted=0, porder=porder)
        else:
            for c in channels:
                _encode_subframe(
                    w, c[start : start + bs], bps, mode, wasted=wasted, porder=porder
                )
        w.align()
        frame = w.getvalue()
        out += frame + _crc16(frame).to_bytes(2, "big")

    return bytes(out)

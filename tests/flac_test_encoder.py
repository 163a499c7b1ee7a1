"""Minimal FLAC *encoder* used only to test the native decoder.

Produces well-formed FLAC streams exercising every decode path: constant,
verbatim, fixed(0-4) and LPC subframes, Rice residual partitions (methods 0/1
and escape codes), and stereo mid/side decorrelation.  Compression quality is
irrelevant — the decoder must invert these streams exactly.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        self.write(0, q) if q else None
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(bw: BitWriter, n: int):
    if n < 0x80:
        bw.write(n, 8)
    elif n < 0x800:
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)
    else:
        bw.write(0xE0 | (n >> 12), 8)
        bw.write(0x80 | ((n >> 6) & 0x3F), 8)
        bw.write(0x80 | (n & 0x3F), 8)


def _rice_encode(bw: BitWriter, residuals, param: int, method: int = 0):
    plen = 4 if method == 0 else 5
    bw.write(param, plen)
    for v in residuals:
        v = int(v)
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        q, r = u >> param, u & ((1 << param) - 1)
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if param:
            bw.write(r, param)


def _write_residual(bw: BitWriter, residuals, blocksize, pred_order,
                    param=3, method=0, part_order=0, escape=False):
    bw.write(method, 2)
    bw.write(part_order, 4)
    parts = 1 << part_order
    psize = blocksize // parts
    idx = 0
    for p in range(parts):
        count = psize - (pred_order if p == 0 else 0)
        chunk = residuals[idx : idx + count]
        idx += count
        if escape:
            nbits = 18
            bw.write(0xF if method == 0 else 0x1F, 4 if method == 0 else 5)
            bw.write(nbits, 5)
            for v in chunk:
                bw.write_signed(int(v), nbits)
        else:
            _rice_encode(bw, chunk, param, method)


def _write_subframe(bw: BitWriter, samples, bps, kind, **kw):
    bw.write(0, 1)  # pad
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(int(samples[0]), bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in samples:
            bw.write_signed(int(v), bps)
    elif kind == "fixed":
        order = kw.get("order", 2)
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        s = np.asarray(samples, dtype=np.int64)
        for i in range(order):
            bw.write_signed(int(s[i]), bps)
        res = s.copy()
        for _ in range(order):
            res = np.diff(res)
        _write_residual(bw, res, len(s), order, **{k: v for k, v in kw.items() if k != "order"})
    elif kind == "lpc":
        order = kw.get("order", 2)
        coeffs = kw.get("coeffs", [1] * order)
        shift = kw.get("shift", 0)
        prec = kw.get("prec", 12)
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        s = np.asarray(samples, dtype=np.int64)
        for i in range(order):
            bw.write_signed(int(s[i]), bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coeffs:
            bw.write_signed(int(c), prec)
        res = []
        for i in range(order, len(s)):
            pred = sum(int(coeffs[j]) * int(s[i - 1 - j]) for j in range(order)) >> shift
            res.append(int(s[i]) - pred)
        _write_residual(bw, res, len(s), order,
                        **{k: v for k, v in kw.items() if k not in ("order", "coeffs", "shift", "prec")})
    bw  # noqa


def encode_flac(
    channels_samples,  # list of 1-D int arrays, all same length (one per channel)
    sample_rate=16000,
    bps=16,
    blocksize=None,
    subframe_kind="verbatim",
    subframe_kw=None,
    channel_mode="independent",  # 'independent' | 'mid_side'
) -> bytes:
    subframe_kw = subframe_kw or {}
    chans = [np.asarray(c, dtype=np.int64) for c in channels_samples]
    n = len(chans[0])
    nch = len(chans)
    blocksize = blocksize or n

    bw = BitWriter()
    bw.bytes += b"fLaC"
    # STREAMINFO, last metadata block
    bw.write(1, 1)
    bw.write(0, 7)
    bw.write(34, 24)
    bw.write(blocksize, 16)
    bw.write(blocksize, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(nch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)

    frame_no = 0
    for start in range(0, n, blocksize):
        bs = min(blocksize, n - start)
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit at end
        bw.write(0, 4)  # sample rate from streaminfo
        if channel_mode == "mid_side" and nch == 2:
            bw.write(10, 4)
        else:
            bw.write(nch - 1, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _utf8_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 (decoder does not verify)

        blocks = [c[start : start + bs] for c in chans]
        if channel_mode == "mid_side" and nch == 2:
            l, r = blocks
            mid = (l + r) >> 1
            side = l - r
            _write_subframe(bw, mid, bps, subframe_kind, **subframe_kw)
            _write_subframe(bw, side, bps + 1, subframe_kind, **subframe_kw)
        else:
            for c in blocks:
                _write_subframe(bw, c, bps, subframe_kind, **subframe_kw)
        bw.align()
        bw.write(0, 16)  # CRC-16 (decoder does not verify)
        frame_no += 1
    return bw.getvalue()

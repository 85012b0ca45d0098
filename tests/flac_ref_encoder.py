"""Minimal first-party FLAC *encoder* — test fixture generator only.

Produces spec-valid FLAC streams (correct CRCs, UTF-8 frame numbers)
covering every decoder path we implement: CONSTANT / VERBATIM / FIXED /
LPC subframes, Rice residuals incl. escape partitions, and all stereo
decorrelation modes.  Exists so ``tests/test_flac.py`` can round-trip
the native decoder without any third-party codec in the image.
"""
from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self._bits: list = []

    def write(self, value: int, nbits: int):
        value &= (1 << nbits) - 1 if nbits else 0
        for i in range(nbits - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        self._bits.extend([0] * q)
        self._bits.append(1)

    def align(self):
        while len(self._bits) % 8:
            self._bits.append(0)

    def to_bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(bw: BitWriter, n: int):
    if n < 0x80:
        bw.write(n, 8)
        return
    # multi-byte form
    for total in range(2, 8):
        if n < (1 << (total * 5 + 1)):
            break
    lead = (0xFF << (8 - total)) & 0xFF | (n >> (6 * (total - 1)))
    bw.write(lead & 0xFF, 8)
    for i in range(total - 2, -1, -1):
        bw.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_encode(bw: BitWriter, residuals, force_escape=False):
    """One partition-order-0 residual block, method 0 (4-bit params)."""
    bw.write(0, 2)  # coding method 0
    bw.write(0, 4)  # partition order 0
    zig = [(r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1 for r in
           [int(v) for v in residuals]]
    zig = [((int(r) << 1) if r >= 0 else ((-int(r)) << 1) - 1) for r in residuals]
    if force_escape:
        raw_bits = max(int(v).bit_length() + 1 for v in residuals) if len(residuals) else 2
        raw_bits = max(raw_bits, 2)
        bw.write(0xF, 4)          # escape code
        bw.write(raw_bits, 5)
        for r in residuals:
            bw.write_signed(int(r), raw_bits)
        return
    mean = (sum(zig) / max(len(zig), 1)) if zig else 0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    while zig and max(zig) >> p > 1 << 12 and p < 14:
        p += 1  # bound quotients
    bw.write(p, 4)
    for v in zig:
        bw.write_unary(v >> p)
        bw.write(v & ((1 << p) - 1), p)


def _subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str,
              wasted: int = 0, escape: bool = False):
    x = np.asarray(x, np.int64)
    if wasted:
        assert np.all(x % (1 << wasted) == 0)
        x = x >> wasted
        eff_bps = bps - wasted
    else:
        eff_bps = bps
    bw.write(0, 1)  # padding
    if kind == "constant":
        assert np.all(x == x[0])
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(0x08 | order, 6)
    elif kind == "lpc2":
        order = 2
        bw.write(0x20 | (order - 1), 6)
    else:
        raise ValueError(kind)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)

    if kind == "constant":
        bw.write_signed(int(x[0]), eff_bps)
    elif kind == "verbatim":
        for v in x:
            bw.write_signed(int(v), eff_bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        coefs = _FIXED_COEFS[order]
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        res = [int(x[i]) - sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
               for i in range(order, len(x))]
        _rice_encode(bw, res, force_escape=escape)
    elif kind == "lpc2":
        order, precision, shift = 2, 12, 10
        coefs = [int(1.5 * (1 << shift)), int(-0.6 * (1 << shift))]
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = [int(x[i]) - ((coefs[0] * int(x[i - 1]) + coefs[1] * int(x[i - 2]))
                            >> shift)
               for i in range(order, len(x))]
        _rice_encode(bw, res, force_escape=escape)


def encode_flac(samples: np.ndarray, sr: int, bits: int = 16,
                block_size: int = 1024, kind: str = "fixed2",
                stereo: str = "independent", wasted: int = 0,
                escape: bool = False) -> bytes:
    """samples: [n] mono or [n, 2] stereo int PCM at ``bits`` depth."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)
    payload = si.to_bytes()
    out += bytes([0x80]) + len(payload).to_bytes(3, "big") + payload

    frame_idx = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)     # reserved
        bw.write(0, 1)     # fixed blocking
        bw.write(7, 4)     # 16-bit block size at end
        bw.write(0, 4)     # sample rate: from STREAMINFO
        if channels == 1 or stereo == "independent":
            assign = channels - 1
        else:
            assign = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo]
        bw.write(assign, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
        bw.write(0, 1)     # reserved
        _utf8_number(bw, frame_idx)
        bw.write(bs - 1, 16)
        header = bw.to_bytes()  # byte-aligned here by construction
        bw2 = BitWriter()
        for b in header:
            bw2.write(b, 8)
        bw2.write(crc8(header), 8)

        if channels == 1 or stereo == "independent":
            subs = [(blk[:, c], bits) for c in range(channels)]
        else:
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            if stereo == "left_side":
                subs = [(l, bits), (side, bits + 1)]
            elif stereo == "right_side":
                subs = [(side, bits + 1), (r, bits)]
            else:  # mid_side
                mid = (l + r) >> 1
                subs = [(mid, bits), (side, bits + 1)]
        for c, (sig, bps) in enumerate(subs):
            k = kind
            if kind.startswith("fixed") and bs <= int(kind[-1]):
                k = "verbatim"
            _subframe(bw2, sig, bps, k, wasted=wasted if c == 0 else 0,
                      escape=escape)
        bw2.align()
        frame = bw2.to_bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
        frame_idx += 1
    return bytes(out)

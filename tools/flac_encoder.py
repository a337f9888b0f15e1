"""Minimal FLAC encoder for test fixtures.

The build environment has no flac/ffmpeg binaries, so the native decoder
(native/dvc_flac.cpp) is tested against files produced here.  The encoder
writes spec-valid FLAC using a selectable subframe strategy per frame —
CONSTANT, VERBATIM, FIXED order 2 with Rice residuals, or LPC order 1 —
which covers every decode path.  16-bit PCM, mono or independent stereo.
Deliberately simple, not size-optimal.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        assert bits >= 0 and 0 <= value < (1 << bits) if bits else value == 0
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_extra = 1
    while bits > 6 * n_extra + (6 - n_extra):
        n_extra += 1
    lead = (0xFF << (7 - n_extra)) & 0xFF
    shifted = n >> (6 * n_extra)
    out.append(lead | shifted)
    for i in range(n_extra - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v.astype(np.int64) << 1, ((-v.astype(np.int64)) << 1) - 1)


def _write_rice_residual(bw: _BitWriter, resid: np.ndarray):
    """Single-partition 4-bit Rice coding with a max-bits-bounded parameter."""
    z = _zigzag(resid)
    mean = max(1.0, float(z.mean()) if len(z) else 1.0)
    k = min(14, max(0, int(np.log2(mean + 1))))
    bw.write(0, 2)   # coding method: 4-bit rice
    bw.write(0, 4)   # partition order 0
    bw.write(k, 4)
    for v in z:
        q = int(v) >> k
        if q > 4096:  # pathological residual: re-encode partition escaped
            raise OverflowError("rice quotient too large")
        bw.write_unary(q)
        bw.write(int(v) & ((1 << k) - 1), k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, mode: str):
    x = x.astype(np.int64)
    bw.write(0, 1)  # padding
    if mode == "constant":
        assert (x == x[0]).all()
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
        return
    if mode == "verbatim":
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
        return
    if mode == "fixed2":
        order = min(2, len(x) - 1)
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        if order == 2:
            resid = x[2:] - 2 * x[1:-1] + x[:-2]
        elif order == 1:
            resid = x[1:] - x[:-1]
        else:
            resid = x
        _write_rice_residual(bw, resid)
        return
    if mode == "lpc1":
        # LPC order 1, coefficient 1, shift 0, precision 4 -> first difference
        bw.write(0b100000, 6)  # LPC order 1 (0b1xxxxx, xxxxx = order-1 = 0)
        bw.write(0, 1)
        bw.write_signed(int(x[0]), bps)
        bw.write(3, 4)          # precision-1 = 3 -> 4 bits
        bw.write_signed(0, 5)   # shift 0
        bw.write_signed(1, 4)   # coefficient = 1
        _write_rice_residual(bw, x[1:] - x[:-1])
        return
    raise ValueError(mode)


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def write_flac(path: str, wav: np.ndarray, sample_rate: int = 16_000,
               blocksize: int = 4096, mode: str = "fixed2",
               frame_bps: int = 16):
    """float [-1,1] (T,) or (T, 2) -> FLAC file (STREAMINFO says 16-bit).

    frame_bps != 16 writes every frame with a per-frame sample-size
    override (spec-legal; frames carry integers at that width) — exercises
    the decoder's ss_code path and its per-frame scaling."""
    wav = np.asarray(wav)
    if wav.ndim == 1:
        wav = wav[:, None]
    channels = wav.shape[1]
    assert channels in (1, 2)
    pcm = np.clip(np.round(wav * 32767.0), -32768, 32767).astype(np.int64)
    if frame_bps >= 16:
        pcm = pcm << (frame_bps - 16)
    else:
        pcm = pcm >> (16 - frame_bps)
    total = len(pcm)

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(blocksize, 16)          # min block size
    info.write(blocksize, 16)          # max block size
    info.write(0, 24)                  # min frame size (unknown)
    info.write(0, 24)                  # max frame size (unknown)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(15, 5)                  # bps-1 = 15
    info.write(total & ((1 << 36) - 1), 36)
    body = info.getvalue() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, total, blocksize):
        block = pcm[start:start + blocksize]
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)                # reserved
        hdr.write(0, 1)                # fixed blocking
        hdr.write(7, 4)                # block size: explicit 16-bit
        hdr.write(14, 4)               # sample rate: explicit 16-bit, 10s of Hz
        hdr.write(channels - 1, 4)     # independent channels
        hdr.write(_SS_CODE[frame_bps], 3)
        hdr.write(0, 1)                # reserved
        hdr.align()
        head = hdr.getvalue() + _utf8_number(frame_no)
        tail = _BitWriter()
        tail.write(bs - 1, 16)
        tail.write(sample_rate // 10, 16)
        head += tail.getvalue()
        head += bytes([_crc8(head)])

        bw = _BitWriter()
        for c in range(channels):
            x = block[:, c]
            m = mode
            if m != "verbatim" and (x == x[0]).all():
                m = "constant"
            try:
                _encode_subframe(bw, x, frame_bps, m)
            except OverflowError:
                bw = _BitWriter()  # retry the whole frame verbatim
                for c2 in range(channels):
                    _encode_subframe(bw, block[:, c2], frame_bps, "verbatim")
                break
        bw.align()
        frame = head + bw.getvalue()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1

    with open(path, "wb") as f:
        f.write(bytes(out))

"""Audio fixture generators for decoder tests.

Builds WAV files in every supported sample format (plus RF64 and EXTENSIBLE
headers) and minimal-but-valid FLAC files (verbatim and constant subframes,
correct CRC-8/CRC-16) so the native decoders are exercised without any
committed binary fixtures — mirroring the reference's generated-fixture
strategy (``tests/fixtures/make_fixture_geomodel.py``).
"""

from __future__ import annotations

import struct

import numpy as np


def write_wav(path, samples: np.ndarray, rate: int, fmt: str = "s16",
              channels: int = 1, extensible: bool = False, rf64: bool = False,
              lie_data_size: int | None = None):
    """Write a WAV file. ``samples`` is [n] mono or [n, channels] float in [-1,1]."""
    samples = np.asarray(samples, np.float64)
    if samples.ndim == 1:
        samples = np.tile(samples[:, None], (1, channels))
    n, ch = samples.shape

    if fmt == "u8":
        raw = (np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        bits, tag = 8, 1
    elif fmt == "s16":
        raw = (np.clip(samples, -1, 1) * 32767).round().astype("<i2").tobytes()
        bits, tag = 16, 1
    elif fmt == "s24":
        v = (np.clip(samples, -1, 1) * 8388607).round().astype(np.int64)
        b = np.empty((n * ch, 3), np.uint8)
        flat = v.reshape(-1) & 0xFFFFFF
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        raw = b.tobytes()
        bits, tag = 24, 1
    elif fmt == "s32":
        raw = (np.clip(samples, -1, 1) * 2147483647).round().astype("<i4").tobytes()
        bits, tag = 32, 1
    elif fmt == "f32":
        raw = samples.astype("<f4").tobytes()
        bits, tag = 32, 3
    elif fmt == "f64":
        raw = samples.astype("<f8").tobytes()
        bits, tag = 64, 3
    else:
        raise ValueError(fmt)

    block = ch * bits // 8
    data_size = lie_data_size if lie_data_size is not None else len(raw)

    if extensible:
        sub = struct.pack("<H", tag) + bytes(
            [0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
             0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        fmt_body = struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * block, block, bits)
        fmt_body += struct.pack("<HHI", 22, bits, 0x4) + sub
    else:
        fmt_body = struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits)

    with open(path, "wb") as f:
        if rf64:
            f.write(b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE")
            ds64 = struct.pack("<QQQI", 0, len(raw), n, 0)
            f.write(b"ds64" + struct.pack("<I", len(ds64)) + ds64)
            f.write(b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body)
            f.write(b"data" + struct.pack("<I", 0xFFFFFFFF))
            f.write(raw)
        else:
            riff_size = 4 + 8 + len(fmt_body) + 8 + len(raw)
            f.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
            f.write(b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body)
            f.write(b"data" + struct.pack("<I", data_size))
            f.write(raw)


# ---------------------------------------------------------------------------
# Minimal FLAC encoder (test-only): verbatim / constant subframes.
# ---------------------------------------------------------------------------

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


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_ordinal(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        lead, shift = 0xC0, 6
    elif n < 0x10000:
        lead, shift = 0xE0, 12
    else:
        lead, shift = 0xF0, 18
    out.append(lead | (n >> shift))
    while shift > 0:
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_residual(bw: "_BitWriter", residuals, order: int):
    """Partitioned-Rice residual block: method 0 (4-bit params), partition
    order 0, one adaptively-chosen Rice parameter."""
    bw.write(0, 2)   # method 0: 4-bit rice params
    bw.write(0, 4)   # partition order 0
    us = [(int(r) << 1) if r >= 0 else ((-int(r)) << 1) - 1
          for r in residuals]
    mean = (sum(us) / len(us)) if us else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    bw.write(k, 4)
    for u in us:
        q = u >> k
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if k:
            bw.write(u & ((1 << k) - 1), k)
    del order  # partition order 0: the warmup offset is implicit


#: FLAC fixed-predictor coefficients (same table as the decoder).
_FLAC_FIXED = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _write_subframe(bw: "_BitWriter", x, bits: int, mode: str,
                    order: int = 2):
    """One subframe in the requested coding: verbatim/constant/fixed/lpc.
    fixed/lpc are exact integer transforms, so the decode roundtrip must be
    bit-exact."""
    bw.write(0, 1)  # padding
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(x[0]), bits)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bits)
        return
    if mode == "fixed":
        assert 0 <= order <= 4
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bits)
        coef = _FLAC_FIXED[order]
        res = [int(x[i]) - sum(c * int(x[i - 1 - j])
                               for j, c in enumerate(coef))
               for i in range(order, len(x))]
        _rice_residual(bw, res, order)
        return
    if mode == "lpc":
        # Order-2 predictor pred = (2*x[i-1] - x[i-2]) with shift 9:
        # coefs [1024, -512], precision 12 — exercises the quantized-LPC
        # reconstruction path real encoders emit.
        order, shift, precision = 2, 9, 12
        coefs = [2 << shift, -(1 << shift)]
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bits)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, precision)
        res = [int(x[i]) - ((sum(c * int(x[i - 1 - j])
                                 for j, c in enumerate(coefs))) >> shift)
               for i in range(order, len(x))]
        _rice_residual(bw, res, order)
        return
    raise ValueError(mode)


def write_flac(path, samples: np.ndarray, rate: int, channels: int = 1,
               block_size: int = 4096, constant: bool = False,
               subframe: str | None = None, stereo_mode: str | None = None,
               fixed_order: int = 2):
    """Write a FLAC file (16-bit). ``subframe`` picks the coding
    (verbatim/constant/fixed/lpc; default verbatim, or constant when the
    legacy flag is set); ``stereo_mode`` adds inter-channel decorrelation
    (left-side/right-side/mid-side, stereo input only)."""
    subframe = subframe or ("constant" if constant else "verbatim")
    samples = np.asarray(samples, np.float64)
    if samples.ndim == 1:
        samples = np.tile(samples[:, None], (1, channels))
    pcm = (np.clip(samples, -1, 1) * 32767).round().astype(np.int64)
    n, ch = pcm.shape
    if stereo_mode is not None:
        assert ch == 2, "stereo_mode needs 2 channels"

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)      # min block size
    si.write(block_size, 16)      # max block size
    si.write(0, 24)               # min frame size (unknown)
    si.write(0, 24)               # max frame size
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    body = bytes(si.bytes) + bytes(16)  # MD5 zeros
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    for start in range(0, n, block_size):
        blk = pcm[start : start + block_size]
        bs = len(blk)
        ch_code = {None: ch - 1, "left-side": 8, "right-side": 9,
                   "mid-side": 10}[stereo_mode]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)                  # reserved
        hdr.write(0, 1)                  # fixed blocksize strategy
        hdr.write(7, 4)                  # blocksize: 16-bit value follows
        hdr.write(0, 4)                  # sample rate: from STREAMINFO
        hdr.write(ch_code, 4)
        hdr.write(4, 3)                  # 16 bits/sample
        hdr.write(0, 1)                  # reserved
        hdr.align()
        header = bytes(hdr.bytes) + _utf8_ordinal(frame_idx)
        header += struct.pack(">H", bs - 1)
        header += bytes([_crc8(header)])

        # Channel streams: decorrelated pairs carry the side channel at
        # bits+1 (the decoder's reconstruction is exact).
        if stereo_mode is None:
            streams = [(blk[:, c], 16) for c in range(ch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left-side":
                streams = [(left, 16), (side, 17)]
            elif stereo_mode == "right-side":
                streams = [(side, 17), (right, 16)]
            else:  # mid-side
                mid = (left + right) >> 1
                streams = [(mid, 16), (side, 17)]

        bw = _BitWriter()
        for x, bits in streams:
            _write_subframe(bw, x, bits, subframe, order=fixed_order)
        bw.align()
        frame = header + bytes(bw.bytes)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(out)


# ---------------------------------------------------------------------------
# MP3 fixture encoder via the system libmp3lame (ctypes).
# ---------------------------------------------------------------------------

def write_mp3(path, samples: np.ndarray, rate: int) -> bool:
    """Encode mono float samples to MP3 via libmp3lame. Returns False when
    the library is unavailable (callers skip)."""
    import ctypes

    try:
        lame = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        return False

    lame.lame_init.restype = ctypes.c_void_p
    gf = lame.lame_init()
    lame.lame_set_in_samplerate(ctypes.c_void_p(gf), rate)
    lame.lame_set_num_channels(ctypes.c_void_p(gf), 1)
    lame.lame_set_mode(ctypes.c_void_p(gf), 3)  # MONO
    lame.lame_set_brate(ctypes.c_void_p(gf), 128)
    if lame.lame_init_params(ctypes.c_void_p(gf)) < 0:
        return False

    pcm = (np.clip(np.asarray(samples, np.float64), -1, 1) * 32767).astype(
        np.int16
    )
    n = len(pcm)
    out_size = int(1.25 * n + 7200)
    out = ctypes.create_string_buffer(out_size)
    written = lame.lame_encode_buffer(
        ctypes.c_void_p(gf),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),  # right = left
        n, out, out_size,
    )
    if written < 0:
        return False
    data = out.raw[:written]
    flush = ctypes.create_string_buffer(7200)
    fwritten = lame.lame_encode_flush(ctypes.c_void_p(gf), flush, 7200)
    data += flush.raw[:max(fwritten, 0)]
    lame.lame_close(ctypes.c_void_p(gf))
    with open(path, "wb") as f:
        f.write(data)
    return True

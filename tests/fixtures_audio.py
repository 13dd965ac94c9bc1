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


def write_flac(path, samples: np.ndarray, rate: int, channels: int = 1,
               block_size: int = 4096, constant: bool = False):
    """Write a FLAC file (16-bit, verbatim subframes; constant if requested)."""
    samples = np.asarray(samples, np.float64)
    if samples.ndim == 1:
        samples = np.tile(samples[:, None], (1, channels))
    pcm = (np.clip(samples, -1, 1) * 32767).round().astype(np.int64)
    n, ch = pcm.shape

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
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)                  # reserved
        hdr.write(0, 1)                  # fixed blocksize strategy
        hdr.write(7, 4)                  # blocksize: 16-bit value follows
        hdr.write(0, 4)                  # sample rate: from STREAMINFO
        hdr.write(ch - 1, 4)             # independent channels
        hdr.write(4, 3)                  # 16 bits/sample
        hdr.write(0, 1)                  # reserved
        hdr.align()
        header = bytes(hdr.bytes) + _utf8_ordinal(frame_idx)
        header += struct.pack(">H", bs - 1)
        header += bytes([_crc8(header)])

        bw = _BitWriter()
        for c in range(ch):
            if constant:
                bw.write(0, 1)       # padding
                bw.write(0, 6)       # CONSTANT
                bw.write(0, 1)       # no wasted bits
                bw.write(int(blk[0, c]), 16)
            else:
                bw.write(0, 1)
                bw.write(1, 6)       # VERBATIM
                bw.write(0, 1)
                for v in blk[:, c]:
                    bw.write(int(v), 16)
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

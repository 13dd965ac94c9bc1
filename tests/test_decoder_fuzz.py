"""Mutation-robustness tests for the native decoders.

The C++ WAV/FLAC decoders parse attacker-controllable bytes across a ctypes
boundary; a malformed file must surface as a typed error (or decode what is
salvageable) — never crash the process, hang, or return garbage shapes.
Seeded byte mutations + truncations of valid fixtures approximate the
corpus-fuzz the reference gets for free from symphonia's own fuzzing.
"""

import numpy as np
import pytest

from birda_tpu.audio.decode import StreamingDecoder, decode_audio_file
from birda_tpu.errors import BirdaError

from fixtures_audio import write_flac, write_wav


def _tone(rate, secs=1.0):
    t = np.arange(int(rate * secs)) / rate
    return (0.4 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)


def _mutations(data: bytes, rng, n):
    """Yield n seeded corruptions: byte flips, block zeroing, truncation,
    and header-area scribbles (where parsers index most)."""
    for i in range(n):
        buf = bytearray(data)
        kind = i % 4
        if kind == 0:  # random byte flips
            for _ in range(rng.integers(1, 16)):
                buf[rng.integers(0, len(buf))] ^= int(rng.integers(1, 256))
        elif kind == 1:  # zero a block
            start = int(rng.integers(0, len(buf)))
            end = min(len(buf), start + int(rng.integers(1, 512)))
            buf[start:end] = bytes(end - start)
        elif kind == 2:  # truncate
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:  # scribble over the header region
            for _ in range(rng.integers(1, 8)):
                buf[rng.integers(0, min(128, len(buf)))] = int(
                    rng.integers(0, 256))
        yield bytes(buf)


def _exercise(path):
    """Open + stream + seek; any outcome but a crash/garbage is fine."""
    try:
        with StreamingDecoder(path) as dec:
            assert dec.sample_rate > 0
            total = 0
            while total < 10_000_000:  # hang guard: bounded samples
                seg = dec.next_segment(4096, 0)
                if seg is None:
                    break
                assert seg.samples.shape == (4096,)
                assert seg.samples.dtype == np.float32
                total += 4096
            else:
                pytest.fail("decoder produced >10M samples from a 1 s file")
        decode_audio_file(path)
    except BirdaError:
        pass  # typed rejection is a correct outcome


@pytest.mark.parametrize("fmt", ["s16", "s24", "f32"])
def test_wav_mutations_never_crash(tmp_path, fmt):
    rate = 32_000
    p = tmp_path / "ok.wav"
    write_wav(p, _tone(rate), rate, fmt=fmt)
    data = p.read_bytes()
    rng = np.random.default_rng(hash(fmt) % 2**31)
    for i, mutated in enumerate(_mutations(data, rng, 24)):
        q = tmp_path / f"m{i}.wav"
        q.write_bytes(mutated)
        _exercise(q)


def test_flac_mutations_never_crash(tmp_path):
    rate = 32_000
    p = tmp_path / "ok.flac"
    write_flac(p, _tone(rate), rate)
    data = p.read_bytes()
    rng = np.random.default_rng(99)
    for i, mutated in enumerate(_mutations(data, rng, 32)):
        q = tmp_path / f"m{i}.flac"
        q.write_bytes(mutated)
        _exercise(q)


def test_flac_mutations_with_seek(tmp_path):
    """Seek paths walk the sync-code binary search over corrupt bytes."""
    rate = 32_000
    p = tmp_path / "ok.flac"
    write_flac(p, _tone(rate, secs=2.0), rate)
    data = p.read_bytes()
    rng = np.random.default_rng(7)
    for i, mutated in enumerate(_mutations(data, rng, 16)):
        q = tmp_path / f"s{i}.flac"
        q.write_bytes(mutated)
        try:
            with StreamingDecoder(q) as dec:
                if dec.exact_seek:
                    dec.seek_exact(rate)  # land mid-file
                    dec.next_segment(2048, 0)
        except BirdaError:
            pass


def test_flac_predictor_mutations_never_crash(tmp_path):
    """FIXED/LPC + Rice frames have far more parse states (unary runs,
    partition orders, precision/shift fields) than verbatim — mutate them
    too."""
    rate = 32_000
    rng = np.random.default_rng(1234)
    for coding, extra in (("fixed", {"fixed_order": 3}), ("lpc", {})):
        p = tmp_path / f"ok-{coding}.flac"
        write_flac(p, _tone(rate), rate, subframe=coding, **extra)
        data = p.read_bytes()
        for i, mutated in enumerate(_mutations(data, rng, 24)):
            q = tmp_path / f"p{coding}{i}.flac"
            q.write_bytes(mutated)
            _exercise(q)


def test_mp3_mutations_never_crash(tmp_path):
    """The FFmpeg-backed path: mutated MP3 bitstreams must also surface as
    typed errors or salvage decode, never crash the process."""
    from fixtures_audio import write_mp3

    rate = 32_000
    p = tmp_path / "ok.mp3"
    if not write_mp3(p, _tone(rate), rate):
        pytest.skip("no MP3 encoder available")
    data = p.read_bytes()
    rng = np.random.default_rng(5)
    for i, mutated in enumerate(_mutations(data, rng, 16)):
        q = tmp_path / f"m{i}.mp3"
        q.write_bytes(mutated)
        _exercise(q)


def test_wav_fallback_reader_mutations_are_typed(tmp_path, monkeypatch):
    """The pure-Python fallback parser (native lib absent) must reject
    malformed headers as IOError -> typed AudioOpen, never raw struct/
    arithmetic tracebacks that would abort a batch run."""
    from birda_tpu.native import audio as native_audio

    monkeypatch.setattr(native_audio, "available", lambda: False)
    rate = 32_000
    p = tmp_path / "ok.wav"
    write_wav(p, _tone(rate), rate)
    data = p.read_bytes()
    rng = np.random.default_rng(13)
    for i, mutated in enumerate(_mutations(data, rng, 24)):
        q = tmp_path / f"f{i}.wav"
        q.write_bytes(mutated)
        _exercise(q)
    # Directed RF64 header attacks (the struct-error paths).
    rf64 = bytearray(data)
    rf64[0:4] = b"RF64"
    hdr = tmp_path / "rf64-trunc-ds64.wav"
    # ds64 chunk declaring size 4 (needs >= 16).
    hdr.write_bytes(bytes(rf64[:12]) + b"ds64" + (4).to_bytes(4, "little")
                    + b"\x00" * 4 + bytes(rf64[12:]))
    _exercise(hdr)
    nodata = tmp_path / "rf64-no-ds64.wav"
    # data chunk with the RF64 0xFFFFFFFF sentinel but no ds64 chunk.
    blob = bytes(rf64[:12]) + b"fmt " + (16).to_bytes(4, "little") + \
        data[20:36] + b"data" + b"\xff\xff\xff\xff" + b"\x00" * 64
    nodata.write_bytes(blob)
    _exercise(nodata)


def test_empty_and_tiny_files(tmp_path):
    for name, content in [
        ("empty.wav", b""), ("tiny.wav", b"RI"),
        ("empty.flac", b""), ("tiny.flac", b"fLa"),
        ("hdr.flac", b"fLaC"), ("hdr.wav", b"RIFF\x00\x00\x00\x00WAVE"),
    ]:
        p = tmp_path / name
        p.write_bytes(content)
        _exercise(p)

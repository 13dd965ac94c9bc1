"""Decoder tests: native WAV/RF64/FLAC + Python fallback + windowing."""

import numpy as np
import pytest

from birda_tpu.audio.decode import (
    StreamingDecoder,
    decode_audio_file,
    get_audio_duration,
)
from birda_tpu.audio.wav_fallback import WavFallbackReader
from birda_tpu.errors import AudioOpen, Internal, UnsupportedAudioFormat
from birda_tpu.native import audio as native_audio

from fixtures_audio import write_flac, write_wav


def tone(rate, secs, freq=1000.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


needs_native = pytest.mark.skipif(
    not native_audio.available(), reason="native audio library not built"
)


class TestWavFormats:
    @pytest.mark.parametrize("fmt,tol", [
        ("u8", 2e-2), ("s16", 1e-4), ("s24", 1e-6), ("s32", 1e-7),
        ("f32", 1e-7), ("f64", 1e-7),
    ])
    def test_roundtrip(self, tmp_path, fmt, tol):
        x = tone(48000, 0.25)
        p = tmp_path / f"{fmt}.wav"
        write_wav(p, x, 48000, fmt=fmt)
        dec = decode_audio_file(p)
        assert dec.sample_rate == 48000
        assert len(dec.samples) == len(x)
        assert np.max(np.abs(dec.samples - x)) < tol

    def test_stereo_downmix(self, tmp_path):
        n = 4800
        left = np.full(n, 0.5, np.float32)
        right = np.full(n, -0.1, np.float32)
        p = tmp_path / "stereo.wav"
        write_wav(p, np.stack([left, right], 1), 48000, fmt="s16")
        dec = decode_audio_file(p)
        assert np.allclose(dec.samples, 0.2, atol=1e-3)

    def test_extensible(self, tmp_path):
        x = tone(44100, 0.1)
        p = tmp_path / "ext.wav"
        write_wav(p, x, 44100, fmt="s16", extensible=True)
        dec = decode_audio_file(p)
        assert dec.sample_rate == 44100
        assert np.max(np.abs(dec.samples - x)) < 1e-4

    def test_rf64(self, tmp_path):
        x = tone(32000, 0.1)
        p = tmp_path / "rf64.wav"
        write_wav(p, x, 32000, fmt="s16", rf64=True)
        dec = decode_audio_file(p)
        assert dec.sample_rate == 32000
        assert len(dec.samples) == len(x)

    def test_lying_data_size_clamped(self, tmp_path):
        # A header declaring more data than the file holds must not blow up
        # (reference hardening for issue #310).
        x = tone(48000, 0.05)
        p = tmp_path / "liar.wav"
        write_wav(p, x, 48000, fmt="s16", lie_data_size=10**9)
        dec = decode_audio_file(p)
        assert len(dec.samples) == len(x)

    def test_duration_probe(self, tmp_path):
        p = tmp_path / "d.wav"
        write_wav(p, tone(48000, 2.0), 48000)
        assert get_audio_duration(p) == pytest.approx(2.0, abs=1e-3)

    def test_missing_file(self, tmp_path):
        with pytest.raises(AudioOpen):
            StreamingDecoder(tmp_path / "nope.wav")

    def test_garbage_file(self, tmp_path):
        p = tmp_path / "garbage.wav"
        p.write_bytes(b"not audio at all" * 10)
        with pytest.raises((AudioOpen, UnsupportedAudioFormat)):
            StreamingDecoder(p)


class TestFallbackParity:
    def test_fallback_matches_native(self, tmp_path):
        x = tone(48000, 0.2)
        p = tmp_path / "x.wav"
        write_wav(p, x, 48000, fmt="s24", channels=2)
        fb = WavFallbackReader(p)
        got_fb = fb.read(10**6)
        fb.close()
        if native_audio.available():
            nr = native_audio.NativeReader(p)
            got_nat = nr.read(10**6)
            nr.close()
            assert np.max(np.abs(got_fb - got_nat)) < 1e-6


@needs_native
class TestFlac:
    def test_verbatim_roundtrip(self, tmp_path):
        x = tone(32000, 0.5)
        p = tmp_path / "x.flac"
        write_flac(p, x, 32000)
        dec = decode_audio_file(p)
        assert dec.sample_rate == 32000
        assert len(dec.samples) == len(x)
        assert np.max(np.abs(dec.samples - x)) < 1e-4

    def test_constant_blocks(self, tmp_path):
        x = np.full(8192, 0.25, np.float32)
        p = tmp_path / "c.flac"
        write_flac(p, x, 48000, constant=True)
        dec = decode_audio_file(p)
        assert np.allclose(dec.samples, 0.25, atol=1e-3)

    def test_stereo(self, tmp_path):
        n = 8192
        x = np.stack([np.full(n, 0.5), np.full(n, -0.1)], 1)
        p = tmp_path / "s.flac"
        write_flac(p, x, 48000, channels=2)
        dec = decode_audio_file(p)
        assert np.allclose(dec.samples, 0.2, atol=1e-3)

    def test_seek(self, tmp_path):
        rate = 32000
        x = np.arange(rate, dtype=np.float32) / rate * 0.9
        p = tmp_path / "seek.flac"
        write_flac(p, x, rate)
        with StreamingDecoder(p) as dec:
            dec.seek(16000)
            got = dec.read(100)
            assert np.max(np.abs(got - x[16000:16100])) < 1e-4

    def test_duration(self, tmp_path):
        p = tmp_path / "d.flac"
        write_flac(p, tone(32000, 1.0), 32000)
        assert get_audio_duration(p) == pytest.approx(1.0, abs=1e-3)



    def test_fixed_and_lpc_rice_roundtrip(self, tmp_path):
        """FIXED(0-4) and quantized-LPC subframes with Rice residuals —
        the codings every real FLAC encoder emits (the verbatim tests
        above never touch the predictor/residual paths)."""
        rng = np.random.default_rng(7)
        x = (0.4 * np.sin(2 * np.pi * 800 * np.arange(20000) / 32000)
             + 0.02 * rng.normal(size=20000)).astype(np.float32)
        want = np.round(np.clip(x.astype(np.float64), -1, 1) * 32767) / 32768.0
        for order in range(5):
            p = tmp_path / f"f{order}.flac"
            write_flac(p, x, 32000, subframe="fixed", fixed_order=order)
            dec = decode_audio_file(p)
            assert np.max(np.abs(dec.samples - want)) < 1e-6, order
        p = tmp_path / "l.flac"
        write_flac(p, x, 32000, subframe="lpc")
        dec = decode_audio_file(p)
        assert np.max(np.abs(dec.samples - want)) < 1e-6

    def test_stereo_decorrelation_modes(self, tmp_path):
        """left-side / right-side / mid-side reconstruction is exact."""
        rng = np.random.default_rng(8)
        n = 12000
        left = 0.5 * np.sin(2 * np.pi * 600 * np.arange(n) / 48000)
        right = left * 0.7 + 0.05 * rng.normal(size=n)
        x = np.stack([left, right], 1).astype(np.float32)
        pcm = np.round(np.clip(x, -1, 1) * 32767)
        want = pcm.mean(axis=1) / 32768.0  # decoder downmixes to mono
        for mode in ("left-side", "right-side", "mid-side"):
            for coding in ("verbatim", "fixed", "lpc"):
                p = tmp_path / f"{mode}-{coding}.flac"
                write_flac(p, x, 48000, channels=2, subframe=coding,
                           stereo_mode=mode)
                dec = decode_audio_file(p)
                assert np.max(np.abs(dec.samples - want)) < 1e-4, (
                    mode, coding)

    def test_fixed_seek_is_sample_accurate(self, tmp_path):
        rate = 32000
        x = (np.arange(rate, dtype=np.float32) / rate * 0.9)
        p = tmp_path / "seekf.flac"
        write_flac(p, x, rate, subframe="fixed", fixed_order=2)
        with StreamingDecoder(p) as dec:
            dec.seek(17000)
            got = dec.read(100)
            assert np.max(np.abs(got - x[17000:17100])) < 1e-4


class TestWindowing:
    def make(self, tmp_path, secs=10.0, rate=48000):
        p = tmp_path / "w.wav"
        write_wav(p, tone(rate, secs), rate)
        return p

    def test_no_overlap(self, tmp_path):
        p = self.make(tmp_path, 9.0)
        with StreamingDecoder(p) as dec:
            segs = []
            while (s := dec.next_segment(144000, 0)) is not None:
                segs.append(s)
        assert len(segs) == 3
        assert [s.start_sample for s in segs] == [0, 144000, 288000]
        assert all(len(s.samples) == 144000 for s in segs)

    def test_tail_zero_padded(self, tmp_path):
        p = self.make(tmp_path, 10.0)  # 3+3+3+1 -> 4 windows
        with StreamingDecoder(p) as dec:
            segs = []
            while (s := dec.next_segment(144000, 0)) is not None:
                segs.append(s)
        assert len(segs) == 4
        tail = segs[-1].samples
        assert np.all(tail[48000:] == 0.0)  # 1 s real + 2 s padding
        assert np.any(tail[:48000] != 0.0)

    def test_overlap(self, tmp_path):
        p = self.make(tmp_path, 6.0)
        with StreamingDecoder(p) as dec:
            starts = []
            while (s := dec.next_segment(144000, 72000)) is not None:
                starts.append(s.start_sample)
        # step = 1.5 s => windows at 0, 1.5, 3.0, 4.5 (and the 4.5 window
        # holds the last full 1.5 s plus padding)
        assert starts[:4] == [0, 72000, 144000, 216000]

    def test_overlap_ge_segment_rejected(self, tmp_path):
        p = self.make(tmp_path, 3.0)
        with StreamingDecoder(p) as dec:
            with pytest.raises(Internal):
                dec.next_segment(1000, 1000)

    def test_window_content_matches_file(self, tmp_path):
        rate = 48000
        x = np.arange(rate * 7, dtype=np.float32) / (rate * 7)
        p = tmp_path / "content.wav"
        write_wav(p, x, rate, fmt="f32")
        with StreamingDecoder(p) as dec:
            s0 = dec.next_segment(144000, 0)
            s1 = dec.next_segment(144000, 0)
        assert np.max(np.abs(s0.samples - x[:144000])) < 1e-6
        assert np.max(np.abs(s1.samples - x[144000:288000])) < 1e-6


class TestChunker:
    def test_basic(self):
        from birda_tpu.audio.chunker import chunk_audio

        x = np.ones(48000 * 9, np.float32)
        chunks = chunk_audio(x, 48000, 3.0, 0.0)
        assert len(chunks) == 3
        assert chunks[1].start_time == 3.0
        assert chunks[1].end_time == 6.0

    def test_tail_padded(self):
        from birda_tpu.audio.chunker import chunk_audio

        x = np.ones(48000 * 4, np.float32)
        chunks = chunk_audio(x, 48000, 3.0, 0.0)
        assert len(chunks) == 2
        assert np.all(chunks[1].samples[48000:] == 0)

    def test_overlap(self):
        from birda_tpu.audio.chunker import chunk_audio

        x = np.ones(48000 * 6, np.float32)
        chunks = chunk_audio(x, 48000, 3.0, 1.5)
        assert [c.start_time for c in chunks] == [0.0, 1.5, 3.0, 4.5]

    def test_zero_step_returns_empty(self):
        from birda_tpu.audio.chunker import chunk_audio

        assert chunk_audio(np.ones(1000, np.float32), 48000, 1.0, 1.0) == []


class TestWindowEdges:
    def test_file_shorter_than_segment(self, tmp_path):
        p = tmp_path / "short.wav"
        write_wav(p, tone(48000, 0.5), 48000)
        with StreamingDecoder(p) as dec:
            s = dec.next_segment(144000, 0)
            assert s is not None
            assert len(s.samples) == 144000
            assert np.all(s.samples[24000:] == 0)
            assert dec.next_segment(144000, 0) is None

    def test_exact_multiple_no_phantom_window(self, tmp_path):
        p = tmp_path / "exact.wav"
        write_wav(p, tone(48000, 6.0), 48000)
        with StreamingDecoder(p) as dec:
            count = 0
            while dec.next_segment(144000, 0) is not None:
                count += 1
        assert count == 2

    def test_empty_file_yields_nothing(self, tmp_path):
        p = tmp_path / "empty.wav"
        write_wav(p, np.zeros(0, np.float32), 48000)
        with StreamingDecoder(p) as dec:
            assert dec.next_segment(144000, 0) is None


@needs_native
class TestMp3:
    """MP3 decode through the FFmpeg backend; fixtures encoded with the
    system libmp3lame. MP3 is lossy, so assertions are frequency-domain."""

    def make_mp3(self, tmp_path, freq=1000.0, secs=2.0, rate=44100):
        from fixtures_audio import write_mp3

        p = tmp_path / "t.mp3"
        if not write_mp3(p, tone(rate, secs, freq=freq), rate):
            pytest.skip("libmp3lame unavailable")
        return p

    def goertzel(self, s, rate, freq):
        from scipy.signal import lfilter

        s = np.asarray(s, np.float64)
        n = len(s)
        k = round(n * freq / rate)
        w = 2 * np.pi * k / n
        coeff = 2 * np.cos(w)
        out = lfilter([1.0], [1.0, -coeff, 1.0], s)
        s1, s2 = out[-1], out[-2]
        return max(s1 * s1 + s2 * s2 - coeff * s1 * s2, 0.0) / n

    def test_decode_tone(self, tmp_path):
        p = self.make_mp3(tmp_path, freq=1000.0)
        dec = decode_audio_file(p)
        assert dec.sample_rate == 44100
        # Duration within codec delay tolerance (~60 ms).
        assert abs(dec.duration_secs - 2.0) < 0.1
        body = dec.samples[len(dec.samples) // 8 : -len(dec.samples) // 8]
        at_tone = self.goertzel(body, 44100, 1000.0)
        at_other = self.goertzel(body, 44100, 3000.0)
        assert at_tone > 100 * max(at_other, 1e-9)

    def test_windowing_over_mp3(self, tmp_path):
        p = self.make_mp3(tmp_path, secs=7.0, rate=44100)
        with StreamingDecoder(p) as dec:
            count = 0
            # 3-second windows at the source rate
            while dec.next_segment(44100 * 3, 0) is not None:
                count += 1
        assert count in (3, 4)  # codec delay may add a tail window

    def test_seek(self, tmp_path):
        rate = 44100
        from fixtures_audio import write_mp3

        # Two-tone file: 0-2s at 500 Hz, 2-4s at 2000 Hz.
        t1 = tone(rate, 2.0, freq=500.0)
        t2 = tone(rate, 2.0, freq=2000.0)
        p = tmp_path / "two.mp3"
        if not write_mp3(p, np.concatenate([t1, t2]), rate):
            pytest.skip("libmp3lame unavailable")
        with StreamingDecoder(p) as dec:
            dec.seek(rate * 3)  # into the 2 kHz half
            got = dec.read(rate // 2)
            assert len(got) > 0
            at_2k = self.goertzel(got, rate, 2000.0)
            at_500 = self.goertzel(got, rate, 500.0)
            assert at_2k > 10 * max(at_500, 1e-9)

    def test_garbage_mp3(self, tmp_path):
        p = tmp_path / "junk.mp3"
        p.write_bytes(b"\x00" * 100)
        with pytest.raises((AudioOpen, UnsupportedAudioFormat)):
            StreamingDecoder(p)

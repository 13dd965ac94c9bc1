"""Parallel single-file decode: N seek-based span workers must produce the
EXACT window stream of the single decode thread (same samples, same starts,
same count — including the subtle tail-window semantics), for both
exact-seek (WAV) and coarse-seek (MP3) containers.
"""

import queue
import threading

import numpy as np
import pytest

from birda_tpu.audio.decode import StreamingDecoder
from birda_tpu.audio.parallel_decode import spawn_parallel_decode
from birda_tpu.pipeline.processor import _SENTINEL, _decode_and_stream
from fixtures_audio import write_mp3, write_wav


def _signal(n, rate, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = 0.4 * np.sin(2 * np.pi * 3000 * t) + 0.1 * rng.normal(size=n)
    return x.astype(np.float32)


def _drain(q):
    out = []
    while True:
        item = q.get()
        if item is _SENTINEL:
            return out
        if isinstance(item, BaseException):
            raise item
        out.append(item)


def _single_stream(path, seg, ovl, target_rate, target_count, resample):
    dec = StreamingDecoder(path)
    q: queue.Queue = queue.Queue()
    t = threading.Thread(
        target=_decode_and_stream,
        args=(dec, q, seg, ovl, target_rate, target_count, resample),
    )
    t.start()
    out = _drain(q)
    t.join()
    dec.close()
    return out


def _parallel_stream(path, seg, ovl, target_rate, target_count, resample,
                     workers):
    dec = StreamingDecoder(path)
    total = dec.total_frames
    dec.close()
    q: queue.Queue = queue.Queue()
    m = spawn_parallel_decode(
        path, q, _SENTINEL, total, seg, ovl,
        target_rate, target_count, resample, workers,
    )
    out = _drain(q)
    m.join()
    return out


def _assert_same(single, parallel):
    assert len(single) == len(parallel), (
        f"{len(single)} windows single vs {len(parallel)} parallel"
    )
    for i, ((s, st_s), (p, st_p)) in enumerate(zip(single, parallel)):
        assert st_s == st_p, f"window {i}: start {st_s} vs {st_p}"
        np.testing.assert_array_equal(s, p, err_msg=f"window {i}")


class TestParallelMatchesSingle:
    @pytest.mark.parametrize("workers", [2, 3, 7])
    @pytest.mark.parametrize("n_samples", [480_000, 480_001, 143_999])
    def test_wav_identical(self, tmp_path, workers, n_samples):
        path = tmp_path / "t.wav"
        write_wav(path, _signal(n_samples, 48_000), 48_000)
        args = (path, 144_000, 48_000, 48_000, 144_000, False)
        _assert_same(_single_stream(*args), _parallel_stream(*args, workers))

    def test_wav_with_overlap_and_resample(self, tmp_path):
        path = tmp_path / "t.wav"
        write_wav(path, _signal(300_000, 44_100), 44_100)
        seg = int(round(3.0 * 44_100))
        ovl = int(round(1.0 * 44_100))
        args = (path, seg, ovl, 48_000, 144_000, True)
        _assert_same(_single_stream(*args), _parallel_stream(*args, 4))

    def test_mp3_reports_inexact_seek(self, tmp_path):
        """MP3's bit reservoir makes mid-stream decode entry non-identical,
        so stateful codecs must opt OUT of parallel span decode — the
        pipeline gates on ``decoder.exact_seek``."""
        path = tmp_path / "t.mp3"
        if not write_mp3(path, _signal(400_000, 48_000), 48_000):
            pytest.skip("no mp3 encoder available")
        dec = StreamingDecoder(path)
        try:
            assert dec.exact_seek is False
        finally:
            dec.close()

    def test_wav_and_flac_report_exact_seek(self, tmp_path):
        from fixtures_audio import write_flac

        wav = tmp_path / "t.wav"
        write_wav(wav, _signal(48_000, 48_000), 48_000)
        with StreamingDecoder(wav) as dec:
            assert dec.exact_seek is True
        flac = tmp_path / "t.flac"
        write_flac(flac, _signal(48_000, 48_000), 48_000)
        with StreamingDecoder(flac) as dec:
            assert dec.exact_seek is True

    def test_more_workers_than_windows(self, tmp_path):
        path = tmp_path / "t.wav"
        write_wav(path, _signal(150_000, 48_000), 48_000)  # ~2 windows
        args = (path, 144_000, 0, 48_000, 144_000, False)
        _assert_same(_single_stream(*args), _parallel_stream(*args, 8))

    def test_decode_error_travels_in_band(self, tmp_path):
        path = tmp_path / "t.wav"
        write_wav(path, _signal(480_000, 48_000), 48_000)
        data = path.read_bytes()
        path.write_bytes(data[: len(data) // 3])  # truncate mid-data
        # Either the stream simply ends early (headers clamp) or an error is
        # raised — it must not hang or silently duplicate windows.
        out = _parallel_stream(path, 144_000, 0, 48_000, 144_000, False, 4)
        starts = [st for _, st in out]
        assert starts == sorted(set(starts))


class TestEndToEnd:
    def test_process_file_parallel_equals_single(self, tmp_path):
        from birda_tpu.inference.classifier import BirdClassifier
        from birda_tpu.models.zoo import tiny_model
        from birda_tpu.pipeline.config import ProcessingConfig
        from birda_tpu.pipeline.coordinator import OutputFormat
        from birda_tpu.pipeline.processor import process_file

        path = tmp_path / "long.wav"
        write_wav(path, _signal(48_000 * 40, 48_000), 48_000)  # 40 s
        clf = BirdClassifier(tiny_model(), device="cpu",
                             min_confidence=0.0, top_k=3)

        def run(workers, outdir):
            out = tmp_path / outdir
            out.mkdir()
            cfg = ProcessingConfig(
                input_path=path, output_dir=out,
                formats=[OutputFormat.CSV], min_confidence=0.0,
                overlap=0.0, batch_size=8, decode_workers=workers,
            )
            res = process_file(clf, cfg)
            csv = (out / "long.BirdNET.results.csv").read_bytes()
            return res, csv

        res1, csv1 = run(1, "out1")
        res4, csv4 = run(4, "out4")
        assert res1.segments == res4.segments
        assert csv1 == csv4


class TestDecodeWorkerResolution:
    def test_explicit_wins(self):
        from birda_tpu.orchestrator import AnalyzeOptions, resolve_decode_workers

        assert resolve_decode_workers(AnalyzeOptions(decode_workers=3)) == 3

    def test_auto_yields_single_thread_under_cross_file_jobs(self):
        from birda_tpu.orchestrator import AnalyzeOptions, resolve_decode_workers

        assert resolve_decode_workers(
            AnalyzeOptions(decode_workers=0, jobs=4)) == 1

    def test_auto_uses_cores_for_single_job(self):
        import os

        from birda_tpu.orchestrator import AnalyzeOptions, resolve_decode_workers

        got = resolve_decode_workers(AnalyzeOptions(decode_workers=0, jobs=1))
        assert got == max(1, min(4, os.cpu_count() or 1))

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
        args=(dec, q, threading.Event(), seg, ovl, target_rate,
              target_count, resample),
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


class TestWindowCount:
    def test_emitted_window_count_matches_decoder(self, tmp_path):
        """The count helper must agree with the real decoder for tail
        geometries: off-boundary end, trailing overlap-only window, tiny
        files, zero overlap."""
        from birda_tpu.audio.decode import emitted_window_count

        rate = 32_000
        for n, seg, ovl in [
            (95_000, 15_000, 5_000),   # off-grid tail + overlap-only window
            (100_000, 15_000, 5_000),  # boundary + overlap-only window
            (90_000, 15_000, 0),       # exact, no overlap
            (12_000, 15_000, 5_000),   # shorter than one segment
            (15_000, 15_000, 5_000),   # exactly one segment
            (70_001, 16_000, 12_000),  # overlap > step
        ]:
            p = tmp_path / f"n{n}s{seg}o{ovl}.wav"
            write_wav(p, _signal(n, rate, seed=n % 7), rate)
            singles = _single_stream(p, seg, ovl, rate, seg, False)
            assert len(singles) == emitted_window_count(n, seg, ovl), (
                n, seg, ovl)

    def test_parallel_never_drops_tail_windows(self, tmp_path):
        """Regression: an underestimated window count once bounded the last
        created worker, silently dropping the final window(s)."""
        rate = 32_000
        seg, ovl = 15_000, 5_000
        n = 95_000  # 10 true windows; the old ceil() estimate said 9
        p = tmp_path / "tail.wav"
        write_wav(p, _signal(n, rate, seed=3), rate)
        singles = _single_stream(p, seg, ovl, rate, seg, False)
        for workers in (2, 3, 4, 8):
            par = _parallel_stream(p, seg, ovl, rate, seg, False, workers)
            assert [s for _, s in par] == [s for _, s in singles], workers
            for (a, _), (b, _) in zip(par, singles):
                np.testing.assert_array_equal(a, b)


class TestAbort:
    def test_abort_releases_blocked_workers(self, tmp_path):
        """A consumer that stops draining (error path) sets abort: every
        worker and the mux must exit instead of blocking forever on full
        queues with open decoder handles."""
        rate = 32_000
        p = tmp_path / "long.wav"
        write_wav(p, _signal(rate * 30, rate, seed=5), rate)
        tx: queue.Queue = queue.Queue(maxsize=2)  # tiny: mux blocks fast
        abort = threading.Event()
        dec = StreamingDecoder(p)
        total = dec.total_frames
        dec.close()
        mux = spawn_parallel_decode(
            p, tx, _SENTINEL, total, 15_000, 5_000, rate, 15_000, False,
            4, abort=abort,
        )
        # Take a couple of items, then walk away like the error path does.
        for _ in range(2):
            tx.get(timeout=10)
        abort.set()
        try:
            while True:
                tx.get_nowait()
        except queue.Empty:
            pass
        mux.join(timeout=15)
        assert not mux.is_alive()

    def test_abort_releases_single_thread_producer(self, tmp_path):
        rate = 32_000
        p = tmp_path / "long.wav"
        write_wav(p, _signal(rate * 30, rate, seed=6), rate)
        tx: queue.Queue = queue.Queue(maxsize=1)
        abort = threading.Event()
        dec = StreamingDecoder(p)
        t = threading.Thread(
            target=_decode_and_stream,
            args=(dec, tx, abort, 15_000, 5_000, rate, 15_000, False),
        )
        t.start()
        tx.get(timeout=10)  # one item, then stop draining
        abort.set()
        try:
            while True:
                tx.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=15)
        assert not t.is_alive()
        dec.close()  # safe: producer has exited


class TestErrorPathSafety:
    @pytest.mark.parametrize("workers", [1, 4])
    def test_inference_error_midfile_cleans_up_producers(self, tmp_path,
                                                         workers):
        """An inference error mid-file must surface as the typed error with
        every producer thread joined BEFORE the decoder closes — closing a
        native handle under a live read is a use-after-free that would turn
        a recoverable per-file error into a process crash."""
        from birda_tpu.errors import Inference as InferenceErr
        from birda_tpu.inference.classifier import BirdClassifier
        from birda_tpu.models.zoo import tiny_model
        from birda_tpu.pipeline.config import ProcessingConfig
        from birda_tpu.pipeline.coordinator import OutputFormat
        from birda_tpu.pipeline.processor import process_file

        path = tmp_path / "long.wav"
        write_wav(path, _signal(48_000 * 40, 48_000), 48_000)  # many windows
        clf = BirdClassifier(tiny_model(), device="cpu",
                             min_confidence=0.0, top_k=3)

        calls = {"n": 0}
        orig = clf.chunk_runner
        poisoned = []

        def poisoned_chunk_runner(*a, **kw):
            runner = orig(*a, **kw)

            def boom(*_a, **_kw):
                calls["n"] += 1
                raise InferenceErr("injected failure")

            runner.predict_chunk_async = boom  # instance shadow
            poisoned.append(runner)
            return runner

        clf.chunk_runner = poisoned_chunk_runner
        before = threading.active_count()
        cfg = ProcessingConfig(
            input_path=path, output_dir=tmp_path / "out",
            formats=[OutputFormat.CSV], min_confidence=0.0,
            overlap=0.0, batch_size=2, decode_workers=workers,
        )
        (tmp_path / "out").mkdir()
        with pytest.raises(InferenceErr):
            process_file(clf, cfg)
        assert calls["n"] == 1
        # All producer threads (decode workers + mux) must have exited.
        deadline = 15.0
        import time as _time

        t0 = _time.monotonic()
        while _time.monotonic() - t0 < deadline:
            if threading.active_count() <= before:
                break
            _time.sleep(0.1)
        leaked = [t.name for t in threading.enumerate()
                  if t.name.startswith("birda-decode")]
        assert leaked == []
        # And the file is processable again afterwards (lock released,
        # decoder handle not corrupted).
        clf.chunk_runner = orig
        for r in poisoned:  # cached runners keep the instance shadow
            del r.predict_chunk_async
        res = process_file(clf, cfg)
        assert res.segments > 0

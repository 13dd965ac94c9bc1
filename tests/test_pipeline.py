"""Pipeline tests: locking, coordinator, and the end-to-end slice
(WAV -> classifier -> output files)."""

import json
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from birda_tpu.errors import ConfigLocked, FileLocked
from birda_tpu.inference.classifier import BirdClassifier
from birda_tpu.locking.config_lock import ConfigLock
from birda_tpu.locking.file_lock import FileLock, cleanup_all_locks
from birda_tpu.models.zoo import tiny_model
from birda_tpu.pipeline.config import ProcessingConfig
from birda_tpu.pipeline.coordinator import (
    OutputFormat,
    ProcessCheck,
    collect_input_files,
    output_dir_for,
    output_path_for,
    sanitize_filename,
    should_process,
)
from birda_tpu.pipeline.processor import process_file

from fixtures_audio import write_wav


@pytest.fixture(scope="module")
def clf():
    return BirdClassifier(tiny_model(), device="cpu", min_confidence=0.0, top_k=3)


def make_audio(tmp_path, name="rec.wav", secs=7.0, rate=48000):
    p = tmp_path / name
    t = np.arange(int(rate * secs)) / rate
    x = (0.4 * np.sin(2 * np.pi * 2000.0 * t)).astype(np.float32)
    write_wav(p, x, rate)
    return p


class TestFileLock:
    def test_acquire_release(self, tmp_path):
        p = tmp_path / "a.wav"
        lock = FileLock.acquire(p, tmp_path)
        lock_path = FileLock.lock_path_for(p, tmp_path)
        assert lock_path.exists()
        info = json.loads(lock_path.read_text())
        assert info["input"].endswith("a.wav")
        assert "pid" in info and "hostname" in info
        lock.release()
        assert not lock_path.exists()

    def test_contention(self, tmp_path):
        p = tmp_path / "a.wav"
        lock = FileLock.acquire(p, tmp_path)
        with pytest.raises(FileLocked):
            FileLock.acquire(p, tmp_path)
        lock.release()
        FileLock.acquire(p, tmp_path).release()

    def test_staleness(self, tmp_path):
        import os

        p = tmp_path / "a.wav"
        lock = FileLock.acquire(p, tmp_path)
        assert not FileLock.is_stale(p, tmp_path, max_age_secs=3600)
        old = time.time() - 7200
        os.utime(lock.lock_path, (old, old))
        assert FileLock.is_stale(p, tmp_path, max_age_secs=3600)
        FileLock.remove_stale(p, tmp_path)
        assert not FileLock.is_locked(p, tmp_path)
        lock._released = True  # already gone

    def test_cleanup_all(self, tmp_path):
        locks = [
            FileLock.acquire(tmp_path / f"f{i}.wav", tmp_path) for i in range(3)
        ]
        assert cleanup_all_locks() == 3
        for lk in locks:
            assert not lk.lock_path.exists()
            lk._released = True

    def test_cleanup_spares_foreign_empty_lock(self, tmp_path):
        """A registered path that is actually a FOREIGN lock mid-creation
        (empty body: its owner created it but hasn't written the pid yet)
        must NOT be unlinked — deleting a live foreign lock causes the
        duplicate processing the lock exists to prevent. Same for a body
        naming a foreign pid, and for an unparseable body."""
        from birda_tpu.locking.file_lock import _register, _unregister

        empty = tmp_path / "a.wav.birda.lock"
        empty.write_text("")
        foreign = tmp_path / "b.wav.birda.lock"
        foreign.write_text('{"pid": 999999999}')
        garbled = tmp_path / "c.wav.birda.lock"
        garbled.write_text("not json {")
        for p in (empty, foreign, garbled):
            _register(p)
        try:
            assert cleanup_all_locks() == 0
            assert empty.exists() and foreign.exists() and garbled.exists()
        finally:
            for p in (empty, foreign, garbled):
                _unregister(p)
                p.unlink(missing_ok=True)

    def test_cleanup_removes_vanished_registration(self, tmp_path):
        """A registered path whose file is already gone is just dropped."""
        from birda_tpu.locking.file_lock import _register

        ghost = tmp_path / "gone.wav.birda.lock"
        _register(ghost)
        assert cleanup_all_locks() == 0
        assert not ghost.exists()


class TestConfigLock:
    def test_serializes(self, tmp_path):
        cfg = tmp_path / "config.toml"
        with ConfigLock(cfg):
            with pytest.raises(ConfigLocked):
                ConfigLock(cfg).acquire(timeout=0.2, retry_interval=0.05)
        with ConfigLock(cfg):
            pass

    def test_waits_for_release(self, tmp_path):
        cfg = tmp_path / "config.toml"
        first = ConfigLock(cfg).acquire()
        t = threading.Timer(0.2, first.release)
        t.start()
        second = ConfigLock(cfg).acquire(timeout=2.0)
        second.release()


class TestCoordinator:
    def test_output_dir_default_is_input_parent(self, tmp_path):
        assert output_dir_for(tmp_path / "x" / "a.wav") == tmp_path / "x"
        assert output_dir_for(tmp_path / "a.wav", tmp_path / "out") == tmp_path / "out"

    def test_output_path_extensions(self, tmp_path):
        p = output_path_for(tmp_path / "rec.wav", tmp_path, OutputFormat.CSV)
        assert p.name == "rec.BirdNET.results.csv"
        p = output_path_for(tmp_path / "rec.wav", tmp_path, OutputFormat.RAVEN)
        assert p.name == "rec.BirdNET.selection.table.txt"

    def test_sanitize(self):
        assert sanitize_filename("a/b\\c") == "a_b_c"

    def test_should_process_fresh(self, tmp_path):
        p = tmp_path / "a.wav"
        assert should_process(p, tmp_path, [OutputFormat.CSV]) == ProcessCheck.PROCESS

    def test_skip_exists_needs_all(self, tmp_path):
        p = tmp_path / "a.wav"
        output_path_for(p, tmp_path, OutputFormat.CSV).write_text("done")
        assert should_process(p, tmp_path, [OutputFormat.CSV]) == ProcessCheck.SKIP_EXISTS
        # Second format missing -> process.
        assert should_process(
            p, tmp_path, [OutputFormat.CSV, OutputFormat.RAVEN]
        ) == ProcessCheck.PROCESS
        # Force overrides.
        assert should_process(
            p, tmp_path, [OutputFormat.CSV], force=True
        ) == ProcessCheck.PROCESS

    def test_empty_formats_never_skips(self, tmp_path):
        # Reference #339: `all` over an empty list is vacuously true.
        p = tmp_path / "a.wav"
        assert should_process(p, tmp_path, []) == ProcessCheck.PROCESS

    def test_skip_locked(self, tmp_path):
        p = tmp_path / "a.wav"
        lock = FileLock.acquire(p, tmp_path)
        assert should_process(p, tmp_path, [OutputFormat.CSV]) == ProcessCheck.SKIP_LOCKED
        lock.release()

    def test_collect_recursive(self, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "a.wav").write_bytes(b"")
        (tmp_path / "sub" / "b.FLAC").write_bytes(b"")
        (tmp_path / "sub" / "notes.txt").write_bytes(b"")
        (tmp_path / "c.mp3").write_bytes(b"")
        files = collect_input_files([tmp_path])
        names = sorted(f.name for f in files)
        assert names == ["a.wav", "b.FLAC", "c.mp3"]

    def test_collect_explicit_file(self, tmp_path):
        f = tmp_path / "a.wav"
        f.write_bytes(b"")
        assert collect_input_files([f]) == [f]
        assert collect_input_files([tmp_path / "missing.wav"]) == []


class TestEndToEnd:
    def test_wav_to_csv(self, clf, tmp_path):
        audio = make_audio(tmp_path, secs=7.0)
        out = tmp_path / "out"
        cfg = ProcessingConfig(
            input_path=audio, output_dir=out,
            formats=[OutputFormat.CSV, OutputFormat.JSON],
            min_confidence=0.0, overlap=0.0, batch_size=8,
            model_name="tiny-test",
        )
        result = process_file(clf, cfg)
        assert result.segments == 3  # 7 s at 3 s windows -> 3 (last padded)
        assert result.audio_duration_secs == pytest.approx(7.0, abs=0.01)

        csv_path = out / "rec.BirdNET.results.csv"
        assert csv_path.exists()
        lines = csv_path.read_text(encoding="utf-8-sig").splitlines()
        assert lines[0].startswith("Start (s),End (s)")
        # min_confidence 0 with top_k 3 -> 3 detections per segment
        assert len(lines) - 1 == result.detections == 9
        # Sorted by start time then confidence desc.
        starts = [float(l.split(",")[0]) for l in lines[1:]]
        assert starts == sorted(starts)

        doc = json.loads((out / "rec.BirdNET.json").read_text())
        assert doc["summary"]["total_detections"] == 9
        assert doc["model"] == "tiny-test"

    def test_lock_released_after_processing(self, clf, tmp_path):
        audio = make_audio(tmp_path, secs=3.0)
        out = tmp_path / "out"
        cfg = ProcessingConfig(
            input_path=audio, output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, overlap=0.0, batch_size=4,
        )
        process_file(clf, cfg)
        assert not FileLock.is_locked(audio, out)

    def test_locked_file_raises(self, clf, tmp_path):
        audio = make_audio(tmp_path, secs=3.0)
        out = tmp_path / "out"
        lock = FileLock.acquire(audio, out)
        cfg = ProcessingConfig(
            input_path=audio, output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, overlap=0.0, batch_size=4,
        )
        with pytest.raises(FileLocked):
            process_file(clf, cfg)
        lock.release()

    def test_overlap_segments(self, clf, tmp_path):
        audio = make_audio(tmp_path, secs=6.0)
        out = tmp_path / "out"
        cfg = ProcessingConfig(
            input_path=audio, output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, overlap=1.5, batch_size=4,
        )
        result = process_file(clf, cfg)
        assert result.segments == 4  # step 1.5 s: 0, 1.5, 3.0, 4.5

    def test_resampled_input(self, clf, tmp_path):
        # 44.1 kHz input must be resampled to the model's 48 kHz.
        audio = tmp_path / "cd.wav"
        t = np.arange(int(44100 * 4.0)) / 44100
        write_wav(audio, (0.4 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32), 44100)
        out = tmp_path / "out"
        cfg = ProcessingConfig(
            input_path=audio, output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, overlap=0.0, batch_size=4,
        )
        result = process_file(clf, cfg)
        assert result.segments == 2

    def test_decode_error_propagates(self, clf, tmp_path):
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"RIFFxxxxWAVE")  # truncated garbage
        out = tmp_path / "out"
        cfg = ProcessingConfig(
            input_path=bad, output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, overlap=0.0, batch_size=4,
        )
        from birda_tpu.errors import AudioError

        with pytest.raises(AudioError):
            process_file(clf, cfg)
        assert not FileLock.is_locked(bad, out)  # lock released on error

    def test_stdout_mode_writes_no_files(self, clf, tmp_path):
        from birda_tpu.output.reporter import JsonReporter
        import io

        audio = make_audio(tmp_path, secs=3.0)
        out = tmp_path / "out"
        buf = io.StringIO()
        cfg = ProcessingConfig(
            input_path=audio, output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, overlap=0.0, batch_size=4,
            reporter=JsonReporter(buf),
        )
        process_file(clf, cfg)
        assert not (out / "rec.BirdNET.results.csv").exists()
        events = [json.loads(l)["event"] for l in buf.getvalue().splitlines()]
        assert "detections" in events


class TestDeviceResample:
    def test_device_resample_matches_host_path(self, clf, tmp_path):
        # A 44.1 kHz file through the device-resample chunk path must give
        # the same detections as the host-resample per-segment path.
        rate = 44100
        rng = np.random.default_rng(7)
        x = (0.2 * np.sin(2 * np.pi * 2500 * np.arange(rate * 7) / rate)
             + 0.05 * rng.normal(0, 1, rate * 7)).astype(np.float32)
        x = np.clip(x, -1, 1)
        audio = tmp_path / "cd.wav"
        from fixtures_audio import write_wav as _ww

        _ww(audio, x, rate, fmt="s16")

        def run(use_chunk):
            out = tmp_path / ("chunk" if use_chunk else "legacy")
            cfg = ProcessingConfig(
                input_path=audio, output_dir=out, formats=[OutputFormat.CSV],
                min_confidence=0.0, overlap=0.0, batch_size=4,
                use_chunk_runner=use_chunk,
            )
            res = process_file(clf, cfg)
            csv = (out / "cd.BirdNET.results.csv").read_text(encoding="utf-8-sig")
            return res, csv.splitlines()

        res_chunk, lines_chunk = run(True)
        res_legacy, lines_legacy = run(False)
        assert res_chunk.segments == res_legacy.segments == 3
        # Same detected species per row (confidences may differ at int16
        # quantization + chunk-boundary filter context level).
        species_chunk = [l.split(",")[2] for l in lines_chunk[1:]]
        species_legacy = [l.split(",")[2] for l in lines_legacy[1:]]
        assert species_chunk == species_legacy


class TestBatchQuantization:
    def test_power_of_two_ladder(self, tmp_path):
        # Files of 3, 5, and 7 segments share the batch-8 and batch-4
        # programs instead of compiling three distinct shapes.
        clf = BirdClassifier(tiny_model(), device="cpu", min_confidence=0.0,
                             top_k=3)
        runners_before = len(clf._chunk_runners)
        for secs, name in [(9.0, "a.wav"), (15.0, "b.wav"), (21.0, "c.wav")]:
            audio = make_audio(tmp_path, name=name, secs=secs)
            cfg = ProcessingConfig(
                input_path=audio, output_dir=tmp_path / "out",
                formats=[OutputFormat.CSV], min_confidence=0.0,
                overlap=0.0, batch_size=64,
            )
            res = process_file(clf, cfg)
            assert res.segments == int(secs // 3)
        # 3 segs -> batch 4; 5 segs -> 8; 7 segs -> 8: two programs, not three.
        assert len(clf._chunk_runners) - runners_before == 2


class TestHotPathReviewFixes:
    """Round-3 hot-path review findings, each pinned."""

    def test_bsg_calibration_precedes_thresholding(self, clf, tmp_path):
        # A boosting calibration must be able to PROMOTE a raw score past
        # min_confidence (reference order: BSG -> threshold,
        # processor.rs:284-318). Pre-fix, the device dropped sub-threshold
        # raw scores before calibration ever saw them.
        from birda_tpu.inference.bsg import BsgPostProcessor, load_calibration

        audio = make_audio(tmp_path, secs=3.0)
        base = ProcessingConfig(
            input_path=audio, output_dir=tmp_path / "o1",
            formats=[OutputFormat.CSV], min_confidence=0.0, overlap=0.0,
            batch_size=8,
        )
        r0 = process_file(clf, base)
        csv = (tmp_path / "o1" / "rec.BirdNET.results.csv").read_text(
            encoding="utf-8-sig").splitlines()
        rows = [line.split(",") for line in csv[1:]]
        assert rows
        raw_by_species = {r[2]: float(r[4]) for r in rows}
        cmax = max(raw_by_species.values())
        import math

        def calibrated(c, intercept=4.0):
            return 1 / (1 + math.exp(-(math.log(c / (1 - c)) + intercept)))

        # Threshold strictly between the best raw score and its boost.
        thr = (cmax + calibrated(cmax)) / 2
        assert thr > cmax
        cal = tmp_path / "cal.csv"
        cal.write_text(
            "species,coef,intercept\n"
            + "".join(f"{label},1.0,4.0\n" for label in clf.labels))
        proc = BsgPostProcessor(load_calibration(cal))
        cfg = ProcessingConfig(
            input_path=audio, output_dir=tmp_path / "o2",
            formats=[OutputFormat.CSV], min_confidence=thr, overlap=0.0,
            batch_size=8, bsg_processor=proc,
        )
        r1 = process_file(clf, cfg)
        assert r1.detections > 0, (
            "calibration-promoted detections were dropped pre-calibration")
        assert r0.segments == r1.segments

    def test_options_top_k_is_honored(self, clf):
        from birda_tpu.errors import Inference as InferenceErr
        from birda_tpu.inference.classifier import InferenceOptions

        x = np.random.default_rng(0).normal(
            size=(2, clf.sample_count)).astype(np.float32)
        out = clf.predict_batch(x, InferenceOptions(0.0, top_k=1))
        assert all(len(r.predictions) == 1 for r in out)
        with pytest.raises(InferenceErr, match="top_k"):
            clf.predict_batch(x, InferenceOptions(0.0, top_k=99))

    def test_chunk_runner_tail_matches_legacy_path(self, clf, tmp_path):
        # Overlap makes the decoder's final window advance by less than a
        # full step (off the uniform grid): batched naively, the device row
        # read past-EOF padding. The chunked path must agree with the
        # legacy per-window path on such files.
        audio = make_audio(tmp_path, name="tail.wav", secs=7.5)

        def run(use_runner, out):
            cfg = ProcessingConfig(
                input_path=audio, output_dir=tmp_path / out,
                formats=[OutputFormat.CSV], min_confidence=0.0, overlap=1.0,
                batch_size=8, use_chunk_runner=use_runner,
            )
            process_file(clf, cfg)
            csv = (tmp_path / out / "tail.BirdNET.results.csv").read_text(
                encoding="utf-8-sig").splitlines()
            return sorted(
                (r[0], r[2], round(float(r[4]), 4))
                for r in (line.split(",") for line in csv[1:]))

        legacy = run(False, "legacy")
        chunked = run(True, "chunked")
        assert chunked == legacy

    def test_parallel_decode_gate(self):
        from birda_tpu.pipeline.processor import _use_parallel_decode

        assert _use_parallel_decode(4, False, 10_000_000, True, 100)
        assert not _use_parallel_decode(4, True, 10_000_000, True, 100)
        assert not _use_parallel_decode(1, False, 10_000_000, True, 100)
        assert not _use_parallel_decode(4, False, None, True, 100)
        assert not _use_parallel_decode(4, False, 10_000_000, False, 100)
        assert not _use_parallel_decode(4, False, 10_000_000, True, 7)

    def test_parallel_decode_error_ships_before_full_drain(self, tmp_path):
        # The first worker error must reach the consumer without waiting
        # for every other worker to decode its entire span.
        import queue as _q
        import threading as _t

        from birda_tpu.audio import parallel_decode as pd

        tx: _q.Queue = _q.Queue()
        abort = _t.Event()
        sent = _t.Event()

        def fake_worker(path, q, abort_ev, first, end, *a):
            if first == 0:
                q.put(RuntimeError("corrupt frame"))
                q.put(pd._WORKER_DONE)
                return
            # Second worker: slow, endless until abort (simulates a long
            # span); must NOT need to finish for the error to surface.
            while not abort_ev.is_set():
                try:
                    q.put((np.zeros(4, np.float32), 0), timeout=0.05)
                except _q.Full:
                    continue
            q.put(pd._WORKER_DONE)

        orig = pd._worker
        pd._worker = fake_worker
        try:
            pd.spawn_parallel_decode(
                Path("x.wav"), tx, sent, 10_000_000, 144000, 0,
                48000, 144000, False, 2, abort=abort)
            item = tx.get(timeout=5)
            assert isinstance(item, RuntimeError)
            abort.set()  # consumer teardown
        finally:
            pd._worker = orig
            abort.set()

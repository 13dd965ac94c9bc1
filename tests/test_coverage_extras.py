"""Coverage extras: watchdog env parsing, decode fallback routing, reporter
implementations, fs durability helpers, backend probes."""

import numpy as np
import pytest

from birda_tpu.inference.watchdog import WatchdogGuard, parse_timeout_env, start_inference_watchdog


class TestWatchdog:
    def test_default_timeout(self, monkeypatch):
        monkeypatch.delenv("BIRDA_INFERENCE_TIMEOUT", raising=False)
        assert parse_timeout_env() == 10.0

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("BIRDA_INFERENCE_TIMEOUT", "120")
        assert parse_timeout_env() == 120.0

    @pytest.mark.parametrize("bad", ["0", "3601", "abc", "-5"])
    def test_invalid_falls_back(self, monkeypatch, bad):
        monkeypatch.setenv("BIRDA_INFERENCE_TIMEOUT", bad)
        assert parse_timeout_env() == 10.0

    def test_guard_cancels(self):
        # A watchdog that is cancelled must never fire (we can't observe the
        # hard exit, but cancel() must not raise and the timer must stop).
        with start_inference_watchdog(8, timeout_secs=30.0) as guard:
            assert isinstance(guard, WatchdogGuard)
        assert not guard._timer.is_alive() or guard._timer.finished.is_set()


class TestDecodeFallbackRouting:
    def test_python_fallback_used_without_native(self, tmp_path, monkeypatch):
        from birda_tpu.audio import decode as decode_mod
        from birda_tpu.native import audio as native_audio
        from fixtures_audio import write_wav

        monkeypatch.setattr(native_audio, "available", lambda: False)
        p = tmp_path / "x.wav"
        write_wav(p, np.zeros(4800, np.float32), 48000)
        dec = decode_mod.StreamingDecoder(p)
        assert dec.sample_rate == 48000
        dec.close()

    def test_non_wav_without_native_is_unsupported(self, tmp_path, monkeypatch):
        from birda_tpu.audio import decode as decode_mod
        from birda_tpu.errors import UnsupportedAudioFormat
        from birda_tpu.native import audio as native_audio

        monkeypatch.setattr(native_audio, "available", lambda: False)
        p = tmp_path / "x.mp3"
        p.write_bytes(b"ID3junk")
        with pytest.raises(UnsupportedAudioFormat):
            decode_mod.StreamingDecoder(p)


class TestReporters:
    def test_null_reporter_swallows_everything(self):
        from birda_tpu.output.json_envelope import ErrorSeverity, FileStatus
        from birda_tpu.output.reporter import NullReporter

        r = NullReporter()
        r.pipeline_started(1, "m", 0.1, {})
        r.file_started("a.wav", 0, 10)
        r.progress(file={"percent": 50})
        r.file_completed_success("a.wav", 1, 10)
        r.file_skipped("b.wav", FileStatus.SKIPPED)
        r.error("c", ErrorSeverity.WARNING, "m")
        r.pipeline_completed({})
        r.finish()

    def test_human_reporter_disabled_tty(self):
        from birda_tpu.output.progress import HumanReporter

        r = HumanReporter(enabled=False)  # non-tty: all no-ops
        r.pipeline_started(2, "m", 0.1, {})
        r.file_started("a.wav", 0, 100)
        r.progress(file={"segments_done": 50, "percent": 50.0})
        r.file_completed_success("a.wav", 3, 100)
        r.pipeline_completed({})
        r.finish()

    def test_create_reporter_modes(self):
        from birda_tpu.output.reporter import (
            JsonReporter,
            NullReporter,
            create_reporter,
        )

        assert isinstance(create_reporter("ndjson"), JsonReporter)
        assert isinstance(create_reporter("json"), JsonReporter)
        assert isinstance(create_reporter("human"), NullReporter)


class TestBackendProbes:
    def test_ensure_runtime_available(self):
        from birda_tpu.inference.backend import ensure_runtime_available

        ensure_runtime_available()  # CPU jax is always present in tests

    def test_unknown_device_rejected(self):
        from birda_tpu.errors import RuntimeInitialization
        from birda_tpu.inference.backend import select_backend

        with pytest.raises(RuntimeInitialization):
            select_backend("quantum")


class TestSyntheticLabels:
    def test_deterministic_and_well_formed(self):
        from birda_tpu.models.zoo import synthetic_labels

        a = synthetic_labels(10)
        b = synthetic_labels(10)
        assert a == b
        assert all("_" in label for label in a)
        # Scientific halves are unique (geomodel mapping relies on it).
        from birda_tpu.inference.geomodel import species_key

        assert len({species_key(l) for l in a}) == 10


class TestFsDurability:
    def test_sync_parent_directory_no_crash(self, tmp_path):
        from birda_tpu.utils.fs import sync_parent_directory

        f = tmp_path / "x"
        f.write_bytes(b"1")
        sync_parent_directory(f)  # must not raise

    def test_write_atomic_in_place_for_devnull(self):
        from birda_tpu.utils.fs import write_atomic

        write_atomic("/dev/null", b"discarded")  # non-regular: in place

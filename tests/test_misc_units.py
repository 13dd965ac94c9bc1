"""Thin-coverage units: TOML writer, envelope builders, melspec chunk
equivalence, backend auto semantics, path traversal defense."""

import tomllib

import numpy as np
import pytest

from birda_tpu.output import json_envelope as env
from birda_tpu.utils import toml_writer


class TestTomlWriter:
    def roundtrip(self, doc):
        return tomllib.loads(toml_writer.dumps(doc))

    def test_scalars(self):
        doc = {"a": 1, "b": 2.5, "c": True, "d": "text", "e": [1, 2, 3]}
        assert self.roundtrip(doc) == doc

    def test_nested_tables(self):
        doc = {"top": "x", "t": {"a": 1, "inner": {"b": "y"}}}
        assert self.roundtrip(doc) == doc

    def test_string_escaping(self):
        doc = {"s": 'quote " backslash \\ end'}
        assert self.roundtrip(doc) == doc

    def test_weird_keys(self):
        doc = {"models": {"my model.v2": {"path": "/x"}}}
        assert self.roundtrip(doc) == doc

    def test_none_skipped(self):
        out = toml_writer.dumps({"a": None, "b": 1})
        assert "a" not in out

    def test_table_only_children(self):
        doc = {"outer": {"inner": {"k": 1}}}
        assert self.roundtrip(doc) == doc

    def test_unserializable_raises(self):
        with pytest.raises(TypeError):
            toml_writer.dumps({"x": object()})


class TestEnvelopeBuilders:
    def test_progress_percentages(self):
        b = env.batch_progress(3, 12)
        assert b["percent"] == 25.0
        f = env.file_progress("a.wav", 50, 200)
        assert f["percent"] == 25.0
        assert env.batch_progress(0, 0)["percent"] == 0.0

    def test_download_progress(self):
        d = env.download_progress("install", "m", "f.onnx", 512, 1024)
        assert d["percent"] == 50.0

    def test_bsg_metadata_skips_none(self):
        md = env.bsg_metadata(True, False)
        assert "latitude" not in md
        md = env.bsg_metadata(True, True, latitude=60.0, longitude=24.0,
                              day_of_year=150)
        assert md["day_of_year"] == 150

    def test_error_payload_suggestion_optional(self):
        p = env.error_payload("code", env.ErrorSeverity.WARNING, "msg")
        assert "suggestion" not in p


class TestMelChunkEquivalence:
    def test_chunk_mel_matches_per_window_mel(self):
        # The conv-grid chunk mel and the per-window gather mel must agree
        # (they are different formulations of the same spectrogram).
        from birda_tpu.ops.melspec import MelSpecConfig, melspec, melspec_from_chunk

        cfg = MelSpecConfig(sample_rate=48_000, n_fft=1024, hop=576,
                            n_mels=64)
        rng = np.random.default_rng(0)
        seg = 144_000
        batch, step = 3, seg
        chunk = rng.normal(0, 0.3, (batch - 1) * step + seg).astype(np.float32)
        windows = np.stack([chunk[i * step : i * step + seg] for i in range(batch)])
        a = np.asarray(melspec(windows, cfg))
        b = np.asarray(melspec_from_chunk(chunk, cfg, batch, step, seg))
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < 1e-3

    def test_chunk_mel_overlap(self):
        from birda_tpu.ops.melspec import MelSpecConfig, melspec, melspec_from_chunk

        cfg = MelSpecConfig(sample_rate=48_000, n_fft=1024, hop=576, n_mels=64)
        seg = 144_000
        step = seg // 2  # 72000 = 125 * 576: on the hop grid
        assert step % cfg.hop == 0
        rng = np.random.default_rng(1)
        batch = 3
        chunk = rng.normal(0, 0.3, (batch - 1) * step + seg).astype(np.float32)
        windows = np.stack([chunk[i * step : i * step + seg] for i in range(batch)])
        a = np.asarray(melspec(windows, cfg))
        b = np.asarray(melspec_from_chunk(chunk, cfg, batch, step, seg))
        assert np.max(np.abs(a - b)) < 1e-3

    def test_off_grid_step_rejected(self):
        from birda_tpu.ops.melspec import MelSpecConfig, melspec_from_chunk

        cfg = MelSpecConfig(hop=576)
        with pytest.raises(ValueError):
            melspec_from_chunk(np.zeros(200_000, np.float32), cfg, 2, 100_001,
                               144_000)


class TestPathTraversalDefense:
    def test_output_path_stays_inside(self, tmp_path):
        from birda_tpu.pipeline.coordinator import OutputFormat, output_path_for

        # A hostile stem with separators is flattened, not traversed.
        p = output_path_for(tmp_path / "..%2f..%2fescape.wav", tmp_path,
                            OutputFormat.CSV)
        assert p.parent == tmp_path

    def test_clip_species_traversal(self):
        from birda_tpu.clipper.writer import sanitize_filename

        assert "/" not in sanitize_filename("../../../etc/passwd")
        assert ".." not in sanitize_filename("../../../etc/passwd")


class TestLockOwnership:
    def test_cleanup_skips_foreign_live_lock(self, tmp_path):
        """The SIGINT cleanup must not delete another process's live lock
        that ended up in our registry via the register-before-create
        ordering (losing the create race)."""
        import json as _json
        import os

        from birda_tpu.locking import file_lock as fl

        import socket

        foreign = tmp_path / "x.wav.birda.lock"
        foreign.write_text(_json.dumps({"pid": os.getpid() + 99_999,
                                        "hostname": "other"}))
        # Same pid, different host: locks live beside the audio on what may
        # be a SHARED filesystem, where a pid collision with a process on
        # another machine is perfectly possible — hostname must agree too.
        same_pid_other_host = tmp_path / "z.wav.birda.lock"
        same_pid_other_host.write_text(_json.dumps(
            {"pid": os.getpid(), "hostname": "some-other-host"}))
        ours = tmp_path / "y.wav.birda.lock"
        ours.write_text(_json.dumps({"pid": os.getpid(),
                                     "hostname": socket.gethostname()}))
        fl._register(foreign)
        fl._register(same_pid_other_host)
        fl._register(ours)
        removed = fl.cleanup_all_locks()
        assert removed == 1
        assert foreign.exists()  # someone else's — untouched
        assert same_pid_other_host.exists()
        assert not ours.exists()

    def test_config_lock_ctrl_c_cleanup(self, tmp_path):
        from birda_tpu.locking.config_lock import (
            ConfigLock,
            cleanup_all_config_locks,
        )

        lock = ConfigLock(tmp_path / "config.toml").acquire()
        assert lock.lock_path.exists()
        assert cleanup_all_config_locks() == 1
        assert not lock.lock_path.exists()


class TestInstallerLanguageStrict:
    def test_missing_language_errors_not_falls_back(self, tmp_path):
        """The reference validates the requested language exists before
        downloading anything (installer.rs:499-505): asking for German on
        an English-only model is an error, not silent English labels."""
        from birda_tpu.errors import LanguageNotFound
        from birda_tpu.registry.installer import install_model
        from birda_tpu.registry.loader import load_registry

        reg = load_registry()
        model = next(m for m in reg.models if m.files is not None
                     and m.files.languages)
        with pytest.raises(LanguageNotFound):
            install_model(model, language="xx-not-a-language",
                          dest_dir=tmp_path)


class TestOnnxCoverageDoc:
    def test_committed_coverage_doc_matches_regeneration(self):
        """docs/onnx-coverage.md is generated from the evaluator's handler
        table; a new op_* handler without a doc regen fails here (same
        discipline as the registry pin)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, "scripts")
        import gen_onnx_coverage

        committed = Path("docs/onnx-coverage.md").read_text()
        assert committed == gen_onnx_coverage.build()

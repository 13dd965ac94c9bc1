"""Orchestrator e2e tests: the full analyze flow wired through real
components (fixture geomodel, bat two-stage, combine, fail-fast)."""

from pathlib import Path

import numpy as np
import pytest

import fixtures_onnx as fo
from birda_tpu.config.types import Config, ModelConfig, ModelType
from birda_tpu.errors import NoValidAudioFiles
from birda_tpu.orchestrator import (
    AnalyzeOptions,
    analyze_files,
    determine_default_batch_size,
    resolve_device,
    resolve_model_config,
    resolve_species_filter,
)
from birda_tpu.pipeline.coordinator import OutputFormat

from fixtures_audio import write_wav


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")
    return tmp_path


def synthetic_config():
    cfg = Config()
    cfg.models["tiny"] = ModelConfig(
        path=Path("synthetic:tiny"), labels=Path("synthetic:tiny"),
        model_type=ModelType.BIRDNET_V24,
    )
    cfg.defaults.model = "tiny"
    return cfg


def make_audio(tmp_path, name="rec.wav", secs=4.0, rate=48000):
    p = tmp_path / name
    t = np.arange(int(rate * secs)) / rate
    write_wav(p, (0.4 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32), rate)
    return p


class TestResolution:
    def test_model_priority(self, tmp_path):
        cfg = synthetic_config()
        mc, name = resolve_model_config(AnalyzeOptions(), cfg)
        assert name == "tiny"  # config default
        mc, name = resolve_model_config(AnalyzeOptions(model="tiny"), cfg)
        assert name == "tiny"
        # ad-hoc needs labels
        from birda_tpu.errors import ConfigValidation

        with pytest.raises(ConfigValidation):
            resolve_model_config(
                AnalyzeOptions(model_path=Path("x.onnx"),
                               model_type=ModelType.BIRDNET_V24), cfg
            )

    def test_path_overrides_patch_named_and_default_model(self, tmp_path):
        # Reference apply_model_overrides (lib.rs:227): --model-path /
        # --labels-path patch the resolved named/default entry, keeping
        # its model_type — and the config object is never mutated.
        cfg = synthetic_config()
        original_path = cfg.models["tiny"].path

        mc, name = resolve_model_config(
            AnalyzeOptions(model="tiny", model_path=Path("/tmp/patched.onnx")),
            cfg)
        assert name == "tiny"
        assert mc.path == Path("/tmp/patched.onnx")
        assert mc.model_type == ModelType.BIRDNET_V24
        assert cfg.models["tiny"].path == original_path  # no mutation

        # Default-model branch: --model-path alone (no --model-type) is an
        # override of the default, not the priority-4 error.
        mc, name = resolve_model_config(
            AnalyzeOptions(labels_path=Path("/tmp/labels.txt")), cfg)
        assert name == "tiny"
        assert mc.labels == Path("/tmp/labels.txt")
        assert mc.path == original_path

    def test_device_flags(self):
        cfg = Config()
        assert resolve_device(AnalyzeOptions(device_flags={"cpu": True}), cfg) == "cpu"
        assert resolve_device(AnalyzeOptions(device_flags={"tpu": True}), cfg) == "tpu"
        assert resolve_device(AnalyzeOptions(), cfg) == "auto"

    def test_batch_defaults(self):
        assert determine_default_batch_size(ModelType.BIRDNET_V24, "cpu") == 8
        assert determine_default_batch_size(ModelType.BIRDNET_V24, "tpu") == 256
        assert determine_default_batch_size(ModelType.BIRDNET_V30, "tpu") == 256

    def test_species_filter_precedence(self, tmp_path, caplog):
        slist = tmp_path / "list.txt"
        slist.write_text("Parus major_Great Tit\n")
        cfg = Config()
        # Range filter wins and warns.
        opts = AnalyzeOptions(slist=slist)
        import logging

        with caplog.at_level(logging.WARNING):
            out = resolve_species_filter(opts, cfg, has_range_filter=True)
        assert out is None
        assert any("Ignoring --slist" in r.message for r in caplog.records)
        # Without range filter the list loads.
        out = resolve_species_filter(opts, cfg, has_range_filter=False)
        assert out == {"Parus major_Great Tit"}


class TestAnalyzeEndToEnd:
    def test_no_valid_files(self, home, tmp_path):
        with pytest.raises(NoValidAudioFiles):
            analyze_files(
                AnalyzeOptions(inputs=[tmp_path / "none"],
                               device_flags={"cpu": True}),
                synthetic_config(),
            )

    def test_range_filter_through_analyze(self, home, tmp_path):
        # Fixture geomodel wired via config; coordinates + week activate it.
        from birda_tpu.models.zoo import tiny_model

        model_labels = tiny_model().labels
        n_geo = 50
        geo = tmp_path / "geo.onnx"
        geo.write_bytes(fo.make_fixture_geomodel(num_species=n_geo))
        geo_labels = tmp_path / "geo-labels.txt"
        # Geomodel labels overlap the first 50 classifier species.
        geo_labels.write_text("".join(f"{l}\n" for l in model_labels[:n_geo]))

        cfg = synthetic_config()
        cfg.defaults.geomodel = geo
        cfg.defaults.geomodel_labels = geo_labels

        audio = make_audio(tmp_path)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[audio], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True},
            lat=60.0, lon=24.0, week=24,
            range_threshold=0.0, range_unmatched="drop",
        )
        code = analyze_files(opts, cfg)
        assert code == 0
        lines = (out / "rec.BirdNET.results.csv").read_text(
            encoding="utf-8-sig").splitlines()
        # With unmatched=drop and threshold 0, survivors are geomodel-mapped.
        allowed = {l.split("_")[0] for l in model_labels[:n_geo]}
        for row in lines[1:]:
            assert row.split(",")[2] in allowed

    def test_bat_two_stage(self, home, tmp_path, monkeypatch):
        from birda_tpu.registry import installer

        models_root = tmp_path / "models"
        monkeypatch.setattr(installer, "models_dir", lambda: models_root)
        bat_dir = models_root / "bat"
        bat_dir.mkdir(parents=True)

        # Fixture bat head: [B,1024] embeddings -> 6 sigmoid scores.
        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.05, (1024, 6)).astype(np.float32)
        b = np.zeros(6, np.float32)
        head = fo.model(
            [fo.node("Gemm", ["input", "W", "B"], ["logits"]),
             fo.node("Sigmoid", ["logits"], ["probabilities"])],
            inputs=[fo.value_info("input", ["batch", 1024])],
            outputs=[fo.value_info("probabilities", ["batch", 6])],
            initializers=[fo.tensor("W", w), fo.tensor("B", b)],
        )
        (bat_dir / "BattyBirdNET-UK-256kHz_fp32.onnx").write_bytes(head)
        (bat_dir / "BattyBirdNET-UK-256kHz_Labels.txt").write_text(
            "".join(f"Bat sp{i} x_Bat {i}\n" for i in range(6))
        )

        audio = make_audio(tmp_path, name="bat.wav", secs=2.0, rate=256_000)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[audio], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True}, bat="uk",
        )
        code = analyze_files(opts, synthetic_config())
        assert code == 0
        lines = (out / "bat.BirdNET.results.csv").read_text(
            encoding="utf-8-sig").splitlines()
        assert len(lines) > 1
        # Every detection is a bat species from the regional head.
        for row in lines[1:]:
            assert row.split(",")[2].startswith("Bat sp")
        # Bat window timing: starts advance by 0.5625*0.75 s.
        starts = sorted({float(r.split(",")[0]) for r in lines[1:]})
        assert starts[0] == 0.0
        if len(starts) > 1:
            # CSV times carry 1 decimal; the true step is 0.421875 s.
            assert starts[1] == pytest.approx(0.4, abs=0.051)

    def test_combine_outputs(self, home, tmp_path):
        for i in range(2):
            make_audio(tmp_path, name=f"r{i}.wav", secs=3.0)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[tmp_path], output_dir=out,
            formats=[OutputFormat.CSV, OutputFormat.PARQUET],
            min_confidence=0.0, device_flags={"cpu": True}, combine=True,
        )
        code = analyze_files(opts, synthetic_config())
        assert code == 0
        combined = out / "BirdNET_CombinedTable.csv"
        assert combined.exists()
        lines = combined.read_text(encoding="utf-8-sig").splitlines()
        header_rows = [l for l in lines if l.startswith("Start (s)")]
        assert len(header_rows) == 1  # headers deduplicated
        import pyarrow.parquet as pq

        t = pq.read_table(str(out / "BirdNET_CombinedTable.parquet"))
        assert t.num_rows == len(lines) - 1

    def test_fail_fast(self, home, tmp_path):
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"RIFFxxxxWAVEjunk")
        good = make_audio(tmp_path, name="zz_good.wav", secs=3.0)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[bad, good], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True}, fail_fast=True,
        )
        from birda_tpu.errors import AudioError

        with pytest.raises(AudioError):
            analyze_files(opts, synthetic_config())
        # Without fail-fast the good file still processes.
        opts.fail_fast = False
        code = analyze_files(opts, synthetic_config())
        assert code == 0
        assert (out / "zz_good.BirdNET.results.csv").exists()

    def test_unexpected_exception_isolated_per_file(self, home, tmp_path,
                                                    monkeypatch):
        """A non-BirdaError escaping process_file (a bug, a jax error on a
        hostile file) fails that file but not the run (SURVEY §5 per-file
        isolation); --fail-fast still re-raises it."""
        import birda_tpu.orchestrator as orch

        bad = make_audio(tmp_path, name="aa_bad.wav", secs=3.0)
        good = make_audio(tmp_path, name="zz_good.wav", secs=3.0)
        real_process_file = orch.process_file

        def exploding(classifier, pcfg):
            if pcfg.input_path.name == "aa_bad.wav":
                raise RuntimeError("synthetic internal failure")
            return real_process_file(classifier, pcfg)

        monkeypatch.setattr(orch, "process_file", exploding)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[bad, good], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True},
        )
        code = analyze_files(opts, synthetic_config())
        assert code == 0  # at least one file processed
        assert (out / "zz_good.BirdNET.results.csv").exists()
        assert not (out / "aa_bad.BirdNET.results.csv").exists()

        opts.fail_fast = True
        with pytest.raises(RuntimeError, match="synthetic internal"):
            analyze_files(opts, synthetic_config())

    def test_unexpected_exception_isolated_parallel(self, home, tmp_path,
                                                    monkeypatch):
        """The --jobs worker path isolates non-BirdaError exceptions the
        same way the sequential loop does."""
        import birda_tpu.orchestrator as orch

        bad = make_audio(tmp_path, name="aa_bad.wav", secs=3.0)
        good = make_audio(tmp_path, name="zz_good.wav", secs=3.0)
        real_process_file = orch.process_file

        def exploding(classifier, pcfg):
            if pcfg.input_path.name == "aa_bad.wav":
                raise RuntimeError("synthetic worker failure")
            return real_process_file(classifier, pcfg)

        monkeypatch.setattr(orch, "process_file", exploding)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[bad, good], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True}, jobs=2,
        )
        code = analyze_files(opts, synthetic_config())
        assert code == 0
        assert (out / "zz_good.BirdNET.results.csv").exists()
        assert not (out / "aa_bad.BirdNET.results.csv").exists()

    def test_warmup_trace_failure_is_typed(self, home, tmp_path):
        """A graph the lowering accepts node-by-node but that cannot trace
        (invalid Gemm rank) surfaces as ClassifierBuild, not a raw
        traceback, from the warmup compile."""
        from birda_tpu.errors import ClassifierBuild

        n_cls = 6522
        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.2, (16, n_cls)).astype(np.float32)
        m = fo.model(
            [fo.node("Reshape", ["input", "shp"], ["r"]),
             # keepdims=1 leaves a rank-3 input to Gemm: invalid ONNX.
             fo.node("ReduceMean", ["r"], ["f"],
                     attrs=[fo.attr_ints("axes", [2])]),
             fo.node("Gemm", ["f", "W"], ["logits"]),
             fo.node("Sigmoid", ["logits"], ["probabilities"])],
            inputs=[fo.value_info("input", ["batch", 144000])],
            outputs=[fo.value_info("probabilities", ["batch", n_cls])],
            initializers=[
                fo.tensor("shp", np.array([-1, 16, 9000], np.int64)),
                fo.tensor("W", w)],
        )
        model_path = tmp_path / "bad.onnx"
        model_path.write_bytes(m)
        labels = tmp_path / "labels.txt"
        labels.write_text("".join(f"G s{i}_Common {i}\n" for i in range(n_cls)))

        audio = make_audio(tmp_path)
        opts = AnalyzeOptions(
            inputs=[audio], output_dir=tmp_path / "out",
            formats=[OutputFormat.CSV], min_confidence=0.0,
            device_flags={"cpu": True}, model_path=model_path,
            labels_path=labels, model_type=ModelType.BIRDNET_V24,
        )
        with pytest.raises(ClassifierBuild, match="rank-2"):
            analyze_files(opts, Config())

    def test_combine_raven_renumbers(self, home, tmp_path):
        for i in range(2):
            make_audio(tmp_path, name=f"r{i}.wav", secs=3.0)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[tmp_path], output_dir=out, formats=[OutputFormat.RAVEN],
            min_confidence=0.0, device_flags={"cpu": True}, combine=True,
        )
        assert analyze_files(opts, synthetic_config()) == 0
        lines = (out / "BirdNET_SelectionTable.txt").read_text().splitlines()
        ids = [int(l.split("\t")[0]) for l in lines[1:]]
        assert ids == list(range(1, len(ids) + 1))


class TestStdoutSequential:
    def test_stdout_mode_forces_sequential_jobs(self, home, tmp_path,
                                                caplog):
        """--stdout is one ordered stream: concurrent per-file workers
        would interleave it, so jobs clamps to 1 with a warning."""
        import logging

        audio = make_audio(tmp_path)
        opts = AnalyzeOptions(inputs=[audio], stdout_mode=True, jobs=3,
                              device_flags={"cpu": True},
                              min_confidence=0.0)
        with caplog.at_level(logging.WARNING):
            assert analyze_files(opts, synthetic_config()) == 0
        assert opts.jobs == 1
        assert any("ignoring --jobs" in r.getMessage()
                   for r in caplog.records)


class TestReviewRegressionFixes:
    """Pins for the round-4 self-review fixes (each was a live bug)."""

    def test_combined_csv_keeps_bom(self, home, tmp_path):
        """Per-file CSVs open with a UTF-8 BOM for Excel (reference
        csv.rs:29-31); the combined table must keep exactly one BOM at the
        front — previously it was silently dropped (parts were read with
        utf-8-sig and re-written plain)."""
        for i in range(2):
            make_audio(tmp_path, name=f"r{i}.wav", secs=3.0)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[tmp_path], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True}, combine=True,
        )
        assert analyze_files(opts, synthetic_config()) == 0
        raw = (out / "BirdNET_CombinedTable.csv").read_bytes()
        assert raw.startswith(b"\xef\xbb\xbf")
        assert not raw[3:].startswith(b"\xef\xbb\xbf")  # exactly one

    def test_combined_csv_no_bom_when_disabled(self, home, tmp_path):
        for i in range(2):
            make_audio(tmp_path, name=f"r{i}.wav", secs=3.0)
        out = tmp_path / "out"
        opts = AnalyzeOptions(
            inputs=[tmp_path], output_dir=out, formats=[OutputFormat.CSV],
            min_confidence=0.0, device_flags={"cpu": True}, combine=True,
            no_csv_bom=True,
        )
        assert analyze_files(opts, synthetic_config()) == 0
        raw = (out / "BirdNET_CombinedTable.csv").read_bytes()
        assert not raw.startswith(b"\xef\xbb\xbf")

    def test_unknown_bat_region_is_typed(self, home, tmp_path):
        """The library API (api.py bat=...) bypasses click.Choice, so the
        orchestrator must raise a typed ConfigValidation — previously a
        bare ValueError escaped to the caller."""
        from birda_tpu.errors import ConfigValidation

        audio = make_audio(tmp_path)
        opts = AnalyzeOptions(
            inputs=[audio], output_dir=tmp_path / "out",
            formats=[OutputFormat.CSV], min_confidence=0.0,
            device_flags={"cpu": True}, bat="narnia",
        )
        with pytest.raises(ConfigValidation, match="unknown bat region"):
            analyze_files(opts, synthetic_config())

    def test_jobs_ctrl_c_cancels_queued_files(self, home, tmp_path,
                                              monkeypatch):
        """A SIGINT during --jobs raises SystemExit on the main thread
        (blocked in f.result()); the pool must CANCEL the not-yet-started
        files — the SIGINT handler has already released the live locks, so
        processing the rest of the queue would race a second process that
        picked those files up. Previously `with pool: pool.map(...)`
        drained the whole queue (shutdown(wait=True) never cancels)."""
        import threading

        import birda_tpu.orchestrator as orch

        files = [make_audio(tmp_path, name=f"f{i}.wav", secs=3.0)
                 for i in range(4)]
        processed = []
        never_set = threading.Event()

        def fake_process_file(classifier, pcfg):
            processed.append(pcfg.input_path.name)
            if len(processed) == 1:
                # Simulate the SIGINT landing while the main thread waits
                # on this future's result: SystemExit is a BaseException,
                # so it escapes the per-file isolation (which catches
                # Exception only) and re-raises in the main f.result() loop.
                raise SystemExit(130)
            # A later file the worker grabbed before the cancel landed:
            # park it so the sole worker is busy while the main thread runs
            # its finally-cancel — making the assertion below deterministic
            # (at most ONE post-SIGINT file can ever have started).
            never_set.wait(timeout=2.0)

        monkeypatch.setattr(orch, "process_file", fake_process_file)
        opts = AnalyzeOptions(
            inputs=files, output_dir=tmp_path / "out",
            formats=[OutputFormat.CSV], min_confidence=0.0,
            device_flags={"cpu": True}, jobs=1,
        )
        with pytest.raises(SystemExit):
            analyze_files(opts, synthetic_config())
        # jobs=1: f0 was in flight; the worker may have grabbed f1 in the
        # instant before the cancel, but f2/f3 were still queued and MUST
        # have been cancelled. The old `with pool: pool.map(...)` spelling
        # drained all 4 (shutdown(wait=True) never cancels).
        assert len(processed) <= 2
